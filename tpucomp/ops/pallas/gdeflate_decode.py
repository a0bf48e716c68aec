"""Pallas/Mosaic GDeflate tile decoder: 32-lane SIMD bitstream walk in SMEM.

TPU analog of the reference's GDeflate decompress kernel
(``benchmarks/benchmark_gdeflate_chunked.cu:32``; DirectStorage-1.1 SIMD
architecture).  The tile container (``tpucomp/formats/gdeflate.py``; full
layout spec in ``tests/gdeflate_pyref.py``) swizzles one RFC-1951-style
bitstream into 32 interleaved lanes refilled at DWORD granularity in a
field-major schedule.  This kernel replays that schedule serially on the
scalar core: 32 lane bit-buffers live in SMEM as (lo, hi, nbits) int32
triples — field-granular refill bounds every buffer at 63 bits, which is
exactly what lets the buffers fit two 32-bit words — while decoded bytes land
in VMEM through the 128-byte wild copies (:mod:`.bytecopy`).

Huffman tables are the shared two-level machinery (:mod:`.huffman`); the
distance table has GDeflate's 32 codes (30/31 reach the 64 KiB page window).
Dynamic tiles carry a plain-coded description (no 16/17/18 run codes).
Corrupt input yields per-chunk status and size 0, never an OOB access.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.formats.deflate import CL_ORDER, LEN_BASE, LEN_EXTRA
from tpucomp.formats.gdeflate import (GDIST_BASE, GDIST_EXTRA, HDR,
                                      N_LANES, PAYLOAD)
from tpucomp.ops.pallas import bytecopy as bc
from tpucomp.ops.pallas import huffman

LIT_ROOT = 9
DIST_ROOT = 6
CL_ROOT = 7
ENOUGH_LITLEN = 852
ENOUGH_GDIST = 640    # 32 symbols (vs deflate's 30) at a 6-bit root
TAB_DIST = ENOUGH_LITLEN

# packed constant vector:
#   [0:29)   LEN_BASE | LEN_EXTRA << 16
#   [29:61)  GDIST_BASE | GDIST_EXTRA << 16
#   [61:80)  CL_ORDER
_CONSTS = np.concatenate([
    LEN_BASE.astype(np.int32) | (LEN_EXTRA.astype(np.int32) << 16),
    GDIST_BASE.astype(np.int32) | (GDIST_EXTRA.astype(np.int32) << 16),
    CL_ORDER.astype(np.int32),
]).astype(np.int32)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int,
            size_ref, consts_ref, words_ref, lanes_ref,
            out_ref, osize_ref, stat_ref,
            tab_ref, lens_ref, work_ref, cnt_ref, ofs_ref,
            lo_ref, hi_ref, nb_ref, tk_ref, d_ref,
            sym_ref, ml_ref, ds_ref):
    b = pl.program_id(0)
    csize = size_ref[b]

    def load32(i):
        wi = i >> 2
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w1, 31 - sh), jnp.int32(1))
        return lo | hi

    def getb(i):
        w = words_ref[0, 0, i >> 2]
        return jax.lax.shift_right_logical(w, (i & 3) * 8) & 0xFF

    def peek(pos, n):
        w = load32(jax.lax.shift_right_logical(pos, jnp.int32(3)))
        return jax.lax.shift_right_logical(w, pos & 7) & ((1 << n) - 1)

    def peek_v(pos, n):
        w = load32(jax.lax.shift_right_logical(pos, jnp.int32(3)))
        w = jax.lax.shift_right_logical(w, pos & 7)
        return w & (jax.lax.shift_left(jnp.int32(1), n) - 1)

    build_table = huffman.make_table_builder(tab_ref, lens_ref, work_ref,
                                             cnt_ref, ofs_ref)
    read_entry = huffman.make_code_reader(tab_ref)

    def wr_byte(o, v):
        bc.store128_wild(out_ref, o,
                         jnp.broadcast_to(v, (1, bc.BLK)).astype(jnp.int32))

    # ---- tile header -------------------------------------------------------
    btype = getb(jnp.int32(0))
    n_tok = (getb(jnp.int32(2)) | (getb(jnp.int32(3)) << 8)
             | (getb(jnp.int32(4)) << 16) | (getb(jnp.int32(5)) << 24))
    raw = (getb(jnp.int32(6)) | (getb(jnp.int32(7)) << 8)
           | (getb(jnp.int32(8)) << 16) | (getb(jnp.int32(9)) << 24))
    hdrb = getb(jnp.int32(10)) | (getb(jnp.int32(11)) << 8)

    err = csize < HDR
    err = jnp.logical_or(err, btype > 2)
    # framing version byte (header byte 1; formats/gdeflate.py TILE_VERSION)
    err = jnp.logical_or(err, getb(jnp.int32(1)) > 1)
    err = jnp.logical_or(err, jnp.logical_or(raw < 0, n_tok < 0))
    too_big = jnp.logical_and(jnp.logical_not(err), raw > out_cap)
    # each token produces at least one output byte
    err = jnp.logical_or(err, jnp.logical_and(btype > 0, n_tok > raw))
    dead = jnp.logical_or(err, too_big)

    def stored(e):
        e = jnp.logical_or(e, HDR + raw > csize)

        @pl.when(jnp.logical_and(jnp.logical_not(jnp.logical_or(e, too_big)),
                                 raw > 0))
        def _():
            bc.copy_bytes(lanes_ref, out_ref, jnp.int32(HDR), jnp.int32(0),
                          raw)
        return e

    def huffman_tile(e):
        e = jnp.logical_or(e, csize < PAYLOAD)

        # lane dword counts + per-tile lane buffer reset
        def ld(j, c):
            d_ref[j] = getb(HDR + 2 * j) | (getb(HDR + 2 * j + 1) << 8)
            lo_ref[j] = jnp.int32(0)
            hi_ref[j] = jnp.int32(0)
            nb_ref[j] = jnp.int32(0)
            tk_ref[j] = jnp.int32(0)
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(N_LANES), ld, jnp.int32(0),
                          unroll=False)

        desc_pad = jnp.where(btype == 2, (hdrb + 3) & ~jnp.int32(3),
                             jnp.int32(0))
        stream_off = PAYLOAD + desc_pad
        e = jnp.logical_or(e, stream_off > csize)

        def fixed(e2):
            def fl(i, c):
                l = jnp.where(i < 144, 8,
                              jnp.where(i < 256, 9,
                                        jnp.where(i < 280, 7, 8)))
                lens_ref[i] = l.astype(jnp.int32)
                return c
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(288), fl, jnp.int32(0),
                              unroll=False)

            def fd(i, c):
                lens_ref[288 + i] = jnp.int32(5)
                return c
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(32), fd, jnp.int32(0),
                              unroll=False)
            return e2

        def dynamic(e2):
            bp = jnp.int32(PAYLOAD * 8)
            bits_end = jnp.int32(PAYLOAD * 8) + hdrb * 8
            hlit = peek(bp, 5) + 257
            hdist = peek(bp + 5, 5) + 1
            hclen = peek(bp + 10, 4) + 4
            bp = bp + 14
            e2 = jnp.logical_or(e2, jnp.logical_or(hlit > 286, hdist > 32))

            for i in range(19):
                lens_ref[i] = jnp.int32(0)

            def rdcl(i, s2):
                bp2, c = s2
                lens_ref[consts_ref[61 + i]] = peek(bp2, 3)
                return bp2 + 3, c
            bp, _ = jax.lax.fori_loop(jnp.int32(0), hclen, rdcl,
                                      (bp, jnp.int32(0)), unroll=False)
            e2 = jnp.logical_or(
                e2, build_table(jnp.int32(0), jnp.int32(19), CL_ROOT,
                                jnp.int32(TAB_DIST), 128))

            # plain CL-coded lengths, symbols 0..15 only (no run codes)
            def lcond(s2):
                i, bp2, e3 = s2
                return jnp.logical_and(jnp.logical_not(e3), i < hlit + hdist)

            def lbody(s2):
                i, bp2, e3 = s2
                sym, nb, inv = read_entry(lambda n: peek_v(bp2, n),
                                          jnp.int32(TAB_DIST), CL_ROOT)
                bp2 = bp2 + nb
                e3 = jnp.logical_or(inv, jnp.logical_or(sym > 15,
                                                        bp2 > bits_end))
                lens_ref[i] = jnp.where(e3, 0, sym)
                return i + 1, bp2, e3

            _, bp, e2b = jax.lax.while_loop(
                lcond, lbody, (jnp.int32(0), bp, e2))
            e2 = jnp.logical_or(e2, e2b)

            # dist lens to index 288 (backwards: dst > src), zero the gaps
            def mv(k, c):
                lens_ref[288 + hdist - 1 - k] = lens_ref[hlit + hdist - 1 - k]
                return c
            jax.lax.fori_loop(jnp.int32(0), hdist, mv, jnp.int32(0),
                              unroll=False)

            def zg(k, c):
                lens_ref[hlit + k] = jnp.int32(0)
                return c
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(288) - hlit, zg,
                              jnp.int32(0), unroll=False)

            def zd(k, c):
                lens_ref[288 + hdist + k] = jnp.int32(0)
                return c
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(32) - hdist, zd,
                              jnp.int32(0), unroll=False)
            return e2

        e = jax.lax.cond(jnp.logical_or(btype == 1, e), fixed, dynamic, e)
        e = jnp.logical_or(
            e, build_table(jnp.int32(0), jnp.int32(288), LIT_ROOT,
                           jnp.int32(0), ENOUGH_LITLEN))
        e = jnp.logical_or(
            e, build_table(jnp.int32(288), jnp.int32(32), DIST_ROOT,
                           jnp.int32(TAB_DIST), ENOUGH_GDIST))

        # ---- token loop (field-major refill schedule) ----------------------
        sw = jax.lax.shift_right_logical(stream_off, jnp.int32(2))
        max_sp = jax.lax.shift_right_logical(csize - stream_off + 3,
                                             jnp.int32(2))

        def refill(j, sp):
            take = jnp.logical_and(nb_ref[j] < 32, tk_ref[j] < d_ref[j])

            @pl.when(take)
            def _():
                # clamp: corrupt lane counts can push sp far past the stream
                # before the end-of-tile bound check flags the error
                dw = words_ref[0, 0, jnp.minimum(sw + sp,
                                                 jnp.int32(w_words - 1))]
                nb = nb_ref[j]
                lo_ref[j] = lo_ref[j] | jax.lax.shift_left(dw, nb)
                hi_ref[j] = hi_ref[j] | jax.lax.shift_right_logical(
                    jax.lax.shift_right_logical(dw, 31 - nb), jnp.int32(1))
                nb_ref[j] = nb + 32
                tk_ref[j] = tk_ref[j] + 1
            return sp + take.astype(jnp.int32)

        def consume(j, n):
            lo = lo_ref[j]
            hi = hi_ref[j]
            lo_ref[j] = (jax.lax.shift_right_logical(lo, n)
                         | jax.lax.shift_left(
                             jax.lax.shift_left(hi, 31 - n), jnp.int32(1)))
            hi_ref[j] = jax.lax.shift_right_logical(hi, n)
            nb_ref[j] = nb_ref[j] - n

        # the interleave order of the shared stream is FIELD-MAJOR within a
        # 32-token round: slot f of ALL lanes refills before slot f+1 of any
        # lane — so the loop is per-round with four slot passes over the
        # lanes, per-lane temporaries parked in SMEM between slots
        def lane_peek_at(j):
            def lane_peek(n):
                return lo_ref[j] & (jax.lax.shift_left(jnp.int32(1), n) - 1)
            return lane_peek

        rounds = jax.lax.shift_right_logical(n_tok + N_LANES - 1, jnp.int32(5))

        def rcond(s):
            r, sp, op, e2 = s
            return jnp.logical_and(jnp.logical_not(e2), r < rounds)

        def rbody(s):
            r, sp, op, e2 = s
            width = jnp.minimum(jnp.int32(N_LANES), n_tok - r * N_LANES)

            def s1(j, c):
                sp, e3 = c
                sp = refill(j, sp)
                sym, nbits, inv = read_entry(lane_peek_at(j), jnp.int32(0),
                                             LIT_ROOT)
                consume(j, nbits)
                sym_ref[j] = sym
                e3 = jnp.logical_or(e3, jnp.logical_or(inv, sym == 256))
                e3 = jnp.logical_or(e3, sym - 257 >= 29)
                return sp, e3
            sp, e2 = jax.lax.fori_loop(jnp.int32(0), width, s1, (sp, e2),
                                       unroll=False)

            def s2(j, sp):
                sp = refill(j, sp)
                sym = sym_ref[j]
                is_m = sym >= 257
                lp = consts_ref[jnp.minimum(jnp.maximum(sym - 257, 0), 28)]
                lext = jnp.where(
                    is_m, jax.lax.shift_right_logical(lp, jnp.int32(16)),
                    jnp.int32(0))
                ml_ref[j] = (lp & 0xFFFF) + lane_peek_at(j)(lext)
                consume(j, lext)
                return sp
            sp = jax.lax.fori_loop(jnp.int32(0), width, s2, sp, unroll=False)

            def s3(j, c):
                sp, e3 = c
                sp = refill(j, sp)
                is_m = sym_ref[j] >= 257
                dsym, dnb, dinv = read_entry(lane_peek_at(j),
                                             jnp.int32(TAB_DIST), DIST_ROOT)
                consume(j, jnp.where(is_m, dnb, jnp.int32(0)))
                ds_ref[j] = jnp.minimum(dsym, 31)
                e3 = jnp.logical_or(e3, jnp.logical_and(
                    is_m, jnp.logical_or(dinv, dsym >= 32)))
                return sp, e3
            sp, e2 = jax.lax.fori_loop(jnp.int32(0), width, s3, (sp, e2),
                                       unroll=False)

            def s4(j, sp):
                sp = refill(j, sp)
                is_m = sym_ref[j] >= 257
                dp = consts_ref[29 + ds_ref[j]]
                dext = jnp.where(
                    is_m, jax.lax.shift_right_logical(dp, jnp.int32(16)),
                    jnp.int32(0))
                ds_ref[j] = (dp & 0xFFFF) + lane_peek_at(j)(dext)  # now dist
                consume(j, dext)
                return sp
            sp = jax.lax.fori_loop(jnp.int32(0), width, s4, sp, unroll=False)

            def em(j, c):
                op, e3 = c
                sym = sym_ref[j]
                is_m = sym >= 257
                mlen = ml_ref[j]
                dist = ds_ref[j]
                e3 = jnp.logical_or(e3, jnp.logical_and(is_m, dist > op))
                lit_ok = jnp.logical_and(jnp.logical_not(e3),
                                         jnp.logical_not(is_m))

                @pl.when(jnp.logical_and(lit_ok, op < out_cap))
                def _():
                    wr_byte(op, sym)

                m_ok = jnp.logical_and(
                    jnp.logical_not(e3),
                    jnp.logical_and(is_m, op + mlen <= out_cap))

                @pl.when(jnp.logical_and(m_ok, dist >= bc.BLK))
                def _():
                    bc.copy_bytes(out_ref, out_ref, op - dist, op, mlen)

                @pl.when(jnp.logical_and(m_ok, dist < bc.BLK))
                def _():
                    bc.copy_pattern(out_ref, op, dist, mlen)

                return op + jnp.where(is_m, mlen, jnp.int32(1)), e3
            op, e2 = jax.lax.fori_loop(jnp.int32(0), width, em, (op, e2),
                                       unroll=False)
            return r + 1, sp, op, e2

        _, sp, op, e = jax.lax.while_loop(
            rcond, rbody, (jnp.int32(0), jnp.int32(0), jnp.int32(0), e))
        e = jnp.logical_or(e, sp > max_sp)
        e = jnp.logical_or(e, op != raw)
        return e

    err = jax.lax.cond(
        jnp.logical_or(btype == 0, dead),
        lambda e: jax.lax.cond(dead, lambda e2: e2, stored, e),
        huffman_tile, err)

    ok = jnp.logical_not(jnp.logical_or(err, too_big))
    osize_ref[b] = jnp.where(ok, raw, jnp.int32(0))
    stat_ref[b] = jnp.where(
        err, jnp.int32(Status.ERROR_CANNOT_DECOMPRESS),
        jnp.where(too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                  jnp.int32(Status.SUCCESS)))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False):
    """Batched GDeflate tile decode, Pallas backend.  Same signature and
    semantics as :func:`tpucomp.formats.gdeflate.decompress_batch`."""
    B, comp_cap = comp.shape

    wpad = _round_up(max(comp_cap, 8), 4) + 4
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    lpad = _round_up(comp_cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(comp, ((0, 0), (0, lpad - comp_cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK
    consts = jnp.asarray(_CONSTS)

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes (B,)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # consts (80,)
                pl.BlockSpec((1, 1, wpad // 4), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, lpad // bc.BLK, bc.BLK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, out_rows, bc.BLK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.SMEM((ENOUGH_LITLEN + ENOUGH_GDIST,), jnp.int32),
                pltpu.SMEM((320,), jnp.int32),
                pltpu.SMEM((320,), jnp.int32),
                pltpu.SMEM((16,), jnp.int32),
                pltpu.SMEM((16,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
                pltpu.SMEM((N_LANES,), jnp.int32),
            ],
            interpret=interpret,
        )(comp_sizes.astype(jnp.int32), consts, words, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
