"""Pallas/Mosaic Deflate (RFC 1951) decoder: bit-serial Huffman walk in SMEM.

The TPU analog of the reference's dedicated Deflate decompress kernel
(``benchmarks/benchmark_deflate_chunked.cu``; algorithm family in
``doc/algorithms_overview.md:50-52``): the scalar core reads the bitstream out
of SMEM (bytes packed 4-per-word; a stateless ``peek`` re-slices a 32-bit
window at any bit position, so no bit-buffer state is carried) and decodes
canonical Huffman codes through two-level lookup tables built per block in
SMEM scratch, while literal bytes and LZ77 match copies land in VMEM through
the 128-byte wild-copy primitives (:mod:`.bytecopy`).

Table construction follows the canonical incremental fill over
length-then-symbol sorted codes (the classic inflate table algorithm): a
9-bit root for literal/length codes and a 6-bit root for distance codes with
on-demand subtables, within the proven 852/592-entry bounds.  Entries pack
``(symbol << 8) | bits``; subtable links set bit 30 and pack
``(offset << 8) | sub_bits``; uncovered slots stay 0 and surface as
``ERROR_CANNOT_DECOMPRESS`` when hit (incomplete codes are therefore accepted
exactly as far as they are actually exercised, matching zlib-family
tolerance for the single-distance-code case).

All three block types are handled (stored / fixed / dynamic, multi-block
streams with BFINAL); corrupt input yields per-chunk status and size 0,
never an out-of-bounds access (reference contract ``CHANGELOG.md:160-164``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.formats.deflate import (CL_ORDER, DIST_BASE, DIST_EXTRA,
                                     LEN_BASE, LEN_EXTRA)
from tpucomp.ops.pallas import bytecopy as bc
from tpucomp.ops.pallas import huffman

LIT_ROOT = 9
DIST_ROOT = 6
CL_ROOT = 7
ENOUGH_LITLEN = 852   # proven bound for 288 symbols, 9-bit root
ENOUGH_DIST = 592     # proven bound for 32 symbols, 6-bit root
TAB_DIST = ENOUGH_LITLEN          # dist table offset inside the scratch
SUB_FLAG = huffman.SUB_FLAG

# packed constant vector handed to the kernel:
#   [0:29)   LEN_BASE | LEN_EXTRA << 16
#   [29:59)  DIST_BASE | DIST_EXTRA << 16
#   [59:78)  CL_ORDER
_CONSTS = np.concatenate([
    LEN_BASE.astype(np.int32) | (LEN_EXTRA.astype(np.int32) << 16),
    DIST_BASE.astype(np.int32) | (DIST_EXTRA.astype(np.int32) << 16),
    CL_ORDER.astype(np.int32),
]).astype(np.int32)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int,
            size_ref, start_ref, consts_ref, words_ref, lanes_ref,
            out_ref, osize_ref, stat_ref,
            tab_ref, lens_ref, work_ref, cnt_ref, ofs_ref):
    b = pl.program_id(0)
    csize = size_ref[b]          # END of the deflate body (exclusive, bytes)
    start = start_ref[b]         # START of the deflate body (bytes)
    nbits_total = csize * 8

    def load32(i):
        wi = i >> 2
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w1, 31 - sh), jnp.int32(1))
        return lo | hi

    def peek(pos, n):
        """n <= 25 bits at bit position pos (reads past the end return the
        zero padding; the caller validates pos against nbits_total)."""
        w = load32(jax.lax.shift_right_logical(pos, jnp.int32(3)))
        return jax.lax.shift_right_logical(w, pos & 7) & ((1 << n) - 1)

    def peek_v(pos, n):
        """Variable bit count 0 <= n <= 15."""
        w = load32(jax.lax.shift_right_logical(pos, jnp.int32(3)))
        w = jax.lax.shift_right_logical(w, pos & 7)
        return w & (jax.lax.shift_left(jnp.int32(1), n) - 1)

    # ---- canonical two-level tables: shared machinery (:mod:`.huffman`) ----
    build_table = huffman.make_table_builder(tab_ref, lens_ref, work_ref,
                                             cnt_ref, ofs_ref)
    _read_entry = huffman.make_code_reader(tab_ref)

    def read_code(pos, tbase, root):
        """Decode one symbol at bit position pos -> (sym, nbits, invalid)."""
        return _read_entry(lambda n: peek_v(pos, n), tbase, root)

    def wr_byte(o, v):
        bc.store128_wild(out_ref, o,
                         jnp.broadcast_to(v, (1, bc.BLK)).astype(jnp.int32))

    # ---------------- block loop --------------------------------------------
    # state: (bitpos, op, err, done)
    def blk_cond(s):
        bp, op, err, done = s
        return jnp.logical_and(jnp.logical_not(jnp.logical_or(err, done)),
                               bp + 3 <= nbits_total)

    def blk_body(s):
        bp, op, err, done = s
        bfinal = peek(bp, 1)
        btype = peek(bp + 1, 2)
        bp = bp + 3

        def stored(a):
            bp, op, err = a
            bp = (bp + 7) & ~jnp.int32(7)
            src = jax.lax.shift_right_logical(bp, jnp.int32(3))
            ln = peek(bp, 16)
            nln = peek(bp + 16, 16)
            err = jnp.logical_or(err, src + 4 + ln > csize)
            err = jnp.logical_or(err, (ln ^ nln) != 0xFFFF)
            ok = jnp.logical_and(jnp.logical_not(err), op + ln <= out_cap)

            @pl.when(jnp.logical_and(ok, ln > 0))
            def _():
                bc.copy_bytes(lanes_ref, out_ref, src + 4, op, ln)

            return bp + 32 + ln * 8, op + ln, err

        def huffman_block(a):
            bp, op, err = a

            def fixed(bp):
                def fl(i, c):
                    l = jnp.where(i < 144, 8,
                                  jnp.where(i < 256, 9,
                                            jnp.where(i < 280, 7, 8)))
                    lens_ref[i] = l.astype(jnp.int32)
                    return c
                jax.lax.fori_loop(jnp.int32(0), jnp.int32(288), fl,
                                  jnp.int32(0), unroll=False)

                def fd(i, c):
                    lens_ref[288 + i] = jnp.int32(5)
                    return c
                jax.lax.fori_loop(jnp.int32(0), jnp.int32(32), fd,
                                  jnp.int32(0), unroll=False)
                return bp, jnp.int32(288), jnp.int32(32), jnp.int32(0)

            def dynamic(bp):
                hlit = peek(bp, 5) + 257
                hdist = peek(bp + 5, 5) + 1
                hclen = peek(bp + 10, 4) + 4
                bp = bp + 14
                e = jnp.logical_or(hlit > 286, hdist > 30).astype(jnp.int32)

                # code-length code lengths arrive in CL_ORDER permutation
                for i in range(19):
                    lens_ref[i] = jnp.int32(0)

                def rdcl(i, s2):
                    bp2, c = s2
                    lens_ref[consts_ref[59 + i]] = peek(bp2, 3)
                    return bp2 + 3, c
                bp, _ = jax.lax.fori_loop(jnp.int32(0), hclen, rdcl,
                                          (bp, jnp.int32(0)), unroll=False)
                e = jnp.logical_or(
                    e != 0,
                    build_table(jnp.int32(0), jnp.int32(19), CL_ROOT,
                                jnp.int32(TAB_DIST), 128)).astype(jnp.int32)

                # decode hlit+hdist code lengths with repeat ops 16/17/18
                def lcond(s2):
                    i, bp2, prev, e2 = s2
                    return jnp.logical_and(e2 == 0, i < hlit + hdist)

                def lbody(s2):
                    i, bp2, prev, e2 = s2
                    sym, nb, inv = read_code(bp2, jnp.int32(TAB_DIST),
                                             CL_ROOT)
                    bp2 = bp2 + nb
                    e2 = jnp.logical_or(inv,
                                        bp2 > nbits_total).astype(jnp.int32)

                    def plain(s3):
                        i, bp3, _, e3 = s3
                        lens_ref[i] = sym
                        return i + 1, bp3, sym, e3

                    def repeat(s3):
                        i, bp3, prev, e3 = s3
                        is16 = sym == 16
                        is17 = sym == 17
                        nb2 = jnp.where(is16, 2, jnp.where(is17, 3, 7))
                        rep = jnp.where(is16, 3, jnp.where(is17, 3, 11)) \
                            + peek_v(bp3, nb2)
                        bp3 = bp3 + nb2
                        val = jnp.where(is16, prev, jnp.int32(0))
                        e3 = jnp.logical_or(
                            e3 != 0,
                            jnp.logical_or(
                                jnp.logical_and(is16, i == 0),
                                i + rep > hlit + hdist)).astype(jnp.int32)

                        def wcond(s4):
                            k, _ = s4
                            return k < rep

                        def wbody(s4):
                            k, c = s4

                            @pl.when(e3 == 0)
                            def _():
                                lens_ref[i + k] = val
                            return k + 1, c
                        jax.lax.while_loop(wcond, wbody,
                                           (jnp.int32(0), jnp.int32(0)))
                        return i + rep, bp3, val, e3

                    return jax.lax.cond(sym < 16, plain, repeat,
                                        (i, bp2, prev, e2))

                i, bp, _, e = jax.lax.while_loop(
                    lcond, lbody, (jnp.int32(0), bp, jnp.int32(0), e))
                # lens for dist codes must sit at index 288 regardless of hlit
                def mv(k, c):
                    src_i = hlit + hdist - 1 - k
                    dst_i = 288 + hdist - 1 - k
                    lens_ref[dst_i] = lens_ref[src_i]
                    return c
                jax.lax.cond(
                    hlit < jnp.int32(288),
                    lambda _: jax.lax.fori_loop(jnp.int32(0), hdist, mv,
                                                jnp.int32(0), unroll=False),
                    lambda _: jnp.int32(0), 0)
                # a block must not encode literals above hlit as nonzero —
                # zero the gap so build_table counts only real symbols
                def zg(k, c):
                    lens_ref[hlit + k] = jnp.int32(0)
                    return c
                jax.lax.cond(
                    hlit < jnp.int32(288),
                    lambda _: jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(288) - hlit, zg, jnp.int32(0),
                        unroll=False),
                    lambda _: jnp.int32(0), 0)

                # stale lengths from a previous block above hdist would be
                # counted by build_table — clear them
                def zd(k, c):
                    lens_ref[288 + hdist + k] = jnp.int32(0)
                    return c
                jax.lax.fori_loop(jnp.int32(0), jnp.int32(32) - hdist, zd,
                                  jnp.int32(0), unroll=False)
                return bp, jnp.int32(288), hdist, e

            bp, nlit, ndist, e = jax.lax.cond(btype == 1, fixed, dynamic, bp)
            err = jnp.logical_or(err, e != 0)
            err = jnp.logical_or(
                err, build_table(jnp.int32(0), nlit, LIT_ROOT, jnp.int32(0),
                                 ENOUGH_LITLEN))
            err = jnp.logical_or(
                err, build_table(jnp.int32(288), jnp.int32(32), DIST_ROOT,
                                 jnp.int32(TAB_DIST), ENOUGH_DIST))

            # ---------------- symbol loop -------------------------------
            # literal bytes pack four-at-a-time into one int32 and flush as
            # a single composed wild store (op counts pending bytes; matches
            # and EOB flush first so copies read completed output)
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, bc.BLK), 1)

            def flush_pend(op_next, pend, np_, e3):
                p = op_next - np_
                v = jnp.where(
                    lane128 == 0, pend & 0xFF,
                    jnp.where(lane128 == 1,
                              jax.lax.shift_right_logical(pend, jnp.int32(8))
                              & 0xFF,
                              jnp.where(lane128 == 2,
                                        jax.lax.shift_right_logical(
                                            pend, jnp.int32(16)) & 0xFF,
                                        jax.lax.shift_right_logical(
                                            pend, jnp.int32(24)) & 0xFF)))

                @pl.when(jnp.logical_and(np_ > 0,
                                         jnp.logical_and(e3 == 0,
                                                         p < out_cap)))
                def _():
                    bc.store128_wild(out_ref, p, v.astype(jnp.int32))

            def scond(s2):
                return jnp.logical_and(s2[2] == 0, s2[3] == 0)

            def sbody(s2):
                bp2, op2, e2, eob, pend, npend = s2
                sym, nb, inv = read_code(bp2, jnp.int32(0), LIT_ROOT)
                bp2 = bp2 + nb
                e2 = jnp.logical_or(inv, bp2 > nbits_total).astype(jnp.int32)

                def lit(s3):
                    bp3, op3, e3, _, pend, np_ = s3
                    pend = pend | jax.lax.shift_left(sym, 8 * np_)
                    np_ = np_ + 1
                    op3 = op3 + 1

                    def fl(a):
                        pend, np_ = a
                        flush_pend(op3, pend, jnp.int32(4), e3)
                        return jnp.int32(0), jnp.int32(0)
                    pend, np_ = jax.lax.cond(np_ == 4, fl, lambda a: a,
                                             (pend, np_))
                    return bp3, op3, e3, jnp.int32(0), pend, np_

                def eob_f(s3):
                    bp3, op3, e3, _, pend, np_ = s3
                    flush_pend(op3, pend, np_, e3)
                    return bp3, op3, e3, jnp.int32(1), jnp.int32(0), \
                        jnp.int32(0)

                def match(s3):
                    bp3, op3, e3, _, pend, np_ = s3
                    flush_pend(op3, pend, np_, e3)
                    pend = jnp.int32(0)
                    np_ = jnp.int32(0)
                    li = sym - 257
                    e3 = jnp.logical_or(e3 != 0, li >= 29).astype(jnp.int32)
                    lp = consts_ref[jnp.minimum(li, 28)]
                    lext = jax.lax.shift_right_logical(lp, jnp.int32(16))
                    mlen = (lp & 0xFFFF) + peek_v(bp3, lext)
                    bp3 = bp3 + lext

                    dsym, dnb, dinv = read_code(bp3, jnp.int32(TAB_DIST),
                                                DIST_ROOT)
                    bp3 = bp3 + dnb
                    e3 = jnp.logical_or(
                        e3 != 0, jnp.logical_or(dinv, dsym >= 30)
                    ).astype(jnp.int32)
                    dp = consts_ref[29 + jnp.minimum(dsym, 29)]
                    dext = jax.lax.shift_right_logical(dp, jnp.int32(16))
                    dist = (dp & 0xFFFF) + peek_v(bp3, dext)
                    bp3 = bp3 + dext
                    e3 = jnp.logical_or(
                        e3 != 0,
                        jnp.logical_or(dist > op3, bp3 > nbits_total)
                    ).astype(jnp.int32)
                    ok = jnp.logical_and(e3 == 0, op3 + mlen <= out_cap)

                    @pl.when(jnp.logical_and(ok, dist >= bc.BLK))
                    def _():
                        bc.copy_bytes(out_ref, out_ref, op3 - dist, op3, mlen)

                    @pl.when(jnp.logical_and(ok, dist < bc.BLK))
                    def _():
                        bc.copy_pattern(out_ref, op3, dist, mlen)

                    return bp3, op3 + mlen, e3, jnp.int32(0), pend, np_

                return jax.lax.cond(
                    sym < 256, lit,
                    lambda s3: jax.lax.cond(sym == 256, eob_f, match, s3),
                    (bp2, op2, e2, eob, pend, npend))

            bp, op, e2, _, _, _ = jax.lax.while_loop(
                scond, sbody, (bp, op, err.astype(jnp.int32), jnp.int32(0),
                               jnp.int32(0), jnp.int32(0)))
            return bp, op, e2 != 0

        bp, op, err = jax.lax.cond(
            btype == 0, stored,
            lambda a: jax.lax.cond(
                btype == 3,
                lambda a2: (a2[0], a2[1], jnp.bool_(True)), huffman_block, a),
            (bp, op, err))
        err = jnp.logical_or(err, bp > nbits_total)
        return bp, op, err, bfinal > 0

    st0 = (start * 8, jnp.int32(0), csize <= start, jnp.bool_(False))
    bp, op, err, done = jax.lax.while_loop(blk_cond, blk_body, st0)
    err = jnp.logical_or(err, jnp.logical_not(done))
    too_big = jnp.logical_and(jnp.logical_not(err), op > out_cap)
    ok = jnp.logical_not(jnp.logical_or(err, too_big))
    osize_ref[b] = jnp.where(ok, op, jnp.int32(0))
    stat_ref[b] = jnp.where(
        err, jnp.int32(Status.ERROR_CANNOT_DECOMPRESS),
        jnp.where(too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                  jnp.int32(Status.SUCCESS)))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False, starts: jax.Array | None = None):
    """Batched raw-deflate decode, Pallas backend.  Same signature/semantics
    as :func:`tpucomp.formats.deflate.decompress_batch`.  ``starts`` gives a
    per-chunk byte offset where the deflate body begins (``comp_sizes`` is
    then the body END) — the hook the gzip wrapper uses."""
    B, comp_cap = comp.shape
    if starts is None:
        starts = jnp.zeros((B,), jnp.int32)

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
                pl.BlockSpec(memory_space=pltpu.SMEM),   # starts (B,)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # consts (78,)
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
                pltpu.SMEM((ENOUGH_LITLEN + ENOUGH_DIST,), jnp.int32),
                pltpu.SMEM((320,), jnp.int32),
                pltpu.SMEM((320,), jnp.int32),
                pltpu.SMEM((16,), jnp.int32),
                pltpu.SMEM((16,), jnp.int32),
            ],
            interpret=interpret,
        )(comp_sizes.astype(jnp.int32), starts.astype(jnp.int32), consts,
          words, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
