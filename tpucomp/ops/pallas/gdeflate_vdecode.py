"""Vectorized Pallas GDeflate decoder: 32-lane VPU parse + serial executor.

The GDeflate tile container interleaves one deflate-family bitstream into 32
SIMD lanes precisely so that a vector machine can decode 32 tokens per step
— this module is that decoder, the shape the format was designed for (the
serial replay lives in :mod:`.gdeflate_decode`).  Two kernels:

1. **Parse** (vector): all 32 lane bit-buffers live in (1, 128) int32
   vector registers as (lo, hi, nbits) triples.  Per 32-token round, the
   four field slots run in lockstep: DWORD refills distribute a contiguous
   window of the shared stream to needing lanes by rank (byte-split f32
   matmuls, bf16-exact — the same trick as the rANS kernel), canonical
   Huffman symbols resolve by comparing the bit-reversed 15-bit peek against
   the per-length ``first/count`` ranges (15 unrolled vector compares) with
   one one-hot lookup into the rank->symbol array, and length/distance
   bases+extras come from closed-form RFC-1951 arithmetic.  Tokens pack into
   one int32 each: literal = byte value; match = ``(1 << 25) | (mlen-3) << 17
   | dist`` (GDeflate distances reach 65536).
2. **Execute** (serial): the packed tokens stream through SMEM in slab-sized
   grid blocks (the second grid dimension pipelines their DMA) while the
   scalar core replays them into VMEM through the 128-byte wild copies —
   no bit reading, no table lookups, just emission.

Canonical tables (``count/first/offset/sym_of_rank``) are built vectorized
in XLA by the shared :func:`tpucomp.formats.gdeflate.tile_tables`; stored
tiles and header validation are composed in the XLA wrapper.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.formats.gdeflate import HDR, N_LANES, tile_tables
from tpucomp.ops.pallas import bytecopy as bc

V = 128           # vector width (32 active lanes)
SLAB = 4096       # tokens per executor grid block (16 KiB SMEM)
MATCH_FLAG = 1 << 25  # token pack: flag | (mlen-3) << 17 | dist (<= 65536)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# =========================================================================
# parse kernel (vector)
# =========================================================================

def _rev15(x):
    """Bit-reverse the low 15 bits of each lane."""
    x = ((x & 0x5555) << 1) | (jax.lax.shift_right_logical(x, jnp.int32(1))
                               & 0x5555)
    x = ((x & 0x3333) << 2) | (jax.lax.shift_right_logical(x, jnp.int32(2))
                               & 0x3333)
    x = ((x & 0x0F0F) << 4) | (jax.lax.shift_right_logical(x, jnp.int32(4))
                               & 0x0F0F)
    x = ((x & 0x00FF) << 8) | (jax.lax.shift_right_logical(x, jnp.int32(8))
                               & 0x00FF)
    return jax.lax.shift_right_logical(x, jnp.int32(1))


def _parse_kernel(R_cap: int, max_dw: int,
                  hdr_ref, ltab_ref, dtab_ref, d_ref, lsor_ref, dsor_ref,
                  words_ref, tok_ref, sp_ref, err_ref):
    b = pl.program_id(0)
    n_tok = hdr_ref[b, 0]
    dw0 = hdr_ref[b, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
    tri = (iota_j < iota_l).astype(jnp.float32)
    iota_288 = jax.lax.broadcasted_iota(jnp.int32, (288, V), 0)
    iota_32 = jax.lax.broadcasted_iota(jnp.int32, (32, V), 0)
    D = d_ref[0, 0:1, :]

    # hoist the per-length canonical scalars (fixed per tile) out of the
    # round loop: 45 SMEM loads per slot otherwise re-issue every round
    ltab = [(ltab_ref[b, l], ltab_ref[b, 16 + l], ltab_ref[b, 32 + l])
            for l in range(1, 16)]
    dtab = [(dtab_ref[b, l], dtab_ref[b, 16 + l], dtab_ref[b, 32 + l])
            for l in range(1, 16)]

    def decode_sym(lo, tab, sor, sor_iota):
        """Canonical decode of the next code in every lane ->
        (sym, len, ok).  ``tab``: [(count, first, offset)] per length."""
        rev = _rev15(lo & 0x7FFF)
        sym_idx = jnp.zeros((1, V), jnp.int32)
        length = jnp.zeros((1, V), jnp.int32)
        found = jnp.zeros((1, V), jnp.bool_)
        for l in range(1, 16):
            cnt_l, first_l, off_l = tab[l - 1]
            code_l = jax.lax.shift_right_logical(rev, jnp.int32(15 - l))
            in_range = jnp.logical_and(code_l >= first_l,
                                       code_l - first_l < cnt_l)
            hit = jnp.logical_and(jnp.logical_not(found), in_range)
            idx = off_l + code_l - first_l
            sym_idx = jnp.where(hit, idx, sym_idx)
            length = jnp.where(hit, jnp.int32(l), length)
            found = jnp.logical_or(found, in_range)
        sym_idx = jnp.clip(sym_idx, 0, sor.shape[0] - 1)
        hot = (sor_iota == sym_idx).astype(jnp.int32)
        sym = jnp.sum(hot * sor, axis=0, keepdims=True)
        return sym, length, found

    def consume(lo, hi, nb, n):
        lo2 = (jax.lax.shift_right_logical(lo, n)
               | jax.lax.shift_left(jax.lax.shift_left(hi, 31 - n),
                                    jnp.int32(1)))
        return lo2, jax.lax.shift_right_logical(hi, n), nb - n

    def rbody(r, carry):
        lo, hi, nb, taken, sp, err = carry
        act = (r * N_LANES + lane < n_tok)
        act = jnp.logical_and(act, lane < N_LANES)

        def refill(lo, hi, nb, taken, sp):
            need = jnp.logical_and(act, jnp.logical_and(nb < 32, taken < D))
            need_f = need.astype(jnp.float32)
            rank = jax.lax.dot_general(
                need_f, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            win = bc.window128(words_ref,
                               jnp.minimum(dw0 + sp, jnp.int32(max_dw)))
            sel = jnp.logical_and(iota_j == rank, need).astype(jnp.float32)

            def distribute(v):
                return jax.lax.dot_general(
                    v.astype(jnp.float32), sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)

            w = distribute(win & 0xFF)
            w = w | (distribute(jax.lax.shift_right_logical(win, jnp.int32(8))
                                & 0xFF) << 8)
            w = w | (distribute(jax.lax.shift_right_logical(win, jnp.int32(16))
                                & 0xFF) << 16)
            w = w | jax.lax.shift_left(
                distribute(jax.lax.shift_right_logical(win, jnp.int32(24))
                           & 0xFF), jnp.int32(24))
            lo = jnp.where(need, lo | jax.lax.shift_left(w, nb), lo)
            hi = jnp.where(
                need,
                hi | jax.lax.shift_right_logical(
                    jax.lax.shift_right_logical(w, 31 - nb), jnp.int32(1)),
                hi)
            nb = nb + jnp.where(need, 32, 0)
            taken = taken + need.astype(jnp.int32)
            sp = sp + rank[0, V - 1] + need.astype(jnp.int32)[0, V - 1]
            return lo, hi, nb, taken, sp

        # field 1: lit/len symbol.  err stays a (1, V) int32 vector — Mosaic
        # cannot squeeze sub-32-bit reductions to scalars, and deferring the
        # reduction to one max() after the loop is cheaper anyway.
        lo, hi, nb, taken, sp = refill(lo, hi, nb, taken, sp)
        sym, l1, ok1 = decode_sym(lo, ltab, lsor_ref[0], iota_288)
        err = err | jnp.logical_and(act, jnp.logical_not(ok1)).astype(jnp.int32)
        err = err | jnp.logical_and(act, sym == 256).astype(jnp.int32)
        err = err | jnp.logical_and(act, sym > 285).astype(jnp.int32)
        lo, hi, nb = consume(lo, hi, nb, jnp.where(act, l1, 0))
        is_m = jnp.logical_and(act, sym >= 257)
        li = jnp.clip(sym - 257, 0, 28)

        # field 2: length extra (closed-form RFC-1951 base/extra)
        lo, hi, nb, taken, sp = refill(lo, hi, nb, taken, sp)
        le = jnp.maximum(jax.lax.shift_right_logical(li, jnp.int32(2)) - 1, 0)
        lbase = jax.lax.shift_left(4 + (li & 3), le) + 3
        lbase = jnp.where(li < 8, li + 3, lbase)
        le = jnp.where(li < 8, 0, le)
        lbase = jnp.where(li == 28, jnp.int32(258), lbase)
        le = jnp.where(li == 28, 0, le)
        n2 = jnp.where(is_m, le, 0)
        ex2 = lo & (jax.lax.shift_left(jnp.int32(1), n2) - 1)
        lo, hi, nb = consume(lo, hi, nb, n2)
        mlen = jnp.where(is_m, lbase + ex2, 0)

        # field 3: distance symbol
        lo, hi, nb, taken, sp = refill(lo, hi, nb, taken, sp)
        dsym, l3, ok3 = decode_sym(lo, dtab, dsor_ref[0], iota_32)
        err = err | jnp.logical_and(is_m, jnp.logical_not(ok3)).astype(
            jnp.int32)
        lo, hi, nb = consume(lo, hi, nb, jnp.where(is_m, l3, 0))
        dsym = jnp.clip(dsym, 0, 31)

        # field 4: distance extra (closed-form)
        lo, hi, nb, taken, sp = refill(lo, hi, nb, taken, sp)
        de = jnp.maximum(jax.lax.shift_right_logical(dsym, jnp.int32(1)) - 1,
                         0)
        dbase = jax.lax.shift_left(2 + (dsym & 1), de) + 1
        dbase = jnp.where(dsym < 4, dsym + 1, dbase)
        de = jnp.where(dsym < 4, 0, de)
        n4 = jnp.where(is_m, de, 0)
        ex4 = lo & (jax.lax.shift_left(jnp.int32(1), n4) - 1)
        lo, hi, nb = consume(lo, hi, nb, n4)
        dist = jnp.where(is_m, dbase + ex4, 0)

        tok = jnp.where(is_m,
                        MATCH_FLAG | jax.lax.shift_left(mlen - 3, jnp.int32(17))
                        | jnp.clip(dist, 0, 0x1FFFF),
                        jnp.clip(sym, 0, 255))
        tok_ref[0, pl.ds(r, 1), :] = jnp.where(act, tok, 0)
        return lo, hi, nb, taken, sp, err

    rounds = jax.lax.shift_right_logical(n_tok + N_LANES - 1, jnp.int32(5))
    z = jnp.zeros((1, V), jnp.int32)
    lo, hi, nb, taken, sp, err = jax.lax.fori_loop(
        jnp.int32(0), jnp.minimum(rounds, jnp.int32(R_cap)), rbody,
        (z, z, z, z, jnp.int32(0), z))
    sp_ref[b] = sp
    # bit 0: scan-level code error; bit 1: lane word counts not consumed
    # exactly (an ok-level condition in the XLA composition, not an err)
    taken_bad = jnp.max(jnp.logical_and(lane < N_LANES,
                                        taken != D).astype(jnp.int32))
    err_ref[b] = jnp.minimum(jnp.max(err), 1) | (taken_bad << 1)


# =========================================================================
# execute kernel (serial, slab-pipelined tokens)
# =========================================================================

def _exec_kernel(out_cap: int, n_slabs: int,
                 hdr_ref, tok_ref, out_ref, op_ref, derr_ref, st_ref):
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_tok = hdr_ref[b, 0]

    @pl.when(s == 0)
    def _():
        st_ref[0] = jnp.int32(0)                   # op
        st_ref[1] = jnp.int32(0)                   # dist errors

    base = s * SLAB
    count = jnp.clip(n_tok - base, 0, SLAB)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, bc.BLK), 1)

    def wcond(st):
        i, op, err = st
        return i < count

    def wbody(st):
        i, op, err = st
        tok = tok_ref[0, 0, i]
        is_m = tok >= MATCH_FLAG

        def lit(a):
            i, op, err = a
            # literal-run batching: entropy-only tiles are ALL literals, so
            # compose four per wild store when the next three are literal too
            t1 = tok_ref[0, 0, jnp.minimum(i + 1, jnp.int32(SLAB - 1))]
            t2 = tok_ref[0, 0, jnp.minimum(i + 2, jnp.int32(SLAB - 1))]
            t3 = tok_ref[0, 0, jnp.minimum(i + 3, jnp.int32(SLAB - 1))]
            four = jnp.logical_and(i + 4 <= count, op + 4 <= out_cap)
            four = jnp.logical_and(four, t1 < MATCH_FLAG)
            four = jnp.logical_and(four, t2 < MATCH_FLAG)
            four = jnp.logical_and(four, t3 < MATCH_FLAG)

            def lit4(a2):
                i, op, err = a2
                v = jnp.where(lane_i == 0, tok,
                              jnp.where(lane_i == 1, t1,
                                        jnp.where(lane_i == 2, t2, t3)))

                @pl.when(err == 0)
                def _():
                    bc.store128_wild(out_ref, op, v.astype(jnp.int32))
                return i + 4, op + 4, err

            def lit1(a2):
                i, op, err = a2

                @pl.when(jnp.logical_and(err == 0, op < out_cap))
                def _():
                    bc.store128_wild(
                        out_ref, op,
                        jnp.broadcast_to(tok, (1, bc.BLK)).astype(jnp.int32))
                return i + 1, op + 1, err

            return jax.lax.cond(four, lit4, lit1, (i, op, err))

        def match(a):
            i, op, err = a
            dist = tok & 0x1FFFF
            ml = (jax.lax.shift_right_logical(tok, jnp.int32(17)) & 0xFF) + 3
            err = jnp.where(jnp.logical_or(dist < 1, dist > op),
                            jnp.int32(1), err)
            ok = jnp.logical_and(err == 0, op + ml <= out_cap)

            @pl.when(jnp.logical_and(ok, dist >= bc.BLK))
            def _():
                bc.copy_bytes(out_ref, out_ref, op - dist, op, ml)

            @pl.when(jnp.logical_and(ok, dist < bc.BLK))
            def _():
                bc.copy_pattern(out_ref, op, dist, ml)

            return i + 1, op + ml, err

        return jax.lax.cond(is_m, match, lit, (i, op, err))

    _, op, err = jax.lax.while_loop(
        wcond, wbody, (jnp.int32(0), st_ref[0], st_ref[1]))
    st_ref[0] = op
    st_ref[1] = err

    @pl.when(s == n_slabs - 1)
    def _():
        op_ref[b] = op
        derr_ref[b] = err


# =========================================================================
# wrapper
# =========================================================================

@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False):
    """Batched GDeflate tile decode, vectorized Pallas backend.  Same
    signature/semantics as :func:`tpucomp.formats.gdeflate.decompress_batch`
    and the serial kernel (:mod:`.gdeflate_decode`)."""
    B, comp_cap = comp.shape
    comp_sizes = comp_sizes.astype(jnp.int32)

    (btype, n_tok, raw, D, (lcount, lfirst, loffset, lsor),
     (dcount, dfirst, doffset, dsor), dw_start, tbl_ok) = jax.vmap(
        tile_tables)(comp, comp_sizes)

    # XLA-parity round cap: R = out_cap // 32 + 1 rounds, silent truncation
    # (the total-output check downstream turns a truncated parse into an
    # error exactly as the XLA path does)
    R_cap = out_cap // N_LANES + 1
    n_tok_cap = R_cap * N_LANES
    n_tok_eff = jnp.minimum(n_tok, n_tok_cap)

    # stream dwords (byte offsets are 4-aligned by the format)
    wpad = _round_up(max(comp_cap, 8), 4) + 4 * (bc.BLK * 2)
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    dwords = (cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16)
              | (cw[..., 3] << 24))
    wrows = _round_up(wpad // 4, V) // V
    dwords = dwords.reshape(B, wpad // 4)
    dwords = jnp.pad(dwords, ((0, 0), (0, wrows * V - wpad // 4)))
    dwords = dwords.reshape(B, wrows, V)

    hdr = jnp.stack([
        n_tok_eff,
        jax.lax.shift_right_logical(dw_start, jnp.int32(2)),
        raw, jnp.zeros((B,), jnp.int32)], axis=1).astype(jnp.int32)
    ltab = jnp.concatenate([lcount, lfirst, loffset], axis=1).astype(jnp.int32)
    dtab = jnp.concatenate([dcount, dfirst, doffset], axis=1).astype(jnp.int32)
    dpad = jnp.pad(D, ((0, 0), (0, V - N_LANES))).reshape(B, 1, V)

    with jax.enable_x64(False):
        toks, sp_fin, perr = pl.pallas_call(
            functools.partial(_parse_kernel, R_cap, (wrows - 2) * V),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # hdr (B, 4)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # ltab (B, 48)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # dtab (B, 48)
                pl.BlockSpec((1, 1, V), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # D
                pl.BlockSpec((1, 288, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # lsor
                pl.BlockSpec((1, 32, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # dsor
                pl.BlockSpec((1, wrows, V), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # stream dwords
            ],
            out_specs=[
                pl.BlockSpec((1, R_cap, V), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, R_cap, V), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            interpret=interpret,
        )(hdr, ltab, dtab, dpad,
          lsor.reshape(B, 288, 1).astype(jnp.int32),
          dsor.reshape(B, 32, 1).astype(jnp.int32), dwords)

    scan_err = (perr & 1) != 0
    taken_ok = (perr & 2) == 0

    # dense token stream for the executor: 32 valid lanes per round.  The
    # singleton middle axis keeps the Mosaic block-shape rule satisfied for
    # the (1, 1, SLAB) SMEM slab blocks (last two dims must be divisible by
    # (8, 128) or equal the array dims).
    n_slabs = max(1, -(-n_tok_cap // SLAB))
    tok_dense = toks[:, :, :N_LANES].reshape(B, R_cap * N_LANES)
    tok_dense = jnp.pad(tok_dense,
                        ((0, 0), (0, n_slabs * SLAB - R_cap * N_LANES)))
    tok_dense = tok_dense.reshape(B, 1, n_slabs * SLAB)

    hdr2 = jnp.stack([
        n_tok_eff, jnp.zeros((B,), jnp.int32), raw,
        jnp.zeros((B,), jnp.int32)], axis=1).astype(jnp.int32)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK
    with jax.enable_x64(False):
        out_lanes, op_fin, derr = pl.pallas_call(
            functools.partial(_exec_kernel, out_cap, n_slabs),
            grid=(B, n_slabs),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # hdr2 (B, 4)
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),   # tokens slab
            ],
            out_specs=[
                pl.BlockSpec((1, out_rows, bc.BLK), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
            interpret=interpret,
        )(hdr2, tok_dense)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]

    # final composition — mirrors formats/gdeflate.decode_chunk exactly:
    # err (scan codes + match distances) gates TOO_SMALL; everything else
    # is an ok-level condition that falls through to CANNOT_DECOMPRESS
    err = jnp.logical_or(scan_err, derr != 0)
    ok = jnp.logical_and(btype != 0, btype <= 2)
    ok = jnp.logical_and(ok, jnp.logical_not(err))
    ok = jnp.logical_and(ok, op_fin == raw)
    ok = jnp.logical_and(ok, raw <= out_cap)
    ok = jnp.logical_and(ok, n_tok <= out_cap)
    ok = jnp.logical_and(ok, tbl_ok)
    ok = jnp.logical_and(ok, taken_ok)
    ok = jnp.logical_and(ok, comp_sizes >= dw_start + 4 * sp_fin)

    is_stored = btype == 0
    stored_ok = jnp.logical_and(is_stored, raw <= out_cap)
    stored_ok = jnp.logical_and(stored_ok, comp_sizes >= HDR + raw)
    pad_in = jnp.pad(comp, ((0, 0), (0, max(0, HDR + out_cap - comp_cap))))
    stored_out = pad_in[:, HDR:HDR + out_cap].astype(jnp.uint8)

    too_big = jnp.logical_and(jnp.logical_not(is_stored),
                              jnp.logical_and(jnp.logical_not(err),
                                              raw > out_cap))
    good = jnp.where(is_stored, stored_ok, ok)
    osz = jnp.where(good, jnp.clip(raw, 0, out_cap), 0).astype(jnp.int32)
    stat = jnp.where(
        good, jnp.int32(Status.SUCCESS),
        jnp.where(too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                  jnp.int32(Status.ERROR_CANNOT_DECOMPRESS)))

    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(is_stored[:, None], stored_out, out.astype(jnp.uint8))
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
