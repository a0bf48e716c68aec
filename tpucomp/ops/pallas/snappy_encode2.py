"""Pallas Snappy encoder v2: sort-matched candidates, token-rate scalar walk.

Snappy twin of :mod:`.lz4_encode2`: match finding comes from the vector sort
pass (:mod:`tpucomp.ops.match`), so the scalar core walks at token rate —
O(1) jumps over literal runs, guaranteed >=4-byte candidates (no verify
load), back-extension into pending literals.  Emission is the same Snappy
block grammar as the v1 hash-table kernel (:mod:`.snappy_encode`): varint
preamble, literal tags, copy-1/copy-2 elements with the reference encoder's
64/60-byte long-match split, short sequences composed into one wild store.
Streams round-trip bit-exactly through libsnappy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.ops import match as vmatch
from tpucomp.ops.pallas import bytecopy as bc

MIN_MATCH = 4
SLAB = 4096


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int, n_slabs: int,
            size_ref, words_ref, cand_ref, cand8_ref, nxt_ref, lanes_ref,
            out_ref, osize_ref, stat_ref, st_ref):
    b = pl.program_id(0)
    s = pl.program_id(1)
    size = size_ref[b]
    base = s * SLAB
    wend = base + SLAB
    mflimit = size - MIN_MATCH + 1

    def load32(i):
        wi = i >> 2
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w1, 31 - sh), jnp.int32(1))
        return lo | hi

    def getb(i):
        ic = jnp.clip(i, jnp.int32(0), jnp.int32(4 * w_words - 1))
        w = words_ref[0, 0, ic >> 2]
        return (w >> ((i & 3) * 8)) & 0xFF

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, bc.BLK), 1)
    SCALAR_CAP = 32

    def match_len(a, c, cap_n):
        def s_cond(st):
            l, go = st
            return go

        def s_body(st):
            l, _ = st
            x = load32(a + l) ^ load32(c + l)
            eq4 = x == 0
            sub = ((x & 0xFF) == 0).astype(jnp.int32) \
                + ((x & 0xFFFF) == 0).astype(jnp.int32) \
                + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
            l2 = l + jnp.where(eq4, jnp.int32(4), sub)
            go = jnp.logical_and(eq4, jnp.logical_and(l2 < cap_n,
                                                      l2 < SCALAR_CAP))
            return l2, go

        l, _ = jax.lax.while_loop(s_cond, s_body, (jnp.int32(0), cap_n > 0))

        def v_tail(l0):
            def cond(st):
                l, first = st
                return jnp.logical_and(first == bc.BLK, l < cap_n)

            def body(st):
                l, _ = st
                wa = bc.window128(lanes_ref, a + l)
                wc = bc.window128(lanes_ref, c + l)
                neq = wa != wc
                idx = jnp.min(jnp.where(neq, lane_i, jnp.int32(bc.BLK)),
                              keepdims=True)[0, 0]
                return l + idx, idx

            l2, _ = jax.lax.while_loop(cond, body, (l0, jnp.int32(bc.BLK)))
            return l2

        l = jax.lax.cond(l >= SCALAR_CAP, v_tail, lambda l0: l0, l)
        return jnp.minimum(l, cap_n)

    def wr_byte(o, v):
        bc.store128_wild(out_ref, o,
                         jnp.broadcast_to(v, (1, bc.BLK)).astype(jnp.int32))

    def emit_literals(op, anchor, ll):
        def tag1(o):
            wr_byte(o, (ll - 1) << 2)
            return o + 1

        def tag2(o):
            v = jnp.where(lane_i == 0, jnp.int32(60 << 2), ll - 1)
            bc.store128_wild(out_ref, o, v.astype(jnp.int32))
            return o + 2

        def tag3(o):
            n = ll - 1
            v = jnp.where(lane_i == 0, jnp.int32(61 << 2),
                          jnp.where(lane_i == 1, n & 0xFF,
                                    jax.lax.shift_right_logical(
                                        n, jnp.int32(8)) & 0xFF))
            bc.store128_wild(out_ref, o, v.astype(jnp.int32))
            return o + 3

        def tag4(o):
            n = ll - 1
            v = jnp.where(
                lane_i == 0, jnp.int32(62 << 2),
                jnp.where(lane_i == 1, n & 0xFF,
                          jnp.where(lane_i == 2,
                                    jax.lax.shift_right_logical(
                                        n, jnp.int32(8)) & 0xFF,
                                    jax.lax.shift_right_logical(
                                        n, jnp.int32(16)) & 0xFF)))
            bc.store128_wild(out_ref, o, v.astype(jnp.int32))
            return o + 4

        op = jax.lax.cond(
            ll <= 60, tag1,
            lambda o: jax.lax.cond(
                ll <= 256, tag2,
                lambda o2: jax.lax.cond(ll <= 65536, tag3, tag4, o2), o), op)
        bc.copy_bytes(lanes_ref, out_ref, anchor, op, ll)
        return op + ll

    def _copy_tag(off, ml):
        c1 = jnp.logical_and(off < 2048,
                             jnp.logical_and(ml >= 4, ml <= 11))
        tag = jnp.where(
            c1,
            jnp.int32(1) | ((ml - 4) << 2)
            | (jax.lax.shift_right_logical(off, jnp.int32(8)) << 5),
            jnp.int32(2) | ((ml - 1) << 2))
        return tag, jnp.where(c1, jnp.int32(2), jnp.int32(3))

    def emit_copy2(op, off, ml):
        tag, elen = _copy_tag(off, ml)
        v = jnp.where(lane_i == 0, tag,
                      jnp.where(lane_i == 1, off & 0xFF,
                                jax.lax.shift_right_logical(off,
                                                            jnp.int32(8))))
        bc.store128_wild(out_ref, op, v.astype(jnp.int32))
        return op + elen

    def emit_copy(op, off, ml):
        def cond(st):
            o, m = st
            return m >= 68

        def body(st):
            o, m = st
            return emit_copy2(o, off, jnp.int32(64)), m - 64

        op, ml = jax.lax.while_loop(cond, body, (op, ml))
        op, ml = jax.lax.cond(
            ml > 64,
            lambda st: (emit_copy2(st[0], off, jnp.int32(60)), st[1] - 60),
            lambda st: st, (op, ml))
        return emit_copy2(op, off, ml)

    def emit_fast(op, anchor, ll, ml, off):
        hdr = (ll > 0).astype(jnp.int32)
        tag, elen = _copy_tag(off, ml)
        w = pltpu.roll(bc.window128(lanes_ref, anchor), hdr, axis=1)
        seq = jnp.where(lane_i == hdr - 1, (ll - 1) << 2, w)
        p = hdr + ll
        seq = jnp.where(lane_i == p, tag, seq)
        seq = jnp.where(lane_i == p + 1, off & 0xFF, seq)
        seq = jnp.where(lane_i == p + 2,
                        jax.lax.shift_right_logical(off, jnp.int32(8)), seq)
        bc.store128_wild(out_ref, op, seq)
        return op + p + elen

    @pl.when(s == 0)
    def _():
        def pre_cond(st):
            o, n = st
            return n >= 0x80

        def pre_body(st):
            o, n = st
            wr_byte(o, (n & 0x7F) | 0x80)
            return o + 1, jax.lax.shift_right_logical(n, jnp.int32(7))

        op0, rem = jax.lax.while_loop(pre_cond, pre_body,
                                      (jnp.int32(0), size))
        wr_byte(op0, rem)
        st_ref[0] = jnp.int32(0)     # anchor
        st_ref[1] = jnp.int32(0)     # scan
        st_ref[2] = op0 + 1          # op

    def wcond(carry):
        anchor, scan, op, cont = carry
        return cont

    def wbody(carry):
        anchor, scan, op, _ = carry
        nm = nxt_ref[0, 0, scan - base]

        def take(a):
            anchor, scan, op = a
            # two candidates (4-byte chain + 8-byte-prefix sort neighbor):
            # extend both forward, keep the longer match
            c4p = cand_ref[0, 0, nm - base]
            c8p = cand8_ref[0, 0, nm - base]
            p4 = jnp.where(c4p >= 0, c4p, c8p)
            p8 = jnp.where(c8p >= 0, c8p, p4)
            fcap = size - (nm + MIN_MATCH)
            l4 = match_len(nm + MIN_MATCH, p4 + MIN_MATCH, fcap)
            l8 = jax.lax.cond(
                p8 != p4,
                lambda _: match_len(nm + MIN_MATCH, p8 + MIN_MATCH, fcap),
                lambda _: l4, 0)
            srcw = jnp.where(l8 > l4, p8, p4)
            c = nm - srcw
            src = srcw

            def bcond(st2):
                nm2, src2 = st2
                return jnp.logical_and(
                    jnp.logical_and(nm2 > anchor, src2 > 0),
                    getb(nm2 - 1) == getb(src2 - 1))

            def bbody(st2):
                nm2, src2 = st2
                return nm2 - 1, src2 - 1

            nm2, src2 = jax.lax.while_loop(bcond, bbody, (nm, src))
            ml = (nm - nm2) + MIN_MATCH + jnp.maximum(l4, l8)
            ll = nm2 - anchor
            fast = jnp.logical_and(ll <= 59, ml <= 64)

            def slow(o):
                o = jax.lax.cond(ll > 0,
                                 lambda o2: emit_literals(o2, anchor, ll),
                                 lambda o2: o2, o)
                return emit_copy(o, c, ml)

            op2 = jax.lax.cond(fast,
                               lambda o: emit_fast(o, anchor, ll, ml, c),
                               slow, op)
            nip = nm2 + ml
            return nip, nip, op2

        in_win = nm < wend
        usable = jnp.logical_and(in_win, nm < mflimit)
        anchor, scan, op = jax.lax.cond(
            usable, take,
            lambda a: (a[0], jnp.where(in_win, size, nm), a[2]),
            (anchor, scan, op))
        cont = jnp.logical_and(scan < wend, scan < mflimit)
        scan = jnp.where(scan < mflimit, scan, jnp.maximum(scan, size))
        return anchor, scan, op, cont

    anchor0, scan0, op0 = st_ref[0], st_ref[1], st_ref[2]
    run = jnp.logical_and(scan0 < wend, jnp.logical_and(scan0 >= base,
                                                        scan0 < mflimit))
    anchor, scan, op, _ = jax.lax.while_loop(
        wcond, wbody, (anchor0, jnp.maximum(scan0, base), op0, run))
    anchor = jnp.where(run, anchor, anchor0)
    scan = jnp.where(run, scan, scan0)
    op = jnp.where(run, op, op0)
    st_ref[0], st_ref[1], st_ref[2] = anchor, scan, op

    @pl.when(s == n_slabs - 1)
    def _():
        opf = jax.lax.cond(size - anchor > 0,
                           lambda o: emit_literals(o, anchor, size - anchor),
                           lambda o: o, op)
        too_big = opf > out_cap
        osize_ref[b] = jnp.where(too_big, jnp.int32(0), opf)
        stat_ref[b] = jnp.where(
            too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
            jnp.int32(Status.SUCCESS))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched Snappy encode, sort-matched Pallas backend.  Same contract as
    :func:`.snappy_encode.compress_batch` (standard Snappy block format)."""
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)

    cand, cand8, nxt = vmatch.candidates2(data, sizes)
    n_slabs = max(1, -(-cap // SLAB))
    pad_to = n_slabs * SLAB
    cand = jnp.pad(cand, ((0, 0), (0, pad_to - cap)), constant_values=-1)
    cand8 = jnp.pad(cand8, ((0, 0), (0, pad_to - cap)), constant_values=-1)
    nxt = jnp.pad(jnp.minimum(nxt, pad_to - 1),
                  ((0, 0), (0, pad_to - cap)), constant_values=pad_to - 1)
    cand = cand.reshape(B, 1, pad_to)
    cand8 = cand8.reshape(B, 1, pad_to)
    nxt = nxt.reshape(B, 1, pad_to)

    wpad = _round_up(max(cap, 8), 4) + 4
    cw = jnp.pad(data, ((0, 0), (0, wpad - cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = (cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16)
             | (cw[..., 3] << 24))

    lpad = _round_up(cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(data, ((0, 0), (0, lpad - cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    buf_cap = max(out_cap, 32 + cap + cap // 6)
    out_rows = (_round_up(buf_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4, n_slabs),
            grid=(B, n_slabs),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, wpad // 4), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, lpad // bc.BLK, bc.BLK),
                             lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
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
            scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
            interpret=interpret,
        )(sizes, words, cand, cand8, nxt, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
