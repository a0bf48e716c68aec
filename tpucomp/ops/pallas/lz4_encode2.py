"""Pallas LZ4 encoder v2: sort-matched candidates, token-rate scalar walk.

The v1 kernel (:mod:`.lz4_encode`) runs the classic per-byte hash-table scan
on the scalar core — a chain of dependent SMEM loads (probe -> verify ->
extend) at every input position.  This kernel moves match *finding* off the
scalar core entirely: the XLA candidate pass (:mod:`tpucomp.ops.match`)
sorts ``(word32, position)`` per chunk, which yields, for every position,
the nearest previous >=4-byte exact match plus a ``next_match`` suffix scan.
The scalar core then walks the chunk at TOKEN rate, not byte rate:

    scan -> nxt[scan]      (O(1) jump over the whole literal run)
         -> cand[nm]       (guaranteed match, no verify load)
         -> back-extend    (ip[-1]==src[-1] byte steps, bounded by anchor)
         -> forward-extend (scalar word compares, VPU windows past 32 B)
         -> emit           (single composed wild store for short sequences)

Candidate/next-match arrays stream through SMEM in slab-sized grid blocks
(the second grid dimension pipelines their DMA, as in the GDeflate
executor); input words sit whole-chunk in SMEM for extension loads, input
bytes whole-chunk in VMEM for 128-byte literal copies.

Output is standard LZ4 block format (end-of-block rules per
``CHANGELOG.md:195-196``), bit-exact decodable by liblz4; the exact token
choice differs from liblz4 (nearest-match greedy + back-extension — a
*better* parse than a 4096-entry hash table, so ratio is >= v1's).
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
MF_LIMIT = 12       # no match starts within the last 12 bytes
LAST_LITERALS = 5   # matches end at least 5 bytes before the block end
SLAB = 4096         # positions per grid block of the cand/nxt streams


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
    mflimit = size - MF_LIMIT
    match_cap_end = size - LAST_LITERALS

    @pl.when(s == 0)
    def _():
        st_ref[0] = jnp.int32(0)   # anchor (pending literal start)
        st_ref[1] = jnp.int32(0)   # scan cursor
        st_ref[2] = jnp.int32(0)   # op

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
        """Common-prefix length of input[a..]/input[c..], <= cap_n (same
        hybrid as lz4_encode: scalar words, VPU windows past 32 B)."""
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

    def wr_ext(o, k):
        def cond(st):
            o2, k2 = st
            return k2 >= 255

        def body(st):
            o2, k2 = st
            wr_byte(o2, jnp.int32(255))
            return o2 + 1, k2 - 255

        o, k = jax.lax.while_loop(cond, body, (o, k))
        wr_byte(o, k)
        return o + 1

    def emit_seq(op, anchor, ll, ml, off):
        tok = (jnp.minimum(ll, 15) << 4) | jnp.minimum(
            jnp.maximum(ml - 4, 0), 15)
        wr_byte(op, tok)
        op = op + 1
        op = jax.lax.cond(ll >= 15, lambda o: wr_ext(o, ll - 15),
                          lambda o: o, op)

        @pl.when(ll > 0)
        def _():
            bc.copy_bytes(lanes_ref, out_ref, anchor, op, ll)

        op = op + ll

        def with_match(o):
            v = jnp.where(lane_i == 0, off & 0xFF,
                          jax.lax.shift_right_logical(off, jnp.int32(8)))
            bc.store128_wild(out_ref, o, v.astype(jnp.int32))
            o = o + 2
            return jax.lax.cond(ml - 4 >= 15, lambda o2: wr_ext(o2, ml - 19),
                                lambda o2: o2, o)

        return jax.lax.cond(ml > 0, with_match, lambda o: o, op)

    def emit_fast(op, anchor, ll, ml, off):
        tok = (ll << 4) | (ml - 4)
        w = pltpu.roll(bc.window128(lanes_ref, anchor), 1, axis=1)
        seq = jnp.where(lane_i == 0, tok, w)
        seq = jnp.where(lane_i == 1 + ll, off & 0xFF, seq)
        seq = jnp.where(lane_i == 2 + ll,
                        jax.lax.shift_right_logical(off, jnp.int32(8)), seq)
        bc.store128_wild(out_ref, op, seq)
        return op + 3 + ll

    def wcond(st):
        anchor, scan, op, cont = st
        return cont

    def wbody(st):
        anchor, scan, op, _ = st
        nm = nxt_ref[0, 0, scan - base]

        def take(a):
            anchor, scan, op = a
            # two candidates (4-byte chain + 8-byte-prefix sort neighbor):
            # extend both forward, keep the longer match
            c4p = cand_ref[0, 0, nm - base]
            c8p = cand8_ref[0, 0, nm - base]
            p4 = jnp.where(c4p >= 0, c4p, c8p)
            p8 = jnp.where(c8p >= 0, c8p, p4)
            fcap = match_cap_end - (nm + MIN_MATCH)
            l4 = match_len(nm + MIN_MATCH, p4 + MIN_MATCH, fcap)
            l8 = jax.lax.cond(
                p8 != p4,
                lambda _: match_len(nm + MIN_MATCH, p8 + MIN_MATCH, fcap),
                lambda _: l4, 0)
            srcw = jnp.where(l8 > l4, p8, p4)
            c = nm - srcw   # offset (>=1, <=65535)
            src = srcw

            # back-extension: grow the match into the pending literals
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
            fast = jnp.logical_and(ll < 15, ml - 4 < 15)
            op2 = jax.lax.cond(
                fast,
                lambda o: emit_fast(o, anchor, ll, ml, c),
                lambda o: emit_seq(o, anchor, ll, ml, c), op)
            nip = nm2 + ml
            return nip, nip, op2

        # candidates at/after mflimit can't start a match: jump to the end
        in_win = nm < wend
        usable = jnp.logical_and(in_win, nm < mflimit)
        anchor, scan, op = jax.lax.cond(
            usable, take, lambda a: (a[0], jnp.where(in_win, size, nm), a[2]),
            (anchor, scan, op))
        cont = jnp.logical_and(scan < wend, scan < mflimit)
        # the walk may land mid-slab past mflimit; park the cursor at size
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
    st_ref[0] = anchor
    st_ref[1] = scan
    st_ref[2] = op

    @pl.when(s == n_slabs - 1)
    def _():
        # final literal-only sequence (mandatory, even when empty)
        opf = emit_seq(op, anchor, size - anchor, jnp.int32(0), jnp.int32(0))
        too_big = opf > out_cap
        osize_ref[b] = jnp.where(too_big, jnp.int32(0), opf)
        stat_ref[b] = jnp.where(
            too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
            jnp.int32(Status.SUCCESS))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched LZ4 encode, sort-matched Pallas backend.  Same contract as
    :func:`.lz4_encode.compress_batch` (standard LZ4 block format)."""
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)

    cand, cand8, nxt = vmatch.candidates2(data, sizes)
    n_slabs = max(1, -(-cap // SLAB))
    pad_to = n_slabs * SLAB
    # park out-of-range jumps at the very end of the (padded) position space
    cand = jnp.pad(cand, ((0, 0), (0, pad_to - cap)), constant_values=-1)
    cand8 = jnp.pad(cand8, ((0, 0), (0, pad_to - cap)), constant_values=-1)
    nxt = jnp.pad(jnp.minimum(nxt, pad_to - 1),
                  ((0, 0), (0, pad_to - cap)),
                  constant_values=pad_to - 1)
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

    buf_cap = max(out_cap, cap + cap // 255 + 16)
    out_rows = (_round_up(buf_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4, n_slabs),
            grid=(B, n_slabs),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes (B,)
                pl.BlockSpec((1, 1, wpad // 4), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.SMEM),   # words
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),   # cand slab
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),   # cand8 slab
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),   # nxt slab
                pl.BlockSpec((1, lpad // bc.BLK, bc.BLK),
                             lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # lanes
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
