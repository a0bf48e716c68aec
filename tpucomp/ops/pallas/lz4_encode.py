"""Pallas/Mosaic LZ4 block encoder: SMEM hash-table match finder.

The TPU analog of the reference's compress kernel (one block per chunk with
hash-table match finding, ``doc/algorithms_overview.md:50-52``): the scalar
core runs the classic LZ4-fast scan — hash 4 bytes, probe a 4096-entry SMEM
table, verify, extend — while match extension compares 128-byte VPU windows
(XOR + first-mismatch reduce) and literal runs move as wild-block copies.
Output bytes are emitted in ascending order as wild stores, so each later
write cleans the previous one's overshoot.

End-of-block rules honored (last 5 bytes literal, no match starting within
the last 12 bytes — ``CHANGELOG.md:195-196``); output is standard LZ4 block
format, bit-exact round-trippable by liblz4.

The hash table lives in SMEM scratch and persists across grid steps; an
epoch offset (``chunk_index * EPOCH``) distinguishes stale entries, so only
the first chunk pays the 4096-entry clear.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.ops.pallas import bytecopy as bc

HASH_LOG = 12
HASH_SIZE = 1 << HASH_LOG
MIN_MATCH = 4
MF_LIMIT = 12       # no match starts within the last 12 bytes
LAST_LITERALS = 5   # matches end at least 5 bytes before the block end
SKIP_TRIGGER = 6    # acceleration: step = 1 + (misses >> SKIP_TRIGGER)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int, epoch_stride: int,
            size_ref, words_ref, lanes_ref, out_ref, osize_ref, stat_ref,
            table_ref):
    b = pl.program_id(0)
    size = size_ref[b]
    epoch = b * epoch_stride

    # first grid step: clear the persistent SMEM table
    @pl.when(b == 0)
    def _():
        def clr(i, c):
            table_ref[i] = jnp.int32(0)
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(HASH_SIZE), clr,
                          jnp.int32(0), unroll=False)

    def load32(i):
        # i is always in [0, size): ip < mflimit and cand < ip, and the
        # wrapper pads one word past the chunk cap, so no clip is needed.
        wi = i >> 2
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        # double shift: (w1 << (31-sh)) << 1 == w1 << (32-sh), and == 0 when
        # sh == 0 — avoids the select a single (32-sh)&31 shift would need
        hi = jax.lax.shift_left(jax.lax.shift_left(w1, 31 - sh), jnp.int32(1))
        return lo | hi

    def hash4(v):
        return jax.lax.shift_right_logical(v * jnp.int32(-1640531535),
                                           jnp.int32(32 - HASH_LOG))

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, bc.BLK), 1)

    # Hybrid match extension.  Short matches (the common case: ~7 bytes past
    # MIN_MATCH on mixed data) are extended with scalar 4-byte word compares —
    # no vector->scalar transfer, whose latency dominated the v1 kernel on
    # match-dense data.  Only a match that survives 32 bytes falls through to
    # the 128-byte VPU window loop (long-run data like the zeros ladder).
    SCALAR_CAP = 32

    def match_len(a, c, cap_n):
        """Length of the common prefix of input[a..] and input[c..], <= cap_n."""
        def s_cond(s):
            l, go = s
            return go

        def s_body(s):
            l, _ = s
            x = load32(a + l) ^ load32(c + l)
            eq4 = x == 0
            # first differing byte of a nonzero xor (little-endian)
            sub = ((x & 0xFF) == 0).astype(jnp.int32) \
                + ((x & 0xFFFF) == 0).astype(jnp.int32) \
                + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
            l2 = l + jnp.where(eq4, jnp.int32(4), sub)
            go = jnp.logical_and(eq4, jnp.logical_and(l2 < cap_n,
                                                      l2 < SCALAR_CAP))
            return l2, go

        l, _ = jax.lax.while_loop(s_cond, s_body,
                                  (jnp.int32(0), cap_n > 0))
        # l advances in 4s until the first mismatch, so l >= SCALAR_CAP means
        # the first 32 bytes matched exactly — continue with vector windows
        def v_tail(l0):
            def cond(s):
                l, first = s
                return jnp.logical_and(first == bc.BLK, l < cap_n)

            def body(s):
                l, _ = s
                wa = bc.window128(lanes_ref, a + l)
                wc = bc.window128(lanes_ref, c + l)
                neq = wa != wc
                idx = jnp.min(jnp.where(neq, lane_i, jnp.int32(bc.BLK)),
                              keepdims=True)[0, 0]
                return l + idx, idx

            l, _ = jax.lax.while_loop(cond, body, (l0, jnp.int32(bc.BLK)))
            return l

        l = jax.lax.cond(l >= SCALAR_CAP, v_tail, lambda l0: l0, l)
        return jnp.minimum(l, cap_n)

    def wr_byte(o, v):
        bc.store128_wild(out_ref, o, jnp.broadcast_to(v, (1, bc.BLK)).astype(jnp.int32))

    def wr2(o, lo, hi):
        v = jnp.where(lane_i == 0, lo, hi).astype(jnp.int32)
        bc.store128_wild(out_ref, o, v)

    def wr_ext(o, k):
        """LZ4 length extension: 255-bytes then the remainder."""
        def cond(s):
            o2, k2 = s
            return k2 >= 255

        def body(s):
            o2, k2 = s
            wr_byte(o2, jnp.int32(255))
            return o2 + 1, k2 - 255

        o, k = jax.lax.while_loop(cond, body, (o, k))
        wr_byte(o, k)
        return o + 1

    def emit_seq(op, anchor, ll, ml, off):
        """One sequence: token, lit-ext, literals, offset, match-ext.
        ml == 0 encodes the final literal-only token (no offset fields)."""
        tok = (jnp.minimum(ll, 15) << 4) | jnp.minimum(jnp.maximum(ml - 4, 0), 15)
        wr_byte(op, tok)
        op = op + 1
        op = jax.lax.cond(ll >= 15, lambda o: wr_ext(o, ll - 15),
                          lambda o: o, op)

        @pl.when(ll > 0)
        def _():
            bc.copy_bytes(lanes_ref, out_ref, anchor, op, ll)

        op = op + ll

        def with_match(o):
            wr2(o, off & 0xFF, jax.lax.shift_right_logical(off, jnp.int32(8)))
            o = o + 2
            return jax.lax.cond(ml - 4 >= 15, lambda o2: wr_ext(o2, ml - 19),
                                lambda o2: o2, o)

        return jax.lax.cond(ml > 0, with_match, lambda o: o, op)

    def emit_fast(op, anchor, ll, ml, off):
        """Whole short sequence (ll < 15, ml-4 < 15, 1+ll+2 <= 128 bytes) as
        ONE composed vector and ONE wild store: literals rolled up a lane with
        the token blended at lane 0 and the offset at lanes 1+ll, 2+ll."""
        tok = (ll << 4) | (ml - 4)
        w = pltpu.roll(bc.window128(lanes_ref, anchor), 1, axis=1)
        seq = jnp.where(lane_i == 0, tok, w)
        seq = jnp.where(lane_i == 1 + ll, off & 0xFF, seq)
        seq = jnp.where(lane_i == 2 + ll,
                        jax.lax.shift_right_logical(off, jnp.int32(8)), seq)
        bc.store128_wild(out_ref, op, seq)
        return op + 3 + ll

    mflimit = size - MF_LIMIT
    match_cap_end = size - LAST_LITERALS

    def loop_cond(s):
        ip, anchor, op, misses = s
        return ip < mflimit

    def loop_body(s):
        ip, anchor, op, misses = s
        v = load32(ip)
        h = hash4(v)
        cand_raw = table_ref[h]
        table_ref[h] = epoch + ip + 1
        cand = cand_raw - epoch - 1
        # cheap plausibility gate first: the dependent load32(cand) (two SMEM
        # loads behind the table load) only runs inside the branch, keeping it
        # off the miss path entirely (pure-scan data never pays it)
        plausible = jnp.logical_and(cand_raw > epoch, ip - cand <= 65535)

        def take(a):
            ip, anchor, op, _ = a
            ml = MIN_MATCH + match_len(ip + MIN_MATCH, cand + MIN_MATCH,
                                       match_cap_end - (ip + MIN_MATCH))
            ll = ip - anchor
            fast = jnp.logical_and(ll < 15, ml - 4 < 15)
            op2 = jax.lax.cond(
                fast,
                lambda o: emit_fast(o, anchor, ll, ml, ip - cand),
                lambda o: emit_seq(o, anchor, ll, ml, ip - cand), op)
            ip2 = ip + ml
            # seed the table inside the match tail for better chaining
            h2 = hash4(load32(ip2 - 2))
            table_ref[h2] = epoch + ip2 - 2 + 1
            return ip2, ip2, op2, jnp.int32(0)

        def skip(a):
            ip, anchor, op, misses = a
            step = 1 + jax.lax.shift_right_logical(misses, jnp.int32(SKIP_TRIGGER))
            return ip + step, anchor, op, misses + 1

        def probe(a):
            good = load32(cand) == v
            return jax.lax.cond(good, take, skip, a)

        return jax.lax.cond(plausible, probe, skip, (ip, anchor, op, misses))

    ip0 = jnp.int32(0)
    _, anchor, op, _ = jax.lax.while_loop(
        loop_cond, loop_body, (ip0, ip0, ip0, ip0))

    # final literal-only sequence (mandatory, even when empty: token 0x00)
    op = emit_seq(op, anchor, size - anchor, jnp.int32(0), jnp.int32(0))

    too_big = op > out_cap
    osize_ref[b] = jnp.where(too_big, jnp.int32(0), op)
    stat_ref[b] = jnp.where(too_big,
                            jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                            jnp.int32(Status.SUCCESS))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched LZ4 encode, Pallas backend.  Same output contract as
    :func:`tpucomp.formats.lz4.compress_batch` (standard LZ4 block format;
    the exact token choice differs — both round-trip through liblz4)."""
    B, cap = data.shape
    # epoch stride > cap + 1 so stale table entries from earlier chunks are
    # distinguishable; B * stride must stay inside int32
    epoch_stride = 1 << max(18, (cap + 2).bit_length())
    assert B * epoch_stride < 2**31, "batch too large for the epoch stride"

    wpad = _round_up(max(cap, 8), 4) + 4
    cw = jnp.pad(data, ((0, 0), (0, wpad - cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    lpad = _round_up(cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(data, ((0, 0), (0, lpad - cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    # Size the physical buffer to the LZ4 worst-case bound so kernel writes
    # never leave it even when the caller's out_cap is too small — the kernel
    # flags ERROR_OUTPUT_BUFFER_TOO_SMALL against out_cap afterwards instead
    # of guarding every store.
    buf_cap = max(out_cap, cap + cap // 255 + 16)
    out_rows = (_round_up(buf_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4, epoch_stride),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
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
            scratch_shapes=[pltpu.SMEM((HASH_SIZE,), jnp.int32)],
            interpret=interpret,
        )(sizes.astype(jnp.int32), words, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
