"""Pallas/Mosaic Snappy encoder: SMEM hash-table match finder.

Same scan core as :mod:`.lz4_encode` (the TPU analog of the reference's
per-threadblock compress kernel, ``doc/algorithms_overview.md:50-52``):
hash 4 bytes, probe a 4096-entry SMEM table (epoch-tagged so only the first
chunk clears it), verify, extend with scalar word compares falling through to
128-byte VPU windows for long runs.  Emission is Snappy block format
(varint preamble, literal tags, copy-2 elements split at 64 bytes per the
format, with the reference encoder's 60-byte remainder trick) — streams are
bit-exact round-trippable by libsnappy.

The common short sequence (literal run <= 59 + one copy) is composed into a
single 128-byte vector and written with ONE wild store.
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
MF_LIMIT = 12       # stop scanning this close to the end (tail goes literal)
SKIP_TRIGGER = 6    # acceleration: step = 1 + (misses >> SKIP_TRIGGER)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int, epoch_stride: int,
            size_ref, words_ref, lanes_ref, out_ref, osize_ref, stat_ref,
            table_ref):
    b = pl.program_id(0)
    size = size_ref[b]
    epoch = b * epoch_stride

    @pl.when(b == 0)
    def _():
        def clr(i, c):
            table_ref[i] = jnp.int32(0)
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(HASH_SIZE), clr,
                          jnp.int32(0), unroll=False)

    def load32(i):
        wi = i >> 2
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w1, 31 - sh), jnp.int32(1))
        return lo | hi

    def hash4(v):
        return jax.lax.shift_right_logical(v * jnp.int32(-1640531535),
                                           jnp.int32(32 - HASH_LOG))

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, bc.BLK), 1)

    SCALAR_CAP = 32

    def match_len(a, c, cap_n):
        def s_cond(s):
            l, go = s
            return go

        def s_body(s):
            l, _ = s
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
        bc.store128_wild(out_ref, o,
                         jnp.broadcast_to(v, (1, bc.BLK)).astype(jnp.int32))

    def emit_literals(op, anchor, ll):
        """Snappy literal element: varint tag (1-3 length bytes for runs up to
        16 MiB) + the literal bytes."""
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
        """(tag, element_length): copy-1 (2 bytes) when off < 2048 and
        4 <= ml <= 11, else copy-2 (3 bytes)."""
        c1 = jnp.logical_and(off < 2048,
                             jnp.logical_and(ml >= 4, ml <= 11))
        tag = jnp.where(
            c1,
            jnp.int32(1) | ((ml - 4) << 2)
            | (jax.lax.shift_right_logical(off, jnp.int32(8)) << 5),
            jnp.int32(2) | ((ml - 1) << 2))
        return tag, jnp.where(c1, jnp.int32(2), jnp.int32(3))

    def emit_copy2(op, off, ml):
        """One copy element, 4 <= ml <= 64, off < 65536; the third byte is
        wild junk for copy-1 (overwritten by the next store)."""
        tag, elen = _copy_tag(off, ml)
        v = jnp.where(lane_i == 0, tag,
                      jnp.where(lane_i == 1, off & 0xFF,
                                jax.lax.shift_right_logical(off, jnp.int32(8))))
        bc.store128_wild(out_ref, op, v.astype(jnp.int32))
        return op + elen

    def emit_copy(op, off, ml):
        """Split a long match per the reference encoder: 64s while >= 68,
        then a 60-byte element if > 64, then the 4..64 remainder."""
        def cond(s):
            o, m = s
            return m >= 68

        def body(s):
            o, m = s
            return emit_copy2(o, off, jnp.int32(64)), m - 64

        op, ml = jax.lax.while_loop(cond, body, (op, ml))
        op, ml = jax.lax.cond(
            ml > 64,
            lambda s: (emit_copy2(s[0], off, jnp.int32(60)), s[1] - 60),
            lambda s: s, (op, ml))
        return emit_copy2(op, off, ml)

    def emit_fast(op, anchor, ll, ml, off):
        """[1-byte literal tag +] literals + copy-2, one composed wild store.
        Requires ll <= 59 and 4 <= ml <= 64 (and so hdr+ll+3 <= 63+3 < 128)."""
        hdr = (ll > 0).astype(jnp.int32)
        tag, elen = _copy_tag(off, ml)
        w = pltpu.roll(bc.window128(lanes_ref, anchor), hdr, axis=1)
        seq = jnp.where(lane_i == hdr - 1, (ll - 1) << 2, w)  # no lane if hdr=0
        p = hdr + ll
        seq = jnp.where(lane_i == p, tag, seq)
        seq = jnp.where(lane_i == p + 1, off & 0xFF, seq)
        seq = jnp.where(lane_i == p + 2,
                        jax.lax.shift_right_logical(off, jnp.int32(8)), seq)
        bc.store128_wild(out_ref, op, seq)
        return op + p + elen

    # ---- varint32 preamble (uncompressed length) --------------------------
    def pre_cond(s):
        o, n = s
        return n >= 0x80

    def pre_body(s):
        o, n = s
        wr_byte(o, (n & 0x7F) | 0x80)
        return o + 1, jax.lax.shift_right_logical(n, jnp.int32(7))

    op0, rem = jax.lax.while_loop(pre_cond, pre_body, (jnp.int32(0), size))
    wr_byte(op0, rem)
    op0 = op0 + 1

    mflimit = size - MF_LIMIT

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
        plausible = jnp.logical_and(cand_raw > epoch, ip - cand <= 65535)

        def take(a):
            ip, anchor, op, _ = a
            ml = MIN_MATCH + match_len(ip + MIN_MATCH, cand + MIN_MATCH,
                                       size - (ip + MIN_MATCH))
            ll = ip - anchor
            fast = jnp.logical_and(ll <= 59, ml <= 64)
            off = ip - cand

            def slow(o):
                o = jax.lax.cond(ll > 0,
                                 lambda o2: emit_literals(o2, anchor, ll),
                                 lambda o2: o2, o)
                return emit_copy(o, off, ml)

            op2 = jax.lax.cond(fast,
                               lambda o: emit_fast(o, anchor, ll, ml, off),
                               slow, op)
            ip2 = ip + ml
            h2 = hash4(load32(ip2 - 2))
            table_ref[h2] = epoch + ip2 - 2 + 1
            return ip2, ip2, op2, jnp.int32(0)

        def skip(a):
            ip, anchor, op, misses = a
            step = 1 + jax.lax.shift_right_logical(misses,
                                                   jnp.int32(SKIP_TRIGGER))
            return ip + step, anchor, op, misses + 1

        def probe(a):
            good = load32(cand) == v
            return jax.lax.cond(good, take, skip, a)

        return jax.lax.cond(plausible, probe, skip, (ip, anchor, op, misses))

    ip0 = jnp.int32(0)
    _, anchor, op, _ = jax.lax.while_loop(
        loop_cond, loop_body, (ip0, ip0, op0, ip0))

    # trailing literals (Snappy has no terminal-token rule; just flush)
    op = jax.lax.cond(size - anchor > 0,
                      lambda o: emit_literals(o, anchor, size - anchor),
                      lambda o: o, op)

    too_big = op > out_cap
    osize_ref[b] = jnp.where(too_big, jnp.int32(0), op)
    stat_ref[b] = jnp.where(too_big,
                            jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                            jnp.int32(Status.SUCCESS))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched Snappy encode, Pallas backend.  Same output contract as
    :func:`tpucomp.formats.snappy.compress_batch` (standard Snappy block
    format; token choice differs — both round-trip through libsnappy)."""
    B, cap = data.shape
    epoch_stride = 1 << max(18, (cap + 2).bit_length())
    assert B * epoch_stride < 2**31, "batch too large for the epoch stride"

    wpad = _round_up(max(cap, 8), 4) + 4
    cw = jnp.pad(data, ((0, 0), (0, wpad - cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    lpad = _round_up(cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(data, ((0, 0), (0, lpad - cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    # snappy_max_compressed_length bound: size the physical buffer so kernel
    # writes are memory-safe even when the caller's out_cap is too small
    buf_cap = max(out_cap, 32 + cap + cap // 6)
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
