"""Vectorized frame-of-reference bit-packing (the Cascaded "BP" stage).

TPU-native replacement for the reference's CUB-based bitpack pass
(``doc/algorithms_overview.md:25-36``: subtract min, pack to ``ceil(log2(range))``
bits).  Widths are EXACT (0..64 bits): a value shifted into place spans at most
three 32-bit words, emitted as non-overlapping scatter-OR contributions; unpack
reads the same three words back.  Both sides are fully vectorized with traced
(data-dependent) widths.

All functions are per-stream with static capacities; callers ``vmap`` over chunks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpucomp.ops.parallel_lz import DUMP_SLOTS, dump_spread

# kept for format compatibility checks (any width 0..64 is legal in the
# container; the GENERAL decoder accepts all of them)
ALLOWED_BITS = tuple(range(65))

# The width ladder every encoder emits since round 4.  Each member has a
# static lcm(32, b)-bit group layout, which is what lets the TPU fast path
# (ops/cascaded_fast.py) pack/unpack with pure reshape+shift programs — no
# gathers, no scatters.  Rounding exact widths up into this set costs at most
# one step of the ladder (<= 33% on one stream, usually far less).
W32 = (0, 1, 2, 3, 4, 6, 8, 12, 16, 24, 32)
W64 = W32 + (40, 48, 64)


def round_width(bits, widths=W64):
    """Smallest member of ``widths`` >= bits (traced)."""
    out = jnp.full((), widths[-1], jnp.int32)
    for w in reversed(widths[:-1]):
        out = jnp.where(bits <= w, w, out)
    return out


def bit_length(x: jax.Array) -> jax.Array:
    """Exact bit length of a non-negative int64 scalar (0 for x<=0)."""
    x = x.astype(jnp.int64)
    total = jnp.zeros((), jnp.int32)
    for k in range(63):
        total = total + ((x >> k) > 0).astype(jnp.int32)
    return total


def round_bits_pow2(b: jax.Array) -> jax.Array:
    """Smallest power-of-two-ish width >= b (0,1,2,4,8,16,32,64) — used only by
    callers that want type-width raw storage (``use_bp=0``)."""
    out = jnp.full((), 64, jnp.int32)
    for cand in (32, 16, 8, 4, 2, 1, 0):
        out = jnp.where(b <= cand, cand, out)
    return out


def choose_width(v: jax.Array, count: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Frame-of-reference width selection over ``v[:count]``.

    Returns ``(min_val, bits)`` — int64 scalar minimum and the EXACT width such
    that every ``v[i] - min_val`` fits in ``bits`` bits.  If the range overflows
    int64 (values spanning more than 2^63), falls back to 64-bit raw.
    """
    v = v.astype(jnp.int64)
    idx = jnp.arange(v.shape[0])
    valid = idx < count
    big = jnp.int64(0x7FFFFFFFFFFFFFFF)
    vmin = jnp.min(jnp.where(valid, v, big))
    vmax = jnp.max(jnp.where(valid, v, -big - 1))
    vmin = jnp.where(count > 0, vmin, 0)
    vmax = jnp.where(count > 0, vmax, 0)
    rng = vmax - vmin
    overflow = rng < 0  # int64 wraparound
    bits = jnp.where(overflow, 64, bit_length(rng))
    vmin = jnp.where(overflow, 0, vmin)
    return vmin, bits


def packed_words(count: jax.Array, bits: jax.Array) -> jax.Array:
    """Number of uint32 words used by ``count`` values at width ``bits``."""
    return ((count.astype(jnp.int64) * bits + 31) // 32).astype(jnp.int32)


def _mask(bits: jax.Array) -> jax.Array:
    return jnp.where(bits >= 64, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                     (jnp.uint64(1) << jnp.uint64(jnp.clip(bits, 0, 63))) - 1)


def pack(v: jax.Array, count: jax.Array, vmin: jax.Array, bits: jax.Array,
         cap_words: int) -> jax.Array:
    """Pack ``(v[:count] - vmin)`` at exact width ``bits`` into uint32 words.

    Args:
      v: int64[cap] values (entries past ``count`` ignored).
      cap_words: static output capacity; must be >= 2 * cap + 2.

    Returns uint32[cap_words]; words past ``packed_words(count, bits)`` are zero.
    """
    cap = v.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int64)
    valid = idx < count
    b64 = bits.astype(jnp.int64)

    d = jax.lax.bitcast_convert_type(v.astype(jnp.int64) - vmin, jnp.uint64)
    d = d & _mask(bits)
    bitpos = idx * b64
    widx = (bitpos >> 5).astype(jnp.int32)
    sh = (bitpos & 31).astype(jnp.uint64)
    a_lo = d & jnp.uint64(0xFFFFFFFF)
    b_hi = d >> 32
    M32 = jnp.uint64(0xFFFFFFFF)
    w0 = ((a_lo << sh) & M32).astype(jnp.uint32)
    w1 = (((a_lo << sh) >> 32) | ((b_hi << sh) & M32)).astype(jnp.uint32)
    w2 = ((b_hi << sh) >> 32).astype(jnp.uint32)

    emit = jnp.logical_and(valid, bits > 0)
    pos32 = jnp.arange(cap, dtype=jnp.int32)
    words = jnp.zeros((cap_words + DUMP_SLOTS,), jnp.uint32)
    for off_k, part in ((0, w0), (1, w1), (2, w2)):
        tgt = jnp.where(emit, jnp.clip(widx + off_k, 0, cap_words - 1),
                        dump_spread(pos32, cap_words))
        words = words.at[tgt].add(part)
    return words[:cap_words]


def unpack(words: jax.Array, count_cap: int, bits: jax.Array,
           vmin: jax.Array) -> jax.Array:
    """Inverse of :func:`pack`: return int64[count_cap] values (+vmin applied).

    Entries past the original count decode to garbage; callers mask by count.
    """
    nw = words.shape[0]
    idx = jnp.arange(count_cap, dtype=jnp.int64)
    b64 = bits.astype(jnp.int64)

    bitpos = idx * b64
    widx = jnp.clip((bitpos >> 5).astype(jnp.int32), 0, nw - 1)
    sh = (bitpos & 31).astype(jnp.uint64)
    f0 = words[widx].astype(jnp.uint64)
    f1 = words[jnp.clip(widx + 1, 0, nw - 1)].astype(jnp.uint64)
    f2 = words[jnp.clip(widx + 2, 0, nw - 1)].astype(jnp.uint64)
    val = (f0 >> sh) | (f1 << (32 - sh))
    val = jnp.where(sh > 0, val | (f2 << (64 - sh)), val)
    raw = val & _mask(bits)
    raw = jnp.where(bits == 0, 0, raw)
    return jax.lax.bitcast_convert_type(raw, jnp.int64) + vmin
