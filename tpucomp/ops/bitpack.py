"""Vectorized frame-of-reference bit-packing (the Cascaded "BP" stage).

TPU-native replacement for the reference's CUB-based bitpack pass
(``doc/algorithms_overview.md:25-36``: subtract min, pack to ``ceil(log2(range))``
bits).  Widths are rounded up to a power of two (0/1/2/4/8/16/32/64) so that no
value straddles a 32-bit word and both pack and unpack stay fully vectorized with
*traced* (data-dependent) widths — pack is a non-overlapping scatter-add of shifted
contributions, unpack a single gather per element.  Width 64 is stored as two
32-bit planes (lo, hi interleaved), which doubles as the raw fallback.

All functions are per-stream with static capacities; callers ``vmap`` over chunks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpucomp.ops.parallel_lz import DUMP_SLOTS, dump_spread

ALLOWED_BITS = (0, 1, 2, 4, 8, 16, 32, 64)


def bit_length(x: jax.Array) -> jax.Array:
    """Exact bit length of a non-negative int64 scalar (0 for x<=0)."""
    x = x.astype(jnp.int64)
    total = jnp.zeros((), jnp.int32)
    for k in range(63):
        total = total + ((x >> k) > 0).astype(jnp.int32)
    return total


def round_bits_pow2(b: jax.Array) -> jax.Array:
    """Smallest allowed width >= b (allowed: 0,1,2,4,8,16,32,64)."""
    out = jnp.full((), 64, jnp.int32)
    for cand in (32, 16, 8, 4, 2, 1, 0):
        out = jnp.where(b <= cand, cand, out)
    return out


def choose_width(v: jax.Array, count: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Frame-of-reference width selection over ``v[:count]``.

    Returns ``(min_val, bits)`` — int64 scalar minimum and an allowed pow2 width
    such that every ``v[i] - min_val`` fits in ``bits`` bits.  If the range
    overflows int64 (values spanning more than 2^63), falls back to 64-bit raw.
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
    bits = round_bits_pow2(bit_length(rng))
    bits = jnp.where(overflow, 64, bits)
    vmin = jnp.where(overflow, 0, vmin)
    return vmin, bits


def packed_words(count: jax.Array, bits: jax.Array) -> jax.Array:
    """Number of uint32 words used by ``count`` values at width ``bits``."""
    return ((count.astype(jnp.int64) * bits + 31) // 32).astype(jnp.int32)


def pack(v: jax.Array, count: jax.Array, vmin: jax.Array, bits: jax.Array,
         cap_words: int) -> jax.Array:
    """Pack ``(v[:count] - vmin)`` at pow2 width ``bits`` into uint32 words.

    Args:
      v: int64[cap] values (entries past ``count`` ignored).
      cap_words: static output capacity; must be >= 2 * cap (the 64-bit case).

    Returns uint32[cap_words]; words past ``packed_words(count, bits)`` are zero.
    """
    cap = v.shape[0]
    v = (v.astype(jnp.int64) - vmin)
    idx = jnp.arange(cap, dtype=jnp.int64)
    valid = idx < count

    # -- widths 1..32: non-overlapping scatter-add of shifted contributions ----
    b64 = bits.astype(jnp.int64)
    bitpos = idx * b64                       # absolute starting bit of value i
    word_idx = (bitpos >> 5).astype(jnp.int32)
    shift = (bitpos & 31).astype(jnp.uint32)
    mask_le32 = jnp.where(bits >= 32, jnp.uint64(0xFFFFFFFF),
                          (jnp.uint64(1) << jnp.uint64(jnp.maximum(bits, 0))) - 1)
    vu = v.astype(jnp.uint64) & mask_le32
    contrib = ((vu.astype(jnp.uint32)) << shift).astype(jnp.uint32)
    contrib = jnp.where(valid, contrib, 0)
    posi = jnp.arange(cap, dtype=jnp.int32)
    word_idx = jnp.where(valid, word_idx, dump_spread(posi, cap_words))
    words_small = jnp.zeros((cap_words + DUMP_SLOTS,), jnp.uint32).at[word_idx].add(contrib)
    words_small = words_small[:cap_words]

    # -- width 64: two interleaved 32-bit planes (== raw storage) --------------
    vu64 = v.astype(jnp.uint64)
    lo = (vu64 & 0xFFFFFFFF).astype(jnp.uint32)
    hi = (vu64 >> 32).astype(jnp.uint32)
    inter = jnp.stack([lo, hi], axis=1).reshape(-1)  # [2*cap]
    inter = jnp.where(jnp.arange(2 * cap) < 2 * count, inter, 0)
    if 2 * cap < cap_words:
        inter = jnp.pad(inter, (0, cap_words - 2 * cap))
    else:
        inter = inter[:cap_words]

    return jnp.where(bits == 64, inter, words_small)


def unpack(words: jax.Array, count_cap: int, bits: jax.Array,
           vmin: jax.Array) -> jax.Array:
    """Inverse of :func:`pack`: return int64[count_cap] values (+vmin applied).

    Entries past the original count decode to garbage; callers mask by count.
    """
    nw = words.shape[0]
    idx = jnp.arange(count_cap, dtype=jnp.int64)
    b64 = bits.astype(jnp.int64)

    bitpos = idx * b64
    word_idx = jnp.clip((bitpos >> 5).astype(jnp.int32), 0, nw - 1)
    shift = (bitpos & 31).astype(jnp.uint32)
    mask = jnp.where(bits >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.uint32(jnp.maximum(bits, 0))) - 1)
    small = ((words[word_idx] >> shift) & mask).astype(jnp.uint64)

    lo_idx = jnp.clip((2 * idx).astype(jnp.int32), 0, nw - 1)
    hi_idx = jnp.clip((2 * idx + 1).astype(jnp.int32), 0, nw - 1)
    full = (words[lo_idx].astype(jnp.uint64)
            | (words[hi_idx].astype(jnp.uint64) << 32))

    raw = jnp.where(bits == 64, full, small)
    raw = jnp.where(bits == 0, 0, raw)
    return raw.astype(jnp.int64) + vmin
