"""Vector match-finding for the LZ-family encoders (XLA, sort-based).

The reference's compress kernels find matches with per-threadblock hash
tables (``doc/algorithms_overview.md:50-52``).  A hash table is the wrong
shape for a TPU: the probe is a serial chain of dependent scalar loads, and
scatter-updates are dead in XLA.  The TPU-native equivalent is a *sort*:

1. form the 4-byte word starting at every position (shifted byte views),
2. stable-sort ``(word, position)`` — equal words become adjacent with
   positions ascending, so each element's predecessor under the same word is
   exactly "the nearest previous occurrence of these 4 bytes": what a
   collision-free, infinite-depth hash table would return,
3. un-sort (a second stable sort, keyed by position) to get a per-position
   candidate array, and
4. a suffix-min scan for ``next_match[p]`` — the first position >= p that
   has a candidate — so the serial emission kernel can jump literal runs in
   O(1) instead of stepping byte-by-byte.

Every candidate is *guaranteed* a >=4-byte match (exact equality, not a
hash), so the emitter never needs a verify load.  ``lax.sort`` lowers to a
vectorized sorting network on TPU (~2 ms for 64x64 KiB measured — see
PERF_MODEL.md), which makes this pass ~the cost of three HBM sweeps.

Used by the Pallas encoders (LZ4/Snappy token emission, Deflate/GDeflate
fixed-Huffman emission); the XLA log-depth encoders in
:mod:`tpucomp.formats` remain the portable path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MIN_MATCH = 4


def _candidates_chunk(data: jax.Array, size: jax.Array, window: int):
    """Single-chunk candidate pass (1-D sorts)."""
    cap = data.shape[0]
    x = data.astype(jnp.int32)

    def shift(k):  # bytes at p+k, zero past the end
        return jnp.pad(x, (0, k))[k:k + cap]

    word = x | (shift(1) << 8) | (shift(2) << 16) | (shift(3) << 24)
    pos = jnp.arange(cap, dtype=jnp.int32)

    # a position is a valid match SOURCE/TARGET only while 4 real bytes
    # remain (padding positions sort wherever — filtered below)
    valid = pos <= size - MIN_MATCH

    sw, sp = jax.lax.sort((word, pos), dimension=0, is_stable=True,
                          num_keys=1)
    first = pos == 0
    same = jnp.logical_and(sw == jnp.roll(sw, 1), jnp.logical_not(first))
    prev = jnp.roll(sp, 1)
    sv = sp <= size - MIN_MATCH
    good = jnp.logical_and(same, jnp.logical_and(sv, jnp.roll(sv, 1)))
    cand_sorted = jnp.where(good, prev, -1)

    # un-sort: key by position (already a permutation, so stability moot)
    _, cand = jax.lax.sort((sp, cand_sorted), dimension=0, num_keys=1)

    cand = jnp.where(pos - cand <= window, cand, -1)
    cand = jnp.where(valid, cand, -1)

    # next_match: suffix min of (p where cand valid else cap)
    marked = jnp.where(cand >= 0, pos, jnp.int32(cap))
    nxt = jax.lax.associative_scan(jnp.minimum, marked[::-1])[::-1]
    return cand, nxt


@functools.partial(jax.jit, static_argnames=("window",))
def candidates(data: jax.Array, sizes: jax.Array, window: int = 65535):
    """Per-position match candidates for a batch of chunks.

    Args:
      data:  ``uint8[B, cap]`` chunk payloads (padded).
      sizes: ``int32[B]`` valid byte counts.
      window: maximum backward offset (65535 for LZ4's 16-bit offsets and
        the GDeflate 64 KiB window; 32768 for RFC-1951).

    Returns:
      ``(cand, nxt)`` — ``cand: int32[B, cap]`` is the nearest previous
      position whose 4 starting bytes equal position ``p``'s (-1 if none
      within ``window`` / validity limits); ``nxt: int32[B, cap]`` is the
      smallest position ``q >= p`` with ``cand[q] >= 0`` (``cap`` if none).

    The batch axis runs under ``lax.map``, not ``vmap``: XLA:TPU's sort
    compile time grows superlinearly in the number of independent rows
    (measured: 64 s at B=16, 213 s at B=32, >10 min at B=64), while a
    single 64 Ki-element sort compiles once in ~17 s and each row's sort
    already saturates the VPU — the map costs nothing at run time
    (5 ms / 64 chunks measured, ~0.8 GB/s-equivalent).
    """
    sizes = sizes.astype(jnp.int32)
    return jax.lax.map(
        lambda args: _candidates_chunk(args[0], args[1], window),
        (data, sizes))


def _candidates2_chunk(data: jax.Array, size: jax.Array, window: int):
    """Single-chunk TWO-candidate pass: the 4-byte nearest-previous chain
    plus an 8-byte-prefix sort neighbor (suffix-order heuristic).

    Sorting by the 8-byte prefix places positions with long common prefixes
    adjacent; a neighbor with a smaller position whose first 4 bytes match
    is a high-quality long-match candidate the depth-1 chain misses (the
    nearest 4-byte occurrence often shares only those 4 bytes).  Measured on
    the mixed corpus this halves the sequence count of the greedy walk.
    """
    cap = data.shape[0]
    x = data.astype(jnp.int32)

    def shift(k):
        return jnp.pad(x, (0, k))[k:k + cap]

    w0 = x | (shift(1) << 8) | (shift(2) << 16) | (shift(3) << 24)
    w1 = shift(4) | (shift(5) << 8) | (shift(6) << 16) | (shift(7) << 24)
    pos = jnp.arange(cap, dtype=jnp.int32)
    valid = pos <= size - MIN_MATCH

    # ---- 4-byte nearest-previous chain (as _candidates_chunk) ----
    sw, sp = jax.lax.sort((w0, pos), dimension=0, is_stable=True, num_keys=1)
    first = pos == 0
    same = jnp.logical_and(sw == jnp.roll(sw, 1), jnp.logical_not(first))
    prev = jnp.roll(sp, 1)
    sv = sp <= size - MIN_MATCH
    good = jnp.logical_and(same, jnp.logical_and(sv, jnp.roll(sv, 1)))
    cand_sorted = jnp.where(good, prev, -1)
    _, cand = jax.lax.sort((sp, cand_sorted), dimension=0, num_keys=1)
    cand = jnp.where(pos - cand <= window, cand, -1)
    cand = jnp.where(valid, cand, -1)

    # ---- 8-byte-prefix sort neighbors ----
    s0, s1, sp8 = jax.lax.sort((w0, w1, pos), dimension=0, is_stable=True,
                               num_keys=2)
    sv8 = sp8 <= size - MIN_MATCH

    def neigh(offs):
        ow = jnp.roll(s0, offs)
        op = jnp.roll(sp8, offs)
        ov = jnp.roll(sv8, offs)
        edge = jnp.logical_and(pos >= (0 if offs > 0 else cap + offs),
                               pos < (offs if offs > 0 else cap))
        ok = jnp.logical_and(jnp.logical_and(ow == s0, op < sp8),
                             jnp.logical_and(jnp.logical_and(sv8, ov),
                                             jnp.logical_not(edge)))
        return jnp.where(ok, op, -1)

    # nearest sorted neighbor on each side with a smaller position
    c_up = jnp.maximum(neigh(1), neigh(2))
    c_dn = jnp.maximum(neigh(-1), neigh(-2))
    c8s = jnp.maximum(c_up, c_dn)
    _, cand8 = jax.lax.sort((sp8, c8s), dimension=0, num_keys=1)
    cand8 = jnp.where(pos - cand8 <= window, cand8, -1)
    cand8 = jnp.where(valid, cand8, -1)
    cand8 = jnp.where(cand8 == cand, -1, cand8)   # only keep a SECOND option

    marked = jnp.where(jnp.logical_or(cand >= 0, cand8 >= 0), pos,
                       jnp.int32(cap))
    nxt = jax.lax.associative_scan(jnp.minimum, marked[::-1])[::-1]
    return cand, cand8, nxt


@functools.partial(jax.jit, static_argnames=("window",))
def candidates2(data: jax.Array, sizes: jax.Array, window: int = 65535):
    """Two-candidate variant of :func:`candidates` -> (cand, cand8, nxt).

    ``cand8`` is the 8-byte-prefix sort neighbor (-1 where absent or equal
    to ``cand``); emitters extend both and keep the longer match.  Same
    ``lax.map`` batching rationale as :func:`candidates`.
    """
    sizes = sizes.astype(jnp.int32)
    return jax.lax.map(
        lambda args: _candidates2_chunk(args[0], args[1], window),
        (data, sizes))
