"""Shared TPU-native primitives for parallel LZ-family codecs.

The reference's LZ4/Snappy/Deflate CUDA kernels walk token streams serially per
threadblock (``doc/algorithms_overview.md:50-52``).  A byte-serial walk is the wrong
shape for a TPU (one scalar unit, 8x128-lane VPU), so every LZ-family codec here is
built from three *fully vectorized* primitives instead:

1. ``suffix_run_length`` — log-depth associative scan giving, per position, the length
   of the run of True values starting there (used for 0xFF length-extension runs,
   RLE-style long-match detection, etc.).
2. ``wyllie_path`` — pointer-jumping list ranking over the "next token" functional
   graph: every byte position *speculatively* computes where a token starting there
   would end (vector math), then O(log n) gather/scatter rounds recover exactly the
   positions on the true token chain starting at offset 0 along with the running
   output offset.  This replaces the serial parse.
3. ``resolve_copy_chain`` — log-doubling gather resolution of LZ77 back-references,
   including self-overlapping matches (offset < length), per "Massively-Parallel
   Lossless Data Decompression" (PAPERS.md).

All functions are per-chunk with static shapes; callers ``jax.vmap`` them over the
chunk axis to get the reference's one-threadblock-per-chunk batch parallelism
(``doc/lowlevel_c_quickstart.md:3-13``) as one big fused XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Scatters that route masked-off lanes to a single overflow slot serialize on
# TPU (thousands of colliding writes to one address).  Every masked scatter in
# the codebase instead spreads its dead writes over DUMP_SLOTS consecutive
# slots past the live region, keyed by lane index.
DUMP_SLOTS = 512


def dump_spread(pos: jax.Array, base) -> jax.Array:
    """Overflow target for masked scatters: ``base + (pos & (DUMP_SLOTS-1))``.

    The destination array must have ``DUMP_SLOTS`` extra slots past ``base``.
    """
    return base + (pos & (DUMP_SLOTS - 1))


def suffix_run_length(pred: jax.Array) -> jax.Array:
    """For each i: number of consecutive True values in ``pred[i:]`` starting at i.

    Log-depth via ``associative_scan`` on (run_length, segment_all_true) pairs,
    scanned right-to-left.
    """
    return prefix_run_length(pred[::-1])[::-1]


def prefix_run_length(pred: jax.Array) -> jax.Array:
    """For each i: number of consecutive True values in ``pred[:i+1]`` ending at i."""
    pred = pred.astype(jnp.int32)

    def combine(a, b):
        run_a, all_a = a
        run_b, all_b = b
        return run_b + all_b * run_a, all_a * all_b

    runs, _ = jax.lax.associative_scan(combine, (pred, pred), axis=0)
    return runs


def exclusive_cummax(x: jax.Array, initial: int = 0) -> jax.Array:
    """Exclusive running maximum (used to find "most recent marker before me")."""
    shifted = jnp.concatenate([jnp.full((1,), initial, x.dtype), x[:-1]])
    return jax.lax.associative_scan(jnp.maximum, shifted, axis=0)


def wyllie_path(nxt: jax.Array, weight: jax.Array, num_rounds: int,
                start: int = 0) -> tuple[jax.Array, jax.Array]:
    """Pointer-jumping list ranking over a functional graph.

    Args:
      nxt: ``int32[n]`` — for every position i, the (speculative) successor
        position of a token starting at i.  Values ``>= n`` mean "terminal".
        On the true chain positions must be strictly increasing (no cycles).
      weight: ``int32[n]`` — per-token weight (e.g. decompressed bytes emitted).
      num_rounds: static number of doubling rounds; must satisfy
        ``2**num_rounds >= max possible chain length`` (``ceil(log2(n))`` since each
        token consumes >= 1 input byte).
      start: chain head position.

    Returns:
      (reach, rank): ``bool[n]`` marking positions on the chain from ``start``, and
      ``int32[n]`` where ``rank[p]`` = sum of ``weight`` over chain nodes strictly
      before p (i.e. the output offset at which token p's output begins).  Entries
      off the chain are undefined.
    """
    n = nxt.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    nxt = jnp.clip(nxt, 0, n).astype(jnp.int32)
    # NB: initial carries are derived from the inputs (0*nxt) so that their
    # device-variance matches the loop outputs under shard_map (a plain
    # jnp.zeros carry is replicated and fori_loop rejects the mismatch).
    zero_n = 0 * nxt
    acc = weight.astype(jnp.int32) + zero_n

    zero_ext = jnp.concatenate([zero_n, jnp.tile(zero_n[:1], DUMP_SLOTS)])
    reach = (zero_ext > 0).at[start].set(True)
    rank = zero_ext

    def body(_, state):
        nxt, acc, reach, rank = state
        # Extend the reached set by 2^k steps and scatter ranks to the new nodes.
        targets = jnp.where(reach[:n], nxt, dump_spread(pos, n))
        targets = jnp.where(targets >= n, dump_spread(pos, n), targets)
        new_rank = rank.at[targets].max(rank[:n] + acc)
        new_reach = reach.at[targets].set(True)
        # Double the jump pointers.
        nxt_safe = jnp.minimum(nxt, n - 1)
        acc2 = acc + jnp.where(nxt < n, acc[nxt_safe], 0)
        nxt2 = jnp.where(nxt < n, nxt[nxt_safe], nxt)
        return nxt2, acc2, new_reach, new_rank

    nxt, acc, reach, rank = jax.lax.fori_loop(
        0, num_rounds, body, (nxt, acc, reach, rank))
    return reach[:n], rank[:n]


def chain_total(nxt: jax.Array, weight: jax.Array, num_rounds: int,
                start: int = 0) -> tuple[jax.Array, jax.Array]:
    """Sum of ``weight`` along the full chain from ``start`` and the terminal's
    "landing" position (first value >= n reached).  Cheaper companion to
    ``wyllie_path`` when only totals are needed."""
    n = nxt.shape[0]
    nxt = jnp.clip(nxt, 0, n).astype(jnp.int32)

    def body(_, state):
        pos, total, land = state
        alive = pos < n
        pos_safe = jnp.minimum(pos, n - 1)
        total = total + jnp.where(alive, weight[pos_safe], 0)
        new_pos = jnp.where(alive, nxt[pos_safe], pos)
        land = jnp.where(alive, new_pos, land)
        return new_pos, total, land

    # Serial walk is O(chain); callers use wyllie_path for the real work — this
    # helper exists only for small/debug cases.
    pos, total, land = jax.lax.while_loop(
        lambda s: s[0] < n,
        lambda s: body(0, s),
        (jnp.int32(start), jnp.int32(0), jnp.int32(start)))
    return total, land


def mark_to_segment_id(marks: jax.Array) -> jax.Array:
    """Given bool marks of segment starts, return int32 segment ids (cumsum-1)."""
    return jnp.cumsum(marks.astype(jnp.int32)) - 1


def segment_owner(starts_scatter: jax.Array) -> jax.Array:
    """Given an int32 array where position s holds the marker value for a segment
    starting at s (and a sentinel elsewhere, typically -1 or the position itself at
    starts), return for each position the most recent marker at or before it
    (inclusive running max)."""
    return jax.lax.associative_scan(jnp.maximum, starts_scatter, axis=0)


def emit_lz_output(comp: jax.Array, reach: jax.Array, rank: jax.Array,
                   lit_start: jax.Array, ll: jax.Array, offset: jax.Array,
                   ml: jax.Array, total_out: jax.Array, out_cap: int,
                   max_rounds: int) -> jax.Array:
    """Materialize decoded output from a parsed LZ token chain.

    Shared by every LZ-family decoder (LZ4, Snappy, ...).  Each reached token at
    input position p produces output ``[rank, rank+ll)`` copied from the literal
    bytes ``comp[lit_start : lit_start+ll]``, followed by ``[rank+ll, rank+ll+ml)``
    back-referenced from ``offset`` bytes earlier in the output (``ml`` may be 0
    for literal-only tokens, ``ll`` may be 0 for copy-only tokens).

    Literals scatter directly; back-references (including self-overlapping ones)
    resolve via :func:`resolve_copy_chain`.
    """
    cap = comp.shape[0]
    pos32 = jnp.arange(cap, dtype=jnp.int32)
    ND = DUMP_SLOTS

    # literals: each input byte finds its owning token (latest reached start <= c)
    own = segment_owner(jnp.where(reach, pos32, -1))
    own_c = jnp.clip(own, 0, cap - 1)
    in_lit = jnp.logical_and(own >= 0,
                             jnp.logical_and(pos32 >= lit_start[own_c],
                                             pos32 < lit_start[own_c] + ll[own_c]))
    in_lit = jnp.logical_and(in_lit, reach[own_c])
    lit_out_pos = rank[own_c] + (pos32 - lit_start[own_c])
    tgt = jnp.where(jnp.logical_and(in_lit, lit_out_pos < out_cap),
                    lit_out_pos, dump_spread(pos32, out_cap))
    val = jnp.zeros((out_cap + ND,), jnp.int32).at[tgt].set(comp.astype(jnp.int32))[:out_cap]
    known = jnp.zeros((out_cap + ND,), jnp.bool_).at[tgt].set(True)[:out_cap]

    # matches: per-output-position copy pointers from the owning match segment
    opos = jnp.arange(out_cap, dtype=jnp.int32)
    is_match_tok = jnp.logical_and(reach, ml > 0)
    m_out_start = rank + ll
    m_tgt = jnp.where(jnp.logical_and(is_match_tok, m_out_start < out_cap),
                      m_out_start, dump_spread(pos32, out_cap))
    l_tgt = jnp.where(jnp.logical_and(reach, rank < out_cap), rank,
                      dump_spread(pos32, out_cap))
    match_mark = jnp.full((out_cap + ND,), -1, jnp.int32).at[m_tgt].max(m_out_start)[:out_cap]
    lit_mark = jnp.full((out_cap + ND,), -1, jnp.int32).at[l_tgt].max(rank)[:out_cap]
    last_match = segment_owner(match_mark)
    last_lit = segment_owner(lit_mark)
    off_at = jnp.zeros((out_cap + ND,), jnp.int32).at[m_tgt].set(offset)[:out_cap]
    in_match = jnp.logical_and(last_match >= 0, last_match >= last_lit)
    src = opos - off_at[jnp.clip(last_match, 0, out_cap - 1)]
    ptr = jnp.where(jnp.logical_and(in_match, jnp.logical_not(known)),
                    jnp.clip(src, 0, out_cap - 1), opos)
    known = jnp.logical_or(known, opos >= total_out)

    return resolve_copy_chain(ptr, val, known, max_rounds=max_rounds)


def resolve_copy_chain(ptr: jax.Array, val: jax.Array, known: jax.Array,
                       max_rounds: int) -> jax.Array:
    """Resolve LZ77 back-reference chains by log-doubling.

    Every output position o either holds a known byte (literal) or points to an
    earlier output position ``ptr[o] < o`` it copies from.  Doubling the pointers
    resolves chains of any depth in ``ceil(log2(n))`` rounds; an early-exit
    ``while_loop`` stops as soon as every position is known (typical data resolves
    in a handful of rounds).
    """
    n = ptr.shape[0]
    ptr = jnp.clip(ptr, 0, n - 1).astype(jnp.int32)

    def cond(state):
        i, _, _, known = state
        return jnp.logical_and(i < max_rounds, jnp.logical_not(jnp.all(known)))

    def body(state):
        i, ptr, val, known = state
        val = jnp.where(known, val, val[ptr])
        new_known = jnp.logical_or(known, known[ptr])
        ptr = jnp.where(known, ptr, ptr[ptr])
        return i + 1, ptr, val, new_known

    _, _, val, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), ptr, val, known))
    return val
