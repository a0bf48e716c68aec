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
    """Pointer-jumping list ranking over a functional graph — GATHER-ONLY.

    Args:
      nxt: ``int32[n]`` — for every position i, the (speculative) successor
        position of a token starting at i; must satisfy ``nxt[i] > i``
        (each token consumes at least one input byte).  Values ``>= n`` mean
        "terminal".
      weight: ``int32[n]`` — per-token weight (e.g. decompressed bytes emitted).
      num_rounds: static; ``2**num_rounds`` must cover the longest chain.
      start: chain head position (traced ok).

    Returns:
      (reach, rank): ``bool[n]`` marking positions on the chain from ``start``,
      and ``int32[n]`` where ``rank[p]`` = sum of ``weight`` over chain nodes
      strictly before p.  Entries off the chain are undefined.

    Implementation note: scatters are avoided entirely (the TPU compiler
    sometimes lowers scatter to a serial loop).  Instead we build jump tables
    ``F_k[p]`` (= position 2^k steps after p) and weight sums ``R_k`` by
    gather-doubling, then every position p runs a binary descent from ``start``
    toward p — because chain positions are strictly increasing, p is on the
    chain iff the greedy walk that never overshoots p lands exactly on p.
    """
    n = nxt.shape[0]
    nxt = jnp.clip(nxt, 0, n).astype(jnp.int32)
    acc = weight.astype(jnp.int32) + 0 * nxt

    def build(carry, _):
        F, R = carry
        Fs = jnp.minimum(F, n - 1)
        F2 = jnp.where(F < n, F[Fs], F)
        R2 = R + jnp.where(F < n, R[Fs], 0)
        return (F2, R2), (F, R)

    (_, _), (Fs, Rs) = jax.lax.scan(build, (nxt, acc), None, length=num_rounds)
    # Fs[k], Rs[k] cover 2^k steps

    p = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    q0 = jnp.full((n,), 0, jnp.int32) + start + 0 * nxt
    r0 = 0 * nxt

    def walk(carry, tabs):
        q, r = carry
        Fk, Rk = tabs
        qs = jnp.minimum(q, n - 1)
        cand = jnp.where(q < n, Fk[qs], jnp.int32(n))
        candR = Rk[qs]
        ok = jnp.logical_and(cand <= p, q < n)
        r = jnp.where(ok, r + candR, r)
        q = jnp.where(ok, cand, q)
        return (q, r), None

    (q, rank), _ = jax.lax.scan(walk, (q0, r0), (Fs[::-1], Rs[::-1]))
    reach = jnp.logical_and(q == p, p >= start)
    return reach, rank


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

    # Compact the reached, output-producing tokens in output order WITHOUT a
    # scatter: sort (rank << 32 | position) keys, unreached tokens to the end.
    produces = jnp.logical_and(reach, (ll + ml) > 0)
    big = jnp.int64(1) << 62
    packed = jnp.where(produces,
                       rank.astype(jnp.int64) * (cap + 1) + pos32, big)
    packed = jnp.sort(packed)
    tok_rank = jnp.where(packed < big,
                         (packed // (cap + 1)).astype(jnp.int32),
                         jnp.int32(2**30))
    tok_pos = jnp.where(packed < big,
                        (packed % (cap + 1)).astype(jnp.int32), 0)

    # each output byte classifies itself against the token table
    opos = jnp.arange(out_cap, dtype=jnp.int32)
    k = jnp.clip(jnp.searchsorted(tok_rank, opos, side="right").astype(jnp.int32) - 1,
                 0, cap - 1)
    t = tok_pos[k]
    rel = opos - tok_rank[k]
    in_lit = rel < ll[t]
    val = jnp.where(in_lit,
                    comp[jnp.clip(lit_start[t] + rel, 0, cap - 1)].astype(jnp.int32),
                    0)
    known = jnp.logical_or(in_lit, opos >= total_out)
    src = opos - offset[t]
    ptr = jnp.where(known, opos, jnp.clip(src, 0, out_cap - 1))

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
