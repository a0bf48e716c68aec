"""LZ4 block-format codec, fully vectorized for TPU.

Implements the standard LZ4 block format (interop with liblz4 proven both ways,
mirroring ``examples/lz4_cpu_compression.cu:61-66`` / ``lz4_cpu_decompression.cu:
94-157``).  The reference's CUDA kernels walk the token stream serially per
threadblock (``doc/algorithms_overview.md:50-52``); a byte-serial walk is the wrong
shape for a TPU, so both directions are built from log-depth data-parallel passes
(see ``tpucomp/ops/parallel_lz.py``):

Decode (per chunk, ``vmap`` over the batch):
  1. *Speculative parse*: every input byte position computes, as vector math, the
     token that would start there (literal length incl. 0xFF extensions via a
     suffix-run-length scan, match length, next-token position, output bytes).
  2. *Pointer jumping* (``wyllie_path``) recovers the true token chain from offset
     0 plus each token's output offset in O(log n) gather rounds.
  3. Literals scatter directly; LZ77 back-references resolve with the log-doubling
     copy-chain pass, which handles self-overlapping matches (offset < length).

Encode (per chunk):
  1. Hash-based candidate match per position (nearest earlier occurrence of the
     same 4-byte window via one stable sort), verified by direct comparison and
     extended with word-granular compares; plus exact long-run matches at small
     periodic distances (1/2/4/8 and the element-size hint — this is what the
     ``data_type`` option is for, ``benchmarks/benchmark_lz4_chunked.cu:38-43``).
  2. The greedy parse (skip over emitted matches) is itself a functional graph
     ``next[p] = p + match_len[p] (or p+1)``; pointer jumping recovers exactly the
     positions the serial greedy encoder would visit.
  3. Serialization is a pure gather: every output byte position classifies itself
     (token / extension / literal / offset) against the per-sequence layout table.

End-of-block rules honored (last 5 bytes literal, no match starting within the
last 12 bytes — ``CHANGELOG.md:195-196``), so liblz4 round-trips bit-exactly.
Corrupt input yields per-chunk ``ERROR_CANNOT_DECOMPRESS`` and size 0, never an
out-of-bounds access (``CHANGELOG.md:160-164``).
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.constants import ElementType, Status
from tpucomp.ops import parallel_lz as plz

MIN_MATCH = 4
MAX_OFFSET = 65535
# End-of-block rules from the LZ4 block spec.
LAST_LITERALS = 5
MF_LIMIT = 12


@dataclasses.dataclass(frozen=True)
class LZ4Opts:
    """Analog of ``nvcompBatchedLZ4Opts_t{ nvcompType_t data_type }``."""

    data_type: ElementType = ElementType.CHAR


DEFAULT_OPTS = LZ4Opts()


def max_compressed_chunk_size(max_chunk_bytes: int, opts: LZ4Opts = DEFAULT_OPTS) -> int:
    """Standard LZ4 worst-case bound, rounded up to a TPU-tile-friendly multiple
    (odd 1-D array lengths hit slow XLA layout paths)."""
    n = max_chunk_bytes + max_chunk_bytes // 255 + 16
    return (n + 1023) & ~1023


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


# =====================================================================================
# decode
# =====================================================================================

def _parse_chunk(comp: jax.Array, comp_size: jax.Array):
    """Speculative parse + pointer jumping over one LZ4 block.

    Returns ``(reach, rank, lit_start, ll, offset, ml, terminal, total_out, err)``
    — everything both the full decode and the parse-only size query
    (``GetDecompressSizeAsync`` analog) need.
    """
    cap = comp.shape[0]
    pos32 = jnp.arange(cap, dtype=jnp.int32)
    comp_size = comp_size.astype(jnp.int32)
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)

    # run length of 0xFF bytes starting at each position (for length extensions);
    # only positions inside the chunk count.
    is_ff = jnp.logical_and(comp == 0xFF, pos32 < comp_size)
    ff_run = plz.suffix_run_length(is_ff)

    # --- speculative token parse at every position --------------------------------
    token = gb(pos32)
    ll_base = token >> 4
    ml_base = token & 15

    k_l = ff_run[jnp.clip(pos32 + 1, 0, cap - 1)]
    ll_ext = jnp.where(ll_base == 15, k_l + 1, 0)
    ll = jnp.where(ll_base == 15, 15 + 255 * k_l + gb(pos32 + 1 + k_l), ll_base)

    lit_start = pos32 + 1 + ll_ext
    lit_end = lit_start + ll
    terminal = lit_end == comp_size

    offset = gb(lit_end) | (gb(lit_end + 1) << 8)
    mq = lit_end + 2
    k_m = ff_run[jnp.clip(mq, 0, cap - 1)]
    ml_ext = jnp.where(ml_base == 15, k_m + 1, 0)
    ml = jnp.where(ml_base == 15, 15 + 255 * k_m + gb(mq + k_m), ml_base) + MIN_MATCH

    nxt = mq + ml_ext
    # A token is malformed if its fields run past the compressed block.
    invalid = jnp.logical_and(jnp.logical_not(terminal),
                              jnp.logical_or(nxt > comp_size, offset == 0))
    invalid = jnp.logical_or(invalid, lit_end > comp_size)
    weight = jnp.where(terminal, ll, ll + ml)
    nxt = jnp.where(jnp.logical_or(terminal, invalid), cap, nxt)

    reach, rank = plz.wyllie_path(nxt, weight, num_rounds=_ceil_log2(cap) + 1)
    reach = jnp.logical_and(reach, pos32 < comp_size)
    # empty block (comp_size == 0) decodes to 0 bytes
    reach = jnp.logical_and(reach, comp_size > 0)

    # --- validation ----------------------------------------------------------------
    err = jnp.any(jnp.logical_and(reach, invalid))
    got_terminal = jnp.any(jnp.logical_and(reach, terminal))
    total_out = jnp.max(jnp.where(reach, rank + weight, 0))
    # match source must not start before the output (offset <= out pos at match)
    bad_offset = jnp.logical_and(
        jnp.logical_and(reach, jnp.logical_not(terminal)),
        offset > rank + ll)
    err = jnp.logical_or(err, jnp.any(bad_offset))
    err = jnp.logical_or(err, jnp.logical_and(comp_size > 0,
                                              jnp.logical_not(got_terminal)))
    return reach, rank, lit_start, ll, offset, ml, terminal, total_out, err


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    """Parse-only decompressed-size query (``nvcompBatchedLZ4GetDecompressSizeAsync``
    analog, ``examples/low_level_quickstart_example.cpp:112-117``): the token walk
    without the emit pass.  Returns 0 for malformed streams."""
    _, _, _, _, _, _, _, total_out, err = _parse_chunk(comp, comp_size)
    return jnp.where(err, 0, total_out).astype(jnp.int32)


def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one LZ4 block -> (out uint8[out_cap], out_size, status)."""
    comp_size = comp_size.astype(jnp.int32)
    (reach, rank, lit_start, ll, offset, ml, terminal, total_out,
     err) = _parse_chunk(comp, comp_size)
    too_big = total_out > out_cap
    total_out = jnp.clip(total_out, 0, out_cap)

    resolved = plz.emit_lz_output(
        comp, reach, rank, lit_start, ll, offset,
        ml=jnp.where(terminal, 0, ml), total_out=total_out, out_cap=out_cap,
        max_rounds=_ceil_log2(out_cap) + 1)

    opos = jnp.arange(out_cap, dtype=jnp.int32)
    ok = jnp.logical_and(jnp.logical_not(err), jnp.logical_not(too_big))
    out_size = jnp.where(ok, total_out, 0).astype(jnp.int32)
    out = jnp.where(opos < out_size, resolved, 0).astype(jnp.uint8)
    status = jnp.where(err, Status.ERROR_CANNOT_DECOMPRESS,
                       jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL,
                                 Status.SUCCESS))
    return out, out_size, status.astype(jnp.int32)


# =====================================================================================
# encode
# =====================================================================================

# np scalar, NOT jnp: a module-level jax array gets a cached trace-lifted
# tracer on jax 0.9.0; any LATER jitted entry that closes over it captures
# the stale tracer, its constants get separated into executable arguments,
# and the C++ dispatch fast path then re-dispatches WITHOUT them
# ("Execution supplied 2 buffers but compiled program expected N").
# tests/test_static_hygiene.py enforces this package-wide.
HASH_MULT = np.uint32(2654435761)


def _find_matches(data: jax.Array, size: jax.Array, run_dists: tuple[int, ...],
                  ext_words: int = 32, n_cands: int = 4,
                  probe_words: int = 2) -> tuple[jax.Array, jax.Array]:
    """Per-position best match (length, offset); length 0 where no legal match.

    ``n_cands`` same-hash candidates are scored by a ``4*probe_words``-byte
    prefix probe (longer prefix, then nearer, wins); the winner is extended to
    full length.  Higher values trade encode time for ratio — the deflate
    ratio ladder (algo 1) uses a deeper probe than the lz4 default.
    """
    cap = data.shape[0]
    p = jnp.arange(cap, dtype=jnp.int32)
    d32 = data.astype(jnp.uint32)

    def word_at(i):
        ic = jnp.clip(i, 0, cap - 1)
        w = d32[ic]
        for k in range(1, 4):
            w = w | (d32[jnp.clip(i + k, 0, cap - 1)] << (8 * k))
        return w

    w4 = word_at(p)

    # ---- hash candidates: K nearest earlier positions with the same 4-byte hash ---
    h = (w4 * HASH_MULT) >> jnp.uint32(17)       # 15-bit hash
    # order positions by (hash, position); neighbors in the order share a hash
    key = h.astype(jnp.int64) * cap + p.astype(jnp.int64)
    order = jnp.argsort(key).astype(jnp.int32)
    K = n_cands
    h_o = h[order]

    def cand_at(j):
        prev_j = jnp.concatenate([jnp.full((j,), -1, jnp.int32), order[:-j]])
        same = jnp.concatenate([jnp.zeros((j,), jnp.bool_),
                                h_o[j:] == h_o[:-j]])
        return jnp.full((cap,), -1, jnp.int32).at[order].set(
            jnp.where(same, prev_j, -1))

    # score each candidate by a prefix probe, prefer longer then nearer
    best_cand = jnp.full((cap,), -1, jnp.int32)
    best_score = jnp.full((cap,), -1, jnp.int32)
    for j in range(1, K + 1):
        cj = cand_at(j)
        okj = jnp.logical_and(cj >= 0, p - cj <= MAX_OFFSET)
        okj = jnp.logical_and(okj, w4 == word_at(cj))
        score = jnp.ones((cap,), jnp.int32)
        run = jnp.full((cap,), True)
        for w in range(1, probe_words):
            run = jnp.logical_and(run, word_at(p + 4 * w) == word_at(cj + 4 * w))
            score = score + run.astype(jnp.int32)
        score = jnp.where(okj, score, -1)
        better = score > best_score
        best_cand = jnp.where(better, cj, best_cand)
        best_score = jnp.where(better, score, best_score)
    cand = best_cand

    cand_ok = jnp.logical_and(cand >= 0, p + MIN_MATCH <= size)

    # word-granular extension beyond the first 4 bytes (rolled loop: keeps the
    # compiled graph small, which matters for remote-compile latency)
    def ext_body(k, carry):
        hlen, still = carry
        eq = word_at(p + 4 * k) == word_at(cand + 4 * k)
        still = jnp.logical_and(still, eq)
        return hlen + jnp.where(still, 4, 0), still

    hlen, still = jax.lax.fori_loop(
        1, ext_words + 1, ext_body,
        (jnp.full((cap,), MIN_MATCH, jnp.int32), cand_ok))

    # byte-granular tail (up to 3 more)
    def tail_body(k, carry):
        hlen, beq = carry
        i1 = jnp.clip(p + hlen, 0, cap - 1)
        i2 = jnp.clip(cand + hlen, 0, cap - 1)
        beq = jnp.logical_and(beq, data[i1] == data[i2])
        return hlen + beq.astype(jnp.int32), beq

    hlen, _ = jax.lax.fori_loop(
        0, 3, tail_body, (hlen, jnp.logical_and(cand_ok, jnp.logical_not(still))))
    hlen = jnp.where(cand_ok, hlen, 0)
    hoff = p - cand

    best_len = hlen
    best_off = jnp.where(cand_ok, hoff, 1)

    # ---- exact long-run matches at periodic distances ------------------------------
    for d in sorted(set(run_dists)):
        if d <= 0 or d > MAX_OFFSET:
            continue
        shifted = jnp.concatenate([jnp.zeros((d,), data.dtype), data[:-d]])
        eq = jnp.logical_and(data == shifted, jnp.logical_and(p >= d, p < size))
        rlen = plz.suffix_run_length(eq)
        ok = rlen >= MIN_MATCH
        better = jnp.logical_and(ok, rlen > best_len)
        best_len = jnp.where(better, rlen, best_len)
        best_off = jnp.where(better, d, best_off)

    # ---- one-step lazy matching ----------------------------------------------------
    # classic heuristic: if the next position starts a strictly longer match,
    # emit this byte as a literal and take the longer match instead
    next_len = jnp.concatenate([best_len[1:], jnp.zeros((1,), best_len.dtype)])
    best_len = jnp.where(next_len > best_len, 0, best_len)

    # ---- end-of-block rules --------------------------------------------------------
    best_len = jnp.minimum(best_len, jnp.maximum(size - LAST_LITERALS - p, 0))
    legal = jnp.logical_and(best_len >= MIN_MATCH, p + MF_LIMIT <= size)
    best_len = jnp.where(legal, best_len, 0)
    return best_len, best_off


def encode_chunk(data: jax.Array, size: jax.Array, opts: LZ4Opts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode one chunk as a standard LZ4 block -> (out, out_size, status)."""
    cap = data.shape[0]
    size = size.astype(jnp.int32)
    ts = 1 if opts.data_type == ElementType.BITS else opts.data_type.nbytes
    run_dists = tuple(sorted({1, 2, 4, 8, ts}))

    mlen, moff = _find_matches(data, size, run_dists)

    # ---- parallel greedy parse ----------------------------------------------------
    p = jnp.arange(cap, dtype=jnp.int32)
    has_match = mlen >= MIN_MATCH
    nxt = jnp.where(has_match, p + mlen, p + 1)
    nxt = jnp.where(p < size, nxt, cap)
    reach, _ = plz.wyllie_path(nxt, jnp.zeros((cap,), jnp.int32),
                               num_rounds=_ceil_log2(cap) + 1)
    reach = jnp.logical_and(reach, p < size)

    # ---- gather the match sequences in order ---------------------------------------
    cap_tok = cap // MIN_MATCH + 2
    is_tok = jnp.logical_and(reach, has_match)
    n_tok = jnp.sum(is_tok.astype(jnp.int32))
    # compact match positions in order by sorting (scatter-free)
    sorted_pos = jnp.sort(jnp.where(is_tok, p, jnp.int32(2**30)))[:cap_tok]
    t_pos = jnp.clip(sorted_pos, 0, cap - 1)
    t_ml = mlen[t_pos]
    t_off = jnp.maximum(moff[t_pos], 1)

    ti = jnp.arange(cap_tok, dtype=jnp.int32)
    t_valid = ti < n_tok
    prev_end = jnp.where(ti == 0, 0,
                         t_pos[jnp.clip(ti - 1, 0, cap_tok - 1)]
                         + t_ml[jnp.clip(ti - 1, 0, cap_tok - 1)])
    t_ll = jnp.where(t_valid, t_pos - prev_end, 0)

    # final literal-only sequence appended as virtual token n_tok
    last_end = jnp.where(n_tok > 0,
                         t_pos[jnp.clip(n_tok - 1, 0, cap_tok - 1)]
                         + t_ml[jnp.clip(n_tok - 1, 0, cap_tok - 1)], 0)
    final_ll = size - last_end
    is_final = ti == n_tok
    t_ll = jnp.where(is_final, final_ll, t_ll)
    t_lit_src = jnp.where(is_final, last_end, prev_end)
    t_ml = jnp.where(is_final, 0, t_ml)
    t_M = jnp.maximum(t_ml - MIN_MATCH, 0)            # encoded match length value
    t_has_match = jnp.logical_and(t_valid, jnp.logical_not(is_final))

    def ext_count(v):
        return jnp.where(v >= 15, 1 + (v - 15) // 255, 0)

    e_l = ext_count(t_ll)
    e_m = jnp.where(t_has_match, ext_count(t_M), 0)
    seq_bytes = jnp.where(
        jnp.logical_or(t_valid, is_final),
        1 + e_l + t_ll + jnp.where(t_has_match, 2 + e_m, 0), 0)
    seq_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(seq_bytes)[:-1].astype(jnp.int32)])
    total = jnp.sum(seq_bytes)

    # ---- serialize: every output byte classifies itself ----------------------------
    o = jnp.arange(out_cap, dtype=jnp.int32)
    active = jnp.logical_or(t_valid, is_final)
    start_key = jnp.where(active, seq_start, jnp.int32(2**30))
    k = jnp.clip(jnp.searchsorted(start_key, o, side="right").astype(jnp.int32) - 1,
                 0, cap_tok - 1)
    r = o - seq_start[k]
    llk, elk, Mk, emk = t_ll[k], e_l[k], t_M[k], e_m[k]
    hk = t_has_match[k]

    tok_byte = (jnp.minimum(llk, 15) << 4) | jnp.where(hk, jnp.minimum(Mk, 15), 0)

    # literal-length extension bytes: (e_l - 1) 0xFF bytes then the remainder
    le_idx = r - 1
    le_byte = jnp.where(le_idx < elk - 1, 255, t_ll[k] - 15 - 255 * (elk - 1))

    lit_idx = r - 1 - elk
    lit_byte = data[jnp.clip(t_lit_src[k] + lit_idx, 0, cap - 1)].astype(jnp.int32)

    off_idx = r - 1 - elk - llk
    off_byte = jnp.where(off_idx == 0, t_off[k] & 0xFF, (t_off[k] >> 8) & 0xFF)

    me_idx = off_idx - 2
    me_byte = jnp.where(me_idx < emk - 1, 255, Mk - 15 - 255 * (emk - 1))

    out = jnp.where(r == 0, tok_byte,
          jnp.where(le_idx < elk, le_byte,
          jnp.where(lit_idx < llk, lit_byte,
          jnp.where(jnp.logical_and(hk, off_idx < 2), off_byte,
          jnp.where(jnp.logical_and(hk, me_idx < emk), me_byte, 0)))))
    out = jnp.where(o < total, out, 0).astype(jnp.uint8)

    too_big = total > out_cap
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL,
                       Status.SUCCESS)
    out_size = jnp.where(too_big, 0, total).astype(jnp.int32)
    return out, out_size, status.astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: LZ4Opts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)
