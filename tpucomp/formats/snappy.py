"""Snappy (raw block format) codec, fully vectorized for TPU.

Implements Google's Snappy format (``nvcompBatchedSnappy*`` analog; no options —
``nvcompBatchedSnappyOpts_t`` is empty, ``benchmarks/benchmark_snappy_chunked.cu:
31-36``).  Same log-depth machinery as :mod:`tpucomp.formats.lz4`: speculative
per-position element parse + pointer jumping for the decode, shared hash/run match
finding + parallel greedy parse for the encode.

Format: varint32 uncompressed-length preamble, then elements —
  literal  (tag&3==0): len-1 in tag>>2 if <60, else tag>>2-59 extra LE length bytes
  copy-1   (tag&3==1): len = ((tag>>2)&7)+4, offset = (tag>>5)<<8 | next byte
  copy-2   (tag&3==2): len = (tag>>2)+1, 2-byte LE offset
  copy-4   (tag&3==3): len = (tag>>2)+1, 4-byte LE offset

The decoder accepts every legal stream (including copy-1/copy-4 and short copies
our encoder never emits — the reference explicitly tests decoders on such streams,
``CHANGELOG.md:182-184``); the encoder emits literal + copy-2 elements only, which
is valid Snappy and what CPU snappy decodes bit-exactly.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from tpucomp.constants import Status
from tpucomp.ops import parallel_lz as plz
from tpucomp.formats import lz4 as _lz4

MIN_MATCH = 4
MAX_COPY_LEN = 64
MAX_OFFSET = 65535  # encoder limit (copy-2); decoder accepts copy-4 too


@dataclasses.dataclass(frozen=True)
class SnappyOpts:
    """Analog of the empty ``nvcompBatchedSnappyOpts_t``."""


DEFAULT_OPTS = SnappyOpts()


def max_compressed_chunk_size(max_chunk_bytes: int, opts: SnappyOpts = DEFAULT_OPTS) -> int:
    """snappy_max_compressed_length (32 + n + n/6), rounded to a tile multiple."""
    n = 32 + max_chunk_bytes + max_chunk_bytes // 6
    return (n + 1023) & ~1023


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


def _varint_len(v: jax.Array) -> jax.Array:
    n = jnp.int32(1)
    for k in (7, 14, 21, 28):
        n = n + (v >= (1 << k)).astype(jnp.int32)
    return n


# =====================================================================================
# decode
# =====================================================================================

def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one raw-Snappy block -> (out uint8[out_cap], out_size, status)."""
    cap = comp.shape[0]
    pos32 = jnp.arange(cap, dtype=jnp.int32)
    comp_size = comp_size.astype(jnp.int32)
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)

    # --- preamble: varint32 uncompressed length -----------------------------------
    pre_len = jnp.int32(1)
    expected = gb(0) & 0x7F
    more = (gb(0) & 0x80) != 0
    for k in range(1, 5):
        use = more
        expected = jnp.where(use, expected | ((gb(k) & 0x7F) << (7 * k)), expected)
        pre_len = pre_len + use.astype(jnp.int32)
        more = jnp.logical_and(use, (gb(k) & 0x80) != 0)
    bad_preamble = jnp.logical_or(more, comp_size < pre_len)

    # --- speculative element parse at every position ------------------------------
    tag = gb(pos32)
    typ = tag & 3
    t6 = tag >> 2

    # literal
    extra = jnp.clip(t6 - 59, 0, 4)
    lit_len_short = t6 + 1
    lit_len_long = jnp.int32(1)
    acc = jnp.zeros((cap,), jnp.int32)
    for k in range(4):
        b = gb(pos32 + 1 + k)
        acc = jnp.where(k < extra, acc | (b << (8 * k)), acc)
    lit_len_long = acc + 1
    ll_lit = jnp.where(extra > 0, lit_len_long, lit_len_short)
    hdr_lit = 1 + extra
    # 4-byte lengths are legal Snappy; lengths >= 2^31 overflow int32 -> invalid
    bad_lit = ll_lit < 1

    # copies
    ml1 = ((t6) & 7) + 4
    off1 = ((tag >> 5) << 8) | gb(pos32 + 1)
    ml2 = t6 + 1
    off2 = gb(pos32 + 1) | (gb(pos32 + 2) << 8)
    ml4 = t6 + 1
    off4 = (gb(pos32 + 1) | (gb(pos32 + 2) << 8) | (gb(pos32 + 3) << 16)
            | (gb(pos32 + 4) << 24))

    is_lit = typ == 0
    ll = jnp.where(is_lit, ll_lit, 0)
    ml = jnp.where(is_lit, 0,
         jnp.where(typ == 1, ml1, jnp.where(typ == 2, ml2, ml4)))
    offset = jnp.where(typ == 1, off1, jnp.where(typ == 2, off2, off4))
    hdr = jnp.where(is_lit, hdr_lit,
          jnp.where(typ == 1, 2, jnp.where(typ == 2, 3, 5)))

    lit_start = pos32 + hdr
    nxt = lit_start + ll  # for copies ll==0 => nxt = pos + hdr
    weight = ll + ml

    invalid = jnp.logical_and(is_lit, bad_lit)
    invalid = jnp.logical_or(invalid, nxt > comp_size)
    invalid = jnp.logical_or(invalid, jnp.logical_and(jnp.logical_not(is_lit),
                                                      offset <= 0))
    terminal = jnp.logical_and(nxt == comp_size, jnp.logical_not(invalid))
    nxt = jnp.where(invalid, cap, nxt)

    reach, rank = plz.wyllie_path(nxt, weight, num_rounds=_ceil_log2(cap) + 1,
                                  start=pre_len)
    reach = jnp.logical_and(reach, pos32 < comp_size)
    reach = jnp.logical_and(reach, pos32 >= pre_len)
    reach = jnp.logical_and(reach, comp_size > pre_len)

    # --- validation ----------------------------------------------------------------
    err = jnp.any(jnp.logical_and(reach, invalid))
    total_out = jnp.max(jnp.where(reach, rank + weight, 0))
    bad_offset = jnp.logical_and(jnp.logical_and(reach, ml > 0), offset > rank)
    err = jnp.logical_or(err, jnp.any(bad_offset))
    got_terminal = jnp.any(jnp.logical_and(reach, terminal))
    err = jnp.logical_or(err, jnp.logical_and(comp_size > pre_len,
                                              jnp.logical_not(got_terminal)))
    err = jnp.logical_or(err, bad_preamble)
    err = jnp.logical_or(err, total_out != expected)
    too_big = expected > out_cap
    total_out = jnp.clip(total_out, 0, out_cap)

    resolved = plz.emit_lz_output(
        comp, reach, rank, lit_start, ll, offset, ml,
        total_out=total_out, out_cap=out_cap,
        max_rounds=_ceil_log2(out_cap) + 1)

    opos = jnp.arange(out_cap, dtype=jnp.int32)
    ok = jnp.logical_and(jnp.logical_not(err), jnp.logical_not(too_big))
    out_size = jnp.where(ok, total_out, 0).astype(jnp.int32)
    out = jnp.where(opos < out_size, resolved, 0).astype(jnp.uint8)
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL,
                       jnp.where(err, Status.ERROR_CANNOT_DECOMPRESS,
                                 Status.SUCCESS))
    return out, out_size, status.astype(jnp.int32)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    """Read the varint preamble (``GetDecompressSizeAsync`` analog)."""
    cap = comp.shape[0]
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)
    expected = gb(0) & 0x7F
    more = (gb(0) & 0x80) != 0
    for k in range(1, 5):
        expected = jnp.where(more, expected | ((gb(k) & 0x7F) << (7 * k)), expected)
        more = jnp.logical_and(more, (gb(k) & 0x80) != 0)
    return jnp.where(comp_size > 0, expected, 0).astype(jnp.int32)


# =====================================================================================
# encode
# =====================================================================================

def encode_chunk(data: jax.Array, size: jax.Array, opts: SnappyOpts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode one chunk as a raw Snappy block -> (out, out_size, status)."""
    cap = data.shape[0]
    size = size.astype(jnp.int32)

    # Snappy has no end-of-block literal rules, but reusing the LZ4 matcher's
    # conservative masking (no match in the last 12 bytes) is always legal.
    mlen, moff = _lz4._find_matches(data, size, run_dists=(1, 2, 4, 8))

    p = jnp.arange(cap, dtype=jnp.int32)
    has_match = mlen >= MIN_MATCH
    nxt = jnp.where(has_match, p + mlen, p + 1)
    nxt = jnp.where(p < size, nxt, cap)
    reach, _ = plz.wyllie_path(nxt, jnp.zeros((cap,), jnp.int32),
                               num_rounds=_ceil_log2(cap) + 1)
    reach = jnp.logical_and(reach, p < size)

    # ---- sequences: literal run + match, as in the LZ4 encoder --------------------
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
    last_end = jnp.where(n_tok > 0,
                         t_pos[jnp.clip(n_tok - 1, 0, cap_tok - 1)]
                         + t_ml[jnp.clip(n_tok - 1, 0, cap_tok - 1)], 0)
    is_final = ti == n_tok
    t_ll = jnp.where(is_final, size - last_end, t_ll)
    t_lit_src = jnp.where(is_final, last_end, prev_end)
    t_ml = jnp.where(is_final, 0, jnp.where(t_valid, t_ml, 0))

    # literal element header bytes: 1 + {0,1,2,3} extra length bytes
    lm1 = t_ll - 1
    lit_extra = jnp.where(t_ll == 0, 0,
                jnp.where(lm1 < 60, 0,
                jnp.where(lm1 < (1 << 8), 1,
                jnp.where(lm1 < (1 << 16), 2, 3))))
    lit_hdr = jnp.where(t_ll > 0, 1 + lit_extra, 0)

    # copy elements: first copies of 60, final copy 4..64, all copy-2 (3 bytes)
    n_copies = jnp.where(t_ml > 0,
                         1 + jnp.maximum(0, (t_ml - MAX_COPY_LEN + 59) // 60), 0)
    seq_bytes = lit_hdr + t_ll + 3 * n_copies
    active = jnp.logical_or(t_valid, is_final)
    seq_bytes = jnp.where(active, seq_bytes, 0)

    pre_len = _varint_len(size)
    seq_start = pre_len + jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                           jnp.cumsum(seq_bytes)[:-1].astype(jnp.int32)])
    total = pre_len + jnp.sum(seq_bytes)

    # ---- serialize: every output byte classifies itself ----------------------------
    o = jnp.arange(out_cap, dtype=jnp.int32)

    # preamble bytes
    pre_byte = jnp.zeros((out_cap,), jnp.int32)
    for k in range(5):
        b = (size >> (7 * k)) & 0x7F
        b = jnp.where(k + 1 < pre_len, b | 0x80, b)
        pre_byte = jnp.where(o == k, b, pre_byte)

    start_key = jnp.where(active, seq_start, jnp.int32(2**30))
    k = jnp.clip(jnp.searchsorted(start_key, o, side="right").astype(jnp.int32) - 1,
                 0, cap_tok - 1)
    r = o - seq_start[k]
    llk, lhk, lek = t_ll[k], lit_hdr[k], lit_extra[k]
    mlk, nck, offk = t_ml[k], n_copies[k], t_off[k]

    # literal tag byte
    lm1k = llk - 1
    lit_tag = jnp.where(lek == 0, lm1k << 2, (59 + lek) << 2)
    lit_len_byte = (lm1k >> (8 * jnp.clip(r - 1, 0, 3))) & 0xFF
    lit_data = data[jnp.clip(t_lit_src[k] + (r - lhk), 0, cap - 1)].astype(jnp.int32)

    # copy elements
    rc = r - lhk - llk
    c_idx = rc // 3
    c_pos = rc % 3
    clen = jnp.where(c_idx < nck - 1, 60, mlk - 60 * jnp.maximum(nck - 1, 0))
    copy_byte = jnp.where(c_pos == 0, ((clen - 1) << 2) | 2,
                jnp.where(c_pos == 1, offk & 0xFF, (offk >> 8) & 0xFF))

    out = jnp.where(o < pre_len, pre_byte,
          jnp.where(r == 0, jnp.where(lhk > 0, lit_tag, copy_byte),
          jnp.where(r < lhk, lit_len_byte,
          jnp.where(r < lhk + llk, lit_data, copy_byte))))
    out = jnp.where(o < total, out, 0).astype(jnp.uint8)

    too_big = total > out_cap
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL, Status.SUCCESS)
    out_size = jnp.where(too_big, 0, total).astype(jnp.int32)
    return out, out_size, status.astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: SnappyOpts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="snappy",
        compress_batch=compress_batch,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=DEFAULT_OPTS,
        get_decompress_size=get_decompress_size,
    ))
