"""Cascaded codec: N x RLE + N x Delta + bitpack, for numeric columns.

TPU-native reimplementation of the reference's Cascaded scheme
(``doc/algorithms_overview.md:9-45``; options struct and defaults
``benchmarks/benchmark_cascaded_chunked.cu:35-36,49-81``: ``{chunk_size, type,
num_RLEs=2, num_deltas=1, use_bp=1}``).  The reference builds these passes from CUB
prefix sums on GPU; here every pass is a vectorized XLA program — RLE via
boundary-flag + cumsum + scatter, expand via searchsorted gather, delta via
diff/cumsum, bitpack via :mod:`tpucomp.ops.bitpack` — with static shapes so the
whole batch compiles to one fused program under ``vmap``.

The per-chunk container format is our own (the reference's is closed-source); it is
self-describing so decompression needs no out-of-band options, matching
``nvcompBatchedCascadedDecompressAsync``'s optionless signature:

    header (24 B):  u8 magic=0xCA, u8 version=1, u8 num_rles, u8 num_deltas,
                    u8 type_id, u8 use_bp, u8[2] reserved,
                    u32 n_elements, u32 n1 (after RLE1), u32 n2 (after RLE2)
    streams (4-B aligned, in order): runs1 (n1) if num_rles>=1,
                    runs2 (n2) if num_rles>=2, values (n2)
    each stream:    i64 min, u8 bits (pow2 <= 64), u8[7] pad,
                    i64 first0, i64 first1 (delta-pass seeds; zero for run streams),
                    u32 words[]

Decode is fully dynamic in (num_rles, num_deltas, type): all branches are computed
with masked selects so one compiled program decodes any cascaded chunk.  Corrupt
input yields per-chunk status ``ERROR_CANNOT_DECOMPRESS`` with size 0 and never an
out-of-bounds access (reference contract: ``CHANGELOG.md:160-164``).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.constants import ElementType, Status
from tpucomp.ops import bitpack
from tpucomp.ops.parallel_lz import DUMP_SLOTS, dump_spread

MAGIC = 0xCA
VERSION = 1
HEADER_BYTES = 24
STREAM_HEADER_BYTES = 32


@dataclasses.dataclass(frozen=True)
class CascadedOpts:
    """Analog of ``nvcompBatchedCascadedOpts_t`` (defaults per reference)."""

    type: ElementType = ElementType.UINT
    num_rles: int = 2
    num_deltas: int = 1
    use_bp: bool = True

    def __post_init__(self):
        if not (0 <= self.num_rles <= 2 and 0 <= self.num_deltas <= 2):
            raise ValueError("num_rles and num_deltas must be in [0, 2]")


DEFAULT_OPTS = CascadedOpts()

# np scalar, NOT jnp: a module-level jax array gets a cached trace-lifted
# tracer on jax 0.9.0; any LATER jitted entry that closes over it captures
# the stale tracer, its constants get separated into executable arguments,
# and the C++ dispatch fast path then re-dispatches WITHOUT them
# ("Execution supplied 2 buffers but compiled program expected N").
# tests/test_static_hygiene.py enforces this package-wide.
_BIG = np.int64(0x7FFF_FFFF_FFFF_FFFF)


# =====================================================================================
# element <-> byte conversion (dynamic element width)
# =====================================================================================

def bytes_to_elements(data: jax.Array, ts: jax.Array, signed: jax.Array,
                      cap_el: int) -> jax.Array:
    """Assemble little-endian ``ts``-byte elements from ``uint8[cap_bytes]``.

    ``ts`` (1/2/4/8) and ``signed`` are traced scalars so one compiled program
    handles every ``ElementType``.  Returns int64[cap_el] (sign- or zero-extended).
    """
    nbytes = data.shape[0]
    i = jnp.arange(cap_el, dtype=jnp.int64)
    acc = jnp.zeros((cap_el,), jnp.uint64)
    for k in range(8):
        idx = jnp.clip(i * ts + k, 0, nbytes - 1).astype(jnp.int32)
        byte = data[idx].astype(jnp.uint64)
        acc = jnp.where(k < ts, acc | (byte << (8 * k)), acc)
    v = jax.lax.bitcast_convert_type(acc, jnp.int64)
    # sign-extend when the type is signed and narrower than 8 bytes
    top = (jnp.uint64(1) << (8 * ts.astype(jnp.uint64) - 1))
    neg = (acc & top) != 0
    ext = v - jax.lax.bitcast_convert_type(top << 1, jnp.int64)
    v = jnp.where(jnp.logical_and(signed, jnp.logical_and(neg, ts < 8)), ext, v)
    return v


def elements_to_bytes(v: jax.Array, ts: jax.Array, cap_bytes: int) -> jax.Array:
    """Inverse of :func:`bytes_to_elements` (truncating to ``ts`` bytes, LE)."""
    cap_el = v.shape[0]
    u = jax.lax.bitcast_convert_type(v.astype(jnp.int64), jnp.uint64)
    j = jnp.arange(cap_bytes, dtype=jnp.int64)
    el = jnp.clip((j // ts), 0, cap_el - 1).astype(jnp.int32)
    k = (j % ts).astype(jnp.uint64)
    return ((u[el] >> (8 * k)) & 0xFF).astype(jnp.uint8)


# =====================================================================================
# RLE / delta passes (per chunk, static capacity, traced counts)
# =====================================================================================

def rle_encode(v: jax.Array, count: jax.Array):
    """Run-length encode ``v[:count]`` -> (vals, runs, n_runs), padded to cap.

    Scatter-free: run-start positions are compacted with a sort; run lengths are
    differences of consecutive starts.  Entries past ``n_runs`` are garbage and
    must be masked by the caller (they already are).
    """
    cap = v.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid = idx < count
    prev = jnp.concatenate([v[:1] ^ jnp.int64(-1), v[:-1]])  # force boundary at 0
    boundary = jnp.logical_and(valid, v != prev)
    n_runs = jnp.sum(boundary.astype(jnp.int32))
    starts = jnp.sort(jnp.where(boundary, idx, jnp.int32(2**30)))
    starts_c = jnp.clip(starts, 0, cap - 1)
    vals = v[starts_c]
    next_start = jnp.concatenate([starts[1:], jnp.full((1,), 2**30, jnp.int32)])
    ends = jnp.minimum(next_start, count.astype(jnp.int32))
    runs = jnp.clip(ends - starts, 0, cap).astype(jnp.int64)
    return vals, runs, n_runs


def rle_expand(vals: jax.Array, runs: jax.Array, n_runs: jax.Array,
               out_cap: int) -> jax.Array:
    """Expand runs back out: out[i] = vals[j] where i falls in run j."""
    cap = vals.shape[0]
    ends = jnp.cumsum(jnp.where(jnp.arange(cap) < n_runs, runs, 0))
    ends = jnp.where(jnp.arange(cap) < n_runs, ends, _BIG)
    i = jnp.arange(out_cap, dtype=jnp.int64)
    j = jnp.searchsorted(ends, i, side="right").astype(jnp.int32)
    return vals[jnp.clip(j, 0, cap - 1)]


def delta_encode(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Returns (deltas with d[0]=0, first value).  Storing the first value in the
    stream header keeps it out of the bitpack range (a lone large seed would
    otherwise force a wide packing width for the whole stream)."""
    prev = jnp.concatenate([v[:1], v[:-1]])
    return v - prev, v[0]


def delta_decode(v: jax.Array, count: jax.Array, first: jax.Array) -> jax.Array:
    masked = jnp.where(jnp.arange(v.shape[0]) < count, v, 0)
    return jnp.cumsum(masked) + first


# =====================================================================================
# stream serialization
# =====================================================================================

def _stream_bytes(vmin, bits, words, n_words, cap_words: int,
                  firsts=(0, 0)) -> tuple[jax.Array, jax.Array]:
    """Serialize one packed stream -> (uint8[32 + 4*cap_words], byte_len)."""
    shifts = jnp.arange(8, dtype=jnp.uint64) * 8

    def i64_bytes(x):
        u = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.int64), jnp.uint64)
        return ((u >> shifts) & 0xFF).astype(jnp.uint8)

    hdr = jnp.concatenate([
        i64_bytes(vmin),
        jnp.array([0], jnp.uint8).at[0].set(bits.astype(jnp.uint8)),
        jnp.zeros((7,), jnp.uint8),
        i64_bytes(firsts[0]),
        i64_bytes(firsts[1]),
    ])
    wshifts = jnp.arange(4, dtype=jnp.uint32) * 8
    wbytes = ((words[:, None] >> wshifts[None, :]) & 0xFF).astype(jnp.uint8).reshape(-1)
    return jnp.concatenate([hdr, wbytes]), STREAM_HEADER_BYTES + 4 * n_words


def _parse_stream(comp: jax.Array, off: jax.Array, count: jax.Array,
                  cap_el: int):
    """Parse a stream at dynamic offset
    -> (values int64[cap_el], byte_len, bits_ok, (first0, first1))."""
    nbytes = comp.shape[0]
    g = lambda o: comp[jnp.clip(o, 0, nbytes - 1).astype(jnp.int32)]
    shifts = jnp.arange(8, dtype=jnp.uint64) * 8

    def i64_at(o):
        u = jnp.sum(g(o + jnp.arange(8)).astype(jnp.uint64) << shifts)
        return jax.lax.bitcast_convert_type(u, jnp.int64)

    vmin = i64_at(off)
    bits = g(off + 8).astype(jnp.int32)
    firsts = (i64_at(off + 16), i64_at(off + 24))
    bits_ok = jnp.any(bits == jnp.array(bitpack.ALLOWED_BITS, jnp.int32))
    n_words = bitpack.packed_words(count, bits)
    cap_w = 2 * cap_el
    wi = jnp.arange(cap_w, dtype=jnp.int64)
    base = off + STREAM_HEADER_BYTES + 4 * wi
    words = (g(base).astype(jnp.uint32)
             | (g(base + 1).astype(jnp.uint32) << 8)
             | (g(base + 2).astype(jnp.uint32) << 16)
             | (g(base + 3).astype(jnp.uint32) << 24))
    words = jnp.where(wi < n_words, words, 0)
    vals = bitpack.unpack(words, cap_el, bits, vmin)
    return vals, STREAM_HEADER_BYTES + 4 * n_words, bits_ok, firsts


# =====================================================================================
# encode / decode (single chunk; vmap over the batch axis)
# =====================================================================================

def _type_info(tid: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(type_size, is_signed, is_valid) from a traced ElementType id."""
    ts = jnp.full((), 1, jnp.int64)
    signed = jnp.full((), False)
    valid = jnp.full((), False)
    for t in ElementType:
        if t == ElementType.BITS:
            m = tid == int(t)
            ts = jnp.where(m, 1, ts)
            valid = jnp.where(m, True, valid)
            continue
        m = tid == int(t)
        ts = jnp.where(m, t.nbytes, ts)
        signed = jnp.where(m, t.is_signed, signed)
        valid = jnp.where(m, True, valid)
    return ts, signed, valid


def max_compressed_chunk_size(max_chunk_bytes: int, opts: CascadedOpts = DEFAULT_OPTS) -> int:
    """Analog of ``nvcompBatchedCascadedCompressGetMaxOutputChunkSize``."""
    ts = 1 if opts.type == ElementType.BITS else opts.type.nbytes
    cap_el = -(-max_chunk_bytes // ts)
    val_bits = 8 * ts
    if opts.num_deltas > 0 or opts.type.is_signed:
        val_bits = min(64, 1 << (8 * ts).bit_length())  # pow2ceil(8*ts + 1)
    size = HEADER_BYTES
    size += opts.num_rles * (STREAM_HEADER_BYTES + 4 * cap_el)  # run widths <= 32
    size += STREAM_HEADER_BYTES + (val_bits // 8) * cap_el
    return (size + 1023) & ~1023


def encode_chunk(data: jax.Array, size: jax.Array, opts: CascadedOpts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compress one chunk -> (out uint8[out_cap], out_size, status).

    ``opts`` is static (compile-time); ``size`` is traced.  Mirrors the LLIF
    contract: chunk bytes must be a multiple of the element size
    (``benchmarks/benchmark_cascaded_chunked.cu:49-81``).
    """
    cap_bytes = data.shape[0]
    ts_py = 1 if opts.type == ElementType.BITS else opts.type.nbytes
    cap_el = -(-cap_bytes // ts_py)
    ts = jnp.int64(ts_py)
    signed = jnp.array(opts.type.is_signed and opts.type != ElementType.BITS)

    bad_size = (size % ts_py) != 0
    n = (size // ts_py).astype(jnp.int64)

    v = bytes_to_elements(data, ts, signed, cap_el)
    v = jnp.where(jnp.arange(cap_el) < n, v, 0)

    # RLE passes (static count per opts)
    n1 = n
    runs1 = jnp.zeros((cap_el,), jnp.int64)
    if opts.num_rles >= 1:
        v, runs1, n1 = rle_encode(v, n)
    n2 = n1
    runs2 = jnp.zeros((cap_el,), jnp.int64)
    if opts.num_rles >= 2:
        v, runs2, n2 = rle_encode(v, n1)

    # delta passes on the value stream (seeds go to the stream header)
    firsts = [jnp.int64(0), jnp.int64(0)]
    for j in range(opts.num_deltas):
        v, firsts[j] = delta_encode(v)
        v = jnp.where(jnp.arange(cap_el) < n2, v, 0)

    # pack the streams
    def packed(stream_v, count, firsts=(0, 0)):
        vmin, bits = bitpack.choose_width(stream_v, count)
        # round into the W64 ladder so the TPU fast decoder
        # (ops/cascaded_fast.py) can read every frame this encoder emits
        bits = bitpack.round_width(bits)
        if not opts.use_bp:
            bits = jnp.maximum(bits, jnp.int32(8 * ts_py))
            bits = bitpack.round_bits_pow2(bits)
        words = bitpack.pack(stream_v, count, vmin, bits, 2 * cap_el)
        return _stream_bytes(vmin, bits, words, bitpack.packed_words(count, bits),
                             2 * cap_el, firsts)

    segments = []
    if opts.num_rles >= 1:
        segments.append(packed(runs1, n1))
    if opts.num_rles >= 2:
        segments.append(packed(runs2, n2))
    segments.append(packed(v, n2, firsts))

    # header
    hdr = jnp.zeros((HEADER_BYTES,), jnp.uint8)
    hdr = hdr.at[0].set(MAGIC).at[1].set(VERSION)
    hdr = hdr.at[2].set(opts.num_rles).at[3].set(opts.num_deltas)
    hdr = hdr.at[4].set(int(opts.type)).at[5].set(int(opts.use_bp))
    for pos, cnt in ((8, n), (12, n1), (16, n2)):
        for b in range(4):
            hdr = hdr.at[pos + b].set(((cnt >> (8 * b)) & 0xFF).astype(jnp.uint8))

    # assemble at dynamic offsets
    pos = jnp.arange(out_cap, dtype=jnp.int64)
    out = jnp.where(pos < HEADER_BYTES, hdr[jnp.clip(pos, 0, HEADER_BYTES - 1).astype(jnp.int32)], 0)
    off = jnp.int64(HEADER_BYTES)
    for arr, blen in segments:
        sel = jnp.logical_and(pos >= off, pos < off + blen)
        g = arr[jnp.clip(pos - off, 0, arr.shape[0] - 1).astype(jnp.int32)]
        out = jnp.where(sel, g, out)
        off = off + blen

    status = jnp.where(bad_size, Status.ERROR_INVALID_VALUE, Status.SUCCESS)
    status = jnp.where(off > out_cap, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL, status)
    out_size = jnp.where(status == Status.SUCCESS, off, 0).astype(jnp.int32)
    return out.astype(jnp.uint8), out_size, status.astype(jnp.int32)


def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decompress one chunk -> (out uint8[out_cap], out_size, status).

    Fully dynamic: reads num_rles/num_deltas/type from the header, so no options
    are needed (parity with ``nvcompBatchedCascadedDecompressAsync``).
    """
    nbytes = comp.shape[0]
    cap_el = out_cap
    g = lambda o: comp[jnp.clip(o, 0, nbytes - 1).astype(jnp.int32)]

    def u32_at(o):
        return (g(o).astype(jnp.int64) | (g(o + 1).astype(jnp.int64) << 8)
                | (g(o + 2).astype(jnp.int64) << 16) | (g(o + 3).astype(jnp.int64) << 24))

    magic, ver = g(0), g(1)
    nr = g(2).astype(jnp.int32)
    nd = g(3).astype(jnp.int32)
    tid = g(4).astype(jnp.int32)
    n, n1, n2 = u32_at(8), u32_at(12), u32_at(16)
    ts, signed, type_ok = _type_info(tid)

    ok = jnp.logical_and(magic == MAGIC, ver == VERSION)
    ok = jnp.logical_and(ok, comp_size >= HEADER_BYTES)
    ok = jnp.logical_and(ok, jnp.logical_and(nr <= 2, nd <= 2))
    ok = jnp.logical_and(ok, type_ok)
    ok = jnp.logical_and(ok, n * ts <= out_cap)
    ok = jnp.logical_and(ok, jnp.logical_and(n1 <= n, n2 <= n1))
    ok = jnp.logical_and(ok, n <= cap_el)

    # clamp counts so downstream indexing stays in range even on corrupt input
    n = jnp.clip(n, 0, cap_el)
    n1 = jnp.clip(n1, 0, n)
    n2 = jnp.clip(n2, 0, n1)

    off = jnp.int64(HEADER_BYTES)
    runs1, len1, ok1, _ = _parse_stream(comp, off, n1, cap_el)
    off1 = off + jnp.where(nr >= 1, len1, 0)
    runs2, len2, ok2, _ = _parse_stream(comp, off1, n2, cap_el)
    off2 = off1 + jnp.where(nr >= 2, len2, 0)
    vals, len3, ok3, dfirsts = _parse_stream(comp, off2, n2, cap_el)
    end = off2 + len3

    ok = jnp.logical_and(ok, end <= comp_size)
    ok = jnp.logical_and(ok, jnp.where(nr >= 1, ok1, True))
    ok = jnp.logical_and(ok, jnp.where(nr >= 2, ok2, True))
    ok = jnp.logical_and(ok, ok3)

    # un-delta in reverse pass order (dynamic count, static unroll of <=2 passes)
    for k in range(2):
        j = nd - 1 - k          # pass index being inverted
        seed = jnp.where(j == 0, dfirsts[0], dfirsts[1])
        und = delta_decode(vals, n2, seed)
        vals = jnp.where(j >= 0, und, vals)

    # expand RLE passes; validate run sums so corrupt runs can't fake success
    runs2_sum = jnp.sum(jnp.where(jnp.arange(cap_el) < n2, runs2, 0))
    runs1_sum = jnp.sum(jnp.where(jnp.arange(cap_el) < n1, runs1, 0))
    runs_pos2 = jnp.all(jnp.where(jnp.arange(cap_el) < n2, runs2 > 0, True))
    runs_pos1 = jnp.all(jnp.where(jnp.arange(cap_el) < n1, runs1 > 0, True))
    ok = jnp.logical_and(ok, jnp.where(nr >= 2, jnp.logical_and(runs2_sum == n1, runs_pos2), True))
    ok = jnp.logical_and(ok, jnp.where(nr >= 1, jnp.logical_and(runs1_sum == n, runs_pos1), True))

    exp2 = rle_expand(vals, runs2, n2, cap_el)
    vals = jnp.where(nr >= 2, exp2, vals)
    exp1 = rle_expand(vals, runs1, n1, cap_el)
    vals = jnp.where(nr >= 1, exp1, vals)

    out = elements_to_bytes(vals, ts, out_cap)
    out_size_raw = (n * ts).astype(jnp.int32)
    valid_mask = jnp.arange(out_cap) < jnp.where(ok, out_size_raw, 0)
    out = jnp.where(valid_mask, out, 0)
    status = jnp.where(ok, Status.SUCCESS, Status.ERROR_CANNOT_DECOMPRESS)
    out_size = jnp.where(ok, out_size_raw, 0)
    return out, out_size, status.astype(jnp.int32)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    """Parse the decompressed byte count from a chunk header
    (analog of ``nvcompBatchedCascadedGetDecompressSizeAsync``)."""
    nbytes = comp.shape[0]
    g = lambda o: comp[jnp.clip(o, 0, nbytes - 1)].astype(jnp.int64)
    n = g(8) | (g(9) << 8) | (g(10) << 16) | (g(11) << 24)
    ts, _, type_ok = _type_info(g(4).astype(jnp.int32))
    ok = jnp.logical_and(comp_size >= HEADER_BYTES, jnp.logical_and(g(0) == MAGIC, type_ok))
    return jnp.where(ok, n * ts, 0).astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: CascadedOpts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)
