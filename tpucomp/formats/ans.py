"""rANS entropy codec (batched, interleaved), TPU-native.

Analog of the reference's ANS format (``nvcompBatchedANS*``; GPU-native rANS,
``README.md:17``, ``benchmarks/benchmark_ans_chunked.cu:32,40-49`` — empty opts,
chunks < 2^32-1 B).  nvCOMP's container is closed-source, so the chunk format here
is our own; behavior parity is what matters: a pure entropy stage (no LZ), byte
alphabet, per-chunk adaptive tables, batched throughput.

Design (standard interleaved rANS a la ryg_rans, vectorized the TPU way):
  * 128 independent rANS states per chunk, lane ``j`` owning byte positions
    ``j, j+128, j+256, ...`` — one ``lax.scan`` step advances all lanes (and all
    chunks under ``vmap``) at once, so the sequential dependency is only over
    ``ceil(chunk/128)`` steps of fully vectorized work.
  * 32-bit states, 16-bit renormalization, 12-bit quantized frequencies
    (emission is at most one u16 per symbol, so buffer bounds are static).
  * All lanes share ONE interleaved word stream in exactly the order the
    decoder consumes it (step-major, lane-minor) — the classic SIMD-rANS
    layout.  The decoder then renormalizes every lane from one shared cursor:
    the words needed at a step are a contiguous window distributed to lanes by
    rank, which vectorizes on the VPU/MXU (no per-lane stream pointers, no
    gathers) — this is what makes the Pallas kernel
    (:mod:`tpucomp.ops.pallas.ans_decode`) fast.

Chunk format v2 (little-endian):
  u8 magic=0xA5, u8 version=2, u16 reserved, u32 size, u32 total_words,
  u16 freq[256] (12-bit quantized, sum=4096), u32 state[128], u16 wcount[128]
  (per-lane totals, validation only), then the shared interleaved u16 stream.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.constants import Status
from tpucomp.ops.parallel_lz import DUMP_SLOTS, dump_spread

MAGIC = 0xA5
VERSION = 2  # v2: shared interleaved stream (step-major); v1 per-lane regions
N_LANES = 128
PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
# np scalar, NOT jnp: a module-level jax array gets a cached trace-lifted
# tracer on jax 0.9.0; any LATER jitted entry that closes over it captures
# the stale tracer, its constants get separated into executable arguments,
# and the C++ dispatch fast path then re-dispatches WITHOUT them
# ("Execution supplied 2 buffers but compiled program expected N").
# tests/test_static_hygiene.py enforces this package-wide.
RANS_L = np.uint32(1 << 16)
HEADER_BYTES = 12 + 512 + 512 + 256  # fixed fields + freq + states + wcounts


@dataclasses.dataclass(frozen=True)
class ANSOpts:
    """Analog of ``nvcompBatchedANSOpts_t`` (single-value enum in 3.0.3)."""


DEFAULT_OPTS = ANSOpts()


def max_compressed_chunk_size(max_chunk_bytes: int, opts: ANSOpts = DEFAULT_OPTS) -> int:
    """Worst case: one u16 emitted per symbol plus the fixed header."""
    n = HEADER_BYTES + 2 * max_chunk_bytes + 64
    return (n + 1023) & ~1023


# =====================================================================================
# frequency quantization
# =====================================================================================

def quantize_freqs(counts: jax.Array, size: jax.Array) -> jax.Array:
    """Quantize 256 byte counts to 12-bit frequencies summing exactly PROB_SCALE.

    Present symbols (count>0) get freq>=1; absent symbols get 0.  Uses floor
    scaling plus largest-remainder distribution, with a final correction on the
    most frequent symbol (always large enough to absorb it).
    """
    counts = counts.astype(jnp.int64)
    size = jnp.maximum(size.astype(jnp.int64), 1)
    scaled = counts * PROB_SCALE
    base = scaled // size
    rem = scaled - base * size
    base = jnp.where(jnp.logical_and(counts > 0, base == 0), 1, base)
    # distribute the remaining budget to the largest remainders
    budget = PROB_SCALE - jnp.sum(base)
    order = jnp.argsort(-rem)  # descending remainders
    bonus_sorted = (jnp.arange(256) < budget).astype(jnp.int64)
    bonus = jnp.zeros((256,), jnp.int64).at[order].set(bonus_sorted)
    bonus = jnp.where(counts > 0, bonus, 0)
    freq = base + bonus
    # exact-sum correction: push the residual onto the largest frequencies,
    # never dropping a present symbol below 1.  A handful of rounds always
    # converges (each round absorbs up to freq[argmax]-1 units).
    for _ in range(4):
        resid = PROB_SCALE - jnp.sum(freq)
        top = jnp.argmax(freq)
        delta = jnp.clip(resid, 1 - freq[top], None)
        freq = freq.at[top].add(delta)
    return freq.astype(jnp.int32)


# =====================================================================================
# encode
# =====================================================================================

def tables_for(data: jax.Array, size: jax.Array):
    """Quantized (freq, cum) int32[256] tables for one chunk (vmappable)."""
    cap = data.shape[0]
    counts = jnp.zeros((256,), jnp.int32).at[data.astype(jnp.int32)].add(
        (jnp.arange(cap) < size).astype(jnp.int32))
    freq = quantize_freqs(counts, size.astype(jnp.int32))
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(freq)[:-1].astype(jnp.int32)])
    return freq, cum


def encode_chunk(data: jax.Array, size: jax.Array, opts: ANSOpts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode one chunk -> (out uint8[out_cap], out_size, status)."""
    cap = data.shape[0]
    size = size.astype(jnp.int32)
    T = -(-cap // N_LANES)  # steps per lane (static)

    freq, cum = tables_for(data, size)

    freq_u = freq.astype(jnp.uint32)
    cum_u = cum.astype(jnp.uint32)

    # symbols laid out [T, N_LANES]: step t, lane j -> position t*N_LANES+j
    pos = (jnp.arange(T)[:, None] * N_LANES
           + jnp.arange(N_LANES)[None, :]).astype(jnp.int32)
    sym = data[jnp.clip(pos, 0, cap - 1)].astype(jnp.int32)
    active = pos < size

    # hoist the 256-entry table lookups out of the scan: one bulk gather over
    # [T, N_LANES] instead of 3 small gathers per step (XLA:TPU scalarizes
    # in-scan gathers; the bulk form is a single vectorizable pass)
    freq_all = freq_u[sym]
    cum_all = cum_u[sym]

    def step(carry, inp):
        x, wcount = carry
        f, c, act = inp
        x_max = (f << jnp.uint32(20))  # ((L>>PROB_BITS)<<16) * f
        # f == PROB_SCALE (single-symbol chunk) makes x_max wrap to 0; the true
        # threshold is 2^32, i.e. never emit.
        emit = jnp.logical_and(jnp.logical_and(act, x_max != 0), x >= x_max)
        word = (x & jnp.uint32(0xFFFF)).astype(jnp.uint32)
        x = jnp.where(emit, x >> 16, x)
        fs = jnp.maximum(f, 1)  # guard div-by-0 for inactive lanes
        x_new = ((x // fs) << jnp.uint32(PROB_BITS)) + (x % fs) + c
        x = jnp.where(act, x_new, x)
        wcount_new = wcount + emit.astype(jnp.int32)
        return (x, wcount_new), (jnp.where(emit, word, 0).astype(jnp.uint32),
                                 emit)

    # encode in REVERSE position order (rANS is LIFO)
    init = (jnp.full((N_LANES,), RANS_L, jnp.uint32),
            jnp.zeros((N_LANES,), jnp.int32))
    (x_fin, wcount), (words_rev, emits_rev) = jax.lax.scan(
        step, init, (freq_all[::-1], cum_all[::-1], active[::-1]))
    # words_rev[t] was emitted at reverse-step t; the decoder consumes them in
    # the opposite order, so per-lane streams store words in emission order
    # REVERSED = forward-consumption order.
    # Compact: lane j's words (in reverse-emission order == decode order) are
    # words_rev[t, j] for emitting steps t taken in *decreasing* t?  No:
    # decode order = reverse of emission order; emission order within a lane is
    # scan order t=0.. (which is reverse position order).  So decode order is
    # ascending position order == descending t of the reversed scan == flip.
    words_dec = words_rev[::-1]      # [T, N_LANES] in decode order
    emits_dec = emits_rev[::-1]
    return serialize_scan(size, freq, x_fin, wcount, words_dec, emits_dec,
                          out_cap)


def serialize_scan(size, freq, x_fin, wcount, words_dec, emits_dec,
                   out_cap: int):
    """Compact + serialize a state-walk's outputs into the v2 container.

    Shared by the XLA scan encoder above and the Pallas encode kernel
    (:mod:`tpucomp.ops.pallas.ans_encode`): ``words_dec``/``emits_dec`` are
    ``[T, N_LANES]`` in decode order (forward position steps)."""
    T = words_dec.shape[0]
    # shared-stream compaction in decode order (step-major, lane-minor): the
    # row-major flattening of [T, N_LANES] IS the order the decoder's shared
    # cursor consumes words in (rank-among-needing-lanes = ascending lane)
    emits_flat = (emits_dec != 0).reshape(-1)
    words_flat = words_dec.astype(jnp.uint32).reshape(-1)
    lane_words = jnp.sum(emits_flat.reshape(T, N_LANES).astype(jnp.int32),
                         axis=0)
    total_words = jnp.sum(lane_words)
    # scatter-free stream compaction: sort (slot<<16 | word) packed keys
    pos_in_stream = jnp.cumsum(emits_flat.astype(jnp.int32)) - 1
    flat_idx = jnp.where(emits_flat, pos_in_stream, jnp.int32(1 << 24))
    packed = (flat_idx.astype(jnp.int64) << 16) | words_flat.astype(jnp.int64)
    packed = jnp.sort(packed)[:T * N_LANES]
    stream = (packed & 0xFFFF).astype(jnp.uint32)

    # ---- serialize -----------------------------------------------------------------
    def u16_bytes(v):  # int32[k] -> uint8[2k] LE
        v = v.astype(jnp.uint32)
        return jnp.stack([v & 0xFF, (v >> 8) & 0xFF], axis=1).reshape(-1).astype(jnp.uint8)

    def u32_bytes(v):
        v = v.astype(jnp.uint32)
        return jnp.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
                          (v >> 24) & 0xFF], axis=1).reshape(-1).astype(jnp.uint8)

    hdr = jnp.concatenate([
        jnp.array([MAGIC, VERSION, 0, 0], jnp.uint8),
        u32_bytes(size[None]),
        u32_bytes(total_words[None]),
        u16_bytes(freq),
        u32_bytes(x_fin.astype(jnp.int64).astype(jnp.uint32)),
        u16_bytes(wcount),       # == lane_words
        u16_bytes(stream.astype(jnp.int32)),
    ])
    out_size = HEADER_BYTES + 2 * total_words
    out = jnp.zeros((out_cap,), jnp.uint8)
    ncopy = min(out_cap, hdr.shape[0])
    valid = jnp.arange(ncopy) < out_size
    out = out.at[:ncopy].set(jnp.where(valid, hdr[:ncopy], 0))
    too_big = out_size > out_cap
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL, Status.SUCCESS)
    return out, jnp.where(too_big, 0, out_size).astype(jnp.int32), status.astype(jnp.int32)


# =====================================================================================
# decode
# =====================================================================================

def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one chunk -> (out uint8[out_cap], out_size, status)."""
    nbytes = comp.shape[0]
    T = -(-out_cap // N_LANES)
    gb = lambda o: comp[jnp.clip(o, 0, nbytes - 1)].astype(jnp.int32)

    def u16_at(o):
        return gb(o) | (gb(o + 1) << 8)

    def u32_at(o):
        return (gb(o) | (gb(o + 1) << 8) | (gb(o + 2) << 16) | (gb(o + 3) << 24))

    magic, ver = gb(0), gb(1)
    size = u32_at(4)
    total_words = u32_at(8)

    k256 = jnp.arange(256, dtype=jnp.int32)
    freq = u16_at(12 + 2 * k256)
    kl = jnp.arange(N_LANES, dtype=jnp.int32)
    state0 = u32_at(12 + 512 + 4 * kl).astype(jnp.int64).astype(jnp.uint32)
    lane_words = u16_at(12 + 512 + 512 + 2 * kl)
    stream_off = 12 + 512 + 512 + 256

    ok = jnp.logical_and(magic == MAGIC, ver == VERSION)
    ok = jnp.logical_and(ok, size <= out_cap)
    ok = jnp.logical_and(ok, jnp.sum(freq) == PROB_SCALE)
    ok = jnp.logical_and(ok, comp_size >= stream_off + 2 * total_words)
    ok = jnp.logical_and(ok, jnp.sum(lane_words) == total_words)
    size_c = jnp.clip(size, 0, out_cap)

    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(freq)[:-1].astype(jnp.int32)])
    # slot -> symbol lookup (4096 entries)
    slot = jnp.arange(PROB_SCALE, dtype=jnp.int32)
    sym_of_slot = (jnp.searchsorted(jnp.cumsum(freq), slot, side="right")
                   .astype(jnp.int32))
    sym_of_slot = jnp.clip(sym_of_slot, 0, 255)

    freq_u = freq.astype(jnp.uint32)
    cum_u = cum.astype(jnp.uint32)

    def read_word(ptr):
        o = stream_off + 2 * ptr
        return (gb(o) | (gb(o + 1) << 8)).astype(jnp.uint32)

    def step(carry, t):
        x, ptr, consumed = carry
        posn = t * N_LANES + kl
        act = posn < size_c
        s_idx = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)
        s = sym_of_slot[s_idx]
        f = freq_u[s]
        c = cum_u[s]
        x_new = f * (x >> jnp.uint32(PROB_BITS)) + x % jnp.uint32(PROB_SCALE) - c
        need = jnp.logical_and(act, x_new < RANS_L)
        # shared interleaved stream: needing lanes take the next words from
        # one cursor, distributed by rank (ascending lane order)
        rank = (jnp.cumsum(need.astype(jnp.int32)) - need).astype(jnp.int32)
        w = read_word(jnp.clip(ptr + rank, 0, jnp.maximum(total_words - 1, 0)))
        x_new = jnp.where(need, (x_new << 16) | w, x_new)
        ptr_new = (ptr + jnp.sum(need, dtype=jnp.int32)).astype(jnp.int32)
        x = jnp.where(act, x_new, x)
        out_byte = jnp.where(act, s, 0).astype(jnp.uint8)
        return (x, ptr_new, consumed + need.astype(jnp.int32)), out_byte

    init = (state0, jnp.int32(0), jnp.zeros((N_LANES,), jnp.int32))
    (x_fin, ptr_fin, consumed), bytes_tl = jax.lax.scan(
        step, init, jnp.arange(T, dtype=jnp.int32))
    # bytes_tl is [T, N_LANES]; position p = t*N_LANES + lane
    out_flat = bytes_tl.reshape(-1)[:out_cap]

    # sanity: every lane must end back at the initial state, the shared cursor
    # must land exactly on total_words, and per-lane consumption must match
    # the header's (validation-only) wcounts
    ok = jnp.logical_and(ok, jnp.all(x_fin == RANS_L) | (size_c == 0))
    ok = jnp.logical_and(ok, (ptr_fin == total_words) | (size_c == 0))
    ok = jnp.logical_and(ok, jnp.all(consumed == lane_words) | (size_c == 0))

    out_size = jnp.where(ok, size_c, 0).astype(jnp.int32)
    out = jnp.where(jnp.arange(out_cap) < out_size, out_flat, 0).astype(jnp.uint8)
    status = jnp.where(ok, Status.SUCCESS, Status.ERROR_CANNOT_DECOMPRESS)
    return out, out_size, status.astype(jnp.int32)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    gb = lambda o: comp[jnp.clip(o, 0, comp.shape[0] - 1)].astype(jnp.int32)
    size = gb(4) | (gb(5) << 8) | (gb(6) << 16) | (gb(7) << 24)
    ok = jnp.logical_and(comp_size >= 12, gb(0) == MAGIC)
    return jnp.where(ok, size, 0).astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: ANSOpts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="ans",
        compress_batch=compress_batch,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=DEFAULT_OPTS,
        get_decompress_size=get_decompress_size,
    ))
