"""Bitcomp-analog numeric codec for HPC int/float data.

The reference's Bitcomp is proprietary with no public container spec
(``README.md:13-15``: numeric/bitplane codec, "algos 0 default, 1 sparse",
typed options ``nvcompBatchedBitcompFormatOpts{ int algorithm_type;
nvcompType_t data_type }``).  This module reproduces the *behavioral* surface —
typed numeric compression tuned for smooth/sparse scientific data, same options
— with our own container:

* **algo 0 (default)**: XOR-delta between consecutive elements (works uniformly
  for ints and floats: nearby values share high bits, so XOR concentrates
  entropy in the low bits), then per-subblock (256 elements) frame packing at
  pow2 widths.  Fully vectorized: widths via segment maxima, pack/unpack via
  the shared non-straddling pow2 scheme with per-subblock word offsets.
* **algo 1 (sparse)**: nonzero bitmap + packed raw nonzero values — for tensors
  with many exact zeros (the reference's "sparse" mode).

Chunk layout (LE): u8 magic=0xB1, u8 ver, u8 algo, u8 type_id, u32 n_elements;
  algo 0: u8 bits[n_subblocks] (4-aligned), raw per-subblock seed elements
          (ts bytes each, 4-aligned), then each subblock's packed words back to
          back (offsets derived from the width table).  Each subblock XOR-deltas
          against its own first element (the seed), so subblocks are independent
          and a lone outlier can't widen its neighbours.
  algo 1: bitmap[ceil(n/8)] (4-aligned), then raw nonzero elements.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from tpucomp.constants import ElementType, Status
from tpucomp.ops.parallel_lz import DUMP_SLOTS, dump_spread

MAGIC = 0xB1
VERSION = 1
SUBBLOCK = 256
HEADER_BYTES = 8


@dataclasses.dataclass(frozen=True)
class BitcompOpts:
    """Analog of ``nvcompBatchedBitcompFormatOpts`` (defaults ``{0, UCHAR}``)."""

    algorithm_type: int = 0
    data_type: ElementType = ElementType.UCHAR


DEFAULT_OPTS = BitcompOpts()


def _ts(opts: BitcompOpts) -> int:
    return 1 if opts.data_type == ElementType.BITS else opts.data_type.nbytes


def max_compressed_chunk_size(max_chunk_bytes: int,
                              opts: BitcompOpts = DEFAULT_OPTS) -> int:
    ts = _ts(opts)
    n_el = -(-max_chunk_bytes // ts)
    nsub = -(-n_el // SUBBLOCK)
    a0 = (HEADER_BYTES + ((nsub + 3) & ~3) + ((nsub * ts + 3) & ~3)
          + n_el * 8 + 8)  # width table + seeds + 64-bit worst-case words
    a1 = HEADER_BYTES + (((n_el + 7) // 8 + 3) & ~3) + 4 + n_el * ts
    return (max(a0, a1) + 1023) & ~1023


def _u64_view(data: jax.Array, size: jax.Array, ts: int, cap_el: int):
    """Raw little-endian ``ts``-byte elements as uint64 bit patterns."""
    nbytes = data.shape[0]
    i = jnp.arange(cap_el, dtype=jnp.int32)
    acc = jnp.zeros((cap_el,), jnp.uint64)
    for k in range(ts):
        idx = jnp.clip(i * ts + k, 0, nbytes - 1)
        acc = acc | (data[idx].astype(jnp.uint64) << (8 * k))
    n = size // ts
    return jnp.where(i < n, acc, 0), n


def _bytes_from_u64(v: jax.Array, ts: int, cap_bytes: int):
    cap_el = v.shape[0]
    j = jnp.arange(cap_bytes, dtype=jnp.int32)
    el = jnp.clip(j // ts, 0, cap_el - 1)
    k = (j % ts).astype(jnp.uint64)
    return ((v[el] >> (8 * k)) & 0xFF).astype(jnp.uint8)


def _exact_width(maxval: jax.Array) -> jax.Array:
    """Exact bit length of the subblock maximum (0..64)."""
    w = jnp.zeros(maxval.shape, jnp.int32)
    for k in range(64):
        w = w + ((maxval >> k) > 0).astype(jnp.int32)
    return w


def encode_chunk(data: jax.Array, size: jax.Array, opts: BitcompOpts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    cap_bytes = data.shape[0]
    ts = _ts(opts)
    nsub = -(-(-(-cap_bytes // ts)) // SUBBLOCK)
    cap_el = nsub * SUBBLOCK
    size = size.astype(jnp.int32)
    bad = (size % ts) != 0

    v, n = _u64_view(data, size, ts, cap_el)
    i = jnp.arange(cap_el, dtype=jnp.int32)
    valid = i < n

    hdr = jnp.zeros((HEADER_BYTES,), jnp.uint8)
    hdr = hdr.at[0].set(MAGIC).at[1].set(VERSION)
    hdr = hdr.at[2].set(opts.algorithm_type).at[3].set(int(opts.data_type))
    for b in range(4):
        hdr = hdr.at[4 + b].set(((n >> (8 * b)) & 0xFF).astype(jnp.uint8))

    pos = jnp.arange(out_cap, dtype=jnp.int32)
    out = jnp.where(pos < HEADER_BYTES,
                    hdr[jnp.clip(pos, 0, HEADER_BYTES - 1)], 0).astype(jnp.uint8)

    if opts.algorithm_type == 1:
        # ---- sparse: bitmap + raw nonzeros ------------------------------------------
        nz = jnp.logical_and(valid, v != 0)
        bm_bytes = (cap_el + 7) // 8
        bit_idx = i
        bm = jnp.zeros((bm_bytes,), jnp.uint8).at[bit_idx >> 3].add(
            (nz.astype(jnp.uint8) << (bit_idx & 7).astype(jnp.uint8)))
        bm_used = (n + 7) // 8
        bm_al = ((bm_used + 3) // 4) * 4
        # compact nonzero values
        rank = jnp.cumsum(nz.astype(jnp.int32)) - 1
        count = jnp.sum(nz.astype(jnp.int32))
        vals = jnp.zeros((cap_el + DUMP_SLOTS,), jnp.uint64).at[
            jnp.where(nz, rank, dump_spread(i, cap_el))].set(v)[:cap_el]
        val_bytes = _bytes_from_u64(vals, ts, cap_el * ts)

        off_bm = HEADER_BYTES
        off_cnt = off_bm + bm_al
        off_vals = off_cnt + 4
        total = off_vals + count * ts

        sel_bm = jnp.logical_and(pos >= off_bm, pos < off_bm + bm_used)
        out = jnp.where(sel_bm, bm[jnp.clip(pos - off_bm, 0, bm_bytes - 1)], out)
        cnt_b = ((count[None] >> (8 * jnp.arange(4))) & 0xFF).astype(jnp.uint8)
        out = jnp.where(jnp.logical_and(pos >= off_cnt, pos < off_cnt + 4),
                        cnt_b[jnp.clip(pos - off_cnt, 0, 3)], out)
        sel_v = jnp.logical_and(pos >= off_vals, pos < total)
        out = jnp.where(sel_v,
                        val_bytes[jnp.clip(pos - off_vals, 0, cap_el * ts - 1)],
                        out)
    else:
        # ---- algo 0: per-subblock seed + XOR-delta + exact-width packing ------------
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), v[:-1]])
        sb = i // SUBBLOCK
        first_in_sb = (i % SUBBLOCK) == 0
        d = jnp.where(jnp.logical_and(valid, jnp.logical_not(first_in_sb)),
                      v ^ prev, 0)
        seeds = v.reshape(nsub, SUBBLOCK)[:, 0]          # uint64[nsub]
        sb_max = jnp.zeros((nsub,), jnp.uint64).at[sb].max(d)
        bits = _exact_width(sb_max)                      # int32[nsub], 0..64

        # per-subblock word counts and offsets
        n_sub_used = (n + SUBBLOCK - 1) // SUBBLOCK
        sb_words = (SUBBLOCK * bits + 31) // 32
        sb_words_u = jnp.where(jnp.arange(nsub) < n_sub_used, sb_words, 0)
        word_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    jnp.cumsum(sb_words_u)[:-1].astype(jnp.int32)])
        total_words = jnp.sum(sb_words_u)

        # pack: element i occupies bits [(i%SB)*b, ...+b) of its subblock's word
        # space; a value shifted into place spans at most 3 u32 words, emitted as
        # three non-overlapping scatter-OR contributions.
        eb = bits[sb]
        local = (i % SUBBLOCK).astype(jnp.int64) * eb
        widx = word_off[sb] + (local >> 5).astype(jnp.int32)
        sh = (local & 31).astype(jnp.uint64)
        mask = jnp.where(eb >= 64, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                         (jnp.uint64(1) << jnp.uint64(jnp.clip(eb, 0, 63))) - 1)
        dm = d & mask
        a_lo = dm & jnp.uint64(0xFFFFFFFF)
        b_hi = dm >> 32
        M32 = jnp.uint64(0xFFFFFFFF)
        w0 = ((a_lo << sh) & M32).astype(jnp.uint32)
        w1 = (((a_lo << sh) >> 32) | ((b_hi << sh) & M32)).astype(jnp.uint32)
        w2 = ((b_hi << sh) >> 32).astype(jnp.uint32)
        cap_words = 2 * cap_el + 4
        emit = jnp.logical_and(valid, eb > 0)
        words = jnp.zeros((cap_words + DUMP_SLOTS,), jnp.uint32)
        for off_k, part in ((0, w0), (1, w1), (2, w2)):
            tgt = jnp.where(emit, widx + off_k, dump_spread(i, cap_words))
            words = words.at[tgt].add(part)
        words = words[:cap_words]

        # aligned on the USED subblock count (all the decoder can derive from
        # n) — aligning on the static capacity nsub corrupted partial chunks
        codes_al = ((n_sub_used + 3) // 4) * 4
        off_codes = HEADER_BYTES
        seeds_al = ((n_sub_used * ts + 3) // 4) * 4
        off_seeds = off_codes + codes_al
        off_words = off_seeds + seeds_al
        total = off_words + 4 * total_words

        sel_c = jnp.logical_and(pos >= off_codes, pos < off_codes + n_sub_used)
        out = jnp.where(sel_c,
                        bits[jnp.clip(pos - off_codes, 0, nsub - 1)].astype(jnp.uint8),
                        out)
        seed_bytes = _bytes_from_u64(seeds, ts, nsub * ts)
        sel_s = jnp.logical_and(pos >= off_seeds, pos < off_seeds + n_sub_used * ts)
        out = jnp.where(sel_s,
                        seed_bytes[jnp.clip(pos - off_seeds, 0, nsub * ts - 1)],
                        out)
        wbytes_idx = pos - off_words
        w = words[jnp.clip(wbytes_idx >> 2, 0, cap_words - 1)]
        byte = ((w >> ((wbytes_idx & 3).astype(jnp.uint32) * 8)) & 0xFF).astype(jnp.uint8)
        out = jnp.where(jnp.logical_and(pos >= off_words, pos < total), byte, out)

    too_big = total > out_cap
    status = jnp.where(bad, Status.ERROR_INVALID_VALUE,
             jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL,
                       Status.SUCCESS))
    out_size = jnp.where(status == Status.SUCCESS, total, 0).astype(jnp.int32)
    return out, out_size, status.astype(jnp.int32)


def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    cap = comp.shape[0]
    comp_size = comp_size.astype(jnp.int32)
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)

    magic, ver, algo, tid = gb(0), gb(1), gb(2), gb(3)
    n = (gb(4) | (gb(5) << 8) | (gb(6) << 16) | (gb(7) << 24))

    # type size from tid (dynamic)
    ts = jnp.full((), 1, jnp.int32)
    type_ok = jnp.full((), False)
    for t in ElementType:
        nb = 1 if t == ElementType.BITS else t.nbytes
        m = tid == int(t)
        ts = jnp.where(m, nb, ts)
        type_ok = jnp.where(m, True, type_ok)

    nsub_cap = -(-out_cap // SUBBLOCK)
    cap_el = nsub_cap * SUBBLOCK  # worst case ts=1
    i = jnp.arange(cap_el, dtype=jnp.int32)
    valid = i < n

    ok = jnp.logical_and(magic == MAGIC, ver == VERSION)
    ok = jnp.logical_and(ok, type_ok)
    ok = jnp.logical_and(ok, comp_size >= HEADER_BYTES)
    ok = jnp.logical_and(ok, n * ts <= out_cap)
    ok = jnp.logical_and(ok, jnp.logical_or(algo == 0, algo == 1))
    n = jnp.clip(n, 0, cap_el)

    # ---- algo 1 -----------------------------------------------------------------
    bm_used = (n + 7) // 8
    bm_al = ((bm_used + 3) // 4) * 4
    off_cnt = HEADER_BYTES + bm_al
    count = (gb(off_cnt) | (gb(off_cnt + 1) << 8) | (gb(off_cnt + 2) << 16)
             | (gb(off_cnt + 3) << 24))
    off_vals = off_cnt + 4
    nzbit = (gb(HEADER_BYTES + (i >> 3)) >> (i & 7)) & 1
    nzbit = jnp.where(valid, nzbit, 0)
    rank = jnp.cumsum(nzbit) - 1
    acc1 = jnp.zeros((cap_el,), jnp.uint64)
    for k in range(8):
        idx = off_vals + rank * ts + k
        byte = gb(idx).astype(jnp.uint64)
        acc1 = jnp.where(k < ts, acc1 | (byte << (8 * k)), acc1)
    v1 = jnp.where(nzbit == 1, acc1, 0)
    total1 = off_vals + count * ts
    ok1 = jnp.logical_and(jnp.sum(nzbit) == count, total1 <= comp_size)

    # ---- algo 0 -----------------------------------------------------------------
    n_sub_used = (n + SUBBLOCK - 1) // SUBBLOCK
    sbi = jnp.arange(nsub_cap, dtype=jnp.int32)
    bits = jnp.where(sbi < n_sub_used, gb(HEADER_BYTES + sbi), 0)
    code_ok = jnp.all(bits <= 64)
    sb_words = jnp.where(sbi < n_sub_used, (SUBBLOCK * bits + 31) // 32, 0)
    word_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(sb_words)[:-1].astype(jnp.int32)])
    total_words = jnp.sum(sb_words)
    codes_al = ((n_sub_used + 3) // 4) * 4
    seeds_al = ((n_sub_used * ts + 3) // 4) * 4
    off_seeds = HEADER_BYTES + codes_al
    off_words = off_seeds + seeds_al
    total0 = off_words + 4 * total_words
    ok0 = jnp.logical_and(code_ok, total0 <= comp_size)

    # per-subblock seed elements
    seeds = jnp.zeros((nsub_cap,), jnp.uint64)
    for k in range(8):
        sbyte = gb(off_seeds + sbi * ts + k).astype(jnp.uint64)
        seeds = jnp.where(k < ts, seeds | (sbyte << (8 * k)), seeds)

    sb = i // SUBBLOCK
    eb = bits[jnp.clip(sb, 0, nsub_cap - 1)]
    local = (i % SUBBLOCK).astype(jnp.int64) * eb
    widx = word_off[jnp.clip(sb, 0, nsub_cap - 1)] + (local >> 5).astype(jnp.int32)

    def word_at(wi):
        o = off_words + 4 * wi
        return ((gb(o).astype(jnp.uint32) | (gb(o + 1).astype(jnp.uint32) << 8)
                 | (gb(o + 2).astype(jnp.uint32) << 16)
                 | (gb(o + 3).astype(jnp.uint32) << 24))).astype(jnp.uint64)

    sh = (local & 31).astype(jnp.uint64)
    mask = jnp.where(eb >= 64, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                     (jnp.uint64(1) << jnp.uint64(jnp.clip(eb, 0, 63))) - 1)
    f0, f1, f2 = word_at(widx), word_at(widx + 1), word_at(widx + 2)
    val = (f0 >> sh) | (f1 << (32 - sh))
    val = jnp.where(sh > 0, val | (f2 << (64 - sh)), val)
    d = val & mask
    d = jnp.where(jnp.logical_and(valid, eb > 0), d, 0)
    # undo XOR-delta: segmented prefix-XOR within each subblock, seeded
    dmat = jnp.where(valid, d, 0).reshape(nsub_cap, SUBBLOCK)
    scan = jax.lax.associative_scan(jnp.bitwise_xor, dmat, axis=1)
    v0 = (seeds[:, None] ^ scan).reshape(-1)
    v0 = jnp.where(valid, v0, 0)

    is_sparse = algo == 1
    v = jnp.where(is_sparse, v1, v0)
    ok = jnp.logical_and(ok, jnp.where(is_sparse, ok1, ok0))

    out_bytes = _bytes_from_u64_dynamic(v, ts, out_cap)
    out_size = jnp.where(ok, n * ts, 0).astype(jnp.int32)
    out = jnp.where(jnp.arange(out_cap) < out_size, out_bytes, 0)
    status = jnp.where(ok, Status.SUCCESS, Status.ERROR_CANNOT_DECOMPRESS)
    return out, out_size, status.astype(jnp.int32)


def _bytes_from_u64_dynamic(v: jax.Array, ts: jax.Array, cap_bytes: int):
    cap_el = v.shape[0]
    j = jnp.arange(cap_bytes, dtype=jnp.int32)
    el = jnp.clip(j // ts, 0, cap_el - 1)
    k = (j % ts).astype(jnp.uint64)
    return ((v[el] >> (8 * k)) & 0xFF).astype(jnp.uint8)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    cap = comp.shape[0]
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)
    n = (gb(4) | (gb(5) << 8) | (gb(6) << 16) | (gb(7) << 24))
    ts = jnp.full((), 1, jnp.int32)
    for t in ElementType:
        nb = 1 if t == ElementType.BITS else t.nbytes
        ts = jnp.where(gb(3) == int(t), nb, ts)
    ok = jnp.logical_and(comp_size >= HEADER_BYTES, gb(0) == MAGIC)
    return jnp.where(ok, n * ts, 0).astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: BitcompOpts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="bitcomp",
        compress_batch=compress_batch,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=DEFAULT_OPTS,
        get_decompress_size=get_decompress_size,
        elem_size=lambda o: o.data_type.nbytes,
    ))
