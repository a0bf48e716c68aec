"""Zstandard (RFC 8878) codec: full decoder + compressed-block encoder.

Analog of ``nvcompBatchedZstd*`` (decompress since 2.3, compress since 2.4;
empty opts struct, ``benchmarks/benchmark_zstd_chunked.cu:31,54-56``;
``CHANGELOG.md:22,38-41,55,80,121``).

Decoder architecture follows :mod:`tpucomp.formats.deflate`: a per-chunk
``while_loop`` state machine does the *parse* (frame header, block headers,
Huffman-tree descriptions, FSE table descriptions, the four interleaved literal
streams, and the backward sequence bitstream), producing a decoded literal
buffer plus a compact token stream of (literal-run, match) sequences; output
bytes then materialize fully in parallel (cumsum offsets + gather from the
literal buffer + log-doubling LZ77 resolve).  ``vmap`` batches every chunk in
lockstep, and the four Huffman literal streams decode simultaneously (one
symbol per stream per step), which is exactly the SIMD use the format's
4-stream mode was designed for.

Supported: raw/RLE/compressed blocks; raw/RLE/compressed/treeless literals
(1- and 4-stream); predefined/RLE/FSE-compressed/repeat sequence tables; repeat
offsets incl. the ``literal_length == 0`` special case; content checksum and
window fields parsed (checksum skipped, not verified).  Not supported:
dictionaries, skippable frames, multi-frame concatenation.

The encoder emits compressed blocks (4-stream Huffman literals + FSE-coded
sequences from the shared LZ matcher) with raw-literal, RLE, and store
fallbacks wherever those are smaller — always a valid single-frame stream that
python-zstandard decodes bit-exactly.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.constants import Status
from tpucomp.ops import parallel_lz as plz

MAGIC = 0xFD2FB528
MAX_ACC_LOG = 9           # LL/ML max 9, OF max 8
FSE_CAP = 1 << MAX_ACC_LOG
HUF_MAX_BITS = 11
HUF_CAP = 1 << HUF_MAX_BITS

# --- sequence code tables (RFC 8878 3.1.1.3.2.1) -------------------------------------

LL_BITS = np.array([0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
                    12, 13, 14, 15, 16], np.int32)
LL_BASE = np.array(list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64,
                    128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536],
                   np.int32)
ML_BITS = np.array([0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                    11, 12, 13, 14, 15, 16], np.int32)
ML_BASE = np.array(list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67,
                    83, 99, 131, 259, 515, 1027, 2051, 4099, 8195, 16387,
                    32771, 65539], np.int32)

LL_DEFAULT = np.array([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2,
                       2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1,
                       -1], np.int32)
ML_DEFAULT = np.array([1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                       1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                       1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1,
                       -1], np.int32)
OF_DEFAULT = np.array([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                       1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1], np.int32)
LL_DEFAULT_ACC, ML_DEFAULT_ACC, OF_DEFAULT_ACC = 6, 6, 5


@dataclasses.dataclass(frozen=True)
class ZstdOpts:
    """Analog of the empty ``nvcompBatchedZstdOpts_t``."""


DEFAULT_OPTS = ZstdOpts()


def max_compressed_chunk_size(max_chunk_bytes: int, opts: ZstdOpts = DEFAULT_OPTS) -> int:
    # encoder emits raw blocks: frame header (<=6) + 3B per <=128K block + data
    nblocks = max(1, -(-max_chunk_bytes // (1 << 17)))
    n = 8 + 3 * (nblocks + 1) + max_chunk_bytes + 32
    return (n + 1023) & ~1023


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


# =====================================================================================
# FSE decode-table construction (numpy for the predefined tables; traced for
# tables read from the stream — same algorithm)
# =====================================================================================

def _fse_build_np(norm: np.ndarray, acc_log: int) -> np.ndarray:
    """Decode table as int32[FSE_CAP] packed (symbol | nbits<<8 | baseline<<16)."""
    size = 1 << acc_log
    table_sym = np.zeros(size, np.int32)
    high = size - 1
    # "less than 1" symbols get one slot each at the end
    for s, p in enumerate(norm):
        if p == -1:
            table_sym[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    for s, p in enumerate(norm):
        for _ in range(max(int(p), 0)):
            table_sym[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    # per-slot nbits / baseline
    sym_next = np.array([1 if p == -1 else max(int(p), 0) for p in norm], np.int64)
    packed = np.zeros(FSE_CAP, np.int32)
    for i in range(size):
        s = table_sym[i]
        x = sym_next[s]
        sym_next[s] += 1
        nbits = acc_log - (int(x).bit_length() - 1)
        base = (int(x) << nbits) - size
        packed[i] = s | (nbits << 8) | (base << 16)
    return packed


LL_DEFAULT_TABLE = _fse_build_np(LL_DEFAULT, LL_DEFAULT_ACC)
ML_DEFAULT_TABLE = _fse_build_np(ML_DEFAULT, ML_DEFAULT_ACC)
OF_DEFAULT_TABLE = _fse_build_np(OF_DEFAULT, OF_DEFAULT_ACC)


def _fse_enc_np(packed: np.ndarray, acc: int, n_sym: int):
    """Encode-side lookup from a decode table: for (symbol s, next-state x),
    the unique slot y with sym(y)==s and x in [base_y, base_y+2^nb_y).

    Returns (state_tab[n_sym, 2^acc] = y, nb_tab, base_tab, first_slot[n_sym]).
    """
    size = 1 << acc
    state_tab = np.zeros((n_sym, size), np.int32)
    nb_tab = np.zeros((n_sym, size), np.int32)
    base_tab = np.zeros((n_sym, size), np.int32)
    first = np.full(n_sym, -1, np.int32)
    for y in range(size):
        e = int(packed[y])
        sym, nb, base = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFFFF
        if sym >= n_sym:
            continue
        if first[sym] < 0:
            first[sym] = y
        for x in range(base, base + (1 << nb)):
            state_tab[sym, x] = y
            nb_tab[sym, x] = nb
            base_tab[sym, x] = base
    return state_tab, nb_tab, base_tab, first


LL_ENC = _fse_enc_np(LL_DEFAULT_TABLE, LL_DEFAULT_ACC, 36)
ML_ENC = _fse_enc_np(ML_DEFAULT_TABLE, ML_DEFAULT_ACC, 53)
OF_ENC = _fse_enc_np(OF_DEFAULT_TABLE, OF_DEFAULT_ACC, 29)


def _fse_build_traced(norm: jax.Array, nsym: jax.Array, acc_log: jax.Array):
    """Traced version of :func:`_fse_build_np` -> (packed int32[FSE_CAP], ok).

    ``norm`` int32[max_sym] with -1 for less-than-1; entries >= nsym are zero.

    Fully vectorized (no sequential spread loop): the spec's position walk
    ``pos_{k+1} = (pos_k + step) mod size`` with ``step = size/2 + size/8 + 3``
    visits ``(k * step) mod size`` — a permutation, since ``step`` is odd and
    ``size`` a power of two.  Skipping the reserved low-probability region is a
    filter over that permutation, and the k-th assigned symbol comes from a
    searchsorted over the positive-count prefix sums.
    """
    max_sym = norm.shape[0]
    size = (jnp.int32(1) << acc_log).astype(jnp.int32)
    ks = jnp.arange(FSE_CAP, dtype=jnp.int32)
    in_table = ks < size

    sym_ids = jnp.arange(max_sym, dtype=jnp.int32)
    active = sym_ids < nsym
    is_m1 = jnp.logical_and(norm == -1, active)
    n_m1 = jnp.sum(is_m1.astype(jnp.int32))
    high = size - 1 - n_m1
    pos_counts = jnp.where(active, jnp.maximum(norm, 0), 0)
    cum_counts = jnp.cumsum(pos_counts)
    total_pos = cum_counts[max_sym - 1] if max_sym > 0 else jnp.int32(0)

    # -1 symbols occupy the tail slots in symbol order, descending position
    m1_rank = jnp.cumsum(is_m1.astype(jnp.int32)) - 1
    m1_sym_at = jnp.zeros((FSE_CAP + 1,), jnp.int32).at[
        jnp.clip(jnp.where(is_m1, size - 1 - m1_rank, FSE_CAP), 0, FSE_CAP)].set(
        sym_ids)

    # spread walk as a filtered permutation
    step = (size >> 1) + (size >> 3) + 3
    perm = (ks * step) & (size - 1)                  # position at walk index j
    keep = jnp.logical_and(in_table, perm <= high)
    k_of_j = jnp.cumsum(keep.astype(jnp.int32)) - 1  # assignment index
    sym_of_k = jnp.searchsorted(cum_counts, jnp.clip(k_of_j, 0, size - 1),
                                side="right").astype(jnp.int32)
    sym_of_k = jnp.clip(sym_of_k, 0, max_sym - 1)
    assigned = jnp.logical_and(keep, k_of_j < total_pos)
    table_sym = jnp.zeros((FSE_CAP + 1,), jnp.int32).at[
        jnp.where(assigned, perm, FSE_CAP)].set(sym_of_k)
    table_sym = jnp.where(jnp.arange(FSE_CAP + 1) > high,
                          m1_sym_at, table_sym)[:FSE_CAP]

    # per-slot nbits/baseline: rank of slot within its symbol (slot order)
    valid_slot = ks < size
    key = jnp.where(valid_slot, table_sym[ks], max_sym).astype(jnp.int64) * FSE_CAP + ks
    order = jnp.argsort(key).astype(jnp.int32)
    sym_sorted = table_sym[order]
    same = jnp.concatenate([jnp.zeros((1,), jnp.bool_),
                            sym_sorted[1:] == sym_sorted[:-1]])
    rank_sorted = plz.prefix_run_length(same)  # 0 for first of each symbol
    rank = jnp.zeros((FSE_CAP,), jnp.int32).at[order].set(rank_sorted)

    start = jnp.where(is_m1, 1, pos_counts)
    x = start[jnp.clip(table_sym, 0, max_sym - 1)] + rank
    xl = jnp.zeros((FSE_CAP,), jnp.int32)
    for k in range(MAX_ACC_LOG + 2):
        xl = xl + ((x >> k) > 0).astype(jnp.int32)
    nbits = jnp.clip(acc_log - (xl - 1), 0, 31)
    base = (x << nbits) - size
    packed = table_sym | (nbits << 8) | (jnp.clip(base, 0, (1 << 15) - 1) << 16)
    packed = jnp.where(valid_slot, packed, 0)
    ok = jnp.sum(jnp.where(active, jnp.abs(norm), 0)) == size
    return packed, ok


def _fse_unpack(packed_entry):
    sym = packed_entry & 0xFF
    nbits = (packed_entry >> 8) & 0xFF
    base = (packed_entry >> 16) & 0xFFFF
    return sym, nbits, base


# =====================================================================================
# custom FSE tables for sequence codes (encode side)
# =====================================================================================

def _normalize_counts(freq: jax.Array, size: int):
    """Normalize symbol counts to an FSE table of ``size`` slots.

    Returns ``(norm int32[max_sym], nsym, ok)``: present symbols get
    ``norm >= 1``; absent symbols below ``nsym`` get ``-1`` ("less than 1",
    one slot each) — never 0, so the serialized description needs no
    zero-repeat flags.  Largest-remainder distribution with an exact-sum
    correction, like the rANS quantizer.
    """
    max_sym = freq.shape[0]
    sym_ids = jnp.arange(max_sym, dtype=jnp.int32)
    present = freq > 0
    nsym = jnp.max(jnp.where(present, sym_ids, -1)) + 1
    below = sym_ids < nsym
    absent = jnp.logical_and(below, jnp.logical_not(present))
    n_absent = jnp.sum(absent.astype(jnp.int32))
    target = jnp.maximum(size - n_absent, 0)
    total = jnp.maximum(jnp.sum(freq), 1)

    scaled = freq.astype(jnp.int64) * target.astype(jnp.int64)
    base = (scaled // total).astype(jnp.int32)
    rem = (scaled - base.astype(jnp.int64) * total).astype(jnp.int32)
    base = jnp.where(jnp.logical_and(present, base == 0), 1, base)
    budget = target - jnp.sum(jnp.where(present, base, 0))
    order = jnp.argsort(jnp.where(present, -rem.astype(jnp.int64), 1 << 40))
    bonus_sorted = (jnp.arange(max_sym) < budget).astype(jnp.int32)
    bonus = jnp.zeros((max_sym,), jnp.int32).at[order].set(bonus_sorted)
    norm = base + jnp.where(present, bonus, 0)
    # exact-sum correction on the largest entries
    for _ in range(4):
        resid = (target - jnp.sum(jnp.where(present, norm, 0),
                                  dtype=jnp.int32)).astype(jnp.int32)
        top = jnp.argmax(jnp.where(present, norm, 0))
        delta = jnp.clip(resid, 1 - norm[top], None).astype(jnp.int32)
        norm = jnp.where(present, norm.at[top].add(delta), 0)
    norm = jnp.where(absent, -1, jnp.where(present, norm, 0))
    ok = jnp.sum(jnp.where(below, jnp.abs(norm), 0)) == size
    ok = jnp.logical_and(ok, nsym >= 2)   # degenerate alphabets use RLE/predef
    ok = jnp.logical_and(ok, jnp.all(jnp.where(present, norm, 1) >= 1))
    return norm, nsym, ok


def _fse_enc_traced(norm: jax.Array, nsym: jax.Array, acc_log: int):
    """Traced encode tables from normalized counts (closed form, no loops).

    Returns ``(st, nb, bs, first, ok)`` with ``st/nb/bs`` shaped
    ``[max_sym, size]`` indexed by (symbol, next decode-slot state) — the same
    convention as :func:`_fse_enc_np` — plus per-symbol initial slots.
    """
    max_sym = norm.shape[0]
    size = 1 << acc_log
    packed, ok = _fse_build_traced(jnp.pad(norm, (0, 64 - max_sym)),
                                   nsym, jnp.int32(acc_log))
    sym_slot = packed[:size] & 0xFF

    # slot_of[s, r]: index of the rank-r slot of symbol s (ascending slot order)
    ks = jnp.arange(size, dtype=jnp.int32)
    key = sym_slot.astype(jnp.int64) * size + ks
    order = jnp.argsort(key).astype(jnp.int32)
    sym_sorted = sym_slot[order]
    same = jnp.concatenate([jnp.zeros((1,), jnp.bool_),
                            sym_sorted[1:] == sym_sorted[:-1]])
    rank_sorted = plz.prefix_run_length(same)
    slot_of = jnp.zeros((max_sym * size,), jnp.int32).at[
        jnp.clip(sym_sorted * size + rank_sorted, 0, max_sym * size - 1)].set(order)

    counts = jnp.where(norm == -1, 1, jnp.maximum(norm, 0))
    c = jnp.maximum(counts, 1)[:, None]            # [max_sym, 1]
    xp = jnp.arange(size, dtype=jnp.int32)[None, :]
    bl = jnp.zeros_like(c)
    for k in range(acc_log + 1):
        bl = bl + ((c >> k) > 0).astype(jnp.int32)
    nbA = jnp.clip(acc_log - (bl - 1), 0, 31)
    xA = (xp + size) >> nbA
    okA = jnp.logical_and(xA >= c, xA < 2 * c)
    nb = jnp.clip(jnp.where(okA, nbA, nbA - 1), 0, 31)
    xv = (xp + size) >> nb
    r = jnp.clip(xv - c, 0, size - 1)
    srow = jnp.arange(max_sym, dtype=jnp.int32)[:, None]
    st = slot_of[jnp.clip(srow * size + r, 0, max_sym * size - 1)]
    bs = (xv << nb) - size
    first = slot_of[jnp.clip(srow[:, 0] * size, 0, max_sym * size - 1)]
    return st, nb, bs, first, ok


def _serialize_ncount(norm: jax.Array, nsym: jax.Array, acc_log: int):
    """Serialize an FSE table description (RFC 8878 4.1.1), the exact inverse
    of the decoder's ``read_ncount``.

    ``norm`` never contains 0 below ``nsym`` (see :func:`_normalize_counts`),
    so no zero-repeat flags are emitted.  Returns
    ``(field_vals int32[1+max_sym], field_bits int32[1+max_sym], total_bits)``
    — pack with the shared scatter-OR serializer and byte-align after.
    """
    max_sym = norm.shape[0]
    size = 1 << acc_log
    vals = [jnp.int32(acc_log - 5)]
    bits = [jnp.int32(4)]
    rem = jnp.int32(size + 1)
    for s in range(max_sym):
        active = s < nsym
        cnt = jnp.where(norm[s] < 0, 0, norm[s] + 1)   # encoded value
        emit = jnp.logical_and(active, rem > 1)
        # bitlength(rem)
        nbb = jnp.int32(0)
        for k in range(MAX_ACC_LOG + 2):
            nbb = jnp.where((rem >> k) > 0, k + 1, nbb)
        thr = jnp.int32(1) << jnp.clip(nbb - 1, 0, 15)
        mx = (2 * thr - 1) - rem
        small = cnt < mx
        v = jnp.where(small, cnt, jnp.where(cnt < thr, cnt, cnt + mx))
        w = jnp.where(small, nbb - 1, nbb)
        vals.append(jnp.where(emit, v, 0))
        bits.append(jnp.where(emit, w, 0))
        rem = jnp.where(emit, rem - jnp.where(cnt == 0, 1, cnt - 1), rem)
    total_bits = sum(bits[1:], bits[0])
    return jnp.stack(vals), jnp.stack(bits), total_bits


# =====================================================================================
# decoder
# =====================================================================================

TOK_SEQ = 1      # (lit_src, ll, ml, offset) -- ml may be 0 for the tail literals
_DEBUG = False


def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one zstd frame -> (out uint8[out_cap], out_size, status)."""
    cap = comp.shape[0]
    comp_size = comp_size.astype(jnp.int32)
    cap_tok = out_cap // 3 + 24
    max_blocks = out_cap // 64 + 16
    lit_cap = out_cap

    ll_bits_t = jnp.asarray(LL_BITS)
    ll_base_t = jnp.asarray(LL_BASE)
    ml_bits_t = jnp.asarray(ML_BITS)
    ml_base_t = jnp.asarray(ML_BASE)
    ll_def = jnp.asarray(LL_DEFAULT_TABLE)
    ml_def = jnp.asarray(ML_DEFAULT_TABLE)
    of_def = jnp.asarray(OF_DEFAULT_TABLE)

    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)

    def bits_fwd(bitpos, n):
        """Read n (<=24, traced) bits LSB-first at absolute forward bit pos."""
        byte = bitpos >> 3
        sh = (bitpos & 7).astype(jnp.uint32)
        word = (gb(byte).astype(jnp.uint32)
                | (gb(byte + 1).astype(jnp.uint32) << 8)
                | (gb(byte + 2).astype(jnp.uint32) << 16)
                | (gb(byte + 3).astype(jnp.uint32) << 24))
        mask = jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF),
                         (jnp.uint32(1) << jnp.uint32(jnp.clip(n, 0, 31))) - 1)
        return ((word >> sh) & mask).astype(jnp.int32)

    def bits_bwd(bits_left, base_bit, n):
        """Read the top n bits of a backward stream whose bit 0 is at absolute
        bit ``base_bit`` and which currently holds ``bits_left`` valid bits.
        Returns (value, new_bits_left)."""
        start = base_bit + bits_left - n
        v = bits_fwd(jnp.maximum(start, base_bit), n)
        v = jnp.where(n > 0, v, 0)
        return v, bits_left - n

    # ---------------- frame header ---------------------------------------------------
    err0 = comp_size < 5
    magic = (gb(0).astype(jnp.int64) | (gb(1).astype(jnp.int64) << 8)
             | (gb(2).astype(jnp.int64) << 16) | (gb(3).astype(jnp.int64) << 24))
    err0 = jnp.logical_or(err0, magic != MAGIC)
    fhd = gb(4)
    fcs_flag = fhd >> 6
    single_seg = (fhd >> 5) & 1
    checksum_flag = (fhd >> 2) & 1
    did_flag = fhd & 3
    err0 = jnp.logical_or(err0, ((fhd >> 3) & 1) == 1)  # reserved bit
    pos = jnp.int32(5)
    pos = pos + jnp.where(single_seg == 1, 0, 1)        # window descriptor
    did_bytes = jnp.where(did_flag == 0, 0,
                jnp.where(did_flag == 1, 1, jnp.where(did_flag == 2, 2, 4)))
    err0 = jnp.logical_or(err0, did_flag != 0)          # dictionaries unsupported
    pos = pos + did_bytes
    fcs_bytes = jnp.where(fcs_flag == 0, jnp.where(single_seg == 1, 1, 0),
                jnp.where(fcs_flag == 1, 2, jnp.where(fcs_flag == 2, 4, 8)))
    pos = pos + fcs_bytes

    st0 = dict(
        pos=pos, done=err0, err=err0,
        n_tok=jnp.int32(0) + 0 * pos, out_size=jnp.int32(0) + 0 * pos,
        lit_len_total=jnp.int32(0) + 0 * pos,
        n_blocks=jnp.int32(0) + 0 * pos,
        toks=jnp.zeros((cap_tok, 4), jnp.int32) + 0 * pos,
        litbuf=jnp.zeros((lit_cap,), jnp.uint8) + jnp.uint8(0) * pos.astype(jnp.uint8),
        huf=jnp.zeros((HUF_CAP,), jnp.int32) + 0 * pos,   # sym | nbits<<8
        huf_bits=jnp.int32(0) + 0 * pos,                  # table max bits
        ll_tab=ll_def + 0 * pos, ll_acc=jnp.int32(LL_DEFAULT_ACC) + 0 * pos,
        ml_tab=ml_def + 0 * pos, ml_acc=jnp.int32(ML_DEFAULT_ACC) + 0 * pos,
        of_tab=of_def + 0 * pos, of_acc=jnp.int32(OF_DEFAULT_ACC) + 0 * pos,
        rep=jnp.array([1, 4, 8], jnp.int32) + 0 * pos,
    )

    # ---------------- huffman table from weights -------------------------------------
    def build_huf(weights, nsym, err):
        """weights int32[256] (0 = unused), nsym explicit count; last weight is
        implied.  Returns (table int32[HUF_CAP] sym|nbits<<8, max_bits, err)."""
        ks = jnp.arange(256, dtype=jnp.int32)
        wsum = jnp.sum(jnp.where(jnp.logical_and(ks < nsym, weights > 0),
                                 jnp.int32(1) << jnp.clip(weights - 1, 0, 11), 0))
        # implied last weight completes to a power of two STRICTLY greater
        # than the explicit sum (zstd HUF_readStats: tableLog =
        # highbit(weightTotal)+1) — an exact power-of-two sum bumps the log,
        # it is NOT rest==0 (RFC 8878 §4.2.1.1).
        tl = jnp.zeros((), jnp.int32)
        for k in range(1, 13):
            tl = jnp.where((wsum >= (1 << (k - 1))) & (wsum < (1 << k)), k, tl)
        rest = (jnp.int32(1) << tl) - wsum
        # rest must be a power of two
        rest_bl = jnp.zeros((), jnp.int32)
        for k in range(12):
            rest_bl = rest_bl + ((rest >> k) > 0).astype(jnp.int32)
        last_w = rest_bl  # log2(rest)+1
        err = jnp.logical_or(err, wsum == 0)
        err = jnp.logical_or(err, rest <= 0)
        err = jnp.logical_or(err, (rest & (rest - 1)) != 0)
        weights = weights.at[jnp.clip(nsym, 0, 255)].set(last_w)
        nsym = nsym + 1
        max_bits = tl
        err = jnp.logical_or(err, max_bits > HUF_MAX_BITS)

        nb = jnp.where(jnp.logical_and(ks < nsym, weights > 0),
                       max_bits + 1 - weights, 0)
        span = jnp.where(nb > 0, jnp.int32(1) << jnp.clip(max_bits - nb, 0, 11), 0)
        # table order: symbols sorted by weight ascending (long codes first),
        # natural order within a weight
        key = jnp.where(nb > 0, (-nb).astype(jnp.int64) * 512 + ks, jnp.int64(1 << 40))
        order = jnp.argsort(key).astype(jnp.int32)   # descending nb
        span_o = span[order]
        start_o = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(span_o)[:-1].astype(jnp.int32)])
        # fill: every table slot finds its symbol via searchsorted
        slot = jnp.arange(HUF_CAP, dtype=jnp.int32)
        seg = jnp.clip(jnp.searchsorted(start_o, slot, side="right").astype(jnp.int32) - 1,
                       0, 255)
        sym = order[seg]
        snb = nb[sym]
        table = jnp.where(slot < (jnp.int32(1) << jnp.clip(max_bits, 0, 11)),
                          sym | (snb << 8), 0)
        total_span = jnp.sum(span)
        err = jnp.logical_or(err, total_span != (jnp.int32(1) << jnp.clip(max_bits, 0, 11)))
        return table, max_bits, err

    # ---------------- FSE normalized count parsing -----------------------------------
    def read_ncount(bit0, max_sym, err):
        """Parse an FSE table description starting at absolute bit ``bit0``.

        Returns (norm int32[64], nsym, acc_log, next_bitpos, err)."""
        acc_log = bits_fwd(bit0, 4) + 5
        err = jnp.logical_or(err, acc_log > MAX_ACC_LOG)
        acc_log = jnp.clip(acc_log, 5, MAX_ACC_LOG)

        def cond(c):
            bp, rem, ch, prev0, norm, e = c
            return jnp.logical_and(jnp.logical_and(rem > 1, ch < max_sym),
                                   jnp.logical_not(e))

        def body(c):
            bp, rem, ch, prev0, norm, e = c

            # zero-repeat flags after a 0 probability
            def rep_cond(cc):
                bp2, ch2, go = cc
                return go

            def rep_body(cc):
                bp2, ch2, go = cc
                r = bits_fwd(bp2, 2)
                return bp2 + 2, ch2 + r, r == 3

            bp_r, ch_r, _ = jax.lax.while_loop(
                rep_cond, rep_body, (bp, ch, prev0))
            bp = jnp.where(prev0, bp_r, bp)
            ch = jnp.where(prev0, ch_r, ch)

            # read the next probability with the small-value optimization
            thr = jnp.int32(0)
            nbb = jnp.int32(0)
            for k in range(MAX_ACC_LOG + 2):
                hit = (rem >> k) > 0
                nbb = jnp.where(hit, k + 1, nbb)       # bitlength(rem)
            thr = jnp.int32(1) << jnp.clip(nbb - 1, 0, 15)
            mx = (2 * thr - 1) - rem
            v = bits_fwd(bp, nbb)
            low = v & (thr - 1)
            small = low < mx
            cnt = jnp.where(small, low, jnp.where(v >= thr, v - mx, v))
            bp = bp + jnp.where(small, nbb - 1, nbb)
            cnt = cnt - 1                                # -1 means "less than 1"
            rem = rem - jnp.where(cnt < 0, 1, cnt)
            norm = norm.at[jnp.clip(ch, 0, 63)].set(cnt)
            e = jnp.logical_or(e, ch >= 64)
            return bp, rem, ch + 1, cnt == 0, norm, e

        norm0 = jnp.zeros((64,), jnp.int32) + 0 * bit0
        size = jnp.int32(1) << acc_log
        bp, rem, ch, _, norm, err = jax.lax.while_loop(
            cond, body, (bit0 + 4, size + 1, jnp.int32(0) + 0 * bit0,
                         bit0 < 0, norm0, err))
        err = jnp.logical_or(err, rem != 1)
        next_bit = (bp + 7) & ~7                         # byte-align after table
        return norm, ch, acc_log, next_bit, err

    # ---------------- sequence-section table setup -----------------------------------
    def seq_table(mode, bytepos, prev_tab, prev_acc, default_tab, default_acc,
                  max_sym, err):
        """Handle one of LL/OF/ML per the 2-bit mode; returns (tab, acc, bytepos, err)."""
        # mode 0: predefined, 1: RLE (1 byte), 2: FSE description, 3: repeat
        rle_sym = gb(bytepos)
        rle_tab = jnp.zeros((FSE_CAP,), jnp.int32).at[0].set(rle_sym)
        norm, nsym, acc_log, nbit, err_f = read_ncount(bytepos * 8, max_sym, err)
        fse_tab, fse_ok = _fse_build_traced(norm, nsym, acc_log)
        tab = jnp.where(mode == 0, default_tab,
              jnp.where(mode == 1, rle_tab,
              jnp.where(mode == 2, fse_tab, prev_tab)))
        acc = jnp.where(mode == 0, default_acc,
              jnp.where(mode == 1, 0,
              jnp.where(mode == 2, acc_log, prev_acc)))
        newpos = jnp.where(mode == 1, bytepos + 1,
                 jnp.where(mode == 2, nbit // 8, bytepos))
        err = jnp.where(mode == 2, jnp.logical_or(err_f, jnp.logical_not(fse_ok)), err)
        err = jnp.logical_or(err, jnp.logical_and(mode == 1, rle_sym >= max_sym))
        return tab, acc, newpos, err

    # ---------------- backward-stream helpers ----------------------------------------
    def stream_bits(start_byte, nbytes, err):
        """Backward stream occupying [start_byte, start_byte+nbytes): find the
        padding bit -> total valid bits."""
        lastb = gb(start_byte + nbytes - 1)
        hb = jnp.int32(-1)
        for k in range(8):
            hb = jnp.where((lastb >> k) & 1 == 1, k, hb)
        err = jnp.logical_or(err, jnp.logical_or(nbytes <= 0, hb < 0))
        total = (nbytes - 1) * 8 + hb
        return total, err

    # ---------------- per-block body --------------------------------------------------
    def block_cond(st):
        return jnp.logical_not(jnp.logical_or(st["done"], st["err"]))

    def block_body(st):
        pos = st["pos"]
        err = pos + 3 > comp_size
        bh = gb(pos) | (gb(pos + 1) << 8) | (gb(pos + 2) << 16)
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        pos = pos + 3
        err = jnp.logical_or(err, btype == 3)
        block_end = pos + jnp.where(btype == 1, 1, bsize)
        err = jnp.logical_or(err, block_end > comp_size)

        # ===== raw block: one literal-run token straight from comp ===================
        def raw_block():
            tok = jnp.stack([pos, bsize, jnp.int32(0), jnp.int32(0)])
            return tok, bsize

        # ===== RLE block: bsize copies of one byte ===================================
        # encode as 1 literal + (bsize-1)-byte match at offset 1
        def rle_block():
            tok = jnp.stack([pos, jnp.int32(1), bsize - 1, jnp.int32(1)])
            return tok, bsize

        is_raw = btype == 0
        is_rle = btype == 1
        is_comp = btype == 2

        raw_tok, raw_out = raw_block()
        rle_tok, rle_out = rle_block()

        # ===== compressed block ======================================================
        # ---- literals section ----
        lsh = gb(pos)
        lit_type = lsh & 3
        size_fmt = (lsh >> 2) & 3
        # raw/RLE literal sizes
        rr_1b = lsh >> 3                                 # 5 bits
        rr_2b = (lsh >> 4) | (gb(pos + 1) << 4)          # 12 bits
        rr_3b = (lsh >> 4) | (gb(pos + 1) << 4) | (gb(pos + 2) << 12)  # 20 bits
        rr_regen = jnp.where(size_fmt == 1, rr_2b,
                   jnp.where(size_fmt == 3, rr_3b, rr_1b))
        rr_hdr = jnp.where(size_fmt == 1, 2, jnp.where(size_fmt == 3, 3, 1))
        # compressed literal sizes
        c_hdr = jnp.where(size_fmt <= 1, 3, jnp.where(size_fmt == 2, 4, 5))
        c_bits = jnp.where(size_fmt <= 1, 10, jnp.where(size_fmt == 2, 14, 18))
        c_word = (gb(pos).astype(jnp.int64) | (gb(pos + 1).astype(jnp.int64) << 8)
                  | (gb(pos + 2).astype(jnp.int64) << 16)
                  | (gb(pos + 3).astype(jnp.int64) << 24)
                  | (gb(pos + 4).astype(jnp.int64) << 32))
        c_regen = ((c_word >> 4) & ((jnp.int64(1) << c_bits.astype(jnp.int64)) - 1)).astype(jnp.int32)
        c_csize = ((c_word >> (4 + c_bits).astype(jnp.int64))
                   & ((jnp.int64(1) << c_bits.astype(jnp.int64)) - 1)).astype(jnp.int32)
        four_streams = jnp.logical_or(size_fmt >= 1, lit_type == 3_000)  # fmt 0 => 1 stream
        four_streams = size_fmt >= 1

        is_lit_rawrle = lit_type <= 1
        lit_regen = jnp.where(is_lit_rawrle, rr_regen, c_regen)
        lit_hdr = jnp.where(is_lit_rawrle, rr_hdr, c_hdr)
        # cerr: compressed-path-only error chain (this whole section is computed
        # speculatively even for raw/RLE blocks and must not pollute their err)
        cerr = jnp.logical_or(err, lit_regen > lit_cap)
        lit_regen = jnp.clip(lit_regen, 0, lit_cap)

        lit_start_byte = pos + lit_hdr
        # section end position
        lit_end = jnp.where(is_lit_rawrle,
                            lit_start_byte + jnp.where(lit_type == 1, 1, lit_regen),
                            lit_start_byte + c_csize)
        cerr = jnp.logical_or(cerr, lit_end > block_end)

        litbuf = st["litbuf"]
        lit_base = st["lit_len_total"]   # literals accumulate across blocks
        li = jnp.arange(lit_cap, dtype=jnp.int32)
        in_new = jnp.logical_and(li >= lit_base, li < lit_base + lit_regen)

        # raw literals: vector copy from comp into [lit_base, lit_base+regen)
        raw_lits = comp[jnp.clip(lit_start_byte + (li - lit_base), 0, cap - 1)]
        rle_lits = jnp.broadcast_to(comp[jnp.clip(lit_start_byte, 0, cap - 1)],
                                    (lit_cap,))

        # ---- huffman literals ----
        huf = st["huf"]
        huf_bits = st["huf_bits"]
        tree_pos = lit_start_byte
        # tree description (lit_type == 2 only)
        thdr = gb(tree_pos)
        direct = thdr >= 128
        # direct representation: headerByte - 127 EXPLICIT weights packed two
        # per byte (the final symbol's weight is implied and NOT counted here)
        n_dweights = thdr - 127
        dk = jnp.arange(256, dtype=jnp.int32)
        dw_byte = gb(tree_pos + 1 + (dk >> 1))
        dweights = jnp.where((dk & 1) == 0, dw_byte >> 4, dw_byte & 0xF)
        dweights = jnp.where(dk < n_dweights, dweights, 0)
        n_explicit = n_dweights
        direct_bytes = 1 + ((n_dweights + 1) >> 1)

        # FSE-compressed weights: headerByte = compressed size; two states
        wtab_norm, wtab_nsym, wtab_acc, wbit, werr = read_ncount(
            (tree_pos + 1) * 8, jnp.int32(32), cerr)
        wtab, wtab_ok = _fse_build_traced(wtab_norm, wtab_nsym, wtab_acc)
        wstream_start = wbit // 8
        wstream_bytes = thdr - (wstream_start - (tree_pos + 1))
        wbits_total, werr = stream_bits(wstream_start, wstream_bytes, werr)

        def fse_weights():
            # zstd tail-loop semantics: emit from a state, then update it; if
            # the update consumed past the end (left < 0), emit the OTHER
            # state's current symbol and stop.  Exactly-zero left continues.
            def wcond(c):
                bl, s0, s1, wi, ws, stop, e = c
                return jnp.logical_and(jnp.logical_not(stop), jnp.logical_and(
                    wi < 254, jnp.logical_not(e)))

            def wbody(c):
                bl, s0, s1, wi, ws, stop, e = c
                sym0, nb0, base0 = _fse_unpack(wtab[jnp.clip(s0, 0, FSE_CAP - 1)])
                ws = ws.at[jnp.clip(wi, 0, 255)].set(sym0)
                v, bl = bits_bwd(bl, wstream_start * 8, nb0)
                over0 = bl < 0
                sym1a, _, _ = _fse_unpack(wtab[jnp.clip(s1, 0, FSE_CAP - 1)])
                ws = jnp.where(over0, ws.at[jnp.clip(wi + 1, 0, 255)].set(sym1a), ws)
                s0 = jnp.where(over0, s0, base0 + v)

                sym1, nb1, base1 = _fse_unpack(wtab[jnp.clip(s1, 0, FSE_CAP - 1)])
                ws = jnp.where(over0, ws,
                               ws.at[jnp.clip(wi + 1, 0, 255)].set(sym1))
                v1, bl1 = bits_bwd(bl, wstream_start * 8, nb1)
                over1 = jnp.logical_and(jnp.logical_not(over0), bl1 < 0)
                sym0b, _, _ = _fse_unpack(wtab[jnp.clip(s0, 0, FSE_CAP - 1)])
                ws = jnp.where(over1, ws.at[jnp.clip(wi + 2, 0, 255)].set(sym0b), ws)
                s1 = jnp.where(jnp.logical_or(over0, over1), s1, base1 + v1)
                bl = jnp.where(over0, bl, bl1)
                wi = wi + jnp.where(over0, 2, jnp.where(over1, 3, 2))
                stop = jnp.logical_or(over0, over1)
                return bl, s0, s1, wi, ws, stop, e

            ws0 = jnp.zeros((256,), jnp.int32) + 0 * pos
            bl0 = wbits_total
            s0, bl = bits_bwd(bl0, wstream_start * 8, wtab_acc)
            s1, bl = bits_bwd(bl, wstream_start * 8, wtab_acc)
            e0 = jnp.logical_or(werr, bl < 0)
            stop0 = jnp.logical_and(e0, True)
            bl, _, _, wn, ws, _, e = jax.lax.while_loop(
                wcond, wbody, (bl, s0, s1, jnp.int32(0) + 0 * pos, ws0,
                               stop0, e0))
            return ws, wn, e

        fse_ws, fse_wn, fse_werr = fse_weights()
        weights = jnp.where(direct, dweights, fse_ws)
        n_weights = jnp.where(direct, n_explicit, fse_wn)
        tree_bytes = jnp.where(direct, direct_bytes, 1 + thdr)
        werr2 = jnp.where(direct, cerr, jnp.logical_or(
            fse_werr, jnp.logical_not(wtab_ok)))

        new_huf, new_huf_bits, herr = build_huf(weights, n_weights, werr2)
        use_new_tree = lit_type == 2
        huf = jnp.where(use_new_tree, new_huf, huf)
        huf_bits = jnp.where(use_new_tree, new_huf_bits, huf_bits)
        herr = jnp.where(use_new_tree, herr, cerr)
        herr = jnp.logical_or(herr, jnp.logical_and(
            lit_type == 3, huf_bits == 0))  # treeless without a previous tree

        # streams region
        streams_pos = jnp.where(use_new_tree, tree_pos + tree_bytes, tree_pos)
        # 4-stream jump table
        j1 = gb(streams_pos) | (gb(streams_pos + 1) << 8)
        j2 = gb(streams_pos + 2) | (gb(streams_pos + 3) << 8)
        j3 = gb(streams_pos + 4) | (gb(streams_pos + 5) << 8)
        s_base = jnp.where(four_streams, streams_pos + 6, streams_pos)
        total_stream_bytes = lit_end - s_base
        s4 = total_stream_bytes - j1 - j2 - j3
        herr = jnp.logical_or(herr, jnp.logical_and(
            jnp.logical_and(is_comp, lit_type >= 2),
            jnp.logical_and(four_streams, s4 <= 0)))

        regen_per = (lit_regen + 3) >> 2
        regen4 = lit_regen - 3 * regen_per
        starts = jnp.where(four_streams,
                           jnp.stack([s_base, s_base + j1, s_base + j1 + j2,
                                      s_base + j1 + j2 + j3]),
                           jnp.stack([s_base, s_base, s_base, s_base]))
        lens = jnp.where(four_streams,
                         jnp.stack([j1, j2, j3, s4]),
                         jnp.stack([total_stream_bytes, jnp.int32(0),
                                    jnp.int32(0), jnp.int32(0)]))
        counts = jnp.where(four_streams,
                           jnp.stack([regen_per, regen_per, regen_per, regen4]),
                           jnp.stack([lit_regen, jnp.int32(0), jnp.int32(0),
                                      jnp.int32(0)]))
        lit_off = jnp.where(four_streams,
                            jnp.stack([0, regen_per, 2 * regen_per, 3 * regen_per]),
                            jnp.stack([0, 0, 0, 0]))

        sbits = jnp.zeros((4,), jnp.int32)
        for kk in range(4):
            tb, e_k = stream_bits(starts[kk], lens[kk], herr)
            herr = jnp.where(counts[kk] > 0, e_k, herr)
            sbits = sbits.at[kk].set(jnp.where(counts[kk] > 0, tb, 0))

        def huf_decode(litbuf):
            def hcond(c):
                bl, idx, lb, e = c
                return jnp.logical_and(jnp.any(idx < counts),
                                       jnp.logical_not(e))

            def hbody(c):
                bl, idx, lb, e = c
                active = idx < counts
                # peek huf_bits from the top of each stream
                start_bits = starts * 8
                p = start_bits + bl - huf_bits
                pc = jnp.clip(p, start_bits, start_bits + jnp.maximum(sbits - 1, 0))
                vals = jnp.zeros((4,), jnp.int32)
                for kk in range(4):
                    vals = vals.at[kk].set(bits_fwd(pc[kk], huf_bits))
                # streams near exhaustion: the bl available bits form the TOP of
                # the peek value, low bits implicitly zero
                short = jnp.clip(huf_bits - bl, 0, 31)
                avail_mask = (jnp.int32(1) << jnp.clip(huf_bits - short, 0, 31)) - 1
                vals = jnp.where(short > 0, (vals & avail_mask) << short, vals)
                ent = huf[jnp.clip(vals, 0, HUF_CAP - 1)]
                sym = ent & 0xFF
                nb = (ent >> 8) & 0xFF
                e = jnp.logical_or(e, jnp.any(jnp.logical_and(active, nb == 0)))
                wr = jnp.where(active, lit_base + lit_off + idx, lit_cap)
                lb = lb.at[jnp.clip(wr, 0, lit_cap)].set(sym.astype(jnp.uint8),
                                                         mode="drop")
                bl = jnp.where(active, bl - nb, bl)
                e = jnp.logical_or(e, jnp.any(jnp.logical_and(active, bl < 0)))
                idx = idx + active.astype(jnp.int32)
                return bl, idx, lb, e

            bl0 = sbits
            idx0 = jnp.zeros((4,), jnp.int32) + 0 * pos
            bl, idx, lb, e = jax.lax.while_loop(
                hcond, hbody, (bl0, idx0, litbuf, herr))
            e = jnp.logical_or(e, jnp.any(jnp.logical_and(counts > 0, bl != 0)))
            return lb, e

        huf_lits, huf_err = huf_decode(litbuf)

        # select the literal source for this block (huf_lits already wrote at
        # lit_base; raw/RLE splice into the same region)
        spliced = jnp.where(in_new,
                            jnp.where(lit_type == 0, raw_lits, rle_lits),
                            litbuf)
        litbuf = jnp.where(is_comp,
                           jnp.where(lit_type <= 1, spliced, huf_lits),
                           litbuf)
        lit_err = jnp.where(lit_type >= 2, huf_err, cerr)
        lit_err = jnp.logical_or(lit_err, jnp.logical_and(
            is_comp, lit_base + lit_regen > lit_cap))

        # ---- sequences section ----
        sq = lit_end
        b0 = gb(sq)
        nseq = jnp.where(b0 < 128, b0,
               jnp.where(b0 < 255, ((b0 - 128) << 8) + gb(sq + 1),
                         gb(sq + 1) + (gb(sq + 2) << 8) + 0x7F00))
        nseq_hdr = jnp.where(b0 < 128, 1, jnp.where(b0 < 255, 2, 3))
        sq = sq + nseq_hdr

        scm = gb(sq)
        ll_mode = (scm >> 6) & 3
        of_mode = (scm >> 4) & 3
        ml_mode = (scm >> 2) & 3
        sq_tables = sq + 1

        serr = lit_err
        ll_tab, ll_acc, p1, serr = seq_table(
            ll_mode, sq_tables, st["ll_tab"], st["ll_acc"], ll_def,
            jnp.int32(LL_DEFAULT_ACC), jnp.int32(36), serr)
        of_tab, of_acc, p2, serr = seq_table(
            of_mode, p1, st["of_tab"], st["of_acc"], of_def,
            jnp.int32(OF_DEFAULT_ACC), jnp.int32(32), serr)
        ml_tab, ml_acc, p3, serr = seq_table(
            ml_mode, p2, st["ml_tab"], st["ml_acc"], ml_def,
            jnp.int32(ML_DEFAULT_ACC), jnp.int32(53), serr)

        seq_stream_start = p3
        seq_stream_bytes = block_end - seq_stream_start
        seq_bits_total, serr = stream_bits(seq_stream_start, seq_stream_bytes,
                                           jnp.where(nseq > 0, serr, False))
        # nseq == 0: the sequences section ends right after the count byte —
        # no modes byte, no tables, no bitstream (RFC 8878 §3.1.1.3.2.1).
        # Everything above (scm/seq_table/stream_bits) was parsed from bytes
        # that do not exist; drop those speculative errors, keep the previous
        # FSE tables for later repeat-mode blocks, and require the block to
        # end exactly at the count byte (zstd rejects trailing bytes).
        seq_live = jnp.logical_and(is_comp, nseq > 0)
        serr = jnp.where(nseq > 0, serr,
                         jnp.logical_or(lit_err, block_end != sq))
        ll_tab = jnp.where(seq_live, ll_tab, st["ll_tab"])
        ll_acc = jnp.where(seq_live, ll_acc, st["ll_acc"])
        of_tab = jnp.where(seq_live, of_tab, st["of_tab"])
        of_acc = jnp.where(seq_live, of_acc, st["of_acc"])
        ml_tab = jnp.where(seq_live, ml_tab, st["ml_tab"])
        ml_acc = jnp.where(seq_live, ml_acc, st["ml_acc"])

        def decode_sequences(carry_in):
            toks, n_tok, out_size, rep, lit_used, e = carry_in
            base_bit = seq_stream_start * 8
            bl = seq_bits_total
            ll_s, bl = bits_bwd(bl, base_bit, ll_acc)
            of_s, bl = bits_bwd(bl, base_bit, of_acc)
            ml_s, bl = bits_bwd(bl, base_bit, ml_acc)

            def scond(c):
                i, bl, ll_s, of_s, ml_s, rep, lit_used, out_size, n_tok, toks, e = c
                return jnp.logical_and(i < nseq, jnp.logical_not(e))

            def sbody(c):
                i, bl, ll_s, of_s, ml_s, rep, lit_used, out_size, n_tok, toks, e = c
                ll_sym, ll_nb, ll_bs = _fse_unpack(ll_tab[jnp.clip(ll_s, 0, FSE_CAP - 1)])
                of_sym, of_nb, of_bs = _fse_unpack(of_tab[jnp.clip(of_s, 0, FSE_CAP - 1)])
                ml_sym, ml_nb, ml_bs = _fse_unpack(ml_tab[jnp.clip(ml_s, 0, FSE_CAP - 1)])
                e = jnp.logical_or(e, ll_sym >= 36)
                e = jnp.logical_or(e, ml_sym >= 53)
                e = jnp.logical_or(e, of_sym >= 32)

                ofv_hi, bl = bits_bwd(bl, base_bit, jnp.clip(of_sym, 0, 31))
                offset_value = (jnp.int32(1) << jnp.clip(of_sym, 0, 30)) + ofv_hi
                mlx, bl = bits_bwd(bl, base_bit, ml_bits_t[jnp.clip(ml_sym, 0, 52)])
                ml = ml_base_t[jnp.clip(ml_sym, 0, 52)] + mlx
                llx, bl = bits_bwd(bl, base_bit, ll_bits_t[jnp.clip(ll_sym, 0, 35)])
                ll = ll_base_t[jnp.clip(ll_sym, 0, 35)] + llx

                # repeat-offset logic
                idx0 = offset_value - 1  # 0..2 when repeat
                use_rep = offset_value <= 3
                ridx = jnp.where(ll == 0, idx0 + 1, idx0)  # ll==0 shifts by one
                rep3m1 = rep[0] - 1
                cand = jnp.where(ridx == 0, rep[0],
                       jnp.where(ridx == 1, rep[1],
                       jnp.where(ridx == 2, rep[2], rep3m1)))  # ridx==3: rep1-1
                offset = jnp.where(use_rep, cand, offset_value - 3)
                e = jnp.logical_or(e, offset <= 0)
                # history update
                new_rep = jnp.where(
                    use_rep,
                    jnp.where(ridx == 0, rep,
                              jnp.stack([offset, rep[0],
                                         jnp.where(ridx >= 2, rep[1], rep[2])])),
                    jnp.stack([offset, rep[0], rep[1]]))
                # NB: for ridx==1 history is [off, rep0, rep2]; ridx==2/3 ->
                # [off, rep0, rep1]
                new_rep = jnp.where(
                    jnp.logical_and(use_rep, ridx == 1),
                    jnp.stack([offset, rep[0], rep[2]]), new_rep)

                e = jnp.logical_or(e, offset > out_size + ll)
                e = jnp.logical_or(e, lit_used + ll > lit_regen)
                tok = jnp.stack([lit_base + lit_used, ll, ml, offset])
                toks = jnp.where(
                    n_tok < cap_tok,
                    toks.at[jnp.clip(n_tok, 0, cap_tok - 1)].set(tok), toks)
                e = jnp.logical_or(e, n_tok >= cap_tok)
                e = jnp.logical_or(e, out_size + ll + ml > out_cap)
                out_size = out_size + ll + ml
                lit_used = lit_used + ll
                n_tok = n_tok + 1

                # state updates (LL, ML, OF order), skipped after the last seq
                more = i + 1 < nseq
                llv, bl1 = bits_bwd(bl, base_bit, ll_nb)
                mlv, bl1 = bits_bwd(bl1, base_bit, ml_nb)
                ofv, bl1 = bits_bwd(bl1, base_bit, of_nb)
                ll_s = jnp.where(more, ll_bs + llv, ll_s)
                ml_s = jnp.where(more, ml_bs + mlv, ml_s)
                of_s = jnp.where(more, of_bs + ofv, of_s)
                bl = jnp.where(more, bl1, bl)
                e = jnp.logical_or(e, bl < 0)
                return i + 1, bl, ll_s, of_s, ml_s, new_rep, lit_used, out_size, n_tok, toks, e

            i0 = jnp.int32(0) + 0 * pos
            _, bl, _, _, _, rep, lit_used, out_size, n_tok, toks, e = jax.lax.while_loop(
                scond, sbody, (i0, bl, ll_s, of_s, ml_s, rep, lit_used,
                               out_size, n_tok, toks, e))
            e = jnp.logical_or(e, bl != 0)
            return toks, n_tok, out_size, rep, lit_used, e

        carry0 = (st["toks"], st["n_tok"], st["out_size"], st["rep"],
                  jnp.int32(0) + 0 * pos, serr)
        toks_s, n_tok_s, out_s, rep_s, lit_used_s, err_s = jax.lax.cond(
            jnp.logical_and(is_comp, nseq > 0),
            decode_sequences, lambda c: c, carry0)

        # trailing literals (after last sequence) as a literal-only token;
        # if nseq == 0 the entire regenerated literals are the block output
        tail_ll = lit_regen - lit_used_s
        err_s = jnp.logical_or(err_s, tail_ll < 0)
        tail_tok = jnp.stack([lit_base + lit_used_s, jnp.maximum(tail_ll, 0),
                              jnp.int32(0), jnp.int32(0)])
        add_tail = jnp.logical_and(is_comp, tail_ll > 0)
        toks_s = jnp.where(
            add_tail,
            toks_s.at[jnp.clip(n_tok_s, 0, cap_tok - 1)].set(tail_tok), toks_s)
        n_tok_s = n_tok_s + add_tail.astype(jnp.int32)
        out_s = out_s + jnp.where(is_comp, jnp.maximum(tail_ll, 0), 0)
        err_s = jnp.logical_or(err_s, jnp.logical_and(
            is_comp, out_s > out_cap))

        # compressed-block tokens store lit_src as an absolute offset into the
        # cumulative litbuf, tagged by +cap so emit can tell litbuf runs from
        # comp-stream runs (raw/RLE blocks)
        ti = jnp.arange(cap_tok, dtype=jnp.int32)
        new_range = jnp.logical_and(ti >= st["n_tok"], ti < n_tok_s)
        toks_s = jnp.where(jnp.logical_and(is_comp, new_range)[:, None],
                           toks_s.at[:, 0].add(cap), toks_s)

        # ===== select per block type =================================================
        err = jnp.where(is_comp, err_s, err)
        toks = jnp.where(is_comp, toks_s, st["toks"])
        n_tok = jnp.where(is_comp, n_tok_s, st["n_tok"])
        out_size = jnp.where(is_comp, out_s, st["out_size"])
        rep = jnp.where(is_comp, rep_s, st["rep"])

        # raw / RLE blocks append their single token
        simple_tok = jnp.where(is_raw, raw_tok, rle_tok)
        simple_out = jnp.where(is_raw, raw_out, rle_out)
        add_simple = jnp.logical_and(jnp.logical_or(is_raw, is_rle),
                                     simple_out > 0)
        err = jnp.logical_or(err, jnp.logical_and(
            add_simple, out_size + simple_out > out_cap))
        toks = jnp.where(add_simple,
                         toks.at[jnp.clip(n_tok, 0, cap_tok - 1)].set(simple_tok),
                         toks)
        n_tok = n_tok + add_simple.astype(jnp.int32)
        out_size = out_size + jnp.where(add_simple, simple_out, 0)

        st = dict(st)
        st["pos"] = block_end
        st["err"] = jnp.logical_or(st["err"], err)
        st["done"] = jnp.logical_or(st["done"], last == 1)
        st["toks"], st["n_tok"], st["out_size"] = toks, n_tok, out_size
        st["rep"] = rep
        st["litbuf"] = litbuf
        st["lit_len_total"] = lit_base + jnp.where(is_comp, lit_regen, 0)
        st["huf"], st["huf_bits"] = huf, huf_bits
        st["ll_tab"], st["ll_acc"] = ll_tab, ll_acc
        st["of_tab"], st["of_acc"] = of_tab, of_acc
        st["ml_tab"], st["ml_acc"] = ml_tab, ml_acc
        st["n_blocks"] = st["n_blocks"] + 1
        st["err"] = jnp.logical_or(st["err"], st["n_blocks"] > max_blocks)
        return st

    st = jax.lax.while_loop(block_cond, block_body, st0)
    err = st["err"]

    # --------------- parallel emit ---------------------------------------------------
    toks, n_tok, total_out = st["toks"], st["n_tok"], st["out_size"]
    litbuf = st["litbuf"]
    src, ll, ml, off = toks[:, 0], toks[:, 1], toks[:, 2], toks[:, 3]
    ti = jnp.arange(cap_tok, dtype=jnp.int32)
    tvalid = ti < n_tok
    size_t = jnp.where(tvalid, ll + ml, 0)
    ofs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(size_t)[:-1].astype(jnp.int32)])

    opos = jnp.arange(out_cap, dtype=jnp.int32)
    key = jnp.where(tvalid, ofs, jnp.int32(2**30))
    k = jnp.clip(jnp.searchsorted(key, opos, side="right").astype(jnp.int32) - 1,
                 0, cap_tok - 1)
    rel = opos - ofs[k]
    in_lit = rel < ll[k]
    from_litbuf = src[k] >= cap
    lit_idx = src[k] - jnp.where(from_litbuf, cap, 0) + rel
    lit_from_comp = comp[jnp.clip(lit_idx, 0, cap - 1)].astype(jnp.int32)
    lit_from_buf = litbuf[jnp.clip(lit_idx, 0, lit_cap - 1)].astype(jnp.int32)
    val = jnp.where(from_litbuf, lit_from_buf, lit_from_comp)
    known = jnp.logical_or(jnp.logical_and(in_lit, k >= 0), opos >= total_out)
    val = jnp.where(in_lit, val, 0)
    ptr = jnp.where(known, opos, jnp.clip(opos - off[k], 0, out_cap - 1))
    resolved = plz.resolve_copy_chain(ptr, val, known,
                                      max_rounds=_ceil_log2(out_cap) + 1)

    ok = jnp.logical_not(err)
    out_size = jnp.where(ok, total_out, 0).astype(jnp.int32)
    out = jnp.where(opos < out_size, resolved, 0).astype(jnp.uint8)
    status = jnp.where(ok, Status.SUCCESS, Status.ERROR_CANNOT_DECOMPRESS)
    if _DEBUG:
        dbg = jnp.stack([st["err"].astype(jnp.int32), err0.astype(jnp.int32),
                         st["n_blocks"], st["n_tok"], st["out_size"],
                         st["pos"], st["lit_len_total"], total_out])
        return out, out_size, status.astype(jnp.int32), dbg
    return out, out_size, status.astype(jnp.int32)


# =====================================================================================
# encoder: store-mode frames (raw blocks; RLE where a block is constant)
# =====================================================================================

def _encode_store(data: jax.Array, size: jax.Array, opts: ZstdOpts,
                  out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Store-mode frame (raw blocks) — fallback and >128 KiB chunk path."""
    cap = data.shape[0]
    size = size.astype(jnp.int32)
    BLK = 1 << 16  # 64 KiB raw blocks
    n_blocks_cap = max(1, -(-cap // BLK))

    # frame header: magic + FHD(single-segment, FCS 4 bytes) -> we always use
    # fcs_flag=2 (4-byte content size), no single-segment, window descriptor
    # chosen to cover the content.
    # window_log = ceil(log2(max(size,1024))): windowDesc exponent-10, mantissa 0
    wl = jnp.int32(10)
    for k in range(11, 25):
        wl = jnp.where(size > (1 << (k - 1)), k, wl)
    wdesc = ((wl - 10) << 3).astype(jnp.uint8)

    hdr = jnp.zeros((10,), jnp.uint8)
    for b, v in enumerate([MAGIC & 0xFF, (MAGIC >> 8) & 0xFF,
                           (MAGIC >> 16) & 0xFF, (MAGIC >> 24) & 0xFF]):
        hdr = hdr.at[b].set(v)
    hdr = hdr.at[4].set(0x80)  # fcs_flag=2 (4-byte FCS)
    hdr = hdr.at[5].set(wdesc)
    for b in range(4):
        hdr = hdr.at[6 + b].set(((size >> (8 * b)) & 0xFF).astype(jnp.uint8))
    HDR = 10

    # block layout
    bi = jnp.arange(n_blocks_cap, dtype=jnp.int32)
    blk_start = bi * BLK
    blk_size = jnp.clip(size - blk_start, 0, BLK)
    blk_active = blk_size > 0
    n_blocks = jnp.maximum(jnp.sum(blk_active.astype(jnp.int32)), 1)
    is_last = bi == n_blocks - 1
    # first block always "active" even for empty input (raw block of size 0)
    blk_active = jnp.logical_or(blk_active, bi == 0)

    out_off = HDR + bi * (BLK + 3) * 0  # computed below
    csize = jnp.where(blk_active, blk_size, 0)
    out_sizes = jnp.where(blk_active, 3 + csize, 0)
    out_off = HDR + jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                     jnp.cumsum(out_sizes)[:-1].astype(jnp.int32)])
    total = HDR + jnp.sum(out_sizes)

    pos = jnp.arange(out_cap, dtype=jnp.int32)
    out = jnp.where(pos < HDR, hdr[jnp.clip(pos, 0, HDR - 1)], 0).astype(jnp.uint8)

    # each output byte classifies itself against the block layout
    key = jnp.where(blk_active, out_off, jnp.int32(2**30))
    kblk = jnp.clip(jnp.searchsorted(key, pos, side="right").astype(jnp.int32) - 1,
                    0, n_blocks_cap - 1)
    r = pos - out_off[kblk]
    bh = ((jnp.where(is_last[kblk], 1, 0))
          | (0 << 1)                      # raw block
          | (blk_size[kblk] << 3))
    bh_byte = jnp.where(r == 0, bh & 0xFF,
              jnp.where(r == 1, (bh >> 8) & 0xFF, (bh >> 16) & 0xFF))
    data_byte = data[jnp.clip(blk_start[kblk] + (r - 3), 0, cap - 1)].astype(jnp.int32)
    body = jnp.where(r < 3, bh_byte, data_byte)
    out = jnp.where(jnp.logical_and(pos >= HDR, pos < total),
                    body.astype(jnp.uint8), out)

    too_big = total > out_cap
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL, Status.SUCCESS)
    return out, jnp.where(too_big, 0, total).astype(jnp.int32), status.astype(jnp.int32)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    """Frame content size when present (our encoder always writes 4-byte FCS)."""
    cap = comp.shape[0]
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int64)
    magic = (gb(0) | (gb(1) << 8) | (gb(2) << 16) | (gb(3) << 24))
    fhd = gb(4).astype(jnp.int32)
    fcs_flag = fhd >> 6
    single_seg = (fhd >> 5) & 1
    did_flag = fhd & 3
    o = 5 + jnp.where(single_seg == 1, 0, 1)
    o = o + jnp.where(did_flag == 0, 0,
            jnp.where(did_flag == 1, 1, jnp.where(did_flag == 2, 2, 4)))
    fcs1 = gb(o)
    fcs2 = gb(o) | (gb(o + 1) << 8)
    fcs4 = gb(o) | (gb(o + 1) << 8) | (gb(o + 2) << 16) | (gb(o + 3) << 24)
    fcs = jnp.where(fcs_flag == 0, jnp.where(single_seg == 1, fcs1, -1),
          jnp.where(fcs_flag == 1, fcs2 + 256, fcs4))
    ok = jnp.logical_and(comp_size >= 6, magic == MAGIC)
    return jnp.where(ok, fcs, 0).astype(jnp.int32)


TREE_CAP = 176  # direct <=65 B; FSE-weight <=128 B (header byte included)


def _huf_tree(freq: jax.Array):
    """Canonical zstd Huffman table + serialized tree description from a
    symbol histogram.

    Returns ``(codes int32[256], nb int32[256], tree uint8[TREE_CAP],
    tree_bytes, ok)`` — ``tree`` holds the complete tree-description region
    (header byte + direct 4-bit weights or FSE-compressed weights, whichever
    is smaller/applicable).  Shared by the XLA literal builder
    (:func:`_huf_literals`) and the Pallas encoder wrapper
    (:mod:`tpucomp.ops.pallas.zstd_encode`, which feeds a whole-chunk
    histogram and emits the streams in-kernel).
    """
    from tpucomp.formats.deflate import _huff_lengths

    lens, ok = _huff_lengths(freq, 11)
    present = lens > 0
    n_present = jnp.sum(present.astype(jnp.int32))
    max_bits = jnp.max(lens)
    sym_ids = jnp.arange(256, dtype=jnp.int32)
    max_sym = jnp.max(jnp.where(present, sym_ids, -1))
    weights = jnp.where(present, max_bits + 1 - lens, 0)

    ok = jnp.logical_and(ok, n_present >= 2)
    direct_ok = max_sym <= 128                    # direct tree: <=128 explicit

    # canonical codes, zstd order: (nbits desc, symbol asc)
    nb = jnp.where(present, lens, 0)
    span = jnp.where(present, jnp.int32(1) << jnp.clip(max_bits - nb, 0, 11), 0)
    key = jnp.where(present, (-nb).astype(jnp.int64) * 512 + sym_ids,
                    jnp.int64(1 << 40))
    order = jnp.argsort(key).astype(jnp.int32)
    span_o = span[order]
    start_o = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(span_o)[:-1].astype(jnp.int32)])
    start = jnp.zeros((256,), jnp.int32).at[order].set(start_o)
    codes = start >> jnp.clip(max_bits - nb, 0, 11)

    # tree description: direct 4-bit weights, two per byte
    n_explicit = max_sym                     # weights for symbols 0..max_sym-1
    tree_hdr = (127 + n_explicit).astype(jnp.int32)
    wk = jnp.arange(128, dtype=jnp.int32)
    whi = weights[jnp.clip(2 * wk, 0, 255)]
    wlo = jnp.where(2 * wk + 1 < n_explicit, weights[jnp.clip(2 * wk + 1, 0, 255)], 0)
    wlo = jnp.where(2 * wk + 1 < n_explicit, wlo, jnp.where(
        2 * wk < n_explicit, 0, 0))
    tree_nib = ((whi << 4) | wlo).astype(jnp.uint8)
    direct_tree_bytes = 1 + ((n_explicit + 1) >> 1)

    # ---- FSE-compressed weights (headerByte < 128, RFC 8878 4.2.1.1) -----------------
    # lifts the 128-explicit-weight limit (Huffman literals for full-byte
    # alphabets) and halves the tree description on text
    wN = n_explicit
    wk256 = jnp.arange(256, dtype=jnp.int32)
    wvalid = wk256 < wN
    wseq = jnp.where(wvalid, jnp.clip(weights[wk256], 0, 12), 0)
    whist = jnp.zeros((14,), jnp.int32).at[
        jnp.where(wvalid, wseq, 13)].add(1)[:13]
    wnorm, wnsym, wnok = _normalize_counts(whist, 64)
    # termination safety: the decoder detects stream end by over-reading, and
    # the final state of each chain is the symbol's FIRST slot (x = count c),
    # whose read width acc - bitlen(c) + 1 >= 1 whenever c < table size —
    # guaranteed because _normalize_counts rejects single-symbol alphabets
    wst_t, wnb_t, wbs_t, wfirst_t, wtok = _fse_enc_traced(wnorm, wnsym, 6)
    wdv, wdb, wdl = _serialize_ncount(wnorm, wnsym, 6)
    wd_bytes = (wdl + 7) >> 3

    def wchain(sym_arr, valid_arr):
        def step(carry, x):
            s_next, started = carry
            sym, active = x
            is_last = jnp.logical_and(active, jnp.logical_not(started))
            sc = jnp.clip(s_next, 0, 63)
            y = wst_t[sym, sc]
            nbv = wnb_t[sym, sc]
            b = s_next - wbs_t[sym, sc]
            new_s = jnp.where(is_last, wfirst_t[sym],
                              jnp.where(active, y, s_next))
            out_b = jnp.where(jnp.logical_and(active, started), b, 0)
            out_nb = jnp.where(jnp.logical_and(active, started), nbv, 0)
            return (new_s, jnp.logical_or(started, active)), (out_b, out_nb)

        (s0, _), (bs_o, nb_o) = jax.lax.scan(
            step, (jnp.int32(0) + 0 * wN, wN < 0),
            (sym_arr[::-1], valid_arr[::-1]))
        return s0, bs_o[::-1], nb_o[::-1]

    # two interleaved states: even positions from state0, odd from state1;
    # each chain's last symbol has no transition (emitted on bit exhaustion)
    s0w, t0b, t0n = wchain(wseq[0::2], wvalid[0::2])
    s1w, t1b, t1n = wchain(wseq[1::2], wvalid[1::2])
    wf_val = jnp.concatenate([jnp.stack([s0w, s1w]),
                              jnp.stack([t0b, t1b], axis=1).reshape(-1)])
    wf_nb = jnp.concatenate([jnp.full((2,), 6, jnp.int32),
                             jnp.stack([t0n, t1n], axis=1).reshape(-1)])
    wtotal_bits = jnp.sum(wf_nb)
    wprefix = (jnp.cumsum(wf_nb) - wf_nb).astype(jnp.int32)
    wstream_bytes = (wtotal_bits + 1 + 7) >> 3
    # tree region bytes: [desc (forward bits)] [backward bitstream]
    WTREE_CAP = 160
    wwords = jnp.zeros((WTREE_CAP // 4 + plz.DUMP_SLOTS,), jnp.uint32)
    all_v = jnp.concatenate([wdv, wf_val]).astype(jnp.uint64)
    all_n = jnp.concatenate([wdb, wf_nb])
    wdesc_off = (jnp.cumsum(wdb) - wdb).astype(jnp.int32)
    wfield_off = wd_bytes * 8 + (wtotal_bits - wprefix - wf_nb)
    all_o = jnp.concatenate([wdesc_off, wfield_off])
    wfp = jnp.arange(all_v.shape[0], dtype=jnp.int32)
    wemit = all_n > 0
    for w in range(2):
        part = ((all_v << (all_o & 31).astype(jnp.uint64))
                >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        t2 = jnp.where(wemit, jnp.clip((all_o >> 5) + w, 0, WTREE_CAP // 4 - 1),
                       plz.dump_spread(wfp, WTREE_CAP // 4))
        wwords = wwords.at[t2].add(part.astype(jnp.uint32))
    # sentinel 1-bit at the top of the backward bitstream
    wpb = wd_bytes * 8 + wtotal_bits
    wwords = wwords.at[jnp.clip(wpb >> 5, 0, WTREE_CAP // 4 - 1)].add(
        jnp.uint32(1) << (wpb & 31).astype(jnp.uint32))
    wtree_u8 = ((wwords[:WTREE_CAP // 4, None]
                 >> (jnp.arange(4, dtype=jnp.uint32) * 8)) & 0xFF
                ).astype(jnp.uint8).reshape(-1)
    wthdr = wd_bytes + wstream_bytes
    fse_ok = jnp.logical_and(jnp.logical_and(wnok, wtok), wthdr < 128)
    fse_ok = jnp.logical_and(fse_ok, wN >= 2)

    use_fse_w = jnp.logical_and(fse_ok, jnp.logical_or(
        jnp.logical_not(direct_ok), 1 + wthdr < direct_tree_bytes))
    ok = jnp.logical_and(ok, jnp.logical_or(direct_ok, fse_ok))
    tree_hdr = jnp.where(use_fse_w, wthdr, tree_hdr)
    tree_bytes = jnp.where(use_fse_w, 1 + wthdr, direct_tree_bytes)

    # assembled tree region: header byte + payload
    tp = jnp.arange(TREE_CAP, dtype=jnp.int32)
    payload = jnp.where(use_fse_w,
                        wtree_u8[jnp.clip(tp - 1, 0, WTREE_CAP - 1)],
                        tree_nib[jnp.clip(tp - 1, 0, 127)])
    tree = jnp.where(tp == 0, tree_hdr.astype(jnp.uint8), payload)
    tree = jnp.where(tp < tree_bytes, tree, 0).astype(jnp.uint8)
    return codes, nb, tree, tree_bytes.astype(jnp.int32), ok


def _huf_literals(lit_bytes: jax.Array, n_lit: jax.Array, cap: int):
    """Build a Huffman-compressed 4-stream literal section (zstd format).

    Returns (section uint8[sec_cap], section_len, ok).  ``ok`` is False
    when Huffman coding is inapplicable (degenerate alphabets, no size win)
    — callers then emit raw literals.  Everything is parallel: the
    table/tree comes from :func:`_huf_tree`, and each of the four backward
    streams is laid out by offset arithmetic + scatter-OR.
    """
    # histogram over the literal buffer
    li = jnp.arange(cap, dtype=jnp.int32)
    valid = li < n_lit
    freq = jnp.zeros((256,), jnp.int32).at[
        jnp.where(valid, lit_bytes.astype(jnp.int32), 255)].add(
        valid.astype(jnp.int32))
    # the dump also hit bin 255; recount it exactly
    c255 = jnp.sum(jnp.where(jnp.logical_and(valid, lit_bytes == 255), 1, 0)).astype(jnp.int32)
    freq = freq.at[255].set(c255)

    codes, nb, tree, tree_bytes, ok = _huf_tree(freq)
    ok = jnp.logical_and(ok, n_lit >= 64)

    # four streams: 3 x ceil(n/4) then the rest
    per = (n_lit + 3) >> 2
    counts = jnp.stack([per, per, per, n_lit - 3 * per])
    offs = jnp.stack([jnp.int32(0), per, 2 * per, 3 * per])

    # per-literal code fields; stream id and in-stream index per literal
    sidx = jnp.clip(jnp.where(valid, li // jnp.maximum(per, 1), 0), 0, 3)
    sidx = jnp.where(li >= 3 * per, 3, sidx)
    code_l = codes[jnp.clip(lit_bytes.astype(jnp.int32), 0, 255)]
    nb_l = jnp.where(valid, nb[jnp.clip(lit_bytes.astype(jnp.int32), 0, 255)], 0)

    # per-stream bit layout: prefix of nbits within the stream, descending
    # (first symbol at the top).  Segmented prefix via global cumsum minus the
    # stream-start cumsum.
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(nb_l)[:-1].astype(jnp.int32)])
    cum_at_start = jnp.zeros((4,), jnp.int32)
    for k in range(4):
        idxk = jnp.clip(offs[k], 0, cap - 1)
        cum_at_start = cum_at_start.at[k].set(
            jnp.where(counts[k] > 0, cum[idxk], 0))
    prefix_in_stream = cum - cum_at_start[sidx]
    total_bits_s = jnp.zeros((4,), jnp.int32)
    for k in range(4):
        end = offs[k] + counts[k]
        idxk = jnp.clip(end - 1, 0, cap - 1)
        tb = jnp.where(counts[k] > 0,
                       cum[idxk] + nb_l[jnp.clip(idxk, 0, cap - 1)]
                       - cum_at_start[k], 0)
        total_bits_s = total_bits_s.at[k].set(tb)
    sbytes = (total_bits_s + 1 + 7) >> 3

    # serialize all four streams into one words buffer; stream k's bytes start
    # at byte offset soff[k] (within the streams region)
    soff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(sbytes)[:-1].astype(jnp.int32)])
    bit_off = (soff[sidx] * 8
               + total_bits_s[sidx] - prefix_in_stream - nb_l)
    n_words = cap // 2 + 8
    words = jnp.zeros((n_words + plz.DUMP_SLOTS,), jnp.uint32)
    sh = (bit_off & 31).astype(jnp.uint64)
    widx = bit_off >> 5
    v64 = code_l.astype(jnp.uint64)
    emit = jnp.logical_and(valid, nb_l > 0)
    for w in range(2):
        part = ((v64 << sh) >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        tgt = jnp.where(emit, jnp.clip(widx + w, 0, n_words - 1),
                        plz.dump_spread(li, n_words))
        words = words.at[tgt].add(part.astype(jnp.uint32))
    # per-stream padding bit at its total_bits position
    for k in range(4):
        pb = soff[k] * 8 + total_bits_s[k]
        pw = jnp.clip(pb >> 5, 0, n_words - 1)
        words = words.at[pw].add(
            jnp.where(counts[k] > 0,
                      jnp.uint32(1) << (pb & 31).astype(jnp.uint32),
                      jnp.uint32(0)))
    words = words[:n_words]
    wshift = jnp.arange(4, dtype=jnp.uint32) * 8
    stream_u8 = ((words[:, None] >> wshift[None, :]) & 0xFF).astype(jnp.uint8).reshape(-1)

    streams_total = jnp.sum(sbytes)
    csize = tree_bytes + 6 + streams_total
    ok = jnp.logical_and(ok, csize + 5 < n_lit)   # must actually win vs raw

    # assemble the section: [5B lit hdr] [tree] [jump 6B] [streams]
    sec_cap = cap + 64
    po = jnp.arange(sec_cap, dtype=jnp.int32)
    # literal section header: type=2 (Compressed), fmt=3: 18-bit regen+csize
    w0 = (jnp.int32(2) | (3 << 2)
          | ((n_lit & 0x3FFFF) << 4)).astype(jnp.int64)
    w0 = w0 | ((csize & 0x3FFFF).astype(jnp.int64) << 22)
    hdr5 = ((w0[None] >> (8 * jnp.arange(5, dtype=jnp.int64))) & 0xFF).astype(jnp.uint8)
    sec = jnp.where(po < 5, hdr5[jnp.clip(po, 0, 4)], 0).astype(jnp.uint8)
    sel = jnp.logical_and(po >= 5, po < 5 + tree_bytes)
    sec = jnp.where(sel, tree[jnp.clip(po - 5, 0, TREE_CAP - 1)], sec)
    jo = 5 + tree_bytes
    jump = jnp.stack([sbytes[0] & 0xFF, sbytes[0] >> 8,
                      sbytes[1] & 0xFF, sbytes[1] >> 8,
                      sbytes[2] & 0xFF, sbytes[2] >> 8]).astype(jnp.uint8)
    sel = jnp.logical_and(po >= jo, po < jo + 6)
    sec = jnp.where(sel, jump[jnp.clip(po - jo, 0, 5)], sec)
    so = jo + 6
    sel = jnp.logical_and(po >= so, po < so + streams_total)
    sec = jnp.where(sel, stream_u8[jnp.clip(po - so, 0, stream_u8.shape[0] - 1)], sec)
    sec_len = 5 + csize
    ok = jnp.logical_and(ok, jnp.all(sbytes < (1 << 16)))
    return sec, sec_len, ok


def _encode_block_body(data: jax.Array, size: jax.Array,
                       first_block=True):
    """Build one compressed-block BODY (literal section + sequence section).

    ``data`` is one block's bytes (cap <= 128 KiB, the zstd block limit);
    returns ``(body uint8[cap+64], body_len, ok)`` — no frame or block
    headers.  ``ok`` False means the caller must emit a raw block instead
    (degenerate alphabets, caps exceeded, or no size win possible).

    Literals are Huffman-coded (4-stream) when that wins, else raw; sequences
    use the RFC 8878 predefined FSE tables over the shared LZ match finder.
    ``first_block``: the repeat-offset stack persists across a frame's
    blocks; only the frame's first block may claim the (1, 4, 8) initial
    stack — later blocks start from sentinels so every repeat code they
    emit references an offset pushed within the block itself (the decoder's
    carried stack then evolves identically).
    """
    cap = data.shape[0]
    from tpucomp.formats import lz4 as _lz4
    size = size.astype(jnp.int32)

    # ---- matches + greedy parse (shared machinery) --------------------------------
    # deeper candidate list than the byte-LZ encoders: zstd's entropy stage
    # amortizes the extra match quality (measured on the 64 KiB mixed
    # corpus: 1.043x -> 1.029x of zstd-3 going from 8/6 to 32/24)
    mlen, moff = _lz4._find_matches(data, size, run_dists=(1, 2, 4, 8),
                                    ext_words=64, n_cands=32, probe_words=24)
    p = jnp.arange(cap, dtype=jnp.int32)

    # entropy-aware match economics: on low-alphabet *random* data a short
    # match's coded cost (offset extra bits + code fields) exceeds the
    # Huffman cost of emitting its bytes as literals — zstd's own parser
    # prices this; approximate with the byte-histogram entropy (floored at
    # 1 bit/byte, the Huffman floor, so RLE-ish data keeps its matches)
    histb = jnp.zeros((256,), jnp.float32).at[data.astype(jnp.int32)].add(
        (p < size).astype(jnp.float32))
    pr = histb / jnp.maximum(size, 1).astype(jnp.float32)
    hbits = -jnp.sum(jnp.where(pr > 0, pr * jnp.log2(jnp.maximum(pr, 1e-9)),
                               0.0))
    hbits = jnp.maximum(hbits, 1.0)
    ofb = jnp.zeros((cap,), jnp.int32)
    for k in range(1, 18):
        ofb = jnp.where(((moff + 3) >> k) > 0, k, ofb)
    economic = mlen.astype(jnp.float32) * hbits >= (ofb + 12).astype(
        jnp.float32)

    has_match = jnp.logical_and(mlen >= 4, economic)
    # one-step lazy matching (zstd's own parser defers a match when the next
    # position holds a longer one): a deferred position becomes a literal
    # and the parse lands on the longer match — a pure vector rule here
    ml_next = jnp.concatenate([mlen[1:], jnp.zeros((1,), jnp.int32)])
    hm_next = jnp.concatenate([has_match[1:], jnp.zeros((1,), jnp.bool_)])
    defer = jnp.logical_and(has_match,
                            jnp.logical_and(hm_next, ml_next > mlen))
    has_match = jnp.logical_and(has_match, jnp.logical_not(defer))
    nxt = jnp.where(has_match, p + mlen, p + 1)
    nxt = jnp.where(p < size, nxt, cap)
    reach, _ = plz.wyllie_path(nxt, jnp.zeros((cap,), jnp.int32),
                               num_rounds=_ceil_log2(cap) + 1)
    reach = jnp.logical_and(reach, p < size)
    is_tok = jnp.logical_and(reach, has_match)
    nseq = jnp.sum(is_tok.astype(jnp.int32))

    cap_tok = cap // 4 + 2
    sorted_pos = jnp.sort(jnp.where(is_tok, p, jnp.int32(2**30)))[:cap_tok]
    t_pos = jnp.clip(sorted_pos, 0, cap - 1)
    t_ml = mlen[t_pos]
    t_off = jnp.maximum(moff[t_pos], 1)
    ti = jnp.arange(cap_tok, dtype=jnp.int32)
    t_valid = ti < nseq
    prev_end = jnp.where(ti == 0, 0,
                         t_pos[jnp.clip(ti - 1, 0, cap_tok - 1)]
                         + t_ml[jnp.clip(ti - 1, 0, cap_tok - 1)])
    t_ll = jnp.where(t_valid, t_pos - prev_end, 0)
    t_ml = jnp.where(t_valid, t_ml, 0)

    # merge same-offset ll==0 chains: the match finder's extension cap splits
    # very long matches into back-to-back tokens, and RFC 8878 has no
    # "repeat rep0 with zero literals" code (such chains ARE one match) —
    # one merged match saves the whole offset/code fields per link
    prev_off_m = jnp.concatenate([jnp.zeros((1,), jnp.int32), t_off[:-1]])
    chain = jnp.logical_and(
        t_valid, jnp.logical_and(ti > 0, jnp.logical_and(
            t_ll == 0, t_off == prev_off_m)))
    head = jnp.logical_not(chain)
    gid = jnp.cumsum(head.astype(jnp.int32)) - 1
    ml_sum = jnp.zeros((cap_tok,), jnp.int32).at[
        jnp.clip(gid, 0, cap_tok - 1)].add(t_ml)
    vhead = jnp.logical_and(head, t_valid)
    nseq = jnp.sum(vhead.astype(jnp.int32))
    hsel = jnp.clip(jnp.sort(jnp.where(vhead, ti, jnp.int32(2**30)))[:cap_tok],
                    0, cap_tok - 1)
    t_pos = t_pos[hsel]
    t_ll = t_ll[hsel]
    t_off = t_off[hsel]
    t_valid = ti < nseq
    t_ml = jnp.where(t_valid, ml_sum, 0)
    t_ll = jnp.where(t_valid, t_ll, 0)

    # ---- literal bytes (in order) ---------------------------------------------------
    is_lit = jnp.logical_and(reach, jnp.logical_not(has_match))
    n_lit = jnp.sum(is_lit.astype(jnp.int32))
    lit_pos = jnp.sort(jnp.where(is_lit, p, jnp.int32(2**30)))
    lit_bytes = data[jnp.clip(lit_pos, 0, cap - 1)]
    huf_sec, huf_sec_len, huf_ok = _huf_literals(lit_bytes, n_lit, cap)

    # ---- per-sequence codes ---------------------------------------------------------
    ll_base_t = jnp.asarray(LL_BASE)
    ml_base_t = jnp.asarray(ML_BASE)
    ll_code = jnp.clip(jnp.searchsorted(ll_base_t, t_ll, side="right").astype(jnp.int32) - 1, 0, 35)
    ml_code = jnp.clip(jnp.searchsorted(ml_base_t, jnp.maximum(t_ml, 3), side="right").astype(jnp.int32) - 1, 0, 52)
    ll_x = t_ll - ll_base_t[ll_code]
    ml_x = jnp.maximum(t_ml, 3) - ml_base_t[ml_code]
    # repeat-offset codes (RFC 8878 3.1.1.3.2.1.1): the full 3-deep rolling
    # stack — Offset_Value 1/2/3 address the recent-offset history (shifted
    # when ll==0), replacing a ~10-16-bit offset field with a 0/1-bit code
    # on repeated-stride data.  The stack update is inherently sequential, so
    # it runs as a lax.scan over the (few-thousand) sequences; the decoder
    # (and the Pallas kernel) already implement the matching consumer side.
    def rep_step(stack, xs):
        off, ll, valid = xs
        r0, r1, r2 = stack
        with_lit = ll > 0
        ofv = jnp.where(
            with_lit,
            jnp.where(off == r0, 1,
                      jnp.where(off == r1, 2,
                                jnp.where(off == r2, 3, off + 3))),
            jnp.where(off == r1, 1,
                      jnp.where(off == r2, 2, off + 3)))
        # stack update: code 1 w/lit keeps it; code 2 swaps; code 3 / real
        # offsets push to front
        n0 = off
        n1 = jnp.where(jnp.logical_and(with_lit, ofv == 1), r1, r0)
        n2 = jnp.where(
            jnp.logical_or(jnp.logical_and(with_lit, ofv <= 2),
                           jnp.logical_and(jnp.logical_not(with_lit),
                                           ofv == 1)), r2, r1)
        n0 = jnp.where(jnp.logical_and(with_lit, ofv == 1), r0, n0)
        new = (jnp.where(valid, n0, r0), jnp.where(valid, n1, r1),
               jnp.where(valid, n2, r2))
        return new, jnp.where(valid, ofv, off + 3)

    fb = jnp.asarray(first_block, jnp.bool_)
    init_stack = (jnp.where(fb, 1, -1).astype(jnp.int32),
                  jnp.where(fb, 4, -2).astype(jnp.int32),
                  jnp.where(fb, 8, -3).astype(jnp.int32))
    _, ofv = jax.lax.scan(rep_step, init_stack, (t_off, t_ll, t_valid))
    of_code = jnp.zeros((cap_tok,), jnp.int32)
    for k in range(1, 18):
        of_code = jnp.where((ofv >> k) > 0, k, of_code)
    of_x = ofv - (jnp.int32(1) << of_code)

    # ---- custom FSE tables (mode 2) when they beat the predefined ones ---------------
    def hist(codes, max_sym):
        h = jnp.zeros((max_sym + 1,), jnp.int32).at[
            jnp.where(t_valid, jnp.clip(codes, 0, max_sym - 1), max_sym)].add(1)
        return h[:max_sym]

    def flog2(n):
        l = jnp.zeros_like(n)
        for k in range(MAX_ACC_LOG + 1):
            l = jnp.where((n >> k) > 0, k, l)
        return l

    def custom_stream(codes, max_sym, acc, default_norm_np, default_acc):
        """Build the mode-2 alternative for one stream type.

        Returns (use, st, nb, bs, first, desc_vals, desc_bits, desc_len_bits)
        with the table arrays where-selected against the predefined ones by
        an entropy-cost estimate including the description overhead.
        """
        freq = hist(codes, max_sym)
        norm, nsym, nok = _normalize_counts(freq, 1 << acc)
        stc, nbc, bsc, firstc, tok = _fse_enc_traced(norm, nsym, acc)
        dvals, dbits, dlen = _serialize_ncount(norm, nsym, acc)
        cost_c = jnp.sum(freq * (acc - flog2(jnp.maximum(norm, 1)))) \
            + dlen + 7 + acc
        dn = jnp.asarray(np.abs(default_norm_np).astype(np.int32))[:max_sym]
        cost_p = jnp.sum(freq * (default_acc - flog2(jnp.maximum(dn, 1)))) \
            + default_acc
        use = jnp.logical_and(jnp.logical_and(nok, tok), cost_c < cost_p)
        use = jnp.logical_and(use, nseq >= 16)
        return use, stc, nbc, bsc, firstc, dvals, \
            jnp.where(use, dbits, 0), jnp.where(use, dlen, 0)

    use_ll, ll_stc, ll_nbc, ll_bsc, ll_firstc, ll_dv, ll_db, ll_dl = \
        custom_stream(ll_code, 36, MAX_ACC_LOG, LL_DEFAULT, LL_DEFAULT_ACC)
    use_ml, ml_stc, ml_nbc, ml_bsc, ml_firstc, ml_dv, ml_db, ml_dl = \
        custom_stream(ml_code, 53, MAX_ACC_LOG, ML_DEFAULT, ML_DEFAULT_ACC)
    use_of, of_stc, of_nbc, of_bsc, of_firstc, of_dv, of_db, of_dl = \
        custom_stream(of_code, 29, 8, OF_DEFAULT, OF_DEFAULT_ACC)

    # ---- FSE state chains (reverse scan; see _fse_enc_np) ---------------------------
    def pick(use, custom3, default3, size_custom):
        """where-select (st, nb, bs, first) between custom and zero-padded
        predefined tables (chain states index only the live prefix)."""
        stc, nbc, bsc, firstc = custom3
        std, nbd, bsd, firstd = (np.asarray(a) for a in default3)
        padc = size_custom - std.shape[1]
        std = jnp.asarray(np.pad(std, ((0, 0), (0, padc))))
        nbd = jnp.asarray(np.pad(nbd, ((0, 0), (0, padc))))
        bsd = jnp.asarray(np.pad(bsd, ((0, 0), (0, padc))))
        return (jnp.where(use, stc, std), jnp.where(use, nbc, nbd),
                jnp.where(use, bsc, bsd),
                jnp.where(use, firstc, jnp.asarray(firstd)))

    ll_st_t, ll_nb_t, ll_bs_t, ll_first = pick(
        use_ll, (ll_stc, ll_nbc, ll_bsc, ll_firstc), LL_ENC, FSE_CAP)
    ml_st_t, ml_nb_t, ml_bs_t, ml_first = pick(
        use_ml, (ml_stc, ml_nbc, ml_bsc, ml_firstc), ML_ENC, FSE_CAP)
    of_st_t, of_nb_t, of_bs_t, of_first = pick(
        use_of, (of_stc, of_nbc, of_bsc, of_firstc), OF_ENC, 256)

    def chain(sym_arr, st_t, nb_t, bs_t, first_t):
        def step(carry, x):
            s_next, started = carry
            sym, active = x
            is_last = jnp.logical_and(active, jnp.logical_not(started))
            s_init = first_t[sym]
            y = st_t[sym, jnp.clip(s_next, 0, st_t.shape[1] - 1)]
            nb = nb_t[sym, jnp.clip(s_next, 0, st_t.shape[1] - 1)]
            b = s_next - bs_t[sym, jnp.clip(s_next, 0, st_t.shape[1] - 1)]
            new_s = jnp.where(is_last, s_init, jnp.where(active, y, s_next))
            out_b = jnp.where(jnp.logical_and(active, started), b, 0)
            out_nb = jnp.where(jnp.logical_and(active, started), nb, 0)
            return (new_s, jnp.logical_or(started, active)), (out_b, out_nb)

        (s0, _), (bs, nbs) = jax.lax.scan(
            step, (jnp.int32(0) + 0 * size, size < 0),
            (sym_arr[::-1], t_valid[::-1]))
        return s0, bs[::-1], nbs[::-1]

    # the scan step for seq i computes the transition bits the decoder reads
    # during seq i's state update (from s_{i+1} and sym_i) — already aligned
    ll_s0, ll_ub, ll_un = chain(ll_code, ll_st_t, ll_nb_t, ll_bs_t, ll_first)
    ml_s0, ml_ub, ml_un = chain(ml_code, ml_st_t, ml_nb_t, ml_bs_t, ml_first)
    of_s0, of_ub, of_un = chain(of_code, of_st_t, of_nb_t, of_bs_t, of_first)

    # ---- bit-field list in decode order ---------------------------------------------
    ll_bits_t = jnp.asarray(LL_BITS)
    ml_bits_t = jnp.asarray(ML_BITS)
    f_val = jnp.stack([of_x, ml_x, ll_x, ll_ub, ml_ub, of_ub], axis=1).reshape(-1)
    f_nb = jnp.stack([jnp.where(t_valid, of_code, 0),
                      jnp.where(t_valid, ml_bits_t[ml_code], 0),
                      jnp.where(t_valid, ll_bits_t[ll_code], 0),
                      ll_un, ml_un, of_un], axis=1).reshape(-1)
    head_val = jnp.stack([ll_s0, of_s0, ml_s0])
    head_nb = jnp.stack([jnp.where(use_ll, MAX_ACC_LOG, LL_DEFAULT_ACC),
                         jnp.where(use_of, 8, OF_DEFAULT_ACC),
                         jnp.where(use_ml, MAX_ACC_LOG, ML_DEFAULT_ACC)])
    head_nb = jnp.where(nseq > 0, head_nb, 0)
    vals = jnp.concatenate([head_val, f_val]).astype(jnp.int64)
    nbs = jnp.concatenate([head_nb, f_nb])

    total_bits = jnp.sum(nbs)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(nbs)[:-1].astype(jnp.int32)])
    # decode reads top-down: field j sits at [total - prefix_j - n_j, total - prefix_j)
    bit_off = total_bits - prefix - nbs
    stream_bytes = (total_bits + 1 + 7) // 8

    nf = vals.shape[0]
    n_words = cap // 4 + 16
    words = jnp.zeros((n_words + plz.DUMP_SLOTS,), jnp.uint32)
    sh = (bit_off & 31).astype(jnp.uint64)
    widx = bit_off >> 5
    v64 = vals.astype(jnp.uint64)
    fpos = jnp.arange(nf, dtype=jnp.int32)
    emit = nbs > 0
    for w in range(3):
        part = ((v64 << sh) >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        tgt = jnp.where(emit, jnp.clip(widx + w, 0, n_words - 1),
                        plz.dump_spread(fpos, n_words))
        words = words.at[tgt].add(part.astype(jnp.uint32))
    # padding 1-bit at position total_bits
    pad_w = jnp.clip(total_bits >> 5, 0, n_words - 1)
    words = words.at[pad_w].add(jnp.uint32(1) << (total_bits & 31).astype(jnp.uint32))
    words = words[:n_words]
    wshift = jnp.arange(4, dtype=jnp.uint32) * 8
    stream_u8 = ((words[:, None] >> wshift[None, :]) & 0xFF).astype(jnp.uint8).reshape(-1)

    # ---- FSE table descriptions (LL, OF, ML order per RFC 8878) ----------------------
    DESC_CAP_B = 96  # ML: 1+53 fields x <=11 bits = 74 B worst case
    desc_fields_v = jnp.concatenate([ll_dv, of_dv, ml_dv]).astype(jnp.int64)
    ll_len_b = (ll_dl + 7) >> 3
    of_len_b = (of_dl + 7) >> 3
    ml_len_b = (ml_dl + 7) >> 3
    # bit offsets: each description starts byte-aligned at its own region
    region_start = jnp.stack([jnp.int32(0), ll_len_b * 8,
                              (ll_len_b + of_len_b) * 8])
    desc_bits_all = jnp.concatenate([ll_db, of_db, ml_db])
    local_off = jnp.cumsum(desc_bits_all) - desc_bits_all
    # rebase each region's prefix to its own start
    ll_n = ll_dv.shape[0]
    of_n = of_dv.shape[0]
    base_fix = jnp.concatenate([
        jnp.zeros((ll_n,), jnp.int32),
        jnp.full((of_n,), 1, jnp.int32),
        jnp.full((ml_dv.shape[0],), 2, jnp.int32)])
    seg_first = jnp.stack([jnp.int32(0), local_off[ll_n],
                           local_off[ll_n + of_n]])
    desc_off = region_start[base_fix] + local_off - seg_first[base_fix]
    desc_words = jnp.zeros((3 * DESC_CAP_B // 4 + plz.DUMP_SLOTS,), jnp.uint32)
    dsh = (desc_off & 31).astype(jnp.uint64)
    dpos = jnp.arange(desc_fields_v.shape[0], dtype=jnp.int32)
    demit = desc_bits_all > 0
    for w in range(2):
        part = ((desc_fields_v.astype(jnp.uint64) << dsh)
                >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        t2 = jnp.where(demit,
                       jnp.clip((desc_off >> 5) + w, 0, 3 * DESC_CAP_B // 4 - 1),
                       plz.dump_spread(dpos, 3 * DESC_CAP_B // 4))
        desc_words = desc_words.at[t2].add(part.astype(jnp.uint32))
    desc_words = desc_words[:3 * DESC_CAP_B // 4]
    desc_u8 = ((desc_words[:, None] >> (jnp.arange(4, dtype=jnp.uint32) * 8))
               & 0xFF).astype(jnp.uint8).reshape(-1)
    desc_total = ll_len_b + of_len_b + ml_len_b

    # ---- assemble the block body ------------------------------------------------------
    nseq_hdr = jnp.where(nseq == 0, 1, 2)
    seq_sec = nseq_hdr + jnp.where(nseq > 0, 1 + desc_total + stream_bytes, 0)
    lit_sec_len = jnp.where(huf_ok, huf_sec_len, 3 + n_lit)
    body_len = lit_sec_len + seq_sec

    lit_hdr = jnp.stack([
        (jnp.int32(0) | (3 << 2) | ((n_lit & 0xF) << 4)) & 0xFF,
        (n_lit >> 4) & 0xFF, (n_lit >> 12) & 0xFF]).astype(jnp.uint8)

    body_cap = cap + 64
    pos_o = jnp.arange(body_cap, dtype=jnp.int32)
    # literal section at 0: Huffman-compressed when it wins, else raw
    raw_lit = jnp.logical_not(huf_ok)
    out = jnp.where(jnp.logical_and(raw_lit, pos_o < 3),
                    lit_hdr[jnp.clip(pos_o, 0, 2)], 0).astype(jnp.uint8)
    raw_sel = jnp.logical_and(raw_lit,
                              jnp.logical_and(pos_o >= 3, pos_o < 3 + n_lit))
    out = jnp.where(raw_sel, lit_bytes[jnp.clip(pos_o - 3, 0, cap - 1)], out)
    huf_sel = jnp.logical_and(huf_ok, pos_o < huf_sec_len)
    out = jnp.where(huf_sel,
                    huf_sec[jnp.clip(pos_o, 0, huf_sec.shape[0] - 1)], out)
    # nseq header
    o1 = lit_sec_len
    nseq_b0 = jnp.where(nseq == 0, 0, 128 + (nseq >> 8))
    out = jnp.where(pos_o == o1, nseq_b0.astype(jnp.uint8), out)
    out = jnp.where(jnp.logical_and(pos_o == o1 + 1, nseq > 0),
                    (nseq & 0xFF).astype(jnp.uint8), out)
    # SCM byte (mode 2 = FSE_Compressed per stream when the custom table won)
    o2 = o1 + nseq_hdr
    scm = (jnp.where(use_ll, 2, 0) << 6) | (jnp.where(use_of, 2, 0) << 4) \
        | (jnp.where(use_ml, 2, 0) << 2)
    out = jnp.where(jnp.logical_and(pos_o == o2, nseq > 0),
                    scm.astype(jnp.uint8), out)
    # table descriptions (LL, OF, ML; each byte-aligned), then the bitstream
    dsel = jnp.logical_and(nseq > 0,
                           jnp.logical_and(pos_o >= o2 + 1,
                                           pos_o < o2 + 1 + desc_total))
    # regions are contiguous and byte-aligned: desc_u8 is the bytes in order
    dp = jnp.clip(pos_o - (o2 + 1), 0, desc_u8.shape[0] - 1)
    out = jnp.where(dsel, desc_u8[dp], out)
    o3 = o2 + 1 + desc_total
    sel = jnp.logical_and(nseq > 0,
                          jnp.logical_and(pos_o >= o3, pos_o < body_len))
    out = jnp.where(sel, stream_u8[jnp.clip(pos_o - o3, 0,
                                            stream_u8.shape[0] - 1)], out)

    ok = jnp.logical_and(nseq <= 32511, n_lit < (1 << 20))
    ok = jnp.logical_and(ok, body_len <= body_cap)
    return out, body_len.astype(jnp.int32), ok


def _frame_header(size: jax.Array) -> jax.Array:
    """10-byte frame header: magic, FHD (4-byte FCS), window descriptor."""
    wl = jnp.int32(10)
    for k in range(11, 25):
        wl = jnp.where(size > (1 << (k - 1)), k, wl)
    hdr = jnp.zeros((10,), jnp.uint8)
    for b, v in enumerate([MAGIC & 0xFF, (MAGIC >> 8) & 0xFF,
                           (MAGIC >> 16) & 0xFF, (MAGIC >> 24) & 0xFF]):
        hdr = hdr.at[b].set(v)
    hdr = hdr.at[4].set(0x80)                       # fcs_flag=2 (4-byte FCS)
    hdr = hdr.at[5].set(((wl - 10) << 3).astype(jnp.uint8))
    for b in range(4):
        hdr = hdr.at[6 + b].set(((size >> (8 * b)) & 0xFF).astype(jnp.uint8))
    return hdr


ZSTD_BLOCK = 1 << 17  # 128 KiB zstd block limit (RFC 8878 3.1.1.2.3)


def encode_chunk(data: jax.Array, size: jax.Array, opts: ZstdOpts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compress one chunk as a zstd frame.

    Chunks split into 128 KiB blocks (the RFC 8878 block limit), each encoded
    as a compressed block — Huffman/raw literals plus predefined-FSE-coded
    sequences from the shared LZ match finder — or a raw block when that is
    smaller.  Supports the reference's full 16 MB max chunk
    (``nvcompZstdCompressionMaxAllowedChunkSize``, ``CHANGELOG.md:55``);
    matches are found within each block (offsets stay inside the window).
    Falls back to the store-mode frame when nothing wins.
    """
    cap = data.shape[0]
    size = size.astype(jnp.int32)
    store_out, store_size, store_status = _encode_store(data, size, opts, out_cap)

    if cap <= ZSTD_BLOCK:
        body, body_len, ok = _encode_block_body(data, size)
        total = 13 + body_len
        bh = jnp.int32(1) | (2 << 1) | (body_len << 3)
        hdr = jnp.concatenate([
            _frame_header(size),
            jnp.stack([bh & 0xFF, (bh >> 8) & 0xFF,
                       (bh >> 16) & 0xFF]).astype(jnp.uint8)])
        pos_o = jnp.arange(out_cap, dtype=jnp.int32)
        out = jnp.where(pos_o < 13, hdr[jnp.clip(pos_o, 0, 12)], 0).astype(jnp.uint8)
        sel = jnp.logical_and(pos_o >= 13, pos_o < total)
        out = jnp.where(sel, body[jnp.clip(pos_o - 13, 0, body.shape[0] - 1)], out)
        use_comp = jnp.logical_and(jnp.logical_and(ok, total <= out_cap),
                                   total < store_size)
        out = jnp.where(use_comp, out, store_out)
        out_size = jnp.where(use_comp, total, store_size).astype(jnp.int32)
        status = jnp.where(use_comp, Status.SUCCESS, store_status)
        return out, out_size, status.astype(jnp.int32)

    # ---- multi-block frame (chunks up to the 16 MB reference max) -------------------
    nb = -(-cap // ZSTD_BLOCK)
    dpad = jnp.pad(data, (0, nb * ZSTD_BLOCK - cap))
    blocks = dpad.reshape(nb, ZSTD_BLOCK)
    bi = jnp.arange(nb, dtype=jnp.int32)
    blk_start = bi * ZSTD_BLOCK
    bsize = jnp.clip(size - blk_start, 0, ZSTD_BLOCK)
    bodies, body_lens, oks = jax.lax.map(
        lambda t: _encode_block_body(t[0], t[1], t[2]),
        (blocks, bsize, bi == 0))

    blk_active = jnp.logical_or(bsize > 0, bi == 0)
    n_blocks = jnp.maximum(jnp.sum((bsize > 0).astype(jnp.int32)), 1)
    is_last = bi == n_blocks - 1
    use_comp = jnp.logical_and(oks, body_lens < bsize)
    csize = jnp.where(use_comp, body_lens, bsize)
    out_sizes = jnp.where(blk_active, 3 + csize, 0)
    HDR = 10
    out_off = HDR + jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                     jnp.cumsum(out_sizes)[:-1].astype(jnp.int32)])
    total = HDR + jnp.sum(out_sizes)

    hdr = _frame_header(size)
    pos = jnp.arange(out_cap, dtype=jnp.int32)
    out = jnp.where(pos < HDR, hdr[jnp.clip(pos, 0, HDR - 1)], 0).astype(jnp.uint8)
    # each output byte classifies itself against the block layout
    key = jnp.where(blk_active, out_off, jnp.int32(2**30))
    kblk = jnp.clip(jnp.searchsorted(key, pos, side="right").astype(jnp.int32) - 1,
                    0, nb - 1)
    r = pos - out_off[kblk]
    btype = jnp.where(use_comp, 2, 0)
    bh = (jnp.where(is_last[kblk], 1, 0)
          | (btype[kblk] << 1) | (csize[kblk] << 3))
    bh_byte = jnp.where(r == 0, bh & 0xFF,
              jnp.where(r == 1, (bh >> 8) & 0xFF, (bh >> 16) & 0xFF))
    raw_byte = data[jnp.clip(blk_start[kblk] + (r - 3), 0, cap - 1)].astype(jnp.int32)
    comp_byte = bodies[kblk, jnp.clip(r - 3, 0, bodies.shape[1] - 1)].astype(jnp.int32)
    body_byte = jnp.where(use_comp[kblk], comp_byte, raw_byte)
    out = jnp.where(jnp.logical_and(pos >= HDR, pos < total),
                    jnp.where(r < 3, bh_byte, body_byte).astype(jnp.uint8), out)

    fits = total <= out_cap
    use_frame = jnp.logical_and(fits, total < store_size)
    out = jnp.where(use_frame, out, store_out)
    out_size = jnp.where(use_frame, total, store_size).astype(jnp.int32)
    status = jnp.where(use_frame, Status.SUCCESS, store_status)
    return out, out_size, status.astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: ZstdOpts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="zstd",
        compress_batch=compress_batch,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=DEFAULT_OPTS,
        get_decompress_size=get_decompress_size,
    ))
