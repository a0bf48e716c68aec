"""GDeflate codec: DirectStorage-1.1-architecture SIMD tile format, TPU-native.

Analog of ``nvcompBatchedGdeflate*`` (``benchmarks/benchmark_gdeflate_chunked.cu:
32,42,55-58``: opts ``{int algo}`` with 0 high-throughput / 1 high-compression /
2 entropy-only, max 64 KiB chunks; CPU companion library,
``examples/gdeflate_cpu_compression.cu:30,66-72``).

GDeflate proper is RFC-1951 entropy coding whose bitstream is swizzled into 32
interleaved SIMD lanes (Microsoft DirectStorage 1.1 / RTX-IO), with the
distance space extended to the 64 KiB page window.  This module implements
exactly that architecture: 64 KiB tiles, round-robin token->lane assignment,
32 lane bitstreams interleaved on demand at DWORD granularity by the decoder's
refill schedule, RFC-1951 length codes plus a 32-entry distance table (codes
30/31 reach 64 KiB).

**Bit-placement divergence (documented, deliberate).**  Public GDeflate
implementations do exist outside this container — the DirectStorage SDK's
reference codec and historical libdeflate forks — but none is present or
vendorable here (verified: the system ``libdeflate.so`` exports no gdeflate
symbols, no other candidate library ships in the image, and the container
has no network).  The reference proves CPU<->GPU interop against NVIDIA's
closed ``libnvcomp_gdeflate_cpu.so`` (``examples/gdeflate_cpu_compression
.cu:66-72``); with no external implementation reachable, tile framing
details that RFC-1951 does not pin (header fields, the lane-dword count
table, the exact refill-schedule tie-break) follow this project's layout
instead, specified normatively by ``tests/gdeflate_pyref.py`` — an
independently-written serial Python codec that serves as the
cross-implementation conformance oracle in both directions.  The entropy
layer itself (codes, extra bits, LSB-first packing) is standard RFC-1951,
so adapting the framing to an external implementation is localized to the
tile header/interleave layer (:func:`tile_tables` + the pyref's
``compress``), not the codecs.

The encoder is fully vectorized (the refill schedule has a closed form:
``dwords_before_field = min(ceil((bit_prefix + 32)/32), lane_total)``); the
decoder is a ``lax.scan`` over token rounds decoding 32 lanes per step — the
same SIMD shape the format was designed for on GPUs.

**Normative tile framing (version 1).**  One tile per chunk, little-endian;
a reader can be implemented from this description plus RFC 1951 alone
(``tests/gdeflate_pyref.py`` is such an implementation):

  byte 0        u8   btype: 0 stored, 1 fixed-Huffman, 2 dynamic-Huffman
  byte 1        u8   framing version (``TILE_VERSION`` = 1; readers accept
                     <= 1 — version 0 marks round-1..4 frames with identical
                     layout — and reject anything newer with a clean
                     per-chunk error status)
  bytes 2-5     u32  n_tokens (0 for stored tiles)
  bytes 6-9     u32  raw_size (uncompressed byte count)
  bytes 10-11   u16  hdr_bytes: dynamic table description length (btype 2
                     only, else 0)
  stored tiles: raw bytes at offset 12; total = 12 + raw_size.
  Huffman tiles:
  bytes 12-75   32 x u16 per-lane DWORD counts D_j
  bytes 76..    table description (btype 2 only): RFC-1951 13.3.2.3-style
                5+5+4-bit counts, 3-bit CL code lengths in ``CL_ORDER``,
                then CL-coded literal+distance lengths, all LSB-first;
                zero-padded to a multiple of 4 bytes
  then          the shared DWORD stream: lane bitstreams interleaved in
                refill-schedule order — lane j's k-th DWORD appears at
                position ``#{(j', k') : k' < k or (k' == k and j' < j),
                dwords_before_field(j', k') <= dwords_before_field(j, k)}``
                per the closed form above; each lane consumes LSB-first.
  Tokens round-robin over the 32 lanes in input order; literal = one
  RFC-1951 literal code; match = length code (RFC-1951 bases/extras) +
  5-bit distance-slot + extra bits addressing the 64 KiB window (slots
  30/31 extend the RFC-1951 table to 49153..65536).

**Delta to DirectStorage 1.1.**  The entropy layer (codes, extra bits,
LSB-first packing, 64 KiB window) already matches; adapting to the
published DirectStorage tile layout would localize to (a) the 12-byte
header fields above vs DirectStorage's tile header, (b) the lane-DWORD
count table encoding, and (c) the interleave tie-break order — i.e.
:func:`tile_tables`, the assembly block in :func:`compress_chunk`, and the
pyref's ``compress``.  No entropy-layer or kernel change would be needed.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.constants import Status
from tpucomp.formats.deflate import (CL_ORDER, FIXED_LIT_LENS, LEN_BASE,
                                     LEN_EXTRA, MAX_BITS, _assign_codes,
                                     _canonical, _decode_sym, _huff_lengths,
                                     _rev_bits)
from tpucomp.ops import parallel_lz as plz

N_LANES = 32
REFILL_BITS = 32
TILE_VERSION = 1            # tile framing version byte (header byte 1)
HDR = 12                    # fixed tile header
LANE_TAB = 2 * N_LANES      # u16 lane dword counts
PAYLOAD = HDR + LANE_TAB    # = 76: lane table end / desc start
DESC_CAP = 384              # dynamic table description <= 2297 bits = 288 B

# GDeflate distance codes: RFC-1951's 30 plus two 14-extra-bit codes for the
# 64 KiB page window
GDIST_BASE = np.array([1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129,
                       193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097,
                       6145, 8193, 12289, 16385, 24577, 32769, 49153], np.int32)
GDIST_EXTRA = np.array([0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7,
                        8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14],
                       np.int32)
FIXED_GDIST_LENS = np.full(32, 5, np.int32)


@dataclasses.dataclass(frozen=True)
class GdeflateOpts:
    """Analog of ``nvcompBatchedGdeflateOpts_t{ int algo }``.

    algo 0: high-throughput (fixed Huffman tables).
    algo 1: high-compression (per-tile dynamic tables).
    algo 2: entropy-only (dynamic tables, no LZ matches).
    """

    algo: int = 0


DEFAULT_OPTS = GdeflateOpts()


def max_compressed_chunk_size(max_chunk_bytes: int,
                              opts: GdeflateOpts = DEFAULT_OPTS) -> int:
    n = max_chunk_bytes + max_chunk_bytes // 2 + PAYLOAD + DESC_CAP + 1024
    return (n + 1023) & ~1023


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


def _dist_to_code(d):
    idx = jnp.int32(0)
    for i in range(1, 32):
        idx = jnp.where(d >= int(GDIST_BASE[i]), i, idx)
    return idx, d - jnp.asarray(GDIST_BASE)[idx]


# =====================================================================================
# encode
# =====================================================================================

def encode_chunk(data: jax.Array, size: jax.Array, opts: GdeflateOpts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    from tpucomp.formats import lz4 as _lz4
    cap = data.shape[0]
    size = size.astype(jnp.int32)
    R = cap // N_LANES + 1              # max token rounds
    NT = R * N_LANES                    # token slot grid
    WCAP = (49 * R + 31) // 32 + 1      # per-lane dword cap (49 = max token bits)

    # ---- matches + greedy parse (shared machinery) -----------------------------------
    if opts.algo == 2:
        mlen = jnp.zeros((cap,), jnp.int32)
        moff = jnp.ones((cap,), jnp.int32)
    else:
        mlen, moff = _lz4._find_matches(data, size, run_dists=(1, 2, 4, 8),
                                        ext_words=64, n_cands=16, probe_words=12)
        mlen = jnp.minimum(mlen, 258)
    p = jnp.arange(cap, dtype=jnp.int32)
    has_match = mlen >= 4
    nxt = jnp.where(has_match, p + mlen, p + 1)
    nxt = jnp.where(p < size, nxt, cap)
    reach, _ = plz.wyllie_path(nxt, jnp.zeros((cap,), jnp.int32),
                               num_rounds=_ceil_log2(cap) + 1)
    reach = jnp.logical_and(reach, p < size)
    is_lit = jnp.logical_and(reach, jnp.logical_not(has_match))
    is_match = jnp.logical_and(reach, has_match)
    tok_id = jnp.cumsum(reach.astype(jnp.int32)) - 1
    n_tokens = jnp.sum(reach.astype(jnp.int32))

    # ---- symbol codes -----------------------------------------------------------------
    li = jnp.int32(0)
    for i in range(1, 29):
        li = jnp.where(mlen >= int(LEN_BASE[i]), i, li)
    lsym = 257 + li
    lev = mlen - jnp.asarray(LEN_BASE)[li]
    len_extra_n = jnp.asarray(LEN_EXTRA)[li]
    di, dev = _dist_to_code(moff)
    dist_extra_n = jnp.asarray(GDIST_EXTRA)[di]

    # ---- Huffman tables ----------------------------------------------------------------
    fixed_lit_lens = jnp.asarray(FIXED_LIT_LENS)
    fixed_dist_lens = jnp.asarray(FIXED_GDIST_LENS)
    lit_lens_t, dist_lens_t = fixed_lit_lens, fixed_dist_lens
    use_dyn = jnp.bool_(False)
    cl_fields_val = jnp.zeros((3 + 19 + 318,), jnp.int32)
    cl_fields_bits = jnp.zeros((3 + 19 + 318,), jnp.int32)

    if opts.algo in (1, 2):
        dbyte_pre = data.astype(jnp.int32)
        lit_freq = jnp.zeros((288,), jnp.int32)
        lit_freq = lit_freq.at[jnp.where(is_lit, dbyte_pre, 287)].add(
            is_lit.astype(jnp.int32))
        lit_freq = lit_freq.at[jnp.where(is_match, jnp.clip(lsym, 257, 285), 287)].add(
            is_match.astype(jnp.int32))
        lit_freq = lit_freq.at[287].set(0)
        dist_freq = jnp.zeros((32,), jnp.int32).at[
            jnp.where(is_match, di, 31)].add(is_match.astype(jnp.int32))
        dist_freq = dist_freq.at[31].set(
            jnp.sum(jnp.where(jnp.logical_and(is_match, di == 31), 1, 0)))
        no_match = jnp.sum(is_match.astype(jnp.int32)) == 0
        dist_freq = dist_freq.at[0].add(jnp.where(no_match, 1, 0))

        dyn_lit_lens, ok_l = _huff_lengths(lit_freq[:286], MAX_BITS)
        dyn_dist_lens, ok_d = _huff_lengths(dist_freq, MAX_BITS)
        dyn_lit_lens = jnp.pad(dyn_lit_lens, (0, 2))
        all_lens = jnp.concatenate([dyn_lit_lens[:286], dyn_dist_lens])
        cl_freq = jnp.zeros((19,), jnp.int32).at[jnp.clip(all_lens, 0, 15)].add(1)
        cl_lens, ok_c = _huff_lengths(cl_freq, 7)
        cl_codes = _assign_codes(cl_lens, 7)
        use_dyn = jnp.logical_and(ok_l, jnp.logical_and(ok_d, ok_c))

        # pick the smaller encoding (token bits + desc bits vs fixed)
        def table_bits(ll, dl, hdr_bits_total):
            lit_b = jnp.sum(jnp.where(is_lit, ll[jnp.clip(dbyte_pre, 0, 287)], 0))
            m_b = jnp.sum(jnp.where(
                is_match,
                ll[jnp.clip(lsym, 0, 287)] + len_extra_n
                + dl[di] + dist_extra_n, 0))
            return hdr_bits_total + lit_b + m_b

        cl_hdr_bits = 14 + 19 * 3 + jnp.sum(cl_lens[jnp.clip(all_lens, 0, 15)])
        bits_fixed = table_bits(fixed_lit_lens, fixed_dist_lens, 0)
        bits_dyn = table_bits(dyn_lit_lens, dyn_dist_lens, cl_hdr_bits)
        use_dyn = jnp.logical_and(use_dyn, bits_dyn < bits_fixed)
        lit_lens_t = jnp.where(use_dyn, dyn_lit_lens, lit_lens_t)
        dist_lens_t = jnp.where(use_dyn, dyn_dist_lens, dist_lens_t)

        hdr_val = jnp.array([29, 31, 15], jnp.int32)
        hdr_bits = jnp.array([5, 5, 4], jnp.int32)
        clo_val = cl_lens[jnp.asarray(CL_ORDER)]
        clo_bits = jnp.full((19,), 3, jnp.int32)
        sym_val = _rev_bits(cl_codes[jnp.clip(all_lens, 0, 15)],
                            cl_lens[jnp.clip(all_lens, 0, 15)])
        sym_bits = cl_lens[jnp.clip(all_lens, 0, 15)]
        cl_fields_val = jnp.concatenate([hdr_val, clo_val, sym_val])
        cl_fields_bits = jnp.where(use_dyn,
                                   jnp.concatenate([hdr_bits, clo_bits, sym_bits]),
                                   0)

    lit_codes_t = _assign_codes(lit_lens_t, MAX_BITS)
    dist_codes_t = _assign_codes(dist_lens_t, MAX_BITS)

    # ---- per-position field values (4 fields per token, each <= 15 bits) -------------
    dbyte = data.astype(jnp.int32)
    ls_c = jnp.clip(jnp.where(is_match, lsym, dbyte), 0, 287)
    f1_val = _rev_bits(lit_codes_t[ls_c], lit_lens_t[ls_c])
    f1_nb = jnp.where(reach, lit_lens_t[ls_c], 0)
    f2_val = jnp.where(is_match, lev, 0)
    f2_nb = jnp.where(is_match, len_extra_n, 0)
    f3_val = jnp.where(is_match, _rev_bits(dist_codes_t[di], dist_lens_t[di]), 0)
    f3_nb = jnp.where(is_match, dist_lens_t[di], 0)
    f4_val = jnp.where(is_match, dev, 0)
    f4_nb = jnp.where(is_match, dist_extra_n, 0)

    # scatter fields into the round-major token grid [R, N_LANES, 4]
    tgt = jnp.where(reach, tok_id, NT + plz.dump_spread(p, 0))
    gval = jnp.zeros((4, NT + plz.DUMP_SLOTS), jnp.int32)
    gnb = jnp.zeros((4, NT + plz.DUMP_SLOTS), jnp.int32)
    for f, (v, nb) in enumerate([(f1_val, f1_nb), (f2_val, f2_nb),
                                 (f3_val, f3_nb), (f4_val, f4_nb)]):
        gval = gval.at[f, tgt].add(jnp.where(reach, v, 0))
        gnb = gnb.at[f, tgt].add(jnp.where(reach, nb, 0))
    gval = gval[:, :NT].reshape(4, R, N_LANES)
    gnb = gnb[:, :NT].reshape(4, R, N_LANES)
    # event order per lane: (round, field) -> [R*4, N_LANES]
    ev_nb = jnp.transpose(gnb, (1, 0, 2)).reshape(R * 4, N_LANES)
    ev_val = jnp.transpose(gval, (1, 0, 2)).reshape(R * 4, N_LANES)

    # ---- lane bit layout + refill schedule (closed form) ------------------------------
    B = jnp.cumsum(ev_nb, axis=0).astype(jnp.int32) - ev_nb   # exclusive prefix
    btot = jnp.sum(ev_nb, axis=0)                             # [N_LANES]
    D = (btot + 31) >> 5
    W = jnp.sum(D)
    d_ev = jnp.minimum((B + 63) >> 5, D[None, :])             # dwords before event

    # pack each lane's bitstream into its own dword array [N_LANES, WCAP]
    lane_words = jnp.zeros((N_LANES * WCAP + plz.DUMP_SLOTS,), jnp.uint32)
    lane_of_ev = jnp.broadcast_to(jnp.arange(N_LANES, dtype=jnp.int32)[None, :],
                                  (R * 4, N_LANES))
    widx = lane_of_ev * WCAP + (B >> 5)
    sh = (B & 31).astype(jnp.uint64)
    v64 = ev_val.astype(jnp.uint64)
    emit = ev_nb > 0
    epos = jnp.arange(R * 4 * N_LANES, dtype=jnp.int32).reshape(R * 4, N_LANES)
    for w in range(2):
        part = ((v64 << sh) >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        t2 = jnp.where(emit, jnp.clip(widx + w, 0, N_LANES * WCAP - 1),
                       N_LANES * WCAP + (epos & (plz.DUMP_SLOTS - 1)))
        lane_words = lane_words.at[t2.reshape(-1)].add(
            part.astype(jnp.uint32).reshape(-1))
    lane_words = lane_words[:N_LANES * WCAP]

    # ---- interleave: word (j, w) goes at rank of its first-needed event ---------------
    warr = jnp.arange(WCAP, dtype=jnp.int32)
    # first event with d_ev > w, per lane
    e_first = jax.vmap(lambda col: jnp.searchsorted(col, warr, side="right")
                       .astype(jnp.int32), in_axes=1)(d_ev)    # [N_LANES, WCAP]
    jlane = jnp.arange(N_LANES, dtype=jnp.int32)[:, None]
    # consumption order is FIELD-MAJOR: (round, field-slot, lane) — exactly
    # the order a SIMD decoder issues refills in (field f of all 32 lanes,
    # then field f+1); int64 keys (e_first*32*8192 exceeds int32)
    key = ((e_first.astype(jnp.int64) * N_LANES + jlane) * 8192
           + warr[None, :])
    key = jnp.where(warr[None, :] < D[:, None], key, jnp.int64(1) << 52)
    order = jnp.argsort(key.reshape(-1)).astype(jnp.int32)
    stream_words = lane_words[order]                           # decode order

    # ---- dynamic table description bytes ----------------------------------------------
    cl_off = jnp.cumsum(cl_fields_bits) - cl_fields_bits
    hdr_bits_total = jnp.sum(cl_fields_bits)
    hdr_bytes = (hdr_bits_total + 7) >> 3
    hdr_pad = (hdr_bytes + 3) & ~3
    desc_words = jnp.zeros((DESC_CAP // 4 + plz.DUMP_SLOTS,), jnp.uint32)
    dsh = (cl_off & 31).astype(jnp.uint64)
    dv = cl_fields_val.astype(jnp.uint64)
    fpos = jnp.arange(cl_fields_val.shape[0], dtype=jnp.int32)
    demit = cl_fields_bits > 0
    for w in range(2):
        part = ((dv << dsh) >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        t2 = jnp.where(demit, jnp.clip((cl_off >> 5) + w, 0, DESC_CAP // 4 - 1),
                       plz.dump_spread(fpos, DESC_CAP // 4))
        desc_words = desc_words.at[t2].add(part.astype(jnp.uint32))
    desc_words = desc_words[:DESC_CAP // 4]

    # ---- assemble the tile --------------------------------------------------------------
    btype = jnp.where(use_dyn, jnp.int32(2), jnp.int32(1))
    hdr_pad_u = jnp.where(use_dyn, hdr_pad, 0)
    hdr_bytes_u = jnp.where(use_dyn, hdr_bytes, 0)
    dw_start = PAYLOAD + hdr_pad_u
    total = dw_start + 4 * W

    pos = jnp.arange(out_cap, dtype=jnp.int32)
    hdr12 = jnp.stack([
        btype, jnp.int32(TILE_VERSION),
        n_tokens & 0xFF, (n_tokens >> 8) & 0xFF,
        (n_tokens >> 16) & 0xFF, (n_tokens >> 24) & 0xFF,
        size & 0xFF, (size >> 8) & 0xFF, (size >> 16) & 0xFF, (size >> 24) & 0xFF,
        hdr_bytes_u & 0xFF, (hdr_bytes_u >> 8) & 0xFF])
    out = jnp.where(pos < HDR, hdr12[jnp.clip(pos, 0, HDR - 1)], 0)
    lane_j = jnp.clip((pos - HDR) >> 1, 0, N_LANES - 1)
    lane_b = (D[lane_j] >> (8 * ((pos - HDR) & 1))) & 0xFF
    out = jnp.where(jnp.logical_and(pos >= HDR, pos < PAYLOAD), lane_b, out)
    di_ = jnp.clip(pos - PAYLOAD, 0, DESC_CAP - 1)
    desc_b = (desc_words[di_ >> 2] >> ((di_ & 3) * 8)).astype(jnp.int32) & 0xFF
    out = jnp.where(jnp.logical_and(pos >= PAYLOAD,
                                    pos < PAYLOAD + hdr_bytes_u), desc_b, out)
    si = jnp.clip(pos - dw_start, 0, 4 * N_LANES * WCAP - 1)
    st_b = (stream_words[jnp.clip(si >> 2, 0, stream_words.shape[0] - 1)]
            >> ((si & 3) * 8)).astype(jnp.int32) & 0xFF
    out = jnp.where(jnp.logical_and(pos >= dw_start, pos < total), st_b, out)

    # ---- stored-tile fallback ----------------------------------------------------------
    stored_total = HDR + size
    stored_hdr = jnp.stack([
        jnp.int32(0), jnp.int32(TILE_VERSION), jnp.int32(0), jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0), size & 0xFF, (size >> 8) & 0xFF, (size >> 16) & 0xFF,
        (size >> 24) & 0xFF, jnp.int32(0), jnp.int32(0)])
    stored_out = jnp.where(pos < HDR, stored_hdr[jnp.clip(pos, 0, HDR - 1)],
                           data[jnp.clip(pos - HDR, 0, cap - 1)].astype(jnp.int32))
    stored_out = jnp.where(pos < stored_total, stored_out, 0)

    use_huff = jnp.logical_and(total <= out_cap, total < stored_total)
    out = jnp.where(use_huff, out, stored_out).astype(jnp.uint8)
    out_size = jnp.where(use_huff, total, stored_total)
    too_big = jnp.logical_and(jnp.logical_not(use_huff), stored_total > out_cap)
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL,
                       Status.SUCCESS)
    return out, jnp.where(too_big, 0, out_size).astype(jnp.int32), \
        status.astype(jnp.int32)


# =====================================================================================
# decode
# =====================================================================================

def tile_tables(comp: jax.Array, comp_size: jax.Array):
    """Header + canonical decode tables for one tile (vmappable).

    Shared by the XLA decoder below and the vectorized Pallas parse kernel
    (:mod:`tpucomp.ops.pallas.gdeflate_vdecode`): returns
    ``(btype, n_tokens, raw_size, D, (lcount, lfirst, loffset, lsor),
    (dcount, dfirst, doffset, dsor), dw_start, tbl_ok)``.
    """
    cap = comp.shape[0]
    pad_to = max(cap, PAYLOAD + DESC_CAP + 4)
    cp = jnp.pad(comp, (0, pad_to - cap)).astype(jnp.int32)

    btype = cp[0]
    # version gate: tiles from a future framing version must fail decode
    # cleanly rather than misparse (version 0 = round-1..4 frames, accepted)
    ver_ok = cp[1] <= TILE_VERSION
    n_tokens = cp[2] | (cp[3] << 8) | (cp[4] << 16) | (cp[5] << 24)
    raw_size = cp[6] | (cp[7] << 8) | (cp[8] << 16) | (cp[9] << 24)
    hdr_bytes = cp[10] | (cp[11] << 8)
    D = cp[HDR:PAYLOAD:2] | (cp[HDR + 1:PAYLOAD:2] << 8)      # [N_LANES]

    # ---- table description (btype 2) ---------------------------------------------------
    desc = cp[PAYLOAD:PAYLOAD + DESC_CAP]
    desc_bits = ((desc[:, None] >> jnp.arange(8, dtype=jnp.int32)[None, :]) & 1
                 ).reshape(-1)

    def bit_at(bp):
        return desc_bits[jnp.clip(bp, 0, desc_bits.shape[0] - 1)]

    def bits_at(bp, n_static):
        v = jnp.int32(0)
        for k in range(n_static):
            v = v | (bit_at(bp + k) << k)
        return v

    hlit = bits_at(jnp.int32(0), 5) + 257
    hdist = bits_at(jnp.int32(5), 5) + 1
    hclen = bits_at(jnp.int32(10), 4) + 4
    ki = jnp.arange(19, dtype=jnp.int32)
    cl_raw = jax.vmap(lambda i: bits_at(14 + 3 * i, 3))(ki)
    cl_lens = jnp.zeros((19,), jnp.int32).at[jnp.asarray(CL_ORDER)].set(
        jnp.where(ki < hclen, cl_raw, 0))
    cl_count, cl_first, cl_offset, cl_sor, cl_valid = _canonical(cl_lens, 19)

    def rev15_at(bp):
        v = jnp.int32(0)
        for k in range(15):
            v = v | (bit_at(bp + k) << (14 - k))
        return v

    def cl_step(carry, _):
        bp, err = carry
        sym, l, ok = _decode_sym(rev15_at(bp), cl_count, cl_first, cl_offset,
                                 cl_sor)
        err = jnp.logical_or(err, jnp.logical_not(ok))
        err = jnp.logical_or(err, sym > 15)   # run codes are never emitted
        return (bp + l, err), sym

    (_, cl_err), all_lens = jax.lax.scan(
        cl_step, (14 + 3 * 19, jnp.bool_(False)), None, length=318)
    n318 = jnp.arange(318, dtype=jnp.int32)
    all_lens = jnp.where(n318 < hlit + hdist, all_lens, 0)
    dyn_lit_lens = jnp.where(jnp.arange(288) < hlit,
                             jnp.pad(all_lens, (0, 2))[:288], 0)
    # dist lens start at hlit: shift via gather
    dl_idx = jnp.clip(hlit + jnp.arange(32, dtype=jnp.int32), 0, 317)
    dyn_dist_lens = jnp.where(jnp.arange(32) < hdist, all_lens[dl_idx], 0)

    is_dyn = btype == 2
    lit_lens = jnp.where(is_dyn, dyn_lit_lens, jnp.asarray(FIXED_LIT_LENS))
    dist_lens = jnp.where(is_dyn, dyn_dist_lens, jnp.asarray(FIXED_GDIST_LENS))
    lcount, lfirst, loffset, lsor, lvalid = _canonical(lit_lens, 288)
    dcount, dfirst, doffset, dsor, dvalid = _canonical(dist_lens, 32)

    hdr_pad = jnp.where(is_dyn, (hdr_bytes + 3) & ~3, 0)
    dw_start = PAYLOAD + hdr_pad

    tbl_ok = jnp.logical_and(jnp.where(is_dyn, cl_valid, True),
                             jnp.logical_and(lvalid, dvalid))
    tbl_ok = jnp.logical_and(
        tbl_ok, jnp.where(is_dyn, jnp.logical_not(cl_err), True))
    tbl_ok = jnp.logical_and(tbl_ok, ver_ok)
    return (btype, n_tokens, raw_size, D,
            (lcount, lfirst, loffset, lsor),
            (dcount, dfirst, doffset, dsor), dw_start, tbl_ok)


def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    cap = comp.shape[0]
    pad_to = max(cap, PAYLOAD + DESC_CAP + 4)
    cp = jnp.pad(comp, (0, pad_to - cap)).astype(jnp.int32)
    gb = lambda o: cp[jnp.clip(o, 0, pad_to - 1)]

    (btype, n_tokens, raw_size, D,
     (lcount, lfirst, loffset, lsor),
     (dcount, dfirst, doffset, dsor), dw_start, tbl_ok) = tile_tables(
        comp, comp_size)

    def read_dw(k):
        o = dw_start + 4 * k
        return (gb(o) | (gb(o + 1) << 8) | (gb(o + 2) << 16)
                | (gb(o + 3) << 24)).astype(jnp.int64) & jnp.int64(0xFFFFFFFF)

    # ---- token rounds: 32 lanes decode one token each per step -------------------------
    R = out_cap // N_LANES + 1
    kl = jnp.arange(N_LANES, dtype=jnp.int32)
    len_base_t = jnp.asarray(LEN_BASE)
    len_extra_t = jnp.asarray(LEN_EXTRA)
    gdist_base_t = jnp.asarray(GDIST_BASE)
    gdist_extra_t = jnp.asarray(GDIST_EXTRA)

    def step(carry, r):
        buf, bits, taken, gptr, err = carry
        act = r * N_LANES + kl < n_tokens

        def refill(buf, bits, taken, gptr):
            need = jnp.logical_and(act, jnp.logical_and(bits < REFILL_BITS,
                                                        taken < D))
            rank = (jnp.cumsum(need.astype(jnp.int32)) - need).astype(jnp.int32)
            w = jax.vmap(read_dw)(gptr + rank)
            buf = jnp.where(need, buf | (w << bits.astype(jnp.int64)), buf)
            bits = bits + jnp.where(need, 32, 0)
            taken = taken + need.astype(jnp.int32)
            gptr = (gptr + jnp.sum(need, dtype=jnp.int32)).astype(jnp.int32)
            return buf, bits, taken, gptr

        def consume(buf, bits, n):
            return buf >> n.astype(jnp.int64), bits - n

        # field 1: lit/len symbol
        buf, bits, taken, gptr = refill(buf, bits, taken, gptr)
        rev15 = _rev_bits((buf & jnp.int64(0x7FFF)).astype(jnp.int32), 15)
        sym, l1, ok1 = _decode_sym(rev15, lcount, lfirst, loffset, lsor)
        err = jnp.logical_or(err, jnp.any(jnp.logical_and(act,
                                                          jnp.logical_not(ok1))))
        err = jnp.logical_or(err, jnp.any(jnp.logical_and(act, sym == 256)))
        err = jnp.logical_or(err, jnp.any(jnp.logical_and(act, sym > 285)))
        buf, bits = consume(buf, bits, jnp.where(act, l1, 0))
        is_m = jnp.logical_and(act, sym >= 257)
        lidx = jnp.clip(sym - 257, 0, 28)
        # field 2: length extra
        buf, bits, taken, gptr = refill(buf, bits, taken, gptr)
        n2 = jnp.where(is_m, len_extra_t[lidx], 0)
        ex2 = (buf & ((jnp.int64(1) << n2.astype(jnp.int64)) - 1)).astype(jnp.int32)
        buf, bits = consume(buf, bits, n2)
        mlen = jnp.where(is_m, len_base_t[lidx] + ex2, 0)
        # field 3: distance symbol
        buf, bits, taken, gptr = refill(buf, bits, taken, gptr)
        rev15d = _rev_bits((buf & jnp.int64(0x7FFF)).astype(jnp.int32), 15)
        dsym, l3, ok3 = _decode_sym(rev15d, dcount, dfirst, doffset, dsor)
        err = jnp.logical_or(err, jnp.any(jnp.logical_and(is_m,
                                                          jnp.logical_not(ok3))))
        buf, bits = consume(buf, bits, jnp.where(is_m, l3, 0))
        dsym = jnp.clip(dsym, 0, 31)
        # field 4: distance extra
        buf, bits, taken, gptr = refill(buf, bits, taken, gptr)
        n4 = jnp.where(is_m, gdist_extra_t[dsym], 0)
        ex4 = (buf & ((jnp.int64(1) << n4.astype(jnp.int64)) - 1)).astype(jnp.int32)
        buf, bits = consume(buf, bits, n4)
        dist = jnp.where(is_m, gdist_base_t[dsym] + ex4, 0)

        litb = jnp.where(jnp.logical_and(act, jnp.logical_not(is_m)),
                         jnp.clip(sym, 0, 255), 0)
        return (buf, bits, taken, gptr, err), (is_m, litb, mlen, dist)

    init = (jnp.zeros((N_LANES,), jnp.int64), jnp.zeros((N_LANES,), jnp.int32),
            jnp.zeros((N_LANES,), jnp.int32), jnp.int32(0), jnp.bool_(False))
    (_, _, taken_f, gptr_f, err), (is_m_t, litb_t, mlen_t, dist_t) = jax.lax.scan(
        step, init, jnp.arange(R, dtype=jnp.int32))

    # ---- materialize output --------------------------------------------------------
    is_m_f = is_m_t.reshape(-1)
    litb_f = litb_t.reshape(-1)
    mlen_f = mlen_t.reshape(-1)
    dist_f = dist_t.reshape(-1)
    ti = jnp.arange(R * N_LANES, dtype=jnp.int32)
    act_f = ti < n_tokens
    elen = jnp.where(act_f, jnp.where(is_m_f, mlen_f, 1), 0)
    starts = (jnp.cumsum(elen) - elen).astype(jnp.int32)
    total_out = jnp.sum(elen)

    opos = jnp.arange(out_cap, dtype=jnp.int32)
    k = jnp.clip(jnp.searchsorted(
        jnp.where(act_f, starts, jnp.int32(2**30)), opos,
        side="right").astype(jnp.int32) - 1, 0, R * N_LANES - 1)
    lit_k = jnp.logical_not(is_m_f[k])
    val = jnp.where(lit_k, litb_f[k], 0)
    known = jnp.logical_or(lit_k, opos >= total_out)
    src = opos - dist_f[k]
    ptr = jnp.where(known, opos, jnp.clip(src, 0, out_cap - 1))
    out = plz.resolve_copy_chain(ptr, val, known,
                                 max_rounds=_ceil_log2(out_cap) + 1)

    # match back-references must stay inside already-produced output
    err = jnp.logical_or(err, jnp.any(jnp.logical_and(
        jnp.logical_and(act_f, is_m_f),
        jnp.logical_or(dist_f < 1, dist_f > starts))))

    ok = jnp.logical_and(btype != 0, btype <= 2)
    ok = jnp.logical_and(ok, jnp.logical_not(err))
    ok = jnp.logical_and(ok, total_out == raw_size)
    ok = jnp.logical_and(ok, raw_size <= out_cap)
    ok = jnp.logical_and(ok, n_tokens <= out_cap)
    ok = jnp.logical_and(ok, tbl_ok)
    # every advertised lane word must have been consumed, and all of them
    # must lie inside the chunk
    ok = jnp.logical_and(ok, jnp.all(taken_f == D))
    ok = jnp.logical_and(ok, comp_size >= dw_start + 4 * gptr_f)

    # stored tile
    is_stored = btype == 0
    stored_ok = jnp.logical_and(is_stored, raw_size <= out_cap)
    stored_ok = jnp.logical_and(stored_ok, comp_size >= HDR + raw_size)
    stored_out = gb(HDR + opos)

    too_big = jnp.logical_and(jnp.logical_not(is_stored),
                              jnp.logical_and(jnp.logical_not(err),
                                              raw_size > out_cap))
    good = jnp.where(is_stored, stored_ok, ok)
    osz = jnp.where(good, jnp.clip(raw_size, 0, out_cap), 0).astype(jnp.int32)
    outv = jnp.where(is_stored, stored_out, out)
    outv = jnp.where(opos < osz, outv, 0).astype(jnp.uint8)
    status = jnp.where(good, jnp.int32(Status.SUCCESS),
                       jnp.where(too_big,
                                 jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                                 jnp.int32(Status.ERROR_CANNOT_DECOMPRESS)))
    return outv, osz, status.astype(jnp.int32)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    cap = comp.shape[0]
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)
    size = gb(6) | (gb(7) << 8) | (gb(8) << 16) | (gb(9) << 24)
    ok = jnp.logical_and(comp_size >= HDR, gb(0) <= 2)
    return jnp.where(ok, size, 0).astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: GdeflateOpts,
                   out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="gdeflate",
        compress_batch=compress_batch,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=DEFAULT_OPTS,
        get_decompress_size=get_decompress_size,
    ))
