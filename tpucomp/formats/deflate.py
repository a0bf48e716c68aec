"""Deflate (RFC-1951) codec: vectorized decode + fixed-Huffman encode.

Analog of ``nvcompBatchedDeflate*`` (raw deflate, zlib ``deflateInit2(..,-15,..)``
interop proven in ``examples/deflate_cpu_compression.cu:60-101`` and
``deflate_cpu_decompression.cu:145-173``; opts struct with an ``algo`` ladder,
``benchmarks/benchmark_deflate_chunked.cu:31,42,55-58``; max 64 KB compression
chunks, decompression may exceed 64 KB output, ``CHANGELOG.md:71-75``).

Decode design (the serial part is *parse-only*, the heavy part is parallel):
  1. A per-chunk ``while_loop`` walks blocks and symbols, writing a compact
     token stream (literal / stored-run / match) — a few hundred scalar ops per
     symbol, batched across all chunks by ``vmap`` (every chunk advances in
     lockstep, so a batch of chunks fills the VPU lanes).
     Canonical Huffman tables are decoded with the classic per-length range
     compare (as zlib's decode loop), rebuilt only at block boundaries.
  2. Output materialization is fully parallel: token output offsets by cumsum,
     literal scatter, stored runs gathered straight from the byte-aligned
     compressed stream, LZ77 matches via the shared log-doubling copy resolve.

Encode emits fixed-Huffman (BTYPE=01) blocks from the shared LZ match finder —
valid RFC-1951 that zlib/libdeflate inflate bit-exactly (dynamic-Huffman encode
is a planned ratio upgrade).  Streams with pathologically many blocks
(> ~1 block per 32 output bytes) exceed the static token budget and are
rejected with ``ERROR_CANNOT_DECOMPRESS`` rather than decoded unboundedly.
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

# --- RFC-1951 constant tables --------------------------------------------------------

LEN_BASE = np.array([3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35,
                     43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258], np.int32)
LEN_EXTRA = np.array([0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
                      4, 4, 4, 4, 5, 5, 5, 5, 0], np.int32)
DIST_BASE = np.array([1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
                      257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
                      8193, 12289, 16385, 24577], np.int32)
DIST_EXTRA = np.array([0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
                       9, 9, 10, 10, 11, 11, 12, 12, 13, 13], np.int32)
CL_ORDER = np.array([16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14,
                     1, 15], np.int32)

FIXED_LIT_LENS = np.concatenate([np.full(144, 8), np.full(112, 9),
                                 np.full(24, 7), np.full(8, 8)]).astype(np.int32)
FIXED_DIST_LENS = np.full(32, 5, np.int32)

MAX_BITS = 15
NSYM = 320  # 288 lit/len + 32 dist length slots

# token kinds
TOK_LIT, TOK_RUN, TOK_MATCH = 1, 2, 3


@dataclasses.dataclass(frozen=True)
class DeflateOpts:
    """Analog of ``nvcompBatchedDeflateOpts_t{ int algo }`` (0 fastest)."""

    algo: int = 0


DEFAULT_OPTS = DeflateOpts()


def max_compressed_chunk_size(max_chunk_bytes: int,
                              opts: DeflateOpts = DEFAULT_OPTS) -> int:
    # fixed-Huffman worst case ~9 bits/byte literal + block overhead
    n = max_chunk_bytes + max_chunk_bytes // 2 + 64
    return (n + 1023) & ~1023


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


# =====================================================================================
# canonical Huffman helpers (traced, per chunk)
# =====================================================================================

def _canonical(lens: jax.Array, nsym: int):
    """Build (count[16], first_code[16], offset[16], sym_of_rank[nsym], valid).

    ``lens`` int32[nsym], 0 = unused symbol.  MSB-first canonical codes per
    RFC-1951 3.2.2.
    """
    count = jnp.zeros((MAX_BITS + 1,), jnp.int32).at[
        jnp.where(lens > 0, jnp.clip(lens, 0, MAX_BITS), 0)].add(
        (lens > 0).astype(jnp.int32))

    first = jnp.zeros((MAX_BITS + 1,), jnp.int32)
    code = jnp.int32(0)
    kraft = jnp.int32(0)
    for l in range(1, MAX_BITS + 1):
        code = (code + count[l - 1]) << 1
        first = first.at[l].set(code)
        kraft = kraft + (count[l] << (MAX_BITS - l))
    offset = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(count)[:-1].astype(jnp.int32)])
    # rank within each length = #same-length symbols before this one
    sym_ids = jnp.arange(nsym, dtype=jnp.int32)
    rank_in_len = jnp.zeros((nsym,), jnp.int32)
    for l in range(1, MAX_BITS + 1):
        is_l = (lens == l).astype(jnp.int32)
        rank_in_len = rank_in_len + jnp.where(
            lens == l, jnp.cumsum(is_l) - 1, 0)
    rank = offset[jnp.clip(lens, 0, MAX_BITS)] + rank_in_len
    tgt = jnp.where(lens > 0, jnp.clip(rank, 0, nsym - 1), nsym)
    sym_of_rank = jnp.zeros((nsym + 1,), jnp.int32).at[tgt].set(sym_ids)[:nsym]
    valid = kraft <= (1 << MAX_BITS)
    return count, first, offset, sym_of_rank, valid


def _decode_sym(rev15, count, first, offset, sym_of_rank):
    """Match the 15-bit MSB-first prefix against the canonical ranges.

    Returns (symbol, code_len, ok); first (shortest) matching length wins,
    exactly like zlib's inflate loop.
    """
    sym = jnp.int32(0)
    length = jnp.int32(0)
    found = jnp.bool_(False)
    for l in range(1, MAX_BITS + 1):
        code_l = rev15 >> (MAX_BITS - l)
        in_range = jnp.logical_and(code_l >= first[l],
                                   code_l - first[l] < count[l])
        hit = jnp.logical_and(jnp.logical_not(found), in_range)
        idx = jnp.clip(offset[l] + code_l - first[l], 0,
                       sym_of_rank.shape[0] - 1)
        sym = jnp.where(hit, sym_of_rank[idx], sym)
        length = jnp.where(hit, l, length)
        found = jnp.logical_or(found, in_range)
    return sym, length, found


# =====================================================================================
# decode
# =====================================================================================

def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int, start_byte=0) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one raw-deflate stream -> (out uint8[out_cap], out_size, status).

    ``start_byte`` (traced ok) lets wrappers (gzip/zlib) skip their header while
    keeping stored-block offsets absolute; ``comp_size`` is the end of the
    deflate data (i.e. excludes any trailer).
    """
    cap = comp.shape[0]
    comp_size = comp_size.astype(jnp.int32)
    start_byte = jnp.asarray(start_byte, jnp.int32)
    nbits_total = comp_size * 8
    cap_tok = out_cap + out_cap // 32 + 16
    max_blocks = out_cap // 32 + 16

    len_base = jnp.asarray(LEN_BASE)
    len_extra = jnp.asarray(LEN_EXTRA)
    dist_base = jnp.asarray(DIST_BASE)
    dist_extra = jnp.asarray(DIST_EXTRA)
    cl_order = jnp.asarray(CL_ORDER)
    fixed_lit = jnp.asarray(FIXED_LIT_LENS)
    fixed_dist = jnp.asarray(FIXED_DIST_LENS)

    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)

    def peek(bitpos):
        # >= 25 valid bits from any bit offset (enough for one 15-bit code or a
        # 16-bit field; larger reads are split by the callers)
        byte = bitpos >> 3
        sh = (bitpos & 7).astype(jnp.uint32)
        word = (gb(byte).astype(jnp.uint32)
                | (gb(byte + 1).astype(jnp.uint32) << 8)
                | (gb(byte + 2).astype(jnp.uint32) << 16)
                | (gb(byte + 3).astype(jnp.uint32) << 24))
        return word >> sh

    def peek15rev(bitpos):
        # 15 next bits, bit-reversed so the first-read bit is the code's MSB
        v = peek(bitpos) & jnp.uint32(0x7FFF)
        r = jnp.uint32(0)
        for k in range(15):
            r = r | (((v >> k) & 1) << (14 - k))
        return r.astype(jnp.int32)

    def read(bitpos, n):
        """(value, new_bitpos); n may be traced (<=16)."""
        mask = (jnp.uint32(1) << jnp.uint32(n)) - 1
        v = (peek(bitpos) & jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF), mask))
        return v.astype(jnp.int32), bitpos + n

    # outer carry
    # token_buf[k] = (kind, a, b)
    def fresh_state():
        return dict(
            bitpos=start_byte * 8,
            done=comp_size < 0,     # varying False
            err=comp_size < 0,
            n_tok=jnp.int32(0) + 0 * comp_size,
            out_size=jnp.int32(0) + 0 * comp_size,
            n_blocks=jnp.int32(0) + 0 * comp_size,
            toks=jnp.zeros((cap_tok, 3), jnp.int32) + 0 * comp_size,
        )

    def block_cond(st):
        return jnp.logical_not(jnp.logical_or(st["done"], st["err"]))

    def block_body(st):
        bitpos = st["bitpos"]
        err = bitpos + 3 > nbits_total
        hdr, bitpos = read(bitpos, 3)
        bfinal = hdr & 1
        btype = hdr >> 1
        err = jnp.logical_or(err, btype == 3)

        # ---------- stored block -----------------------------------------------------
        def stored(bitpos, st, err):
            bp = (bitpos + 7) & ~7
            ln, bp = read(bp, 16)
            nln, bp = read(bp, 16)
            err2 = jnp.logical_or(err, (ln ^ 0xFFFF) != nln)
            src = bp >> 3
            err2 = jnp.logical_or(err2, src + ln > comp_size)
            err2 = jnp.logical_or(err2, st["out_size"] + ln > out_cap)
            tok = jnp.array([TOK_RUN, 0, 0], jnp.int32)
            tok = tok.at[1].set(src).at[2].set(ln)
            toks = st["toks"].at[jnp.clip(st["n_tok"], 0, cap_tok - 1)].set(tok)
            return (bp + ln * 8, toks,
                    st["n_tok"] + jnp.where(ln > 0, 1, 0),
                    st["out_size"] + ln, err2)

        # ---------- huffman block: get code lengths ----------------------------------
        def dynamic_lens(bitpos, err):
            hlit, bitpos = read(bitpos, 5)
            hdist, bitpos = read(bitpos, 5)
            hclen, bitpos = read(bitpos, 4)
            n_lit = hlit + 257
            n_dist = hdist + 1
            n_cl = hclen + 4
            err = jnp.logical_or(err, n_lit > 286)
            err = jnp.logical_or(err, n_dist > 30)
            cl_lens = jnp.zeros((19,), jnp.int32)

            def cl_read(i, carry):
                cl_lens, bp = carry
                v, bp2 = read(bp, 3)
                use = i < n_cl
                cl_lens = jnp.where(use, cl_lens.at[cl_order[i]].set(v), cl_lens)
                return cl_lens, jnp.where(use, bp2, bp)

            cl_lens, bitpos = jax.lax.fori_loop(0, 19, cl_read, (cl_lens, bitpos))
            ccount, cfirst, coffset, csym, cvalid = _canonical(cl_lens, 19)
            err = jnp.logical_or(err, jnp.logical_not(cvalid))

            # decode n_lit + n_dist code lengths with 16/17/18 repeats
            def cl_cond(c):
                i, bp, lens, prev, e = c
                return jnp.logical_and(i < n_lit + n_dist,
                                       jnp.logical_not(e))

            def cl_body(c):
                i, bp, lens, prev, e = c
                sym, clen, ok = _decode_sym(peek15rev(bp), ccount, cfirst,
                                            coffset, csym)
                e = jnp.logical_or(e, jnp.logical_not(ok))
                bp = bp + clen
                # literal length 0..15
                is_lit = sym <= 15
                rep16 = sym == 16
                rep17 = sym == 17
                rep18 = sym == 18
                eb = jnp.where(rep16, 2, jnp.where(rep17, 3,
                     jnp.where(rep18, 7, 0)))
                ev, bp = read(bp, eb)
                n_rep = jnp.where(is_lit, 1,
                        jnp.where(rep16, 3 + ev,
                        jnp.where(rep17, 3 + ev, 11 + ev)))
                val = jnp.where(is_lit, sym, jnp.where(rep16, prev, 0))
                e = jnp.logical_or(e, jnp.logical_and(rep16, i == 0))
                e = jnp.logical_or(e, i + n_rep > n_lit + n_dist)
                e = jnp.logical_or(e, bp > nbits_total)
                ks = jnp.arange(NSYM, dtype=jnp.int32)
                write = jnp.logical_and(ks >= i, ks < i + n_rep)
                lens = jnp.where(write, val, lens)
                prev = jnp.where(is_lit, sym, prev)
                return i + n_rep, bp, lens, prev, e

            lens0 = jnp.zeros((NSYM,), jnp.int32) + 0 * bitpos
            i0 = jnp.int32(0) + 0 * bitpos
            _, bitpos, lens, _, err = jax.lax.while_loop(
                cl_cond, cl_body, (i0, bitpos, lens0, i0, err))
            lit_lens = jnp.where(jnp.arange(NSYM) < n_lit, lens, 0)[:288]
            dl = jnp.where(
                jnp.logical_and(jnp.arange(NSYM) >= n_lit,
                                jnp.arange(NSYM) < n_lit + n_dist), lens, 0)
            # shift dist lens down to [0,32)
            ks32 = jnp.arange(32, dtype=jnp.int32)
            dist_lens = dl[jnp.clip(n_lit + ks32, 0, NSYM - 1)]
            dist_lens = jnp.where(ks32 < n_dist, dist_lens, 0)
            return bitpos, lit_lens, dist_lens, err

        def huffman(bitpos, st, err, btype):
            dyn = btype == 2
            bp_d, lit_d, dist_d, err_d = dynamic_lens(bitpos, err)
            bitpos = jnp.where(dyn, bp_d, bitpos)
            err = jnp.where(dyn, err_d, err)
            lit_lens = jnp.where(dyn, lit_d, fixed_lit)
            dist_lens = jnp.where(dyn, dist_d, fixed_dist)

            lcount, lfirst, loffset, lsym, lvalid = _canonical(lit_lens, 288)
            dcount, dfirst, doffset, dsym_t, dvalid = _canonical(dist_lens, 32)
            err = jnp.logical_or(err, jnp.logical_not(lvalid))
            err = jnp.logical_or(err, jnp.logical_not(dvalid))

            def sym_cond(c):
                bp, n_tok, out_size, toks, eob, e = c
                run = jnp.logical_not(jnp.logical_or(eob, e))
                run = jnp.logical_and(run, n_tok < cap_tok)
                run = jnp.logical_and(run, bp <= nbits_total)
                return run

            def sym_body(c):
                bp, n_tok, out_size, toks, eob, e = c
                sym, clen, ok = _decode_sym(peek15rev(bp), lcount, lfirst,
                                            loffset, lsym)
                e = jnp.logical_or(e, jnp.logical_not(ok))
                bp = bp + clen
                is_lit = sym < 256
                is_eob = sym == 256
                is_len = sym > 256

                li = jnp.clip(sym - 257, 0, 28)
                e = jnp.logical_or(e, jnp.logical_and(is_len, sym > 285))
                ev, bp_l = read(bp, len_extra[li])
                mlen = len_base[li] + ev
                dsym, dlen, dok = _decode_sym(peek15rev(bp_l), dcount, dfirst,
                                              doffset, dsym_t)
                bp_l = bp_l + dlen
                di = jnp.clip(dsym, 0, 29)
                dv, bp_l = read(bp_l, dist_extra[di])
                mdist = dist_base[di] + dv
                e = jnp.logical_or(e, jnp.logical_and(
                    is_len, jnp.logical_or(jnp.logical_not(dok), dsym > 29)))
                e = jnp.logical_or(e, jnp.logical_and(is_len, mdist > out_size))

                bp = jnp.where(is_len, bp_l, bp)
                emit = jnp.logical_or(is_lit, is_len)
                size = jnp.where(is_lit, 1, jnp.where(is_len, mlen, 0))
                e = jnp.logical_or(e, out_size + size > out_cap)
                tok = jnp.stack([jnp.where(is_lit, TOK_LIT, TOK_MATCH),
                                 jnp.where(is_lit, sym, mlen),
                                 jnp.where(is_lit, 0, mdist)])
                toks = jnp.where(emit,
                                 toks.at[jnp.clip(n_tok, 0, cap_tok - 1)].set(tok),
                                 toks)
                n_tok = n_tok + emit.astype(jnp.int32)
                out_size = out_size + jnp.where(e, 0, size)
                e = jnp.logical_or(e, bp > nbits_total)
                return bp, n_tok, out_size, toks, jnp.logical_or(eob, is_eob), e

            eob0 = jnp.logical_and(err, False)
            bp, n_tok, out_size, toks, eob, err = jax.lax.while_loop(
                sym_cond, sym_body,
                (bitpos, st["n_tok"], st["out_size"], st["toks"], eob0, err))
            err = jnp.logical_or(err, jnp.logical_not(eob))
            return bp, toks, n_tok, out_size, err

        is_stored = btype == 0
        s_bp, s_toks, s_ntok, s_osz, s_err = stored(bitpos, st, err)
        h_bp, h_toks, h_ntok, h_osz, h_err = huffman(bitpos, st, err, btype)

        st = dict(st)
        st["bitpos"] = jnp.where(is_stored, s_bp, h_bp)
        st["toks"] = jnp.where(is_stored, s_toks, h_toks)
        st["n_tok"] = jnp.where(is_stored, s_ntok, h_ntok)
        st["out_size"] = jnp.where(is_stored, s_osz, h_osz)
        st["err"] = jnp.where(is_stored, s_err, h_err)
        st["n_blocks"] = st["n_blocks"] + 1
        st["err"] = jnp.logical_or(st["err"], st["n_blocks"] > max_blocks)
        st["done"] = jnp.logical_or(st["done"], bfinal == 1)
        return st

    st = fresh_state()
    # empty input is an error (no final block)
    st = jax.lax.while_loop(block_cond, block_body, st)
    err = jnp.logical_or(st["err"], comp_size <= start_byte)

    # --------------- parallel emit ---------------------------------------------------
    toks = st["toks"]
    n_tok = st["n_tok"]
    total_out = st["out_size"]
    kind, a, b = toks[:, 0], toks[:, 1], toks[:, 2]
    ti = jnp.arange(cap_tok, dtype=jnp.int32)
    tvalid = ti < n_tok
    size = jnp.where(tvalid,
                     jnp.where(kind == TOK_LIT, 1,
                     jnp.where(kind == TOK_RUN, b, a)), 0)
    ofs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(size)[:-1].astype(jnp.int32)])

    opos = jnp.arange(out_cap, dtype=jnp.int32)
    key = jnp.where(tvalid, ofs, jnp.int32(2**30))
    k = jnp.clip(jnp.searchsorted(key, opos, side="right").astype(jnp.int32) - 1,
                 0, cap_tok - 1)
    rel = opos - ofs[k]
    kk, ak, bk = kind[k], a[k], b[k]

    lit_val = ak
    run_val = gb(ak + rel)
    is_lit = kk == TOK_LIT
    is_run = kk == TOK_RUN
    val = jnp.where(is_lit, lit_val, jnp.where(is_run, run_val, 0))
    known = jnp.logical_or(is_lit, is_run)
    known = jnp.logical_or(known, opos >= total_out)
    ptr = jnp.where(known, opos, jnp.clip(opos - bk, 0, out_cap - 1))
    resolved = plz.resolve_copy_chain(ptr, val, known,
                                      max_rounds=_ceil_log2(out_cap) + 1)

    ok = jnp.logical_not(err)
    out_size = jnp.where(ok, total_out, 0).astype(jnp.int32)
    out = jnp.where(opos < out_size, resolved, 0).astype(jnp.uint8)
    status = jnp.where(ok, Status.SUCCESS, Status.ERROR_CANNOT_DECOMPRESS)
    return out, out_size, status.astype(jnp.int32)


# =====================================================================================
# encode (fixed-Huffman blocks)
# =====================================================================================

def _fixed_lit_code(sym):
    """(code, nbits) for litlen symbol under the fixed table, MSB-first value."""
    c8 = 0x30 + sym                   # 0-143   -> 8 bits 00110000..
    c9 = 0x190 + (sym - 144)          # 144-255 -> 9 bits
    c7 = sym - 256                    # 256-279 -> 7 bits 0000000..
    c8b = 0xC0 + (sym - 280)          # 280-287 -> 8 bits
    code = jnp.where(sym < 144, c8,
           jnp.where(sym < 256, c9,
           jnp.where(sym < 280, c7, c8b)))
    nbits = jnp.where(sym < 144, 8, jnp.where(sym < 256, 9,
            jnp.where(sym < 280, 7, 8)))
    return code, nbits


def _rev_bits(v, n):
    """Bit-reverse the low ``n`` bits of v (Huffman codes are written MSB-first
    into the LSB-first stream)."""
    r = jnp.zeros_like(v)
    for k in range(MAX_BITS + 1):
        r = jnp.where(k < n, (r << 1) | ((v >> k) & 1), r)
    return r


def _len_to_code(mlen):
    """length (3..258) -> (len symbol-257 index, extra value)."""
    idx = jnp.int32(0)
    for i in range(1, 29):
        idx = jnp.where(mlen >= int(LEN_BASE[i]), i, idx)
    return idx, mlen - jnp.asarray(LEN_BASE)[idx]


def _dist_to_code(d):
    idx = jnp.int32(0)
    for i in range(1, 30):
        idx = jnp.where(d >= int(DIST_BASE[i]), i, idx)
    return idx, d - jnp.asarray(DIST_BASE)[idx]


def encode_chunk(data: jax.Array, size: jax.Array, opts: DeflateOpts,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode one chunk as a single fixed-Huffman deflate block."""
    from tpucomp.formats import lz4 as _lz4
    cap = data.shape[0]
    size = size.astype(jnp.int32)

    if opts.algo == 2:
        # entropy-only mode (the GDeflate algo-2 ladder): no LZ stage
        mlen = jnp.zeros((cap,), jnp.int32)
        moff = jnp.ones((cap,), jnp.int32)
    else:
        mlen, moff = _lz4._find_matches(data, size, run_dists=(1, 2, 4, 8))
        mlen = jnp.minimum(mlen, 258)        # deflate max match length
        mlen = jnp.where(moff > 32768, 0, mlen)  # deflate max distance
    p = jnp.arange(cap, dtype=jnp.int32)
    has_match = mlen >= 4          # use >=4 (deflate allows 3; quality tradeoff)
    nxt = jnp.where(has_match, p + mlen, p + 1)
    nxt = jnp.where(p < size, nxt, cap)
    reach, _ = plz.wyllie_path(nxt, jnp.zeros((cap,), jnp.int32),
                               num_rounds=_ceil_log2(cap) + 1)
    reach = jnp.logical_and(reach, p < size)

    # per reached position: emitted element = literal or match
    is_lit = jnp.logical_and(reach, jnp.logical_not(has_match))
    is_match = jnp.logical_and(reach, has_match)

    lit_code, lit_n = _fixed_lit_code(data.astype(jnp.int32))
    lcode = _rev_bits(lit_code, lit_n)

    li, lev = _len_to_code(mlen)
    lsym = 257 + li
    lsym_code, lsym_n = _fixed_lit_code(lsym)
    di, dev = _dist_to_code(moff)
    # fixed dist codes: 5 bits, code == dsym
    len_extra_n = jnp.asarray(LEN_EXTRA)[li]
    dist_extra_n = jnp.asarray(DIST_EXTRA)[di]

    # match element bit layout (LSB-first stream order):
    #   rev(len code) | len extra | rev(dist code, 5) | dist extra
    m_val = _rev_bits(lsym_code, lsym_n).astype(jnp.int64)
    m_bits = lsym_n
    m_val = m_val | (lev.astype(jnp.int64) << m_bits)
    m_bits = m_bits + len_extra_n
    m_val = m_val | (_rev_bits(di, 5).astype(jnp.int64) << m_bits)
    m_bits = m_bits + 5
    m_val = m_val | (dev.astype(jnp.int64) << m_bits)
    m_bits = m_bits + dist_extra_n

    el_val = jnp.where(is_lit, lcode.astype(jnp.int64),
             jnp.where(is_match, m_val, 0))
    el_bits = jnp.where(is_lit, lit_n, jnp.where(is_match, m_bits, 0))

    # bit offsets: 3-bit block header first
    bit_off = 3 + jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(el_bits)[:-1].astype(jnp.int32)])
    total_el_bits = jnp.sum(el_bits)
    # EOB symbol (256) = 7 bits of 0
    eob_off = 3 + total_el_bits
    total_bits = eob_off + 7
    total_bytes = (total_bits + 7) // 8

    # scatter element bits into u32 words (values straddle <=2 words: max 48 bits
    # -> up to 3 words; use 3 scatter contributions)
    n_words = out_cap // 4 + 2
    word_idx = bit_off >> 5
    sh = (bit_off & 31).astype(jnp.uint64)
    v = el_val.astype(jnp.uint64)
    emit_mask = el_bits > 0
    contrib = []
    for w in range(3):
        part = ((v << sh) >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        tgt = jnp.where(emit_mask, jnp.clip(word_idx + w, 0, n_words - 1), n_words)
        contrib.append((tgt, part.astype(jnp.uint32)))
    # block header: bfinal=1, btype=01 -> bits (LSB first): 1,1,0 = value 0b011
    hdr_tgt = jnp.zeros((1,), jnp.int32)
    words = jnp.zeros((n_words + 1,), jnp.uint32)
    words = words.at[0].add(jnp.uint32(0b011))
    for tgt, part in contrib:
        words = words.at[tgt].add(part)
    words = words[:n_words]
    # EOB: 7 zero bits -> nothing to OR in

    wbytes = jnp.stack([words & 0xFF, (words >> 8) & 0xFF,
                        (words >> 16) & 0xFF, (words >> 24) & 0xFF],
                       axis=1).reshape(-1).astype(jnp.uint8)
    out = jnp.where(jnp.arange(out_cap) < total_bytes,
                    wbytes[jnp.clip(jnp.arange(out_cap), 0, wbytes.shape[0] - 1)], 0)

    # empty input: still emit header+EOB (total_bits = 10 -> 2 bytes)
    too_big = total_bytes > out_cap
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL, Status.SUCCESS)
    return out.astype(jnp.uint8), jnp.where(too_big, 0, total_bytes).astype(jnp.int32), \
        status.astype(jnp.int32)


# -- batched (vmapped) entry points ---------------------------------------------------

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts: DeflateOpts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="deflate",
        compress_batch=compress_batch,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=DEFAULT_OPTS,
    ))
