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

Encode emits, per chunk, the best of stored / fixed-Huffman (BTYPE=01) /
dynamic-Huffman (BTYPE=10, adaptive per-chunk tables) blocks from the shared LZ
match finder — valid RFC-1951 that zlib/libdeflate inflate bit-exactly.
Streams with pathologically many blocks (> ~1 block per 32 output bytes) exceed
the static token budget and are rejected with ``ERROR_CANNOT_DECOMPRESS``
rather than decoded unboundedly.
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

def _walk_blocks(comp: jax.Array, comp_size: jax.Array, out_cap: int,
                 start_byte, record: bool):
    """The serial-ish part of decode: walk blocks and symbols, returning the
    final walker state.  With ``record=False`` no token buffer is materialized
    (parse-only — the ``GetDecompressSizeAsync`` analog)."""
    cap = comp.shape[0]
    comp_size = comp_size.astype(jnp.int32)
    start_byte = jnp.asarray(start_byte, jnp.int32)
    nbits_total = comp_size * 8
    cap_tok = out_cap + out_cap // 32 + 16
    tok_rows = cap_tok if record else 1
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
            toks=jnp.zeros((tok_rows, 3), jnp.int32) + 0 * comp_size,
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
            toks = (st["toks"].at[jnp.clip(st["n_tok"], 0, tok_rows - 1)].set(tok)
                    if record else st["toks"])
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
                if record:
                    toks = jnp.where(
                        emit, toks.at[jnp.clip(n_tok, 0, tok_rows - 1)].set(tok),
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
    st["err"] = jnp.logical_or(st["err"], comp_size <= start_byte)
    return st


# Parse-only size queries still need a static output bound for the walker's
# token/budget limits; the reference's deflate decompress "can exceed 64 KB
# output" (CHANGELOG.md:75) — 1 MiB covers any real 64 KiB-window stream.
SIZE_QUERY_CAP = 1 << 20


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    """Parse-only decompressed-size query (workflow-3 analog for deflate,
    ``CHANGELOG.md:99-100``): walks blocks/symbols without materializing the
    token stream.  Returns 0 for malformed streams."""
    st = _walk_blocks(comp, comp_size, SIZE_QUERY_CAP, 0, record=False)
    return jnp.where(st["err"], 0, st["out_size"]).astype(jnp.int32)


def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int, start_byte=0) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one raw-deflate stream -> (out uint8[out_cap], out_size, status).

    ``start_byte`` (traced ok) lets wrappers (gzip/zlib) skip their header while
    keeping stored-block offsets absolute; ``comp_size`` is the end of the
    deflate data (i.e. excludes any trailer).
    """
    cap = comp.shape[0]
    comp_size = comp_size.astype(jnp.int32)
    cap_tok = out_cap + out_cap // 32 + 16
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)

    st = _walk_blocks(comp, comp_size, out_cap, start_byte, record=True)
    err = st["err"]

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
# encode — dynamic-Huffman length construction (vectorized)
# =====================================================================================

def _huff_lengths(freq: jax.Array, max_len: int):
    """Near-optimal length-limited code lengths from symbol frequencies.

    Vectorized alternative to package-merge: start from rounded ``-log2(p)``
    clamped to [1, max_len], then fix the Kraft sum to exactly 1 with a bounded
    greedy loop (lengthen the cheapest symbols while oversubscribed, shorten
    the most frequent while undersubscribed).  Returns (lengths, ok); callers
    fall back to the fixed tables when ``ok`` is False (never happens for
    well-formed histograms, but guarantees a valid stream regardless).
    """
    n = freq.shape[0]
    unit = jnp.int32(1) << max_len
    total = jnp.maximum(jnp.sum(freq), 1)
    present = freq > 0
    n_present = jnp.sum(present.astype(jnp.int32))

    # initial guess: ceil(-log2(p)) via bit-length of total/freq
    ratio = total // jnp.maximum(freq, 1)
    bl = jnp.zeros((n,), jnp.int32)
    for k in range(31):
        bl = bl + ((ratio >> k) > 0).astype(jnp.int32)
    lens = jnp.clip(bl, 1, max_len)
    lens = jnp.where(present, lens, 0)

    def weight(lens):
        return jnp.where(lens > 0, unit >> jnp.clip(lens, 1, max_len), 0)

    def body(_, carry):
        lens, = carry
        K = jnp.sum(weight(lens))
        over = K > unit
        under = K < unit
        deficit = unit - K
        # lengthen: cheapest (lowest-freq) symbol with room to grow
        cost = jnp.where(jnp.logical_and(present, lens < max_len), freq,
                         jnp.int32(2**30))
        s_inc = jnp.argmin(cost)
        # shorten: most frequent symbol whose halved length still fits deficit
        gain = weight(lens)  # shortening adds exactly its current weight
        can_short = jnp.logical_and(jnp.logical_and(present, lens > 1),
                                    gain <= deficit)
        val = jnp.where(can_short, freq, -1)
        s_dec = jnp.argmax(val)
        can_dec = val[s_dec] > 0
        lens = jnp.where(over, lens.at[s_inc].add(1),
                jnp.where(jnp.logical_and(under, can_dec),
                          lens.at[s_dec].add(-1), lens))
        return (lens,)

    (lens,) = jax.lax.fori_loop(0, 4 * max_len + 32, body, (lens,))
    K = jnp.sum(weight(lens))
    ok = jnp.logical_or(K == unit, n_present <= 1)
    # single-symbol alphabet: give it a 1-bit code (decoders accept it)
    lens = jnp.where(jnp.logical_and(n_present == 1, present), 1, lens)
    return lens, ok


def _assign_codes(lens: jax.Array, max_len: int):
    """Canonical MSB-first codes from lengths (RFC 1951 3.2.2), vectorized."""
    n = lens.shape[0]
    count = jnp.zeros((max_len + 1,), jnp.int32).at[
        jnp.where(lens > 0, jnp.clip(lens, 0, max_len), 0)].add(
        (lens > 0).astype(jnp.int32))
    first = jnp.zeros((max_len + 1,), jnp.int32)
    code = jnp.int32(0)
    for l in range(1, max_len + 1):
        code = (code + count[l - 1]) << 1
        first = first.at[l].set(code)
    # rank within length
    rank = jnp.zeros((n,), jnp.int32)
    for l in range(1, max_len + 1):
        is_l = (lens == l).astype(jnp.int32)
        rank = rank + jnp.where(lens == l, jnp.cumsum(is_l) - 1, 0)
    return first[jnp.clip(lens, 0, max_len)] + rank


# =====================================================================================
# encode (fixed- and dynamic-Huffman blocks)
# =====================================================================================

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
    """Encode one chunk as a single deflate block.

    algo 0: fixed-Huffman (fastest).  algo 1: dynamic-Huffman (per-chunk
    adaptive tables; falls back to fixed if the vectorized length construction
    cannot reach an exact Kraft sum).  algo 2: entropy-only (no LZ matches —
    the GDeflate ladder semantics).
    """
    from tpucomp.formats import lz4 as _lz4
    cap = data.shape[0]
    size = size.astype(jnp.int32)

    if opts.algo == 2:
        # entropy-only mode (the GDeflate algo-2 ladder): no LZ stage
        mlen = jnp.zeros((cap,), jnp.int32)
        moff = jnp.ones((cap,), jnp.int32)
    else:
        # algo ladder depth: the high-compression rung pays a deeper
        # candidate probe (measured on 64 KiB text chunks: 1.096x -> 1.069x
        # of zlib-6); algo 0 keeps the fast scan
        nc, pw = (32, 24) if opts.algo >= 1 else (16, 12)
        mlen, moff = _lz4._find_matches(data, size, run_dists=(1, 2, 4, 8),
                                        ext_words=64, n_cands=nc,
                                        probe_words=pw)
        mlen = jnp.minimum(mlen, 258)        # deflate max match length
        mlen = jnp.where(moff > 32768, 0, mlen)  # deflate max distance

    # ---- parallel greedy parse -----------------------------------------------------
    p = jnp.arange(cap, dtype=jnp.int32)
    has_match = mlen >= 4
    nxt = jnp.where(has_match, p + mlen, p + 1)
    nxt = jnp.where(p < size, nxt, cap)
    reach, _ = plz.wyllie_path(nxt, jnp.zeros((cap,), jnp.int32),
                               num_rounds=_ceil_log2(cap) + 1)
    reach = jnp.logical_and(reach, p < size)
    is_lit = jnp.logical_and(reach, jnp.logical_not(has_match))
    is_match = jnp.logical_and(reach, has_match)

    li, lev = _len_to_code(mlen)
    lsym = 257 + li
    di, dev = _dist_to_code(moff)
    len_extra_n = jnp.asarray(LEN_EXTRA)[li]
    dist_extra_n = jnp.asarray(DIST_EXTRA)[di]

    # ---- choose Huffman tables + adaptive block segmentation ------------------------
    # zlib emits a new dynamic block whenever the symbol statistics shift;
    # one table per 64 KiB chunk leaves ~3-7% on heterogeneous data (STATUS
    # ratio gap).  Candidate segmentations {1, 2, 4} blocks at fixed
    # quarter boundaries are priced exactly (per-segment histograms dotted
    # with each candidate's code lengths + header costs) and the cheapest
    # wins; every block independently falls back to fixed tables.
    fixed_lit_codes_np = _assign_codes_np(FIXED_LIT_LENS, MAX_BITS)
    fixed_dist_codes_np = _assign_codes_np(FIXED_DIST_LENS, MAX_BITS)
    fixed_ll = jnp.asarray(FIXED_LIT_LENS)
    fixed_lc = jnp.asarray(fixed_lit_codes_np)
    fixed_dl = jnp.asarray(FIXED_DIST_LENS)
    fixed_dc = jnp.asarray(fixed_dist_codes_np)

    dyn_on = opts.algo in (1, 2)
    S = 4 if (dyn_on and cap % 4 == 0 and cap >= 16384) else 1
    seg = cap // S
    dbyte = data.astype(jnp.int32)

    def _el_fields(lit_lens_t, lit_codes_t, dist_lens_t, dist_codes_t, sl):
        """Per-element bit fields for slice ``sl`` under the given tables."""
        db = dbyte[sl]
        lcode = _rev_bits(lit_codes_t[jnp.clip(db, 0, 287)],
                          lit_lens_t[jnp.clip(db, 0, 287)])
        lit_n = lit_lens_t[jnp.clip(db, 0, 287)]
        ls_c = jnp.clip(lsym[sl], 0, 287)
        m_val = _rev_bits(lit_codes_t[ls_c], lit_lens_t[ls_c]).astype(jnp.int64)
        m_bits = lit_lens_t[ls_c]
        m_val = m_val | (lev[sl].astype(jnp.int64) << m_bits)
        m_bits = m_bits + len_extra_n[sl]
        dc = jnp.clip(di[sl], 0, 31)
        m_val = m_val | (_rev_bits(dist_codes_t[dc],
                                   dist_lens_t[dc]).astype(jnp.int64) << m_bits)
        m_bits = m_bits + dist_lens_t[dc]
        m_val = m_val | (dev[sl].astype(jnp.int64) << m_bits)
        m_bits = m_bits + dist_extra_n[sl]
        e_val = jnp.where(is_lit[sl], lcode.astype(jnp.int64),
                          jnp.where(is_match[sl], m_val, 0))
        e_bits = jnp.where(is_lit[sl], lit_n,
                           jnp.where(is_match[sl], m_bits, 0))
        return e_val, e_bits

    if dyn_on:
        # per-segment histograms (litlen incl. length symbols; distances;
        # table-independent extra bits)
        seg_lh, seg_dh, seg_xb = [], [], []
        for k in range(S):
            sl = slice(k * seg, (k + 1) * seg)
            il = is_lit[sl]
            im = is_match[sl]
            lh = jnp.zeros((288,), jnp.int32).at[
                jnp.where(il, dbyte[sl], 287)].add(il.astype(jnp.int32))
            lh = lh.at[jnp.where(im, jnp.clip(lsym[sl], 257, 285), 287)].add(
                im.astype(jnp.int32))
            lh = lh.at[287].set(0)
            dh = jnp.zeros((30,), jnp.int32).at[
                jnp.where(im, jnp.clip(di[sl], 0, 29), 29)].add(
                im.astype(jnp.int32))
            xb = jnp.sum(jnp.where(im, len_extra_n[sl] + dist_extra_n[sl], 0))
            seg_lh.append(lh)
            seg_dh.append(dh)
            seg_xb.append(xb)

        def block_tables(lo, hi):
            """Tables + exact cost for a block over segments [lo, hi)."""
            lit_freq = sum(seg_lh[lo:hi]).at[256].add(1)      # EOB
            dist_freq = sum(seg_dh[lo:hi])
            no_match = jnp.sum(dist_freq) == 0
            dist_freq = dist_freq.at[0].add(jnp.where(no_match, 1, 0))
            xbits = sum(seg_xb[lo:hi])

            dyn_lit_lens, ok_l = _huff_lengths(lit_freq[:286], MAX_BITS)
            dyn_dist_lens, ok_d = _huff_lengths(dist_freq, MAX_BITS)
            dyn_lit_lens = jnp.pad(dyn_lit_lens, (0, 2))
            dyn_dist_lens = jnp.pad(dyn_dist_lens, (0, 2))
            dyn_lit_codes = _assign_codes(dyn_lit_lens, MAX_BITS)
            dyn_dist_codes = _assign_codes(dyn_dist_lens, MAX_BITS)

            # CL table over the 316 emitted lengths (no 16/17/18 runs)
            all_lens = jnp.concatenate([dyn_lit_lens[:286],
                                        dyn_dist_lens[:30]])
            cl_freq = jnp.zeros((19,), jnp.int32).at[
                jnp.clip(all_lens, 0, 15)].add(1)
            cl_lens, ok_c = _huff_lengths(cl_freq, 7)
            cl_codes = _assign_codes(cl_lens, 7)
            use_dyn = jnp.logical_and(ok_l, jnp.logical_and(ok_d, ok_c))

            cl_hdr_bits = (14 + 19 * 3
                           + jnp.sum(cl_lens[jnp.clip(all_lens, 0, 15)]))
            pay_fixed = (jnp.sum(lit_freq * fixed_ll)
                         + jnp.sum(dist_freq * fixed_dl[:30]) + xbits)
            pay_dyn = (jnp.sum(lit_freq * dyn_lit_lens)
                       + jnp.sum(dist_freq * dyn_dist_lens[:30]) + xbits)
            use_dyn = jnp.logical_and(use_dyn,
                                      cl_hdr_bits + pay_dyn < pay_fixed)
            cost = 3 + jnp.where(use_dyn, cl_hdr_bits + pay_dyn, pay_fixed)

            ll = jnp.where(use_dyn, dyn_lit_lens, fixed_ll)
            lc = jnp.where(use_dyn, dyn_lit_codes, fixed_lc)
            dl = jnp.where(use_dyn, dyn_dist_lens, fixed_dl)
            dcs = jnp.where(use_dyn, dyn_dist_codes, fixed_dc)

            # header fields: HLIT(5) HDIST(5) HCLEN(4), 19x3 CL lens
            # (CL_ORDER), then 316 CL-coded length symbols
            cl_order_t = jnp.asarray(CL_ORDER)
            hdr_val = jnp.stack([jnp.int64(29), jnp.int64(29), jnp.int64(15)])
            hdr_bits = jnp.stack([jnp.int32(5), jnp.int32(5), jnp.int32(4)])
            clo_val = cl_lens[cl_order_t].astype(jnp.int64)
            clo_bits = jnp.full((19,), 3, jnp.int32)
            sym_val = _rev_bits(cl_codes[jnp.clip(all_lens, 0, 15)],
                                cl_lens[jnp.clip(all_lens, 0, 15)]
                                ).astype(jnp.int64)
            sym_bits = cl_lens[jnp.clip(all_lens, 0, 15)]
            cfv = jnp.concatenate([hdr_val, clo_val, sym_val,
                                   jnp.zeros((1,), jnp.int64)])
            cfb = jnp.concatenate([hdr_bits, clo_bits, sym_bits,
                                   jnp.zeros((1,), jnp.int32)])
            cfb = jnp.where(use_dyn, cfb, 0)
            return dict(ll=ll, lc=lc, dl=dl, dc=dcs, cfv=cfv, cfb=cfb,
                        use_dyn=use_dyn, cost=cost)

        if S == 4:
            ranges = {(0, 4): block_tables(0, 4),
                      (0, 2): block_tables(0, 2), (2, 4): block_tables(2, 4),
                      (0, 1): block_tables(0, 1), (1, 2): block_tables(1, 2),
                      (2, 3): block_tables(2, 3), (3, 4): block_tables(3, 4)}
            cost1 = ranges[(0, 4)]["cost"]
            cost2 = ranges[(0, 2)]["cost"] + ranges[(2, 4)]["cost"]
            cost4 = (ranges[(0, 1)]["cost"] + ranges[(1, 2)]["cost"]
                     + ranges[(2, 3)]["cost"] + ranges[(3, 4)]["cost"])
            mask_id = jnp.where(
                jnp.logical_and(cost2 < cost1, cost2 <= cost4), 1,
                jnp.where(cost4 < cost1, 2, 0)).astype(jnp.int32)
            # per segment under each mask: (range, header?, bfinal?, eob?)
            seg_plan = [
                # mask 0: one block
                [((0, 4), True, True, k == 3) for k in range(4)],
                # mask 1: halves
                [((0, 2), k == 0, False, k == 1) if k < 2 else
                 ((2, 4), k == 2, True, k == 3) for k in range(4)],
                # mask 2: quarters
                [((k, k + 1), True, k == 3, True) for k in range(4)],
            ]
            # fix header flags for merged blocks (header only at block start)
            seg_plan[0] = [((0, 4), k == 0, True, k == 3) for k in range(4)]
        else:
            ranges = {(0, 1): block_tables(0, 1)}
            mask_id = jnp.int32(0)
            seg_plan = [[((0, 1), True, True, True)]]

        def sel3(key):
            """Select a per-range array by the traced mask_id (S==4)."""
            def get(mi, k):
                rng, _, _, _ = seg_plan[mi][k]
                return ranges[rng][key]
            return get

        vals_parts, bits_parts = [], []
        getter = sel3(None) if False else None
        for k in range(S):
            if S == 4:
                opts3 = [seg_plan[mi][k] for mi in range(3)]
                tabs = [ranges[o[0]] for o in opts3]

                def pick(key, tabs=tabs):
                    a, b2, c = (t[key] for t in tabs)
                    return jnp.where(mask_id == 0, a,
                                     jnp.where(mask_id == 1, b2, c))

                ll_k, lc_k = pick("ll"), pick("lc")
                dl_k, dc_k = pick("dl"), pick("dc")
                cfv_k, cfb_k = pick("cfv"), pick("cfb")
                ud_k = pick("use_dyn")
                hdr_k = jnp.where(mask_id == 0, opts3[0][1],
                                  jnp.where(mask_id == 1, opts3[1][1],
                                            opts3[2][1]))
                bf_k = jnp.where(mask_id == 0, opts3[0][2],
                                 jnp.where(mask_id == 1, opts3[1][2],
                                           opts3[2][2]))
                eob_k = jnp.where(mask_id == 0, opts3[0][3],
                                  jnp.where(mask_id == 1, opts3[1][3],
                                            opts3[2][3]))
            else:
                t = ranges[(0, 1)]
                ll_k, lc_k, dl_k, dc_k = t["ll"], t["lc"], t["dl"], t["dc"]
                cfv_k, cfb_k, ud_k = t["cfv"], t["cfb"], t["use_dyn"]
                hdr_k = jnp.bool_(True)
                bf_k = jnp.bool_(True)
                eob_k = jnp.bool_(True)

            sl = slice(k * seg, (k + 1) * seg)
            e_val, e_bits = _el_fields(ll_k, lc_k, dl_k, dc_k, sl)
            # block header: BFINAL, then BTYPE LSB-first (01 fixed / 10 dyn)
            hdr3_k = (bf_k.astype(jnp.int64)
                      | jnp.where(ud_k, jnp.int64(0b100), jnp.int64(0b010)))
            hdr3_b = jnp.where(hdr_k, jnp.int32(3), 0)
            cfb_k = jnp.where(hdr_k, cfb_k, 0)
            eob_val = _rev_bits(lc_k[256], ll_k[256]).astype(jnp.int64)
            eob_bits = jnp.where(eob_k, ll_k[256], 0)
            vals_parts += [hdr3_k[None], cfv_k, e_val, eob_val[None]]
            bits_parts += [hdr3_b[None], cfb_k, e_bits, eob_bits[None]]

        vals = jnp.concatenate(vals_parts)
        bits = jnp.concatenate(bits_parts)
    else:
        # algo 0: fixed tables, single block
        el_val, el_bits = _el_fields(fixed_ll, fixed_lc, fixed_dl, fixed_dc,
                                     slice(0, cap))
        eob_val = _rev_bits(fixed_lc[256], fixed_ll[256]).astype(jnp.int64)
        eob_bits = fixed_ll[256]
        hdr3 = jnp.int64(0b011)
        vals = jnp.concatenate([hdr3[None], el_val, eob_val[None]])
        bits = jnp.concatenate([jnp.full((1,), 3, jnp.int32), el_bits,
                                eob_bits[None]])
    nf = vals.shape[0]
    bit_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(bits)[:-1].astype(jnp.int32)])
    total_bits = jnp.sum(bits)
    total_bytes = (total_bits + 7) // 8

    n_words = out_cap // 4 + 2
    word_idx = bit_off >> 5
    sh = (bit_off & 31).astype(jnp.uint64)
    v = vals.astype(jnp.uint64)
    emit_mask = bits > 0
    fpos = jnp.arange(nf, dtype=jnp.int32)
    words = jnp.zeros((n_words + plz.DUMP_SLOTS,), jnp.uint32)
    for w in range(3):
        part = ((v << sh) >> jnp.uint64(32 * w)) & jnp.uint64(0xFFFFFFFF)
        tgt = jnp.where(emit_mask, jnp.clip(word_idx + w, 0, n_words - 1),
                        plz.dump_spread(fpos, n_words))
        words = words.at[tgt].add(part.astype(jnp.uint32))
    words = words[:n_words]

    wbytes = jnp.stack([words & 0xFF, (words >> 8) & 0xFF,
                        (words >> 16) & 0xFF, (words >> 24) & 0xFF],
                       axis=1).reshape(-1).astype(jnp.uint8)
    out = jnp.where(jnp.arange(out_cap) < total_bytes,
                    wbytes[jnp.clip(jnp.arange(out_cap), 0, wbytes.shape[0] - 1)], 0)

    # stored-block fallback: if entropy coding cannot beat raw + 5 bytes,
    # emit an RFC-1951 stored block instead (also caps the worst case)
    stored_bytes = size + 5
    use_stored = stored_bytes < total_bytes
    opos = jnp.arange(out_cap, dtype=jnp.int32)
    ln = size.astype(jnp.int32)
    stored_hdr = jnp.stack([jnp.int32(0x01), ln & 0xFF, (ln >> 8) & 0xFF,
                            (~ln) & 0xFF, ((~ln) >> 8) & 0xFF])
    stored_out = jnp.where(
        opos < 5, stored_hdr[jnp.clip(opos, 0, 4)],
        data[jnp.clip(opos - 5, 0, cap - 1)].astype(jnp.int32)).astype(jnp.uint8)
    stored_out = jnp.where(opos < stored_bytes, stored_out, 0)
    out = jnp.where(use_stored, stored_out, out)
    total_bytes = jnp.where(use_stored, stored_bytes, total_bytes)

    too_big = total_bytes > out_cap
    status = jnp.where(too_big, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL, Status.SUCCESS)
    return out.astype(jnp.uint8), \
        jnp.where(too_big, 0, total_bytes).astype(jnp.int32), \
        status.astype(jnp.int32)


def _assign_codes_np(lens: np.ndarray, max_len: int) -> np.ndarray:
    """Host-side canonical code assignment for the static fixed tables."""
    count = np.zeros(max_len + 1, np.int64)
    for l in lens:
        if l > 0:
            count[l] += 1
    first = np.zeros(max_len + 1, np.int64)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + count[l - 1]) << 1
        first[l] = code
    codes = np.zeros(len(lens), np.int32)
    nxt = first.copy()
    for s, l in enumerate(lens):
        if l > 0:
            codes[s] = nxt[l]
            nxt[l] += 1
    return codes


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
        get_decompress_size=get_decompress_size,
    ))
