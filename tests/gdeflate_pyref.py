"""Pure-Python GDeflate tile reference codec — the conformance oracle.

Implements the tpucomp GDeflate tile container (``tpucomp/formats/gdeflate.py``),
which follows the Microsoft DirectStorage 1.1 / RTX-IO GDeflate *architecture*
(``/root/reference/benchmarks/benchmark_gdeflate_chunked.cu:32``,
``examples/gdeflate_cpu_compression.cu:30,66-72``): 64 KiB pages, RFC-1951
entropy coding with the distance space extended to the 64 KiB window, and the
compressed bitstream swizzled into 32 SIMD lanes interleaved on demand at
32-bit granularity so 32 lanes can decode in parallel.  The exact bit
placement below is this project's (NVIDIA's bit-identical layout is specified
only by the closed ``libnvcomp_gdeflate_cpu.so``, which does not exist in this
container) — hence this independently-written serial reference serves as the
cross-implementation oracle for the vectorized JAX codec.

Tile layout (little-endian; one tile per chunk, chunk <= 64 KiB):
  byte 0      u8   btype: 0 stored, 1 fixed-Huffman, 2 dynamic-Huffman
  byte 1      u8   framing version (TILE_VERSION = 1; readers accept <= 1)
  bytes 2-5   u32  n_tokens (0 for stored)
  bytes 6-9   u32  raw_size
  bytes 10-11 u16  hdr_bytes (dynamic table description length; 0 otherwise)
Stored tiles: raw bytes at offset 12.
Huffman tiles:
  bytes 12-75 32 x u16 lane dword counts D_j
  bytes 76... table description (btype 2 only), padded to a multiple of 4
  then        the shared interleaved DWORD stream

Entropy layer (all bit fields LSB-first, Huffman codes bit-reversed, exactly
as RFC-1951):
  * literal token: lit/len code of the byte value.
  * match token: lit/len code 257+i (RFC-1951 length codes, extra bits),
    then distance code 0..31 with extra bits.  Codes 0-29 are the RFC-1951
    distance codes; codes 30 (base 32769) and 31 (base 49153), 14 extra bits
    each, extend the window to the GDeflate page size of 64 KiB.
  * no end-of-block symbol — n_tokens comes from the tile header.
  * dynamic table description: 5 bits HLIT-257(=29), 5 bits HDIST-1(=31),
    4 bits HCLEN-4(=15), 19 x 3-bit CL code lengths in RFC-1951 CL_ORDER,
    then 286+32 CL-coded code lengths (plain symbols 0..15 only; the 16/17/18
    run codes are never emitted).

Lane swizzle:
  * token t belongs to lane t % 32 (round t // 32); a lane's conceptual
    bitstream is the LSB-first concatenation of its tokens' bit fields,
    chopped into D_j = ceil(lane_bits/32) DWORDs (zero padded).
  * every token has exactly FOUR field slots — lit/len code, length extra,
    distance code, distance extra (literal tokens read 0 bits from the last
    three) — and before each slot the owning lane refills
    while (buffered_bits < 32 and dwords_taken < D_j), taking consecutive
    DWORDs from the shared stream.  The interleave order of the stream is
    exactly this refill schedule in FIELD-MAJOR order: rounds ascending,
    field slots ascending within a round, lanes ascending within a slot —
    the order a SIMD decoder issues refills in (slot f of all 32 lanes, then
    slot f+1).  Field-granular refill keeps every lane buffer <= 63 bits,
    which is what lets the vectorized decoder hold lane state in plain
    64-bit integers.
"""
from __future__ import annotations

import struct

N_LANES = 32
REFILL_BITS = 32  # refill threshold, applied before EACH of a token's 4 fields
PAGE = 1 << 16

# RFC-1951 length codes (symbol 257+i): (base, extra_bits)
LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
            51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
             4, 4, 4, 4, 5, 5, 5, 5, 0]
# GDeflate distance codes: RFC-1951's 30 plus two 14-extra-bit codes for the
# 64 KiB page window
DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
             385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
             16385, 24577, 32769, 49153]
DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
              9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14]
CL_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]

FIXED_LIT_LENS = ([8] * 144) + ([9] * 112) + ([7] * 24) + ([8] * 8)
FIXED_DIST_LENS = [5] * 32


def _canonical_codes(lens):
    """RFC-1951 canonical code assignment."""
    max_len = max(lens) if any(lens) else 0
    bl_count = [0] * (max_len + 1)
    for l in lens:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for b in range(1, max_len + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    codes = [0] * len(lens)
    for s, l in enumerate(lens):
        if l:
            codes[s] = next_code[l]
            next_code[l] += 1
    return codes


def _rev(v, n):
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _huff_lengths(freq, max_len):
    """Package-merge-free length assignment: plain Huffman then flatten to
    max_len with Kraft fixing (reference-quality is not required here)."""
    import heapq
    syms = [s for s, f in enumerate(freq) if f > 0]
    if len(syms) == 0:
        return [0] * len(freq)
    if len(syms) == 1:
        lens = [0] * len(freq)
        lens[syms[0]] = 1
        return lens
    heap = [(f, s, None) for s, f in enumerate(freq) if f > 0]
    heapq.heapify(heap)
    nodes = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nodes.append((a, b))
        heapq.heappush(heap, (a[0] + b[0], len(freq) + len(nodes), len(nodes) - 1))
    lens = [0] * len(freq)

    def walk(node, d):
        f, s, idx = node
        if idx is None:
            lens[s] = max(1, d)
        else:
            a, b = nodes[idx]
            walk(a, d + 1)
            walk(b, d + 1)

    walk(heap[0], 0)
    # flatten overlong codes, then repair the Kraft sum
    for s in range(len(lens)):
        if lens[s] > max_len:
            lens[s] = max_len
    while sum((1 << (max_len - l)) for l in lens if l) > (1 << max_len):
        # lengthen the shallowest repairable symbol
        cand = min((s for s in range(len(lens)) if 0 < lens[s] < max_len),
                   key=lambda s: (lens[s], -freq[s]))
        lens[cand] += 1
    return lens


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, val, n):
        for k in range(n):
            self.bits.append((val >> k) & 1)

    def to_dwords(self):
        n = (len(self.bits) + 31) // 32
        out = []
        for w in range(n):
            v = 0
            for k in range(32):
                i = 32 * w + k
                if i < len(self.bits) and self.bits[i]:
                    v |= 1 << k
            out.append(v)
        return out

    def to_bytes(self):
        n = (len(self.bits) + 7) // 8
        out = bytearray(n)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def _len_to_code(ml):
    i = max(k for k in range(len(LEN_BASE)) if LEN_BASE[k] <= ml)
    return 257 + i, ml - LEN_BASE[i], LEN_EXTRA[i]


def _dist_to_code(d):
    i = max(k for k in range(len(DIST_BASE)) if DIST_BASE[k] <= d)
    return i, d - DIST_BASE[i], DIST_EXTRA[i]


def _tokenize(data: bytes):
    """Simple greedy matcher (hash-chain-free; correctness oracle, not speed)."""
    tokens = []
    i, n = 0, len(data)
    last: dict[bytes, int] = {}
    while i < n:
        best_len, best_dist = 0, 0
        if i + 4 <= n:
            key = data[i:i + 4]
            j = last.get(key, -1)
            if j >= 0 and i - j <= PAGE - 1:
                l = 4
                while i + l < n and l < 258 and data[j + l] == data[i + l]:
                    l += 1
                best_len, best_dist = l, i - j
            last[key] = i
        if best_len >= 4:
            tokens.append(("m", best_len, best_dist))
            i += best_len
        else:
            tokens.append(("l", data[i], 0))
            i += 1
    return tokens


def compress(data: bytes, btype: int = 2) -> bytes:
    """Encode one tile.  btype 1 = fixed tables, 2 = dynamic, 0 = stored."""
    assert len(data) <= PAGE
    if btype == 0 or len(data) < 16:
        return (struct.pack("<BBIIH", 0, 0, 0, len(data), 0) + data)

    tokens = _tokenize(data)

    if btype == 2:
        lit_freq = [0] * 288
        dist_freq = [0] * 32
        for kind, a, b in tokens:
            if kind == "l":
                lit_freq[a] += 1
            else:
                c, _, _ = _len_to_code(a)
                lit_freq[c] += 1
                dc, _, _ = _dist_to_code(b)
                dist_freq[dc] += 1
        if not any(dist_freq):
            dist_freq[0] = 1
        lit_lens = _huff_lengths(lit_freq[:286], 15) + [0, 0]
        dist_lens = _huff_lengths(dist_freq, 15)
        # table description
    else:
        lit_lens = FIXED_LIT_LENS
        dist_lens = FIXED_DIST_LENS
    lit_codes = _canonical_codes(lit_lens)
    dist_codes = _canonical_codes(dist_lens)

    # per-lane bitstreams
    lanes = [_BitWriter() for _ in range(N_LANES)]
    for t, (kind, a, b) in enumerate(tokens):
        w = lanes[t % N_LANES]
        if kind == "l":
            w.write(_rev(lit_codes[a], lit_lens[a]), lit_lens[a])
        else:
            c, ex, exn = _len_to_code(a)
            w.write(_rev(lit_codes[c], lit_lens[c]), lit_lens[c])
            w.write(ex, exn)
            dc, dex, dexn = _dist_to_code(b)
            w.write(_rev(dist_codes[dc], dist_lens[dc]), dist_lens[dc])
            w.write(dex, dexn)

    lane_dwords = [w.to_dwords() for w in lanes]
    D = [len(d) for d in lane_dwords]

    # interleave by simulating the decoder's refill schedule (field-granular)
    stream = []
    taken = [0] * N_LANES
    bufbits = [0] * N_LANES
    n_tokens = len(tokens)
    tok_fields = [[] for _ in range(N_LANES)]  # per token: 4 field bit counts
    for t, (kind, a, b) in enumerate(tokens):
        if kind == "l":
            fb = (lit_lens[a], 0, 0, 0)
        else:
            c, _, exn = _len_to_code(a)
            dc, _, dexn = _dist_to_code(b)
            fb = (lit_lens[c], exn, dist_lens[dc], dexn)
        tok_fields[t % N_LANES].append(fb)
    rounds = (n_tokens + N_LANES - 1) // N_LANES
    for r in range(rounds):
        for f in range(4):
            for j in range(N_LANES):
                if r * N_LANES + j >= n_tokens:
                    continue
                while bufbits[j] < REFILL_BITS and taken[j] < D[j]:
                    stream.append(lane_dwords[j][taken[j]])
                    taken[j] += 1
                    bufbits[j] += 32
                bufbits[j] -= tok_fields[j][r][f]
    assert taken == D, (taken, D)

    if btype == 2:
        all_lens = list(lit_lens[:286]) + list(dist_lens)
        cl_freq = [0] * 19
        for l in all_lens:
            cl_freq[l] += 1
        cl_lens = _huff_lengths(cl_freq, 7)
        cl_codes = _canonical_codes(cl_lens)
        hw = _BitWriter()
        hw.write(29, 5)
        hw.write(31, 5)
        hw.write(15, 4)
        for s in CL_ORDER:
            hw.write(cl_lens[s], 3)
        for l in all_lens:
            hw.write(_rev(cl_codes[l], cl_lens[l]), cl_lens[l])
        desc = hw.to_bytes()
    else:
        desc = b""
    hdr_bytes = len(desc)
    desc += b"\x00" * (-len(desc) % 4)

    out = bytearray(struct.pack("<BBIIH", btype, 1, n_tokens, len(data),
                                hdr_bytes))
    for d in D:
        out += struct.pack("<H", d)
    out += desc
    for w in stream:
        out += struct.pack("<I", w)
    if len(out) >= 12 + len(data):  # no win: store
        return struct.pack("<BBIIH", 0, 0, 0, len(data), 0) + data
    return bytes(out)


class _LaneReader:
    """On-demand refilling bit reader for one lane."""

    def __init__(self, take_dword, d_total):
        self.take = take_dword
        self.d_total = d_total
        self.taken = 0
        self.buf = 0
        self.bits = 0

    def refill(self):
        while self.bits < REFILL_BITS and self.taken < self.d_total:
            self.buf |= self.take() << self.bits
            self.bits += 32
            self.taken += 1

    def read(self, n):
        self.refill()
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.bits -= n
        return v

    def peek16(self):
        return self.buf & 0xFFFF


def _decode_table(lens):
    codes = _canonical_codes(lens)
    # (rev_code, len) -> sym map for serial decode
    m = {}
    for s, l in enumerate(lens):
        if l:
            m[(codes[s], l)] = s
    return m


def _read_sym(rd: _LaneReader, table):
    rd.refill()
    # peek bits LSB-first, build the MSB-first code incrementally
    code = 0
    for l in range(1, 16):
        bit = (rd.buf >> (l - 1)) & 1
        code = (code << 1) | bit
        s = table.get((code, l))
        if s is not None:
            rd.buf >>= l
            rd.bits -= l
            return s
    raise ValueError("bad code")


def decompress(tile: bytes) -> bytes:
    btype, ver, n_tokens, raw_size, hdr_bytes = struct.unpack_from("<BBIIH",
                                                                    tile)
    if ver > 1:
        raise ValueError(f"unsupported gdeflate tile version {ver}")
    if btype == 0:
        return bytes(tile[12:12 + raw_size])
    D = list(struct.unpack_from(f"<{N_LANES}H", tile, 12))
    off = 12 + 2 * N_LANES
    if btype == 2:
        desc = tile[off:off + hdr_bytes]
        bits = []
        for by in desc:
            for k in range(8):
                bits.append((by >> k) & 1)
        pos = 0

        def rd(n):
            nonlocal pos
            v = 0
            for k in range(n):
                v |= bits[pos] << k
                pos += 1
            return v

        hlit = rd(5) + 257
        hdist = rd(5) + 1
        hclen = rd(4) + 4
        cl_lens = [0] * 19
        for i in range(hclen):
            cl_lens[CL_ORDER[i]] = rd(3)
        cl_tab = _decode_table(cl_lens)

        def read_cl():
            code, l = 0, 0
            while True:
                code = (code << 1) | rd(1)
                l += 1
                s = cl_tab.get((code, l))
                if s is not None:
                    return s

        all_lens = [read_cl() for _ in range(hlit + hdist)]
        lit_lens = all_lens[:hlit] + [0] * (288 - hlit)
        dist_lens = all_lens[hlit:] + [0] * (32 - hdist)
        off += hdr_bytes + (-hdr_bytes % 4)
    else:
        lit_lens = FIXED_LIT_LENS
        dist_lens = FIXED_DIST_LENS

    lit_tab = _decode_table(lit_lens)
    dist_tab = _decode_table(dist_lens)

    dwords = [struct.unpack_from("<I", tile, off + 4 * k)[0]
              for k in range((len(tile) - off) // 4)]
    ptr = [0]

    def take():
        v = dwords[ptr[0]]
        ptr[0] += 1
        return v

    readers = [_LaneReader(take, D[j]) for j in range(N_LANES)]
    out = bytearray()
    rounds = (n_tokens + N_LANES - 1) // N_LANES
    tokens = []
    for r in range(rounds):
        width = min(N_LANES, n_tokens - r * N_LANES)
        lanes = range(width)
        # field-major: slot f for ALL lanes before slot f+1 of any lane
        syms = [_read_sym(readers[j], lit_tab) for j in lanes]          # slot 1
        mls = [readers[j].read(LEN_EXTRA[syms[j] - 257])
               + LEN_BASE[syms[j] - 257] if syms[j] >= 257
               else readers[j].read(0) for j in lanes]                  # slot 2
        dcs = [_read_sym(readers[j], dist_tab) if syms[j] >= 257
               else readers[j].refill() for j in lanes]                 # slot 3
        dists = [readers[j].read(DIST_EXTRA[dcs[j]]) + DIST_BASE[dcs[j]]
                 if syms[j] >= 257 else readers[j].read(0)
                 for j in lanes]                                        # slot 4
        for j in lanes:
            if syms[j] < 256:
                tokens.append(("l", syms[j], 0))
            else:
                tokens.append(("m", mls[j], dists[j]))
    for kind, a, b in tokens:
        if kind == "l":
            out.append(a)
        else:
            for _ in range(a):
                out.append(out[-b])
    assert len(out) == raw_size, (len(out), raw_size)
    return bytes(out)
