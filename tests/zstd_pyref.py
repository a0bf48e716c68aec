"""Pure-python Zstandard (RFC 8878) decoder — debugging oracle for the JAX codec.

Intentionally mirrors the structure of ``tpucomp/formats/zstd.py`` so
intermediates (FSE tables, Huffman weights, per-sequence values) can be diffed
step by step.  Validated end-to-end against python-zstandard in test_zstd.py.
"""
from __future__ import annotations

LL_BITS = [0]*16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256,
                             512, 1024, 2048, 4096, 8192, 16384, 32768, 65536]
ML_BITS = [0]*32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131,
                                259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539]
LL_DEF = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
          2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
ML_DEF = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
          1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
          -1, -1, -1, -1, -1, -1, -1]
OF_DEF = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
          1, -1, -1, -1, -1, -1]


def bits_fwd(buf, bitpos, n):
    v = 0
    for k in range(n):
        p = bitpos + k
        if 0 <= (p >> 3) < len(buf):
            v |= ((buf[p >> 3] >> (p & 7)) & 1) << k
    return v


class BwdStream:
    """Backward bitstream: bytes [start, start+n); padding 1-bit in last byte."""

    def __init__(self, buf, start_byte, nbytes):
        self.buf = buf
        self.base = start_byte * 8
        last = buf[start_byte + nbytes - 1]
        if last == 0:
            raise ValueError("missing padding bit")
        hb = max(k for k in range(8) if (last >> k) & 1)
        self.left = (nbytes - 1) * 8 + hb

    def read(self, n):
        if n == 0:
            return 0
        self.left -= n
        return bits_fwd(self.buf, self.base + self.left, n) if self.left >= 0 \
            else bits_fwd(self.buf, self.base, n + self.left) << (-self.left)


def fse_build(norm, acc):
    """[(symbol, nbits, baseline)] * 2^acc."""
    size = 1 << acc
    tbl = [0] * size
    high = size - 1
    for s, p in enumerate(norm):
        if p == -1:
            tbl[high] = s
            high -= 1
    pos, step = 0, (size >> 1) + (size >> 3) + 3
    for s, p in enumerate(norm):
        for _ in range(max(p, 0)):
            tbl[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    nxt = [1 if p == -1 else max(p, 0) for p in norm]
    out = []
    for i in range(size):
        s = tbl[i]
        x = nxt[s]
        nxt[s] += 1
        nb = acc - (x.bit_length() - 1)
        out.append((s, nb, (x << nb) - size))
    return out


def read_ncount(buf, bitpos, max_sym):
    """-> (norm list, accuracy_log, next_bitpos)."""
    acc = bits_fwd(buf, bitpos, 4) + 5
    bp = bitpos + 4
    remaining = (1 << acc) + 1
    norm = []
    prev0 = False
    while remaining > 1 and len(norm) <= max_sym:
        if prev0:
            while True:
                r = bits_fwd(buf, bp, 2)
                bp += 2
                norm.extend([0] * min(r, 3))
                if r != 3:
                    break
            prev0 = False
            if remaining <= 1 or len(norm) > max_sym:
                break
        nbb = remaining.bit_length()
        thr = 1 << (nbb - 1)
        mx = (2 * thr - 1) - remaining
        v = bits_fwd(buf, bp, nbb)
        low = v & (thr - 1)
        if low < mx:
            cnt = low
            bp += nbb - 1
        else:
            cnt = v - mx if v >= thr else v
            bp += nbb
        cnt -= 1
        remaining -= -cnt if cnt < 0 else cnt
        norm.append(cnt)
        prev0 = cnt == 0
    if remaining != 1:
        raise ValueError(f"bad ncount remaining={remaining}")
    return norm, acc, bp


def huf_weights(buf, tree_pos):
    """-> (weights list incl. implied last, tree_bytes)."""
    thdr = buf[tree_pos]
    if thdr >= 128:
        # headerByte - 127 EXPLICIT weights (the implied last one is extra)
        n = thdr - 127
        ws = []
        for i in range(n):
            b = buf[tree_pos + 1 + (i >> 1)]
            ws.append(b >> 4 if (i & 1) == 0 else b & 0xF)
        tree_bytes = 1 + ((n + 1) >> 1)
    else:
        norm, acc, bp = read_ncount(buf, (tree_pos + 1) * 8, 32)
        table = fse_build(norm, acc)
        stream_start = (bp + 7) // 8
        nbytes = (tree_pos + 1 + thdr) - stream_start
        bs = BwdStream(buf, stream_start, nbytes)
        s0 = bs.read(acc)
        s1 = bs.read(acc)
        if bs.left < 0:
            raise ValueError("weight stream too short for states")
        ws = []
        # zstd semantics (FSE_decompress tail loop): emit from a state, update
        # it; if the update consumed past the end (left < 0), emit the OTHER
        # state's symbol and stop.  Exactly-zero left continues.
        while len(ws) < 255:
            sym, nb, base = table[s0]
            ws.append(sym)
            v = bs.read(nb)
            if bs.left < 0:
                ws.append(table[s1][0])
                break
            s0 = base + v
            sym1, nb1, base1 = table[s1]
            ws.append(sym1)
            v1 = bs.read(nb1)
            if bs.left < 0:
                ws.append(table[s0][0])
                break
            s1 = base1 + v1
        tree_bytes = 1 + thdr
    # implied last weight: tableLog = highbit(total)+1 (STRICTLY greater
    # power of two — an exact power-of-two sum bumps the log; zstd
    # HUF_readStats / RFC 8878 §4.2.1.1)
    total = sum((1 << (w - 1)) for w in ws if w > 0)
    tl = total.bit_length()
    rest = (1 << tl) - total
    assert rest > 0 and (rest & (rest - 1)) == 0, (total, tl, rest)
    ws.append(rest.bit_length())
    return ws, tree_bytes


def huf_table(weights):
    """-> (table [(sym, nbits)] * 2^max_bits, max_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = (total).bit_length() - 1
    nb = {s: max_bits + 1 - w for s, w in enumerate(weights) if w > 0}
    # sort by weight ascending == nbits descending, symbol natural
    order = sorted(nb, key=lambda s: (-nb[s], s))
    table = []
    for s in order:
        table.extend([(s, nb[s])] * (1 << (max_bits - nb[s])))
    assert len(table) == 1 << max_bits
    return table, max_bits


def huf_decode_stream(buf, start, nbytes, count, table, max_bits):
    bs = BwdStream(buf, start, nbytes)
    out = bytearray()
    for _ in range(count):
        if bs.left >= max_bits:
            v = bits_fwd(buf, bs.base + bs.left - max_bits, max_bits)
        else:
            v = bits_fwd(buf, bs.base, bs.left) << (max_bits - bs.left)
        sym, nb = table[v]
        out.append(sym)
        bs.left -= nb
        if bs.left < 0:
            raise ValueError("literal stream underflow")
    if bs.left != 0:
        raise ValueError(f"literal stream leftover {bs.left}")
    return bytes(out)


def decode_frame(comp, verbose=False):
    fhd = comp[4]
    ss = (fhd >> 5) & 1
    if fhd & 3:
        raise ValueError("dictionary")
    pos = 5 + (0 if ss else 1)
    pos += [1 if ss else 0, 2, 4, 8][fhd >> 6]
    out = bytearray()
    rep = [1, 4, 8]
    huf = None
    last = 0
    while not last:
        bh = comp[pos] | comp[pos+1] << 8 | comp[pos+2] << 16
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        pos += 3
        if btype == 0:
            out += comp[pos:pos + bsize]
            pos += bsize
            continue
        if btype == 1:
            out += comp[pos:pos+1] * bsize
            pos += 1
            continue
        block_end = pos + bsize
        # literals
        lsh = comp[pos]
        lit_type, fmt = lsh & 3, (lsh >> 2) & 3
        if lit_type <= 1:
            if fmt == 1:
                hdr = 2
                regen = (lsh >> 4) | comp[pos+1] << 4
            elif fmt == 3:
                hdr = 3
                regen = (lsh >> 4) | comp[pos+1] << 4 | comp[pos+2] << 12
            else:
                hdr = 1
                regen = lsh >> 3
            if lit_type == 0:
                lits = bytes(comp[pos+hdr:pos+hdr+regen])
                lit_end = pos + hdr + regen
            else:
                lits = comp[pos+hdr:pos+hdr+1] * regen
                lit_end = pos + hdr + 1
        else:
            hdr, bits = (3, 10) if fmt <= 1 else (4, 14) if fmt == 2 else (5, 18)
            w = int.from_bytes(comp[pos:pos+5], "little")
            regen = (w >> 4) & ((1 << bits) - 1)
            csize = (w >> (4 + bits)) & ((1 << bits) - 1)
            four = fmt >= 1
            lit_end = pos + hdr + csize
            tree_pos = pos + hdr
            if lit_type == 2:
                ws, tree_bytes = huf_weights(comp, tree_pos)
                huf = huf_table(ws)
                spos = tree_pos + tree_bytes
            else:
                spos = tree_pos
            table, max_bits = huf
            if four:
                j1 = comp[spos] | comp[spos+1] << 8
                j2 = comp[spos+2] | comp[spos+3] << 8
                j3 = comp[spos+4] | comp[spos+5] << 8
                sbase = spos + 6
                tot = lit_end - sbase
                sizes = [j1, j2, j3, tot - j1 - j2 - j3]
                per = (regen + 3) // 4
                counts = [per, per, per, regen - 3 * per]
                lits = b""
                st = sbase
                for sz, cn in zip(sizes, counts):
                    lits += huf_decode_stream(comp, st, sz, cn, table, max_bits)
                    st += sz
            else:
                lits = huf_decode_stream(comp, spos, lit_end - spos, regen,
                                         table, max_bits)
        assert len(lits) == regen, (len(lits), regen)
        # sequences
        sq = lit_end
        b0 = comp[sq]
        if b0 < 128:
            nseq, sq = b0, sq + 1
        elif b0 < 255:
            nseq, sq = ((b0 - 128) << 8) + comp[sq+1], sq + 2
        else:
            nseq, sq = comp[sq+1] + (comp[sq+2] << 8) + 0x7F00, sq + 3
        if nseq == 0:
            out += lits
            pos = block_end
            continue
        scm = comp[sq]
        sq += 1
        tabs = {}
        for name, mode_sh, default, dacc, msym in (
                ("ll", 6, LL_DEF, 6, 35), ("of", 4, OF_DEF, 5, 31),
                ("ml", 2, ML_DEF, 6, 52)):
            mode = (scm >> mode_sh) & 3
            if mode == 0:
                tabs[name] = (fse_build(default, dacc), dacc)
            elif mode == 1:
                sym = comp[sq]
                sq += 1
                tabs[name] = ([(sym, 0, 0)], 0)
            elif mode == 2:
                norm, acc, bp = read_ncount(comp, sq * 8, msym + 1)
                tabs[name] = (fse_build(norm, acc), acc)
                sq = (bp + 7) // 8
            else:
                tabs[name] = tabs.get(name) or decode_frame._prev[name]
        decode_frame._prev = dict(tabs)
        bs = BwdStream(comp, sq, block_end - sq)
        (ll_t, ll_a), (of_t, of_a), (ml_t, ml_a) = tabs["ll"], tabs["of"], tabs["ml"]
        ll_s = bs.read(ll_a)
        of_s = bs.read(of_a)
        ml_s = bs.read(ml_a)
        lit_pos = 0
        seqs = []
        for i in range(nseq):
            ll_sym = ll_t[ll_s][0]
            of_sym = of_t[of_s][0]
            ml_sym = ml_t[ml_s][0]
            ofv = (1 << of_sym) + bs.read(of_sym)
            ml = ML_BASE[ml_sym] + bs.read(ML_BITS[ml_sym])
            ll = LL_BASE[ll_sym] + bs.read(LL_BITS[ll_sym])
            if ofv <= 3:
                ridx = ofv - 1 + (1 if ll == 0 else 0)
                if ridx == 0:
                    off = rep[0]
                elif ridx == 1:
                    off = rep[1]
                    rep[0], rep[1] = off, rep[0]
                elif ridx == 2:
                    off = rep[2]
                    rep[:] = [off, rep[0], rep[1]]
                else:
                    off = rep[0] - 1
                    rep[:] = [off, rep[0], rep[1]]
            else:
                off = ofv - 3
                rep[:] = [off, rep[0], rep[1]]
            seqs.append((ll, ml, off))
            out += lits[lit_pos:lit_pos + ll]
            lit_pos += ll
            for _ in range(ml):
                out.append(out[-off])
            if i + 1 < nseq:
                ll_s = ll_t[ll_s][2] + bs.read(ll_t[ll_s][1])
                ml_s = ml_t[ml_s][2] + bs.read(ml_t[ml_s][1])
                of_s = of_t[of_s][2] + bs.read(of_t[of_s][1])
        if bs.left != 0:
            raise ValueError(f"sequence stream leftover {bs.left}")
        out += lits[lit_pos:]
        pos = block_end
        if verbose:
            print("seqs:", seqs[:8])
    return bytes(out)
