"""Pallas/Mosaic Zstandard (RFC 8878) frame decoder: serial scalar walk.

TPU analog of the reference's Zstd decompress kernel
(``benchmarks/benchmark_zstd_chunked.cu``; LLIF decompress since 2.3,
``CHANGELOG.md:80``).  The scalar core parses the frame out of SMEM — FSE
table construction (symbol spread + per-entry nbits/baseline), the
normalized-count parser, Huffman weight decoding (direct nibbles or
FSE-compressed two-state interleave), single- and four-stream Huffman
literal decoding from backward bitstreams, and interleaved three-state FSE
sequence decoding with the repeat-offset history — while literal runs and
match copies execute as 128-byte VPU wild copies in VMEM
(:mod:`.bytecopy`).  Literals regenerate into a VMEM scratch buffer and are
consumed by the sequence executor.

Semantics mirror :mod:`tpucomp.formats.zstd` (and the pure-Python oracle
``tests/zstd_pyref.py``, itself validated against python-zstandard):
multi-block frames, raw/RLE/compressed blocks, all literal types incl.
treeless repeats, sequence table modes predefined/RLE/FSE/repeat, the
``literal_length == 0`` repeat-offset special case; content checksum parsed
but not verified.  Corrupt input yields per-chunk status and size 0, never
an out-of-bounds access (reference contract ``CHANGELOG.md:160-164``).

The wrapper targets the chunked regime (out_cap <= ~512 KiB; the batched
dispatch falls back to the XLA program above that, where the VMEM output
block would not fit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.ops.pallas import bytecopy as bc

MAGIC = 0xFD2FB528
MAGIC_I32 = MAGIC - (1 << 32)  # signed reinterpretation for int32 compare
HUF_CAP = 2048          # 2^11: literal Huffman max_bits <= 11
FSE_CAP = 512           # 2^9: sequence table accuracy logs <= 9
TAB_LL, TAB_OF, TAB_ML, TAB_W = 0, FSE_CAP, 2 * FSE_CAP, 3 * FSE_CAP
FSE_TOTAL = 3 * FSE_CAP + 64   # + weight-FSE table (acc <= 6)
LIT_BLOCK_MAX = 131072  # zstd block content limit

# RFC 8878 sequence code tables
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13,
                       14, 15, 16]
_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                              256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
                              65536]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12,
                       13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99,
                                 131, 259, 515, 1027, 2051, 4099, 8195, 16387,
                                 32771, 65539]
_LL_DEF = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
           2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_ML_DEF = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
           1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
           1, 1, -1, -1, -1, -1, -1, -1, -1]
_OF_DEF = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
           1, 1, -1, -1, -1, -1, -1]
LL_ACC_DEF, OF_ACC_DEF, ML_ACC_DEF = 6, 5, 6
N_LL, N_OF, N_ML = 36, 29, 53

# consts layout:
#   [0:36)    LL_BASE | LL_BITS << 20
#   [36:89)   ML_BASE | ML_BITS << 20
#   [89:125)  LL_DEF + 1
#   [125:154) OF_DEF + 1
#   [154:207) ML_DEF + 1
C_ML, C_LLD, C_OFD, C_MLD = 36, 89, 125, 154
_CONSTS = np.concatenate([
    np.array(_LL_BASE, np.int32) | (np.array(_LL_BITS, np.int32) << 20),
    np.array(_ML_BASE, np.int32) | (np.array(_ML_BITS, np.int32) << 20),
    np.array(_LL_DEF, np.int32) + 1,
    np.array(_OF_DEF, np.int32) + 1,
    np.array(_ML_DEF, np.int32) + 1,
]).astype(np.int32)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---- 16 MB-regime (big) executor geometry ----------------------------------
# Input streams through a window (zstd blocks are <= 128 KiB compressed, RFC
# 8878 Block_Maximum_Size), output through a sliding VMEM history window with
# DMA flushes to an HBM-resident result; matches reaching behind the window
# stage their source back in from the flushed HBM bytes.
IW_BYTES = 1 << 18          # input window (words in SMEM + byte lanes in VMEM)
IW_WORDS = IW_BYTES // 4
IW_ROWS = IW_BYTES // bc.BLK
BLOCK_CAP = 1 << 17         # RFC 8878 Block_Maximum_Size cap (128 KiB)
KEEP = 1 << 19              # output history kept in-window after a slide
SLIDE = 1 << 17             # slide/flush granularity (bytes)
S_ROWS = SLIDE // bc.BLK
MAXADV = BLOCK_CAP + 2048   # max op advance between checkpoints (+ wild pad)
BUF_ROWS = (KEEP + SLIDE + MAXADV) // bc.BLK + 48   # output window rows
# (+48: flush_tail reads whole 32-row chunks, rounding up past the content)
STAGE_CH = 32               # far-match staging DMA chunk (rows)
STAGE_NCH = 34
STAGE_ROWS = STAGE_CH * STAGE_NCH + 8


def _kernel(out_cap: int, lit_cap: int, w_words: int, big: bool,
            in_total: int,
            size_ref, consts_ref, words_ref, lanes_ref,
            out_ref, osize_ref, stat_ref,
            fse_ref, huf_ref, norm_ref, w_ref, lit_ref,
            posbase_ref=None, wwin_ref=None, lwin_ref=None, win_ref=None,
            stage_ref=None, sems=None):
    b = pl.program_id(0)
    csize = size_ref[b]

    # ---------------- big-regime window machinery ---------------------------
    if big:
        # flattened HBM layouts (1-D words, 2-D row lanes): per-chunk bases.
        # Mosaic requires 1-D HBM slices at 1024-element granularity and row
        # slices at 8-row granularity; all offsets below comply.
        # all HBM DMA offsets are written as q * tile so Mosaic can prove
        # tiling divisibility (words: 1024-element tiles; rows: 8-row tiles)
        in_kbase = b * (in_total // 4096)      # input base, 1024-word units
        in_rbase8 = b * (in_total // bc.BLK // 8)   # input base, 8-row units
        out_rows_pad = out_ref.shape[0] // pl.num_programs(0)
        out_rbase8 = b * (out_rows_pad // 8)   # output base, 8-row units

        def _load_input(nb):
            """DMA input window [nb, nb+IW) (nb 4 KiB-aligned) into SMEM
            words + VMEM byte lanes."""
            nk = jax.lax.shift_right_logical(nb, jnp.int32(12))
            d1 = pltpu.make_async_copy(
                words_ref.at[pl.ds((in_kbase + nk) * 1024, IW_WORDS)],
                wwin_ref.at[pl.ds(0, IW_WORDS)], sems.at[0])
            d1.start()
            d2 = pltpu.make_async_copy(
                lanes_ref.at[pl.ds((in_rbase8 + nk * 4) * 8, IW_ROWS), :],
                lwin_ref.at[0], sems.at[1])
            d2.start()
            d1.wait()
            d2.wait()
            posbase_ref[0] = nb

        def ensure_input(lo, hi):
            """Guarantee the input window covers [lo, hi) (hi - lo <=
            IW - 4 KiB by construction)."""
            ib = posbase_ref[0]
            need = jnp.logical_or(lo < ib, hi > ib + IW_BYTES)

            @pl.when(need)
            def _():
                nb = jax.lax.shift_left(
                    jax.lax.shift_right_logical(jnp.maximum(lo, 0),
                                                jnp.int32(12)), jnp.int32(12))
                _load_input(jnp.clip(nb, 0, in_total - IW_BYTES))

        def inrel(p):
            return p - posbase_ref[0]

        def orel(o):
            return o - posbase_ref[1]

        OUT = win_ref         # all output writes land in the sliding window
        ILANES = lwin_ref

        def checkpoint(op):
            """Flush + slide until op - win_base < KEEP + SLIDE."""
            opc = jnp.minimum(op, jnp.int32(out_cap))

            def cond(wb):
                return opc - wb >= KEEP + SLIDE

            def body(wb):
                w8 = jax.lax.shift_right_logical(wb, jnp.int32(10))
                d = pltpu.make_async_copy(
                    win_ref.at[0, pl.ds(0, S_ROWS), :],
                    out_ref.at[pl.ds((out_rbase8 + w8) * 8, S_ROWS), :],
                    sems.at[0])
                d.start()
                d.wait()
                win_ref[0, 0:BUF_ROWS - S_ROWS, :] = \
                    win_ref[0, S_ROWS:BUF_ROWS, :]
                posbase_ref[1] = wb + SLIDE
                return wb + SLIDE
            jax.lax.while_loop(cond, body, posbase_ref[1])

        def flush_tail(op):
            """Flush the window remainder [win_base, op) to HBM (in 32-row
            chunks; over-flushed junk rows are masked outside the kernel)."""
            wb = posbase_ref[1]
            opc = jnp.clip(op, wb, jnp.int32(out_cap))
            nch = jax.lax.shift_right_logical(
                ((opc - wb + bc.BLK - 1) >> 7) + STAGE_CH - 1,
                jnp.int32(5))
            w8 = jax.lax.shift_right_logical(wb, jnp.int32(10))

            def fb(i, c):
                d = pltpu.make_async_copy(
                    win_ref.at[0, pl.ds(i * STAGE_CH, STAGE_CH), :],
                    out_ref.at[pl.ds((out_rbase8 + w8 + i * 4) * 8,
                                     STAGE_CH), :],
                    sems.at[0])
                d.start()
                d.wait()
                return c
            jax.lax.fori_loop(jnp.int32(0), nch, fb, jnp.int32(0),
                              unroll=False)

        def far_copy(op, off, ml):
            """Match whose source starts below win_base: stage the flushed
            bytes back from HBM, then copy; any tail at/above win_base copies
            in-window (dst - src >= KEEP there, so multi-block is safe)."""
            wb = posbase_ref[1]
            src = op - off
            n1 = jnp.minimum(ml, wb - src)
            r8 = jax.lax.shift_right_logical(src, jnp.int32(10))
            boff = src - jax.lax.shift_left(r8, jnp.int32(10))
            nch = jax.lax.shift_right_logical(
                (((boff + n1 + bc.BLK - 1) >> 7) + 1) + STAGE_CH - 1,
                jnp.int32(5))

            def sb(i, c):
                d = pltpu.make_async_copy(
                    out_ref.at[pl.ds((out_rbase8 + r8 + i * 4) * 8,
                                     STAGE_CH), :],
                    stage_ref.at[0, pl.ds(i * STAGE_CH, STAGE_CH), :],
                    sems.at[1])
                d.start()
                d.wait()
                return c
            jax.lax.fori_loop(jnp.int32(0), nch, sb, jnp.int32(0),
                              unroll=False)
            bc.copy_bytes(stage_ref, win_ref, boff, orel(op), n1)
            n2 = ml - n1

            @pl.when(n2 > 0)
            def _():
                bc.copy_bytes(win_ref, win_ref, orel(wb), orel(op) + n1, n2)

        _load_input(jnp.int32(0))
        posbase_ref[1] = jnp.int32(0)
    else:
        def inrel(p):
            return p

        def orel(o):
            return o

        def ensure_input(lo, hi):
            pass

        def checkpoint(op):
            pass

        OUT = out_ref
        ILANES = lanes_ref

    def load32(i):
        # clamp: corrupt streams can drive bit positions arbitrarily far out
        # before the error flag unwinds the loop
        wi = jnp.clip(inrel(i) >> 2, jnp.int32(0), jnp.int32(w_words - 2))
        if big:
            w0 = wwin_ref[wi]
            w1 = wwin_ref[wi + 1]
        else:
            w0 = words_ref[0, 0, wi]
            w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w1, 31 - sh), jnp.int32(1))
        return lo | hi

    def getb(i):
        wi = jnp.clip(inrel(jnp.maximum(i, 0)) >> 2, jnp.int32(0),
                      jnp.int32(w_words - 1))
        if big:
            w = wwin_ref[wi]
        else:
            w = words_ref[0, 0, wi]
        return jax.lax.shift_right_logical(w, (i & 3) * 8) & 0xFF

    def peek_v(pos, n):
        """0 <= n <= 15 bits at forward bit position pos (>= 0)."""
        w = load32(jax.lax.shift_right_logical(pos, jnp.int32(3)))
        w = jax.lax.shift_right_logical(w, pos & 7)
        return w & (jax.lax.shift_left(jnp.int32(1), n) - 1)

    def peek_w(pos, n):
        """0 <= n <= 30 bits (two-part)."""
        lo = peek_v(pos, jnp.minimum(n, 15))
        hi = peek_v(pos + 15, jnp.maximum(n - 15, 0))
        return lo | jax.lax.shift_left(hi, jnp.int32(15))

    def bitlen(x, hi=20):
        """bit_length of x in [0, 2^hi)."""
        r = jnp.int32(0)
        for k in range(hi):
            r = r + (x >= (1 << k)).astype(jnp.int32)
        return r

    def bwd_read(base_bits, left, n):
        """Read the top n (<= 30) bits of a backward stream -> (v, left - n).
        Underflow (left < n) zero-pads from the bottom, pyref semantics.
        One window read serves both cases: position, width, and post-shift
        are parameterized instead of computing both variants."""
        left2 = left - n
        under = left2 < 0
        pos = base_bits + jnp.maximum(left2, 0)
        nn = jnp.where(under, jnp.maximum(n + left2, 0), n)
        sh = jnp.where(under, jnp.clip(-left2, 0, 30), 0)
        v = jax.lax.shift_left(peek_w(pos, nn), sh)
        return jnp.where(n > 0, v, 0), left2

    def bwd_init(start_byte, nbytes):
        """-> (base_bits, left, err): locate the padding bit."""
        lastb = getb(start_byte + nbytes - 1)
        e = jnp.logical_or(nbytes <= 0, lastb == 0)
        hb = bitlen(lastb, 8) - 1
        return start_byte * 8, (nbytes - 1) * 8 + hb, e

    def wr_out(o, v):
        bc.store128_wild(OUT, orel(o),
                         jnp.broadcast_to(v, (1, bc.BLK)).astype(jnp.int32))

    def wr_lit(o, v):
        bc.store128_wild(lit_ref, o,
                         jnp.broadcast_to(v, (1, bc.BLK)).astype(jnp.int32))

    # ---------------- FSE machinery -----------------------------------------
    def fse_build(nsym, acc, tbase):
        """Build from norm_ref[0:nsym] into fse_ref[tbase:tbase+2^acc].
        Destroys norm_ref (reused as the per-symbol next-state counters)."""
        size = jax.lax.shift_left(jnp.int32(1), acc)

        def less1(s, h):
            is_m1 = norm_ref[s] == -1

            @pl.when(is_m1)
            def _():
                fse_ref[tbase + h] = s
            return h - is_m1.astype(jnp.int32)
        high = jax.lax.fori_loop(jnp.int32(0), nsym, less1, size - 1,
                                 unroll=False)

        step = jax.lax.shift_right_logical(size, jnp.int32(1)) \
            + jax.lax.shift_right_logical(size, jnp.int32(3)) + 3

        def spread(s, p):
            cnt = jnp.maximum(norm_ref[s], 0)

            def scond(st):
                k, p2 = st
                return k < cnt

            def sbody(st):
                k, p2 = st
                fse_ref[tbase + p2] = s

                def skip_cond(p3):
                    return p3 > high

                def skip_body(p3):
                    return (p3 + step) & (size - 1)
                p2 = jax.lax.while_loop(skip_cond, skip_body,
                                        (p2 + step) & (size - 1))
                return k + 1, p2
            _, p = jax.lax.while_loop(scond, sbody, (jnp.int32(0), p))
            return p
        jax.lax.fori_loop(jnp.int32(0), nsym, spread, jnp.int32(0),
                          unroll=False)

        def mknext(s, c):
            n = norm_ref[s]
            norm_ref[s] = jnp.where(n == -1, 1, jnp.maximum(n, 0))
            return c
        jax.lax.fori_loop(jnp.int32(0), nsym, mknext, jnp.int32(0),
                          unroll=False)

        def entry(i, c):
            s = fse_ref[tbase + i]
            x = norm_ref[s]
            norm_ref[s] = x + 1
            nb = acc - (bitlen(x, 11) - 1)
            base = jax.lax.shift_left(x, nb) - size
            fse_ref[tbase + i] = jax.lax.shift_left(base, jnp.int32(16)) \
                | jax.lax.shift_left(nb, jnp.int32(8)) | s
            return c
        jax.lax.fori_loop(jnp.int32(0), size, entry, jnp.int32(0),
                          unroll=False)

    def load_def_norm(coff, n):
        def cp(s, c):
            norm_ref[s] = consts_ref[coff + s] - 1
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), cp, jnp.int32(0),
                          unroll=False)

    def read_ncount(bp, max_sym):
        """-> (acc, next_bp, err); counts into norm_ref[0:] (tail zeroed)."""
        acc = peek_v(bp, jnp.int32(4)) + 5
        err = acc > 9

        def zn(s, c):
            norm_ref[s] = jnp.int32(0)
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(64), zn, jnp.int32(0),
                          unroll=False)

        def cond(s):
            bp2, rem, n, prev0, e = s
            return jnp.logical_and(jnp.logical_not(e),
                                   jnp.logical_and(rem > 1, n <= max_sym))

        def body(s):
            bp2, rem, n, prev0, e = s

            def zeros(a):
                bp3, n2 = a

                def zcond(st):
                    bp4, n3, r = st
                    return r == 3

                def zbody(st):
                    bp4, n3, _ = st
                    r = peek_v(bp4, jnp.int32(2))
                    n3 = jnp.minimum(n3 + jnp.minimum(r, 3), jnp.int32(63))
                    return bp4 + 2, n3, r
                bp3, n2, _ = jax.lax.while_loop(zcond, zbody,
                                                (bp3, n2, jnp.int32(3)))
                return bp3, n2

            bp2, n = jax.lax.cond(prev0, zeros, lambda a: a, (bp2, n))
            stop = jnp.logical_or(rem <= 1, n > max_sym)

            def rd(a):
                bp3, rem2, n2 = a
                nbb = bitlen(rem2, 11)
                thr = jax.lax.shift_left(jnp.int32(1),
                                         jnp.maximum(nbb - 1, 0))
                mx = 2 * thr - 1 - rem2
                v = peek_v(bp3, nbb)
                low = v & (thr - 1)
                takes_low = low < mx
                cnt = jnp.where(takes_low, low,
                                jnp.where(v >= thr, v - mx, v)) - 1
                bp3 = bp3 + jnp.where(takes_low, nbb - 1, nbb)
                rem2 = rem2 - jnp.where(cnt < 0, -cnt, cnt)
                norm_ref[jnp.minimum(n2, jnp.int32(63))] = cnt
                return bp3, rem2, n2 + 1, cnt == 0

            bp2, rem, n, p0 = jax.lax.cond(
                stop, lambda a: (a[0], a[1], a[2], jnp.bool_(False)), rd,
                (bp2, rem, n))
            prev0 = jnp.logical_and(jnp.logical_not(stop), p0)
            # a stop inside the body ends the loop via rem/n conditions
            return bp2, rem, n, prev0, e

        bp, rem, n, _, err = jax.lax.while_loop(
            cond, body,
            (bp + 4, jax.lax.shift_left(jnp.int32(1), acc) + 1, jnp.int32(0),
             jnp.bool_(False), err))
        err = jnp.logical_or(err, rem != 1)
        return acc, bp, n, err

    # ---------------- Huffman literals ---------------------------------------
    def huf_weights(tree_pos):
        """weights into w_ref -> (n_weights incl. implied, tree_bytes, err)."""
        thdr = getb(tree_pos)

        def direct(_):
            n = thdr - 127

            def rw(i, c):
                by = getb(tree_pos + 1 + jax.lax.shift_right_logical(
                    i, jnp.int32(1)))
                w_ref[i] = jnp.where((i & 1) == 0,
                                     jax.lax.shift_right_logical(
                                         by, jnp.int32(4)), by & 0xF)
                return c
            jax.lax.fori_loop(jnp.int32(0), n, rw, jnp.int32(0),
                              unroll=False)
            return n, 1 + jax.lax.shift_right_logical(n + 1, jnp.int32(1)), \
                jnp.bool_(False)

        def fse_path(_):
            acc, bp, nsym, e = read_ncount((tree_pos + 1) * 8, jnp.int32(32))
            e = jnp.logical_or(e, acc > 6)

            @pl.when(jnp.logical_not(e))
            def _():
                fse_build(nsym, acc, jnp.int32(TAB_W))

            stream_start = jax.lax.shift_right_logical(bp + 7, jnp.int32(3))
            nbytes = tree_pos + 1 + thdr - stream_start
            base, left, e2 = bwd_init(stream_start, nbytes)
            e = jnp.logical_or(e, e2)
            s0, left = bwd_read(base, left, acc)
            s1, left = bwd_read(base, left, acc)
            e = jnp.logical_or(e, left < 0)

            # two-state interleave; on underflow emit the OTHER state and stop
            def wcond(st):
                n, s0, s1, left, stop, e3 = st
                return jnp.logical_and(jnp.logical_not(stop), n < 255)

            def wbody(st):
                n, s0, s1, left, stop, e3 = st

                def one(n, sa, sb, left):
                    ent = fse_ref[TAB_W + sa]
                    w_ref[n] = ent & 0xFF
                    n = n + 1
                    v, left = bwd_read(base, left,
                                       jax.lax.shift_right_logical(
                                           ent, jnp.int32(8)) & 0xFF)
                    fin = left < 0

                    @pl.when(fin)
                    def _():
                        w_ref[n] = fse_ref[TAB_W + sb] & 0xFF
                    sa = jnp.where(
                        fin, sa,
                        (jax.lax.shift_right_logical(ent, jnp.int32(16))
                         & 0xFFFF) + v)
                    return n + fin.astype(jnp.int32), sa, left, fin

                n, s0, left, fin0 = one(n, s0, s1, left)

                def second(a):
                    n, s1, left = a
                    return one(n, s1, s0, left)

                n, s1, left, fin1 = jax.lax.cond(
                    fin0, lambda a: (a[0], a[1], a[2], jnp.bool_(True)),
                    second, (n, s1, left))
                return n, s0, s1, left, jnp.logical_or(fin0, fin1), e3

            n, _, _, _, _, e = jax.lax.while_loop(
                wcond, wbody,
                (jnp.int32(0), s0, s1, left, e, e))
            return n, 1 + thdr, e

        n, tree_bytes, e = jax.lax.cond(thdr >= 128, direct, fse_path, 0)
        n = jnp.minimum(n, jnp.int32(255))

        # implied last weight
        def tot(i, t):
            w = w_ref[i]
            return t + jnp.where(
                w > 0, jax.lax.shift_left(jnp.int32(1),
                                          jnp.minimum(w, 12) - 1), 0)
        total = jax.lax.fori_loop(jnp.int32(0), n, tot, jnp.int32(0),
                                  unroll=False)
        e = jnp.logical_or(e, total <= 0)
        # tableLog = highbit(total)+1 (strictly-greater power of two; an
        # exact power-of-two sum bumps the log — zstd HUF_readStats).
        tl = bitlen(total)
        rest = jax.lax.shift_left(jnp.int32(1), tl) - total
        e = jnp.logical_or(e, rest <= 0)
        e = jnp.logical_or(e, (rest & (rest - 1)) != 0)
        w_ref[n] = bitlen(rest)
        return n + 1, tree_bytes, e

    def huf_build(nw):
        """w_ref[0:nw] -> huf_ref table; returns (max_bits, err)."""
        def tot(i, t):
            w = w_ref[i]
            return t + jnp.where(
                w > 0, jax.lax.shift_left(jnp.int32(1),
                                          jnp.minimum(w, 12) - 1), 0)
        total = jax.lax.fori_loop(jnp.int32(0), nw, tot, jnp.int32(0),
                                  unroll=False)
        max_bits = bitlen(total) - 1
        e = jnp.logical_or(max_bits < 1, max_bits > 11)
        size = jax.lax.shift_left(jnp.int32(1), jnp.maximum(max_bits, 1))

        def z(i, c):
            huf_ref[i] = jnp.int32(0)
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(HUF_CAP), z, jnp.int32(0),
                          unroll=False)

        # fill ascending weight (= descending nbits), symbol ascending
        def per_w(w, p):
            def per_s(s, p2):
                take = w_ref[s] == w
                run = jax.lax.shift_left(jnp.int32(1),
                                         jnp.minimum(w, 12) - 1)
                nb = max_bits + 1 - w
                ent = jax.lax.shift_left(s, jnp.int32(8)) | nb
                okf = jnp.logical_and(take, p2 + run <= size)

                def fill(k, c):
                    @pl.when(okf)
                    def _():
                        huf_ref[p2 + k] = ent
                    return c
                jax.lax.fori_loop(jnp.int32(0),
                                  jnp.where(take, run, 0), fill,
                                  jnp.int32(0), unroll=False)
                return p2 + jnp.where(take, run, 0)
            return jax.lax.fori_loop(jnp.int32(0), nw, per_s, p,
                                     unroll=False)
        p = jax.lax.fori_loop(jnp.int32(1), jnp.int32(13), per_w,
                              jnp.int32(0), unroll=False)
        e = jnp.logical_or(e, p != size)
        return max_bits, e

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, bc.BLK), 1)

    def flush_lits(p, pend, np_, e):
        """Write np_ (1..4) pending literal bytes packed in pend at lit
        position p with ONE composed wild store."""
        v = jnp.where(
            lane128 == 0, pend & 0xFF,
            jnp.where(lane128 == 1,
                      jax.lax.shift_right_logical(pend, jnp.int32(8)) & 0xFF,
                      jnp.where(lane128 == 2,
                                jax.lax.shift_right_logical(
                                    pend, jnp.int32(16)) & 0xFF,
                                jax.lax.shift_right_logical(
                                    pend, jnp.int32(24)) & 0xFF)))

        @pl.when(jnp.logical_and(np_ > 0, jnp.logical_not(e)))
        def _():
            bc.store128_wild(lit_ref, p, v.astype(jnp.int32))

    def huf_stream(start_byte, nbytes, count, dst, max_bits):
        """Decode one backward Huffman stream into lit_ref[dst:dst+count]
        (literal bytes flush four-per-store)."""
        base, left, e = bwd_init(start_byte, nbytes)

        def cond(s):
            i, left, e2, pend, np_ = s
            return jnp.logical_and(jnp.logical_not(e2), i < count)

        def body(s):
            i, left, e2, pend, np_ = s
            nn = jnp.minimum(jnp.maximum(left, 0), max_bits)
            v = jax.lax.shift_left(
                peek_w(base + jnp.maximum(left - max_bits, 0), nn),
                max_bits - nn)
            ent = huf_ref[v]
            nb = ent & 0xFF
            e2 = jnp.logical_or(e2, nb == 0)
            pend = pend | jax.lax.shift_left(
                jax.lax.shift_right_logical(ent, jnp.int32(8)), 8 * np_)
            np_ = np_ + 1
            i = i + 1

            def fl(a):
                pend, np_ = a
                flush_lits(dst + i - 4, pend, jnp.int32(4), e2)
                return jnp.int32(0), jnp.int32(0)
            pend, np_ = jax.lax.cond(np_ == 4, fl, lambda a: a, (pend, np_))
            left = left - nb
            e2 = jnp.logical_or(e2, left < 0)
            return i, left, e2, pend, np_

        i, left, e, pend, np_ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), left, e, jnp.int32(0), jnp.int32(0)))
        flush_lits(dst + i - np_, pend, np_, e)
        return jnp.logical_or(e, left != 0)

    def flush_lits_masked(p, pend, np_, e):
        """Interleaved-writer flush: exact-width store (wild junk would land
        on bytes a NEIGHBORING stream already produced)."""
        v = jnp.where(
            lane128 == 0, pend & 0xFF,
            jnp.where(lane128 == 1,
                      jax.lax.shift_right_logical(pend, jnp.int32(8)) & 0xFF,
                      jnp.where(lane128 == 2,
                                jax.lax.shift_right_logical(
                                    pend, jnp.int32(16)) & 0xFF,
                                jax.lax.shift_right_logical(
                                    pend, jnp.int32(24)) & 0xFF)))

        @pl.when(jnp.logical_and(np_ > 0, jnp.logical_not(e)))
        def _():
            bc.store128_masked(lit_ref, p, v.astype(jnp.int32), np_)

    def huf_streams4(sbase, j1, j2, j3, j4, per, cl, max_bits):
        """Decode the FOUR backward literal streams interleaved: four
        independent dependency chains per iteration hide the scalar core's
        in-order SMEM load latency behind one another (streams are fully
        independent by construction — that is why the format has four)."""
        base0, l0, ea = bwd_init(sbase, j1)
        base1, l1, eb = bwd_init(sbase + j1, j2)
        base2, l2, ec = bwd_init(sbase + j1 + j2, j3)
        base3, l3, ed = bwd_init(sbase + j1 + j2 + j3, j4)

        def sym1(bb, left, pend, np_, dst, i, e):
            nn = jnp.minimum(jnp.maximum(left, 0), max_bits)
            v = jax.lax.shift_left(
                peek_w(bb + jnp.maximum(left - max_bits, 0), nn),
                max_bits - nn)
            ent = huf_ref[v]
            nb = ent & 0xFF
            e = jnp.logical_or(e, nb == 0)
            pend = pend | jax.lax.shift_left(
                jax.lax.shift_right_logical(ent, jnp.int32(8)), 8 * np_)
            np_ = np_ + 1

            def fl(a):
                pend, np_ = a
                flush_lits_masked(dst + i + 1 - 4, pend, jnp.int32(4), e)
                return jnp.int32(0), jnp.int32(0)
            pend, np_ = jax.lax.cond(np_ == 4, fl, lambda a: a, (pend, np_))
            left = left - nb
            return left, pend, np_, jnp.logical_or(e, left < 0)

        z = jnp.int32(0)

        def cond(s):
            return s[0] < cl

        def body(s):
            (i, l0, l1, l2, l3, p0, p1, p2, p3, n0, n1, n2, n3,
             ea, eb, ec, ed) = s
            l0, p0, n0, ea = sym1(base0, l0, p0, n0, z, i, ea)
            l1, p1, n1, eb = sym1(base1, l1, p1, n1, per, i, eb)
            l2, p2, n2, ec = sym1(base2, l2, p2, n2, 2 * per, i, ec)
            l3, p3, n3, ed = sym1(base3, l3, p3, n3, 3 * per, i, ed)
            return (i + 1, l0, l1, l2, l3, p0, p1, p2, p3, n0, n1, n2, n3,
                    ea, eb, ec, ed)

        (i, l0, l1, l2, l3, p0, p1, p2, p3, n0, n1, n2, n3,
         ea, eb, ec, ed) = jax.lax.while_loop(
            cond, body, (z, l0, l1, l2, l3, z, z, z, z, z, z, z, z,
                         ea, eb, ec, ed))

        # streams 1-3 may carry up to 3 more symbols than the fourth
        def drain(bb, left, pend, np_, dst, e):
            def dcond(s):
                return s[0] < per

            def dbody(s):
                i, left, pend, np_, e = s
                left, pend, np_, e = sym1(bb, left, pend, np_, dst, i, e)
                return i + 1, left, pend, np_, e

            i, left, pend, np_, e = jax.lax.while_loop(
                dcond, dbody, (cl, left, pend, np_, e))
            flush_lits_masked(dst + i - np_, pend, np_, e)
            return jnp.logical_or(e, left != 0)

        ea = drain(base0, l0, p0, n0, z, ea)
        eb = drain(base1, l1, p1, n1, per, eb)
        ec = drain(base2, l2, p2, n2, 2 * per, ec)
        flush_lits_masked(3 * per + i - n3, p3, n3, ed)
        ed = jnp.logical_or(ed, l3 != 0)
        return jnp.logical_or(jnp.logical_or(ea, eb),
                              jnp.logical_or(ec, ed))

    # ---------------- frame header -------------------------------------------
    err0 = csize < 5
    magic = (getb(jnp.int32(0)) | (getb(jnp.int32(1)) << 8)
             | (getb(jnp.int32(2)) << 16) | (getb(jnp.int32(3)) << 24))
    err0 = jnp.logical_or(err0, magic != jnp.int32(MAGIC_I32))
    fhd = getb(jnp.int32(4))
    err0 = jnp.logical_or(err0, ((fhd >> 3) & 1) == 1)  # reserved bit
    err0 = jnp.logical_or(err0, (fhd & 3) != 0)         # dictionaries
    single_seg = (fhd >> 5) & 1
    fcs_flag = fhd >> 6
    pos0 = 5 + jnp.where(single_seg == 1, 0, 1)
    pos0 = pos0 + jnp.where(
        fcs_flag == 0, jnp.where(single_seg == 1, 1, 0),
        jnp.where(fcs_flag == 1, 2, jnp.where(fcs_flag == 2, 4, 8)))

    # predefined sequence tables so repeat-mode in the first block resolves
    # exactly as the XLA path does
    load_def_norm(jnp.int32(C_LLD), N_LL)
    fse_build(jnp.int32(N_LL), jnp.int32(LL_ACC_DEF), jnp.int32(TAB_LL))
    load_def_norm(jnp.int32(C_OFD), N_OF)
    fse_build(jnp.int32(N_OF), jnp.int32(OF_ACC_DEF), jnp.int32(TAB_OF))
    load_def_norm(jnp.int32(C_MLD), N_ML)
    fse_build(jnp.int32(N_ML), jnp.int32(ML_ACC_DEF), jnp.int32(TAB_ML))

    # ---------------- block loop ---------------------------------------------
    # state: pos, op, err, done, rep0-2, accs, huf_bits
    def blk_cond(s):
        return jnp.logical_and(jnp.logical_not(jnp.logical_or(s[2], s[3])),
                               s[0] + 3 <= csize)

    def blk_body(s):
        (pos, op, err, done, r0, r1, r2, ll_a, of_a, ml_a, hbits) = s
        if big:
            ensure_input(pos, pos + 8)
        bh = getb(pos) | (getb(pos + 1) << 8) | (getb(pos + 2) << 16)
        last = (bh & 1) > 0
        btype = jax.lax.shift_right_logical(bh, jnp.int32(1)) & 3
        bsize = jax.lax.shift_right_logical(bh, jnp.int32(3))
        pos = pos + 3
        err = jnp.logical_or(err, btype == 3)
        # RFC 8878 Block_Maximum_Size: both compressed and regenerated block
        # sizes are <= 128 KiB — and the big regime's windows rely on it
        err = jnp.logical_or(err, bsize > BLOCK_CAP)
        if big:
            ensure_input(pos - 3,
                         pos + jnp.minimum(bsize, BLOCK_CAP) + 5)
            checkpoint(op)

        def raw_blk(a):
            pos, op, err = a[0], a[1], a[2]
            err = jnp.logical_or(err, pos + bsize > csize)
            ok = jnp.logical_and(jnp.logical_not(err), op + bsize <= out_cap)

            @pl.when(jnp.logical_and(ok, bsize > 0))
            def _():
                bc.copy_bytes(ILANES, OUT, inrel(pos), orel(op), bsize)
            return (pos + bsize, op + bsize, err) + a[3:]

        def rle_blk(a):
            pos, op, err = a[0], a[1], a[2]
            err = jnp.logical_or(err, pos + 1 > csize)
            byte = getb(pos)
            ok = jnp.logical_and(jnp.logical_not(err), op + bsize <= out_cap)
            rows = jax.lax.shift_right_logical(bsize + bc.BLK - 1,
                                               jnp.int32(7))

            def fr(k, c):
                @pl.when(ok)
                def _():
                    wr_out(op + k * bc.BLK, byte)
                return c
            jax.lax.fori_loop(jnp.int32(0), rows, fr, jnp.int32(0),
                              unroll=False)
            return (pos + 1, op + bsize, err) + a[3:]

        def comp_blk(a):
            (pos, op, err, r0, r1, r2, ll_a, of_a, ml_a, hbits) = a
            block_end = pos + bsize
            err = jnp.logical_or(err, block_end > csize)

            # ---- literals section ----------------------------------------
            lsh = getb(pos)
            lit_type = lsh & 3
            fmt = jax.lax.shift_right_logical(lsh, jnp.int32(2)) & 3

            def raw_rle_lits(st):
                pos, err, hbits2 = st
                hdr = jnp.where(fmt == 1, 2, jnp.where(fmt == 3, 3, 1))
                regen = jnp.where(
                    fmt == 1,
                    jax.lax.shift_right_logical(lsh, jnp.int32(4))
                    | (getb(pos + 1) << 4),
                    jnp.where(
                        fmt == 3,
                        jax.lax.shift_right_logical(lsh, jnp.int32(4))
                        | (getb(pos + 1) << 4) | (getb(pos + 2) << 12),
                        jax.lax.shift_right_logical(lsh, jnp.int32(3))))
                err2 = jnp.logical_or(err, regen > lit_cap)
                is_raw = lit_type == 0
                err2 = jnp.logical_or(
                    err2, jnp.where(is_raw, pos + hdr + regen,
                                    pos + hdr + 1) > block_end)

                @pl.when(jnp.logical_and(jnp.logical_not(err2),
                                         jnp.logical_and(is_raw, regen > 0)))
                def _():
                    bc.copy_bytes(ILANES, lit_ref, inrel(pos + hdr),
                                  jnp.int32(0), regen)

                rows = jax.lax.shift_right_logical(regen + bc.BLK - 1,
                                                   jnp.int32(7))
                byte = getb(pos + hdr)

                def fr(k, c):
                    @pl.when(jnp.logical_and(jnp.logical_not(err2),
                                             jnp.logical_not(is_raw)))
                    def _():
                        wr_lit(k * bc.BLK, byte)
                    return c
                jax.lax.fori_loop(jnp.int32(0), rows, fr, jnp.int32(0),
                                  unroll=False)
                lit_end = jnp.where(is_raw, pos + hdr + regen, pos + hdr + 1)
                return lit_end, regen, err2, hbits2

            def huf_lits(st):
                pos, err, hbits2 = st
                hdr = jnp.where(fmt <= 1, 3, jnp.where(fmt == 2, 4, 5))
                bits = jnp.where(fmt <= 1, 10, jnp.where(fmt == 2, 14, 18))
                w32 = (getb(pos) | (getb(pos + 1) << 8)
                       | (getb(pos + 2) << 16) | (getb(pos + 3) << 24))
                b4 = getb(pos + 4)
                mask = jax.lax.shift_left(jnp.int32(1), bits) - 1
                regen = jax.lax.shift_right_logical(w32, jnp.int32(4)) & mask
                sh = 4 + bits
                cs = (jax.lax.shift_right_logical(
                    jax.lax.shift_right_logical(w32, sh - 1), jnp.int32(1))
                    | jax.lax.shift_left(b4, 32 - sh)) & mask
                four = fmt >= 1
                lit_end = pos + hdr + cs
                tree_pos = pos + hdr
                err2 = jnp.logical_or(err, regen > lit_cap)
                err2 = jnp.logical_or(err2, lit_end > block_end)

                def with_tree(e3):
                    nw, tree_bytes, e4 = huf_weights(tree_pos)
                    e4 = jnp.logical_or(e3, e4)
                    mb, e5 = huf_build(nw)
                    return tree_pos + tree_bytes, mb, \
                        jnp.logical_or(e4, e5)

                def treeless(e3):
                    return tree_pos, hbits2, \
                        jnp.logical_or(e3, hbits2 == 0)

                spos, mb, err2 = jax.lax.cond(
                    jnp.logical_or(lit_type == 3, err2), treeless,
                    with_tree, err2)

                def four_streams(e3):
                    j1 = getb(spos) | (getb(spos + 1) << 8)
                    j2 = getb(spos + 2) | (getb(spos + 3) << 8)
                    j3 = getb(spos + 4) | (getb(spos + 5) << 8)
                    sbase = spos + 6
                    tot = lit_end - sbase
                    j4 = tot - j1 - j2 - j3
                    e3 = jnp.logical_or(e3, j4 <= 0)
                    per = jax.lax.shift_right_logical(regen + 3, jnp.int32(2))
                    cl = regen - 3 * per
                    e3 = jnp.logical_or(e3, cl < 0)

                    def go(e4):
                        return jnp.logical_or(
                            e4, huf_streams4(sbase, j1, j2, j3, j4, per, cl,
                                             mb))
                    return jax.lax.cond(e3, lambda e4: e4, go, e3)

                def one_stream(e3):
                    return jax.lax.cond(
                        e3, lambda e4: e4,
                        lambda e4: jnp.logical_or(
                            e4, huf_stream(spos, lit_end - spos, regen,
                                           jnp.int32(0), mb)), e3)

                err2 = jax.lax.cond(four, four_streams, one_stream, err2)
                return lit_end, regen, err2, mb

            lit_end, regen, err, hbits = jax.lax.cond(
                lit_type <= 1, raw_rle_lits, huf_lits, (pos, err, hbits))

            # ---- sequences section ---------------------------------------
            b0 = getb(lit_end)
            nseq = jnp.where(
                b0 < 128, b0,
                jnp.where(b0 < 255,
                          jax.lax.shift_left(b0 - 128, jnp.int32(8))
                          + getb(lit_end + 1),
                          getb(lit_end + 1) + (getb(lit_end + 2) << 8)
                          + 0x7F00))
            sq = lit_end + jnp.where(b0 < 128, 1, jnp.where(b0 < 255, 2, 3))

            def no_seqs(st):
                op, err, r0, r1, r2, ll_a, of_a, ml_a = st
                ok = jnp.logical_and(jnp.logical_not(err),
                                     op + regen <= out_cap)

                @pl.when(jnp.logical_and(ok, regen > 0))
                def _():
                    bc.copy_bytes(lit_ref, OUT, jnp.int32(0), orel(op), regen)
                return op + regen, err, r0, r1, r2, ll_a, of_a, ml_a

            def with_seqs(st):
                op, err, r0, r1, r2, ll_a, of_a, ml_a = st
                scm = getb(sq)
                sq2 = sq + 1
                err = jnp.logical_or(err, (scm & 3) != 0)  # reserved bits

                def table(sq2, err, mode_sh, tbase, dacc, dcoff, dn, msym,
                          cur_acc):
                    mode = jax.lax.shift_right_logical(scm, mode_sh) & 3

                    def m0(a):
                        sq3, e = a
                        load_def_norm(dcoff, dn)
                        fse_build(dn, dacc, tbase)
                        return sq3, e, dacc

                    def m1(a):
                        sq3, e = a
                        sym = getb(sq3)
                        e = jnp.logical_or(e, sym > msym)
                        fse_ref[tbase] = sym
                        return sq3 + 1, e, jnp.int32(0)

                    def m2(a):
                        sq3, e = a
                        acc, bp, nsym, e2 = read_ncount(sq3 * 8, msym)
                        e = jnp.logical_or(e, e2)

                        @pl.when(jnp.logical_not(e))
                        def _():
                            fse_build(nsym, acc, tbase)
                        return jax.lax.shift_right_logical(bp + 7,
                                                           jnp.int32(3)), \
                            e, acc

                    def m3(a):
                        sq3, e = a
                        return sq3, e, cur_acc

                    return jax.lax.cond(
                        mode < 2,
                        lambda a: jax.lax.cond(mode == 0, m0, m1, a),
                        lambda a: jax.lax.cond(mode == 2, m2, m3, a),
                        (sq2, err))

                sq2, err, ll_a = table(sq2, err, jnp.int32(6),
                                       jnp.int32(TAB_LL),
                                       jnp.int32(LL_ACC_DEF),
                                       jnp.int32(C_LLD), jnp.int32(N_LL),
                                       jnp.int32(35), ll_a)
                sq2, err, of_a = table(sq2, err, jnp.int32(4),
                                       jnp.int32(TAB_OF),
                                       jnp.int32(OF_ACC_DEF),
                                       jnp.int32(C_OFD), jnp.int32(N_OF),
                                       jnp.int32(31), of_a)
                sq2, err, ml_a = table(sq2, err, jnp.int32(2),
                                       jnp.int32(TAB_ML),
                                       jnp.int32(ML_ACC_DEF),
                                       jnp.int32(C_MLD), jnp.int32(N_ML),
                                       jnp.int32(52), ml_a)

                base, left, e2 = bwd_init(sq2, block_end - sq2)
                err = jnp.logical_or(err, e2)
                ll_s, left = bwd_read(base, left, ll_a)
                of_s, left = bwd_read(base, left, of_a)
                ml_s, left = bwd_read(base, left, ml_a)
                err = jnp.logical_or(err, left < 0)

                def scond(st2):
                    return jnp.logical_and(jnp.logical_not(st2[7]),
                                           st2[0] < nseq)

                def sbody(st2):
                    (i, left, ll_s, of_s, ml_s, lit_pos, op, e3,
                     r0, r1, r2) = st2
                    ll_e = fse_ref[TAB_LL + ll_s]
                    of_e = fse_ref[TAB_OF + of_s]
                    ml_e = fse_ref[TAB_ML + ml_s]
                    of_sym = of_e & 0xFF
                    e3 = jnp.logical_or(e3, of_sym > 30)
                    ofb, left = bwd_read(base, left,
                                         jnp.minimum(of_sym, jnp.int32(30)))
                    ofv = jax.lax.shift_left(
                        jnp.int32(1), jnp.minimum(of_sym, jnp.int32(30))) \
                        + ofb
                    mlp = consts_ref[C_ML + jnp.minimum(ml_e & 0xFF,
                                                        jnp.int32(52))]
                    mlb, left = bwd_read(
                        base, left,
                        jax.lax.shift_right_logical(mlp, jnp.int32(20)))
                    ml = (mlp & 0xFFFFF) + mlb
                    llp = consts_ref[jnp.minimum(ll_e & 0xFF, jnp.int32(35))]
                    llb, left = bwd_read(
                        base, left,
                        jax.lax.shift_right_logical(llp, jnp.int32(20)))
                    ll = (llp & 0xFFFFF) + llb
                    e3 = jnp.logical_or(e3, left < 0)

                    # repeat offsets
                    ridx = ofv - 1 + (ll == 0).astype(jnp.int32)
                    use_rep = ofv <= 3
                    off = jnp.where(
                        use_rep,
                        jnp.where(ridx == 0, r0,
                                  jnp.where(ridx == 1, r1,
                                            jnp.where(ridx == 2, r2,
                                                      r0 - 1))),
                        ofv - 3)
                    nr1 = jnp.where(
                        use_rep, jnp.where(ridx == 0, r1, r0), r0)
                    nr2 = jnp.where(
                        use_rep, jnp.where(ridx >= 2, r1,
                                           jnp.where(ridx == 0, r2, r2)),
                        r1)
                    r0n = jnp.where(jnp.logical_and(use_rep, ridx == 0),
                                    r0, off)
                    e3 = jnp.logical_or(e3, off <= 0)

                    # literal run then match
                    e3 = jnp.logical_or(e3, lit_pos + ll > regen)
                    lit_ok = jnp.logical_and(jnp.logical_not(e3),
                                             op + ll <= out_cap)

                    @pl.when(jnp.logical_and(lit_ok, ll > 0))
                    def _():
                        bc.copy_bytes(lit_ref, OUT, lit_pos, orel(op), ll)
                    lit_pos = lit_pos + ll
                    op = op + ll
                    if big:
                        checkpoint(op)

                    e3 = jnp.logical_or(e3, off > op)
                    m_ok = jnp.logical_and(jnp.logical_not(e3),
                                           op + ml <= out_cap)
                    if big:
                        in_win = off <= op - posbase_ref[1]

                        @pl.when(jnp.logical_and(
                            m_ok, jnp.logical_and(in_win, off >= bc.BLK)))
                        def _():
                            bc.copy_bytes(OUT, OUT, orel(op - off), orel(op),
                                          ml)

                        @pl.when(jnp.logical_and(
                            m_ok, jnp.logical_not(in_win)))
                        def _():
                            far_copy(op, off, ml)
                    else:
                        @pl.when(jnp.logical_and(m_ok, off >= bc.BLK))
                        def _():
                            bc.copy_bytes(OUT, OUT, op - off, op, ml)

                    @pl.when(jnp.logical_and(m_ok, off < bc.BLK))
                    def _():
                        bc.copy_pattern(OUT, orel(op), off, ml)
                    op = op + ml
                    if big:
                        checkpoint(op)

                    # state updates (skipped after the last sequence); the
                    # three reads are at consecutive positions and total
                    # <= 9+9+8 bits — ONE combined window read, split by
                    # read order (ll topmost, then ml, then of)
                    def upd(a):
                        left, ll_s, of_s, ml_s = a
                        lnb = jax.lax.shift_right_logical(
                            ll_e, jnp.int32(8)) & 0xFF
                        mnb = jax.lax.shift_right_logical(
                            ml_e, jnp.int32(8)) & 0xFF
                        onb = jax.lax.shift_right_logical(
                            of_e, jnp.int32(8)) & 0xFF
                        v, left = bwd_read(base, left, lnb + mnb + onb)
                        lv = jax.lax.shift_right_logical(v, mnb + onb)
                        mv = jax.lax.shift_right_logical(v, onb) \
                            & (jax.lax.shift_left(jnp.int32(1), mnb) - 1)
                        ov = v & (jax.lax.shift_left(jnp.int32(1), onb) - 1)
                        ll_s = (jax.lax.shift_right_logical(
                            ll_e, jnp.int32(16)) & 0xFFFF) + lv
                        ml_s = (jax.lax.shift_right_logical(
                            ml_e, jnp.int32(16)) & 0xFFFF) + mv
                        of_s = (jax.lax.shift_right_logical(
                            of_e, jnp.int32(16)) & 0xFFFF) + ov
                        return left, ll_s, of_s, ml_s

                    left, ll_s, of_s, ml_s = jax.lax.cond(
                        i + 1 < nseq, upd, lambda a: a,
                        (left, ll_s, of_s, ml_s))
                    e3 = jnp.logical_or(e3, left < 0)
                    return (i + 1, left, ll_s, of_s, ml_s, lit_pos, op, e3,
                            r0n, nr1, nr2)

                (_, left, _, _, _, lit_pos, op, err, r0, r1, r2) = \
                    jax.lax.while_loop(
                        scond, sbody,
                        (jnp.int32(0), left, ll_s, of_s, ml_s, jnp.int32(0),
                         op, err, r0, r1, r2))
                err = jnp.logical_or(err, left != 0)

                # trailing literals
                rest = regen - lit_pos
                err = jnp.logical_or(err, rest < 0)
                ok = jnp.logical_and(jnp.logical_not(err),
                                     op + rest <= out_cap)

                @pl.when(jnp.logical_and(ok, rest > 0))
                def _():
                    bc.copy_bytes(lit_ref, OUT, lit_pos, orel(op), rest)
                return op + rest, err, r0, r1, r2, ll_a, of_a, ml_a

            op, err, r0, r1, r2, ll_a, of_a, ml_a = jax.lax.cond(
                jnp.logical_or(nseq == 0, err), no_seqs, with_seqs,
                (op, err, r0, r1, r2, ll_a, of_a, ml_a))
            return (block_end, op, err, r0, r1, r2, ll_a, of_a, ml_a, hbits)

        full = (pos, op, err, r0, r1, r2, ll_a, of_a, ml_a, hbits)
        full = jax.lax.cond(
            btype == 0, raw_blk,
            lambda a: jax.lax.cond(btype == 1, rle_blk, comp_blk, a), full)
        (pos, op, err, r0, r1, r2, ll_a, of_a, ml_a, hbits) = full
        err = jnp.logical_or(err, pos > csize)
        return (pos, op, err, last, r0, r1, r2, ll_a, of_a, ml_a, hbits)

    st = (pos0, jnp.int32(0), err0, jnp.bool_(False),
          jnp.int32(1), jnp.int32(4), jnp.int32(8),
          jnp.int32(LL_ACC_DEF), jnp.int32(OF_ACC_DEF),
          jnp.int32(ML_ACC_DEF), jnp.int32(0))
    st = jax.lax.while_loop(blk_cond, blk_body, st)
    pos, op, err, done = st[0], st[1], st[2], st[3]
    if big:
        flush_tail(op)
    err = jnp.logical_or(err, jnp.logical_not(done))
    too_big = jnp.logical_and(jnp.logical_not(err), op > out_cap)
    ok = jnp.logical_not(jnp.logical_or(err, too_big))
    osize_ref[b] = jnp.where(ok, op, jnp.int32(0))
    stat_ref[b] = jnp.where(
        err, jnp.int32(Status.ERROR_CANNOT_DECOMPRESS),
        jnp.where(too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                  jnp.int32(Status.SUCCESS)))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False):
    """Batched Zstandard frame decode, Pallas backend.  Same signature and
    semantics as :func:`tpucomp.formats.zstd.decompress_batch`."""
    B, comp_cap = comp.shape

    wpad = _round_up(max(comp_cap, 8), 4) + 8
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    lpad = _round_up(comp_cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(comp, ((0, 0), (0, lpad - comp_cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK
    lit_cap = min(LIT_BLOCK_MAX, _round_up(out_cap, bc.BLK))
    lit_rows = (lit_cap + bc.PAD_BYTES) // bc.BLK
    consts = jnp.asarray(_CONSTS)

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, lit_cap, wpad // 4, False, 0),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes (B,)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # consts (207,)
                pl.BlockSpec((1, 1, wpad // 4), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, lpad // bc.BLK, bc.BLK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, out_rows, bc.BLK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.SMEM((FSE_TOTAL,), jnp.int32),
                pltpu.SMEM((HUF_CAP,), jnp.int32),
                pltpu.SMEM((64,), jnp.int32),
                pltpu.SMEM((288,), jnp.int32),
                pltpu.VMEM((1, lit_rows, bc.BLK), jnp.int32),
            ],
            interpret=interpret,
        )(comp_sizes.astype(jnp.int32), consts, words, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch_big(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                         interpret: bool = False):
    """Batched Zstandard decode for the 16 MB-chunk reference regime
    (``/root/reference/CHANGELOG.md:55``; ``benchmark_zstd_chunked.cu:54-56``).

    Same frame walk as :func:`decompress_batch`, but input streams through a
    256 KiB window (blocks are <= 128 KiB, RFC 8878), output accumulates in a
    sliding VMEM history window flushed to an HBM-resident lane buffer by DMA,
    and far matches (offset beyond the window) stage their source back in
    from the flushed bytes — so VMEM use is constant in ``out_cap``.
    """
    B, comp_cap = comp.shape

    in_pad = _round_up(max(comp_cap + 8, IW_BYTES), 4096)
    cpad = jnp.pad(comp, ((0, 0), (0, in_pad - comp_cap)))
    cw = cpad.reshape(B * in_pad // 4, 4).astype(jnp.int32)
    words = cw[:, 0] | (cw[:, 1] << 8) | (cw[:, 2] << 16) | (cw[:, 3] << 24)
    lanes = cpad.astype(jnp.int32).reshape(B * in_pad // bc.BLK, bc.BLK)

    out_rows = _round_up(out_cap, bc.BLK) // bc.BLK
    out_rows_pad = _round_up(out_rows + STAGE_ROWS + 2 * STAGE_CH, 8)
    lit_cap = LIT_BLOCK_MAX
    lit_rows = (lit_cap + bc.PAD_BYTES) // bc.BLK
    consts = jnp.asarray(_CONSTS)

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, lit_cap, IW_WORDS, True,
                              in_pad),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes (B,)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # consts (207,)
                pl.BlockSpec(memory_space=pltpu.HBM),    # words (B*W,)
                pl.BlockSpec(memory_space=pltpu.HBM),    # lanes (B*R, 128)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),    # out lanes HBM
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * out_rows_pad, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.SMEM((FSE_TOTAL,), jnp.int32),
                pltpu.SMEM((HUF_CAP,), jnp.int32),
                pltpu.SMEM((64,), jnp.int32),
                pltpu.SMEM((288,), jnp.int32),
                pltpu.VMEM((1, lit_rows, bc.BLK), jnp.int32),
                pltpu.SMEM((4,), jnp.int32),                   # posbase
                pltpu.SMEM((IW_WORDS,), jnp.int32),            # input words
                pltpu.VMEM((1, IW_ROWS, bc.BLK), jnp.int32),   # input lanes
                pltpu.VMEM((1, BUF_ROWS, bc.BLK), jnp.int32),  # out window
                pltpu.VMEM((1, STAGE_ROWS, bc.BLK), jnp.int32),  # staging
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(comp_sizes.astype(jnp.int32), consts, words, lanes)

    out = out_lanes.reshape(B, out_rows_pad, bc.BLK)[:, :out_rows, :]
    out = out.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
