"""Pallas Deflate encoder: fixed-Huffman (BTYPE=01), sort-matched candidates.

The TPU-side compress path for the Deflate family (the reference compresses
Deflate on-device with a 3-algo ladder, ``benchmarks/benchmark_deflate_chunked
.cu:42,55-58``; our XLA encoder is the portable path but its scatter passes
are dead on TPU).  Match finding comes from the vector sort pass
(:mod:`tpucomp.ops.match`, 32 KiB RFC-1951 window); the scalar core walks the
chunk at token rate and writes one fixed-Huffman block per chunk:

- literal/length codes are *closed-form* (the RFC-1951 fixed tables are
  canonical: 8/9-bit literals, 7/8-bit length symbols, 5-bit distances), so
  there are no code tables at all — symbol -> (code, len) is arithmetic,
  bit-reversed with 4 shift/mask steps;
- length/distance symbol indices use the RFC's power-of-two structure via
  ``count_leading_zeros`` instead of compare chains;
- bits accumulate in a (lo, hi, nbits) scalar triple and flush 4 output
  bytes per composed wild store.

A stored-block rewrite (BTYPE=00, <=65535-byte blocks) replaces the fixed
stream when smaller — the incompressible-chunk guarantee the XLA encoder's
best-of-3 gives.  Output is raw RFC-1951, decodable by zlib/libdeflate and
both in-tree deflate decoders.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.ops import match as vmatch
from tpucomp.ops.pallas import bytecopy as bc

MIN_MATCH = 4
MAX_MATCH = 258
WINDOW = 32768
SLAB = 4096


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int, n_slabs: int, mode: str,
            *refs):
    """Slab-strided sort-matched walk, three trace-time modes sharing the
    same parse (so the histogram and emission passes see identical tokens):

    - ``fixed``: emit a fixed-Huffman (BTYPE=01) stream (algo 0).
    - ``hist``:  no output bits; count litlen/dist symbol frequencies into
      SMEM histogram outputs (phase A of the dynamic-Huffman pipeline).
    - ``emit``:  emit with per-chunk dynamic tables + a pre-packed header
      built outside the kernel (phase C; the reference's algo-1 rung,
      ``benchmarks/benchmark_deflate_chunked.cu:42,55-58``).
    """
    if mode == "hist":
        (size_ref, words_ref, cand_ref, cand8_ref, nxt_ref, lanes_ref,
         llh_ref, dh_ref, st_ref) = refs
    elif mode == "emit":
        (size_ref, words_ref, cand_ref, cand8_ref, nxt_ref, lanes_ref,
         tab_ref, hdrw_ref, hdrn_ref,
         out_ref, osize_ref, stat_ref, st_ref) = refs
    else:
        (size_ref, words_ref, cand_ref, cand8_ref, nxt_ref, lanes_ref,
         out_ref, osize_ref, stat_ref, st_ref) = refs
    b = pl.program_id(0)
    s = pl.program_id(1)
    size = size_ref[b]
    base = s * SLAB
    wend = base + SLAB
    mflimit = size - MIN_MATCH + 1     # candidates exist only below this

    @pl.when(s == 0)
    def _():
        st_ref[0] = jnp.int32(0)   # anchor
        st_ref[1] = jnp.int32(0)   # scan
        st_ref[2] = jnp.int32(0)   # op (bytes flushed)
        st_ref[3] = jnp.int32(0)   # bit buffer lo
        st_ref[4] = jnp.int32(0)   # bit buffer hi
        st_ref[5] = jnp.int32(0)   # nbits
        if mode == "hist":
            def z(i, c):
                llh_ref[b, i] = jnp.int32(0)
                dh_ref[b, jnp.minimum(i, 29)] = jnp.int32(0)
                return c
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(288), z, jnp.int32(0),
                              unroll=False)

    def load32(i):
        wi = i >> 2
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w1, 31 - sh), jnp.int32(1))
        return lo | hi

    def getb(i):
        ic = jnp.clip(i, jnp.int32(0), jnp.int32(4 * w_words - 1))
        w = words_ref[0, 0, ic >> 2]
        return (w >> ((i & 3) * 8)) & 0xFF

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, bc.BLK), 1)

    def rev16(x):
        """Bit-reverse the low 16 bits (scalar)."""
        x = ((x & 0x5555) << 1) | (jax.lax.shift_right_logical(x, jnp.int32(1))
                                   & 0x5555)
        x = ((x & 0x3333) << 2) | (jax.lax.shift_right_logical(x, jnp.int32(2))
                                   & 0x3333)
        x = ((x & 0x0F0F) << 4) | (jax.lax.shift_right_logical(x, jnp.int32(4))
                                   & 0x0F0F)
        return ((x & 0x00FF) << 8) | (jax.lax.shift_right_logical(
            x, jnp.int32(8)) & 0x00FF)

    def rev(v, n):
        return jax.lax.shift_right_logical(rev16(v), 16 - n)

    def flush4(op, lo):
        v = jnp.where(lane_i == 0, lo & 0xFF,
                      jnp.where(lane_i == 1,
                                jax.lax.shift_right_logical(lo, jnp.int32(8))
                                & 0xFF,
                                jnp.where(
                                    lane_i == 2,
                                    jax.lax.shift_right_logical(
                                        lo, jnp.int32(16)) & 0xFF,
                                    jax.lax.shift_right_logical(
                                        lo, jnp.int32(24)) & 0xFF)))
        bc.store128_wild(out_ref, op, v.astype(jnp.int32))
        return op + 4

    def put(st, v, n):
        """Append n (<=16) LSB-first bits of v; flush on 32."""
        op, lo, hi, nb = st
        lo = lo | jax.lax.shift_left(v, nb)
        hi = hi | jax.lax.shift_right_logical(
            jax.lax.shift_right_logical(v, 31 - nb), jnp.int32(1))
        nb = nb + n

        def do_flush(a):
            op, lo, hi, nb = a
            op = flush4(op, lo)
            return op, hi, jnp.int32(0), nb - 32

        return jax.lax.cond(nb >= 32, do_flush, lambda a: a,
                            (op, lo, hi, nb))

    def lit_code(v):
        """Fixed literal code: value in [0, 255] -> (bit-reversed code, len)."""
        lo_range = v < 144
        code = jnp.where(lo_range, 0x30 + v, 0x190 + v - 144)
        n = jnp.where(lo_range, jnp.int32(8), jnp.int32(9))
        return rev(code, n), n

    def _len_sym(ml):
        """(length symbol index 0..28, extra-bit count, extra-bit value)."""
        m = ml - 3
        e = jnp.maximum(29 - jax.lax.clz(m), 0)          # bitlen(m) - 3
        li = jnp.where(m < 8, m,
                       jnp.where(ml == MAX_MATCH, jnp.int32(28),
                                 ((e + 1) << 2)
                                 | (jax.lax.shift_right_logical(m, e) - 4)))
        e = jnp.where(jnp.logical_or(m < 8, ml == MAX_MATCH), 0, e)
        return li, e, m & (jax.lax.shift_left(jnp.int32(1), e) - 1)

    def _dist_sym(dist):
        """(distance symbol index 0..29, extra-bit count, extra-bit value)."""
        d = dist - 1
        de = jnp.maximum(30 - jax.lax.clz(d), 0)         # bitlen(d) - 2
        dc = jnp.where(d < 4, d,
                       ((de + 1) << 1)
                       | (jax.lax.shift_right_logical(d, de) - 2))
        de = jnp.where(d < 4, 0, de)
        return dc, de, d & (jax.lax.shift_left(jnp.int32(1), de) - 1)

    if mode == "hist":
        def put_lit(st, v):
            llh_ref[b, v] = llh_ref[b, v] + 1
            return st

        def put_match(st, ml, dist):
            li, _, _ = _len_sym(ml)
            di, _, _ = _dist_sym(dist)
            llh_ref[b, 257 + li] = llh_ref[b, 257 + li] + 1
            dh_ref[b, di] = dh_ref[b, di] + 1
            return st
    elif mode == "emit":
        def put_lit(st, v):
            e = tab_ref[b, v]
            return put(st, e & 0xFFFF,
                       jax.lax.shift_right_logical(e, jnp.int32(16)))

        def put_match(st, ml, dist):
            li, e, ev = _len_sym(ml)
            ent = tab_ref[b, 257 + li]
            st = put(st, ent & 0xFFFF,
                     jax.lax.shift_right_logical(ent, jnp.int32(16)))
            st = put(st, ev, e)
            di, de, dv = _dist_sym(dist)
            dent = tab_ref[b, 288 + di]
            st = put(st, dent & 0xFFFF,
                     jax.lax.shift_right_logical(dent, jnp.int32(16)))
            st = put(st, dv, de)
            return st
    else:
        def put_lit(st, v):
            c, n = lit_code(v)
            return put(st, c, n)

        def put_match(st, ml, dist):
            """Length symbol (closed form), extras, 5-bit dist code, extras."""
            li, e, ev = _len_sym(ml)
            lsym = 257 + li
            # fixed code for symbols 256..287: 7-bit (<=279) else 8-bit
            short = lsym < 280
            code = jnp.where(short, lsym - 256, 0xC0 + lsym - 280)
            n = jnp.where(short, jnp.int32(7), jnp.int32(8))
            st = put(st, rev(code, n), n)
            st = put(st, ev, e)
            dc, de, dv = _dist_sym(dist)
            st = put(st, rev(dc, 5), 5)
            st = put(st, dv, de)
            return st

    SCALAR_CAP = 32

    def match_len(a, c, cap_n):
        def s_cond(st):
            l, go = st
            return go

        def s_body(st):
            l, _ = st
            x = load32(a + l) ^ load32(c + l)
            eq4 = x == 0
            sub = ((x & 0xFF) == 0).astype(jnp.int32) \
                + ((x & 0xFFFF) == 0).astype(jnp.int32) \
                + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
            l2 = l + jnp.where(eq4, jnp.int32(4), sub)
            go = jnp.logical_and(eq4, jnp.logical_and(l2 < cap_n,
                                                      l2 < SCALAR_CAP))
            return l2, go

        l, _ = jax.lax.while_loop(s_cond, s_body, (jnp.int32(0), cap_n > 0))

        def v_tail(l0):
            def cond(st):
                l, first = st
                return jnp.logical_and(first == bc.BLK, l < cap_n)

            def body(st):
                l, _ = st
                wa = bc.window128(lanes_ref, a + l)
                wc = bc.window128(lanes_ref, c + l)
                neq = wa != wc
                idx = jnp.min(jnp.where(neq, lane_i, jnp.int32(bc.BLK)),
                              keepdims=True)[0, 0]
                return l + idx, idx

            l2, _ = jax.lax.while_loop(cond, body, (l0, jnp.int32(bc.BLK)))
            return l2

        l = jax.lax.cond(l >= SCALAR_CAP, v_tail, lambda l0: l0, l)
        return jnp.minimum(l, cap_n)

    def emit_lits(st, a, b2):
        """Emit literal codes for bytes [a, b2)."""
        def body(i, st):
            return put_lit(st, getb(i))

        return jax.lax.fori_loop(a, b2, body, st)

    if mode == "fixed":
        @pl.when(s == 0)
        def _():
            # block header: BFINAL=1, BTYPE=01 -> bits 1 then 01 (LSB: 011)
            op, lo, hi, nb = put((st_ref[2], st_ref[3], st_ref[4], st_ref[5]),
                                 jnp.int32(0b011), jnp.int32(3))
            st_ref[2], st_ref[3], st_ref[4], st_ref[5] = op, lo, hi, nb
    elif mode == "emit":
        @pl.when(s == 0)
        def _():
            # pre-packed dynamic header (BFINAL+BTYPE+CL tables), 16 bits/put
            hn = hdrn_ref[b]

            def hb(i, st):
                w = hdrw_ref[b, jax.lax.shift_right_logical(i, jnp.int32(5))]
                half = jax.lax.shift_right_logical(
                    w, (i & 31)) & 0xFFFF
                n = jnp.minimum(hn - i, jnp.int32(16))
                return put(st, half & (jax.lax.shift_left(
                    jnp.int32(1), n) - 1), n)

            st = (st_ref[2], st_ref[3], st_ref[4], st_ref[5])
            st = jax.lax.fori_loop(
                jnp.int32(0), (hn + 15) // 16,
                lambda k, st: hb(k * 16, st), st, unroll=False)
            st_ref[2], st_ref[3], st_ref[4], st_ref[5] = st

    def wcond(carry):
        anchor, scan, st, cont = carry
        return cont

    def wbody(carry):
        anchor, scan, st, _ = carry
        nm = nxt_ref[0, 0, scan - base]

        def take(a):
            anchor, scan, st = a
            # two candidates (4-byte nearest chain + 8-byte-prefix sort
            # neighbor): extend both forward, keep the longer match
            c4p = cand_ref[0, 0, nm - base]
            c8p = cand8_ref[0, 0, nm - base]
            p4 = jnp.where(c4p >= 0, c4p, c8p)
            p8 = jnp.where(c8p >= 0, c8p, p4)
            fcap = jnp.minimum(size - (nm + MIN_MATCH),
                               MAX_MATCH - MIN_MATCH)
            l4 = match_len(nm + MIN_MATCH, p4 + MIN_MATCH, fcap)
            l8 = jax.lax.cond(
                p8 != p4,
                lambda _: match_len(nm + MIN_MATCH, p8 + MIN_MATCH, fcap),
                lambda _: l4, 0)
            src = jnp.where(l8 > l4, p8, p4)
            c = nm - src                      # distance (>=1, <=32768)

            def bcond(st2):
                nm2, src2 = st2
                return jnp.logical_and(
                    jnp.logical_and(nm2 > anchor, src2 > 0),
                    getb(nm2 - 1) == getb(src2 - 1))

            def bbody(st2):
                nm2, src2 = st2
                return nm2 - 1, src2 - 1

            nm2, src2 = jax.lax.while_loop(bcond, bbody, (nm, src))
            back = nm - nm2
            ml = jnp.minimum(back + MIN_MATCH + jnp.maximum(l4, l8),
                             jnp.int32(MAX_MATCH))
            st = emit_lits(st, anchor, nm2)
            st = put_match(st, ml, c)
            nip = nm2 + ml
            return nip, nip, st

        in_win = nm < wend
        usable = jnp.logical_and(in_win, nm < mflimit)
        anchor, scan, st = jax.lax.cond(
            usable, take,
            lambda a: (a[0], jnp.where(in_win, jnp.maximum(size, wend), nm),
                       a[2]),
            (anchor, scan, st))
        cont = jnp.logical_and(scan < wend, scan < mflimit)
        scan = jnp.where(scan < mflimit, scan, jnp.maximum(scan, size))
        return anchor, scan, st, cont

    anchor0, scan0 = st_ref[0], st_ref[1]
    st0 = (st_ref[2], st_ref[3], st_ref[4], st_ref[5])
    run = jnp.logical_and(scan0 < wend, jnp.logical_and(scan0 >= base,
                                                        scan0 < mflimit))
    anchor, scan, st, _ = jax.lax.while_loop(
        wcond, wbody, (anchor0, jnp.maximum(scan0, base), st0, run))
    anchor = jnp.where(run, anchor, anchor0)
    scan = jnp.where(run, scan, scan0)
    op, lo, hi, nb = (jnp.where(run, st[k], st0[k]) for k in range(4))
    st_ref[0], st_ref[1] = anchor, scan
    st_ref[2], st_ref[3], st_ref[4], st_ref[5] = op, lo, hi, nb

    if mode == "hist":
        @pl.when(s == n_slabs - 1)
        def _():
            st = (st_ref[2], st_ref[3], st_ref[4], st_ref[5])
            emit_lits(st, st_ref[0], size)
            llh_ref[b, 256] = llh_ref[b, 256] + 1     # EOB
        return

    @pl.when(s == n_slabs - 1)
    def _():
        st = (st_ref[2], st_ref[3], st_ref[4], st_ref[5])
        st = emit_lits(st, st_ref[0], size)
        if mode == "emit":
            eob = tab_ref[b, 256]
            st = put(st, eob & 0xFFFF,
                     jax.lax.shift_right_logical(eob, jnp.int32(16)))
        else:
            st = put(st, jnp.int32(0), jnp.int32(7))  # EOB: sym 256, code 0
        op, lo, hi, nb = st

        # final flush: whole bytes of the residual buffer
        def fcond(a):
            op, lo, hi, nb = a
            return nb > 0

        def fbody(a):
            op, lo, hi, nb = a
            bc.store128_wild(out_ref, op,
                             jnp.broadcast_to(lo & 0xFF,
                                              (1, bc.BLK)).astype(jnp.int32))
            lo = (jax.lax.shift_right_logical(lo, jnp.int32(8))
                  | jax.lax.shift_left(hi, jnp.int32(24)))
            hi = jax.lax.shift_right_logical(hi, jnp.int32(8))
            return op + 1, lo, hi, jnp.maximum(nb - 8, 0)

        op, _, _, _ = jax.lax.while_loop(fcond, fbody, (op, lo, hi, nb))

        # stored-block rewrite when smaller (incompressible chunks)
        n_blocks = jnp.maximum((size + 65534) // 65535, 1)
        stored_bytes = size + 5 * n_blocks

        def rewrite(_):
            def blk(carry):
                src, op2 = carry
                rem = size - src
                n = jnp.minimum(rem, jnp.int32(65535))
                last = (rem == n).astype(jnp.int32)
                nlen = 0xFFFF - n
                hdrv = jnp.where(
                    lane_i == 0, last,
                    jnp.where(lane_i == 1, n & 0xFF,
                              jnp.where(lane_i == 2,
                                        jax.lax.shift_right_logical(
                                            n, jnp.int32(8)),
                                        jnp.where(lane_i == 3, nlen & 0xFF,
                                                  jax.lax.shift_right_logical(
                                                      nlen, jnp.int32(8))))))
                bc.store128_wild(out_ref, op2, hdrv.astype(jnp.int32))

                @pl.when(n > 0)
                def _():
                    bc.copy_bytes(lanes_ref, out_ref, src, op2 + 5, n)

                return src + n, op2 + 5 + n

            def more(carry):
                src, _ = carry
                return src < size

            _, op2 = jax.lax.while_loop(
                more, blk, (jnp.int32(0), jnp.int32(0)))
            # size == 0: the loop body never ran — emit one empty final block
            return jax.lax.cond(size == 0,
                                lambda o: blk((jnp.int32(0), o))[1],
                                lambda o: o, op2)

        op = jax.lax.cond(stored_bytes < op, rewrite, lambda _: op,
                          jnp.int32(0))

        too_big = op > out_cap
        osize_ref[b] = jnp.where(too_big, jnp.int32(0), op)
        stat_ref[b] = jnp.where(
            too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
            jnp.int32(Status.SUCCESS))


def _prep(data, sizes, entropy_only=False):
    """Shared input prep: sort-matched candidates + words/lanes views.
    ``entropy_only`` suppresses all matches (the reference's algo-2 rung:
    pure entropy coding, no LZ stage)."""
    B, cap = data.shape
    n_slabs = max(1, -(-cap // SLAB))
    pad_to = n_slabs * SLAB
    if entropy_only:
        cand = jnp.zeros((B, 1, pad_to), jnp.int32)
        cand8 = jnp.full((B, 1, pad_to), -1, jnp.int32)
        nxt = jnp.full((B, 1, pad_to), pad_to - 1, jnp.int32)
        wpad = _round_up(max(cap, 8), 4) + 4
        cw = jnp.pad(data, ((0, 0), (0, wpad - cap))).astype(jnp.int32)
        cw = cw.reshape(B, 1, wpad // 4, 4)
        words = (cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16)
                 | (cw[..., 3] << 24))
        lpad = _round_up(cap, bc.BLK) + bc.PAD_BYTES
        lanes = jnp.pad(data, ((0, 0), (0, lpad - cap))).astype(jnp.int32)
        lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)
        return cand, cand8, nxt, words, lanes, n_slabs, wpad, lpad
    cand, cand8, nxt = vmatch.candidates2(data, sizes, window=WINDOW)
    cand = jnp.pad(cand, ((0, 0), (0, pad_to - cap)), constant_values=-1)
    cand8 = jnp.pad(cand8, ((0, 0), (0, pad_to - cap)), constant_values=-1)
    nxt = jnp.pad(jnp.minimum(nxt, pad_to - 1),
                  ((0, 0), (0, pad_to - cap)), constant_values=pad_to - 1)
    cand = cand.reshape(B, 1, pad_to)
    cand8 = cand8.reshape(B, 1, pad_to)
    nxt = nxt.reshape(B, 1, pad_to)

    wpad = _round_up(max(cap, 8), 4) + 4
    cw = jnp.pad(data, ((0, 0), (0, wpad - cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = (cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16)
             | (cw[..., 3] << 24))

    lpad = _round_up(cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(data, ((0, 0), (0, lpad - cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)
    return cand, cand8, nxt, words, lanes, n_slabs, wpad, lpad


def _in_specs(wpad, lpad):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, wpad // 4), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, lpad // bc.BLK, bc.BLK), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _emit_specs(out_rows):
    return [
        pl.BlockSpec((1, out_rows, bc.BLK), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched raw-Deflate encode, Pallas backend (algo 0: fixed Huffman).
    Same contract as :func:`tpucomp.formats.deflate.compress_batch`
    (RFC-1951 streams; the block/token choice differs — both inflate with
    zlib/libdeflate)."""
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)
    cand, cand8, nxt, words, lanes, n_slabs, wpad, lpad = _prep(data, sizes)

    # worst case: 9 bits/byte + EOB + header + flush slack (stored rewrite
    # is never larger than this)
    buf_cap = max(out_cap, cap + cap // 2 + 64)
    out_rows = (_round_up(buf_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4, n_slabs, "fixed"),
            grid=(B, n_slabs),
            in_specs=_in_specs(wpad, lpad),
            out_specs=_emit_specs(out_rows),
            out_shape=[
                jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
            interpret=interpret,
        )(sizes, words, cand, cand8, nxt, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat


HDR_WORDS = 80  # >= ceil((3 + 14 + 57 + 316*7) / 32) dynamic-header words


def _dyn_tables(llh, dh):
    """Phase B (vectorized XLA, one chunk): exact walk histograms ->
    per-chunk dynamic Huffman tables + the pre-packed RFC-1951 header.

    Returns ``(tab int32[318], hdr_words int32[HDR_WORDS], hdr_bits)`` where
    ``tab[sym] = bit-reversed code | len << 16`` (litlen 0..287, dist at
    288..317).  Falls back to the fixed tables (3-bit header) when the
    length construction fails or dynamic coding would not pay.
    """
    from tpucomp.formats.deflate import (
        CL_ORDER, FIXED_DIST_LENS, FIXED_LIT_LENS, MAX_BITS, _assign_codes,
        _assign_codes_np, _huff_lengths, _rev_bits)

    # pure int32 throughout: this runs inside the pipeline's x64(False)
    # scope, and int64 here is also a measured 8x pipeline stall on v5e
    # (i64 is software-emulated on TPU)
    lit_freq = llh                                  # EOB already counted
    no_match = jnp.sum(dh) == 0
    dist_freq = dh + jnp.where(
        jnp.logical_and(no_match, jnp.arange(30) == 0), 1, 0).astype(jnp.int32)

    dyn_lit_lens, ok_l = _huff_lengths(lit_freq[:286], MAX_BITS)
    dyn_dist_lens, ok_d = _huff_lengths(dist_freq, MAX_BITS)
    dyn_lit_lens = jnp.pad(dyn_lit_lens, (0, 2))
    dyn_dist_lens = jnp.pad(dyn_dist_lens, (0, 2))
    dyn_lit_codes = _assign_codes(dyn_lit_lens, MAX_BITS)
    dyn_dist_codes = _assign_codes(dyn_dist_lens, MAX_BITS)

    all_lens = jnp.clip(jnp.concatenate([dyn_lit_lens[:286],
                                         dyn_dist_lens[:30]]), 0, 15)
    # one-hot histogram instead of scatter-add (scatters are dead on TPU)
    cl_freq = jnp.sum(
        (all_lens[:, None] == jnp.arange(19, dtype=jnp.int32)[None, :])
        .astype(jnp.int32), axis=0)
    cl_lens, ok_c = _huff_lengths(cl_freq, 7)
    cl_codes = _assign_codes(cl_lens, 7)
    use_dyn = jnp.logical_and(ok_l, jnp.logical_and(ok_d, ok_c))

    fixed_ll = jnp.asarray(FIXED_LIT_LENS)
    fixed_lc = jnp.asarray(_assign_codes_np(FIXED_LIT_LENS, MAX_BITS))
    fixed_dl = jnp.asarray(FIXED_DIST_LENS)
    fixed_dc = jnp.asarray(_assign_codes_np(FIXED_DIST_LENS, MAX_BITS))

    cl_hdr_bits = 14 + 19 * 3 + jnp.sum(cl_lens[all_lens])
    pay_fixed = (jnp.sum(lit_freq * fixed_ll)
                 + jnp.sum(dist_freq * fixed_dl[:30]))
    pay_dyn = (jnp.sum(lit_freq * dyn_lit_lens)
               + jnp.sum(dist_freq * dyn_dist_lens[:30]))
    use_dyn = jnp.logical_and(use_dyn, cl_hdr_bits + pay_dyn < pay_fixed)

    ll = jnp.where(use_dyn, dyn_lit_lens, fixed_ll)
    lc = jnp.where(use_dyn, dyn_lit_codes, fixed_lc)
    dl = jnp.where(use_dyn, dyn_dist_lens, fixed_dl)[:30]
    dc = jnp.where(use_dyn, dyn_dist_codes, fixed_dc)[:30]

    tab = jnp.concatenate([
        _rev_bits(lc, ll).astype(jnp.int32) | (ll.astype(jnp.int32) << 16),
        _rev_bits(dc, dl).astype(jnp.int32) | (dl.astype(jnp.int32) << 16),
    ])

    # header fields: BFINAL+BTYPE, then (dynamic only) HLIT HDIST HCLEN,
    # 19x3 CL lens in CL_ORDER, 316 CL-coded lengths — every field <= 7 bits,
    # so a field spans at most two 32-bit words
    hdr3 = jnp.where(use_dyn, jnp.int32(0b101), jnp.int32(0b011))
    clo_val = cl_lens[jnp.asarray(CL_ORDER)]
    sym_val = _rev_bits(cl_codes[all_lens], cl_lens[all_lens])
    sym_bits = cl_lens[all_lens]
    vals = jnp.concatenate([
        hdr3[None], jnp.asarray([29, 29, 15], jnp.int32), clo_val, sym_val])
    bits = jnp.concatenate([
        jnp.asarray([3], jnp.int32), jnp.asarray([5, 5, 4], jnp.int32),
        jnp.full((19,), 3, jnp.int32), sym_bits])
    bits = jnp.where(use_dyn, bits,
                     jnp.concatenate([jnp.asarray([3], jnp.int32),
                                      jnp.zeros((338,), jnp.int32)]))

    bit_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(bits)[:-1].astype(jnp.int32)])
    total = jnp.sum(bits)
    word_idx = bit_off >> 5
    sh = bit_off & 31
    v32 = vals.astype(jnp.uint32)
    part0 = jax.lax.shift_left(v32, sh.astype(jnp.uint32))
    part1 = jnp.where(sh > 0, jax.lax.shift_right_logical(
        v32, (32 - sh).astype(jnp.uint32)), jnp.uint32(0))
    # word assembly via one-hot masked sums (fields never overlap -> exact)
    cols = jnp.arange(HDR_WORDS, dtype=jnp.int32)[None, :]
    live = (bits > 0)[:, None]
    m0 = jnp.logical_and(word_idx[:, None] == cols, live)
    m1 = jnp.logical_and(word_idx[:, None] + 1 == cols, live)
    wv = jnp.sum(jnp.where(m0, part0[:, None], 0)
                 + jnp.where(m1, part1[:, None], 0), axis=0, dtype=jnp.uint32)
    hdr_words = jax.lax.bitcast_convert_type(wv, jnp.int32)
    return tab, hdr_words, total.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret",
                                             "entropy_only"))
def compress_batch_dyn(data: jax.Array, sizes: jax.Array, out_cap: int,
                       interpret: bool = False, entropy_only: bool = False):
    """Batched raw-Deflate encode with per-chunk dynamic Huffman tables —
    the TPU path for the reference's algo-1 high-compression rung
    (``benchmarks/benchmark_deflate_chunked.cu:42,55-58``).

    Three phases over ONE shared parse: (A) the sort-matched walk counts
    exact litlen/dist symbol frequencies (Pallas, ``mode="hist"``); (B) the
    vectorized table builder derives length-limited canonical codes, the
    code-length code, and the fully bit-packed block header (XLA,
    :func:`_dyn_tables`); (C) the same walk re-runs and emits against the
    tables (Pallas, ``mode="emit"``).  Output is raw RFC-1951, bit-exactly
    decodable by zlib/libdeflate and both in-tree decoders."""
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)
    cand, cand8, nxt, words, lanes, n_slabs, wpad, lpad = _prep(
        data, sizes, entropy_only=entropy_only)

    with jax.enable_x64(False):
        llh, dh = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4, n_slabs, "hist"),
            grid=(B, n_slabs),
            in_specs=_in_specs(wpad, lpad),
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 288), jnp.int32),
                jax.ShapeDtypeStruct((B, 30), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
            interpret=interpret,
        )(sizes, words, cand, cand8, nxt, lanes)

        tab, hdrw, hdrn = jax.vmap(_dyn_tables)(llh, dh)

        buf_cap = max(out_cap, cap + cap // 2 + 3000)
        out_rows = (_round_up(buf_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4, n_slabs, "emit"),
            grid=(B, n_slabs),
            in_specs=_in_specs(wpad, lpad) + [
                pl.BlockSpec(memory_space=pltpu.SMEM),   # tab (B, 318)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # hdr words
                pl.BlockSpec(memory_space=pltpu.SMEM),   # hdr bit counts
            ],
            out_specs=_emit_specs(out_rows),
            out_shape=[
                jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
            interpret=interpret,
        )(sizes, words, cand, cand8, nxt, lanes, tab, hdrw, hdrn)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
