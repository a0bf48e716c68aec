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


def _kernel(out_cap: int, w_words: int, n_slabs: int,
            size_ref, words_ref, cand_ref, nxt_ref, lanes_ref,
            out_ref, osize_ref, stat_ref, st_ref):
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

    def put_lit(st, v):
        c, n = lit_code(v)
        return put(st, c, n)

    def put_match(st, ml, dist):
        """Length symbol (closed form), extras, 5-bit distance code, extras."""
        m = ml - 3
        e = jnp.maximum(29 - jax.lax.clz(m), 0)          # bitlen(m) - 3
        li = jnp.where(m < 8, m,
                       jnp.where(ml == MAX_MATCH, jnp.int32(28),
                                 ((e + 1) << 2)
                                 | (jax.lax.shift_right_logical(m, e) - 4)))
        e = jnp.where(jnp.logical_or(m < 8, ml == MAX_MATCH), 0, e)
        lsym = 257 + li
        # fixed code for symbols 256..287: 7-bit (<=279) else 8-bit
        short = lsym < 280
        code = jnp.where(short, lsym - 256, 0xC0 + lsym - 280)
        n = jnp.where(short, jnp.int32(7), jnp.int32(8))
        st = put(st, rev(code, n), n)
        st = put(st, m & (jax.lax.shift_left(jnp.int32(1), e) - 1), e)

        d = dist - 1
        de = jnp.maximum(30 - jax.lax.clz(d), 0)         # bitlen(d) - 2
        dc = jnp.where(d < 4, d,
                       ((de + 1) << 1)
                       | (jax.lax.shift_right_logical(d, de) - 2))
        de = jnp.where(d < 4, 0, de)
        st = put(st, rev(dc, 5), 5)
        st = put(st, d & (jax.lax.shift_left(jnp.int32(1), de) - 1), de)
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

    @pl.when(s == 0)
    def _():
        # block header: BFINAL=1, BTYPE=01 -> bits 1, then 01 (LSB-first: 011)
        op, lo, hi, nb = put((st_ref[2], st_ref[3], st_ref[4], st_ref[5]),
                             jnp.int32(0b011), jnp.int32(3))
        st_ref[2], st_ref[3], st_ref[4], st_ref[5] = op, lo, hi, nb

    def wcond(carry):
        anchor, scan, st, cont = carry
        return cont

    def wbody(carry):
        anchor, scan, st, _ = carry
        nm = nxt_ref[0, 0, scan - base]

        def take(a):
            anchor, scan, st = a
            c = nm - cand_ref[0, 0, nm - base]   # distance (>=1, <=32768)
            src = nm - c

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
            ml = back + MIN_MATCH + match_len(
                nm + MIN_MATCH, src + MIN_MATCH,
                jnp.minimum(size - (nm + MIN_MATCH),
                            MAX_MATCH - MIN_MATCH - back))
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

    @pl.when(s == n_slabs - 1)
    def _():
        st = (st_ref[2], st_ref[3], st_ref[4], st_ref[5])
        st = emit_lits(st, st_ref[0], size)
        st = put(st, jnp.int32(0), jnp.int32(7))      # EOB: symbol 256, code 0
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


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched raw-Deflate encode, Pallas backend.  Same contract as
    :func:`tpucomp.formats.deflate.compress_batch` (RFC-1951 streams; the
    block/token choice differs — both inflate with zlib/libdeflate)."""
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)

    cand, nxt = vmatch.candidates(data, sizes, window=WINDOW)
    n_slabs = max(1, -(-cap // SLAB))
    pad_to = n_slabs * SLAB
    cand = jnp.pad(cand, ((0, 0), (0, pad_to - cap)))
    nxt = jnp.pad(jnp.minimum(nxt, pad_to - 1),
                  ((0, 0), (0, pad_to - cap)), constant_values=pad_to - 1)
    cand = cand.reshape(B, 1, pad_to)
    nxt = nxt.reshape(B, 1, pad_to)

    wpad = _round_up(max(cap, 8), 4) + 4
    cw = jnp.pad(data, ((0, 0), (0, wpad - cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = (cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16)
             | (cw[..., 3] << 24))

    lpad = _round_up(cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(data, ((0, 0), (0, lpad - cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    # worst case: 9 bits/byte + EOB + header + flush slack (stored rewrite
    # is never larger than this)
    buf_cap = max(out_cap, cap + cap // 2 + 64)
    out_rows = (_round_up(buf_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4, n_slabs),
            grid=(B, n_slabs),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, wpad // 4), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, SLAB), lambda i, s: (i, 0, s),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, lpad // bc.BLK, bc.BLK),
                             lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, out_rows, bc.BLK), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
            interpret=interpret,
        )(sizes, words, cand, nxt, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
