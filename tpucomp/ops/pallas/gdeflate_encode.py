"""Pallas GDeflate algo-0 encoder: sort-matched walk, 32-lane bit emission.

TPU compress path for GDeflate's high-throughput rung (the reference's algo
0, ``benchmarks/benchmark_gdeflate_chunked.cu:42,55-58``); the XLA encoder
(:func:`tpucomp.formats.gdeflate.encode_chunk`) keeps the dynamic-table
rungs but its scatter passes are dead on TPU.

Split of labor, following the tile format's own structure (see
``tests/gdeflate_pyref.py`` for the normative layout):

- **Pallas kernel (serial)**: the lz4_encode2 walk (vector sort-matched
  candidates, O(1) literal-run jumps, back-extension) emits RFC-1951
  fixed-table codes — all closed-form arithmetic, no tables — into 32
  round-robin lane bit-buffers held in SMEM, flushing completed DWORDs to a
  per-lane word array.  Per token it also records the four field bit-counts
  (packed 4x4 bits) — everything the refill schedule depends on.
- **XLA stage (vector)**: rebuilds the schedule from the bit-counts — the
  per-lane exclusive bit prefix, ``dwords_before_field = min(ceil((B+32)/
  32), D)``, and the field-major interleave — as cumsums, a blocked
  compare-count (no searchsorted gathers), and one 3-key ``lax.sort`` that
  permutes the lane words into decode order; then assembles the tile bytes
  and applies the stored fallback (incompressible chunks, tiny chunks, or
  the rare lane-buffer overflow).

Output tiles are btype-1 (fixed tables), decodable by both Pallas decoders,
the XLA codec, and the serial pyref oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.formats.gdeflate import HDR, LANE_TAB, N_LANES, PAYLOAD
from tpucomp.ops import match as vmatch
from tpucomp.ops.pallas import bytecopy as bc

MIN_MATCH = 4
MAX_MATCH = 258
SLAB = 4096
NT_CAP = 65536          # max tokens per 64 KiB tile (all-literal worst case)
WCAP = 832              # per-lane dword cap (all-literal worst: 576; the
                        # adversarial long-match skew overflows -> stored)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(w_words: int, n_slabs: int, mode: str, *refs):
    """Sort-matched walk in three trace-time modes over ONE parse:
    ``fixed`` (algo 0, closed-form fixed-table emission), ``hist`` (count
    exact litlen/dist symbol frequencies — phase A of the dynamic-table
    pipeline), ``emit`` (emit against per-tile dynamic tables — phase C;
    the reference's algo-1 rung, ``benchmark_gdeflate_chunked.cu:42``)."""
    if mode == "hist":
        (size_ref, words_ref, cand_ref, cand8_ref, nxt_ref, lanes_ref,
         llh_ref, dh_ref, st_ref, ln_ref) = refs
    elif mode == "emit":
        (size_ref, words_ref, cand_ref, cand8_ref, nxt_ref, lanes_ref,
         tab_ref,
         lw_ref, nb16_ref, dcnt_ref, meta_ref, st_ref, ln_ref) = refs
    else:
        (size_ref, words_ref, cand_ref, cand8_ref, nxt_ref, lanes_ref,
         lw_ref, nb16_ref, dcnt_ref, meta_ref, st_ref, ln_ref) = refs
    b = pl.program_id(0)
    s = pl.program_id(1)
    size = size_ref[b]
    base = s * SLAB
    wend = base + SLAB
    mflimit = size - MIN_MATCH + 1

    @pl.when(s == 0)
    def _():
        st_ref[0] = jnp.int32(0)   # anchor
        st_ref[1] = jnp.int32(0)   # scan
        st_ref[2] = jnp.int32(0)   # token count
        st_ref[3] = jnp.int32(0)   # overflow flag

        def clr(j, c):
            ln_ref[j] = jnp.int32(0)          # lo
            ln_ref[N_LANES + j] = jnp.int32(0)   # hi
            ln_ref[2 * N_LANES + j] = jnp.int32(0)  # nbits
            ln_ref[3 * N_LANES + j] = jnp.int32(0)  # dword count
            return c
        jax.lax.fori_loop(0, N_LANES, clr, jnp.int32(0))
        if mode == "hist":
            def zh(i, c):
                llh_ref[b, i] = jnp.int32(0)
                dh_ref[b, jnp.minimum(i, 31)] = jnp.int32(0)
                return c
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(288), zh, jnp.int32(0),
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

    def lane_put(j, v, n):
        """Append n (<=16) LSB-first bits of v to lane j; flush DWORDs."""
        lo = ln_ref[j]
        hi = ln_ref[N_LANES + j]
        nb = ln_ref[2 * N_LANES + j]
        lo = lo | jax.lax.shift_left(v, nb)
        hi = hi | jax.lax.shift_right_logical(
            jax.lax.shift_right_logical(v, 31 - nb), jnp.int32(1))
        nb = nb + n

        def flush(a):
            lo, hi, nb = a
            cnt = ln_ref[3 * N_LANES + j]

            @pl.when(cnt < WCAP)
            def _():
                lw_ref[0, 0, j * WCAP + cnt] = lo
            st_ref[3] = jnp.where(cnt < WCAP, st_ref[3], jnp.int32(1))
            ln_ref[3 * N_LANES + j] = cnt + 1
            return hi, jnp.int32(0), nb - 32

        lo, hi, nb = jax.lax.cond(nb >= 32, flush, lambda a: a, (lo, hi, nb))
        ln_ref[j] = lo
        ln_ref[N_LANES + j] = hi
        ln_ref[2 * N_LANES + j] = nb

    def rec_nb(t, packed):
        """Record a token's packed 4x4-bit field counts at token index t."""
        w = jnp.minimum(t >> 1, jnp.int32(NT_CAP // 2 - 1))
        st_ref[3] = jnp.where(t < NT_CAP, st_ref[3], jnp.int32(1))
        old = nb16_ref[0, 0, w]
        nb16_ref[0, 0, w] = jnp.where(t & 1 == 0, packed,
                                   (old & 0xFFFF) | (packed << 16))

    def _len_fields(ml):
        m = ml - 3
        e = jnp.maximum(29 - jax.lax.clz(m), 0)
        li = jnp.where(m < 8, m,
                       jnp.where(ml == MAX_MATCH, jnp.int32(28),
                                 ((e + 1) << 2)
                                 | (jax.lax.shift_right_logical(m, e) - 4)))
        e = jnp.where(jnp.logical_or(m < 8, ml == MAX_MATCH), 0, e)
        return li, e, m & (jax.lax.shift_left(jnp.int32(1), e) - 1)

    def _dist_fields(dist):
        d = dist - 1                      # GDeflate 32-code distance space
        de = jnp.maximum(30 - jax.lax.clz(d), 0)
        dc = jnp.where(d < 4, d,
                       ((de + 1) << 1)
                       | (jax.lax.shift_right_logical(d, de) - 2))
        de = jnp.where(d < 4, 0, de)
        return dc, de, d & (jax.lax.shift_left(jnp.int32(1), de) - 1)

    if mode == "hist":
        def emit_lit(t, v):
            llh_ref[b, v] = llh_ref[b, v] + 1

        def emit_match(t, ml, dist):
            li, _, _ = _len_fields(ml)
            dc, _, _ = _dist_fields(dist)
            llh_ref[b, 257 + li] = llh_ref[b, 257 + li] + 1
            dh_ref[b, dc] = dh_ref[b, dc] + 1
    elif mode == "emit":
        def emit_lit(t, v):
            j = t & (N_LANES - 1)
            ent = tab_ref[b, v]
            n = jax.lax.shift_right_logical(ent, jnp.int32(16))
            lane_put(j, ent & 0xFFFF, n)
            rec_nb(t, n)

        def emit_match(t, ml, dist):
            j = t & (N_LANES - 1)
            li, e, ev = _len_fields(ml)
            ent = tab_ref[b, 257 + li]
            n1 = jax.lax.shift_right_logical(ent, jnp.int32(16))
            lane_put(j, ent & 0xFFFF, n1)
            lane_put(j, ev, e)
            dc, de, dv = _dist_fields(dist)
            dent = tab_ref[b, 288 + dc]
            n3 = jax.lax.shift_right_logical(dent, jnp.int32(16))
            lane_put(j, dent & 0xFFFF, n3)
            lane_put(j, dv, de)
            rec_nb(t, n1 | (e << 4) | (n3 << 8) | (de << 12))
    else:
        def emit_lit(t, v):
            j = t & (N_LANES - 1)
            lo_range = v < 144
            code = jnp.where(lo_range, 0x30 + v, 0x190 + v - 144)
            n = jnp.where(lo_range, jnp.int32(8), jnp.int32(9))
            lane_put(j, rev(code, n), n)
            rec_nb(t, n)

        def emit_match(t, ml, dist):
            j = t & (N_LANES - 1)
            li, e, ev = _len_fields(ml)
            lsym = 257 + li
            short = lsym < 280
            code = jnp.where(short, lsym - 256, 0xC0 + lsym - 280)
            n1 = jnp.where(short, jnp.int32(7), jnp.int32(8))
            lane_put(j, rev(code, n1), n1)
            lane_put(j, ev, e)
            dc, de, dv = _dist_fields(dist)
            lane_put(j, rev(dc, 5), 5)
            lane_put(j, dv, de)
            rec_nb(t, n1 | (e << 4) | (5 << 8) | (de << 12))

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

    def emit_lits(t, a, b2):
        def body(i, t):
            emit_lit(t, getb(i))
            return t + 1

        return jax.lax.fori_loop(a, b2, body, t)

    def wcond(carry):
        anchor, scan, t, cont = carry
        return cont

    def wbody(carry):
        anchor, scan, t, _ = carry
        nm = nxt_ref[0, 0, scan - base]

        def take(a):
            anchor, scan, t = a
            # two candidates: extend both forward, keep the longer
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
            c = nm - src

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
            t = emit_lits(t, anchor, nm2)
            emit_match(t, ml, c)
            nip = nm2 + ml
            return nip, nip, t + 1

        in_win = nm < wend
        usable = jnp.logical_and(in_win, nm < mflimit)
        anchor, scan, t = jax.lax.cond(
            usable, take,
            lambda a: (a[0], jnp.where(in_win, size, nm), a[2]),
            (anchor, scan, t))
        cont = jnp.logical_and(scan < wend, scan < mflimit)
        scan = jnp.where(scan < mflimit, scan, jnp.maximum(scan, size))
        return anchor, scan, t, cont

    anchor0, scan0, t0 = st_ref[0], st_ref[1], st_ref[2]
    run = jnp.logical_and(scan0 < wend, jnp.logical_and(scan0 >= base,
                                                        scan0 < mflimit))
    anchor, scan, t, _ = jax.lax.while_loop(
        wcond, wbody, (anchor0, jnp.maximum(scan0, base), t0, run))
    anchor = jnp.where(run, anchor, anchor0)
    scan = jnp.where(run, scan, scan0)
    t = jnp.where(run, t, t0)
    st_ref[0], st_ref[1], st_ref[2] = anchor, scan, t

    if mode == "hist":
        @pl.when(s == n_slabs - 1)
        def _():
            emit_lits(st_ref[2], st_ref[0], size)
        return

    @pl.when(s == n_slabs - 1)
    def _():
        tf = emit_lits(st_ref[2], st_ref[0], size)

        def fin(j, c):
            nb = ln_ref[2 * N_LANES + j]
            cnt = ln_ref[3 * N_LANES + j]

            @pl.when(jnp.logical_and(nb > 0, cnt < WCAP))
            def _():
                lw_ref[0, 0, j * WCAP + cnt] = ln_ref[j]
            st_ref[3] = jnp.where(jnp.logical_or(nb == 0, cnt < WCAP),
                                  st_ref[3], jnp.int32(1))
            dcnt_ref[0, 0, j] = cnt + (nb > 0).astype(jnp.int32)
            return c
        jax.lax.fori_loop(0, N_LANES, fin, jnp.int32(0))
        meta_ref[0, 0, 0] = tf
        meta_ref[0, 0, 1] = st_ref[3]
        meta_ref[0, 0, 2] = jnp.where(tf > NT_CAP, jnp.int32(1), jnp.int32(0))
        meta_ref[0, 0, 3] = jnp.int32(0)


def _prep(data, sizes, entropy_only=False):
    B, cap = data.shape
    n_slabs = max(1, -(-cap // SLAB))
    pad_to = n_slabs * SLAB
    if entropy_only:
        cand = jnp.zeros((B, 1, pad_to), jnp.int32)
        cand8 = jnp.full((B, 1, pad_to), -1, jnp.int32)
        nxt = jnp.full((B, 1, pad_to), pad_to - 1, jnp.int32)
    else:
        cand, cand8, nxt = vmatch.candidates2(data, sizes)
        cand = jnp.pad(cand, ((0, 0), (0, pad_to - cap)),
                       constant_values=-1)
        cand8 = jnp.pad(cand8, ((0, 0), (0, pad_to - cap)),
                        constant_values=-1)
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


def _emit_out(B):
    nt2 = NT_CAP // 2
    specs = [
        pl.BlockSpec((1, 1, N_LANES * WCAP), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, nt2), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, N_LANES), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 4), lambda i, s: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    shapes = [
        jax.ShapeDtypeStruct((B, 1, N_LANES * WCAP), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, nt2), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, N_LANES), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, 4), jnp.int32),
    ]
    return specs, shapes


def _run_kernel(data, sizes, interpret, mode="fixed", tab=None,
                entropy_only=False, prep=None):
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)
    if prep is None:
        prep = _prep(data, sizes, entropy_only=entropy_only)
    cand, cand8, nxt, words, lanes, n_slabs, wpad, lpad = prep

    with jax.enable_x64(False):
        if mode == "hist":
            llh, dh = pl.pallas_call(
                functools.partial(_kernel, wpad // 4, n_slabs, "hist"),
                grid=(B, n_slabs),
                in_specs=_in_specs(wpad, lpad),
                out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((B, 288), jnp.int32),
                           jax.ShapeDtypeStruct((B, 32), jnp.int32)],
                scratch_shapes=[pltpu.SMEM((8,), jnp.int32),
                                pltpu.SMEM((4 * N_LANES,), jnp.int32)],
                interpret=interpret,
            )(sizes, words, cand, cand8, nxt, lanes)
            return llh, dh
        specs, shapes = _emit_out(B)
        ins = _in_specs(wpad, lpad)
        args = [sizes, words, cand, cand8, nxt, lanes]
        if mode == "emit":
            ins = ins + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            args = args + [tab]
        lw, nb16, dcnt, meta = pl.pallas_call(
            functools.partial(_kernel, wpad // 4, n_slabs, mode),
            grid=(B, n_slabs),
            in_specs=ins,
            out_specs=specs,
            out_shape=shapes,
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32),
                            pltpu.SMEM((4 * N_LANES,), jnp.int32)],
            interpret=interpret,
        )(*args)
    return (lw.reshape(B, -1), nb16.reshape(B, -1),
            dcnt.reshape(B, -1), meta.reshape(B, -1))


def _schedule_and_assemble(lw, nb16, D, ntok, data_row, size, out_cap,
                           btype=None, desc_words=None, hdr_bytes=None):
    """Per-chunk XLA stage: decode-order interleave + tile bytes.
    ``btype``/``desc_words``/``hdr_bytes`` add the dynamic table description
    region (btype-2 tiles; ``tests/gdeflate_pyref.py`` bytes 76...)."""
    R4 = (NT_CAP // N_LANES) * 4
    if btype is None:
        btype = jnp.int32(1)
        desc_words = jnp.zeros((DESC_WORDS,), jnp.int32)
        hdr_bytes = jnp.int32(0)

    # unpack per-token 4x4-bit field counts -> field-major event grid
    t_ids = jnp.arange(NT_CAP, dtype=jnp.int32)
    tw = jax.lax.shift_right_logical(
        nb16[t_ids >> 1], (t_ids & 1) * 16) & 0xFFFF
    tw = jnp.where(t_ids < ntok, tw, 0)
    f = jnp.stack([tw & 0xF, (tw >> 4) & 0xF, (tw >> 8) & 0xF,
                   (tw >> 12) & 0xF], axis=1)           # (NT, 4)
    ev = f.reshape(NT_CAP // N_LANES, N_LANES, 4)
    ev = jnp.transpose(ev, (0, 2, 1)).reshape(R4, N_LANES)

    B_ = jnp.cumsum(ev, axis=0).astype(jnp.int32) - ev  # exclusive prefix
    d_ev = jnp.minimum((B_ + 63) >> 5, D[None, :])      # dwords before event

    # e_first(j, w) = #{e : d_ev[e, j] <= w}, via blocked compare-count
    # (monotone columns; no searchsorted -> no scalarized gathers)
    WB = 64

    def blk(wlo):
        wv = wlo + jnp.arange(WB, dtype=jnp.int32)
        return jnp.sum((d_ev[:, None, :] <= wv[None, :, None])
                       .astype(jnp.int32), axis=0)      # (WB, N_LANES)

    ef = jax.lax.map(blk, jnp.arange(0, WCAP, WB, dtype=jnp.int32))
    ef = ef.reshape(WCAP, N_LANES)                       # e_first per (w, j)

    # decode order: sort lane dwords by (e_first, lane, w); invalid last
    jj = jnp.broadcast_to(jnp.arange(N_LANES, dtype=jnp.int32)[:, None],
                          (N_LANES, WCAP)).reshape(-1)
    ww = jnp.broadcast_to(jnp.arange(WCAP, dtype=jnp.int32)[None, :],
                          (N_LANES, WCAP)).reshape(-1)
    efl = jnp.transpose(ef).reshape(-1)
    valid = ww < D[jj]
    efl = jnp.where(valid, efl, jnp.int32(R4 + 1))
    # all three keys fit in 29 bits (e_first <= R4+1 < 2^14, lane < 2^5,
    # w < 2^10): pack into ONE int32 key.  The 4-operand 3-key lax.sort
    # compiled in ~49 s on TPU (multi-key comparator); the packed
    # single-key 2-operand form is ~12 s with identical output.
    key = (efl << 15) | (jj << 10) | ww
    _, stream = jax.lax.sort((key, lw), num_keys=1)
    W = jnp.sum(D)

    # tile bytes: 12 B header, 32 u16 lane counts, stream DWORDs
    def u32b(v):
        v = v.astype(jnp.int32)
        return jnp.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
                          jax.lax.shift_right_logical(v, jnp.int32(24))
                          & 0xFF])

    hdr_pad = (hdr_bytes + 3) & ~3
    hdr = jnp.concatenate([
        btype[None], jnp.zeros((1,), jnp.int32), u32b(ntok), u32b(size),
        jnp.stack([hdr_bytes & 0xFF,
                   jax.lax.shift_right_logical(hdr_bytes, jnp.int32(8))])])
    ltab = jnp.stack([D & 0xFF, jax.lax.shift_right_logical(D, jnp.int32(8))],
                     axis=1).reshape(-1)
    sb = jnp.stack([stream & 0xFF,
                    jax.lax.shift_right_logical(stream, jnp.int32(8)) & 0xFF,
                    jax.lax.shift_right_logical(stream, jnp.int32(16)) & 0xFF,
                    jax.lax.shift_right_logical(stream, jnp.int32(24)) & 0xFF],
                   axis=1).reshape(-1)
    pos = jnp.arange(out_cap, dtype=jnp.int32)
    head = jnp.concatenate([hdr, ltab]).astype(jnp.uint8)   # PAYLOAD bytes
    head = jnp.pad(head, (0, max(0, out_cap - head.shape[0])))[:out_cap]
    tile = jnp.where(pos < PAYLOAD, head, 0)
    # dynamic table description region at [PAYLOAD, PAYLOAD + hdr_pad)
    di_ = jnp.clip(pos - PAYLOAD, 0, 4 * DESC_WORDS - 1)
    desc_b = (jax.lax.shift_right_logical(
        desc_words[di_ >> 2].astype(jnp.uint32), ((di_ & 3) * 8).astype(jnp.uint32))
        & 0xFF).astype(jnp.uint8)
    tile = jnp.where(jnp.logical_and(pos >= PAYLOAD,
                                     pos < PAYLOAD + hdr_bytes), desc_b, tile)
    dw_start = PAYLOAD + hdr_pad
    si = pos - dw_start
    sbp = jnp.pad(sb.astype(jnp.uint8),
                  (0, max(0, out_cap - sb.shape[0])))
    st_b = sbp[jnp.clip(si, 0, sbp.shape[0] - 1)]
    total = dw_start + 4 * W
    tile = jnp.where(jnp.logical_and(pos >= dw_start, pos < total), st_b,
                     tile)

    # stored fallback: tiny, expanded, or lane-overflow chunks
    stored_hdr = jnp.concatenate([
        jnp.zeros((2,), jnp.int32), u32b(jnp.int32(0)), u32b(size),
        jnp.zeros((2,), jnp.int32)]).astype(jnp.uint8)
    stored = jnp.concatenate([stored_hdr,
                              jnp.pad(data_row, (0, max(0, out_cap - HDR
                                                        - data_row.shape[0])))
                              [:out_cap - HDR]])[:out_cap]
    stored = jnp.where(pos < HDR + size, stored, 0)
    return tile, total, stored, HDR + size


DESC_WORDS = 96   # 384-byte description cap (matches formats.gdeflate)


def _dyn_tables_gd(llh, dh):
    """Phase B (vectorized XLA, one tile): exact walk histograms -> dynamic
    Huffman tables + the packed table-description words.  Pure int32 and
    scatter-free (both i64 and scatters measured as whole-pipeline stalls on
    v5e — see deflate_encode._dyn_tables).

    Returns ``(tab int32[320], desc_words int32[DESC_WORDS], hdr_bytes,
    use_dyn)`` with ``tab[sym] = rev_code | len << 16`` (litlen 0..287, dist
    at 288..319)."""
    from tpucomp.formats.deflate import (CL_ORDER, FIXED_LIT_LENS, MAX_BITS,
                                         _assign_codes, _huff_lengths,
                                         _rev_bits)
    from tpucomp.formats.gdeflate import FIXED_GDIST_LENS

    lit_freq = llh
    no_match = jnp.sum(dh) == 0
    dist_freq = dh + jnp.where(
        jnp.logical_and(no_match, jnp.arange(32) == 0), 1, 0).astype(jnp.int32)

    dyn_lit_lens, ok_l = _huff_lengths(lit_freq[:286], MAX_BITS)
    dyn_dist_lens, ok_d = _huff_lengths(dist_freq, MAX_BITS)
    dyn_lit_lens = jnp.pad(dyn_lit_lens, (0, 2))
    all_lens = jnp.clip(jnp.concatenate([dyn_lit_lens[:286], dyn_dist_lens]),
                        0, 15)
    cl_freq = jnp.sum(
        (all_lens[:, None] == jnp.arange(19, dtype=jnp.int32)[None, :])
        .astype(jnp.int32), axis=0)
    cl_lens, ok_c = _huff_lengths(cl_freq, 7)
    cl_codes = _assign_codes(cl_lens, 7)
    use_dyn = jnp.logical_and(ok_l, jnp.logical_and(ok_d, ok_c))

    fixed_ll = jnp.asarray(FIXED_LIT_LENS)
    fixed_dl = jnp.asarray(FIXED_GDIST_LENS)
    cl_hdr_bits = 14 + 19 * 3 + jnp.sum(cl_lens[all_lens])
    pay_fixed = (jnp.sum(lit_freq * fixed_ll) + jnp.sum(dist_freq * fixed_dl))
    pay_dyn = (jnp.sum(lit_freq * dyn_lit_lens)
               + jnp.sum(dist_freq * dyn_dist_lens))
    use_dyn = jnp.logical_and(use_dyn, cl_hdr_bits + pay_dyn < pay_fixed)

    ll = jnp.where(use_dyn, dyn_lit_lens, fixed_ll)
    dl = jnp.where(use_dyn, dyn_dist_lens, fixed_dl)
    lc = _assign_codes(ll, MAX_BITS)
    dc = _assign_codes(dl, MAX_BITS)
    tab = jnp.concatenate([
        _rev_bits(lc, ll).astype(jnp.int32) | (ll.astype(jnp.int32) << 16),
        _rev_bits(dc, dl).astype(jnp.int32) | (dl.astype(jnp.int32) << 16),
    ])

    # description fields: HLIT-257(5) HDIST-1(5) HCLEN-4(4), 19x3 CL lens,
    # 318 CL-coded lengths — every field <= 7 bits, spans <= 2 words
    sym_val = _rev_bits(cl_codes[all_lens], cl_lens[all_lens])
    vals = jnp.concatenate([jnp.asarray([29, 31, 15], jnp.int32),
                            cl_lens[jnp.asarray(CL_ORDER)], sym_val])
    bits = jnp.concatenate([jnp.asarray([5, 5, 4], jnp.int32),
                            jnp.full((19,), 3, jnp.int32),
                            cl_lens[all_lens]])
    bits = jnp.where(use_dyn, bits, 0)
    bit_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(bits)[:-1].astype(jnp.int32)])
    total_bits = jnp.sum(bits)
    word_idx = bit_off >> 5
    sh = bit_off & 31
    v32 = vals.astype(jnp.uint32)
    part0 = jax.lax.shift_left(v32, sh.astype(jnp.uint32))
    part1 = jnp.where(sh > 0, jax.lax.shift_right_logical(
        v32, (32 - sh).astype(jnp.uint32)), jnp.uint32(0))
    cols = jnp.arange(DESC_WORDS, dtype=jnp.int32)[None, :]
    live = (bits > 0)[:, None]
    m0 = jnp.logical_and(word_idx[:, None] == cols, live)
    m1 = jnp.logical_and(word_idx[:, None] + 1 == cols, live)
    wv = jnp.sum(jnp.where(m0, part0[:, None], 0)
                 + jnp.where(m1, part1[:, None], 0), axis=0, dtype=jnp.uint32)
    desc_words = jax.lax.bitcast_convert_type(wv, jnp.int32)
    hdr_bytes = jnp.where(use_dyn, (total_bits + 7) >> 3, 0)
    return tab, desc_words, hdr_bytes.astype(jnp.int32), use_dyn


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret",
                                             "entropy_only"))
def compress_batch_dyn(data: jax.Array, sizes: jax.Array, out_cap: int,
                       interpret: bool = False, entropy_only: bool = False):
    """Batched GDeflate encode with per-tile dynamic Huffman tables — the
    TPU path for the reference's algo-1 high-compression rung (algo 2 via
    ``entropy_only``).  Three phases over ONE shared parse: hist walk ->
    vectorized table/description build -> emit walk; then the shared
    decode-order schedule/assembly with btype-2 tiles."""
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)
    prep = _prep(data, sizes, entropy_only=entropy_only)
    llh, dh = _run_kernel(data, sizes, interpret, mode="hist", prep=prep)
    tab, desc, hdrb, use_dyn = jax.vmap(_dyn_tables_gd)(llh, dh)
    lw, nb16, dcnt, meta = _run_kernel(data, sizes, interpret, mode="emit",
                                       tab=tab, prep=prep)

    def one(args):
        lwr, nbr, dr, mr, drow, sz, tabr, descr, hb, ud = args
        btype = jnp.where(ud, jnp.int32(2), jnp.int32(1))
        tile, total, stored, stot = _schedule_and_assemble(
            lwr, nbr, dr, mr[0], drow, sz, out_cap,
            btype=btype, desc_words=descr, hdr_bytes=hb)
        use_stored = jnp.logical_or(
            jnp.logical_or(mr[1] != 0, mr[2] != 0),
            jnp.logical_or(sz < 16, total >= stot))
        out = jnp.where(use_stored, stored, tile)
        osz = jnp.where(use_stored, stot, total)
        too_big = osz > out_cap
        osz = jnp.where(too_big, 0, osz).astype(jnp.int32)
        stat = jnp.where(too_big,
                         jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                         jnp.int32(Status.SUCCESS))
        out = jnp.where(jnp.arange(out_cap, dtype=jnp.int32) < osz, out, 0)
        return out, osz, stat

    out, osz, stat = jax.lax.map(
        one, (lw, nb16, dcnt, meta, data, sizes, tab, desc, hdrb, use_dyn))
    return out.astype(jnp.uint8), osz, stat


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched GDeflate algo-0 encode, Pallas backend.  Same contract as
    :func:`tpucomp.formats.gdeflate.compress_batch` (tile container per
    ``tests/gdeflate_pyref.py``); chunks <= 64 KiB."""
    B, cap = data.shape
    sizes = sizes.astype(jnp.int32)
    lw, nb16, dcnt, meta = _run_kernel(data, sizes, interpret)

    def one(args):
        lwr, nbr, dr, mr, drow, sz = args
        tile, total, stored, stot = _schedule_and_assemble(
            lwr, nbr, dr, mr[0], drow, sz, out_cap)
        use_stored = jnp.logical_or(
            jnp.logical_or(mr[1] != 0, mr[2] != 0),
            jnp.logical_or(sz < 16, total >= stot))
        out = jnp.where(use_stored, stored, tile)
        osz = jnp.where(use_stored, stot, total)
        too_big = osz > out_cap
        osz = jnp.where(too_big, 0, osz).astype(jnp.int32)
        stat = jnp.where(too_big,
                         jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                         jnp.int32(Status.SUCCESS))
        out = jnp.where(jnp.arange(out_cap) < osz, out, 0)
        return out, osz, stat

    out, osz, stat = jax.lax.map(one, (lw, nb16, dcnt, meta, data, sizes))
    return out.astype(jnp.uint8), osz, stat
