"""TPU-fast Cascaded codec path (same container as ``tpucomp.formats.cascaded``).

The general XLA program in ``formats/cascaded.py`` is fully dynamic (one
compiled program decodes any ``(type, num_rles, num_deltas, use_bp)``) but it
pays for that generality in TPU-hostile currency: int64 emulation on a 32-bit
vector unit, per-byte gathers for element assembly, scatter-adds in the bit
packer, and full-width gathers for stream assembly.  Measured on silicon
(round 4): 0.008 GB/s encode / 0.003 GB/s decode — CPU class, on the format
family whose reference numbers are the *fastest* in nvCOMP's chart
(``doc/Benchmarks.md:80-95``, Cascaded on mortgage columns).

This module is the TPU-first rewrite, dispatched like a Pallas kernel (it is
pure XLA, but it is the device fast path):

- **32-bit lanes end to end.**  All element math is exact mod 2^64 via
  (lo, hi) uint32 pairs and limb-split prefix sums; decoded output truncates
  to the element width, so mod-2^(8*ts) agreement is sufficient and no s64
  emulation is ever needed.
- **Reshape-based element assembly** (static element size on the encode side,
  a 4-way static-shape select on decode).
- **Static-width bit packing** drawn from ``bitpack.W64``: each width's
  pack/unpack is a static-shape shift/OR over ``lcm(32, b)``-bit groups —
  zero gathers, zero scatters.  The general encoder rounds into the same set
  (``bitpack.round_width``), so frames from either encoder decode on either
  path.
- **dynamic_slice word fetch** (streams are 4-byte aligned by construction)
  and **dynamic_update_slice stream assembly** — no per-byte gathers.

Encode fast path covers 1/2/4-byte element types (8-byte types keep the
general path, where 64-bit FOR headroom genuinely needs int64); decode covers
every type and every ``W64`` width.  Legal container frames with other exact
widths (emitted by nothing since round 4) still decode on the general path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tpucomp.constants import ElementType, Status
from tpucomp.formats import cascaded as fc
from tpucomp.ops.bitpack import W32, W64, round_width

import numpy as np

_U32 = jnp.uint32
# numpy scalar, not a jnp array: module-level jax arrays leak cached tracers
_MASKF = np.uint32(0xFFFFFFFF)


# =====================================================================================
# static-width pack / unpack (per stream; caller vmaps over chunks)
# =====================================================================================

def _pack_static(lo: jax.Array, hi: jax.Array, b: int,
                 cap_words: int) -> jax.Array:
    """Pack ``(hi << 32 | lo)`` values (pre-masked to ``b`` bits) at static
    width ``b`` into uint32 words, LSB-first contiguous (bit position of
    value i = i*b) — identical layout to ``tpucomp.ops.bitpack.pack``.

    Layout (round 5): every vector op runs over the GROUP axis (thousands of
    lanes), with the word/element structure unrolled as Python constants.
    The round-4 version put the group axis major and the <=32-element group
    axis minor, wasting up to 127/128 TPU lanes — measured 170x off VPU peak.
    Two miscompile hazards shaped this code: an unrolled column-extract +
    shift-OR chain over the minor axis was MISCOMPILED by XLA (bits at
    shifts 16..22 silently dropped, CPU and TPU, round 4) — contributions
    within a word are bit-disjoint, so ``+`` replaces ``|`` in the per-word
    accumulation exactly as the round-4 fix did.
    """
    cap = lo.shape[0]
    if b == 0:
        return jnp.zeros((cap_words,), _U32)
    lcm = (32 * b) // math.gcd(32, b)
    ge, gw = lcm // b, lcm // 32          # elements / words per group
    ng = -(-cap // ge)
    # (ng, ge) -> (ge, ng): group axis minor = full lane utilization
    lov = jnp.pad(lo, (0, ng * ge - cap)).reshape(ng, ge).T
    hiv = jnp.pad(hi, (0, ng * ge - cap)).reshape(ng, ge).T
    cols = []
    for w in range(gw):
        acc = jnp.zeros((ng,), _U32)
        for e in range(ge):
            sv = e * b - 32 * w           # value e's bit offset within word w
            if sv <= -b or sv >= 32:
                continue                  # no overlap with word w
            if sv >= 0:
                acc = acc + (lov[e] << _U32(sv))
            elif sv > -32:
                t = lov[e] >> _U32(-sv)
                if b > 32 and sv + 32 < 32:
                    t = t | (hiv[e] << _U32(sv + 32))
                acc = acc + t
            else:
                acc = acc + (hiv[e] >> _U32(-sv - 32))
        cols.append(acc)
    flat = jnp.stack(cols, axis=1).reshape(-1)   # (ng, gw) -> word order
    return jnp.pad(flat, (0, max(0, cap_words - flat.shape[0])))[:cap_words]


def _unpack_static(words: jax.Array, b: int,
                   cap_el: int) -> tuple[jax.Array, jax.Array]:
    """Inverse of :func:`_pack_static` -> (lo, hi) uint32 pairs, masked.

    Same round-5 layout rule as the packer: ops run over the group axis
    (lanes full), word/element structure unrolled as Python constants.
    Within a group of ``ge`` elements spanning ``gw`` words, element e's bits
    [e*b, e*b+b) never cross the group boundary, so at most two in-group
    words feed each output limb.
    """
    z = jnp.zeros((cap_el,), _U32)
    if b == 0:
        return z, z
    lcm = (32 * b) // math.gcd(32, b)
    ge, gw = lcm // b, lcm // 32
    ng = -(-cap_el // ge)
    nw = words.shape[0]
    # (ng, gw) -> (gw, ng): group axis minor = full lane utilization
    wds = jnp.pad(words, (0, max(0, ng * gw - nw)))[:ng * gw] \
        .reshape(ng, gw).T
    los, his = [], []
    blo = min(b, 32)
    for e in range(ge):
        sv = e * b                        # bit offset of value e in the group
        w0, sh = sv >> 5, sv & 31
        lo = wds[w0] >> _U32(sh)
        if sh + blo > 32:                 # straddles into the next word
            lo = lo | (wds[w0 + 1] << _U32(32 - sh))
        if b < 32:
            lo = lo & _U32((1 << b) - 1)
        los.append(lo)
        if b > 32:
            sv2 = sv + 32
            w1, sh1 = sv2 >> 5, sv2 & 31
            hi = wds[w1] >> _U32(sh1)
            if sh1 + (b - 32) > 32:
                hi = hi | (wds[w1 + 1] << _U32(32 - sh1))
            if b < 64:
                hi = hi & _U32((1 << (b - 32)) - 1)
            his.append(hi)
    lo = jnp.stack(los, axis=1).reshape(-1)[:cap_el]   # (ng, ge) -> elements
    hi = (jnp.stack(his, axis=1).reshape(-1)[:cap_el] if his else z)
    return lo, hi


def _width_index(bits: jax.Array, widths) -> jax.Array:
    """Index of ``bits`` in the ascending ``widths`` ladder (traced)."""
    idx = jnp.zeros((), jnp.int32)
    for w in widths[1:]:
        idx = idx + (bits >= w).astype(jnp.int32)
    return idx


def pack_any(lo: jax.Array, hi: jax.Array, bits: jax.Array, cap_words: int,
             widths=W64) -> jax.Array:
    """Pack at traced width ``bits`` (a member of ``widths``).

    ``lax.switch`` so only the taken width's static pack EXECUTES (under a
    scalar trace, i.e. ``lax.map`` over chunks — under ``vmap`` all
    branches would run and select, the round-4 measured 14x waste)."""
    def mk(b):
        if b == 0:
            return lambda a: jnp.zeros((cap_words,), _U32)
        return lambda a, b=b: _pack_static(a[0], a[1], b, cap_words)

    return jax.lax.switch(_width_index(bits, widths),
                          [mk(b) for b in widths], (lo, hi))


def unpack_any(words: jax.Array, bits: jax.Array, cap_el: int,
               widths=W64) -> tuple[jax.Array, jax.Array]:
    def mk(b):
        if b == 0:
            z = jnp.zeros((cap_el,), _U32)
            return lambda w: (z, z)
        return lambda w, b=b: _unpack_static(w, b, cap_el)

    return jax.lax.switch(_width_index(bits, widths),
                          [mk(b) for b in widths], words)


# =====================================================================================
# exact mod-2^64 arithmetic on (lo, hi) uint32 pairs
# =====================================================================================

def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(_U32)
    return lo, ahi + bhi + carry


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(_U32)
    return lo, ahi - bhi - borrow


def _cumsum64(lo: jax.Array, hi: jax.Array, count: jax.Array):
    """Inclusive prefix sum mod 2^64 of (lo, hi)[:count], exactly.

    uint32 limb prefix sums: with limb width L and n terms, each limb sum is
    < n * 2^L, so L=16 is exact for n <= 2^16 and L=11 up to n <= 2^20.  The
    carry out of the low word is recovered exactly from the limb sums.
    """
    cap = lo.shape[0]
    valid = jnp.arange(cap) < count
    lo = jnp.where(valid, lo.astype(_U32), 0)
    hi = jnp.where(valid, hi.astype(_U32), 0)
    if cap <= (1 << 16):
        a = jnp.cumsum(lo & 0xFFFF, dtype=_U32)
        bsum = jnp.cumsum(lo >> 16, dtype=_U32)
        out_lo = a + (bsum << 16)
        carry = ((a >> 16) + bsum) >> 16
        # hi is the TOP limb: its running sum only matters mod 2^32, and
        # int32 addition wraps — one cumsum, no limb split
        hsum = jax.lax.bitcast_convert_type(
            jnp.cumsum(jax.lax.bitcast_convert_type(hi, jnp.int32),
                       dtype=jnp.int32), _U32)
    else:
        assert cap <= (1 << 20), "cascaded fast path caps chunks at 1 MiB"
        a = jnp.cumsum(lo & 0x7FF, dtype=_U32)            # bits [0, 11)
        bsum = jnp.cumsum((lo >> 11) & 0x7FF, dtype=_U32)  # bits [11, 22)
        c = jnp.cumsum(lo >> 22, dtype=_U32)               # bits [22, 32)
        out_lo = a + (bsum << 11) + (c << 22)
        t1 = (a >> 11) + bsum                               # < 2^32
        t2 = (t1 >> 11) + c                                 # < 2^32
        carry = t2 >> 10
        hsum = jax.lax.bitcast_convert_type(
            jnp.cumsum(jax.lax.bitcast_convert_type(hi, jnp.int32),
                       dtype=jnp.int32), _U32)
    return out_lo, hsum + carry


def _bitlen64(rlo: jax.Array, rhi: jax.Array) -> jax.Array:
    r = jnp.zeros((), jnp.int32)
    for k in range(32):
        r = r + ((rlo >> k) > 0).astype(jnp.int32)
    r2 = jnp.zeros((), jnp.int32)
    for k in range(32):
        r2 = r2 + ((rhi >> k) > 0).astype(jnp.int32)
    return jnp.where(rhi > 0, 32 + r2, r)


def _minmax_width(lo, hi, count):
    """Frame-of-reference (vmin_lo, vmin_hi, bits) over (lo, hi)[:count].

    Both the unsigned and the signed (two's-complement) 64-bit orderings are
    tried and the narrower range wins: either choice reconstructs exactly mod
    2^64, which is all decode needs (see module docstring)."""
    cap = lo.shape[0]
    valid = jnp.arange(cap) < count

    def rng_for(offset_hi):
        oh = hi ^ offset_hi
        kh_min = jnp.min(jnp.where(valid, oh, _MASKF))
        at_min = jnp.logical_and(valid, oh == kh_min)
        kl_min = jnp.min(jnp.where(at_min, lo, _MASKF))
        kh_max = jnp.max(jnp.where(valid, oh, _U32(0)))
        at_max = jnp.logical_and(valid, oh == kh_max)
        kl_max = jnp.max(jnp.where(at_max, lo, _U32(0)))
        rlo, rhi = _sub64(kl_max, kh_max, kl_min, kh_min)
        return (kl_min, kh_min ^ offset_hi), (rlo, rhi)

    umin, urng = rng_for(_U32(0))
    smin, srng = rng_for(_U32(0x80000000))
    ubits, sbits = _bitlen64(*urng), _bitlen64(*srng)
    use_s = sbits < ubits
    bits = jnp.where(use_s, sbits, ubits)
    vlo = jnp.where(use_s, smin[0], umin[0])
    vhi = jnp.where(use_s, smin[1], umin[1])
    bits = jnp.where(count > 0, bits, 0)
    vlo = jnp.where(count > 0, vlo, 0)
    vhi = jnp.where(count > 0, vhi, 0)
    return vlo, vhi, bits


# =====================================================================================
# encode (element size static from opts; 1/2/4-byte types in pure 32-bit lanes)
# =====================================================================================

def _rle32(v: jax.Array, count: jax.Array):
    """Run-length encode int32 ``v[:count]`` -> (vals, runs, n_runs).

    All outputs pinned to int32 (jax_enable_x64 silently promotes sums)."""
    cap = v.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid = idx < count
    prev = jnp.concatenate([v[:1] ^ jnp.int32(-1), v[:-1]])
    boundary = jnp.logical_and(valid, v != prev)
    n_runs = jnp.sum(boundary.astype(jnp.int32)).astype(jnp.int32)
    starts = jnp.sort(jnp.where(boundary, idx, jnp.int32(2**30)))
    vals = v[jnp.clip(starts, 0, cap - 1)]
    nxt = jnp.concatenate([starts[1:], jnp.full((1,), 2**30, jnp.int32)])
    runs = jnp.clip(jnp.minimum(nxt, count.astype(jnp.int32)) - starts,
                    0, cap).astype(jnp.int32)
    return vals, runs, n_runs


def _u32b(x):
    x = x.astype(_U32)
    return jnp.stack([x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF,
                      (x >> 24) & 0xFF]).astype(jnp.uint8)


def _stream_tail(vlo, vhi, bits, words, n_words, f0=(None, None),
                 f1=(None, None)):
    """Serialize one stream (32-byte header + words) -> (bytes, byte_len)."""
    z = _U32(0)
    hdr = jnp.concatenate([
        _u32b(vlo), _u32b(vhi),
        jnp.array([0], jnp.uint8).at[0].set(bits.astype(jnp.uint8)),
        jnp.zeros((7,), jnp.uint8),
        _u32b(f0[0] if f0[0] is not None else z),
        _u32b(f0[1] if f0[1] is not None else z),
        _u32b(f1[0] if f1[0] is not None else z),
        _u32b(f1[1] if f1[1] is not None else z),
    ])
    wb = jnp.stack([words & 0xFF, (words >> 8) & 0xFF, (words >> 16) & 0xFF,
                    (words >> 24) & 0xFF], axis=1).reshape(-1).astype(jnp.uint8)
    return jnp.concatenate([hdr, wb]), fc.STREAM_HEADER_BYTES + 4 * n_words


def _rle64(lo: jax.Array, hi: jax.Array, count: jax.Array):
    """64-bit RLE on (lo, hi) pairs -> (vals_lo, vals_hi, runs, n_runs)."""
    cap = lo.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid = idx < count
    plo = jnp.concatenate([lo[:1] ^ _MASKF, lo[:-1]])
    phi = jnp.concatenate([hi[:1], hi[:-1]])
    boundary = jnp.logical_and(valid, jnp.logical_or(lo != plo, hi != phi))
    n_runs = jnp.sum(boundary.astype(jnp.int32)).astype(jnp.int32)
    starts = jnp.sort(jnp.where(boundary, idx, jnp.int32(2**30)))
    sc = jnp.clip(starts, 0, cap - 1)
    nxt = jnp.concatenate([starts[1:], jnp.full((1,), 2**30, jnp.int32)])
    runs = jnp.clip(jnp.minimum(nxt, count.astype(jnp.int32)) - starts,
                    0, cap).astype(jnp.int32)
    return lo[sc], hi[sc], runs, n_runs


def encode_chunk(data: jax.Array, size: jax.Array, opts, out_cap: int):
    """Fast-path compress of one chunk (all element types, 32-bit lanes)."""
    cap_bytes = data.shape[0]
    ts = 1 if opts.type == ElementType.BITS else opts.type.nbytes
    signed = opts.type.is_signed and opts.type != ElementType.BITS
    cap_el = -(-cap_bytes // ts)
    if cap_el * ts != cap_bytes:
        data = jnp.pad(data, (0, cap_el * ts - cap_bytes))

    bad_size = (size % ts) != 0
    n = (size // ts).astype(jnp.int32)

    b = data.reshape(cap_el, ts).astype(_U32)
    lo = b[:, 0]
    for k in range(1, min(ts, 4)):
        lo = lo | (b[:, k] << (8 * k))
    if ts == 8:
        hi = b[:, 4]
        for k in range(5, 8):
            hi = hi | (b[:, k] << (8 * (k - 4)))
    elif signed and ts < 4:
        s = jax.lax.bitcast_convert_type(lo, jnp.int32)
        sh = 32 - 8 * ts
        lo = jax.lax.bitcast_convert_type((s << sh) >> sh, _U32)
        hi = jnp.where(jax.lax.bitcast_convert_type(lo, jnp.int32) < 0,
                       _MASKF, _U32(0))
    else:
        s = jax.lax.bitcast_convert_type(lo, jnp.int32)
        hi = jnp.where(jnp.logical_and(signed, s < 0), _MASKF, _U32(0))
    valid0 = jnp.arange(cap_el) < n
    lo = jnp.where(valid0, lo, 0)
    hi = jnp.where(valid0, hi, 0)

    n1 = n
    runs1 = jnp.zeros((cap_el,), jnp.int32)
    if opts.num_rles >= 1:
        lo, hi, runs1, n1 = _rle64(lo, hi, n)
    n2 = n1
    runs2 = jnp.zeros((cap_el,), jnp.int32)
    if opts.num_rles >= 2:
        lo, hi, runs2, n2 = _rle64(lo, hi, n1)

    # delta passes; seeds stored as i64 images in the stream header
    seeds = [(None, None), (None, None)]
    for j in range(opts.num_deltas):
        live = n2 > 0
        seeds[j] = (jnp.where(live, lo[0], _U32(0)),
                    jnp.where(live, hi[0], _U32(0)))
        plo = jnp.concatenate([lo[:1], lo[:-1]])
        phi = jnp.concatenate([hi[:1], hi[:-1]])
        dlo, dhi = _sub64(lo, hi, plo, phi)
        msk = jnp.arange(cap_el) < n2
        lo = jnp.where(msk, dlo, 0)
        hi = jnp.where(msk, dhi, 0)

    widths = W64 if ts == 8 else W32

    def packed(slo, shi, count, f0=(None, None), f1=(None, None)):
        count = count.astype(jnp.int32)
        valid = jnp.arange(cap_el) < count
        slo = jnp.where(valid, slo, 0)
        shi = jnp.where(valid, shi, 0)
        vlo, vhi, bits = _minmax_width(slo, shi, count)
        bits = round_width(bits, widths)
        if not opts.use_bp:
            bits = jnp.maximum(bits, jnp.int32(8 * ts))
            bits = round_width(bits, widths)
        dlo, dhi = _sub64(slo, shi, vlo, vhi)
        dlo = jnp.where(valid, dlo, 0)
        dhi = jnp.where(valid, dhi, 0)
        cap_w = 2 * cap_el if ts == 8 else cap_el
        words = pack_any(dlo, dhi, bits, cap_w, widths)
        n_words = ((count * bits + 31) // 32).astype(jnp.int32)
        return _stream_tail(vlo, vhi, bits, words, n_words, f0, f1)

    def packed_runs(runs, count):
        rlo = jax.lax.bitcast_convert_type(runs.astype(jnp.int32), _U32)
        return packed(rlo, jnp.zeros_like(rlo), count)

    segments = []
    if opts.num_rles >= 1:
        segments.append(packed_runs(runs1, n1))
    if opts.num_rles >= 2:
        segments.append(packed_runs(runs2, n2))
    segments.append(packed(lo, hi, n2, (seeds[0][0], seeds[0][1]),
                           (seeds[1][0], seeds[1][1])))

    hdr = jnp.concatenate([
        jnp.array([fc.MAGIC, fc.VERSION, opts.num_rles, opts.num_deltas,
                   int(opts.type), int(opts.use_bp), 0, 0], jnp.uint8),
        _u32b(n), _u32b(n1), _u32b(n2),
        jnp.zeros((fc.HEADER_BYTES - 20,), jnp.uint8),
    ])

    # assemble into an over-allocated buffer so a segment's static length can
    # never force its dynamic offset to clamp backwards over the header
    slack = max(a.shape[0] for a, _ in segments)
    buf = jnp.zeros((out_cap + slack,), jnp.uint8)
    buf = jax.lax.dynamic_update_slice(buf, hdr, (0,))
    off = jnp.int32(fc.HEADER_BYTES)
    for arr, blen in segments:
        buf = jax.lax.dynamic_update_slice(
            buf, arr, (jnp.clip(off, 0, out_cap),))
        off = off + blen.astype(jnp.int32)
    out = buf[:out_cap]

    status = jnp.where(bad_size, Status.ERROR_INVALID_VALUE, Status.SUCCESS)
    status = jnp.where(off > out_cap, Status.ERROR_OUTPUT_BUFFER_TOO_SMALL,
                       status)
    out_size = jnp.where(status == Status.SUCCESS, off, 0).astype(jnp.int32)
    out = jnp.where(jnp.arange(out_cap, dtype=jnp.int32) < out_size, out, 0)
    return out, out_size, status.astype(jnp.int32)


# =====================================================================================
# decode (fully dynamic header; mod-2^64 exact in 32-bit lanes)
# =====================================================================================

def _stage1(comp_u8: jax.Array, comp_u32: jax.Array, comp_size: jax.Array,
            out_cap: int):
    """``comp_u8`` is the raw chunk; ``comp_u32`` its (padded) LE u32 view.
    Parses, unpacks, and un-deltas one chunk up to (but not including) the
    RLE expansion, which runs in the Pallas kernel
    (``ops/pallas/cascaded_expand.py``)."""
    nbytes = comp_u8.shape[0]
    cap_el = out_cap
    g = lambda o: comp_u8[jnp.clip(o, 0, nbytes - 1)].astype(jnp.int32)

    def u32_at(o):
        return g(o) | (g(o + 1) << 8) | (g(o + 2) << 16) | (g(o + 3) << 24)

    magic, ver = g(0), g(1)
    nr, nd, tid = g(2), g(3), g(4)
    n, n1, n2 = u32_at(8), u32_at(12), u32_at(16)

    ts = jnp.full((), 1, jnp.int32)
    type_ok = jnp.full((), False)
    for t in ElementType:
        m = tid == int(t)
        ts = jnp.where(m, 1 if t == ElementType.BITS else t.nbytes, ts)
        type_ok = jnp.logical_or(type_ok, m)

    ok = jnp.logical_and(magic == fc.MAGIC, ver == fc.VERSION)
    ok = jnp.logical_and(ok, comp_size >= fc.HEADER_BYTES)
    ok = jnp.logical_and(ok, jnp.logical_and(nr <= 2, nd <= 2))
    ok = jnp.logical_and(ok, type_ok)
    ok = jnp.logical_and(ok, n * ts <= out_cap)
    ok = jnp.logical_and(ok, jnp.logical_and(n1 <= n, n2 <= n1))
    ok = jnp.logical_and(ok, n <= cap_el)
    n = jnp.clip(n, 0, cap_el)
    n1 = jnp.clip(n1, 0, n)
    n2 = jnp.clip(n2, 0, n1)

    def parse_stream(off, count):
        """Streams are 4-byte aligned by construction: fetch the 8 header
        words + payload words with dynamic_slice — no gathers."""
        w0 = off >> 2
        shdr = jax.lax.dynamic_slice(
            comp_u32, (jnp.clip(w0, 0, comp_u32.shape[0] - 8),), (8,))
        vlo, vhi = shdr[0], shdr[1]
        bits = (shdr[2] & 0xFF).astype(jnp.int32)
        f0 = (shdr[4], shdr[5])
        f1 = (shdr[6], shdr[7])
        bits_ok = jnp.any(bits == jnp.array(W64, jnp.int32))
        n_words = (count * bits + 31) // 32
        wstart = w0 + fc.STREAM_HEADER_BYTES // 4
        words = jax.lax.dynamic_slice(
            comp_u32, (jnp.clip(wstart, 0, comp_u32.shape[0] - cap_el),),
            (cap_el,))
        words = jnp.where(jnp.arange(cap_el) < n_words, words, 0)
        dlo, dhi = unpack_any(words, bits, cap_el, W64)
        lo, hi = _add64(dlo, dhi, vlo, vhi)
        blen = fc.STREAM_HEADER_BYTES + 4 * n_words
        return (lo, hi), blen, bits_ok, (f0, f1)

    off = jnp.int32(fc.HEADER_BYTES)
    (r1lo, r1hi), len1, ok1, _ = parse_stream(off, n1)
    off1 = off + jnp.where(nr >= 1, len1, 0)
    (r2lo, r2hi), len2, ok2, _ = parse_stream(off1, n2)
    off2 = off1 + jnp.where(nr >= 2, len2, 0)
    (vlo, vhi), len3, ok3, (df0, df1) = parse_stream(off2, n2)
    end = off2 + len3

    ok = jnp.logical_and(ok, end <= comp_size)
    ok = jnp.logical_and(ok, jnp.where(nr >= 1, ok1, True))
    ok = jnp.logical_and(ok, jnp.where(nr >= 2, ok2, True))
    ok = jnp.logical_and(ok, ok3)

    for k in range(2):
        j = nd - 1 - k
        slo = jnp.where(j == 0, df0[0], df1[0])
        shi = jnp.where(j == 0, df0[1], df1[1])
        clo, chi = _cumsum64(vlo, vhi, n2)
        clo, chi = _add64(clo, chi, slo, shi)
        do = j >= 0
        vlo = jnp.where(do, clo, vlo)
        vhi = jnp.where(do, chi, vhi)

    idx = jnp.arange(cap_el, dtype=jnp.int32)
    runs1 = jax.lax.bitcast_convert_type(r1lo, jnp.int32)
    runs2 = jax.lax.bitcast_convert_type(r2lo, jnp.int32)
    ok = jnp.logical_and(ok, jnp.where(
        nr >= 1, jnp.all(jnp.where(idx < n1, r1hi == 0, True)), True))
    ok = jnp.logical_and(ok, jnp.where(
        nr >= 2, jnp.all(jnp.where(idx < n2, r2hi == 0, True)), True))

    # run-stream validation (the expansion itself runs in the Pallas kernel)
    def check(runs, n_runs, want_total):
        msk = idx < n_runs
        s_ok = jnp.all(jnp.where(
            msk, jnp.logical_and(runs > 0, runs <= cap_el), True))
        ends = jnp.cumsum(jnp.where(msk, jnp.clip(runs, 0, cap_el), 0))
        total = jnp.max(jnp.where(msk, ends, 0)).astype(jnp.int32)
        return jnp.logical_and(s_ok, total == want_total)

    ok = jnp.logical_and(ok, jnp.where(nr >= 2, check(runs2, n2, n1), True))
    ok = jnp.logical_and(ok, jnp.where(nr >= 1, check(runs1, n1, n), True))

    scalars = jnp.stack([n, n1, n2, jnp.clip(nr, 0, 2)])
    return vlo, vhi, runs1, runs2, scalars, ts, ok


def _stage2(vlo, vhi, ts, n, ok, out_cap: int):
    """Expanded (lo, hi) element lanes -> output bytes + size + status."""
    idx = jnp.arange(out_cap, dtype=jnp.int32)

    def to_bytes(ts_py):
        ecount = out_cap // ts_py
        l = vlo[:ecount]
        parts = [(l >> (8 * k)) & 0xFF for k in range(min(ts_py, 4))]
        if ts_py == 8:
            h = vhi[:ecount]
            parts += [(h >> (8 * k)) & 0xFF for k in range(4)]
        by = jnp.stack(parts, axis=1).reshape(-1).astype(jnp.uint8)
        return jnp.pad(by, (0, out_cap - by.shape[0]))

    out = to_bytes(1)
    for ts_py in (2, 4, 8):
        out = jnp.where(ts == ts_py, to_bytes(ts_py), out)

    out_size_raw = (n * ts).astype(jnp.int32)
    valid_mask = idx < jnp.where(ok, out_size_raw, 0)
    out = jnp.where(valid_mask, out, 0)
    status = jnp.where(ok, Status.SUCCESS, Status.ERROR_CANNOT_DECOMPRESS)
    out_size = jnp.where(ok, out_size_raw, 0)
    return out, out_size, status.astype(jnp.int32)


# =====================================================================================
# vectorized RLE expansion (round 5)
# =====================================================================================
#
# The round-4 Pallas expand kernel walks runs serially (one scalar extract +
# wild-store blast per run) — fine on run-sparse columns, catastrophic on
# run-dense data (654 ms for 4 MiB at n_runs ~ n, measured round 5 vs 0.01 ms
# for the same data volume of pure vector work).  The vector formulation is
# three primitives, all batched over chunks under vmap:
#   starts = exclusive-cumsum(runs);  indicator = scatter-add 1 at starts;
#   run-of(i) = inclusive-cumsum(indicator) - 1;  out = vals[run-of(i)].
# Round 4 rejected this shape from measurements taken under the RTT-bound
# protocol and lax.map serialization; under vmap + marginal timing it is
# ~100x the serial kernel on run-dense chunks and ~2x on the flagship column.

def _expand_pass(lo: jax.Array, hi: jax.Array, runs: jax.Array,
                 n_runs: jax.Array, cap_el: int):
    """Expand (lo, hi)[:n_runs] by runs[:n_runs] -> (lo, hi) value lanes."""
    idx = jnp.arange(cap_el, dtype=jnp.int32)
    msk = idx < n_runs
    r = jnp.where(msk, jnp.clip(runs, 0, cap_el), 0)
    starts = jnp.cumsum(r, dtype=jnp.int32) - r         # exclusive
    starts = jnp.where(msk, starts, cap_el)             # OOB -> dropped
    ind = jnp.zeros((cap_el,), jnp.int32).at[starts].add(1, mode="drop")
    ridx = jnp.cumsum(ind, dtype=jnp.int32) - 1
    ridx = jnp.clip(ridx, 0, cap_el - 1)
    return lo[ridx], hi[ridx]


def _expand_chunk(vlo, vhi, runs1, runs2, scalars, cap_el: int):
    """Both RLE passes (values -> via runs2 -> via runs1), predicated on nr."""
    n1, n2, nr = scalars[1], scalars[2], scalars[3]
    l2, h2 = _expand_pass(vlo, vhi, runs2, jnp.where(nr >= 2, n2, 0), cap_el)
    use2 = nr >= 2
    lo = jnp.where(use2, l2, vlo)
    hi = jnp.where(use2, h2, vhi)
    l1, h1 = _expand_pass(lo, hi, runs1, jnp.where(nr >= 1, n1, 0), cap_el)
    use1 = nr >= 1
    return jnp.where(use1, l1, lo), jnp.where(use1, h1, hi)


# =====================================================================================
# batched entry points (the dispatch-facing API)
# =====================================================================================

@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data: jax.Array, sizes: jax.Array, opts, out_cap: int):
    if data.shape[1] > (4 << 20):
        # beyond the fast path's limb-exactness budget: general path
        return fc.compress_batch(data, sizes, opts, out_cap)
    # lax.map, not vmap: the width-ladder lax.switch in pack_any only
    # executes its taken branch under a scalar trace
    return jax.lax.map(
        lambda a: encode_chunk(a[0], a[1], opts, out_cap),
        (data, sizes.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    if out_cap > (1 << 20):
        return fc.decompress_batch(comp, comp_sizes, out_cap)
    B, cap = comp.shape
    # LE u32 view, padded so a cap_el-word dynamic_slice starting at ANY
    # in-chunk stream offset stays in bounds (streams can sit at the tail)
    need_words = -(-cap // 4) + out_cap + 16
    pad = 4 * need_words - cap
    c4 = jnp.pad(comp, ((0, 0), (0, pad))).reshape(B, -1, 4).astype(_U32)
    comp_u32 = c4[..., 0] | (c4[..., 1] << 8) | (c4[..., 2] << 16) \
        | (c4[..., 3] << 24)
    # vmap, not lax.map (round 5): stage1 is pure vector math; serializing
    # it across chunks measured 0.23 GB/s where the vmapped pipeline runs
    # two orders faster.  The unpack width-switch executes all 14 static
    # widths under vmap — still cheap next to 64x chunk parallelism.
    vlo, vhi, runs1, runs2, scalars, ts, ok = jax.vmap(
        lambda a, b, c: _stage1(a, b, c, out_cap))(
        comp, comp_u32, comp_sizes.astype(jnp.int32))
    elo, ehi = jax.vmap(
        lambda a, b, c, d, e: _expand_chunk(a, b, c, d, e, out_cap))(
        vlo, vhi, runs1, runs2, scalars)
    return jax.vmap(lambda l, h, t, nn, o: _stage2(l, h, t, nn, o, out_cap))(
        elo, ehi, ts, scalars[:, 0], ok)
