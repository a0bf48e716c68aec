"""Byte-granular VMEM copy primitives for Pallas LZ decoders.

TPU vector memory is tiled (rows of 128 lanes); LZ formats need unaligned,
byte-granular copies.  These helpers implement the classic "wild copy" used by
fast LZ4/Snappy decoders (copy in fixed 128-byte vector blocks, overshooting
the end; later writes overwrite the junk), built from two lane-rolls and a
blend per block — no gathers, no scatters, no DMA-engine round trips.

Byte arrays are stored one byte per int32 lane, shaped ``(1, rows, 128)`` so
the byte index splits into a dynamic *sublane* index (supported by Mosaic) and
a lane rotation (``pltpu.roll`` with a dynamic shift).

Invariants callers must uphold:
  * the row arrays are padded so reads/writes up to ``pos + 2*BLK`` stay in
    bounds (see ``PAD_BYTES``);
  * same-buffer multi-block copies require ``dst - src >= BLK`` (use
    :func:`copy_pattern` for closer overlaps — it amplifies the period first).

The single-block copy is always overlap-safe: the full 128-byte window is read
before anything is written.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
WIDE = 4 * BLK  # super-block width of copy_bytes_wide
# Wild stores write at most BLK-1 junk bytes past the last block, and the last
# block itself may start BLK-1 bytes before pos+n; amplification in
# copy_pattern adds one more block of slack; wide super-blocks overshoot by
# up to WIDE-1 bytes plus their trailing wild row.
PAD_BYTES = 2 * WIDE

_LANES = None


def _lanes():
    return jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)


def window128(ref, pos, c=0):
    """Load the 128 bytes starting at byte ``pos`` as an int32 ``(1, 128)`` row.

    ``ref`` is ``(C, rows, 128)`` int32 (one byte per lane; ``c`` — a static
    index — selects the leading block, default 0).  Reads rows ``pos>>7`` and
    ``pos>>7 + 1``; caller guarantees both exist.
    """
    r = pos >> 7
    so = pos & (BLK - 1)
    rows = ref[c, pl.ds(r, 2), :]
    # jnp.int32 divisor: a bare Python 128 becomes an i64 constant under the
    # package-wide x64 mode, and Mosaic cannot lower i64 (its i64->i32 cast
    # helper recurses infinitely).
    sh = jnp.remainder(-so, jnp.int32(BLK))
    a = pltpu.roll(rows[0:1, :], sh, axis=1)  # a[l] = row0[(l+so) % 128]
    b = pltpu.roll(rows[1:2, :], sh, axis=1)
    return jnp.where(_lanes() < BLK - so, a, b)


def store128_wild(ref, pos, v, c=0):
    """Store 128 bytes ``v`` (``(1,128)`` int32) at byte ``pos``, wild.

    Bytes before ``pos`` in the first row are preserved (read-modify-write
    blend — safe: a Pallas program is single-threaded).  The second row is
    written in full; its lanes beyond the 128 copied bytes receive junk that
    lies strictly after ``pos+127`` and will be overwritten by later stores or
    masked off by the caller.  ``c`` (static) selects the leading block.
    """
    r = pos >> 7
    o = pos & (BLK - 1)
    w = pltpu.roll(v, o, axis=1)  # w[l] = v[(l - o) % 128]
    lanes = _lanes()
    old = ref[c, pl.ds(r, 1), :]
    ref[c, pl.ds(r, 1), :] = jnp.where(lanes >= o, w, old)
    ref[c, pl.ds(r + 1, 1), :] = w


def store128_masked(ref, pos, v, n):
    """Store EXACTLY ``n`` (0..128) bytes of ``v`` at byte ``pos`` — both rows
    read-modify-write blended, no wild junk.  For writers whose overshoot
    would land on bytes another stream already produced (unlike the
    sequential wild-store pattern, where later writes clean earlier junk)."""
    r = pos >> 7
    o = pos & (BLK - 1)
    w = pltpu.roll(v, o, axis=1)
    lanes = _lanes()
    old0 = ref[0, pl.ds(r, 1), :]
    m0 = jnp.logical_and(lanes >= o, lanes < o + n)
    ref[0, pl.ds(r, 1), :] = jnp.where(m0, w, old0)
    old1 = ref[0, pl.ds(r + 1, 1), :]
    m1 = lanes < o + n - BLK
    ref[0, pl.ds(r + 1, 1), :] = jnp.where(m1, w, old1)


def copy_bytes(src_ref, dst_ref, src, dst, n, c_src=0, c_dst=0):
    """Copy ``n`` bytes from ``src_ref@src`` to ``dst_ref@dst`` in 128-byte
    wild blocks.  If ``src_ref is dst_ref`` (same leading block) and more than
    one block is copied, requires ``dst - src >= BLK`` (each block's reads
    then stay strictly below the write frontier)."""
    nb = (n + BLK - 1) >> 7

    def body(k, carry):
        v = window128(src_ref, src + k * BLK, c_src)
        store128_wild(dst_ref, dst + k * BLK, v, c_dst)
        return carry

    # int32 carry/bounds throughout: the package enables jax x64, and a bare
    # Python-int carry would become int64 — which the Mosaic lowering cannot
    # convert (its int64->int32 helper recurses infinitely).
    jax.lax.fori_loop(jnp.int32(0), nb, body, jnp.int32(0), unroll=False)


def copy_bytes_wide(src_ref, dst_ref, src, dst, n, c_src=0, c_dst=0):
    """Copy ``n`` bytes in 512-byte wild super-blocks (4 rows per iteration:
    5 row reads + 5 row writes instead of 4x the 128-byte block's 4+3 —
    roughly half the VMEM ops and a quarter of the loop iterations for long
    copies).  Same wild-store discipline as :func:`copy_bytes`; same-buffer
    copies require ``dst - src >= WIDE``."""
    lanes = _lanes()
    nb = (n + WIDE - 1) >> 9

    def body(k, carry):
        s = src + k * WIDE
        d = dst + k * WIDE
        r = s >> 7
        so = s & (BLK - 1)
        rows = src_ref[c_src, pl.ds(r, 5), :]
        sh = jnp.remainder(-so, jnp.int32(BLK))
        rolled = [pltpu.roll(rows[j:j + 1, :], sh, axis=1) for j in range(5)]
        sel = lanes < BLK - so
        v = [jnp.where(sel, rolled[j], rolled[j + 1]) for j in range(4)]

        rd = d >> 7
        o = d & (BLK - 1)
        w = [pltpu.roll(v[j], o, axis=1) for j in range(4)]
        old = dst_ref[c_dst, pl.ds(rd, 1), :]
        keep = lanes >= o
        dst_ref[c_dst, pl.ds(rd, 1), :] = jnp.where(keep, w[0], old)
        for j in range(1, 4):
            dst_ref[c_dst, pl.ds(rd + j, 1), :] = jnp.where(keep, w[j],
                                                            w[j - 1])
        dst_ref[c_dst, pl.ds(rd + 4, 1), :] = w[3]
        return carry

    jax.lax.fori_loop(jnp.int32(0), nb, body, jnp.int32(0), unroll=False)


def copy_pattern(ref, op, offset, n, c=0):
    """Self-overlapping LZ77 match copy: write ``n`` bytes at ``op`` replicating
    the period-``offset`` pattern that ends at ``op`` (``0 < offset < BLK``).

    Phase 1 amplifies the pattern IN REGISTER: one window read of the
    ``offset`` valid bytes, then log-doubling lane rolls (a roll by ``v`` — a
    multiple of the period — maps ``pattern[l mod offset]`` onto lanes
    ``[v, 2v)``) until all 128 lanes carry the periodic extension; ONE wild
    store materializes them at ``op``.  Phase 2 block-copies any remainder at
    displacement ``D = ceil(BLK/offset)*offset`` — a period multiple >= BLK
    (and <= BLK-1+offset, within the BLK+offset bytes now valid), so the
    multi-block precondition of :func:`copy_bytes` holds.
    """
    lanes = _lanes()
    p = window128(ref, op - offset, c)  # lanes [0, offset) valid

    def amp_cond(s):
        return s[1] < BLK

    def amp_body(s):
        p, v = s
        # roll(p, v)[l] = p[l - v mod 128]; v is a period multiple, so lanes
        # [v, 2v) receive pattern[(l - v) mod offset] == pattern[l mod offset]
        return jnp.where(lanes < v, p, pltpu.roll(p, v, axis=1)), v * 2

    p, _ = jax.lax.while_loop(amp_cond, amp_body, (p, offset))
    store128_wild(ref, op, p, c)

    written = jnp.minimum(jnp.int32(BLK), n)
    d = ((BLK + offset - 1) // offset) * offset
    remaining = n - written
    jax.lax.cond(
        remaining > 0,
        lambda: copy_bytes(ref, ref, op + written - d, op + written,
                           remaining, c, c),
        lambda: None,
    )
