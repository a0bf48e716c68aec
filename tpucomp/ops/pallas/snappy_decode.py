"""Pallas/Mosaic Snappy decoder: serial tag walk in SMEM, vector copies.

Same shape as :mod:`.lz4_decode` (the reference's per-threadblock serial
decode, ``doc/algorithms_overview.md:50-52``): the scalar core walks the tag
stream out of SMEM while literal/copy bytes move as 128-byte VPU wild copies
(:mod:`.bytecopy`).  One grid step per chunk.

Semantics match :func:`tpucomp.formats.snappy.decode_chunk` exactly (statuses,
varint preamble, copy-1/2/4, overlapping copies, length-mismatch and
truncation checks) so the two backends are drop-in interchangeable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.ops.pallas import bytecopy as bc


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int,
            size_ref, words_ref, lanes_ref, out_ref, osize_ref, stat_ref):
    b = pl.program_id(0)
    csize = size_ref[b]

    def getb(i):
        ic = jnp.clip(i, jnp.int32(0), jnp.int32(4 * w_words - 1))
        w = words_ref[0, 0, ic >> 2]
        return (w >> ((i & 3) * 8)) & 0xFF

    def get4(i):
        """Bytes i..i+3 via two word loads."""
        wi = jnp.clip(i >> 2, jnp.int32(0), jnp.int32(w_words - 2))
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(w1, (32 - sh) & jnp.int32(31))
        v = jnp.where(sh == 0, w0, lo | hi)
        return v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, \
            jax.lax.shift_right_logical(v, jnp.int32(24)) & 0xFF

    # ---- varint32 preamble ---------------------------------------------------------
    expected = getb(jnp.int32(0)) & 0x7F
    more = (getb(jnp.int32(0)) & 0x80) != 0
    pre_len = jnp.int32(1)
    for k in range(1, 5):
        bk = getb(jnp.int32(k))
        expected = jnp.where(more, expected | ((bk & 0x7F) << (7 * k)), expected)
        pre_len = pre_len + more.astype(jnp.int32)
        more = jnp.logical_and(more, (bk & 0x80) != 0)
    err0 = jnp.logical_or(more, csize < pre_len)
    err0 = jnp.logical_or(err0, expected < 0)   # >= 2^31 wrapped negative
    too_big = jnp.logical_and(jnp.logical_not(err0), expected > out_cap)

    def loop_cond(s):
        ip, op, err = s
        return jnp.logical_and(jnp.logical_not(err), ip < csize)

    def loop_body(s):
        ip, op, err = s
        tag, b1, b2, b3 = get4(ip)
        typ = tag & 3
        t6 = tag >> 2

        def literal(a):
            ip, op, err = a
            extra = jnp.clip(t6 - 59, 0, 4)
            acc = b1
            acc = jnp.where(extra > 1, acc | (b2 << 8), acc)
            acc = jnp.where(extra > 2, acc | (b3 << 16), acc)
            acc = jnp.where(extra > 3, acc | (getb(ip + 4) << 24), acc)
            ll = jnp.where(extra > 0, acc + 1, t6 + 1)
            src = ip + 1 + extra
            err = jnp.logical_or(err, ll < 1)
            err = jnp.logical_or(err, src + ll > csize)
            lit_ok = jnp.logical_and(jnp.logical_not(err), op + ll <= out_cap)

            # long literal runs (Snappy's dominant element on incompressible
            # spans) move in 512-byte super-blocks; cross-buffer, so the
            # wide copy is always overlap-safe
            @pl.when(jnp.logical_and(lit_ok, ll >= 2 * bc.BLK))
            def _():
                bc.copy_bytes_wide(lanes_ref, out_ref, src, op, ll)

            @pl.when(jnp.logical_and(lit_ok, ll < 2 * bc.BLK))
            def _():
                bc.copy_bytes(lanes_ref, out_ref, src, op, ll)

            return src + ll, op + ll, err

        def copy(a):
            ip, op, err = a
            ml = jnp.where(typ == 1, (t6 & 7) + 4, t6 + 1)
            off = jnp.where(
                typ == 1, (jax.lax.shift_right_logical(tag, jnp.int32(5)) << 8) | b1,
                jnp.where(typ == 2, b1 | (b2 << 8),
                          b1 | (b2 << 8) | (b3 << 16) | (getb(ip + 4) << 24)))
            hdr = jnp.where(typ == 1, 2, jnp.where(typ == 2, 3, 5))
            err = jnp.logical_or(err, ip + hdr > csize)
            err = jnp.logical_or(err, jnp.logical_or(off <= 0, off > op))
            c_ok = jnp.logical_and(jnp.logical_not(err), op + ml <= out_cap)

            @pl.when(jnp.logical_and(c_ok, off >= ml))
            def _():
                # ml <= 64 < BLK: one overlap-safe wild block
                v = bc.window128(out_ref, op - off)
                bc.store128_wild(out_ref, op, v)

            @pl.when(jnp.logical_and(c_ok, off < ml))
            def _():
                bc.copy_pattern(out_ref, op, off, ml)

            return ip + hdr, op + ml, err

        return jax.lax.cond(typ == 0, literal, copy, (ip, op, err))

    ip0 = jnp.where(err0, csize, pre_len)
    _, op, err = jax.lax.while_loop(loop_cond, loop_body,
                                    (ip0, jnp.int32(0), err0))
    err = jnp.logical_or(err, op != jnp.clip(expected, 0, out_cap + 1))
    err = jnp.logical_and(err, jnp.logical_not(too_big))
    ok = jnp.logical_not(jnp.logical_or(err, too_big))
    osize_ref[b] = jnp.where(ok, op, jnp.int32(0))
    stat_ref[b] = jnp.where(
        too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
        jnp.where(err, jnp.int32(Status.ERROR_CANNOT_DECOMPRESS),
                  jnp.int32(Status.SUCCESS)))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False):
    """Batched Snappy decode, Pallas backend.  Same signature/semantics as
    :func:`tpucomp.formats.snappy.decompress_batch`."""
    B, comp_cap = comp.shape

    wpad = _round_up(max(comp_cap, 8), 4)
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    lpad = _round_up(comp_cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(comp, ((0, 0), (0, lpad - comp_cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
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
            interpret=interpret,
        )(comp_sizes.astype(jnp.int32), words, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
