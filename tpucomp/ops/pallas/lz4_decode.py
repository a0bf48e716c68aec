"""Pallas/Mosaic LZ4 block decoder: serial token walk in SMEM, vector copies.

This is the TPU analog of the reference's per-threadblock serial decode
(``doc/algorithms_overview.md:50-52`` — one block per chunk, warp-cooperative
copies): the scalar core walks the token stream out of SMEM (compressed bytes
packed 4-per-int32 word) while literal and match copies run as 128-byte VPU
"wild copies" (:mod:`tpucomp.ops.pallas.bytecopy`) in VMEM.  One grid step per
chunk — chunk-DP like the reference's grid of threadblocks, sequential on the
single TensorCore.

Contrast with the default XLA path (:mod:`tpucomp.formats.lz4`), which does a
log-depth speculative parse at every byte position: that path is fully parallel
but costs ~30-40 full-buffer gather passes per chunk; this kernel touches each
byte O(1) times but serializes the parse on the scalar unit.  PERF_MODEL.md
quantifies the crossover; the batched API exposes both.

Error contract matches the reference (``CHANGELOG.md:160-164``): corrupt input
yields per-chunk ``ERROR_CANNOT_DECOMPRESS`` and size 0 — never an
out-of-bounds access (copies are suppressed once any bound would be crossed;
the output buffer carries :data:`bytecopy.PAD_BYTES` of wild-store slack).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.ops.pallas import bytecopy as bc

MIN_MATCH = 4


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(out_cap: int, w_words: int,
            size_ref, words_ref, lanes_ref, out_ref, osize_ref, stat_ref):
    b = pl.program_id(0)
    csize = size_ref[b]
    max_byte = 4 * w_words - 1

    def getb(i):
        # int32 clip bounds: bare Python ints become i64 constants under the
        # package-wide x64 mode, which Mosaic cannot lower (see bytecopy).
        ic = jnp.clip(i, jnp.int32(0), jnp.int32(max_byte))
        w = words_ref[0, 0, ic >> 2]
        return (w >> ((i & 3) * 8)) & 0xFF

    def read_ext(ip, ln):
        """LZ4 length extension: add bytes until one != 255.  Returns
        (new_ip, new_ln); caller checks ip <= csize afterwards."""
        def cond(s):
            ip, _, b = s
            return jnp.logical_and(b == 255, ip < csize)

        def body(s):
            ip, ln, _ = s
            nb = getb(ip)
            return ip + 1, ln + nb, nb

        ip, ln, _ = jax.lax.while_loop(cond, body, (ip, ln, jnp.int32(255)))
        return ip, ln

    def loop_cond(s):
        ip, op, err, done = s
        return jnp.logical_and(jnp.logical_not(jnp.logical_or(err, done)),
                               ip < csize)

    def loop_body(s):
        ip, op, err, done = s
        token = getb(ip)
        ip = ip + 1

        # ---- literal run -----------------------------------------------------
        ll = token >> 4
        ip, ll = jax.lax.cond(ll == 15,
                              lambda a: read_ext(*a),
                              lambda a: a, (ip, ll))
        err = jnp.logical_or(err, ip + ll > csize)
        lit_ok = jnp.logical_and(jnp.logical_not(err), op + ll <= out_cap)

        @pl.when(jnp.logical_and(lit_ok, ll > 0))
        def _():
            bc.copy_bytes(lanes_ref, out_ref, ip, op, ll)

        ip = ip + ll
        op = op + ll
        done = ip == csize  # terminal token: literals end exactly at block end

        # ---- match -----------------------------------------------------------
        def match_part(a):
            ip, op, err = a
            err = jnp.logical_or(err, ip + 2 > csize)
            off = getb(ip) | (getb(ip + 1) << 8)
            ip = ip + 2
            ml = token & 15
            ip, ml = jax.lax.cond(ml == 15,
                                  lambda b: read_ext(*b),
                                  lambda b: b, (ip, ml))
            ml = ml + MIN_MATCH
            err = jnp.logical_or(err, ip > csize)
            err = jnp.logical_or(err, jnp.logical_or(off == 0, off > op))
            m_ok = jnp.logical_and(jnp.logical_not(err), op + ml <= out_cap)

            @pl.when(jnp.logical_and(m_ok, off >= bc.BLK))
            def _():
                bc.copy_bytes(out_ref, out_ref, op - off, op, ml)

            @pl.when(jnp.logical_and(m_ok, off < bc.BLK))
            def _():
                bc.copy_pattern(out_ref, op, off, ml)

            return ip, op + ml, err

        ip, op, err = jax.lax.cond(
            jnp.logical_or(done, err), lambda a: a, match_part, (ip, op, err))
        return ip, op, err, done

    ip0 = jnp.int32(0)
    _, op, err, done = jax.lax.while_loop(
        loop_cond, loop_body, (ip0, ip0, csize < 0, csize < 0))

    # a non-empty block must end with a terminal (literal-only) token
    err = jnp.logical_or(err, jnp.logical_and(csize > 0,
                                              jnp.logical_not(done)))
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
    """Batched LZ4 decode, Pallas backend.  Same signature/semantics as
    :func:`tpucomp.formats.lz4.decompress_batch` (vmapped XLA path)."""
    B, comp_cap = comp.shape

    # scalar-parse view: bytes packed 4-per-word, little-endian
    wpad = _round_up(max(comp_cap, 4), 4)
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    # vector-copy view: one byte per int32 lane, wild-copy slack rows appended
    lpad = _round_up(comp_cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(comp, ((0, 0), (0, lpad - comp_cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    # The package enables jax x64 globally; Mosaic cannot legalize the i64
    # values that mode injects into the pallas grid machinery ("func.return
    # (i64) -> ()" compile failures).  All kernel dtypes here are explicit, so
    # tracing the pallas_call with x64 off is semantics-preserving.
    with jax.enable_x64(False):
        out_lanes, osz, stat = _pallas_decode(
            B, comp_cap, out_cap, out_rows, wpad, lpad, interpret,
            comp_sizes.astype(jnp.int32), words, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat


def _pallas_decode(B, comp_cap, out_cap, out_rows, wpad, lpad, interpret,
                   sizes, words, lanes):
    return pl.pallas_call(
        functools.partial(_kernel, out_cap, wpad // 4),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes: full (B,) array
            pl.BlockSpec((1, 1, wpad // 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lpad // bc.BLK, bc.BLK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_rows, bc.BLK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # osize: full (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # status: full (B,)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
        interpret=interpret,
    )(sizes, words, lanes)
