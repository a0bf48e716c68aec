"""Pallas/Mosaic rANS decoder: fully vectorized, no gathers, no scalar walk.

TPU analog of the reference's GPU-native ANS decode (``README.md:17`` — the
one format nvCOMP exposes a device-side API for).  Unlike the LZ kernels
(serial token walk on the scalar core), rANS decode is *vector-native* on TPU:
the 128 interleaved lane states advance in lockstep, and every per-lane table
lookup is rewritten as a compare/one-hot reduction or a small f32 matmul —
operations the VPU/MXU execute directly, with zero dynamic gathers:

- ``symbol = #{s : cum_next[s] <= slot}``: one broadcast compare of the
  (256,1) cumulative table against the (1,128) slots + a sublane sum.
- ``freq[sym]`` / ``cum[sym]``: one-hot(sym) masked sublane sums.
- renormalization words: the v2 container interleaves ALL lanes' words in one
  shared stream in exact consumption order (``tpucomp/formats/ans.py``), so
  the words needed at a step are a contiguous 128-element window
  (:func:`bytecopy.window128`) distributed to needing lanes by rank — rank and
  distribution are two (1,128)x(128,128) f32 matmuls (exact: values < 2^16).

Per step: ~150K vector element-ops for 128 decoded bytes (~1.2K ops/byte),
vs the scalar path's ~75 cycles/byte-token — see PERF_MODEL.md §4.

All arithmetic is int32 with unsigned semantics (wrapping add/mul are
bit-identical to uint32; the unsigned ``x < 2^16`` test is the mask test
``(x & ~0xFFFF) == 0``), because Mosaic cannot lower the i64s that the
package-wide x64 mode would inject.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.formats.ans import HEADER_BYTES, MAGIC, PROB_SCALE, VERSION
from tpucomp.ops.pallas import bytecopy as bc

N = 128  # lanes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def decode_block(size, freq, cum, cumn, x0, stream_ref, out_ref,
                 *, steps: int, max_word_pos: int):
    """Device-side rANS decode block — callable from ANY Pallas TPU kernel.

    The analog of the reference's device-side ANS API (``README.md:17`` — the
    one format nvCOMP exposes for use *inside* user kernels).  Decodes up to
    ``size`` bytes (128 interleaved lanes, ``steps`` rounds of 128) from a
    v2-container word stream into ``out_ref``, entirely with vector ops.

    Args: ``size``/scalars int32; ``freq/cum/cumn`` (256,1) int32 tables;
    ``x0`` (1,128) int32 initial states; ``stream_ref`` a (1, rows, 128) VMEM
    ref of u16 words (one per lane); ``out_ref`` a (1, >=steps, 128) VMEM ref
    receiving one decoded byte per lane per step.  Returns
    ``(x_fin, ptr_fin, consumed)`` for the caller's validity checks.
    Trace it with x64 disabled (Mosaic cannot lower i64).
    """
    T = steps
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (256, N), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    # strict lower-triangular ones: rank_l = #{m < l : need_m}
    tri = (iota_j < iota_l).astype(jnp.float32)

    # table lookups as MXU contractions: freq/cum < 2^12 split into bytes
    # (each < 256, bf16-exact through the f32 matmul; exactly one one-hot
    # term is nonzero per lane, so no summation error either).  Contract
    # over dim 0 of the (256, 1) columns directly — no in-kernel transpose
    # for Mosaic to relayout.
    f_lo = (freq & 0xFF).astype(jnp.float32)
    f_hi = jax.lax.shift_right_logical(freq, jnp.int32(8)).astype(jnp.float32)
    c_lo = (cum & 0xFF).astype(jnp.float32)
    c_hi = jax.lax.shift_right_logical(cum, jnp.int32(8)).astype(jnp.float32)

    def lookup(col, hot_f):
        # (256, 1) x (256, N) contracting dim 0 -> (1, N)
        return jax.lax.dot_general(
            col, hot_f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    ones_row = jnp.ones((256, 1), jnp.float32)

    def body(t, carry):
        x, ptr, consumed = carry
        act = (t * N + lanes) < size
        slot = x & jnp.int32(PROB_SCALE - 1)
        shr = jax.lax.shift_right_logical(x, jnp.int32(12))
        # symbol via boundary-count (the column reduce rides the MXU: sums
        # of <= 256 ones are bf16-exact); freq/cum via one-hot MXU lookups
        sym = lookup(ones_row, (cumn <= slot).astype(jnp.float32))
        hot_f = (iota_s == sym).astype(jnp.float32)
        f = lookup(f_lo, hot_f) | jax.lax.shift_left(lookup(f_hi, hot_f),
                                                     jnp.int32(8))
        c = lookup(c_lo, hot_f) | jax.lax.shift_left(lookup(c_hi, hot_f),
                                                     jnp.int32(8))
        x_new = f * shr + slot - c  # int32 wrap == uint32 bit pattern
        need = jnp.logical_and(act, (x_new & jnp.int32(-(1 << 16))) == 0)
        need_f = need.astype(jnp.float32)
        rank = jax.lax.dot_general(
            need_f, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        win = bc.window128(stream_ref, jnp.minimum(ptr, jnp.int32(max_word_pos)))
        sel = jnp.logical_and(iota_j == rank, need).astype(jnp.float32)
        # the MXU multiplies f32 through bf16 passes (8 mantissa bits), so a
        # 16-bit word value is NOT exact through a matmul; distribute the hi
        # and lo bytes separately (each < 256, bf16-exact) and recombine
        def distribute(v):
            return jax.lax.dot_general(
                v.astype(jnp.float32), sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        w = (distribute(jax.lax.shift_right_logical(win, jnp.int32(8))) << 8) \
            | distribute(win & jnp.int32(0xFF))
        x_rn = jax.lax.shift_left(x_new, jnp.int32(16)) | w
        x = jnp.where(act, jnp.where(need, x_rn, x_new), x)
        # total words consumed = inclusive rank of the last lane (a scalar
        # extract; Mosaic lowers full bool reductions through i64 converts,
        # and only 32-bit vectors can be squeezed to scalars — cast first)
        ptr = ptr + rank[0, N - 1] + need.astype(jnp.int32)[0, N - 1]
        consumed = consumed + need.astype(jnp.int32)
        out_ref[0, pl.ds(t, 1), :] = jnp.where(act, sym, jnp.int32(0))
        return x, ptr, consumed

    return jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body,
        (x0, jnp.int32(0), jnp.zeros((1, N), jnp.int32)))


def _kernel(T: int, max_word_pos: int,
            size_ref, tw_ref, freq_ref, cum_ref, cumn_ref, st_ref, wc_ref,
            stream_ref, out_ref, okv_ref):
    b = pl.program_id(0)
    size = size_ref[b]
    total_words = tw_ref[b]

    x_fin, ptr_fin, consumed = decode_block(
        size, freq_ref[0], cum_ref[0], cumn_ref[0], st_ref[0],
        stream_ref, out_ref, steps=T, max_word_pos=max_word_pos)

    # per-lane validity vector; reduced to a chunk status in the XLA wrapper
    okv = jnp.logical_and(x_fin == jnp.int32(1 << 16),
                          consumed == wc_ref[0])
    okv = jnp.logical_and(okv, ptr_fin == total_words)
    okv_ref[0] = jnp.logical_or(okv, size <= 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False):
    """Batched rANS decode, Pallas backend.  Same signature/semantics as
    :func:`tpucomp.formats.ans.decompress_batch` (scan-based XLA path)."""
    B, comp_cap = comp.shape
    T = -(-out_cap // N)

    # header parsing at static offsets: cheap column slices, no gathers
    pad_to = max(comp_cap, HEADER_BYTES + 2)
    ci = jnp.pad(comp, ((0, 0), (0, pad_to - comp_cap))).astype(jnp.int32)

    def u16s(lo, hi):
        return ci[:, lo:hi:2] | (ci[:, lo + 1:hi:2] << 8)

    def u32s(lo, hi):
        return (ci[:, lo:hi:4] | (ci[:, lo + 1:hi:4] << 8)
                | (ci[:, lo + 2:hi:4] << 16) | (ci[:, lo + 3:hi:4] << 24))

    magic, ver = ci[:, 0], ci[:, 1]
    size = u32s(4, 8)[:, 0]
    total_words = u32s(8, 12)[:, 0]
    freq = u16s(12, 12 + 512)                       # (B, 256)
    states = u32s(12 + 512, 12 + 1024)              # (B, 128) int32 bits
    wcounts = u16s(12 + 1024, HEADER_BYTES)         # (B, 128)

    cumn = jnp.cumsum(freq, axis=1).astype(jnp.int32)
    cum = cumn - freq

    # shared stream: one u16 word per int32 lane, padded for window128 slack
    n_words = max((pad_to - HEADER_BYTES) // 2, 1)
    stream = u16s(HEADER_BYTES, HEADER_BYTES + 2 * n_words)
    rows = _round_up(n_words, N) // N + 2
    stream = jnp.pad(stream, ((0, 0), (0, rows * N - n_words)))
    stream = stream.reshape(B, rows, N)

    ok_hdr = jnp.logical_and(magic == MAGIC, ver == VERSION)
    ok_hdr = jnp.logical_and(ok_hdr, jnp.sum(freq, axis=1) == PROB_SCALE)
    ok_hdr = jnp.logical_and(ok_hdr, size <= out_cap)
    ok_hdr = jnp.logical_and(ok_hdr, size >= 0)
    ok_hdr = jnp.logical_and(
        ok_hdr, comp_sizes.astype(jnp.int64) >= HEADER_BYTES + 2 * total_words.astype(jnp.int64))
    size_c = jnp.clip(jnp.where(ok_hdr, size, 0), 0, out_cap).astype(jnp.int32)

    # Mosaic cannot legalize the i64s the package-wide x64 mode injects into
    # the pallas grid machinery; all kernel dtypes are explicit int32
    with jax.enable_x64(False):
        out_tl, okv = _pallas_decode(
            B, T, rows, interpret, size_c, total_words.astype(jnp.int32),
            freq.reshape(B, 256, 1), cum.reshape(B, 256, 1),
            cumn.reshape(B, 256, 1), states.reshape(B, 1, N),
            wcounts.astype(jnp.int32).reshape(B, 1, N), stream)

    ok = jnp.logical_and(ok_hdr, jnp.all(okv != 0, axis=(1, 2)))
    out = out_tl.reshape(B, T * N)[:, :out_cap]
    osz = jnp.where(ok, size_c, 0).astype(jnp.int32)
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    stat = jnp.where(ok, jnp.int32(Status.SUCCESS),
                     jnp.int32(Status.ERROR_CANNOT_DECOMPRESS))
    return out, osz, stat


def _pallas_decode(B, T, rows, interpret, sizes, total_words,
                   freq, cum, cumn, states, wcounts, stream):
    max_word_pos = (rows - 2) * N
    return pl.pallas_call(
        functools.partial(_kernel, T, max_word_pos),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sizes (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # total_words (B,)
            pl.BlockSpec((1, 256, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # freq
            pl.BlockSpec((1, 256, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # cum
            pl.BlockSpec((1, 256, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # cumn
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # states
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # wcounts
            pl.BlockSpec((1, rows, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # stream
        ],
        out_specs=[
            pl.BlockSpec((1, T, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, N), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
        ],
        interpret=interpret,
    )(sizes, total_words, freq, cum, cumn, states, wcounts, stream)
