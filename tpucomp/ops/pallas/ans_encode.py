"""Pallas/Mosaic rANS encoder: fully vectorized 128-lane state walk.

Encode-side counterpart of :mod:`.ans_decode`, completing the device-side
ANS API analog (``README.md:17`` — the one format nvCOMP exposes for use
*inside* user kernels, both directions).  :func:`encode_block` is callable
from any Pallas TPU kernel: it advances the 128 interleaved lane states over
the data in reverse position order (rANS is LIFO), emitting renormalization
words per step.

Vector-native like the decoder: per-symbol ``freq``/``cum`` lookups are
one-hot masked sums (no gathers), and the u32-by-frequency division that
defines the rANS transition runs as an exact three-limb (8+12+12 bit) long
division in f32 — each partial numerator stays below 2^24 (f32-exact) and a
±1 integer correction absorbs rounding, so the quotient/remainder match
integer division bit-for-bit without any integer-divide op (which the VPU
does not have).  All arithmetic is int32 with unsigned semantics (wrapping
ops are bit-identical to uint32; unsigned compares go through a sign-bit
XOR), because Mosaic cannot lower i64.

The batched wrapper shares the container serialization with the XLA scan
encoder (:func:`tpucomp.formats.ans.serialize_scan`), so both paths emit
byte-identical v2 frames.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.formats.ans import N_LANES as N
from tpucomp.formats.ans import PROB_BITS, RANS_L, serialize_scan, tables_for

SIGN = -(1 << 31)  # sign-bit mask for unsigned compares (plain int, not jnp)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _udiv_by_freq(x, f):
    """Exact unsigned x // f and x %% f for f in [1, 2^12], x any u32 bit
    pattern (int32).  Three-limb f32 long division with integer correction."""
    a = jax.lax.shift_right_logical(x, jnp.int32(24))          # < 2^8
    bm = jax.lax.shift_right_logical(x, jnp.int32(12)) & 0xFFF
    cl = x & 0xFFF
    f_f = f.astype(jnp.float32)

    def stage(rem, limb):
        n = jax.lax.shift_left(rem, jnp.int32(12)) | limb      # < 2^24
        q = jnp.floor(n.astype(jnp.float32) / f_f).astype(jnp.int32)
        r = n - q * f
        # correctly-rounded f32 division can land one off an exact floor
        over = r >= f
        q = q + over.astype(jnp.int32)
        r = r - jnp.where(over, f, 0)
        under = r < 0
        q = q - under.astype(jnp.int32)
        r = r + jnp.where(under, f, 0)
        return q, r

    q1, r1 = stage(jnp.int32(0), a)
    q2, r2 = stage(r1, bm)
    q3, r3 = stage(r2, cl)
    q = jax.lax.shift_left(q1, jnp.int32(24)) \
        + jax.lax.shift_left(q2, jnp.int32(12)) + q3
    return q, r3


def encode_block(size, freq, cum, data_ref, words_ref, emits_ref, *,
                 steps: int):
    """Device-side rANS encode block — callable from ANY Pallas TPU kernel.

    Encodes ``size`` bytes (128 interleaved lanes, ``steps`` rows of
    ``data_ref``) in reverse position order.  ``freq``/``cum`` are (256, 1)
    int32 quantized tables (sum == 2^12); ``data_ref`` a (1, steps, 128) VMEM
    ref of byte values; ``words_ref``/``emits_ref`` (1, steps, 128) VMEM refs
    that receive each forward step's emitted renormalization words and emit
    mask (decode order — row k holds what encoding position row k emitted).
    Returns ``(x_fin, wcount)``: final lane states (u32 bit patterns) and
    per-lane word counts for the container header.  Trace with x64 disabled.
    """
    T = steps
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (256, N), 0)

    def body(t, carry):
        x, wcount = carry
        row = T - 1 - t
        sym = data_ref[0, pl.ds(row, 1), :]
        act = (row * N + lanes) < size
        hot = (iota_s == sym).astype(jnp.int32)
        f = jnp.sum(hot * freq, axis=0, keepdims=True)
        c = jnp.sum(hot * cum, axis=0, keepdims=True)

        # renormalize: emit the low 16 bits while x >= (f << 20) (unsigned;
        # f == 2^12 wraps the threshold to 0 == 2^32: never emit)
        x_max = jax.lax.shift_left(f, jnp.int32(20))
        uge = (x ^ SIGN) >= (x_max ^ SIGN)
        emit = jnp.logical_and(act, jnp.logical_and(x_max != 0, uge))
        word = x & 0xFFFF
        x = jnp.where(emit, jax.lax.shift_right_logical(x, jnp.int32(16)), x)

        q, r = _udiv_by_freq(x, jnp.maximum(f, 1))
        x_new = jax.lax.shift_left(q, jnp.int32(PROB_BITS)) + r + c
        x = jnp.where(act, x_new, x)

        words_ref[0, pl.ds(row, 1), :] = jnp.where(emit, word, 0)
        emits_ref[0, pl.ds(row, 1), :] = emit.astype(jnp.int32)
        return x, wcount + emit.astype(jnp.int32)

    x0 = jnp.full((1, N), jnp.int32(int(RANS_L)), jnp.int32)
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), body,
                             (x0, jnp.zeros((1, N), jnp.int32)))


def _kernel(T: int, size_ref, freq_ref, cum_ref, data_ref,
            words_ref, emits_ref, xf_ref, wc_ref):
    b = pl.program_id(0)
    x_fin, wcount = encode_block(size_ref[b], freq_ref[0], cum_ref[0],
                                 data_ref, words_ref, emits_ref, steps=T)
    xf_ref[0] = x_fin
    wc_ref[0] = wcount


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch(data: jax.Array, sizes: jax.Array, out_cap: int,
                   interpret: bool = False):
    """Batched rANS encode, Pallas backend.  Byte-identical container to
    :func:`tpucomp.formats.ans.compress_batch` (the XLA scan path) — the
    state walk runs in the kernel, table quantization and serialization are
    the shared XLA code."""
    B, cap = data.shape
    T = -(-cap // N)
    sizes = sizes.astype(jnp.int32)

    freq, cum = jax.vmap(tables_for)(data, sizes)

    rows = jnp.pad(data, ((0, 0), (0, T * N - cap))).astype(jnp.int32)
    rows = rows.reshape(B, T, N)

    with jax.enable_x64(False):
        words, emits, xf, wc = pl.pallas_call(
            functools.partial(_kernel, T),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes (B,)
                pl.BlockSpec((1, 256, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 256, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, T, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, T, N), jnp.int32),
                jax.ShapeDtypeStruct((B, T, N), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
            ],
            interpret=interpret,
        )(sizes, freq.reshape(B, 256, 1), cum.reshape(B, 256, 1), rows)

    out, osz, stat = jax.vmap(
        lambda s, fr, x, w, wd, em: serialize_scan(
            s, fr, x[0], w[0], wd, em, out_cap))(
        sizes, freq, xf, wc, words, emits)
    return out, osz, stat
