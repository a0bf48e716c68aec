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


# =========================================================================
# Wide kernel (round 5): G chunks per grid step
# =========================================================================
#
# Same rationale as ans_decode's wide kernel (PERF_MODEL §7.4): the
# single-chunk kernel's per-step working set is (256, 128) — 1/8 of the
# VPU lanes — serialized across chunks by the sequential grid.  Encode has
# NO cross-lane moves at all (each lane's renorm words land in its own
# (row, lane) slot; the shared-stream interleave happens in XLA
# serialization), so widening is pure gain: all per-step ops run over
# (256, G*128) / (1, G*128).  The two table lookups collapse into ONE
# masked reduce via the pack freq | (cum << 16) (both < 2^13: no carry).

def _kernel_wide(T: int, G: int, sizes_ref, fc_ref, data_ref,
                 words_ref, emits_ref, xf_ref, wc_ref):
    L = G * N
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    lane127 = lanes & jnp.int32(N - 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (256, L), 0)
    fc_v = fc_ref[0]                        # (256, L): freq | cum << 16
    sizes_v = sizes_ref[0, 0:1, :]          # (1, L)

    def body(t, carry):
        x, wcount = carry
        row = T - 1 - t
        sym = data_ref[0, pl.ds(row, 1), :]
        act = (row * N + lane127) < sizes_v
        hot = iota_s == sym
        r = jnp.sum(jnp.where(hot, fc_v, jnp.int32(0)), axis=0,
                    keepdims=True)
        f = r & jnp.int32(0xFFFF)
        c = jax.lax.shift_right_logical(r, jnp.int32(16))

        x_max = jax.lax.shift_left(f, jnp.int32(20))
        uge = (x ^ SIGN) >= (x_max ^ SIGN)
        emit = jnp.logical_and(act, jnp.logical_and(x_max != 0, uge))
        word = x & 0xFFFF
        x = jnp.where(emit, jax.lax.shift_right_logical(x, jnp.int32(16)),
                      x)

        q, rr = _udiv_by_freq(x, jnp.maximum(f, 1))
        x_new = jax.lax.shift_left(q, jnp.int32(PROB_BITS)) + rr + c
        x = jnp.where(act, x_new, x)

        words_ref[0, pl.ds(row, 1), :] = jnp.where(emit, word,
                                                   jnp.int32(0))
        emits_ref[0, pl.ds(row, 1), :] = emit.astype(jnp.int32)
        return x, wcount + emit.astype(jnp.int32)

    x0 = jnp.full((1, L), jnp.int32(int(RANS_L)), jnp.int32)
    x_fin, wcount = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body,
        (x0, jnp.zeros((1, L), jnp.int32)))
    xf_ref[0] = x_fin
    wc_ref[0] = wcount


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def compress_batch_wide(data: jax.Array, sizes: jax.Array, out_cap: int,
                        interpret: bool = False):
    """Batched rANS encode, wide Pallas kernel (G chunks per grid step).
    Byte-identical frames to :func:`compress_batch`."""
    B0, cap = data.shape
    T = -(-cap // N)
    sizes = sizes.astype(jnp.int32)

    G = 8
    while G > 1:
        est = 4 * 2 * (256 * G * N + 3 * G * T * N + 6 * G * N)
        if est <= (12 << 20):
            break
        G //= 2
    B = -(-B0 // G) * G
    if B != B0:
        data = jnp.pad(data, ((0, B - B0), (0, 0)))
        sizes = jnp.pad(sizes, (0, B - B0))
    NG = B // G
    L = G * N

    freq, cum = jax.vmap(tables_for)(data, sizes)
    fc = (freq | (cum << 16)).astype(jnp.int32)        # both < 2^13

    def bcast_tbl(a):  # (B, 256) -> (NG, 256, L), lanes group-major
        return jnp.repeat(a.reshape(NG, G, 256).transpose(0, 2, 1), N,
                          axis=2)

    def bcast_scalar(a):  # (B,) -> (NG, 1, L)
        return jnp.repeat(a.reshape(NG, 1, G), N, axis=2)

    rows = jnp.pad(data, ((0, 0), (0, T * N - cap))).astype(jnp.int32)
    # (B, T, N) -> (NG, T, L) with group-major lanes, so the kernel's
    # per-step row read needs no relayout
    rows = rows.reshape(NG, G, T, N).transpose(0, 2, 1, 3).reshape(NG, T, L)

    with jax.enable_x64(False):
        words, emits, xf, wc = pl.pallas_call(
            functools.partial(_kernel_wide, T, G),
            grid=(NG,),
            in_specs=[
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # sizes bcast
                pl.BlockSpec((1, 256, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # freq|cum<<16
                pl.BlockSpec((1, T, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # data rows
            ],
            out_specs=[
                pl.BlockSpec((1, T, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NG, T, L), jnp.int32),
                jax.ShapeDtypeStruct((NG, T, L), jnp.int32),
                jax.ShapeDtypeStruct((NG, 1, L), jnp.int32),
                jax.ShapeDtypeStruct((NG, 1, L), jnp.int32),
            ],
            interpret=interpret,
        )(bcast_scalar(sizes), bcast_tbl(fc), rows)

    # untangle group-major lanes back to (B, T, N) for serialization
    def unlane(a):
        return a.reshape(NG, T, G, N).transpose(0, 2, 1, 3) \
            .reshape(B, T, N)

    words = unlane(words)
    emits = unlane(emits)
    xf = xf.reshape(B, N)
    wc = wc.reshape(B, N)

    out, osz, stat = jax.vmap(
        lambda s, fr, x, w, wd, em: serialize_scan(
            s, fr, x, w, wd, em, out_cap))(
        sizes, freq, xf, wc, words, emits)
    return out[:B0], osz[:B0], stat[:B0]
