"""Pallas/Mosaic rANS decoders: fully vectorized, no gathers, no scalar walk.

TPU analog of the reference's GPU-native ANS decode (``README.md:17`` — the
one format nvCOMP exposes a device-side API for).  Two kernels share the v2
container:

* :func:`decompress_batch_wide` — the PRODUCT path (round 5): G=8 chunks'
  lane sets advance together per grid step, table lookups are monotone-mask
  reductions over a (256, G*128) working set, rank/renorm use log-step lane
  rolls.  2.1x the single-chunk kernel; see PERF_MODEL §7.4 for the
  measured per-stage budget (cross-lane rolls are the current floor).
* :func:`decompress_batch` / :func:`decode_block` — the single-chunk kernel
  kept as the device-side API building block (callable from other Pallas
  kernels, the ``README.md:17`` analog).

Unlike the LZ kernels
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


# =========================================================================
# Wide kernel (round 5): G chunks per grid step
# =========================================================================
#
# The single-chunk kernel above advances 128 lanes per sequential grid step,
# so each table lookup is a tiny (1, 128)-output op: latency-bound and
# serialized across chunks (measured 0.20 GB/s, VERDICT r4 weak #5).  The
# wide kernel advances G chunks' lanes together — per-step working set
# (256, G*128) in VMEM, full VPU lane utilization — and replaces both matmul
# families with cheaper exact vector forms:
#
#   * table lookups -> monotone-mask reductions over the 256 axis:
#       sym = #(cumn <= slot);  cum[sym] = sum((cumn<=slot)*freq);
#       cum[sym]+freq[sym] = sum((cum<=slot)*freq)
#   * in-group rank -> 7-step log prefix sum over the lane axis
#   * word distribution -> staged monotone shift: lane l needs word
#     rank(l) of its group's window, i.e. a left-shift by
#     d(l) = lane127(l) - rank(l); d is non-decreasing within a group, so
#     7 conditional rolls route every word exactly (pure int moves — no
#     bf16 matmul precision games)

def _kernel_wide(T: int, G: int, max_word_pos: int,
                 tw_s_ref, sizes_ref, tw_ref, cumn_ref, symfq_ref, fqn_ref,
                 fq0_ref, st_ref, wc_ref, stream_ref, out_ref, okv_ref,
                 ptr_s):
    i = pl.program_id(0)
    L = G * N
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    lane127 = lanes & jnp.int32(N - 1)
    cumn_v = cumn_ref[0]                    # (256, L): inclusive cum freq
    symfq_v = symfq_ref[0]                  # (256, L): 1 | (freq << 16)
    fqn_v = fqn_ref[0]                      # (256, L): freq[s+1]
    fq0_v = fq0_ref[0, 0:1, :]              # (1, L): freq[0]
    sizes_v = sizes_ref[0, 0:1, :]          # (1, L)
    wc_v = wc_ref[0, 0:1, :]
    for g in range(G):
        ptr_s[g] = jnp.int32(0)

    def body(t, carry):
        x, consumed = carry
        act = (t * N + lane127) < sizes_v
        slot = x & jnp.int32(PROB_SCALE - 1)
        shr = jax.lax.shift_right_logical(x, jnp.int32(12))
        # ONE compare pass + TWO masked reduces give sym, cum[sym], freq[sym]:
        #   mask[s] = (cumn[s] <= slot) is 1 exactly for s < sym, so
        #   sym       = sum(mask),   cum[sym] = sum(mask * freq)
        #   (packed: sum(mask * (1 | freq<<16)) — sym <= 256 and
        #    cum <= 4096 both fit 16 bits, no carry between halves)
        #   freq[sym] = freq[0] + sum(mask[s] * freq[s+1]) - cum[sym]
        #   (telescoping the one-hot mask[s-1]-mask[s] against freq)
        mask1 = cumn_v <= slot
        r1 = jnp.sum(jnp.where(mask1, symfq_v, jnp.int32(0)), axis=0,
                     keepdims=True)
        r2 = jnp.sum(jnp.where(mask1, fqn_v, jnp.int32(0)), axis=0,
                     keepdims=True)
        sym = r1 & jnp.int32(0xFFFF)
        c = jax.lax.shift_right_logical(r1, jnp.int32(16))
        f = fq0_v + r2 - c
        x_new = f * shr + slot - c          # int32 wrap == uint32 pattern
        need = jnp.logical_and(act, (x_new & jnp.int32(-(1 << 16))) == 0)
        need_i = need.astype(jnp.int32)
        # in-group inclusive prefix (log-step; rolls guarded to the group)
        acc = need_i
        for s in (1, 2, 4, 8, 16, 32, 64):
            acc = acc + jnp.where(lane127 >= s,
                                  pltpu.roll(acc, jnp.int32(s), axis=1),
                                  jnp.int32(0))
        rank = acc - need_i                 # exclusive
        # per-group shared-stream windows at the current cursors
        wins = [bc.window128(stream_ref,
                             jnp.minimum(ptr_s[g], jnp.int32(max_word_pos)),
                             c=g)
                for g in range(G)]
        win_all = jnp.concatenate(wins, axis=1)   # (1, L)
        # staged monotone gather: w[l] = window[rank[l]] = shift by
        # d(l) = lane127 - rank(l).  Both rank and d are non-decreasing
        # within a group with steps <= 1 (rank increments on needing lanes,
        # d on non-needing ones); for such Lipschitz-1 monotone distances,
        # applying the shift bits HIGH to LOW routes every lane exactly
        # (at stage 2^k the source lane's already-applied high shift equals
        # the reader's remaining high shift — provable from d(l)-d(l-s) in
        # [0, s]).  Low-to-high is NOT correct (d=[0,1,2,2] breaks it).
        # Partial shifts never leave the group (applied total <= d <=
        # lane127), so cross-group contamination is impossible.
        d = lane127 - rank
        wv = win_all
        for s in (64, 32, 16, 8, 4, 2, 1):
            wv = jnp.where((d & s) != 0,
                           pltpu.roll(wv, jnp.int32(s), axis=1), wv)
        x_rn = jax.lax.shift_left(x_new, jnp.int32(16)) | wv
        x = jnp.where(act, jnp.where(need, x_rn, x_new), x)
        for g in range(G):
            # group word count = last lane of the inclusive prefix (a plain
            # int32 element read; Mosaic lowers scalar-output reductions
            # through i64 converts, which it cannot legalize)
            cnt = acc[0, g * N + N - 1]
            ptr_s[g] = ptr_s[g] + cnt
        # one store per step; the group-major lane order is untangled by a
        # cheap XLA transpose outside the kernel
        out_ref[0, pl.ds(t, 1), :] = jnp.where(act, sym, jnp.int32(0))
        return x, consumed + need_i

    x0 = st_ref[0, 0:1, :]
    x_fin, consumed = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body,
        (x0, jnp.zeros((1, L), jnp.int32)))

    okv = jnp.logical_and(x_fin == jnp.int32(1 << 16), consumed == wc_v)
    ptr_ok = jnp.ones((1, L), jnp.int32)
    for g in range(G):
        ok_g = (ptr_s[g] == tw_s_ref[i * G + g]).astype(jnp.int32)
        grp = (lanes >> jnp.int32(7)) == g
        ptr_ok = jnp.where(grp, ok_g, ptr_ok)
    okv = jnp.logical_and(okv, ptr_ok != 0)
    okv = jnp.logical_or(okv, sizes_v <= 0)
    okv_ref[0, 0:1, :] = okv.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch_wide(comp: jax.Array, comp_sizes: jax.Array,
                          out_cap: int, interpret: bool = False):
    """Batched rANS decode, wide Pallas kernel (G chunks per grid step)."""
    B0, comp_cap = comp.shape
    T = -(-out_cap // N)

    pad_to = max(comp_cap, HEADER_BYTES + 2)
    n_words = max((pad_to - HEADER_BYTES) // 2, 1)
    rows = _round_up(n_words, N) // N + 2

    # pick the widest G whose VMEM residency fits (~12 MiB budget incl.
    # double-buffered inputs); B is padded to a multiple of G with dummy
    # chunks that fail the header check and decode to nothing
    G = 8
    while G > 1:
        lanes_b = G * N
        est = 4 * (2 * (3 * 256 * lanes_b + G * rows * N + 5 * lanes_b)
                   + G * T * N)
        if est <= (12 << 20):
            break
        G //= 2
    B = -(-B0 // G) * G
    if B != B0:
        comp = jnp.pad(comp, ((0, B - B0), (0, 0)))
        comp_sizes = jnp.pad(comp_sizes, (0, B - B0))
    NG = B // G
    L = G * N

    ci = jnp.pad(comp, ((0, 0), (0, pad_to - comp_cap))).astype(jnp.int32)

    def u16s(lo, hi):
        return ci[:, lo:hi:2] | (ci[:, lo + 1:hi:2] << 8)

    def u32s(lo, hi):
        return (ci[:, lo:hi:4] | (ci[:, lo + 1:hi:4] << 8)
                | (ci[:, lo + 2:hi:4] << 16) | (ci[:, lo + 3:hi:4] << 24))

    magic, ver = ci[:, 0], ci[:, 1]
    size = u32s(4, 8)[:, 0]
    total_words = u32s(8, 12)[:, 0].astype(jnp.int32)
    freq = u16s(12, 12 + 512).astype(jnp.int32)
    states = u32s(12 + 512, 12 + 1024).astype(jnp.int32)
    wcounts = u16s(12 + 1024, HEADER_BYTES).astype(jnp.int32)

    cumn = jnp.cumsum(freq, axis=1).astype(jnp.int32)
    # packed lookup tables for the single-mask-pass kernel (see _kernel_wide)
    symfq = jnp.int32(1) | (freq << 16)
    freq_next = jnp.concatenate(
        [freq[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    freq0 = freq[:, 0]

    stream = u16s(HEADER_BYTES, HEADER_BYTES + 2 * n_words)
    stream = jnp.pad(stream, ((0, 0), (0, rows * N - n_words)))
    stream = stream.reshape(B, rows, N)

    ok_hdr = jnp.logical_and(magic == MAGIC, ver == VERSION)
    ok_hdr = jnp.logical_and(ok_hdr, jnp.sum(freq, axis=1) == PROB_SCALE)
    ok_hdr = jnp.logical_and(ok_hdr, size <= out_cap)
    ok_hdr = jnp.logical_and(ok_hdr, size >= 0)
    ok_hdr = jnp.logical_and(
        ok_hdr, comp_sizes.astype(jnp.int64)
        >= HEADER_BYTES + 2 * total_words.astype(jnp.int64))
    size_c = jnp.clip(jnp.where(ok_hdr, size, 0), 0,
                      out_cap).astype(jnp.int32)

    def bcast_tbl(a):  # (B, 256) -> (NG, 256, L), lanes group-major
        return jnp.repeat(a.reshape(NG, G, 256).transpose(0, 2, 1), N,
                          axis=2)

    def bcast_scalar(a):  # (B,) -> (NG, 1, L)
        return jnp.repeat(a.reshape(NG, 1, G), N, axis=2)

    max_word_pos = (rows - 2) * N
    with jax.enable_x64(False):
        out_tl, okv = pl.pallas_call(
            functools.partial(_kernel_wide, T, G, max_word_pos),
            grid=(NG,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # total_words (B,)
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # sizes bcast
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # total bcast
                pl.BlockSpec((1, 256, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # cumn
                pl.BlockSpec((1, 256, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # symfq pack
                pl.BlockSpec((1, 256, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # freq[s+1]
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # freq[0] bcast
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # states
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # wcounts
                pl.BlockSpec((G, rows, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # streams
            ],
            out_specs=[
                pl.BlockSpec((1, T, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NG, T, L), jnp.int32),
                jax.ShapeDtypeStruct((NG, 1, L), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((G,), jnp.int32)],
            interpret=interpret,
        )(total_words.astype(jnp.int32),
          bcast_scalar(size_c), bcast_scalar(total_words),
          bcast_tbl(cumn), bcast_tbl(symfq), bcast_tbl(freq_next),
          bcast_scalar(freq0),
          states.reshape(NG, 1, L),
          wcounts.reshape(NG, 1, L), stream)

    okv = okv.reshape(B, N)
    ok = jnp.logical_and(ok_hdr, jnp.all(okv != 0, axis=1))
    # untangle the group-major step rows: (NG, T, G, N) -> (NG, G, T, N)
    out = out_tl.reshape(NG, T, G, N).transpose(0, 2, 1, 3) \
        .reshape(B, T * N)[:, :out_cap]
    osz = jnp.where(ok, size_c, 0).astype(jnp.int32)
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    stat = jnp.where(ok, jnp.int32(Status.SUCCESS),
                     jnp.int32(Status.ERROR_CANNOT_DECOMPRESS))
    return out[:B0], osz[:B0], stat[:B0].astype(jnp.int32)
