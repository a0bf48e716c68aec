"""Pallas RLE-expand kernel for the Cascaded fast path.

Expanding runs is the one data-dependent data movement in Cascaded decode.
Every vector formulation XLA offers is wrong for TPU: ``searchsorted`` +
gather measured 0.074 Gelem/s (82 s compile), scatter-of-deltas + cumsum
0.39 Gelem/s (130 s compile).  The shape of the problem — a serial walk over
runs, each broadcasting one value over a contiguous span — is exactly what a
Pallas kernel does well: read the run length from the scalar spine, then blast
the value with 128-lane wild stores (the LZ4 literal-copy idiom from
``bytecopy.py``, reused here on int32 VALUE lanes instead of byte lanes).

Cost: sum over runs of ceil(len/128) store pairs — a few hundred stores per
chunk on run-heavy columns (the format's whole purpose), bounded by
``n_runs + n/128`` on hostile data.

The kernel performs BOTH RLE passes in one launch (values -> scratch via
runs2, scratch -> out via runs1), with nr==0/1 branches predicated on the
scalar core — only the taken pass executes, unlike an XLA ``where`` chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.ops.pallas import bytecopy as bc

BLK = 128


def _extract(ref, r):
    """Scalar read of element ``r`` from a (1, rows, 128) int32 ref.

    All literals are pinned to i32: under the package-wide x64 mode a bare
    Python int becomes an i64 constant, which Mosaic cannot lower."""
    row = ref[0, pl.ds(r >> jnp.int32(7), 1), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    # max-reduce keeps i32 (jnp.sum accumulates in i64 under x64, which
    # Mosaic cannot lower); exactly one lane survives the mask
    sel = jnp.where(lane == (r & jnp.int32(BLK - 1)), row,
                    jnp.int32(-2147483648))
    return jnp.max(sel)


def _kernel(cap_el, scal_ref, vlo_ref, vhi_ref, r1_ref, r2_ref,
            olo_ref, ohi_ref, slo_ref, shi_ref):
    i = pl.program_id(0)
    n1, n2, nr = scal_ref[i, 1], scal_ref[i, 2], scal_ref[i, 3]

    def expand(src_lo, src_hi, runs_ref, count, dst_lo, dst_hi):
        def body(r, start):
            run = jnp.clip(_extract(runs_ref, r), jnp.int32(0),
                           jnp.int32(cap_el))
            start = jnp.minimum(start, jnp.int32(cap_el))
            vl = jnp.full((1, BLK), _extract(src_lo, r), jnp.int32)
            vh = jnp.full((1, BLK), _extract(src_hi, r), jnp.int32)

            def wcond(w):
                return w < run

            def wbody(w):
                bc.store128_wild(dst_lo, start + w, vl)
                bc.store128_wild(dst_hi, start + w, vh)
                return w + jnp.int32(BLK)

            jax.lax.while_loop(wcond, wbody, jnp.int32(0))
            return start + run

        jax.lax.fori_loop(jnp.int32(0),
                          jnp.clip(count, jnp.int32(0), jnp.int32(cap_el)),
                          body, jnp.int32(0))

    @pl.when(nr == jnp.int32(2))
    def _():
        expand(vlo_ref, vhi_ref, r2_ref, n2, slo_ref, shi_ref)
        expand(slo_ref, shi_ref, r1_ref, n1, olo_ref, ohi_ref)

    @pl.when(nr == jnp.int32(1))
    def _():
        expand(vlo_ref, vhi_ref, r1_ref, n1, olo_ref, ohi_ref)

    @pl.when(nr <= jnp.int32(0))
    def _():
        olo_ref[...] = vlo_ref[...]
        ohi_ref[...] = vhi_ref[...]


@functools.partial(jax.jit, static_argnames=("cap_el", "interpret"))
def expand_batch(vlo, vhi, runs1, runs2, scalars, cap_el: int,
                 interpret: bool = False):
    """Run both RLE expansions for a batch.

    Args:
      vlo, vhi, runs1, runs2: int32[B, cap_el] (values / run lengths).
      scalars: int32[B, 4] — (n, n1, n2, nr) per chunk.
      cap_el: static element capacity.

    Returns (out_lo, out_hi) int32[B, cap_el]; entries past the true count
    are junk the caller masks (wild-store idiom).
    """
    B = vlo.shape[0]
    rows = -(-cap_el // BLK) + 2            # +2 rows of wild-store slack
    rows = -(-rows // 8) * 8                # sublane tiling (scratch blocks)

    def shape(x):
        x = x.astype(jnp.int32)
        pad = rows * BLK - x.shape[1]
        return jnp.pad(x, ((0, 0), (0, pad))).reshape(B, rows, BLK)

    grid = (B,)
    spec = pl.BlockSpec((1, rows, BLK), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    # the package enables jax x64 globally; Mosaic cannot legalize the i64
    # values that mode injects into the pallas grid machinery ("func.return"
    # legalization failures) — all kernel dtypes here are explicit i32
    with jax.enable_x64(False):
        olo, ohi = _call(grid, spec, B, rows, cap_el, interpret,
                         scalars.astype(jnp.int32), shape(vlo), shape(vhi),
                         shape(runs1), shape(runs2))
    return (olo.reshape(B, rows * BLK)[:, :cap_el],
            ohi.reshape(B, rows * BLK)[:, :cap_el])


def _call(grid, spec, B, rows, cap_el, interpret, *args):
    return pl.pallas_call(
        functools.partial(_kernel, cap_el),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, rows, BLK), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((1, rows, BLK), jnp.int32),
                        pltpu.VMEM((1, rows, BLK), jnp.int32)],
        interpret=interpret,
    )(*args)
