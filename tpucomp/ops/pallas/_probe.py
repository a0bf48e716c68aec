"""Feature probes for Mosaic/Pallas-TPU lowering support.

Run on the dev TPU tunnel to learn which dynamic-indexing primitives compile:
    python -m tpucomp.ops.pallas._probe            # real backend
    JAX_PLATFORMS=cpu python -m tpucomp.ops.pallas._probe --interpret

Each probe is tiny and independent so one failure doesn't mask the rest.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, fn, *args, interpret=False):
    try:
        out = np.asarray(jax.jit(functools.partial(fn, interpret=interpret))(*args))
        print(f"PROBE {name}: OK {out.reshape(-1)[:4]}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}")
        return False


# 1. scalar read at dynamic lane index from a VMEM (1, N) ref
def p1(x, idx, interpret=False):
    def k(i_ref, x_ref, o_ref):
        o_ref[0] = x_ref[0, i_ref[0]].astype(jnp.int32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(idx, x)


# 2. dynamic roll along lanes
def p2(x, sh, interpret=False):
    def k(s_ref, x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], shift=s_ref[0], axis=1)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sh, x)


# 3. DMA VMEM -> SMEM, then scalar read at dynamic index from SMEM
def p3(x, idx, interpret=False):
    def k(i_ref, x_ref, o_ref):
        def inner(smem, sem):
            cp = pltpu.make_async_copy(x_ref, smem, sem)
            cp.start()
            cp.wait()
            o_ref[0] = smem[0, i_ref[0]]
        pl.run_scoped(inner, smem=pltpu.SMEM((1, 512), jnp.int32),
                      sem=pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(idx, x)


# 4. dynamic sublane (row) 2-row slice load of (R,128) + store at dynamic row
def p4(x, r, interpret=False):
    def k(r_ref, x_ref, o_ref):
        v = x_ref[pl.ds(r_ref[0], 2), :]
        o_ref[pl.ds(r_ref[0], 2), :] = v + 1
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(r, x)


# 5. masked store (front-masked row write)
def p5(x, o, interpret=False):
    def k(o_ref_s, x_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        mask = lanes >= o_ref_s[0]
        pltpu.store(out_ref, x_ref[0:1, :], mask=mask)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(o, x)


# 6. while_loop with scalar state + per-iter dynamic SMEM read
def p6(x, n, interpret=False):
    def k(n_ref, x_ref, o_ref):
        def inner(smem, sem):
            cp = pltpu.make_async_copy(x_ref, smem, sem)
            cp.start()
            cp.wait()

            def cond(s):
                i, acc = s
                return i < n_ref[0]

            def body(s):
                i, acc = s
                return i + 1, acc + smem[0, i]

            _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
            o_ref[0] = acc
        pl.run_scoped(inner, smem=pltpu.SMEM((1, 512), jnp.int32),
                      sem=pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(n, x)


# 7. same-buffer VMEM->VMEM DMA at dynamic offsets (match-copy shape), via
#    an aliased scratch output
def p7(x, s, interpret=False):
    def k(s_ref, x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :]
        def inner(sem):
            cp = pltpu.make_async_copy(
                o_ref.at[pl.ds(0, 2), :], o_ref.at[pl.ds(s_ref[0], 2), :], sem)
            cp.start()
            cp.wait()
        pl.run_scoped(inner, sem=pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(s, x)


# 8. uint8 VMEM block input + vector ops on it
def p8(x, interpret=False):
    def k(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].astype(jnp.int32) * 2
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


# 9. scalar dynamic write to SMEM scratch then bulk DMA SMEM->VMEM out
def p9(x, n, interpret=False):
    def k(n_ref, x_ref, o_ref):
        def inner(smem, sem):
            def body(i, _):
                smem[0, i] = i * 3
                return 0
            jax.lax.fori_loop(0, n_ref[0], body, 0)
            cp = pltpu.make_async_copy(smem, o_ref, sem)
            cp.start()
            cp.wait()
        pl.run_scoped(inner, smem=pltpu.SMEM((1, 128), jnp.int32),
                      sem=pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(n, x)


def main():
    interpret = "--interpret" in sys.argv
    print("devices:", jax.devices())
    x2d = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    x16 = jnp.arange(16 * 128, dtype=jnp.int32).reshape(16, 128)
    x1 = jnp.arange(512, dtype=jnp.int32).reshape(1, 512)
    xu8 = (jnp.arange(8 * 128) % 251).astype(jnp.uint8).reshape(8, 128)
    i = jnp.array([37], jnp.int32)
    _run("1-dyn-lane-scalar-read-vmem", p1, x1, i, interpret=interpret)
    _run("2-dynamic-roll", p2, x2d, i, interpret=interpret)
    _run("3-dma-vmem-to-smem+dyn-read", p3, x1, i, interpret=interpret)
    _run("4-dyn-sublane-slice", p4, x16, jnp.array([5], jnp.int32), interpret=interpret)
    _run("5-masked-store", p5, x2d, i, interpret=interpret)
    _run("6-while-scalar-smem", p6, x1, jnp.array([100], jnp.int32), interpret=interpret)
    _run("7-same-buffer-dma", p7, x16, jnp.array([8], jnp.int32), interpret=interpret)
    _run("8-uint8-vmem", p8, xu8, interpret=interpret)
    _run("9-scalar-smem-write+dma-out", p9, x1, jnp.array([128], jnp.int32),
         interpret=interpret)


# 10. large SMEM scratch (16K int32 = 64KB) + DMA fill + scalar read
def p10(x, idx, interpret=False):
    def k(i_ref, x_ref, o_ref):
        def inner(smem, sem):
            cp = pltpu.make_async_copy(x_ref, smem, sem)
            cp.start()
            cp.wait()
            o_ref[0] = smem[0, i_ref[0]]
        pl.run_scoped(inner, smem=pltpu.SMEM((1, 16384), jnp.int32),
                      sem=pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(idx, x)


# 11. SMEM input block spec directly (1, 16384)
def p11(x, idx, interpret=False):
    def k(i_ref, x_ref, o_ref):
        o_ref[0] = x_ref[0, i_ref[0]]
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(idx, x)


def main2():
    interpret = "--interpret" in sys.argv
    xl = jnp.arange(16384, dtype=jnp.int32).reshape(1, 16384)
    i = jnp.array([12345], jnp.int32)
    _run("10-large-smem-dma", p10, xl, i, interpret=interpret)
    _run("11-smem-input-block", p11, xl, i, interpret=interpret)


if __name__ == "__main__":
    main()
    main2()
