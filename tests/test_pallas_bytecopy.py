"""Unit tests for the Pallas byte-copy primitives (interpreter mode).

``copy_pattern`` is the subtle one: LZ77 self-overlapping matches with
``offset < 128`` amplify the pattern by log-doubling wild stores.  The sweep
covers every regime: offset 1 (RLE), tiny offsets, offsets straddling the
amplification-saturation boundary (the v -> v + min(v, BLK) step), and
offsets just under BLK.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.ops.pallas import bytecopy as bc

ROWS = 40  # 5120 bytes incl. wild slack


def _run_kernel(body, init_bytes: bytes):
    """Run ``body(ref)`` over a (1, ROWS, 128) int32 byte buffer."""
    buf = np.zeros(ROWS * bc.BLK, np.int32)
    buf[:len(init_bytes)] = np.frombuffer(init_bytes, np.uint8)
    x = jnp.asarray(buf.reshape(1, ROWS, bc.BLK))

    def kernel(x_ref, o_ref):
        o_ref[:, :, :] = x_ref[:, :, :]
        body(o_ref)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, ROWS, bc.BLK), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(x)
    return np.asarray(out).reshape(-1)


@pytest.mark.parametrize("offset", [1, 2, 3, 5, 7, 16, 37, 38, 63, 64, 65,
                                    100, 126, 127])
@pytest.mark.parametrize("n", [1, 4, 19, 128, 300, 1200])
def test_copy_pattern(offset, n):
    rng = np.random.default_rng(offset * 1000 + n)
    prefix = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
    op = len(prefix)

    body = functools.partial(
        lambda ref: bc.copy_pattern(ref, jnp.int32(op), jnp.int32(offset),
                                    jnp.int32(n)))
    out = _run_kernel(body, prefix)

    expect = bytearray(prefix)
    for i in range(n):
        expect.append(expect[op - offset + i])
    assert out[:op + n].astype(np.uint8).tobytes() == bytes(expect)


@pytest.mark.parametrize("dist", [128, 129, 200, 1000])
@pytest.mark.parametrize("n", [1, 130, 700])
def test_copy_bytes_same_buffer(dist, n):
    rng = np.random.default_rng(dist + n)
    prefix = rng.integers(0, 256, 1100, dtype=np.uint8).tobytes()
    op = len(prefix)
    src = op - dist

    body = functools.partial(
        lambda ref: bc.copy_bytes(ref, ref, jnp.int32(src), jnp.int32(op),
                                  jnp.int32(n)))
    out = _run_kernel(body, prefix)

    expect = bytearray(prefix)
    for i in range(n):
        expect.append(expect[src + i])
    assert out[:op + n].astype(np.uint8).tobytes() == bytes(expect)
