"""Multi-chip / multi-host parallelism over a JAX device mesh.

TPU-native replacement for the reference's multi-GPU layer
(``benchmarks/benchmark_allgather.cpp``): where the reference shards chunks
across GPUs, compresses on each GPU's streams and broadcasts compressed chunks
peer-to-peer over NVLink (``:156-181,358-434``), we shard the chunk axis of a
:class:`~tpucomp.chunk.ChunkBatch` over a ``jax.sharding.Mesh`` and move the
*compressed* payload with an XLA ``all_gather`` riding ICI/DCN — the collective's
wire bytes shrink by the compression ratio, which is the whole point of a
compressed all-gather.

No NCCL/MPI analog is needed: collectives are compiled into the program by XLA
from ``shard_map`` + ``lax.all_gather``/``psum`` (SURVEY.md §2.6).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpucomp.chunk import ChunkBatch


def make_chunk_mesh(n_devices: int | None = None,
                    axis_name: str = "chunks") -> Mesh:
    """1-D mesh over all (or the first n) local devices, chunk-data-parallel."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis_name,))


def _codec(fmt: str):
    from tpucomp import batched
    return batched._get(fmt)


def compressed_all_gather_fn(fmt: str, mesh: Mesh, axis_name: str,
                             max_chunk_bytes: int, out_cap: int | None = None,
                             opts: Any = None, backend: str = "xla"):
    """Build the jitted sharded step: compress local chunk shard -> all-gather the
    compressed payload -> decompress every chunk on every device.

    Mirrors ``run_nvcomp_benchmark`` (``benchmark_allgather.cpp:289-434``):
    returns ``(decompressed, dec_sizes, comp_sizes, statuses)`` with the
    decompressed batch replicated (as after the reference's P2P broadcast).

    The input chunk axis must be sharded over ``axis_name``; chunk count must be
    divisible by the mesh axis size.
    """
    from tpucomp import batched as _batched
    spec = _codec(fmt)
    opts = opts if opts is not None else spec.default_opts
    cap = out_cap or spec.max_compressed_chunk_size(max_chunk_bytes, opts)
    enc = _batched._encode_fn(fmt, spec, backend) if backend != "xla" \
        else (lambda d, s2, o, c: spec.compress_batch(d, s2, o, c))
    dec_f = _batched._decode_fn(fmt, spec, backend)

    def step(data, sizes):
        comp, csz, cst = enc(data, sizes, opts, cap)
        comp_all = jax.lax.all_gather(comp, axis_name, tiled=True)
        csz_all = jax.lax.all_gather(csz, axis_name, tiled=True)
        dec, dsz, dst = dec_f(comp_all, csz_all, max_chunk_bytes)
        return dec, dsz, csz_all, jnp.maximum(jnp.max(cst), jnp.max(dst))

    # check_vma=False: after the all_gather every device computes the same
    # replicated result, but the static variance checker cannot infer that
    # through the decoder's scatters/gathers.
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=(P(None, None), P(None), P(None), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def compressed_all_gather(fmt: str, batch: ChunkBatch, mesh: Mesh,
                          axis_name: str = "chunks",
                          opts: Any = None) -> tuple[ChunkBatch, jax.Array, jax.Array]:
    """One-shot convenience wrapper around :func:`compressed_all_gather_fn`."""
    fn = compressed_all_gather_fn(fmt, mesh, axis_name, batch.max_chunk_bytes,
                                  opts=opts)
    from jax.sharding import NamedSharding
    data = jax.device_put(batch.data, NamedSharding(mesh, P(axis_name, None)))
    sizes = jax.device_put(batch.sizes, NamedSharding(mesh, P(axis_name)))
    dec, dsz, csz, status = fn(data, sizes)
    return ChunkBatch(data=dec, sizes=dsz), csz, status


def sharded_roundtrip_fn(fmt: str, mesh: Mesh, axis_name: str,
                         max_chunk_bytes: int, opts: Any = None,
                         backend: str = "xla"):
    """Pure chunk-data-parallel compress+decompress (no collective): each device
    round-trips its own shard.  The multi-device analog of the single-chip hot
    path, used for scaling-efficiency measurements.  ``backend`` selects the
    kernel path per shard ("auto" = Pallas kernels on TPU meshes)."""
    from tpucomp import batched as _batched
    spec = _codec(fmt)
    opts = opts if opts is not None else spec.default_opts
    cap = spec.max_compressed_chunk_size(max_chunk_bytes, opts)
    enc = _batched._encode_fn(fmt, spec, backend) if backend != "xla" \
        else (lambda d, s, o, c: spec.compress_batch(d, s, o, c))
    dec_f = _batched._decode_fn(fmt, spec, backend)

    def step(data, sizes):
        comp, csz, cst = enc(data, sizes, opts, cap)
        dec, dsz, dst = dec_f(comp, csz, max_chunk_bytes)
        ok = jnp.maximum(jnp.max(cst), jnp.max(dst))
        return dec, dsz, csz, jax.lax.pmax(ok, axis_name)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=(P(axis_name, None), P(axis_name), P(axis_name), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


__all__ = ["make_chunk_mesh", "compressed_all_gather",
           "compressed_all_gather_fn", "sharded_roundtrip_fn"]
