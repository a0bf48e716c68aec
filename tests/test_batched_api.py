"""Generic batched (LLIF-analog) API tests across registered formats."""
import numpy as np
import pytest

from tpucomp import batched
from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.utils import synth


def test_formats_registered():
    fmts = batched.formats()
    for expected in ("lz4", "snappy", "cascaded"):
        assert expected in fmts


def test_temp_size_parity_shims():
    assert batched.compress_get_temp_size("lz4", 10, 65536) == 0
    assert batched.decompress_get_temp_size("lz4", 10, 65536) == 0
    assert batched.compress_get_max_output_chunk_size("lz4", 65536) > 65536


@pytest.mark.parametrize("fmt", ["lz4", "snappy", "cascaded", "ans",
                                 "deflate", "gdeflate", "bitcomp"])
def test_roundtrip_via_generic_api(fmt):
    data = synth.mixed_corpus(32768, seed=11).tobytes()
    if fmt in ("cascaded", "bitcomp"):
        data = synth.low_cardinality_ints(32768).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=8192)
    comp, cstat = batched.compress(fmt, cb)
    assert all(np.asarray(cstat) == Status.SUCCESS)
    dec, dstat = batched.decompress(fmt, comp, 8192)
    assert all(np.asarray(dstat) == Status.SUCCESS)
    assert dec.to_bytes() == data
    assert batched.roundtrip_verify(fmt, cb)


def test_get_decompress_size_generic():
    data = synth.low_cardinality_ints(16384).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=4096)
    comp, _ = batched.compress("cascaded", cb)
    sizes = batched.get_decompress_size("cascaded", comp)
    assert list(np.asarray(sizes)) == [4096, 4096, 4096, 4096]


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        batched.compress_get_max_output_chunk_size("nope", 100)


def test_bench_harness_backend_symmetry(monkeypatch):
    """run_benchmark must resolve BOTH paths through the backend dispatch —
    the timed compress column measures the product encoder, not a hard-coded
    spec.compress_batch (the encode analog of _decode_fn resolution)."""
    from tpucomp import bench
    from tpucomp.ops import pallas as pk

    calls = {"enc": 0, "dec": 0}
    real_enc, real_dec = pk.PALLAS_ENCODERS["lz4"], pk.PALLAS_DECODERS["lz4"]

    def spy_enc(data, sizes, opts, out_cap):
        calls["enc"] += 1
        return real_enc(data, sizes, opts, out_cap)

    def spy_dec(comp, csz, out_cap):
        calls["dec"] += 1
        return real_dec(comp, csz, out_cap)

    monkeypatch.setitem(pk.PALLAS_ENCODERS, "lz4", spy_enc)
    monkeypatch.setitem(pk.PALLAS_DECODERS, "lz4", spy_dec)
    chunks = [synth.mixed_corpus(2048, seed=3).tobytes() for _ in range(2)]
    res = bench.run_benchmark("lz4", chunks, iterations=1, warmup=1,
                              backend="pallas")
    assert calls["enc"] >= 1 and calls["dec"] >= 1
    assert res.compress_gbs > 0 and res.decompress_gbs > 0
