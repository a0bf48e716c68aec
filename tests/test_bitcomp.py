"""Bitcomp-analog codec tests: typed round-trips, sparse mode, HPC-data ratio."""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import ElementType, Status
from tpucomp.formats import bitcomp
from tpucomp.utils import synth


def roundtrip(chunks, opts, max_chunk=None):
    cb = ChunkBatch.from_chunks(chunks, max_chunk_bytes=max_chunk)
    cap = bitcomp.max_compressed_chunk_size(cb.max_chunk_bytes, opts)
    comp, csz, cst = bitcomp.compress_batch(cb.data, cb.sizes, opts, cap)
    assert all(np.asarray(cst) == Status.SUCCESS), np.asarray(cst)
    dec, dsz, dst = bitcomp.decompress_batch(comp, csz, cb.max_chunk_bytes)
    assert all(np.asarray(dst) == Status.SUCCESS), np.asarray(dst)
    got = [bytes(np.asarray(dec[i, : dsz[i]])) for i in range(len(chunks))]
    assert got == list(chunks)
    return np.asarray(csz)


TYPES = [ElementType.UCHAR, ElementType.CHAR, ElementType.USHORT,
         ElementType.INT, ElementType.ULONGLONG]


@pytest.mark.parametrize("et", TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("algo", [0, 1])
def test_typed_roundtrip(et, algo):
    ts = et.nbytes
    opts = bitcomp.BitcompOpts(algorithm_type=algo, data_type=et)
    chunks = [
        synth.sorted_ints(512 * ts, dtype=np.int64 if ts == 8 else np.int32
                          ).tobytes()[: 512 * ts],
        synth.random_bytes(256 * ts, seed=3).tobytes(),
        bytes(ts * 4),
        b"",
    ]
    roundtrip(chunks, opts)


def test_float_data_smooth():
    # smooth float64 field: XOR-delta should pack well below raw size
    x = np.linspace(0, 1, 8192)
    field = np.sin(2 * np.pi * x) * 100.0
    data = field.astype(np.float64).tobytes()
    opts = bitcomp.BitcompOpts(0, ElementType.ULONGLONG)
    csz = roundtrip([data], opts)
    assert int(csz[0]) < len(data), "smooth float field should compress"


def test_sparse_mode_ratio():
    rng = np.random.default_rng(5)
    arr = np.zeros(16384, np.float32)
    nz = rng.choice(arr.size, 300, replace=False)
    arr[nz] = rng.normal(size=300).astype(np.float32)
    data = arr.tobytes()
    opts = bitcomp.BitcompOpts(1, ElementType.UINT)
    csz = roundtrip([data], opts)
    ratio = len(data) / int(csz[0])
    assert ratio > 15, f"97% sparse data should pack well, got {ratio:.1f}"


def test_constant_data():
    data = np.full(4096, 3.14159, np.float64).tobytes()
    opts = bitcomp.BitcompOpts(0, ElementType.ULONGLONG)
    csz = roundtrip([data], opts)
    assert int(csz[0]) < len(data) // 20


def test_size_not_multiple():
    opts = bitcomp.BitcompOpts(0, ElementType.INT)
    cb = ChunkBatch.from_chunks([b"abc"])
    cap = bitcomp.max_compressed_chunk_size(4, opts)
    _, _, cst = bitcomp.compress_batch(cb.data, cb.sizes, opts, cap)
    assert int(cst[0]) == Status.ERROR_INVALID_VALUE


def test_garbage_decode():
    g = synth.random_bytes(500, seed=8).tobytes()
    cb = ChunkBatch.from_chunks([g])
    _, dsz, dst = bitcomp.decompress_batch(cb.data, cb.sizes, 4096)
    assert int(dst[0]) == Status.ERROR_CANNOT_DECOMPRESS


def test_get_decompress_size():
    import jax
    data = synth.sorted_ints(2048).tobytes()
    opts = bitcomp.BitcompOpts(0, ElementType.LONGLONG)
    cb = ChunkBatch.from_chunks([data])
    cap = bitcomp.max_compressed_chunk_size(2048, opts)
    comp, csz, _ = bitcomp.compress_batch(cb.data, cb.sizes, opts, cap)
    sizes = jax.vmap(bitcomp.get_decompress_size)(comp, csz)
    assert int(sizes[0]) == 2048


def test_partial_final_chunk_roundtrip():
    """Regression: the width-code region must be aligned on the USED subblock
    count (derivable by the decoder from n), not the static capacity — the
    mismatch silently corrupted every chunk shorter than the chunk size."""
    from tpucomp import batched

    for total in (200_000, 16385, 3392, 255):
        data = synth.low_cardinality_ints(total).tobytes()[:total]
        cb = ChunkBatch.from_bytes(data, chunk_size=16384)
        assert batched.roundtrip_verify("bitcomp", cb), total
