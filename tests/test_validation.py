"""Input-validation contract + workflow-3 size queries + HLIF compile bucketing.

Covers the reference's cross-cutting API contracts (SURVEY.md §2.1 notes):
``nvcompErrorAlignment`` (CHANGELOG.md:15-16), per-format MaxAllowedChunkSize
(CHANGELOG.md:15,57), typed chunk-size-multiple validators
(benchmark_lz4_chunked.cu:48-84), and ``GetDecompressSizeAsync`` for the LZ
formats (low_level_quickstart_example.cpp:112-117, CHANGELOG.md:99-100).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpucomp import batched
from tpucomp.chunk import ChunkBatch
from tpucomp.constants import ElementType, Status
from tpucomp.interop import cpu as interop

HAVE_LZ4 = interop.available().get("lz4", False)


# -- GetDecompressSize for the LZ formats (VERDICT item 6) ----------------------------

@pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")
def test_lz4_get_decompress_size_foreign_streams():
    """Exact sizes for liblz4-produced streams (the reference's workflow 3)."""
    chunks = [b"hello world " * 100, b"\x00" * 1000, np.random.default_rng(0)
              .integers(0, 4, 500, dtype=np.uint8).tobytes(), b"x"]
    comp = [interop.lz4_compress(c) for c in chunks]
    cb = ChunkBatch.from_chunks(comp)
    sizes = np.asarray(batched.get_decompress_size("lz4", cb))
    assert list(sizes) == [len(c) for c in chunks]


def test_lz4_get_decompress_size_corrupt_is_zero():
    cb = ChunkBatch.from_chunks([b"\xff" * 64])
    assert int(np.asarray(batched.get_decompress_size("lz4", cb))[0]) == 0


def test_deflate_get_decompress_size_zlib_streams():
    import zlib
    chunks = [b"the quick brown fox " * 64, bytes(range(256)) * 4, b"a"]
    comp = []
    for c in chunks:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp.append(co.compress(c) + co.flush())
    cb = ChunkBatch.from_chunks(comp)
    sizes = np.asarray(batched.get_decompress_size("deflate", cb))
    assert list(sizes) == [len(c) for c in chunks]
    # gdeflate reads raw_size from its tile header (bytes 6-9)
    from tpucomp.formats import gdeflate as gd
    gout, gsz, _ = gd.compress_batch(
        ChunkBatch.from_chunks(chunks).data,
        ChunkBatch.from_chunks(chunks).sizes, gd.DEFAULT_OPTS,
        gd.max_compressed_chunk_size(ChunkBatch.from_chunks(chunks).max_chunk_bytes))
    from tpucomp.chunk import ChunkBatch as CB
    sizes_g = np.asarray(batched.get_decompress_size(
        "gdeflate", CB(data=gout, sizes=gsz)))
    assert list(sizes_g) == [len(c) for c in chunks]


def test_deflate_get_decompress_size_corrupt_is_zero():
    cb = ChunkBatch.from_chunks([b"\x07\x07\x07\x07\x07\x07\x07\x07"])
    assert int(np.asarray(batched.get_decompress_size("deflate", cb))[0]) == 0


def test_all_lz_formats_registered_for_size_query():
    for fmt in ("lz4", "deflate", "gdeflate", "snappy", "gzip", "zstd", "ans",
                "bitcomp", "cascaded"):
        assert batched._get(fmt).get_decompress_size is not None, fmt


# -- MaxAllowedChunkSize enforcement (VERDICT item 7) ---------------------------------

def test_deflate_oversized_chunk_status():
    """>64 KiB deflate compression chunks must fail per-chunk, not silently."""
    big = np.zeros((1 << 16) + 8, np.uint8).tobytes()
    small = b"ok" * 100
    cb = ChunkBatch.from_chunks([big, small])
    comp, stat = batched.compress("deflate", cb)
    stat = np.asarray(stat)
    assert stat[0] == Status.ERROR_CHUNK_SIZE_TOO_LARGE
    assert stat[1] == Status.SUCCESS
    assert int(np.asarray(comp.sizes)[0]) == 0


def test_gdeflate_oversized_chunk_status():
    big = np.zeros((1 << 16) + 8, np.uint8).tobytes()
    cb = ChunkBatch.from_chunks([big])
    _, stat = batched.compress("gdeflate", cb)
    assert np.asarray(stat)[0] == Status.ERROR_CHUNK_SIZE_TOO_LARGE


# -- Typed chunk-size-multiple validators ---------------------------------------------

def test_lz4_typed_size_multiple():
    from tpucomp.formats.lz4 import LZ4Opts
    cb = ChunkBatch.from_chunks([b"123456789ab" * 3, b"12345678" * 4])  # 33, 32 B
    _, stat = batched.compress("lz4", cb, LZ4Opts(data_type=ElementType.INT))
    stat = np.asarray(stat)
    assert stat[0] == Status.ERROR_INVALID_VALUE  # 33 % 4 != 0
    assert stat[1] == Status.SUCCESS


def test_cascaded_typed_size_multiple():
    from tpucomp.formats.cascaded import CascadedOpts
    cb = ChunkBatch.from_chunks([b"1234567" * 3])  # 21 B, not a multiple of 8
    _, stat = batched.compress(
        "cascaded", cb, CascadedOpts(type=ElementType.LONGLONG))
    assert np.asarray(stat)[0] == Status.ERROR_INVALID_VALUE


def test_bitcomp_typed_size_multiple():
    from tpucomp.formats.bitcomp import BitcompOpts
    cb = ChunkBatch.from_chunks([b"123" * 7])  # 21 B, not a multiple of 2
    _, stat = batched.compress(
        "bitcomp", cb, BitcompOpts(data_type=ElementType.USHORT))
    assert np.asarray(stat)[0] == Status.ERROR_INVALID_VALUE


# -- Alignment contract ----------------------------------------------------------------

def test_constructors_align_slot_stride():
    """ChunkBatch pads the slot stride to 8 B (the harness's 8-B chunk padding,
    benchmark_template_chunked.cuh:181-183), satisfying every format's
    REQUIRED_ALIGNMENT by construction."""
    cb = ChunkBatch.from_chunks([b"123", b"45678"])
    assert cb.max_chunk_bytes % 8 == 0
    cb2 = ChunkBatch.from_bytes(b"x" * 100, chunk_size=30)
    assert cb2.max_chunk_bytes % 8 == 0


def test_misaligned_stride_is_error_alignment():
    data = jnp.zeros((2, 34), jnp.uint8)  # 34 % 8 != 0
    cb = ChunkBatch(data=data, sizes=jnp.array([10, 10], jnp.int32))
    _, stat = batched.compress("deflate", cb)
    assert (np.asarray(stat) == Status.ERROR_ALIGNMENT).all()
    comp = ChunkBatch(data=jnp.zeros((1, 12), jnp.uint8),
                      sizes=jnp.array([12], jnp.int32))
    _, dstat = batched.decompress("zstd", comp, 64)
    assert (np.asarray(dstat) == Status.ERROR_ALIGNMENT).all()


def test_misaligned_out_cap_is_error_alignment():
    cb = ChunkBatch.from_chunks([b"hello" * 10])
    _, stat = batched.compress("lz4", cb, out_cap=101)  # lz4 alignment = 4
    assert (np.asarray(stat) == Status.ERROR_ALIGNMENT).all()


# -- HLIF chunk_cap bucketing (VERDICT item 5) ----------------------------------------

def test_bucket_chunk_cap_bounded_program_count():
    from tpucomp.manager import _bucket_chunk_cap
    # 100 "decompress calls" over varied data shapes -> at most 8 distinct
    # compiled shapes for chunk sizes up to 128 KiB
    raws = np.random.default_rng(1).integers(1, 1 << 17, 100)
    buckets = {_bucket_chunk_cap(int(r)) for r in raws}
    assert len(buckets) <= 8
    assert all(b >= r for b, r in zip(
        (_bucket_chunk_cap(int(r)) for r in raws), raws))


def test_manager_roundtrip_after_bucketing():
    from tpucomp import manager as m
    data = (b"manager bucketing " * 500)[:8000]
    mgr = m.Manager("lz4", chunk_size=2048)
    frame = mgr.compress(data)
    out = mgr.decompress(frame)
    assert bytes(np.asarray(out)) == data
