"""Pallas Deflate decoder vs the zlib/libdeflate oracles and the XLA path.

Interpreter mode on CPU (hermetic); the same kernel compiles for real on the
TPU backend (``bench.py --codec deflate --backend pallas``).
"""
import zlib

import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import deflate as fdeflate
from tpucomp.interop import cpu as interop
from tpucomp.ops.pallas import deflate_decode
from tpucomp.utils import synth


def _decode(chunks: list[bytes], out_cap: int):
    cb = ChunkBatch.from_chunks(chunks)
    out, osz, stat = deflate_decode.decompress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


def test_zlib_streams_all_levels_bit_exact():
    """Levels 0 (stored), 1 (fixed-heavy), 6, 9 (dynamic) in one batch."""
    rng = np.random.default_rng(7)
    raws = [
        b"hello deflate, hello deflate, hello deflate! " * 30,
        bytes(rng.integers(0, 4, 3000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # incompressible
        b"\x00" * 3000,                                    # dist-1 RLE
        b"ab" * 1200,
        b"x",
        b"",
    ]
    comp, expect = [], []
    for r in raws:
        for level in (0, 1, 6, 9):
            comp.append(interop.deflate_compress(r, level=level))
            expect.append(r)
    out, osz, stat = _decode(comp, 4096)
    for i, r in enumerate(expect):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == len(r), (i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, i


def test_libdeflate_and_multiblock_streams():
    if not interop.available().get("libdeflate"):
        pytest.skip("libdeflate missing")
    buf = synth.mixed_corpus(40_000, seed=11).tobytes()
    chunks = [buf[i:i + 8192] for i in range(0, len(buf), 8192)]
    comp = [interop.libdeflate_compress(c, level=9) for c in chunks]
    # plus explicit multi-block streams: Z_FULL_FLUSH emits block boundaries
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    mb = co.compress(chunks[0][:4000]) + co.flush(zlib.Z_FULL_FLUSH)
    mb += co.compress(chunks[0][4000:]) + co.flush()
    comp.append(mb)
    chunks.append(chunks[0])
    out, osz, stat = _decode(comp, 8192)
    for i, c in enumerate(chunks):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert out[i, :len(c)].tobytes() == c, i


def test_own_encoder_round_trip():
    buf = synth.mixed_corpus(24_000, seed=5).tobytes()
    cb = ChunkBatch.from_bytes(buf, chunk_size=4096)
    cout, csz, cstat = fdeflate.compress_batch(
        cb.data, cb.sizes, fdeflate.DEFAULT_OPTS,
        fdeflate.max_compressed_chunk_size(cb.max_chunk_bytes))
    assert (np.asarray(cstat) == 0).all()
    cout, csz = np.asarray(cout), np.asarray(csz)
    comp = [cout[i, :csz[i]].tobytes() for i in range(cb.num_chunks)]
    out, osz, stat = _decode(comp, 4096)
    sizes = np.asarray(cb.sizes)
    for i in range(cb.num_chunks):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == sizes[i]
    assert out.reshape(-1)[:len(buf)].tobytes() == buf


def test_matches_xla_path_on_valid_streams():
    rng = np.random.default_rng(3)
    raws = [bytes(rng.integers(0, k, 2000, dtype=np.uint8)) for k in (2, 8, 256)]
    comp = [interop.deflate_compress(r) for r in raws]
    cb = ChunkBatch.from_chunks(comp)
    p = list(map(np.asarray, deflate_decode.decompress_batch(
        cb.data, cb.sizes, 2048, interpret=True)))
    x = list(map(np.asarray, fdeflate.decompress_batch(
        cb.data, cb.sizes, 2048)))
    assert (p[2] == x[2]).all()
    assert (p[1] == x[1]).all()
    assert (p[0] == x[0]).all()


def test_corrupt_inputs_error_not_crash():
    rng = np.random.default_rng(9)
    bad = [
        b"\x07" * 40,                        # btype=3 (reserved)
        b"\x05\x00",                         # truncated fixed block
        b"\x01\x05\x00\x00\x00hi",           # stored: NLEN mismatch
        b"\x01\xff\xff\x00\x00",             # stored: LEN beyond input
        bytes(rng.integers(0, 256, 96, dtype=np.uint8)),
        b"",
    ]
    out, osz, stat = _decode(bad, 4096)
    for i in range(len(bad)):
        if stat[i] != Status.SUCCESS:
            assert osz[i] == 0
    assert stat[0] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[2] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[3] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[5] == Status.ERROR_CANNOT_DECOMPRESS


def test_output_buffer_too_small():
    raw = b"tpucomp " * 600
    comp = interop.deflate_compress(raw)
    out, osz, stat = _decode([comp], 1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


def test_decompress_output_larger_than_64k():
    """Reference contract: decompress may exceed the 64 KiB compress cap
    (``CHANGELOG.md:75``)."""
    raw = (b"The quick brown fox jumps over the lazy dog. " * 2500)[:100_000]
    comp = interop.deflate_compress(raw, level=9)
    out, osz, stat = _decode([comp], 131072)
    assert stat[0] == Status.SUCCESS
    assert osz[0] == len(raw)
    assert out[0, :len(raw)].tobytes() == raw


# ------------------------------------------------------------- gzip hybrid ---

def test_gzip_backend_bit_exact_and_statuses():
    """Hybrid gzip path (header parse + Pallas deflate + CRC32 verify) agrees
    with the XLA gzip path on valid, corrupt-CRC, and truncated members."""
    import tpucomp.batched as batched
    from tpucomp.formats import gzip as fgzip

    rng = np.random.default_rng(17)
    raws = [
        b"gzip hybrid test " * 100,
        bytes(rng.integers(0, 8, 2500, dtype=np.uint8)),
        b"",
    ]
    comp = [interop.gzip_compress(r) for r in raws]
    # corrupt the CRC of a copy of the first member
    bad_crc = bytearray(comp[0])
    bad_crc[-5] ^= 0xFF
    comp.append(bytes(bad_crc))
    comp.append(comp[1][:20])  # truncated
    cb = ChunkBatch.from_chunks(comp)

    from tpucomp.ops import pallas as pk
    p = list(map(np.asarray, pk.PALLAS_DECODERS["gzip"](
        cb.data, cb.sizes, 4096)))
    x = list(map(np.asarray, fgzip.decompress_batch(cb.data, cb.sizes, 4096)))
    assert (p[2] == x[2]).all(), (p[2], x[2])
    assert (p[1] == x[1]).all()
    assert (p[0] == x[0]).all()
    for i, r in enumerate(raws):
        assert p[2][i] == Status.SUCCESS
        assert p[0][i, :len(r)].tobytes() == r
    assert p[2][3] == Status.ERROR_CANNOT_DECOMPRESS
    assert p[2][4] == Status.ERROR_CANNOT_DECOMPRESS


# ---------------------------------------------------------------------------
# fixed-Huffman encoder (deflate_encode — the TPU-side compress path)
# ---------------------------------------------------------------------------

def _encode(chunks, out_cap=None):
    from tpucomp.ops.pallas import deflate_encode
    cb = ChunkBatch.from_chunks(chunks)
    cap = out_cap or fdeflate.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = deflate_encode.compress_batch(
        cb.data, cb.sizes, cap, interpret=True)
    return map(np.asarray, (out, osz, stat))


def test_encode_zlib_inflates_bit_exact():
    rng = np.random.default_rng(11)
    chunks = [
        synth.mixed_corpus(65536, seed=1).tobytes(),
        synth.mortgage_like(65536, seed=2).tobytes(),
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),  # stored rewrite
        b"\x00" * 65536,                                     # max-len matches
        b"abcabcabcabcabcabcab",
        b"x",
        b"",
    ]
    out, osz, stat = _encode(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert zlib.decompress(out[i, :osz[i]].tobytes(), -15) == c, i


def test_encode_own_decoders_roundtrip():
    buf = synth.mixed_corpus(1 << 17, seed=9).tobytes()
    chunks = [buf[o:o + 32768] for o in range(0, len(buf), 32768)]
    out, osz, stat = _encode(chunks)
    assert (stat == Status.SUCCESS).all()
    comp = [out[i, :osz[i]].tobytes() for i in range(len(chunks))]
    dec, dsz, dst = _decode(comp, 32768)
    assert (dst == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert dec[i, :len(c)].tobytes() == c
    cb = ChunkBatch.from_chunks(comp)
    xo, xs, xst = map(np.asarray,
                      fdeflate.decompress_batch(cb.data, cb.sizes, 32768))
    assert (xst == Status.SUCCESS).all()


def test_encode_libdeflate_oracle():
    if not interop.available().get("libdeflate"):
        pytest.skip("no libdeflate")
    chunks = [synth.mixed_corpus(30000, seed=3).tobytes()]
    out, osz, stat = _encode(chunks)
    assert stat[0] == Status.SUCCESS
    got = interop.libdeflate_decompress(out[0, :osz[0]].tobytes(),
                                        len(chunks[0]))
    assert got == chunks[0]


def test_encode_stored_rewrite_bounds_expansion():
    rng = np.random.default_rng(0)
    raw = bytes(rng.integers(0, 256, 65536, dtype=np.uint8))
    out, osz, stat = _encode([raw])
    assert stat[0] == Status.SUCCESS
    # stored blocks: 65536 bytes -> 2 blocks -> +10 bytes overhead max
    assert osz[0] <= 65536 + 10
    assert zlib.decompress(out[0, :osz[0]].tobytes(), -15) == raw


def test_encode_output_buffer_too_small():
    rng = np.random.default_rng(1)
    raw = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    out, osz, stat = _encode([raw], out_cap=1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


# ---------------------------------------------------------------------------
# dynamic-Huffman rungs (algo 1/2): the 3-phase pipeline — hist walk ->
# vectorized table build -> emit walk (benchmark_deflate_chunked.cu:42,55-58)
# ---------------------------------------------------------------------------

def _encode_dyn(chunks, entropy_only=False):
    from tpucomp.ops.pallas import deflate_encode
    cb = ChunkBatch.from_chunks(chunks)
    cap = fdeflate.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = deflate_encode.compress_batch_dyn(
        cb.data, cb.sizes, cap, interpret=True, entropy_only=entropy_only)
    return map(np.asarray, (out, osz, stat))


def test_encode_dyn_zlib_inflates_bit_exact():
    rng = np.random.default_rng(21)
    chunks = [
        synth.mixed_corpus(65536, seed=4).tobytes(),
        synth.mortgage_like(65536, seed=5).tobytes(),
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),  # stored rewrite
        b"\x00" * 65536,
        b"abcabcabcabcabcabcab",
        b"x",
        b"",
    ]
    out, osz, stat = _encode_dyn(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert zlib.decompress(out[i, :osz[i]].tobytes(), -15) == c, i


def test_encode_dyn_beats_fixed_ratio():
    chunks = [synth.mixed_corpus(32768, seed=6).tobytes()]
    _, s_fixed, st0 = _encode(chunks)
    _, s_dyn, st1 = _encode_dyn(chunks)
    assert st0[0] == st1[0] == Status.SUCCESS
    assert s_dyn[0] < s_fixed[0]  # dynamic tables must pay on mixed data


def test_encode_dyn_own_decoders_roundtrip():
    buf = synth.mixed_corpus(1 << 16, seed=10).tobytes()
    chunks = [buf[o:o + 32768] for o in range(0, len(buf), 32768)]
    out, osz, stat = _encode_dyn(chunks)
    assert (stat == Status.SUCCESS).all()
    comp = [out[i, :osz[i]].tobytes() for i in range(len(chunks))]
    dec, dsz, dst = _decode(comp, 32768)
    assert (dst == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert dec[i, :len(c)].tobytes() == c
    cb = ChunkBatch.from_chunks(comp)
    xo, xs, xst = map(np.asarray,
                      fdeflate.decompress_batch(cb.data, cb.sizes, 32768))
    assert (xst == Status.SUCCESS).all()


def test_encode_entropy_only_zlib_inflates():
    chunks = [synth.mixed_corpus(32768, seed=7).tobytes(), b"\xaa" * 8192]
    out, osz, stat = _encode_dyn(chunks, entropy_only=True)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert zlib.decompress(out[i, :osz[i]].tobytes(), -15) == c, i
