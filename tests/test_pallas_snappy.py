"""Pallas Snappy decoder vs the libsnappy oracle and the XLA decode path."""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import snappy as fsnappy
from tpucomp.interop import cpu as interop
from tpucomp.ops.pallas import snappy_decode
from tpucomp.utils import synth

HAVE = interop.available().get("snappy", False)


def _decode(chunks, out_cap):
    cb = ChunkBatch.from_chunks(chunks)
    out, osz, stat = snappy_decode.decompress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


@pytest.mark.skipif(not HAVE, reason="libsnappy missing")
def test_foreign_streams_bit_exact():
    rng = np.random.default_rng(7)
    raws = [
        b"hello snappy, hello snappy, hello snappy! " * 40,
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),
        b"\x00" * 3000,                 # offset-1 pattern copies
        b"abcdefg" * 400,               # short-period overlap
        (b"0123456789abcdef" * 20)[:300] * 12,
        b"x",
        b"",
    ]
    comp = [interop.snappy_compress(r) for r in raws]
    out, osz, stat = _decode(comp, 8192)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == len(r), (i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, i


def test_matches_xla_path():
    buf = synth.mixed_corpus(50_000, seed=11).tobytes()
    chunks = [buf[i:i + 8192] for i in range(0, len(buf), 8192)]
    co, cs, cst = fsnappy.compress_batch(
        ChunkBatch.from_chunks(chunks).data,
        ChunkBatch.from_chunks(chunks).sizes, fsnappy.DEFAULT_OPTS,
        fsnappy.max_compressed_chunk_size(8192))
    assert (np.asarray(cst) == 0).all()
    p_out, p_sz, p_st = map(np.asarray, snappy_decode.decompress_batch(
        co, cs, 8192, interpret=True))
    x_out, x_sz, x_st = map(np.asarray, fsnappy.decompress_batch(co, cs, 8192))
    assert (p_st == x_st).all()
    assert (p_sz == x_sz).all()
    assert (p_out == x_out).all()


def test_conformance_constructs():
    """Legal streams our compressor never emits (copy-1, copy-4, long
    literal lengths) — the reference's Snappy conformance requirement
    (CHANGELOG.md:182-184)."""
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    streams = [
        # copy-1 with 4-byte min length
        (b"abcd" + b"abcd" * 4,
         varint(20) + b"\x10abcd" + bytes([(4 - 4) << 2 | 1 | (0 << 5), 4]) * 0
         + bytes([((16 - 4) << 2) | 1, 4])),
        # copy-4 (32-bit offset)
        (b"Z" * 70,
         varint(70) + b"\x00Z" + bytes([(63 << 2) | 3, 1, 0, 0, 0])
         + bytes([(4 << 2) | 3, 1, 0, 0, 0])),
        # 2-byte literal length (61)
        (bytes(range(100)) * 3,
         varint(300) + bytes([61 << 2, 300 - 1 & 0xFF, (300 - 1) >> 8])
         + (bytes(range(100)) * 3)),
    ]
    comp = [s for _, s in streams]
    raws = [r for r, _ in streams]
    out, osz, stat = _decode(comp, 512)
    x_out, x_sz, x_st = map(np.asarray, fsnappy.decompress_batch(
        ChunkBatch.from_chunks(comp).data,
        ChunkBatch.from_chunks(comp).sizes, 512))
    assert (stat == x_st).all()
    for i, r in enumerate(raws):
        if x_st[i] == Status.SUCCESS:
            assert stat[i] == Status.SUCCESS
            assert out[i, :len(r)].tobytes() == r, i


def test_corrupt_inputs_error_not_crash():
    rng = np.random.default_rng(9)
    bad = [
        b"\xff\xff\xff\xff\xff\x01",        # runaway varint
        b"\x05\x01\x00\x00",                # copy with offset 0
        b"\x0a\xfcabc",                     # truncated literal
        bytes(rng.integers(0, 256, 128, dtype=np.uint8)),
    ]
    out, osz, stat = _decode(bad, 4096)
    x_out, x_sz, x_st = map(np.asarray, fsnappy.decompress_batch(
        ChunkBatch.from_chunks(bad).data,
        ChunkBatch.from_chunks(bad).sizes, 4096))
    assert (stat == x_st).all(), (stat, x_st)
    for i in range(len(bad)):
        if stat[i] != Status.SUCCESS:
            assert osz[i] == 0


@pytest.mark.skipif(not HAVE, reason="libsnappy missing")
def test_output_buffer_too_small():
    raw = b"tpucomp " * 600
    comp = interop.snappy_compress(raw)
    out, osz, stat = _decode([comp], 1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


# ---------------------------------------------------------------- encoder ---

def _encode(chunks, out_cap=None):
    from tpucomp.ops.pallas import snappy_encode
    cb = ChunkBatch.from_chunks(chunks)
    if out_cap is None:
        out_cap = fsnappy.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = snappy_encode.compress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


@pytest.mark.skipif(not HAVE, reason="libsnappy missing")
def test_encode_libsnappy_bit_exact_round_trip():
    rng = np.random.default_rng(23)
    raws = [
        b"hello snappy, hello snappy, hello snappy! " * 40,
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # incompressible
        b"\x00" * 3000,                                    # offset-1, long match
        b"ab" * 1500,
        (b"0123456789abcdef" * 20)[:300] * 12,             # long offset
        b"short",
        b"x",
        b"",
    ]
    out, osz, stat = _encode(raws)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert interop.snappy_decompress(out[i, :osz[i]].tobytes()) == r, i


@pytest.mark.skipif(not HAVE, reason="libsnappy missing")
def test_encode_long_literal_runs():
    # literal runs needing 2- and 3-byte length tags (no matches at all)
    rng = np.random.default_rng(29)
    raws = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
            for n in (61, 257, 300, 65_600)]
    out, osz, stat = _encode(raws)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS
        assert interop.snappy_decompress(out[i, :osz[i]].tobytes()) == r, i


@pytest.mark.skipif(not HAVE, reason="libsnappy missing")
def test_encode_mixed_corpus_ratio():
    buf = synth.mixed_corpus(60_000, seed=11).tobytes()
    chunks = [buf[i:i + 8192] for i in range(0, len(buf), 8192)]
    out, osz, stat = _encode(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert interop.snappy_decompress(out[i, :osz[i]].tobytes()) == c
    ref = sum(len(interop.snappy_compress(c)) for c in chunks)
    # copy-1 elements are not emitted (copy-2 only), so allow a small gap
    assert osz.sum() <= ref * 1.12, (int(osz.sum()), ref)


def test_encode_decode_pallas_round_trip():
    from tpucomp.ops.pallas import snappy_encode
    buf = synth.mixed_corpus(24_000, seed=8).tobytes()
    chunks = [buf[i:i + 4096] for i in range(0, len(buf), 4096)]
    cout, csz, cstat = _encode(chunks)
    assert (cstat == Status.SUCCESS).all()
    comp = [cout[i, :csz[i]].tobytes() for i in range(len(chunks))]
    out, osz, stat = _decode(comp, 4096)
    for i, c in enumerate(chunks):
        assert stat[i] == Status.SUCCESS
        assert osz[i] == len(c)
        assert out[i, :len(c)].tobytes() == c


def test_encode_output_buffer_too_small():
    rng = np.random.default_rng(13)
    raw = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    out, osz, stat = _encode([raw], out_cap=1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


# ---------------------------------------------------------------------------
# sort-matched encoder v2 (snappy_encode2 — the product encode path)
# ---------------------------------------------------------------------------

def _encode2(chunks, out_cap=None):
    from tpucomp.ops.pallas import snappy_encode2
    cb = ChunkBatch.from_chunks(chunks)
    cap = out_cap or fsnappy.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = snappy_encode2.compress_batch(
        cb.data, cb.sizes, cap, interpret=True)
    return map(np.asarray, (out, osz, stat))


@pytest.mark.skipif(not interop.available().get("snappy"),
                    reason="no libsnappy")
def test_encode2_libsnappy_bit_exact():
    rng = np.random.default_rng(13)
    chunks = [
        synth.mixed_corpus(65536, seed=1).tobytes(),
        synth.mortgage_like(65536, seed=2).tobytes(),
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),
        b"\x00" * 65536,                     # long-match 64/60 split path
        b"abcabcabcabcabcab",
        b"y",
        b"",
    ]
    out, osz, stat = _encode2(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert interop.snappy_decompress(out[i, :osz[i]].tobytes()) == c, i


def test_encode2_own_decoder_roundtrip_and_ratio():
    buf = synth.mixed_corpus(1 << 17, seed=21).tobytes()
    chunks = [buf[o:o + 32768] for o in range(0, len(buf), 32768)]
    out, osz, stat = _encode2(chunks)
    assert (stat == Status.SUCCESS).all()
    comp = [out[i, :osz[i]].tobytes() for i in range(len(chunks))]
    cb = ChunkBatch.from_chunks(comp)
    dec, dsz, dst = snappy_decode.decompress_batch(
        cb.data, cb.sizes, 32768, interpret=True)
    dec, dst = np.asarray(dec), np.asarray(dst)
    assert (dst == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert dec[i, :len(c)].tobytes() == c
    # corpus-level: v2 must be no worse than v1 + noise margin
    from tpucomp.ops.pallas import snappy_encode
    cbi = ChunkBatch.from_chunks(chunks)
    cap = fsnappy.max_compressed_chunk_size(cbi.max_chunk_bytes)
    _, v1sz, _ = map(np.asarray, snappy_encode.compress_batch(
        cbi.data, cbi.sizes, cap, interpret=True))
    assert osz.sum() <= v1sz.sum() * 1.01


def test_encode2_output_buffer_too_small():
    rng = np.random.default_rng(1)
    raw = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    out, osz, stat = _encode2([raw], out_cap=512)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0
