"""Pallas LZ4 decoder vs the liblz4 oracle and the XLA decode path.

Interpreter mode on CPU (hermetic); the same kernel compiles for real on the
TPU backend (exercised by ``bench.py --codec lz4 --pallas``).
"""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import lz4 as flz4
from tpucomp.interop import cpu as interop
from tpucomp.ops.pallas import lz4_decode, lz4_encode
from tpucomp.utils import synth

HAVE_LZ4 = interop.available().get("lz4", False)


def _decode(chunks: list[bytes], out_cap: int):
    cb = ChunkBatch.from_chunks(chunks)
    out, osz, stat = lz4_decode.decompress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


@pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")
def test_foreign_streams_bit_exact():
    rng = np.random.default_rng(7)
    raws = [
        b"hello world, hello world, hello world!" * 40,
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),   # low entropy
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # incompressible
        b"\x00" * 3000,                                    # RLE (offset 1)
        b"ab" * 1500,                                      # offset 2
        b"abcdefg" * 400,                                  # offset 7 (< BLK)
        (b"0123456789abcdef" * 20)[:300] * 12,             # offset 300 (> BLK)
        b"x",
        b"",
    ]
    comp = [interop.lz4_compress(r) for r in raws]
    out_cap = 8192
    out, osz, stat = _decode(comp, out_cap)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == len(r), (i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, i


@pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")
def test_hc_streams_and_mixed_corpus():
    buf = synth.mixed_corpus(60_000, seed=11).tobytes()
    chunks = [buf[i:i + 8192] for i in range(0, len(buf), 8192)]
    comp = [interop.lz4_compress(c, hc_level=9) for c in chunks]
    out, osz, stat = _decode(comp, 8192)
    for i, c in enumerate(chunks):
        assert stat[i] == Status.SUCCESS
        assert out[i, :len(c)].tobytes() == c


def test_own_encoder_round_trip():
    buf = synth.mixed_corpus(30_000, seed=5).tobytes()
    cb = ChunkBatch.from_bytes(buf, chunk_size=4096)
    cout, csz, cstat = flz4.compress_batch(
        cb.data, cb.sizes, flz4.DEFAULT_OPTS,
        flz4.max_compressed_chunk_size(cb.max_chunk_bytes))
    assert (np.asarray(cstat) == 0).all()
    out, osz, stat = lz4_decode.decompress_batch(cout, csz, 4096, interpret=True)
    out, osz, stat = map(np.asarray, (out, osz, stat))
    sizes = np.asarray(cb.sizes)
    for i in range(cb.num_chunks):
        assert stat[i] == Status.SUCCESS
        assert osz[i] == sizes[i]
    assert np.asarray(out).reshape(-1)[:len(buf)].tobytes() == buf


def test_matches_xla_path_on_random_tokens():
    """Pallas and XLA decoders agree (output, size, status) on valid streams."""
    rng = np.random.default_rng(3)
    raws = [bytes(rng.integers(0, k, 2000, dtype=np.uint8)) for k in (2, 8, 256)]
    if HAVE_LZ4:
        comp = [interop.lz4_compress(r) for r in raws]
    else:
        cb = ChunkBatch.from_chunks(raws)
        co, cs, _ = flz4.compress_batch(cb.data, cb.sizes, flz4.DEFAULT_OPTS,
                                        flz4.max_compressed_chunk_size(2048))
        co, cs = np.asarray(co), np.asarray(cs)
        comp = [co[i, :cs[i]].tobytes() for i in range(len(raws))]
    cb = ChunkBatch.from_chunks(comp)
    p_out, p_sz, p_st = map(np.asarray, lz4_decode.decompress_batch(
        cb.data, cb.sizes, 2048, interpret=True))
    x_out, x_sz, x_st = map(np.asarray, flz4.decompress_batch(
        cb.data, cb.sizes, 2048))
    assert (p_st == x_st).all()
    assert (p_sz == x_sz).all()
    assert (p_out == x_out).all()


def test_corrupt_inputs_error_not_crash():
    rng = np.random.default_rng(9)
    bad = [
        b"\xff" * 64,                       # runaway literal length
        b"\x10",                            # literal without data
        b"\x04abcd\x00\x00",                # offset 0
        b"\x04abcd\xff\xff\x04abcd",        # offset beyond output
        bytes(rng.integers(0, 256, 128, dtype=np.uint8)),
    ]
    out, osz, stat = _decode(bad, 4096)
    for i in range(len(bad)):
        if stat[i] != Status.SUCCESS:
            assert osz[i] == 0
    # runaway-literal and offset-0 streams must fail
    assert stat[0] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[2] == Status.ERROR_CANNOT_DECOMPRESS


@pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")
def test_output_buffer_too_small():
    raw = b"tpucomp " * 600
    comp = interop.lz4_compress(raw)
    out, osz, stat = _decode([comp], 1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


# ---------------------------------------------------------------- encoder ---

def _encode(chunks: list[bytes], out_cap: int | None = None):
    cb = ChunkBatch.from_chunks(chunks)
    if out_cap is None:
        out_cap = flz4.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = lz4_encode.compress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


@pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")
def test_encode_liblz4_bit_exact_round_trip():
    rng = np.random.default_rng(21)
    raws = [
        b"hello world, hello world, hello world!" * 40,
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),   # low entropy
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # incompressible
        b"\x00" * 3000,                                    # RLE (offset 1)
        b"ab" * 1500,                                      # offset 2
        (b"0123456789abcdef" * 20)[:300] * 12,             # long offset
        b"short",                                          # < MF_LIMIT: literal-only
        b"x",
        b"",
    ]
    out, osz, stat = _encode(raws)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        dec = interop.lz4_decompress(out[i, :osz[i]].tobytes(), len(r))
        assert dec == r, i


@pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")
def test_encode_mixed_corpus_ratio():
    buf = synth.mixed_corpus(60_000, seed=11).tobytes()
    chunks = [buf[i:i + 8192] for i in range(0, len(buf), 8192)]
    out, osz, stat = _encode(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert interop.lz4_decompress(out[i, :osz[i]].tobytes(), len(c)) == c
    # hash-table fast scan should land in liblz4-fast's ratio neighborhood
    ref = sum(len(interop.lz4_compress(c)) for c in chunks)
    assert osz.sum() <= ref * 1.10, (int(osz.sum()), ref)


def test_encode_decode_pallas_round_trip():
    """Pallas encoder output decoded by the Pallas decoder."""
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
    raw = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))  # incompressible
    out, osz, stat = _encode([raw], out_cap=1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


def test_encode_via_batched_backend_param():
    import tpucomp.batched as batched
    buf = synth.mixed_corpus(16_000, seed=3).tobytes()
    cb = ChunkBatch.from_bytes(buf, chunk_size=4096)
    comp, stat = batched.compress("lz4", cb, backend="pallas")
    assert (np.asarray(stat) == Status.SUCCESS).all()
    dec, dstat = batched.decompress("lz4", comp, 4096, backend="xla")
    assert (np.asarray(dstat) == Status.SUCCESS).all()
    assert np.asarray(dec.data).reshape(-1)[:len(buf)].tobytes() == buf


@pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")
def test_headline_corpus_long_matches():
    """mortgage_like (ratio ~39) routes through the medium decode path:
    ml0==15 with one or TWO extension bytes (~360-byte matches)."""
    buf = synth.mortgage_like(96_000, seed=42).tobytes()
    chunks = [buf[i:i + 16384] for i in range(0, len(buf), 16384)]
    comp = [interop.lz4_compress(c) for c in chunks]
    out, osz, stat = _decode(comp, 16384)
    for i, c in enumerate(chunks):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == len(c)
        assert out[i, :len(c)].tobytes() == c, i


# ------------------------------------------------ interleaved-pair decoder ---

def test_pair_decoder_matches_single_everywhere():
    """lz4_decode2 (two-chunk interleaved walks) must agree with lz4_decode
    bit-for-bit on valid, corrupt, odd-batch, and headline-corpus inputs."""
    from tpucomp.ops.pallas import lz4_decode2

    rng = np.random.default_rng(77)
    raws = [
        synth.mortgage_like(16000, seed=1).tobytes()[:8192],
        synth.mixed_corpus(8192, seed=2).tobytes(),
        b"\x00" * 5000,
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),
        b"x",
        b"",
        bytes(rng.integers(0, 4, 3000, dtype=np.uint8)),   # odd count: 7
    ]
    if HAVE_LZ4:
        comp = [interop.lz4_compress(r) for r in raws]
    else:
        cb0 = ChunkBatch.from_chunks(raws)
        co, cs, _ = flz4.compress_batch(
            cb0.data, cb0.sizes, flz4.DEFAULT_OPTS,
            flz4.max_compressed_chunk_size(cb0.max_chunk_bytes))
        co, cs = np.asarray(co), np.asarray(cs)
        comp = [co[i, :cs[i]].tobytes() for i in range(len(raws))]
    comp += [b"\xff" * 64, b"\x04abcd\x00\x00"]  # corrupt
    cb = ChunkBatch.from_chunks(comp)
    a = list(map(np.asarray, lz4_decode.decompress_batch(
        cb.data, cb.sizes, 8192, interpret=True)))
    b = list(map(np.asarray, lz4_decode2.decompress_batch(
        cb.data, cb.sizes, 8192, interpret=True)))
    assert (a[2] == b[2]).all(), (a[2], b[2])
    assert (a[1] == b[1]).all()
    assert (a[0] == b[0]).all()


# ---------------------------------------------------------------------------
# sort-matched encoder v2 (lz4_encode2 — the product encode path)
# ---------------------------------------------------------------------------

def _encode2(chunks, out_cap=None):
    from tpucomp.ops.pallas import lz4_encode2
    cb = ChunkBatch.from_chunks(chunks)
    cap = out_cap or (cb.max_chunk_bytes + cb.max_chunk_bytes // 255 + 16)
    out, osz, stat = lz4_encode2.compress_batch(
        cb.data, cb.sizes, cap, interpret=True)
    return map(np.asarray, (out, osz, stat))


@pytest.mark.skipif(not interop.available().get("lz4"), reason="no liblz4")
def test_encode2_liblz4_bit_exact():
    rng = np.random.default_rng(7)
    chunks = [
        synth.mixed_corpus(65536, seed=1).tobytes(),
        synth.mortgage_like(65536, seed=2).tobytes(),
        b"\x00" * 65536,                                   # long self-match
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),  # incompressible
        b"abcabcab",                                       # tiny, matchable
        b"Z" * 13,                                         # boundary at MF_LIMIT+1
        b"hi",                                             # all-literal tiny
    ]
    out, osz, stat = _encode2(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        got = interop.lz4_decompress(out[i, :osz[i]].tobytes(), len(c))
        assert got == c, f"chunk {i}"


@pytest.mark.skipif(not interop.available().get("lz4"), reason="no liblz4")
def test_encode2_heterogeneous_batch_and_ratio():
    buf = synth.mixed_corpus(1 << 18, seed=9).tobytes()
    chunks = [buf[:65536], buf[65536:65536 + 5000], buf[70536:70536 + 64],
              buf[70600:70600 + 65536]]
    out, osz, stat = _encode2(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert interop.lz4_decompress(out[i, :osz[i]].tobytes(), len(c)) == c
    # v2's nearest-exact-match parse must not lose to the v1 hash table
    # (nearest is not always the longest candidate, so allow sub-percent
    # per-batch noise; corpus-level v2 wins: 2.62 vs 2.48 on mixed 8 MiB)
    cb = ChunkBatch.from_chunks(chunks)
    cap = cb.max_chunk_bytes + cb.max_chunk_bytes // 255 + 16
    v1, v1sz, _ = map(np.asarray, lz4_encode.compress_batch(
        cb.data, cb.sizes, cap, interpret=True))
    assert osz.sum() <= v1sz.sum() * 1.01


def test_encode2_decodes_on_pallas_and_xla_paths():
    buf = synth.mixed_corpus(100_000, seed=4).tobytes()
    chunks = [buf[o:o + 32768] for o in range(0, len(buf), 32768)]
    out, osz, stat = _encode2(chunks)
    assert (stat == Status.SUCCESS).all()
    dec, dsz, dst = _decode([out[i, :osz[i]].tobytes()
                             for i in range(len(chunks))], 32768)
    assert (np.asarray(dst) == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert dec[i, :len(c)].tobytes() == c
    from tpucomp.formats import lz4 as flz4
    cb = ChunkBatch.from_chunks([out[i, :osz[i]].tobytes()
                                 for i in range(len(chunks))])
    xo, xs, xst = map(np.asarray, flz4.decompress_batch(
        cb.data, cb.sizes, 32768))
    assert (xst == Status.SUCCESS).all()


def test_encode2_output_buffer_too_small():
    chunks = [bytes(np.random.default_rng(0).integers(
        0, 256, 4096, dtype=np.uint8))]
    out, osz, stat = _encode2(chunks, out_cap=128)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


def test_encode2_zero_byte_chunk():
    out, osz, stat = _encode2([b"", b"abcdabcdabcdabcd"])
    assert (stat == Status.SUCCESS).all()
    assert interop.lz4_decompress(out[1, :osz[1]].tobytes(), 16) \
        == b"abcdabcdabcdabcd"


def test_kway_decoder_matches_single():
    from tpucomp.ops.pallas import lz4_decodek
    buf = synth.mixed_corpus(200_000, seed=15).tobytes()
    chunks = [buf[o:o + 32768] for o in range(0, len(buf), 32768)]  # 7 (odd)
    comp = [interop.lz4_compress(c) for c in chunks]
    ccb = ChunkBatch.from_chunks(comp)
    for k in (2, 4):
        o, sz, st = map(np.asarray, lz4_decodek.decompress_batch(
            ccb.data, ccb.sizes, 32768, interpret=True, k=k))
        assert (st == Status.SUCCESS).all()
        for i, c in enumerate(chunks):
            assert o[i, :len(c)].tobytes() == c, (k, i)
    # corrupt chunk: per-chunk status, neighbors unaffected
    bad = list(comp)
    bad[3] = bad[3][:10]
    bcb = ChunkBatch.from_chunks(bad)
    o, sz, st = map(np.asarray, lz4_decodek.decompress_batch(
        bcb.data, bcb.sizes, 32768, interpret=True, k=4))
    assert st[3] == Status.ERROR_CANNOT_DECOMPRESS and sz[3] == 0
    good = [i for i in range(len(chunks)) if i != 3]
    assert (st[good] == Status.SUCCESS).all()
