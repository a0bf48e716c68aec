"""Pallas GDeflate tile decoder vs the pure-Python reference codec and the
XLA path.  Interpreter mode on CPU (hermetic); the same kernel compiles for
real on the TPU backend (``bench.py --codec gdeflate --backend pallas``)."""
import numpy as np
import pytest

import gdeflate_pyref as pyref
from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import gdeflate as fgdef
from tpucomp.ops.pallas import gdeflate_decode
from tpucomp.utils import synth


def _decode(tiles: list[bytes], out_cap: int):
    cb = ChunkBatch.from_chunks(tiles)
    out, osz, stat = gdeflate_decode.decompress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


def _raws():
    rng = np.random.default_rng(7)
    return [
        b"hello gdeflate, hello gdeflate, hello gdeflate! " * 30,
        bytes(rng.integers(0, 4, 3000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # incompressible
        b"\x00" * 3000,                                    # dist-1 RLE
        b"ab" * 1200,
        b"x",
        b"",
    ]


@pytest.mark.parametrize("btype", [1, 2])
def test_pyref_tiles_bit_exact(btype):
    raws = _raws()
    tiles = [pyref.compress(r, btype=btype) for r in raws]
    out, osz, stat = _decode(tiles, 4096)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == len(r), (i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, i


def test_own_encoder_all_algos_round_trip():
    buf = synth.mixed_corpus(24_000, seed=5).tobytes()
    cb = ChunkBatch.from_bytes(buf, chunk_size=4096)
    for algo in (0, 1, 2):
        opts = fgdef.GdeflateOpts(algo=algo)
        cout, csz, cstat = fgdef.compress_batch(
            cb.data, cb.sizes, opts,
            fgdef.max_compressed_chunk_size(cb.max_chunk_bytes, opts))
        assert (np.asarray(cstat) == 0).all()
        cout, csz = np.asarray(cout), np.asarray(csz)
        tiles = [cout[i, :csz[i]].tobytes() for i in range(cb.num_chunks)]
        out, osz, stat = _decode(tiles, 4096)
        for i in range(cb.num_chunks):
            assert stat[i] == Status.SUCCESS, (algo, i, stat[i])
        assert out.reshape(-1)[:len(buf)].tobytes() == buf, algo


def test_long_distance_64k_window():
    """Distance codes 30/31 (bases 32769/49153) reach the 64 KiB page."""
    rng = np.random.default_rng(3)
    seg = bytes(rng.integers(0, 256, 40_000, dtype=np.uint8))
    raw = seg + b"\x00" * 12_000 + seg[:12_000]  # far back-reference material
    tile = pyref.compress(raw, btype=2)
    out, osz, stat = _decode([tile], 65536)
    assert stat[0] == Status.SUCCESS
    assert osz[0] == len(raw)
    assert out[0, :len(raw)].tobytes() == raw


def test_matches_xla_path_on_valid_tiles():
    rng = np.random.default_rng(3)
    raws = [bytes(rng.integers(0, k, 2000, dtype=np.uint8)) for k in (2, 8, 256)]
    tiles = [pyref.compress(r, btype=2) for r in raws]
    cb = ChunkBatch.from_chunks(tiles)
    p = list(map(np.asarray, gdeflate_decode.decompress_batch(
        cb.data, cb.sizes, 2048, interpret=True)))
    x = list(map(np.asarray, fgdef.decompress_batch(cb.data, cb.sizes, 2048)))
    assert (p[2] == x[2]).all(), (p[2], x[2])
    assert (p[1] == x[1]).all()
    assert (p[0] == x[0]).all()


def test_corrupt_inputs_error_not_crash():
    rng = np.random.default_rng(9)
    good = pyref.compress(b"corrupt me " * 50, btype=2)
    truncated = good[:24]
    bad_ntok = bytearray(good)
    bad_ntok[2:6] = (1 << 24).to_bytes(4, "little")  # n_tokens way beyond raw
    bad = [
        b"\x03" + b"\x00" * 16,             # btype=3
        truncated,
        bytes(bad_ntok),
        bytes(rng.integers(0, 256, 96, dtype=np.uint8)),
        b"",
    ]
    out, osz, stat = _decode(bad, 4096)
    for i in range(len(bad)):
        if stat[i] != Status.SUCCESS:
            assert osz[i] == 0
    assert stat[0] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[1] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[2] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[4] == Status.ERROR_CANNOT_DECOMPRESS


def test_output_buffer_too_small():
    tile = pyref.compress(b"tpucomp " * 600, btype=1)
    out, osz, stat = _decode([tile], 1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


def test_stored_tiles():
    rng = np.random.default_rng(5)
    raw = bytes(rng.integers(0, 256, 1500, dtype=np.uint8))
    tile = pyref.compress(raw, btype=0)
    out, osz, stat = _decode([tile], 2048)
    assert stat[0] == Status.SUCCESS
    assert osz[0] == len(raw)
    assert out[0, :len(raw)].tobytes() == raw


# ------------------------------------------------------ vectorized decoder ---

from tpucomp.ops.pallas import gdeflate_vdecode


def _vdecode(tiles: list[bytes], out_cap: int):
    cb = ChunkBatch.from_chunks(tiles)
    out, osz, stat = gdeflate_vdecode.decompress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


@pytest.mark.parametrize("btype", [0, 1, 2])
def test_vdecode_pyref_tiles_bit_exact(btype):
    raws = _raws()
    tiles = [pyref.compress(r, btype=btype) for r in raws]
    out, osz, stat = _vdecode(tiles, 4096)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (btype, i, stat[i])
        assert osz[i] == len(r), (btype, i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, (btype, i)


def test_vdecode_own_encoder_all_algos():
    buf = synth.mixed_corpus(24_000, seed=5).tobytes()
    cb = ChunkBatch.from_bytes(buf, chunk_size=4096)
    for algo in (0, 1, 2):
        opts = fgdef.GdeflateOpts(algo=algo)
        cout, csz, cstat = fgdef.compress_batch(
            cb.data, cb.sizes, opts,
            fgdef.max_compressed_chunk_size(cb.max_chunk_bytes, opts))
        assert (np.asarray(cstat) == 0).all()
        cout, csz = np.asarray(cout), np.asarray(csz)
        tiles = [cout[i, :csz[i]].tobytes() for i in range(cb.num_chunks)]
        out, osz, stat = _vdecode(tiles, 4096)
        assert (stat == Status.SUCCESS).all(), (algo, stat)
        assert out.reshape(-1)[:len(buf)].tobytes() == buf, algo


def test_vdecode_matches_serial_and_xla_statuses():
    rng = np.random.default_rng(9)
    good = pyref.compress(b"corrupt me " * 50, btype=2)
    bad_ntok = bytearray(good)
    bad_ntok[2:6] = (1 << 24).to_bytes(4, "little")
    tiles = [
        good,
        b"\x03" + b"\x00" * 16,          # btype=3
        good[:24],                        # truncated
        bytes(bad_ntok),
        bytes(rng.integers(0, 256, 96, dtype=np.uint8)),
        b"",
    ]
    cb = ChunkBatch.from_chunks(tiles)
    v = list(map(np.asarray, gdeflate_vdecode.decompress_batch(
        cb.data, cb.sizes, 2048, interpret=True)))
    x = list(map(np.asarray, fgdef.decompress_batch(cb.data, cb.sizes, 2048)))
    assert (v[2] == x[2]).all(), (v[2], x[2])
    assert (v[1] == x[1]).all()
    assert (v[0] == x[0]).all()


def test_vdecode_output_buffer_too_small():
    tile = pyref.compress(b"tpucomp " * 600, btype=1)
    out, osz, stat = _vdecode([tile], 1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


def test_vdecode_long_distance_64k_window():
    rng = np.random.default_rng(3)
    seg = bytes(rng.integers(0, 256, 40_000, dtype=np.uint8))
    raw = seg + b"\x00" * 12_000 + seg[:12_000]
    tile = pyref.compress(raw, btype=2)
    out, osz, stat = _vdecode([tile], 65536)
    assert stat[0] == Status.SUCCESS
    assert out[0, :len(raw)].tobytes() == raw


# ---------------------------------------------------------------------------
# algo-0 encoder (gdeflate_encode — the TPU compress path)
# ---------------------------------------------------------------------------

def _encode(chunks, out_cap=None):
    from tpucomp.ops.pallas import gdeflate_encode
    cb = ChunkBatch.from_chunks(chunks)
    cap = out_cap or fgdef.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = gdeflate_encode.compress_batch(
        cb.data, cb.sizes, cap, interpret=True)
    return map(np.asarray, (out, osz, stat))


def test_encode_pyref_oracle_bit_exact():
    rng = np.random.default_rng(17)
    chunks = [
        synth.mixed_corpus(65536, seed=1).tobytes(),
        synth.mortgage_like(65536, seed=2).tobytes(),
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),  # stored fallback
        b"\x00" * 65536,                                     # max-len matches
        b"abcabcabcabcabcabcabcabcabcabcabcabc",
        b"q",
        b"",
    ]
    out, osz, stat = _encode(chunks)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert pyref.decompress(out[i, :osz[i]].tobytes()) == c, i


def test_encode_decodes_on_all_three_decoders():
    buf = synth.mixed_corpus(1 << 17, seed=23).tobytes()
    chunks = [buf[o:o + 32768] for o in range(0, len(buf), 32768)]
    out, osz, stat = _encode(chunks)
    assert (stat == Status.SUCCESS).all()
    tiles = [out[i, :osz[i]].tobytes() for i in range(len(chunks))]
    # serial Pallas decoder
    dec, dsz, dst = _decode(tiles, 32768)
    assert (dst == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert dec[i, :len(c)].tobytes() == c
    # vectorized Pallas decoder
    cb = ChunkBatch.from_chunks(tiles)
    vo, vs, vst = map(np.asarray, gdeflate_vdecode.decompress_batch(
        cb.data, cb.sizes, 32768, interpret=True))
    assert (vst == Status.SUCCESS).all()
    # XLA codec
    xo, xs, xst = map(np.asarray,
                      fgdef.decompress_batch(cb.data, cb.sizes, 32768))
    assert (xst == Status.SUCCESS).all()


def test_encode_stored_fallback_and_tiny():
    rng = np.random.default_rng(0)
    raw = bytes(rng.integers(0, 256, 16384, dtype=np.uint8))
    out, osz, stat = _encode([raw, b"abc"])
    assert (stat == Status.SUCCESS).all()
    assert osz[0] == 12 + 16384                     # stored: HDR + raw
    assert pyref.decompress(out[0, :osz[0]].tobytes()) == raw
    assert pyref.decompress(out[1, :osz[1]].tobytes()) == b"abc"


def test_encode_output_buffer_too_small():
    rng = np.random.default_rng(1)
    raw = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    out, osz, stat = _encode([raw], out_cap=1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


# ---------------------------------------------------------------------------
# dynamic-table rungs (algo 1/2): hist walk -> vectorized table build ->
# emit walk, btype-2 tiles (benchmark_gdeflate_chunked.cu:42,55-58)
# ---------------------------------------------------------------------------

def _encode_dyn(chunks, entropy_only=False):
    from tpucomp.ops.pallas import gdeflate_encode
    cb = ChunkBatch.from_chunks(chunks)
    cap = fgdef.max_compressed_chunk_size(cb.max_chunk_bytes,
                                          fgdef.DEFAULT_OPTS)
    out, osz, stat = gdeflate_encode.compress_batch_dyn(
        cb.data, cb.sizes, cap, interpret=True, entropy_only=entropy_only)
    return map(np.asarray, (out, osz, stat))


def test_encode_dyn_all_decoders_bit_exact():
    rng = np.random.default_rng(31)
    chunks = [
        synth.mixed_corpus(32768, seed=14).tobytes(),
        b"\x00" * 16384,
        bytes(rng.integers(0, 256, 16384, dtype=np.uint8)),  # stored rewrite
        b"ab" * 4096,
        b"x",
        b"",
    ]
    out, osz, stat = _encode_dyn(chunks)
    assert (stat == Status.SUCCESS).all()
    comp = [out[i, :osz[i]].tobytes() for i in range(len(chunks))]
    for i, c in enumerate(chunks):
        assert pyref.decompress(comp[i]) == c, i
    cb = ChunkBatch.from_chunks(comp)
    xo, xs, xst = map(np.asarray,
                      fgdef.decompress_batch(cb.data, cb.sizes, 32768))
    assert (xst == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert xo[i, :len(c)].tobytes() == c, i
    po, ps, pst = _decode(comp, 32768)
    assert (pst == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert po[i, :len(c)].tobytes() == c, i


def test_encode_dyn_beats_fixed_ratio():
    chunks = [synth.mixed_corpus(32768, seed=15).tobytes()]
    _, s0, st0 = _encode(chunks)
    _, s1, st1 = _encode_dyn(chunks)
    assert st0[0] == st1[0] == Status.SUCCESS
    assert s1[0] < s0[0]


def test_encode_entropy_only_decodes():
    chunks = [synth.mixed_corpus(16384, seed=16).tobytes(), b"\xcc" * 4096]
    out, osz, stat = _encode_dyn(chunks, entropy_only=True)
    assert (stat == Status.SUCCESS).all()
    for i, c in enumerate(chunks):
        assert pyref.decompress(out[i, :osz[i]].tobytes()) == c, i
