"""Pallas rANS decoder vs the XLA decode path and the own-encoder round trip.

Interpreter mode on CPU (hermetic); the same kernel compiles for real on the
TPU backend (exercised by ``bench.py --codec ans``).
"""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import ans as fans
from tpucomp.ops.pallas import ans_decode
from tpucomp.utils import synth


def _compress(chunks: list[bytes], out_cap_src: int):
    cb = ChunkBatch.from_chunks(chunks)
    cap = fans.max_compressed_chunk_size(max(out_cap_src, cb.max_chunk_bytes))
    cout, csz, cstat = fans.compress_batch(cb.data, cb.sizes,
                                           fans.DEFAULT_OPTS, cap)
    assert (np.asarray(cstat) == 0).all()
    return cout, csz


def _decode(cout, csz, out_cap: int):
    out, osz, stat = ans_decode.decompress_batch(cout, csz, out_cap,
                                                 interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


def test_own_encoder_round_trip():
    rng = np.random.default_rng(5)
    raws = [
        b"the quick brown fox jumps over the lazy dog " * 60,
        bytes(rng.integers(0, 4, 4000, dtype=np.uint8)),    # low entropy
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),  # incompressible
        b"\x00" * 2500,                                     # single symbol
        b"a",
        b"",
    ]
    cout, csz = _compress(raws, 4096)
    out, osz, stat = _decode(cout, csz, 4096)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == len(r), (i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, i


def test_matches_xla_path():
    buf = synth.mixed_corpus(40_000, seed=13).tobytes()
    chunks = [buf[i:i + 8192] for i in range(0, len(buf), 8192)]
    cout, csz = _compress(chunks, 8192)
    p_out, p_sz, p_st = _decode(cout, csz, 8192)
    x_out, x_sz, x_st = map(np.asarray, fans.decompress_batch(cout, csz, 8192))
    assert (p_st == x_st).all()
    assert (p_sz == x_sz).all()
    assert (p_out == x_out).all()


def test_corrupt_inputs_error_not_crash():
    rng = np.random.default_rng(9)
    raws = [b"payload " * 512]
    cout, csz = _compress(raws, 4096)
    cout = np.asarray(cout).copy()
    good = cout[0].copy()
    bad_magic = good.copy(); bad_magic[0] ^= 0xFF
    bad_freq = good.copy(); bad_freq[12] ^= 0x55      # breaks sum==4096
    # a flipped stream word may decode to WRONG BYTES with SUCCESS — entropy
    # codecs carry no internal checksum (detection is the HLIF CRC's job, as
    # in the reference); the contract here is only no-crash + XLA agreement
    bad_stream = good.copy(); bad_stream[fans.HEADER_BYTES + 7] ^= 0xA1
    garbage = np.zeros_like(good)
    garbage[:256] = rng.integers(0, 256, 256, dtype=np.uint8)
    batch = np.stack([good, bad_magic, bad_freq, bad_stream, garbage])
    sizes = np.full((5,), int(np.asarray(csz)[0]), np.int32)
    out, osz, stat = _decode(batch, sizes, 4096)
    assert stat[0] == Status.SUCCESS
    for i in (1, 2, 4):  # header corruptions must be detected
        assert stat[i] == Status.ERROR_CANNOT_DECOMPRESS, (i, stat[i])
        assert osz[i] == 0
        assert (out[i] == 0).all()
    x_out, x_sz, x_st = map(np.asarray,
                            fans.decompress_batch(batch, sizes, 4096))
    assert (np.asarray(stat) == x_st).all()
    assert (np.asarray(osz) == x_sz).all()
    assert (np.asarray(out) == x_out).all()


def test_truncated_stream_rejected():
    raws = [b"abcd" * 700]
    cout, csz = _compress(raws, 4096)
    short = np.asarray(csz) - 40
    out, osz, stat = _decode(cout, short, 4096)
    assert stat[0] == Status.ERROR_CANNOT_DECOMPRESS
    assert osz[0] == 0
