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


# ---------------------------------------------------------------- encoder ---

def test_encode_byte_identical_to_xla_and_round_trips():
    """The Pallas state walk + shared serializer must emit the exact XLA
    container; decoded by both the XLA and Pallas decoders."""
    from tpucomp.ops.pallas import ans_encode

    rng = np.random.default_rng(31)
    raws = [
        synth.mixed_corpus(20_000, seed=4).tobytes(),
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),
        b"\x00" * 3000,          # single-symbol: f == PROB_SCALE, never emits
        b"x",
        b"",
    ]
    cb = ChunkBatch.from_chunks(raws)
    cap = fans.max_compressed_chunk_size(cb.max_chunk_bytes, fans.DEFAULT_OPTS)
    po, ps, pst = map(np.asarray, ans_encode.compress_batch(
        cb.data, cb.sizes, cap, interpret=True))
    xo, xs, xst = map(np.asarray, fans.compress_batch(
        cb.data, cb.sizes, fans.DEFAULT_OPTS, cap))
    assert (pst == xst).all()
    assert (ps == xs).all()
    assert (po == xo).all()
    dec, dsz, dst = map(np.asarray, ans_decode.decompress_batch(
        po, ps, cb.max_chunk_bytes, interpret=True))
    for i, r in enumerate(raws):
        assert dst[i] == Status.SUCCESS, (i, dst[i])
        assert dec[i, :len(r)].tobytes() == r, i


def test_encode_via_batched_backend_param():
    import tpucomp.batched as batched
    buf = synth.mixed_corpus(16_000, seed=3).tobytes()
    cb = ChunkBatch.from_bytes(buf, chunk_size=4096)
    comp, stat = batched.compress("ans", cb, backend="pallas")
    assert (np.asarray(stat) == Status.SUCCESS).all()
    dec, dstat = batched.decompress("ans", comp, 4096, backend="xla")
    assert (np.asarray(dstat) == Status.SUCCESS).all()
    assert np.asarray(dec.data).reshape(-1)[:len(buf)].tobytes() == buf


def test_wide_kernel_round_trip_odd_batch_and_corrupt():
    """Round-5 wide kernel (G chunks per grid step): bit-exact on an odd
    batch size (forces dummy-chunk padding), zero-size chunks, and isolated
    per-chunk failure on corruption."""
    import jax
    import jax.numpy as jnp
    buf = synth.mixed_corpus(3 * 65536 + 1000, seed=11).tobytes()
    raws = [buf[:65536], b"", buf[65536:131072], buf[131072:], b"\x00" * 37]
    cb = ChunkBatch.from_chunks(raws)
    cap = fans.max_compressed_chunk_size(cb.max_chunk_bytes)
    co, cs, st = jax.jit(lambda d, s: fans.compress_batch(
        d, s, fans.DEFAULT_OPTS, cap))(cb.data, cb.sizes)
    co, cs = np.asarray(co), np.asarray(cs)
    assert (np.asarray(st) == Status.SUCCESS).all()
    dec, dsz, dst = map(np.asarray, ans_decode.decompress_batch_wide(
        jnp.asarray(co), jnp.asarray(cs), cb.max_chunk_bytes,
        interpret=True))
    assert (dst == Status.SUCCESS).all()
    assert (dsz == np.asarray(cb.sizes)).all()
    assert (dec == np.asarray(cb.data)).all()
    bad = co.copy()
    bad[2, 600:640] ^= 0xFF
    _, bsz, bst = map(np.asarray, ans_decode.decompress_batch_wide(
        jnp.asarray(bad), jnp.asarray(cs), cb.max_chunk_bytes,
        interpret=True))
    assert bst[2] == Status.ERROR_CANNOT_DECOMPRESS and bsz[2] == 0
    keep = [0, 1, 3, 4]
    assert (bst[keep] == Status.SUCCESS).all()


def test_wide_encoder_byte_identical():
    """compress_batch_wide emits byte-identical frames to the single-chunk
    kernel and the XLA scan encoder (odd batch -> dummy-chunk padding)."""
    import jax
    from tpucomp.ops.pallas import ans_encode
    buf = synth.mixed_corpus(3 * 8192 + 500, seed=13).tobytes()
    raws = [buf[o:o + 8192] for o in range(0, len(buf), 8192)] + [b"", b"x"]
    cb = ChunkBatch.from_chunks(raws)
    cap = fans.max_compressed_chunk_size(cb.max_chunk_bytes)
    ow, osw, stw = map(np.asarray, ans_encode.compress_batch_wide(
        cb.data, cb.sizes, cap, interpret=True))
    assert (stw == Status.SUCCESS).all()
    ox, osx, stx = map(np.asarray, jax.jit(
        lambda d, s: fans.compress_batch(d, s, fans.DEFAULT_OPTS, cap))(
        cb.data, cb.sizes))
    assert (osw == osx).all()
    assert (ow == ox).all()
