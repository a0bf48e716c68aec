"""Truncation/bitflip sweeps over every Pallas decoder.

The reference's robustness contract (``CHANGELOG.md:160-164``): corrupt
input must yield a per-chunk error status — never a crash, hang, or
out-of-bounds access.  Each format decodes a batch of systematically
truncated and bit-flipped variants of a valid oracle stream; formats
without integrity checksums may legally decode a flipped stream to
different bytes, so the assertion is status sanity, not failure.
"""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.interop import cpu as interop
from tpucomp.ops import pallas as pk
from tpucomp.utils import synth

RAW = synth.mixed_corpus(2048, seed=33).tobytes()


def _stage(fmt):
    """-> (compressed_bytes, expected_plain_bytes)."""
    avail = interop.available()
    if fmt == "lz4" and avail.get("lz4"):
        return interop.lz4_compress(RAW), RAW
    if fmt == "snappy" and avail.get("snappy"):
        return interop.snappy_compress(RAW), RAW
    if fmt == "deflate":
        return interop.deflate_compress(RAW), RAW
    if fmt == "gzip":
        return interop.gzip_compress(RAW), RAW
    if fmt == "zstd" and avail.get("zstd"):
        return interop.zstd_compress(RAW), RAW
    # self-framed (ans, cascaded, gdeflate): XLA encoder
    import jax
    import tpucomp.batched as batched
    spec = batched._get(fmt)
    raw = RAW
    if fmt == "cascaded":
        # format contract: chunk bytes must be a multiple of the element size
        ts = spec.default_opts.type.nbytes
        raw = RAW[: len(RAW) // ts * ts]
    cb = ChunkBatch.from_chunks([raw])
    cap = spec.max_compressed_chunk_size(2048, spec.default_opts)
    co, cs, st = map(np.asarray, jax.jit(
        lambda d, s: spec.compress_batch(d, s, spec.default_opts, cap))(
        cb.data, cb.sizes))
    assert (st == 0).all()
    return co[0, :cs[0]].tobytes(), raw


@pytest.mark.parametrize("fmt", sorted(pk.PALLAS_DECODERS))
def test_truncation_and_bitflip_sweep(fmt):
    good, want = _stage(fmt)
    rng = np.random.default_rng(len(good))
    variants = [good]
    n = len(good)
    for cut in (1, 2, n // 4, n // 2, n - 2, n - 1):
        variants.append(good[:max(1, cut)])
    for _ in range(6):
        b = bytearray(good)
        b[rng.integers(0, n)] ^= 1 << rng.integers(0, 8)
        variants.append(bytes(b))
    cb = ChunkBatch.from_chunks(variants)
    out, osz, stat = map(np.asarray,
                         pk.PALLAS_DECODERS[fmt](cb.data, cb.sizes, 2048))
    # the untouched stream must decode exactly
    assert stat[0] == Status.SUCCESS
    assert out[0, :len(want)].tobytes() == want
    legal = {int(Status.SUCCESS), int(Status.ERROR_CANNOT_DECOMPRESS),
             int(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL)}
    for i in range(len(variants)):
        assert int(stat[i]) in legal, (fmt, i, stat[i])
        assert 0 <= osz[i] <= 2048, (fmt, i, osz[i])
        if stat[i] != Status.SUCCESS:
            assert osz[i] == 0, (fmt, i)
