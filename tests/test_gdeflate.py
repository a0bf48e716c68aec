"""GDeflate tile-container tests.

The conformance oracle is the independently-written serial Python codec
``gdeflate_pyref.py`` (DirectStorage-1.1 architecture: 64 KiB pages, 32
interleaved SIMD lanes, extended 64 KiB distance space).  Both directions are
exercised: JAX encode -> pyref decode and pyref encode -> JAX decode — the
same cross-implementation strategy the reference uses with its CPU companion
library (``examples/gdeflate_cpu_compression.cu:66-138``).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import gdeflate_pyref as pyref  # noqa: E402

from tpucomp.chunk import ChunkBatch  # noqa: E402
from tpucomp.constants import Status  # noqa: E402
from tpucomp.formats import gdeflate  # noqa: E402
from tpucomp.utils import synth  # noqa: E402


def _fixtures():
    rng = np.random.default_rng(2)
    return [
        b"hello world hello world hello world! " * 80,
        bytes(rng.integers(0, 5, 8000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 2000, dtype=np.uint8)),
        b"\x00" * 6000,
        synth.text_like(8000).tobytes(),
        b"x",
        b"",
    ]


@pytest.mark.parametrize("algo", [0, 1, 2])
def test_jax_encode_pyref_decode(algo):
    raws = _fixtures()
    cb = ChunkBatch.from_chunks(raws)
    opts = gdeflate.GdeflateOpts(algo)
    cap = gdeflate.max_compressed_chunk_size(cb.max_chunk_bytes, opts)
    out, osz, ost = gdeflate.compress_batch(cb.data, cb.sizes, opts, cap)
    out, osz, ost = map(np.asarray, (out, osz, ost))
    assert (ost == Status.SUCCESS).all()
    for i, r in enumerate(raws):
        tile = out[i, : osz[i]].tobytes()
        assert pyref.decompress(tile) == r, (algo, i)


@pytest.mark.parametrize("btype", [0, 1, 2])
def test_pyref_encode_jax_decode(btype):
    raws = _fixtures()
    tiles = [pyref.compress(r, btype=btype) for r in raws]
    cb = ChunkBatch.from_chunks(tiles)
    dec, dsz, dst = map(np.asarray,
                        gdeflate.decompress_batch(cb.data, cb.sizes, 8192))
    for i, r in enumerate(raws):
        assert dst[i] == Status.SUCCESS, (btype, i, dst[i])
        assert dsz[i] == len(r)
        assert dec[i, : len(r)].tobytes() == r, (btype, i)


@pytest.mark.parametrize("algo", [0, 1])
def test_self_roundtrip_64k(algo):
    buf = synth.mixed_corpus(130_000, seed=7).tobytes()
    chunks = [buf[i:i + 65536] for i in range(0, len(buf), 65536)]
    cb = ChunkBatch.from_chunks(chunks)
    opts = gdeflate.GdeflateOpts(algo)
    cap = gdeflate.max_compressed_chunk_size(65536, opts)
    out, osz, ost = gdeflate.compress_batch(cb.data, cb.sizes, opts, cap)
    assert (np.asarray(ost) == Status.SUCCESS).all()
    ratio = sum(len(c) for c in chunks) / int(np.asarray(osz).sum())
    assert ratio > 1.5, ratio
    dec, dsz, dst = map(np.asarray, gdeflate.decompress_batch(out, osz, 65536))
    for i, c in enumerate(chunks):
        assert dst[i] == Status.SUCCESS
        assert dec[i, : len(c)].tobytes() == c


def test_not_byte_identical_to_deflate():
    # the round-1 gap: gdeflate must now be a real lane-interleaved container,
    # not plain RFC-1951 under another name
    from tpucomp.formats import deflate as fdeflate
    data = synth.text_like(8192).tobytes()
    cb = ChunkBatch.from_chunks([data])
    gout, gsz, _ = gdeflate.compress_batch(
        cb.data, cb.sizes, gdeflate.DEFAULT_OPTS,
        gdeflate.max_compressed_chunk_size(8192))
    dout, dsz, _ = fdeflate.compress_batch(
        cb.data, cb.sizes, fdeflate.DEFAULT_OPTS,
        fdeflate.max_compressed_chunk_size(8192))
    g = np.asarray(gout)[0, : int(gsz[0])].tobytes()
    d = np.asarray(dout)[0, : int(dsz[0])].tobytes()
    assert g != d


def test_algo_ladder_ratio_ordering():
    # algo 1 (dynamic tables) >= algo 0 (fixed); algo 2 (entropy-only) worst
    # on LZ-friendly data
    data = b"AB" * 4096 + synth.text_like(4096).tobytes()
    cb = ChunkBatch.from_chunks([data])
    cap = gdeflate.max_compressed_chunk_size(len(data))
    sizes = {}
    for algo in (0, 1, 2):
        _, osz, _ = gdeflate.compress_batch(
            cb.data, cb.sizes, gdeflate.GdeflateOpts(algo), cap)
        sizes[algo] = int(np.asarray(osz)[0])
    assert sizes[1] <= sizes[0] < sizes[2], sizes


def test_corrupt_inputs_error_not_crash():
    rng = np.random.default_rng(9)
    raw = synth.text_like(4000).tobytes()
    tile = bytearray(pyref.compress(raw, btype=2))
    bad_btype = bytes([7]) + bytes(tile[1:])
    bad_ntok = bytearray(tile); bad_ntok[2] ^= 0xFF
    bad_rawsz = bytearray(tile); bad_rawsz[6] ^= 0x7F
    truncated = bytes(tile[: len(tile) // 2])
    garbage = bytes(rng.integers(0, 256, 256, dtype=np.uint8))
    bad = [bytes(bad_btype), bytes(bad_ntok), bytes(bad_rawsz), truncated,
           garbage]
    cb = ChunkBatch.from_chunks(bad, max_chunk_bytes=len(tile))
    dec, dsz, dst = map(np.asarray,
                        gdeflate.decompress_batch(cb.data, cb.sizes, 8192))
    for i in range(len(bad)):
        assert dst[i] != Status.SUCCESS, i
        assert dsz[i] == 0, i


def test_get_decompress_size():
    import jax
    raws = _fixtures()
    tiles = [pyref.compress(r, btype=2) for r in raws]
    cb = ChunkBatch.from_chunks(tiles)
    sizes = np.asarray(jax.vmap(gdeflate.get_decompress_size)(cb.data, cb.sizes))
    assert list(sizes) == [len(r) for r in raws]
