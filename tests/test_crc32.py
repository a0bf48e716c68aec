"""CRC32 tests vs the independent binascii oracle (reference uses boost::crc,
``examples/standard_crc_checksum.cpp:64-107`` — same polynomial/presentation)."""
import binascii

import numpy as np

from tpucomp.chunk import ChunkBatch
from tpucomp.formats import crc32 as c32
from tpucomp.utils import synth


def test_random_chunk_sizes_vs_binascii():
    # mirror of the reference test: many random-size random-content chunks
    rng = np.random.default_rng(12)
    chunks = [rng.integers(0, 256, int(s), dtype=np.uint8).tobytes()
              for s in rng.integers(1, 1025, size=64)]
    cb = ChunkBatch.from_chunks(chunks)
    ours = np.asarray(c32.crc32_batch(cb.data, cb.sizes))
    ref = np.array([binascii.crc32(c) & 0xFFFFFFFF for c in chunks], np.uint32)
    assert np.array_equal(ours, ref)


def test_edge_sizes():
    chunks = [b"", b"\x00", b"a", b"ab", bytes(4096), synth.text_like(65536).tobytes()]
    cb = ChunkBatch.from_chunks(chunks)
    ours = np.asarray(c32.crc32_batch(cb.data, cb.sizes))
    ref = np.array([binascii.crc32(c) & 0xFFFFFFFF for c in chunks], np.uint32)
    assert np.array_equal(ours, ref)


def test_known_vector():
    cb = ChunkBatch.from_chunks([b"123456789"])
    assert int(c32.crc32_batch(cb.data, cb.sizes)[0]) == 0xCBF43926
