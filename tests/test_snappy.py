"""Snappy codec tests: interop oracle vs libsnappy, decoder conformance corpus.

The reference explicitly tests its Snappy decoder on legal streams its own
compressor never emits (``CHANGELOG.md:182-184``) — the hand-built streams in
``TestDecoderConformance`` mirror that.
"""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import snappy
from tpucomp.interop import cpu as interop
from tpucomp.utils import synth

HAVE_SNAPPY = interop.available().get("snappy", False)
needs_snappy = pytest.mark.skipif(not HAVE_SNAPPY, reason="libsnappy missing")


def our_decompress(comp_chunks, out_cap):
    cb = ChunkBatch.from_chunks(comp_chunks)
    out, sizes, stat = snappy.decompress_batch(cb.data, cb.sizes, out_cap)
    return ([bytes(np.asarray(out[i, : sizes[i]])) for i in range(len(comp_chunks))],
            np.asarray(stat))


def our_compress(chunks, max_chunk=None):
    cb = ChunkBatch.from_chunks(chunks, max_chunk_bytes=max_chunk)
    out_cap = snappy.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, sizes, stat = snappy.compress_batch(cb.data, cb.sizes,
                                             snappy.DEFAULT_OPTS, out_cap)
    assert all(np.asarray(stat) == Status.SUCCESS), np.asarray(stat)
    return [bytes(np.asarray(out[i, : sizes[i]])) for i in range(len(chunks))]


def fixtures(n=4096):
    return {
        "text": synth.text_like(n).tobytes(),
        "runs": synth.runs(n).tobytes(),
        "random": synth.random_bytes(n).tobytes(),
        "zeros": synth.zeros(n).tobytes(),
        "tiny": b"snap" * 10,
        "single": b"q",
        "empty": b"",
    }


@needs_snappy
class TestVsLibsnappy:
    def test_cpu_compress_our_decode(self):
        data = fixtures()
        comp = [interop.snappy_compress(v) for v in data.values()]
        got, stat = our_decompress(comp, 4096)
        for (name, orig), g in zip(data.items(), got):
            assert g == orig, f"mismatch on {name!r}"
        assert all(stat == Status.SUCCESS)

    def test_our_compress_cpu_decode(self):
        data = fixtures()
        comp = our_compress(list(data.values()))
        for (name, orig), c in zip(data.items(), comp):
            assert interop.snappy_decompress(c) == orig, f"mismatch on {name!r}"

    def test_64k(self):
        data = fixtures(65536)
        comp = our_compress(list(data.values()))
        for (name, orig), c in zip(data.items(), comp):
            assert interop.snappy_decompress(c) == orig, f"mismatch on {name!r}"
        comp2 = [interop.snappy_compress(v) for v in data.values()]
        got, stat = our_decompress(comp2, 65536)
        for (name, orig), g in zip(data.items(), got):
            assert g == orig, f"decode mismatch on {name!r}"


class TestDecoderConformance:
    """Legal streams our compressor never emits (reference ``CHANGELOG.md:182-184``)."""

    def decode_one(self, stream, out_cap=256):
        got, stat = our_decompress([stream], out_cap)
        return got[0], stat[0]

    def test_copy1(self):
        # "abcd" + copy-1 (len 4, offset 4)
        s = bytes([8, 3 << 2, 97, 98, 99, 100, 0b000_000_01, 4])
        got, stat = self.decode_one(s)
        assert stat == Status.SUCCESS and got == b"abcdabcd"

    def test_copy4(self):
        # "ab" + copy-4 (len 2, offset 2)
        s = bytes([4, 1 << 2, 97, 98, (1 << 2) | 3, 2, 0, 0, 0])
        got, stat = self.decode_one(s)
        assert stat == Status.SUCCESS and got == b"abab"

    def test_short_copy(self):
        # copy of length 1 (our encoder minimum is 4)
        s = bytes([2, 0 << 2, 120, (0 << 2) | 2, 1, 0])
        got, stat = self.decode_one(s)
        assert stat == Status.SUCCESS and got == b"xx"

    def test_overlapping_copy(self):
        # "ab" + copy len 6 offset 2 -> "abababab"
        s = bytes([8, 1 << 2, 97, 98, (5 << 2) | 2, 2, 0])
        got, stat = self.decode_one(s)
        assert stat == Status.SUCCESS and got == b"abababab"

    def test_multibyte_literal_length(self):
        # literal with 1-byte explicit length (tag 60<<2)
        body = bytes(range(100))
        s = bytes([100, 60 << 2, 99]) + body
        got, stat = self.decode_one(s)
        assert stat == Status.SUCCESS and got == body

    def test_two_byte_varint_preamble(self):
        body = b"z" * 200
        s = bytes([200 & 0x7F | 0x80, 200 >> 7, (59 << 2)]) + b"z" * 60 \
            + bytes([(63 << 2) | 2, 60, 0]) + bytes([(63 << 2) | 2, 60, 0]) \
            + bytes([(11 << 2) | 2, 60, 0])  # 60 + 64 + 64 + 12 = 200
        got, stat = self.decode_one(s, out_cap=256)
        assert stat == Status.SUCCESS and got == body


class TestSelfRoundtrip:
    def test_fixtures(self):
        data = fixtures(8192)
        comp = our_compress(list(data.values()))
        got, stat = our_decompress(comp, 8192)
        for (name, orig), g in zip(data.items(), got):
            assert g == orig, f"mismatch on {name!r}"

    def test_long_matches_split_into_copies(self):
        # 10000-byte run forces many max-64 copies
        data = b"R" * 10000
        comp = our_compress([data])
        got, stat = our_decompress(comp, 10000)
        assert got[0] == data
        if HAVE_SNAPPY:
            assert interop.snappy_decompress(comp[0]) == data

    def test_get_decompress_size(self):
        import jax
        data = synth.text_like(5000).tobytes()
        comp = our_compress([data])
        cb = ChunkBatch.from_chunks(comp)
        sizes = jax.vmap(snappy.get_decompress_size)(cb.data, cb.sizes)
        assert int(sizes[0]) == 5000


class TestRobustness:
    def test_garbage(self):
        g = synth.random_bytes(200, seed=77).tobytes()
        got, stat = our_decompress([g], 4096)
        assert stat[0] != Status.SUCCESS or got[0] == b""

    def test_truncated(self):
        data = synth.text_like(2000).tobytes()
        comp = our_compress([data])[0]
        got, stat = our_decompress([comp[: len(comp) // 2]], 2000)
        assert stat[0] != Status.SUCCESS

    def test_length_mismatch(self):
        # preamble says 10 but stream encodes 4 bytes
        s = bytes([10, 3 << 2, 97, 98, 99, 100])
        got, stat = our_decompress([s], 64)
        assert stat[0] != Status.SUCCESS
