"""Deflate codec tests: decode vs zlib/libdeflate streams, encode vs zlib inflate.

Mirrors the reference interop examples (``deflate_cpu_compression.cu`` /
``deflate_cpu_decompression.cu``): every zlib compression level (0 = stored
blocks, 1 = mostly fixed, 6/9 = dynamic Huffman) must decode bit-exactly.
"""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import deflate
from tpucomp.interop import cpu as interop
from tpucomp.utils import synth


def our_decompress(comp_chunks, out_cap):
    cb = ChunkBatch.from_chunks(comp_chunks)
    out, sizes, stat = deflate.decompress_batch(cb.data, cb.sizes, out_cap)
    return ([bytes(np.asarray(out[i, : sizes[i]])) for i in range(len(comp_chunks))],
            np.asarray(stat))


def our_compress(chunks, max_chunk=None):
    cb = ChunkBatch.from_chunks(chunks, max_chunk_bytes=max_chunk)
    cap = deflate.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, sizes, stat = deflate.compress_batch(cb.data, cb.sizes,
                                              deflate.DEFAULT_OPTS, cap)
    assert all(np.asarray(stat) == Status.SUCCESS), np.asarray(stat)
    return [bytes(np.asarray(out[i, : sizes[i]])) for i in range(len(chunks))]


def fixtures(n=4096):
    return {
        "text": synth.text_like(n).tobytes(),
        "runs": synth.runs(n).tobytes(),
        "random": synth.random_bytes(n).tobytes(),
        "zeros": synth.zeros(n).tobytes(),
        "tiny": b"deflate!",
        "single": b"z",
        "empty": b"",
    }


class TestDecodeVsZlib:
    @pytest.mark.parametrize("level", [0, 1, 6, 9])
    def test_levels(self, level):
        data = fixtures()
        comp = [interop.deflate_compress(v, level=level) for v in data.values()]
        got, stat = our_decompress(comp, 4096)
        for (name, orig), g, s in zip(data.items(), got, stat):
            assert s == Status.SUCCESS, f"{name!r} at level {level}: status {s}"
            assert g == orig, f"mismatch on {name!r} at level {level}"

    def test_libdeflate_streams(self):
        if not interop.available().get("libdeflate"):
            pytest.skip("libdeflate missing")
        data = fixtures(16384)
        comp = [interop.libdeflate_compress(v, level=9) for v in data.values()]
        got, stat = our_decompress(comp, 16384)
        for (name, orig), g in zip(data.items(), got):
            assert g == orig, f"mismatch on {name!r}"

    def test_64k_output(self):
        data = synth.mixed_corpus(65536, seed=4).tobytes()
        comp = interop.deflate_compress(data, level=6)
        got, stat = our_decompress([comp], 65536)
        assert stat[0] == Status.SUCCESS and got[0] == data

    def test_long_matches_and_overlaps(self):
        for period in (1, 3, 7):
            data = (bytes(range(period)) * (4000 // period + 1))[:4000]
            comp = interop.deflate_compress(data, level=9)
            got, stat = our_decompress([comp], 4096)
            assert got[0] == data, f"period {period}"


class TestEncodeVsZlib:
    def test_fixtures_inflate(self):
        data = fixtures()
        comp = our_compress(list(data.values()))
        for (name, orig), c in zip(data.items(), comp):
            got = interop.deflate_decompress(c)
            assert got == orig, f"mismatch on {name!r}"

    def test_16k(self):
        data = fixtures(16384)
        comp = our_compress(list(data.values()))
        for (name, orig), c in zip(data.items(), comp):
            assert interop.deflate_decompress(c) == orig, f"mismatch on {name!r}"
        if interop.available().get("libdeflate"):
            for (name, orig), c in zip(data.items(), comp):
                assert interop.libdeflate_decompress(c, len(orig)) == orig

    def test_self_roundtrip(self):
        data = fixtures(8192)
        comp = our_compress(list(data.values()))
        got, stat = our_decompress(comp, 8192)
        for (name, orig), g in zip(data.items(), got):
            assert g == orig, f"mismatch on {name!r}"


class TestRobustness:
    def test_garbage(self):
        got, stat = our_decompress([synth.random_bytes(300, seed=1).tobytes()], 4096)
        assert stat[0] != Status.SUCCESS or len(got[0]) <= 4096

    def test_truncated(self):
        data = synth.text_like(4096).tobytes()
        comp = interop.deflate_compress(data)
        got, stat = our_decompress([comp[: len(comp) // 2]], 4096)
        assert stat[0] != Status.SUCCESS

    def test_empty_input_is_error(self):
        got, stat = our_decompress([b""], 64)
        assert stat[0] != Status.SUCCESS

    def test_distance_beyond_output(self):
        # fixed-huffman block: match with dist 4 after only 1 literal
        # 3 bits hdr (110), lit 'a' (0x31<<...), len sym 257, dist code...
        # easier: corrupt a valid stream's distance area and expect error-or-mismatch
        data = b"abcd" * 100
        comp = bytearray(interop.deflate_compress(data, level=9))
        comp[len(comp) // 2] ^= 0x55
        got, stat = our_decompress([bytes(comp)], 4096)
        assert stat[0] != Status.SUCCESS or got[0] != data
