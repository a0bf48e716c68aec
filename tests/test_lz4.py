"""LZ4 codec tests: interop oracles vs liblz4 (both directions), edge cases.

Mirrors the reference's strongest correctness oracle (SURVEY.md §4.2):
CPU ``LZ4_compress_HC`` -> TPU decompress (``examples/lz4_cpu_compression.cu``)
and TPU compress -> CPU ``LZ4_decompress_safe`` (``examples/lz4_cpu_decompression.cu``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import lz4
from tpucomp.interop import cpu as interop
from tpucomp.utils import synth

HAVE_LZ4 = interop.available().get("lz4", False)
needs_lz4 = pytest.mark.skipif(not HAVE_LZ4, reason="liblz4 missing")


def fixtures(n=4096):
    return {
        "text": synth.text_like(n).tobytes(),
        "runs": synth.runs(n).tobytes(),
        "random": synth.random_bytes(n).tobytes(),
        "zeros": synth.zeros(n).tobytes(),
        "low_entropy": synth.gen_data(3, n, seed=5).tobytes(),
        "sorted_ints": synth.sorted_ints(n).tobytes(),
        "tiny": b"abcabcabcabc",
        "single": b"x",
        "empty": b"",
        "almost_min": b"abcdefghijkl",  # 12 B: no matches allowed by end rules
    }


def our_decompress(comp_chunks, out_cap):
    cb = ChunkBatch.from_chunks(comp_chunks)
    out, sizes, stat = lz4.decompress_batch(cb.data, cb.sizes, out_cap)
    return ([bytes(np.asarray(out[i, : sizes[i]])) for i in range(len(comp_chunks))],
            np.asarray(stat))


def our_compress(chunks, max_chunk=None):
    cb = ChunkBatch.from_chunks(chunks, max_chunk_bytes=max_chunk)
    out_cap = lz4.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, sizes, stat = lz4.compress_batch(cb.data, cb.sizes, lz4.DEFAULT_OPTS, out_cap)
    assert all(np.asarray(stat) == Status.SUCCESS), np.asarray(stat)
    return [bytes(np.asarray(out[i, : sizes[i]])) for i in range(len(chunks))]


@needs_lz4
class TestDecodeVsLiblz4:
    """CPU-compress -> our decode must be bit-exact."""

    def test_default_compressor(self):
        data = fixtures()
        names = list(data)
        comp = [interop.lz4_compress(data[n]) for n in names]
        got, stat = our_decompress(comp, 4096)
        for n, g in zip(names, got):
            assert g == data[n], f"mismatch on fixture {n!r}"
        assert all(stat == Status.SUCCESS)

    def test_hc_compressor(self):
        # HC emits longer matches / different parses than the fast compressor
        data = fixtures(16384)
        comp = [interop.lz4_compress(data[n], hc_level=9) for n in data]
        got, stat = our_decompress(comp, 16384)
        for n, g in zip(data, got):
            assert g == data[n], f"mismatch on fixture {n!r}"

    def test_long_extension_lengths(self):
        # >15 literals and >19-byte matches exercise 0xFF length extensions
        data = synth.random_bytes(400, seed=8).tobytes() + b"A" * 5000 \
            + synth.random_bytes(400, seed=9).tobytes()
        comp = interop.lz4_compress(data)
        got, stat = our_decompress([comp], len(data))
        assert got[0] == data and stat[0] == Status.SUCCESS

    def test_overlapping_matches(self):
        # offset < length (RLE-style) requires the copy-chain resolution
        for period in (1, 2, 3, 5, 7):
            data = (bytes(range(period)) * (3000 // period + 1))[:3000]
            comp = interop.lz4_compress(data)
            got, stat = our_decompress([comp], 3000)
            assert got[0] == data, f"period {period}"


@needs_lz4
class TestEncodeVsLiblz4:
    """Our encode -> CPU LZ4_decompress_safe must be bit-exact."""

    def test_all_fixtures(self):
        data = fixtures()
        comp = our_compress(list(data.values()))
        for (name, orig), c in zip(data.items(), comp):
            got = interop.lz4_decompress(c, len(orig))
            assert got == orig, f"mismatch on fixture {name!r}"

    def test_64k_chunks(self):
        data = fixtures(65536)
        comp = our_compress(list(data.values()))
        for (name, orig), c in zip(data.items(), comp):
            got = interop.lz4_decompress(c, len(orig))
            assert got == orig, f"mismatch on fixture {name!r}"

    def test_compression_ratio_sane(self):
        # our ratio should be within 25% of liblz4's on compressible data
        for name in ("text", "runs", "zeros", "low_entropy"):
            data = fixtures(65536)[name]
            ours = len(our_compress([data])[0])
            theirs = len(interop.lz4_compress(data))
            assert ours <= theirs * 1.25 + 64, \
                f"{name}: ours={ours} liblz4={theirs}"


class TestSelfRoundtrip:
    def test_roundtrip_no_oracle(self):
        data = fixtures(8192)
        comp = our_compress(list(data.values()))
        got, stat = our_decompress(comp, 8192)
        for (name, orig), g in zip(data.items(), got):
            assert g == orig, f"mismatch on fixture {name!r}"
        assert all(stat == Status.SUCCESS)

    def test_batch_mixed_sizes(self):
        chunks = [synth.text_like(n, seed=n).tobytes() for n in (1, 13, 100, 4096, 60000)]
        comp = our_compress(chunks, max_chunk=60000)
        got, stat = our_decompress(comp, 60000)
        assert got == chunks


class TestRobustness:
    def test_garbage_input(self):
        garbage = synth.random_bytes(300, seed=13).tobytes()
        got, stat = our_decompress([garbage], 4096)
        # must flag an error (or decode to nothing) without crashing
        assert stat[0] != Status.SUCCESS or got[0] == b""

    def test_truncated_stream(self):
        # A truncation can land exactly after a literal run, which is
        # indistinguishable from a legal literals-only final sequence (liblz4
        # accepts that too) — so the contract is: error status OR a strict
        # prefix, never the full data and never a crash.
        data = synth.text_like(4096).tobytes()
        comp = our_compress([data])[0]
        for frac in (2, 3, 5, 7):
            got, stat = our_decompress([comp[: len(comp) // frac]], 4096)
            assert stat[0] != Status.SUCCESS or got[0] == data[: len(got[0])]
            assert len(got[0]) < len(data)

    def test_offset_beyond_output(self):
        # token with offset pointing before the start of the output
        bad = bytes([0x10, ord("A"), 0xFF, 0xFF, 0x00, 0x00, 0x00])
        got, stat = our_decompress([bad], 64)
        assert stat[0] != Status.SUCCESS

    def test_output_buffer_too_small(self):
        data = b"B" * 1000
        comp = our_compress([data])[0]
        got, stat = our_decompress([comp], 64)
        assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
