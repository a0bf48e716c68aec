"""Tests for the core substrate: ChunkBatch, planners, interop oracles, ops."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpucomp.chunk import ChunkBatch, plan_chunks, plan_chunks_page_prefixed
from tpucomp.interop import cpu as interop
from tpucomp.ops import parallel_lz as plz
from tpucomp.utils import synth


class TestChunkBatch:
    def test_from_bytes_roundtrip(self):
        buf = bytes(range(256)) * 10
        cb = ChunkBatch.from_bytes(buf, chunk_size=1000)
        assert cb.num_chunks == 3
        assert cb.to_bytes() == buf
        assert list(np.asarray(cb.sizes)) == [1000, 1000, 560]

    def test_from_chunks_ragged(self):
        chunks = [b"hello", b"", b"a" * 100]
        cb = ChunkBatch.from_chunks(chunks)
        assert cb.chunk_list() == chunks
        # slot stride is rounded up to 8 B (the harness's chunk alignment,
        # benchmark_template_chunked.cuh:181-183)
        assert cb.max_chunk_bytes == 104

    def test_zero_byte_batch(self):
        cb = ChunkBatch.from_bytes(b"", chunk_size=64)
        assert cb.num_chunks == 1
        assert cb.to_bytes() == b""

    def test_pytree(self):
        cb = ChunkBatch.from_bytes(b"abcdef", chunk_size=3)
        leaves = jax.tree_util.tree_leaves(cb)
        assert len(leaves) == 2
        cb2 = jax.tree_util.tree_map(lambda x: x, cb)
        assert cb2.to_bytes() == b"abcdef"

    def test_compact(self):
        chunks = [b"abc", b"defgh", b"i"]
        cb = ChunkBatch.from_chunks(chunks)
        flat, offsets = jax.jit(lambda c: c.compact())(cb)
        total = sum(len(c) for c in chunks)
        assert bytes(np.asarray(flat[:total])) == b"".join(chunks)
        assert list(np.asarray(offsets)) == [0, 3, 8]


class TestPlanners:
    def test_plan_chunks(self):
        assert plan_chunks(0, 64) == [(0, 0)]
        assert plan_chunks(100, 64) == [(0, 64), (64, 36)]

    def test_page_prefixed(self):
        buf = (5).to_bytes(8, "little") + b"hello" + (2).to_bytes(8, "little") + b"hi"
        assert plan_chunks_page_prefixed(buf) == [(8, 5), (21, 2)]


class TestInterop:
    def test_available(self):
        avail = interop.available()
        assert avail["zlib"]

    def test_lz4_roundtrip(self):
        if not interop.available().get("lz4"):
            pytest.skip("liblz4 missing")
        data = synth.text_like(10000).tobytes()
        comp = interop.lz4_compress(data)
        assert len(comp) < len(data)
        assert interop.lz4_decompress(comp, len(data)) == data
        comp_hc = interop.lz4_compress(data, hc_level=9)
        assert interop.lz4_decompress(comp_hc, len(data)) == data

    def test_snappy_roundtrip(self):
        if not interop.available().get("snappy"):
            pytest.skip("libsnappy missing")
        data = synth.text_like(10000, seed=1).tobytes()
        comp = interop.snappy_compress(data)
        assert interop.snappy_decompress(comp) == data

    def test_deflate_roundtrip(self):
        data = synth.text_like(10000, seed=2).tobytes()
        comp = interop.deflate_compress(data)
        assert interop.deflate_decompress(comp) == data
        if interop.available().get("libdeflate"):
            assert interop.libdeflate_decompress(comp, len(data)) == data
            comp2 = interop.libdeflate_compress(data)
            assert interop.deflate_decompress(comp2) == data

    def test_gzip_roundtrip(self):
        data = synth.runs(5000).tobytes()
        assert interop.gzip_decompress(interop.gzip_compress(data)) == data


class TestParallelOps:
    def test_suffix_run_length(self):
        pred = jnp.array([1, 1, 0, 1, 1, 1, 0, 0, 1], dtype=jnp.bool_)
        out = plz.suffix_run_length(pred)
        assert list(np.asarray(out)) == [2, 1, 0, 3, 2, 1, 0, 0, 1]

    def test_prefix_run_length(self):
        pred = jnp.array([1, 1, 0, 1, 1, 1], dtype=jnp.bool_)
        out = plz.prefix_run_length(pred)
        assert list(np.asarray(out)) == [1, 2, 0, 1, 2, 3]

    def test_wyllie_path_simple(self):
        # Chain 0 -> 3 -> 5 -> 9(end); weights are position values for checking.
        n = 8
        nxt = np.full(n, 99, dtype=np.int32)
        nxt[0], nxt[3], nxt[5] = 3, 5, 9
        weight = np.array([10, 0, 0, 20, 0, 30, 0, 0], dtype=np.int32)
        reach, rank = plz.wyllie_path(jnp.asarray(nxt), jnp.asarray(weight),
                                      num_rounds=4)
        reach, rank = np.asarray(reach), np.asarray(rank)
        assert list(np.nonzero(reach)[0]) == [0, 3, 5]
        assert rank[0] == 0 and rank[3] == 10 and rank[5] == 30

    def test_wyllie_path_long_chain(self):
        # Worst case: every position chains to the next one.
        n = 1024
        nxt = np.arange(1, n + 1, dtype=np.int32)
        weight = np.ones(n, dtype=np.int32)
        reach, rank = plz.wyllie_path(jnp.asarray(nxt), jnp.asarray(weight),
                                      num_rounds=11)
        assert np.all(np.asarray(reach))
        assert list(np.asarray(rank)) == list(range(n))

    def test_resolve_copy_chain_overlapping(self):
        # Emulate LZ77 "abc" + match(offset=1, len=5) -> "abcccccc"
        out = "abcccccc"
        n = len(out)
        known = np.zeros(n, dtype=bool)
        val = np.zeros(n, dtype=np.int32)
        ptr = np.arange(n, dtype=np.int32)
        for i, ch in enumerate("abc"):
            known[i] = True
            val[i] = ord(ch)
        for i in range(3, n):
            ptr[i] = i - 1  # offset 1 overlapping match
        res = plz.resolve_copy_chain(jnp.asarray(ptr), jnp.asarray(val),
                                     jnp.asarray(known), max_rounds=4)
        assert bytes(np.asarray(res).astype(np.uint8)).decode() == out

    def test_exclusive_cummax(self):
        x = jnp.array([3, 1, 5, 2], dtype=jnp.int32)
        assert list(np.asarray(plz.exclusive_cummax(x, initial=-1))) == [-1, 3, 3, 5]


class TestSynth:
    def test_generators_deterministic(self):
        a = synth.mixed_corpus(10000, seed=7)
        b = synth.mixed_corpus(10000, seed=7)
        assert np.array_equal(a, b)
        assert a.size == 10000

    def test_compressibility_spread(self):
        import zlib
        lo = zlib.compress(synth.zeros(8192).tobytes())
        hi = zlib.compress(synth.random_bytes(8192).tobytes())
        assert len(lo) < 200 and len(hi) > 8000
