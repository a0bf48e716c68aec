"""rANS codec tests: round-trip over the entropy ladder, ratio sanity, robustness.

nvCOMP's ANS container is proprietary so there is no cross-implementation oracle;
the correctness bar is exact self-inverse round-trips across distributions plus
entropy-optimality checks (compressed size close to the Shannon bound).
"""
import math

import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import ans
from tpucomp.utils import synth


def roundtrip(chunks, max_chunk=None):
    cb = ChunkBatch.from_chunks(chunks, max_chunk_bytes=max_chunk)
    cap = ans.max_compressed_chunk_size(cb.max_chunk_bytes)
    comp, csz, cst = ans.compress_batch(cb.data, cb.sizes, ans.DEFAULT_OPTS, cap)
    assert all(np.asarray(cst) == Status.SUCCESS)
    dec, dsz, dst = ans.decompress_batch(comp, csz, cb.max_chunk_bytes)
    assert all(np.asarray(dst) == Status.SUCCESS), np.asarray(dst)
    got = [bytes(np.asarray(dec[i, : dsz[i]])) for i in range(len(chunks))]
    assert got == list(chunks)
    return np.asarray(csz)


class TestRoundtrip:
    def test_entropy_ladder(self):
        chunks = [synth.gen_data(mb, 16384, seed=mb).tobytes()
                  for mb in (0, 1, 3, 15, 63, 255)]
        roundtrip(chunks)

    def test_fixtures(self):
        roundtrip([
            synth.text_like(16384).tobytes(),
            synth.runs(16384).tobytes(),
            b"", b"a", b"ab" * 3, bytes(256),
            bytes(np.arange(256, dtype=np.uint8)),
        ], max_chunk=16384)

    def test_all_256_symbols_rare(self):
        # worst case for frequency quantization: every symbol present, most rare
        rng = np.random.default_rng(3)
        data = np.concatenate([
            np.arange(256, dtype=np.uint8),
            rng.integers(0, 4, 60000, dtype=np.uint8),
        ]).tobytes()
        roundtrip([data])

    def test_single_symbol(self):
        roundtrip([b"\x42" * 50000])


class TestRatio:
    def test_near_entropy_bound(self):
        # 2-bit uniform data: Shannon bound is ratio 4
        data = synth.gen_data(3, 65536).tobytes()
        csz = roundtrip([data])
        ratio = len(data) / int(csz[0])
        assert ratio > 3.3, ratio

    def test_incompressible_overhead_small(self):
        data = synth.random_bytes(65536).tobytes()
        csz = roundtrip([data])
        assert int(csz[0]) < len(data) * 1.05


class TestRobustness:
    def test_garbage(self):
        g = synth.random_bytes(2000, seed=5).tobytes()
        cb = ChunkBatch.from_chunks([g])
        _, dsz, dst = ans.decompress_batch(cb.data, cb.sizes, 4096)
        assert int(dst[0]) == Status.ERROR_CANNOT_DECOMPRESS

    def test_truncated(self):
        data = synth.text_like(8192).tobytes()
        cb = ChunkBatch.from_chunks([data])
        cap = ans.max_compressed_chunk_size(8192)
        comp, csz, _ = ans.compress_batch(cb.data, cb.sizes, ans.DEFAULT_OPTS, cap)
        import jax.numpy as jnp
        _, dsz, dst = ans.decompress_batch(comp, jnp.maximum(csz - 100, 16), 8192)
        assert int(dst[0]) == Status.ERROR_CANNOT_DECOMPRESS

    def test_get_decompress_size(self):
        import jax
        data = synth.text_like(5000).tobytes()
        cb = ChunkBatch.from_chunks([data])
        cap = ans.max_compressed_chunk_size(5000)
        comp, csz, _ = ans.compress_batch(cb.data, cb.sizes, ans.DEFAULT_OPTS, cap)
        sizes = jax.vmap(ans.get_decompress_size)(comp, csz)
        assert int(sizes[0]) == 5000


def test_quantize_freqs_invariants():
    rng = np.random.default_rng(9)
    import jax.numpy as jnp
    for _ in range(10):
        n = int(rng.integers(1, 100000))
        data = rng.integers(0, 256, n, dtype=np.uint8)
        counts = np.bincount(data, minlength=256).astype(np.int32)
        freq = np.asarray(ans.quantize_freqs(jnp.asarray(counts), jnp.int32(n)))
        assert freq.sum() == ans.PROB_SCALE
        assert np.all((freq > 0) == (counts > 0))
