"""Cascaded codec tests: round-trip across types/configs, edge cases, robustness.

Mirrors the reference's verification strategy (SURVEY.md §4): bit-exact round-trip
over an entropy ladder of synthetic fixtures, zero-byte chunks, corrupt-input
status checks, and ratio sanity on the codec's sweet-spot data.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import ElementType, Status
from tpucomp.formats import cascaded
from tpucomp.ops import bitpack
from tpucomp.utils import synth


def roundtrip(chunks, opts, max_chunk=None):
    cb = ChunkBatch.from_chunks(chunks, max_chunk_bytes=max_chunk)
    out_cap = cascaded.max_compressed_chunk_size(cb.max_chunk_bytes, opts)
    comp, comp_sizes, statuses = cascaded.compress_batch(
        cb.data, cb.sizes, opts, out_cap)
    assert all(np.asarray(statuses) == Status.SUCCESS), np.asarray(statuses)
    dec, dec_sizes, dstat = cascaded.decompress_batch(
        comp, comp_sizes, cb.max_chunk_bytes)
    assert all(np.asarray(dstat) == Status.SUCCESS), np.asarray(dstat)
    got = [bytes(np.asarray(dec[i, :dec_sizes[i]])) for i in range(len(chunks))]
    assert got == list(chunks)
    return np.asarray(comp), np.asarray(comp_sizes)


class TestBitpack:
    @pytest.mark.parametrize("bits", [0, 1, 2, 4, 8, 16, 32, 64])
    def test_pack_unpack(self, bits):
        rng = np.random.default_rng(bits)
        cap = 100
        count = 77
        if bits == 0:
            v = np.full(cap, 42, np.int64)
        elif bits == 64:
            v = rng.integers(-(2**62), 2**62, cap)
        else:
            v = rng.integers(0, 2**bits, cap) + 1000
        vmin, b = bitpack.choose_width(jnp.asarray(v), jnp.int32(count))
        assert int(b) <= max(bits, 1) or int(b) <= 64
        words = bitpack.pack(jnp.asarray(v), jnp.int32(count), vmin, b, 2 * cap)
        out = bitpack.unpack(words, cap, b, vmin)
        assert np.array_equal(np.asarray(out[:count]), v[:count])

    def test_choose_width_exact(self):
        v = jnp.asarray(np.array([5, 6, 7, 8], np.int64))
        vmin, b = bitpack.choose_width(v, jnp.int32(4))
        assert int(vmin) == 5 and int(b) == 2  # range 3 -> 2 bits

    def test_overflow_range(self):
        # max - min overflows int64 (range > 2^63) -> must fall back to 64-bit raw
        v = jnp.asarray(np.array([-(2**62) - (2**61), 2**62], np.int64))
        vmin, b = bitpack.choose_width(v, jnp.int32(2))
        assert int(b) == 64

    def test_empty(self):
        v = jnp.zeros(8, jnp.int64)
        vmin, b = bitpack.choose_width(v, jnp.int32(0))
        assert int(b) == 0


CONFIGS = [
    cascaded.CascadedOpts(ElementType.UINT, 2, 1, True),    # reference default
    cascaded.CascadedOpts(ElementType.INT, 1, 0, True),
    cascaded.CascadedOpts(ElementType.UCHAR, 0, 0, True),   # bitpack only
    cascaded.CascadedOpts(ElementType.CHAR, 0, 1, True),
    cascaded.CascadedOpts(ElementType.SHORT, 1, 1, True),
    cascaded.CascadedOpts(ElementType.USHORT, 2, 2, True),
    cascaded.CascadedOpts(ElementType.LONGLONG, 1, 1, True),
    cascaded.CascadedOpts(ElementType.ULONGLONG, 2, 0, True),
    cascaded.CascadedOpts(ElementType.UINT, 2, 1, False),   # no bitpack
    cascaded.CascadedOpts(ElementType.BITS, 1, 0, True),
]


class TestCascadedRoundtrip:
    @pytest.mark.parametrize("opts", CONFIGS, ids=lambda o: f"{o.type.name}-r{o.num_rles}d{o.num_deltas}bp{int(o.use_bp)}")
    def test_configs(self, opts):
        ts = 1 if opts.type == ElementType.BITS else opts.type.nbytes
        chunks = [
            synth.low_cardinality_ints(1024 * ts, dtype=np.int64 if ts == 8 else np.int32).tobytes()[:1024 * ts],
            synth.sorted_ints(512 * ts).tobytes()[:512 * ts],
            synth.random_bytes(librarian_size := 256 * ts, seed=3).tobytes(),
            bytes(ts),          # single element of zeros
            b"",                # zero-byte chunk (CHANGELOG.md:66)
        ]
        roundtrip(chunks, opts)

    def test_full_range_values(self):
        # extremes of the int64 domain must survive (overflow-safe width logic)
        vals = np.array([0, 2**64 - 1, 1, 2**63, 2**63 - 1], dtype=np.uint64)
        opts = cascaded.CascadedOpts(ElementType.ULONGLONG, 0, 0, True)
        roundtrip([vals.tobytes()], opts)
        opts_d = cascaded.CascadedOpts(ElementType.ULONGLONG, 0, 2, True)
        roundtrip([vals.tobytes()], opts_d)

    def test_signed_negative(self):
        vals = np.array([-5, -4, -3, 100, -(2**31)], dtype=np.int32)
        for nd in (0, 1, 2):
            roundtrip([vals.tobytes()],
                      cascaded.CascadedOpts(ElementType.INT, 0, nd, True))

    def test_ratio_on_sorted_column(self):
        data = synth.sorted_ints(64 * 1024, dtype=np.int64).tobytes()
        opts = cascaded.CascadedOpts(ElementType.LONGLONG, 0, 1, True)
        comp, sizes = roundtrip([data], opts)
        ratio = len(data) / int(sizes[0])
        assert ratio > 8, f"sorted int64 column should pack well, got {ratio:.2f}"

    def test_ratio_on_low_cardinality(self):
        data = synth.low_cardinality_ints(64 * 1024, dtype=np.int32).tobytes()
        opts = cascaded.CascadedOpts(ElementType.INT, 2, 1, True)  # default-ish
        comp, sizes = roundtrip([data], opts)
        ratio = len(data) / int(sizes[0])
        assert ratio > 10, f"RLE-friendly column should pack well, got {ratio:.2f}"

    def test_constant_column(self):
        data = np.full(4096, 7, np.int32).tobytes()
        comp, sizes = roundtrip([data], cascaded.DEFAULT_OPTS)
        assert int(sizes[0]) < 200

    def test_size_not_multiple_of_type(self):
        cb = ChunkBatch.from_chunks([b"abc"])  # 3 bytes, UINT needs multiple of 4
        out_cap = cascaded.max_compressed_chunk_size(cb.max_chunk_bytes,
                                                     cascaded.DEFAULT_OPTS)
        _, _, statuses = cascaded.compress_batch(cb.data, cb.sizes,
                                                 cascaded.DEFAULT_OPTS, out_cap)
        assert int(statuses[0]) == Status.ERROR_INVALID_VALUE


class TestCascadedRobustness:
    def test_corrupt_magic(self):
        data = synth.sorted_ints(1024).tobytes()
        cb = ChunkBatch.from_chunks([data])
        out_cap = cascaded.max_compressed_chunk_size(cb.max_chunk_bytes,
                                                     cascaded.DEFAULT_OPTS)
        comp, comp_sizes, _ = cascaded.compress_batch(cb.data, cb.sizes,
                                                      cascaded.DEFAULT_OPTS, out_cap)
        comp = np.asarray(comp).copy()
        comp[0, 0] = 0x00  # clobber magic
        _, dsz, dstat = cascaded.decompress_batch(jnp.asarray(comp), comp_sizes, 1024)
        assert int(dstat[0]) == Status.ERROR_CANNOT_DECOMPRESS
        assert int(dsz[0]) == 0

    def test_random_garbage(self):
        garbage = synth.random_bytes(512, seed=99).tobytes()
        cb = ChunkBatch.from_chunks([garbage])
        _, dsz, dstat = cascaded.decompress_batch(cb.data, cb.sizes, 4096)
        assert int(dstat[0]) == Status.ERROR_CANNOT_DECOMPRESS

    def test_truncated_stream(self):
        data = synth.low_cardinality_ints(4096).tobytes()
        cb = ChunkBatch.from_chunks([data])
        out_cap = cascaded.max_compressed_chunk_size(cb.max_chunk_bytes,
                                                     cascaded.DEFAULT_OPTS)
        comp, comp_sizes, _ = cascaded.compress_batch(cb.data, cb.sizes,
                                                      cascaded.DEFAULT_OPTS, out_cap)
        truncated = jnp.maximum(comp_sizes - 40, 24)
        _, dsz, dstat = cascaded.decompress_batch(comp, truncated, 4096)
        assert int(dstat[0]) == Status.ERROR_CANNOT_DECOMPRESS

    def test_get_decompress_size(self):
        data = synth.sorted_ints(2048).tobytes()
        cb = ChunkBatch.from_chunks([data])
        out_cap = cascaded.max_compressed_chunk_size(cb.max_chunk_bytes,
                                                     cascaded.DEFAULT_OPTS)
        comp, comp_sizes, _ = cascaded.compress_batch(cb.data, cb.sizes,
                                                      cascaded.DEFAULT_OPTS, out_cap)
        import jax
        sizes = jax.vmap(cascaded.get_decompress_size)(comp, comp_sizes)
        assert int(sizes[0]) == len(data)
