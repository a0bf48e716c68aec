"""TPU-fast cascaded path (ops/cascaded_fast.py) vs the general XLA program.

Every frame either encoder emits must decode on either path (the width
ladder ``bitpack.W64`` is shared since round 4), and both paths must agree
bit-exactly with the original data.
"""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import ElementType, Status
from tpucomp.formats import cascaded as fc
from tpucomp.ops import cascaded_fast as cf
from tpucomp.utils import synth


def _mk(dtype, n_el, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, n_el, dtype=dtype).tobytes()


def _runs(dtype, n_el, card, seed=1):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, card, n_el // 8 + 1, dtype=dtype)
    return np.repeat(vals, 8)[:n_el].tobytes()


CASES = [
    (ElementType.UCHAR, lambda: _runs(np.uint8, 4096, 5)),
    (ElementType.USHORT, lambda: _runs(np.uint16, 2048, 9)),
    (ElementType.UINT, lambda: _runs(np.uint32, 1024, 7)),
    (ElementType.INT, lambda: (np.cumsum(
        np.random.default_rng(3).integers(-9, 10, 1024)).astype(np.int32)
        .tobytes())),
    # unsigned values straddling the 2^31 signed boundary (the wrapped-domain
    # ordering trap: the fast path must pick the unsigned ordering here)
    (ElementType.UINT, lambda: (np.random.default_rng(5).integers(
        2**31 - 50, 2**31 + 50, 1024, dtype=np.int64).astype(np.uint32)
        .tobytes())),
]


@pytest.mark.parametrize("etype,gen", CASES)
@pytest.mark.parametrize("nr,nd,bp", [(2, 1, True), (1, 0, True),
                                      (0, 2, True), (2, 1, False),
                                      (0, 0, True)])
def test_cross_path_roundtrips(etype, gen, nr, nd, bp):
    raw = gen()
    opts = fc.CascadedOpts(type=etype, num_rles=nr, num_deltas=nd, use_bp=bp)
    cb = ChunkBatch.from_chunks([raw])
    cap = fc.max_compressed_chunk_size(cb.max_chunk_bytes, opts)

    frames = {}
    for name, enc in (("fast", cf.compress_batch),
                      ("general", fc.compress_batch)):
        co, cs, st = map(np.asarray, enc(cb.data, cb.sizes, opts, cap))
        assert (st == 0).all(), (name, st)
        frames[name] = co[0, :cs[0]].tobytes()

    for ename, frame in frames.items():
        fcb = ChunkBatch.from_chunks([frame])
        for dname, dec in (("fast", cf.decompress_batch),
                           ("general", fc.decompress_batch)):
            out, osz, st = map(np.asarray,
                               dec(fcb.data, fcb.sizes, len(raw)))
            assert st[0] == Status.SUCCESS, (ename, dname, st[0])
            assert osz[0] == len(raw), (ename, dname)
            assert out[0, :len(raw)].tobytes() == raw, (ename, dname)


def test_longlong_fast_roundtrip():
    raw = np.arange(512, dtype=np.int64).tobytes()
    opts = fc.CascadedOpts(type=ElementType.LONGLONG)
    cb = ChunkBatch.from_chunks([raw])
    cap = fc.max_compressed_chunk_size(cb.max_chunk_bytes, opts)
    co, cs, st = map(np.asarray, cf.compress_batch(cb.data, cb.sizes, opts,
                                                   cap))
    assert st[0] == Status.SUCCESS
    fcb = ChunkBatch.from_chunks([co[0, :cs[0]].tobytes()])
    # the i64 frame must still decode on the fast path (W64 widths)
    out, osz, st2 = map(np.asarray,
                        cf.decompress_batch(fcb.data, fcb.sizes, len(raw)))
    assert st2[0] == Status.SUCCESS
    assert out[0, :len(raw)].tobytes() == raw


def test_empty_and_corrupt():
    opts = fc.DEFAULT_OPTS
    cb = ChunkBatch.from_chunks([b"", b"\x00" * 64])
    cap = fc.max_compressed_chunk_size(cb.max_chunk_bytes, opts)
    co, cs, st = map(np.asarray, cf.compress_batch(cb.data, cb.sizes, opts,
                                                   cap))
    assert (st == 0).all()
    garbage = np.random.default_rng(0).integers(0, 256, 128, dtype=np.uint8)
    bad = ChunkBatch.from_chunks([garbage.tobytes()])
    out, osz, st2 = map(np.asarray, cf.decompress_batch(bad.data, bad.sizes,
                                                        4096))
    assert st2[0] == Status.ERROR_CANNOT_DECOMPRESS
    assert osz[0] == 0


def test_batched_auto_dispatch_registered():
    from tpucomp.ops import pallas as pk
    assert "cascaded" in pk.PALLAS_DECODERS
    assert "cascaded" in pk.PALLAS_ENCODERS
    data = synth.low_cardinality_ints(32768).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=4096)
    cap = fc.max_compressed_chunk_size(4096, fc.DEFAULT_OPTS)
    co, cs, st = map(np.asarray,
                     pk.PALLAS_ENCODERS["cascaded"](cb.data, cb.sizes, None,
                                                    cap))
    assert (st == 0).all()
    comp = [co[i, :cs[i]].tobytes() for i in range(cb.num_chunks)]
    ccb = ChunkBatch.from_chunks(comp)
    out, osz, st2 = map(np.asarray,
                        pk.PALLAS_DECODERS["cascaded"](ccb.data, ccb.sizes,
                                                       4096))
    assert (st2 == 0).all()
    got = b"".join(out[i, :osz[i]].tobytes() for i in range(cb.num_chunks))
    assert got == data
    # compression actually happened (low-cardinality ints pack well)
    assert sum(cs) < len(data) // 4


def test_width_ladder_pack_unpack_exhaustive():
    rng = np.random.default_rng(11)
    import jax.numpy as jnp
    for b in cf.W64:
        if b == 0:
            continue
        n = 300
        lo_np = rng.integers(0, 1 << min(b, 32), n, dtype=np.uint64)
        hi_np = (rng.integers(0, 1 << (b - 32), n, dtype=np.uint64)
                 if b > 32 else np.zeros(n, np.uint64))
        lo = jnp.asarray(lo_np.astype(np.uint32))
        hi = jnp.asarray(hi_np.astype(np.uint32))
        words = cf._pack_static(lo, hi, b, 2 * n)
        l2, h2 = cf._unpack_static(words, b, n)
        assert (np.asarray(l2) == lo_np.astype(np.uint32)).all(), b
        assert (np.asarray(h2) == hi_np.astype(np.uint32)).all(), b
        # layout parity with the general bit packer
        from tpucomp.ops import bitpack
        v64 = (hi_np.astype(np.int64) << 32) | lo_np.astype(np.int64)
        ref = np.asarray(bitpack.pack(jnp.asarray(v64), jnp.int32(n),
                                      jnp.int64(0), jnp.int32(b), 2 * n))
        nw = (n * b + 31) // 32
        assert (np.asarray(words)[:nw] == ref[:nw].astype(np.uint32)).all(), b


def test_pack_static_all_widths_large_jit():
    """Regression: XLA miscompiled the unrolled column shift-OR chain in the
    original _pack_static (jit packed 0xff84ffff where eager packed
    0xffffffff for b=1 all-ones — bits at shifts 16..22 silently dropped,
    observed on XLA:CPU and TPU).  The vectorized form must round-trip every
    ladder width at a large, non-trivial size under jit."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1234)
    cap = 16384
    for b in cf.W64:
        if b == 0:
            continue
        lo = rng.integers(0, 1 << min(b, 32), cap,
                          dtype=np.uint64).astype(np.uint32)
        if b < 32:
            lo &= (1 << b) - 1
        hi = (rng.integers(0, 1 << max(b - 32, 1), cap,
                           dtype=np.uint64).astype(np.uint32)
              if b > 32 else np.zeros(cap, np.uint32))
        w = jax.jit(lambda l, h, b=b: cf._pack_static(l, h, b, 2 * cap))(
            jnp.asarray(lo), jnp.asarray(hi))
        l2, h2 = jax.jit(lambda w, b=b: cf._unpack_static(w, b, cap))(w)
        assert (np.asarray(l2) == lo).all(), b
        assert (np.asarray(h2) == hi).all(), b


def test_expand_pass_vs_numpy():
    """Round-5 vectorized RLE expand (scatter+cumsum+gather) vs np.repeat,
    including masked tails, single-run, and run-dense (all-ones) cases."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    cap = 4096
    cases = [
        rng.integers(1, 9, 700),               # mixed runs
        np.ones(cap // 2, np.int64),           # run-dense
        np.array([cap]),                       # one run covering everything
        np.array([1]),                         # single element
    ]
    for runs in cases:
        runs = runs.astype(np.int64)
        total = int(runs.sum())
        if total > cap:
            continue
        n_runs = len(runs)
        vals_lo = rng.integers(0, 1 << 32, n_runs, dtype=np.uint64) \
            .astype(np.uint32)
        vals_hi = rng.integers(0, 1 << 32, n_runs, dtype=np.uint64) \
            .astype(np.uint32)
        lo_in = np.zeros(cap, np.uint32)
        hi_in = np.zeros(cap, np.uint32)
        r_in = np.zeros(cap, np.int32)
        lo_in[:n_runs], hi_in[:n_runs] = vals_lo, vals_hi
        r_in[:n_runs] = runs
        lo, hi = jax.jit(lambda l, h, r, n: cf._expand_pass(
            l, h, r, n, cap))(jnp.asarray(lo_in), jnp.asarray(hi_in),
                              jnp.asarray(r_in), jnp.int32(n_runs))
        want_lo = np.repeat(vals_lo, runs)
        want_hi = np.repeat(vals_hi, runs)
        assert (np.asarray(lo)[:total] == want_lo).all()
        assert (np.asarray(hi)[:total] == want_hi).all()
