"""Pallas Zstandard decoder vs python-zstandard and the XLA path.

Interpreter mode on CPU (hermetic); the same kernel compiles for real on the
TPU backend (``bench.py --codec zstd --backend pallas``)."""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import zstd as fzstd
from tpucomp.interop import cpu as interop
from tpucomp.ops.pallas import zstd_decode
from tpucomp.utils import synth

HAVE = interop.available().get("zstd", False)


def _decode(chunks: list[bytes], out_cap: int):
    cb = ChunkBatch.from_chunks(chunks)
    out, osz, stat = zstd_decode.decompress_batch(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


def _raws():
    rng = np.random.default_rng(7)
    return [
        b"hello zstd, hello zstd, hello zstd! " * 30,
        bytes(rng.integers(0, 4, 3000, dtype=np.uint8)),   # FSE-heavy
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # raw blocks
        b"\x00" * 3000,                                    # RLE block
        b"ab" * 1200,
        synth.mixed_corpus(8000, seed=3).tobytes(),
        b"x",
        b"",
    ]


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_zstandard_frames_bit_exact(level):
    raws = _raws()
    comp = [interop.zstd_compress(r, level=level) for r in raws]
    out, osz, stat = _decode(comp, 8192)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (level, i, stat[i])
        assert osz[i] == len(r), (level, i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, (level, i)


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_multiblock_64k_chunks():
    """> 1 block per frame (zstd block cap 128 KiB; use a big window corpus),
    plus treeless-literal repeats across blocks at high levels."""
    buf = synth.mixed_corpus(300_000, seed=11).tobytes()
    comp = interop.zstd_compress(buf, level=6)
    out, osz, stat = _decode([comp], 1 << 19)
    assert stat[0] == Status.SUCCESS
    assert osz[0] == len(buf)
    assert out[0, :len(buf)].tobytes() == buf


def test_own_encoder_round_trip():
    buf = synth.mixed_corpus(60_000, seed=5).tobytes()
    cb = ChunkBatch.from_bytes(buf, chunk_size=8192)
    cout, csz, cstat = fzstd.compress_batch(
        cb.data, cb.sizes, fzstd.DEFAULT_OPTS,
        fzstd.max_compressed_chunk_size(cb.max_chunk_bytes))
    assert (np.asarray(cstat) == 0).all()
    cout, csz = np.asarray(cout), np.asarray(csz)
    comp = [cout[i, :csz[i]].tobytes() for i in range(cb.num_chunks)]
    out, osz, stat = _decode(comp, 8192)
    sizes = np.asarray(cb.sizes)
    for i in range(cb.num_chunks):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == sizes[i]
    assert out.reshape(-1)[:len(buf)].tobytes() == buf


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_matches_xla_path_on_valid_frames():
    rng = np.random.default_rng(3)
    raws = [bytes(rng.integers(0, k, 2000, dtype=np.uint8)) for k in (2, 8, 256)]
    comp = [interop.zstd_compress(r, level=5) for r in raws]
    cb = ChunkBatch.from_chunks(comp)
    p = list(map(np.asarray, zstd_decode.decompress_batch(
        cb.data, cb.sizes, 2048, interpret=True)))
    x = list(map(np.asarray, fzstd.decompress_batch(cb.data, cb.sizes, 2048)))
    assert (p[2] == x[2]).all(), (p[2], x[2])
    assert (p[1] == x[1]).all()
    assert (p[0] == x[0]).all()


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_corrupt_inputs_error_not_crash():
    rng = np.random.default_rng(9)
    good = interop.zstd_compress(b"corrupt me " * 50, level=3)
    bad_magic = b"\x00" + good[1:]
    truncated = good[:12]
    flipped = bytearray(good)
    flipped[len(flipped) // 2] ^= 0xFF
    bad = [
        bad_magic,
        truncated,
        bytes(flipped),
        bytes(rng.integers(0, 256, 96, dtype=np.uint8)),
        b"",
    ]
    out, osz, stat = _decode(bad, 4096)
    for i in range(len(bad)):
        if stat[i] != Status.SUCCESS:
            assert osz[i] == 0
    assert stat[0] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[1] == Status.ERROR_CANNOT_DECOMPRESS
    assert stat[4] == Status.ERROR_CANNOT_DECOMPRESS


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_output_buffer_too_small():
    comp = interop.zstd_compress(b"tpucomp " * 600)
    out, osz, stat = _decode([comp], 1024)
    assert stat[0] == Status.ERROR_OUTPUT_BUFFER_TOO_SMALL
    assert osz[0] == 0


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_vmem_gate_kernel_at_1mib_fallback_above():
    """The batched dispatch gates the kernel on a VMEM-fit estimate: 1 MiB
    chunks decode on the kernel (TPU-verified bit-exact vs zstd-6); frames
    beyond the budget route to the XLA program transparently."""
    from tpucomp.ops import pallas as pk
    # 1 MiB: inside the gate -> kernel path (interpreter here)
    buf = synth.mixed_corpus(1 << 20, seed=2).tobytes()
    comp = interop.zstd_compress(buf, level=3)
    cb = ChunkBatch.from_chunks([comp])
    out, osz, stat = map(np.asarray,
                         pk.PALLAS_DECODERS["zstd"](cb.data, cb.sizes,
                                                    1 << 20))
    assert stat[0] == Status.SUCCESS
    assert osz[0] == len(buf)
    assert out[0, :len(buf)].tobytes() == buf
    # 4 MiB out_cap: beyond the VMEM budget -> XLA fallback, same results
    buf2 = synth.mixed_corpus(2 << 20, seed=3).tobytes()
    comp2 = interop.zstd_compress(buf2, level=3)
    cb2 = ChunkBatch.from_chunks([comp2])
    out2, osz2, stat2 = map(np.asarray,
                            pk.PALLAS_DECODERS["zstd"](cb2.data, cb2.sizes,
                                                       4 << 20))
    assert stat2[0] == Status.SUCCESS
    assert out2[0, :len(buf2)].tobytes() == buf2


# =====================================================================================
# predefined-FSE encoder (zstd_encode — the TPU-side compress path)
# =====================================================================================

def _encode(chunks, out_cap=None):
    from tpucomp.ops.pallas import zstd_encode
    cb = ChunkBatch.from_chunks(chunks)
    cap = out_cap or fzstd.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = zstd_encode.compress_batch(
        cb.data, cb.sizes, cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_encode_zstandard_decompresses_bit_exact():
    """The strongest oracle: frames decode with python-zstandard, covering
    raw-literal blocks, rep-offset-1 codes, the raw-block rewrite
    (incompressible), RLE-like periods, and zero/one-byte chunks."""
    chunks = _raws()
    out, osz, stat = _encode(chunks)
    for i, c in enumerate(chunks):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        got = interop.zstd_decompress(out[i, :osz[i]].tobytes(), len(c))
        assert got == c, i


def test_encode_own_decoders_roundtrip():
    """XLA decoder and the Pallas decode kernel both read the frames."""
    chunks = [c for c in _raws() if c]
    out, osz, stat = _encode(chunks)
    comp = [out[i, :osz[i]].tobytes() for i in range(len(chunks))]
    cb = ChunkBatch.from_chunks(comp)
    cap = max(len(c) for c in chunks)
    for path in (
            lambda: fzstd.decompress_batch(cb.data, cb.sizes, cap),
            lambda: zstd_decode.decompress_batch(cb.data, cb.sizes, cap,
                                                 interpret=True)):
        o, z, st = map(np.asarray, path())
        for i, c in enumerate(chunks):
            assert st[i] == Status.SUCCESS, (i, st[i])
            assert z[i] == len(c)
            assert o[i, :len(c)].tobytes() == c, i


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_encode_repeat_offset_and_ratio_sanity():
    """Strided data must use rep-offset codes (ratio well above the
    no-rep bound) and still decode with the reference decoder."""
    # period-16 stride with noise every period -> every match offset 16
    base = (np.arange(16, dtype=np.uint8) * 7 + 3).tobytes()
    raw = b"".join(base + bytes([i & 0xFF]) for i in range(1500))
    out, osz, stat = _encode([raw])
    assert stat[0] == Status.SUCCESS
    got = interop.zstd_decompress(out[0, :osz[0]].tobytes(), len(raw))
    assert got == raw
    assert len(raw) / osz[0] > 4.0, osz[0]


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_encode_sequence_overflow_degrades_gracefully():
    """More matches than the SMEM triple buffer holds: the walk stops
    matching and the tail rides as literals — valid frame, no error."""
    rng = np.random.default_rng(5)
    # 4-byte matches back to back: abABabCDabEF... rarely merging
    parts = []
    for _ in range(12000):
        parts.append(b"abcd")
        parts.append(rng.integers(0, 256, 2, dtype=np.uint8).tobytes())
    raw = b"".join(parts)[:65536]
    out, osz, stat = _encode([raw])
    assert stat[0] == Status.SUCCESS
    got = interop.zstd_decompress(out[0, :osz[0]].tobytes(), len(raw))
    assert got == raw


def test_encode_backend_dispatch_and_large_chunk_fallback():
    """PALLAS_ENCODERS['zstd'] exists; above the 64 KiB kernel cap it
    dispatches to the XLA multi-block encoder (checked via frame size)."""
    from tpucomp.ops import pallas as pk
    assert "zstd" in pk.PALLAS_ENCODERS
    raw = synth.mixed_corpus(100_000, seed=9).tobytes()
    cb = ChunkBatch.from_chunks([raw])
    cap = fzstd.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = map(np.asarray, pk.PALLAS_ENCODERS["zstd"](
        cb.data, cb.sizes, None, cap))
    assert stat[0] == Status.SUCCESS
    o, z, st = map(np.asarray,
                   fzstd.decompress_batch(
                       ChunkBatch.from_chunks(
                           [out[0, :osz[0]].tobytes()]).data,
                       np.array([osz[0]]), 100_000))
    assert st[0] == Status.SUCCESS
    assert o[0, :len(raw)].tobytes() == raw


# ---------------------------------------------------------------------------
# big-regime decoder (decompress_batch_big): windowed HBM executor for the
# reference's 16 MB zstd chunk max (/root/reference/CHANGELOG.md:55;
# benchmarks/benchmark_zstd_chunked.cu:54-56).  Interpreter mode only covers
# the plumbing on small frames (the serial walk is infeasible to emulate at
# MB scale); tpu_recovery_run.sh / bench drive the multi-MB regime on silicon.
# ---------------------------------------------------------------------------

def _decode_big(chunks: list[bytes], out_cap: int):
    cb = ChunkBatch.from_chunks(chunks)
    out, osz, stat = zstd_decode.decompress_batch_big(
        cb.data, cb.sizes, out_cap, interpret=True)
    return np.asarray(out), np.asarray(osz), np.asarray(stat)


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_big_path_small_frames_bit_exact():
    raws = _raws()
    comp = [interop.zstd_compress(r, level=3) for r in raws]
    out, osz, stat = _decode_big(comp, 8192)
    for i, r in enumerate(raws):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        assert osz[i] == len(r), (i, osz[i], len(r))
        assert out[i, :len(r)].tobytes() == r, i


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_big_path_corrupt_input_yields_status():
    good = interop.zstd_compress(synth.mixed_corpus(4000, seed=9).tobytes())
    variants = [good]
    for cut in (1, 4, len(good) // 2, len(good) - 1):
        variants.append(good[:cut])
    b = bytearray(good)
    b[len(good) // 3] ^= 0x40
    variants.append(bytes(b))
    out, osz, stat = _decode_big(variants, 8192)
    assert stat[0] == Status.SUCCESS
    legal = {int(Status.SUCCESS), int(Status.ERROR_CANNOT_DECOMPRESS),
             int(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL)}
    for i in range(len(variants)):
        assert int(stat[i]) in legal, (i, stat[i])
        if stat[i] != Status.SUCCESS:
            assert osz[i] == 0, i


@pytest.mark.skipif(not HAVE, reason="python-zstandard missing")
def test_encode_speed_rung_zstandard_bit_exact():
    """The predefined-FSE speed rung (exact_entropy=False) skips the hist
    walk but must still emit valid frames for every edge case."""
    from tpucomp.ops.pallas import zstd_encode
    chunks = _raws()
    cb = ChunkBatch.from_chunks(chunks)
    cap = fzstd.max_compressed_chunk_size(cb.max_chunk_bytes)
    out, osz, stat = map(np.asarray, zstd_encode.compress_batch(
        cb.data, cb.sizes, cap, interpret=True, exact_entropy=False))
    for i, c in enumerate(chunks):
        assert stat[i] == Status.SUCCESS, (i, stat[i])
        got = interop.zstd_decompress(out[i, :osz[i]].tobytes(), len(c))
        assert got == c, i
