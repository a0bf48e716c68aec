"""Gzip decompression tests (reference: ``gzip_gpu_decompression.cu``)."""
import gzip as _pygzip
import io

import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import gzip as tgzip
from tpucomp.interop import cpu as interop
from tpucomp.utils import synth


def our_decompress(comp_chunks, out_cap):
    cb = ChunkBatch.from_chunks(comp_chunks)
    out, sizes, stat = tgzip.decompress_batch(cb.data, cb.sizes, out_cap)
    return ([bytes(np.asarray(out[i, : sizes[i]])) for i in range(len(comp_chunks))],
            np.asarray(stat))


def test_zlib_gzip_streams():
    data = {n: v for n, v in {
        "text": synth.text_like(8192).tobytes(),
        "runs": synth.runs(8192).tobytes(),
        "random": synth.random_bytes(2048).tobytes(),
        "empty": b"",
    }.items()}
    comp = [interop.gzip_compress(v) for v in data.values()]
    got, stat = our_decompress(comp, 8192)
    for (name, orig), g, s in zip(data.items(), got, stat):
        if name == "empty":
            continue  # empty deflate body: zlib emits a valid empty final block
        assert s == Status.SUCCESS, f"{name}: {s}"
        assert g == orig, f"mismatch on {name!r}"


def test_gzip_with_filename_header():
    data = synth.text_like(4096).tobytes()
    buf = io.BytesIO()
    with _pygzip.GzipFile(filename="some/file/name.bin", mode="wb",
                          fileobj=buf, mtime=12345) as f:
        f.write(data)
    got, stat = our_decompress([buf.getvalue()], 4096)
    assert stat[0] == Status.SUCCESS and got[0] == data


def test_empty_member():
    comp = interop.gzip_compress(b"")
    got, stat = our_decompress([comp], 64)
    assert stat[0] == Status.SUCCESS and got[0] == b""


def test_crc_corruption_detected():
    data = synth.text_like(2048).tobytes()
    comp = bytearray(interop.gzip_compress(data))
    comp[-6] ^= 0xFF  # flip a CRC byte
    got, stat = our_decompress([bytes(comp)], 2048)
    assert stat[0] == Status.ERROR_CANNOT_DECOMPRESS


def test_get_decompress_size():
    import jax
    data = synth.text_like(5000).tobytes()
    comp = interop.gzip_compress(data)
    cb = ChunkBatch.from_chunks([comp])
    sizes = jax.vmap(tgzip.get_decompress_size)(cb.data, cb.sizes)
    assert int(sizes[0]) == 5000


def test_compression_only_guard():
    from tpucomp import batched
    with pytest.raises(ValueError):
        batched.compress("gzip", ChunkBatch.from_chunks([b"abc"]))
