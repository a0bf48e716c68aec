"""GDeflate-analog tests: algo ladder, 64K chunks, deflate-core round trips."""
import numpy as np
import pytest

from tpucomp.chunk import ChunkBatch
from tpucomp.constants import Status
from tpucomp.formats import gdeflate
from tpucomp.interop import cpu as interop
from tpucomp.utils import synth


@pytest.mark.parametrize("algo", [0, 2])
def test_roundtrip(algo):
    opts = gdeflate.GdeflateOpts(algo=algo)
    data = [synth.text_like(8192).tobytes(), synth.runs(8192).tobytes(), b"x"]
    cb = ChunkBatch.from_chunks(data, max_chunk_bytes=8192)
    cap = gdeflate.max_compressed_chunk_size(8192, opts)
    out, osz, ost = gdeflate.compress_batch(cb.data, cb.sizes, opts, cap)
    assert all(np.asarray(ost) == Status.SUCCESS)
    dec, dsz, dst = gdeflate.decompress_batch(out, osz, 8192)
    got = [bytes(np.asarray(dec[i, :dsz[i]])) for i in range(len(data))]
    assert got == data
    # entropy core is standard RFC-1951: zlib must inflate it
    for i, orig in enumerate(data):
        frame = bytes(np.asarray(out[i, :osz[i]]))
        assert interop.deflate_decompress(frame) == orig


def test_entropy_only_no_matches():
    # algo 2 must not shrink repetitive data much beyond entropy coding
    data = b"AB" * 4096
    cb = ChunkBatch.from_chunks([data])
    cap0 = gdeflate.max_compressed_chunk_size(8192, gdeflate.GdeflateOpts(0))
    out0, osz0, _ = gdeflate.compress_batch(cb.data, cb.sizes,
                                            gdeflate.GdeflateOpts(0), cap0)
    out2, osz2, _ = gdeflate.compress_batch(cb.data, cb.sizes,
                                            gdeflate.GdeflateOpts(2), cap0)
    assert int(osz0[0]) < int(osz2[0])  # LZ mode strictly better on AB-repeat
