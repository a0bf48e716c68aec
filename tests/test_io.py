"""Storage pipeline tests (nvcomp_gds.cu analog): write/read/decompress/verify."""
import os

import numpy as np

from tpucomp import io as tio
from tpucomp.utils import synth


def test_roundtrip_via_files(tmp_path):
    data = synth.mixed_corpus(100_000, seed=31).tobytes()
    path = str(tmp_path / "frame.tpuc")
    n = tio.save_compressed(path, data, fmt="lz4", chunk_size=16384)
    assert os.path.getsize(path) % tio.ALIGN == 0
    assert os.path.getsize(path) >= n
    assert tio.load_compressed(path) == data


def test_async_write(tmp_path):
    from tpucomp.manager import Manager
    data = synth.text_like(50_000).tobytes()
    frame = np.asarray(Manager("snappy", chunk_size=8192).compress(data))
    path = str(tmp_path / "async.tpuc")
    fut = tio.write_frame(path, frame, sync=False)
    fut.result(timeout=30)
    assert tio.load_compressed(path) == data


def test_format_sniffing_from_disk(tmp_path):
    # the frame on disk is self-describing: no format passed to the reader
    for fmt in ("lz4", "cascaded", "ans"):
        data = synth.low_cardinality_ints(32768).tobytes()
        path = str(tmp_path / f"{fmt}.tpuc")
        tio.save_compressed(path, data, fmt=fmt, chunk_size=8192)
        assert tio.load_compressed(path) == data
