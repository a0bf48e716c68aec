"""Golden-vector regression for the self-defined containers.

ANS/Bitcomp/Cascaded/GDeflate containers are this project's own formats (the
reference's are closed or unspecified), so nothing external pins their bytes.
These committed frames (``tests/golden/``) guarantee a refactor cannot
silently change a container and orphan previously written frames: every
golden frame must keep decoding bit-exactly, forever.  Regenerate ONLY on a
deliberate, documented container version bump
(``git log tests/golden`` is the format history).
"""
from pathlib import Path

import numpy as np
import pytest

from tpucomp import batched
from tpucomp.chunk import ChunkBatch

GOLDEN = Path(__file__).parent / "golden"
FORMATS = ["ans", "bitcomp", "cascaded", "gdeflate"]


def _load(fmt: str):
    blob = (GOLDEN / f"{fmt}.bin").read_bytes()
    n = int(np.frombuffer(blob[:4], np.int32)[0])
    sizes = np.frombuffer(blob[4:4 + 4 * n], np.int32)
    chunks, off = [], 4 + 4 * n
    for s in sizes:
        chunks.append(blob[off:off + s])
        off += s
    return chunks


@pytest.mark.parametrize("fmt", FORMATS)
def test_golden_frames_decode(fmt):
    raw = (GOLDEN / "input.bin").read_bytes()
    k = len(raw) // 3
    originals = [raw[:k], raw[k:2 * k], raw[2 * k:]]
    comp = _load(fmt)
    cb = ChunkBatch.from_chunks(comp)
    dec, stat = batched.decompress(fmt, cb, k, backend="xla")
    stat = np.asarray(stat)
    sizes = np.asarray(dec.sizes)
    data = np.asarray(dec.data)
    for i, orig in enumerate(originals):
        assert stat[i] == 0, (fmt, i, stat[i])
        assert sizes[i] == len(orig)
        assert data[i, : len(orig)].tobytes() == orig, (fmt, i)
