"""Storage pipeline: durable compressed-frame write/read with aligned framing.

Analog of the reference's GPUDirect-Storage example (``examples/nvcomp_gds.cu``):
compress -> 4 KiB-aligned write -> read -> decompress -> verify
(``:104`` O_DIRECT, ``:136-141`` 4 KiB padding, ``:147-174`` cuFile handles).
TPUs have no cuFile equivalent; the analog is host-side async file I/O feeding
device transfers, with the same 4 KiB alignment discipline so direct-I/O paths
(O_DIRECT or object-store block layers) stay efficient.

Frames are self-describing (``tpucomp.manager`` headers), so a file written here
can be read back and decompressed by ``create_manager`` with no side metadata —
the checkpoint/resume story of this domain (SURVEY.md §5).
"""
from __future__ import annotations

import os
from concurrent.futures import Future, ThreadPoolExecutor

import numpy as np

ALIGN = 4096

_pool = ThreadPoolExecutor(max_workers=4)


def _pad(n: int) -> int:
    return -(-n // ALIGN) * ALIGN


def write_frame(path: str, frame, sync: bool = True) -> Future | None:
    """Write a compressed frame padded to 4 KiB alignment.

    The frame's own header carries its exact size, so padding is transparent to
    :func:`read_frame`.  With ``sync=False`` the write happens on a background
    thread (the ``cuFileWrite``-async analog) and a Future is returned.
    """
    buf = np.asarray(frame, np.uint8)
    padded = np.zeros(_pad(buf.size), np.uint8)
    padded[: buf.size] = buf

    def _write():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(padded.tobytes())
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    if sync:
        _write()
        return None
    return _pool.submit(_write)


def read_frame(path: str) -> np.ndarray:
    """Read an aligned frame file and trim it to the exact frame size."""
    with open(path, "rb") as f:
        raw = np.frombuffer(f.read(), np.uint8)
    from tpucomp.manager import _parse_header
    hdr = _parse_header(raw)
    return raw[: hdr["total_compressed_size"]]


def save_compressed(path: str, data, fmt: str = "lz4", **manager_kwargs):
    """One-shot: compress ``data`` with a Manager and persist the frame."""
    from tpucomp.manager import Manager
    mgr = Manager(fmt, **manager_kwargs)
    frame = np.asarray(mgr.compress(data))
    write_frame(path, frame)
    return len(frame)


def load_compressed(path: str) -> bytes:
    """One-shot: read a frame and decompress via ``create_manager``."""
    from tpucomp.manager import create_manager
    frame = read_frame(path)
    mgr = create_manager(frame)
    return bytes(np.asarray(mgr.decompress(frame)))
