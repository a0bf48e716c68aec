"""ChunkBatch: the device-resident batched-chunk container.

This is the TPU-native analog of nvCOMP's LLIF calling convention, where a batch is
described by device arrays of per-chunk pointers and sizes
(``doc/lowlevel_c_quickstart.md:3-13``; ``examples/BatchData.h:41-175``).  XLA requires
static shapes, so instead of a ragged pointer array we hold one dense
``uint8[num_chunks, max_chunk_bytes]`` payload padded per chunk, plus a device
``int32[num_chunks]`` vector of actual sizes.  This mirrors exactly what the reference
does for *outputs* (allocate ``GetMaxOutputChunkSize`` per chunk, report actual sizes in
a device array, ``examples/low_level_quickstart_example.cpp:68-98``) — we simply use the
same convention on both sides of the API.

Everything stays on device; compaction to a contiguous byte stream is a separate
gather pass (`compact` / `from_compact`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ceil_div(x, m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ChunkBatch:
    """A batch of independent, variable-size byte chunks with static padded shape.

    Attributes:
      data:  ``uint8[num_chunks, max_chunk_bytes]`` — chunk *i* occupies
             ``data[i, :sizes[i]]``; bytes past the size are zero-padding.
      sizes: ``int32[num_chunks]`` — actual byte count per chunk (may be 0; the
             reference requires zero-byte chunks to work, ``CHANGELOG.md:66``).
    """

    data: jax.Array
    sizes: jax.Array

    # -- pytree protocol ---------------------------------------------------------
    def tree_flatten(self):
        return (self.data, self.sizes), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, sizes = children
        return cls(data=data, sizes=sizes)

    # -- properties --------------------------------------------------------------
    @property
    def num_chunks(self) -> int:
        return self.data.shape[0]

    @property
    def max_chunk_bytes(self) -> int:
        return self.data.shape[1]

    @property
    def total_bytes(self) -> jax.Array:
        return jnp.sum(self.sizes.astype(jnp.int64))

    # -- constructors ------------------------------------------------------------
    @classmethod
    def from_bytes(cls, buf: bytes | np.ndarray, chunk_size: int,
                   max_chunk_bytes: int | None = None) -> "ChunkBatch":
        """Split one contiguous buffer into fixed-size chunks (last may be short).

        The slot stride is padded to a multiple of 8 — the dense-array analog of
        the reference harness padding every chunk to 8-byte alignment
        (``benchmark_template_chunked.cuh:181-183``) so each chunk's slot start
        satisfies every format's ``REQUIRED_ALIGNMENT``.
        """
        arr = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) \
            else np.asarray(buf, dtype=np.uint8).reshape(-1)
        n = max(1, ceil_div(arr.size, chunk_size))
        max_b = round_up(max_chunk_bytes or chunk_size, 8)
        data = np.zeros((n, max_b), dtype=np.uint8)
        sizes = np.zeros((n,), dtype=np.int32)
        for i in range(n):
            piece = arr[i * chunk_size:(i + 1) * chunk_size]
            data[i, :piece.size] = piece
            sizes[i] = piece.size
        return cls(data=jnp.asarray(data), sizes=jnp.asarray(sizes))

    @classmethod
    def from_chunks(cls, chunks: Sequence[bytes | np.ndarray],
                    max_chunk_bytes: int | None = None) -> "ChunkBatch":
        """Build a batch from an explicit list of variable-size chunks."""
        arrs = [np.frombuffer(c, dtype=np.uint8) if isinstance(c, (bytes, bytearray))
                else np.asarray(c, dtype=np.uint8).reshape(-1) for c in chunks]
        max_b = max_chunk_bytes or max((a.size for a in arrs), default=1)
        max_b = round_up(max(max_b, 1), 8)  # 8 B slot alignment, as from_bytes
        data = np.zeros((len(arrs), max_b), dtype=np.uint8)
        sizes = np.zeros((len(arrs),), dtype=np.int32)
        for i, a in enumerate(arrs):
            if a.size > max_b:
                raise ValueError(f"chunk {i} ({a.size} B) exceeds max_chunk_bytes={max_b}")
            data[i, :a.size] = a
            sizes[i] = a.size
        return cls(data=jnp.asarray(data), sizes=jnp.asarray(sizes))

    @classmethod
    def empty(cls, num_chunks: int, max_chunk_bytes: int) -> "ChunkBatch":
        return cls(
            data=jnp.zeros((num_chunks, max_chunk_bytes), dtype=jnp.uint8),
            sizes=jnp.zeros((num_chunks,), dtype=jnp.int32),
        )

    # -- host-side accessors -----------------------------------------------------
    def chunk_list(self) -> list[bytes]:
        """Device→host: return the batch as a list of exact-size byte strings."""
        data = np.asarray(self.data)
        sizes = np.asarray(self.sizes)
        return [data[i, :sizes[i]].tobytes() for i in range(self.num_chunks)]

    def to_bytes(self) -> bytes:
        """Concatenate all chunks (in order) into one contiguous byte string."""
        return b"".join(self.chunk_list())

    # -- device-side transforms ---------------------------------------------------
    def with_padding_zeroed(self) -> "ChunkBatch":
        """Zero out bytes past each chunk's size (defensive normalization)."""
        col = jax.lax.broadcasted_iota(jnp.int32, self.data.shape, 1)
        mask = col < self.sizes[:, None]
        return ChunkBatch(data=jnp.where(mask, self.data, 0), sizes=self.sizes)

    def compact(self) -> tuple[jax.Array, jax.Array]:
        """Gather the ragged chunks into one contiguous ``uint8[total]`` stream.

        Returns ``(flat_padded, offsets)`` where ``offsets[i]`` is the start of chunk
        *i* in the compacted stream and ``flat_padded`` has static shape
        ``num_chunks * max_chunk_bytes`` with valid bytes in ``[: offsets[-1]+sizes[-1]]``.
        """
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(self.sizes)[:-1].astype(jnp.int32)])
        total_cap = self.num_chunks * self.max_chunk_bytes
        # For each output position, find owning chunk via searchsorted on offsets.
        pos = jnp.arange(total_cap, dtype=jnp.int32)
        chunk_id = jnp.searchsorted(offsets + self.sizes, pos, side="right")
        chunk_id = jnp.clip(chunk_id, 0, self.num_chunks - 1)
        local = pos - offsets[chunk_id]
        valid = local < self.sizes[chunk_id]
        flat = jnp.where(valid, self.data[chunk_id, jnp.clip(local, 0, self.max_chunk_bytes - 1)], 0)
        return flat, offsets


def plan_chunks(total_bytes: int, chunk_size: int) -> list[tuple[int, int]]:
    """File→manifest planner: list of (offset, size) covering ``total_bytes``."""
    if total_bytes == 0:
        return [(0, 0)]
    return [(o, min(chunk_size, total_bytes - o))
            for o in range(0, total_bytes, chunk_size)]


def plan_chunks_page_prefixed(buf: bytes) -> list[tuple[int, int]]:
    """Planner for page-size-prefixed inputs (reference ``-s`` mode,
    ``benchmark_template_chunked.cuh:294-310``): the file is a sequence of
    ``uint64 page_size`` prefixes followed by that many bytes; each page is a chunk."""
    out = []
    off = 0
    n = len(buf)
    while off + 8 <= n:
        size = int.from_bytes(buf[off:off + 8], "little")
        off += 8
        if off + size > n:
            break
        out.append((off, size))
        off += size
    return out
