"""Batched CRC32 (standard reflected polynomial 0xEDB88320), fully parallel.

Analog of the reference's CRC32 batched LLIF (``compute_uncomp_chunk_checksums``,
validated against ``boost::crc_32_type`` — ``examples/standard_crc_checksum.cpp:
1-8,94-107``) and the checksum kernels behind the 5 HLIF checksum modes.

CRC is bytewise-sequential, which is the wrong shape for a TPU.  We exploit its
GF(2)-linearity instead: ``crc0(L || R) = M_{len(R)}(crc0(L)) XOR crc0(R)`` where
``crc0`` is the init-0/no-final-xor CRC and ``M_k`` multiplies by ``x^(8k)`` mod
the polynomial.  With per-level operators ``M_(2^k)`` precomputed as 4x256 lookup
tables (zlib crc32_combine's trick, table form), the whole chunk reduces in a
log-depth binary tree of vectorized gathers.  Ragged chunk sizes cost nothing:
``crc0(zeros || A) == crc0(A)``, so each chunk is right-aligned into its padded
slot and the tree runs over the full static width.

Finally ``CRC32(A) = crc0(A) ^ M_len(0xFFFFFFFF) ^ 0xFFFFFFFF`` recovers the
standard (init 0xFFFFFFFF, final-xor) value, bit-identical to ``binascii.crc32``
/ zlib / boost.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

POLY = 0xEDB88320
MAX_LEVELS = 25  # supports chunks up to 2^25 bytes (32 MiB)


@functools.lru_cache(maxsize=1)
def _tables() -> tuple[np.ndarray, np.ndarray]:
    """(byte_table[256], level_tables[MAX_LEVELS, 4, 256]) as uint32.

    ``byte_table[b]`` = crc0 of the single byte ``b``.
    ``level_tables[k, j, b]`` applies ``M_(2^k)`` (advance by 2^k zero bytes) to
    the 32-bit value ``b << (8 j)``; a full application XORs the 4 lanes.
    """
    # standard reflected CRC table == crc0 of each single byte
    byte_table = np.zeros(256, np.uint32)
    for b in range(256):
        c = np.uint32(b)
        for _ in range(8):
            c = (c >> 1) ^ (POLY if (c & 1) else 0)
        byte_table[b] = c

    def op_tables_from_fn(fn):
        t = np.zeros((4, 256), np.uint32)
        for j in range(4):
            for b in range(256):
                t[j, b] = fn(np.uint32(b) << np.uint32(8 * j))
        return t

    def apply_tables(t, c):
        c = np.uint32(c)
        r = np.uint32(0)
        for j in range(4):
            r ^= t[j, (c >> np.uint32(8 * j)) & np.uint32(0xFF)]
        return r

    # M_1: advance crc by one zero byte
    def advance1(c):
        c = np.uint32(c)
        return byte_table[c & np.uint32(0xFF)] ^ (c >> np.uint32(8))

    levels = np.zeros((MAX_LEVELS, 4, 256), np.uint32)
    levels[0] = op_tables_from_fn(advance1)
    for k in range(1, MAX_LEVELS):
        prev = levels[k - 1]
        levels[k] = op_tables_from_fn(
            lambda c, prev=prev: apply_tables(prev, apply_tables(prev, c)))
    return byte_table, levels


def _apply_level(level_tab: jax.Array, c: jax.Array) -> jax.Array:
    """Vectorized application of one M_(2^k) operator via 4 table gathers."""
    r = level_tab[0, c & 0xFF]
    r = r ^ level_tab[1, (c >> 8) & 0xFF]
    r = r ^ level_tab[2, (c >> 16) & 0xFF]
    r = r ^ level_tab[3, (c >> 24) & 0xFF]
    return r


def crc32_chunk(data: jax.Array, size: jax.Array) -> jax.Array:
    """CRC32 of ``data[:size]`` (one chunk; vmap over the batch axis)."""
    cap = data.shape[0]
    n = 1 << max(1, (cap - 1).bit_length())  # pad capacity to pow2
    byte_table_np, levels_np = _tables()
    byte_table = jnp.asarray(byte_table_np)
    levels = jnp.asarray(levels_np)
    size = size.astype(jnp.int32)

    # right-align: crc0(zeros || A) == crc0(A)
    i = jnp.arange(n, dtype=jnp.int32)
    src = i - (n - size)
    arr = jnp.where(src >= 0, data[jnp.clip(src, 0, cap - 1)], 0)

    v = byte_table[arr.astype(jnp.int32)]
    num_levels = max(1, n.bit_length() - 1)
    for k in range(num_levels):
        left = v[0::2]
        right = v[1::2]
        v = _apply_level(levels[k], left) ^ right
    crc0 = v[0]

    # init/final-xor correction: M_size(0xFFFFFFFF) ^ 0xFFFFFFFF
    c = jnp.uint32(0xFFFFFFFF)
    for k in range(MAX_LEVELS):
        hit = ((size >> k) & 1) == 1
        c = jnp.where(hit, _apply_level(levels[k], c), c)
    return (crc0 ^ c ^ jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)


@jax.jit
def crc32_batch(data: jax.Array, sizes: jax.Array) -> jax.Array:
    """Per-chunk CRC32 of a batch (``compute_uncomp_chunk_checksums`` analog)."""
    return jax.vmap(crc32_chunk)(data, sizes)


def register(batched) -> None:  # imported by tpucomp.formats.register_all
    """CRC32 is not a compressor; it registers no CodecSpec."""
