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


@functools.lru_cache(maxsize=1)
def _columns() -> tuple[np.ndarray, np.ndarray]:
    """GF(2) column form of the operators, for gather-free vector evaluation.

    ``word_cols[j]`` = crc0 of the 4-byte message whose little-endian u32
    image has only bit ``j`` set (byte i of the message = word bits 8i..8i+7).
    ``level_cols[k, j]`` = M_(2^k) applied to ``1 << j``.

    Every operator here is GF(2)-linear, so applying it to a vector of words
    is 32 constant-column mask-and-XOR steps — pure VPU elementwise work.
    Table gathers (the round-3 form) lower to serial dynamic-slices on TPU
    and measured ~0.1 GB/s; this form removes every gather from the hot path.
    """
    byte_table, levels = _tables()

    def apply_tables(t, c):
        c = np.uint32(c)
        r = np.uint32(0)
        for j in range(4):
            r ^= t[j, (c >> np.uint32(8 * j)) & np.uint32(0xFF)]
        return r

    def advance_zeros(c, nbytes):
        # apply M_nbytes via the power-of-two level tables
        k = 0
        while nbytes:
            if nbytes & 1:
                c = apply_tables(levels[k], c)
            nbytes >>= 1
            k += 1
        return c

    word_cols = np.zeros(32, np.uint32)
    for j in range(32):
        byte_i, bit_t = j >> 3, j & 7
        # crc0 of [0]*byte_i + [1<<bit_t] + [0]*(3-byte_i)
        word_cols[j] = advance_zeros(byte_table[1 << bit_t], 3 - byte_i)
    level_cols = np.zeros((MAX_LEVELS, 32), np.uint32)
    for k in range(MAX_LEVELS):
        for j in range(32):
            level_cols[k, j] = apply_tables(levels[k], np.uint32(1) << j)

    # inverse advance operators: M_(-2^k) — lets the chunk tree run LEFT-
    # aligned (no per-chunk alignment gather) and divide the trailing
    # zero-padding back out with a scalar correction loop
    def gf2_apply(cols, x):
        r = np.uint32(0)
        for j in range(32):
            if (int(x) >> j) & 1:
                r ^= cols[j]
        return r

    def gf2_compose(a, b):
        return np.array([gf2_apply(a, b[j]) for j in range(32)], np.uint32)

    def gf2_invert(cols):
        # solve M X = I over GF(2); rows as 64-bit ints [M | I]
        rows = []
        for i in range(32):
            m = 0
            for j in range(32):
                m |= ((int(cols[j]) >> i) & 1) << j
            rows.append(m | (1 << (32 + i)))
        for col in range(32):
            piv = next(r for r in range(col, 32) if (rows[r] >> col) & 1)
            rows[col], rows[piv] = rows[piv], rows[col]
            for r in range(32):
                if r != col and (rows[r] >> col) & 1:
                    rows[r] ^= rows[col]
        inv = np.zeros(32, np.uint32)
        for j in range(32):
            v = 0
            for i in range(32):
                v |= ((rows[i] >> (32 + j)) & 1) << i
            inv[j] = v
        return inv

    inv1 = gf2_invert(level_cols[0])
    inv_cols = np.zeros((MAX_LEVELS, 32), np.uint32)
    inv_cols[0] = inv1
    for k in range(1, MAX_LEVELS):
        inv_cols[k] = gf2_compose(inv_cols[k - 1], inv_cols[k - 1])
    return word_cols, level_cols, inv_cols


def _apply_cols(cols: np.ndarray, w: jax.Array) -> jax.Array:
    """XOR of ``cols[j]`` over the set bits of uint32 vector ``w``."""
    r = jnp.zeros_like(w)
    for j in range(32):
        mask = jnp.uint32(0) - ((w >> j) & jnp.uint32(1))
        r = r ^ (mask & jnp.uint32(int(cols[j])))
    return r


def crc32_chunk(data: jax.Array, size: jax.Array) -> jax.Array:
    """CRC32 of ``data[:size]`` (one chunk; vmap over the batch axis)."""
    cap = data.shape[0]
    n = 1 << max(2, (cap - 1).bit_length())  # pad capacity to pow2 (>= 4)
    word_cols, level_cols, inv_cols = _columns()
    size = size.astype(jnp.int32)

    # LEFT-aligned: mask instead of the right-align gather (a dynamic-shift
    # gather only folds away when size == cap; with ragged sizes it measured
    # 13x the whole checksum).  The trailing zero padding is divided back
    # out below with the inverse-advance operators.
    i = jnp.arange(n, dtype=jnp.int32)
    arr = jnp.where(i < size,
                    jnp.pad(data, (0, n - cap)) if n > cap else data[:n], 0)

    # pack 4 bytes -> one LE u32 word, then evaluate crc0 per word in column
    # form (32 mask-and-XOR steps; no gathers)
    b = arr.astype(jnp.uint32).reshape(n // 4, 4)
    w = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    v = _apply_cols(word_cols, w)

    # log-depth combine over words: level k shifts the left half by 2^k bytes
    num_levels = max(0, (n // 4).bit_length() - 1)
    for k in range(num_levels):
        left = v[0::2]
        right = v[1::2]
        v = _apply_cols(level_cols[k + 2], left) ^ right
    crc0 = v[0]

    # divide out the n - size trailing zero bytes: crc0(A || 0^k) -> crc0(A)
    kpad = jnp.int32(n) - size
    for k in range(MAX_LEVELS):
        hit = ((kpad >> k) & 1) == 1
        crc0 = jnp.where(hit, _apply_cols(inv_cols[k], crc0), crc0)

    # init/final-xor correction: M_size(0xFFFFFFFF) ^ 0xFFFFFFFF (column
    # form — the table-gather form triggers a 7x whole-program stall when it
    # shares an XLA program with a Pallas kernel and other gathers)
    c = jnp.uint32(0xFFFFFFFF)
    for k in range(MAX_LEVELS):
        hit = ((size >> k) & 1) == 1
        c = jnp.where(hit, _apply_cols(level_cols[k], c), c)
    return (crc0 ^ c ^ jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)


@jax.jit
def crc32_batch(data: jax.Array, sizes: jax.Array) -> jax.Array:
    """Per-chunk CRC32 of a batch (``compute_uncomp_chunk_checksums`` analog)."""
    return jax.vmap(crc32_chunk)(data, sizes)


def register(batched) -> None:  # imported by tpucomp.formats.register_all
    """CRC32 is not a compressor; it registers no CodecSpec."""
