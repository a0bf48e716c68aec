"""Gzip (RFC-1952) — decompression-only, as in the reference.

Analog of the Gzip LLIF: "Gzip low-level interface only provides decompression"
(``README.md:16``; ``examples/gzip_gpu_decompression.cu:66-141`` proves zlib
``deflateInit2(..., 15|16, ...)`` streams round-trip).  Parses the member header
(optional FEXTRA/FNAME/FCOMMENT/FHCRC fields), hands the deflate body to
:mod:`tpucomp.formats.deflate` at the computed offset, then verifies the CRC32
and ISIZE trailer with the batched CRC32 kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpucomp.constants import Status
from tpucomp.formats import crc32 as c32
from tpucomp.formats import deflate as _deflate

FTEXT, FHCRC, FEXTRA, FNAME, FCOMMENT = 1, 2, 4, 8, 16


def max_compressed_chunk_size(max_chunk_bytes: int, opts=None) -> int:
    return _deflate.max_compressed_chunk_size(max_chunk_bytes) + 1024


def parse_member(comp: jax.Array, comp_size: jax.Array):
    """Parse one member's header/trailer -> (off, deflate_end, stored_crc,
    isize, header_ok).  Vmappable; shared by the XLA and Pallas decode paths."""
    cap = comp.shape[0]
    comp_size = comp_size.astype(jnp.int32)
    pos32 = jnp.arange(cap, dtype=jnp.int32)
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)
    big = jnp.int32(1 << 30)

    ok = comp_size >= 18  # 10 header + >=0 body + 8 trailer
    ok = jnp.logical_and(ok, jnp.logical_and(gb(0) == 0x1F, gb(1) == 0x8B))
    ok = jnp.logical_and(ok, gb(2) == 8)  # CM = deflate
    flg = gb(3)
    # bytes 4-9: MTIME(4) XFL OS
    off = jnp.int32(10)

    # FEXTRA: u16 XLEN + XLEN bytes
    xlen = gb(off) | (gb(off + 1) << 8)
    off = jnp.where(flg & FEXTRA, off + 2 + xlen, off)

    def skip_zstring(off, enabled):
        # first NUL at or after off
        is_z = jnp.logical_and(comp == 0, pos32 >= off)
        zpos = jnp.min(jnp.where(is_z, pos32, big))
        return jnp.where(enabled, zpos + 1, off), jnp.logical_or(
            jnp.logical_not(enabled), zpos < big)

    off, ok_n = skip_zstring(off, (flg & FNAME) != 0)
    ok = jnp.logical_and(ok, ok_n)
    off, ok_c = skip_zstring(off, (flg & FCOMMENT) != 0)
    ok = jnp.logical_and(ok, ok_c)
    off = jnp.where(flg & FHCRC, off + 2, off)
    ok = jnp.logical_and(ok, off + 8 <= comp_size)

    deflate_end = jnp.maximum(comp_size - 8, 0)

    # trailer reads via ONE dynamic_slice (uint32, not int64: i64 is
    # software-emulated on TPU; and per-byte gathers here measured as a 7x
    # whole-program stall when combined with the Pallas deflate kernel)
    tr = jax.lax.dynamic_slice(
        comp, (jnp.clip(comp_size - 8, 0, comp.shape[0] - 8),), (8,)
    ).astype(jnp.uint32)

    def u32_of(b0, b1, b2, b3):
        return b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)

    stored_crc = u32_of(tr[0], tr[1], tr[2], tr[3])
    isize = u32_of(tr[4], tr[5], tr[6], tr[7])
    return off, deflate_end, stored_crc, isize, ok


def decode_chunk(comp: jax.Array, comp_size: jax.Array,
                 out_cap: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one gzip member -> (out uint8[out_cap], out_size, status)."""
    off, deflate_end, stored_crc, isize, ok = parse_member(comp, comp_size)
    out, osz, dstat = _deflate.decode_chunk(
        comp, deflate_end, out_cap, start_byte=jnp.where(ok, off, 0))

    crc = c32.crc32_chunk(out, osz)

    ok = jnp.logical_and(ok, dstat == Status.SUCCESS)
    ok = jnp.logical_and(ok, crc == stored_crc)
    ok = jnp.logical_and(ok, osz.astype(jnp.uint32) == isize)

    out_size = jnp.where(ok, osz, 0).astype(jnp.int32)
    out = jnp.where(jnp.arange(out_cap, dtype=jnp.int32) < out_size, out, 0)
    status = jnp.where(ok, Status.SUCCESS, Status.ERROR_CANNOT_DECOMPRESS)
    return out, out_size, status.astype(jnp.int32)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    """ISIZE from the trailer (exact for members < 4 GiB)."""
    cap = comp.shape[0]
    gb = lambda o: comp[jnp.clip(o, 0, cap - 1)].astype(jnp.int32)
    o = comp_size - 4
    isize = (gb(o) | (gb(o + 1) << 8) | (gb(o + 2) << 16) | (gb(o + 3) << 24))
    ok = jnp.logical_and(comp_size >= 18,
                         jnp.logical_and(gb(0) == 0x1F, gb(1) == 0x8B))
    return jnp.where(ok, isize, 0).astype(jnp.int32)


def _no_compress(data, sizes, opts, out_cap):
    raise NotImplementedError("gzip LLIF provides decompression only (README.md:16)")


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int):
    return jax.vmap(lambda c, s: decode_chunk(c, s, out_cap))(comp, comp_sizes)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="gzip",
        compress_batch=_no_compress,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=None,
        get_decompress_size=get_decompress_size,
        decompression_only=True,
    ))
