"""GDeflate-analog codec: the deflate-variant API surface.

Analog of ``nvcompBatchedGdeflate*`` (``benchmarks/benchmark_gdeflate_chunked.cu:
32,42,55-58``: opts ``{int algo}`` with 0 high-throughput / 1 high-compression /
2 entropy-only, max 64 KiB chunks; CPU companion library,
``examples/gdeflate_cpu_compression.cu:30,66-72``).

GDeflate proper is RFC-1951 Deflate with the bitstream reordered into 32
interleaved SIMD lanes per the Microsoft DirectStorage 1.1 / RTX-IO container.
That exact interleaving layout is specified only by the closed
``libnvcomp_gdeflate_cpu.so`` (no spec text or oracle library exists in this
container), so this module provides the *behavioral* surface on the same
entropy core instead: algo 0/1 map to the shared deflate kernels (standard
RFC-1951 output — itself already SIMD-decoded here, which is what the
interleaving exists to enable on GPUs), and algo 2 is entropy-only (Huffman
literals, no LZ matches).  The lane-interleaved container can be layered on
once a conformance oracle is available; the inventory records this gap
explicitly (SURVEY.md §2.1 row 4).
"""
from __future__ import annotations

import dataclasses
import functools

import jax

from tpucomp.formats import deflate as _deflate


@dataclasses.dataclass(frozen=True)
class GdeflateOpts:
    """Analog of ``nvcompBatchedGdeflateOpts_t{ int algo }``.

    0 = high-throughput (default), 1 = high-compression, 2 = entropy-only.
    """

    algo: int = 0


DEFAULT_OPTS = GdeflateOpts()
MAX_CHUNK = 1 << 16  # 64 KiB window formats (CHANGELOG.md:128,134)


def max_compressed_chunk_size(max_chunk_bytes: int,
                              opts: GdeflateOpts = DEFAULT_OPTS) -> int:
    return _deflate.max_compressed_chunk_size(min(max_chunk_bytes, MAX_CHUNK))


def encode_chunk(data: jax.Array, size: jax.Array, opts: GdeflateOpts,
                 out_cap: int):
    d_opts = _deflate.DeflateOpts(algo=opts.algo)
    return _deflate.encode_chunk(data, size, d_opts, out_cap)


def decode_chunk(comp: jax.Array, comp_size: jax.Array, out_cap: int):
    return _deflate.decode_chunk(comp, comp_size, out_cap)


def get_decompress_size(comp: jax.Array, comp_size: jax.Array) -> jax.Array:
    return _deflate.get_decompress_size(comp, comp_size)


@functools.partial(jax.jit, static_argnames=("opts", "out_cap"))
def compress_batch(data, sizes, opts: GdeflateOpts, out_cap: int):
    return jax.vmap(lambda d, s: encode_chunk(d, s, opts, out_cap))(data, sizes)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def decompress_batch(comp, comp_sizes, out_cap: int):
    return _deflate.decompress_batch(comp, comp_sizes, out_cap)


def register(batched) -> None:
    batched.register(batched.CodecSpec(
        name="gdeflate",
        compress_batch=compress_batch,
        decompress_batch=decompress_batch,
        max_compressed_chunk_size=max_compressed_chunk_size,
        default_opts=DEFAULT_OPTS,
        get_decompress_size=get_decompress_size,
    ))
