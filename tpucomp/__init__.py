"""tpucomp — TPU-native batched lossless compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of NVIDIA nvCOMP
(see SURVEY.md): batched chunk-parallel codecs (LZ4, Snappy, Cascaded, rANS,
Deflate/Gzip/GDeflate, Zstd, Bitcomp-style, CRC32), a low-level batched API
over device-resident size/status arrays, a high-level Manager with a
self-describing frame format, dedicated Pallas/Mosaic kernels for the hot
decode/encode paths (``tpucomp.ops.pallas``), and scaling over multi-chip
meshes via shard_map.
"""
import jax as _jax

# Lossless integer codecs need true 64-bit integer types (LONGLONG/ULONGLONG
# element support, 64-bit frame-of-reference minima).  JAX downcasts to 32-bit
# unless x64 is enabled, which would silently corrupt data — so the library
# requires it.  Hot kernels still use 32-bit internally where possible.
_jax.config.update("jax_enable_x64", True)

# Opt-in persistent XLA compilation cache (the production analog of the
# reference shipping precompiled kernels in libnvcomp.so): first use of a
# kernel geometry pays the compile once per machine, not once per process.
# Off by default so benchmarks keep recording honest cold-compile numbers.
import os as _os

_cache_dir = _os.environ.get("TPUCOMP_COMPILE_CACHE")
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpucomp.constants import (
    DEFAULT_CHUNK_SIZE,
    ElementType,
    MAX_ALLOWED_CHUNK_SIZE,
    REQUIRED_ALIGNMENT,
    Status,
)
from tpucomp.chunk import ChunkBatch, plan_chunks, plan_chunks_page_prefixed

__version__ = "0.5.0"

__all__ = [
    "ChunkBatch",
    "DEFAULT_CHUNK_SIZE",
    "ElementType",
    "MAX_ALLOWED_CHUNK_SIZE",
    "REQUIRED_ALIGNMENT",
    "Status",
    "plan_chunks",
    "plan_chunks_page_prefixed",
    "__version__",
]
