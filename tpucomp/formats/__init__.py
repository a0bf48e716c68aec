"""Format codecs (the product — reference §2.1 component inventory).

Each format module exposes ``compress_batch`` / ``decompress_batch`` (vmapped,
jit-compiled, static-shape) plus ``max_compressed_chunk_size`` and registers a
:class:`tpucomp.batched.CodecSpec` so the generic batched / manager APIs can
dispatch by name.
"""
from __future__ import annotations

_REGISTERED = False


def register_all() -> None:
    """Register every built-in codec with :mod:`tpucomp.batched` (idempotent)."""
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True

    from tpucomp import batched
    from tpucomp.batched import CodecSpec
    from tpucomp.formats import cascaded, lz4

    batched.register(CodecSpec(
        name="lz4",
        compress_batch=lz4.compress_batch,
        decompress_batch=lz4.decompress_batch,
        max_compressed_chunk_size=lz4.max_compressed_chunk_size,
        default_opts=lz4.DEFAULT_OPTS,
        get_decompress_size=lz4.get_decompress_size,
        elem_size=lambda o: o.data_type.nbytes,
    ))
    batched.register(CodecSpec(
        name="cascaded",
        compress_batch=cascaded.compress_batch,
        decompress_batch=cascaded.decompress_batch,
        max_compressed_chunk_size=cascaded.max_compressed_chunk_size,
        default_opts=cascaded.DEFAULT_OPTS,
        get_decompress_size=cascaded.get_decompress_size,
        elem_size=lambda o: o.type.nbytes,
    ))

    for optional in ("snappy", "ans", "crc32", "deflate", "gdeflate", "gzip",
                     "bitcomp", "zstd"):
        try:
            import importlib
            mod = importlib.import_module(f"tpucomp.formats.{optional}")
            if hasattr(mod, "register"):
                mod.register(batched)
        except ImportError:
            pass
