"""tpucomp.batched — the low-level batched API (LLIF analog).

TPU-native equivalent of nvCOMP's ``nvcompBatched<Fmt>*`` C function families
(``doc/lowlevel_c_quickstart.md:32-137``): batches of independent chunks with
device-resident size vectors, padded max-size outputs, per-chunk actual sizes and
per-chunk status codes.  Differences that are deliberate TPU-first design, not
omissions:

* ``CompressGetTempSize`` / ``DecompressGetTempSize`` have no analog — XLA owns
  scratch allocation inside the compiled program, so the temp-buffer dance is
  unnecessary.  ``compress_get_temp_size()`` exists for API parity and returns 0.
* Instead of per-chunk device pointers, a batch is one dense
  ``uint8[num_chunks, max_chunk_bytes]`` array + ``int32[num_chunks]`` sizes
  (:class:`tpucomp.chunk.ChunkBatch`) — the same padded-max convention the
  reference uses for *outputs* (``examples/low_level_quickstart_example.cpp:68-98``).
* Everything is ``jit``-compiled and dispatches asynchronously; the analog of
  ``cudaStreamSynchronize`` is ``jax.block_until_ready``.

The three decompress workflows of the reference (exact sizes known / only max
known / unknown, ``doc/lowlevel_c_quickstart.md:81-110``) map to: call
:func:`decompress` with a known ``max_uncomp_chunk_bytes``, or call
:func:`get_decompress_size` first when sizes are unknown.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpucomp import logging as tlog
from tpucomp.chunk import ChunkBatch
from tpucomp.constants import MAX_ALLOWED_CHUNK_SIZE, REQUIRED_ALIGNMENT, Status


@dataclasses.dataclass(frozen=True)
class CodecSpec:
    """One registered format (analog of a ``nvcompBatched<Fmt>`` function family)."""

    name: str
    compress_batch: Callable  # (data, sizes, opts, out_cap) -> (out, out_sizes, statuses)
    decompress_batch: Callable  # (comp, comp_sizes, out_cap) -> (out, out_sizes, statuses)
    max_compressed_chunk_size: Callable[[int, Any], int]
    default_opts: Any
    get_decompress_size: Callable | None = None  # vmappable (comp, comp_size) -> size
    decompression_only: bool = False  # e.g. gzip (README.md:16)
    elem_size: Callable[[Any], int] | None = None  # typed codecs: opts -> element bytes


_REGISTRY: dict[str, CodecSpec] = {}


def register(spec: CodecSpec) -> None:
    _REGISTRY[spec.name] = spec


def formats() -> list[str]:
    """All registered format names."""
    _ensure_registered()
    return sorted(_REGISTRY)


def _get(name: str) -> CodecSpec:
    _ensure_registered()
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown format {name!r}; available: {formats()}") from None


def _ensure_registered() -> None:
    if _REGISTRY:
        return
    # late import to avoid cycles
    from tpucomp.formats import register_all
    register_all()


# -------------------------------------------------------------------------------------
# public API
# -------------------------------------------------------------------------------------

def compress_get_max_output_chunk_size(fmt: str, max_uncompressed_chunk_bytes: int,
                                       opts: Any = None) -> int:
    """Analog of ``nvcompBatched<Fmt>CompressGetMaxOutputChunkSize``."""
    spec = _get(fmt)
    opts = opts if opts is not None else spec.default_opts
    return spec.max_compressed_chunk_size(max_uncompressed_chunk_bytes, opts)


def compress_get_temp_size(fmt: str, num_chunks: int = 0,
                           max_uncompressed_chunk_bytes: int = 0) -> int:
    """API-parity shim: XLA manages scratch, so the answer is always 0."""
    _get(fmt)
    return 0


def decompress_get_temp_size(fmt: str, num_chunks: int = 0,
                             max_uncompressed_chunk_bytes: int = 0) -> int:
    """API-parity shim: XLA manages scratch, so the answer is always 0."""
    _get(fmt)
    return 0


def compress_get_temp_size_ex(fmt: str, num_chunks: int = 0,
                              max_uncompressed_chunk_bytes: int = 0,
                              max_total_uncompressed_bytes: int = 0) -> int:
    """Analog of ``nvcompBatched<Fmt>CompressGetTempSizeEx``
    (``CHANGELOG.md:114-117``: the Ex variants take the total uncompressed
    size so scratch can scale sublinearly).  XLA owns scratch, so 0."""
    _get(fmt)
    return 0


def decompress_get_temp_size_ex(fmt: str, num_chunks: int = 0,
                                max_uncompressed_chunk_bytes: int = 0,
                                max_total_uncompressed_bytes: int = 0) -> int:
    """Analog of ``nvcompBatched<Fmt>DecompressGetTempSizeEx``
    (``CHANGELOG.md:36-41``).  XLA owns scratch, so 0."""
    _get(fmt)
    return 0


def _alignment_failure(fmt: str, n: int, out_cap: int):
    """Whole-call ``nvcompErrorAlignment`` analog (``CHANGELOG.md:15-16``)."""
    return (ChunkBatch(data=jnp.zeros((n, out_cap), jnp.uint8),
                       sizes=jnp.zeros((n,), jnp.int32)),
            jnp.full((n,), Status.ERROR_ALIGNMENT, jnp.int32))


def _input_violations(fmt: str, spec: CodecSpec, sizes: jax.Array,
                      opts: Any) -> jax.Array:
    """Per-chunk status overrides for invalid compression inputs (0 = valid).

    Enforces the reference's per-format contracts: chunk size above
    ``MaxAllowedChunkSize`` (``CHANGELOG.md:15,57``) and — for typed codecs —
    chunk bytes being a multiple of the element size (the per-format input
    validators, ``benchmark_lz4_chunked.cu:48-84``).
    """
    v = jnp.zeros(sizes.shape, jnp.int32)
    max_sz = MAX_ALLOWED_CHUNK_SIZE.get(fmt)
    # guard int32 weak-type wrap: a bound >= 2^31 (ANS's 2^32-1) would be cast
    # into the int32 comparison and wrap negative, flagging every chunk
    if max_sz is not None and max_sz < 2**31:
        v = jnp.where(sizes > jnp.int32(max_sz),
                      jnp.int32(Status.ERROR_CHUNK_SIZE_TOO_LARGE), v)
    if spec.elem_size is not None:
        es = int(spec.elem_size(opts))
        if es > 1:
            v = jnp.where(sizes % es != 0,
                          jnp.int32(Status.ERROR_INVALID_VALUE), v)
    return v


def _encode_fn(fmt: str, spec: CodecSpec, backend: str) -> Callable:
    """Resolve the encode implementation for ``backend`` (same policy as
    :func:`_decode_fn`; ``TPUCOMP_ENCODE_BACKEND`` overrides auto)."""
    import os
    from tpucomp.ops import pallas as pk
    if backend == "auto":
        backend = os.environ.get("TPUCOMP_ENCODE_BACKEND", "auto")
    if backend == "auto":
        backend = ("pallas" if fmt in pk.PALLAS_ENCODERS
                   and jax.default_backend() == "tpu" else "xla")
    if backend == "pallas":
        try:
            return pk.PALLAS_ENCODERS[fmt]
        except KeyError:
            raise ValueError(f"no Pallas encoder for {fmt!r}; "
                             f"available: {sorted(pk.PALLAS_ENCODERS)}") from None
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r} (auto/xla/pallas)")
    return spec.compress_batch


def compress(fmt: str, batch: ChunkBatch, opts: Any = None,
             out_cap: int | None = None,
             backend: str = "auto") -> tuple[ChunkBatch, jax.Array]:
    """Analog of ``nvcompBatched<Fmt>CompressAsync``.

    Returns ``(compressed_batch, statuses)``; the compressed batch's ``data`` is
    padded to ``out_cap`` (default: the format's max output chunk size) with
    per-chunk actual sizes in ``.sizes``.  Invalid inputs surface as per-chunk
    error statuses (size 0), misaligned batch/output strides as
    ``ERROR_ALIGNMENT`` for the whole call — mirroring ``nvcompStatus_t``
    semantics (``CHANGELOG.md:15-16``; validators in
    ``benchmark_lz4_chunked.cu:48-84``).

    ``backend``: ``"auto"`` (Pallas kernel on TPU when available, else XLA),
    ``"xla"``, or ``"pallas"`` (interpreter mode off-TPU).
    """
    spec = _get(fmt)
    if spec.decompression_only:
        raise ValueError(f"{fmt} provides decompression only")
    opts = opts if opts is not None else spec.default_opts
    if out_cap is None:
        out_cap = spec.max_compressed_chunk_size(batch.max_chunk_bytes, opts)
    align = REQUIRED_ALIGNMENT.get(fmt, 1)
    if batch.max_chunk_bytes % align or out_cap % align:
        return _alignment_failure(fmt, batch.num_chunks, out_cap)
    tlog.api_call(f"batched.{fmt}.compress", num_chunks=batch.num_chunks,
                  max_chunk_bytes=batch.max_chunk_bytes, out_cap=out_cap,
                  backend=backend)
    out, sizes, statuses = _encode_fn(fmt, spec, backend)(
        batch.data, batch.sizes, opts, out_cap)
    viol = _input_violations(fmt, spec, batch.sizes, opts)
    bad = viol != 0
    statuses = jnp.where(bad, viol, statuses)
    sizes = jnp.where(bad, 0, sizes)
    out = jnp.where(bad[:, None], 0, out)
    return ChunkBatch(data=out, sizes=sizes), statuses


def _decode_fn(fmt: str, spec: CodecSpec, backend: str) -> Callable:
    """Resolve the decode implementation for ``backend``.

    ``"auto"`` picks the Pallas kernel when one exists for ``fmt`` and the
    default JAX backend is a real TPU (the analog of the reference's dedicated
    CUDA kernels being the only path); otherwise the fused-XLA program.
    ``TPUCOMP_DECODE_BACKEND`` overrides the auto choice.
    """
    import os
    from tpucomp.ops import pallas as pk
    if backend == "auto":
        backend = os.environ.get("TPUCOMP_DECODE_BACKEND", "auto")
    if backend == "auto":
        backend = ("pallas" if fmt in pk.PALLAS_DECODERS
                   and jax.default_backend() == "tpu" else "xla")
    if backend == "pallas":
        try:
            return pk.PALLAS_DECODERS[fmt]
        except KeyError:
            raise ValueError(f"no Pallas decoder for {fmt!r}; "
                             f"available: {sorted(pk.PALLAS_DECODERS)}") from None
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r} (auto/xla/pallas)")
    return spec.decompress_batch


def decompress(fmt: str, comp: ChunkBatch, max_uncompressed_chunk_bytes: int,
               backend: str = "auto") -> tuple[ChunkBatch, jax.Array]:
    """Analog of ``nvcompBatched<Fmt>DecompressAsync``.

    Corrupt chunks yield status ``ERROR_CANNOT_DECOMPRESS`` and size 0 — never an
    out-of-bounds access (reference contract ``CHANGELOG.md:160-164``).

    ``backend``: ``"auto"`` (Pallas kernel on TPU when available, else XLA),
    ``"xla"``, or ``"pallas"`` (interpreter mode off-TPU).
    """
    spec = _get(fmt)
    align = REQUIRED_ALIGNMENT.get(fmt, 1)
    if comp.max_chunk_bytes % align:
        return _alignment_failure(fmt, comp.num_chunks,
                                  max_uncompressed_chunk_bytes)
    tlog.api_call(f"batched.{fmt}.decompress", num_chunks=comp.num_chunks,
                  out_cap=max_uncompressed_chunk_bytes, backend=backend)
    out, sizes, statuses = _decode_fn(fmt, spec, backend)(
        comp.data, comp.sizes, max_uncompressed_chunk_bytes)
    return ChunkBatch(data=out, sizes=sizes), statuses


def get_decompress_size(fmt: str, comp: ChunkBatch) -> jax.Array:
    """Analog of ``nvcompBatched<Fmt>GetDecompressSizeAsync`` (workflow 3,
    ``doc/lowlevel_c_quickstart.md:104-110``): per-chunk decompressed byte counts
    parsed from the compressed streams, device-resident."""
    spec = _get(fmt)
    if spec.get_decompress_size is None:
        raise NotImplementedError(f"{fmt} does not carry sizes in-stream")
    tlog.api_call(f"batched.{fmt}.get_decompress_size", num_chunks=comp.num_chunks)
    return jax.vmap(spec.get_decompress_size)(comp.data, comp.sizes)


def roundtrip_verify(fmt: str, batch: ChunkBatch, opts: Any = None) -> bool:
    """Compress then decompress and compare bit-exactly (the reference's
    standard verification pass, ``benchmark_template_chunked.cuh:553-584``)."""
    import numpy as np
    comp, cstat = compress(fmt, batch, opts)
    dec, dstat = decompress(fmt, comp, batch.max_chunk_bytes)
    if not bool(jnp.all(cstat == Status.SUCCESS)) or \
       not bool(jnp.all(dstat == Status.SUCCESS)):
        return False
    if not bool(jnp.all(dec.sizes == batch.sizes)):
        return False
    return bool(np.asarray(dec.data == batch.data).all() or
                dec.to_bytes() == batch.to_bytes())


__all__ = [
    "CodecSpec", "register", "formats",
    "compress", "decompress", "get_decompress_size",
    "compress_get_max_output_chunk_size", "compress_get_temp_size",
    "compress_get_temp_size_ex", "decompress_get_temp_size",
    "decompress_get_temp_size_ex", "roundtrip_verify",
]
