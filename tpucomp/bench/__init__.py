"""Benchmark harness — the ``benchmark_template_chunked.cuh`` analog.

Reproduces the canonical per-format chunked benchmark protocol
(``benchmarks/benchmark_template_chunked.cuh:368-584``): file -> chunks ->
staged device batch -> compress -> decompress -> per-chunk status + size
assertions -> full byte-exact verify -> warmup-then-timed iterations -> human or
CSV output with the reference's exact 11-column schema (``:609-647``).

CLI (per-format drivers in ``benchmarks/``): the reference's flag set
(``:726-829``) maps to ``--filename/-f``, ``--warmup-count/-w``,
``--iteration-count/-i``, ``--duplicate-data/-x``, ``--csv-output/-c``,
``--page-size/-p``, ``--file-with-page-sizes/-s``, ``--tab-separator/-t``;
``--gpu/-g`` becomes ``--device``.
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from typing import Any, Sequence

import numpy as np

from tpucomp.chunk import ChunkBatch, plan_chunks_page_prefixed
from tpucomp.constants import Status


@dataclasses.dataclass
class BenchResult:
    num_files: int
    duplicate_count: int
    total_bytes: int
    num_pages: int
    chunk_size: int
    compressed_bytes: int
    ratio: float
    compress_gbs: float
    decompress_gbs: float
    compile_compress_s: float = 0.0
    compile_decompress_s: float = 0.0

    CSV_HEADER = ("Files,Duplicate data,Size in MB,Pages,Avg page size in KB,"
                  "Max page size in KB,Ucompressed size in bytes,"
                  "Compressed size in bytes,Compression ratio,"
                  "Compression throughput (uncompressed) in GB/s,"
                  "Decompression throughput (uncompressed) in GB/s")

    def csv_row(self, sep: str = ",") -> str:
        vals = [self.num_files, self.duplicate_count,
                self.total_bytes * 1e-6, self.num_pages,
                (1e-3 * self.total_bytes) / max(self.num_pages, 1),
                1e-3 * self.chunk_size, self.total_bytes,
                self.compressed_bytes, f"{self.ratio:.2f}",
                f"{self.compress_gbs:.4f}", f"{self.decompress_gbs:.4f}"]
        return sep.join(str(v) for v in vals)

    def human(self) -> str:
        return ("----------\n"
                f"files: {self.num_files}\n"
                f"uncompressed (B): {self.total_bytes}\n"
                f"comp_size: {self.compressed_bytes}, compressed ratio: "
                f"{self.ratio:.4f}\n"
                f"compression throughput (GB/s): {self.compress_gbs:.4f}\n"
                f"decompression throughput (GB/s): {self.decompress_gbs:.4f}")


def run_benchmark(fmt: str, data_chunks: Sequence[bytes], *,
                  opts: Any = None, chunk_size: int = 65536,
                  warmup: int = 1, iterations: int = 3,
                  duplicate_count: int = 0, num_files: int = 1,
                  verify: bool = True, backend: str = "auto") -> BenchResult:
    """Chunked round-trip benchmark of one format over pre-split chunks.

    ``backend`` selects BOTH the decode and the encode path (auto = Pallas
    kernel on TPU when the format has one; see
    :func:`tpucomp.batched.decompress` / :func:`tpucomp.batched.compress`), so
    the timed compress column measures the same product path the batched API
    dispatches to — the reference benchmarks likewise time the library's own
    kernels (``benchmark_template_chunked.cuh:420-530``).  Formats without a
    Pallas encoder fall back to the XLA encoder under ``auto``.
    """
    import jax
    from tpucomp.utils import honor_jax_platforms_env
    honor_jax_platforms_env()
    from tpucomp import batched
    from tpucomp.ops import pallas as pk

    if duplicate_count:
        data_chunks = list(data_chunks) * (1 + duplicate_count)
    spec = batched._get(fmt)
    decode = batched._decode_fn(fmt, spec, backend)
    enc_backend = backend
    if backend == "pallas" and fmt not in pk.PALLAS_ENCODERS:
        enc_backend = "xla"  # decode-focused explicit request; encode stages
    encode = (None if spec.decompression_only
              else batched._encode_fn(fmt, spec, enc_backend))
    opts = opts if opts is not None else spec.default_opts
    max_chunk = max((len(c) for c in data_chunks), default=1)
    max_chunk = max(max_chunk, 1)
    cb = ChunkBatch.from_chunks(data_chunks, max_chunk_bytes=max_chunk)
    max_chunk = cb.max_chunk_bytes  # slot-aligned (8 B) — the decode out_cap
    # must match the staged batch width or the byte-exact verify below
    # compares differently-shaped arrays
    cap = spec.max_compressed_chunk_size(max_chunk, opts)
    total_bytes = int(np.asarray(cb.total_bytes))

    data, sizes = jax.device_put(cb.data), jax.device_put(cb.sizes)

    if spec.decompression_only:
        # gzip (README.md:16): stage compressed inputs with host zlib, like
        # the reference's gzip benchmark feeds zlib-produced streams
        import gzip as _gz
        comp_chunks = [_gz.compress(c, 6) for c in data_chunks]
        ccb = ChunkBatch.from_chunks(comp_chunks,
                                     max_chunk_bytes=max(cap, 8))
        comp, csz = jax.device_put(ccb.data), jax.device_put(ccb.sizes)
        cst = np.zeros((cb.num_chunks,), np.int32)
        t_cc = 0.0
    else:
        t0 = time.time()
        comp, csz, cst = encode(data, sizes, opts, cap)
        jax.block_until_ready(comp)
        t_cc = time.time() - t0
    assert int(np.asarray(cst).max()) == Status.SUCCESS, \
        f"compress statuses: {np.asarray(cst)}"

    t0 = time.time()
    dec, dsz, dst = decode(comp, csz, max_chunk)
    jax.block_until_ready(dec)
    t_dc = time.time() - t0
    assert int(np.asarray(dst).max()) == Status.SUCCESS, \
        f"decompress statuses: {np.asarray(dst)}"

    if verify:
        # the reference checks per-chunk sizes then every byte (:553-584)
        assert np.array_equal(np.asarray(dsz), np.asarray(sizes)), "size mismatch"
        assert np.array_equal(np.asarray(dec), np.asarray(data)), \
            "round trip not bit-exact"

    # readback-terminated timing (the hardened protocol from bench.py /
    # BENCH_NOTES.md): K chained, data-dependent iterations inside ONE
    # compiled program, terminated by a host readback of a checksum derived
    # from every produced byte — `block_until_ready` alone returns early on
    # runtimes with untrustworthy completion acks (the 2.8 TB/s artifact).
    import jax.numpy as jnp

    def chained(fn3):
        @jax.jit
        def loop(a, b, k):
            def body(i, carry):
                b2, acc = carry
                o1, o2, o3 = fn3(a, b2)
                sm = (jnp.sum(o1.astype(jnp.int32)) + jnp.sum(o2)
                      + jnp.sum(o3)).astype(jnp.int32)
                acc = (acc + sm).astype(jnp.int32)
                # unforgeable chain (see BENCH_NOTES): ``sm * 0`` constant-
                # folded and XLA hoisted the body out of the timing loop
                dep = (acc == jnp.int32(-0x80000000)).astype(b2.dtype)
                return ((b2 + dep).astype(b2.dtype), acc)
            _, acc = jax.lax.fori_loop(0, k, body, (b, jnp.int32(0)))
            return acc
        return loop

    def timed(loop, a, b, k):
        # Marginal timing (round-5 calibration, BENCH_NOTES): one program
        # execution on the tunnel device costs ~25 ms of launch+readback
        # latency regardless of work, so t(K)/K overstates per-iteration
        # cost by ~25/K ms.  Timing two chain lengths in separate executions
        # and differencing cancels the fixed cost; the chain length adapts so
        # the marginal work is >=200 ms (above launch-latency noise).
        def run(kk):
            t0 = time.time()
            int(loop(a, b, jnp.int32(kk)))    # readback terminates the timer
            return time.time() - t0

        run(1)                                # sync: drain queued work
        est = max((run(5) - run(1)) / 4, 1e-7)
        k = min(max(k, int(0.2 / est)), 1 << 14)
        t_small = min(run(1) for _ in range(2))
        t_big = min(run(1 + k) for _ in range(2))
        return max(t_big - t_small, 1e-9) / k

    K = max(iterations, 3)
    dec_loop = chained(lambda c, z: decode(c, z, max_chunk))
    if spec.decompression_only:
        ct = float("inf")
    else:
        comp_loop = chained(lambda d, s: encode(d, s, opts, cap))
        for _ in range(max(warmup - 1, 0)):
            jax.block_until_ready(encode(data, sizes, opts, cap))
        ct = timed(comp_loop, data, sizes, K)
    dt = timed(dec_loop, comp, csz, K)

    compressed_bytes = int(np.asarray(csz).sum())
    return BenchResult(
        num_files=num_files, duplicate_count=duplicate_count,
        total_bytes=total_bytes, num_pages=cb.num_chunks,
        chunk_size=max_chunk, compressed_bytes=compressed_bytes,
        ratio=total_bytes / max(compressed_bytes, 1),
        compress_gbs=total_bytes / ct / 1e9,
        decompress_gbs=total_bytes / dt / 1e9,
        compile_compress_s=t_cc, compile_decompress_s=t_dc)


def load_files(filenames: Sequence[str], chunk_size: int,
               page_prefixed: bool) -> list[bytes]:
    """File(s) -> chunk list (fixed-size split or page-size-prefixed mode)."""
    chunks: list[bytes] = []
    for fn in filenames:
        with open(fn, "rb") as f:
            buf = f.read()
        if page_prefixed:
            for off, size in plan_chunks_page_prefixed(buf):
                chunks.append(buf[off:off + size])
        else:
            chunks.extend(buf[o:o + chunk_size]
                          for o in range(0, len(buf), chunk_size))
    return chunks


def main_template(fmt: str, argv: Sequence[str] | None = None,
                  parse_opts=None) -> BenchResult:
    """Shared CLI driver (the per-format ``benchmark_*_chunked`` main)."""
    ap = argparse.ArgumentParser(prog=f"benchmark_{fmt}_chunked")
    ap.add_argument("-f", "--filename", action="append", required=False,
                    help="input file (repeatable)")
    ap.add_argument("-w", "--warmup-count", type=int, default=1)
    ap.add_argument("-i", "--iteration-count", type=int, default=3)
    ap.add_argument("-x", "--duplicate-data", type=int, default=0)
    ap.add_argument("-c", "--csv-output", action="store_true")
    # -T, not -t: the reference reserves -t for per-format data types
    # (benchmark_lz4_chunked.cu:38-43, benchmark_cascaded_chunked.cu:49-81)
    ap.add_argument("-T", "--tab-separator", action="store_true")
    ap.add_argument("-p", "--page-size", type=int, default=65536)
    ap.add_argument("-s", "--file-with-page-sizes", action="store_true")
    ap.add_argument("--device", type=int, default=0, help="-g analog")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="decode path (auto = Pallas kernel on TPU)")
    ap.add_argument("--synthetic-mb", type=int, default=0,
                    help="use the mixed synthetic corpus instead of files")
    args, extra = ap.parse_known_args(argv)

    if parse_opts is not None:
        opts = parse_opts(extra)
    else:
        opts = None

    if args.filename:
        chunks = load_files(args.filename, args.page_size,
                            args.file_with_page_sizes)
        num_files = len(args.filename)
    else:
        from tpucomp.utils import synth
        mb = args.synthetic_mb or 8
        buf = synth.mixed_corpus(mb << 20, seed=42).tobytes()
        chunks = [buf[o:o + args.page_size]
                  for o in range(0, len(buf), args.page_size)]
        num_files = 1

    res = run_benchmark(fmt, chunks, opts=opts, chunk_size=args.page_size,
                        warmup=args.warmup_count,
                        iterations=args.iteration_count,
                        duplicate_count=args.duplicate_data,
                        num_files=num_files, backend=args.backend)
    if args.csv_output:
        sep = "\t" if args.tab_separator else ","
        print(BenchResult.CSV_HEADER.replace(",", sep))
        print(res.csv_row(sep))
    else:
        print(res.human())
    return res
