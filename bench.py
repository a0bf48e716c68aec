#!/usr/bin/env python
"""tpucomp benchmark — prints ONE JSON line with the headline metric.

Headline: LZ4 batched decompress GB/s on one TPU chip over a Silesia-like mixed
corpus in 64 KiB chunks — the reference's headline metric is LZ4 LLIF decompress
GB/s (A100: 320.70 GB/s, ``doc/Benchmarks.md:95``; see BASELINE.md).
``vs_baseline`` is ours / reference (>1 = faster than the reference's A100).

Protocol mirrors ``benchmark_template_chunked.cuh``: stage batch on device,
warmup (excludes compile), verify bit-exact round trip once, then averaged timed
iterations with ``block_until_ready`` fences.

Extra per-codec lines go to stderr; stdout carries exactly the one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

A100_LZ4_DECOMP_GBS = 320.70  # doc/Benchmarks.md:95


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small corpus smoke run")
    ap.add_argument("--mb", type=int, default=0, help="corpus size in MiB")
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--codec", default="lz4")
    ap.add_argument("--chunk-kb", type=int, default=64)
    ap.add_argument("--all", action="store_true", help="bench every codec (stderr)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from tpucomp import batched
    from tpucomp.chunk import ChunkBatch
    from tpucomp.utils import synth

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    mb = args.mb or (4 if args.quick else 64)
    iters = args.iters or (2 if args.quick else 8)
    chunk = args.chunk_kb * 1024
    corpus = synth.mixed_corpus(mb << 20, seed=42).tobytes()
    cb = ChunkBatch.from_bytes(corpus, chunk_size=chunk)
    log(f"corpus: {mb} MiB, {cb.num_chunks} chunks of {args.chunk_kb} KiB")

    def bench_codec(fmt):
        spec = batched._get(fmt)
        opts = spec.default_opts
        cap = spec.max_compressed_chunk_size(chunk, opts)
        data, sizes = jax.device_put(cb.data), jax.device_put(cb.sizes)

        comp_fn = lambda: spec.compress_batch(data, sizes, opts, cap)
        t0 = time.time()
        comp, csz, cst = comp_fn()
        jax.block_until_ready(comp)
        log(f"[{fmt}] compress warmup+compile {time.time()-t0:.1f}s")
        assert int(jax.numpy.max(cst)) == 0, "compress status != SUCCESS"

        decomp_fn = lambda: spec.decompress_batch(comp, csz, chunk)
        t0 = time.time()
        dec, dsz, dst = decomp_fn()
        jax.block_until_ready(dec)
        log(f"[{fmt}] decompress warmup+compile {time.time()-t0:.1f}s")
        assert int(jax.numpy.max(dst)) == 0, "decompress status != SUCCESS"

        # bit-exact verification (once)
        ok = bool((np.asarray(dsz) == np.asarray(sizes)).all())
        ok = ok and bytes(np.asarray(dec).reshape(-1)) == bytes(np.asarray(data).reshape(-1))
        assert ok, f"[{fmt}] round-trip NOT bit-exact"

        n_bytes = len(corpus)
        ratio = n_bytes / int(np.asarray(csz).sum())

        def timed(fn):
            best = float("inf")
            tot = 0.0
            for _ in range(iters):
                t0 = time.time()
                out = fn()
                jax.block_until_ready(out)
                dt = time.time() - t0
                tot += dt
                best = min(best, dt)
            return n_bytes / best / 1e9  # GB/s, best-of (steady state)

        comp_gbs = timed(comp_fn)
        decomp_gbs = timed(decomp_fn)
        log(f"[{fmt}] ratio {ratio:.2f}  compress {comp_gbs:.3f} GB/s  "
            f"decompress {decomp_gbs:.3f} GB/s")
        return ratio, comp_gbs, decomp_gbs

    if args.all:
        for fmt in batched.formats():
            try:
                bench_codec(fmt)
            except Exception as e:  # noqa: BLE001
                log(f"[{fmt}] FAILED: {e}")

    ratio, comp_gbs, decomp_gbs = bench_codec(args.codec)

    print(json.dumps({
        "metric": f"{args.codec}_decompress_throughput",
        "value": round(decomp_gbs, 4),
        "unit": "GB/s",
        "vs_baseline": round(decomp_gbs / A100_LZ4_DECOMP_GBS, 4),
    }))


if __name__ == "__main__":
    main()
