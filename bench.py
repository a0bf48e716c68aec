#!/usr/bin/env python
"""tpucomp benchmark — prints ONE JSON line with the headline metric.

Headline: LZ4 batched decompress GB/s on one TPU chip over a Silesia-like mixed
corpus in 64 KiB chunks — the reference's headline metric is LZ4 LLIF decompress
GB/s (A100: 320.70 GB/s, ``doc/Benchmarks.md:95``; see BASELINE.md).
``vs_baseline`` is ours / reference (>1 = faster than the reference's A100).

Protocol mirrors ``benchmark_template_chunked.cuh``: stage batches on device,
warmup (excludes compile), verify bit-exact round trip once, then averaged timed
iterations with ``block_until_ready`` fences.  The corpus is processed as a
sequence of fixed-shape batch tiles (one compiled program, async-dispatched
back-to-back — the analog of the reference's stream-pipelined launches).

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
    ap.add_argument("--batch-chunks", type=int, default=8,
                    help="chunks per compiled tile")
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

    mb = args.mb or (4 if args.quick else 32)
    iters = args.iters or (2 if args.quick else 5)
    chunk = args.chunk_kb * 1024
    B = args.batch_chunks
    corpus = synth.mixed_corpus(mb << 20, seed=42).tobytes()
    cb = ChunkBatch.from_bytes(corpus, chunk_size=chunk)
    n_tiles = cb.num_chunks // B
    n_used = n_tiles * B
    log(f"corpus: {mb} MiB, {n_used} chunks of {args.chunk_kb} KiB "
        f"in {n_tiles} tiles of {B}")

    def bench_codec(fmt):
        spec = batched._get(fmt)
        opts = spec.default_opts
        cap = spec.max_compressed_chunk_size(chunk, opts)

        tiles = [(jax.device_put(cb.data[i * B:(i + 1) * B]),
                  jax.device_put(cb.sizes[i * B:(i + 1) * B]))
                 for i in range(n_tiles)]

        def compress_all():
            return [spec.compress_batch(d, s, opts, cap) for d, s in tiles]

        t0 = time.time()
        comp_res = compress_all()
        jax.block_until_ready(comp_res)
        log(f"[{fmt}] compress warmup+compile {time.time()-t0:.1f}s")
        for _, _, cst in comp_res:
            assert int(np.asarray(cst).max()) == 0, "compress status != SUCCESS"
        comp_tiles = [(c, sz) for c, sz, _ in comp_res]

        def decompress_all():
            return [spec.decompress_batch(c, sz, chunk) for c, sz in comp_tiles]

        t0 = time.time()
        dec_res = decompress_all()
        jax.block_until_ready(dec_res)
        log(f"[{fmt}] decompress warmup+compile {time.time()-t0:.1f}s")

        # verification (once): statuses, sizes, bytes
        total_bytes = 0
        comp_bytes = 0
        for i, (dec, dsz, dst) in enumerate(dec_res):
            assert int(np.asarray(dst).max()) == 0, "decompress status != SUCCESS"
            d0, s0 = tiles[i]
            assert np.array_equal(np.asarray(dsz), np.asarray(s0)), "size mismatch"
            assert np.array_equal(np.asarray(dec), np.asarray(d0)), "not bit-exact"
            total_bytes += int(np.asarray(s0).sum())
            comp_bytes += int(np.asarray(comp_tiles[i][1]).sum())
        ratio = total_bytes / max(comp_bytes, 1)

        def timed(fn):
            best = float("inf")
            for _ in range(iters):
                t0 = time.time()
                jax.block_until_ready(fn())
                best = min(best, time.time() - t0)
            return total_bytes / best / 1e9

        comp_gbs = timed(compress_all)
        decomp_gbs = timed(decompress_all)
        log(f"[{fmt}] ratio {ratio:.2f}  compress {comp_gbs:.3f} GB/s  "
            f"decompress {decomp_gbs:.3f} GB/s")
        return ratio, comp_gbs, decomp_gbs

    if args.all:
        for fmt in batched.formats():
            if batched._get(fmt).decompression_only:
                continue
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
