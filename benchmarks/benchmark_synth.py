#!/usr/bin/env python
"""Synthetic-distribution benchmark (analog of ``benchmark_lz4_synth.cpp`` /
``benchmark_snappy_synth.cpp``): all-zeros and uniform-random size ladders plus
``max_byte`` entropy-knob batches of 64 KiB chunks)."""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("format", nargs="?", default="lz4")
    ap.add_argument("--max-byte", type=int, default=3,
                    help="entropy knob (reference default 3)")
    ap.add_argument("--batch-chunks", type=int, default=64)
    ap.add_argument("-p", "--chunk-size", type=int, default=65536)
    args = ap.parse_args()

    from tpucomp.utils import honor_jax_platforms_env
    import jax
    honor_jax_platforms_env()
    import numpy as np
    from tpucomp import batched
    from tpucomp.bench import run_benchmark
    from tpucomp.utils import synth

    # size ladder x {zeros, random} (reference: 14 sizes)
    print("== size ladder (single chunk) ==")
    for kind, gen in (("zeros", synth.zeros),
                      ("random", lambda n: synth.random_bytes(n, seed=7))):
        for exp in range(10, 17):
            n = 1 << exp
            res = run_benchmark(args.format, [gen(n).tobytes()],
                                chunk_size=n, iterations=2)
            print(f"  {kind:6s} {n:7d}B ratio {res.ratio:7.2f} "
                  f"dec {res.decompress_gbs:7.3f} GB/s")

    print(f"== {args.batch_chunks} x {args.chunk_size}B, max_byte={args.max_byte} ==")
    chunks = [synth.gen_data(args.max_byte, args.chunk_size, seed=i).tobytes()
              for i in range(args.batch_chunks)]
    res = run_benchmark(args.format, chunks, chunk_size=args.chunk_size)
    print(res.human())


if __name__ == "__main__":
    main()
