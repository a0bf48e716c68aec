#!/usr/bin/env python
"""High-level-interface benchmark across formats (analog of
``benchmarks/benchmark_hlif.cpp``: all managers, warmup, averaged GB/s,
memory-fit check)."""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("format", nargs="?", default="lz4",
                    help="lz4|snappy|cascaded|ans|deflate|gdeflate|bitcomp|zstd|all")
    ap.add_argument("-f", "--filename")
    ap.add_argument("--synthetic-mb", type=int, default=8)
    ap.add_argument("-p", "--chunk-size", type=int, default=65536)
    ap.add_argument("-i", "--iterations", type=int, default=3)
    args = ap.parse_args()

    from tpucomp.utils import honor_jax_platforms_env
    import jax
    honor_jax_platforms_env()
    import numpy as np
    from tpucomp.manager import FORMAT_IDS, Manager, create_manager
    from tpucomp.utils import synth

    if args.filename:
        with open(args.filename, "rb") as f:
            data = f.read()
    else:
        data = synth.mixed_corpus(args.synthetic_mb << 20, seed=42).tobytes()

    fmts = ([f for f in FORMAT_IDS if f not in ("gzip",)]
            if args.format == "all" else [args.format])
    for fmt in fmts:
        try:
            mgr = Manager(fmt, chunk_size=args.chunk_size)
            frame = mgr.compress(data)          # warmup: compile + stage
            # readback-terminated per iteration: on the axon tunnel,
            # block_until_ready acks before the device finishes
            # (BENCH_NOTES); a host readback of the output cannot
            t0 = time.time()
            for _ in range(args.iterations):
                frame = mgr.compress(data)
                np.asarray(frame[-8:])
            t_comp = (time.time() - t0) / args.iterations
            mgr2 = create_manager(frame)
            cfg = mgr2.configure_decompression(frame)
            out = mgr2.decompress(frame, cfg)   # warmup
            np.asarray(out[-8:])
            t0 = time.time()
            for _ in range(args.iterations):
                out = mgr2.decompress(frame, cfg)
                np.asarray(out[-8:])
            t_dec = (time.time() - t0) / args.iterations
            ok = bytes(np.asarray(out)) == data
            ratio = len(data) / int(frame.shape[0])
            print(f"{fmt:9s} ratio {ratio:6.2f}  compress {len(data)/t_comp/1e9:7.3f} GB/s"
                  f"  decompress {len(data)/t_dec/1e9:7.3f} GB/s  "
                  f"{'bit-exact' if ok else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001
            print(f"{fmt:9s} FAILED: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
