#!/usr/bin/env python
"""Multi-device compressed all-gather benchmark.

Analog of the reference's ``benchmarks/benchmark_allgather.cpp`` (shard file
across devices, compress per device, broadcast COMPRESSED chunks, decompress
remote chunks everywhere, verify, report per-device and system GB/s with
throughput counted as ``(N-1)/N x data / time`` per device, ``:454-470``) and of
``allgather_runall.py`` (sweep device counts x formats).

On a single-chip environment run it over the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/benchmark_allgather.py --devices 2 4 8
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--filename")
    ap.add_argument("--synthetic-mb", type=int, default=8)
    ap.add_argument("-p", "--page-size", type=int, default=65536)
    ap.add_argument("--formats", nargs="+", default=["none", "lz4", "cascaded"])
    ap.add_argument("--devices", nargs="+", type=int, default=None)
    ap.add_argument("-i", "--iterations", type=int, default=3)
    ap.add_argument("-c", "--csv-output", action="store_true")
    ap.add_argument("--report", default=None,
                    help="write a scaling-efficiency CSV here (adds "
                         "efficiency vs the smallest measured device count "
                         "and wire-bytes-saved columns; the north-star "
                         "metric is >=85%% efficiency, BASELINE.md)")
    args = ap.parse_args()

    from tpucomp.utils import honor_jax_platforms_env
    import jax
    honor_jax_platforms_env()
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpucomp import parallel
    from tpucomp.chunk import ChunkBatch
    from tpucomp.utils import synth

    if args.filename:
        with open(args.filename, "rb") as f:
            buf = f.read()
    else:
        buf = synth.mixed_corpus(args.synthetic_mb << 20, seed=42).tobytes()

    all_devs = jax.devices()
    dev_counts = args.devices or [len(all_devs)]

    if args.csv_output:
        print("devices,format,chunks,raw_bytes,wire_bytes,ratio,"
              "per_device_GBps,system_GBps")
    report_rows = []

    for nd in dev_counts:
        if nd > len(all_devs):
            print(f"skip {nd} devices (have {len(all_devs)})", file=sys.stderr)
            continue
        mesh = Mesh(np.array(all_devs[:nd]), ("chunks",))
        cb = ChunkBatch.from_bytes(buf, chunk_size=args.page_size)
        # typed codecs (cascaded/bitcomp) reject chunks that are not a
        # multiple of the element size — drop a ragged tail chunk (bench.py
        # does the same)
        if int(np.asarray(cb.sizes)[-1]) % 8 != 0:
            cb = ChunkBatch(data=cb.data[:-1], sizes=cb.sizes[:-1])
        # chunk count must divide evenly over the mesh
        n = (cb.num_chunks // nd) * nd
        cb = ChunkBatch(data=cb.data[:n], sizes=cb.sizes[:n])
        raw = int(np.asarray(cb.total_bytes))

        for fmt in args.formats:
            if fmt == "none":
                # uncompressed all-gather baseline
                def step(d, s):
                    return (jax.lax.all_gather(d, "chunks", tiled=True),
                            jax.lax.all_gather(s, "chunks", tiled=True))
                fn = jax.jit(jax.shard_map(
                    step, mesh=mesh,
                    in_specs=(P("chunks", None), P("chunks")),
                    out_specs=(P(None, None), P(None)), check_vma=False))
                wire = raw
            else:
                fn = parallel.compressed_all_gather_fn(
                    fmt, mesh, "chunks", cb.max_chunk_bytes)
            d = jax.device_put(cb.data, NamedSharding(mesh, P("chunks", None)))
            s = jax.device_put(cb.sizes, NamedSharding(mesh, P("chunks")))

            out = fn(d, s)
            jax.block_until_ready(out)
            if fmt != "none":
                dec, dsz, csz, status = out
                assert int(status) == 0, f"{fmt}: status {int(status)}"
                got = ChunkBatch(data=dec, sizes=dsz).to_bytes()
                assert got == cb.to_bytes(), f"{fmt}: all-gather mismatch"
                wire = int(np.asarray(csz).sum())

            best = float("inf")
            for _ in range(args.iterations):
                t0 = time.time()
                jax.block_until_ready(fn(d, s))
                best = min(best, time.time() - t0)

            # reference accounting: each device receives (N-1)/N of the data
            per_dev = (nd - 1) / nd * raw / best / 1e9 if nd > 1 else raw / best / 1e9
            system = per_dev * nd
            report_rows.append((nd, fmt, n, raw, wire, per_dev, system))
            if args.csv_output:
                print(f"{nd},{fmt},{n},{raw},{wire},{raw/max(wire,1):.2f},"
                      f"{per_dev:.4f},{system:.4f}")
            else:
                print(f"[{nd} devices] {fmt:9s} chunks={n} raw={raw} "
                      f"wire={wire} ratio={raw/max(wire,1):.2f} "
                      f"per-device {per_dev:.3f} GB/s, system {system:.3f} GB/s")

    if args.report:
        # reference accounting model: per-device GB/s should stay flat as N
        # grows (benchmark_allgather.cpp:454-470 reports per-GPU and system
        # rates); efficiency(N) = per_dev(N) / per_dev(N0) with N0 the
        # smallest measured multi-device count.  wire_saved = what
        # compression kept off the interconnect.
        base = {}
        for nd, fmt, n, raw, wire, per_dev, system in report_rows:
            if nd > 1 and (fmt not in base or nd < base[fmt][0]):
                base[fmt] = (nd, per_dev)
        with open(args.report, "w") as f:
            f.write("devices,format,chunks,raw_bytes,wire_bytes,"
                    "wire_saved_bytes,ratio,per_device_GBps,system_GBps,"
                    "scaling_efficiency\n")
            for nd, fmt, n, raw, wire, per_dev, system in report_rows:
                eff = (per_dev / base[fmt][1]
                       if fmt in base and nd > 1 else 1.0)
                f.write(f"{nd},{fmt},{n},{raw},{wire},{raw - wire},"
                        f"{raw/max(wire,1):.2f},{per_dev:.4f},"
                        f"{system:.4f},{eff:.3f}\n")
        print(f"wrote {args.report}", file=sys.stderr)


if __name__ == "__main__":
    main()
