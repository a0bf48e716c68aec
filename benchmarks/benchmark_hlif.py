#!/usr/bin/env python
"""High-level-interface benchmark across formats (analog of
``benchmarks/benchmark_hlif.cpp:188-212``: all managers, warmup, averaged
GB/s, memory-fit check).

Round 5: measured under the fixed chained protocol with marginal timing
(BENCH_NOTES round-4/5) — K data-dependent iterations of the manager's own
jitted frame program inside one compiled loop, timer terminated by a
checksum readback, launch overhead cancelled by differencing two chain
lengths.  VERDICT r4 missing #3: the only prior HLIF number was taken under
the broken r3 protocol.
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("format", nargs="?", default="all",
                    help="lz4|snappy|cascaded|ans|deflate|gdeflate|bitcomp|"
                         "zstd|all")
    ap.add_argument("-f", "--filename")
    ap.add_argument("--synthetic-mb", type=int, default=4)
    ap.add_argument("--dataset", default="mixed",
                    choices=["mixed", "mortgage"])
    ap.add_argument("-p", "--chunk-size", type=int, default=65536)
    ap.add_argument("-i", "--iterations", type=int, default=8)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    from tpucomp.utils import honor_jax_platforms_env
    honor_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpucomp.chunk import ChunkBatch
    from tpucomp.manager import FORMAT_IDS, Manager, create_manager
    from tpucomp.utils import synth

    if args.filename:
        with open(args.filename, "rb") as f:
            data = f.read()
    else:
        gen = (synth.mortgage_like if args.dataset == "mortgage"
               else synth.mixed_corpus)
        data = gen(args.synthetic_mb << 20, seed=42).tobytes()

    def marginal(loop, a, b, kn):
        def run(k):
            t0 = time.time()
            int(loop(a, b, jnp.int32(k)))
            return time.time() - t0
        run(1)
        est = max((run(5) - run(1)) / 4, 1e-7)
        kn = min(max(kn, int(0.2 / est)), 1 << 14)
        t_small = min(run(1) for _ in range(2))
        t_big = min(run(1 + kn) for _ in range(2))
        return max(t_big - t_small, 1e-9) / kn

    def chained(fn2):
        @jax.jit
        def loop(a, b, k):
            def body(i, carry):
                b2, acc = carry
                outs = fn2(a, b2)
                sm = jnp.int32(0)
                for o in jax.tree_util.tree_leaves(outs):
                    sm = sm + jnp.sum(o.astype(jnp.int32)).astype(jnp.int32)
                acc = (acc + sm).astype(jnp.int32)
                dep = (acc == jnp.int32(-0x80000000)).astype(b2.dtype)
                return (b2 + dep).astype(b2.dtype), acc
            return jax.lax.fori_loop(0, k, body, (b, jnp.int32(0)))[1]
        return loop

    fmts = ([f for f in FORMAT_IDS if f not in ("gzip",)]
            if args.format == "all" else [args.format])
    rows = []
    for fmt in fmts:
        try:
            mgr = Manager(fmt, chunk_size=args.chunk_size)
            t0 = time.time()
            frame = mgr.compress(data)          # warmup: compile + stage
            comp_compile = time.time() - t0
            # the warmup populated the manager's per-geometry jitted frame
            # programs; chain THOSE (the product path) for the timed runs
            (ckey, cfn), = mgr._jit_comp.items()
            cfg_c = mgr.configure_compression(len(data))
            cb = ChunkBatch.from_bytes(data, args.chunk_size)
            import struct
            hdr = np.asarray(
                jnp.zeros((56,), jnp.uint8))  # header content does not
            hdr_u8 = jnp.asarray(hdr)         # affect timing (fixed bytes)
            t_comp = marginal(
                chained(lambda a, b: cfn(a, b, hdr_u8)),
                jax.device_put(cb.data), jax.device_put(cb.sizes),
                args.iterations)

            mgr2 = create_manager(frame)
            cfg = mgr2.configure_decompression(frame)
            t0 = time.time()
            out = mgr2.decompress(frame, cfg)   # warmup
            np.asarray(out[-8:])
            dec_compile = time.time() - t0
            (dkey, dfn), = mgr2._jit_dec.items()
            framed = jax.device_put(frame)
            zeros = jnp.zeros_like(framed[:1])
            t_dec = marginal(
                chained(lambda a, b: dfn(
                    jnp.concatenate([a[:-1], b]))),
                framed, framed[-1:], args.iterations)
            ok = bytes(np.asarray(out)) == data
            ratio = len(data) / int(frame.shape[0])
            comp_gbs = len(data) / t_comp / 1e9
            dec_gbs = len(data) / t_dec / 1e9
            print(f"{fmt:9s} ratio {ratio:6.2f}  compress {comp_gbs:7.3f} "
                  f"GB/s  decompress {dec_gbs:7.3f} GB/s  "
                  f"{'bit-exact' if ok else 'MISMATCH'}")
            rows.append((fmt, ratio, comp_gbs, dec_gbs, ok,
                         comp_compile, dec_compile))
        except Exception as e:  # noqa: BLE001
            print(f"{fmt:9s} FAILED: {e}", file=sys.stderr)
            rows.append((fmt, 0.0, 0.0, 0.0, False, 0.0, 0.0))
    if args.csv:
        hbm = 682.0
        try:
            import json as _json
            with open("results/calibration_r5.json") as cf:
                hbm = _json.load(cf)["verdict"]["hbm_gbs"]
        except Exception:  # noqa: BLE001
            pass
        with open(args.csv, "w") as f:
            f.write("dataset,format,ratio,compress_gbs,decompress_gbs,"
                    "decomp_pct_of_hbm_roofline,bit_exact,"
                    "compress_compile_s,decompress_compile_s,"
                    "corpus_mb,chunk_kb\n")
            for fmt, ratio, cg, dg, ok, cc, dc in rows:
                f.write(f"{args.dataset},{fmt},{ratio:.2f},{cg:.4f},"
                        f"{dg:.4f},{100 * dg / hbm:.3f},{ok},{cc:.1f},"
                        f"{dc:.1f},{args.synthetic_mb},"
                        f"{args.chunk_size // 1024}\n")
        log(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
