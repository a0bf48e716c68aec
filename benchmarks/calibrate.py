"""Device calibration — measured rooflines for the benchmark device.

Answers the question every per-chip claim in PERF_MODEL depends on: is the
tunnel device real v5e-class silicon or an emulation orders of magnitude
slower?  Four measurements, all under the same unhoistable chained protocol
as tpucomp.bench (each iteration's input derives from the previous
iteration's output; the timer is terminated by a host readback of a
checksum of every produced value, so nothing can be hoisted, folded, or
acked early):

  (a) bf16 matmul TFLOP/s at 512..4096 square        -> MXU roofline
  (b) HBM stream add x=(x+y)*0.5 at 32..256 MiB      -> HBM BW roofline
      (3 x size bytes per iteration: read x, read y, write x)
  (c) dependent scalar xorshift loop, ns/iteration    -> scalar-core rate
      (two variants, 1-op and 3-op body, to split loop overhead from op cost)
  (d) unrolled f32 FMA chain y=y*a+b (64 deep)        -> VPU roofline

Reference anchor (public v5e specs): 197 bf16 TFLOP/s, 819 GB/s HBM,
~1.7 GHz core clock.  The reference framework anchors its claims to named
hardware the same way (/root/reference/doc/Benchmarks.md:78-95).

Usage:  python benchmarks/calibrate.py [--json results/calibration_r5.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _timed_loop(loop, args, k, k0: int = 2):
    """Marginal per-iteration time: (t(k0+k) - t(k0)) / k.

    A single program execution on the tunnel device costs ~25 ms of fixed
    launch+readback latency regardless of work (measured 2026-08-20: k=1..256
    of a 1024^3 matmul loop all complete in 25.4-27.6 ms).  Dividing one
    execution's wall time by k therefore overstates per-iteration cost by
    ~25/k ms.  Timing two executions at different chain lengths and taking
    the difference cancels the fixed cost exactly.
    """
    import jax.numpy as jnp

    def run(kk):
        t0 = time.time()
        int(loop(*args, jnp.int32(kk)))
        return time.time() - t0

    int(loop(*args, jnp.int32(1)))          # compile + drain
    # pilot estimate, then scale k so marginal work is >=100 ms (well above
    # the ~0.5 ms run-to-run noise of the 25 ms launch overhead)
    est = max((run(64) - run(2)) / 62, 1e-8)
    k = min(max(k, int(0.1 / est)), 1 << 17)
    t_small = min(run(k0) for _ in range(3))
    t_big = min(run(k0 + k) for _ in range(3))
    return max(t_big - t_small, 1e-9) / k


def cal_matmul(n: int, k: int = 64):
    """bf16 n*n @ n*n chained: C=A@B, A'=A+eps(checksum(C))."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    a = (jax.random.normal(key, (n, n), jnp.float32) * 0.01).astype(jnp.bfloat16)
    b = (jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
         * 0.01).astype(jnp.bfloat16)

    @jax.jit
    def loop(a, b, kk):
        def body(i, carry):
            a2, acc = carry
            c = jnp.dot(a2, b, preferred_element_type=jnp.float32)
            sm = jnp.sum(c).astype(jnp.int32)
            acc = (acc + sm).astype(jnp.int32)
            dep = (acc == jnp.int32(-0x80000000)).astype(a2.dtype)
            return (a2 + dep, acc)
        _, acc = jax.lax.fori_loop(0, kk, body, (a, jnp.int32(0)))
        return acc

    t = _timed_loop(loop, (a, b), k)
    flops = 2.0 * n * n * n
    return {"test": "matmul_bf16", "n": n, "s_per_iter": t,
            "tflops": flops / t / 1e12}


def cal_hbm_stream(mib: int, k: int = 32):
    """x=(x+y)*0.5 over `mib` MiB f32 arrays; 3x bytes moved per iter."""
    import jax
    import jax.numpy as jnp

    n = (mib << 20) // 4
    x = jnp.ones((n,), jnp.float32)
    y = jnp.full((n,), 2.0, jnp.float32)

    @jax.jit
    def loop(x, y, kk):
        def body(i, x2):
            return (x2 + y) * jnp.float32(0.5)
        x2 = jax.lax.fori_loop(0, kk, body, x)
        return jnp.sum(x2).astype(jnp.int32)

    t = _timed_loop(loop, (x, y), k)
    nbytes = 3.0 * n * 4
    return {"test": "hbm_stream_add", "mib": mib, "s_per_iter": t,
            "gbs": nbytes / t / 1e9}


def cal_scalar_loop(m: int = 1_000_000, ops: int = 3, k: int = 8):
    """Dependent scalar xorshift chain, `ops` in {1,3} ops per iteration."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(seed, kk):
        def outer(j, acc):
            def body(i, c):
                reps = max(ops // 3, 1)
                for _ in range(reps):
                    c = c ^ (c << 13)
                    if ops >= 3:
                        c = c ^ (c >> 17)
                        c = c ^ (c << 5)
                return c
            return jax.lax.fori_loop(0, m, body, acc)
        return jax.lax.fori_loop(0, kk, outer, seed).astype(jnp.int32)

    t = _timed_loop(loop, (jnp.int32(2463534242 & 0x7FFFFFFF),), k)
    return {"test": f"scalar_loop_{ops}op", "iters": m,
            "s_per_iter": t, "ns_per_loop_iter": t / m * 1e9}


def cal_vpu_chain(mib: int = 8, depth: int = 64, k: int = 32):
    """y=y*a+b unrolled `depth` deep per pass over an f32 array."""
    import jax
    import jax.numpy as jnp

    n = (mib << 20) // 4
    y = jnp.full((n,), 0.5, jnp.float32)

    @jax.jit
    def loop(y, kk):
        def body(i, y2):
            a = jnp.float32(0.999)
            b = jnp.float32(0.0005)
            for _ in range(depth):
                y2 = y2 * a + b
            return y2
        y2 = jax.lax.fori_loop(0, kk, body, y)
        return jnp.sum(y2).astype(jnp.int32)

    t = _timed_loop(loop, (y,), k)
    flops = 2.0 * depth * n
    return {"test": "vpu_fma_chain", "mib": mib, "depth": depth,
            "s_per_iter": t, "gflops": flops / t / 1e9}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    import jax
    dev = jax.devices()[0]
    results = {"device": str(dev), "platform": dev.platform,
               "device_kind": getattr(dev, "device_kind", "?"),
               "rows": []}
    print(f"device: {dev} ({results['device_kind']})")

    mat_ns = [1024, 2048] if args.quick else [512, 1024, 2048, 4096]
    for n in mat_ns:
        r = cal_matmul(n)
        results["rows"].append(r)
        print(f"matmul bf16 {n:5d}^3: {r['tflops']:8.2f} TFLOP/s "
              f"({r['s_per_iter']*1e3:.3f} ms/iter)")

    mibs = [32, 128] if args.quick else [32, 64, 128, 256]
    for mib in mibs:
        r = cal_hbm_stream(mib)
        results["rows"].append(r)
        print(f"hbm stream {mib:4d} MiB: {r['gbs']:8.2f} GB/s "
              f"({r['s_per_iter']*1e3:.3f} ms/iter)")

    for ops in (1, 3, 48):
        r = cal_scalar_loop(ops=ops)
        results["rows"].append(r)
        print(f"scalar loop {ops:2d}-op: {r['ns_per_loop_iter']:8.3f} ns/iter"
              f" ({r['ns_per_loop_iter']/ops:6.3f} ns/op)")

    r = cal_vpu_chain()
    results["rows"].append(r)
    print(f"vpu fma chain: {r['gflops']:8.2f} GFLOP/s")

    # Derived verdict vs public v5e specs.  HBM roofline = the largest
    # (HBM-resident) stream size; smaller sizes stay VMEM-resident across
    # loop iterations and measure VMEM bandwidth instead (~7.5 TB/s at
    # 32 MiB arrays — itself a useful roofline for kernel-resident data).
    best_tf = max((x.get("tflops", 0) for x in results["rows"]), default=0)
    streams = [x for x in results["rows"] if x["test"] == "hbm_stream_add"]
    hbm_bw = streams[-1]["gbs"] if streams else 0.0
    vmem_bw = streams[0]["gbs"] if streams else 0.0
    results["verdict"] = {
        "peak_measured_tflops": best_tf,
        "hbm_gbs": hbm_bw, "vmem_stream_gbs": vmem_bw,
        "v5e_spec_tflops": 197.0, "v5e_spec_hbm_gbs": 819.0,
        "mxu_fraction_of_v5e": best_tf / 197.0,
        "hbm_fraction_of_v5e": hbm_bw / 819.0,
    }
    print(f"\nverdict: MXU {best_tf:.1f}/197 TFLOP/s "
          f"({100*best_tf/197:.1f}% of v5e spec), "
          f"HBM {hbm_bw:.1f}/819 GB/s ({100*hbm_bw/819:.1f}% of v5e spec), "
          f"VMEM-resident stream {vmem_bw:.0f} GB/s")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")
    return results


if __name__ == "__main__":
    main()
