"""Supplementary round-5 silicon rows -> results/r5_extra.csv.

- zstd encode ladder: exact-entropy rung (custom FSE + exact literals)
  vs the speed rung (predefined FSE, no hist walk) on the same data
- cascaded flagship config (mortgage-like int64 column, LONGLONG r2 d1 bp)
  with the round-5 rebuilt decode

All rows marginal-protocol timed and verified in-run (python-zstandard /
round-trip bit-exactness).
"""
from __future__ import annotations

import _bootstrap  # noqa: F401

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def marginal(loop, a, b, kn=8):
    import jax.numpy as jnp

    def run(k):
        t0 = time.time()
        int(loop(a, b, jnp.int32(k)))
        return time.time() - t0

    run(1)
    est = max((run(5) - run(1)) / 4, 1e-7)
    kn = min(max(kn, int(0.2 / est)), 1 << 14)
    ts = min(run(1) for _ in range(2))
    tb = min(run(1 + kn) for _ in range(2))
    return max(tb - ts, 1e-9) / kn


def chained(fn):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(a, b, k):
        def body(i, c):
            b2, acc = c
            out = fn(a, b2)
            sm = jnp.int32(0)
            for o in jax.tree_util.tree_leaves(out):
                sm = sm + jnp.sum(o.astype(jnp.int32)).astype(jnp.int32)
            acc = (acc + sm).astype(jnp.int32)
            dep = (acc == jnp.int32(-0x80000000)).astype(b2.dtype)
            return (b2 + dep).astype(b2.dtype), acc
        return jax.lax.fori_loop(0, k, body, (b, jnp.int32(0)))[1]
    return loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=4)
    ap.add_argument("--csv", default="results/r5_extra.csv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpucomp.chunk import ChunkBatch
    from tpucomp.constants import ElementType
    from tpucomp.formats.cascaded import CascadedOpts
    from tpucomp.formats import cascaded as fcas
    from tpucomp.interop import cpu as interop
    from tpucomp.ops import cascaded_fast as cf
    from tpucomp.ops.pallas import zstd_encode
    from tpucomp.utils import synth

    log(f"device: {jax.devices()[0]}")
    rows = []
    chunk = 65536

    # ---- zstd encode ladder on mixed ---------------------------------
    buf = synth.mixed_corpus(args.mb << 20, seed=42).tobytes()
    chunks = [buf[o:o + chunk] for o in range(0, len(buf), chunk)]
    cb = ChunkBatch.from_chunks(chunks)
    d = jnp.asarray(cb.data)
    s = jnp.asarray(cb.sizes.astype(jnp.int32))
    tot = sum(map(len, chunks))
    for name, ee in (("zstd-exact", True), ("zstd-fast", False)):
        t0 = time.time()
        fn = jax.jit(lambda a, b, ee=ee: zstd_encode.compress_batch(
            a, b, 66000, exact_entropy=ee)).lower(d, s).compile()
        compile_s = time.time() - t0
        co, cs, st = map(np.asarray, fn(d, s))
        ok = bool((st == 0).all()) and all(
            interop.zstd_decompress(co[i, :cs[i]].tobytes(), len(c)) == c
            for i, c in enumerate(chunks))
        ratio = tot / cs.sum()
        t = marginal(chained(lambda a, b, ee=ee: zstd_encode.compress_batch(
            a, b, 66000, exact_entropy=ee)), d, s)
        rows.append(("mixed", name, "encode", ok, tot / t / 1e9, ratio,
                     compile_s))
        log(f"[{name}] ok={ok} {tot/t/1e9:.4f} GB/s ratio {ratio:.2f} "
            f"compile {compile_s:.0f}s")

    # ---- cascaded flagship (int64 column, LONGLONG r2 d1 bp) ---------
    buf = synth.mortgage_like(args.mb << 20, seed=42).tobytes()
    chunks = [buf[o:o + chunk] for o in range(0, len(buf), chunk)]
    cb = ChunkBatch.from_chunks(chunks)
    tot = sum(map(len, chunks))
    opts = CascadedOpts(type=ElementType.LONGLONG, num_rles=2, num_deltas=1,
                        use_bp=True)
    cap = fcas.max_compressed_chunk_size(chunk, opts)
    t0 = time.time()
    enc = jax.jit(lambda a, b: cf.compress_batch(a, b, opts, cap)) \
        .lower(cb.data, cb.sizes).compile()
    enc_compile = time.time() - t0
    co, cs, st = map(np.asarray, enc(cb.data, cb.sizes))
    assert (st == 0).all()
    ratio = tot / cs.sum()
    comp = jnp.asarray(co)
    csz = jnp.asarray(cs)
    t = marginal(chained(lambda a, b: cf.compress_batch(a, b, opts, cap)),
                 jnp.asarray(np.asarray(cb.data)),
                 jnp.asarray(np.asarray(cb.sizes)))
    rows.append(("mortgage-col", "cascaded-LL", "encode", True,
                 tot / t / 1e9, ratio, enc_compile))
    log(f"[cascaded-LL] encode {tot/t/1e9:.4f} GB/s ratio {ratio:.2f}")

    t0 = time.time()
    dec = jax.jit(lambda a, b: cf.decompress_batch(a, b, chunk)) \
        .lower(comp, csz).compile()
    dec_compile = time.time() - t0
    do, ds, dst = map(np.asarray, dec(comp, csz))
    ok = (bool((dst == 0).all())
          and bool((ds == np.asarray(cb.sizes)).all())
          and bool((do == np.asarray(cb.data)).all()))
    t = marginal(chained(lambda a, b: cf.decompress_batch(a, b, chunk)),
                 comp, csz)
    rows.append(("mortgage-col", "cascaded-LL", "decode", ok,
                 tot / t / 1e9, ratio, dec_compile))
    log(f"[cascaded-LL] decode ok={ok} {tot/t/1e9:.4f} GB/s")

    with open(args.csv, "w") as f:
        f.write("dataset,config,direction,bit_exact,gbs,ratio,compile_s\n")
        for ds_, nm, dr, ok, gbs, ratio, cs_ in rows:
            f.write(f"{ds_},{nm},{dr},{ok},{gbs:.4f},{ratio:.2f},"
                    f"{cs_:.1f}\n")
    log(f"wrote {args.csv}")
    sys.exit(0 if all(r[3] for r in rows) else 1)


if __name__ == "__main__":
    main()
