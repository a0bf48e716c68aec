#!/usr/bin/env python
"""Round-4 supplementary silicon rows (honest chained protocol):

- deflate/gdeflate algo 0/1/2 encode ladders (ratio + GB/s)
- zstd kernel encode (new parse) on both corpora
- zstd big-regime (16 MB chunk) decode via the windowed HBM executor
- cascaded flagship config (mortgage-like int64 column, LONGLONG r2 d1 bp)

Writes results/r4_extra.csv.
"""
import _bootstrap  # noqa: F401

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


MAGIC = -0x80000000


def chained_time(step, carry0, iters=6):
    @jax.jit
    def loop(z, k):
        def body(i, c):
            z2, acc = c
            sm = step(z2)
            acc = (acc + sm).astype(jnp.int32)
            dep = (acc == jnp.int32(MAGIC)).astype(z2.dtype)
            return (z2 + dep).astype(z2.dtype), acc
        return jax.lax.fori_loop(0, k, body, (z, jnp.int32(0)))[1]
    t0 = time.time()
    int(loop(carry0, jnp.int32(1)))
    compile_s = time.time() - t0
    t0 = time.time()
    int(loop(carry0, jnp.int32(1 + iters)))
    t1 = time.time() - t0
    # slope: (K+1) - 1 iterations
    t0 = time.time()
    int(loop(carry0, jnp.int32(1)))
    t_one = time.time() - t0
    per = max((t1 - t_one) / iters, 1e-9)
    return per, compile_s


def main():
    from tpucomp.chunk import ChunkBatch
    from tpucomp.utils import synth
    rows = []

    # ---- encode ladders ------------------------------------------------
    from tpucomp.ops.pallas import deflate_encode as de
    from tpucomp.ops.pallas import gdeflate_encode as ge
    from tpucomp.ops.pallas import zstd_encode as zenc

    for ds in ("mixed", "mortgage"):
        gen = synth.mixed_corpus if ds == "mixed" else synth.mortgage_like
        corpus = gen(4 << 20, seed=42).tobytes()
        chunk = 65536
        chunks = [corpus[o:o + chunk] for o in range(0, len(corpus), chunk)]
        tot = sum(map(len, chunks))
        cb = ChunkBatch.from_chunks(chunks)
        cap = chunk + chunk // 2 + 3000

        cases = [
            ("deflate-algo1", lambda d, s: de.compress_batch_dyn(d, s, cap)),
            ("deflate-algo2", lambda d, s: de.compress_batch_dyn(
                d, s, cap, entropy_only=True)),
            ("gdeflate-algo1", lambda d, s: ge.compress_batch_dyn(d, s, cap)),
            ("gdeflate-algo2", lambda d, s: ge.compress_batch_dyn(
                d, s, cap, entropy_only=True)),
            ("zstd", lambda d, s: zenc.compress_batch(d, s, cap)),
        ]
        for name, fn in cases:
            co, cs, st = map(np.asarray, fn(cb.data, jnp.asarray(
                cb.sizes).astype(jnp.int32)))
            ok = bool((st == 0).all())
            ratio = tot / cs.sum()

            def step(z, fn=fn):
                o1, o2, o3 = fn(cb.data, z)
                return (jnp.sum(o1.astype(jnp.int32)) + jnp.sum(o2)
                        + jnp.sum(o3)).astype(jnp.int32)
            per, comp_s = chained_time(
                step, jnp.asarray(cb.sizes).astype(jnp.int32))
            gbs = tot / per / 1e9
            rows.append((ds, name, "encode", ok, f"{gbs:.4f}",
                         f"{ratio:.3f}", f"{comp_s:.0f}"))
            log(f"[{ds}/{name}] encode ok={ok} {gbs:.4f} GB/s "
                f"ratio {ratio:.3f} compile {comp_s:.0f}s")

    # ---- zstd big-regime decode (16 MB chunk) --------------------------
    import zstandard as zstd
    from tpucomp.ops.pallas import zstd_decode as zdec
    rng = np.random.default_rng(11)
    base = rng.integers(0, 25, 1 << 21, dtype=np.uint8).tobytes()
    txt = (b"the quick brown fox jumps over the lazy dog 0123456789 "
           * 40000)[: 2 << 20]
    parts = []
    for k in range(4):
        parts += [base, txt,
                  rng.integers(0, 255, 1 << 19, dtype=np.uint8).tobytes()]
    data16 = (b"".join(parts) * 2)[: 16 << 20]
    for lvl in (3, 19):
        frame = zstd.ZstdCompressor(level=lvl).compress(data16)
        comp = np.frombuffer(frame, np.uint8)[None, :].copy()
        sizes = np.full((1,), len(frame), np.int32)
        cj = jnp.asarray(comp)
        out, osz, st = map(np.asarray, zdec.decompress_batch_big(
            cj, jnp.asarray(sizes), len(data16)))
        ok = bool(st[0] == 0) and bytes(out[0][: len(data16)]) == data16

        def step(z, cj=cj):
            o, oz, s2 = zdec.decompress_batch_big(cj, z, len(data16))
            return (jnp.sum(o.astype(jnp.int32)) + jnp.sum(oz)
                    + jnp.sum(s2)).astype(jnp.int32)
        per, comp_s = chained_time(step, jnp.asarray(sizes), iters=4)
        gbs = len(data16) / per / 1e9
        rows.append(("16MB-synth", f"zstd-big-L{lvl}", "decode", ok,
                     f"{gbs:.4f}", f"{len(data16)/len(frame):.3f}",
                     f"{comp_s:.0f}"))
        log(f"[zstd-big L{lvl}] decode 16MB ok={ok} {gbs:.4f} GB/s "
            f"compile {comp_s:.0f}s")

    # ---- cascaded flagship (int64 column, LONGLONG r2 d1 bp) -----------
    from tpucomp.formats.cascaded import CascadedOpts
    from tpucomp.constants import ElementType
    from tpucomp.ops import cascaded_fast as cf
    v = np.cumsum(rng.integers(0, 3, (4 << 20) // 8)).astype(np.int64)
    colbuf = v.tobytes()
    chunk = 65536
    chunks = [colbuf[o:o + chunk] for o in range(0, len(colbuf), chunk)]
    tot = sum(map(len, chunks))
    cb = ChunkBatch.from_chunks(chunks)
    opts = CascadedOpts(type=ElementType.LONGLONG, num_rles=2, num_deltas=1,
                        use_bp=True)
    cap = 2 * chunk
    co, cs, st = map(np.asarray, cf.compress_batch(
        cb.data, jnp.asarray(cb.sizes).astype(jnp.int32), opts, cap))
    ok = bool((st == 0).all())
    ratio = tot / cs.sum()

    def estep(z):
        o1, o2, o3 = cf.compress_batch(cb.data, z, opts, cap)
        return (jnp.sum(o1.astype(jnp.int32)) + jnp.sum(o2)
                + jnp.sum(o3)).astype(jnp.int32)
    per, comp_s = chained_time(estep, jnp.asarray(cb.sizes).astype(jnp.int32))
    rows.append(("mortgage-col", "cascaded-LL", "encode", ok,
                 f"{tot/per/1e9:.4f}", f"{ratio:.3f}", f"{comp_s:.0f}"))
    log(f"[cascaded-LL] encode ok={ok} {tot/per/1e9:.4f} GB/s ratio {ratio:.2f}")

    cc = ChunkBatch.from_chunks([co[i, :cs[i]].tobytes()
                                 for i in range(len(chunks))])
    do, dz, dst = map(np.asarray, cf.decompress_batch(
        cc.data, jnp.asarray(cc.sizes).astype(jnp.int32), chunk))
    ok = bool((dst == 0).all()) and all(
        do[i, :len(c)].tobytes() == c for i, c in enumerate(chunks))

    def dstep(z):
        o1, o2, o3 = cf.decompress_batch(cc.data, z, chunk)
        return (jnp.sum(o1.astype(jnp.int32)) + jnp.sum(o2)
                + jnp.sum(o3)).astype(jnp.int32)
    per, comp_s = chained_time(dstep, jnp.asarray(cc.sizes).astype(jnp.int32))
    rows.append(("mortgage-col", "cascaded-LL", "decode", ok,
                 f"{tot/per/1e9:.4f}", f"{ratio:.3f}", f"{comp_s:.0f}"))
    log(f"[cascaded-LL] decode ok={ok} {tot/per/1e9:.4f} GB/s")

    with open("results/r4_extra.csv", "w") as f:
        f.write("dataset,case,direction,bit_exact,gbs,ratio,compile_s\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    log("wrote results/r4_extra.csv")


if __name__ == "__main__":
    main()
