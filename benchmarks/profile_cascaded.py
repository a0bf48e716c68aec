"""Stage-by-stage TPU profile of cascaded fast-path decode (VERDICT r4 #2).

Times, under the marginal chained protocol: full decode, stage1 (parse +
unpack + cumsum, lax.map), the Pallas RLE expand, stage2 (byte assembly),
and the encode for comparison — on the flagship int64-column config and the
default config, mortgage-like data.

Usage: python benchmarks/profile_cascaded.py [--mb 4]
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
    t_small = min(run(1) for _ in range(2))
    t_big = min(run(1 + kn) for _ in range(2))
    return max(t_big - t_small, 1e-9) / kn


def chained(fn):
    """fn(a, b) -> pytree of arrays; returns jitted chained loop."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(a, b, k):
        def body(i, carry):
            b2, acc = carry
            outs = fn(a, b2)
            sm = jnp.int32(0)
            for o in jax.tree_util.tree_leaves(outs):
                sm = sm + jnp.sum(o.astype(jnp.int32)).astype(jnp.int32)
            acc = (acc + sm).astype(jnp.int32)
            dep = (acc == jnp.int32(-0x80000000)).astype(b2.dtype)
            return (b2 + dep).astype(b2.dtype), acc
        return jax.lax.fori_loop(0, k, body, (b, jnp.int32(0)))[1]
    return loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=4)
    ap.add_argument("--chunk-kb", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpucomp.chunk import ChunkBatch
    from tpucomp.constants import ElementType
    from tpucomp.formats.cascaded import CascadedOpts
    from tpucomp.ops import cascaded_fast as cf
    from tpucomp.utils import synth

    log(f"device: {jax.devices()[0]}")
    chunk = args.chunk_kb << 10
    total = args.mb << 20

    configs = [
        ("mortgage-LL-r2d1", synth.mortgage_like(total, seed=42).tobytes(),
         CascadedOpts(type=ElementType.LONGLONG, num_rles=2, num_deltas=1,
                      use_bp=True)),
        ("mortgage-default", synth.mortgage_like(total, seed=42).tobytes(),
         CascadedOpts()),
        ("mixed-default", synth.mixed_corpus(total, seed=42).tobytes(),
         CascadedOpts()),
    ]

    for name, corpus, opts in configs:
        chunks = [corpus[o:o + chunk] for o in range(0, len(corpus), chunk)]
        if len(chunks[-1]) != chunk:
            chunks = chunks[:-1]
        tot = sum(map(len, chunks))
        cb = ChunkBatch.from_chunks(chunks)
        cap = 2 * chunk + 4096
        co, cs, st = jax.jit(
            lambda d, s: cf.compress_batch(d, s, opts, cap))(
            cb.data, cb.sizes)
        assert int(np.asarray(st).max()) == 0
        ratio = tot / int(np.asarray(cs).sum())
        comp = jnp.asarray(np.asarray(co))
        csz = jnp.asarray(np.asarray(cs))

        out_cap = chunk
        B = comp.shape[0]

        # --- full decode
        dt = marginal(chained(
            lambda c, z: cf.decompress_batch(c, z, out_cap)), comp, csz)
        log(f"[{name}] ratio {ratio:.2f}  FULL decode  "
            f"{tot/dt/1e9:8.4f} GB/s ({dt*1e3:.2f} ms)")

        # --- stage1 only (parse+unpack+cumsum under lax.map)
        capv = comp.shape[1]
        need_words = -(-capv // 4) + out_cap + 16
        pad = 4 * need_words - capv
        c4 = jnp.pad(comp, ((0, 0), (0, pad))).reshape(B, -1, 4).astype(
            jnp.uint32)
        comp_u32 = (c4[..., 0] | (c4[..., 1] << 8) | (c4[..., 2] << 16)
                    | (c4[..., 3] << 24))

        def s1(c, z):
            return jax.vmap(
                lambda a, b, cc: cf._stage1(a, b, cc, out_cap))(
                c, comp_u32, z.astype(jnp.int32))
        dt1 = marginal(chained(s1), comp, csz)
        log(f"[{name}]   stage1(vmap)            "
            f"{tot/dt1/1e9:8.4f} GB/s ({dt1*1e3:.2f} ms)")

        # --- expand only (on real stage1 outputs)
        vlo, vhi, r1, r2, scal, ts, ok = s1(comp, csz)

        def ex2(a, z):
            s2 = scal.at[:, 3].set(scal[:, 3] + (z[0] * 0).astype(jnp.int32))
            return jax.vmap(
                lambda aa, bb, cc, dd, ee: cf._expand_chunk(
                    aa, bb, cc, dd, ee, out_cap))(vlo, vhi, r1, r2, s2)
        dte = marginal(chained(ex2), comp, csz)
        log(f"[{name}]   vector expand           "
            f"{tot/dte/1e9:8.4f} GB/s ({dte*1e3:.2f} ms)")

        # --- stage2 only
        elou, ehiu = jax.vmap(
            lambda aa, bb, cc, dd, ee: cf._expand_chunk(
                aa, bb, cc, dd, ee, out_cap))(vlo, vhi, r1, r2, scal)

        def st2(a, z):
            return jax.vmap(
                lambda l, h, t, nn, o: cf._stage2(l, h, t, nn, o, out_cap))(
                elou, ehiu, ts, scal[:, 0] + (z[0] * 0).astype(ts.dtype), ok)
        dt2 = marginal(chained(st2), comp, csz)
        log(f"[{name}]   stage2(vmap)            "
            f"{tot/dt2/1e9:8.4f} GB/s ({dt2*1e3:.2f} ms)")

        # --- encode for comparison
        dtc = marginal(chained(
            lambda d, s: cf.compress_batch(d, s, opts, cap)),
            cb.data, cb.sizes)
        log(f"[{name}]   encode(lax.map)         "
            f"{tot/dtc/1e9:8.4f} GB/s ({dtc*1e3:.2f} ms)")



if __name__ == "__main__":
    main()
