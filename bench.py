#!/usr/bin/env python
"""tpucomp benchmark — prints ONE JSON line with the headline metric.

Headline: LZ4 batched decompress GB/s on one TPU chip over a synthetic
analog of the reference's own headline dataset (mortgage-2009Q2 col0-long,
ratio ~39 — ``synth.mortgage_like``; the reference's 320.70 GB/s A100 LLIF
number is measured on that dataset, ``doc/Benchmarks.md:95``, see
BASELINE.md), 64 KiB chunks.  A Silesia-like ratio-2.5 mixed corpus is
measured alongside and reported as ``mixed_gbs`` — serial LZ decode cost
scales with token count, so the two differ by ~the ratio quotient;
``vs_baseline`` is ours / reference on the LIKE-FOR-LIKE dataset.

Measurement methodology (hardened against async runtimes whose completion
acks cannot be trusted — see BENCH_NOTES.md): the corpus decode runs as an
ON-DEVICE ``fori_loop`` of K chained, data-dependent iterations inside one
compiled program, and the timer stops only when a checksum derived from every
decoded byte has been READ BACK to the host — a value that cannot exist before
the device truly finished.  Two samples (K=1 and K=1+N) isolate fixed overhead
from marginal per-iteration cost; throughput = corpus_bytes / slope.  On an
honest runtime this equals the conventional number; on a lying one it is the
only correct measurement.

Decode inputs are produced host-side by liblz4 (standard LZ4 streams — the
stronger conformance statement).  Compress is measured by the same chained
readback protocol through the product encoder (the sort-matched Pallas
kernel on TPU) and reported as ``compress_gbs``/``compress_ratio``.
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
    ap.add_argument("--batch-chunks", type=int, default=8)
    ap.add_argument("--skip-compress", action="store_true")
    ap.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"],
                    help="decode path: auto = Pallas kernel on TPU when the "
                         "format has one, else fused-XLA program")
    ap.add_argument("--with-compress", action="store_true",
                    help="(kept for compatibility: compress is measured by "
                         "default since round 3; --skip-compress disables)")
    ap.add_argument("--dataset", default="both",
                    choices=["mortgage", "mixed", "both"],
                    help="mortgage = reference-headline-like ratio-39 column "
                         "data; mixed = Silesia-like ratio-2.5; both = "
                         "headline on mortgage, mixed reported alongside")
    args = ap.parse_args()

    # the axon tunnel can hang device init indefinitely when degraded, and
    # the blocked C call cannot be interrupted in-process — probe it in a
    # SUBPROCESS first and fail fast with a parseable line
    import os
    import subprocess
    probe_s = int(os.environ.get("TPUCOMP_BENCH_STARTUP_TIMEOUT", "1200"))
    if probe_s > 0:
        try:
            subprocess.run([sys.executable, "-c",
                            "import jax; jax.devices()"],
                           timeout=probe_s, check=False,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        except subprocess.TimeoutExpired:
            print(json.dumps({
                "metric": f"{args.codec}_decompress_throughput",
                "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0,
                "error": "device init timeout (axon tunnel unresponsive)",
            }))
            sys.exit(3)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpucomp import batched
    from tpucomp.utils import synth
    from tpucomp.interop import cpu as interop

    dev = jax.devices()[0]
    on_axon = "axon" in (jax.config.jax_platforms or "")
    log(f"device: {dev} ({dev.platform}{', axon tunnel' if on_axon else ''})")
    # (round 3: the sort-matched Pallas encoders compile in ~20 s and run at
    # 0.15-0.24 GB/s, so compress is measured by default everywhere; the old
    # tunnel skip only applies when explicitly requested)

    mb = args.mb or (4 if args.quick else 32)
    iters = args.iters or (3 if args.quick else 8)
    chunk = args.chunk_kb * 1024
    B = args.batch_chunks
    fmt = args.codec
    spec = batched._get(fmt)
    opts = spec.default_opts
    cap = spec.max_compressed_chunk_size(chunk, opts)
    dec_batch = batched._decode_fn(fmt, spec, args.backend)
    if dec_batch is not spec.decompress_batch:
        log(f"decode path: Pallas kernel ({fmt})")
    else:
        log(f"decode path: fused XLA ({fmt})")
    try:
        enc_batch = batched._encode_fn(fmt, spec, args.backend)
    except ValueError:  # --backend pallas but no Pallas encoder for fmt
        enc_batch = spec.compress_batch
    log(f"encode path: {'Pallas kernel' if enc_batch is not spec.compress_batch else 'fused XLA'} ({fmt})")

    def make_corpus(name):
        if name == "mortgage":
            return synth.mortgage_like(mb << 20, seed=42).tobytes()
        return synth.mixed_corpus(mb << 20, seed=42).tobytes()

    def to_chunks(corpus):
        chunks = [corpus[o:o + chunk] for o in range(0, len(corpus), chunk)]
        if chunks and len(chunks[-1]) != chunk:
            # typed codecs (cascaded/bitcomp) need element-size-multiple chunks
            chunks = chunks[:-1]
        nt = len(chunks) // B
        return chunks[:nt * B], nt

    datasets = (["mortgage", "mixed"] if args.dataset == "both"
                else [args.dataset])
    chunks, nt = to_chunks(make_corpus(datasets[0]))
    n_used = len(chunks)
    total_bytes = sum(map(len, chunks))
    log(f"corpus: {mb} MiB, {n_used} chunks of {args.chunk_kb} KiB, "
        f"{nt} tiles of {B}")

    # flip-detector probe: a trivial compiled program whose dispatch time tells
    # us whether the tunnel is in fast or degraded mode
    probe_x = jnp.ones((128, 128), jnp.float32)
    probe_f = jax.jit(lambda x: (x * 2 + 1).sum())
    jax.block_until_ready(probe_f(probe_x))

    def probe_ms():
        t0 = time.time()
        for _ in range(3):
            r = probe_f(probe_x)
        jax.block_until_ready(r)
        return (time.time() - t0) / 3 * 1e3

    # ---------------- stage host-compressed streams for the decode measure ----------
    def stage(chunks):
        """(device original batch, device compressed batch, comp bytes)."""
        if fmt == "lz4" and interop.available().get("lz4"):
            comp_host = [interop.lz4_compress(c) for c in chunks]
        elif fmt == "deflate":
            comp_host = [interop.deflate_compress(c) for c in chunks]
        elif fmt == "snappy" and interop.available().get("snappy"):
            comp_host = [interop.snappy_compress(c) for c in chunks]
        else:
            # formats without a CPU oracle: stage decode inputs with our own
            # encoder on the host CPU backend (the tunnel's remote compile of
            # the encoder takes 10+ min; the CPU backend compiles in seconds)
            cpu0 = jax.devices("cpu")[0]
            enc = jax.jit(
                lambda d, s: jax.lax.map(
                    lambda t: spec.compress_batch(t[0], t[1], opts, cap),
                    (d, s)),
                device=cpu0)
            o = np.zeros((nt, B, chunk), np.uint8)
            osz = np.zeros((nt, B), np.int32)
            for i, c in enumerate(chunks):
                o[i // B, i % B, :len(c)] = np.frombuffer(c, np.uint8)
                osz[i // B, i % B] = len(c)
            t0 = time.time()
            carr, cszs, csts = map(np.asarray, enc(o, osz))
            log(f"staged decode inputs via CPU-backend encoder in "
                f"{time.time()-t0:.1f}s")
            assert (csts == 0).all(), "staging compress failed"
            comp_host = [carr[i // B, i % B, :cszs[i // B, i % B]].tobytes()
                         for i in range(len(chunks))]

        orig = np.zeros((nt, B, chunk), np.uint8)
        orig_sz = np.zeros((nt, B), np.int32)
        for i, c in enumerate(chunks):
            orig[i // B, i % B, :len(c)] = np.frombuffer(c, np.uint8)
            orig_sz[i // B, i % B] = len(c)
        datas = jax.device_put(jnp.asarray(orig))
        sizesd = jax.device_put(jnp.asarray(orig_sz))

        carr = np.zeros((nt, B, cap), np.uint8)
        szarr = np.zeros((nt, B), np.int32)
        for i, c in enumerate(comp_host):
            carr[i // B, i % B, :len(c)] = np.frombuffer(c, np.uint8)
            szarr[i // B, i % B] = len(c)
        comp_d = jax.device_put(jnp.asarray(carr))
        csz_d = jax.device_put(jnp.asarray(szarr))
        return datas, sizesd, comp_d, csz_d, sum(map(len, comp_host))

    datas, sizesd, comp_d, csz_d, comp_bytes_host = stage(chunks)

    @jax.jit
    def dec_fn(c, z):
        return jax.lax.map(lambda t: dec_batch(t[0], t[1], chunk),
                           (c, z))

    @jax.jit
    def dec_loop(c, z, k):
        # K chained decodes with a true data dependency; returns a checksum of
        # every decoded byte so a host readback proves completion
        def body(i, carry):
            z, acc = carry
            dec, dsz, dst = jax.lax.map(
                lambda t: dec_batch(t[0], t[1], chunk), (c, z))
            sm = (jnp.sum(dec.astype(jnp.int32)) + jnp.sum(dst)
                  + jnp.sum(dsz)).astype(jnp.int32)
            acc = (acc + sm).astype(jnp.int32)
            # unforgeable chain: 0 unless acc == INT32_MIN (probability ~2^-32)
            # — XLA cannot prove it, so iteration i+1 truly depends on acc_i.
            # (The old ``sm * 0`` constant-folded; XLA hoisted the body out of
            # the loop and the protocol over-reported by up to K.)
            dep = (acc == jnp.int32(-0x80000000)).astype(jnp.int32)
            return (z + dep).astype(jnp.int32), acc
        _, acc = jax.lax.fori_loop(0, k, body, (z, jnp.int32(0)))
        return acc

    @jax.jit
    def comp_fn(d, s):
        return jax.lax.map(
            lambda t: enc_batch(t[0], t[1], opts, cap), (d, s))

    # ---------------- decode (the headline) -------------------------------------------
    pre = probe_ms()

    def measure_decode(name, comp_d, csz_d):
        # compile + TRULY synchronized warmup: the readback drains every
        # queued execution, so the timed sample starts from an idle device
        t0 = time.time()
        chk1 = int(dec_loop(comp_d, csz_d, jnp.int32(1)))
        log(f"[{fmt}/{name}] decompress compile+first-run(synced) "
            f"{time.time()-t0:.1f}s")
        # marginal timing (BENCH_NOTES round-5): the tunnel adds ~25 ms of
        # fixed launch+readback latency per execution; timing two chain
        # lengths and differencing cancels it; the chain length adapts so
        # the marginal work is >=200 ms (above launch-latency noise)
        def run(kk):
            t0 = time.time()
            int(dec_loop(comp_d, csz_d, jnp.int32(kk)))
            return time.time() - t0
        est = max((run(5) - run(1)) / 4, 1e-7)
        KN = min(max(iters * 2, 8, int(0.2 / est)), 1 << 14)
        t_small = min(run(1) for _ in range(2))
        t_big = min(run(1 + KN) for _ in range(2))
        t = max(t_big - t_small, 1e-9)
        gbs = KN * total_bytes / t / 1e9
        log(f"[{fmt}/{name}] decompress {gbs:.3f} GB/s "
            f"({KN} marginal chained iterations in {t:.2f}s, "
            f"readback-terminated; checksum {chk1})")
        return gbs

    ds_gbs = {}
    ds_ratio = {datasets[0]: total_bytes / comp_bytes_host}
    decomp_gbs = ds_gbs[datasets[0]] = measure_decode(
        datasets[0], comp_d, csz_d)
    dec_out = dec_fn(comp_d, csz_d)

    # ---------------- compress (chained readback protocol, like decode) --------------
    comp_gbs = None
    comp_ratio = None
    if not args.skip_compress:
        @jax.jit
        def comp_loop(d, s, k):
            def body(i, carry):
                s2, acc = carry
                comp, csz, cst = jax.lax.map(
                    lambda t: enc_batch(t[0], t[1], opts, cap), (d, s2))
                sm = (jnp.sum(comp.astype(jnp.int32)) + jnp.sum(csz)
                      + jnp.sum(cst)).astype(jnp.int32)
                acc = (acc + sm).astype(jnp.int32)
                dep = (acc == jnp.int32(-0x80000000)).astype(jnp.int32)
                return (s2 + dep).astype(jnp.int32), acc
            _, acc = jax.lax.fori_loop(0, k, body, (s, jnp.int32(0)))
            return acc

        t0 = time.time()
        int(comp_loop(datas, sizesd, jnp.int32(1)))
        log(f"[{fmt}] compress compile+first-run(synced) {time.time()-t0:.1f}s")
        def crun(kk):
            t0 = time.time()
            int(comp_loop(datas, sizesd, jnp.int32(kk)))
            return time.time() - t0
        est = max((crun(5) - crun(1)) / 4, 1e-7)
        KN = min(max(iters, 4, int(0.2 / est)), 1 << 14)
        t_small = min(crun(1) for _ in range(2))
        t_big = min(crun(1 + KN) for _ in range(2))
        t = max(t_big - t_small, 1e-9)
        comp_gbs = KN * total_bytes / t / 1e9
        comp, csz, cst = comp_fn(datas, sizesd)
        comp_ratio = total_bytes / int(np.asarray(csz).sum())
        assert int(np.asarray(cst).max()) == 0, "compress statuses"
        log(f"[{fmt}] compress {comp_gbs:.3f} GB/s at ratio {comp_ratio:.2f} "
            f"({KN} chained iterations, readback-terminated, marginal)")

    # ---------------- verification (on-device compare, scalar readbacks) -------------
    dec, dsz, dst = dec_out

    @jax.jit
    def verify(dec, dsz, dst):
        ok = jnp.all(dst == 0)
        ok = jnp.logical_and(ok, jnp.all(dsz == sizesd))
        ok = jnp.logical_and(ok, jnp.all(dec == datas))
        return ok

    ok = bool(verify(dec, dsz, dst))
    assert ok, f"[{fmt}] round trip NOT bit-exact"
    ratio = ds_ratio[datasets[0]]
    log(f"[{fmt}/{datasets[0]}] verified bit-exact; ratio {ratio:.2f}")

    # remaining datasets reuse the SAME compiled programs (identical shapes)
    for name in datasets[1:]:
        chunks2, _ = to_chunks(make_corpus(name))
        d2, s2, c2, z2, cb2 = stage(chunks2)
        ds_gbs[name] = measure_decode(name, c2, z2)
        ds_ratio[name] = total_bytes / cb2
        dec2, dz2, dt2 = dec_fn(c2, z2)
        ok2 = bool(jnp.logical_and(
            jnp.all(dt2 == 0),
            jnp.logical_and(jnp.all(dz2 == s2), jnp.all(dec2 == d2))))
        assert ok2, f"[{fmt}/{name}] round trip NOT bit-exact"
        log(f"[{fmt}/{name}] verified bit-exact; ratio {ds_ratio[name]:.2f}")

    head = datasets[0]
    extras = {f"{n}_gbs": round(g, 4) for n, g in ds_gbs.items() if n != head}
    extras.update({f"{n}_ratio": round(ds_ratio[n], 2) for n in ds_gbs})
    if comp_gbs is not None:
        extras["compress_gbs"] = round(comp_gbs, 4)
        extras["compress_ratio"] = round(comp_ratio, 2)
    print(json.dumps({
        "metric": f"{fmt}_decompress_throughput",
        "value": round(decomp_gbs, 4),
        "unit": "GB/s",
        "vs_baseline": round(decomp_gbs / A100_LZ4_DECOMP_GBS, 4),
        "dataset": head,
        **extras,
    }))


if __name__ == "__main__":
    main()
