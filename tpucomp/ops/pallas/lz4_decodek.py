"""Pallas LZ4 decoder, K-way interleaved variant.

Generalizes :mod:`.lz4_decode2`'s two-chunk interleave: each grid step
decodes K independent chunks with their token walks interleaved in one loop
body.  The serial kernel's per-token critical path is two dependent SMEM
load hops (token byte -> offset field) plus the copy; one chunk leaves the
in-order scalar core idle for most of that latency, so K independent chains
issued back-to-back fill the bubbles.  Diminishing returns set in once the
issue slots are full — the kernel report A/Bs K on silicon and the dispatch
pins the winner.

Same format logic, bounds discipline, and statuses as the single-chunk
kernel; a K-group retires when ALL its chunks finish, so corpora with
similar-sized chunks (the normal batched case) waste little.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.constants import Status
from tpucomp.ops.pallas import bytecopy as bc

MIN_MATCH = 4


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(K: int, out_cap: int, w_words: int,
            size_ref, words_ref, lanes_ref, out_ref, osize_ref, stat_ref):
    g = pl.program_id(0)
    max_byte = 4 * w_words - 1

    def getb(c, i):
        ic = jnp.clip(i, jnp.int32(0), jnp.int32(max_byte))
        w = words_ref[c, 0, ic >> 2]
        return (w >> ((i & 3) * 8)) & 0xFF

    def get3(c, i):
        wi = jnp.clip(i >> 2, jnp.int32(0), jnp.int32(w_words - 2))
        w0 = words_ref[c, 0, wi]
        w1 = words_ref[c, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(w1, (32 - sh) & jnp.int32(31))
        v = jnp.where(sh == 0, w0, lo | hi)
        return v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF

    def get4(c, i):
        """Four bytes at i (LE word), clipped loads — memory-safe past csize."""
        wi = jnp.clip(i >> 2, jnp.int32(0), jnp.int32(w_words - 2))
        w0 = words_ref[c, 0, wi]
        w1 = words_ref[c, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(w1, (32 - sh) & jnp.int32(31))
        return jnp.where(sh == 0, w0, lo | hi)

    def read_ext(c, csize, ip, ln):
        """Word-at-a-time LZ4 length extension (see lz4_decode2)."""
        def cond(s):
            ip, _, go = s
            return go

        def body(s):
            ip, ln, _ = s
            w = get4(c, ip)
            is0 = ((w & 0xFF) == 255).astype(jnp.int32)
            is1 = is0 * (((w >> 8) & 0xFF) == 255).astype(jnp.int32)
            is2 = is1 * (((w >> 16) & 0xFF) == 255).astype(jnp.int32)
            is3 = is2 * ((jax.lax.shift_right_logical(w, jnp.int32(24))
                          & 0xFF) == 255).astype(jnp.int32)
            k = is0 + is1 + is2 + is3
            avail = csize - ip
            run_hits_end = k >= avail
            c_run = jnp.where(run_hits_end, jnp.maximum(avail, 0), k)
            term = jax.lax.shift_right_logical(
                w, (k & 3) * 8) & 0xFF
            done_term = jnp.logical_and(k < 4, jnp.logical_not(run_hits_end))
            ln = ln + 255 * c_run + jnp.where(done_term, term, 0)
            ip = ip + c_run + done_term.astype(jnp.int32)
            go = jnp.logical_and(k == 4, jnp.logical_not(run_hits_end))
            return ip, ln, go

        ip, ln, _ = jax.lax.while_loop(
            cond, body, (ip, ln, ip < csize))
        return ip, ln

    def prelude(c, csize, ip, op):
        """Unconditional per-token loads + path arithmetic for chunk slot c
        — issued for ALL K slots back-to-back so the load chains overlap."""
        token, _, _ = get3(c, ip)
        ll0 = token >> 4
        ml0 = token & 15
        q = ip + 1 + ll0
        ob0, ob1, ob2 = get3(c, q)
        eb2 = getb(c, q + 3)
        off = ob0 | (ob1 << 8)
        ml_f = ml0 + MIN_MATCH
        terminal = q == csize
        fast = jnp.logical_and(ll0 < 15, ml0 < 15)
        fast = jnp.logical_and(fast, jnp.logical_or(terminal, ml_f <= off))
        fast = jnp.logical_and(fast, op + ll0 + ml_f <= out_cap)
        fast = jnp.logical_and(fast, q + 2 <= csize)
        fast = jnp.logical_and(fast, off <= op + ll0)
        fast = jnp.logical_or(
            jnp.logical_and(fast, off > 0),
            jnp.logical_and(terminal,
                            jnp.logical_and(ll0 < 15,
                                            op + ll0 <= out_cap)))
        ext2 = ob2 == 255
        ml_m = 19 + ob2 + jnp.where(ext2, eb2, 0)
        q_adv = q + 3 + ext2.astype(jnp.int32)
        med = jnp.logical_and(ll0 < 15, ml0 == 15)
        med = jnp.logical_and(med, jnp.logical_or(jnp.logical_not(ext2),
                                                  eb2 < 255))
        med = jnp.logical_and(med, q_adv <= csize)
        med = jnp.logical_and(med, off > 0)
        med = jnp.logical_and(med, off <= op + ll0)
        med = jnp.logical_and(med, op + ll0 + ml_m <= out_cap)
        return dict(ll0=ll0, ml0=ml0, q=q, off=off, ml_f=ml_f,
                    terminal=terminal, fast=fast, med=med, ml_m=ml_m,
                    q_adv=q_adv)

    def step(c, csize, p, st):
        ip, op, err, done = st

        def fast_part(a):
            ip, op, err, done = a

            @pl.when(p["ll0"] > 0)
            def _():
                v = bc.window128(lanes_ref, ip + 1, c)
                bc.store128_wild(out_ref, op, v, c)

            op2 = op + p["ll0"]

            @pl.when(jnp.logical_not(p["terminal"]))
            def _():
                v = bc.window128(out_ref, op2 - p["off"], c)
                bc.store128_wild(out_ref, op2, v, c)

            ip2 = jnp.where(p["terminal"], csize, p["q"] + 2)
            op3 = jnp.where(p["terminal"], op2, op2 + p["ml_f"])
            return ip2, op3, err, p["terminal"]

        def med_part(a):
            ip, op, err, done = a

            @pl.when(p["ll0"] > 0)
            def _():
                v = bc.window128(lanes_ref, ip + 1, c)
                bc.store128_wild(out_ref, op, v, c)

            op2 = op + p["ll0"]

            @pl.when(p["off"] >= bc.BLK)
            def _():
                bc.copy_bytes(out_ref, out_ref, op2 - p["off"], op2,
                              p["ml_m"], c, c)

            @pl.when(p["off"] < bc.BLK)
            def _():
                bc.copy_pattern(out_ref, op2, p["off"], p["ml_m"], c)

            return p["q_adv"], op2 + p["ml_m"], err, done

        def slow_part(a):
            ip, op, err, done = a
            ip = ip + 1
            ll = p["ll0"]
            ip, ll = jax.lax.cond(ll == 15,
                                  lambda a2: read_ext(c, csize, *a2),
                                  lambda a2: a2, (ip, ll))
            err = jnp.logical_or(err, ip + ll > csize)
            lit_ok = jnp.logical_and(jnp.logical_not(err),
                                     op + ll <= out_cap)

            @pl.when(jnp.logical_and(lit_ok, ll > 0))
            def _():
                bc.copy_bytes(lanes_ref, out_ref, ip, op, ll, c, c)

            ip = ip + ll
            op = op + ll
            done = ip == csize

            def match_part(a2):
                ip, op, err = a2
                err = jnp.logical_or(err, ip + 2 > csize)
                off = getb(c, ip) | (getb(c, ip + 1) << 8)
                ip = ip + 2
                ml = p["ml0"]
                ip, ml = jax.lax.cond(ml == 15,
                                      lambda b2: read_ext(c, csize, *b2),
                                      lambda b2: b2, (ip, ml))
                ml = ml + MIN_MATCH
                err = jnp.logical_or(err, ip > csize)
                err = jnp.logical_or(err, jnp.logical_or(off == 0, off > op))
                m_ok = jnp.logical_and(jnp.logical_not(err),
                                       op + ml <= out_cap)

                @pl.when(jnp.logical_and(m_ok, off >= bc.BLK))
                def _():
                    bc.copy_bytes(out_ref, out_ref, op - off, op, ml, c, c)

                @pl.when(jnp.logical_and(m_ok, off < bc.BLK))
                def _():
                    bc.copy_pattern(out_ref, op, off, ml, c)

                return ip, op + ml, err

            ip, op, err = jax.lax.cond(
                jnp.logical_or(done, err), lambda a2: a2, match_part,
                (ip, op, err))
            return ip, op, err, done

        return jax.lax.cond(
            p["fast"], fast_part,
            lambda a: jax.lax.cond(p["med"], med_part, slow_part, a),
            (ip, op, err, done))

    cs = [size_ref[K * g + c] for c in range(K)]

    def active(csize, st):
        ip, op, err, done = st
        return jnp.logical_and(jnp.logical_not(jnp.logical_or(err, done)),
                               ip < csize)

    def loop_cond(s):
        a = active(cs[0], s[0:4])
        for c in range(1, K):
            a = jnp.logical_or(a, active(cs[c], s[4 * c:4 * c + 4]))
        return a

    def loop_body(s):
        sts = [s[4 * c:4 * c + 4] for c in range(K)]
        ps = [prelude(c, cs[c], sts[c][0], sts[c][1]) for c in range(K)]
        out = []
        for c in range(K):
            out.extend(jax.lax.cond(active(cs[c], sts[c]),
                                    lambda st, c=c: step(c, cs[c], ps[c], st),
                                    lambda st: st, sts[c]))
        return tuple(out)

    z = jnp.int32(0)
    st0 = ()
    for c in range(K):
        st0 = st0 + (z, z, cs[c] < 0, cs[c] < 0)
    s = jax.lax.while_loop(loop_cond, loop_body, st0)

    for c in range(K):
        _, op, err, done = s[4 * c:4 * c + 4]
        err = jnp.logical_or(err, jnp.logical_and(cs[c] > 0,
                                                  jnp.logical_not(done)))
        too_big = jnp.logical_and(jnp.logical_not(err), op > out_cap)
        ok = jnp.logical_not(jnp.logical_or(err, too_big))
        osize_ref[K * g + c] = jnp.where(ok, op, jnp.int32(0))
        stat_ref[K * g + c] = jnp.where(
            err, jnp.int32(Status.ERROR_CANNOT_DECOMPRESS),
            jnp.where(too_big,
                      jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                      jnp.int32(Status.SUCCESS)))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret", "k"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False, k: int = 4):
    """Batched LZ4 decode, K-way interleaved Pallas backend.  Same
    signature/semantics as :func:`tpucomp.ops.pallas.lz4_decode
    .decompress_batch` plus the static interleave width ``k``."""
    B, comp_cap = comp.shape
    BK = _round_up(max(B, 1), k)
    if BK != B:
        comp = jnp.pad(comp, ((0, BK - B), (0, 0)))
        comp_sizes = jnp.pad(comp_sizes, (0, BK - B))

    wpad = _round_up(max(comp_cap, 8), 4)
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(BK, 1, wpad // 4, 4)
    words = (cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16)
             | (cw[..., 3] << 24))

    lpad = _round_up(comp_cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(comp, ((0, 0), (0, lpad - comp_cap))).astype(jnp.int32)
    lanes = lanes.reshape(BK, lpad // bc.BLK, bc.BLK)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, k, out_cap, wpad // 4),
            grid=(BK // k,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes (BK,)
                pl.BlockSpec((k, 1, wpad // 4), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((k, lpad // bc.BLK, bc.BLK),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k, out_rows, bc.BLK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BK, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((BK,), jnp.int32),
                jax.ShapeDtypeStruct((BK,), jnp.int32),
            ],
            interpret=interpret,
        )(comp_sizes.astype(jnp.int32), words, lanes)

    out = out_lanes.reshape(BK, out_rows * bc.BLK)[:B, :out_cap]
    osz = osz[:B]
    stat = stat[:B]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
