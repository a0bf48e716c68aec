"""Pallas LZ4 decoder, two-chunk interleaved variant.

Same format logic as :mod:`.lz4_decode`, but each grid step decodes TWO
independent chunks with their token walks interleaved in one loop body: the
per-token preludes (token/offset/extension SMEM loads and the path-selection
arithmetic) of both chunks issue back-to-back, giving the in-order scalar
core two overlapping dependency chains — chunk B's independent loads fill
the latency bubbles behind chunk A's — before the (briefly serial) copy
branches run.  A pair finishes when BOTH chunks finish; corpora with
similar-sized chunks (the normal batched case) waste little.

Kept alongside the single-chunk kernel so the dispatch can pick whichever
measures faster on real silicon; both pass the same oracle suites.
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


def _kernel(out_cap: int, w_words: int,
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
        """LZ4 length extension, WORD-at-a-time: each iteration consumes up
        to four 255-bytes (the byte-serial loop cost ~8 cycles/byte, which
        dominated ratio-39 data whose multi-KB matches carry dozens of
        extension bytes).  Exact same (ip, ln) outcome as the byte loop,
        including the truncated-at-csize error shape the caller checks."""
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
            k = is0 + is1 + is2 + is3              # leading 255s in the word
            avail = csize - ip
            run_hits_end = k >= avail              # 255s reach the block end
            c_run = jnp.where(run_hits_end, jnp.maximum(avail, 0), k)
            term = jax.lax.shift_right_logical(
                w, (k & 3) * 8) & 0xFF              # byte after the run (k<4)
            done_term = jnp.logical_and(k < 4, jnp.logical_not(run_hits_end))
            ln = ln + 255 * c_run + jnp.where(done_term, term, 0)
            ip = ip + c_run + done_term.astype(jnp.int32)
            go = jnp.logical_and(k == 4, jnp.logical_not(run_hits_end))
            return ip, ln, go

        ip, ln, _ = jax.lax.while_loop(
            cond, body, (ip, ln, ip < csize))
        return ip, ln

    def prelude(c, csize, ip, op):
        """Unconditional per-token loads + path arithmetic for chunk c —
        issued for BOTH chunks back-to-back so the load chains overlap."""
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
        """Apply one token of chunk c using its prelude p."""
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
            wide = jnp.logical_and(p["off"] >= bc.WIDE,
                                   p["ml_m"] >= 2 * bc.BLK)

            @pl.when(wide)
            def _():
                bc.copy_bytes_wide(out_ref, out_ref, op2 - p["off"], op2,
                                   p["ml_m"], c, c)

            @pl.when(jnp.logical_and(p["off"] >= bc.BLK,
                                     jnp.logical_not(wide)))
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

            @pl.when(jnp.logical_and(lit_ok, ll >= 2 * bc.BLK))
            def _():
                bc.copy_bytes_wide(lanes_ref, out_ref, ip, op, ll, c, c)

            @pl.when(jnp.logical_and(
                lit_ok, jnp.logical_and(ll > 0, ll < 2 * bc.BLK)))
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

    csA = size_ref[2 * g]
    csB = size_ref[2 * g + 1]

    def active(csize, st):
        ip, op, err, done = st
        return jnp.logical_and(jnp.logical_not(jnp.logical_or(err, done)),
                               ip < csize)

    def loop_cond(s):
        return jnp.logical_or(active(csA, s[0:4]), active(csB, s[4:8]))

    def loop_body(s):
        stA = s[0:4]
        stB = s[4:8]
        # both preludes first: the load chains overlap
        pA = prelude(0, csA, stA[0], stA[1])
        pB = prelude(1, csB, stB[0], stB[1])
        stA = jax.lax.cond(active(csA, stA),
                           lambda st: step(0, csA, pA, st),
                           lambda st: st, stA)
        stB = jax.lax.cond(active(csB, stB),
                           lambda st: step(1, csB, pB, st),
                           lambda st: st, stB)
        return stA + stB

    z = jnp.int32(0)
    st0 = (z, z, csA < 0, csA < 0, z, z, csB < 0, csB < 0)
    s = jax.lax.while_loop(loop_cond, loop_body, st0)

    for c, (csize, st) in enumerate(((csA, s[0:4]), (csB, s[4:8]))):
        _, op, err, done = st
        err = jnp.logical_or(err, jnp.logical_and(csize > 0,
                                                  jnp.logical_not(done)))
        too_big = jnp.logical_and(jnp.logical_not(err), op > out_cap)
        ok = jnp.logical_not(jnp.logical_or(err, too_big))
        osize_ref[2 * g + c] = jnp.where(ok, op, jnp.int32(0))
        stat_ref[2 * g + c] = jnp.where(
            err, jnp.int32(Status.ERROR_CANNOT_DECOMPRESS),
            jnp.where(too_big,
                      jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                      jnp.int32(Status.SUCCESS)))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False):
    """Batched LZ4 decode, interleaved-pair Pallas backend.  Same
    signature/semantics as :func:`tpucomp.ops.pallas.lz4_decode
    .decompress_batch`."""
    B, comp_cap = comp.shape
    B2 = _round_up(B, 2)
    if B2 != B:
        comp = jnp.pad(comp, ((0, B2 - B), (0, 0)))
        comp_sizes = jnp.pad(comp_sizes, (0, B2 - B))

    wpad = _round_up(max(comp_cap, 8), 4)
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(B2, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    lpad = _round_up(comp_cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(comp, ((0, 0), (0, lpad - comp_cap))).astype(jnp.int32)
    lanes = lanes.reshape(B2, lpad // bc.BLK, bc.BLK)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    with jax.enable_x64(False):
        out_lanes, osz, stat = pl.pallas_call(
            functools.partial(_kernel, out_cap, wpad // 4),
            grid=(B2 // 2,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes (B2,)
                pl.BlockSpec((2, 1, wpad // 4), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2, lpad // bc.BLK, bc.BLK),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((2, out_rows, bc.BLK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B2, out_rows, bc.BLK), jnp.int32),
                jax.ShapeDtypeStruct((B2,), jnp.int32),
                jax.ShapeDtypeStruct((B2,), jnp.int32),
            ],
            interpret=interpret,
        )(comp_sizes.astype(jnp.int32), words, lanes)

    out = out_lanes.reshape(B2, out_rows * bc.BLK)[:B, :out_cap]
    osz = osz[:B]
    stat = stat[:B]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat
