"""Pallas/Mosaic LZ4 block decoder: serial token walk in SMEM, vector copies.

This is the TPU analog of the reference's per-threadblock serial decode
(``doc/algorithms_overview.md:50-52`` — one block per chunk, warp-cooperative
copies): the scalar core walks the token stream out of SMEM (compressed bytes
packed 4-per-int32 word) while literal and match copies run as 128-byte VPU
"wild copies" (:mod:`tpucomp.ops.pallas.bytecopy`) in VMEM.  One grid step per
chunk — chunk-DP like the reference's grid of threadblocks, sequential on the
single TensorCore.

Contrast with the default XLA path (:mod:`tpucomp.formats.lz4`), which does a
log-depth speculative parse at every byte position: that path is fully parallel
but costs ~30-40 full-buffer gather passes per chunk; this kernel touches each
byte O(1) times but serializes the parse on the scalar unit.  PERF_MODEL.md
quantifies the crossover; the batched API exposes both.

A two-chunk interleaved variant lives in :mod:`.lz4_decode2` (overlapping
token-walk load chains); the kernel report A/Bs the pair on hardware.

Error contract matches the reference (``CHANGELOG.md:160-164``): corrupt input
yields per-chunk ``ERROR_CANNOT_DECOMPRESS`` and size 0 — never an
out-of-bounds access (copies are suppressed once any bound would be crossed;
the output buffer carries :data:`bytecopy.PAD_BYTES` of wild-store slack).
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
    b = pl.program_id(0)
    csize = size_ref[b]
    max_byte = 4 * w_words - 1

    def getb(i):
        # int32 clip bounds: bare Python ints become i64 constants under the
        # package-wide x64 mode, which Mosaic cannot lower (see bytecopy).
        ic = jnp.clip(i, jnp.int32(0), jnp.int32(max_byte))
        w = words_ref[0, 0, ic >> 2]
        return (w >> ((i & 3) * 8)) & 0xFF

    def get3(i):
        """Bytes at i, i+1, i+2 from two word loads (the wrapper pads the
        word array, so i>>2 + 1 is always in bounds for i < csize)."""
        wi = jnp.clip(i >> 2, jnp.int32(0), jnp.int32(w_words - 2))
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(w1, (32 - sh) & jnp.int32(31))
        v = jnp.where(sh == 0, w0, lo | hi)
        return v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF

    def get4(i):
        wi = jnp.clip(i >> 2, jnp.int32(0), jnp.int32(w_words - 2))
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        hi = jax.lax.shift_left(w1, (32 - sh) & jnp.int32(31))
        return jnp.where(sh == 0, w0, lo | hi)

    def read_ext(ip, ln):
        """Word-at-a-time LZ4 length extension (see lz4_decode2)."""
        def cond(s):
            ip, _, go = s
            return go

        def body(s):
            ip, ln, _ = s
            w = get4(ip)
            is0 = ((w & 0xFF) == 255).astype(jnp.int32)
            is1 = is0 * (((w >> 8) & 0xFF) == 255).astype(jnp.int32)
            is2 = is1 * (((w >> 16) & 0xFF) == 255).astype(jnp.int32)
            is3 = is2 * ((jax.lax.shift_right_logical(w, jnp.int32(24))
                          & 0xFF) == 255).astype(jnp.int32)
            k = is0 + is1 + is2 + is3
            avail = csize - ip
            run_hits_end = k >= avail
            c_run = jnp.where(run_hits_end, jnp.maximum(avail, 0), k)
            term = jax.lax.shift_right_logical(w, (k & 3) * 8) & 0xFF
            done_term = jnp.logical_and(k < 4, jnp.logical_not(run_hits_end))
            ln = ln + 255 * c_run + jnp.where(done_term, term, 0)
            ip = ip + c_run + done_term.astype(jnp.int32)
            go = jnp.logical_and(k == 4, jnp.logical_not(run_hits_end))
            return ip, ln, go

        ip, ln, _ = jax.lax.while_loop(cond, body, (ip, ln, ip < csize))
        return ip, ln

    def loop_cond(s):
        ip, op, err, done = s
        return jnp.logical_and(jnp.logical_not(jnp.logical_or(err, done)),
                               ip < csize)

    def loop_body(s):
        ip, op, err, done = s
        token, tb1, tb2 = get3(ip)
        ll0 = token >> 4
        ml0 = token & 15

        # ---------------- fast path: short literals + short in-bounds match --
        # (ll<15, ml<15, one wild block each, no self-overlap) — the common
        # case by far (avg literal run 2.2 B, avg match 11.2 B on the mixed
        # corpus; PERF_MODEL.md §2)
        q = ip + 1 + ll0                      # offset field position
        ob0, ob1, ob2_f = get3(q)
        off_f = ob0 | (ob1 << 8)
        ml_f = ml0 + MIN_MATCH
        terminal_f = ip + 1 + ll0 == csize
        fast = jnp.logical_and(ll0 < 15, ml0 < 15)
        fast = jnp.logical_and(fast, jnp.logical_or(terminal_f, ml_f <= off_f))
        fast = jnp.logical_and(fast, op + ll0 + ml_f <= out_cap)
        fast = jnp.logical_and(fast, q + 2 <= csize)
        fast = jnp.logical_and(fast, off_f <= op + ll0)
        fast = jnp.logical_or(jnp.logical_and(fast, off_f > 0),
                              jnp.logical_and(terminal_f,
                                              jnp.logical_and(ll0 < 15,
                                                              op + ll0 <= out_cap)))

        # ---------------- medium path: short literals + LONG match -----------
        # (ll<15, ml0==15 with one or two extension bytes, i.e. matches up to
        # 529 B — the dominant token on high-ratio columnar data, e.g. the
        # ratio-39 headline corpus where matches average ~360 B).  get3(q)
        # already delivers offset lo/hi AND the first extension byte; copies
        # go through the block/pattern pair.
        ext2 = ob2_f == 255
        eb2 = getb(q + 3)
        ml_m = 19 + ob2_f + jnp.where(ext2, eb2, 0)
        q_adv = q + 3 + ext2.astype(jnp.int32)
        med = jnp.logical_and(ll0 < 15, ml0 == 15)
        med = jnp.logical_and(med, jnp.logical_or(jnp.logical_not(ext2),
                                                  eb2 < 255))
        med = jnp.logical_and(med, q_adv <= csize)
        med = jnp.logical_and(med, off_f > 0)
        med = jnp.logical_and(med, off_f <= op + ll0)
        med = jnp.logical_and(med, op + ll0 + ml_m <= out_cap)

        def fast_part(a):
            ip, op, err, done = a

            @pl.when(ll0 > 0)
            def _():
                v = bc.window128(lanes_ref, ip + 1)
                bc.store128_wild(out_ref, op, v)

            op2 = op + ll0

            @pl.when(jnp.logical_not(terminal_f))
            def _():
                v = bc.window128(out_ref, op2 - off_f)
                bc.store128_wild(out_ref, op2, v)

            ip2 = jnp.where(terminal_f, csize, q + 2)
            op3 = jnp.where(terminal_f, op2, op2 + ml_f)
            return ip2, op3, err, terminal_f

        def med_part(a):
            ip, op, err, done = a

            @pl.when(ll0 > 0)
            def _():
                v = bc.window128(lanes_ref, ip + 1)
                bc.store128_wild(out_ref, op, v)

            op2 = op + ll0

            @pl.when(off_f >= bc.BLK)
            def _():
                bc.copy_bytes(out_ref, out_ref, op2 - off_f, op2, ml_m)

            @pl.when(off_f < bc.BLK)
            def _():
                bc.copy_pattern(out_ref, op2, off_f, ml_m)

            return q_adv, op2 + ml_m, err, done

        def slow_part(a):
            ip, op, err, done = a
            ip = ip + 1

            # ---- literal run ---------------------------------------------------
            ll = ll0
            ip, ll = jax.lax.cond(ll == 15,
                                  lambda a2: read_ext(*a2),
                                  lambda a2: a2, (ip, ll))
            err = jnp.logical_or(err, ip + ll > csize)
            lit_ok = jnp.logical_and(jnp.logical_not(err), op + ll <= out_cap)

            @pl.when(jnp.logical_and(lit_ok, ll > 0))
            def _():
                bc.copy_bytes(lanes_ref, out_ref, ip, op, ll)

            ip = ip + ll
            op = op + ll
            done = ip == csize  # terminal token: literals end at block end

            # ---- match ---------------------------------------------------------
            def match_part(a2):
                ip, op, err = a2
                err = jnp.logical_or(err, ip + 2 > csize)
                off = getb(ip) | (getb(ip + 1) << 8)
                ip = ip + 2
                ml = ml0
                ip, ml = jax.lax.cond(ml == 15,
                                      lambda b2: read_ext(*b2),
                                      lambda b2: b2, (ip, ml))
                ml = ml + MIN_MATCH
                err = jnp.logical_or(err, ip > csize)
                err = jnp.logical_or(err, jnp.logical_or(off == 0, off > op))
                m_ok = jnp.logical_and(jnp.logical_not(err), op + ml <= out_cap)

                @pl.when(jnp.logical_and(m_ok, off >= bc.BLK))
                def _():
                    bc.copy_bytes(out_ref, out_ref, op - off, op, ml)

                @pl.when(jnp.logical_and(m_ok, off < bc.BLK))
                def _():
                    bc.copy_pattern(out_ref, op, off, ml)

                return ip, op + ml, err

            ip, op, err = jax.lax.cond(
                jnp.logical_or(done, err), lambda a2: a2, match_part,
                (ip, op, err))
            return ip, op, err, done

        return jax.lax.cond(
            fast, fast_part,
            lambda a: jax.lax.cond(med, med_part, slow_part, a),
            (ip, op, err, done))

    ip0 = jnp.int32(0)
    _, op, err, done = jax.lax.while_loop(
        loop_cond, loop_body, (ip0, ip0, csize < 0, csize < 0))

    # a non-empty block must end with a terminal (literal-only) token
    err = jnp.logical_or(err, jnp.logical_and(csize > 0,
                                              jnp.logical_not(done)))
    too_big = jnp.logical_and(jnp.logical_not(err), op > out_cap)
    ok = jnp.logical_not(jnp.logical_or(err, too_big))
    osize_ref[b] = jnp.where(ok, op, jnp.int32(0))
    stat_ref[b] = jnp.where(
        err, jnp.int32(Status.ERROR_CANNOT_DECOMPRESS),
        jnp.where(too_big, jnp.int32(Status.ERROR_OUTPUT_BUFFER_TOO_SMALL),
                  jnp.int32(Status.SUCCESS)))


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def decompress_batch(comp: jax.Array, comp_sizes: jax.Array, out_cap: int,
                     interpret: bool = False):
    """Batched LZ4 decode, Pallas backend.  Same signature/semantics as
    :func:`tpucomp.formats.lz4.decompress_batch` (vmapped XLA path)."""
    B, comp_cap = comp.shape

    # scalar-parse view: bytes packed 4-per-word, little-endian (>= 2 words:
    # the fast path loads word pairs)
    wpad = _round_up(max(comp_cap, 8), 4)
    cw = jnp.pad(comp, ((0, 0), (0, wpad - comp_cap))).astype(jnp.int32)
    cw = cw.reshape(B, 1, wpad // 4, 4)
    words = cw[..., 0] | (cw[..., 1] << 8) | (cw[..., 2] << 16) | (cw[..., 3] << 24)

    # vector-copy view: one byte per int32 lane, wild-copy slack rows appended
    lpad = _round_up(comp_cap, bc.BLK) + bc.PAD_BYTES
    lanes = jnp.pad(comp, ((0, 0), (0, lpad - comp_cap))).astype(jnp.int32)
    lanes = lanes.reshape(B, lpad // bc.BLK, bc.BLK)

    out_rows = (_round_up(out_cap, bc.BLK) + bc.PAD_BYTES) // bc.BLK

    # The package enables jax x64 globally; Mosaic cannot legalize the i64
    # values that mode injects into the pallas grid machinery ("func.return
    # (i64) -> ()" compile failures).  All kernel dtypes here are explicit, so
    # tracing the pallas_call with x64 off is semantics-preserving.
    with jax.enable_x64(False):
        out_lanes, osz, stat = _pallas_decode(
            B, comp_cap, out_cap, out_rows, wpad, lpad, interpret,
            comp_sizes.astype(jnp.int32), words, lanes)

    out = out_lanes.reshape(B, out_rows * bc.BLK)[:, :out_cap]
    opos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(opos < osz[:, None], out, 0).astype(jnp.uint8)
    return out, osz, stat


def _pallas_decode(B, comp_cap, out_cap, out_rows, wpad, lpad, interpret,
                   sizes, words, lanes):
    return pl.pallas_call(
        functools.partial(_kernel, out_cap, wpad // 4),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sizes: full (B,) array
            pl.BlockSpec((1, 1, wpad // 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lpad // bc.BLK, bc.BLK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_rows, bc.BLK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # osize: full (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # status: full (B,)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_rows, bc.BLK), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
        interpret=interpret,
    )(sizes, words, lanes)
