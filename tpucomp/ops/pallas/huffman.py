"""Canonical Huffman decode tables for Pallas kernels (shared machinery).

Used by the Deflate (:mod:`.deflate_decode`) and GDeflate
(:mod:`.gdeflate_decode`) kernels: two-level lookup tables built per block in
SMEM scratch by the canonical incremental fill over length-then-symbol sorted
codes, with on-demand subtables (the classic inflate table algorithm).

Entry packing (int32): leaf ``(symbol << 8) | bits`` (bits consumed at that
level); subtable link ``SUB_FLAG | (offset << 8) | sub_bits``; uncovered
slots stay 0 and surface as invalid when hit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SUB_FLAG = 1 << 30  # plain int: a module-level jnp constant would be captured
                    # as a tracer across traces (see memory: jax 0.9 leak)


def make_table_builder(tab_ref, lens_ref, work_ref, cnt_ref, ofs_ref):
    """Return ``build_table(base, nsym, root, tbase, enough) -> err`` bound to
    the caller's SMEM scratch refs."""

    def build_table(base, nsym, root, tbase, enough):
        """Build the decode table for code lengths lens[base : base+nsym].
        Returns True on error (over-subscribed or table overflow)."""
        def z(i, c):
            tab_ref[tbase + i] = jnp.int32(0)
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(enough), z, jnp.int32(0),
                          unroll=False)
        for i in range(16):
            cnt_ref[i] = jnp.int32(0)

        def count(i, c):
            l = lens_ref[base + i]
            cnt_ref[l] = cnt_ref[l] + 1
            return c
        jax.lax.fori_loop(jnp.int32(0), nsym, count, jnp.int32(0),
                          unroll=False)

        # min/max used lengths + over-subscription check
        maxl = jnp.int32(0)
        minl = jnp.int32(16)
        left = jnp.int32(1)
        err = jnp.int32(0)
        for l in range(1, 16):
            c = cnt_ref[l]
            maxl = jnp.where(c > 0, jnp.int32(l), maxl)
            minl = jnp.where(jnp.logical_and(c > 0, minl == 16),
                             jnp.int32(l), minl)
            left = (left << 1) - c
            err = jnp.where(left < 0, jnp.int32(1), err)

        # offsets -> canonical (length, symbol) sort into work_ref
        ofs_ref[1] = jnp.int32(0)
        for l in range(1, 15):
            ofs_ref[l + 1] = ofs_ref[l] + cnt_ref[l]

        def sort(i, c):
            l = lens_ref[base + i]

            @pl.when(l > 0)
            def _():
                work_ref[ofs_ref[l]] = i
                ofs_ref[l] = ofs_ref[l] + 1
            return c
        jax.lax.fori_loop(jnp.int32(0), nsym, sort, jnp.int32(0),
                          unroll=False)

        def fill_all(_):
            # incremental fill in canonical order, creating subtables when a
            # code longer than root crosses into a fresh low-root-bits value
            def cond(s):
                (sym, ln, huff, nxt, curr, drop, low, used, e) = s
                return jnp.logical_and(e == 0, ln <= maxl)

            def body(s):
                (sym, ln, huff, nxt, curr, drop, low, used, e) = s

                # a code longer than root whose low root bits enter fresh
                # territory opens a new subtable BEFORE its fill (also covers
                # tables whose shortest code already exceeds root)
                mask = (1 << root) - 1
                need_sub = jnp.logical_and(ln > root, (huff & mask) != low)

                def make_sub(a):
                    nxt, curr, drop, low, used, e = a
                    drop = jnp.int32(root)
                    nxt = nxt + jax.lax.shift_left(jnp.int32(1), curr)
                    # size the new subtable: grow until the remaining codes fit
                    def scond(s3):
                        c2, lft = s3
                        return jnp.logical_and(c2 + drop < maxl, lft > 0)

                    def sbody(s3):
                        c2, lft = s3
                        lft = lft - cnt_ref[c2 + drop]
                        grow = lft > 0
                        return (jnp.where(grow, c2 + 1, c2),
                                jnp.where(grow, lft << 1, lft))
                    curr, _ = jax.lax.while_loop(
                        scond, sbody,
                        (ln - drop,
                         jax.lax.shift_left(jnp.int32(1), ln - drop)))
                    used = used + jax.lax.shift_left(jnp.int32(1), curr)
                    e = jnp.where(used > enough, jnp.int32(1), e)
                    low = huff & mask

                    @pl.when(e == 0)
                    def _():
                        tab_ref[tbase + low] = (SUB_FLAG
                                                | ((nxt - tbase) << 8) | curr)
                    return nxt, curr, drop, low, used, e

                nxt, curr, drop, low, used, e = jax.lax.cond(
                    need_sub, make_sub, lambda a: a,
                    (nxt, curr, drop, low, used, e))

                entry = (work_ref[sym] << 8) | (ln - drop)
                incr = jax.lax.shift_left(jnp.int32(1), ln - drop)
                fill0 = jax.lax.shift_left(jnp.int32(1), curr)
                hofs = nxt + jax.lax.shift_right_logical(huff, drop)

                def fcond(f):
                    return f > 0

                def fbody(f):
                    f = f - incr

                    @pl.when(e == 0)
                    def _():
                        tab_ref[hofs + f] = entry
                    return f
                jax.lax.while_loop(fcond, fbody, fill0)

                # increment huff as a bit-reversed counter at width ln
                def icond(s2):
                    return (huff & s2) != 0

                def ibody(s2):
                    return jax.lax.shift_right_logical(s2, jnp.int32(1))
                inc2 = jax.lax.while_loop(
                    icond, ibody, jax.lax.shift_left(jnp.int32(1), ln - 1))
                huff = jnp.where(inc2 != 0, (huff & (inc2 - 1)) + inc2,
                                 jnp.int32(0))

                sym = sym + 1
                cnt_ref[ln] = cnt_ref[ln] - 1
                exhausted = cnt_ref[ln] == 0
                fin = jnp.logical_and(exhausted, ln == maxl)
                ln = jnp.where(jnp.logical_and(exhausted,
                                               jnp.logical_not(fin)),
                               lens_ref[base + work_ref[sym]], ln)
                ln = jnp.where(fin, jnp.int32(16), ln)  # terminate
                return (sym, ln, huff, nxt, curr, drop, low, used, e)

            st = (jnp.int32(0), minl, jnp.int32(0), tbase, jnp.int32(root),
                  jnp.int32(0), jnp.int32(-1),
                  jax.lax.shift_left(jnp.int32(1), jnp.int32(root)),
                  jnp.int32(0))
            return jax.lax.while_loop(cond, body, st)[-1]

        any_codes = maxl > 0
        e2 = jax.lax.cond(jnp.logical_and(any_codes, err == 0), fill_all,
                          lambda _: err, jnp.int32(0))
        return jnp.logical_or(err != 0, e2 != 0)

    return build_table


def make_code_reader(tab_ref):
    """Return ``read_code(peek_fn, tbase, root) -> (sym, nbits, invalid)``
    bound to the caller's table ref.  ``peek_fn(n)`` must yield the next ``n``
    unconsumed bits (LSB-first), ``n`` traced, without consuming them."""

    def read_code(peek_fn, tbase, root):
        e = tab_ref[tbase + peek_fn(jnp.int32(root))]

        def sub(e):
            sb = e & 0xFF
            off = (e >> 8) & 0xFFFF
            v2 = jax.lax.shift_right_logical(
                peek_fn(root + sb), jnp.int32(root))
            e2 = tab_ref[tbase + off + v2]
            return e2, jnp.int32(root)

        e, drop = jax.lax.cond((e & SUB_FLAG) != 0, sub,
                               lambda e: (e, jnp.int32(0)), e)
        nb = e & 0xFF
        return (jax.lax.shift_right_logical(e, jnp.int32(8)), drop + nb,
                nb == 0)

    return read_code
