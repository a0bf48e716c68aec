"""Sort-based vector match finder vs a brute-force oracle."""
import numpy as np
import jax.numpy as jnp

from tpucomp.ops import match
from tpucomp.utils import synth


def brute(chunk: bytes, window=65535):
    n = len(chunk)
    cand = np.full(n, -1, np.int32)
    seen = {}
    for p in range(n - 3):
        w = chunk[p:p + 4]
        if w in seen and p - seen[w][-1] <= window:
            # nearest previous occurrence
            for q in reversed(seen[w]):
                if p - q <= window:
                    cand[p] = q
                    break
        seen.setdefault(w, []).append(p)
    return cand


def test_candidates_exact_small():
    rng = np.random.default_rng(0)
    chunks = [
        b"abcabcabcabcabc" + b"x" * 9,
        bytes(rng.integers(0, 4, 300, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 300, dtype=np.uint8)),
        b"\x00" * 64,
    ]
    cap = max(map(len, chunks))
    data = np.zeros((len(chunks), cap), np.uint8)
    sizes = np.zeros(len(chunks), np.int32)
    for i, c in enumerate(chunks):
        data[i, :len(c)] = np.frombuffer(c, np.uint8)
        sizes[i] = len(c)
    cand, nxt = map(np.asarray, match.candidates(jnp.asarray(data),
                                                 jnp.asarray(sizes)))
    for i, c in enumerate(chunks):
        want = brute(c)
        got = cand[i, :len(c)]
        assert np.array_equal(got, want), (i, np.nonzero(got != want)[0][:5])
        # nxt: first q >= p with cand valid
        valid = np.nonzero(want >= 0)[0]
        for p in range(len(c)):
            nz = valid[valid >= p]
            expect = nz[0] if len(nz) else cap
            assert nxt[i, p] == expect, (i, p, nxt[i, p], expect)


def test_candidates_window_limit():
    # two occurrences 70000 apart: outside the 65535 window -> no candidate
    n = 70100
    buf = np.zeros(n, np.uint8)
    pat = np.frombuffer(b"WXYZ", np.uint8)
    buf[0:4] = pat
    buf[70000:70004] = pat
    # make everything else unique-ish to avoid accidental matches
    rnd = np.random.default_rng(1).integers(0, 256, n, dtype=np.uint8)
    buf[4:70000] = rnd[4:70000]
    buf[70004:] = rnd[70004:]
    cand, _ = map(np.asarray, match.candidates(
        jnp.asarray(buf[None]), jnp.asarray(np.array([n], np.int32))))
    want = brute(buf.tobytes())
    assert np.array_equal(cand[0], want)
    assert want[70000] == -1 or 70000 - want[70000] <= 65535


def test_candidates_guarantee_mixed():
    buf = synth.mixed_corpus(16384, seed=5).tobytes()
    a = np.frombuffer(buf, np.uint8)
    cand, _ = map(np.asarray, match.candidates(
        jnp.asarray(a[None]), jnp.asarray(np.array([len(a)], np.int32))))
    c = cand[0]
    p = np.nonzero(c >= 0)[0]
    # every candidate is a real >=4-byte match at a smaller position
    assert (c[p] < p).all()
    for k in range(4):
        assert np.array_equal(a[p + k], a[c[p] + k])
