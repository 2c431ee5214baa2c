"""Repeat-rich synthetic genome generator (chr20-scale runs).

Uniform-random references are seeding-friendly (no repeats, no K2
pressure); real genomes are ~50% repetitive. This generator produces a
sequence with the repeat classes that stress an aligner's seeding:
  - 2nd-order Markov background (GC-biased, non-uniform k-mer spectrum)
  - an Alu-like SINE family: ~300 bp consensus, copies at ~10%
    divergence, ~10% of the genome
  - a LINE-like family: ~3 kb consensus, truncated copies, ~8%
  - microsatellites: (unit 1-6)^n expansions, ~2%
  - segmental duplications: 10-50 kb blocks copied at ~1% divergence

Usage: python scripts/gen_genome.py <mbp> <out.npy> [seed]
"""

import sys

import numpy as np


def markov_background(rng, n, order=2):
    """GC-biased 2nd-order Markov chain over {0..3}."""
    # random transition table biased away from uniform
    T = rng.dirichlet(np.full(4, 0.7), size=4 ** order).astype(np.float32)
    out = np.empty(n, np.uint8)
    out[:order] = rng.integers(0, 4, order)
    # vectorized blocks: sample in chunks with rejection-free inverse CDF
    cdf = np.cumsum(T, axis=1)
    state = int(out[0]) * 4 + int(out[1])
    u = rng.random(n)
    for i in range(order, n):
        c = int(np.searchsorted(cdf[state], u[i], side="right"))
        c = min(c, 3)
        out[i] = c
        state = ((state * 4) % (4 ** order)) + c
    return out


def markov_fast(rng, n):
    """Vectorized unique background: i.i.d. draws under a GC/composition
    profile that drifts per 100 kb isochore. (A first version tiled ONE
    64 kb Markov block genome-wide — every 20-mer then occurred ~n/64k
    times and the whole genome was one giant repeat; backgrounds must be
    unique sequence, repeats come from the explicit families below.)"""
    iso = 100_000
    blocks = []
    for b0 in range(0, n, iso):
        ln = min(iso, n - b0)
        gc = rng.beta(5, 5) * 0.3 + 0.35        # GC in ~[0.35, 0.65]
        pa = (1 - gc) / 2
        p = np.array([pa, gc / 2, gc / 2, pa])
        blocks.append(rng.choice(4, size=ln, p=p).astype(np.uint8))
    return np.concatenate(blocks)[:n]


def mutate(rng, s, div):
    s = s.copy()
    m = rng.random(len(s)) < div
    s[m] = rng.integers(0, 4, int(m.sum()))
    return s


def generate(n, seed=0):
    rng = np.random.default_rng(seed)
    g = markov_fast(rng, n)

    # Alu-like: 300 bp consensus, ~10% of genome at 10% divergence
    alu = rng.integers(0, 4, 300).astype(np.uint8)
    n_alu = int(n * 0.10 / 300)
    pos = rng.integers(0, n - 400, n_alu)
    for p in pos:
        c = mutate(rng, alu, 0.10)
        if rng.random() < 0.5:
            c = (3 - c)[::-1]
        g[p:p + 300] = c

    # LINE-like: 3 kb consensus, truncated copies, ~8%
    line = rng.integers(0, 4, 3000).astype(np.uint8)
    n_line = int(n * 0.08 / 1500)      # avg half-length copies
    pos = rng.integers(0, n - 3100, n_line)
    for p in pos:
        ln = int(rng.integers(500, 3000))
        c = mutate(rng, line[-ln:], 0.08)
        if rng.random() < 0.5:
            c = (3 - c)[::-1]
        g[p:p + ln] = c

    # microsatellites: ~2%
    n_ms = int(n * 0.02 / 120)
    pos = rng.integers(0, n - 1200, n_ms)
    for p in pos:
        u = int(rng.integers(1, 7))
        unit = rng.integers(0, 4, u).astype(np.uint8)
        reps = int(rng.integers(20, 1000 // max(u, 1)))
        seg = np.tile(unit, reps)[:1100]
        g[p:p + len(seg)] = mutate(rng, seg, 0.02)

    # segmental duplications: 6 blocks of 10-50 kb at 1% divergence
    for _ in range(max(2, n // 10_000_000)):
        ln = int(rng.integers(10_000, 50_000))
        src = int(rng.integers(0, n - ln))
        dst = int(rng.integers(0, n - ln))
        g[dst:dst + ln] = mutate(rng, g[src:src + ln], 0.01)
    return g


def main():
    mbp = float(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n = int(mbp * 1e6)
    g = generate(n, seed)
    np.save(out, g)
    print(f"wrote {out}: {n} bp, GC={float(np.isin(g, [1, 2]).mean()):.3f}")


if __name__ == "__main__":
    main()
