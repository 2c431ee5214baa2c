"""Config-4-class Mutect2 campaign: thousands of active regions over
the 60 Mb repeat-rich genome, tumor + normal, steady-state regions/s,
serial vs pooled worker sweep.

The reference sweeps all contigs in 1 Mb regions with an N-thread
region scheduler (deepmutect main.cpp:195-423, 577-592); active regions
are sparse (variant sites). This campaign plants `--sites` somatic SNVs
on the scale genome, simulates 30x tumor (VAF ~0.35) + 20x normal
pileups around each site, and drives Mutect2Engine.call_windows over
the whole contig — the engine walks every 1 Mb window; only windows
with reads do assembly/PairHMM work, like a real sparse-tumor run.

Usage (index from scale_run --build):
  python scripts/mutect_campaign.py /tmp/scale/idx --sites 1000 \
      --workers 0,3
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sim_reads(rng, ref, sites, depth, vaf, L=151, span=400):
    """Read dicts covering +-span/2 around each site; site alt applied
    with prob vaf (tumor) / 0 (normal)."""
    reads = []
    qual = np.full(L, 32, np.uint8)
    for pos, alt in sites:
        lo = max(pos - span // 2, 0)
        hi = min(pos + span // 2, len(ref) - L)
        n = max(int(depth * (hi - lo) / L), 1)
        starts = rng.integers(lo, max(hi, lo + 1), n)
        for s in starts:
            codes = ref[s:s + L].copy()
            m = rng.random(L) < 0.002          # sequencing errors
            codes[m] = rng.integers(0, 4, int(m.sum()))
            if vaf > 0 and s <= pos < s + L and rng.random() < vaf:
                codes[pos - s] = alt
            reads.append(dict(
                rid=0, pos=int(s), cigar=[(0, L)],
                seq_codes=codes.astype(np.int64),
                quals=qual.astype(np.int64),
                mate_start=int(s + 180), properly_paired=True,
                flag=0x2 | (0x10 if rng.random() < 0.5 else 0),
                mapq=60, is_reverse=False, frag_len=331))
    return reads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix")
    ap.add_argument("--sites", type=int, default=1000)
    ap.add_argument("--workers", default="0,3")
    ap.add_argument("--depth", type=int, default=30)
    args = ap.parse_args()

    from fgdp_tpu.call.engine import Mutect2Engine, _ReadIndex
    from fgdp_tpu.index.reference import PackedReference

    pref = PackedReference.load(args.prefix + ".ref")
    off = int(pref.offsets[0])
    ref = np.asarray(pref.codes[off:off + int(pref.lens[0])], np.uint8)
    n = len(ref)
    print(f"genome: {n} bp", file=sys.stderr)

    rng = np.random.default_rng(17)
    pos = np.sort(rng.choice(
        np.arange(2000, n - 2000, 1500), args.sites, replace=False))
    sites = []
    for p in pos:
        alt = (int(ref[p]) + int(rng.integers(1, 4))) % 4
        sites.append((int(p), alt))
    t0 = time.time()
    tumor = sim_reads(rng, ref, sites, args.depth, vaf=0.35)
    normal = sim_reads(rng, ref, sites, 20, vaf=0.0)
    print(f"simulated tumor {len(tumor)} + normal {len(normal)} reads "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    results = {}
    for w in [int(x) for x in args.workers.split(",")]:
        eng = Mutect2Engine(ref, "chr20s", region_workers=w)
        try:
            # warm on the first 20 sites' window span
            warm_end = int(pos[min(20, len(pos) - 1)]) + 2000
            ti, ni = _ReadIndex(tumor), _ReadIndex(normal)

            def windows(end=None):
                stop = end or n
                for rs in range(0, stop, eng.cfg.region_size):
                    yield (rs, min(rs + eng.cfg.region_size, stop),
                           ti, ni)

            eng.call_windows(windows(warm_end))
            t0 = time.time()
            calls = eng.call_windows(windows())
            dt = time.time() - t0
            nreg = eng.n_regions
            tp = sum(1 for c in calls
                     if any(abs(c.pos - p) <= 1 for p, _ in sites))
            print(f"workers={w}: {nreg} regions in {dt:.1f}s = "
                  f"{nreg/dt:.2f} regions/s; {len(calls)} calls "
                  f"({tp} at planted sites)", file=sys.stderr)
            results[w] = nreg / dt
        finally:
            eng.close()
    if 0 in results and len(results) > 1:
        for w, r in results.items():
            if w:
                print(f"pool speedup x{w}: {r/results[0]:.2f}",
                      file=sys.stderr)


if __name__ == "__main__":
    main()
