"""Human-scale contig-sharded index evidence (VERDICT r4 #6).

Builds a >1 Gb multi-contig synthetic genome whose DOUBLED global text
exceeds 2^31 (the regime the reference's 34-bit packed SA exists for,
bwa-mem2-lcp/src/bwt.h:69-76), times the per-shard O(n) SA-IS builds,
and proves the int32-per-shard / int64-global-merge design: every
shard's device coordinates stay int32, planted reads align to their
GLOBAL int64 positions past 2^31 through ShardedAligner's merge
(parallel/sharded_index.py).

Usage: python scripts/bigindex_run.py [--contigs 10] [--mb 128]
       [--procs 3]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def gen_contig(rng, n):
    """Random base + dispersed repeat family (Alu-ish density kept low:
    SA-IS timing is length-driven; the repeat-rich worst case is the
    60 Mb campaign genome)."""
    g = rng.integers(0, 4, n, dtype=np.uint8)
    alu = rng.integers(0, 4, 300, dtype=np.uint8)
    for _ in range(n // 100_000):
        p = int(rng.integers(0, n - 300))
        g[p:p + 300] = alu
    return g


def _build_shard(args):
    i, codes_path, n = args
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from fgdp_tpu.index.fmindex import FMIndex
    codes = np.fromfile(codes_path, np.uint8)[:n]
    t0 = time.time()
    fm = FMIndex.build(codes)
    dt = time.time() - t0
    fm.save(codes_path + ".fmi")
    return i, dt, int(fm.sa[1]), len(fm.sa)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=10)
    ap.add_argument("--mb", type=int, default=128)
    ap.add_argument("--procs", type=int, default=3)
    args = ap.parse_args()

    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.parallel import sharded_index as si

    rng = np.random.default_rng(42)
    n = args.mb * 1_000_000
    names = [f"c{i}" for i in range(args.contigs)]
    t0 = time.time()
    contigs = [gen_contig(rng, n) for _ in range(args.contigs)]
    total = args.contigs * n
    print(f"genome: {args.contigs} x {args.mb} Mb = {total/1e9:.2f} Gb "
          f"(2x global text = {2*total/2**31:.2f} x 2^31) "
          f"gen {time.time()-t0:.0f}s", flush=True)
    pref = PackedReference.from_contigs(names, contigs)
    assert 2 * pref.l_pac > 2**31, "need >1.07 Gb to exceed int32"

    # ---- per-shard SA-IS timing (parallel host processes) ----
    import concurrent.futures as cf
    import multiprocessing as mp
    import tempfile
    tmpd = tempfile.mkdtemp(prefix="bigidx_")
    jobs = []
    for i, c in enumerate(contigs):
        p = os.path.join(tmpd, f"c{i}.u8")
        c.tofile(p)
        jobs.append((i, p, n))
    t0 = time.time()
    with cf.ProcessPoolExecutor(args.procs,
                                mp_context=mp.get_context("spawn")) as ex:
        times = sorted(ex.map(_build_shard, jobs))
    wall = time.time() - t0
    per = [dt for _, dt, _, _ in times]
    print(f"SA-IS+occ per {args.mb} Mb shard: min {min(per):.0f}s "
          f"median {sorted(per)[len(per)//2]:.0f}s max {max(per):.0f}s; "
          f"{args.contigs} shards wall {wall:.0f}s at {args.procs} "
          f"procs ({total/wall/1e6:.1f} Mb/s aggregate)", flush=True)

    # ---- int64 global-merge proof: plant reads in the LAST contig
    # (global coords past 2^31) and align through the sharded path ----
    from fgdp_tpu.index.fmindex import FMIndex
    L = 151
    shapes = BatchShapes(read_len=L, batch_reads=32)
    fms = [FMIndex.load(os.path.join(tmpd, f"c{i}.u8.fmi"))
           for i in range(args.contigs)]
    sa = si.ShardedAligner(pref, n_shards=args.contigs,
                           opt=AlignConfig(), shapes=shapes, lcp=False,
                           shard_fms=fms)
    last = args.contigs - 1
    rng2 = np.random.default_rng(7)
    pos = rng2.integers(0, n - L, 32)
    reads = [contigs[last][p:p + L].astype(np.int64) for p in pos]
    lines = sa.align_batch([f"q{i}" for i in range(32)], reads)
    ok = 0
    for ln, p in zip([l for l in lines if not l.startswith("@")], pos):
        f = ln.split("\t")
        gpos = int(pref.offsets[last]) + int(p)
        assert gpos + 1 > 2**31 // 2, "test should stress high coords"
        if f[2] == names[last] and abs(int(f[3]) - (p + 1)) <= 0:
            ok += 1
    print(f"global-merge parity: {ok}/32 planted reads mapped to their "
          f"exact global positions in contig {names[last]} "
          f"(global offset {int(pref.offsets[last]):,} "
          f"{'>' if int(pref.offsets[last]) > 2**31 else '<='} 2^31)",
          flush=True)


if __name__ == "__main__":
    main()
