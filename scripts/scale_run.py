"""Realistic-scale end-to-end run (BASELINE.json configs 2-3 class).

Stage 1 (--build): build the index artifacts for a repeat-rich synthetic
chr20-scale genome (scripts/gen_genome.py) and save them.
Stage 2 (--align N): simulate N reads (1% subs, 50% RC), stream them
through the full pipeline (device align + pooled finalize + streaming
sortdup + BGZF/BAI), and report reads/s + escalation-ladder hits.
Stage 3 (--sortdup N): sort/markdup N synthetic records via the mmap
streaming path, timed.

Usage:
  python scripts/scale_run.py --build /tmp/scale/chr20like.npy /tmp/scale/idx
  python scripts/scale_run.py --align /tmp/scale/idx 1000000
  python scripts/scale_run.py --sortdup /tmp/scale/idx 10000000
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build(npy, prefix):
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.utils import dna

    g = np.load(npy)
    print(f"genome: {len(g)} bp", file=sys.stderr)
    t0 = time.time()
    pref = PackedReference.from_contigs(["chr20s"], [g])
    pref.save(prefix + ".ref")
    print(f"pack: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    fm = FMIndex.build(pref.codes)
    fm.save(prefix + ".fmi")
    print(f"fm (SA-IS + occ): {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    x = np.concatenate([pref.codes, dna.revcomp(pref.codes)]).astype(
        np.uint8)
    LcpTree.build(x, fm.sa).save(prefix + ".lcp")
    print(f"lcp tree: {time.time()-t0:.1f}s", file=sys.stderr)


def align(prefix, n_reads, batch=4096, paired=False):
    from fgdp_tpu.cli import _read_batches
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.pipeline import Aligner
    from fgdp_tpu.pipeline_stream import FinalizePool, stream_fastq_to_bam
    from fgdp_tpu.utils import dna

    t0 = time.time()
    pref = PackedReference.load(prefix + ".ref")
    fm = FMIndex.load(prefix + ".fmi")
    lt = LcpTree.load(prefix + ".lcp.npz")
    print(f"index load: {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(99)
    L = 151
    n_ref = pref.l_pac
    fq = "/tmp/scale/reads.fq"
    t0 = time.time()
    # chunked simulation to bound memory
    with open(fq, "w") as f:
        done = 0
        while done < n_reads:
            m = min(100_000, n_reads - done)
            pos = rng.integers(0, n_ref - L, m)
            for i, p in enumerate(pos):
                c = pref.codes[p:p + L].copy()
                mm = rng.random(L) < 0.01
                c[mm] = rng.integers(0, 4, int(mm.sum()))
                if rng.random() < 0.5:
                    c = 3 - c[::-1]
                f.write(f"@r{done+i}\n{dna.decode(c.astype(np.uint8))}\n"
                        f"+\n{'I'*L}\n")
            done += m
    print(f"simulated {n_reads} reads: {time.time()-t0:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    # repeat-rich capacity profile (config.BatchShapes.repeat_rich):
    # the flat job pool is the dominant primary overflow cause on this
    # genome; the wider shapes cut the escalating tail 22.4% -> 9.6%
    # at ~20% primary cost (r5 probe series, /tmp/probe_shapes.py)
    aligner = Aligner(pref, fm, opt=AlignConfig(),
                      shapes=BatchShapes.repeat_rich(
                          read_len=L, batch_reads=batch),
                      lcp=lt)
    print(f"aligner init (device upload): {time.time()-t0:.1f}s",
          file=sys.stderr)
    workers = max((os.cpu_count() or 4) - 1, 1)
    pref_path = prefix + ".ref"
    pool = FinalizePool(pref_path, aligner.opt, workers)
    out_bam = "/tmp/scale/out.bam"
    try:
        # warm the ESCALATION LADDER at every bucket the campaign can
        # hit (repeat-rich genomes escalate ~40% of reads; flushes run
        # at B_esc in {128, 256, 512}) so no rung compile lands in the
        # timed pass — the r4 campaign's 407 reads/s conflated ~10 min
        # of lazy compiles with throughput (BASELINE.md)
        t0 = time.time()
        # L1 rungs at every bucket their big flushes use; L2 + tails
        # only at the small buckets they are reached with
        for b_esc in (128, 256, 512, 1024):
            aligner.warm_escalation(B_esc=b_esc,
                                    rungs=[("k2w", 1), ("cw", 1)])
        aligner.warm_escalation(B_esc=2048, rungs=[("cw", 1)])
        for b_esc in (128, 256, 512):
            aligner.warm_escalation(B_esc=b_esc,
                                    rungs=[("full", 2), ("cw", 2)])
        for b_esc in (1024, 2048):
            aligner.warm_escalation(B_esc=b_esc, rungs=[("cw", 2)])
        print(f"escalation ladder warm: {time.time()-t0:.1f}s",
              file=sys.stderr)
        # warmup on a small slice for compile
        warm_fq = "/tmp/scale/warm.fq"
        os.system(f"head -{4*batch*4} {fq} > {warm_fq}")
        stream_fastq_to_bam(aligner, _read_batches([warm_fq], batch),
                            out_bam, paired=False, pool=pool, depth=3)
        # warm the SORTDUP kernels at the TIMED pass's pow2 record
        # bucket (single-end records; the r5 campaign measured ~170 s
        # of one-shot dupscan/sort compiles inside SORT_FINISH)
        t0 = time.time()
        from fgdp_tpu.sortdup.driver import sort_markdup_file
        warm_sam = "/tmp/scale/warm_sort.sam"
        ref_len = int(pref.lens[0])
        rng_w = np.random.default_rng(1)
        with open(warm_sam, "w") as f:
            f.write("@HD\tVN:1.6\tSO:unsorted\n")
            f.write(f"@SQ\tSN:{pref.names[0]}\tLN:{ref_len}\n")
            seq, qual = "A" * 100, "I" * 100
            done = 0
            while done < n_reads + 64:
                m = min(200_000, n_reads + 64 - done)
                ps = rng_w.integers(1, ref_len - 200, m)
                f.writelines(
                    f"w{done+i}\t0\t{pref.names[0]}\t{int(p)}\t60\t"
                    f"100M\t*\t0\t0\t{seq}\t{qual}\n"
                    for i, p in enumerate(ps))
                done += m
        sort_markdup_file(warm_sam, "/tmp/scale/warm_sort.bam")
        os.unlink(warm_sam)
        print(f"sortdup shape warm: {time.time()-t0:.1f}s",
              file=sys.stderr)
        from fgdp_tpu.utils.profiling import PROF
        PROF.reset()
        aligner.esc_reads = aligner.esc_calls = 0
        t0 = time.time()
        n, (nrec, ndup) = stream_fastq_to_bam(
            aligner, _read_batches([fq], batch), out_bam,
            paired=False, pool=pool, depth=3)
        dt = time.time() - t0
        import fgdp_tpu.pipeline_stream as ps
        PROF.display_stats(units=n, unit_name="reads")
    finally:
        pool.shutdown()
    print(f"SCALE ALIGN: {n} reads in {dt:.1f}s = {n/dt:.0f} reads/s "
          f"({nrec} records, {ndup} dups)", file=sys.stderr)
    esc = getattr(aligner, "_esc_fns", {})
    print(f"escalation levels compiled: {sorted(esc.keys())}",
          file=sys.stderr)
    print(f"escalation: {getattr(aligner, 'esc_reads', 0)} reads in "
          f"{getattr(aligner, 'esc_calls', 0)} escalated program calls",
          file=sys.stderr)


def sortdup(prefix, n_rec):
    """Config-3-class sortdup: n_rec synthetic paired SAM records over
    the chr20-scale contig -> mmap-streaming sort + markdup + BGZF/BAI
    (sortdup/driver.sort_markdup_file), timed. ~15% of pairs are
    duplicates (shared 5' coordinates), Illumina-style QNAMEs so the
    tile/X/Y optical tie-break runs."""
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.sortdup.driver import sort_markdup_file

    pref = PackedReference.load(prefix + ".ref")
    ref_len = int(pref.lens[0])
    sam = "/tmp/scale/big.sam"
    rng = np.random.default_rng(3)
    n_pairs = n_rec // 2
    t0 = time.time()
    with open(sam, "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        f.write(f"@SQ\tSN:{pref.names[0]}\tLN:{ref_len}\n")
        seq = "A" * 100
        qual = "I" * 100
        done = 0
        chunk = 200_000
        while done < n_pairs:
            m = min(chunk, n_pairs - done)
            # ~15% duplicates: a duplicate needs BOTH 5' ends equal
            # (DoublePair key), so draw (pos1, insert) jointly from a
            # 0.85x pool of fragments
            pool = max(int(m * 0.85), 1)
            fpos = rng.integers(1, ref_len - 600, pool)
            fins = rng.integers(250, 450, pool)
            pick = rng.integers(0, pool, m)
            pos1 = fpos[pick]
            ins = fins[pick]
            pos2 = pos1 + ins - 100
            tile = rng.integers(1, 100, m)
            xs = rng.integers(1, 30000, m)
            ys = rng.integers(1, 30000, m)
            rows = []
            for i in range(m):
                q = f"SC:{done+i}:FC:1:{tile[i]}:{xs[i]}:{ys[i]}"
                p1, p2, il = int(pos1[i]), int(pos2[i]), int(ins[i])
                rows.append(f"{q}\t99\t{pref.names[0]}\t{p1}\t60\t100M"
                            f"\t=\t{p2}\t{il}\t{seq}\t{qual}")
                rows.append(f"{q}\t147\t{pref.names[0]}\t{p2}\t60\t100M"
                            f"\t=\t{p1}\t{-il}\t{seq}\t{qual}")
            f.write("\n".join(rows) + "\n")
            done += m
    gen_t = time.time() - t0
    sz = os.path.getsize(sam) / 1e9
    print(f"generated {n_rec} records ({sz:.2f} GB): {gen_t:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    n, ndup = sort_markdup_file(sam, "/tmp/scale/big.bam",
                                compress_level=6)
    dt = time.time() - t0
    print(f"SCALE SORTDUP: {n} records in {dt:.1f}s = {n/dt:.0f} "
          f"records/s ({ndup} duplicate pairs)", file=sys.stderr)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "--build":
        build(sys.argv[2], sys.argv[3])
    elif mode == "--align":
        align(sys.argv[2], int(sys.argv[3]),
              batch=int(os.environ.get("SCALE_B", 4096)))
    else:
        sortdup(sys.argv[2], int(sys.argv[3]))
