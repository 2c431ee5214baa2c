"""Driver benchmark: end-to-end FASTQ -> sorted/markdup BAM throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric (matches driver BASELINE.json): reads/s/chip over
align + finalize + sort + markdup — the full `fgdp pipeline` path
(device align, pooled host finalize, streaming device sortdup, BGZF+BAI
out), not the device align step alone.

vs_baseline: measured bwa-mem2-lcp (the reference aligner, built
-march=native) on this host's 4 cores, linearly extrapolated to the
64-core node of the target ("≥2x a 64-core node"): see BASELINE.md
"Measured baseline" for the run log. vs_baseline = value /
(2 * 16 * measured_4core_reads_per_s).

Secondary metrics on stderr: device-align-only reads/s, PairHMM GCUPS.
"""

import functools
import json
import os
import sys
import tempfile
import time

# persistent compile cache: steady-state throughput is the metric;
# must be set before the first jax import
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

# Measured on this host (4 cores, -march=native, see BASELINE.md):
# bwa-mem2-lcp mem -t 4, 100k x 151bp reads on 2Mb ref.
CPU_4CORE_READS_PER_S = None  # filled from BASELINE.md table at runtime
CPU_4CORE_FALLBACK = 4000.0   # conservative placeholder if parse fails


def _measured_baseline():
    """Parse the measured 4-core reads/s out of BASELINE.md."""
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BASELINE.md")) as f:
            for ln in f:
                if ln.startswith("MEASURED_4CORE_READS_PER_S"):
                    return float(ln.split("=")[1].strip())
    except Exception:
        pass
    return CPU_4CORE_FALLBACK


def _sim_fastq(path, pref_codes, n_reads, L, rng):
    from fgdp_tpu.utils import dna

    n_ref = len(pref_codes)
    pos = rng.integers(0, n_ref - L, n_reads)
    with open(path, "w") as f:
        for i, p in enumerate(pos):
            c = pref_codes[p:p + L].copy()
            m = rng.random(L) < 0.01
            c[m] = rng.integers(0, 4, int(m.sum()))
            if rng.random() < 0.5:
                c = 3 - c[::-1]
            f.write(f"@r{i}\n{dna.decode(c.astype(np.uint8))}\n+\n"
                    f"{'I' * L}\n")


def _sim_paired_fastq(p1, p2, pref_codes, n_pairs, L, rng):
    """FR pairs, insert ~N(350, 50) (the reference mem_pestat regime,
    bwamem_pair.cpp): r1 forward at pos, r2 = revcomp of the fragment
    end."""
    from fgdp_tpu.utils import dna

    n_ref = len(pref_codes)
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(n_pairs):
            ins = int(np.clip(rng.normal(350, 50), 2 * L + 10, 600))
            p = int(rng.integers(0, n_ref - ins - 1))
            frag = pref_codes[p:p + ins]
            r1 = frag[:L].copy()
            r2 = (3 - frag[-L:][::-1]).copy()
            for r in (r1, r2):
                m = rng.random(L) < 0.01
                r[m] = rng.integers(0, 4, int(m.sum()))
            f1.write(f"@p{i}\n{dna.decode(r1.astype(np.uint8))}\n+\n"
                     f"{'I' * L}\n")
            f2.write(f"@p{i}\n{dna.decode(r2.astype(np.uint8))}\n+\n"
                     f"{'I' * L}\n")


def bench_mutect(smoke=False):
    """Caller throughput on the golden tumor/normal fixture: active
    regions/s, serial (region_workers=0) vs pooled (the round-3 region
    worker pool, engine.py call_windows) — the reference's N-thread
    region scheduler analogue (main.cpp:195-307)."""
    import pathlib

    from fgdp_tpu.call.engine import Mutect2Engine
    from fgdp_tpu.cli import _bam_to_read_dicts
    from fgdp_tpu.io.fasta import read_fasta

    gold = pathlib.Path(__file__).parent / "tests" / "golden" / "mutect"
    if not gold.exists():
        return None
    ref = read_fasta(str(gold / "ref.fa"))
    _, _, tumor = _bam_to_read_dicts(str(gold / "tumor.bam"))
    _, _, normal = _bam_to_read_dicts(str(gold / "normal.bam"))

    workers = max((os.cpu_count() or 4) - 1, 1)
    # engines (and their worker pools) are built ONCE and warmed before
    # timing: the reference's region scheduler spawns its thread team at
    # startup, not per contig (main.cpp:195-307), and pool spawn is
    # seconds of jax/torch import — on a 7-region fixture that would
    # swamp the steady-state regions/s this bench reports
    per_contig = []
    for cid, cname in enumerate(ref.names):
        t = [r for r in tumor if r["rid"] == cid]
        if not t:
            continue
        nr = [r for r in normal if r["rid"] == cid]
        per_contig.append((ref.contig_codes(cid), cname, t, nr))

    def run(engines):
        t0 = time.perf_counter()
        nreg = ncalls = 0
        for eng, t, nr in engines:
            ncalls += len(eng.call(t, nr))
            nreg += eng.n_regions
        return nreg, ncalls, time.perf_counter() - t0

    def mk(w):
        return [(Mutect2Engine(codes, cname, region_workers=w), t, nr)
                for codes, cname, t, nr in per_contig]

    serial, pooled = mk(0), mk(workers)
    try:
        run(serial)                          # warmup/compile pass
        run(pooled)                          # spawns + warms the pools
        nreg, ncalls, dt_serial = run(serial)
        _, _, dt_pooled = run(pooled)
    finally:
        for eng, _, _ in serial + pooled:
            eng.close()
    return dict(regions=nreg, calls=ncalls,
                serial_rps=nreg / dt_serial,
                pooled_rps=nreg / dt_pooled, workers=workers)


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.pipeline import Aligner

    rng = np.random.default_rng(0)
    # smoke mode (CPU CI): FGDP_BENCH_SMOKE=1 shrinks every dimension so
    # the whole bench runs in seconds; numbers are then meaningless.
    smoke = os.environ.get("FGDP_BENCH_SMOKE") == "1"
    # 500 kb matches the measured CPU-baseline workload (BASELINE.md:
    # the largest reference the reference binary reliably processes)
    n_ref = 40_000 if smoke else 500_000
    L = 151
    B = 128 if smoke else int(os.environ.get("FGDP_BENCH_B", 4096))
    print("building index...", file=sys.stderr)
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.utils import dna
    lt = LcpTree.build(
        np.concatenate([pref.codes, dna.revcomp(pref.codes)])
        .astype(np.uint8), fm.sa)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()

    # ---- secondary: device align step only (round-1 metric) ----
    # NOTE: the axon relay caches identical (executable, inputs) runs, so
    # every timed iteration must use distinct inputs. Dispatches are
    # pipelined (async) and synced once at the end — matching a streaming
    # aligner, which always has the next chunk in flight.
    # The Aligner's own jitted program is reused (not a second jit of
    # device_align): each resident executable costs relay/HBM headroom,
    # and a duplicate once crashed the e2e warmup with INVALID_ARGUMENT
    # once the escalation rungs were also warmed.
    aligner = Aligner(pref, fm, opt=opt, shapes=shapes, lcp=lt)
    dfm, dref = aligner.dfm, aligner.dref
    fn = lambda dfm, dref, c, lens, act: aligner._fn(
        dfm, dref, c, lens, act, lcp_tree=aligner.lcp_tree,
        lcp_isa=aligner.lcp_isa, salt=aligner._salt_arr("primary"))
    n_iter = 8
    batches = []
    for it in range(n_iter + 1):
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        c = np.where(m, rng.integers(0, 4, c.shape), c)
        batches.append(jnp.asarray(c))
    lens_d = jnp.asarray(np.full(B, L, np.int32))
    act = jnp.ones(B, bool)
    print("compiling device align...", file=sys.stderr)
    out = fn(dfm, dref, batches[0], lens_d, act)
    _ = np.asarray(out[:1])           # packed reg buffer (pack_regs)
    t0 = time.perf_counter()
    outs = [fn(dfm, dref, batches[it + 1], lens_d, act)
            for it in range(n_iter)]
    for o in outs:
        _ = np.asarray(o[:1])
    dt = (time.perf_counter() - t0) / n_iter
    print(f"device align: {B / dt:.0f} reads/s/chip", file=sys.stderr)

    # ---- headline: e2e FASTQ -> sorted/markdup BAM ----
    from fgdp_tpu.cli import _read_batches
    from fgdp_tpu.pipeline_stream import FinalizePool, stream_fastq_to_bam

    e2e_n = (4 if smoke else 16) * B
    tmpd = tempfile.mkdtemp(prefix="fgdp_bench_")
    fq_warm = os.path.join(tmpd, "warm.fq")
    # distinct inputs for warmup vs timed runs: identical shapes share
    # every compile, distinct contents defeat the relay's
    # identical-(executable, inputs) result cache. Median-of-3 timed
    # passes (distinct files) with min/max spread: single draws on the
    # relay-attached chip scatter +-25% (VERDICT r4 weak #4/#7).
    _sim_fastq(fq_warm, pref.codes, e2e_n, L, rng)
    fqs = []
    for t in range(1 if smoke else 3):
        fqs.append(os.path.join(tmpd, f"reads{t}.fq"))
        _sim_fastq(fqs[-1], pref.codes, e2e_n, L, rng)
    pref_path = os.path.join(tmpd, "bench.ref")
    pref.save(pref_path)

    workers = max((os.cpu_count() or 4) - 1, 1)
    pool = FinalizePool(pref_path, opt, workers)
    out_bam = os.path.join(tmpd, "out.bam")
    try:
        # full warmup: compiles align, the ESCALATION LADDER (lazily
        # compiled rungs landing inside a timed pass were the round-4
        # e2e regression — 77 s of ESC_RETRY compile measured in one
        # pass, scripts/profile_r5_e2e.py), finalize workers' caches,
        # and the sortdup kernels at the same pow2 shapes as the timed
        # runs (steady-state throughput is the production metric;
        # compile is a one-time cost amortized over whole flowcells)
        # level 1 only: level-2 rungs need a read still overflowing
        # after the level-1 retry (never seen on this workload), and
        # each resident executable costs relay/HBM headroom
        print("warming escalation ladder...", file=sys.stderr)
        aligner.warm_escalation(levels=(1,))
        print("e2e warmup pass...", file=sys.stderr)
        stream_fastq_to_bam(aligner, _read_batches([fq_warm], B),
                            out_bam, paired=False, pool=pool, depth=3)
        e2e_vals = []
        for fq in fqs:
            t0 = time.perf_counter()
            n, (nrec, ndup) = stream_fastq_to_bam(
                aligner, _read_batches([fq], B), out_bam, paired=False,
                pool=pool, depth=3)
            dt = time.perf_counter() - t0
            assert n == e2e_n and nrec == e2e_n, (n, nrec)
            e2e_vals.append(e2e_n / dt)
    finally:
        pool.shutdown()
    e2e_vals.sort()
    e2e_rps = e2e_vals[len(e2e_vals) // 2]
    print(f"e2e align+sort+markdup: {e2e_rps:.0f} reads/s/chip median "
          f"(min {e2e_vals[0]:.0f}, max {e2e_vals[-1]:.0f}; {e2e_n} "
          f"reads/pass, {workers} finalize workers, {ndup} dups)",
          file=sys.stderr)

    # ---- PE e2e (secondary, stderr): pairing + kswv mate rescue in
    # the measured surface (bwamem_pair.cpp:614 analogue) ----
    try:
        pe_pairs = (2 if smoke else 8) * B // 2
        fq1w = os.path.join(tmpd, "pe1w.fq")
        fq2w = os.path.join(tmpd, "pe2w.fq")
        fq1 = os.path.join(tmpd, "pe1.fq")
        fq2 = os.path.join(tmpd, "pe2.fq")
        _sim_paired_fastq(fq1w, fq2w, pref.codes, pe_pairs, L, rng)
        _sim_paired_fastq(fq1, fq2, pref.codes, pe_pairs, L, rng)
        pool = FinalizePool(pref_path, opt, workers)
        out_pe = os.path.join(tmpd, "out_pe.bam")
        try:
            stream_fastq_to_bam(aligner, _read_batches([fq1w, fq2w], B),
                                out_pe, paired=True, pool=pool, depth=3)
            t0 = time.perf_counter()
            n_pe, (nrec_pe, _) = stream_fastq_to_bam(
                aligner, _read_batches([fq1, fq2], B), out_pe,
                paired=True, pool=pool, depth=3)
            dt_pe = time.perf_counter() - t0
        finally:
            pool.shutdown()
        print(f"pe e2e align+pair+sort+markdup: {n_pe/dt_pe:.0f} "
              f"reads/s/chip ({n_pe} reads, {dt_pe:.1f}s)",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"pe bench failed: {e}", file=sys.stderr)

    # ---- Mutect2 caller regions/s (secondary, stderr) ----
    try:
        mt = bench_mutect(smoke=smoke)
        if mt:
            print(f"mutect: {mt['pooled_rps']:.1f} regions/s pooled "
                  f"({mt['workers']} workers) vs {mt['serial_rps']:.1f} "
                  f"serial ({mt['regions']} regions, {mt['calls']} "
                  f"calls, golden fixture)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"mutect bench failed: {e}", file=sys.stderr)

    # ---- PairHMM GCUPS (secondary metric, stderr) ----
    try:
        gcups = bench_pairhmm(NP=128, R=32, H=64) if smoke \
            else bench_pairhmm()
        print(f"pairhmm: {gcups:.1f} GCUPS/chip (f32)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - report, don't fail the bench
        print(f"pairhmm bench failed: {e}", file=sys.stderr)

    base4 = _measured_baseline()
    target = 2.0 * 16.0 * base4      # 2x a 64-core node, linear scaling
    print(json.dumps({
        "metric": "e2e_reads_per_s_chip",
        "value": round(e2e_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(e2e_rps / target, 4),
        "spread": {"min": round(e2e_vals[0], 1),
                   "max": round(e2e_vals[-1], 1), "n": len(e2e_vals)},
    }))


def bench_pairhmm(NP=2048, R=151, H=384):
    """Two chain lengths (K=4, K=36) of serially-dependent kernel calls
    inside one jit; per-call time = (t36 - t4) / 32. This subtracts the
    relay round-trip + input-transfer fixed cost and defeats the relay's
    identical-run result cache (distinct inputs per timed run)."""
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.ops import pairhmm
    from fgdp_tpu.ops.pairhmm_pallas import forward_f32_pallas

    rng = np.random.default_rng(1)
    reads = rng.integers(0, 4, (NP, R)).astype(np.int32)
    haps = rng.integers(0, 4, (NP, H)).astype(np.int32)
    # haplotypes embed the read so likelihoods stay in f32 range
    haps[:, 10:10 + R] = reads
    rlens = np.full(NP, R, np.int32)
    hlens = np.full(NP, H, np.int32)
    q = rng.integers(20, 40, (NP, R))
    ph2pr = (10.0 ** (-np.arange(128) / 10.0)).astype(np.float32)
    pq = ph2pr[q]
    tr = pairhmm.transitions(np.full((NP, R), 45), np.full((NP, R), 45),
                             np.full((NP, R), 10), np.float32)

    # production path (pairhmm.compute_log_likelihoods_async) truncates
    # the in-row scan where extra doublings are bit-exact no-ops; the
    # bench's gcp=10 quals give the same cap=6
    cap = pairhmm.doubling_cap(np.full((NP, R), 10))

    def make_chain(K):
        @jax.jit
        def chain(reads, rlens, p0, tr, haps, hlens):
            total = jnp.float32(0)
            p = p0
            for _ in range(K):
                out, _ = forward_f32_pallas(reads, rlens, p, tr, haps,
                                            hlens, n_doubling_cap=cap)
                total = total + out.sum()
                p = p + (out.sum() * 0 + 1e-12)   # serial dependency
            return total
        return chain

    # long-vs-short chain pairs amortize the relay round-trip (~0.1 s,
    # which exceeds tens of calls' compute); min over trials rejects
    # scheduling noise (a short-chain median returned 48-1400 GCUPS)
    K0, K1 = 8, 72
    ch0, ch1 = make_chain(K0), make_chain(K1)
    mk = lambda eps: (jnp.asarray(reads), jnp.asarray(rlens),
                      jnp.asarray(pq + eps), jnp.asarray(tr),
                      jnp.asarray(haps), jnp.asarray(hlens))
    _ = float(np.asarray(ch0(*mk(0.0))))
    _ = float(np.asarray(ch1(*mk(1e-7))))
    per_calls = []
    for trial in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(ch0(*mk(1e-7 * (2 * trial + 2)))))
        t_a = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(ch1(*mk(1e-7 * (2 * trial + 3)))))
        t_b = time.perf_counter() - t0
        per_calls.append((t_b - t_a) / (K1 - K0))
    # median-of-3 with spread (single draws scatter +-25% with relay /
    # chip contention; VERDICT r4 asked for dispersion, not one draw)
    gc = sorted(NP * R * H / max(p, 1e-9) / 1e9 for p in per_calls)
    print(f"pairhmm spread: min {gc[0]:.1f} / median {gc[1]:.1f} / "
          f"max {gc[-1]:.1f} GCUPS", file=sys.stderr)
    return gc[len(gc) // 2]


if __name__ == "__main__":
    main()
