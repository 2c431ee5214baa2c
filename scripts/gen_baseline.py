"""Generate the measured CPU baseline: run the reference bwa-mem2-lcp
binary on the same synthetic workload bench.py times on the TPU.

BASELINE.md requires the reference numbers be *generated*, not copied
(the reference repo publishes none). This script reproduces the
run_test_suit.sh timing method (bwa-mem2-lcp/test_bench/run_test_suit.sh:57-80):
index once, then time `mem -t N` wall-clock over a read file, and report
reads/s plus the binary's own phase counters (display_stats taxonomy,
src/profiling.cpp:79).

Usage: python scripts/gen_baseline.py [--binary /tmp/bwa_build/bwa-mem2-lcp/bwa-mem2]
                                      [--n-reads 100000] [--threads 1 4]

Writes results to stdout as a markdown table row + JSON to
tests/golden/baseline_cpu.json (committed for the bench's vs_baseline).
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_workload(workdir, n_ref=2_000_000, L=151, n_reads=100_000):
    """Same generator as bench.py: 2 Mb uniform reference, 151 bp reads
    with 1% substitutions, half reverse-complemented."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, n_ref).astype(np.uint8)
    base = np.frombuffer(b"ACGT", np.uint8)
    ref_path = os.path.join(workdir, "ref.fa")
    with open(ref_path, "w") as f:
        f.write(">chr1\n")
        seq = base[codes].tobytes().decode()
        for i in range(0, len(seq), 80):
            f.write(seq[i:i + 80] + "\n")

    pos = rng.integers(0, n_ref - L, n_reads)
    reads = np.empty((n_reads, L), np.uint8)
    for i, p in enumerate(pos):
        reads[i] = codes[p:p + L]
    m = rng.random(reads.shape) < 0.01
    reads = np.where(m, rng.integers(0, 4, reads.shape), reads).astype(np.uint8)
    rev = rng.random(n_reads) < 0.5
    reads[rev] = 3 - reads[rev][:, ::-1]
    fq_path = os.path.join(workdir, "reads.fq")
    qual = "I" * L
    with open(fq_path, "w") as f:
        for i in range(n_reads):
            f.write(f"@r{i}\n{base[reads[i]].tobytes().decode()}\n+\n{qual}\n")
    return ref_path, fq_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary",
                    default="/tmp/bwa_build/bwa-mem2-lcp/bwa-mem2")
    ap.add_argument("--n-reads", type=int, default=100_000)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--workdir", default="/tmp/fgdp_baseline")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    print("generating workload...", file=sys.stderr)
    ref, fq = gen_workload(args.workdir, n_reads=args.n_reads)

    print("indexing...", file=sys.stderr)
    t0 = time.perf_counter()
    subprocess.run([args.binary, "index", ref], check=True,
                   capture_output=True, cwd=args.workdir)
    t_index = time.perf_counter() - t0

    results = {"binary": args.binary, "n_reads": args.n_reads,
               "read_len": 151, "ref_bp": 2_000_000,
               "index_s": round(t_index, 2), "mem": {}}
    for t in args.threads:
        out = os.path.join(args.workdir, f"out_t{t}.sam")
        t0 = time.perf_counter()
        r = subprocess.run(
            [args.binary, "mem", "-t", str(t), ref, fq, "-o", out],
            check=True, capture_output=True, text=True, cwd=args.workdir)
        dt = time.perf_counter() - t0
        # pull the binary's own phase report from stderr
        phases = {}
        for line in r.stderr.splitlines():
            mm = re.match(r"\s*([A-Za-z0-9_ ()./+-]+?)\s*:\s*([\d.]+)\s*$",
                          line)
            if mm:
                phases[mm.group(1).strip()] = float(mm.group(2))
        rps = args.n_reads / dt
        results["mem"][str(t)] = {"wall_s": round(dt, 2),
                                  "reads_per_s": round(rps, 1),
                                  "phases": phases}
        print(f"mem -t {t}: {dt:.2f}s -> {rps:.0f} reads/s", file=sys.stderr)
        tail = "\n".join(r.stderr.splitlines()[-25:])
        print(tail, file=sys.stderr)

    out_json = os.path.join(REPO, "tests", "golden", "baseline_cpu.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["mem"]))


if __name__ == "__main__":
    main()
