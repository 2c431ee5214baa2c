"""Isolate the bench e2e stages at the exact bench config (500kb ref,
B=1024, L=151) so compile-cache hits from a prior `python bench.py` run
apply. Prints per-stage walltimes to locate the e2e bottleneck.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache_bench python scripts/profile_bench_e2e.py
"""

import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from bench import _sim_fastq

    from fgdp_tpu.cli import _read_batches
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.pipeline import Aligner, finalize_se_batch
    from fgdp_tpu.pipeline_stream import (FinalizePool, Prefetcher,
                                          StreamingSortMarkdup,
                                          overlapped_regs)

    rng = np.random.default_rng(0)
    n_ref, L, B = 500_000, 151, 1024
    n_reads = 16 * B
    t0 = time.perf_counter()
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    print(f"index build: {time.perf_counter()-t0:.1f}s", flush=True)

    import atexit
    import shutil
    tmpd = tempfile.mkdtemp(prefix="fgdp_prof_")
    atexit.register(shutil.rmtree, tmpd, ignore_errors=True)
    fq = os.path.join(tmpd, "reads.fq")
    _sim_fastq(fq, pref.codes, n_reads, L, rng)
    pref_path = os.path.join(tmpd, "p.ref")
    pref.save(pref_path)

    opt = AlignConfig()
    shapes = BatchShapes(read_len=L, batch_reads=B)
    aligner = Aligner(pref, fm, opt=opt, shapes=shapes)

    t0 = time.perf_counter()
    batches = list(_read_batches([fq], B))
    t_fq = time.perf_counter() - t0
    print(f"fastq parse: {t_fq:.2f}s ({n_reads/t_fq:.0f} r/s)", flush=True)

    # warm compiles: run ALL batches once so any escalation-ladder
    # shape a later batch triggers is compiled before the timed pass
    # (otherwise its JIT time lands in the timed stage)
    t0 = time.perf_counter()
    for _nm, _sq, _ql in batches:
        _ = aligner._device_regs(_sq)
    print(f"compile+first (all shapes): {time.perf_counter()-t0:.2f}s",
          flush=True)

    # 1. device regs via overlapped_regs, results dropped
    t0 = time.perf_counter()
    got = []
    for nm, sq, ql, regs_np, i0 in overlapped_regs(
            aligner, Prefetcher(iter(batches), 2), 2):
        got.append((nm, sq, ql, regs_np, i0))
    t_dev = time.perf_counter() - t0
    print(f"device regs (overlapped): {t_dev:.2f}s "
          f"({n_reads/t_dev:.0f} r/s)", flush=True)

    # 2a. finalize one batch in-process
    nm, sq, ql, regs_np, i0 = got[0]
    t0 = time.perf_counter()
    lines = finalize_se_batch(pref, opt, None, nm, sq, ql, regs_np, i0)
    t1 = time.perf_counter() - t0
    print(f"finalize in-proc: {t1:.2f}s/batch ({t1/B*1e6:.0f} us/read)",
          flush=True)

    # 2b. pooled finalize over all batches
    workers = max((os.cpu_count() or 4) - 1, 1)
    pool = FinalizePool(pref_path, opt, workers)
    t0 = time.perf_counter()
    futs = [pool.submit(nm, sq, ql, r, i0, False)
            for nm, sq, ql, r, i0 in got]
    all_lines = [f.result() for f in futs]
    t_pool = time.perf_counter() - t0
    print(f"finalize pooled x{workers}: {t_pool:.2f}s "
          f"({n_reads/t_pool:.0f} r/s)", flush=True)
    pool.shutdown()

    # 3. streaming sortdup
    t0 = time.perf_counter()
    sd = StreamingSortMarkdup(list(aligner.sam_header()),
                              os.path.join(tmpd, "out.bam"), 6)
    for ls in all_lines:
        sd.feed(ls)
    nrec, ndup = sd.finish()
    t_sd = time.perf_counter() - t0
    print(f"sortdup: {t_sd:.2f}s ({n_reads/t_sd:.0f} r/s, {ndup} dups)",
          flush=True)

    from fgdp_tpu.utils.profiling import PROF
    PROF.display_stats(units=n_reads, unit_name="reads")


if __name__ == "__main__":
    main()
