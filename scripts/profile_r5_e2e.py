"""Round-5 e2e decomposition at the EXACT bench config (500 kb, B=4096,
L=151, 16*B reads, FinalizePool, deferred escalation): timed pass phase
split after a full warmup, PROF reset between. Locates where the
e2e-vs-device-align gap (12.1k vs 20.9k reads/s at HEAD) lives.

Run: python scripts/profile_r5_e2e.py
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
    from fgdp_tpu.pipeline import Aligner
    from fgdp_tpu.pipeline_stream import FinalizePool, stream_fastq_to_bam
    from fgdp_tpu.utils.profiling import PROF

    rng = np.random.default_rng(0)
    n_ref, L, B = 500_000, 151, 4096
    n_reads = 16 * B
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)

    import atexit
    import shutil
    tmpd = tempfile.mkdtemp(prefix="fgdp_prof5_")
    atexit.register(shutil.rmtree, tmpd, ignore_errors=True)
    fqw = os.path.join(tmpd, "warm.fq")
    fq = os.path.join(tmpd, "reads.fq")
    _sim_fastq(fqw, pref.codes, n_reads, L, rng)
    _sim_fastq(fq, pref.codes, n_reads, L, rng)
    pref_path = os.path.join(tmpd, "p.ref")
    pref.save(pref_path)

    opt = AlignConfig()
    shapes = BatchShapes(read_len=L, batch_reads=B)
    aligner = Aligner(pref, fm, opt=opt, shapes=shapes)
    workers = max((os.cpu_count() or 4) - 1, 1)
    pool = FinalizePool(pref_path, opt, workers)
    out_bam = os.path.join(tmpd, "out.bam")
    try:
        print("warmup...", flush=True)
        stream_fastq_to_bam(aligner, _read_batches([fqw], B), out_bam,
                            paired=False, pool=pool, depth=3)
        PROF.reset()
        t0 = time.perf_counter()
        n, (nrec, ndup) = stream_fastq_to_bam(
            aligner, _read_batches([fq], B), out_bam, paired=False,
            pool=pool, depth=3)
        dt = time.perf_counter() - t0
    finally:
        pool.shutdown()
    print(f"e2e: {n/dt:.0f} reads/s ({n} reads, {dt:.2f}s, {ndup} dups)",
          flush=True)
    PROF.display_stats(units=n, unit_name="reads")


if __name__ == "__main__":
    main()
