"""Stage-level profile of the e2e pipeline on the bench workload.

Times each stage in isolation: FASTQ parse, device align (regs), host
finalize (in-process and pooled), streaming sortdup. Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_e2e.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from fgdp_tpu.cli import _read_batches
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.pipeline import Aligner, finalize_se_batch
    from fgdp_tpu.pipeline_stream import FinalizePool, StreamingSortMarkdup

    from bench import _sim_fastq

    rng = np.random.default_rng(0)
    n_ref, L, B = 2_000_000, 151, 1024
    n_reads = 8 * B
    t0 = time.perf_counter()
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    print(f"index build: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    tmpd = tempfile.mkdtemp(prefix="fgdp_prof_")
    fq = os.path.join(tmpd, "reads.fq")
    _sim_fastq(fq, pref.codes, n_reads, L, rng)
    pref_path = os.path.join(tmpd, "p.ref")
    pref.save(pref_path)

    opt = AlignConfig()
    shapes = BatchShapes(read_len=L, batch_reads=B)
    aligner = Aligner(pref, fm, opt=opt, shapes=shapes)

    # 1. FASTQ parse alone
    t0 = time.perf_counter()
    batches = list(_read_batches([fq], B))
    t_fq = time.perf_counter() - t0
    print(f"fastq parse: {t_fq:.2f}s ({n_reads/t_fq:.0f} r/s)")

    # 2. device align (regs to host), incl. compile once
    t0 = time.perf_counter()
    regs0 = aligner._device_regs(batches[0][1])
    print(f"compile+first batch: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    regs_all = [aligner._device_regs(b[1]) for b in batches]
    t_dev = time.perf_counter() - t0
    print(f"device regs: {t_dev:.2f}s ({n_reads/t_dev:.0f} r/s)")

    # 3. host finalize in-process, one batch timed
    names, seqs, quals = batches[0]
    t0 = time.perf_counter()
    lines = finalize_se_batch(pref, opt, shapes, names, seqs, quals,
                              regs_all[0], 0)
    t_fin1 = time.perf_counter() - t0
    print(f"finalize in-proc: {t_fin1:.2f}s/batch "
          f"({B/t_fin1:.0f} r/s, {t_fin1/B*1e6:.0f} us/read)")

    # 4. pooled finalize, all batches
    workers = max((os.cpu_count() or 4) - 1, 1)
    t0 = time.perf_counter()
    pool = FinalizePool(pref_path, opt, workers)
    print(f"pool spawn: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    futs = [pool.submit(b[0], b[1], b[2], r, i * B)
            for i, (b, r) in enumerate(zip(batches, regs_all))]
    all_lines = [f.result() for f in futs]
    t_pool = time.perf_counter() - t0
    print(f"finalize pooled: {t_pool:.2f}s ({n_reads/t_pool:.0f} r/s)")
    pool.shutdown()

    # 5. streaming sortdup
    t0 = time.perf_counter()
    sd = StreamingSortMarkdup(list(aligner.sam_header()),
                              os.path.join(tmpd, "out.bam"), 6)
    for ls in all_lines:
        sd.feed(ls)
    nrec, ndup = sd.finish()
    t_sd = time.perf_counter() - t0
    print(f"sortdup: {t_sd:.2f}s ({n_reads/t_sd:.0f} r/s, {ndup} dups)")

    from fgdp_tpu.utils.profiling import PROF
    PROF.display_stats(units=n_reads, unit_name="reads")


if __name__ == "__main__":
    main()
