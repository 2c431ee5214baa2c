"""Profile the host finalize path (dedup/patch -> mark_primary ->
reg2aln_batch -> SAM text) per read, with a cProfile breakdown.

Runs the device align once (CPU backend is fine) on the bench workload,
then times finalize_se_batch over the resulting regs.
"""

import cProfile
import io
import pstats
import sys
import time

import numpy as np


def main():
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.pipeline import Aligner, finalize_se_batch

    rng = np.random.default_rng(0)
    n_ref = 500_000
    L, B = 151, 512
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    aligner = Aligner.build(pref, shapes=BatchShapes(read_len=L,
                                                     batch_reads=B))
    pos = rng.integers(0, n_ref - L, B)
    codes = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int64)
    m = rng.random(codes.shape) < 0.01
    codes = np.where(m, rng.integers(0, 4, codes.shape), codes)
    rev = rng.random(B) < 0.5
    codes[rev] = 3 - codes[rev][:, ::-1]
    seqs = [codes[i] for i in range(B)]
    names = [f"r{i}" for i in range(B)]

    print("device align...", file=sys.stderr)
    regs = aligner._device_regs(seqs)

    opt, shapes = aligner.opt, aligner.shapes
    t0 = time.perf_counter()
    out = finalize_se_batch(pref, opt, shapes, names, seqs, None, regs, 0)
    dt = time.perf_counter() - t0
    print(f"finalize: {dt*1e3:.1f} ms for {B} reads "
          f"({dt/B*1e6:.0f} us/read, {B/dt:.0f} reads/s/core)",
          file=sys.stderr)

    pr = cProfile.Profile()
    pr.enable()
    finalize_se_batch(pref, opt, shapes, names, seqs, None, regs, 0)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
