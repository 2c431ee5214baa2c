"""Host finalize profile on the repeat-rich chr20-scale workload.

Run: python scripts/profile_finalize_scale.py /tmp/scale/idx
"""

import cProfile
import io
import os
import pstats
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_bench")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.pipeline import Aligner, finalize_se_batch

    prefix = sys.argv[1]
    B = int(os.environ.get("PROF_B", 1024))
    L = 151
    pref = PackedReference.load(prefix + ".ref")
    fm = FMIndex.load(prefix + ".fmi")
    lt = LcpTree.load(prefix + ".lcp.npz")
    aligner = Aligner(pref, fm, shapes=BatchShapes(read_len=L,
                                                   batch_reads=B), lcp=lt)
    rng = np.random.default_rng(11)
    n_ref = pref.l_pac
    pos = rng.integers(0, n_ref - L, B)
    names, seqs = [], []
    for i, p in enumerate(pos):
        c = pref.codes[p:p + L].astype(np.int64).copy()
        m = rng.random(L) < 0.01
        c[m] = rng.integers(0, 4, int(m.sum()))
        if rng.random() < 0.5:
            c = 3 - c[::-1]
        names.append(f"r{i}")
        seqs.append(c)
    t0 = time.perf_counter()
    regs = aligner._device_regs(seqs)
    print(f"device+retry: {time.perf_counter()-t0:.2f}s (incl compile)",
          file=sys.stderr)
    E = regs["valid"].shape[1]
    nregs = regs["valid"].sum(axis=1)
    print(f"reg columns {E}; regs/read p50={np.percentile(nregs,50):.0f} "
          f"p95={np.percentile(nregs,95):.0f} max={nregs.max()}",
          file=sys.stderr)

    t0 = time.perf_counter()
    out = finalize_se_batch(pref, aligner.opt, aligner.shapes, names,
                            seqs, None, regs, 0)
    dt = time.perf_counter() - t0
    print(f"finalize: {dt*1000:.0f} ms for {B} reads "
          f"({dt/B*1e6:.0f} us/read)", file=sys.stderr)

    pr = cProfile.Profile()
    pr.enable()
    finalize_se_batch(pref, aligner.opt, aligner.shapes, names, seqs,
                      None, regs, 0)
    pr.disable()
    sio = io.StringIO()
    pstats.Stats(pr, stream=sio).sort_stats("cumulative").print_stats(18)
    print(sio.getvalue(), file=sys.stderr)


if __name__ == "__main__":
    main()
