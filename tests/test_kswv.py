"""Batched local SW (ops/kswv) vs the scalar ksw_align2 transcription
(align/pair.ksw_align_local) — every output field bit-identical."""

import numpy as np
import pytest

from fgdp_tpu.config import AlignConfig
from fgdp_tpu.align.pair import ksw_align_local
from fgdp_tpu.ops.kswv import ksw_align_local_batch


def _random_jobs(rng, n, with_planted=True):
    jobs = []
    for i in range(n):
        lt = int(rng.integers(40, 500))
        t = rng.integers(0, 4, lt).astype(np.int64)
        lq = int(rng.integers(20, 151))
        if with_planted and i % 3 != 2:
            # plant a (mutated) copy of a target slice into the query
            span = min(lq, lt - 1)
            off = int(rng.integers(0, lt - span))
            q = t[off:off + span].copy()
            m = rng.random(span) < 0.08
            q[m] = rng.integers(0, 4, int(m.sum()))
            # random indel
            if span > 30 and rng.random() < 0.5:
                cut = int(rng.integers(5, span - 20))
                dele = int(rng.integers(1, 6))
                q = np.concatenate([q[:cut], q[cut + dele:]])
            if rng.random() < 0.2:
                q[:3] = rng.integers(0, 4, 3)    # soft-clip head junk
        else:
            q = rng.integers(0, 4, lq).astype(np.int64)
        if rng.random() < 0.1:
            q[int(rng.integers(0, len(q)))] = 4   # ambiguous base
        jobs.append((q, t))
    return jobs


@pytest.mark.parametrize("seed", [0, 1])
def test_batch_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    opt = AlignConfig()
    jobs = _random_jobs(rng, 24)
    min_sc = opt.min_seed_len * opt.a
    got = ksw_align_local_batch(jobs, opt)
    assert len(got) == len(jobs)
    n_hit = 0
    for (q, t), g in zip(jobs, got):
        exp = ksw_align_local(q, t, opt, min_sc)
        if exp is None:
            assert g is None
        else:
            assert g == exp, (len(q), len(t), g, exp)
            n_hit += 1
    assert n_hit >= 10       # the sim must exercise real alignments


def test_batch_nondefault_penalties():
    """Pacbio-profile penalties (o=1, e=1) stress the F closed form."""
    rng = np.random.default_rng(7)
    opt = AlignConfig(a=1, b=1, o_del=1, e_del=1, o_ins=1, e_ins=1,
                      min_seed_len=17)
    jobs = _random_jobs(rng, 16)
    got = ksw_align_local_batch(jobs, opt)
    for (q, t), g in zip(jobs, got):
        exp = ksw_align_local(q, t, opt, opt.min_seed_len * opt.a)
        assert g == exp or (g is None and exp is None)


def test_empty_jobs():
    assert ksw_align_local_batch([], AlignConfig()) == []
