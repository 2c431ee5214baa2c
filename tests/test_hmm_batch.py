"""Cross-region PairHMM batching: batched == per-region on the golden
fixture, with fewer device launches than regions."""

import numpy as np

from fgdp_tpu.call.engine import Mutect2Engine
from fgdp_tpu.cli import _bam_to_read_dicts
from fgdp_tpu.io.fasta import read_fasta

GOLD = "tests/golden/mutect"


def _calls(monkeypatch, crossregion):
    monkeypatch.setenv("FGDP_HMM_CROSSREGION",
                       "1" if crossregion else "0")
    ref = read_fasta(f"{GOLD}/ref.fa")
    _, _, tumor = _bam_to_read_dicts(f"{GOLD}/tumor.bam")
    _, _, normal = _bam_to_read_dicts(f"{GOLD}/normal.bam")
    out = []
    launches = regions = 0
    for cid, cname in enumerate(ref.names):
        codes = ref.contig_codes(cid)
        t = [r for r in tumor if r["rid"] == cid]
        n = [r for r in normal if r["rid"] == cid]
        if not t:
            continue
        eng = Mutect2Engine(codes, cname)
        try:
            out.extend(eng.call(t, n))
        finally:
            eng.close()
        if eng._hmm_batcher is not None:
            launches += eng._hmm_batcher.launches
            regions += eng._hmm_batcher.regions_submitted
    return out, launches, regions


def test_batched_matches_per_region(monkeypatch):
    a, _, _ = _calls(monkeypatch, crossregion=False)
    b, launches, regions = _calls(monkeypatch, crossregion=True)
    assert len(a) == len(b) and len(b) > 0
    for ca, cb in zip(a, b):
        assert (ca.contig, ca.pos, ca.ref, ca.alt) == \
            (cb.contig, cb.pos, cb.ref, cb.alt)
        np.testing.assert_allclose(ca.tlod, cb.tlod, rtol=1e-6)
        assert ca.filters == cb.filters
    # tumor+normal jobs of several regions share launches
    assert regions > 0 and launches < regions
