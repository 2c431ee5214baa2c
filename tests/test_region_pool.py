"""Region worker pool: pooled prepare == serial (same calls), on the
golden mutect fixture."""

import numpy as np

from fgdp_tpu.call.engine import Mutect2Engine
from fgdp_tpu.cli import _bam_to_read_dicts
from fgdp_tpu.io.fasta import read_fasta

GOLD = "tests/golden/mutect"


def _calls(workers):
    ref = read_fasta(f"{GOLD}/ref.fa")
    _, _, tumor = _bam_to_read_dicts(f"{GOLD}/tumor.bam")
    _, _, normal = _bam_to_read_dicts(f"{GOLD}/normal.bam")
    out = []
    for cid, cname in enumerate(ref.names):
        codes = ref.contig_codes(cid)
        t = [r for r in tumor if r["rid"] == cid]
        n = [r for r in normal if r["rid"] == cid]
        if not t:
            continue
        eng = Mutect2Engine(codes, cname, region_workers=workers)
        try:
            out.extend(eng.call(t, n))
        finally:
            eng.close()
    return out


def test_pooled_matches_serial():
    a = _calls(0)
    b = _calls(2)
    assert len(a) == len(b)
    for ca, cb in zip(a, b):
        assert (ca.contig, ca.pos, ca.ref, ca.alt) == \
            (cb.contig, cb.pos, cb.ref, cb.alt)
        np.testing.assert_allclose(ca.tlod, cb.tlod, rtol=1e-6)
        assert ca.filters == cb.filters
