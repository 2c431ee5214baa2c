"""Mutect2-style engine on synthetic tumor/normal reads: SNV + indel
detection, germline filtering, activity math sanity."""

import numpy as np
import pytest

from fgdp_tpu.call import activity, assembly, genotype
from fgdp_tpu.call.engine import Mutect2Engine, write_vcf


def _mk_read(ref, pos, L, rng, muts=(), err=0.0):
    """muts: list of (ref_pos, alt_base) or ('ins'/'del', ref_pos, seq/len)."""
    seq = ref[pos:pos + L].astype(np.int64).copy()
    cigar = [(0, L)]
    for m in muts:
        if m[0] == "ins":
            _, rp, ins = m
            off = rp - pos
            if 0 < off < L - len(ins):
                seq = np.concatenate([seq[:off], ins, seq[off:L - len(ins)]])
                cigar = [(0, off), (1, len(ins)), (0, L - len(ins) - off)]
        elif m[0] == "del":
            _, rp, dl = m
            off = rp - pos
            if 0 < off < L - dl:
                seq = np.concatenate([seq[:off], ref[pos + off + dl:
                                                     pos + L + dl]])
                seq = seq[:L - dl]
                cigar = [(0, off), (2, dl), (0, L - dl - off)]
        else:
            rp, alt = m
            if pos <= rp < pos + L and cigar == [(0, L)]:
                seq[rp - pos] = alt
    if err > 0:
        e = rng.random(len(seq)) < err
        seq[e] = (seq[e] + 1) % 4
    quals = np.full(len(seq), 30, np.int64)
    return dict(pos=pos, cigar=cigar, seq_codes=seq.astype(np.int64),
                quals=quals, mate_start=None, properly_paired=False)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, 2500).astype(np.uint8)
    return rng, ref


def _cover(ref, rng, region, L=100, depth=20, muts=(), frac=1.0):
    reads = []
    lo, hi = region
    for _ in range(depth):
        pos = int(rng.integers(max(lo - L + 10, 0), hi - 10))
        pos = min(pos, len(ref) - L)
        use = muts if rng.random() < frac else ()
        reads.append(_mk_read(ref, pos, L, rng, use))
    return reads


def test_snv_called(world):
    rng, ref = world
    vpos = 1200
    alt = int((ref[vpos] + 1) % 4)
    tumor = _cover(ref, rng, (1100, 1300), muts=[(vpos, alt)], frac=0.5)
    tumor += _cover(ref, rng, (1100, 1300), depth=10)   # ref support
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor)
    hits = [c for c in calls if c.pos == vpos and
            c.alt == "ACGTN"[alt]]
    assert hits, calls
    assert hits[0].tlod > 5
    assert hits[0].ad_alt > 0


def test_insertion_called(world):
    rng, ref = world
    vpos = 800
    ins = np.array([0, 2, 1], np.int64)
    tumor = _cover(ref, rng, (700, 900), depth=24,
                   muts=[("ins", vpos, ins)], frac=0.6)
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor)
    hits = [c for c in calls if abs(c.pos - vpos) <= 2 and
            len(c.alt) > len(c.ref)]
    assert hits, calls


def test_germline_filtered(world):
    rng, ref = world
    vpos = 1700
    alt = int((ref[vpos] + 1) % 4)
    tumor = _cover(ref, rng, (1600, 1800), muts=[(vpos, alt)], frac=0.5)
    normal = _cover(ref, rng, (1600, 1800), muts=[(vpos, alt)], frac=0.5)
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor, normal)
    # germline-allele gate (SomaticGenotypeEngine.cpp:94-105): when the
    # normal carries the allele too, NLOD fails the threshold and the
    # variant is suppressed entirely (not emitted-with-filter)
    hits = [c for c in calls if c.pos == vpos]
    assert not hits


def test_clean_coverage_no_calls(world):
    rng, ref = world
    tumor = _cover(ref, rng, (300, 500), depth=25)
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor)
    assert [c for c in calls if 300 <= c.pos < 500] == []


def test_vcf_output(world, tmp_path):
    rng, ref = world
    vpos = 1200
    alt = int((ref[vpos] + 1) % 4)
    tumor = _cover(ref, rng, (1100, 1300), muts=[(vpos, alt)], frac=0.5)
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor)
    out = tmp_path / "o.vcf"
    write_vcf(out, calls, ["chr1"], [len(ref)])
    text = out.read_text()
    assert "##fileformat=VCFv4.2" in text
    assert any(ln.split("\t")[1] == str(vpos + 1)
               for ln in text.splitlines() if not ln.startswith("#"))


def test_log_likelihood_ratio_behaviour():
    # strong alt evidence -> large positive odds; none -> very negative
    strong = activity.log_likelihood_ratio(10, [30] * 10)
    weak = activity.log_likelihood_ratio(30, [8])
    assert strong > 10
    assert weak < strong


def test_assembly_recovers_variant_haplotype(world):
    rng, ref = world
    seg = ref[1000:1200]
    alt_seg = seg.copy()
    alt_seg[100] = (alt_seg[100] + 1) % 4
    reads = []
    for _ in range(20):
        p = int(rng.integers(0, 100))
        reads.append(dict(seq_codes=alt_seg[p:p + 80].astype(np.int64),
                          quals=np.full(80, 30, np.int64)))
    haps = assembly.assemble_region(seg, reads)
    assert any(not h.is_ref and bytes(h.bases) == bytes(alt_seg)
               for h in haps), len(haps)


def test_deletion_called(world):
    rng, ref = world
    vpos = 2000
    tumor = _cover(ref, rng, (1900, 2100), depth=24,
                   muts=[("del", vpos, 4)], frac=0.6)
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor)
    hits = [c for c in calls if abs(c.pos - vpos) <= 4 and
            len(c.ref) > len(c.alt)]
    assert hits, calls


def test_snv_with_sequencing_errors(world):
    """1% random errors + 30% VAF SNV: the adaptive pruner must drop
    the error branches while the shared variant haplotype survives."""
    rng, ref = world
    vpos = 2200
    alt = int((ref[vpos] + 2) % 4)
    tumor = _cover(ref, rng, (2100, 2300), depth=12,
                   muts=[(vpos, alt)], frac=1.0)
    tumor += _cover(ref, rng, (2100, 2300), depth=28)
    for rd in tumor:                      # sprinkle sequencing errors
        m = rng.random(len(rd["seq_codes"])) < 0.01
        rd["seq_codes"] = np.where(
            m, rng.integers(0, 4, len(rd["seq_codes"])), rd["seq_codes"])
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor)
    hits = [c for c in calls if c.pos == vpos and c.alt == "ACGTN"[alt]]
    assert hits, [(c.pos, c.ref, c.alt) for c in calls]


def test_many_regions_pipelined(world):
    """Several separated variants -> multiple active regions in flight
    (the pipelined region loop must finish all of them, in order)."""
    _, ref = world
    rng = np.random.default_rng(123)   # order-independent reads
    vpos = [400, 900, 1400, 1900, 2300]
    tumor = []
    alts = {}
    for vp in vpos:
        alt = int((ref[vp] + 1) % 4)
        alts[vp] = alt
        tumor += _cover(ref, rng, (vp - 100, vp + 100), depth=16,
                        muts=[(vp, alt)], frac=0.8)
        tumor += _cover(ref, rng, (vp - 100, vp + 100), depth=8)
    eng = Mutect2Engine(ref, "chr1")
    calls = eng.call(tumor)
    poss = sorted(c.pos for c in calls)
    assert poss == sorted(set(poss))          # sorted, unique
    for vp in vpos:
        hits = [c for c in calls if c.pos == vp and
                c.alt == "ACGTN"[alts[vp]]]
        assert hits, (vp, [(c.pos, c.alt) for c in calls])


def test_llr_batch_matches_scalar():
    rng = np.random.default_rng(8)
    items = []
    for _ in range(50):
        n_alt = int(rng.integers(1, 8))
        items.append((int(rng.integers(0, 60)),
                      list(rng.integers(5, 41, n_alt))))
    n_ref = np.array([r for r, _ in items])
    flat = np.concatenate([np.asarray(a, float) for _, a in items])
    seg = np.repeat(np.arange(len(items)),
                    [len(a) for _, a in items])
    got = activity.log_likelihood_ratio_batch(n_ref, flat, seg, len(items))
    for t, (r, a) in enumerate(items):
        want = activity.log_likelihood_ratio(r, a)
        assert abs(got[t] - want) < 1e-9, t
