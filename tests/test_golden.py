"""Golden-output parity with the reference bwa-mem2-lcp binary.

Fixtures in tests/golden/ were produced by building the reference
aligner (arch=native, gcc12 __rdtsc patch) and running:
    bwa-mem2 index ref.fa
    bwa-mem2 mem -t 1 ref.fa se.fq            > se.oracle.sam
    bwa-mem2 mem -t 1 ref.fa pe1.fq pe2.fq    > pe.oracle.sam
This is the reference's own correctness oracle
(bwa-mem2-lcp/test_bench/run_test_suit.sh:65-71 diffs SAM outputs).
"""

import os

import numpy as np
import pytest

from fgdp_tpu.config import BatchShapes
from fgdp_tpu.index.reference import PackedReference
from fgdp_tpu.io.fastq import parse_fastq_records
from fgdp_tpu.pipeline import Aligner
from fgdp_tpu.utils import dna

HERE = os.path.join(os.path.dirname(__file__), "golden")
CORE = slice(1, 6)          # FLAG RNAME POS MAPQ CIGAR
PAIR_COLS = slice(1, 10)    # + RNEXT PNEXT TLEN
TAGS = ("NM", "MD", "AS", "XS")

SHAPES = BatchShapes(read_len=100, batch_reads=128, max_smems=128,
                     max_seeds=192, max_chains=24, max_regs=24,
                     max_ext_ref=304)


@pytest.fixture(scope="module")
def aligner():
    pref = PackedReference.from_fasta(os.path.join(HERE, "ref.fa"))
    return Aligner.build(pref, shapes=SHAPES)


def _load_fastq(path):
    names, seqs, quals = [], [], []
    for name, _, seq, q in parse_fastq_records(path):
        names.append(name)
        seqs.append(dna.encode(seq).astype(np.int64))
        quals.append(q.decode())
    return names, seqs, quals


def _index_sam(lines):
    out = {}
    for ln in lines:
        if ln.startswith("@") or not ln.strip():
            continue
        f = ln.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x900:
            continue
        key = (f[0], flag & 0xC0)     # name + read1/read2
        out[key] = f
    return out


def _tags(f):
    return {t.split(":")[0]: t for t in f[11:]}


def _compare(ref_lines, our_lines, cols, min_core, min_full, n):
    ref = _index_sam(ref_lines)
    ours = _index_sam(our_lines)
    assert len(ours) == len(ref)
    core = full = 0
    mism = []
    for key, rf in ref.items():
        of = ours.get(key)
        assert of is not None, key
        c = rf[cols] == of[cols]
        tr, to = _tags(rf), _tags(of)
        fl = c and all(tr.get(k) == to.get(k) for k in TAGS)
        core += c
        full += fl
        if not fl and len(mism) < 4:
            mism.append((key, rf[cols], of[cols],
                         [tr.get(k) for k in TAGS],
                         [to.get(k) for k in TAGS]))
    assert core >= min_core, (core, n, mism)
    assert full >= min_full, (full, n, mism)


def test_golden_single_end(aligner):
    names, seqs, quals = _load_fastq(os.path.join(HERE, "se.fq"))
    lines = aligner.align_batch(names, seqs, quals)
    with open(os.path.join(HERE, "se.oracle.sam")) as f:
        oracle = f.read().splitlines()
    _compare(oracle, lines, CORE, 150, 150, len(names))


def test_golden_repetitive_xa():
    """Repetitive reference (3 near-identical 5kb repeats): exercises
    mem_gen_alt XA:Z tags (bwamem_extra.cpp:124-185) and XS sub-scores."""
    pref = PackedReference.from_fasta(os.path.join(HERE, "rep_ref.fa"))
    al = Aligner.build(pref, shapes=SHAPES)
    names, seqs, quals = _load_fastq(os.path.join(HERE, "rep.fq"))
    lines = al.align_batch(names, seqs, quals)
    with open(os.path.join(HERE, "rep.oracle.sam")) as f:
        oracle = f.read().splitlines()
    # exact on core fields; full-tag parity excepts exactly rep71,
    # whose XS comes from a WEIGHT-TIED chain pair: the reference's
    # ks_introsort (ext/TAL/ext/ksort.h) is unstable and its n=3
    # median-of-3 partition swaps the two w=20 chains, so it extends
    # the chrR:12016 repeat copy (XS:32) where our stable-by-pos order
    # extends chrR:8016 (XS:36) — implementation-defined in the
    # reference, root-caused round 2
    _compare(oracle, lines, CORE, 80, 79, len(names))
    ref, ours = _index_sam(oracle), _index_sam(lines)
    xa_match = sum(_tags(rf).get("XA") == _tags(ours[k]).get("XA")
                   for k, rf in ref.items())
    assert xa_match >= 74, xa_match


def test_golden_paired_end(aligner):
    n1, s1, q1 = _load_fastq(os.path.join(HERE, "pe1.fq"))
    n2, s2, q2 = _load_fastq(os.path.join(HERE, "pe2.fq"))
    names = [x for p in zip(n1, n2) for x in p]
    seqs = [x for p in zip(s1, s2) for x in p]
    quals = [x for p in zip(q1, q2) for x in p]
    lines = aligner.align_pairs(names, seqs, quals)
    with open(os.path.join(HERE, "pe.oracle.sam")) as f:
        oracle = f.read().splitlines()
    _compare(oracle, lines, PAIR_COLS, 200, 200, 2 * len(n1))


def test_golden_all_alignments():
    """-a / MEM_F_ALL: secondary records emitted (flag 0x100, SEQ '*')
    instead of XA tags (bwamem.cpp:1991,2003)."""
    from fgdp_tpu.config import AlignConfig

    pref = PackedReference.from_fasta(os.path.join(HERE, "rep_ref.fa"))
    al = Aligner.build(pref, opt=AlignConfig(output_all=True),
                       shapes=SHAPES)
    names, seqs, quals = _load_fastq(os.path.join(HERE, "rep.fq"))
    lines = al.align_batch(names, seqs, quals)
    with open(os.path.join(HERE, "rep_a.oracle.sam")) as f:
        oracle = [l for l in f.read().splitlines() if not l.startswith("@")]
    ours = [l for l in lines if not l.startswith("@")]
    # secondary record count parity
    osec = sorted(l.split("\t")[3] for l in oracle
                  if int(l.split("\t")[1]) & 0x100)
    usec = sorted(l.split("\t")[3] for l in ours
                  if int(l.split("\t")[1]) & 0x100)
    matches = sum(a == b for a, b in zip(osec, usec))
    assert len(usec) >= 0.9 * len(osec), (len(usec), len(osec))
    assert matches >= 0.9 * min(len(osec), len(usec)), matches
    # no XA tags in -a mode
    assert not any("XA:Z" in l for l in ours)


def test_golden_alt_contigs():
    """ALT-contig handling (.alt file): alt-aware primary marking
    (bwamem.cpp:1882-1926 two-round sort with is_alt), alt hits emitted
    as supplementary 0x800 when they head their group, XA listing alt
    hits, AH:* header lines (bwa.cpp:542)."""
    pref = PackedReference.from_fasta(os.path.join(HERE, "alt_ref.fa"))
    assert list(pref.is_alt) == [False, True]
    al = Aligner.build(pref, shapes=SHAPES)
    assert any("AH:*" in ln for ln in al.sam_header())
    names, seqs, quals = _load_fastq(os.path.join(HERE, "alt.fq"))
    lines = al.align_batch(names, seqs, quals)
    with open(os.path.join(HERE, "alt.oracle.sam")) as f:
        oracle = f.read().splitlines()
    # primary records: core + tag parity
    _compare(oracle, lines, CORE, 48, 48, len(names))
    # supplementary alt records (flag 0x800): set parity on
    # (qname, rname, pos, cigar)
    def supp(ls):
        return sorted((f[0], f[2], f[3], f[5])
                      for f in (ln.split("\t") for ln in ls
                                if ln and not ln.startswith("@"))
                      if int(f[1]) & 0x800)
    assert supp(lines) == supp(oracle)
    # XA parity on primaries
    ref, ours = _index_sam(oracle), _index_sam(lines)
    xa_match = sum(_tags(rf).get("XA") == _tags(ours[k]).get("XA")
                   for k, rf in ref.items())
    assert xa_match >= 46, xa_match


def test_golden_option_flags():
    """Non-default mem_opt flags (-k 25 -T 40 -B 5 -L 3) against the
    reference binary run with the same flags — validates the option
    plumbing end to end."""
    from fgdp_tpu.config import AlignConfig

    pref = PackedReference.from_fasta(os.path.join(HERE, "alt_ref.fa"))
    opt = AlignConfig(min_seed_len=25, T=40, b=5, pen_clip5=3,
                      pen_clip3=3)
    al = Aligner.build(pref, opt=opt, shapes=SHAPES)
    names, seqs, quals = _load_fastq(os.path.join(HERE, "alt.fq"))
    lines = al.align_batch(names, seqs, quals)
    with open(os.path.join(HERE, "opt.oracle.sam")) as f:
        oracle = f.read().splitlines()
    _compare(oracle, lines, CORE, 48, 47, len(names))
