"""Read-threading graph + assembler: haplotype recovery, pruning,
dangling-end recovery, cycle/kmer escalation."""

import numpy as np
import pytest

from fgdp_tpu.call import assembly, graph as graphmod


def _mk_reads(seqs, quals=40, sample="tumor"):
    return [{"seq_codes": np.asarray(s, np.uint8),
             "quals": np.full(len(s), quals, np.int32),
             "sample": sample} for s in seqs]


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(11)
    return rng.integers(0, 4, 160).astype(np.uint8)


def _reads_covering(ref, n=12, L=60, step=8):
    out = []
    for i in range(n):
        p = min(i * step, len(ref) - L)
        out.append(ref[p:p + L].copy())
    return out


def test_ref_only_assembly(ref):
    reads = _mk_reads(_reads_covering(ref))
    haps = assembly.assemble_region(ref, reads)
    assert haps[0].is_ref
    assert all(np.array_equal(h.bases, ref) for h in haps if h.is_ref)


def test_snp_haplotype_recovered(ref):
    mut = ref.copy()
    mut[80] = (mut[80] + 1) % 4
    seqs = _reads_covering(ref, n=6) + _reads_covering(mut, n=6)
    haps = assembly.assemble_region(ref, _mk_reads(seqs))
    keys = {bytes(h.bases) for h in haps}
    assert bytes(mut) in keys and bytes(ref) in keys


def test_insertion_haplotype_recovered(ref):
    mut = np.concatenate([ref[:80], [2, 2, 3], ref[80:]]).astype(np.uint8)
    seqs = []
    for i in range(8):
        p = 80 - 50 + i * 4
        seqs.append(mut[p:p + 70])
    seqs += _reads_covering(ref, n=6)
    haps = assembly.assemble_region(ref, _mk_reads(seqs))
    keys = {bytes(h.bases) for h in haps}
    assert bytes(mut) in keys


def test_singleton_error_branch_pruned(ref):
    """A 1-read branch against deep coverage should be adaptively
    pruned (AdaptiveChainPruner)."""
    err = ref.copy()
    err[80] = (err[80] + 1) % 4
    seqs = _reads_covering(ref, n=30, step=4) + [err[50:110]]
    haps = assembly.assemble_region(ref, _mk_reads(seqs))
    keys = {bytes(h.bases) for h in haps}
    assert bytes(err) not in keys
    assert len(haps) == 1            # only the ref haplotype


def test_dangling_tail_recovery(ref):
    """Reads with a SNP near the END that stop short of the region end:
    their paths dead-end before the ref sink, so without recovery the
    variant haplotype is unreachable."""
    mut = ref.copy()
    mut[130] = (mut[130] + 1) % 4
    # alt reads end at 150 < len(ref)=160: the alt path never reaches
    # the ref sink and needs a dangling-tail merge
    alt_reads = [mut[p:150] for p in range(85, 110, 4)]
    seqs = _reads_covering(ref, n=8) + alt_reads
    haps = assembly.assemble_region(ref, _mk_reads(seqs))
    keys = {bytes(h.bases) for h in haps}
    assert bytes(mut) in keys


def test_dangling_head_recovery(ref):
    """Reads with a SNP near the START beginning after the ref source
    need a dangling-head merge (plus >=1 prefix mismatch, i.e. the SNP
    itself, per bestPrefixMatch semantics)."""
    mut = ref.copy()
    mut[25] = (mut[25] + 1) % 4
    alt_reads = [mut[8:p] for p in range(60, 90, 5)]
    seqs = _reads_covering(ref, n=8) + alt_reads
    haps = assembly.assemble_region(ref, _mk_reads(seqs))
    keys = {bytes(h.bases) for h in haps}
    assert bytes(mut) in keys


def test_repeat_ref_escalates_kmer(ref):
    """A reference with a 12bp tandem repeat defeats k=10 (non-unique
    ref kmers) but k=25 succeeds."""
    rep = np.concatenate([ref[:60], ref[40:60], ref[60:]]).astype(np.uint8)
    reads = _mk_reads([rep[p:p + 70] for p in range(0, len(rep) - 70, 7)])
    haps = assembly.assemble_region(rep, reads)
    assert haps[0].is_ref
    assert all(h.kmer_size != 10 for h in haps[1:])


def test_per_sample_pruning_multiplicity(ref):
    """Pruning multiplicity is the max across samples, not the sum."""
    g = graphmod.ReadThreadingGraph(10)
    g.add_sequence("__ref__", ref, 0, len(ref), 1, True)
    for rd in _mk_reads([ref[20:80]] * 3, sample="tumor"):
        g.add_read(rd["seq_codes"], rd["quals"], "tumor")
    for rd in _mk_reads([ref[20:80]] * 2, sample="normal"):
        g.add_read(rd["seq_codes"], rd["quals"], "normal")
    g.build()
    # an interior ref-path edge threaded by both samples
    v = g.unique_kmers[ref[40:50].tobytes()]
    e = v.out_edges[0]
    assert e.mult == 1 + 3 + 2          # ref + tumor + normal
    assert e.pruning_mult == 3          # max single-sample = tumor (3)
    assert max(e.samples) == e.pruning_mult


def test_sw_dangling_cigar():
    ref = bytes([0, 1, 2, 3, 0, 1, 2, 3, 0, 1])
    alt = bytes([0, 1, 2, 3, 0, 1, 2, 3, 0, 1])
    assert graphmod.sw_dangling(ref, alt) == [("M", 10)]
    # one mismatch
    alt2 = bytes([0, 1, 2, 3, 3, 1, 2, 3, 0, 1])
    assert graphmod.sw_dangling(ref, alt2) == [("M", 10)]
    # deletion of 2 ref bases
    alt3 = ref[:4] + ref[6:]
    cig = graphmod.sw_dangling(ref, alt3)
    assert ("D", 2) in cig and sum(l for op, l in cig if op != "I") == 10


def test_non_unique_kmers_no_cycle():
    """A read-internal repeat would be a cycle in a plain de Bruijn
    graph; per-instance vertices keep the graph acyclic."""
    rng = np.random.default_rng(3)
    core = rng.integers(0, 4, 30).astype(np.uint8)
    seq = np.concatenate([core, core[5:20], core[5:20], core]).astype(np.uint8)
    g = graphmod.ReadThreadingGraph(10)
    g.add_sequence("__ref__", seq, 0, len(seq), 1, True)
    g.build()
    assert g.has_cycles() is False
