"""SeqGraph simplification stage (call/seqgraph.py) vs reference
semantics (deepmutect src/graph/SeqGraph.cpp + graph/utils/*).

Covers the transform machinery on hand-built graphs (zip chains, merge
diamonds, merge tails, split/merge common suffixes) and asserts the
whole-pipeline invariant the reference relies on: simplification changes
the graph shape but not the source->sink path spellings, so the K-best
haplotype SET equals the unsimplified kmer-graph K-best set on the same
region (diamond and shared-suffix topologies included).
"""

import numpy as np
import pytest

from fgdp_tpu.call import assembly, seqgraph
from fgdp_tpu.call.seqgraph import SeqGraph, SeqVertex


def mk_graph(edges, k=5):
    """edges: list of (src_name, dst_name, is_ref, mult); vertex seq =
    its name encoded ascii."""
    g = SeqGraph(k)
    vs = {}
    for s, d, r, m in edges:
        for name in (s, d):
            if name not in vs:
                vs[name] = SeqVertex(name.encode())
                g.add_vertex(vs[name])
        g.add_edge(vs[s], vs[d], r, m)
    return g, vs


def path_set(g, n=64):
    return {bases for _, bases, _ in seqgraph.k_best_haplotypes(g, n)}


def test_zip_linear_chains():
    g, vs = mk_graph([("A", "B", True, 5), ("B", "C", True, 5),
                      ("C", "D", True, 5)])
    assert g.zip_linear_chains()
    assert g.n_vertices() == 1
    assert g.vertices[0].seq == b"ABCD"


def test_zip_respects_branches():
    # A -> B -> C with a side edge X -> C: B..C not zippable, A..B is
    g, vs = mk_graph([("A", "B", True, 5), ("B", "C", True, 5),
                      ("X", "C", False, 1)])
    g.zip_linear_chains()
    seqs = sorted(v.seq for v in g.vertices)
    assert b"AB" in seqs and b"C" in seqs and b"X" in seqs


def test_merge_diamonds_extracts_shared_fix():
    # top -> {xMIDz, xALTz} -> bottom : middles share prefix x, suffix z
    g, vs = mk_graph([("T", "xMIDz", True, 4), ("T", "xALTz", False, 2),
                      ("xMIDz", "B", True, 4), ("xALTz", "B", False, 2)])
    before = path_set(g)
    assert seqgraph._transform_until_complete(g, seqgraph._merge_diamonds)
    # both source->sink spellings survive
    assert path_set(g) == before == {b"TxMIDzB", b"TxALTzB"}
    # and the shared prefix/suffix now live in their own vertices
    seqs = {v.seq for v in g.vertices}
    assert b"x" in seqs and b"z" in seqs


def test_merge_tails():
    # two sink tails sharing a >=10 bp suffix get merged. This is the
    # one transform that GROWS the ref-source->ref-sink path set: the
    # non-ref tail previously ended at its own (non-ref) sink and was
    # invisible to K-best; after the merge both spellings reach the
    # single ref sink — exactly why K-best on the unsimplified graph
    # diverges from the binary on tail topologies.
    suf = "SHAREDTAIL"  # 10 chars = MIN_COMMON_SEQUENCE...
    g, vs = mk_graph([("T", "a" + suf, True, 3),
                      ("T", "b" + suf, False, 1)])
    before = path_set(g)
    assert before == {b"TaSHAREDTAIL"}
    assert seqgraph._transform_until_complete(g, seqgraph._merge_tails)
    assert path_set(g) == {b"TaSHAREDTAIL", b"TbSHAREDTAIL"}
    assert any(v.seq == suf.encode() for v in g.vertices)


def test_split_common_suffixes():
    # two mids with common suffix feeding one bottom
    g, vs = mk_graph([("S", "aXYZ", True, 3), ("S", "bXYZ", False, 2),
                      ("aXYZ", "B", True, 3), ("bXYZ", "B", False, 2)])
    before = path_set(g)
    changed = seqgraph._transform_until_complete(
        g, seqgraph._split_common_suffixes, once_per_vertex=True)
    assert changed
    assert path_set(g) == before
    assert any(v.seq == b"XYZ" for v in g.vertices)


def test_merge_common_suffixes():
    # two identical-sequence prevs over one bottom merge into one vertex
    g, vs = mk_graph([("p", "DUP", True, 2), ("q", "DUP2", False, 1)])
    # hand-build the identical-prev shape: p->V1->B, q->V2->B with
    # V1.seq == V2.seq
    g = SeqGraph(5)
    p, q, b = SeqVertex(b"p"), SeqVertex(b"q"), SeqVertex(b"B")
    v1, v2 = SeqVertex(b"MM"), SeqVertex(b"MM")
    for v in (p, q, b, v1, v2):
        g.add_vertex(v)
    g.add_edge(p, v1, True, 2)
    g.add_edge(q, v2, False, 1)
    g.add_edge(v1, b, True, 2)
    g.add_edge(v2, b, False, 1)
    assert seqgraph._transform_until_complete(
        g, seqgraph._merge_common_suffixes)
    assert any(v.seq == b"MMB" for v in g.vertices)


def _hap_set_via_kmer_kbest(ref, reads, k):
    """Round-3 behavior: K-best directly on the kmer graph."""
    from fgdp_tpu.call import graph as graphmod
    g = graphmod.ReadThreadingGraph(k)
    g.add_sequence("__ref__", np.asarray(ref, np.uint8), 0, len(ref),
                   1, True)
    for rd in reads:
        g.add_read(rd["seq_codes"], rd.get("quals"),
                   rd.get("sample", "tumor"))
    g.build()
    if g.ref_source() is None or g.ref_sink() is None:
        return None
    graphmod.prune_low_weight_chains(g)
    if g.has_cycles():
        return None
    graphmod.recover_dangling_tails(g, 0, 4)
    graphmod.recover_dangling_heads(g, 0, 4)
    if g.ref_source() is None or g.ref_sink() is None:
        return None
    g.remove_paths_not_connected_to_ref()
    return {bases for _, bases, _ in g.k_best_haplotypes(128)}


def _hap_set_via_seqgraph(ref, reads, k):
    sg = assembly.create_graph(ref, reads, k, True)
    if sg is None:
        return None
    return {bases for _, bases, _ in seqgraph.k_best_haplotypes(sg, 128)}


def _mk_reads(seqs, sample="tumor"):
    return [dict(seq_codes=np.frombuffer(s.encode(), np.uint8) - 65,
                 quals=np.full(len(s), 30, np.int32), sample=sample)
            for s in seqs]


CODE = {0: "A", 1: "B", 2: "C", 3: "D"}


def _rand_region(rng, n=80):
    return "".join(CODE[c] for c in rng.integers(0, 4, n))


@pytest.mark.parametrize("seed", range(8))
def test_kbest_set_parity_random(seed):
    """Simplification must not change the haplotype spelling set
    (random regions with SNVs + indels, 30x reads)."""
    rng = np.random.default_rng(seed)
    region = _rand_region(rng)
    # plant a het SNV and an insertion on half the reads
    alt = list(region)
    alt[37] = CODE[(rng.integers(1, 4) + ord(region[37]) - 65) % 4]
    alt = "".join(alt[:60]) + "AC" + "".join(alt[60:])
    reads = []
    for i in range(30):
        src = region if i % 2 == 0 else alt
        s = rng.integers(0, 10)
        reads.append(src[s:s + 60])
    ref = np.frombuffer(region.encode(), np.uint8) - 65
    km = _hap_set_via_kmer_kbest(ref, _mk_reads(reads), 25)
    sq = _hap_set_via_seqgraph(ref, _mk_reads(reads), 25)
    if km is None or sq is None:
        pytest.skip("graph rejected (cycle/complexity)")
    assert sq == km


def test_diamond_topology_haplotypes():
    """Two nearby het SNVs -> diamond in the seq graph; all 4 spellings
    must come out of the simplified K-best."""
    rng = np.random.default_rng(42)
    region = _rand_region(rng, 100)
    v1 = list(region)
    v1[30] = "A" if region[30] != "A" else "B"
    v2 = list(region)
    v2[55] = "C" if region[55] != "C" else "D"
    v12 = list(v1)
    v12[55] = v2[55]
    seqs = []
    for i in range(40):
        src = [region, "".join(v1), "".join(v2), "".join(v12)][i % 4]
        s = i % 8
        # reads must extend >= k past the second SNV so the alt branch
        # rejoins the ref kmers instead of dangling
        seqs.append(src[s:s + 88])
    ref = np.frombuffer(region.encode(), np.uint8) - 65
    haps = assembly.assemble_region(ref, _mk_reads(seqs),
                                    kmer_sizes=(25,))
    spell = {h.bases.tobytes() for h in haps}
    for w in (region, "".join(v1), "".join(v2), "".join(v12)):
        wb = (np.frombuffer(w.encode(), np.uint8) - 65).astype(np.uint8)
        assert wb.tobytes() in spell


def test_shared_suffix_topology_haplotypes():
    """Insertion vs ref creates shared-suffix sink paths; spelling set
    preserved through simplification."""
    rng = np.random.default_rng(7)
    region = _rand_region(rng, 80)
    ins = region[:40] + "CADB" + region[40:]
    seqs = []
    for i in range(30):
        src = region if i % 2 == 0 else ins
        s = i % 6
        seqs.append(src[s:s + 64])
    ref = np.frombuffer(region.encode(), np.uint8) - 65
    km = _hap_set_via_kmer_kbest(ref, _mk_reads(seqs), 25)
    sq = _hap_set_via_seqgraph(ref, _mk_reads(seqs), 25)
    if km is None or sq is None:
        pytest.skip("graph rejected")
    assert sq == km
    ins_b = (np.frombuffer(ins.encode(), np.uint8) - 65).astype(np.uint8)
    assert ins_b.tobytes() in {bytes(h) for h in sq}
