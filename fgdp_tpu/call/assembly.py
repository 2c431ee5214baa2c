"""Local assembly: read-threading de Bruijn graph -> K best haplotypes.

Transcribes the reference assembler's control flow (deepmutect
Mutect2Cpp-master/src/Mutect2/ReadThreadingAssembler.cpp:252-345):
per kmer size {10, 25} (skipping sizes below the smallest for which the
reference sequence has unique kmers, getMinKmerSize :200-250), build a
read-threading graph, adaptively prune chains, reject cyclic or
low-complexity graphs, recover dangling tails/heads, drop paths not
connected to the reference path, and enumerate the K best source->sink
haplotypes; on total failure escalate the kmer size by 10 up to 6 times
(the final attempt allowing low-complexity graphs). Haplotypes from all
successful kmer sizes are unioned (findBestPaths :346-396 dedups by
sequence).

Graph semantics live in graph.py; the sequence-graph stage
(toSequenceGraph -> cleanNonRefPaths -> zip/merge/split simplification
fixpoint -> K-best, reference src/graph/SeqGraph.cpp +
graph/utils/{MergeDiamonds,MergeTails,SplitCommonSuffices,
MergeCommonSuffices}.cpp) lives in seqgraph.py and is applied before
K-best exactly as ReadThreadingAssembler::getAssemblyResult/
cleanupSeqGraph do (ReadThreadingAssembler.cpp:18-73).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import graph as graphmod
from . import seqgraph as seqmod

DEFAULT_KMER_SIZES = (10, 25)
KMER_SIZE_ITERATION_INCREASE = 10      # ReadThreadingAssembler.h
MAX_KMER_ITERATIONS_TO_ATTEMPT = 6
DEFAULT_NUM_BEST_HAPLOTYPES = 128
REF_SAMPLE = "__ref__"


@dataclasses.dataclass
class Haplotype:
    bases: np.ndarray        # uint8 codes
    score: float             # K-best path score
    kmer_size: int
    is_ref: bool = False


def _min_kmer_size(ref: np.ndarray, candidates) -> int:
    """Smallest candidate size with no repeated kmer in the reference
    (getMinKmerSize, ReadThreadingAssembler.cpp:200-250)."""
    b = ref.tobytes()
    for k in candidates:
        seen = set()
        ok = True
        for i in range(len(b) - k + 1):
            km = b[i:i + k]
            if km in seen:
                ok = False
                break
            seen.add(km)
        if ok:
            return k
    return candidates[-1]


def create_graph(ref, reads, k: int, allow_low_complexity: bool,
                 min_dangling_branch_length: int = 4,
                 prune_factor: int = 0):
    """createGraph (ReadThreadingAssembler.cpp:296-340) + the dangling /
    cleanup block (:20-62). Returns the K-best-ready graph or None."""
    if len(ref) < k + 1:
        return None
    g = graphmod.ReadThreadingGraph(k)
    g.add_sequence(REF_SAMPLE, np.asarray(ref, np.uint8), 0, len(ref),
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
    if not allow_low_complexity and g.is_low_complexity():
        return None
    graphmod.recover_dangling_tails(g, prune_factor,
                                    min_dangling_branch_length)
    graphmod.recover_dangling_heads(g, prune_factor,
                                    min_dangling_branch_length)
    if g.ref_source() is None or g.ref_sink() is None:
        return None
    g.remove_paths_not_connected_to_ref()
    # sequence-graph stage (getAssemblyResult :37-47 + cleanupSeqGraph)
    sg = seqmod.to_seq_graph(g)
    sg.clean_non_ref_paths()
    if not seqmod.cleanup_seq_graph(sg):
        return None           # JUST_ASSEMBLED_REFERENCE: no variation
    return sg


def assemble_region(ref, reads, kmer_sizes=DEFAULT_KMER_SIZES,
                    n_best=DEFAULT_NUM_BEST_HAPLOTYPES,
                    min_dangling_branch_length: int = 4):
    """runLocalAssembly: returns list[Haplotype], ref haplotype first,
    deduped by sequence. Reads are dicts with seq_codes/quals and an
    optional 'sample' key ('tumor'/'normal') for per-sample pruning
    multiplicities."""
    ref = np.asarray(ref, np.uint8)
    ref_hap = Haplotype(bases=ref.copy(), score=0.0, kmer_size=0,
                        is_ref=True)
    haps = [ref_hap]
    seen = {bytes(ref)}

    sizes = sorted(kmer_sizes)
    candidates = list(sizes)
    for _ in range(MAX_KMER_ITERATIONS_TO_ATTEMPT):
        candidates.append(candidates[-1] + KMER_SIZE_ITERATION_INCREASE)
    min_k = _min_kmer_size(ref, candidates)

    def run(k, allow_low_complexity):
        sg = create_graph(ref, reads, k, allow_low_complexity,
                          min_dangling_branch_length)
        if sg is None:
            return False
        got = False
        for score, path, all_ref in seqmod.k_best_haplotypes(sg, n_best):
            got = True
            b = np.frombuffer(path, np.uint8)
            key = bytes(b)
            if all_ref and key == bytes(ref):
                ref_hap.score = score
            if key not in seen:
                seen.add(key)
                haps.append(Haplotype(bases=b.copy(), score=score,
                                      kmer_size=k))
        return got

    any_result = False
    for k in sizes:
        if k < min_k:
            continue
        any_result |= run(k, False)

    if not any_result:
        k = sizes[-1] + KMER_SIZE_ITERATION_INCREASE
        for it in range(1, MAX_KMER_ITERATIONS_TO_ATTEMPT):
            if k >= min_k and run(k, False):
                any_result = True
                break
            k += KMER_SIZE_ITERATION_INCREASE
        if not any_result:
            run(k, True)
    return haps
