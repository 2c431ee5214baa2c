"""Local assembly: read-threading de Bruijn graph -> K best haplotypes.

Transcribes the core of the reference's assembler (deepmutect
Mutect2Cpp-master/src/Mutect2/ReadThreadingAssembler.cpp:253-361,
src/graph/): per kmer size, thread the reference and reads into a kmer
graph, prune low-support edges, and enumerate the K best source->sink
haplotypes by edge-multiplicity score. Pointer-heavy and tiny — host
code by design (SURVEY §7.1); the downstream likelihoods run on device.

Simplifications vs the reference (round-1): dangling-end recovery and
graph-simplification passes (SeqGraph zipping, diamond merging) are not
implemented — haplotypes that don't span the whole region are dropped,
which the kmer-size escalation mostly compensates for.
"""

from __future__ import annotations

import dataclasses
import heapq

import numpy as np

DEFAULT_KMER_SIZES = (10, 25)
KMER_SIZE_ITERATION_INCREASE = 10      # ReadThreadingAssembler
MAX_KMER_ITERATIONS_TO_ATTEMPT = 6
DEFAULT_PRUNE_FACTOR = 2
DEFAULT_NUM_BEST_HAPLOTYPES = 128


@dataclasses.dataclass
class Haplotype:
    bases: np.ndarray        # uint8 codes
    score: float             # K-best path score
    kmer_size: int
    is_ref: bool = False


def _kmers(seq, k):
    for i in range(len(seq) - k + 1):
        yield bytes(seq[i:i + k])


def build_graph(ref, reads, k, prune_factor=DEFAULT_PRUNE_FACTOR,
                min_base_quality=10):
    """Returns (edges, ref_source, ref_sink) or None when the reference
    has non-unique kmers (createGraph kmer-uniqueness bailout,
    ReadThreadingAssembler.cpp:296)."""
    ref = np.asarray(ref, np.uint8)
    if len(ref) < k + 1:
        return None
    seen = set()
    for km in _kmers(ref, k):
        if km in seen:
            return None          # non-unique ref kmer -> try larger k
        seen.add(km)

    edges = {}                   # (kmer, next_base) -> [count, is_ref]

    def thread(seq, quals, is_ref):
        seq = np.asarray(seq, np.uint8)
        n = len(seq)
        if n < k + 1:
            return
        ok = seq < 4
        if quals is not None:
            ok &= np.asarray(quals) >= min_base_quality
        for i in range(n - k):
            if not ok[i:i + k + 1].all():
                continue
            key = (bytes(seq[i:i + k]), int(seq[i + k]))
            e = edges.get(key)
            if e is None:
                edges[key] = [1, is_ref]
            else:
                e[0] += 1
                e[1] = e[1] or is_ref

    thread(ref, None, True)
    for rd in reads:
        thread(rd["seq_codes"], rd.get("quals"), False)

    # prune: non-ref edges below the factor are removed (pruneFactor)
    edges = {key: e for key, e in edges.items()
             if e[1] or e[0] >= prune_factor}
    source = bytes(ref[:k])
    sink = bytes(ref[-k:])
    return edges, source, sink


def k_best_haplotypes(edges, source, sink, k,
                      n_best=DEFAULT_NUM_BEST_HAPLOTYPES,
                      max_len=2000):
    """KBestHaplotypeFinder::findBestHaplotypes semantics
    (graph/KBestHaplotypeFinder.cpp:129): best-first search over paths,
    score = sum of log10(edge_mult / total_outgoing_mult)."""
    out_edges = {}
    for (km, b), (cnt, is_ref) in edges.items():
        out_edges.setdefault(km, []).append((b, cnt))
    totals = {km: sum(c for _, c in es) for km, es in out_edges.items()}

    results = []
    # heap entries: (-score, counter, kmer, path_bytes)
    cnt = 0
    heap = [(0.0, cnt, source, source)]
    visited_paths = 0
    while heap and len(results) < n_best and visited_paths < 100000:
        neg, _, km, path = heapq.heappop(heap)
        visited_paths += 1
        if km == sink and len(path) > k:
            results.append((neg, path))
            continue
        if len(path) > max_len:
            continue
        for b, c in out_edges.get(km, ()):  # extend
            nk = km[1:] + bytes([b])
            score = neg - (np.log10(c / totals[km]))
            cnt += 1
            heapq.heappush(heap, (score, cnt, nk, path + bytes([b])))
    return [( -neg, path) for neg, path in results]


def assemble_region(ref, reads, kmer_sizes=DEFAULT_KMER_SIZES,
                    prune_factor=DEFAULT_PRUNE_FACTOR,
                    n_best=DEFAULT_NUM_BEST_HAPLOTYPES):
    """runLocalAssembly: try kmer sizes (+escalation on ref-kmer
    collisions), collect haplotypes spanning the full region. The ref
    haplotype is always included. Returns list[Haplotype] (ref first),
    deduped by sequence."""
    ref = np.asarray(ref, np.uint8)
    haps = [Haplotype(bases=ref.copy(), score=0.0, kmer_size=0, is_ref=True)]
    seen = {bytes(ref)}
    sizes = list(kmer_sizes)
    extra = 0
    k = sizes[-1]
    while extra < MAX_KMER_ITERATIONS_TO_ATTEMPT and sizes:
        k = sizes.pop(0)
        g = build_graph(ref, reads, k, prune_factor)
        if g is None:
            if not sizes:
                sizes = [k + KMER_SIZE_ITERATION_INCREASE]
                extra += 1
            continue
        edges, source, sink = g
        for score, path in k_best_haplotypes(edges, source, sink, k, n_best):
            b = np.frombuffer(path, np.uint8)
            key = bytes(b)
            if key not in seen:
                seen.add(key)
                haps.append(Haplotype(bases=b.copy(), score=score,
                                      kmer_size=k))
    return haps
