"""Read-threading de Bruijn graph with GATK/Mutect2 semantics.

Transcribes the reference's assembly graph layer (deepmutect
Mutect2Cpp-master/src/graph/ReadThreadingGraph.cpp, src/path/
{ChainPruner,AdaptiveChainPruner}.h) as host Python — the graphs are
tiny (one assembly region, <=~400 vertices) and pointer-chasing, so
this layer stays off-device by design; the downstream PairHMM consumes
its haplotypes on the TPU.

Key semantics carried over exactly:
  * vertices are kmer INSTANCES: kmers that repeat within any single
    input sequence ("non-unique", determineNonUniques
    ReadThreadingGraph.cpp:70) never merge, so read-induced repeats
    do not create cycles (createVertex/extendChainByOne :245-288);
  * threading starts at the first non-ambiguous kmer of each usable
    read stretch that is not non-unique (findStart :313), and counts
    propagate backwards along matched kmers (increaseCountsInMatched-
    Kmers :345, INCREASE_COUNTS_BACKWARDS);
  * per-sample edge multiplicities; the pruning multiplicity is the
    largest single-sample multiplicity (MultiSampleEdge; Java
    PriorityQueue keep-top-numPruningSamples semantics with
    numPruningSamples=1 — the C++ port's std::priority_queue pop
    inverts this, we keep the Java behavior);
  * adaptive chain pruning (AdaptiveChainPruner.h: likelyErrorChains
    two-pass with re-estimated error rate, chainLogOdds via the
    Mutect2 logLikelihoodRatio);
  * dangling tail/head recovery against the reference path with a
    STANDARD_NGS Smith-Waterman and LEADING_INDEL overhangs
    (ReadThreadingGraph.cpp:437-860);
  * removePathsNotConnectedToRef (DirectedSpecifics.h:532) and K-best
    haplotype enumeration (KBestHaplotypeFinder semantics: score =
    sum log10(edge mult / total outgoing mult)).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from .activity import log_likelihood_ratio

# GATK SmithWatermanAligner.STANDARD_NGS
SW_MATCH = 25
SW_MISMATCH = -50
SW_GAP_OPEN = -110
SW_GAP_EXTEND = -6

MAX_CIGAR_COMPLEXITY = 3              # ReadThreadingGraph.h:69
DEFAULT_MIN_BASE_QUALITY = 10
DEFAULT_MIN_DANGLING_BRANCH_LENGTH = 4
DEFAULT_NUM_PRUNING_SAMPLES = 1

# AdaptiveChainPruner defaults (ReadThreadingAssembler.cpp:405)
INITIAL_ERROR_RATE = 0.001
PRUNING_LOG_ODDS_THRESHOLD = 2.302585092994046     # ln(10)
MAX_UNPRUNED_VARIANTS = 100


class Vertex:
    """A kmer instance (MultiDeBruijnVertex)."""
    __slots__ = ("seq", "idx", "in_edges", "out_edges")

    def __init__(self, seq: bytes, idx: int):
        self.seq = seq                 # full kmer, code bytes
        self.idx = idx                 # creation order (determinism)
        self.in_edges: list[Edge] = []
        self.out_edges: list[Edge] = []

    @property
    def suffix(self) -> int:
        return self.seq[-1]

    def __repr__(self):
        return f"V{self.idx}({self.seq.hex()})"


class Edge:
    """MultiSampleEdge: total multiplicity + per-sample snapshots."""
    __slots__ = ("source", "target", "is_ref", "mult", "cur", "samples")

    def __init__(self, source, target, is_ref, mult):
        self.source = source
        self.target = target
        self.is_ref = is_ref
        self.mult = mult
        self.cur = mult                # current sample's running count
        self.samples = [mult]          # snapshot at creation

    def inc(self, count):
        self.mult += count
        self.cur += count

    def flush_sample(self):
        self.samples.append(self.cur)
        self.cur = 0

    @property
    def pruning_mult(self) -> int:
        # numPruningSamples = 1 -> largest single-sample multiplicity
        return max(self.samples + [self.cur])


class ReadThreadingGraph:
    def __init__(self, kmer_size: int,
                 min_base_quality: int = DEFAULT_MIN_BASE_QUALITY,
                 num_pruning_samples: int = DEFAULT_NUM_PRUNING_SAMPLES):
        self.k = kmer_size
        self.min_base_quality = min_base_quality
        self.num_pruning_samples = num_pruning_samples
        self.pending: dict[str, list] = {}     # sample -> [(seq, s, e, cnt, is_ref)]
        self.sample_order: list[str] = []
        self.vertices: list[Vertex] = []       # creation order; None = removed
        self.unique_kmers: dict[bytes, Vertex] = {}
        self.non_unique: set[bytes] = set()
        self.ref_source_kmer: bytes | None = None
        self.built = False
        self._n = 0

    # ---------------- construction ----------------

    def add_sequence(self, sample: str, seq: np.ndarray, start: int,
                     stop: int, count: int, is_ref: bool):
        if sample not in self.pending:
            self.pending[sample] = []
            self.sample_order.append(sample)
        self.pending[sample].append((np.asarray(seq, np.uint8), start,
                                     stop, count, is_ref))

    def add_read(self, seq_codes, quals, sample: str):
        """Split the read into maximal usable stretches
        (ReadThreadingGraph::addRead :17-44)."""
        seq = np.asarray(seq_codes, np.uint8)
        q = (np.full(len(seq), 255, np.int32) if quals is None
             else np.asarray(quals, np.int32))
        usable = (seq < 4) & (q >= self.min_base_quality)
        last_good = -1
        n = len(seq)
        for end in range(n + 1):
            if end == n or not usable[end]:
                if last_good != -1 and end - last_good >= self.k:
                    self.add_sequence(sample, seq, last_good, end, 1, False)
                last_good = -1
            elif last_good == -1:
                last_good = end

    def _determine_non_uniques(self):
        """Kmers repeated within any single sequence (:70-240)."""
        self.non_unique.clear()
        k = self.k
        for sample in self.sample_order:
            for seq, s, e, _, _ in self.pending[sample]:
                b = seq[s:e].tobytes()
                seen = set()
                for i in range(len(b) - k + 1):
                    km = b[i:i + k]
                    if km in seen:
                        self.non_unique.add(km)
                    else:
                        seen.add(km)

    def _create_vertex(self, kmer: bytes) -> Vertex:
        v = Vertex(kmer, self._n)
        self._n += 1
        self.vertices.append(v)
        if kmer not in self.non_unique and kmer not in self.unique_kmers:
            self.unique_kmers[kmer] = v
        return v

    def _get_unique(self, kmer: bytes, allow_ref_source: bool):
        if not allow_ref_source and kmer == self.ref_source_kmer:
            return None
        return self.unique_kmers.get(kmer)

    def add_edge(self, u: Vertex, v: Vertex, is_ref: bool, mult: int) -> Edge:
        e = Edge(u, v, is_ref, mult)
        u.out_edges.append(e)
        v.in_edges.append(e)
        return e

    def remove_edge(self, e: Edge):
        e.source.out_edges.remove(e)
        e.target.in_edges.remove(e)

    def remove_vertex(self, v: Vertex):
        for e in list(v.in_edges):
            self.remove_edge(e)
        for e in list(v.out_edges):
            self.remove_edge(e)
        if self.unique_kmers.get(v.seq) is v:
            del self.unique_kmers[v.seq]
        self.vertices[self.vertices.index(v)] = None

    def live_vertices(self):
        return [v for v in self.vertices if v is not None]

    def _extend_chain_by_one(self, prev: Vertex, b: bytes, kmer_start: int,
                             count: int, is_ref: bool) -> Vertex:
        """(:263-288)"""
        nxt_char = b[kmer_start + self.k - 1]
        for e in prev.out_edges:
            if e.target.suffix == nxt_char:
                e.inc(count)
                return e.target
        kmer = b[kmer_start:kmer_start + self.k]
        if kmer == self.ref_source_kmer and not is_ref:
            v = self._create_vertex(kmer)
        else:
            v = self._get_unique(kmer, allow_ref_source=False)
            if v is None:
                v = self._create_vertex(kmer)
            elif is_ref:
                raise ValueError(
                    "unique vertex merging into the reference path")
        self.add_edge(prev, v, is_ref, count)
        return v

    def _find_start(self, b: bytes, start: int, stop: int,
                    is_ref: bool) -> int:
        if is_ref:
            return start
        for i in range(start, stop - self.k):
            if b[i:i + self.k] not in self.non_unique:
                return i
        return -1

    def _increase_counts_backwards(self, count, vertex, orig_kmer: bytes,
                                   offset: int):
        """(:345-370)"""
        q = [(vertex, offset)]
        while q:
            v, o = q.pop(0)
            for e in v.in_edges:
                if e.source.suffix == orig_kmer[o] and len(v.in_edges) == 1:
                    e.inc(count)
                    if o - 1 >= 0:
                        q.append((e.source, o - 1))

    def _thread_sequence(self, seq, start, stop, count, is_ref):
        b = seq.tobytes()
        upos = self._find_start(b, start, stop, is_ref)
        if upos == -1:
            return
        kmer = b[upos:upos + self.k]
        v = self._get_unique(kmer, allow_ref_source=True)
        if v is None:
            v = self._create_vertex(kmer)
        self._increase_counts_backwards(count, v, v.seq, self.k - 2)
        if is_ref:
            if self.ref_source_kmer is not None:
                raise ValueError("two ref sources")
            self.ref_source_kmer = b[start:start + self.k]
        for i in range(upos + 1, stop - self.k + 1):
            v = self._extend_chain_by_one(v, b, i, count, is_ref)

    def build(self):
        if self.built:
            return
        self._determine_non_uniques()
        for sample in self.sample_order:
            for seq, s, e, cnt, is_ref in self.pending[sample]:
                self._thread_sequence(seq, s, e, cnt, is_ref)
            for v in self.live_vertices():
                for edge in v.out_edges:
                    edge.flush_sample()
        self.pending.clear()
        self.built = True

    # ---------------- queries ----------------

    def ref_source(self) -> Vertex | None:
        for v in self.live_vertices():
            if self._is_ref_source(v):
                return v
        return None

    def ref_sink(self) -> Vertex | None:
        for v in self.live_vertices():
            if self._is_ref_sink(v):
                return v
        return None

    @staticmethod
    def _is_ref_source(v: Vertex) -> bool:
        return (not any(e.is_ref for e in v.in_edges)
                and any(e.is_ref for e in v.out_edges))

    @staticmethod
    def _is_ref_sink(v: Vertex) -> bool:
        return (not any(e.is_ref for e in v.out_edges)
                and any(e.is_ref for e in v.in_edges))

    def has_cycles(self) -> bool:
        color = {}                      # 0 grey, 1 black
        for root in self.live_vertices():
            if root in color:
                continue
            stack = [(root, iter(root.out_edges))]
            color[root] = 0
            while stack:
                v, it = stack[-1]
                adv = False
                for e in it:
                    w = e.target
                    c = color.get(w)
                    if c == 0:
                        return True
                    if c is None:
                        color[w] = 0
                        stack.append((w, iter(w.out_edges)))
                        adv = True
                        break
                if not adv:
                    color[v] = 1
                    stack.pop()
        return False

    def is_low_complexity(self) -> bool:
        return len(self.non_unique) * 4 > len(self.unique_kmers)

    def remove_singleton_orphans(self):
        for v in self.live_vertices():
            if not v.in_edges and not v.out_edges:
                self.remove_vertex(v)

    def remove_paths_not_connected_to_ref(self):
        """(DirectedSpecifics.h:532-563)"""
        src, snk = self.ref_source(), self.ref_sink()
        if src is None or snk is None:
            return
        fwd = {src}
        stack = [src]
        while stack:
            v = stack.pop()
            for e in v.out_edges:
                if e.target not in fwd:
                    fwd.add(e.target)
                    stack.append(e.target)
        bwd = {snk}
        stack = [snk]
        while stack:
            v = stack.pop()
            for e in v.in_edges:
                if e.source not in bwd:
                    bwd.add(e.source)
                    stack.append(e.source)
        keep = fwd & bwd
        for v in self.live_vertices():
            if v not in keep:
                self.remove_vertex(v)

    # ---------------- K-best haplotypes ----------------

    def k_best_haplotypes(self, n_best: int, max_len: int = 5000):
        """KBestHaplotypeFinder semantics over the kmer graph: bases =
        source kmer + per-vertex suffixes; score = sum log10(edge mult /
        total out mult). Returns [(score, bases bytes, all_edges_ref)].
        """
        src, snk = self.ref_source(), self.ref_sink()
        if src is None or snk is None:
            return []
        results = []
        cnt = 0
        heap = [(0.0, cnt, src, src.seq, True)]
        visited = 0
        while heap and len(results) < n_best and visited < 100000:
            neg, _, v, bases, all_ref = heapq.heappop(heap)
            visited += 1
            if v is snk and len(bases) > self.k:
                results.append((-neg, bases, all_ref))
                continue
            if len(bases) > max_len:
                continue
            total = sum(e.mult for e in v.out_edges)
            for e in v.out_edges:
                if e.mult <= 0:
                    continue
                cnt += 1
                heapq.heappush(
                    heap, (neg - math.log10(e.mult / total), cnt, e.target,
                           bases + bytes([e.target.suffix]),
                           all_ref and e.is_ref))
        return results


# ------------------------------------------------------------------
# Adaptive chain pruning (AdaptiveChainPruner.h)
# ------------------------------------------------------------------

def _find_all_chains(g: ReadThreadingGraph):
    """Maximal linear chains; each edge belongs to exactly one
    (ChainPruner.h:69-117)."""
    chain_starts = [v for v in g.live_vertices() if not v.in_edges]
    seen = set(chain_starts)
    chains = []
    qi = 0
    while qi < len(chain_starts):
        start = chain_starts[qi]
        qi += 1
        for e0 in start.out_edges:
            edges = [e0]
            first, last = e0.source, e0.target
            while True:
                if (len(last.out_edges) != 1 or len(last.in_edges) > 1
                        or last is first):
                    break
                nxt = last.out_edges[0]
                edges.append(nxt)
                last = nxt.target
            chains.append(edges)
            if last not in seen:
                seen.add(last)
                chain_starts.append(last)
    return chains


def _error_prob_to_qual(p: float) -> int:
    return int(round(-10.0 * math.log10(max(p, 1e-30))))


def _chain_log_odds(chain, error_rate: float) -> float:
    if any(e.is_ref for e in chain):
        return math.inf
    first_v, last_v = chain[0].source, chain[-1].target
    left_total = sum(e.mult for e in first_v.out_edges)
    right_total = sum(e.mult for e in last_v.in_edges)
    left_mult, right_mult = chain[0].mult, chain[-1].mult
    qual = _error_prob_to_qual(error_rate)
    left = (0.0 if not first_v.in_edges else
            log_likelihood_ratio(left_total - left_mult, [qual], left_mult))
    right = (0.0 if not last_v.out_edges else
             log_likelihood_ratio(right_total - right_mult, [qual],
                                  right_mult))
    return max(left, right)


def _is_chain_possible_variant(chain) -> bool:
    first_v, last_v = chain[0].source, chain[-1].target
    left_total = sum(e.mult for e in first_v.out_edges)
    right_total = sum(e.mult for e in last_v.in_edges)
    return (chain[0].mult <= left_total / 2
            or chain[-1].mult <= right_total / 2)


def _chain_bases(chain) -> bytes:
    return chain[0].source.seq + bytes(e.target.suffix for e in chain)


def _likely_error_chains(chains, error_rate, log_odds):
    result = set()
    for i, ch in enumerate(chains):
        log_odds[i] = _chain_log_odds(ch, error_rate)
        if log_odds[i] < PRUNING_LOG_ODDS_THRESHOLD:
            result.add(i)
    variant = [i for i, ch in enumerate(chains)
               if _is_chain_possible_variant(ch)]
    if len(variant) > MAX_UNPRUNED_VARIANTS:
        variant.sort(key=lambda i: (-log_odds[i], -len(_chain_bases(chains[i])),
                                    _chain_bases(chains[i])))
        result.update(variant[MAX_UNPRUNED_VARIANTS:])
    return result


def prune_low_weight_chains(g: ReadThreadingGraph,
                            initial_error_rate: float = INITIAL_ERROR_RATE):
    """AdaptiveChainPruner::chainsToRemove + removal."""
    chains = _find_all_chains(g)
    if not chains:
        return
    log_odds = [0.0] * len(chains)
    probable = _likely_error_chains(chains, initial_error_rate, log_odds)
    error_count = sum(chains[i][-1].mult for i in probable)
    total_bases = sum(e.mult for ch in chains for e in ch)
    error_rate = error_count / max(total_bases, 1)
    to_remove = _likely_error_chains(chains, error_rate, log_odds)
    for i in to_remove:
        for e in chains[i]:      # chains partition edges: no repeats
            g.remove_edge(e)
    g.remove_singleton_orphans()


# ------------------------------------------------------------------
# Dangling-end recovery (ReadThreadingGraph.cpp:437-860)
# ------------------------------------------------------------------

def _heaviest(edges):
    best = edges[0]
    for e in edges[1:]:
        if best.pruning_mult < e.pruning_mult:
            best = e
    return best


def sw_dangling(ref: bytes, alt: bytes):
    """Affine-gap DP with GATK STANDARD_NGS scores and the
    LEADING_INDEL overhang strategy: global at the start (leading
    overhangs become I/D), local at the end (alignment ends at the best
    cell on the last row/column; trailing overhang dropped). Returns a
    cigar list[(op, len)] with ops 'M','I','D' over (ref, alt); I =
    extra alt bases, D = extra ref bases."""
    n, m = len(ref), len(alt)
    NEG = -(1 << 30)
    M = np.full((n + 1, m + 1), NEG, np.int64)
    X = np.full((n + 1, m + 1), NEG, np.int64)   # gap in alt (D run)
    Y = np.full((n + 1, m + 1), NEG, np.int64)   # gap in ref (I run)
    M[0, 0] = 0
    for i in range(1, n + 1):
        X[i, 0] = SW_GAP_OPEN + (i - 1) * SW_GAP_EXTEND
    for j in range(1, m + 1):
        Y[0, j] = SW_GAP_OPEN + (j - 1) * SW_GAP_EXTEND
    r = np.frombuffer(ref, np.uint8)
    a = np.frombuffer(alt, np.uint8)
    for i in range(1, n + 1):
        sub = np.where(a == r[i - 1], SW_MATCH, SW_MISMATCH)
        prev_best = np.maximum(np.maximum(M[i - 1], X[i - 1]), Y[i - 1])
        M[i, 1:] = prev_best[:-1] + sub
        X[i] = np.maximum(M[i - 1] + SW_GAP_OPEN, X[i - 1] + SW_GAP_EXTEND)
        # Y needs a left-to-right scan (within-row dependence)
        for j in range(1, m + 1):
            Y[i, j] = max(M[i, j - 1] + SW_GAP_OPEN,
                          Y[i, j - 1] + SW_GAP_EXTEND)
    best = np.maximum(np.maximum(M, X), Y)
    # end anywhere on the last row or last column
    ei, ej, score = n, m, best[n, m]
    for j in range(m + 1):
        if best[n, j] > score:
            ei, ej, score = n, j, best[n, j]
    for i in range(n + 1):
        if best[i, m] > score:
            ei, ej, score = i, m, best[i, m]
    # traceback from (ei, ej) to (0, 0)
    ops = []
    i, j = ei, ej
    state = int(np.argmax([M[i, j], X[i, j], Y[i, j]]))
    while i > 0 or j > 0:
        if state == 0 and i > 0 and j > 0:
            ops.append("M")
            pb = [M[i - 1, j - 1], X[i - 1, j - 1], Y[i - 1, j - 1]]
            i, j = i - 1, j - 1
            state = int(np.argmax(pb))
        elif state == 1 and i > 0:
            ops.append("D")
            state = 1 if (i > 1 and
                          X[i, j] == X[i - 1, j] + SW_GAP_EXTEND) else 0
            i -= 1
        elif state == 2 and j > 0:
            ops.append("I")
            state = 2 if (j > 1 and
                          Y[i, j] == Y[i, j - 1] + SW_GAP_EXTEND) else 0
            j -= 1
        else:                              # boundary: forced gap
            if i > 0:
                ops.append("D")
                i -= 1
            else:
                ops.append("I")
                j -= 1
    ops.reverse()
    cigar = []
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += 1
        else:
            cigar.append([op, 1])
    return [(op, ln) for op, ln in cigar]


def _remove_trailing_deletions(cigar):
    while cigar and cigar[-1][0] == "D":
        cigar = cigar[:-1]
    return cigar


def _cigar_ok(cigar, require_first_m, require_last_m):
    if not cigar or len(cigar) > MAX_CIGAR_COMPLEXITY:
        return False
    if require_first_m and cigar[0][0] != "M":
        return False
    if require_last_m and cigar[-1][0] != "M":
        return False
    return True


def _cigar_ref_len(cigar):
    return sum(ln for op, ln in cigar if op in ("M", "D"))


def _cigar_read_len(cigar):
    return sum(ln for op, ln in cigar if op in ("M", "I"))


def _path_suffix_bases(path) -> bytes:
    return bytes(v.suffix for v in path)


def _path_bases_expand_source(path) -> bytes:
    """getBasesForPath with expandSource=True (:565-597): source
    vertices contribute their full kmer reversed (head paths run
    right-to-left)."""
    out = bytearray()
    for v in path:
        if not v.in_edges:
            out.extend(v.seq[::-1])
        else:
            out.append(v.suffix)
    return bytes(out)


def _find_path_upwards(v: Vertex, prune_factor: int):
    """findPathUpwardsToLowestCommonAncestor, giveUpAtBranch=True
    (:487-506)."""
    ret = []
    while len(v.in_edges) == 1 and len(v.out_edges) < 2:
        e = v.in_edges[0]
        if e.pruning_mult < prune_factor:
            ret.clear()
        else:
            ret.append(v)
        v = e.source
    ret.append(v)
    return ret if len(v.out_edges) > 1 else []


def _find_path_downwards(v: Vertex, prune_factor: int):
    """findPathDownwardsToHighestCommonDescendantOfReference,
    giveUpAtBranch=True (:700-724)."""
    def is_ref_node(u):
        return any(e.is_ref for e in u.in_edges + u.out_edges)

    ret = []
    while not (is_ref_node(v) or len(v.out_edges) != 1):
        e = v.out_edges[0]
        if e.pruning_mult < prune_factor:
            ret.clear()
        else:
            ret.append(v)
        v = e.target
    ret.append(v)
    return ret if is_ref_node(v) else []


def _next_ref_vertex(v: Vertex, blacklisted: Edge | None):
    """getNextReferenceVertex(v, allowNonRefPaths=True, blacklisted)
    (DirectedSpecifics.h:463-485)."""
    for e in v.out_edges:
        if e.is_ref:
            return e.target
    edges = [e for e in v.out_edges if e is not blacklisted]
    return edges[0].target if len(edges) == 1 else None


def _prev_ref_vertex(v: Vertex):
    for e in v.in_edges:
        if e.is_ref:
            return e.source
    return None


def _ref_path(start: Vertex, downwards: bool, blacklisted: Edge | None):
    path = []
    v = start
    seen = set()
    while v is not None and v not in seen:
        seen.add(v)
        path.append(v)
        v = (_next_ref_vertex(v, blacklisted) if downwards
             else _prev_ref_vertex(v))
    return path


def _longest_suffix_match(seq: bytes, kmer: bytes, seq_start: int) -> int:
    for ln in range(1, len(kmer) + 1):
        si = seq_start - ln + 1
        ki = len(kmer) - ln
        if si < 0 or seq[si] != kmer[ki]:
            return ln - 1
    return len(kmer)


def recover_dangling_tails(g: ReadThreadingGraph, prune_factor: int,
                           min_dangling_branch_length: int):
    """(:437-459) + merge (:615-643)."""
    for v in list(g.live_vertices()):
        if v is None or v.out_edges or g._is_ref_sink(v):
            continue
        min_tail = max(1, min_dangling_branch_length)
        alt_path = _find_path_upwards(v, prune_factor)
        if (not alt_path or g._is_ref_source(alt_path[-1])
                or len(alt_path) < min_tail + 1):
            continue
        alt_path.reverse()             # [LCA, ..., dangling sink]
        blacklisted = (_heaviest(alt_path[1].in_edges)
                       if len(alt_path) > 1 and alt_path[1].in_edges
                       else None)
        ref_path = _ref_path(alt_path[0], True, blacklisted)
        ref_b = _path_suffix_bases(ref_path)
        alt_b = _path_suffix_bases(alt_path)
        cigar = _remove_trailing_deletions(sw_dangling(ref_b, alt_b))
        if not _cigar_ok(cigar, False, True):
            continue
        # mergeDanglingTail (:615)
        last_ref_index = _cigar_ref_len(cigar) - 1
        matching_suffix = min(
            _longest_suffix_match(ref_b, alt_b, last_ref_index),
            cigar[-1][1])
        if matching_suffix == 0:
            continue
        alt_index = max(_cigar_read_len(cigar) - matching_suffix - 1, 0)
        first_is_del = cigar[0][0] == "D"
        leading_del_case = (first_is_del and
                            cigar[0][1] + matching_suffix
                            == last_ref_index + 1)
        ref_index = (last_ref_index - matching_suffix + 1
                     + (1 if leading_del_case else 0))
        if ref_index == 0 or ref_index >= len(ref_path) \
                or alt_index >= len(alt_path):
            continue
        g.add_edge(alt_path[alt_index], ref_path[ref_index], False, 1)


def _best_prefix_match(path1: bytes, path2: bytes, max_index: int,
                       kmer_size: int) -> int:
    max_mismatches = max(1, max_index // kmer_size)
    mismatches = 0
    last_mismatch = -1
    for i in range(min(max_index, len(path1), len(path2))):
        if path1[i] != path2[i]:
            mismatches += 1
            if mismatches > max_mismatches:
                return -1
            last_mismatch = i
    return last_mismatch


def recover_dangling_heads(g: ReadThreadingGraph, prune_factor: int,
                           min_dangling_branch_length: int):
    """(:660-700) + merge (:751-775) + ref extension (:805-845)."""
    for v in list(g.live_vertices()):
        if v is None or v.in_edges or g._is_ref_source(v):
            continue
        alt_path = _find_path_downwards(v, prune_factor)
        if (not alt_path or g._is_ref_sink(alt_path[-1])
                or len(alt_path) < min_dangling_branch_length + 1):
            continue
        alt_path.reverse()             # [common descendant, ..., source]
        ref_path = _ref_path(alt_path[0], False, None)
        ref_b = _path_bases_expand_source(ref_path)
        alt_b = _path_bases_expand_source(alt_path)
        cigar = _remove_trailing_deletions(sw_dangling(ref_b, alt_b))
        if not _cigar_ok(cigar, True, False):
            continue
        # mergeDanglingHead (:751)
        idx = _best_prefix_match(ref_b, alt_b, cigar[0][1], g.k)
        if idx <= 0:
            continue
        if idx >= len(ref_path) - 1:
            continue
        if idx >= len(alt_path):
            if not _extend_dangling_path(g, alt_path, ref_path,
                                         idx - len(alt_path) + 2):
                continue
        g.add_edge(ref_path[idx + 1], alt_path[idx], False, 1)


def _extend_dangling_path(g: ReadThreadingGraph, alt_path, ref_path,
                          num_nodes: int) -> bool:
    """extendDanglingPathAgainstReference (:805-845)."""
    last = len(alt_path) - 1
    ref_idx = last + num_nodes
    if ref_idx >= len(ref_path):
        return False
    dangling_source = alt_path.pop(last)
    seq = (ref_path[ref_idx].seq[:num_nodes] + dangling_source.seq)
    if not dangling_source.out_edges:
        return False
    source_edge = _heaviest(dangling_source.out_edges)
    prev_v = source_edge.target
    g.remove_edge(source_edge)
    for i in range(num_nodes, 0, -1):
        new_v = g._create_vertex(seq[i:i + g.k])
        e = g.add_edge(new_v, prev_v, False, source_edge.mult)
        e.samples = list(source_edge.samples)
        alt_path.append(new_v)
        prev_v = new_v
    return True
