"""SeqGraph: sequence graph + simplification + K-best haplotypes.

Port of the reference's seq-graph stage (deepmutect Mutect2Cpp-master):
the kmer graph is converted to a sequence graph (ReadThreadingGraph::
toSequenceGraph, src/graph/ReadThreadingGraph.cpp:849), non-ref
entry/exit paths are clipped (DirectedSpecifics::cleanNonRefPaths,
src/graph/BaseGraph/DirectedSpecifics.h:623), and the graph is shrunk by
the simplification fixpoint (SeqGraph::simplifyGraph,
src/graph/SeqGraph.cpp:117-159: MergeDiamonds / MergeTails /
SplitCommonSuffices / MergeCommonSuffices / zipLinearChains per
iteration) before K-best path search (KBestHaplotypeFinder.cpp:94-133).

Semantics intentionally preserved from the C++:
  * parallel edges are NOT allowed: DirectedSpecifics.allowingMultipleEdges
    is false (DirectedSpecifics.h:53), so addEdge silently drops an edge
    when one already connects the same (source, target) pair
    (DirectedSpecifics.h:266-283) — transforms rely on this.
  * KBestHaplotype.isReference starts false and can only be AND-ed with
    edge refness (KBestHaplotype.h:15, KBestHaplotype.cpp:19), so the
    reference-haplotype score is never propagated in the C++ binary; we
    reproduce GATK's intent (initial true) because the score is only
    used for ref-haplotype bookkeeping, and flag the path as reference
    exactly when every traversed edge is a ref edge.
  * vertex iteration order: the C++ iterates phmap hash sets (pointer
    order, nondeterministic); we iterate in insertion order, which
    matches the binary's SORT_MODE intent of determinism.
"""

from __future__ import annotations

import heapq
import math

MIN_COMMON_SEQUENCE_TO_MERGE_SOURCE_SINK_VERTICES = 10   # MergeTails.h
MAX_REASONABLE_SIMPLIFICATION_CYCLES = 100               # SeqGraph.h


class SeqVertex:
    """Vertex carrying a byte sequence; identity-hashed like the C++
    shared_ptr vertices (SeqVertex::hashCode, SeqVertex.cpp:10)."""

    __slots__ = ("seq",)

    def __init__(self, seq: bytes):
        self.seq = bytes(seq)

    def __len__(self):
        return len(self.seq)

    def __repr__(self):
        return f"SeqVertex({self.seq!r})"

    def without_suffix(self, suffix: bytes):
        """SeqVertex.cpp:18-27; None when nothing remains."""
        n = len(self.seq) - len(suffix)
        return SeqVertex(self.seq[:n]) if n > 0 else None

    def without_prefix_and_suffix(self, prefix: bytes, suffix: bytes):
        """SeqVertex.cpp:29-41; None when nothing remains."""
        a, b = len(prefix), len(self.seq) - len(suffix)
        return SeqVertex(self.seq[a:b]) if b - a > 0 else None


class SeqEdge:
    __slots__ = ("source", "target", "is_ref", "mult")

    def __init__(self, source, target, is_ref: bool, mult: int):
        self.source = source
        self.target = target
        self.is_ref = bool(is_ref)
        self.mult = int(mult)

    def add(self, other: "SeqEdge"):
        """BaseEdge::add (BaseEdge.cpp:31-35)."""
        self.mult += other.mult
        self.is_ref = self.is_ref or other.is_ref
        return self


class SeqGraph:
    """Directed graph over SeqVertex with no parallel edges and no
    self-loops (both per DirectedSpecifics defaults)."""

    def __init__(self, kmer_size: int):
        self.k = kmer_size
        self._out: dict[SeqVertex, list[SeqEdge]] = {}
        self._in: dict[SeqVertex, list[SeqEdge]] = {}

    # ---------------- structure ----------------

    @property
    def vertices(self):
        return list(self._out.keys())

    def n_vertices(self):
        return len(self._out)

    def edges(self):
        return [e for es in self._out.values() for e in es]

    def contains(self, v):
        return v in self._out

    def add_vertex(self, v: SeqVertex):
        if v not in self._out:
            self._out[v] = []
            self._in[v] = []

    def add_edge(self, u, v, is_ref, mult) -> SeqEdge | None:
        """Returns None (no-op) when an edge u->v already exists —
        allowingMultipleEdges=false (DirectedSpecifics.h:271)."""
        if u is v:
            raise ValueError("loops not allowed")
        if self.get_edge(u, v) is not None:
            return None
        e = SeqEdge(u, v, is_ref, mult)
        self._out[u].append(e)
        self._in[v].append(e)
        return e

    def add_or_update_edge(self, u, v, is_ref, mult):
        """DirectedSpecifics::addOrUpdateEdge (h:670-686)."""
        prev = self.get_edge(u, v)
        if prev is not None:
            prev.add(SeqEdge(u, v, is_ref, mult))
            return prev
        return self.add_edge(u, v, is_ref, mult)

    def get_edge(self, u, v):
        for e in self._out.get(u, ()):
            if e.target is v:
                return e
        return None

    def remove_edge(self, e: SeqEdge):
        try:
            self._out[e.source].remove(e)
            self._in[e.target].remove(e)
        except (KeyError, ValueError):
            pass

    def remove_vertex(self, v):
        for e in list(self._out.get(v, ())):
            self.remove_edge(e)
        for e in list(self._in.get(v, ())):
            self.remove_edge(e)
        self._out.pop(v, None)
        self._in.pop(v, None)

    def out_edges(self, v):
        return self._out.get(v, [])

    def in_edges(self, v):
        return self._in.get(v, [])

    def out_degree(self, v):
        return len(self._out.get(v, ()))

    def in_degree(self, v):
        return len(self._in.get(v, ()))

    def outgoing_vertices(self, v):
        """Deduped, insertion-ordered (the C++ returns a set)."""
        return list(dict.fromkeys(e.target for e in self._out.get(v, ())))

    def incoming_vertices(self, v):
        return list(dict.fromkeys(e.source for e in self._in.get(v, ())))

    def is_source(self, v):
        return self.in_degree(v) == 0

    def is_sink(self, v):
        return self.out_degree(v) == 0

    def is_ref_node(self, v):
        """Specifics::isReferenceNode: touches any ref edge."""
        return any(e.is_ref for e in self._in.get(v, ())) or \
            any(e.is_ref for e in self._out.get(v, ()))

    def is_ref_source(self, v):
        """Specifics.h:48-61."""
        if any(e.is_ref for e in self._in.get(v, ())):
            return False
        if any(e.is_ref for e in self._out.get(v, ())):
            return True
        return self.n_vertices() == 1

    def is_ref_sink(self, v):
        if any(e.is_ref for e in self._out.get(v, ())):
            return False
        if any(e.is_ref for e in self._in.get(v, ())):
            return True
        return self.n_vertices() == 1

    def ref_source(self):
        for v in self._out:
            if self.is_ref_source(v):
                return v
        return None

    def ref_sink(self):
        for v in self._out:
            if self.is_ref_sink(v):
                return v
        return None

    # ---------------- cleanup passes ----------------

    def clean_non_ref_paths(self):
        """DirectedSpecifics::cleanNonRefPaths (h:623-654): strip
        non-ref edges upstream of the ref source and downstream of the
        ref sink, then drop the orphans."""
        src, snk = self.ref_source(), self.ref_sink()
        if src is None or snk is None:
            return
        work = list(self._in.get(src, ()))
        while work:
            e = work.pop()
            if not e.is_ref:
                work.extend(self._in.get(e.source, ()))
                self.remove_edge(e)
        work = list(self._out.get(snk, ()))
        while work:
            e = work.pop()
            if not e.is_ref:
                work.extend(self._out.get(e.target, ()))
                self.remove_edge(e)
        self.remove_singleton_orphans()

    def remove_singleton_orphans(self):
        for v in self.vertices:
            if self.in_degree(v) == 0 and self.out_degree(v) == 0 and \
                    not self.is_ref_source(v):
                self.remove_vertex(v)

    def remove_vertices_not_connected_to_ref(self):
        """removeVerticesNotConnectedToRefRegardlessOfEdgeDirection
        (DirectedSpecifics.h:660-670): keep the undirected component of
        the ref source."""
        ref = self.ref_source()
        keep = set()
        if ref is not None:
            stack = [ref]
            keep.add(ref)
            while stack:
                v = stack.pop()
                for e in self._out.get(v, ()):
                    if e.target not in keep:
                        keep.add(e.target)
                        stack.append(e.target)
                for e in self._in.get(v, ()):
                    if e.source not in keep:
                        keep.add(e.source)
                        stack.append(e.source)
        for v in self.vertices:
            if v not in keep:
                self.remove_vertex(v)

    def remove_paths_not_connected_to_ref(self):
        """DirectedSpecifics.h:532-563."""
        src, snk = self.ref_source(), self.ref_sink()
        if src is None or snk is None:
            raise ValueError("graph must have ref source and sink")
        fwd = {src}
        stack = [src]
        while stack:
            v = stack.pop()
            for e in self._out.get(v, ()):
                if e.target not in fwd:
                    fwd.add(e.target)
                    stack.append(e.target)
        bwd = {snk}
        stack = [snk]
        while stack:
            v = stack.pop()
            for e in self._in.get(v, ()):
                if e.source not in bwd:
                    bwd.add(e.source)
                    stack.append(e.source)
        keep = fwd & bwd
        for v in self.vertices:
            if v not in keep:
                self.remove_vertex(v)

    # ---------------- zip linear chains ----------------

    def zip_linear_chains(self) -> bool:
        """SeqGraph.cpp:18-41."""
        zip_starts = [v for v in self.vertices
                      if self._is_linear_chain_start(v)]
        merged = False
        for z in zip_starts:
            if not self.contains(z):
                continue
            merged |= self._merge_linear_chain(self._trace_linear_chain(z))
        return merged

    def _is_linear_chain_start(self, v) -> bool:
        if self.out_degree(v) != 1:
            return False
        if self.in_degree(v) != 1:
            return True
        pred = self.incoming_vertices(v)[0]
        return self.out_degree(pred) > 1

    def _trace_linear_chain(self, zip_start):
        chain = [zip_start]
        last_is_ref = self.is_ref_node(zip_start)
        last = zip_start
        while True:
            if self.out_degree(last) != 1:
                break
            target = self._out[last][0].target
            if self.in_degree(target) != 1 or last is target:
                break
            target_is_ref = self.is_ref_node(target)
            if last_is_ref != target_is_ref:
                break
            chain.append(target)
            last = target
            last_is_ref = target_is_ref
        return chain

    def _merge_linear_chain(self, chain) -> bool:
        first, last = chain[0], chain[-1]
        if first is last:
            return False
        merged = SeqVertex(b"".join(v.seq for v in chain))
        self.add_vertex(merged)
        for e in list(self._out.get(last, ())):
            self.add_edge(merged, e.target, e.is_ref, e.mult)
        for e in list(self._in.get(first, ())):
            self.add_edge(e.source, merged, e.is_ref, e.mult)
        for v in chain:
            self.remove_vertex(v)
        return True

    # ---------------- simplification fixpoint ----------------

    def simplify(self):
        """SeqGraph::simplifyGraph (SeqGraph.cpp:117-136)."""
        self.zip_linear_chains()
        prev_sig = None
        for i in range(MAX_REASONABLE_SIMPLIFICATION_CYCLES + 1):
            if i > MAX_REASONABLE_SIMPLIFICATION_CYCLES:
                raise RuntimeError("infinite simplification loop")
            if not self._simplify_once():
                break
            if i > 5:
                sig = self._signature()
                if prev_sig is not None and sig == prev_sig:
                    break
                prev_sig = sig

    def _signature(self):
        vs = sorted(v.seq for v in self.vertices)
        es = sorted((e.source.seq, e.target.seq, e.is_ref, e.mult)
                    for e in self.edges())
        return (tuple(vs), tuple(es))

    def _simplify_once(self) -> bool:
        did = _transform_until_complete(self, _merge_diamonds)
        did |= _transform_until_complete(self, _merge_tails)
        did |= _transform_until_complete(self, _split_common_suffixes,
                                         once_per_vertex=True)
        did |= _transform_until_complete(self, _merge_common_suffixes)
        did |= self.zip_linear_chains()
        return did


# ---------------- vertex-based transforms ----------------


def _transform_until_complete(g: SeqGraph, try_transform,
                              once_per_vertex=False) -> bool:
    """VertexBasedTransformer::transformUntilComplete
    (VertexBasedTransformer.cpp:12-31): rescan from scratch after every
    successful transform. SplitCommonSuffices additionally remembers
    vertices it already split (SplitCommonSuffices.cpp:9-16)."""
    done_vertices = set() if once_per_vertex else None
    did = False
    found = True
    while found:
        found = False
        for v in g.vertices:
            if done_vertices is not None:
                if id(v) in done_vertices:
                    continue
                done_vertices.add(id(v))
            if try_transform(g, v):
                did = True
                found = True
                break
    return did


def _merge_diamonds(g: SeqGraph, top) -> bool:
    """MergeDiamonds.cpp:8-43."""
    middles = g.outgoing_vertices(top)
    if len(middles) <= 1:
        return False
    bottom = None
    for mi in middles:
        if g.out_degree(mi) < 1 or g.in_degree(mi) != 1:
            return False
        for mt in g.outgoing_vertices(mi):
            if bottom is None:
                bottom = mt
            elif bottom is not mt:
                return False
    if g.in_degree(bottom) != len(middles):
        return False
    sp = _SharedVertexSequenceSplitter(g, middles)
    if max(len(sp.prefix), len(sp.suffix)) < 1:
        return False
    sp.split_and_update(top, bottom)
    return True


def _merge_tails(g: SeqGraph, top) -> bool:
    """MergeTails.cpp:7-27."""
    tails = g.outgoing_vertices(top)
    if len(tails) <= 1:
        return False
    for t in tails:
        if not g.is_sink(t) or g.in_degree(t) > 1:
            return False
    sp = _SharedVertexSequenceSplitter(g, tails)
    if len(sp.suffix) < MIN_COMMON_SEQUENCE_TO_MERGE_SOURCE_SINK_VERTICES:
        return False
    sp.split_and_update(top, None)
    return True


def _split_common_suffixes(g: SeqGraph, bottom) -> bool:
    """SplitCommonSuffices via CommonSuffixSplitter::split
    (CommonSuffixSplitter.cpp:11-53)."""
    to_split = g.incoming_vertices(bottom)
    suffix = _common_suffix_for_split(g, bottom, to_split)
    if suffix is None:
        return False
    edges_to_remove = []
    for mid in to_split:
        suffix_v = SeqVertex(suffix)
        g.add_vertex(suffix_v)
        prefix_v = mid.without_suffix(suffix)
        out = g.out_edges(mid)[0]
        if prefix_v is None:
            incoming_target = suffix_v
        else:
            incoming_target = prefix_v
            g.add_vertex(prefix_v)
            g.add_edge(prefix_v, suffix_v, out.is_ref, 1)
            edges_to_remove.append(out)
        g.add_edge(suffix_v, out.target, out.is_ref, out.mult)
        for e in list(g.in_edges(mid)):
            g.add_edge(e.source, incoming_target, e.is_ref, e.mult)
            edges_to_remove.append(e)
    for v in to_split:
        g.remove_vertex(v)
    for e in edges_to_remove:
        g.remove_edge(e)
    return True


def _common_suffix_for_split(g, v, to_split):
    """CommonSuffixSplitter::commonSuffix + guards
    (CommonSuffixSplitter.cpp:55-131)."""
    if len(to_split) < 2:
        return None
    # safeToSplit: every mid has exactly one outgoing edge, to v, and is
    # not itself a successor of v
    out_of_bot = set(map(id, g.outgoing_vertices(v)))
    for m in to_split:
        outs = g.out_edges(m)
        if m is v or len(outs) != 1 or outs[0].target is not v:
            return None
        if id(m) in out_of_bot:
            return None
    seqs = [m.seq for m in to_split]
    min_len = min(len(s) for s in seqs)
    suffix_len = _common_suffix_length(seqs, min_len)
    suffix = seqs[0][len(seqs[0]) - suffix_len:]
    if suffix_len == 0:
        return None
    # wouldEliminateRefSource
    for m in to_split:
        if g.is_ref_source(m):
            if len(m.seq) == suffix_len:
                return None
            break
    # allVerticesAreTheCommonSuffix
    if all(len(m.seq) == suffix_len for m in to_split):
        return None
    return suffix


def _merge_common_suffixes(g: SeqGraph, bottom) -> bool:
    """MergeCommonSuffices via SharedSequenceMerger::merge
    (SharedSequenceMerger.cpp:35-75)."""
    prevs = g.incoming_vertices(bottom)
    if not prevs:
        return False
    first = prevs[0]
    for prev in prevs:
        if prev.seq != first.seq:
            return False
        prev_outs = [e.target for e in g.out_edges(prev)]
        if len(prev_outs) != 1 or prev_outs[0] is not bottom:
            return False
        if g.in_degree(prev) == 0:
            return False
    edges_to_remove = []
    new_v = SeqVertex(first.seq + bottom.seq)
    g.add_vertex(new_v)
    for prev in prevs:
        for e in list(g.in_edges(prev)):
            g.add_edge(e.source, new_v, e.is_ref, e.mult)
            edges_to_remove.append(e)
    for e in list(g.out_edges(bottom)):
        g.add_edge(new_v, e.target, e.is_ref, e.mult)
    for prev in prevs:
        g.remove_vertex(prev)
    g.remove_vertex(bottom)
    for e in edges_to_remove:
        g.remove_edge(e)
    return True


def _common_prefix_length(seqs):
    n = min(len(s) for s in seqs)
    for i in range(n):
        b = seqs[0][i]
        if any(s[i] != b for s in seqs[1:]):
            return i
    return n


def _common_suffix_length(seqs, min_length):
    for i in range(min_length):
        b = seqs[0][len(seqs[0]) - i - 1]
        if any(s[len(s) - i - 1] != b for s in seqs[1:]):
            return i
    return min_length


class _SharedVertexSequenceSplitter:
    """SharedVertexSequenceSplitter.cpp — splits a set of middle
    vertices between top/bottom into shared prefix + distinct middles +
    shared suffix."""

    def __init__(self, g: SeqGraph, to_splits):
        assert len(to_splits) > 1
        self.g = g
        self.to_splits = list(to_splits)
        seqs = [v.seq for v in self.to_splits]
        min_len = min(len(s) for s in seqs)
        pre = _common_prefix_length(seqs)
        suf = _common_suffix_length(seqs, min_len - pre)
        self.prefix = seqs[0][:pre]
        self.suffix = seqs[0][len(seqs[0]) - suf:] if suf else b""

    def split_and_update(self, top, bottom):
        # split(): build the replacement subgraph (prefix -> mids ->
        # suffix) with edges inheriting the removed edges' attributes
        g = self.g
        edges_to_remove = []
        # splitGraph edges tracked as plain tuples:
        # prefix outgoing: (target_mid_or_None=suffix, is_ref, mult)
        mid_entries = []     # (remaining_vertex | None, to_attrs, from_attrs)
        direct = None        # merged prefix->suffix edge attrs
        for mid in self.to_splits:
            ins = g.in_edges(mid)
            outs = g.out_edges(mid)
            if ins:
                to_mid = (ins[0].is_ref, ins[0].mult)
                edges_to_remove.append(ins[0])
            else:
                to_mid = (g.is_ref_node(mid), 0)
            if outs:
                from_mid = (outs[0].is_ref, outs[0].mult)
                edges_to_remove.append(outs[0])
            else:
                from_mid = (g.is_ref_node(mid), 0)
            remaining = mid.without_prefix_and_suffix(self.prefix,
                                                      self.suffix)
            if remaining is not None:
                mid_entries.append((remaining, to_mid, from_mid))
            else:
                attrs = (to_mid[0] or from_mid[0],
                         to_mid[1] + from_mid[1])
                if direct is None:
                    direct = attrs
                else:
                    direct = (direct[0] or attrs[0], direct[1] + attrs[1])

        # updateGraph (SharedVertexSequenceSplitter.cpp:117-170)
        for v in self.to_splits:
            g.remove_vertex(v)
        for e in edges_to_remove:
            g.remove_edge(e)
        prefix_v = SeqVertex(self.prefix)
        suffix_v = SeqVertex(self.suffix)
        for rem, _, _ in mid_entries:
            g.add_vertex(rem)
        has_direct = direct is not None
        has_only_direct = has_direct and not mid_entries
        need_prefix = len(self.prefix) > 0 or \
            (top is None and not has_only_direct)
        need_suffix = len(self.suffix) > 0 or \
            (bottom is None and not has_only_direct)
        top_connect = prefix_v if need_prefix else top
        bot_connect = suffix_v if need_suffix else bottom

        if need_prefix:
            g.add_vertex(prefix_v)
            if top is not None:
                # makeOREdge over splitGraph out-edges of prefixV, mult 1
                any_ref = any(t[0] for _, t, _ in mid_entries) or \
                    (has_direct and direct[0])
                g.add_edge(top, prefix_v, any_ref, 1)
        if need_suffix:
            g.add_vertex(suffix_v)
            if bottom is not None:
                any_ref = any(f[0] for _, _, f in mid_entries) or \
                    (has_direct and direct[0])
                g.add_edge(suffix_v, bottom, any_ref, 1)

        if top_connect is not None:
            # addEdgesFromTopNode: prefix -> mids, and prefix -> suffix
            # (the direct edge) rerouted to bot_connect
            for rem, to_attrs, _ in mid_entries:
                g.add_edge(top_connect, rem, to_attrs[0], to_attrs[1])
            if has_direct and bot_connect is not None:
                g.add_edge(top_connect, bot_connect, direct[0], direct[1])
        if bot_connect is not None:
            # addEdgesToBottomNode: mids -> suffix (the duplicate direct
            # prefix->suffix add is a no-op: same edge object in C++,
            # existing-pair rejection here)
            for rem, _, from_attrs in mid_entries:
                g.add_edge(rem, bot_connect, from_attrs[0], from_attrs[1])
        return True


# ---------------- kmer graph -> SeqGraph ----------------


def to_seq_graph(g) -> SeqGraph:
    """ReadThreadingGraph::toSequenceGraph (ReadThreadingGraph.cpp:849):
    source vertices carry their whole kmer, all others their last base.
    `g` is a built call.graph.ReadThreadingGraph."""
    sg = SeqGraph(g.k)
    vmap = {}
    for dv in g.live_vertices():
        seq = dv.seq if not dv.in_edges else bytes([dv.suffix])
        sv = SeqVertex(seq)
        vmap[id(dv)] = sv
        sg.add_vertex(sv)
    for dv in g.live_vertices():
        for e in dv.out_edges:
            sg.add_edge(vmap[id(e.source)], vmap[id(e.target)],
                        e.is_ref, e.mult)
    return sg


# ---------------- assembly-side driver ----------------


def cleanup_seq_graph(sg: SeqGraph) -> bool:
    """ReadThreadingAssembler::cleanupSeqGraph (:49-73). Returns True
    when the graph still has variation (ref source+sink survive)."""
    sg.zip_linear_chains()
    sg.remove_singleton_orphans()
    sg.remove_vertices_not_connected_to_ref()
    sg.simplify()
    if sg.ref_source() is None or sg.ref_sink() is None:
        return False
    sg.remove_paths_not_connected_to_ref()
    sg.simplify()
    if sg.n_vertices() == 1:
        # dummy sink so K-best sees a source->sink pair
        complete = sg.vertices[0]
        dummy = SeqVertex(b"")
        sg.add_vertex(dummy)
        sg.add_edge(complete, dummy, True, 0)
    return True


def k_best_haplotypes(sg: SeqGraph, n_best: int):
    """KBestHaplotypeFinder::findBestHaplotypes
    (KBestHaplotypeFinder.cpp:94-133) from the ref source to the ref
    sink. Returns [(score, bases, is_reference)] best-first."""
    src, snk = sg.ref_source(), sg.ref_sink()
    if src is None or snk is None:
        return []
    results = []
    cnt = 0
    # heap entries: (-score, tiebreak, vertex, bases, all_ref)
    heap = [(0.0, cnt, src, src.seq, True)]
    vertex_counts: dict[int, int] = {}
    while heap and len(results) < n_best:
        neg, _, v, bases, all_ref = heapq.heappop(heap)
        if v is snk:
            results.append((-neg, bases, all_ref))
            continue
        c = vertex_counts.get(id(v), 0)
        vertex_counts[id(v)] = c + 1
        if c >= n_best:
            continue
        outs = sg.out_edges(v)
        total = sum(e.mult for e in outs)
        for e in outs:
            cnt += 1
            # score += log10(mult) - log10(total). Zero-multiplicity
            # edges exist by construction (MergeTails/dummy-sink edges
            # carry mult 0: SharedVertexSequenceSplitter
            # processEdgeToRemove null case, cleanupSeqGraph :66-70);
            # the C++ computes log10(0)-log10(0) there — keep the path
            # alive with contribution 0 instead of NaN
            if total > 0 and e.mult > 0:
                contrib = math.log10(e.mult) - math.log10(total)
            elif total > 0:
                contrib = -300.0
            else:
                contrib = 0.0
            heapq.heappush(heap, (
                neg - contrib, cnt, e.target, bases + e.target.seq,
                all_ref and e.is_ref))
    return results
