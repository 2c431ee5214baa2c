"""Naive reference implementations used as test oracles.

The reference's effective spec is bit-equality with known tools (SURVEY §4);
these oracles encode the same semantics in transparent O(n^2)-ish Python so
every device kernel has an independently-written ground truth.
"""

from __future__ import annotations

import numpy as np

from ..utils import dna


# ---------- exact search ----------

def text_with_rc(ref_codes: np.ndarray) -> bytes:
    """Index text X = T + revcomp(T) as bytes of codes (for .find)."""
    return np.concatenate([ref_codes, dna.revcomp(ref_codes)]).tobytes()


def find_all(text: bytes, pat: bytes) -> list:
    """All (possibly overlapping) occurrence positions of pat in text."""
    out, i = [], text.find(pat)
    while i != -1:
        out.append(i)
        i = text.find(pat, i + 1)
    return out


def count_occ(text: bytes, pat: bytes) -> int:
    return len(find_all(text, pat))


# ---------- SMEMs ----------

def smems_brute(text: bytes, query: np.ndarray, min_seed_len: int = 1,
                min_intv: int = 1, max_intv: int = np.inf) -> set:
    """Brute-force SMEM set of `query` against `text`.

    A match [s, e) (occurring with multiplicity >= min_intv) is an SMEM if
    no longer match [s', e') with s' <= s, e' >= e, (s',e') != (s,e) also
    occurs with multiplicity >= min_intv. Returns {(s, e, n_occ)}.
    `max_intv`: additionally require n_occ <= max_intv (K3 semantics uses
    a different rule; this flag is for interval-capped variants).
    """
    q = query.tobytes()
    L = len(q)
    # longest[s] = longest match starting at s with occ >= min_intv
    longest = np.zeros(L, dtype=int)
    occ_of_longest = np.zeros(L, dtype=int)
    for s in range(L):
        e = s
        last_occ = 0
        while e < L:
            c = count_occ(text, q[s:e + 1])
            if c < min_intv:
                break
            last_occ = c
            e += 1
        longest[s] = e - s
        occ_of_longest[s] = last_occ
    out = set()
    for s in range(L):
        if longest[s] == 0:
            continue
        e = s + longest[s]
        contained = any(
            s2 <= s and s2 + longest[s2] >= e and (s2, s2 + longest[s2]) != (s, e)
            for s2 in range(L)
        )
        if not contained and longest[s] >= min_seed_len and occ_of_longest[s] <= max_intv:
            out.add((s, e, int(occ_of_longest[s])))
    return out


# ---------- Smith-Waterman extension (ksw_extend semantics) ----------

def sw_extend(query: np.ndarray, target: np.ndarray, o_del, e_del, o_ins, e_ins,
              a=1, b=4, w=100, zdrop=100, h0=0, end_bonus=0):
    """Scalar port of bwa's seed-extension DP semantics (the contract the
    reference's BSW kernels implement, bwa-mem2-lcp/ext/TAL/src/alignment/
    BSW/bandedSWA.cpp scalar path).

    query/target: codes (0..4). Returns dict(score, qle, tle, gtle, gscore,
    max_off). Insertions consume query (i dim), deletions consume target.
    """
    qlen, tlen = len(query), len(target)
    if qlen == 0 or tlen == 0:
        return dict(score=h0, qle=0, tle=0, gtle=0, gscore=-1, max_off=0)

    def score(x, y):
        if x == 4 or y == 4:
            return -1
        return a if x == y else -b

    NEG = -0x40000000
    # H[i][j]: best score aligning query[0:i] to target[0:j], started at h0
    H = np.full((qlen + 1, tlen + 1), NEG, dtype=np.int64)
    E = np.full((qlen + 1, tlen + 1), NEG, dtype=np.int64)  # gap in query (del)
    F = np.full((qlen + 1, tlen + 1), NEG, dtype=np.int64)  # gap in target (ins)
    H[0][0] = h0
    for j in range(1, tlen + 1):
        v = h0 - o_del - j * e_del
        H[0][j] = v if v > 0 else NEG
    for i in range(1, qlen + 1):
        v = h0 - o_ins - i * e_ins
        H[i][0] = v if v > 0 else NEG

    best = h0
    qle = tle = 0
    gscore, gtle = -1, -1
    max_off = 0
    max_i = max_j = 0
    for i in range(1, qlen + 1):
        for j in range(1, tlen + 1):
            if abs((i - 1) - (j - 1)) > w:
                continue
            e = max(E[i][j - 1] - e_del, H[i][j - 1] - o_del - e_del)
            f = max(F[i - 1][j] - e_ins, H[i - 1][j] - o_ins - e_ins)
            m = H[i - 1][j - 1] + score(query[i - 1], target[j - 1])
            h = max(m, e, f)
            E[i][j], F[i][j] = e, f
            H[i][j] = h
            if h > best:
                best, qle, tle = h, i, j
                max_off = max(max_off, abs(i - j))
                max_i, max_j = i, j
        if H[i].max() == NEG:
            pass
        # global-ish score when the whole query is consumed
    for j in range(1, tlen + 1):
        if H[qlen][j] > gscore:
            gscore, gtle = H[qlen][j], j
    return dict(score=int(best), qle=int(qle), tle=int(tle),
                gtle=int(gtle), gscore=int(gscore), max_off=int(max_off))


# ---------- scalar ports of seed chaining (mem_chain_seeds_new etc.) ----------

def frac_rep_ref(smems, max_occ, l_query):
    """l_rep union computation (mem_chain_seeds_new, bwamem.cpp:1167-1176)."""
    b = e = l_rep = 0
    for (m, n, k, l, s) in smems:
        sb, se = m, n + 1
        if s <= max_occ:
            continue
        if sb > e:
            l_rep += e - b
            b, e = sb, se
        else:
            e = max(e, se)
    l_rep += e - b
    return l_rep / l_query


def chain_seeds_ref(fm, ref, smems, opt):
    """Scalar transcription of mem_chain_seeds_new (bwamem.cpp:1163-1237).

    smems: [(m, n, k, l, s)] in sorted order. Returns list of chains, each
    a dict(pos, rid, seeds=[(qbeg, rbeg, len)]), in B-tree (pos) order,
    and the flat seed jobs for cross-checking expansion.
    """
    l_pac = ref.l_pac
    chains = []   # kept sorted by pos (insertion keeps order)

    def lower_of(pos):
        lo = None
        for c in chains:
            if c["pos"] <= pos and (lo is None or c["pos"] >= lo["pos"]):
                lo = c
        return lo

    def test_and_merge(c, qbeg, rbeg, slen, rid):
        fq, fr, _ = c["seeds"][0]
        lq, lr, ll = c["seeds"][-1]
        if rid != c["rid"]:
            return 0
        if qbeg >= fq and qbeg + slen <= lq + ll and rbeg >= fr and \
                rbeg + slen <= lr + ll:
            return 1  # contained
        if (lr < l_pac or fr < l_pac) and rbeg >= l_pac:
            return 0
        x = qbeg - lq
        y = rbeg - lr
        if y >= 0 and x - y <= opt.w and y - x <= opt.w and \
                x - ll < opt.max_chain_gap and y - ll < opt.max_chain_gap:
            c["seeds"].append((qbeg, rbeg, slen))
            return 1
        return 0

    for (m, n, k, l, s) in smems:
        slen = n + 1 - m
        step = s // opt.max_occ if s > opt.max_occ else 1
        kk = count = 0
        while kk < s and count < opt.max_occ:
            rbeg = int(fm.sa[k + kk])
            if rbeg + n - m <= 2 * l_pac:
                rid = ref.intv2rid(rbeg, rbeg + slen)
                if rid >= 0:
                    lo = lower_of(rbeg)
                    if lo is None or not test_and_merge(lo, m, rbeg, slen, rid):
                        c = dict(pos=rbeg, rid=rid, seeds=[(m, rbeg, slen)])
                        # insert keeping pos order (B-tree traversal order)
                        i = 0
                        while i < len(chains) and chains[i]["pos"] <= rbeg:
                            i += 1
                        chains.insert(i, c)
            kk += step
            count += 1
    return chains


def chain_weight_ref(seeds):
    """mem_chain_weight (bwamem.cpp:452-473)."""
    w_q = end = 0
    for (qbeg, rbeg, slen) in seeds:
        if qbeg >= end:
            w_q += slen
        elif qbeg + slen > end:
            w_q += qbeg + slen - end
        end = max(end, qbeg + slen)
    w_r = end = 0
    for (qbeg, rbeg, slen) in seeds:
        if rbeg >= end:
            w_r += slen
        elif rbeg + slen > end:
            w_r += rbeg + slen - end
        end = max(end, rbeg + slen)
    return min(w_q, w_r)


def chain_flt_ref(chains, opt):
    """mem_chain_flt (bwamem.cpp:529-...): single-seqid variant.

    chains: list of dicts with w/beg/end/is_alt. Returns surviving chains
    in weight-sorted order with kept flags set.
    """
    a = [c for c in chains if c["w"] >= opt.min_chain_weight]
    if not a:
        return []
    for c in a:
        c["first"] = -1
        c["kept"] = 0
    a.sort(key=lambda c: -c["w"])   # NOTE: ties keep input order (stable)
    a[0]["kept"] = 3
    kept_idx = [0]
    for i in range(1, len(a)):
        large_ovlp = False
        broke = False
        for j in kept_idx:
            b_max = max(a[j]["beg"], a[i]["beg"])
            e_min = min(a[j]["end"], a[i]["end"])
            if e_min > b_max and (not a[j]["is_alt"] or a[i]["is_alt"]):
                li = a[i]["end"] - a[i]["beg"]
                lj = a[j]["end"] - a[j]["beg"]
                min_l = min(li, lj)
                if e_min - b_max >= min_l * opt.mask_level and \
                        min_l < opt.max_chain_gap:
                    large_ovlp = True
                    if a[j]["first"] < 0:
                        a[j]["first"] = i
                    if a[i]["w"] < a[j]["w"] * opt.drop_ratio and \
                            a[j]["w"] - a[i]["w"] >= opt.min_seed_len * 2:
                        broke = True
                        break
        if not broke:
            kept_idx.append(i)
            a[i]["kept"] = 2 if large_ovlp else 3
    for j in kept_idx:
        c = a[j]
        if c["first"] >= 0:
            a[c["first"]]["kept"] = 1
    k = 0
    for i in range(len(a)):
        if a[i]["kept"] in (1, 2):
            k += 1
            if k >= opt.max_chain_extend:
                for t in range(i, len(a)):   # incl. the chain hitting the cap
                    if a[t]["kept"] < 3:
                        a[t]["kept"] = 0
                break
    return [c for c in a if c["kept"] != 0]


# ---------- exact scalar port of the reference's banded SW extension ----------

def banded_swa_ref(query, target, w, h0, o_del, e_del, o_ins, e_ins,
                   zdrop, end_bonus, mat, m=5):
    """Exact scalar transcription of BandedPairWiseSW::scalarBandedSWA
    (reference ext/TAL/src/alignment/BSW/bandedSWA.cpp:116-234), the
    contract all BSW kernels implement (== bwa's ksw_extend2).

    query/target: int codes (0..4); mat: flat m*m score table.
    Returns dict(score, qle, tle, gtle, gscore, max_off).
    """
    qlen, tlen = len(query), len(target)
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    qp = [[int(mat[k * m + int(query[j])]) for j in range(qlen)] for k in range(m)]
    eh_h = [0] * (qlen + 2)
    eh_e = [0] * (qlen + 2)

    eh_h[0] = h0
    eh_h[1] = h0 - oe_ins if h0 > oe_ins else 0
    j = 2
    while j <= qlen and eh_h[j - 1] > e_ins:
        eh_h[j] = eh_h[j - 1] - e_ins
        j += 1

    mx = max(int(v) for v in mat)
    max_ins = int((qlen * mx + end_bonus - o_ins) / e_ins + 1.0)
    max_ins = max(max_ins, 1)
    w = min(w, max_ins)
    max_del = int((qlen * mx + end_bonus - o_del) / e_del + 1.0)
    max_del = max(max_del, 1)
    w = min(w, max_del)

    mmax, max_i, max_j, max_ie, gscore, max_off = h0, -1, -1, -1, -1, 0
    beg, end = 0, qlen
    for i in range(tlen):
        f, mrow, mj = 0, 0, -1
        q = qp[int(target[i])]
        if beg < i - w:
            beg = i - w
        if end > i + w + 1:
            end = i + w + 1
        if end > qlen:
            end = qlen
        h1 = max(h0 - (o_del + e_del * (i + 1)), 0) if beg == 0 else 0
        for j in range(beg, end):
            M, e = eh_h[j], eh_e[j]
            eh_h[j] = h1
            M = M + q[j] if M else 0
            h = M if M > e else e
            h = h if h > f else f
            h1 = h
            mj = mj if mrow > h else j
            mrow = mrow if mrow > h else h
            t = max(M - oe_del, 0)
            e = max(e - e_del, t)
            eh_e[j] = e
            t = max(M - oe_ins, 0)
            f = max(f - e_ins, t)
        eh_h[end] = h1
        eh_e[end] = 0
        if end == qlen:
            max_ie = max_ie if gscore > h1 else i
            gscore = gscore if gscore > h1 else h1
        if mrow == 0:
            break
        if mrow > mmax:
            mmax, max_i, max_j = mrow, i, mj
            max_off = max(max_off, abs(mj - i))
        elif zdrop > 0:
            if i - max_i > mj - max_j:
                if mmax - mrow - ((i - max_i) - (mj - max_j)) * e_del > zdrop:
                    break
            else:
                if mmax - mrow - ((mj - max_j) - (i - max_i)) * e_ins > zdrop:
                    break
        j = beg
        while j < end and eh_h[j] == 0 and eh_e[j] == 0:
            j += 1
        beg = j
        j = end
        while j >= beg and eh_h[j] == 0 and eh_e[j] == 0:
            j -= 1
        end = j + 2 if j + 2 < qlen else qlen
    return dict(score=mmax, qle=max_j + 1, tle=max_i + 1, gtle=max_ie + 1,
                gscore=gscore, max_off=max_off)


# ---------- scalar port of sortmardup duplicate marking ----------

def mark_duplicates_ref(records, ref_len):
    """Scalar transcription of the sortmardup dup scan
    (sortmardup/main.cpp:236-346; keys tbb/pair.cpp:52-110).

    records: SamRecords (io/sam.py). Returns set of duplicate pair_ids.
    """
    from ..io.sam import FREVERSE

    # build pairs
    by_pid = {}
    for i in range(len(records)):
        pid = int(records.pair_id[i])
        if pid:
            by_pid.setdefault(pid, []).append(i)
    singles, doubles = [], []
    indicator = set()
    for pid, idxs in by_pid.items():
        if len(idxs) == 1:
            i = idxs[0]
            rev = bool(records.flag[i] & FREVERSE)
            singles.append(dict(
                key=(int(records.prime5[i]), 3 if rev else 0),
                score=int(records.score[i]),
                txy=(int(records.tile[i]), int(records.tx[i]),
                     int(records.ty[i])),
                pid=pid, rev=rev))
        else:
            i1, i2 = idxs[0], idxs[1]
            p1, p2 = int(records.prime5[i1]), int(records.prime5[i2])
            r1 = bool(records.flag[i1] & FREVERSE)
            r2 = bool(records.flag[i2] & FREVERSE)
            if p1 > p2:
                p1, p2 = p2, p1
                r1, r2 = r2, r1
            orient = (2 if r1 else 0) + (1 if r2 else 0)
            if p1 == p2 and orient == 2:
                orient = 1   # RF -> FR when equal
            doubles.append(dict(key=(p1, orient, p2),
                                score=int(records.score[i1]) +
                                int(records.score[i2]),
                                txy=(int(records.tile[i1]),
                                     int(records.tx[i1]),
                                     int(records.ty[i1])),
                                pid=pid))
            indicator.add(p1 + (ref_len if orient >= 2 else 0))
            indicator.add(p2 + (ref_len if orient & 1 else 0))
    dups = set()
    doubles.sort(key=lambda d: (d["key"], -d["score"], d["txy"]))
    i = 0
    while i < len(doubles):
        j = i + 1
        while j < len(doubles) and doubles[j]["key"] == doubles[i]["key"]:
            dups.add(doubles[j]["pid"])
            j += 1
        i = j
    singles.sort(key=lambda d: (d["key"], -d["score"], d["txy"]))
    i = 0
    while i < len(singles):
        s = singles[i]
        target = s["key"][0] + (ref_len if s["rev"] else 0)
        if target in indicator:
            dups.add(s["pid"])
        j = i + 1
        while j < len(singles) and singles[j]["key"] == singles[i]["key"]:
            dups.add(singles[j]["pid"])
            j += 1
        i = j
    return dups


# ---------- PairHMM forward (GATK semantics, log-space float64) ----------

def pairhmm_loglik(hap: np.ndarray, read: np.ndarray, q: np.ndarray,
                   i_qual: np.ndarray, d_qual: np.ndarray, c_qual: np.ndarray):
    """log10 P(read | hap) per the GATK PairHMM recurrence (the contract of
    the reference's trie/AVX kernels, deepmutect .../intel/pairhmm/
    avx-pairhmm-template.h:204; constants Context.h).

    Linear-space float64 with the INITIAL_CONSTANT scaling of the double
    path (2^1020 is unnecessary here; we scale by 1/haplen directly).
    """
    R, H = len(read), len(hap)
    ph2pr = 10.0 ** (-np.arange(128) / 10.0)

    # transition probs per read base
    def mm_prob(iq, dq):
        s = 10 ** (-0.1 * iq) + 10 ** (-0.1 * dq)
        return 1.0 - s

    trans_mm = np.array([mm_prob(i_qual[i], d_qual[i]) for i in range(R)])
    trans_mi = ph2pr[np.clip(i_qual, 0, 127)]
    trans_md = ph2pr[np.clip(d_qual, 0, 127)]
    trans_gg = ph2pr[np.clip(c_qual, 0, 127)]   # gap continuation

    M = np.zeros((R + 1, H + 1))
    X = np.zeros((R + 1, H + 1))   # insertion in read (consumes read)
    Y = np.zeros((R + 1, H + 1))   # deletion (consumes hap)
    init = 1.0 / H
    Y[0, :] = init

    for i in range(1, R + 1):
        base_q = ph2pr[min(int(q[i - 1]), 127)]
        for j in range(1, H + 1):
            prior = (1.0 - base_q) if (read[i - 1] == hap[j - 1] or read[i - 1] == 4
                                       or hap[j - 1] == 4) else base_q / 3.0
            M[i, j] = prior * (trans_mm[i - 1] * M[i - 1, j - 1]
                               + (1 - trans_gg[i - 1]) * (X[i - 1, j - 1] + Y[i - 1, j - 1]))
            X[i, j] = trans_mi[i - 1] * M[i - 1, j] + trans_gg[i - 1] * X[i - 1, j]
            Y[i, j] = trans_md[i - 1] * M[i, j - 1] + trans_gg[i - 1] * Y[i, j - 1]
    final = M[R, :].sum() + X[R, :].sum()
    return np.log10(final)


# ---------- exact scalar ports of the reference seeding kernels ----------
# (FMI_search::getSMEMsOnePosOneThread / getSMEMsAllPosOneThread /
#  bwtSeedStrategyAllPosOneThread, reference ext/TAL/src/FMI/
#  FMI_search.cpp:1170-1488; driver mem_collect_smem src/bwamem.cpp:771-869.
#  These are the parity targets for the batched device kernels.)

def smem_one_pos_ref(fm, codes, x, min_intv, min_seed_len):
    """One anchor pass. Returns (smems [(m, n, k, l, s)], next_x)."""
    L = len(codes)
    out = []
    next_x = x + 1
    a = int(codes[x])
    if a >= 4:
        return out, next_x
    k, l, s = fm.init_interval(a)
    m, n = x, x
    prev = []
    for j in range(x + 1, L):
        next_x = j + 1
        a = int(codes[j])
        if a >= 4:
            break
        nk, nl, ns = fm.forward_extend(k, l, s, a)
        if ns != s:
            prev.append((m, n, k, l, s))
            if ns < min_intv:
                next_x = j
                break
        k, l, s, n = nk, nl, ns, j
    else:
        next_x = L
    if s >= min_intv:
        prev.append((m, n, k, l, s))
    prev.reverse()  # longest match (smallest interval) first

    for j in range(x - 1, -1, -1):
        a = int(codes[j])
        if a >= 4:
            break
        curr = []
        curr_s = -1
        p = 0
        while p < len(prev):
            pm, pn, pk, pl, ps = prev[p]
            nk, nl, ns = fm.backward_extend(pk, pl, ps, a)
            if ns < min_intv and (pn - pm + 1) >= min_seed_len:
                out.append((pm, pn, pk, pl, ps))
                break
            if ns >= min_intv and ns != curr_s:
                curr_s = ns
                curr.append((j, pn, nk, nl, ns))
                break
            p += 1
        p += 1
        while p < len(prev):
            pm, pn, pk, pl, ps = prev[p]
            nk, nl, ns = fm.backward_extend(pk, pl, ps, a)
            if ns >= min_intv and ns != curr_s:
                curr_s = ns
                curr.append((j, pn, nk, nl, ns))
            p += 1
        prev = curr
        if not curr:
            break
    if prev:
        pm, pn, pk, pl, ps = prev[0]
        if pn - pm + 1 >= min_seed_len:
            out.append((pm, pn, pk, pl, ps))
    return out, next_x


def smem_all_pos_ref(fm, codes, min_intv, min_seed_len):
    out = []
    x = 0
    while x < len(codes):
        smems, x = smem_one_pos_ref(fm, codes, x, min_intv, min_seed_len)
        out.extend(smems)
    return out


def seed_strategy_ref(fm, codes, max_intv, min_seed_len):
    """K3: forward-only interval-capped seeding
    (bwtSeedStrategyAllPosOneThread)."""
    L = len(codes)
    out = []
    x = 0
    while x < L:
        next_x = x + 1
        m, n = x, x
        a = int(codes[x])
        if a < 4:
            k, l, s = fm.init_interval(a)
            for j in range(x + 1, L):
                next_x = j + 1
                a = int(codes[j])
                if a >= 4:
                    break
                k, l, s = fm.forward_extend(k, l, s, a)
                n = j
                if s < max_intv and (n - m + 1) >= min_seed_len:
                    if s > 0:
                        out.append((m, n, k, l, s))
                    break
        x = next_x
    return out


def collect_smems_ref(fm, codes, opt):
    """Full K1+K2+K3 (mem_collect_smem semantics, bwamem.cpp:771-860)."""
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    k1 = smem_all_pos_ref(fm, codes, 1, opt.min_seed_len)
    k2 = []
    for (m, n, k, l, s) in k1:
        start, end = m, n + 1
        if end - start < split_len or s > opt.split_width:
            continue
        smems, _ = smem_one_pos_ref(fm, codes, (end + start) >> 1, s + 1,
                                    opt.min_seed_len)
        k2.extend(smems)
    k3 = []
    if opt.max_mem_intv > 0:
        k3 = seed_strategy_ref(fm, codes, opt.max_mem_intv,
                               opt.min_seed_len + 1)
    return k1, k2, k3


# ---------------------------------------------------------------------------
# PCR indel error model oracle: scalar transcription of
# PairHMMLikelihoodCalculationEngine::findTandemRepeatUnits /
# applyPCRErrorModel (deepmutect .../PairHMMLikelihoodCalculationEngine
# .cpp:139-254) + GATKVariantContextUtils::findNumberOfRepetitions
# (.../utils/variant/GATKVariantContextUtils.cpp:59-106).
# ---------------------------------------------------------------------------

def find_number_of_repetitions_ref(unit, test, leading):
    ul, tl = len(unit), len(test)
    if tl == 0:
        return 0
    diff = tl - ul
    n = 0
    if leading:
        start = 0
        while start <= diff and list(test[start:start + ul]) == list(unit):
            n += 1
            start += ul
        return n
    start = diff
    while start >= 0 and list(test[start:start + ul]) == list(unit):
        n += 1
        start -= ul
    return n


def find_tandem_repeat_units_ref(bases, offset, max_str=8, max_rl=20):
    L = len(bases)
    best_bw = [bases[offset]]
    max_bw = 0
    for s in range(1, max_str + 1):
        if offset + 1 - s < 0:
            break
        max_bw = find_number_of_repetitions_ref(
            bases[offset - s + 1:offset + 1], bases[:offset + 1], False)
        if max_bw > 1:
            best_bw = list(bases[offset - s + 1:offset + 1])
            break
    best = best_bw
    max_rl_v = max_bw
    if offset < L - 1:
        best_fw = [bases[offset + 1]]
        max_fw = 0
        for s in range(1, max_str + 1):
            if offset + s + 1 > L:
                break
            max_fw = find_number_of_repetitions_ref(
                bases[offset + 1:offset + 1 + s], bases[offset + 1:], True)
            if max_fw > 1:
                best_fw = list(bases[offset + 1:offset + 1 + s])
                break
        if list(best_fw) == list(best_bw):
            max_rl_v = max_fw + max_bw
        else:
            max_bw = find_number_of_repetitions_ref(
                best_fw, bases[:offset + 1], False)
            max_rl_v = max_fw + max_bw
        best = best_fw
    return min(max_rl_v, max_rl)


def apply_pcr_error_model_ref(bases, ins_quals, del_quals, cache):
    """In-place min() against the repeat-indexed cache
    (applyPCRErrorModel, .cpp:153-161)."""
    for i in range(1, len(bases)):
        rl = find_tandem_repeat_units_ref(bases, i - 1)
        ins_quals[i - 1] = min(ins_quals[i - 1], cache[rl])
        del_quals[i - 1] = min(del_quals[i - 1], cache[rl])
