"""sormadup equivalent: SAM lines -> coordinate-sorted BAM + BAI with
duplicate flags (sortmardup/main.cpp pipeline, device sort + dup engine).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..io import bam as bamio
from ..io import bgzf
from ..io.sam import FDUP, FREVERSE, SamHeader, SamRecords, cigar_ref_len, \
    parse_sam_records
from . import engine


def _split_np(x):
    x = np.asarray(x, np.int64)
    return (x >> 30).astype(np.int32), (x & ((1 << 30) - 1)).astype(np.int32)


def find_duplicates(records: SamRecords, ref_len: int) -> set:
    """Device duplicate detection; returns set of duplicate pair_ids."""
    by_pid = {}
    for i in range(len(records)):
        pid = int(records.pair_id[i])
        if pid:
            by_pid.setdefault(pid, []).append(i)
    sgl, dbl = [], []
    for pid, idxs in by_pid.items():
        (sgl if len(idxs) == 1 else dbl).append((pid, idxs))

    def pow2(n):   # pad to a power of two to bound jit recompiles
        p = 1
        while p < n:
            p <<= 1
        return p

    ND, NS = pow2(max(len(dbl), 1)), pow2(max(len(sgl), 1))
    d = dict(p5a=np.zeros(ND, np.int64), orient=np.zeros(ND, np.int32),
             p5b=np.zeros(ND, np.int64), score=np.zeros(ND, np.int32),
             tile=np.zeros(ND, np.int32), x=np.zeros(ND, np.int32),
             y=np.zeros(ND, np.int32), pid=np.zeros(ND, np.int64),
             valid=np.zeros(ND, bool))
    for k, (pid, (i1, i2)) in enumerate(dbl):
        p1, p2 = int(records.prime5[i1]), int(records.prime5[i2])
        r1 = bool(records.flag[i1] & FREVERSE)
        r2 = bool(records.flag[i2] & FREVERSE)
        if p1 > p2:
            p1, p2, r1, r2 = p2, p1, r2, r1
        orient = (2 if r1 else 0) + (1 if r2 else 0)
        if p1 == p2 and orient == 2:
            orient = 1
        d["p5a"][k], d["orient"][k], d["p5b"][k] = p1, orient, p2
        d["score"][k] = int(records.score[i1]) + int(records.score[i2])
        d["tile"][k] = records.tile[i1]
        d["x"][k] = records.tx[i1]
        d["y"][k] = records.ty[i1]
        d["pid"][k] = pid
        d["valid"][k] = True
    s = dict(p5=np.zeros(NS, np.int64), rev=np.zeros(NS, np.int32),
             score=np.zeros(NS, np.int32), tile=np.zeros(NS, np.int32),
             x=np.zeros(NS, np.int32), y=np.zeros(NS, np.int32),
             pid=np.zeros(NS, np.int64), valid=np.zeros(NS, bool))
    for k, (pid, (i1,)) in enumerate(sgl):
        s["p5"][k] = int(records.prime5[i1])
        s["rev"][k] = 3 if (records.flag[i1] & FREVERSE) else 0
        s["score"][k] = records.score[i1]
        s["tile"][k] = records.tile[i1]
        s["x"][k] = records.tx[i1]
        s["y"][k] = records.ty[i1]
        s["pid"][k] = pid
        s["valid"][k] = True

    da_hi, da_lo = _split_np(d["p5a"])
    db_hi, db_lo = _split_np(d["p5b"])
    sp_hi, sp_lo = _split_np(s["p5"])
    rl_hi, rl_lo = _split_np(np.int64(ref_len))
    dup_dbl, dup_sgl = engine.mark_duplicates(
        jnp.asarray(da_hi), jnp.asarray(da_lo), jnp.asarray(d["orient"]),
        jnp.asarray(db_hi), jnp.asarray(db_lo), jnp.asarray(d["score"]),
        jnp.asarray(d["tile"]), jnp.asarray(d["x"]), jnp.asarray(d["y"]),
        jnp.asarray(d["valid"]),
        jnp.asarray(sp_hi), jnp.asarray(sp_lo), jnp.asarray(s["rev"]),
        jnp.asarray(s["score"]), jnp.asarray(s["tile"]), jnp.asarray(s["x"]),
        jnp.asarray(s["y"]), jnp.asarray(s["valid"]),
        jnp.int32(int(rl_hi)), jnp.int32(int(rl_lo)))
    dup_dbl = np.asarray(dup_dbl)
    dup_sgl = np.asarray(dup_sgl)
    dups = set()
    for k in range(len(dbl)):
        if dup_dbl[k]:
            dups.add(int(d["pid"][k]))
    for k in range(len(sgl)):
        if dup_sgl[k]:
            dups.add(int(s["pid"][k]))
    return dups


def sort_order(records: SamRecords) -> np.ndarray:
    n = len(records)
    np2 = 1
    while np2 < n:
        np2 <<= 1
    uc = np.zeros(np2, np.int64)
    uc[:n] = records.ucoord
    uc_hi, uc_lo = _split_np(uc)
    valid = np.zeros(np2, bool)
    valid[:n] = True
    order = np.asarray(engine.coordinate_sort_order(
        jnp.asarray(uc_hi), jnp.asarray(uc_lo), jnp.asarray(valid)))
    return order[:n]


def sort_markdup(sam_lines, out_bam_path, compress_level: int = 6):
    """Full sormadup: SAM text lines -> sorted BAM + .bai on disk.
    Returns (n_records, n_dup_pairs)."""
    header_lines = [ln for ln in sam_lines if ln.startswith("@")]
    body = [ln for ln in sam_lines if ln and not ln.startswith("@")]
    header = SamHeader.parse(header_lines)
    records = parse_sam_records(body, header)
    ref_len = int(header.ktable()[-1])

    dups = find_duplicates(records, ref_len) if len(records) else set()
    order = sort_order(records) if len(records) else np.zeros(0, np.int64)

    # sorted header
    htext = header.text.replace("SO:unsorted", "SO:coordinate")
    if "SO:coordinate" not in htext:
        htext = "@HD\tVN:1.6\tSO:coordinate\n" + htext
    payload = bytearray(bamio.bam_header_bytes(htext, header.names,
                                               header.lens))
    name_to_rid = {n: i for i, n in enumerate(header.names)}
    offsets = []   # (rid, pos, end, ustart, uend)
    for i in order:
        i = int(i)
        f = list(records.fields[i])
        flag = int(f[1])
        if int(records.pair_id[i]) in dups:
            flag |= FDUP
        rec = bamio.encode_record(f, name_to_rid, flag_override=flag)
        ustart = len(payload)
        payload += rec
        rlen = max(cigar_ref_len(records.cigars[i]), 1)
        offsets.append((int(records.rid[i]), int(records.pos[i]),
                        int(records.pos[i]) + rlen, ustart, len(payload)))

    comp, table = bgzf.compress_stream(bytes(payload), compress_level)
    with open(out_bam_path, "wb") as fo:
        fo.write(comp)
        fo.write(bgzf.EOF_BLOCK)

    vmap = bgzf.VirtualOffsetMap(table)
    bai = bamio.BaiBuilder(len(header.names))
    for rid, pos, end, ustart, uend in offsets:
        bai.add(rid, pos, end, vmap.voffset(ustart), vmap.voffset(uend))
    with open(str(out_bam_path) + ".bai", "wb") as fo:
        fo.write(bai.tobytes())
    return len(records), len(dups)
