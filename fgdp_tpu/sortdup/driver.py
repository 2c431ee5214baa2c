"""sormadup equivalent: SAM lines -> coordinate-sorted BAM + BAI with
duplicate flags (sortmardup/main.cpp pipeline, device sort + dup engine).

Fast path: the native C parser extracts the numeric duplicate-key fields
and assigns pairIDs (io/native.py -> native/fgdp_native.cc), duplicate
marking + the coordinate sort run on device, and the native encoder
emits raw BAM records in sorted order — the Python layer only glues
arrays. A pure-Python fallback covers environments without a toolchain.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..io import bam as bamio
from ..io import bgzf
from ..io import native
from ..io.sam import FDUP, FREVERSE, SamHeader, SamRecords, cigar_ref_len, \
    parse_sam_records
from . import engine


def _split_np(x):
    x = np.asarray(x, np.int64)
    return ((x >> engine._LO_BITS).astype(np.int32),
            (x & engine._LO_MASK).astype(np.int32))


def _pow2(n):   # pad to a power of two to bound jit recompiles
    p = 1
    while p < n:
        p <<= 1
    return p


def _dup_pids(prime5, flag, score, tile, tx, ty, pair_id, ref_len):
    """Device duplicate detection over numeric record arrays; returns the
    np.int64 array of duplicate pair_ids (main.cpp:249-341 semantics)."""
    vidx = np.nonzero(np.asarray(pair_id) > 0)[0]
    if len(vidx) == 0:
        return np.zeros(0, np.int64)
    pid = np.asarray(pair_id)[vidx]
    ids, inv, cnt = np.unique(pid, return_inverse=True, return_counts=True)
    order = np.argsort(inv, kind="stable")
    starts = np.zeros(len(ids), np.int64)
    starts[1:] = np.cumsum(cnt)[:-1]
    dbl = cnt >= 2
    sgl = cnt == 1
    d_i1 = vidx[order[starts[dbl]]]
    d_i2 = vidx[order[starts[dbl] + 1]]
    s_i = vidx[order[starts[sgl]]]

    ND, NS = _pow2(max(len(d_i1), 1)), _pow2(max(len(s_i), 1))
    p1 = prime5[d_i1]
    p2 = prime5[d_i2]
    r1 = (flag[d_i1] & FREVERSE) != 0
    r2 = (flag[d_i2] & FREVERSE) != 0
    swap = p1 > p2
    p1s = np.where(swap, p2, p1)
    p2s = np.where(swap, p1, p2)
    r1s = np.where(swap, r2, r1)
    r2s = np.where(swap, r1, r2)
    orient = 2 * r1s.astype(np.int32) + r2s.astype(np.int32)
    orient = np.where((p1s == p2s) & (orient == 2), 1, orient)

    def pad(a, N, dt):
        out = np.zeros(N, dt)
        out[:len(a)] = a
        return out

    d_p5a = pad(p1s, ND, np.int64)
    d_orient = pad(orient, ND, np.int32)
    d_p5b = pad(p2s, ND, np.int64)
    d_score = pad(score[d_i1].astype(np.int64) + score[d_i2], ND, np.int32)
    d_tile = pad(tile[d_i1], ND, np.int32)
    d_x = pad(tx[d_i1], ND, np.int32)
    d_y = pad(ty[d_i1], ND, np.int32)
    d_valid = np.zeros(ND, bool)
    d_valid[:len(d_i1)] = True

    s_p5 = pad(prime5[s_i], NS, np.int64)
    s_rev = pad(np.where((flag[s_i] & FREVERSE) != 0, 3, 0), NS, np.int32)
    s_score = pad(score[s_i], NS, np.int32)
    s_tile = pad(tile[s_i], NS, np.int32)
    s_x = pad(tx[s_i], NS, np.int32)
    s_y = pad(ty[s_i], NS, np.int32)
    s_valid = np.zeros(NS, bool)
    s_valid[:len(s_i)] = True

    da_hi, da_lo = _split_np(d_p5a)
    db_hi, db_lo = _split_np(d_p5b)
    sp_hi, sp_lo = _split_np(s_p5)
    rl_hi, rl_lo = _split_np(np.int64(ref_len))
    dup_dbl, dup_sgl = engine.mark_duplicates(
        jnp.asarray(da_hi), jnp.asarray(da_lo), jnp.asarray(d_orient),
        jnp.asarray(db_hi), jnp.asarray(db_lo), jnp.asarray(d_score),
        jnp.asarray(d_tile), jnp.asarray(d_x), jnp.asarray(d_y),
        jnp.asarray(d_valid),
        jnp.asarray(sp_hi), jnp.asarray(sp_lo), jnp.asarray(s_rev),
        jnp.asarray(s_score), jnp.asarray(s_tile), jnp.asarray(s_x),
        jnp.asarray(s_y), jnp.asarray(s_valid),
        jnp.int32(int(rl_hi)), jnp.int32(int(rl_lo)))
    dup_dbl = np.asarray(dup_dbl)[:len(d_i1)]
    dup_sgl = np.asarray(dup_sgl)[:len(s_i)]
    return np.concatenate([
        np.asarray(pair_id)[d_i1[dup_dbl]],
        np.asarray(pair_id)[s_i[dup_sgl]]]).astype(np.int64)


def find_duplicates(records: SamRecords, ref_len: int) -> set:
    """Device duplicate detection; returns set of duplicate pair_ids."""
    return set(_dup_pids(records.prime5, np.asarray(records.flag),
                         np.asarray(records.score), np.asarray(records.tile),
                         np.asarray(records.tx), np.asarray(records.ty),
                         records.pair_id, ref_len).tolist())


def _sort_order_np(ucoord: np.ndarray) -> np.ndarray:
    n = len(ucoord)
    np2 = _pow2(max(n, 1))
    uc = np.zeros(np2, np.int64)
    uc[:n] = ucoord
    uc_hi, uc_lo = _split_np(uc)
    valid = np.zeros(np2, bool)
    valid[:n] = True
    order = np.asarray(engine.coordinate_sort_order(
        jnp.asarray(uc_hi), jnp.asarray(uc_lo), jnp.asarray(valid)))
    return order[:n]


def sort_order(records: SamRecords) -> np.ndarray:
    return _sort_order_np(np.asarray(records.ucoord))


def _sorted_header_bytes(header: SamHeader):
    """Set SO:coordinate on the existing @HD (never add a second @HD)."""
    import re

    lines = header.text.splitlines()
    had_hd = False
    for i, ln in enumerate(lines):
        if ln.startswith("@HD"):
            had_hd = True
            if "SO:" in ln:
                lines[i] = re.sub(r"SO:\S+", "SO:coordinate", ln)
            else:
                lines[i] = ln + "\tSO:coordinate"
            break
    if not had_hd:
        lines.insert(0, "@HD\tVN:1.6\tSO:coordinate")
    htext = "\n".join(lines) + "\n"
    return bamio.bam_header_bytes(htext, header.names, header.lens)


def _write_bam(payload: bytes, offsets, out_bam_path, n_ref: int,
               compress_level: int):
    """BGZF-compress payload and build the BAI from (rid, pos, end,
    ustart, uend) record offsets."""
    comp, table = bgzf.compress_stream(payload, compress_level)
    with open(out_bam_path, "wb") as fo:
        fo.write(comp)
        fo.write(bgzf.EOF_BLOCK)
    vmap = bgzf.VirtualOffsetMap(table)
    bai = bamio.BaiBuilder(n_ref)
    for rid, pos, end, ustart, uend in offsets:
        bai.add(rid, pos, end, vmap.voffset(ustart), vmap.voffset(uend))
    with open(str(out_bam_path) + ".bai", "wb") as fo:
        fo.write(bai.tobytes())


def _sort_markdup_native(data, header: SamHeader, out_bam_path,
                         compress_level: int, batch_records: int = 200_000):
    """Native fast path; returns (n_records, n_dups) or None if the
    native library is unavailable.

    `data` may be bytes or an mmap — pass 1 extracts only the numeric
    key arrays (~100 B/record resident), pass 2 re-reads the mapped text
    in sorted batches and streams BGZF blocks to disk, so inputs larger
    than RAM sort within key-array memory (the role of the reference's
    LZ4 spill files, sortmardup/tbb/BAMRecordBuffer.cpp, is played by
    the page cache)."""
    if isinstance(data, (bytes, bytearray)):
        buf = data
    else:
        import ctypes
        buf = (ctypes.c_char * len(data)).from_buffer(data)
    max_recs = _count_lines(data) + 1
    parsed = native.parse_sam_numeric(buf, max_recs)
    if parsed is None:
        return None
    rp = native.assign_rid_pairid(buf, parsed, header.names)
    if rp is None:
        return None
    rid, pair_id = rp
    return _native_pass2(buf, parsed, rid, pair_id, header, out_bam_path,
                         compress_level, batch_records)


def _native_pass2(buf, parsed, rid, pair_id, header: SamHeader,
                  out_bam_path, compress_level: int,
                  batch_records: int = 200_000):
    """Dup detection + coordinate sort + sorted-batch encode/BGZF/BAI
    over already-parsed numeric arrays (offsets index into `buf`)."""
    n = len(rid)
    kt = header.ktable()
    ref_len = int(kt[-1])
    pos0 = parsed["pos"] - 1
    ucoord = np.where(rid >= 0, kt[np.maximum(rid, 0)] + pos0, ref_len)
    rev = (parsed["flag"] & FREVERSE) != 0
    has_cig = parsed["ref_len"] > 0
    prime5 = np.where(
        rev & has_cig,
        ucoord + parsed["ref_len"] + parsed["tail_clip"] - 1,
        ucoord - np.where(~rev, parsed["lead_clip"], 0))

    from ..utils.profiling import PROF
    with PROF.phase("SD_DUPSCAN"):
        dup_pids = _dup_pids(prime5, parsed["flag"], parsed["score"],
                             parsed["tile"], parsed["tx"], parsed["ty"],
                             pair_id, ref_len) if n \
            else np.zeros(0, np.int64)
        is_dup = np.isin(pair_id, dup_pids) if n else np.zeros(0, bool)
    with PROF.phase("SD_SORT"):
        order = _sort_order_np(ucoord) if n else np.zeros(0, np.int64)
    flags_out = np.where(is_dup, parsed["flag"] | FDUP,
                         parsed["flag"]).astype(np.int32)

    # pass 2: encode + compress + index in sorted batches
    hdr = _sorted_header_bytes(header)
    bai = bamio.BaiBuilder(len(header.names))
    u_off = 0     # uncompressed stream offset
    c_off = 0     # compressed stream offset
    with open(out_bam_path, "wb") as fo:
        pending = hdr
        for lo in range(0, max(n, 1), batch_records):
            sel = order[lo:lo + batch_records]
            with PROF.phase("SD_ENCODE"):
                if len(sel):
                    enc = native.encode_bam_records(
                        buf, parsed["line_start"][sel],
                        parsed["line_end"][sel], flags_out[sel],
                        header.names)
                    if enc is None:
                        return None
                    recs, rec_off, erid, epos, erlen = enc
                else:
                    recs, rec_off, erid = b"", np.zeros(1, np.int64), []
            payload = pending + recs
            base = u_off + len(pending)
            with PROF.phase("SD_BGZF"):
                comp, table = bgzf.compress_stream(payload,
                                                   compress_level)
            with PROF.phase("SD_BAI"):
                vmap = bgzf.VirtualOffsetMap(
                    [(u + u_off, c, ul) for (u, c, ul) in table],
                    base_coff=c_off)
                voffs = vmap.voffsets(base +
                                      np.asarray(rec_off, np.int64))
                if len(erid):
                    erid = np.asarray(erid, np.int64)
                    epos = np.asarray(epos, np.int64)
                    erlen = np.asarray(erlen, np.int64)
                    bai.add_batch(erid, epos, epos + erlen,
                                  voffs[:-1], voffs[1:])
            fo.write(comp)
            u_off += len(payload)
            c_off += len(comp)
            pending = b""
        fo.write(bgzf.EOF_BLOCK)
    with open(str(out_bam_path) + ".bai", "wb") as fo:
        fo.write(bai.tobytes())
    return n, len(dup_pids)


def _count_lines(data) -> int:
    if isinstance(data, (bytes, bytearray)):
        return data.count(b"\n")
    n = 0
    CH = 1 << 24
    for i in range(0, len(data), CH):
        n += data[i:i + CH].count(b"\n")
    return n


def sort_markdup_file(path, out_bam_path, compress_level: int = 6):
    """Streaming sormadup over a SAM file on disk (mmap-backed)."""
    import mmap

    with open(path, "rb") as f:
        header_lines = []
        while True:
            ln = f.readline()
            if not ln.startswith(b"@"):
                break
            header_lines.append(ln.decode().rstrip("\n"))
        header = SamHeader.parse(header_lines)
        # ACCESS_COPY: ctypes.from_buffer needs a writable view; pages
        # stay file-backed copy-on-write and are never written
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_COPY) as mm:
            res = _sort_markdup_native(mm, header, out_bam_path,
                                       compress_level)
            if res is not None:
                return res
            data = bytes(mm)
    return sort_markdup(data.decode(errors="replace").splitlines(),
                        out_bam_path, compress_level)


def sort_markdup(sam_lines, out_bam_path, compress_level: int = 6):
    """Full sormadup: SAM text lines -> sorted BAM + .bai on disk.
    Returns (n_records, n_dup_pairs)."""
    header_lines = [ln for ln in sam_lines if ln.startswith("@")]
    header = SamHeader.parse(header_lines)

    data = "\n".join(ln.rstrip("\n") for ln in sam_lines).encode() + b"\n"
    res = _sort_markdup_native(data, header, out_bam_path, compress_level)
    if res is not None:
        return res

    # ---- pure-Python fallback ----
    body = [ln for ln in sam_lines if ln and not ln.startswith("@")]
    records = parse_sam_records(body, header)
    ref_len = int(header.ktable()[-1])

    dups = find_duplicates(records, ref_len) if len(records) else set()
    order = sort_order(records) if len(records) else np.zeros(0, np.int64)

    payload = bytearray(_sorted_header_bytes(header))
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

    _write_bam(bytes(payload), offsets, out_bam_path, len(header.names),
               compress_level)
    return len(records), len(dups)
