"""sortmardup parity: duplicate marking vs scalar oracle; BAM round-trip."""

import numpy as np
import pytest

from fgdp_tpu.io import bam as bamio
from fgdp_tpu.io.sam import FDUP, SamHeader, parse_sam_records
from fgdp_tpu.sortdup import driver
from fgdp_tpu.testing import oracles

HEADER = ["@HD\tVN:1.6\tSO:unsorted",
          "@SQ\tSN:chr1\tLN:10000",
          "@SQ\tSN:chr2\tLN:5000"]


def _rec(qname, flag, rname, pos, cigar="100M", mapq=60, rnext="*",
         pnext=0, tlen=0, seq=None, qual=None):
    seq = seq or "A" * 100
    qual = qual or "I" * 100
    return "\t".join([qname, str(flag), rname, str(pos), str(mapq), cigar,
                      rnext, str(pnext), str(tlen), seq, qual])


def _random_sam(rng, n_pairs=200, n_singles=60):
    lines = []
    # paired reads clustered on few positions to force duplicates
    hot = [int(rng.integers(1, 9000)) for _ in range(max(n_pairs // 4, 1))]
    for i in range(n_pairs):
        pos1 = hot[int(rng.integers(0, len(hot)))] + int(rng.integers(0, 2))
        pos2 = pos1 + int(rng.integers(50, 300))
        tile, x, y = (int(rng.integers(1, 100)), int(rng.integers(1, 30000)),
                      int(rng.integers(1, 30000)))
        q = f"M1:5:FC:1:{tile}:{x}:{y}.{i}" if rng.random() < 0.2 else \
            f"M1:5:FC:1:{tile}:{x}:{y}"
        q = f"p{i}:M1:5:FC:1:{tile}:{x}:{y}"[:0] or f"M1:{i}:FC:1:{tile}:{x}:{y}"
        qual = "".join(chr(33 + int(rng.integers(2, 41))) for _ in range(100))
        cig1 = "100M" if rng.random() < 0.7 else "5S95M"
        cig2 = "100M" if rng.random() < 0.7 else "90M10S"
        lines.append(_rec(q, 0x63, "chr1", pos1, cig1, rnext="=",
                          pnext=pos2, tlen=pos2 - pos1 + 100, qual=qual))
        lines.append(_rec(q, 0x93, "chr1", pos2, cig2, rnext="=",
                          pnext=pos1, tlen=-(pos2 - pos1 + 100), qual=qual))
    for i in range(n_singles):
        pos = hot[int(rng.integers(0, len(hot)))]
        flag = 0 if rng.random() < 0.5 else 0x10
        q = f"S1:{i}:FC:1:{int(rng.integers(1, 90))}:{i+1}:{i+2}"
        qual = "".join(chr(33 + int(rng.integers(2, 41))) for _ in range(100))
        on_chr2 = rng.random() < 0.3
        lines.append(_rec(q, flag, "chr2" if on_chr2 else "chr1",
                          min(pos, 4800) if on_chr2 else pos, qual=qual))
    # some ignorables
    lines.append(_rec("U1:0:FC:1:9:9:9", 0x4, "*", 0, "*"))
    lines.append(_rec("M1:0:FC:1:9:9:9", 0x100, "chr1", 100))
    return lines


def test_dup_parity(rng):
    lines = _random_sam(rng)
    header = SamHeader.parse(HEADER)
    recs = parse_sam_records(lines, header)
    ref_len = int(header.ktable()[-1])
    got = driver.find_duplicates(recs, ref_len)
    exp = oracles.mark_duplicates_ref(recs, ref_len)
    assert got == exp
    assert len(exp) > 0   # the clustered sim must produce duplicates


def test_sorted_bam_roundtrip(rng, tmp_path):
    lines = _random_sam(rng, n_pairs=60, n_singles=20)
    out = tmp_path / "out.bam"
    n, ndup = driver.sort_markdup(HEADER + lines, out)
    assert n == len(lines)
    text, names, lens, records = bamio.read_bam(out)
    assert names == ["chr1", "chr2"]
    assert lens == [10000, 5000]
    assert len(records) == len(lines)
    # coordinate order
    keys = [(r["rid"] if r["rid"] >= 0 else 1 << 30, r["pos"])
            for r in records]
    assert keys == sorted(keys)
    # dup flags match the oracle
    header = SamHeader.parse(HEADER)
    recs = parse_sam_records(lines, header)
    exp = oracles.mark_duplicates_ref(recs, int(header.ktable()[-1]))
    pid_of = {}
    for i in range(len(recs)):
        pid_of[(recs.qname[i], int(recs.flag[i]))] = int(recs.pair_id[i])
    for r in records:
        pid = pid_of.get((r["qname"], r["flag"] & ~FDUP), 0)
        assert bool(r["flag"] & FDUP) == (pid in exp), r["qname"]
    # index exists and parses
    bai = (str(out) + ".bai")
    with open(bai, "rb") as f:
        assert f.read(4) == b"BAI\1"


def test_bgzf_roundtrip(rng):
    from fgdp_tpu.io import bgzf
    data = rng.integers(0, 256, 300000).astype(np.uint8).tobytes()
    comp, table = bgzf.compress_stream(data)
    assert bgzf.decompress(comp) == data
    assert len(table) == -(-len(data) // bgzf.MAX_BLOCK)


def test_native_python_bam_identical(rng, tmp_path):
    """The native C fast path and the pure-Python fallback must produce
    byte-identical BAM + BAI (same records, flags, tags, index)."""
    from fgdp_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    lines = HEADER + _random_sam(rng, n_pairs=40, n_singles=15)
    b1 = tmp_path / "native.bam"
    b2 = tmp_path / "python.bam"
    n1 = driver.sort_markdup(lines, b1)
    orig = native.parse_sam_numeric
    native.parse_sam_numeric = lambda *a, **k: None
    try:
        n2 = driver.sort_markdup(lines, b2)
    finally:
        native.parse_sam_numeric = orig
    assert n1 == n2
    assert n1[1] > 0          # duplicates present
    assert b1.read_bytes() == b2.read_bytes()
    assert (tmp_path / "native.bam.bai").read_bytes() == \
        (tmp_path / "python.bam.bai").read_bytes()


def test_sort_markdup_file_streaming(rng, tmp_path):
    """mmap-backed file path == in-memory path, byte for byte, including
    multi-batch pass-2 (small batch_records forces several batches)."""
    from fgdp_tpu.io import native
    from fgdp_tpu.io.sam import SamHeader
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    lines = HEADER + _random_sam(rng, n_pairs=50, n_singles=10)
    sam = tmp_path / "in.sam"
    sam.write_text("\n".join(lines) + "\n")
    b1 = tmp_path / "stream.bam"
    b2 = tmp_path / "mem.bam"
    n1 = driver.sort_markdup_file(sam, b1)
    n2 = driver.sort_markdup(lines, b2)
    assert n1 == n2
    assert b1.read_bytes() == b2.read_bytes()
    assert (tmp_path / "stream.bam.bai").read_bytes() == \
        (tmp_path / "mem.bam.bai").read_bytes()
    # multi-batch: force 4 batches through the same pipeline
    import mmap
    with open(sam, "rb") as f:
        hdr_lines = []
        while True:
            ln = f.readline()
            if not ln.startswith(b"@"):
                break
            hdr_lines.append(ln.decode().rstrip("\n"))
        header = SamHeader.parse(hdr_lines)
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_COPY) as mm:
            b3 = tmp_path / "batched.bam"
            driver._sort_markdup_native(mm, header, b3, 6,
                                        batch_records=40)
    # batch boundaries change BGZF block layout (and hence voffsets);
    # the decoded content must be identical
    assert bamio.read_bam(b3) == bamio.read_bam(b2)


def test_sormadup_stdin_pipe(tmp_path):
    """`sormadup -` ingests piped SAM (the reference's stdin path,
    sortmardup/main.cpp:84-91) — run as a real subprocess pipe."""
    import os
    import subprocess
    import sys

    from fgdp_tpu.io import bam as bamio

    sam = "\n".join([
        "@HD\tVN:1.6",
        "@SQ\tSN:c1\tLN:1000",
        "r1\t99\tc1\t100\t60\t50M\t=\t200\t150\tACGTA\tIIIII",
        "r1\t147\tc1\t200\t60\t50M\t=\t100\t-150\tACGTA\tIIIII",
        "r2\t99\tc1\t100\t60\t50M\t=\t200\t150\tACGTA\tIIIII",
        "r2\t147\tc1\t200\t60\t50M\t=\t100\t-150\tACGTA\tIIIII",
        "r3\t0\tc1\t300\t60\t50M\t*\t0\t0\tACGTA\tIIIII",
    ]) + "\n"
    out = tmp_path / "o.bam"
    # drop the axon sitecustomize (PYTHONPATH) so the subprocess cannot
    # touch the TPU relay; force the CPU backend
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "fgdp_tpu", "sormadup", "-", str(out)],
        input=sam.encode(), env=env, capture_output=True, timeout=300)
    assert res.returncode == 0, res.stderr.decode()[-500:]
    _, names, lens, records = bamio.read_bam(out)
    assert names == ["c1"] and len(records) == 5
    # one of the two identical pairs is duplicate-flagged
    dups = [r for r in records if r["flag"] & 0x400]
    assert len(dups) == 2 and (out.parent / "o.bam.bai").exists()


def test_bam_is_standard_bgzf_gzip(tmp_path):
    """The BAM container must be standard: Python's gzip module (an
    independent DEFLATE implementation) decodes BGZF members, the BAM
    magic + header parse, and the BAI starts with its magic."""
    import gzip
    import struct

    from fgdp_tpu.sortdup.driver import sort_markdup

    sam = [
        "@HD\tVN:1.6",
        "@SQ\tSN:c1\tLN:1000",
        "r1\t0\tc1\t100\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
        "r2\t16\tc1\t50\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
    ]
    out = tmp_path / "x.bam"
    n, _ = sort_markdup(sam, str(out))
    assert n == 2
    raw = gzip.decompress(out.read_bytes())   # multi-member stream
    assert raw[:4] == b"BAM\x01"
    l_text = struct.unpack("<i", raw[4:8])[0]
    off = 8 + l_text
    n_ref = struct.unpack("<i", raw[off:off + 4])[0]
    assert n_ref == 1
    bai = (tmp_path / "x.bam.bai").read_bytes()
    assert bai[:4] == b"BAI\x01"
    # records sorted by coordinate: first block_size then refID/pos
    off += 4
    l_name = struct.unpack("<i", raw[off:off + 4])[0]
    off += 4 + l_name + 4                      # name + l_ref
    first_pos = struct.unpack("<i", raw[off + 8:off + 12])[0]
    assert first_pos == 49                     # r2 at 0-based 49 first


def test_header_so_rewrite_no_duplicate_hd():
    from fgdp_tpu.io.sam import SamHeader
    from fgdp_tpu.sortdup.driver import _sorted_header_bytes
    import struct

    for hd in ("@HD\tVN:1.6\tSO:queryname", "@HD\tVN:1.6", None):
        lines = ([hd] if hd else []) + ["@SQ\tSN:c1\tLN:100"]
        hb = _sorted_header_bytes(SamHeader.parse(lines))
        l_text = struct.unpack("<i", hb[4:8])[0]
        text = hb[8:8 + l_text].decode()
        assert text.count("@HD") == 1, text
        assert "SO:coordinate" in text
        assert "SO:queryname" not in text


def test_uint32_tag_roundtrip(tmp_path):
    from fgdp_tpu.io import native
    from fgdp_tpu.sortdup.driver import sort_markdup

    sam = ["@HD\tVN:1.6", "@SQ\tSN:c1\tLN:1000",
           "r1\t0\tc1\t100\t60\t5M\t*\t0\t0\tACGTA\tIIIII\tXX:i:4294967295"]
    out = tmp_path / "u.bam"
    # force the pure-Python encoder (the finding's crash path)
    orig = native.parse_sam_numeric
    native.parse_sam_numeric = lambda *a, **k: None
    try:
        n, _ = sort_markdup(sam, str(out))
    finally:
        native.parse_sam_numeric = orig
    assert n == 1
    _, _, _, recs = bamio.read_bam(out)
    assert b"XXI" in recs[0]["tags"]


def test_bai_metadata_pseudobin(tmp_path):
    """BAI pseudo-bin 37450 (idxstats source): mapped counts per ref."""
    import struct

    from fgdp_tpu.sortdup.driver import sort_markdup

    sam = ["@HD\tVN:1.6", "@SQ\tSN:c1\tLN:100000",
           "r1\t0\tc1\t100\t60\t5M\t*\t0\t0\tACGTA\tIIIII",
           "r2\t0\tc1\t50000\t60\t5M\t*\t0\t0\tACGTA\tIIIII"]
    out = tmp_path / "m.bam"
    sort_markdup(sam, str(out))
    bai = (tmp_path / "m.bam.bai").read_bytes()
    assert bai[:4] == b"BAI\x01"
    off = 8
    n_bin = struct.unpack("<i", bai[off:off + 4])[0]
    off += 4
    found = None
    for _ in range(n_bin):
        b, n_chunk = struct.unpack("<Ii", bai[off:off + 8])
        off += 8
        chunks = [struct.unpack("<QQ", bai[off + 16 * c:off + 16 * c + 16])
                  for c in range(n_chunk)]
        off += 16 * n_chunk
        if b == 37450:
            found = chunks
    assert found is not None and len(found) == 2
    assert found[1][0] == 2          # n_mapped
    assert found[1][1] == 0          # n_unmapped


def test_bai_add_batch_matches_scalar(rng):
    """BaiBuilder.add_batch == per-record add() byte-for-byte."""
    from fgdp_tpu.io.bam import BaiBuilder

    n = 3000
    rids = rng.integers(-1, 3, n).astype(np.int64)
    begs = np.sort(rng.integers(0, 1 << 22, n)).astype(np.int64)
    lens_ = rng.integers(50, 50_000, n)
    ends = begs + lens_
    voffs = np.sort(rng.integers(0, 1 << 40, n + 1).astype(np.uint64))
    a = BaiBuilder(3)
    b = BaiBuilder(3)
    # coordinate order per rid (the callers' contract): sort by (rid, beg)
    order = np.lexsort((begs, rids))
    rids, begs, ends = rids[order], begs[order], ends[order]
    vb, ve = voffs[:-1], voffs[1:]
    for i in range(n):
        a.add(int(rids[i]), int(begs[i]), int(ends[i]),
              int(vb[i]), int(ve[i]))
    b.add_batch(rids, begs, ends, vb, ve)
    assert a.tobytes() == b.tobytes()
