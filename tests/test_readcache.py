"""Streaming ReadCache: BAI-windowed fetch parity, per-alignment-start
downsampling (reference read/ReadCache.{h,cpp}), and streamed-vs-in-memory
mutect equivalence."""

import numpy as np
import pytest

from fgdp_tpu.io import bam as bamio
from fgdp_tpu.sortdup import driver

HEADER = ["@HD\tVN:1.6\tSO:unsorted",
          "@SQ\tSN:chr1\tLN:60000",
          "@SQ\tSN:chr2\tLN:30000"]


def _rec(qname, flag, rname, pos, cigar="100M", mapq=60, seq=None,
         qual=None):
    seq = seq or "A" * 100
    qual = qual or "I" * 100
    return "\t".join([qname, str(flag), rname, str(pos), str(mapq),
                      cigar, "*", "0", "0", seq, qual])


@pytest.fixture(scope="module")
def indexed_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("readcache")
    rng = np.random.default_rng(7)
    lines = []
    for i in range(800):
        rname = "chr1" if rng.random() < 0.7 else "chr2"
        n = 59000 if rname == "chr1" else 29000
        pos = int(rng.integers(1, n - 200))
        cig = "100M" if rng.random() < 0.8 else "10S80M10S"
        lines.append(_rec(f"r{i}", 0 if rng.random() < 0.5 else 16,
                          rname, pos, cig))
    out = tmp / "in.bam"
    driver.sort_markdup(HEADER + lines, out)
    return out


def test_fetch_parity_vs_full_read(indexed_bam):
    """BamReader.fetch over random windows == full-decode + overlap scan."""
    _, names, lens, records = bamio.read_bam(indexed_bam)
    rdr = bamio.BamReader(str(indexed_bam))
    assert rdr.names == names and rdr.lens == lens
    rng = np.random.default_rng(11)
    for _ in range(20):
        rid = int(rng.integers(0, 2))
        n = lens[rid]
        beg = int(rng.integers(0, n - 1))
        end = int(rng.integers(beg + 1, min(beg + 20000, n) + 1))
        exp = []
        for r in records:
            if r["rid"] != rid:
                continue
            span = sum(ln for op, ln in r["cigar"]
                       if op in (0, 2, 3, 7, 8))
            if r["pos"] < end and r["pos"] + max(span, 1) > beg:
                exp.append(r)
        got = rdr.fetch(rid, beg, end)
        assert got == exp, (rid, beg, end, len(got), len(exp))
    # whole-contig fetch returns every record of that contig
    got = rdr.fetch(0, 0, lens[0])
    assert got == [r for r in records if r["rid"] == 0]
    rdr.close()


def test_downsample_per_alignment_start():
    """ReadCache.cpp:169-184: a group larger than the cap first keeps
    mapq > 50 reads, then randomly caps; small groups untouched."""
    from fgdp_tpu.call.readcache import downsample_reads

    reads = []
    # hot start: 30 reads at pos 100, 10 of them suspicious mapq
    for i in range(30):
        reads.append(dict(pos=100, mapq=20 if i < 10 else 60, id=i))
    # cold starts
    for i in range(5):
        reads.append(dict(pos=200 + i, mapq=10, id=100 + i))
    out = downsample_reads(reads, 15)
    hot = [r for r in out if r["pos"] == 100]
    cold = [r for r in out if r["pos"] != 100]
    assert len(hot) == 15
    assert all(r["mapq"] > 50 for r in hot)   # suspicious dropped first
    assert len(cold) == 5                     # below-cap groups untouched
    # cap larger than any group: no-op
    assert len(downsample_reads(reads, 100)) == len(reads)
    # disabled: no-op
    assert len(downsample_reads(reads, 0)) == len(reads)
    # deterministic for a fixed seed
    a = [r["id"] for r in downsample_reads(reads, 12, seed=3)]
    b = [r["id"] for r in downsample_reads(reads, 12, seed=3)]
    assert a == b


def test_mutect_streamed_matches_inmemory(tmp_path):
    """mutect via BAI-windowed streaming == whole-BAM in-memory path."""
    from fgdp_tpu import cli
    from fgdp_tpu.utils import dna

    rng = np.random.default_rng(19)
    ref_codes = rng.integers(0, 4, 3000).astype(np.uint8)
    fa = tmp_path / "ref.fa"
    s = dna.decode(ref_codes)
    with open(fa, "w") as f:
        f.write(">chrM\n")
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    # reads around a planted SNV at 1500
    alt_codes = ref_codes.copy()
    alt_codes[1500] = (alt_codes[1500] + 1) % 4
    lines = []
    L = 100
    for i in range(60):
        pos0 = 1500 - 20 - int(rng.integers(0, 60))
        src = alt_codes if i % 3 == 0 else ref_codes
        seq = dna.decode(src[pos0:pos0 + L])
        lines.append(_rec(f"m{i}", 0, "chrM", pos0 + 1, f"{L}M",
                          seq=seq))
    hdr = ["@HD\tVN:1.6\tSO:unsorted", "@SQ\tSN:chrM\tLN:3000"]
    bam = tmp_path / "t.bam"
    driver.sort_markdup(hdr + lines, bam)
    assert (tmp_path / "t.bam.bai").exists()

    vcf_s = tmp_path / "s.vcf"
    cli.main(["mutect", "-R", str(fa), "-I", str(bam), "-O", str(vcf_s)])

    # hide the index -> whole-BAM fallback
    (tmp_path / "t.bam.bai").rename(tmp_path / "hidden.bai")
    vcf_m = tmp_path / "m.vcf"
    cli.main(["mutect", "-R", str(fa), "-I", str(bam), "-O", str(vcf_m)])

    strip = lambda t: [ln for ln in t.splitlines()
                       if not ln.startswith("##fileDate")]
    assert strip(vcf_s.read_text()) == strip(vcf_m.read_text())
    body = [ln for ln in vcf_s.read_text().splitlines()
            if not ln.startswith("#")]
    assert any(ln.split("\t")[1] == "1501" for ln in body), body
