"""End-to-end single-end alignment on simulated reads: positions, strand,
CIGAR consistency, MD/NM sanity."""

import re

import numpy as np
import pytest

from fgdp_tpu.config import AlignConfig, BatchShapes
from fgdp_tpu.index.reference import PackedReference
from fgdp_tpu.pipeline import Aligner
from fgdp_tpu.utils import dna

SHAPES = BatchShapes(read_len=101, batch_reads=16, max_smems=96,
                     max_seeds=128, max_chains=16, max_regs=16,
                     max_ext_ref=304)


@pytest.fixture(scope="module")
def aligner():
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 4, 3000).astype(np.uint8),
            rng.integers(0, 4, 2000).astype(np.uint8)]
    pref = PackedReference.from_contigs(["chr1", "chr2"], seqs)
    return Aligner.build(pref, shapes=SHAPES)


def _simulate(rng, pref, n, L=101, sub=0.02, indel=0.002):
    reads, truth = [], []
    for i in range(n):
        cid = int(rng.integers(0, len(pref.names)))
        clen = int(pref.lens[cid])
        pos = int(rng.integers(0, clen - L))
        r = pref.codes[pref.offsets[cid] + pos:
                       pref.offsets[cid] + pos + L].astype(np.int64).copy()
        m = rng.random(L) < sub
        r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        rev = bool(rng.random() < 0.5)
        if rev:
            r = dna.revcomp(r.astype(np.uint8)).astype(np.int64)
        reads.append(r)
        truth.append((pref.names[cid], pos + 1, rev))
    return reads, truth


def _cigar_lens(cig):
    ops = re.findall(r"(\d+)([MIDSH])", cig)
    qlen = sum(int(n) for n, o in ops if o in "MIS")
    rlen = sum(int(n) for n, o in ops if o in "MD")
    return qlen, rlen


def test_e2e_positions(aligner):
    rng = np.random.default_rng(3)
    reads, truth = _simulate(rng, aligner.pref, 16)
    names = [f"r{i}" for i in range(len(reads))]
    lines = aligner.align_batch(names, reads)
    primary = {}
    for ln in lines:
        f = ln.split("\t")
        flag = int(f[1])
        if not (flag & 0x900):
            primary[f[0]] = f
    assert len(primary) == len(reads)
    n_ok = 0
    for i, (ctg, pos, rev) in enumerate(truth):
        f = primary[f"r{i}"]
        flag = int(f[1])
        assert not (flag & 0x4), f
        got_rev = bool(flag & 0x10)
        if f[2] == ctg and abs(int(f[3]) - pos) <= 5 and got_rev == rev:
            n_ok += 1
        # CIGAR consumes exactly the read
        qlen, _ = _cigar_lens(f[5])
        assert qlen == len(reads[i]), f
        assert int(f[4]) >= 0
        # MAPQ high for unique simulated reads
    assert n_ok >= len(reads) - 1, (n_ok, len(reads))


@pytest.mark.slow
def test_e2e_md_nm_consistency(aligner):
    """Recompute the alignment from MD/CIGAR and verify it reproduces the
    reference bases at the mapped locus."""
    rng = np.random.default_rng(4)
    reads, truth = _simulate(rng, aligner.pref, 8, sub=0.04)
    names = [f"q{i}" for i in range(len(reads))]
    lines = aligner.align_batch(names, reads)
    pref = aligner.pref
    for ln in lines:
        f = ln.split("\t")
        flag = int(f[1])
        if flag & 0x904:
            continue
        rid = pref.names.index(f[2])
        pos = int(f[3]) - 1
        ops = re.findall(r"(\d+)([MIDSH])", f[5])
        rlen = sum(int(n) for n, o in ops if o in "MD")
        tags = dict(t.split(":", 2)[::2] for t in f[11:])
        assert "NM" in tags and "MD" in tags
        # reconstruct reference span length from MD
        md = tags["MD"]
        md_rlen = sum(int(x) for x in re.findall(r"(\d+)", md)) + \
            len(re.findall(r"[ACGTN]", re.sub(r"\^[ACGTN]+", lambda m: m.group(0), md))) \
            - sum(len(m) - 1 for m in re.findall(r"\^([ACGTN]+)", md))
        assert md_rlen == rlen, (md, f[5])
        assert pos + rlen <= int(pref.lens[rid])


@pytest.mark.slow
def test_e2e_unmapped(aligner):
    rng = np.random.default_rng(5)
    junk = [rng.integers(0, 4, 101).astype(np.int64) for _ in range(2)]
    # random reads may align by chance at low score; just check output shape
    lines = aligner.align_batch(["u0", "u1"], junk)
    assert len(lines) >= 2
    for ln in lines:
        assert len(ln.split("\t")) >= 11


def test_overflow_propagates():
    """Seed- and chain-stage overflow flags must reach the final regs
    (they were silently dropped before round 4, so repeat-dense reads
    lost seeds without ever hitting the escalation ladder)."""
    import jax.numpy as jnp

    from fgdp_tpu.align import chain as chainmod
    from fgdp_tpu.align import extend as extendmod
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.ops.smem import SeedBatch

    rng = np.random.default_rng(0)
    pref = PackedReference.from_contigs(
        ["c"], [rng.integers(0, 4, 4000).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    opt = AlignConfig()
    B, L, S = 4, 64, 8
    codes = np.zeros((B, L), np.int32)
    for i in range(B):
        p = int(rng.integers(0, 4000 - L))
        codes[i] = pref.codes[p:p + L]
    lens = jnp.full(B, L, jnp.int32)
    # one valid seed per read (the read's true position), with the
    # seed-stage overflow flag set on read 2 only
    import jax
    sa_of = {int(fm.sa[i]): i for i in range(len(fm.sa))}
    seeds = SeedBatch(
        m=jnp.zeros((B, S), jnp.int32),
        n=jnp.full((B, S), L - 1, jnp.int32),
        k=jnp.zeros((B, S), jnp.int32),
        s=jnp.ones((B, S), jnp.int32),
        count=jnp.ones(B, jnp.int32),
        overflow=jnp.asarray([False, False, True, False]))
    cb = chainmod.chain_seeds(dfm, dref, seeds, lens, opt,
                              max_seedpos=16, max_chains=4,
                              use_pallas=False)
    assert bool(np.asarray(cb.overflow)[2])
    regs = extendmod.extend_chains(cb, jnp.asarray(codes), lens, dref,
                                   opt, max_regs=8, t_max=272)
    got = np.asarray(regs.overflow)
    assert bool(got[2])
    assert not bool(got[0]) and not bool(got[1]) and not bool(got[3])


def test_deferred_escalation_bookkeeping():
    """_DeferredEscalation.split/flush_one: overflowed rows leave the
    batch with their original global ids and fields intact; kept rows
    stay aligned with their names/seqs; flush chunks re-batch in FIFO
    order (pipeline_stream.py — the sort-bound stream's batched
    escalation; device launch stubbed out)."""
    from fgdp_tpu.pipeline_stream import _DeferredEscalation

    class StubAligner:
        class shapes:
            batch_reads = 4

        def _retry_overflow(self, regs_np, seqs):
            regs_np = dict(regs_np)
            regs_np["overflow"] = np.zeros(len(seqs), bool)
            return regs_np

    d = _DeferredEscalation(StubAligner())
    B, E = 6, 2
    ovf = np.array([False, True, False, True, True, False])
    regs = {"overflow": ovf,
            "score": np.arange(B * E).reshape(B, E),
            "frac_rep": np.linspace(0, 1, B, dtype=np.float32)}
    nm = [f"r{i}" for i in range(B)]
    sq = [np.full(5, i) for i in range(B)]
    kept = d.split(nm, sq, None, regs, 100)
    knm, ksq, kql, kregs, kids = kept
    assert knm == ["r0", "r2", "r5"]
    assert list(kids) == [100, 102, 105]
    assert kregs["score"].tolist() == [[0, 1], [4, 5], [10, 11]]
    assert len(d.rows) == 3 and [r[3] for r in d.rows] == [101, 103, 104]

    # second batch, all overflowed -> split returns None
    regs2 = {"overflow": np.ones(2, bool),
             "score": np.array([[90, 91], [92, 93]]),
             "frac_rep": np.zeros(2, np.float32)}
    assert d.split(["x0", "x1"], [np.zeros(5)] * 2, None, regs2, 200) \
        is None
    assert [r[3] for r in d.rows] == [101, 103, 104, 200, 201]

    fnm, fsq, fql, fregs, fids = d.flush_one(4)
    assert fnm == ["r1", "r3", "r4", "x0"]
    assert list(fids) == [101, 103, 104, 200]
    assert fregs["score"][0].tolist() == [2, 3]
    assert not fregs["overflow"].any()         # stub cleared the flags
    assert [r[3] for r in d.rows] == [201]


@pytest.mark.slow
def test_deferred_escalation_matches_sync(tmp_path):
    """stream_fastq_to_bam (SE) pools escalated reads and re-runs them
    in batched flush launches; the resulting BAM must be byte-identical
    to the synchronous-retry path (stream_mem SAM -> sort_markdup):
    deferred reads keep their original ids through the hash_64
    tie-breaks and the coordinate sort destroys stream order anyway."""
    from fgdp_tpu.cli import _read_batches
    from fgdp_tpu.pipeline_stream import stream_fastq_to_bam, stream_mem
    from fgdp_tpu.sortdup import driver as sddriver

    rng = np.random.default_rng(11)
    unit = rng.integers(0, 4, 160).astype(np.uint8)
    ref = np.concatenate([np.tile(unit, 12),
                          rng.integers(0, 4, 2000).astype(np.uint8)])
    pref = PackedReference.from_contigs(["cR"], [ref.astype(np.uint8)])
    L, B = 80, 16
    # transfer_regs=1 forces transfer overflow on the repeat-unit reads
    # (many alignment regions); uniques sail through untouched
    shapes = BatchShapes(read_len=L, batch_reads=B, max_smems=96,
                         max_seeds=128, max_chains=16, max_regs=16,
                         max_ext_ref=304, transfer_regs=1)
    aligner = Aligner.build(pref, shapes=shapes)
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(3 * B):
            if i % 3 == 0:
                p = int(rng.integers(0, 11 * len(unit)))
            else:
                p = int(rng.integers(12 * len(unit), len(ref) - L))
            f.write(f"@q{i}\n{dna.decode(ref[p:p + L])}\n+\n{'I' * L}\n")

    lines = []
    stream_mem(aligner, _read_batches([str(fq)], B), lines.append,
               paired=False)
    esc_sync = getattr(aligner, "esc_reads", 0)
    assert esc_sync > 0, "fixture must actually overflow"
    bam_a = tmp_path / "a.bam"
    sddriver.sort_markdup(list(aligner.sam_header()) + lines, bam_a)

    bam_b = tmp_path / "b.bam"
    n, (nrec, _) = stream_fastq_to_bam(
        aligner, _read_batches([str(fq)], B), str(bam_b), paired=False)
    assert n == 3 * B and nrec == len(lines)
    assert getattr(aligner, "esc_reads", 0) > esc_sync  # deferred ran
    assert bam_b.read_bytes() == bam_a.read_bytes()
