"""CLI end-to-end: index -> mem (PE) -> sormadup -> mutect on tiny data."""

import numpy as np
import pytest

from fgdp_tpu import cli
from fgdp_tpu.utils import dna

BASES = "ACGT"


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(23)
    ref_codes = rng.integers(0, 4, 4000).astype(np.uint8)
    fa = tmp / "ref.fa"
    with open(fa, "w") as f:
        f.write(">chrT\n")
        s = dna.decode(ref_codes)
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    # simulate FR pairs
    r1p, r2p = tmp / "r1.fq", tmp / "r2.fq"
    L, iz = 100, 280
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        for i in range(40):
            pos = int(rng.integers(0, 4000 - iz - 1))
            s1 = ref_codes[pos:pos + L].copy()
            s2 = dna.revcomp(ref_codes[pos + iz - L:pos + iz])
            if i < 20 and pos + 40 < 4000:   # plant a SNV in half the reads
                pass
            q = "I" * L
            f1.write(f"@M1:{i}:FC:1:1:{i+1}:{i+2}\n{dna.decode(s1)}\n+\n{q}\n")
            f2.write(f"@M1:{i}:FC:1:1:{i+1}:{i+2}\n{dna.decode(s2)}\n+\n{q}\n")
    return tmp, fa, r1p, r2p, ref_codes


@pytest.mark.slow
def test_cli_full_pipeline(tiny_world):
    tmp, fa, r1p, r2p, ref_codes = tiny_world
    prefix = str(tmp / "idx")
    cli.main(["index", str(fa), prefix])
    sam = tmp / "out.sam"
    cli.main(["mem", prefix, str(r1p), str(r2p), "-o", str(sam),
              "-b", "96"])
    lines = sam.read_text().splitlines()
    body = [ln for ln in lines if not ln.startswith("@")]
    assert len(body) >= 80
    mapped = [ln for ln in body if not (int(ln.split("\t")[1]) & 0x4)]
    assert len(mapped) >= 78

    bam = tmp / "out.bam"
    cli.main(["sormadup", str(sam), str(bam)])
    from fgdp_tpu.io import bam as bamio
    _, names, lens, records = bamio.read_bam(bam)
    assert names == ["chrT"]
    assert len(records) == len(body)

    vcf = tmp / "out.vcf"
    cli.main(["mutect", "-R", str(fa), "-I", str(bam), "-O", str(vcf)])
    assert vcf.read_text().startswith("##fileformat")

    # streamed pipeline (stage overlap) must produce the identical BAM,
    # and its --vcf chain must match the standalone mutect output
    bam2 = tmp / "out2.bam"
    vcf2 = tmp / "out2.vcf"
    cli.main(["pipeline", prefix, str(r1p), str(r2p), "-O", str(bam2),
              "-b", "96", "--vcf", str(vcf2), "-R", str(fa)])
    assert bam2.read_bytes() == bam.read_bytes()
    assert (tmp / "out2.bam.bai").read_bytes() == \
        (tmp / "out.bam.bai").read_bytes()
    strip = lambda t: [ln for ln in t.splitlines()
                       if not ln.startswith("##fileDate")]
    assert strip(vcf2.read_text()) == strip(vcf.read_text())


@pytest.mark.slow
def test_pipeline_pooled_identical(tiny_world):
    """pipeline -t N (pooled finalize + streaming sortdup) must produce
    the identical BAM to the in-process pipeline."""
    tmp, fa, r1p, r2p, ref_codes = tiny_world
    import os
    prefix = str(tmp / "idx")
    if not os.path.exists(prefix + ".ref.npz"):
        cli.main(["index", str(fa), prefix])
    a = tmp / "pl_a.bam"
    b = tmp / "pl_b.bam"
    cli.main(["pipeline", prefix, str(r1p), str(r2p), "-O", str(a),
              "-b", "96"])
    cli.main(["pipeline", prefix, str(r1p), str(r2p), "-O", str(b),
              "-b", "96", "-t", "2"])
    assert a.read_bytes() == b.read_bytes()


def test_mem_opt_flags_and_profiles():
    """mem_opt_t CLI surface: explicit flags override -x profiles
    (fastmap.cpp:656-860 opt0 semantics)."""
    import argparse

    from fgdp_tpu.cli import _mem_opt

    def parse(extra):
        p = argparse.ArgumentParser()
        from fgdp_tpu import cli as c
        ns = argparse.Namespace(
            k=None, w=None, A=None, B=None, O=None, E=None, L=None,
            T=None, d=None, r=None, c=None, y=None, D=None, m=None,
            U=None, K=None, h0=None, read_type=None, rg=None,
            all_alignments=False)
        ns.__dict__.update(extra)
        return ns

    o = _mem_opt(parse({}))
    assert (o.min_seed_len, o.b, o.o_del) == (19, 4, 6)
    o = _mem_opt(parse({"read_type": "pacbio"}))
    assert (o.min_seed_len, o.b, o.o_del, o.e_del) == (17, 1, 1, 1)
    assert o.split_factor == 10.0 and o.min_chain_weight == 40
    o = _mem_opt(parse({"read_type": "ont2d"}))
    assert o.min_seed_len == 14 and o.min_chain_weight == 20
    # explicit flag beats the profile
    o = _mem_opt(parse({"read_type": "pacbio", "k": 25, "B": 7}))
    assert o.min_seed_len == 25 and o.b == 7
    o = _mem_opt(parse({"read_type": "intractg"}))
    assert (o.b, o.o_del, o.pen_clip5) == (9, 16, 5)
    o = _mem_opt(parse({"O": 10, "L": 3, "T": 40}))
    assert (o.o_del, o.o_ins, o.pen_clip5, o.pen_clip3, o.T) == \
        (10, 10, 3, 3, 40)


@pytest.mark.slow
def test_mem_finalize_workers_identical(tiny_world):
    """-t N (worker_sam pool analogue): pooled finalize output is
    line-identical to the in-process path (single-end)."""
    tmp, fa, r1p, r2p, ref_codes = tiny_world
    prefix = str(tmp / "idx")          # built by the e2e test? ensure:
    import os
    if not os.path.exists(prefix + ".ref.npz"):
        cli.main(["index", str(fa), prefix])
    a = tmp / "se_a.sam"
    b = tmp / "se_b.sam"
    cli.main(["mem", prefix, str(r1p), "-o", str(a), "-b", "64"])
    cli.main(["mem", prefix, str(r1p), "-o", str(b), "-b", "64",
              "-t", "2"])
    assert a.read_text() == b.read_text()


@pytest.mark.slow
def test_mem_finalize_workers_pe_identical(tiny_world):
    tmp, fa, r1p, r2p, ref_codes = tiny_world
    prefix = str(tmp / "idx")
    import os
    if not os.path.exists(prefix + ".ref.npz"):
        cli.main(["index", str(fa), prefix])
    a = tmp / "pe_a.sam"
    b = tmp / "pe_b.sam"
    cli.main(["mem", prefix, str(r1p), str(r2p), "-o", str(a), "-b", "64"])
    cli.main(["mem", prefix, str(r1p), str(r2p), "-o", str(b), "-b", "64",
              "-t", "2"])
    assert a.read_text() == b.read_text()
