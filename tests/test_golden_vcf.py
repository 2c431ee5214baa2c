"""VCF concordance vs the compiled reference Mutect2 binary.

The fixture (tests/golden/mutect/) holds a synthetic tumor/normal pair
plus golden.vcf — the output of the reference Mutect2Cpp_master built
from /root/reference (scripts/oracle/build_mutect2_oracle.sh) and run by
scripts/oracle/gen_vcf_fixture.py. This test runs OUR caller on the same
inputs and compares:

  exact    : site set (CHROM,POS,REF,ALT), FILTER sets, sample header
             order, ECNT, MBQ, MMQ, RPA/RU/STR presence+values
  budgeted : DP +-2 and per-sample counts +-2 (currently exact on all
             fixture sites; slack covers assembly-region edge effects),
             MPOS/MFRL +-2, lods within max(0.25, 1%) (2x the measured
             f32-PairHMM/EM drift, scripts/vcf_drift.py), AF +-0.01

Every budget is asserted two-sided so regressions in either direction
fail loudly.
"""

import pathlib
import subprocess
import sys

import pytest

FIX = pathlib.Path(__file__).parent / "golden" / "mutect"


def parse_vcf(path):
    samples = None
    recs = {}
    for line in pathlib.Path(path).read_text().splitlines():
        if line.startswith("##"):
            continue
        if line.startswith("#CHROM"):
            samples = line.split("\t")[9:]
            continue
        p = line.split("\t")
        info = {}
        for kv in p[7].split(";"):
            if "=" in kv:
                k, v = kv.split("=", 1)
                info[k] = v
            else:
                info[kv] = True
        fmt = p[8].split(":")
        cols = [dict(zip(fmt, c.split(":"))) for c in p[9:]]
        key = (p[0], int(p[1]), p[3], p[4])
        recs[key] = dict(filters=frozenset(p[6].split(";")), info=info,
                         samples=dict(zip(samples, cols)))
    return samples, recs


def ints(s):
    return [int(x) for x in s.split(",")]


def assert_close(a, b, tol, what):
    assert abs(float(a) - float(b)) <= tol, f"{what}: {a} vs {b}"


def assert_lod(a, b, what):
    # Budget tightened to the measured drift (scripts/vcf_drift.py,
    # round 3): residuals vs the binary are TLOD <= 0.23, NLOD <= 0.10,
    # NALOD <= 0.14 — all FP-summation-order effects of the f32 PairHMM
    # + EM. max(0.25, 1%) gives ~2x headroom over the worst measured
    # site while catching any regression of the old 0.5/10% magnitude.
    a, b = float(a), float(b)
    assert abs(a - b) <= max(0.25, 0.01 * max(abs(a), abs(b))), \
        f"{what}: {a} vs {b}"


@pytest.fixture(scope="module")
def vcfs(tmp_path_factory):
    out = tmp_path_factory.mktemp("golden_vcf") / "mine.vcf"
    subprocess.run(
        [sys.executable, "-m", "fgdp_tpu", "mutect",
         "-R", str(FIX / "ref.fa"), "-I", str(FIX / "tumor.bam"),
         "-N", str(FIX / "normal.bam"), "-O", str(out)],
        check=True, timeout=1200,
        cwd=str(pathlib.Path(__file__).parents[1]))
    return parse_vcf(out), parse_vcf(FIX / "golden.vcf")


def test_sample_columns(vcfs):
    (m_samples, _), (g_samples, _) = vcfs
    assert m_samples == g_samples == ["normal", "tumor"]


def test_site_and_filter_concordance(vcfs):
    (_, mine), (_, golden) = vcfs
    assert set(mine) == set(golden), (
        sorted(set(mine) ^ set(golden)))
    for key in golden:
        assert mine[key]["filters"] == golden[key]["filters"], key


def test_info_concordance(vcfs):
    (_, mine), (_, golden) = vcfs
    for key, g in golden.items():
        m = mine[key]
        gi, mi = g["info"], m["info"]
        assert mi["ECNT"] == gi["ECNT"], key
        assert mi["MBQ"] == gi["MBQ"], key
        assert mi["MMQ"] == gi["MMQ"], key
        assert_close(mi["DP"], gi["DP"], 2, (key, "DP"))
        assert_close(mi["MPOS"], gi["MPOS"], 2, (key, "MPOS"))
        for a, b in zip(ints(mi["MFRL"]), ints(gi["MFRL"])):
            assert_close(a, b, 2, (key, "MFRL"))
        assert_lod(mi["TLOD"], gi["TLOD"], (key, "TLOD"))
        assert_lod(mi["NLOD"], gi["NLOD"], (key, "NLOD"))
        assert_lod(mi["NALOD"], gi["NALOD"], (key, "NALOD"))
        assert mi["POPAF"] == gi["POPAF"], key
        for k in ("RPA", "RU", "STR"):
            assert (k in mi) == (k in gi), (key, k)
            if k in gi:
                assert mi[k] == gi[k], (key, k)


def test_genotype_concordance(vcfs):
    (_, mine), (_, golden) = vcfs
    for key, g in golden.items():
        m = mine[key]
        for s in ("tumor", "normal"):
            gs, ms = g["samples"][s], m["samples"][s]
            assert ms["GT"] == gs["GT"], (key, s)
            for fld in ("AD", "F1R2", "F2R1", "SB"):
                for a, b in zip(ints(ms[fld]), ints(gs[fld])):
                    assert_close(a, b, 2, (key, s, fld))
            assert_close(ms["DP"], gs["DP"], 2, (key, s, "DP"))
            assert_close(ms["AF"], gs["AF"], 0.01, (key, s, "AF"))
