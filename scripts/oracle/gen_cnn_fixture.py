"""Generate the CNN-gate A/B fixture (tests/golden/mutect_cnn/).

The reference's "deep" gate only engages on regions with >100 reads
(Mutect2Engine.cpp:213-221): regions where model::classify's TorchScript
forward (model.cpp:516-527) says germline/noise are dropped wholesale.
The main golden fixture is 30x (gate never fires), so this fixture is
120x over two short contigs with a mix of strong somatic SNVs/indels
and weak/no-signal sites, and the oracle binary is run TWICE — without
and with `-M trans.pt` — storing both VCFs. tests/test_cnn_gate.py's
A/B asserts our caller's --deep-model reproduces the same
gated-site-set delta (decision-level parity with model.cpp's classify).

Usage: python scripts/oracle/gen_cnn_fixture.py [--oracle PATH]
"""

import argparse
import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from fgdp_tpu.sortdup import driver  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
CONTIGS = [("chr1", 12_000), ("chr2", 6_000)]
READ_LEN = 120
DEPTH = 120

SOMATIC = [
    ("chr1", 2_345, "snv", None, 0.45),
    ("chr1", 4_567, "snv", None, 0.30),
    ("chr1", 6_789, "snv", None, 0.10),    # weak
    ("chr1", 8_900, "del", 2, 0.35),
    ("chr1", 10_200, "snv", None, 0.05),   # weak
    ("chr2", 1_800, "snv", None, 0.40),
    ("chr2", 4_100, "snv", None, 0.08),    # weak
]
GERMLINE = [("chr1", 3_600, "snv", None, 0.50),
            ("chr2", 2_900, "snv", None, 0.50)]

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from gen_vcf_fixture import apply_events, resolve_payloads  # noqa: E402


def make_reads(refs, rng, events, sample):
    lines = []
    for cname, clen in CONTIGS:
        ref = refs[cname]
        cev = [e for e in events if e[0] == cname]
        n_reads = DEPTH * clen // READ_LEN
        spacing = (clen - READ_LEN - 10) / n_reads
        for i in range(n_reads):
            start = int(i * spacing) + int(
                rng.integers(0, max(1, int(spacing)) + 1))
            end = start + READ_LEN
            active = [e for e in cev if rng.random() < e[4]]
            out = apply_events(ref, active, start, end)
            if out is None:
                out = (ref[start:end], f"{READ_LEN}M")
            seq, cigar = out
            seq = list(seq)
            qual = np.full(len(seq), 37, np.int64)
            low = rng.random(len(seq)) < 0.05
            qual[low] = 30
            for j in np.nonzero(rng.random(len(seq)) < 0.002)[0]:
                seq[j] = "ACGT"[int(rng.integers(0, 4))]
                qual[j] = 20
            seq = "".join(seq)
            qstr = "".join(chr(q + 33) for q in qual)
            flag = 16 if rng.random() < 0.5 else 0
            lines.append("\t".join([
                f"{sample}_{cname}_{i}", str(flag), cname, str(start + 1),
                "60", cigar, "*", "0", "0", seq, qstr, f"RG:Z:{sample}"]))
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle",
                    default="/tmp/m2oracle/Mutect2Cpp-master/build/"
                            "Mutect2Cpp_master")
    ap.add_argument("--model",
                    default="/root/reference/deepmutect/"
                            "Mutect2Cpp-master/trans.pt")
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parents[2]
        / "tests" / "golden" / "mutect_cnn"))
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(20260821)
    refs = {c: BASES[rng.integers(0, 4, n)].tobytes().decode()
            for c, n in CONTIGS}
    with open(out / "ref.fa", "w") as f:
        for c, _n in CONTIGS:
            f.write(f">{c}\n")
            r = refs[c]
            f.write("\n".join(r[i:i + 80] for i in range(0, len(r), 80)))
            f.write("\n")

    somatic = resolve_payloads(refs, SOMATIC)
    germline = resolve_payloads(refs, GERMLINE)
    for sample, events in [("tumor", somatic + germline),
                           ("normal", germline)]:
        header = (["@HD\tVN:1.6\tSO:unsorted"]
                  + [f"@SQ\tSN:{c}\tLN:{n}" for c, n in CONTIGS]
                  + [f"@RG\tID:{sample}\tSM:{sample}\tPL:ILLUMINA"])
        lines = make_reads(refs, rng, events, sample)
        driver.sort_markdup(header + lines, out / f"{sample}.bam")

    for tag, extra in [("nogate", []), ("gate", ["-M", args.model])]:
        vcf = out / f"golden_{tag}.vcf"
        cmd = [args.oracle, "-R", str(out / "ref.fa"),
               "-I", str(out / "tumor.bam"),
               "-I", str(out / "normal.bam"),
               "--normal", "normal", "-O", str(vcf), "-T", "1"] + extra
        print("running oracle:", " ".join(cmd))
        subprocess.run(cmd, check=True, timeout=3600)
        n = sum(1 for l in vcf.read_text().splitlines()
                if l and not l.startswith("#"))
        print(f"{tag}: {vcf} ({n} records)")


if __name__ == "__main__":
    main()
