"""Generate the Mutect2 VCF-concordance fixture (tests/golden/mutect/).

Creates a deterministic synthetic tumor/normal pair over a two-contig
reference (50 kb chr1 + 12 kb chr2 — two contigs because the reference
binary hardcodes `ReferenceCache(ref, header, 1)` at main.cpp:642 and
crashes on single-contig references):
  - somatic SNVs at AFs 0.5/0.35/0.25, a 3 bp somatic deletion and a
    2 bp somatic insertion on chr1; one SNV + one insertion on chr2 —
    tumor only;
  - 1 germline heterozygous SNV present in both samples (should be
    suppressed by the normal);
  - clean 30x coverage elsewhere, read length 120, base quality 37 with
    a sprinkle of quality-30 bases and 0.2% random substitution errors.

Read starts are stratified (even spacing + jitter) so no two reads of one
sample share an alignment start: the markdup pass then flags nothing and
the oracle's NotDuplicateTest removes nothing.

Then runs the reference binary (built by build_mutect2_oracle.sh; the
full pipeline of Mutect2Cpp-master/src/main.cpp:437-688 incl.
FilterMutectCalls) on the pair and stores its VCF as the golden file.

Usage: python scripts/oracle/gen_vcf_fixture.py [--oracle PATH] [--out DIR]
"""

import argparse
import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from fgdp_tpu.sortdup import driver  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
CONTIGS = [("chr1", 50_000), ("chr2", 12_000)]
READ_LEN = 120
DEPTH = 30

# (contig, pos0, kind, payload, allele_fraction) — somatic = tumor only.
# SNV payload None = "rotate the reference base" (A->C->G->T->A), which
# guarantees a real substitution whatever the random reference holds.
SOMATIC = [
    ("chr1", 12_345, "snv", None, 0.50),
    ("chr1", 23_456, "snv", None, 0.35),
    ("chr1", 34_567, "snv", None, 0.25),
    ("chr1", 18_900, "del", 3, 0.40),      # 3 bp deletion
    ("chr1", 41_200, "ins", "AG", 0.45),   # 2 bp insertion
    ("chr2", 4_321, "snv", None, 0.40),
    ("chr2", 9_100, "ins", "T", 0.35),
]
GERMLINE = [("chr1", 28_000, "snv", None, 0.50)]  # het in BOTH samples

ROT = {"A": "C", "C": "G", "G": "T", "T": "A"}


def resolve_payloads(refs, events):
    return [(c, p, k, ROT[refs[c][p]] if k == "snv" and v is None else v, af)
            for (c, p, k, v, af) in events]


def apply_events(ref, events, read_start, read_end):
    """Return (seq, cigar) for a read covering [read_start, read_end)
    with the given events applied; None if an event sits too close to
    either read edge for a clean anchor."""
    seq = []
    cig = []
    pos = read_start
    evs = sorted(e for e in events if read_start <= e[1] < read_end)

    def emit(op, n):
        if cig and cig[-1][0] == op:
            cig[-1][1] += n
        else:
            cig.append([op, n])

    for (_c, p, kind, payload, _af) in evs:
        if kind == "del" and p + 1 + payload >= read_end:
            return None  # deletion runs off the read end
        if p - 15 < read_start or p + 15 >= read_end:
            return None  # keep events well inside the read
        seq.append(ref[pos:p])
        emit("M", p - pos)
        if kind == "snv":
            seq.append(payload)
            emit("M", 1)
            pos = p + 1
        elif kind == "del":
            seq.append(ref[p])  # anchor base kept
            emit("M", 1)
            emit("D", payload)
            pos = p + 1 + payload
        else:  # ins: anchor base then inserted bases
            seq.append(ref[p] + payload)
            emit("M", 1)
            emit("I", len(payload))
            pos = p + 1
    seq.append(ref[pos:read_end])
    emit("M", read_end - pos)
    s = "".join(seq)
    cigar = "".join(f"{n}{op}" for op, n in cig)
    return s, cigar


def make_reads(refs, rng, events, sample):
    lines = []
    for cname, clen in CONTIGS:
        ref = refs[cname]
        cev = [e for e in events if e[0] == cname]
        n_reads = DEPTH * clen // READ_LEN
        spacing = (clen - READ_LEN - 10) / n_reads
        for i in range(n_reads):
            start = int(i * spacing) + int(
                rng.integers(0, max(1, int(spacing))))
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
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parents[2]
        / "tests" / "golden" / "mutect"))
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(20260819)
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

    golden = out / "golden.vcf"
    cmd = [args.oracle, "-R", str(out / "ref.fa"),
           "-I", str(out / "tumor.bam"), "-I", str(out / "normal.bam"),
           "--normal", "normal", "-O", str(golden), "-T", "1"]
    print("running oracle:", " ".join(cmd))
    subprocess.run(cmd, check=True, timeout=3600)
    n = sum(1 for l in golden.read_text().splitlines()
            if l and not l.startswith("#"))
    print(f"golden VCF written: {golden} ({n} records)")


if __name__ == "__main__":
    main()
