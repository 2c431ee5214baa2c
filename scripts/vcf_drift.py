"""Itemize residual VCF LOD drift vs the reference binary's golden.vcf
and attribute it (VERDICT r2 #6).

Runs the caller twice on the golden fixture — normal config, and with
the PairHMM forced through the float64 path — and prints per-site
TLOD/NLOD deltas for both. If the f64 run's drift collapses, the
residual is the f32 kernel's summation precision; what remains is
EM/likelihood-pipeline order (documented FP-order-defined).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/vcf_drift.py
"""

import os
import pathlib
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FIX = pathlib.Path(__file__).parents[1] / "tests" / "golden" / "mutect"


def run_vcf(out, env_extra=None):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    if env_extra:
        env.update(env_extra)
    subprocess.run(
        [sys.executable, "-m", "fgdp_tpu", "mutect",
         "-R", str(FIX / "ref.fa"), "-I", str(FIX / "tumor.bam"),
         "-N", str(FIX / "normal.bam"), "-O", out],
        check=True, timeout=1800, env=env,
        cwd=str(pathlib.Path(__file__).parents[1]))


def parse(path):
    recs = {}
    for line in pathlib.Path(path).read_text().splitlines():
        if line.startswith("#"):
            continue
        p = line.split("\t")
        info = dict(kv.split("=", 1) for kv in p[7].split(";")
                    if "=" in kv)
        recs[(p[0], int(p[1]), p[3], p[4])] = info
    return recs


def main():
    golden = parse(FIX / "golden.vcf")
    run_vcf("/tmp/drift_f32.vcf")
    f32 = parse("/tmp/drift_f32.vcf")
    run_vcf("/tmp/drift_f64.vcf", {"FGDP_PAIRHMM_F64": "1"})
    f64 = parse("/tmp/drift_f64.vcf")

    print(f"{'site':<28} {'field':<5} {'golden':>9} {'f32':>9} "
          f"{'f64':>9} {'d32':>7} {'d64':>7}")
    for key in sorted(golden):
        for fld in ("TLOD", "NLOD", "NALOD"):
            g = float(golden[key].get(fld, "nan"))
            a = float(f32.get(key, {}).get(fld, "nan"))
            b = float(f64.get(key, {}).get(fld, "nan"))
            print(f"{key[0]}:{key[1]} {key[2]}>{key[3]:<10} {fld:<5} "
                  f"{g:9.2f} {a:9.2f} {b:9.2f} {a-g:7.3f} {b-g:7.3f}")


if __name__ == "__main__":
    main()
