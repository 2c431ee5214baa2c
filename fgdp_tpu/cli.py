"""Command-line interface: the three reference programs as subcommands.

  fgdp index   <ref.fa> <out_prefix>          (bwa-mem2 index)
  fgdp mem     <prefix> <r1.fq> [r2.fq] ...   (bwa-mem2 mem)
  fgdp sormadup <in.sam> <out.bam>            (sormadup)
  fgdp mutect  -R ref -I tumor.bam ...        (Mutect2Cpp_master)

Run as `python -m fgdp_tpu <cmd> ...`.
"""

from __future__ import annotations

import argparse
import itertools
import sys
import time

import numpy as np


def cmd_index(args):
    from .index.fmindex import FMIndex
    from .index.reference import PackedReference

    t0 = time.time()
    pref = PackedReference.from_fasta(args.ref)
    pref.save(args.prefix + ".ref")
    print(f"[index] packed {len(pref.names)} contigs, "
          f"{pref.l_pac} bp in {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    fm = FMIndex.build(pref.codes)
    fm.save(args.prefix + ".fmi")
    print(f"[index] FM-index built in {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    from .index.rmi import RMIndex
    from .utils import dna
    x = np.concatenate([pref.codes, dna.revcomp(pref.codes)])
    RMIndex.build(x, fm.sa).save(args.prefix + ".rmi")
    print(f"[index] RMI learned index built in {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    from .index.lcptree import LcpTree
    LcpTree.build(x.astype(np.uint8), fm.sa).save(args.prefix + ".lcp")
    print(f"[index] LCP-interval tree built in {time.time()-t0:.1f}s",
          file=sys.stderr)


def _mem_opt(args):
    """mem_opt_t from CLI flags incl. -x read-type profiles
    (reference src/fastmap.cpp:656-860): explicit flags win over the
    profile, matching the opt0-tracking update rules."""
    import dataclasses

    from .config import AlignConfig

    explicit = {k: v for k, v in dict(
        min_seed_len=args.k, w=args.w, a=args.A, b=args.B,
        T=args.T, zdrop=args.d, split_factor=args.r, max_occ=args.c,
        max_mem_intv=args.y, drop_ratio=args.D, max_matesw=args.m,
        pen_unpaired=args.U, chunk_size=args.K,
        max_XA_hits=getattr(args, "h0", None),
    ).items() if v is not None}
    if args.O is not None:
        explicit["o_del"] = explicit["o_ins"] = args.O
    if args.E is not None:
        explicit["e_del"] = explicit["e_ins"] = args.E
    if args.L is not None:
        explicit["pen_clip5"] = explicit["pen_clip3"] = args.L
    prof = {}
    if args.read_type:
        if args.read_type == "intractg":
            prof = dict(o_del=16, o_ins=16, b=9, pen_clip5=5, pen_clip3=5)
        elif args.read_type in ("pacbio", "pbref", "ont2d"):
            prof = dict(o_del=1, e_del=1, o_ins=1, e_ins=1, b=1,
                        split_factor=10.0, pen_clip5=0, pen_clip3=0,
                        min_chain_weight=20 if args.read_type == "ont2d"
                        else 40,
                        min_seed_len=14 if args.read_type == "ont2d"
                        else 17)
        else:
            raise SystemExit(f"unknown read type '{args.read_type}'")
    prof.update(explicit)          # explicit flags win (opt0 semantics)
    prof["output_all"] = bool(args.all_alignments)
    return dataclasses.replace(AlignConfig(), **prof)


def _load_aligner(prefix, batch, opt=None, output_all=False):
    from .config import AlignConfig, BatchShapes
    from .index.fmindex import FMIndex
    from .index.reference import PackedReference
    from .pipeline import Aligner

    pref = PackedReference.load(prefix + ".ref")
    fm = FMIndex.load(prefix + ".fmi")
    if opt is None:
        opt = AlignConfig(output_all=output_all)
    import os as _os
    lcp = True                      # build in-process if not on disk
    if _os.path.exists(prefix + ".lcp.npz"):
        from .index.lcptree import LcpTree
        lcp = LcpTree.load(prefix + ".lcp.npz")
        if lcp.isa is None:         # pre-isa artifact: rebuild
            lcp = True
    return Aligner(pref, fm, opt=opt,
                   shapes=BatchShapes(batch_reads=batch), lcp=lcp)


def _read_batches(paths, batch):
    from .io.fastq import parse_fastq_records
    from .utils import dna

    its = [parse_fastq_records(p) for p in paths]
    paired = len(its) == 2
    while True:
        names, seqs, quals = [], [], []
        for _ in range(batch // (2 if paired else 1)):
            recs = [next(it, None) for it in its]
            if recs[0] is None:
                break
            for r in recs:
                names.append(r[0])
                seqs.append(dna.encode(r[2]).astype(np.int64))
                quals.append(r[3].decode() if r[3] else None)
        if not names:
            return
        yield names, seqs, quals


def _timed_batches(paths, batch):
    from .utils.profiling import PROF, READ_IO

    it = _read_batches(paths, batch)
    while True:
        with PROF.phase(READ_IO):
            b = next(it, None)
        if b is None:
            return
        yield b


def cmd_mem(args):
    from .pipeline_stream import stream_mem
    from .utils.profiling import PROF, SAM_IO

    aligner = _load_aligner(args.prefix, args.batch, opt=_mem_opt(args))
    out = open(args.output, "w") if args.output else sys.stdout
    for ln in aligner.sam_header(rg_line=args.rg):
        out.write(ln + "\n")
    t0 = time.time()

    def write_line(ln):
        with PROF.phase(SAM_IO):
            out.write(ln + "\n")

    def progress(n):
        dt = max(time.time() - t0, 1e-9)
        print(f"[mem] {n} reads, {n/dt:.0f} reads/s", file=sys.stderr)

    # 3-stage overlap (kt_pipeline analogue): FASTQ decode and SAM
    # write ride worker threads while the device aligns the next batch;
    # device/finalize time is attributed inside the Aligner
    # (MEM_DEVICE / JIT_COMPILE / WORKER_SAM phases).
    paired = len(args.reads) == 2
    if args.finalize_workers > 0:
        from .pipeline_stream import FinalizePool, stream_mem_pooled
        pool = FinalizePool(args.prefix + ".ref", aligner.opt,
                            args.finalize_workers)
        try:
            n = stream_mem_pooled(aligner,
                                  _timed_batches(args.reads, args.batch),
                                  write_line, pool, paired=paired,
                                  progress=progress)
        finally:
            pool.shutdown()
    else:
        n = stream_mem(aligner, _timed_batches(args.reads, args.batch),
                       write_line, paired=paired, progress=progress)
    if args.output:
        out.close()
    PROF.display_stats(units=n, unit_name="reads")


def cmd_sormadup(args):
    from .sortdup.driver import sort_markdup, sort_markdup_file

    t0 = time.time()
    if args.input == "-":
        lines = sys.stdin.read().splitlines()
        n, ndup = sort_markdup(lines, args.output,
                               compress_level=args.compress_level)
    else:
        # mmap-backed streaming path (inputs larger than RAM)
        n, ndup = sort_markdup_file(args.input, args.output,
                                    compress_level=args.compress_level)
    print(f"[sormadup] {n} records, {ndup} duplicate pairs, "
          f"{time.time()-t0:.1f}s -> {args.output}(.bai)", file=sys.stderr)


def _bam_to_read_dicts(path):
    from .io import bam as bamio
    from .utils import dna

    _, names, lens, records = bamio.read_bam(path)
    reads = []
    for r in records:
        if r["flag"] & 0x904 or r["rid"] < 0:
            continue
        reads.append(dict(
            rid=r["rid"], pos=r["pos"], cigar=r["cigar"],
            seq_codes=dna.encode(r["seq"]).astype(np.int64),
            quals=np.frombuffer(r["qual"], np.uint8).astype(np.int64),
            mate_start=r["next_pos"] if r["next_rid"] == r["rid"] else None,
            properly_paired=bool(r["flag"] & 0x2), flag=r["flag"],
            mapq=r["mapq"], is_reverse=bool(r["flag"] & 0x10),
            frag_len=r["tlen"]))
    return names, lens, reads


def cmd_mutect(args):
    import dataclasses
    import os

    from .call.engine import Mutect2Engine, write_vcf
    from .config import CallConfig
    from .io.fasta import read_fasta

    ref = read_fasta(args.reference)
    cfg = CallConfig()
    overrides = {k: v for k, v in dict(
        callable_depth=args.callable_depth,
        max_prob_propagation_distance=args.max_prob_propagation_distance,
        active_prob_threshold=args.active_probability_threshold,
        assembly_region_padding=args.assembly_region_padding,
        max_assembly_region_size=args.max_assembly_region_size,
        min_assembly_region_size=args.min_assembly_region_size,
        max_reads_per_alignment_start=args.max_reads_per_alignment_start,
    ).items() if v is not None}
    if args.kmer_size:
        overrides["kmer_sizes"] = tuple(sorted(args.kmer_size))
    cfg = dataclasses.replace(cfg, **overrides)

    # --bqsr-within-mutect (reference main.cpp:204-211): recalibrate
    # base qualities from per-sample recal tables before calling
    t_bqsr = n_bqsr = None
    if args.bqsr_tumor:
        from .call.bqsr import BQSRReadTransformer
        t_bqsr = BQSRReadTransformer(args.bqsr_tumor)
    if args.bqsr_normal:
        from .call.bqsr import BQSRReadTransformer
        n_bqsr = BQSRReadTransformer(args.bqsr_normal)

    all_calls = []
    callable_sites = 0
    streamed = os.path.exists(args.input + ".bai") and \
        (not args.normal or os.path.exists(args.normal + ".bai"))
    if streamed:
        # BAI-windowed streaming (reference ReadCache region loop,
        # main.cpp:254): one 1 Mb window + padding resident at a time,
        # with per-alignment-start downsampling applied per window
        from .call.readcache import StreamingReadSource

        src = StreamingReadSource(args.input, args.normal, cfg=cfg,
                                  tumor_bqsr=t_bqsr, normal_bqsr=n_bqsr)
        try:
            for cid, cname in enumerate(ref.names):
                if cname not in src.names:
                    continue
                rid = src.names.index(cname)
                codes = ref.contig_codes(cid)
                eng = Mutect2Engine(codes, cname, cfg=cfg,
                                    cnn_model_path=args.deep_model,
                                    region_workers=max(
                                        getattr(args, 'threads', 1) - 1, 0))
                try:
                    all_calls.extend(
                        eng.call_windows(src.windows(rid, codes)))
                finally:
                    eng.close()
                callable_sites += eng.callable_sites
        finally:
            src.close()
    else:
        # whole-BAM fallback (no .bai next to the input)
        from .call.readcache import downsample_reads
        from .call.transformers import palindrome_artifact_clip

        names, lens, tumor = _bam_to_read_dicts(args.input)
        normal = _bam_to_read_dicts(args.normal)[2] if args.normal else []
        if t_bqsr:
            for r in tumor:
                t_bqsr.apply(r)
        if n_bqsr:
            for r in normal:
                n_bqsr.apply(r)
        for cid, cname in enumerate(ref.names):
            codes = ref.contig_codes(cid)
            t = [r for r in tumor if r["rid"] == cid]
            nr = [r for r in normal if r["rid"] == cid]
            if not t:
                continue
            t = downsample_reads(t, cfg.max_reads_per_alignment_start)
            nr = downsample_reads(nr, cfg.max_reads_per_alignment_start,
                                  seed=1)
            # per-read hairpin-artifact clip (ReadCache.cpp:27,115)
            for r in t + nr:
                palindrome_artifact_clip(r, codes)
            eng = Mutect2Engine(codes, cname, cfg=cfg,
                                cnn_model_path=args.deep_model,
                                region_workers=max(getattr(args, 'threads', 1) - 1, 0))
            try:
                all_calls.extend(eng.call(t, nr))
            finally:
                eng.close()
            callable_sites += eng.callable_sites
    # --panel-of-normals: blacklist sites seen in the PoN VCF
    # (PanelOfNormalsFilter via the IN_PON annotation)
    if getattr(args, "pon", None):
        from .io.vcf import read_vcf_sites
        pon = read_vcf_sites(args.pon)
        for c in all_calls:
            c.in_pon = (c.contig, c.pos + 1, c.ref, c.alt) in pon
    # FilterMutectCalls 2-pass (reference main.cpp:643-662)
    from .call.engine import apply_filter_mutect_calls
    apply_filter_mutect_calls(all_calls,
                              callable_sites=max(callable_sites, 1))
    # sample names from the BAMs' @RG SM tags (reference: merged-header
    # read groups feed VCFWriter.writeHeader, main.cpp:598-600)
    def _sm(path, default):
        from .io.bam import BamReader
        try:
            rdr = BamReader(path)
            try:
                for line in rdr.header_text.splitlines():
                    if line.startswith("@RG"):
                        for f in line.split("\t"):
                            if f.startswith("SM:"):
                                return f[3:]
            finally:
                rdr.close()
        except Exception:  # noqa: BLE001 - SAM input or headerless BAM
            pass
        return default

    write_vcf(args.output, all_calls, ref.names,
              np.diff(ref.offsets).tolist(),
              tumor_sample=_sm(args.input, "tumor"),
              normal_sample=_sm(args.normal, "normal")
              if args.normal else None)
    print(f"[mutect] {len(all_calls)} calls -> {args.output}",
          file=sys.stderr)


def cmd_pipeline(args):
    """FASTQ -> sorted+markdup BAM (-> VCF): the three programs chained
    with stage overlap instead of materialized SAM pipes."""
    from .pipeline_stream import stream_fastq_to_bam

    aligner = _load_aligner(args.prefix, args.batch)
    t0 = time.time()

    def progress(n):
        dt = max(time.time() - t0, 1e-9)
        print(f"[pipeline] {n} reads aligned, {n/dt:.0f} reads/s",
              file=sys.stderr)

    pool = None
    if args.finalize_workers > 0:
        from .pipeline_stream import FinalizePool
        pool = FinalizePool(args.prefix + ".ref", aligner.opt,
                            args.finalize_workers)
    try:
        n, (nrec, ndup) = stream_fastq_to_bam(
            aligner, _timed_batches(args.reads, args.batch), args.output,
            paired=len(args.reads) == 2,
            compress_level=args.compress_level,
            progress=progress, pool=pool)
    finally:
        if pool is not None:
            pool.shutdown()
    print(f"[pipeline] {nrec} records, {ndup} duplicate pairs -> "
          f"{args.output}(.bai)", file=sys.stderr)
    if args.vcf:
        mt = argparse.Namespace(
            reference=args.reference, input=args.output,
            normal=args.normal, output=args.vcf, deep_model=None,
            threads=args.threads,
            bqsr_tumor=None, bqsr_normal=None, callable_depth=None,
            max_prob_propagation_distance=None,
            active_probability_threshold=None,
            assembly_region_padding=None, max_assembly_region_size=None,
            min_assembly_region_size=None,
            max_reads_per_alignment_start=None, kmer_size=None)
        cmd_mutect(mt)


def main(argv=None):
    p = argparse.ArgumentParser(prog="fgdp-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index")
    pi.add_argument("ref")
    pi.add_argument("prefix")
    pi.set_defaults(fn=cmd_index)

    pm = sub.add_parser("mem")
    pm.add_argument("prefix")
    pm.add_argument("reads", nargs="+")
    pm.add_argument("-o", "--output")
    pm.add_argument("-b", "--batch", type=int, default=512)
    pm.add_argument("-a", dest="all_alignments", action="store_true",
                    help="output all alignments (MEM_F_ALL)")
    # mem_opt_t flags (reference fastmap.cpp:656-799); None = default
    pm.add_argument("-k", type=int, help="min seed length [19]")
    pm.add_argument("-w", type=int, help="band width [100]")
    pm.add_argument("-A", type=int, help="match score [1]")
    pm.add_argument("-B", type=int, help="mismatch penalty [4]")
    pm.add_argument("-O", type=int, help="gap open penalty [6]")
    pm.add_argument("-E", type=int, help="gap extension penalty [1]")
    pm.add_argument("-L", type=int, help="clipping penalty [5]")
    pm.add_argument("-T", type=int, help="min output score [30]")
    pm.add_argument("-d", type=int, help="Z-dropoff [100]")
    pm.add_argument("-r", type=float, help="re-seed split factor [1.5]")
    pm.add_argument("-c", type=int, help="max seed occurrences [500]")
    pm.add_argument("-y", type=int, help="K3 seed-strategy cap [20]")
    pm.add_argument("-D", type=float, help="chain drop ratio [0.5]")
    pm.add_argument("-m", type=int, help="mate-rescue rounds [50]")
    pm.add_argument("-U", type=int, help="unpaired penalty [17]")
    pm.add_argument("-K", type=int, help="chunk size in bp [10000000]")
    pm.add_argument("-H", dest="h0", type=int,
                    help="max XA hits [5] (reference -h)")
    pm.add_argument("-x", dest="read_type",
                    help="read type: pacbio/ont2d/intractg")
    pm.add_argument("-R", dest="rg", help="read group header line")
    pm.add_argument("-t", "--finalize-workers", type=int, default=0,
                    help="SAM-finalize worker processes (worker_sam "
                         "team analogue) [0]")
    pm.set_defaults(fn=cmd_mem)

    ps = sub.add_parser("sormadup")
    ps.add_argument("input")
    ps.add_argument("output")
    ps.add_argument("-l", "--compress-level", type=int, default=6)
    ps.set_defaults(fn=cmd_sormadup)

    pc = sub.add_parser("mutect")
    pc.add_argument("-R", "--reference", required=True)
    pc.add_argument("-I", "--input", required=True)
    pc.add_argument("-N", "--normal")
    pc.add_argument("-O", "--output", required=True)
    pc.add_argument("--deep-model", help="TorchScript CNN gate (trans.pt)")
    pc.add_argument("-t", "--threads", type=int, default=1,
                    help="host threads: t-1 region-prep workers run "
                         "assembly/trim/gate in parallel (reference "
                         "main.cpp:195 N-thread region scheduler)")
    pc.add_argument("--panel-of-normals", dest="pon",
                    help="PoN VCF; matching sites get the "
                         "panel_of_normals filter")
    pc.add_argument("--bqsr-tumor", help="GATK recal table for tumor reads")
    pc.add_argument("--bqsr-normal", help="GATK recal table for normal reads")
    # M2ArgumentCollection long options (reference main.cpp:449-531)
    pc.add_argument("--callable-depth", type=int)
    pc.add_argument("--max-prob-propagation-distance", type=int)
    pc.add_argument("--active-probability-threshold", type=float)
    pc.add_argument("--assembly-region-padding", type=int)
    pc.add_argument("--max-assembly-region-size", type=int)
    pc.add_argument("--min-assembly-region-size", type=int)
    pc.add_argument("--max-reads-per-alignment-start", type=int)
    pc.add_argument("--kmer-size", type=int, action="append",
                    help="assembly kmer size (repeatable) [10, 25]")
    pc.set_defaults(fn=cmd_mutect)

    pp = sub.add_parser("pipeline",
                        help="fastq -> sorted/markdup BAM (-> VCF), "
                             "stages overlapped")
    pp.add_argument("prefix")
    pp.add_argument("reads", nargs="+")
    pp.add_argument("-O", "--output", required=True, help="output BAM")
    pp.add_argument("-b", "--batch", type=int, default=512)
    pp.add_argument("-l", "--compress-level", type=int, default=6)
    pp.add_argument("-t", "--finalize-workers", type=int, default=0,
                    help="SAM-finalize worker processes (worker_sam "
                         "kt_for team analogue; 0 = in-process)")
    pp.add_argument("--vcf", help="also call variants to this VCF")
    pp.add_argument("--threads", type=int, default=1,
                    help="mutect-stage host threads (threads-1 region-prep "
                         "workers), used only with --vcf [1]")
    pp.add_argument("-R", "--reference", help="FASTA (required with --vcf)")
    pp.add_argument("-N", "--normal", help="normal BAM (with --vcf)")
    pp.set_defaults(fn=cmd_pipeline)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
