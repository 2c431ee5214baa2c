"""VCF writing (the reference's VCFWriter, variantcontext/VCFWriter.cpp)."""

from __future__ import annotations


class VcfWriter:
    def __init__(self, path, contig_names, contig_lens, sample_names,
                 extra_headers=()):
        self.path = path
        self.f = open(path, "w")
        self.f.write("##fileformat=VCFv4.2\n")
        self.f.write('##FILTER=<ID=PASS,Description="Site passes filters">\n')
        for h in (
            '##INFO=<ID=TLOD,Number=A,Type=Float,Description='
            '"Log 10 likelihood ratio score of variant existing versus '
            'not existing">',
            '##INFO=<ID=NLOD,Number=A,Type=Float,Description='
            '"Normal log 10 likelihood ratio of diploid het or hom alt '
            'genotypes">',
            '##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
            '##FORMAT=<ID=AD,Number=R,Type=Integer,Description='
            '"Allelic depths">',
            '##FORMAT=<ID=AF,Number=A,Type=Float,Description='
            '"Allele fraction">',
            '##FILTER=<ID=weak_evidence,Description="Mutation does not '
            'meet likelihood threshold">',
            '##FILTER=<ID=germline,Description="Evidence indicates the '
            'site is germline, not somatic">',
        ):
            self.f.write(h + "\n")
        for h in extra_headers:
            self.f.write(h + "\n")
        for n, l in zip(contig_names, contig_lens):
            self.f.write(f"##contig=<ID={n},length={int(l)}>\n")
        cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
                "INFO", "FORMAT"] + list(sample_names)
        self.f.write("\t".join(cols) + "\n")

    # FORMAT key precedence (reference VCFWriter record shape:
    # GT:AD:DP:AF:F1R2:F2R1:...:SB); unknown keys sort after, by name
    _FMT_ORDER = {k: i for i, k in enumerate(
        ("GT", "AD", "DP", "AF", "F1R2", "F2R1", "PGT", "PID"))}

    def add(self, contig, pos1, ref, alts, info: dict, filters,
            sample_fields):
        """pos1: 1-based. sample_fields: list of dicts per sample.
        An info value of True renders as a bare flag key (e.g. PON)."""
        inf = ";".join(k if v is True else f"{k}={v}"
                       for k, v in info.items()) or "."
        filt = ";".join(filters) if filters else "PASS"
        keys = sorted({k for sf in sample_fields for k in sf},
                      key=lambda k: (self._FMT_ORDER.get(k, 98),
                                     k == "SB", k))
        fmt = ":".join(keys)
        samples = [":".join(str(sf.get(k, ".")) for k in keys)
                   for sf in sample_fields]
        self.f.write("\t".join([
            contig, str(pos1), ".", ref, ",".join(alts), ".", filt, inf,
            fmt] + samples) + "\n")

    def close(self):
        self.f.close()


def read_vcf_sites(path):
    """Site set {(contig, pos1, ref, alt)} from a VCF (plain or
    bgzip/gzip) — the panel-of-normals lookup (reference consumes the
    PoN through its IN_PON site annotation, filtering/
    PanelOfNormalsFilter.cpp). Multi-allelic records contribute one
    entry per alt."""
    import gzip

    opener = gzip.open if str(path).endswith(".gz") else open
    sites = set()
    with opener(path, "rt") as f:
        for ln in f:
            if ln.startswith("#"):
                continue
            p = ln.rstrip("\n").split("\t")
            if len(p) < 5:
                continue
            for alt in p[4].split(","):
                sites.add((p[0], int(p[1]), p[3], alt))
    return sites
