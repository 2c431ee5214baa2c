"""CNN pre-filter ("deep" mutect gate, reference M13).

The reference runs a TorchScript transformer (trans.pt, 1.1 MB) over a
5x6x31 pileup-feature tensor per candidate variant and skips calling in
regions the classifier deems germline/noise (deepmutect .../src/model/
model.cpp:409-531; gate at main.cpp:213-221). The model runs on host via
torch (CPU) exactly as the reference runs it via libtorch — it fires only
for dense regions (>100 reads), far off the hot path.

Feature builder transcribes model::generateData (model.cpp:10-393)
including the insertion padding: a 31-slot max-insertion-length profile
over ALL region reads left-pads every column, reads/ref are rasterized
into the padded coordinate space (gap row 5 fills pads; an insertion's
own bases land in its pads), and the final 31 columns are re-cut at
matricStart = sum(insertion[0..15]) so the variant stays at column 15.
The per-variant scan order + padded-window skip (position/regionEnd,
model.cpp:435-467) is reproduced by gate_region.

Known reference quirks preserved: M/D column loops run to vcEnd
EXCLUSIVE (the 31st column carries no read counts), the insertion
profile scan is vcStart..vcEnd INCLUSIVE, and an I element at exactly
vcStart contributes padding but no bases (readStart > vcStart strict,
model.cpp:226).
"""

from __future__ import annotations

import numpy as np

THRESHOLD = 0.9999999995      # model.cpp:516-521

# cigar op codes used by the caller's read dicts
_M_OPS = (0, 7, 8)            # M, EQ, X
_REF_ADV = (0, 2, 3, 7, 8)    # M, D, N, EQ, X


def _cigar_ref_len(cigar):
    return sum(ln for op, ln in cigar if op in _REF_ADV)


def _lead_soft(cigar):
    return cigar[0][1] if cigar and cigar[0][0] == 4 else 0


def insertion_profile(reads, vc_start, vc_end):
    """max I-length per column over ALL reads (model.cpp:15-40)."""
    ins = np.zeros(31, np.int64)
    for rd in reads:
        rs = rd["pos"]
        for op, ln in rd["cigar"]:
            if op in _REF_ADV:
                rs += ln
            elif op == 1:
                if vc_start <= rs <= vc_end:
                    idx = rs - vc_start
                    if ln > ins[idx]:
                        ins[idx] = ln
    return ins


def _rasterize_reads(reads, ins, vc_start, vc_end, pad_len, out):
    """model.cpp:157-262 (case) == :264-368 (normal): one read's bases
    into the padded coordinate space; `out` is the [6, pad_len] plane."""
    for rd in reads:
        it_ins = ins.copy()
        rs = rd["pos"]
        re = rs + _cigar_ref_len(rd["cigar"]) - 1
        bp = _lead_soft(rd["cigar"])          # readStart - softStart
        op_out = 0
        if vc_start < rs:
            for i in range(min(rs - vc_start, 31)):
                op_out += int(it_ins[i]) + 1
        seq = rd["seq_codes"]
        for op, ln in rd["cigar"]:
            if rs > min(re, vc_end):
                break
            if op == 2 or op == 3:            # D / N
                if rs + ln > vc_start:
                    for i in range(max(vc_start, rs),
                                   min(rs + ln, vc_end)):
                        ii = int(it_ins[i - vc_start])
                        for k in range(ii + 1):
                            out[5, op_out + k] += 1
                        op_out += ii + 1
                rs += ln
            elif op in _M_OPS:
                if rs + ln > vc_start:
                    if vc_start > rs:
                        bp += vc_start - rs
                    for i in range(max(vc_start, rs),
                                   min(rs + ln, vc_end)):
                        ii = int(it_ins[i - vc_start])
                        for k in range(ii):
                            out[5, op_out + k] += 1
                        op_out += ii
                        b = int(seq[bp]) if 0 <= bp < len(seq) else 4
                        out[min(b, 4), op_out] += 1
                        bp += 1
                        op_out += 1
                    rs += ln
                else:
                    rs += ln
                    bp += ln
            elif op == 1:                     # I
                if rs > vc_start:
                    for _ in range(ln):
                        b = int(seq[bp]) if 0 <= bp < len(seq) else 4
                        out[min(b, 4), op_out] += 1
                        bp += 1
                        op_out += 1
                    for _ in range(ln, int(it_ins[rs - vc_start])):
                        out[5, op_out] += 1
                        op_out += 1
                    it_ins[rs - vc_start] = 0
                else:
                    bp += ln
            # S / H / P: no ref advance, bases pre-accounted via bp


def generate_data(ref_codes, case_reads, normal_reads, all_reads,
                  vc_start, vc_end):
    """model::generateData — returns (result[3][6][31], insertion[31])."""
    ins = insertion_profile(all_reads, vc_start, vc_end)
    pad_len = 31 + int(ins.sum())
    pad = np.zeros((3, 6, pad_len), np.int64)

    # reference row (model.cpp:53-156): one base per column, pads first
    rp = vc_start
    op_out = 0
    for i in range(31):
        ii = int(ins[i])
        if ii:
            for k in range(ii):
                pad[0, 5, op_out + k] += 1
            op_out += ii
        b = int(ref_codes[rp]) if 0 <= rp < len(ref_codes) else 4
        pad[0, min(b, 4), op_out] += 1
        rp += 1
        op_out += 1

    _rasterize_reads(case_reads, ins, vc_start, vc_end, pad_len, pad[1])
    _rasterize_reads(normal_reads, ins, vc_start, vc_end, pad_len, pad[2])

    start = int(ins[:16].sum())               # matricStart
    return pad[:, :, start:start + 31], ins


class CnnFilter:
    def __init__(self, model_path):
        import torch
        self.torch = torch
        self.model = torch.jit.load(model_path, map_location="cpu")
        self.model.eval()
        torch.set_num_threads(1)

    def features(self, ref_codes, tumor_reads, normal_reads, vc_pos):
        """inputs[5][6][31] (model.cpp:468-499). Reads overlapping the
        window are selected here (readTrim, model.cpp:396-405)."""
        vc_start = vc_pos - 15
        vc_end = vc_pos + 15
        if vc_start < 0:
            vc_start, vc_end = 0, 30

        def trim(reads):
            return [rd for rd in reads
                    if not (rd["pos"] + _cigar_ref_len(rd["cigar"]) - 1
                            < vc_start or rd["pos"] > vc_end)]

        res, ins = generate_data(ref_codes, trim(tumor_reads),
                                 trim(normal_reads),
                                 list(tumor_reads) + list(normal_reads),
                                 vc_start, vc_end)
        inputs = np.zeros((5, 6, 31), np.float32)
        inputs[0] = res[0]
        depth = res[1:3].sum(axis=1).astype(np.float32)   # [2, 31]
        inputs[1] = res[1] / (depth[0] + 1e-11)
        inputs[2] = res[2] / (depth[1] + 1e-11)
        both = (res[1] + res[2]).astype(np.float32)
        inputs[3] = res[1] / (both + 1e-11)
        inputs[4] = res[2] / (both + 1e-11)
        return inputs, ins, vc_start

    def classify(self, inputs) -> bool:
        t = self.torch.from_numpy(
            np.ascontiguousarray(inputs.reshape(1, 30, 31))).transpose(1, 2)
        with self.torch.no_grad():
            out = self.model(t)
        return float(out[0][0]) > THRESHOLD

    def is_somatic(self, ref_codes, tumor_reads, normal_reads,
                   vc_pos) -> bool:
        """Single-variant classify (True => confident somatic, the
        polarity of model.cpp:516-527's `classify`)."""
        inputs, _, _ = self.features(ref_codes, tumor_reads,
                                     normal_reads, vc_pos)
        return self.classify(inputs)

    def gate_region(self, ref_codes, tumor_reads, normal_reads,
                    events) -> bool:
        """modelRefer (model.cpp:409-500): variants in position order,
        each classified unless inside the previous variant's padded
        window; True as soon as ANY variant classifies somatic = KEEP
        the region (the engine skips the region when this returns
        False, matching `if (!modelRefer) return {}`,
        Mutect2Engine.cpp:216-221)."""
        position = 0
        for pos in sorted(events):
            if position > pos:                # vc end ~ pos for SNVs
                continue
            inputs, ins, vc_start = self.features(
                ref_codes, tumor_reads, normal_reads, pos)
            count2, index2 = 15, 15
            while count2 < 30:
                count2 += int(ins[index2 + 1]) + 1
                index2 += 1
            if index2 == 29:
                index2 += 1
            position = vc_start + index2
            if self.classify(inputs):
                return True
        return False
