"""CNN pre-filter ("deep" mutect gate, reference M13).

The reference runs a TorchScript transformer (trans.pt, 1.1 MB) over a
5x6x31 pileup-feature tensor per candidate variant and skips calling in
regions the classifier deems germline/noise (deepmutect .../src/model/
model.cpp:409-531; gate at main.cpp:213-221). The model runs on host via
torch (CPU) exactly as the reference runs it via libtorch — it fires only
for dense regions (>100 reads), far off the hot path.

Feature builder: ref one-hot + tumor/normal per-base counts over the
31 bp window centred on the variant (model.cpp generateData). The
reference additionally left-pads columns for insertions observed in
reads; this port omits insertion padding (SNV-focused gate).
"""

from __future__ import annotations

import numpy as np

THRESHOLD = 0.9999999995      # model.cpp:516-521


class CnnFilter:
    def __init__(self, model_path):
        import torch
        self.torch = torch
        self.model = torch.jit.load(model_path, map_location="cpu")
        self.model.eval()
        torch.set_num_threads(1)

    def _window_counts(self, reads, vc_start, vc_end):
        """Per-base counts [6, 31] over [vc_start, vc_end] (A C G T N gap)."""
        out = np.zeros((6, 31), np.int64)
        for rd in reads:
            pos = rd["pos"]
            qpos = 0
            rpos = pos
            for op, ln in rd["cigar"]:
                if op in (0, 7, 8):
                    for t in range(ln):
                        p = rpos + t
                        if vc_start <= p <= vc_end:
                            b = int(rd["seq_codes"][qpos + t])
                            out[min(b, 4), p - vc_start] += 1
                    qpos += ln
                    rpos += ln
                elif op == 1 or op == 4:
                    qpos += ln
                elif op in (2, 3):
                    for t in range(ln):
                        p = rpos + t
                        if vc_start <= p <= vc_end:
                            out[5, p - vc_start] += 1
                    rpos += ln
        return out

    def features(self, ref_codes, tumor_reads, normal_reads, vc_pos):
        """inputs[5][6][31] per model.cpp:468-499."""
        vc_start = max(vc_pos - 15, 0)
        ref_oh = np.zeros((6, 31), np.float32)
        for k in range(31):
            p = vc_start + k
            b = int(ref_codes[p]) if 0 <= p < len(ref_codes) else 4
            ref_oh[min(b, 4), k] = 1.0
        case = self._window_counts(tumor_reads, vc_start, vc_start + 30)
        norm = self._window_counts(normal_reads, vc_start, vc_start + 30)
        inputs = np.zeros((5, 6, 31), np.float32)
        inputs[0] = ref_oh
        for i, cnt in ((1, case), (2, norm)):
            depth = cnt.sum(axis=0).astype(np.float32)
            inputs[i] = cnt / (depth + 1e-11)
        both = case + norm
        for i, cnt in ((3, case), (4, norm)):
            inputs[i] = cnt / (both.astype(np.float32) + 1e-11)
        return inputs

    def is_germline_or_noise(self, ref_codes, tumor_reads, normal_reads,
                             vc_pos) -> bool:
        """classify (model.cpp:516-521): True => skip calling here."""
        f = self.features(ref_codes, tumor_reads, normal_reads, vc_pos)
        t = self.torch.from_numpy(f.reshape(1, 30, 31)).transpose(1, 2)
        with self.torch.no_grad():
            out = self.model(t)
        return float(out[0][0]) > THRESHOLD
