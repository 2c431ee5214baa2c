"""fgdp_tpu — TPU-native short-read secondary-analysis engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the three
C++ pipelines in the reference repo `lfalive/fast-genomic-data-processing`:

  1. ``fgdp_tpu.align``   — BWA-MEM2-style seed-and-extend alignment
     (reference: ``bwa-mem2-lcp/``); FM-index held in HBM, SMEM seeding and
     banded Smith-Waterman as batched device kernels.
  2. ``fgdp_tpu.sortdup`` — coordinate sort + Picard-semantics duplicate
     marking (reference: ``sortmardup/``); device radix sort + segmented
     reductions replace the TBB/LZ4-spill machinery.
  3. ``fgdp_tpu.call``    — Mutect2-style somatic calling (reference:
     ``deepmutect/Mutect2Cpp-master/``); activity profiling, pileups and the
     PairHMM forward recurrence on device, irregular assembly on host.

Layering (bottom → top):
  utils/  io/  index/   host-side foundations (no jax device code)
  ops/                  device kernels (pure functions, jit/pallas)
  align/ sortdup/ call/ pipeline stages orchestrating the kernels
  parallel/             mesh construction + sharded pipeline steps
"""

__version__ = "0.1.0"
