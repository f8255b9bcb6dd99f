"""aligngraph_tpu — TPU-native reference-guided genome reassembly engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of AlignGraph
(reference: /root/reference/AlignGraph/AlignGraph.cpp): align PE reads and
de-novo contigs to a closely related reference genome with an *in-engine*
seed-and-extend aligner (replacing the reference's Bowtie2/BLAT/NUCMER
subprocess calls), build a position-annotated A-Bruijn graph as tensors over
the genome position axis, and extend/join contigs by coverage-thresholded
path traversal.

Architecture (arrays, not files; positions, not pointers):
  io/        FASTA parsing + input formalization (reference C2-C4 semantics)
  ops/       Pallas TPU kernels + device ops (banded SW DP, seed hashing)
  align/     seed-and-extend aligners (read mode = bowtie2 replacement,
             long-query mode = BLAT/NUCMER replacement)
  graph/     position-indexed graph tensors, contig/k-mer layers, traversal
  pipeline/  end-to-end driver, refinement, checkpointing, misassembly removal
  evaluate/  assembly statistics (Eval-AlignGraph equivalent)
  parallel/  device mesh, shardings, collectives for multi-chip/multi-host
"""

__version__ = "0.1.0"

from aligngraph_tpu.config import Config  # noqa: F401
