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

import os as _os

# Persistent XLA compilation cache: kernel shapes recur across runs; the
# first compile of the DP scan is expensive (especially via the TPU
# tunnel), later processes reuse it.  Opt out with AG_TPU_NO_CACHE=1.
if not _os.environ.get("AG_TPU_NO_CACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "AG_TPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "aligngraph_tpu_jax"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

# Host malloc tuning: on sandboxed kernels first-touch page faults make
# fresh large allocations ~1000x slower than warm memory; keep freed
# pages on the heap so numpy temporaries reuse them (utils/hostmem.py).
from aligngraph_tpu.utils.hostmem import tune_host_malloc as _thm

_thm()

from aligngraph_tpu.config import Config  # noqa: F401
