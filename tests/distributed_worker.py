"""Worker for the multi-process jax.distributed test (D4).

Launched twice by tests/test_distributed.py:
  python distributed_worker.py <coordinator> <num_procs> <proc_id> <outdir>

Each process contributes 4 virtual CPU devices -> an 8-device global
mesh across 2 OS processes.  Runs (a) the sharded span-coverage op
(parallel/coverage.py: psum_scatter + all_gather collectives) and (b) the
sharded PRODUCTION aligner over process-spanning dp shards, then process
0 writes the globally-gathered results for the parent to compare against
single-process oracles.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import numpy as np


def main():
    coord, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from aligngraph_tpu.parallel.coverage import (
        make_sharded_coverage, pad_spans)
    from aligngraph_tpu.parallel.mesh import make_mesh

    n_dev = jax.device_count()          # 8 global
    assert n_dev == 4 * nproc, f"global devices {n_dev} != {4 * nproc}"
    mesh = make_mesh(n_dev)

    # ---- (a) sharded coverage across process boundaries ----
    rng = np.random.default_rng(3)
    G = n_dev * 1024
    N = 2048
    starts = rng.integers(-50, G + 50, N).astype(np.int32)
    ends = (starts + rng.integers(0, 300, N)).astype(np.int32)
    for b in range(1, n_dev):           # straddle every shard boundary
        starts[b] = b * 1024 - 100
        ends[b] = b * 1024 + 100
    s_p, e_p = pad_spans(starts, ends, n_dev)
    sh = NamedSharding(mesh, P("dp"))
    fn = make_sharded_coverage(mesh, G)
    out = fn(multihost_utils.host_local_array_to_global_array(
                 s_p.reshape(nproc, -1)[pid], mesh, P("dp")),
             multihost_utils.host_local_array_to_global_array(
                 e_p.reshape(nproc, -1)[pid], mesh, P("dp")))
    cov = np.asarray(multihost_utils.process_allgather(out, tiled=True))

    # ---- (b) the production sharded aligner across processes ----
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from simdata import make_simdata
    from aligngraph_tpu.align.read_aligner import (
        pack_reads_np, revcomp_padded_np)
    from aligngraph_tpu.config import Config
    from aligngraph_tpu.ops.seeding import build_index
    from aligngraph_tpu.parallel.mesh import (
        make_sharded_aligner, shard_reads_pairwise)

    sim = make_simdata(seed=5, genome_len=10_000, n_pairs=64, read_len=80,
                       insert=400, snp_rate=0.01)
    n, L = 64, 80
    data = np.empty((2 * n, L), np.int8)
    for i in range(n):
        data[2 * i] = sim.reads1[i]
        data[2 * i + 1] = sim.reads2[i]
    plens = np.full(n, L, np.int32)
    cfg = Config(distance_low=100, distance_high=700)
    idx = build_index(sim.reference, cfg.seed_len)
    u2, nm = pack_reads_np(data)
    rc = revcomp_padded_np(data, np.repeat(plens, 2))
    u2r, nmr = pack_reads_np(rc)
    u2, nm, pl = shard_reads_pairwise(u2, nm, plens, n_dev)
    u2r, nmr, _ = shard_reads_pairwise(u2r, nmr, plens, n_dev)
    step = make_sharded_aligner(
        mesh, L=L, seed_len=cfg.seed_len, stride=cfg.seed_stride,
        pad=cfg.band_pad, C=cfg.max_candidates,
        dlow=cfg.distance_low, dhigh=cfg.distance_high,
        bsteps=idx.search_steps, sbits=idx.suffix_bits, c13=True)

    def glob2(a):       # rows 2 per pair: shard rows across processes
        per = a.shape[0] // nproc
        return multihost_utils.host_local_array_to_global_array(
            a[pid * per:(pid + 1) * per], mesh, P("dp"))

    def rep(a):        # replicated global array from a host-local copy
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, P())

    out2 = step(
        rep(sim.reference), rep(idx.sorted_kmers_np),
        rep(idx.sorted_posflip_np), rep(idx.bucket_lo_np),
        glob2(u2), glob2(nm), glob2(u2r), glob2(nmr), glob2(pl))
    n_valid_total = int(np.asarray(
        multihost_utils.process_allgather(out2["n_valid_total"],
                                          tiled=True))[0])
    bufs = np.asarray(multihost_utils.process_allgather(out2["buf"],
                                                        tiled=True))

    # ---- (c) position-sharded k-mer GRAPH build across processes ----
    # (D2/D3: km_*/ed_* tensors sharded over the 2-process mesh; row
    # routing / slot give-back / edge candidates ride all_to_all across
    # the process boundary.  Parent compares vs the host oracle.)
    from aligngraph_tpu.align.read_aligner import ReadAligner
    from aligngraph_tpu.config import THRESHOLD
    from aligngraph_tpu.graph.model import GraphTensors
    from aligngraph_tpu.io.formalize import Reads
    from aligngraph_tpu.parallel.kmer_shard import build_kmer_layer_sharded
    from aligngraph_tpu.pipeline.driver import _subset_pairs
    from jax.sharding import Mesh

    ref = np.asarray(sim.reference, np.int8)
    kreads = Reads(n, L, data, plens)
    krali = ReadAligner.build(ref, cfg).align(kreads)
    krali = _subset_pairs(krali, krali.ratio_ok(THRESHOLD))
    g_sh = GraphTensors.create(ref)
    kmesh = Mesh(np.array(jax.devices()[:n_dev]), ("pos",))

    def mput(a, spec):
        a = np.asarray(a)
        if spec == P("pos"):
            per = -(-a.shape[0] // nproc)
            pad = nproc * per - a.shape[0]
            if pad:
                a = np.concatenate(
                    [a, np.zeros((pad,) + a.shape[1:], a.dtype)])
            loc = a[pid * per:(pid + 1) * per]
        else:
            loc = a
        return multihost_utils.host_local_array_to_global_array(
            loc, kmesh, spec)

    def mget(v):
        return np.asarray(
            multihost_utils.process_allgather(v, tiled=True))

    # note: mput pads the leading axis to a multiple of nproc; the
    # build pads to a multiple of n_dev itself first, so shapes agree
    build_kmer_layer_sharded(g_sh, krali, kreads, cfg.k_mer,
                             cfg.insert_variation, kmesh,
                             put=mput, get=mget)

    if pid == 0:
        import dataclasses as _dc
        rec = {f"rali_{fld.name}": getattr(krali, fld.name)
               for fld in _dc.fields(krali)}
        np.savez(os.path.join(outdir, "result.npz"), cov=cov,
                 starts=starts, ends=ends, G=G,
                 n_valid_total=n_valid_total,
                 bufs=bufs.reshape(n_dev, -1), pl=pl,
                 reads_data=data, ref=ref,
                 km_cnt=g_sh.km_cnt, km_cov=g_sh.km_cov,
                 km_votes=g_sh.km_votes, km_s=g_sh.km_s,
                 ed_cnt=g_sh.ed_cnt, ed_pos=g_sh.ed_pos.view(np.int32),
                 ed_item=g_sh.ed_item, **rec)
    jax.distributed.shutdown()
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
