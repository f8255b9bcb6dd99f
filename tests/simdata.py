"""Synthetic genome / reads / contigs simulator for tests and benchmarks.

Models the reference's intended workload (AlignGraph paper setting): a target
genome, a closely related reference genome (target + SNPs/small indels),
PE reads simulated from the *target*, and incomplete draft contigs (fragments
of the target with gaps) to be extended.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from aligngraph_tpu.io.fasta import decode

BASES = 4


@dataclasses.dataclass
class SimData:
    target: np.ndarray          # the "true" genome being re-assembled
    reference: np.ndarray       # closely related reference (mutated target)
    reads1: List[np.ndarray]    # mate-1 sequences (encoded)
    reads2: List[np.ndarray]
    read_pos: np.ndarray        # mate-1 start on target (for debugging)
    contigs: List[np.ndarray]   # draft contig fragments of the target
    contig_pos: List[Tuple[int, int]]  # (start, end) on target


def random_genome(rng: np.random.Generator, length: int) -> np.ndarray:
    return rng.integers(0, BASES, size=length).astype(np.int8)


def mutate(rng: np.random.Generator, seq: np.ndarray, snp_rate: float = 0.01,
           indel_rate: float = 0.0005, max_indel: int = 3) -> np.ndarray:
    """SNPs + small indels -> a 'closely related' genome."""
    out: List[np.ndarray] = []
    i = 0
    n = len(seq)
    snp_mask = rng.random(n) < snp_rate
    indel_mask = rng.random(n) < indel_rate
    while i < n:
        b = seq[i]
        if snp_mask[i]:
            b = (b + rng.integers(1, BASES)) % BASES
        if indel_mask[i]:
            if rng.random() < 0.5:  # deletion from target
                i += int(rng.integers(1, max_indel + 1))
                continue
            ins = rng.integers(0, BASES, size=int(rng.integers(1, max_indel + 1)))
            out.append(np.array([b], dtype=np.int8))
            out.append(ins.astype(np.int8))
            i += 1
            continue
        out.append(np.array([b], dtype=np.int8))
        i += 1
    return np.concatenate(out) if out else np.zeros(0, np.int8)


def revcomp_np(seq: np.ndarray) -> np.ndarray:
    comp = np.array([3, 2, 1, 0, 4], dtype=np.int8)
    return comp[seq][::-1]


def simulate_reads(rng: np.random.Generator, target: np.ndarray,
                   n_pairs: int, read_len: int = 100, insert: int = 500,
                   insert_sd: int = 30, err_rate: float = 0.005):
    """FR-orientation PE reads: mate1 forward at p, mate2 = revcomp of
    [p+ins-L, p+ins)."""
    n = len(target)
    reads1, reads2, poss = [], [], []
    for _ in range(n_pairs):
        ins = int(np.clip(rng.normal(insert, insert_sd), 2 * read_len, n - 1))
        p = int(rng.integers(0, n - ins))
        r1 = target[p:p + read_len].copy()
        r2 = revcomp_np(target[p + ins - read_len:p + ins])
        for r in (r1, r2):
            errs = np.nonzero(rng.random(read_len) < err_rate)[0]
            r[errs] = (r[errs] + rng.integers(1, BASES, size=len(errs))) % BASES
        reads1.append(r1)
        reads2.append(r2)
        poss.append(p)
    return reads1, reads2, np.array(poss)


def simulate_contigs(rng: np.random.Generator, target: np.ndarray,
                     n_contigs: int, mean_len: int = 3000,
                     min_len: int = 400):
    """Disjoint draft fragments of the target with gaps between them."""
    n = len(target)
    starts = np.sort(rng.choice(n, size=n_contigs, replace=False))
    contigs, pos = [], []
    prev_end = 0
    for s in starts:
        s = max(int(s), prev_end + 50)
        ln = max(min_len, int(rng.normal(mean_len, mean_len // 3)))
        e = min(s + ln, n)
        if e - s < min_len or s >= n:
            continue
        contigs.append(target[s:e].copy())
        pos.append((s, e))
        prev_end = e
    return contigs, pos


def make_simdata(seed: int = 0, genome_len: int = 50_000, n_pairs: int = 2000,
                 read_len: int = 100, insert: int = 500, n_contigs: int = 12,
                 snp_rate: float = 0.01, err_rate: float = 0.005) -> SimData:
    rng = np.random.default_rng(seed)
    target = random_genome(rng, genome_len)
    reference = mutate(rng, target, snp_rate=snp_rate)
    reads1, reads2, read_pos = simulate_reads(
        rng, target, n_pairs, read_len=read_len, insert=insert,
        err_rate=err_rate)
    contigs, contig_pos = simulate_contigs(rng, target, n_contigs)
    return SimData(target, reference, reads1, reads2, read_pos,
                   contigs, contig_pos)


def write_fasta_seqs(path, seqs, prefix="seq"):
    from aligngraph_tpu.io.fasta import write_fasta
    ids = [f"{prefix}{i}" for i in range(len(seqs))]
    write_fasta(path, ids, [decode(s) for s in seqs])
    return ids
