"""Configuration / CLI flag system.

Mirrors the reference's flag surface and validation exactly
(ref: AlignGraph/AlignGraph.cpp:4329-4646 `getParameters`, :4696-4731 `main`
defaults + validation, :4299-4302 `setCommand`), redesigned as a dataclass
with a serializable round-trip (the reference serializes argv one token per
line to `command.txt` and re-parses it; we keep that capability for
`--resume` compatibility semantics).

Reference defaults (AlignGraph.cpp:4701): kMer=5, insertVariation=50,
coverage=20, part=1, distanceLow=0, distanceHigh=MAX(99999).
Validation (AlignGraph.cpp:4726): 1 <= part <= 10, distanceLow <=
distanceHigh, kMer <= max read length (checked after reading reads).
Hidden flag `--uniqueExtension` (AlignGraph.cpp:4598-4606).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

# Reference compile-time constants (AlignGraph.cpp:27-42). SI/SD are 0 in the
# reference build, which disables every "small indel" branch — those paths are
# intentionally NOT implemented here (SURVEY.md "quirks to preserve").
MAX = 99999
INIT_CONTIG_THRESHOLD = 0.5   # AlignGraph.cpp:29 (OPTIMIZATION build)
CONTIG_THRESHOLD = 0.5        # AlignGraph.cpp:33
THRESHOLD = 0.6               # AlignGraph.cpp:34  (read-pair ratio filter)
BATCH = 1_000_000             # AlignGraph.cpp:37  (read streaming, lines)
EP = 5                        # AlignGraph.cpp:39  (compatibility epsilon unit)
LARGE_CHUNK = 1_000_000       # AlignGraph.cpp:40  (contig chunk size)
SMALL_CHUNK = 20_000          # AlignGraph.cpp:41  (refinement truncation)
MIN_THRESHOLD = 0.1           # AlignGraph.cpp:42
OPTIMIZATION = True           # AlignGraph.cpp:25  (cross-contig join rule on)


class ConfigError(ValueError):
    pass


@dataclasses.dataclass
class Config:
    """All run parameters. Field names follow the reference CLI flags."""

    # Required I/O (reference: --read1/--read2/--contig/--genome/
    # --extendedContig/--remainingContig)
    read1: Optional[str] = None
    read2: Optional[str] = None
    contig: Optional[str] = None
    genome: Optional[str] = None
    extended_contig: Optional[str] = None
    remaining_contig: Optional[str] = None

    # Required numeric (reference: --distanceLow/--distanceHigh)
    distance_low: int = 0
    distance_high: int = MAX

    # Options with reference defaults (AlignGraph.cpp:4701)
    k_mer: int = 5
    insert_variation: int = 50
    coverage: int = 20
    part: int = 1

    # Boolean modes
    fast_map: bool = False
    ratio_check: bool = False
    iterative_map: bool = False
    misassembly_removal: bool = False
    resume: bool = False
    unique_extension: bool = False   # hidden flag, AlignGraph.cpp:4598

    # Engine knobs that have no reference analog (ours; all deterministic)
    # 13 (not 15): 2*13 = 26 bits fits the 26-bit prefix table exactly, so
    # big-genome seed lookups are direct-addressed (suffix_bits = 0 — no
    # binary probes, no key-row gather; ~28 ms/32k-pair batch saved on
    # v5e).  Shorter seeds are also strictly more sensitive; specificity
    # is restored by the candidate voting + DP score-min filters.
    seed_len: int = 13               # exact-match seed length (odd, <=13)
    seed_stride: int = 12            # seed sampling stride along the read
    max_seed_hits: int = 8           # repetitive-seed cutoff (see BASELINE.md
                                     # recall table: 8 is lossless at E. coli
                                     # scale; raise for repeat-heavy genomes)
    band_pad: int = 16               # banded-DP half-band beyond seed diagonal
    max_candidates: int = 4          # candidate diagonals per read before DP
    # k-mer graph build backend: "host" (numpy oracle) or "device" (jitted
    # build, graph tensors resident on the accelerator; bit-identical
    # results — tests/test_kmer_jit.py).  Host is the default because on
    # a PCIe/ICI-attached TPU the device build wins outright, but on this
    # machine's tunneled chip the final graph d2h transfer (~15 MB/s)
    # dominates; see BASELINE.md "device graph build" for the numbers.
    graph_build: str = "host"
    work_dir: str = "tmp"            # checkpoint/artifact dir (ref: tmp/)
    stream_reads: bool = False       # force memmap-backed read matrix
    stream_reads_threshold: int = 1 << 28   # auto-memmap above this size

    # ---- flag <-> field maps (reference CLI spelling) -------------------
    _FLAGS = {
        "--read1": "read1",
        "--read2": "read2",
        "--contig": "contig",
        "--genome": "genome",
        "--extendedContig": "extended_contig",
        "--remainingContig": "remaining_contig",
        "--distanceLow": "distance_low",
        "--distanceHigh": "distance_high",
        "--kMer": "k_mer",
        "--insertVariation": "insert_variation",
        "--coverage": "coverage",
        "--part": "part",
    }
    _BOOL_FLAGS = {
        "--fastMap": "fast_map",
        "--ratioCheck": "ratio_check",
        "--iterativeMap": "iterative_map",
        "--misassemblyRemoval": "misassembly_removal",
        "--resume": "resume",
        "--uniqueExtension": "unique_extension",
    }
    _INT_FIELDS = {
        "distance_low", "distance_high", "k_mer", "insert_variation",
        "coverage", "part",
    }

    def validate(self, max_read_length: Optional[int] = None) -> None:
        """Reference validation (AlignGraph.cpp:4726-4731 + getParameters)."""
        if not (1 <= self.part <= 10):
            raise ConfigError("part must be in [1, 10]")
        if self.distance_low > self.distance_high:
            raise ConfigError("distanceLow must be <= distanceHigh")
        if self.k_mer < 1:
            raise ConfigError("kMer must be >= 1")
        if max_read_length is not None and self.k_mer > max_read_length:
            raise ConfigError("kMer must be <= max read length")
        if not self.resume:
            for f in ("read1", "read2", "contig", "genome",
                      "extended_contig", "remaining_contig"):
                if getattr(self, f) is None:
                    raise ConfigError(f"missing required input: {f}")

    # ---- argv round-trip (reference command.txt semantics) --------------
    @classmethod
    def from_argv(cls, argv: List[str]) -> "Config":
        """Parse reference-style argv. Duplicate flags are an error
        (ref: getParameters duplicate detection, AlignGraph.cpp:4337+)."""
        cfg = cls()
        seen = set()
        i = 0
        while i < len(argv):
            tok = argv[i]
            if tok in cls._BOOL_FLAGS:
                field = cls._BOOL_FLAGS[tok]
                if field in seen:
                    raise ConfigError(f"duplicate flag {tok}")
                seen.add(field)
                setattr(cfg, field, True)
                i += 1
            elif tok in cls._FLAGS:
                field = cls._FLAGS[tok]
                if field in seen:
                    raise ConfigError(f"duplicate flag {tok}")
                seen.add(field)
                if i + 1 >= len(argv):
                    raise ConfigError(f"flag {tok} needs a value")
                val = argv[i + 1]
                if field in cls._INT_FIELDS:
                    try:
                        ival = int(val)
                    except ValueError:
                        raise ConfigError(f"flag {tok} needs an integer, "
                                          f"got {val!r}") from None
                    # numeric round-trip validation (ref :4329-4646 re-prints
                    # and compares the parsed number)
                    if str(ival) != val:
                        raise ConfigError(f"flag {tok}: non-canonical "
                                          f"integer {val!r}")
                    setattr(cfg, field, ival)
                else:
                    setattr(cfg, field, val)
                i += 2
            else:
                raise ConfigError(f"unknown flag {tok}")
        # --resume must be the only flag (AlignGraph.cpp:4627)
        if cfg.resume and len(seen) > 1:
            raise ConfigError("--resume must be the only argument")
        return cfg

    def to_argv(self) -> List[str]:
        default = Config()
        argv: List[str] = []
        for flag, field in self._FLAGS.items():
            val = getattr(self, field)
            if val is not None and val != getattr(default, field):
                argv += [flag, str(val)]
        # always serialize the required numeric flags for round-trip fidelity
        for flag in ("--distanceLow", "--distanceHigh"):
            if flag not in argv:
                argv += [flag, str(getattr(self, self._FLAGS[flag]))]
        for flag, field in self._BOOL_FLAGS.items():
            if getattr(self, field) and field != "resume":
                argv.append(flag)
        return argv

    # command.txt round-trip: one token per line (setCommand,
    # AlignGraph.cpp:4299-4302 / re-parse :4721)
    def save_command(self, path: str) -> None:
        with open(path, "w") as f:
            for tok in self.to_argv():
                f.write(tok + "\n")

    @classmethod
    def load_command(cls, path: str) -> "Config":
        with open(path) as f:
            toks = [ln.strip() for ln in f if ln.strip()]
        return cls.from_argv(toks)
