"""Predicate tables (SURVEY.md §4): compatible / conflict / close /
overlap / contain semantics pinned against hand-evaluated reference cases
(AlignGraph.cpp:1293-1312, 1897-1902, 2388-2394; Eval-AlignGraph.cpp:
122-137)."""

import numpy as np
import pytest

from aligngraph_tpu.evaluate.evaluate import _close, _conflict
from aligngraph_tpu.graph.kmer_layer import _compat_vec
from aligngraph_tpu.graph.traverse import _contain, _overlap

NONE = -1
WIN = 2 * 50 + 25   # insertVariation=50 -> 125


def compat(gc, gf, gc0, gf0, gg0, sc, sf, sc0, sf0, sg0):
    a = lambda v: np.array([v], np.int64)
    return bool(_compat_vec(a(gc), a(gf), a(gc0), a(gf0), a(gg0),
                            a(sc), a(sf), a(sc0), a(sf0), a(sg0), WIN)[0])


# ---- compatible() (AlignGraph.cpp:1293-1312, OPTIMIZATION build) ----

@pytest.mark.parametrize("case,expect", [
    # own-contig clause: same id within 5*EP=25 -> ok
    (dict(gc=3, gf=100, sc=3, sf=125), True),
    (dict(gc=3, gf=100, sc=3, sf=126), False),
    # either side no anchor -> ok
    (dict(gc=NONE, gf=NONE, sc=3, sf=999), True),
    (dict(gc=3, gf=0, sc=NONE, sf=NONE), True),
    # OPTIMIZATION: different contig ids are compatible (the join rule)
    (dict(gc=3, gf=0, sc=7, sf=10**6), True),
    # mate-contig clause: same id within 2*iv+25=125
    (dict(gc0=2, gf0=500, sc0=2, sf0=625), True),
    (dict(gc0=2, gf0=500, sc0=2, sf0=626), False),
    (dict(gc0=2, gf0=0, sc0=9, sf0=10**6), True),   # different ids ok
    # mate-genome clause: NO different-id escape; within 125 only
    (dict(gg0=1000, sg0=1125), True),
    (dict(gg0=1000, sg0=1126), False),
    (dict(gg0=NONE, sg0=5), True),
])
def test_compatible_table(case, expect):
    base = dict(gc=NONE, gf=NONE, gc0=NONE, gf0=NONE, gg0=NONE,
                sc=NONE, sf=NONE, sc0=NONE, sf0=NONE, sg0=NONE)
    base.update(case)
    assert compat(**base) is expect


# ---- conflict() (Eval-AlignGraph.cpp:122-129) ----

@pytest.mark.parametrize("a,b,expect", [
    ((0, 500), (400, 900), True),    # 100bp overlap
    ((0, 500), (401, 900), False),   # 99bp overlap
    ((0, 900), (100, 200), True),    # containment (any size)
    ((100, 200), (0, 900), True),
    ((0, 100), (200, 300), False),   # disjoint
])
def test_conflict_table(a, b, expect):
    assert _conflict(a[0], a[1], b[0], b[1]) is expect


# ---- close() ----

def test_close_table():
    assert _close(100, 109, 10)
    assert not _close(100, 110, 10)
    assert _close(110, 101, 10)      # abs


# ---- overlap() (AlignGraph.cpp:2388-2394) ----

@pytest.mark.parametrize("x1,y1,x2,y2,expect", [
    (0, 100, 50, 200, True),     # partial overlap
    (0, 100, 100, 200, False),   # touching (strict > 0 difference)
    (0, 100, 101, 200, False),   # disjoint
    (0, 300, 100, 200, True),    # containment
    (100, 200, 0, 300, True),
    (50, 50, 0, 100, False),     # zero-width
])
def test_overlap_table(x1, y1, x2, y2, expect):
    assert _overlap(x1, y1, x2, y2) is expect


# ---- contain() (AlignGraph.cpp:1897-1902) ----

def test_contain_table():
    assert _contain(0, 10, 0, 100, 0, 20, 0, 90)
    assert not _contain(0, 10, 0, 100, 0, 5, 0, 90)     # starts before
    assert not _contain(0, 10, 0, 100, 0, 20, 0, 110)   # ends after
    assert not _contain(0, 10, 1, 100, 0, 20, 0, 90)    # id mismatch
    # unsigned compare quirk: -1 (NONE) offsets are huge
    assert _contain(0, 0, 0, 0xFFFFFFFF, 0, 5, 0, 10)


# ---- consensus tie priority (AlignGraph.cpp:1944-1952) ----

def test_consensus_priority():
    from aligngraph_tpu.graph.traverse import _consensus
    v = np.array([2, 2, 1, 0, 0])
    assert _consensus(v, 3) == 0          # A beats C on tie
    v = np.array([0, 0, 0, 0, 0])
    assert _consensus(v, 2) == 2          # all-zero -> genome base
    v = np.array([0, 1, 1, 1, 1])
    assert _consensus(v, 0) == 1          # C beats G/T/N on tie
