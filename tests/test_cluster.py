"""Connected-components correctness vs a driver-side union-find oracle.

Mirrors the reference's hand-computed-golden test style
(``/root/reference/test/max_product_test.py``) plus randomized graphs for
the scale paths (chain = transitivity, star = skew, random = convergence)
per FIXTURES.md §7.
"""

import random

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.cluster import connected_components


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # path-compress fully to the min representative
    return {x: find(x) for x in parent}


def _check(spark, edges, **cc_kwargs):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, **cc_kwargs).collect()
    }
    exp = _union_find(None, edges)
    # union-find roots are the min of each component because union() always
    # parents the larger root — still normalize via a second pass
    comp_min = {}
    for node, root in exp.items():
        comp_min.setdefault(root, node)
        comp_min[root] = min(comp_min[root], node)
    exp_norm = {node: comp_min[root] for node, root in exp.items()}
    assert got == exp_norm


def test_chain(spark):
    _check(spark, [(i, i + 1) for i in range(20)])


def test_two_components_and_star(spark):
    edges = [(0, i) for i in range(1, 30)]  # star hub 0
    edges += [(100, 101), (101, 102), (103, 102)]
    _check(spark, edges)


def test_self_loops_and_dups(spark):
    _check(spark, [(1, 1), (1, 2), (2, 1), (2, 3), (5, 5)])


def test_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(300))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(250)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_singleton_nodes_kept(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = connected_components(df)
    assert out.count() == 2


def test_unconverged_warns(spark):
    import warnings

    from entity_linking_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "src long, dst long"
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        connected_components(edges, max_iter=1).collect()
    assert any("fixpoint" in str(w.message) for w in rec)


def test_reliable_checkpoint_dir(spark, tmp_path):
    # checkpoint_dir switches localCheckpoint → reliable checkpoint: the
    # result is identical and checkpoint files land under the given dir
    import os

    edges = [(i, i + 1) for i in range(15)] + [(100, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ckdir = str(tmp_path / "cc_ckpt")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, checkpoint_dir=ckdir).collect()
    }
    exp = {i: 0 for i in range(16)} | {100: 100, 101: 100}
    assert got == exp
    # reliable checkpoints were actually written to the shared dir
    found = [
        f for root, _, files in os.walk(ckdir) for f in files
    ]
    assert found, "no checkpoint files written to checkpoint_dir"
    # superseded round checkpoints are deleted (round-4 advice): only the
    # live set remains — raw + the final edge set — not O(rounds) copies
    rdd_dirs = [
        d for root, dirs, _ in os.walk(ckdir) for d in dirs
        if d.startswith("rdd-")
    ]
    assert len(rdd_dirs) <= 2, rdd_dirs
    # the session checkpoint dir is handed back (no global clobber)
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()
    assert not (opt.isDefined() and "cc_ckpt" in opt.get()), (
        "connected_components left its checkpoint dir set on the context"
    )


@pytest.mark.parametrize("fuse_rounds", [1, 2, 3])
@pytest.mark.parametrize("reliable", [False, True])
def test_fuse_rounds_parity(spark, tmp_path, fuse_rounds, reliable):
    # the documented 1-core-executor knob (operators/cluster.py fuse_rounds)
    # must be a pure performance choice: every fuse factor — with both the
    # localCheckpoint and reliable-checkpoint lineage truncation — yields
    # the identical component assignment on a graph mixing a chain
    # (worst-case diameter), a star (skew), self-loops and duplicates
    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(25)]          # chain
    edges += [(200, 200 + i) for i in range(1, 20)]  # star
    edges += [(3, 3), (10, 11), (11, 10)]            # self-loop + dups
    edges += [
        (rng.randrange(400, 450), rng.randrange(400, 450)) for _ in range(40)
    ]
    kwargs = {"fuse_rounds": fuse_rounds}
    if reliable:
        kwargs["checkpoint_dir"] = str(
            tmp_path / f"cc_fuse{fuse_rounds}"
        )
    _check(spark, [(a, b) for a, b in edges if a != b or a == 3], **kwargs)
