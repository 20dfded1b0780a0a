"""Golden + hostile-identifier + property tests for the round-6 operator
trio: PageRank (operators/graph.py), changelog MERGE (operators/merge.py),
and count-min / Bloom sketches (operators/sketches.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

HOSTILE = ["a.b", "a b", "a'b", "a`b", "select"]

# ------------------------------------------------------------------ graph

EDGES = [
    (1, 2, 1.0),
    (2, 1, 1.0),
    (1, 3, 2.0),
    (3, 1, 1.0),
    (2, 3, 1.0),
    (3, 2, 1.0),
]


def _numpy_pagerank(edges, iterations, damping=0.85):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    out_w: dict = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    P = np.zeros((len(nodes), len(nodes)))
    for s, d, w in edges:
        P[idx[d], idx[s]] = w / out_w[s]
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(iterations):
        r = (1.0 - damping) / len(nodes) + damping * (P @ r)
    return {n: r[idx[n]] for n in nodes}


@pytest.mark.parametrize("iterations", [1, 3, 8])
def test_pagerank_matches_power_iteration(spark, iterations):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", "w", iterations=iterations).collect()
    }
    want = _numpy_pagerank(EDGES, iterations)
    assert got.keys() == want.keys()
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9), (n, iterations)
    # probability mass is conserved (graph is symmetrized: out-degree >= 1)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted_default(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    df = spark.createDataFrame([(e[0], e[1]) for e in EDGES], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst").collect()}
    want = _numpy_pagerank([(s, d, 1.0) for s, d, _ in EDGES], 3)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)


@pytest.mark.parametrize("name", HOSTILE)
def test_pagerank_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    want = _numpy_pagerank(EDGES, 2)
    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    for role in ("src", "dst", "w"):
        cols = {"src": "src", "dst": "dst", "w": "w"}
        cols[role] = name
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                df.withColumnRenamed(role, name),
                src=cols["src"],
                dst=cols["dst"],
                weight=cols["w"],
                iterations=2,
            ).collect()
        }
        for n in want:
            assert got[n] == pytest.approx(want[n], abs=1e-9), role


def test_pagerank_default_checkpoint_cuts_lineage(spark):
    """The default checkpoint_every (2) must actually fire within the
    default-scale loop — the r6 defect was a cut that never triggered. The
    observable: at 8 iterations the final plan of the default path is far
    smaller than a never-cut run (the uncut plan grows with each round)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    cut = pagerank(df, "src", "dst", "w", iterations=8)
    uncut = pagerank(df, "src", "dst", "w", iterations=8, checkpoint_every=100)
    cut_len = len(cut._jdf.queryExecution().optimizedPlan().toString())
    uncut_len = len(uncut._jdf.queryExecution().optimizedPlan().toString())
    assert cut_len * 2 < uncut_len, (cut_len, uncut_len)
    # and the cut plan still computes the right answer
    want = _numpy_pagerank(EDGES, 8)
    got = {r["node"]: r["rank"] for r in cut.collect()}
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)


# ------------------------------------------------------------------ merge


def test_merge_changelog_golden(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.merge import merge_changelog

    base = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)], ["k", "name", "val"]
    )
    # multi-version key 1 (latest wins), delete 2, insert 4, untouched 3
    changes = spark.createDataFrame(
        [
            (1, "U", 1, "x1", 11.0),
            (1, "U", 3, "x3", 13.0),
            (1, "U", 2, "x2", 12.0),
            (2, "D", 1, None, None),
            (4, "I", 1, "w", 40.0),
        ],
        ["k", "op", "seq", "name", "val"],
    )
    out = merge_changelog(base, changes, ["k"])
    assert out.columns == ["k", "name", "val"]
    got = {r["k"]: (r["name"], r["val"]) for r in out.collect()}
    assert got == {1: ("x3", 13.0), 3: ("z", 30.0), 4: ("w", 40.0)}


def test_merge_changelog_delete_then_reinsert_latest_wins(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.merge import merge_changelog

    base = spark.createDataFrame([(1, "x")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, "D", 1, None), (1, "I", 2, "x2")], ["k", "op", "seq", "v"]
    )
    got = {r["k"]: r["v"] for r in merge_changelog(base, changes, ["k"]).collect()}
    assert got == {1: "x2"}
    # and with the order flipped by seq, the delete wins
    changes2 = spark.createDataFrame(
        [(1, "D", 2, None), (1, "I", 1, "x2")], ["k", "op", "seq", "v"]
    )
    assert merge_changelog(base, changes2, ["k"]).count() == 0


def test_latest_changes_tie_breaks(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.merge import latest_changes

    df = spark.createDataFrame(
        [(1, 5, "a", "v1"), (1, 5, "b", "v2")], ["k", "seq", "batch", "v"]
    )
    got = latest_changes(df, ["k"], "seq", tie_breaks=["batch"]).collect()
    assert len(got) == 1 and got[0]["v"] == "v2"


def test_merge_changelog_null_key_rows(spark):
    """NULL merge keys are legal (eqNullSafe): a NULL-key change updates the
    NULL-key base row, not every row."""
    from real_time_recommendation_system_with_feature_store_spark.operators.merge import merge_changelog

    base = spark.createDataFrame([(None, "x"), (1, "y")], "k int, v string")
    changes = spark.createDataFrame(
        [(None, "U", 1, "x2")], "k int, op string, seq int, v string"
    )
    got = {r["k"]: r["v"] for r in merge_changelog(base, changes, ["k"]).collect()}
    assert got == {None: "x2", 1: "y"}


@pytest.mark.parametrize("name", HOSTILE)
def test_merge_changelog_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.merge import merge_changelog

    # hostile name as the key, the value column, the seq, and the op column
    base = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    changes = spark.createDataFrame(
        [(2, "D", 1, None), (3, "I", 1, "w")], ["k", "op", "seq", "v"]
    )
    for role in ("k", "v", "op", "seq"):
        b = base.withColumnRenamed(role, name) if role in base.columns else base
        c = changes.withColumnRenamed(role, name)
        kwargs = dict(
            keys=[name if role == "k" else "k"],
            op_col=name if role == "op" else "op",
            seq_col=name if role == "seq" else "seq",
        )
        out = merge_changelog(b, c, **kwargs)
        key_name = name if role == "k" else "k"
        val_name = name if role == "v" else "v"
        got = {r[key_name]: r[val_name] for r in out.collect()}
        assert got == {1: "x", 3: "w"}, role


def test_merge_changelog_reserved_names_rejected(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.merge import merge_changelog

    base = spark.createDataFrame([(1, "x")], ["k", "__op"])
    changes = spark.createDataFrame([(1, "U", 1, "y")], ["k", "op", "seq", "__op"])
    with pytest.raises(ValueError, match="reserved"):
        merge_changelog(base, changes, ["k"])


# ---------------------------------------------------------------- sketches


def test_cms_exact_at_wide_width(spark):
    """With width >> #keys the (deterministic) collision probability is
    negligible in this fixture and estimates equal exact counts; NULL keys
    are skipped by the build and estimate NULL."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_build, cms_estimate

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [(None,)] * 2
    df = spark.createDataFrame(rows, "k string")
    sk = cms_build(df, F.col("k"), width=4096)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("nope",), (None,)], "k string")
    got = {
        r["k"]: r["est_count"]
        for r in cms_estimate(probes, sk, F.col("k"), width=4096).collect()
    }
    assert got == {"a": 5, "b": 3, "c": 1, "nope": 0, None: None}


def test_cms_overestimates_only_and_merge_equals_full_build(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rows = [(f"k{i % 17}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string").withColumn(
        "half", (F.length("k") + F.crc32("k") % 2).cast("int")
    )
    sk_full = cms_build(df, F.col("k"), width=16)
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    probes = spark.createDataFrame([(k,) for k in exact], "k string")
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(probes, sk_full, F.col("k"), width=16).collect()
    }
    assert all(est[k] >= exact[k] for k in exact), (est, exact)
    # mergeability: sketch(a) ⊕ sketch(b) == sketch(a ∪ b), cell by cell
    a = df.where(F.crc32("k") % 2 == 0)
    b = df.where(F.crc32("k") % 2 == 1)
    merged = cms_merge(cms_build(a, F.col("k"), width=16), cms_build(b, F.col("k"), width=16))
    full_cells = {(r["row"], r["bucket"]): r["cell_count"] for r in sk_full.collect()}
    merged_cells = {(r["row"], r["bucket"]): r["cell_count"] for r in merged.collect()}
    assert merged_cells == full_cells


def test_cms_weighted(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 7)], ["k", "w"])
    sk = cms_build(df, F.col("k"), width=4096, weight=F.col("w").cast("long"))
    got = {
        r["k"]: r["est_count"]
        for r in cms_estimate(
            spark.createDataFrame([("a",), ("b",)], "k string"), sk, F.col("k"), width=4096
        ).collect()
    }
    assert got == {"a": 15, "b": 7}


def test_bloom_no_false_negatives_and_null_false(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import bloom_build, bloom_might_contain

    members = spark.createDataFrame([(f"m{i}",) for i in range(50)] + [(None,)], "k string")
    bits = bloom_build(members, F.col("k"))
    probes = spark.createDataFrame(
        [(f"m{i}",) for i in range(50)] + [("absent-xyz",), (None,)], "k string"
    )
    got = {
        r["k"]: r["bloom_pass"]
        for r in bloom_might_contain(probes, bits, F.col("k")).collect()
    }
    assert all(got[f"m{i}"] for i in range(50))  # no false negatives, ever
    assert got[None] is False


def test_bloom_empty_members_rejects_everything(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import bloom_build, bloom_might_contain

    members = spark.createDataFrame([], "k string")
    bits = bloom_build(members, F.col("k"))
    probes = spark.createDataFrame([("a",), ("b",)], "k string")
    got = [r["bloom_pass"] for r in bloom_might_contain(probes, bits, F.col("k")).collect()]
    assert got == [False, False]


def test_bloom_union_merge(spark):
    """Filters over disjoint member sets merge by union+distinct of bit
    frames — same pass/fail surface as building over the union."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import bloom_build, bloom_might_contain

    a = spark.createDataFrame([("a1",), ("a2",)], "k string")
    b = spark.createDataFrame([("b1",), ("b2",)], "k string")
    merged_bits = bloom_build(a, F.col("k")).union(bloom_build(b, F.col("k"))).distinct()
    full_bits = bloom_build(a.union(b), F.col("k"))
    assert sorted(r["bit"] for r in merged_bits.collect()) == sorted(
        r["bit"] for r in full_bits.collect()
    )
    probes = spark.createDataFrame([("a1",), ("b2",), ("zz",)], "k string")
    got = {
        r["k"]: r["bloom_pass"]
        for r in bloom_might_contain(probes, merged_bits, F.col("k")).collect()
    }
    assert got["a1"] and got["b2"]


def test_bloom_reserved_probe_names_rejected(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import bloom_build, bloom_might_contain

    bits = bloom_build(spark.createDataFrame([("a",)], "k string"), F.col("k"))
    probe = spark.createDataFrame([("a", 1)], ["k", "__wmap"])
    with pytest.raises(ValueError, match="reserved"):
        bloom_might_contain(probe, bits, F.col("k"), materialize="broadcast")
    # literal mode adds no internal columns, so the same probe is legal
    got = bloom_might_contain(probe, bits, F.col("k"), materialize="literal").collect()
    assert got[0]["bloom_pass"] is True


def test_bloom_prune_preserves_exact_join(spark):
    """The composition contract: bloom-prune then exact semi join ==
    plain exact semi join (false positives die in the join; no false
    negatives exist)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import bloom_build, bloom_might_contain

    members = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "k int")
    probe = spark.createDataFrame([(i, i * 2) for i in range(100)], ["k", "v"])
    want = sorted(
        r["k"] for r in probe.join(members, "k", "left_semi").collect()
    )
    key = F.col("k").cast("string")
    bits = bloom_build(members, F.col("k").cast("string"))
    pruned = bloom_might_contain(probe, bits, key).where(F.col("bloom_pass"))
    got = sorted(r["k"] for r in pruned.join(members, "k", "left_semi").collect())
    assert got == want


# ------------------------------------------------------- cms skew-probe tier


def test_key_skew_cms_wide_width_equals_exact(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import key_skew_report

    rows = [("u1",)] * 8 + [("u2",)] * 4 + [("u3",)] * 2 + [("u4",)] * 1
    df = spark.createDataFrame(rows, "k string")
    exact = [tuple(r) for r in key_skew_report(df, ["k"], top=3).collect()]
    cms = [tuple(r) for r in key_skew_report(df, ["k"], top=3, method="cms").collect()]
    assert cms == exact  # width 4096 >> 4 keys: no collisions, same report


def test_key_skew_cms_overestimates_with_exact_total(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import key_skew_report

    rows = [(f"k{i % 13}",) for i in range(260)]
    df = spark.createDataFrame(rows, "k string")
    exact = {r["k"]: r["n_rows"] for r in key_skew_report(df, ["k"], top=13).collect()}
    got = key_skew_report(df, ["k"], top=13, method="cms", cms_width=8).collect()
    for r in got:
        assert r["n_rows"] >= exact[r["k"]], r
        # denominator is the exact total even when estimates collide
        assert r["share"] == round(r["n_rows"] / 260, 6), r


def test_key_skew_from_merged_cms_sketches(spark):
    """The 100 TB flow: per-half sketches merged == single full-build sketch,
    so the report off the merged sketch matches the one-pass cms report."""
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import key_skew_from_cms, key_skew_report
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_build, cms_merge

    rows = [(f"k{i % 11}", i) for i in range(220)]
    df = spark.createDataFrame(rows, ["k", "i"])
    a, b = df.where(F.col("i") % 2 == 0), df.where(F.col("i") % 2 == 1)
    key = F.coalesce(F.col("k").cast("string"), F.lit("\x00"))
    merged = cms_merge(
        cms_build(a, key, width=64), cms_build(b, key, width=64)
    )
    candidates = df.select("k").distinct()
    from_merged = [
        tuple(r)
        for r in key_skew_from_cms(merged, candidates, ["k"], top=11, width=64).collect()
    ]
    one_pass = [
        tuple(r)
        for r in key_skew_report(df.select("k"), ["k"], top=11, method="cms", cms_width=64).collect()
    ]
    assert from_merged == one_pass


@pytest.mark.parametrize("name", ["a.b", "select"])
def test_key_skew_cms_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import key_skew_report

    df = spark.createDataFrame(
        [("x",), ("x",), ("x",), ("y",)], f"`{name.replace('`', '``')}` string"
    )
    got = {
        r[name]: (r["n_rows"], r["share"])
        for r in key_skew_report(df, [name], top=2, method="cms").collect()
    }
    assert got == {"x": (3, 0.75), "y": (1, 0.25)}


def test_key_skew_cms_null_keys_ranked(spark):
    """NULL keys are legitimate skew candidates (a NULL-heavy column is the
    classic skew cause); the chr(0) sentinel keeps them counted."""
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import key_skew_report

    df = spark.createDataFrame([(None,)] * 5 + [("a",)] * 2, "k string")
    got = {r["k"]: r["n_rows"] for r in key_skew_report(df, ["k"], top=2, method="cms").collect()}
    assert got == {None: 5, "a": 2}


def test_pagerank_empty_edges(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src int, dst int, w double")
    out = pagerank(empty, "src", "dst", "w")
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_personalized_pagerank_matches_power_iteration(spark):
    """reset= switches to random-walk-with-restart: teleport mass follows
    the (normalized) seed weights, zero elsewhere; r0 = the reset vector."""
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    seeds = spark.createDataFrame([(1, 3.0), (2, 1.0)], ["node", "weight"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", "w", iterations=3, reset=seeds).collect()
    }
    # numpy replication
    nodes = sorted({s for s, _, _ in EDGES} | {d for _, d, _ in EDGES})
    idx = {n: i for i, n in enumerate(nodes)}
    out_w: dict = {}
    for s, _, w in EDGES:
        out_w[s] = out_w.get(s, 0.0) + w
    P = np.zeros((len(nodes), len(nodes)))
    for s, d, w in EDGES:
        P[idx[d], idx[s]] = w / out_w[s]
    v = np.zeros(len(nodes))
    v[idx[1]], v[idx[2]] = 3.0 / 4.0, 1.0 / 4.0
    r = v.copy()
    for _ in range(3):
        r = (1.0 - 0.85) * v + 0.85 * (P @ r)
    for n in nodes:
        assert got[n] == pytest.approx(r[idx[n]], abs=1e-9), n
    # teleporting to the seeds lifts the seed node vs the uniform walk
    uniform = {
        x["node"]: x["rank"]
        for x in pagerank(df, "src", "dst", "w", iterations=3).collect()
    }
    assert got[1] > uniform[1]


def test_personalized_pagerank_seed_outside_graph_renormalizes(spark):
    """Teleport weight on a node absent from the edge list is dropped
    BEFORE normalization — the in-graph seeds still sum to 1 (no silent
    mass leak)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    seeds = spark.createDataFrame([(1, 1.0), (99, 100.0)], ["node", "weight"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", "w", iterations=3, reset=seeds).collect()
    }
    assert 99 not in got
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


# --------------------------------------------------------- quantile sketch


def test_qsketch_golden_bucket_math(spark):
    """Hand-computed cells: n=100 cents -> msb=7 (64<=100<128), sub =
    floor(100*16/64)-16 = 9, lower bound (16+9)*64/16 = 100 cents exactly."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build, qsketch_quantiles

    df = spark.createDataFrame([(1.00,), (1.00,), (2.00,)], ["v"])
    cells = {
        (r["__qs_msb"], r["__qs_sub"]): r["__qs_cnt"]
        for r in qsketch_build(df, F.col("v")).collect()
    }
    assert cells == {(7, 9): 2, (8, 9): 1}  # 200c: msb=8, 3200/128-16 = 9
    est = {
        r["q"]: r["est_value"]
        for r in qsketch_quantiles(qsketch_build(df, F.col("v")), [0.5, 1.0]).collect()
    }
    assert est[0.5] == pytest.approx(1.00)
    assert est[1.0] == pytest.approx(2.00)


def test_qsketch_exact_for_singleton_buckets(spark):
    """For integer cents n <= 2^sub_bits every bucket is a singleton, so
    every quantile is exact."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build, qsketch_quantiles

    df = spark.createDataFrame([(i / 100.0,) for i in range(1, 17)], ["v"])
    sk = qsketch_build(df, F.col("v"))
    assert sk.count() == 16  # one cell per value
    est = {
        r["q"]: r["est_value"]
        for r in qsketch_quantiles(sk, [0.25, 0.5, 1.0]).collect()
    }
    assert est[0.25] == pytest.approx(0.04)
    assert est[0.5] == pytest.approx(0.08)
    assert est[1.0] == pytest.approx(0.16)


def test_qsketch_relative_error_bound_on_real_data(spark):
    """The estimate is the lower bound of the bucket holding the
    ceil(q*n)-th order statistic: est <= v_(ceil(qn)) < est*(1+2^-4)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build, qsketch_quantiles

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    vals = sorted(r["l_extendedprice"] for r in li.select("l_extendedprice").collect())
    sk = qsketch_build(li, F.col("l_extendedprice"))
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    est = {r["q"]: r["est_value"] for r in qsketch_quantiles(sk, qs).collect()}
    import math

    for q in qs:
        v = vals[math.ceil(q * len(vals)) - 1]
        assert est[q] <= v + 1e-9, q
        assert v < est[q] * (1 + 1 / 16) + 1e-6, q


def test_qsketch_merge_equals_global_build(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build, qsketch_merge

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    parts = [
        qsketch_build(li.where(F.col("l_orderkey") % 3 == i), F.col("l_extendedprice"))
        for i in range(3)
    ]
    merged = sorted(tuple(r) for r in qsketch_merge(*parts).collect())
    whole = sorted(tuple(r) for r in qsketch_build(li, F.col("l_extendedprice")).collect())
    assert merged == whole


def test_qsketch_grouped_matches_independent_builds(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    grouped = {
        (r["l_returnflag"], r["__qs_msb"], r["__qs_sub"]): r["__qs_cnt"]
        for r in qsketch_build(li, F.col("l_extendedprice"), by=["l_returnflag"]).collect()
    }
    for flag in ["A", "N", "R"]:
        solo = {
            (flag, r["__qs_msb"], r["__qs_sub"]): r["__qs_cnt"]
            for r in qsketch_build(
                li.where(F.col("l_returnflag") == flag), F.col("l_extendedprice")
            ).collect()
        }
        assert solo == {k: v for k, v in grouped.items() if k[0] == flag}, flag


def test_qsketch_null_and_nonpositive_skipped(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build, qsketch_quantiles

    df = spark.createDataFrame(
        [(None,), (-5.0,), (0.0,), (0.001,), (3.0,)], "v double"
    )  # 0.001 rounds to 0 cents -> skipped too
    sk = qsketch_build(df, F.col("v"))
    rows = sk.collect()
    assert sum(r["__qs_cnt"] for r in rows) == 1
    est = qsketch_quantiles(sk, [0.5, 1.0]).collect()
    # n=300c: msb=9, sub=floor(4800/256)-16=2, lb=(16+2)*256/16 = 288c
    assert all(r["est_value"] == pytest.approx(2.88) for r in est)


@pytest.mark.parametrize("name", HOSTILE)
def test_qsketch_hostile_group_and_value_names(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build, qsketch_quantiles

    from real_time_recommendation_system_with_feature_store_spark.ident import qcol

    df = spark.createDataFrame(
        [("x", 1.00), ("x", 2.00), ("y", 4.00)], ["g", "v"]
    ).withColumnRenamed("g", name).withColumnRenamed("v", f"{name}2")
    sk = qsketch_build(df, qcol(f"{name}2"), by=[name])
    est = {
        (r[name], r["q"]): r["est_value"]
        for r in qsketch_quantiles(sk, [1.0], by=[name]).collect()
    }
    assert est[("x", 1.0)] == pytest.approx(2.00)
    assert est[("y", 1.0)] == pytest.approx(4.00)


def test_qsketch_reserved_names_rejected(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build

    df = spark.createDataFrame([(1.0, 2)], ["v", "__qs_msb"])
    with pytest.raises(ValueError, match="__qs_msb"):
        qsketch_build(df, F.col("v"))


# ------------------------------------------------------------- RRF fusion


def test_rrf_fuse_golden(spark):
    """Hand-computed: item 1 ranked 1st+2nd, item 2 ranked 2nd+1st, item 3
    only in list A at rank 3."""
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["item", "rank"])
    b = spark.createDataFrame([(2, 1), (1, 2)], ["item", "rank"])
    got = {
        r["item"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([a, b], on=["item"]).collect()
    }
    c = lambda r: (10**12) // (60 + r)  # floor(scale/(k+rank))
    assert got[1] == ((c(1) + c(2)) / 1e12, 2)
    assert got[2] == ((c(2) + c(1)) / 1e12, 2)
    assert got[3] == (c(3) / 1e12, 1)
    assert got[1][0] == got[2][0]  # symmetric rank swap ties exactly


def test_rrf_fuse_null_keys_dropped(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    a = spark.createDataFrame([(None, 1), (7, 2)], "item int, rank int")
    out = rrf_fuse([a], on=["item"]).collect()
    assert [r["item"] for r in out] == [7]


def test_rrf_fuse_multi_key_requires_all_nonnull(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    a = spark.createDataFrame(
        [("u1", 7, 1), ("u1", None, 2), (None, 7, 3)],
        "user string, item int, rank int",
    )
    out = rrf_fuse([a], on=["user", "item"]).collect()
    assert [(r["user"], r["item"]) for r in out] == [("u1", 7)]


@pytest.mark.parametrize("name", HOSTILE)
def test_rrf_fuse_hostile_names(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], ["item", "rank"])
    a = a.withColumnRenamed("item", name).withColumnRenamed("rank", f"{name}r")
    got = {
        r[name]: r["rrf_score"]
        for r in rrf_fuse([a], on=[name], rank_col=f"{name}r").collect()
    }
    assert got[1] == ((10**12) // 61) / 1e12


def test_rrf_fuse_reserved_name_rejected(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    a = spark.createDataFrame([(1, 1, 0)], ["item", "rank", "__rrf_contrib"])
    with pytest.raises(ValueError, match="__rrf_contrib"):
        rrf_fuse([a], on=["item"])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], on=["item"])


def test_rrf_fuse_plan_has_no_join(spark):
    """Fusion must be union + one groupBy — never a per-list join chain."""
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    frames = [
        spark.createDataFrame([(i, 1)], ["item", "rank"]) for i in range(5)
    ]
    plan = rrf_fuse(frames, on=["item"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Union" in plan


# ------------------------------------------------------------- triangles


def _brute_triangles(edges):
    """Per-node triangle counts by brute-force enumeration."""
    import itertools

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    t = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            t[a] += 1; t[b] += 1; t[c] += 1
    deg = {n: sum(1 for e in und if n in e) for n in nodes}
    return t, deg


def test_triangle_counts_golden(spark):
    """K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}."""
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import triangle_counts

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(edges + [(b, a) for a, b in edges], ["src", "dst"])
    got = {r["node"]: (r["degree"], r["triangles"], r["clustering_coeff"]) for r in triangle_counts(df).collect()}
    assert got == {
        1: (3, 2, pytest.approx(2 / 3, abs=1e-12)),
        2: (3, 2, pytest.approx(2 / 3, abs=1e-12)),
        3: (2, 1, 1.0),
        4: (2, 1, 1.0),
    }


def test_triangle_counts_complete_graph(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import triangle_counts

    edges = [(a, b) for a in range(5) for b in range(5) if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for r in triangle_counts(df).collect():
        assert (r["degree"], r["triangles"], r["clustering_coeff"]) == (4, 6, 1.0)


def test_triangle_counts_ignores_duplicates_selfloops_nulls(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3), (None, 1), (3, None)],
        "src int, dst int",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_empty(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([], "src int, dst int")
    assert triangle_counts(df).count() == 0


def test_triangle_counts_matches_brute_force(spark):
    """Deterministic pseudo-random graph vs brute-force enumeration —
    exercises the degree-ordered orientation on irregular degrees."""
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import triangle_counts

    edges = [((i * 7 + 3) % 13, (i * i + 5) % 13) for i in range(60)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, ["src", "dst"])
    want_t, want_d = _brute_triangles(edges)
    got = {r["node"]: (r["degree"], r["triangles"]) for r in triangle_counts(df).collect()}
    assert got == {n: (want_d[n], want_t[n]) for n in want_t}


@pytest.mark.parametrize("name", HOSTILE)
def test_triangle_counts_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    df = df.withColumnRenamed("src", name).withColumnRenamed("dst", f"{name}2")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df, name, f"{name}2").collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# ------------------------------------------------------------ hyperloglog


def test_hll_accuracy_10k_keys(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build, hll_estimate

    df = spark.range(10000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    est = hll_estimate(hll_build(df, F.col("k"))).collect()[0]["est_distinct"]
    assert abs(est - 10000) / 10000 < 0.20  # 3 sigma at p=8 (1.04/16 per sigma)


def test_hll_merge_equals_global_build(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build, hll_merge

    df = spark.range(5000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    parts = [
        hll_build(df.where(F.col("id") % 3 == i), F.col("k")) for i in range(3)
    ]
    merged = sorted(tuple(r) for r in hll_merge(*parts).collect())
    whole = sorted(tuple(r) for r in hll_build(df, F.col("k")).collect())
    assert merged == whole


def test_hll_small_range_correction_matches_formula(spark):
    """With 20 keys the raw estimate falls under 2.5*m, so the linear-
    counting branch must fire: est = m * ln(m / zeros)."""
    import math

    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build, hll_estimate

    df = spark.range(20).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    sk = hll_build(df, F.col("k"))
    occupied = sk.count()
    est = hll_estimate(sk).collect()[0]["est_distinct"]
    assert est == pytest.approx(256.0 * math.log(256.0 / (256 - occupied)), rel=1e-12)
    assert abs(est - 20) < 3  # and linear counting is accurate down here


def test_hll_duplicates_dont_move_registers(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build

    once = spark.range(100).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    thrice = once.unionAll(once).unionAll(once)
    assert sorted(map(tuple, hll_build(once, F.col("k")).collect())) == sorted(
        map(tuple, hll_build(thrice, F.col("k")).collect())
    )


def test_hll_null_keys_skipped(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build

    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    regs = hll_build(df, F.col("k")).collect()
    assert sum(1 for _ in regs) <= 2  # at most one register per non-null key


def test_hll_grouped_matches_independent_builds(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build

    df = spark.range(600).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("k"),
    )
    grouped = {
        (r["g"], r["bucket"]): r["max_rho"]
        for r in hll_build(df, F.col("k"), by=["g"]).collect()
    }
    for g in ["0", "1"]:
        solo = {
            (g, r["bucket"]): r["max_rho"]
            for r in hll_build(df.where(F.col("g") == g), F.col("k")).collect()
        }
        assert solo == {k: v for k, v in grouped.items() if k[0] == g}, g


@pytest.mark.parametrize("name", HOSTILE)
def test_hll_hostile_names(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.ident import qcol
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build, hll_estimate

    df = spark.createDataFrame(
        [("x", "k1"), ("x", "k2"), ("y", "k3")], ["g", "k"]
    ).withColumnRenamed("g", name).withColumnRenamed("k", f"{name}2")
    sk = hll_build(df, qcol(f"{name}2"), by=[name])
    est = {
        r[name]: r["est_distinct"]
        for r in hll_estimate(sk, by=[name]).collect()
    }
    assert abs(est["x"] - 2) < 0.1 and abs(est["y"] - 1) < 0.1


def test_hll_guards(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build

    df = spark.createDataFrame([("a", 1)], ["k", "max_rho"])
    with pytest.raises(ValueError, match="max_rho"):
        hll_build(df, F.col("k"))
    with pytest.raises(ValueError, match="p must be"):
        hll_build(df.select("k"), F.col("k"), p=3)


def test_qsketch_weighted_quantiles(spark):
    """Weighted sketch: a value carrying weight w is equivalent to w
    unweighted copies — cells match exactly, and the weighted median is
    pulled toward the heavy value."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build, qsketch_quantiles

    weighted = spark.createDataFrame(
        [(1.00, 1), (2.00, 8), (4.00, 1)], ["v", "w"]
    )
    expanded = spark.createDataFrame(
        [(1.00,)] + [(2.00,)] * 8 + [(4.00,)], ["v"]
    )
    sw = qsketch_build(weighted, F.col("v"), weight=F.col("w"))
    se = qsketch_build(expanded, F.col("v"))
    assert sorted(map(tuple, sw.collect())) == sorted(map(tuple, se.collect()))
    est = {r["q"]: r["est_value"] for r in qsketch_quantiles(sw, [0.5]).collect()}
    assert est[0.5] == pytest.approx(2.00)  # weight-8 value dominates
    # NULL weight counts zero
    withnull = spark.createDataFrame(
        [(1.00, None), (2.00, 8), (4.00, 1)], "v double, w int"
    )
    sn = qsketch_build(withnull, F.col("v"), weight=F.col("w"))
    total = sum(r["__qs_cnt"] for r in sn.collect())
    assert total == 9


def test_hll_empty_sketch_estimates_zero(spark):
    """A global estimate over an empty register frame must be 0 distinct
    (linear-counting with all registers zero), not a NULL-poisoned row."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build, hll_estimate

    df = spark.createDataFrame([], "k string")
    est = hll_estimate(hll_build(df, F.col("k"))).collect()
    assert len(est) == 1 and est[0]["est_distinct"] == 0.0
