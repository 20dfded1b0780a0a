"""Aggregate incremental-view-maintenance (operators/ivm.py): delta
propagation must equal a full recompute — including exact retraction
cancellation, group birth/death, and the negative-count guard; plus the
extrema (MIN/MAX) maintenance via the dirty-group rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.operators.ivm import (
    agg_delta,
    apply_agg_delta,
    apply_extrema_delta,
)


def _view(spark, rows):
    base = spark.createDataFrame(rows, "g string, m double")
    return base.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("m").cast("decimal(28,10)")).alias("total"),
    )


def test_ivm_matches_full_recompute(spark):
    base_rows = [("a", 10.0), ("a", 20.0), ("b", 5.0), ("c", 7.5)]
    view = _view(spark, base_rows)
    # update a's 10.0 -> 12.5 (D/I pair), insert into b, delete c's only
    # row (group death), insert brand-new group d (group birth)
    chg = spark.createDataFrame(
        [
            ("D", "a", 10.0),
            ("I", "a", 12.5),
            ("I", "b", 1.0),
            ("D", "c", 7.5),
            ("I", "d", 3.0),
        ],
        "op string, g string, m double",
    )
    out = apply_agg_delta(view, agg_delta(chg, ["g"], F.col("m")), ["g"])
    got = {r["g"]: (r["n"], float(r["total"])) for r in out.collect()}
    # full recompute over base+changes
    final_rows = [("a", 12.5), ("a", 20.0), ("b", 5.0), ("b", 1.0), ("d", 3.0)]
    exp = {
        r["g"]: (r["n"], float(r["total"]))
        for r in _view(spark, final_rows).collect()
    }
    assert got == exp
    assert "c" not in got  # group death: zero-count groups leave the view


def test_ivm_retractions_cancel_exactly(spark):
    """Float-poisonous measures (0.1-style) must cancel to EXACT decimal
    zero on a full retraction — a float partial sum would leave 1-ulp
    ghosts that keep dead groups alive."""
    view = _view(spark, [("a", 0.1), ("a", 0.2), ("b", 1.0)])
    chg = spark.createDataFrame(
        [("D", "a", 0.1), ("D", "a", 0.2)], "op string, g string, m double"
    )
    out = apply_agg_delta(view, agg_delta(chg, ["g"], F.col("m")), ["g"])
    got = {r["g"] for r in out.collect()}
    assert got == {"b"}


def test_ivm_split_update_pair_across_batches(spark):
    """The D and I halves of an update may land in different deltas —
    + and − commute, so applying them in either order converges."""
    view = _view(spark, [("a", 10.0)])
    d1 = agg_delta(
        spark.createDataFrame([("I", "a", 15.0)], "op string, g string, m double"),
        ["g"], F.col("m"),
    )
    d2 = agg_delta(
        spark.createDataFrame([("D", "a", 10.0)], "op string, g string, m double"),
        ["g"], F.col("m"),
    )
    step = apply_agg_delta(view, d1, ["g"])
    out = apply_agg_delta(step, d2, ["g"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n"] == 1 and float(rows[0]["total"]) == 15.0


def test_ivm_negative_count_guard(spark):
    view = _view(spark, [("a", 1.0)])
    chg = spark.createDataFrame(
        [("D", "a", 1.0), ("D", "a", 1.0)], "op string, g string, m double"
    )
    out = apply_agg_delta(view, agg_delta(chg, ["g"], F.col("m")), ["g"])
    with pytest.raises(Exception, match="went negative"):
        out.collect()


def test_ivm_unknown_op_raises(spark):
    chg = spark.createDataFrame([("X", "a", 1.0)], "op string, g string, m double")
    with pytest.raises(Exception, match="unknown op"):
        agg_delta(chg, ["g"], F.col("m")).collect()


def test_ivm_null_group_key_pairs_null_safe(spark):
    """groupBy emits NULL groups; the null-safe default must pair a NULL
    view group with its NULL delta contribution instead of duplicating
    the group (plain equality never matches NULL = the trap)."""
    view = _view(spark, [(None, 4.0), ("b", 2.0)])
    chg = spark.createDataFrame(
        [("I", None, 6.0)], "op string, g string, m double"
    )
    out = apply_agg_delta(view, agg_delta(chg, ["g"], F.col("m")), ["g"])
    got = {r["g"]: (r["n"], float(r["total"])) for r in out.collect()}
    assert got == {None: (2, 10.0), "b": (1, 2.0)}


def test_ivm_multi_measure_single_pass(spark):
    """extra_measures maintains several sums in ONE delta pass (one
    shuffle for all measures) — each must equal its own recompute."""
    base = spark.createDataFrame(
        [("a", 10.0, 2.0), ("a", 20.0, 3.0), ("b", 5.0, 1.0)],
        "g string, rev double, qty double",
    )
    view = base.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("rev").cast("decimal(28,10)")).alias("total"),
        F.sum(F.col("qty").cast("decimal(28,10)")).alias("qty_total"),
    )
    chg = spark.createDataFrame(
        [("D", "a", 10.0, 2.0), ("I", "a", 12.0, 5.0), ("I", "c", 7.0, 7.0)],
        "op string, g string, rev double, qty double",
    )
    delta = agg_delta(
        chg, ["g"], F.col("rev"), extra_measures={"qty_total": F.col("qty")}
    )
    out = apply_agg_delta(view, delta, ["g"], extra_sum_cols=["qty_total"])
    got = {
        r["g"]: (r["n"], float(r["total"]), float(r["qty_total"]))
        for r in out.collect()
    }
    assert got == {
        "a": (2, 32.0, 8.0),
        "b": (1, 5.0, 1.0),
        "c": (1, 7.0, 7.0),
    }


def _extrema_view(spark, rows):
    base = spark.createDataFrame(rows, "g string, m double")
    return base.groupBy("g").agg(F.min("m").alias("mn"), F.max("m").alias("mx"))


def test_extrema_dirty_group_recompute(spark):
    """The full semantics in one scenario: clean insert improvement, new
    group birth, extremal delete with a surviving duplicate, extremum
    replacement, and group death via deleting the last row."""
    base = [
        ("a", 1.0), ("a", 5.0), ("a", 5.0),  # duplicate max
        ("b", 2.0),                            # single row -> death
        ("c", 9.0),                            # extremum replaced
        ("e", 1.0), ("e", 2.0), ("e", 3.0),   # non-extremal delete target
    ]
    view = _extrema_view(spark, base)
    chg = spark.createDataFrame(
        [
            ("I", "a", 7.0),   # insert above a's max (clean tighten)
            ("D", "a", 5.0),   # deletes ONE copy of the max -> dirty
            ("D", "b", 2.0),   # last row -> group death
            ("D", "c", 9.0), ("I", "c", 3.0),  # extremum replaced
            ("I", "d", 4.0),   # group birth
            ("D", "e", 2.0),   # NON-extremal delete -> must stay clean
        ],
        "op string, g string, m double",
    )
    after = [
        ("a", 1.0), ("a", 5.0), ("a", 7.0),
        ("c", 3.0),
        ("d", 4.0),
        # POISON: e's rows are withheld from base_after — only dirty
        # groups may read it, and e's delete is non-extremal, so a
        # correct operator never looks; a wrong one loses e or errors
    ]
    base_after = spark.createDataFrame(after, "g string, m double")
    out = apply_extrema_delta(view, chg, base_after, ["g"], "m")
    got = {r["g"]: (r["mn"], r["mx"]) for r in out.collect()}
    assert got == {
        "a": (1.0, 7.0),
        "c": (3.0, 3.0),
        "d": (4.0, 4.0),
        "e": (1.0, 3.0),  # clean path — proven by the poisoned base_after
    }
    assert "b" not in got


def test_extrema_matches_full_recompute_random(spark):
    """Seeded random base + changelog: incremental == full recompute over
    the post-change snapshot, group for group."""
    import random

    rng = random.Random(11)
    groups = [f"g{i}" for i in range(12)]
    base = [
        (rng.choice(groups), float(rng.randint(-50, 50))) for _ in range(300)
    ]
    view = _extrema_view(spark, base)
    remaining = list(base)
    chg = []
    for _ in range(80):  # deletes of real rows (some extremal by chance)
        row = remaining.pop(rng.randrange(len(remaining)))
        chg.append(("D", row[0], row[1]))
    inserts = [
        (rng.choice(groups + ["new1", "new2"]), float(rng.randint(-80, 80)))
        for _ in range(60)
    ]
    chg += [("I", g, m) for g, m in inserts]
    after = remaining + inserts
    out = apply_extrema_delta(
        view,
        spark.createDataFrame(chg, "op string, g string, m double"),
        spark.createDataFrame(after, "g string, m double"),
        ["g"],
        "m",
    )
    got = {r["g"]: (r["mn"], r["mx"]) for r in out.collect()}
    exp = {r["g"]: (r["mn"], r["mx"]) for r in _extrema_view(spark, after).collect()}
    assert got == exp


def test_extrema_unknown_group_delete_raises(spark):
    view = _extrema_view(spark, [("a", 1.0)])
    chg = spark.createDataFrame([("D", "zzz", 1.0)], "op string, g string, m double")
    after = spark.createDataFrame([("a", 1.0)], "g string, m double")
    with pytest.raises(Exception, match="never contained"):
        apply_extrema_delta(view, chg, after, ["g"], "m").collect()


def test_extrema_bad_changelog_rows_raise(spark):
    view = _extrema_view(spark, [("a", 1.0), ("a", 9.0)])
    after = spark.createDataFrame([("a", 1.0)], "g string, m double")
    # unknown op on a CLEAN group
    chg = spark.createDataFrame([("U", "a", 2.0)], "op string, g string, m double")
    with pytest.raises(Exception, match="unknown op|NULL measure"):
        apply_extrema_delta(view, chg, after, ["g"], "m").collect()
    # NULL measure riding along with an extremal delete (DIRTY branch —
    # the guard must also cover recomputed groups)
    chg2 = spark.createDataFrame(
        [("D", "a", 9.0), ("I", "a", None)], "op string, g string, m double"
    )
    with pytest.raises(Exception, match="unknown op|NULL measure"):
        apply_extrema_delta(view, chg2, after, ["g"], "m").collect()
