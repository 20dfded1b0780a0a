"""Physical-plan assertions — the 100 TB design points must be visible in the
plan, not just hoped for (SURVEY.md §4.2): filters reach the parquet scan,
small dims broadcast, hot paths stay in WholeStageCodegen."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.plans.inspect import explain_str, plan_checks

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_filter_pushdown_to_parquet(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity").where(F.col("l_quantity") > 30)
    plan = explain_str(df)
    assert "PushedFilters:" in plan and "GreaterThan(l_quantity,30.0)" in plan


def test_column_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = explain_str(df)
    # ReadSchema must not include unused money columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:300]


def test_dim_join_broadcasts(spark):
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["top_building_orders"].fn(spark, SF_DIR)
    checks = plan_checks(df, execute=True)
    assert checks["has_broadcast_join"], "dim join should be broadcast, not shuffle"
    assert checks["has_wholestage_codegen"]
    assert not checks["has_sort_merge_join"], "no shuffle join expected on dim-sized sides"


def test_global_topn_is_take_ordered(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import global_topn

    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    df = global_topn(p, [F.col("p_retailprice").desc(), F.col("p_partkey")], 10)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_flagship_no_cartesian(spark):
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["segment_recommendations"].fn(spark, SF_DIR)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan


def test_flagship_pruned_branch_matches_naive(spark, tmp_path, monkeypatch):
    """The candidate-pruning large path (one rollup stats job: exact
    max(__seen_n), n_users, n_pairs + approx item/segment distincts in a
    single pair scan) must return EXACTLY the naive branch's rows. The
    synthetic shape engages the gate: catalog (400 items) >> any user's
    history (~6), the 100 TB regime the pruning exists for."""
    import json

    import real_time_recommendation_system_with_feature_store_spark.operators.kcore as kcore
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    ev_rows = []
    eid = 0
    for u in range(100):
        for j in range(3):
            item = (u * 97 + j * 131) % 1000
            for et in ("view", "click")[: 1 + (u + j) % 2]:
                ev_rows.append(
                    (eid, "2024-01-10 00:00:00", u, et, 1.0, json.dumps({"k": item}))
                )
                eid += 1
    ev = spark.createDataFrame(
        ev_rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cust = spark.createDataFrame(
        [(u, "SEG_A" if u % 2 else "SEG_B") for u in range(100)],
        "c_custkey long, c_mktsegment string",
    )
    d = str(tmp_path / "sf_synth")
    ev.coalesce(1).write.parquet(f"{d}/events.parquet")
    cust.coalesce(1).write.parquet(f"{d}/customer.parquet")

    fn = QUERIES["segment_recommendations"].fn
    naive = sorted(map(tuple, fn(spark, d).collect()))
    monkeypatch.setattr(kcore, "_plan_size_bytes", lambda df: 100 << 30)
    pruned = sorted(map(tuple, fn(spark, d).collect()))
    assert naive and pruned == naive


def test_topk_uses_window_group_limit(spark):
    """rank<=k must compile with map-side partial WindowGroupLimit (two-phase
    per-key top-k): shuffle carries at most k rows per key per partition."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["brand_top_parts"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_multiwindow_single_scan(spark):
    """The fused multi-window aggregation must read the fact table ONCE
    (the reference re-scans per window and outer-joins, SURVEY §4.2)."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["user_activity_windows"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_two_stage_pipeline_plan_shape(spark):
    """The serving pipeline must (a) score items via the Arrow kernel (one
    python-worker stage, no CartesianProduct materializing |Q|x|I| rows in
    the JVM) and (b) broadcast the CTR feature join onto the pruned
    candidate set."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["two_stage_recommendations"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "MapInPandas" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_negative_sample_has_no_dense_grid(spark):
    """Rejection sampling must never expand users×items: no nested-loop or
    cartesian join anywhere in the plan — every join is keyed (item index on
    the dense idx, positives anti join on (user,item))."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["negative_samples"].fn(spark, SF_DIR)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


@pytest.mark.heavy
def test_no_cartesian_product_in_any_query_plan(spark):
    """Sweep every registered query: an accidental CartesianProduct (an
    un-keyed, un-broadcast join) is a plan bug at any scale. Intentional
    small-side cross joins compile to BroadcastNestedLoopJoin and stay
    allowed."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    # Queries allowed an Exchange SinglePartition: each funnels only a
    # tiny-by-construction frame — global scalar aggregates (1 output row),
    # the ≤32-row offset table inside global_row_number, a ≤n-row
    # TakeOrdered survivor set, or a catalog-sized distinct for encoding.
    # Audited 2026-08-14; a NEW name appearing here means a fact-sized
    # single-partition funnel slipped into a plan.
    single_partition_ok = {
        "acctbal_zscore", "coverage_novelty", "event_type_stats",
        "negative_samples", "popularity_ranking_metrics", "price_deciles",
        "promo_revenue_share", "rec_diversity", "rich_inactive_customers",
        "segment_codes", "tfidf_top_terms", "time_split_orders",
    }
    offenders, sp_offenders = [], []
    for name, spec in QUERIES.items():
        plan = explain_str(spec.fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
        if "Exchange SinglePartition" in plan and name not in single_partition_ok:
            sp_offenders.append(name)
    assert not offenders, f"CartesianProduct in: {offenders}"
    assert not sp_offenders, f"unexpected Exchange SinglePartition in: {sp_offenders}"

def test_price_deciles_no_single_partition_window(spark):
    """ntile/percent_rank must derive from the range-partitioned global rank,
    not an unpartitioned window funneling the whole table into one task."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["price_deciles"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, plan
    # the only Window left is the per-partition-offset / rank machinery; no
    # window may sort the fact table globally (SinglePartition feeding Window)
    import re
    for m in re.finditer(r"Window .*", plan):
        assert "ntile" not in m.group(0) and "percent_rank" not in m.group(0), m.group(0)


def test_global_topn_ranked_take_ordered(spark):
    """Popularity top-N with rank: TakeOrderedAndProject cuts to N before any
    window touches the data (no full-catalog single-task sort)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import global_topn_ranked

    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    df = global_topn_ranked(p, [F.col("p_retailprice").desc(), F.col("p_partkey")], 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_time_fraction_split_scale_path_routing(spark):
    """Above the plan-size gate the split must range-partition (parallel
    sort), below it the one-shuffle window is the measured winner."""
    from real_time_recommendation_system_with_feature_store_spark.operators.split import time_fraction_split

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    large = time_fraction_split(o, ["o_orderdate", "o_orderkey"], small_input_bytes=1)
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, plan
    small = time_fraction_split(o, ["o_orderdate", "o_orderkey"])
    # both paths agree bit-for-bit
    a = sorted(map(tuple, large.collect()))
    b = sorted(map(tuple, small.collect()))
    assert a == b


def test_pq_adc_scan_side_is_slim(spark):
    """The PQ ADC pass must join the slim (id, codes) index against a
    BROADCAST table frame — no item vectors and no shuffle on the scan side
    until the shortlist re-rank."""
    from real_time_recommendation_system_with_feature_store_spark.operators.knn import pq_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), "embedding")
    it = e.select(F.col("vec_id").alias("iid"), "embedding")
    out = pq_topk(q, it, "qid", "iid", dim=64, k=5, rerank=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # the ADC join carries codes + the broadcast dt, never the embeddings
    joins = plan.split("Join")
    adc_join = next(p for p in joins if "__dt" in p)
    assert "embedding" not in adc_join


def test_dedup_lazy_plans_have_no_cartesian_product(spark):
    """The catalog dedup queries eagerly checkpoint (their executed plans
    collapse to an RDD scan, so the registry-wide cartesian sweep can't see
    inside them) — assert the LAZY operator plans directly."""
    from real_time_recommendation_system_with_feature_store_spark.operators.dedup import (
        minhash_lsh_dedup,
        simhash_dedup,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(F.col("doc_id") < 60)
    for out in (
        minhash_lsh_dedup(d, "text", "doc_id", verify_threshold=0.5, materialize=False),
        minhash_lsh_dedup(d, "text", "doc_id", verify_threshold=None, materialize=False),
        simhash_dedup(d, "text", "doc_id", materialize=False),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan


def test_corpus_curation_plan_shapes(spark):
    """The corpus ops' scale posture, visible in the plan: fold assignment is
    shuffle-free; the mixture rate dim and the char-bigram model reach the
    corpus via broadcast joins, never a sort-merge shuffle of the facts."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    folds = explain_str(QUERIES["leakage_safe_folds"].fn(spark, SF_DIR))
    assert "Exchange" not in folds, folds

    plan = explain_str(QUERIES["domain_mixture_sample"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan

    # default charlm: model built eagerly (tiny-key shuffle), scoring is a
    # single zero-shuffle Arrow pass over the docs
    charlm = explain_str(QUERIES["charlm_doc_scores"].fn(spark, SF_DIR))
    assert "MapInPandas" in charlm and "Exchange" not in charlm, charlm

    # relational fallback: per-doc counts join the broadcast model, no SMJ
    from real_time_recommendation_system_with_feature_store_spark.operators.corpus import char_bigram_lm_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expr_plan = explain_str(char_bigram_lm_scores(docs, "text", "doc_id", kernel="expr"))
    assert "BroadcastHashJoin" in expr_plan
    assert "SortMergeJoin" not in expr_plan, expr_plan


def test_label_encode_scale_path_routing(spark):
    """F19 at ID-encoding scale: above the vocab plan-size gate the code
    assignment must range-partition (global_row_number's parallel sort) and
    map back via a shuffle join — no single-partition window over the vocab
    and no driver broadcast of a giant code map. Below the gate the
    broadcast map join is the measured winner. Both paths must assign
    identical codes."""
    import re

    from real_time_recommendation_system_with_feature_store_spark.operators.encode import label_encode

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    large = label_encode(o, "o_custkey", small_vocab_bytes=1)
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, plan
    # no window may consume a SinglePartition exchange (the one-task sort)
    for m in re.finditer(r"Window .*", plan):
        assert "SinglePartition" not in m.group(0), plan
    # above the gate the vocab->facts join must carry NO broadcast hint —
    # Catalyst picks by stats (still broadcasts a genuinely tiny vocab at
    # test scale, goes SMJ at real scale). Prove hint-freedom by disabling
    # auto-broadcast: the large path must compile to a shuffle join while
    # the small path still broadcasts (explicit hint survives the conf).
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        static = label_encode(
            o, "o_custkey", small_vocab_bytes=1
        )._jdf.queryExecution().sparkPlan().toString()
        assert "SortMergeJoin" in static or "ShuffledHashJoin" in static, static
        hinted = label_encode(o, "o_custkey")._jdf.queryExecution().sparkPlan().toString()
        assert "BroadcastHashJoin" in hinted, hinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    small = label_encode(o, "o_custkey")
    a = sorted(map(tuple, large.collect()))
    b = sorted(map(tuple, small.collect()))
    assert a == b and len(a) > 0


def test_pack_by_token_budget_unsharded_scale_path_routing(spark):
    """The no-shard default must not be a single-partition global cumsum
    above the gate: the scale path range-partitions and carries offsets
    across partitions, and agrees bit-for-bit with the window form."""
    import re

    from real_time_recommendation_system_with_feature_store_spark.operators.packing import pack_by_token_budget

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    large = pack_by_token_budget(docs, "n_tokens", ["doc_id"], budget=512, small_input_bytes=1)
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, plan
    # no window may consume a SinglePartition exchange over the doc stream
    for m in re.finditer(r"Window .*", plan):
        assert "SinglePartition" not in m.group(0), plan
    small = pack_by_token_budget(docs, "n_tokens", ["doc_id"], budget=512)
    a = sorted(map(tuple, large.collect()))
    b = sorted(map(tuple, small.collect()))
    assert a == b and len(a) > 0


def test_bucketed_tables_join_without_shuffle(spark):
    """Co-located join layout, EXTERNAL-path variant: two tables bucketed on
    the join key with the same bucket count must SortMergeJoin with ZERO
    Exchange — the 100 TB fact-fact join path (broadcast handles dim joins;
    bucketing is the answer when both sides are big). Complements
    test_scale_paths' managed-table form by pinning that the path option
    (files outliving the metastore) keeps the bucket metadata."""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.sources.bucketing import write_bucketed

    tmp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for t in ("orders_bkt", "cust_bkt"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(tmp, t), ignore_errors=True)
        write_bucketed(
            o, "orders_bkt", "o_custkey", buckets=8,
            path=os.path.join(tmp, "orders_bkt"),
        )
        write_bucketed(
            c, "cust_bkt", "c_custkey", buckets=8,
            path=os.path.join(tmp, "cust_bkt"),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_bkt").join(
            spark.table("cust_bkt"), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() == o.join(c, F.col("o_custkey") == F.col("c_custkey")).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        for t in ("orders_bkt", "cust_bkt"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_aqe_splits_skewed_join_at_runtime(spark):
    """Skew posture evidence: the session runs with AQE skew-join splitting
    enabled (session.py defaults), and a deliberately skewed fact-fact join
    (one key carrying ~83% of rows) gets its hot partition SPLIT at runtime
    — `skew=true` in the final adaptive plan. Thresholds are lowered to
    make test-scale partitions (MBs, not GBs) eligible; the mechanism is
    identical at 100 TB with the defaults."""
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        a = (
            spark.range(600000)
            .withColumn(
                "k",
                F.when(F.col("id") < 500000, F.lit(0)).otherwise((F.col("id") % 100) + 1),
            )
            .withColumn("pay", F.md5(F.col("id").cast("string")))
        )
        b = spark.range(101).toDF("k").withColumn("v", F.col("k") * 2)
        j = a.join(b, "k")
        j.foreach(lambda r: None)  # run THIS QueryExecution to finality
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert plan.count("skew=true") >= 1, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_profile_table_single_scan_and_skew_report_take_ordered(spark):
    """profile_table must read the table ONCE regardless of column count
    (one global aggregate + stack unpivot); key_skew_report must cut to
    top-N via TakeOrderedAndProject, never a full sort of the key space."""
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import key_skew_report, profile_table

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    prof = profile_table(o, ["o_orderkey", "o_custkey", "o_orderstatus"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    rows = {r["column_name"]: r for r in prof.collect()}
    n = o.count()
    assert rows["o_orderkey"]["n_rows"] == n and rows["o_orderkey"]["n_nulls"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderstatus"]["n_distinct"] <= 3

    skew = key_skew_report(o, ["o_custkey"], top=5)
    splan = skew._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan, splan
    got = skew.collect()
    assert len(got) == 5 and [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    assert abs(sum(r["share"] for r in got)) <= 1.0


def test_profile_table_distinct_gate_routing(spark):
    """The exact/approx distinct default is COST-GATED (encode.py pattern):
    small inputs keep exact countDistinct; above ``exact_distinct_bytes``
    the default flips to approx_count_distinct and the plan must carry NO
    Expand node — exact multi-distinct compiles to Expand, multiplying the
    scanned rows by ~|cols| before the partial agg, the wrong default for
    the 100 TB table the profiler exists for."""
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import profile_table

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]

    small = profile_table(o, cols)  # sf0.001 orders is far under 1 GiB
    splan = small._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in splan, "small input must keep exact countDistinct"

    big = profile_table(o, cols, exact_distinct_bytes=0)  # force the scale path
    bplan = big._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in bplan, bplan
    assert bplan.count("Scan parquet") == 1, bplan
    # HLL estimates stay sane on the primary key and tiny-cardinality column
    n = o.count()
    rows = {r["column_name"]: r for r in big.collect()}
    # default HLL rsd is 5% — allow 3 sigma on the primary key estimate
    assert abs(rows["o_orderkey"]["n_distinct"] - n) / n < 0.15
    assert rows["o_orderstatus"]["n_distinct"] <= 3


def test_plan_linter_flags_and_passes(spark):
    """plans/lint.py: flags the always-wrong-at-scale shapes (cartesian
    product, one-task window, row-at-a-time Python UDF, unpushed filter)
    and passes clean catalog queries."""
    import pytest as _pt
    from pyspark.sql.functions import udf

    from real_time_recommendation_system_with_feature_store_spark.plans.lint import assert_scalable, lint_plan
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    a = spark.range(100).toDF("x")
    b = spark.range(100).toDF("y")

    cart = a.join(b, F.col("x") * 0 != F.col("y") * 0 + 1)  # non-equi, big sides
    rules = {f["rule"] for f in lint_plan(cart)}
    # depending on stats this compiles to CartesianProduct or BNLJ; force it
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cart = a.join(b, F.col("x") + 1 != F.col("y"))
        rules = {f["rule"] for f in lint_plan(cart)}
        assert "cartesian-product" in rules, rules
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    from pyspark.sql import Window

    w = a.withColumn("rn", F.row_number().over(Window.orderBy("x")))
    assert {f["rule"] for f in lint_plan(w)} == {"single-partition-window"}
    with _pt.raises(ValueError, match="single-partition-window"):
        assert_scalable(w)
    assert_scalable(w, allow={"single-partition-window"})  # suppression works

    slow = udf(lambda x: x + 1, "long")
    u = a.select(slow("x").alias("y"))
    assert "python-row-udf" in {f["rule"] for f in lint_plan(u)}

    # zero-pushdown scan: a null-tolerant computed predicate (no inferred
    # isnotnull, not translatable) leaves PushedFilters empty while
    # DataFilters carries the work. Partial pushdown (computed predicates
    # alongside pushed isnotnull) is normal and deliberately NOT flagged.
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    up = o.where(F.coalesce(F.col("o_totalprice"), F.lit(0.0)) > 1000.0)
    assert "unpushed-filter" in {f["rule"] for f in lint_plan(up)}

    # clean catalog queries pass (broadcast joins, pushed filters, TakeOrdered)
    for name in ("top_building_orders", "global_top_parts", "brand_top_parts"):
        assert_scalable(QUERIES[name].fn(spark, SF_DIR))


def test_span_dedup_plan_shape(spark):
    """dedup_spans must stay window-free (the keeper is an aggregation with
    map-side partial combiners, not a row_number over span text) and must
    carry no cartesian product; the keeper aggregate shows a partial stage
    so a hot boilerplate span reduces before the exchange."""
    from real_time_recommendation_system_with_feature_store_spark.operators.dedup import dedup_spans

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dedup_spans(d, "text", "doc_id", span_words=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert "partial_" in plan  # map-side combine on the keeper agg
    # semi-join back on (unit, id, pos): all three keys must appear in a join
    assert "LeftSemi" in plan, plan


def test_semantic_dedup_pair_join_not_broadcast_corpus(spark):
    """semantic_dedup's intra-cell pair join must SHUFFLE both sides on the
    cell id (AQE can skew-split an outlier cell) — broadcasting a corpus
    side would pin the whole catalog on every executor; centroid assignment
    IS broadcast (n_cells rows). The whole plan stays cartesian-free."""
    from real_time_recommendation_system_with_feature_store_spark.operators.knn import semantic_dedup

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = semantic_dedup(e, "vec_id", n_cells=4, threshold=0.5, refine_iters=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan, plan
    rows = out.collect()
    assert len(rows) == e.count()
    keepers = [r for r in rows if r["is_keeper"] == 1]
    assert 0 < len(keepers) <= len(rows)


def test_bloom_pruned_join_probe_never_shuffles(spark):
    """bloom_pruned_join's whole pitch: the probe (lineitem) side must meet
    the bloom filter and the exact semi join WITHOUT an Exchange — the one
    shuffle in the plan is the final aggregation. The bitmap arrives via a
    single-row broadcast (BNL join), the member set via broadcast hash semi
    join."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["bloom_pruned_join"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ONLY hash-partitioning shuffle is the final aggregation (on
    # l_partkey) — the literal-bitmap bloom is a pure Filter on the probe
    # scan (the word collect ran as its own bounded job, not in this plan)
    import re

    keys = [k.split("#")[0] for k in re.findall(r"Exchange hashpartitioning\((\w+#\d+)", plan)]
    assert keys == ["l_partkey"], (keys, plan)
    assert "bf0" in plan.split("Exchange hashpartitioning")[1], plan  # filter below it
    assert "LeftSemi" in plan, plan  # exact join kills false positives
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bloom_literal_prune_survives_smj_reordering(spark):
    """The 100 TB case: when the exact join SHUFFLES (no broadcast), the
    literal-bitmap bloom must still sit BELOW the probe-side Exchange — a
    join-delivered bitmap gets hoisted above the semi join by
    PushDownLeftSemiAntiJoin, re-ordering the shuffle before the prune.
    Asserts the Filter containing the bloom hash is between the probe scan
    and the probe Exchange."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import bloom_build, bloom_might_contain

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        part = (
            spark.read.parquet(f"{SF_DIR}/part.parquet")
            .where(F.col("p_brand") == "Brand#23")
            .select("p_partkey")
        )
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            "l_partkey", "l_quantity"
        )
        bits = bloom_build(part, F.col("p_partkey").cast("string"))
        pruned = (
            bloom_might_contain(li, bits, F.col("l_partkey").cast("string"))
            .where(F.col("bloom_pass"))
            .drop("bloom_pass")
        )
        out = pruned.join(part, pruned["l_partkey"] == part["p_partkey"], "left_semi")
        lines = out._jdf.queryExecution().executedPlan().toString().splitlines()
        probe_scan = next(i for i, l in enumerate(lines) if "FileScan parquet [l_" in l)
        probe_ex = next(
            i for i, l in enumerate(lines) if "Exchange hashpartitioning(l_partkey" in l
        )
        bloom_filter = next(
            i for i, l in enumerate(lines) if "Filter " in l and "bf0" in l
        )
        # tree prints parents above children: Exchange < Filter < Scan
        assert probe_ex < bloom_filter < probe_scan, lines
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pagerank_loop_single_shuffle_per_iteration(spark):
    """Each PageRank round costs ONE shuffle (the inflow aggregate on dst);
    rank state is node-sized. Observable on a fresh 1-iteration plan built
    from checkpointed inputs: exactly one Exchange beyond the final join's."""
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7) % 20, 1.0) for i in range(40)], ["src", "dst", "w"]
    )
    one = pagerank(edges, "src", "dst", "w", iterations=1)
    two = pagerank(edges, "src", "dst", "w", iterations=2, checkpoint_every=100)
    p1 = one._jdf.queryExecution().executedPlan().toString()
    p2 = two._jdf.queryExecution().executedPlan().toString()
    # iteration 2 adds exactly one aggregation shuffle over iteration 1
    # (plus its join exchanges at most); the loop must not multiply scans
    assert p2.count("hashAggregate") <= p1.count("hashAggregate") + 2
    assert "CartesianProduct" not in p1 and "CartesianProduct" not in p2


def test_funnel_and_cohort_plans_have_no_joins(spark):
    """The round-7 analytics entries' whole pitch is one fact shuffle and
    ZERO joins (their oracles use the 3-self-join / self-join textbook
    formulations): the executed plans must contain no join operator and
    exactly one file scan each."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    for name in ("view_click_purchase_funnel", "daily_cohort_retention"):
        df = QUERIES[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, name
        assert plan.count("FileScan") == 1, name


def test_quantile_sketch_plans_single_scan_no_joins(spark):
    """qsketch entries: one scan, cells partial-aggregate map-side (the
    partial HashAggregate sits below the exchange), no joins."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    for name in ("price_quantile_sketch", "order_price_quantiles_by_priority"):
        df = QUERIES[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, name
        assert plan.count("FileScan") == 1, name
        # map-side partial aggregation of the cell frame precedes the shuffle
        assert "partial_count" in plan.lower() or "HashAggregate" in plan, name


def test_hll_register_build_partial_aggregates_map_side(spark):
    """hll_build's groupBy max must partial-aggregate before the exchange,
    so a 100 TB scan ships at most groups*2^p register rows per task."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build

    ev = spark.range(1000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    plan = hll_build(ev, F.col("k"))._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan[:500]
    assert "Join" not in plan


def test_bucketed_base_merge_changelog_has_no_base_side_exchange(spark):
    """The merge.py scale claim, plan-asserted for the MERGE itself: a base
    snapshot bucketed on the merge key with non-null-by-contract keys
    (null_safe_keys=False — null-safe `<=>` compiles to coalesce/isnull
    composite join keys that DEFEAT bucketing, the trap this pin guards)
    full-outer-joins its changelog with the base side read straight from
    buckets: exactly ONE Exchange in the whole plan (the small changelog
    side), `Bucketed: true` on the base scan. At 100 TB this is the
    difference between a day-close that re-shuffles the snapshot and one
    that only shuffles the day's changes."""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.merge import merge_changelog
    from real_time_recommendation_system_with_feature_store_spark.sources.bucketing import write_bucketed

    tmp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.sql("DROP TABLE IF EXISTS snap_bkt")
        shutil.rmtree(os.path.join(tmp, "snap_bkt"), ignore_errors=True)
        write_bucketed(
            c, "snap_bkt", "c_custkey", buckets=8, path=os.path.join(tmp, "snap_bkt")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        base = spark.table("snap_bkt")
        changes = c.where(F.col("c_custkey") % 7 == 1).select(
            "c_custkey",
            F.lit("U").alias("op"),
            F.lit(1).alias("seq"),
            F.concat(F.lit("v1:"), F.col("c_name")).alias("c_name"),
            (F.col("c_acctbal") + 1.0).alias("c_acctbal"),
        )
        merged = merge_changelog(base, changes, ["c_custkey"], null_safe_keys=False)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange ") == 1, plan  # changelog side only
        assert "Bucketed: true" in plan, plan
        assert "SortMergeJoin" in plan, plan
        # the null-safe default genuinely needs the guard: same merge with
        # `<=>` keys re-shuffles the bucketed base AND re-shuffles the
        # changelog a second time (the coalesce/isnull keys match neither
        # the buckets nor the latest-wins window's partitioning)
        ns = merge_changelog(base, changes, ["c_custkey"])
        ns_plan = ns._jdf.queryExecution().executedPlan().toString()
        assert ns_plan.count("Exchange ") == 3, ns_plan
        assert "Bucketed: false" in ns_plan, ns_plan
        # and the merged values are identical either way (keys are non-null)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, ns.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS snap_bkt")


def test_bracket_residues_pushed_to_both_scans(spark):
    """Q19 shape (bracket_part_revenue): the disjunction spans both join
    sides, but each side's OR residue is extractable and must reach ITS
    parquet scan — the lineitem scan gets the union of the quantity
    brackets, the part scan gets the brand/size brackets — so neither side
    reads rows no bracket can accept. A regression here silently turns a
    pruned scan into a full scan at 100 TB."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["bracket_part_revenue"].fn(spark, SF_DIR)
    plan = explain_str(df)
    pushed = [seg[:600] for seg in plan.split("PushedFilters: [")[1:]]
    li = [s for s in pushed if "l_quantity" in s]
    pt = [s for s in pushed if "p_brand" in s]
    assert li and pt, f"expected residues on both scans, got: {pushed}"
    # Assert each bracket's conjuncts individually, not the exact
    # Or(Or(And(...))) nesting/format — Spark may reorder or reformat the
    # residue rendering across versions while still pushing it (r9 ADVICE).
    for conjunct in (
        "GreaterThanOrEqual(l_quantity,1.0)",
        "LessThanOrEqual(l_quantity,11.0)",
        "GreaterThanOrEqual(l_quantity,10.0)",
        "LessThanOrEqual(l_quantity,20.0)",
        "GreaterThanOrEqual(l_quantity,20.0)",
        "LessThanOrEqual(l_quantity,30.0)",
    ):
        assert conjunct in li[0], f"missing {conjunct} in lineitem residue: {li[0]}"
    assert "Or(" in li[0], f"lineitem residue lost its disjunction: {li[0]}"
    for conjunct in (
        "EqualTo(p_brand,Brand#12)",
        "LessThanOrEqual(p_size,5)",
        "EqualTo(p_brand,Brand#23)",
        "LessThanOrEqual(p_size,10)",
        "EqualTo(p_brand,Brand#7)",
        "LessThanOrEqual(p_size,15)",
    ):
        assert conjunct in pt[0], f"missing {conjunct} in part residue: {pt[0]}"
    assert "Or(" in pt[0], f"part residue lost its disjunction: {pt[0]}"


def test_q17_threshold_agg_broadcasts_no_row_subquery(spark):
    """Q17 shape (small_qty_avg_revenue): the correlated scalar subquery
    (0.2*avg(l_quantity) per part) must decorrelate into ONE per-part
    aggregate joined back as a BROADCAST build side — never a per-row
    subquery re-execution (no ScalarSubquery in the physical plan, no
    nested-loop/cartesian), and the brand filter must prune both fact
    passes at the parquet scan via the broadcast semi structure."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["small_qty_avg_revenue"].fn(spark, SF_DIR)
    plan = explain_str(df)
    assert "ScalarSubquery" not in plan and "Subquery" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the threshold aggregate reaches the probe as a broadcast hash join
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    # brand residue pushed to the part scan
    pushed = plan.split("PushedFilters: [")[1:]
    assert any("EqualTo(p_brand,Brand#23)" in seg[:300] for seg in pushed), pushed


def test_q21_exists_chain_stays_semi_anti(spark):
    """Q21 shape (waiting_multi_supplier_orders): the EXISTS / NOT EXISTS
    chain must compile to LeftSemi / LeftAnti hash joins on the orderkey
    equi-key (suppkey inequality as join residual) — no per-row subquery
    re-execution, no nested-loop join over lineitem — and the final
    ranking must take the TakeOrderedAndProject path."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["waiting_multi_supplier_orders"].fn(spark, SF_DIR)
    plan = explain_str(df)
    # >= 3 semis: the probe-key prunes broadcast into BOTH exists-side
    # scans (without them a left-semi streams l1 against the FULL
    # lineitem — whole-fact shuffle at scale) plus the outer EXISTS
    assert plan.count("LeftSemi") >= 3, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # the probe-key prunes really did broadcast at this SF (the gate
    # passed): the EXISTS sides build-broadcast, zero sort-merge joins
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_gated_broadcast_stats_gate(spark):
    """The forced-broadcast gate (plans.gated_broadcast, r10 VERDICT
    'What's wrong' #1): the hint fires only when Catalyst's size estimate
    fits the budget — an oversized (or inestimable) side comes back
    UNhinted so the planner falls back to a shuffled join instead of an
    executor OOM at 100x the tested scale."""
    from real_time_recommendation_system_with_feature_store_spark.plans.inspect import (
        gated_broadcast,
        plan_size_bytes,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    keys = li.select("l_orderkey").distinct()

    def hinted(df):
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    # default budget, sane gate frame: the hint fires
    assert hinted(gated_broadcast(keys, gate_df=li.select("l_orderkey")))
    # tiny budget: fallback branch — no hint attached
    assert not hinted(gated_broadcast(keys, gate_df=li, limit_bytes=1))
    # estimates exist for the frames the gates read (the contract
    # plan_size_bytes documents: scans/filters/projections estimate sanely)
    assert plan_size_bytes(li.select("l_orderkey")) is not None


def test_bucketed_view_agg_ivm_has_no_view_side_exchange(spark):
    """The ivm.py scale claim, plan-asserted: a rollup view bucketed on
    its group key (non-null group keys by contract — null_safe_keys=False,
    the same `<=>`-defeats-bucketing trap as merge_changelog) full-outer
    merges its collapsed delta reading the view straight from buckets:
    exactly ONE Exchange chain on the delta side, `Bucketed: true` on the
    view scan. At a 10^9-group rollup this is the difference between a
    refresh that re-shuffles the view and one that only shuffles the
    day's delta."""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import agg_delta, apply_agg_delta
    from real_time_recommendation_system_with_feature_store_spark.sources.bucketing import write_bucketed

    tmp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    view = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(28,10)")).alias("total"),
    )
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.sql("DROP TABLE IF EXISTS rollup_bkt")
        shutil.rmtree(os.path.join(tmp, "rollup_bkt"), ignore_errors=True)
        write_bucketed(
            view, "rollup_bkt", "o_orderpriority", buckets=4,
            path=os.path.join(tmp, "rollup_bkt"),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bview = spark.table("rollup_bkt")
        chg = o.limit(50).select(
            F.lit("I").alias("op"), "o_orderpriority", "o_totalprice"
        )
        delta = agg_delta(chg, ["o_orderpriority"], F.col("o_totalprice"))
        out = apply_agg_delta(
            bview, delta, ["o_orderpriority"], null_safe_keys=False
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
        # every Exchange sits on the delta side: the view branch (between
        # the join node and its bucketed scan) has NO Exchange — the view
        # sort feeds straight from buckets
        view_branch = plan.split("SortMergeJoin")[1].split("rollup_bkt")[0]
        assert "Exchange" not in view_branch, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS rollup_bkt")


def test_bucketed_view_extrema_ivm_has_no_view_side_exchange(spark):
    """The apply_extrema_delta scale claim, plan-asserted: an extrema view
    bucketed on its group key (null_safe_keys=False — the same
    `<=>`-defeats-bucketing trap) merges its changelog reading the view
    straight from buckets. The view is consumed twice by design (clean
    merge + dirty-key extraction, the documented double read); BOTH
    consumers must feed from buckets with no view-side Exchange."""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import apply_extrema_delta
    from real_time_recommendation_system_with_feature_store_spark.sources.bucketing import write_bucketed

    tmp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    view = o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.sql("DROP TABLE IF EXISTS extrema_bkt")
        shutil.rmtree(os.path.join(tmp, "extrema_bkt"), ignore_errors=True)
        write_bucketed(
            view, "extrema_bkt", "o_orderpriority", buckets=4,
            path=os.path.join(tmp, "extrema_bkt"),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bview = spark.table("extrema_bkt")
        chg = o.limit(50).select(
            F.lit("I").alias("op"), "o_orderpriority", "o_totalprice"
        )
        out = apply_extrema_delta(
            bview, chg, o, ["o_orderpriority"], "o_totalprice",
            null_safe_keys=False,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "Bucketed: false" not in plan, plan  # NO consumer falls back
        assert "FullOuter" in plan, plan
        # the primary merge: the view branch (between the join node and
        # its bucketed scan, view = LEFT child so it prints first) has no
        # Exchange — the sort feeds straight from buckets
        view_branch = plan.split("SortMergeJoin")[1].split("extrema_bkt")[0]
        assert "Exchange" not in view_branch, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS extrema_bkt")


def test_topk_ivm_plan_shape(spark):
    """The apply_topk_delta scale claims, plan-asserted: every join is a
    stats-gated broadcast (touched-key anti/semi, refill semi — NO
    sort-merge join, no cartesian), the delta-bounded collapse subtree
    executes exactly TWICE (clean emit + dirty-key extraction, the same
    documented double consumption as apply_extrema_delta — a regression
    to three was the error-branch shape this pin forbids), and the view
    is scanned three times with no view-side shuffle anywhere."""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import (
        apply_topk_delta,
        build_topk_buffer,
    )

    tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    vdir = os.path.join(tmp, "topk_plan_view")
    shutil.rmtree(vdir, ignore_errors=True)
    build_topk_buffer(
        o.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"], "o_orderkey", "o_totalprice", 5,
    ).write.parquet(vdir)
    view = spark.read.parquet(vdir)
    chg = o.limit(40).select(
        F.lit("D").alias("op"), "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    out = apply_topk_delta(
        view, chg, o, ["o_orderpriority"], "o_orderkey", "o_totalprice",
        k=3, buffer_k=5, null_safe_keys=False, reuse_collapse=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("LeftAnti") == 1, plan      # untouched pass-through
    assert plan.count("LeftSemi") == 3, plan      # touched x2 + refill
    # the collapse shuffles ((keys,id) then (keys)) appear exactly twice
    assert plan.count("hashpartitioning(__k_0") == 4, plan
    assert plan.count("topk_plan_view") == 3, plan

    # default mode: the touched-collapse frame is lazily checkpointed so
    # BOTH consumers read one shared RDD — the collapse subtree leaves
    # the plan (two ExistingRDD scans; the only surviving __k_0 shuffle
    # is the clean-branch window re-partitioning the checkpointed frame,
    # whose partitioning metadata the RDD wrap drops) and the rows are
    # identical to the in-plan form
    out2 = apply_topk_delta(
        view, chg, o, ["o_orderpriority"], "o_orderkey", "o_totalprice",
        k=3, buffer_k=5, null_safe_keys=False,
    )
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("hashpartitioning(__k_0") == 1, plan2
    assert plan2.count("Scan ExistingRDD") == 2, plan2
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, out.collect()))


def test_bucketed_snapshot_join_view_delta_has_no_snapshot_side_exchange(spark):
    """The join-view IVM scale claim, plan-asserted: deriving dV = dA ⋈
    B_after with B_after stored bucketed on the join key reads the
    snapshot straight from buckets — exactly ONE Exchange in the plan
    (the small delta side), `Bucketed: true` on the snapshot scan. At
    100 TB a day's view refresh therefore shuffles only the day's
    changes; the snapshot is never re-partitioned. (join_view_delta uses
    list-form `on`, which compiles to plain `=` keys — the flavor bucket
    layouts satisfy.)"""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import join_view_delta
    from real_time_recommendation_system_with_feature_store_spark.sources.bucketing import write_bucketed

    tmp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_name", "c_acctbal"
    )
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.sql("DROP TABLE IF EXISTS jv_snap_bkt")
        shutil.rmtree(os.path.join(tmp, "jv_snap_bkt"), ignore_errors=True)
        write_bucketed(
            c, "jv_snap_bkt", "k", buckets=8, path=os.path.join(tmp, "jv_snap_bkt")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        b_after = spark.table("jv_snap_bkt")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", F.col("o_custkey").alias("k"), "o_totalprice"
        )
        delta_a = o.where(F.col("o_orderkey") % 97 == 0).select(
            F.lit("I").alias("op"), "*"
        )
        dv = join_view_delta(o, delta_a, b_after, None, ["k"])
        plan = dv._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange ") == 1, plan  # delta side only
        assert "Bucketed: true" in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS jv_snap_bkt")


def test_bucketed_support_distinct_ivm_has_no_support_side_exchange(spark):
    """The apply_distinct_delta scale claim, plan-asserted: a support table
    bucketed on (group key, value) with null_safe_keys=False merges its
    collapsed delta reading the support side straight from buckets — only
    the delta shuffles. (The view merge downstream follows the same
    apply_agg_delta contract already pinned; this pins the NEW merge.)"""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import (
        apply_distinct_delta,
        build_distinct_support,
    )
    from real_time_recommendation_system_with_feature_store_spark.sources.bucketing import write_bucketed

    tmp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    support = build_distinct_support(o, ["o_orderpriority"], "o_custkey")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.sql("DROP TABLE IF EXISTS dsupp_bkt")
        shutil.rmtree(os.path.join(tmp, "dsupp_bkt"), ignore_errors=True)
        write_bucketed(
            support, "dsupp_bkt", ["o_orderpriority", "o_custkey"], buckets=4,
            path=os.path.join(tmp, "dsupp_bkt"),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bsupport = spark.table("dsupp_bkt")
        view = bsupport.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("nd")
        )
        chg = o.limit(50).select(
            F.lit("I").alias("op"), "o_orderpriority", "o_custkey"
        )
        _, ns = apply_distinct_delta(
            view, bsupport, chg, ["o_orderpriority"], "o_custkey",
            null_safe_keys=False,
        )
        plan = ns._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "FullOuter" in plan, plan
        # support = LEFT child of the merge join: its branch (between the
        # join node and the bucketed scan) must carry no Exchange
        support_branch = plan.split("SortMergeJoin")[1].split("dsupp_bkt")[0]
        assert "Exchange" not in support_branch, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS dsupp_bkt")


def test_q9_profit_broadcasts_dims_and_joins_cost_dim_on_two_keys(spark):
    """product_type_profit_by_nation_year (TPC-H Q9 shape): part/supplier/
    nation broadcast; the derived supply-cost dim joins lineitem on BOTH
    (partkey, suppkey) — a two-key shuffled equi-join, visible as a
    hashpartitioning on the key pair; no cartesian anywhere."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["product_type_profit_by_nation_year"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3, plan  # part, supplier, nation
    assert "hashpartitioning(l_partkey" in plan and "l_suppkey" in plan.split(
        "hashpartitioning(l_partkey"
    )[1][:80], plan  # the two-key cost-dim join shuffles on the pair


def test_q12_shipdate_range_pushes_to_scan(spark):
    """shipmode_priority_counts (TPC-H Q12 shape): the l_shipdate year
    range must reach the lineitem parquet scan as pushed residues; the
    cross-table l_shipdate > o_orderdate predicate rides the join."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    df = QUERIES["shipmode_priority_counts"].fn(spark, SF_DIR)
    plan = explain_str(df)
    pushed = plan.split("PushedFilters: [")[1:]
    assert any(
        "GreaterThanOrEqual(l_shipdate" in seg[:400]
        and "LessThan(l_shipdate" in seg[:400]
        for seg in pushed
    ), plan


def test_day_close_full_composed_plan_reads_all_views_from_buckets(spark):
    """The six-rule composed day-close (warehouse_day_close_full), plan-
    gated the way a nightly pipeline would actually store it: ALL view
    state (sum/moments rollup, distinct view + support table, extrema
    view, join view) persisted bucketed on its merge keys, the top-k
    buffer plain (its view joins are broadcast by design), and ONE lazy
    DAG advancing all six delta rules + the report join. Asserts:

    * every bucketed scan stays bucketed ("Bucketed: true" x7 — the
      planner keeps a bucketed scan only when it actually avoids a
      shuffle, so a view-side Exchange would flip it to "disabled by
      query planner"), with bucket count == shuffle partitions (the
      alignment the delta-side aggregates already satisfy; mismatched
      counts make the planner reshuffle the VIEW side instead);
    * the composed plan stays bounded: exchange count pinned at the
      delta-side-only number, no cartesians, plan node count under a
      hard ceiling (composition must not blow up the tree);
    * the bucketed composition computes the same rows as the catalog
      entry (which builds its views in-query)."""
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import (
        agg_delta,
        apply_agg_delta,
        apply_distinct_delta,
        apply_extrema_delta,
        apply_join_delta,
        apply_topk_delta,
        build_distinct_support,
        build_topk_buffer,
        distinct_from_support,
        join_view_delta,
        topk_from_buffer,
    )
    from real_time_recommendation_system_with_feature_store_spark.queries import (
        QUERIES,
        _two_sided_order_customer_deltas,
    )
    from real_time_recommendation_system_with_feature_store_spark.sources.bucketing import write_bucketed

    tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp"
    )
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = ["o_orderpriority"]
    a_before, delta_a, b_before, delta_b, b_after = (
        _two_sided_order_customer_deltas(
            spark, SF_DIR,
            ["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"],
            ["c_mktsegment"],
        )
    )
    a_after = (
        delta_a.where(F.col("op") == "I").drop("op")
        .unionByName(a_before.where(F.col("o_orderkey") % 7 != 0))
    )
    m = F.col("o_totalprice")
    support = build_distinct_support(a_before, keys, "o_custkey")
    state = {
        "dcf_agg_bkt": (
            a_before.groupBy(*keys).agg(
                F.count("*").alias("n"),
                F.sum(m.cast("decimal(28,10)")).alias("total"),
                F.sum((m * m).cast("decimal(28,10)")).alias("ss"),
            ),
            keys,
        ),
        "dcf_supp_bkt": (support, [*keys, "o_custkey"]),
        "dcf_dist_bkt": (
            distinct_from_support(support, keys, distinct_col="nd_custkeys"),
            keys,
        ),
        "dcf_ext_bkt": (
            a_before.groupBy(*keys).agg(F.min(m).alias("mn"), F.max(m).alias("mx")),
            keys,
        ),
        "dcf_jv_bkt": (
            a_before.join(b_before, ["o_custkey"], "inner"),
            ["o_orderkey"],
        ),
    }
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for t, (df, k) in state.items():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(tmp, t), ignore_errors=True)
            write_bucketed(df, t, k, buckets=n_shuffle, path=os.path.join(tmp, t))
        tkdir = os.path.join(tmp, "dcf_tk_view")
        shutil.rmtree(tkdir, ignore_errors=True)
        build_topk_buffer(
            a_before, keys, "o_orderkey", "o_totalprice", buffer_k=5
        ).write.parquet(tkdir)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        agg_new = apply_agg_delta(
            spark.table("dcf_agg_bkt"),
            agg_delta(
                delta_a.select("op", *keys, "o_totalprice"), keys, m,
                extra_measures={"ss": m * m},
            ),
            keys, null_safe_keys=False, extra_sum_cols=["ss"],
        )
        dist_new, _ = apply_distinct_delta(
            spark.table("dcf_dist_bkt"), spark.table("dcf_supp_bkt"),
            delta_a.select("op", *keys, "o_custkey"),
            keys, "o_custkey", distinct_col="nd_custkeys", null_safe_keys=False,
        )
        dv = join_view_delta(a_before, delta_a, b_after, delta_b, ["o_custkey"])
        jv_new = apply_join_delta(
            spark.table("dcf_jv_bkt"), dv, ["o_orderkey"], null_safe_keys=False
        )
        jagg = jv_new.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_joined"),
            F.countDistinct("c_mktsegment").alias("nd_segments"),
        )
        ext_new = apply_extrema_delta(
            spark.table("dcf_ext_bkt"),
            delta_a.select("op", *keys, "o_totalprice"),
            a_after, keys, "o_totalprice", null_safe_keys=False,
        )
        tk_buf = apply_topk_delta(
            spark.read.parquet(tkdir),
            delta_a.select("op", *keys, "o_orderkey", "o_totalprice"),
            a_after, keys, "o_orderkey", "o_totalprice",
            k=3, buffer_k=5, null_safe_keys=False,
        )
        # string emission, matching the catalog entry's driver-hash
        # contract (r15: array cells are unhashable at the driver)
        tk_arr = (
            topk_from_buffer(tk_buf, keys, "o_orderkey", "o_totalprice", 3)
            .groupBy(*keys)
            .agg(
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("rn"),
                                F.col("o_orderkey").cast("string").alias("o_orderkey"),
                            )
                        )
                    ).getField("o_orderkey"),
                ).alias("top_order_keys")
            )
        )
        report = (
            agg_new.select(
                *keys, "n",
                F.round(F.col("total").cast("double"), 2).alias("total_revenue"),
            )
            .join(dist_new, keys).join(jagg, keys)
            .join(
                ext_new.select(
                    *keys,
                    F.col("mn").alias("min_price"),
                    F.col("mx").alias("max_price"),
                ),
                keys,
            )
            .join(tk_arr, keys)
        )
        plan = report._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") == 7, plan  # agg, dist, supp x2, ext x2, jv
        assert plan.count("Bucketed: false") == 0, plan
        assert "CartesianProduct" not in plan
        # delta-side-only exchange pin: a view-side Exchange anywhere
        # raises this count (and flips a Bucketed flag above)
        assert plan.count("Exchange ") == 28, plan
        assert len(plan.splitlines()) < 420, "composed plan blew up"

        got = sorted(map(tuple, report.collect()))
        ref = QUERIES["warehouse_day_close_full"].fn(spark, SF_DIR).select(
            *keys, "n", "total_revenue", "nd_custkeys", "n_joined",
            "nd_segments", "min_price", "max_price", "top_order_keys",
        )
        want = sorted(map(tuple, ref.collect()))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        for t in state:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_drift_monitors_scan_events_once(spark):
    """The r15 drift family's headline plan claim: every monitor reads
    events in ONE scan — both windows come from conditional aggregation
    (or one sketch build / one window flag), never a per-window rescan —
    and none shuffles more than the documented count. embedding_drift
    additionally scans embeddings once for its item join."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    expect = {
        # name: (max events scans, max total scans, max exchanges)
        "feature_drift_ks": (1, 1, 2),
        "feature_drift_ks_sketch": (1, 1, 3),
        "event_type_drift_chisq": (1, 1, 2),
        "score_auc_per_user": (1, 1, 2),
        "embedding_drift": (1, 2, 4),
    }
    for name, (ev_scans, scans, exchanges) in expect.items():
        plan = explain_str(QUERIES[name].fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        got_scans = plan.count("FileScan parquet")
        got_ev = plan.count("events.parquet")
        got_ex = plan.count("Exchange ")
        assert got_ev <= ev_scans, (name, got_ev, plan)
        assert got_scans <= scans, (name, got_scans, plan)
        assert got_ex <= exchanges, (name, got_ex, plan)


def test_r15_entries_pass_plan_lint(spark):
    """plans/lint pre-flight over every r15 catalog entry. The only
    tolerated finding is single-partition-window on entries whose window
    consumes a BOUNDED tiny frame (sketch cells ~100 rows; per-item
    counts = catalog-sized ranks, the price_deciles class with the
    global_row_number escape documented) — everything else, including
    unpushed-filter, must be clean: the qsketch value filter and the
    props-JSON null filters are written source-side precisely so they
    reach PushedFilters."""
    from real_time_recommendation_system_with_feature_store_spark.plans.lint import lint_plan
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    tolerated = {
        "event_type_drift_chisq": {"single-partition-window"},  # K-row totals
        "item_popularity_gini": {"single-partition-window"},    # catalog ranks
        "drift_sketch_fold": {"single-partition-window"},       # ~100 cells
    }
    for name in (
        "late_epoch_fold",
        "feature_drift_psi",
        "feature_drift_ks",
        "feature_drift_ks_sketch",
        "event_type_drift_chisq",
        "embedding_drift",
        "score_auc_per_user",
        "item_popularity_gini",
        "drift_sketch_fold",
        "data_quality_report",
    ):
        rules = {f["rule"] for f in lint_plan(QUERIES[name].fn(spark, SF_DIR))}
        assert rules <= tolerated.get(name, set()), (name, rules)


def test_r16_explode_sources_push_isnotnull(spark):
    """r15 verdict #2: InferFiltersFromGenerate is excluded session-wide
    (session.py — it re-evaluates expensive generator trees in an
    interpreted Filter), so every hot explode whose generator is
    null-intolerant in a parquet column carries an EXPLICIT source-side
    null filter instead. Assert the IsNotNull actually lands in the
    scan's PushedFilters — that is the 100 TB claim (the scan skips
    null-source rows it would otherwise read and parse).

    Single-parse contract rides along: the _with_item entries must parse
    the props JSON inside ONE Generate, never in a Filter + a Project
    (one get_json_object per events-scan consumer in the plan)."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    cases = {
        # props JSON via _with_item (single Generate, no filter re-parse)
        "item_trending_scores": "IsNotNull(props)",
        "kcore_events": "IsNotNull(props)",
        "segment_recommendations": "IsNotNull(props)",
        "negative_samples": "IsNotNull(props)",
        "popularity_ranking_metrics": "IsNotNull(props)",
        # text tokenization explodes (tokens(NULL) is NULL -> rows identical)
        "tfidf_top_terms": "IsNotNull(text)",
        "bm25_doc_search": "IsNotNull(text)",
        # embedding posexplode (source-column filter; the computed-v filter
        # would be pushdown-substituted and re-run the transform per row)
        "embedding_drift": "IsNotNull(embedding)",
    }
    for name, want in cases.items():
        plan = explain_str(QUERIES[name].fn(spark, SF_DIR))
        assert want in plan, (name, want, plan)

    # single-parse: every remaining get_json_object sits under a Generate;
    # the duplicated Filter+Project pattern evaluated it 2x per events-scan
    # consumer, so parses must not exceed Generate count
    for name in ("item_trending_scores", "kcore_events", "negative_samples"):
        plan = explain_str(QUERIES[name].fn(spark, SF_DIR))
        n_parse = plan.count("get_json_object")
        n_gen = plan.count("Generate ")
        assert n_parse <= n_gen, (name, n_parse, n_gen, plan)
