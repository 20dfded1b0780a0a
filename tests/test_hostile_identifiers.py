"""Hostile column names (dots, spaces, quotes, backticks) through every
operator that receives user-supplied column names.

A lake inherits names from upstream producers — flattened JSON gives
``a.b``, CSV headers give ``a b`` — and bare ``F.col``/f-string SQL
resolves them as nested paths or breaks the parser (the bug class fixed in
models.py round 4). Every operator here must treat a received name as ONE
identifier via ident.qcol. Each case asserts real semantics, not just
no-crash.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol

HOSTILE = ["a.b", "a b", "a'b", "a`b", "select"]


@pytest.mark.parametrize("name", HOSTILE)
def test_profile_table_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (2.0,), (None,)], f"`{name.replace('`', '``')}` double"
    )
    rows = {r["column_name"]: r for r in profile_table(df, [name]).collect()}
    r = rows[name]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (4, 1, 2)
    assert (r["min_value"], r["max_value"]) == ("1.0", "2.0")


@pytest.mark.parametrize("name", HOSTILE)
def test_key_skew_report_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.profile import key_skew_report

    df = spark.createDataFrame(
        [("x",), ("x",), ("x",), ("y",)], f"`{name.replace('`', '``')}` string"
    )
    got = {r[name]: (r["n_rows"], r["share"]) for r in key_skew_report(df, [name], top=2).collect()}
    assert got == {"x": (3, 0.75), "y": (1, 0.25)}


@pytest.mark.parametrize("name", HOSTILE)
def test_interpolate_linear_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.interpolate import interpolate_linear

    t0 = datetime.fromisoformat("2024-01-01 00:00:00")
    df = spark.createDataFrame(
        [(1, t0, 0.0), (1, t0 + timedelta(seconds=10), None), (1, t0 + timedelta(seconds=20), 4.0)],
        ["k", "ts", "v"],
    )
    # the hostile name plays every role: key, timestamp, value
    for role_df, key, ts, val in [
        (df.withColumnRenamed("v", name), "k", "ts", name),
        (df.withColumnRenamed("k", name), name, "ts", "v"),
        (df.withColumnRenamed("ts", name), "k", name, "v"),
    ]:
        out = interpolate_linear(role_df, key, ts, val, out_col="vi")
        got = sorted(r["vi"] for r in out.collect())
        assert got == [0.0, 2.0, 4.0], (key, ts, val)


@pytest.mark.parametrize("name", HOSTILE)
def test_scd2_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.scd import (
        scd2_apply_increment,
        scd2_from_changelog,
        snapshot_at,
    )

    t = lambda s: datetime.fromisoformat(f"2024-01-0{s} 00:00:00")
    df = spark.createDataFrame(
        [(1, t(1), "v1"), (1, t(3), "v2"), (2, t(2), "w1")], ["k", "ts", "val"]
    )
    # hostile name as the key column and as the timestamp column
    hist_k = scd2_from_changelog(df.withColumnRenamed("k", name), [name], "ts")
    snap = {r[name]: r["val"] for r in snapshot_at(hist_k, F.lit(t(2))).collect()}
    assert snap == {1: "v1", 2: "w1"}

    hist_ts = scd2_from_changelog(df.withColumnRenamed("ts", name), ["k"], name)
    snap2 = {r["k"]: r["val"] for r in snapshot_at(hist_ts, F.lit(t(4))).collect()}
    assert snap2 == {1: "v2", 2: "w1"}

    delta = spark.createDataFrame([(1, t(5), "v3")], ["k", "ts", "val"]).withColumnRenamed(
        "k", name
    )
    folded = scd2_apply_increment(hist_k, delta, [name], "ts")
    snap3 = {r[name]: r["val"] for r in snapshot_at(folded, F.lit(t(6))).collect()}
    assert snap3 == {1: "v3", 2: "w1"}


@pytest.mark.parametrize("name", HOSTILE)
def test_packing_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.packing import pack_by_token_budget

    df = spark.createDataFrame([(i, 60) for i in range(5)], ["id", "toks"]).withColumnRenamed(
        "toks", name
    )
    for kwargs in [{}, {"small_input_bytes": 0}]:  # window path + prefix-sum scale path
        out = pack_by_token_budget(df, name, [F.col("id")], budget=100, **kwargs)
        got = {r["id"]: (r["chunk_id"], r["chunk_offset"]) for r in out.collect()}
        assert got == {0: (0, 0), 1: (0, 60), 2: (1, 20), 3: (1, 80), 4: (2, 40)}, kwargs
    # hostile shard column too
    sharded = df.withColumn("s.h", F.lit("one"))
    out = pack_by_token_budget(sharded, name, [F.col("id")], budget=100, shard_col="s.h")
    assert {r["id"]: r["chunk_id"] for r in out.collect()} == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


@pytest.mark.parametrize("name", HOSTILE)
def test_chunk_documents_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.packing import chunk_documents

    df = (
        spark.createDataFrame([(7, "w0 w1 w2 w3 w4")], ["doc", "text"])
        .withColumnRenamed("text", name)
    )
    out = chunk_documents(df, name, "doc", max_tokens=3, overlap=1).collect()
    assert [(r["chunk_idx"], r["chunk_text"]) for r in sorted(out, key=lambda r: r["chunk_idx"])] == [
        (0, "w0 w1 w2"),
        (1, "w2 w3 w4"),
    ]


@pytest.mark.parametrize("name", HOSTILE)
def test_multi_window_agg_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.features.windows import (
        count_in_window,
        multi_window_agg,
    )

    t0 = datetime.fromisoformat("2024-01-01 12:00:00")
    df = spark.createDataFrame(
        [("u", t0 - timedelta(seconds=30)), ("u", t0 - timedelta(hours=2))], ["k", "ts"]
    )
    for role_df, key, ts in [
        (df.withColumnRenamed("k", name), name, "ts"),
        (df.withColumnRenamed("ts", name), "k", name),
    ]:
        out = multi_window_agg(
            role_df, [key], ts, t0, {"1m": 60, "1d": 86400}, {"n": count_in_window()}
        ).collect()
        assert len(out) == 1 and (out[0]["n_1m"], out[0]["n_1d"]) == (1, 2)


@pytest.mark.parametrize("name", HOSTILE)
def test_prefix_sum_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.rank import (
        global_exclusive_prefix_sum,
        global_row_number,
    )

    df = spark.createDataFrame([(i, 10) for i in range(4)], ["id", "v"]).withColumnRenamed(
        "v", name
    )
    out = global_exclusive_prefix_sum(df, name, ["id"], "ps", num_partitions=2)
    assert {r["id"]: r["ps"] for r in out.collect()} == {0: 0, 1: 10, 2: 20, 3: 30}
    rdf = spark.createDataFrame([(i,) for i in range(4)], ["id"]).withColumnRenamed("id", name)
    ranked = global_row_number(rdf, [name], "rn", num_partitions=2)
    assert {r[name]: r["rn"] for r in ranked.collect()} == {0: 1, 1: 2, 2: 3, 3: 4}


@pytest.mark.parametrize("name", HOSTILE)
def test_dedup_spans_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame([(1, "a b c d"), (2, "c d x y")], ["doc", "txt"])
    # hostile name as the text column and as the id column
    for role_df, text, did in [
        (df.withColumnRenamed("txt", name), name, "doc"),
        (df.withColumnRenamed("doc", name), "txt", name),
    ]:
        out = dedup_spans(role_df, text, did, span_words=2)
        got = {r[did]: r["dedup_text"] for r in out.collect()}
        assert got == {1: "a b c d", 2: "x y"}, (text, did)


@pytest.mark.parametrize("name", HOSTILE)
def test_semantic_dedup_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.knn import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (9, [0.0, 1.0])], ["vid", "embedding"]
    )
    for role_df, vid, vec in [
        (df.withColumnRenamed("vid", name), name, "embedding"),
        (df.withColumnRenamed("embedding", name), "vid", name),
    ]:
        out = {r[vid]: (r["cluster_id"], r["is_keeper"])
               for r in semantic_dedup(role_df, vid, vec, n_cells=2, threshold=0.9).collect()}
        assert out == {1: (1, 1), 2: (1, 0), 9: (9, 1)}, (vid, vec)


def test_qcol_roundtrip(spark):
    """quote_ident survives every hostile class including embedded backticks."""
    for name in HOSTILE:
        df = spark.createDataFrame([(42,)], f"`{name.replace('`', '``')}` int")
        assert df.select(qcol(name).alias("x")).collect()[0]["x"] == 42


@pytest.mark.parametrize("name", HOSTILE)
def test_interval_overlap_join_hostile(spark, name):
    from real_time_recommendation_system_with_feature_store_spark.operators.asof import interval_overlap_join

    t = lambda d: datetime.fromisoformat(f"2024-01-{d:02d} 00:00:00")
    df = spark.createDataFrame(
        [("g", 1, t(1), t(5)), ("g", 2, t(4), t(9)), ("g", 3, t(20), t(21))],
        ["k", "iid", "s", "e"],
    )
    # the hostile name plays key, id, and start-bound roles
    for role in ("k", "iid", "s"):
        ldf = df.withColumnRenamed(role, name)
        rdf = ldf.withColumnRenamed(name if role == "iid" else "iid", "jid")
        key = name if role == "k" else "k"
        lid = name if role == "iid" else "iid"
        sc = name if role == "s" else "s"
        out = interval_overlap_join(
            ldf, rdf, lid, "jid", sc, "e", sc, "e", keys=[key], bin_seconds=3 * 86400
        )
        pairs = {(r[lid], r["jid"]) for r in out.where(F.col("`" + lid.replace("`", "``") + "`") != F.col("jid")).collect()}
        assert pairs == {(1, 2), (2, 1)}, (role, pairs)


@pytest.mark.parametrize("name", HOSTILE)
def test_funnel_state_stream_hostile(spark, name, tmp_path):
    """The streaming funnel sink must route every received column name
    through qcol exactly like the batch operator it twins: a dotted group
    key or timestamp name that funnel_stage_times survives must also
    survive the foreachBatch compaction + fold."""
    from real_time_recommendation_system_with_feature_store_spark.operators.funnel import funnel_stage_times
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        funnel_state_stream,
        read_funnel_state,
    )

    g, ts, ty = name, name + " ts", name + " ty"
    qi = lambda n: "`" + n.replace("`", "``") + "`"
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:01", "view"),
            (1, "2024-01-01 00:00:05", "click"),
            (1, "2024-01-01 00:00:03", "other"),
            (2, "2024-01-01 00:00:07", "click"),  # click but never viewed
        ],
        f"{qi(g)} bigint, {qi(ts)} string, {qi(ty)} string",
    ).withColumn(ts, qcol(ts).cast("timestamp"))

    state_dir = str(tmp_path / "funnel_state")
    sink = funnel_state_stream(state_dir, [g], ["view", "click"], ts_col=ts, type_col=ty)
    sink(df, 0)

    folded = read_funnel_state(spark, state_dir)
    steps = ["view", "click"]
    got = {
        r[g]: (r["t_view"], r["t_click"])
        for r in funnel_stage_times(folded, steps, [g], ts_col=ts, type_col=ty).collect()
    }
    exp = {
        r[g]: (r["t_view"], r["t_click"])
        for r in funnel_stage_times(df, steps, [g], ts_col=ts, type_col=ty).collect()
    }
    assert got == exp
    assert got[1][0] is not None and got[1][1] is not None  # full conversion
    assert got[2][0] is None  # never viewed -> no stage-0 time


@pytest.mark.parametrize("name", HOSTILE)
def test_cohort_state_stream_hostile(spark, name, tmp_path):
    """The streaming cohort sink under hostile entity/period names: the
    compacted distinct-pairs state folds to the same retention matrix the
    batch operator computes, and the epoch partition really is distinct."""
    from real_time_recommendation_system_with_feature_store_spark.operators.cohort import cohort_retention
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        cohort_state_stream,
        read_cohort_state,
    )

    e, p = name, name + " d"
    qi = lambda n: "`" + n.replace("`", "``") + "`"
    df = spark.createDataFrame(
        [(1, 0), (1, 0), (1, 1), (2, 1), (2, None)],
        f"{qi(e)} bigint, {qi(p)} bigint",
    )

    state_dir = str(tmp_path / "cohort_state")
    sink = cohort_state_stream(state_dir, e, p)
    sink(df, 0)

    # compacted epoch state: distinct non-null pairs only
    assert spark.read.parquet(state_dir + "/epoch=0").count() == 3

    folded = read_cohort_state(spark, state_dir)
    key = lambda r: (r["cohort_day"], r["day_offset"])
    got = {key(r): (r["n_users"], r["retention"]) for r in cohort_retention(folded, e, p).collect()}
    exp = {key(r): (r["n_users"], r["retention"]) for r in cohort_retention(df, e, p).collect()}
    assert got == exp
    assert got[(0, 0)] == (1, 1.0) and got[(0, 1)] == (1, 1.0) and got[(1, 0)] == (1, 1.0)


@pytest.mark.parametrize("name", HOSTILE)
def test_transition_state_stream_hostile(spark, name, tmp_path):
    """The streaming Markov-transition sink under hostile entity/order/item
    names: the frontier stitch across micro-batches still counts the
    cross-batch pair, and the fold matches the expected matrix."""
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        read_transition_state,
        transition_state_stream,
    )

    e, ts, iid, item = name, name + " ts", name + " id", name + " item"
    qi = lambda n: "`" + n.replace("`", "``") + "`"
    mk = lambda rows: spark.createDataFrame(
        rows, f"{qi(e)} bigint, {qi(ts)} bigint, {qi(iid)} bigint, {qi(item)} bigint"
    )
    state_dir = str(tmp_path / "tstate")
    sink = transition_state_stream(state_dir, e, [ts, iid], item)
    sink(mk([(1, 1, 1, 10), (1, 2, 2, 11)]), 0)
    sink(mk([(1, 3, 3, 12), (2, 3, 4, 10)]), 1)  # (11->12) is the stitch pair

    got = {
        (r["prev_item"], r["next_item"]): r["n"]
        for r in read_transition_state(spark, state_dir).collect()
    }
    assert got == {(10, 11): 1, (11, 12): 1}


@pytest.mark.parametrize("name", HOSTILE)
def test_bm25_index_stream_hostile(spark, name, tmp_path):
    """The streaming BM25 sink receives id/text column names from the
    caller: a dotted or quoted name must index identically to a plain one
    (the internal frames rename to fixed doc_id/term/tf columns, so only
    the ingest projection touches the hostile names)."""
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        bm25_index_stream,
        bm25_score_from_index,
    )

    idc, txt = name + " id", name + " txt"
    qi = lambda n: "`" + n.replace("`", "``") + "`"
    df = spark.createDataFrame(
        [(1, "join hash join"), (2, "window scan"), (3, None)],
        f"{qi(idc)} bigint, {qi(txt)} string",
    )
    index_dir = str(tmp_path / "bm25_hostile")
    sink = bm25_index_stream(index_dir, idc, txt)
    sink(df, 0)
    got = {r["doc_id"]: r["score"] for r in bm25_score_from_index(spark, index_dir, ["join"]).collect()}
    assert set(got) == {1, 2}
    assert got[1] > got[2] == 0.0


@pytest.mark.parametrize("name", HOSTILE)
def test_ivf_index_stream_hostile(spark, name, tmp_path):
    """The streaming IVF sink's ingest projection must treat hostile
    id/vector names as single identifiers; assignments land under the
    internal __iid/__iv/__cell schema either way."""
    from real_time_recommendation_system_with_feature_store_spark.operators.knn import ivf_build_centroids
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        ivf_index_stream,
        ivf_search_from_index,
    )

    idc, vec = name + " id", name + " v"
    qi = lambda n: "`" + n.replace("`", "``") + "`"
    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)]) for i in range(12)]
    df = spark.createDataFrame(rows, f"{qi(idc)} bigint, {qi(vec)} array<double>")
    cents = ivf_build_centroids(df, idc, vec, n_cells=3, refine_iters=1)
    index_dir = str(tmp_path / "ivf_hostile")
    sink = ivf_index_stream(index_dir, idc, vec, cents)
    sink(df, 0)
    q = df.select(qcol(idc).alias("qid"), qcol(vec).alias("emb")).where(F.col("qid") < 3)
    out = ivf_search_from_index(
        spark, index_dir, q, "qid", "emb", item_id="nn", k=2, n_probe=1
    ).collect()
    assert len(out) == 3 * 2
    # nearest neighbors of an axis vector are same-axis vectors (cosine 1)
    for r in out:
        if r["rank"] == 1:
            assert r["score"] == 1.0 and r["nn"] % 3 == r["qid"] % 3


@pytest.mark.parametrize("name", HOSTILE)
def test_agg_ivm_hostile(spark, name):
    """agg_delta/apply_agg_delta receive group-key, op, and measure column
    names from the caller — dotted/spaced/quoted names must maintain the
    rollup identically to plain ones."""
    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import agg_delta, apply_agg_delta

    g, op, m = name, name + " op", name + " m"
    qi = lambda n: "`" + n.replace("`", "``") + "`"
    base = spark.createDataFrame(
        [("x", 10.0), ("y", 5.0)], f"{qi(g)} string, {qi(m)} double"
    )
    view = base.groupBy(qcol(g)).agg(
        F.count("*").alias("n"),
        F.sum(qcol(m).cast("decimal(28,10)")).alias("total"),
    )
    chg = spark.createDataFrame(
        [("D", "x", 10.0), ("I", "x", 11.0), ("I", "z", 3.0)],
        f"{qi(op)} string, {qi(g)} string, {qi(m)} double",
    )
    delta = agg_delta(chg, [g], qcol(m), op_col=op)
    out = apply_agg_delta(view, delta, [g])
    got = {r[g]: (r["n"], float(r["total"])) for r in out.collect()}
    assert got == {"x": (1, 11.0), "y": (1, 5.0), "z": (1, 3.0)}


@pytest.mark.parametrize("name", HOSTILE)
def test_decayed_count_stream_hostile(spark, name, tmp_path):
    """The decayed-count sink receives key/timestamp column names: dotted
    or quoted names must fold the same numeraire sums as plain ones (the
    state schema renames to fixed key/w_sum)."""
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        decayed_count_stream,
        read_decayed_counts,
    )

    k, ts = name + " k", name + " ts"
    qi = lambda n: "`" + n.replace("`", "``") + "`"
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", "2024-01-02 00:00:00"),
         ("b", "2024-01-02 00:00:00"), (None, "2024-01-02 00:00:00")],
        f"{qi(k)} string, {qi(ts)} string",
    ).select(qcol(k), qcol(ts).cast("timestamp").alias(ts))
    state_dir = str(tmp_path / "decayed_hostile")
    sink = decayed_count_stream(
        state_dir, k, ts, half_life="1 days", anchor="2024-01-01 00:00:00"
    )
    sink(df, 0)
    got = {
        r["key"]: r["decayed_count"]
        for r in read_decayed_counts(
            spark, state_dir, "2024-01-02 00:00:00",
            half_life="1 days", anchor="2024-01-01 00:00:00",
        ).collect()
    }
    assert got == {"a": 0.5 + 1.0, "b": 1.0}


@pytest.mark.parametrize("name", HOSTILE)
def test_tombstone_streams_hostile(spark, name, tmp_path):
    """Both tombstone sinks receive the id column name from the caller:
    hostile names must tombstone exactly the named ids."""
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        bm25_index_stream,
        bm25_score_from_index,
        bm25_tombstone_stream,
        lsh_index_stream,
        lsh_search_from_index,
        vector_tombstone_stream,
    )

    idc = name + " id"
    qi = lambda n: "`" + n.replace("`", "``") + "`"

    # BM25: tombstone doc 1, only doc 2 keeps scoring
    bdir = str(tmp_path / "bm25_tomb_hostile")
    docs = spark.createDataFrame(
        [(1, "join hash"), (2, "join window")],
        f"{qi(idc)} bigint, txt string",
    )
    bm25_index_stream(bdir, idc, "txt")(docs, 0)
    bm25_tombstone_stream(bdir, idc)(docs.where(qcol(idc) == 1), 1)
    got = {r["doc_id"] for r in bm25_score_from_index(spark, bdir, ["join"]).collect()}
    assert got == {2}

    # LSH: tombstone vector 0, it leaves every candidate set
    vdir = str(tmp_path / "lsh_tomb_hostile")
    vecs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, float(i), 0.5]) for i in range(8)],
        f"{qi(idc)} bigint, v array<double>",
    )
    lsh_index_stream(vdir, idc, "v", dim=4)(vecs, 0)
    vector_tombstone_stream(vdir, idc)(vecs.where(qcol(idc) == 0), 1)
    out = lsh_search_from_index(
        spark, vdir, vecs.select(qcol(idc).alias("qid"), "v"), "qid", "v",
        dim=4, item_id="nn", k=3,
    )
    assert all(r["nn"] != 0 for r in out.collect())


@pytest.mark.parametrize("name", HOSTILE)
def test_topk_ivm_hostile(spark, name):
    """build_topk_buffer / apply_topk_delta / topk_from_buffer with the
    hostile name playing every role: group key, id, and measure."""
    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import (
        apply_topk_delta,
        build_topk_buffer,
        topk_from_buffer,
    )

    esc = name.replace("`", "``")
    base = spark.createDataFrame(
        [("g1", 0, 5.0), ("g1", 1, 4.0), ("g1", 2, 3.0), ("g2", 9, 1.0)],
        ["k", "i", "m"],
    )
    for df, key, idc, mc in [
        (base.withColumnRenamed("k", name), name, "i", "m"),
        (base.withColumnRenamed("i", name), "k", name, "m"),
        (base.withColumnRenamed("m", name), "k", "i", name),
    ]:
        view = build_topk_buffer(df, [key], idc, mc, 2)
        chg = spark.createDataFrame(
            [("I", "g1", 7, 9.0), ("D", "g2", 9, 1.0)], ["op", "k", "i", "m"]
        )
        chg = (
            chg.withColumnRenamed("k", key)
            .withColumnRenamed("i", idc)
            .withColumnRenamed("m", mc)
        )
        out = apply_topk_delta(view, chg, df, [key], idc, mc, k=1, buffer_k=2)
        top = topk_from_buffer(out, [key], idc, mc, 1)
        got = {
            (r[key], r["rn"]): (r[idc], r[mc]) for r in top.collect()
        }
        assert got == {("g1", 1): (7, 9.0)}


@pytest.mark.parametrize("name", HOSTILE)
def test_extrema_stream_fold_hostile(spark, name):
    """collapse_extrema_changes / the stream fold read with hostile key
    and measure names."""
    import os
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import apply_extrema_delta
    from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
        extrema_delta_stream,
        read_extrema_delta_state,
    )

    base = spark.createDataFrame([("a", 1.0), ("a", 5.0)], ["k", "m"])
    for df, key, mc in [
        (base.withColumnRenamed("k", name), name, "m"),
        (base.withColumnRenamed("m", name), "k", name),
    ]:
        view = df.groupBy(qcol(key)).agg(
            F.min(qcol(mc)).alias("mn"), F.max(qcol(mc)).alias("mx")
        )
        tmp = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".tmp", "extrema_hostile",
        )
        shutil.rmtree(tmp, ignore_errors=True)
        sink = extrema_delta_stream(tmp, [key], mc)
        chg = spark.createDataFrame([("I", "a", 9.0)], ["op", "k", "m"])
        chg = chg.withColumnRenamed("k", key).withColumnRenamed("m", mc)
        sink(chg, 0)
        folded = read_extrema_delta_state(spark, tmp, [key])
        out = apply_extrema_delta(
            view, folded, df, [key], mc, collapsed=True
        )
        got = {r[key]: (r["mn"], r["mx"]) for r in out.collect()}
        assert got == {"a": (1.0, 9.0)}


@pytest.mark.parametrize("name", HOSTILE)
def test_distinct_ivm_hostile(spark, name):
    """The distinct-count IVM triple with the hostile name in BOTH roles:
    group key and counted value."""
    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import (
        apply_distinct_delta,
        build_distinct_support,
        distinct_from_support,
    )

    esc = name.replace("`", "``")
    base = spark.createDataFrame(
        [("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")],
        f"`{esc}` string, v string",
    )
    for keys, val, mk in [
        ([name], "v", lambda op, g, v: (op, g, v)),
        (["g"], name, lambda op, g, v: (op, g, v)),
    ]:
        df = base if keys == [name] else base.withColumnRenamed(name, "g")
        if val == name:
            df = df.withColumnRenamed("v", name)
        support = build_distinct_support(df, keys, val)
        view = distinct_from_support(support, keys)
        chg = spark.createDataFrame(
            [mk("D", "g1", "y"), mk("I", "g2", "w")],
            f"op string, `{esc if keys == [name] else 'g'}` string, "
            f"`{esc if val == name else 'v'}` string",
        )
        nv, ns = apply_distinct_delta(view, support, chg, keys, val)
        got = {r[keys[0]]: r["nd"] for r in nv.collect()}
        assert got == {"g1": 1, "g2": 2}
        assert ns.count() == 3  # (g1,x supp=2), (g2,z), (g2,w) - (g1,y) died


@pytest.mark.parametrize("name", HOSTILE)
def test_join_view_ivm_hostile(spark, name):
    """The join-view IVM with the hostile name as join key, row id, and
    value column simultaneously on the A side."""
    from real_time_recommendation_system_with_feature_store_spark.operators.ivm import (
        apply_join_delta,
        join_view_delta,
    )

    esc = name.replace("`", "``")
    a = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0)], f"`{esc}` int, k int, av double"
    )
    b = spark.createDataFrame([(10, "x"), (20, "y")], "k int, battr string")
    view = a.join(b, ["k"], "inner")
    delta_a = spark.createDataFrame(
        [("D", 2, 20, 2.0), ("I", 3, 10, 3.0)],
        f"op string, `{esc}` int, k int, av double",
    )
    dv = join_view_delta(a, delta_a, b, None, ["k"])
    out = apply_join_delta(view, dv, [name])
    got = sorted((r[name], r["k"], r["av"], r["battr"]) for r in out.collect())
    assert got == [(1, 10, 1.0, "x"), (3, 10, 3.0, "x")]
