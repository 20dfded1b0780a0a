"""Corpus-curation operators for large-scale training-data pipelines.

Four primitives a pretraining-data pipeline needs on top of the dedup /
quality / sampling stack (reference scope: the feature-store's batch
pipelines, `src/features/feature_pipeline.py`, stop at interaction-level
features — these extend the same deterministic md5-keyed design to
corpus-level curation, per the public CCNet / Gopher data recipes):

  mixture_resample       downsample domains so the surviving corpus hits a
                         target domain/language mixture (binding-constraint
                         rule: the scarcest domain caps the total)
  grouped_fraction_split leakage-safe train/valid/test folds — every row of
                         a group (e.g. an exact-dup fingerprint or a near-dup
                         cluster) lands in the SAME fold
  cluster_keepers        pick ONE representative per duplicate cluster by
                         quality (longest doc wins, not min-id)
  char_bigram_lm_scores  CCNet-style quality filter: train a char-bigram LM
                         on the corpus itself, score each doc by average
                         negative log-likelihood (high avg-NLL = gibberish)
  scrub_pii              typed redaction of emails / IPv4s / long digit runs
                         with per-category counts (pure regexp, zero shuffle)

All pseudo-randomness is md5-of-key (`hash_unit`) so results are identical
under any partitioning/AQE re-plan and replayable in the ANSI-SQL oracles
(SURVEY.md §4.3).

Scale notes (100 TB):
  * mixture_resample: one tiny groupBy(domain) count (|domains| rows), the
    rate table broadcasts back — the fact scan is filtered map-side.
  * grouped_fraction_split: pure map-side expression, zero shuffles.
  * cluster_keepers: the label table of connected_components is |nodes in
    any pair| (duplicates only, << corpus), broadcast back onto the corpus;
    the per-cluster argmax is a shuffle on cluster_id (clusters are tiny).
  * char_bigram_lm_scores: one shuffle keyed (doc_id, bigram) for per-doc
    counts; the model is at most |charset|^2 rows and broadcasts into the
    scoring join, so scoring never shuffles the corpus again.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions.scalars import hash_unit


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    targets: Mapping[str, float],
    key_cols: Sequence[str],
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample so surviving domain shares match
    ``targets`` (e.g. ``{"en": .5, "code": .3, "de": .2}``).

    The achievable corpus size is capped by the scarcest domain:
    ``T = min_d(n_d / share_d)``; each domain then keeps
    ``rate_d = share_d * T / n_d`` of its rows (the binding domain keeps
    100%). Domains absent from ``targets`` are dropped — resampling to a
    mixture IS a domain filter. A target domain with NO corpus rows caps T
    at 0 and the result is EMPTY: no corpus can hit a positive share of a
    missing domain, and a misspelled domain key should be loudly visible,
    not silently renormalized away. Rows are kept by md5-of-key uniform, so
    the sample is stable under re-partitioning and reproducible in SQL.
    """
    if not targets:
        raise ValueError("targets must be a non-empty {domain: share} mapping")
    total = float(sum(targets.values()))
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(str(d), float(s) / total) for d, s in sorted(targets.items())],
        f"{domain_col} string, __share double",
    )
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    # scalar aggregate: 1-row cap table (an intentional single-row Exchange).
    # LEFT join from targets: a target domain missing from the corpus
    # contributes 0/share = 0 to the min instead of dropping out of it.
    cap = (
        tgt.join(counts, domain_col, "left")
        .agg(F.min(F.coalesce(F.col("__n"), F.lit(0)) / F.col("__share")).alias("__cap"))
    )
    rates = (
        counts.join(tgt, domain_col)
        .join(F.broadcast(cap))
        .select(
            domain_col,
            F.least(F.lit(1.0), F.col("__share") * F.col("__cap") / F.col("__n")).alias(
                "__rate"
            ),
        )
    )
    u = hash_unit(F.lit(salt), *[F.col(k) for k in key_cols])
    return df.join(F.broadcast(rates), domain_col).where(u < F.col("__rate")).drop("__rate")


def grouped_fraction_split(
    df: DataFrame,
    group: Column | str,
    folds: Sequence[tuple[str, float]],
    salt: str = "gsplit",
    fold_col: str = "fold",
) -> DataFrame:
    """Leakage-safe fold assignment: the uniform is drawn from the GROUP key,
    so all rows of a group land in the same fold (duplicate documents can
    never straddle train/test — the contamination mode a row-level split
    invites). ``folds`` is ordered ``[("train", .8), ("valid", .1),
    ("test", .1)]``; fractions are normalized and carved as half-open
    intervals of the unit uniform, so the assignment is exhaustive."""
    if not folds:
        raise ValueError("folds must be a non-empty ordered [(name, fraction)] list")
    g = F.col(group) if isinstance(group, str) else group
    u = hash_unit(F.lit(salt), g)
    total = float(sum(f for _, f in folds))
    expr = F.lit(folds[-1][0])  # last fold catches the remainder exactly
    cum = 0.0
    conds = []
    for name, frac in folds[:-1]:
        cum += float(frac) / total
        conds.append((name, cum))
    for name, bound in reversed(conds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(fold_col, expr)


def cluster_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality: Column,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-keeper dedup: assign duplicate clusters (connected components
    over ``pairs``), then keep the highest-``quality`` doc per cluster
    (ties break to the smallest id). Docs in no pair are their own cluster
    and always keepers. Returns (id_col, cluster_id, is_keeper).

    This upgrades the reference's MIN-id keep rule (`exact_dedup`) to the
    curation-grade rule public pipelines use: keep the longest / highest-
    quality member, drop the rest.

    Only the docs that appear in some pair (<< corpus) enter the argmax
    window — singletons are emitted map-side as their own keepers, so
    nothing corpus-sized is ever shuffled by cluster_id."""
    from real_time_recommendation_system_with_feature_store_spark.operators.dedup import connected_components

    labels = connected_components(pairs, id_a, id_b)  # (node_id, cluster_id), dup docs only
    base = docs.select(F.col(id_col), quality.cast("double").alias("__q")).join(
        F.broadcast(labels.withColumnRenamed("node_id", id_col)), id_col, "left"
    )
    dups = base.where(F.col("cluster_id").isNotNull())
    w = Window.partitionBy("cluster_id").orderBy(F.col("__q").desc(), F.col(id_col).asc())
    ranked = dups.select(
        id_col, "cluster_id", (F.row_number().over(w) == 1).alias("is_keeper")
    )
    singletons = base.where(F.col("cluster_id").isNull()).select(
        id_col, F.col(id_col).alias("cluster_id"), F.lit(True).alias("is_keeper")
    )
    return ranked.unionByName(singletons)


def char_bigram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 1.0,
    kernel: str = "auto",
    max_model_rows: int = 1 << 16,
) -> DataFrame:
    """CCNet-style in-corpus LM quality scoring, character-bigram edition.

    Trains a Laplace-smoothed char-bigram model ON the corpus itself
    (``P(c2|c1) = (count(c1c2)+alpha) / (count(c1.)+alpha*V)``, V = distinct
    successor chars), then scores every doc by average negative
    log-likelihood per bigram. Outlier docs (repetitive gibberish, wrong
    charset) score far from the corpus mode, which is the public CCNet
    recipe's perplexity-bucket filter with the kenlm stage swapped for an
    in-engine model — no external artifacts, fully SQL-replayable.

    Two physical strategies, same rounded-6 outputs (asserted in
    test_scale_paths):
      kernel="arrow" (default when the model fits ``max_model_rows``):
        model build is the ONLY shuffle — map-side partial counts over at
        most |charset|^2 keys, so the exchange is tiny no matter the corpus
        size; the (bigram -> logp) table is collected (bounded by the gate),
        broadcast, and scoring runs as a zero-shuffle Arrow pass over the
        docs. This is the 100 TB shape: nothing doc-sized is ever shuffled.
      kernel="expr": fully relational — ONE shuffle to (doc, bigram) counts,
        model re-aggregated from them, broadcast back onto the per-doc
        counts. No driver collect; the fallback when the charset is
        unbounded (pathological inputs) and the SQL-oracle reference shape.
    Docs shorter than one bigram after trim drop out. Returns
    (id_col, n_bigrams, avg_nll) with avg_nll rounded half-up to 6.
    """
    if kernel not in ("auto", "arrow", "expr"):
        raise ValueError(f"unknown kernel: {kernel!r}")
    t = df.select(
        F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("__t")
    ).where(F.length("__t") >= 2)
    bigrams_expr = "transform(sequence(1, length(__t) - 1), i -> substring(__t, i, 2))"

    def _scored_model(model: DataFrame) -> DataFrame:
        prefix = model.groupBy(F.substring("__bg", 1, 1).alias("__c1")).agg(
            F.sum("__cb").alias("__cp")
        )
        vocab = model.agg(F.countDistinct(F.substring("__bg", 2, 1)).alias("__v"))
        return (
            model.withColumn("__c1", F.substring("__bg", 1, 1))
            .join(F.broadcast(prefix), "__c1")
            .join(F.broadcast(vocab))
            .select(
                "__bg",
                F.log(
                    (F.col("__cb") + F.lit(alpha))
                    / (F.col("__cp") + F.lit(alpha) * F.col("__v"))
                ).alias("__logp"),
            )
        )

    shared_model = None
    if kernel != "expr":
        # model from a bare bigram explode: partial aggregation caps each
        # task's contribution at |charset|^2 rows, so the shuffle is tiny
        model = (
            t.select(F.explode(F.expr(bigrams_expr)).alias("__bg"))
            .groupBy("__bg")
            .agg(F.count("*").alias("__cb"))
            .persist()
        )
        n_model = model.count()
        if n_model <= max_model_rows:
            logp_rows = _scored_model(model).collect()
            model.unpersist()
            return _charlm_score_arrow(t, id_col, {r["__bg"]: r["__logp"] for r in logp_rows})
        # the gate applies even when arrow is forced: collecting an
        # unbounded model to the driver is exactly the OOM the gate exists
        # to prevent — fail loudly instead of bypassing it
        model.unpersist(blocking=False)
        if kernel == "arrow":
            raise ValueError(
                f"char_bigram_lm_scores(kernel='arrow'): model has {n_model} "
                f"bigrams > max_model_rows={max_model_rows}; raise the gate "
                "or use kernel='auto'/'expr'"
            )
        # charset too large to broadcast -> relational path. The model is
        # re-derived from doc_counts below: _scored_model references the
        # model three times (prefix, vocab, main), and deriving all three
        # from the doc_counts aggregation lets ReuseExchange serve them
        # from ONE shuffle — whereas reusing this just-unpersisted frame
        # would re-execute its bare explode+agg per reference.

    grams = t.select(id_col, F.explode(F.expr(bigrams_expr)).alias("__bg"))
    doc_counts = grams.groupBy(id_col, "__bg").agg(F.count("*").alias("__c"))
    model = (
        shared_model
        if shared_model is not None
        else doc_counts.groupBy("__bg").agg(F.sum("__c").alias("__cb"))
    )
    return (
        doc_counts.join(F.broadcast(_scored_model(model)), "__bg")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_bigrams"),
            F.round(-F.sum(F.col("__c") * F.col("__logp")) / F.sum("__c"), 6).alias(
                "avg_nll"
            ),
        )
    )


def _charlm_score_arrow(t: DataFrame, id_col: str, logp: dict) -> DataFrame:
    """Zero-shuffle scoring pass: broadcast (bigram -> logp), one Arrow sweep.

    Sums per DISTINCT bigram (count * logp), matching the relational path's
    aggregation shape, then rounds half-up like Spark/DuckDB ROUND."""
    from pyspark.sql import types as T

    spark = t.sparkSession
    bc = spark.sparkContext.broadcast(logp)
    schema = T.StructType(
        [
            T.StructField(id_col, t.schema[id_col].dataType),
            T.StructField("n_bigrams", T.LongType()),
            T.StructField("avg_nll", T.DoubleType()),
        ]
    )

    def gen(batches):
        import pandas as pd
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        lp = bc.value
        six = Decimal("0.000001")

        def round6(x: float) -> float:
            # Spark's ROUND(double, 6) = BigDecimal HALF_UP over the SHORTEST
            # decimal repr (Double.toString == Python repr) — not the raw
            # binary value, so floor(x*1e6+0.5) can disagree on knife edges
            return float(Decimal(repr(x)).quantize(six, rounding=ROUND_HALF_UP))

        for pdf in batches:
            ids, ns, nlls = [], [], []
            for doc_id, txt in zip(pdf[id_col], pdf["__t"]):
                counts = Counter(txt[i : i + 2] for i in range(len(txt) - 1))
                n = len(txt) - 1
                s = 0.0
                for bg, c in counts.items():
                    s += c * lp[bg]
                ids.append(doc_id)
                ns.append(n)
                nlls.append(round6(-s / n))
            yield pd.DataFrame({id_col: ids, "n_bigrams": ns, "avg_nll": nlls})

    return t.mapInPandas(gen, schema=schema)


def dsir_logratio(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance log-ratio for target-domain data selection
    (Data Selection with Importance Resampling, Xie et al. 2023,
    arXiv:2302.03169 — hashed-ngram LM importance weights), char-bigram
    edition: score every doc by the average per-bigram
    ``log p_target(bg) - log p_raw(bg)`` under two Laplace-smoothed
    char-bigram models, the target model trained on the ``is_target``
    slice and the raw model on the whole corpus. High scores = docs whose
    character statistics look like the target domain; rank-and-take-top-k
    on the score is the paper's top-k selection variant (deterministic —
    no Gumbel noise, so the whole pipeline is engine-replayable).

    Fully relational and SQL-replayable: ONE fact shuffle to per-doc
    bigram counts; BOTH models re-aggregate from that frame (tiny
    |charset|^2-bounded keys), broadcast back as one log-ratio per bigram.
    Both models Laplace-smooth over the SAME vocabulary — the corpus-wide
    distinct second-char count V. DSIR's importance ratio requires the
    two distributions be normalized over one shared event space: smoothing
    the target model over only *its own* charset inflates the unseen-bigram
    floor ``alpha/(cp + alpha*V_t)`` whenever V_t < V, which can push the
    floor ABOVE the raw model's estimate and give out-of-domain text a
    positive score (the selection signal inverts). Bigrams unseen in the
    target slice get the floor ``log(alpha / (cp + alpha*V))`` via
    left-join + coalesce (the raw model has every corpus bigram by
    construction). Returns ``(id_col, n_bigrams, logratio)`` with logratio
    rounded half-up to 6.

    Caller contract: the ``is_target`` slice must be non-empty — an empty
    target leaves every bigram at the uniform floor, so the log-ratio
    carries no selection signal; this is the same "target domain must
    exist" contract mixture_resample enforces for its shares.
    """
    t = df.select(
        F.col(id_col),
        F.col(is_target).cast("boolean").alias("__is_t")
        if isinstance(is_target, str)
        else is_target.cast("boolean").alias("__is_t"),
        F.lower(F.trim(F.col(text_col))).alias("__t"),
    ).where(F.length("__t") >= 2)
    bigrams_expr = "transform(sequence(1, length(__t) - 1), i -> substring(__t, i, 2))"
    grams = t.select(id_col, "__is_t", F.explode(F.expr(bigrams_expr)).alias("__bg"))
    dc = grams.groupBy(id_col, "__bg").agg(
        F.count("*").alias("__c"), F.max("__is_t").alias("__is_t")
    )
    raw = dc.groupBy("__bg").agg(F.sum("__c").alias("__cbr"))
    tgt = dc.where(F.col("__is_t")).groupBy("__bg").agg(F.sum("__c").alias("__cbt"))
    praw = raw.groupBy(F.substring("__bg", 1, 1).alias("__c1")).agg(
        F.sum("__cbr").alias("__cpr")
    )
    ptgt = tgt.groupBy(F.substring("__bg", 1, 1).alias("__c1")).agg(
        F.sum("__cbt").alias("__cpt")
    )
    vraw = raw.agg(F.countDistinct(F.substring("__bg", 2, 1)).alias("__vr"))
    lp_t = F.log(
        (F.coalesce(F.col("__cbt"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("__cpt"), F.lit(0)) + F.lit(alpha) * F.col("__vr"))
    )
    lp_r = F.log(
        (F.col("__cbr") + F.lit(alpha)) / (F.col("__cpr") + F.lit(alpha) * F.col("__vr"))
    )
    ratio = (
        raw.withColumn("__c1", F.substring("__bg", 1, 1))
        .join(F.broadcast(tgt), "__bg", "left")
        .join(F.broadcast(praw), "__c1")
        .join(F.broadcast(ptgt), "__c1", "left")
        .join(F.broadcast(vraw))
        .select("__bg", (lp_t - lp_r).alias("__lr"))
    )
    return (
        dc.join(F.broadcast(ratio), "__bg")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_bigrams"),
            F.round(F.sum(F.col("__c") * F.col("__lr")) / F.sum("__c"), 6).alias(
                "logratio"
            ),
        )
    )


def dsir_resample(
    scores: DataFrame,
    id_col: str,
    score_col: str,
    k: int,
    salt: str = "dsir",
    temperature: float = 1.0,
    key_col: str = "sel_key",
    rank_col: str = "rank",
) -> DataFrame:
    """DSIR step 2 — seeded Gumbel top-k importance RESAMPLING (Xie et
    al. 2023, arXiv:2302.03169 §2: the paper selects by sampling with
    probability proportional to the importance weight, not by plain
    top-k over the log-ratio). Draws k rows WITHOUT replacement with
    ``P(i) ∝ exp(score_i / temperature)`` via the Gumbel-top-k trick
    (Kool et al. 2019, arXiv:1903.06059): perturb each score with
    independent Gumbel(0,1) noise ``g_i = -ln(-ln u_i)`` and keep the k
    largest ``score_i/temperature + g_i`` — distributionally identical
    to Efraimidis–Spirakis A-ES with weight ``e^{score/T}`` (the
    ``weighted_sample`` operator) but computed in LOG space, so extreme
    log-ratios never overflow an explicit exp().

    Determinism contract: ``u_i`` derives from md5(salt, id) exactly like
    every sampler in operators/sampling.py — stable under any
    partitioning/AQE re-plan and replayable in an ANSI-SQL oracle. The
    uniform is ``(bucket + 0.5) / 2^32`` over the first-8-hex-digit
    bucket, strictly inside (0,1), so the double log never sees 0.
    Temperature sharpens (T→0 approaches deterministic top-k by score)
    or flattens (T→∞ approaches uniform sampling) the selection.

    Output: the input row + ``key_col`` (the Gumbel-perturbed key,
    rounded half-up to 6 for cross-engine value parity) + ``rank_col``
    (1..k in key-desc order, id tiebreak). Scale: the key is a pure
    expression and the selection is ``global_topn_ranked`` — per-
    partition top-k heaps + driver merge (TakeOrderedAndProject), never
    a global sort; resampling a 100 TB corpus shuffles only winners.

    Tie semantics (r9 verdict #6): the 6-dp rounding can collide two
    docs' keys (P ≈ |docs|²/2 · 2e-6 · key-density per unit — vanishing
    for continuous scores, nonzero for coarse ones); the id-asc tiebreak
    keeps selection deterministic but biases exact-tie resolution toward
    low ids. This is a deliberate trade: ranking on the ROUNDED key is
    what lets a DuckDB/ANSI oracle replay the ordering bit-for-bit
    (unrounded doubles from ln() are not guaranteed to agree across
    engines). Callers needing unbiased ties can salt the id space.

    Determinism precondition: ``id_col`` must be NON-NULL — concat_ws
    skips NULLs, so every NULL-id row would collapse onto md5(salt) and
    share ONE Gumbel draw (and escape the id tiebreak). Violations fail
    loudly in-plan via a runtime assert rather than silently degrading
    the contract.
    """
    from real_time_recommendation_system_with_feature_store_spark.ident import qcol
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import global_topn_ranked

    if k <= 0:
        raise ValueError(f"dsir_resample: k must be positive, got {k}")
    if temperature <= 0:
        raise ValueError(
            f"dsir_resample: temperature must be positive, got {temperature}"
        )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", F.lit(salt), qcol(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (bucket + F.lit(0.5)) / F.lit(float(2**32))
    gumbel = -F.log(-F.log(u))
    # assert_true is NULL when the condition holds, so coalesce passes the
    # key through untouched; a NULL id raises at execution time instead of
    # silently collapsing onto md5(salt)'s shared draw (r9 ADVICE)
    null_guard = F.assert_true(
        qcol(id_col).isNotNull(),
        F.lit(
            "dsir_resample: NULL id_col — every NULL-id row would share one "
            "Gumbel draw, breaking the md5-seeded determinism contract"
        ),
    ).cast("double")
    key = F.coalesce(
        null_guard, qcol(score_col) / F.lit(float(temperature)) + gumbel
    )
    perturbed = scores.withColumn(key_col, F.round(key, 6))
    return global_topn_ranked(
        perturbed,
        [F.col(key_col).desc(), qcol(id_col).asc()],
        k,
        rank_col=rank_col,
    )


# PII patterns shared verbatim by the Spark expressions and the SQL oracle —
# restricted to syntax Java regex and RE2 (DuckDB) interpret identically
# (character classes, bounded reps, \b, \d; no backrefs or lookaround).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_NUM = r"\d{7,}"


def scrub_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Curation-stage PII redaction: mask emails, IPv4 addresses, and long
    digit runs (phone/account-shaped) with typed placeholders, counting each
    category on the ORIGINAL text. Pure regexp expressions — zero shuffle,
    whole-stage codegen, and the replace chain is order-sensitive by design
    (emails first, so their digits never half-match as numbers; IPv4 octets
    are <= 3 digits so the long-num pass can't eat them).

    Returns (id_col, redacted, n_emails, n_ipv4, n_long_numbers). The public
    recipe slot: the C4/CCNet-style scrubbing pass between quality filtering
    and dedup (redaction BEFORE dedup, so masked duplicates still collide).
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_LONG_NUM,
        "<NUM>",
    )
    return df.select(
        F.col(id_col),
        redacted.alias("redacted"),
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_LONG_NUM)).alias("n_long_numbers"),
    )
