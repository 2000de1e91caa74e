"""Round-6 capability extensions ([EXT]): field-weighted lexical
ranking (BM25F), vector-arithmetic retrieval, point-in-time-correct
feature assembly, and ingest volume anomaly detection — four operators
a production search + ML-data platform serves that the existing 300+
registry entries did not yet cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.functions.vector import fixed_point_q
from cnc_visionsearch_spark.queries_hybrid import _B, _K1, _TERMS
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

# ------------------------------------------------------------------ BM25F

_TITLE_LEN = 5  # synthetic title field: the first 5 tokens
_W_TITLE = 2.0
_W_BODY = 1.0

# SQL twin of _bm25f_scored — shared by the BM25F query and the
# rank-correlation eval so the two can never desync.
_BM25F_CTES = f"""
ftoks AS (
  SELECT doc_id, string_split(text, ' ') AS tl FROM documents
),
fielded AS (
  SELECT doc_id, tok, {_W_TITLE} AS w
  FROM (SELECT doc_id, unnest(tl[1:{_TITLE_LEN}]) AS tok FROM ftoks)
  UNION ALL
  SELECT doc_id, tok, {_W_BODY} AS w
  FROM (SELECT doc_id, unnest(tl[{_TITLE_LEN + 1}:]) AS tok FROM ftoks)
),
dlw AS (
  SELECT doc_id,
    {_W_TITLE} * least(len(tl), {_TITLE_LEN})
      + {_W_BODY} * greatest(len(tl) - {_TITLE_LEN}, 0) AS dl_w
  FROM ftoks
),
fqtok AS (
  SELECT doc_id, tok, w FROM fielded
  WHERE tok IN ({", ".join(repr(t) for t in _TERMS)})
),
wtf AS (
  SELECT doc_id, tok, CAST(sum(w) AS DOUBLE) AS tf
  FROM fqtok GROUP BY doc_id, tok
),
fdfreq AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
  FROM fqtok GROUP BY tok
),
fcorpus AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
favg AS (SELECT sum(dl_w) / count(*) AS avgdl FROM dlw),
fperterm AS (
  SELECT wtf.doc_id,
    CAST(floor(
      (((n_docs - df + 0.5) / (df + 0.5))
        * (tf * {_K1 + 1.0})
        / (tf + {_K1} * (1.0 - {_B} + {_B} * dl_w / avgdl)))
      * 1000000000.0 + 0.5) AS BIGINT) AS sq
  FROM wtf JOIN fdfreq USING (tok) JOIN dlw USING (doc_id), fcorpus, favg
),
bm25f AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
    CAST(sum(sq) AS BIGINT) AS score_q
  FROM fperterm GROUP BY doc_id
)
"""


def _bm25f_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_terms, score_q) under BM25F field weighting — the
    Spark twin of ``_BM25F_CTES``."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tl"))
    title = toks.select(
        "doc_id",
        F.explode(F.slice("tl", 1, _TITLE_LEN)).alias("tok"),
        F.lit(_W_TITLE).alias("w"),
    )
    body = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"slice(tl, {_TITLE_LEN + 1},"
                f" greatest(size(tl) - {_TITLE_LEN}, 0))"
            )
        ).alias("tok"),
        F.lit(_W_BODY).alias("w"),
    )
    fielded = title.unionByName(body).filter(F.col("tok").isin(_TERMS))
    wtf = fielded.groupBy("doc_id", "tok").agg(
        F.sum("w").cast("double").alias("tf")
    )
    dfreq = fielded.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("double").alias("df")
    )
    dlw = toks.select(
        "doc_id",
        (
            F.lit(_W_TITLE) * F.least(F.size("tl"), F.lit(_TITLE_LEN))
            + F.lit(_W_BODY)
            * F.greatest(F.size("tl") - _TITLE_LEN, F.lit(0))
        ).alias("dl_w"),
    )
    corpus = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    avg = dlw.agg((F.sum("dl_w") / F.count(F.lit(1))).alias("avgdl"))
    scored = (
        wtf.join(F.broadcast(dfreq), "tok")
        .join(dlw, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(avg))
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    denom = F.col("tf") + F.lit(_K1) * (
        F.lit(1.0) - F.lit(_B) + F.lit(_B) * F.col("dl_w") / F.col("avgdl")
    )
    perterm = scored.select(
        "doc_id",
        fixed_point_q(idf * (F.col("tf") * F.lit(_K1 + 1.0)) / denom).alias(
            "sq"
        ),
    )
    return perterm.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("sq").cast("bigint").alias("score_q"),
    )


@register(
    "text_bm25f_title_boost",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tl FROM documents
),
fielded AS (
  SELECT doc_id, tok, {_W_TITLE} AS w
  FROM (SELECT doc_id, unnest(tl[1:{_TITLE_LEN}]) AS tok FROM toks)
  UNION ALL
  SELECT doc_id, tok, {_W_BODY} AS w
  FROM (SELECT doc_id, unnest(tl[{_TITLE_LEN + 1}:]) AS tok FROM toks)
),
dlw AS (
  SELECT doc_id,
    {_W_TITLE} * least(len(tl), {_TITLE_LEN})
      + {_W_BODY} * greatest(len(tl) - {_TITLE_LEN}, 0) AS dl_w
  FROM toks
),
qtok AS (
  SELECT doc_id, tok, w FROM fielded
  WHERE tok IN ({", ".join(repr(t) for t in _TERMS)})
),
wtf AS (
  SELECT doc_id, tok, CAST(sum(w) AS DOUBLE) AS tf
  FROM qtok GROUP BY doc_id, tok
),
dfreq AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
  FROM qtok GROUP BY tok
),
corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
avg AS (SELECT sum(dl_w) / count(*) AS avgdl FROM dlw),
perterm AS (
  SELECT wtf.doc_id,
    CAST(floor(
      (((n_docs - df + 0.5) / (df + 0.5))
        * (tf * {_K1 + 1.0})
        / (tf + {_K1} * (1.0 - {_B} + {_B} * dl_w / avgdl)))
      * 1000000000.0 + 0.5) AS BIGINT) AS sq
  FROM wtf JOIN dfreq USING (tok) JOIN dlw USING (doc_id), corpus, avg
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
  CAST(sum(sq) AS BIGINT) AS score_q
FROM perterm GROUP BY doc_id
ORDER BY score_q DESC, doc_id ASC
LIMIT 10
""",
    doc="BM25F field-weighted retrieval (Robertson/Zaragoza/Taylor "
    "CIKM'04, the weighted-field simplification): the first "
    f"{_TITLE_LEN} tokens act as a TITLE field at weight {_W_TITLE}, "
    "the rest as body at 1.0; term frequencies and the length "
    "normalizer both use the field-weighted counts, then the "
    "standard k1/b saturation and the repo's rational idf (no ln) "
    "on top — so a query term in the title outranks the same term "
    "buried in the body, the behavior every structured-document "
    "search engine ships. Shares the exact BM25 formula instance "
    "(k1/b constants imported from the canonical _bm25_perterm) and "
    "the 1e-9-quantize + BIGINT-sum discipline; plan is the same "
    "one-scan early-filtered explode with broadcast df/corpus stats "
    "and a TakeOrdered top-10 — field weighting is a PROJECTION "
    "(per-token weight literal), costing nothing at 100 TB.",
)
def text_bm25f_title_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25f_scored(spark, sf_dir)
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# ------------------------------------------------------ vector analogy

_ANA_A, _ANA_B, _ANA_C = 3, 5, 11


@register(
    "emb_vector_analogy_topk",
    oracle=f"""
WITH normed AS (
  SELECT vec_id, list_transform(
    embedding::DOUBLE[],
    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))
  ) AS nvec
  FROM embeddings
),
abc AS (
  SELECT
    (SELECT nvec FROM normed WHERE vec_id = {_ANA_A}) AS va,
    (SELECT nvec FROM normed WHERE vec_id = {_ANA_B}) AS vb,
    (SELECT nvec FROM normed WHERE vec_id = {_ANA_C}) AS vc
),
raw AS (
  SELECT list_transform(range(1, len(va) + 1),
    i -> va[i] - vb[i] + vc[i]) AS t
  FROM abc
),
target AS (
  SELECT list_transform(t,
    x -> x / sqrt(list_sum(list_transform(t, y -> y*y)))) AS tvec
  FROM raw
),
scored AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, len(nvec) + 1),
      i -> nvec[i] * tvec[i])) AS score
  FROM normed, target
  WHERE vec_id <> {_ANA_A} AND vec_id <> {_ANA_B} AND vec_id <> {_ANA_C}
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT)
    AS rank,
  vec_id, score
FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10
""",
    doc="Vector-arithmetic retrieval (the word2vec analogy operator, "
    "Mikolov et al. 2013): target = normalize(a - b + c) over three "
    "corpus vectors, then cosine top-10 excluding the operands — the "
    "query-composition capability (concept algebra, 'this but not "
    "that' probes) a vector engine exposes beyond plain kNN. The "
    "target builds DISTRIBUTED from three 1-row lookups (zip_with "
    "chains — no driver-side vector math), its normalizer is the "
    "same sequential-fold-in-array-order contract every distance "
    "here relies on, and the scan is the W1 TakeOrdered top-k: one "
    "pass, no shuffle. Rank column from the bounded post-limit "
    "window (operators/rank.global_topn discipline).",
)
def emb_vector_analogy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.functions.vector import dot
    from cnc_visionsearch_spark.operators.knn import with_normalized
    from cnc_visionsearch_spark.operators.rank import global_topn

    emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
    va = emb.filter(F.col("vec_id") == _ANA_A).select(
        F.col("nvec").alias("va")
    )
    vb = emb.filter(F.col("vec_id") == _ANA_B).select(
        F.col("nvec").alias("vb")
    )
    vc = emb.filter(F.col("vec_id") == _ANA_C).select(
        F.col("nvec").alias("vc")
    )
    raw = (
        va.crossJoin(vb)
        .crossJoin(vc)
        .select(
            F.expr(
                "zip_with(zip_with(va, vb, (x, y) -> x - y), vc,"
                " (x, y) -> x + y)"
            ).alias("t")
        )
    )
    target = raw.select(
        F.expr(
            "transform(t, x -> x / sqrt(aggregate(t, CAST(0.0 AS DOUBLE),"
            " (acc, y) -> acc + y * y)))"
        ).alias("tvec")
    )
    scored = (
        emb.filter(
            (F.col("vec_id") != _ANA_A)
            & (F.col("vec_id") != _ANA_B)
            & (F.col("vec_id") != _ANA_C)
        )
        .crossJoin(F.broadcast(target))
        .select("vec_id", dot("nvec", F.col("tvec")).alias("score"))
    )
    return global_topn(
        scored,
        [F.col("score").desc(), F.col("vec_id").asc()],
        10,
        rank_col="rank",
    ).select("rank", "vec_id", "score")


# --------------------------------------- point-in-time feature assembly

_PIT_USER_CAP = 50


@register(
    "events_pit_training_features",
    oracle=f"""
WITH u AS (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE user_id < {_PIT_USER_CAP}
),
feat AS (
  SELECT event_id, user_id, ts, event_type,
    CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END)
      OVER w, 0) AS BIGINT) AS prior_views,
    CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
      OVER w, 0) AS BIGINT) AS prior_clicks,
    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END)
      OVER w, 0) AS BIGINT) AS prior_purchases,
    CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END)
      OVER w, 0) AS BIGINT) AS prior_errors,
    CAST(coalesce(
      date_diff('second', first_value(ts) OVER w2, ts), 0) AS BIGINT)
      AS seconds_since_first
  FROM u
  WINDOW
    w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    w2 AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, prior_views, prior_clicks,
  prior_purchases, prior_errors, seconds_since_first
FROM feat WHERE event_type = 'purchase'
ORDER BY user_id, ts, event_id
""",
    doc="Point-in-time-correct training-feature assembly (the feature-"
    "store contract): for every purchase (the label event), per-user "
    "behavioral counters computed over STRICTLY EARLIER events only "
    "(frame ... AND 1 PRECEDING with the deterministic (ts, event_id) "
    "order) — the construction that makes offline training features "
    "identical to what online serving could have known at decision "
    "time; any frame leaking the current row is label leakage, the "
    "classic silent ML-pipeline bug this query's hash gate would "
    "catch as an off-by-one. All windows are PARTITIONED per user "
    "(the gate-clean shape — never global); at 100 TB this is one "
    "user-keyed shuffle, the same exchange sessionization pays, and "
    "the label filter prunes output AFTER features so censoring is "
    "explicit.",
)
def events_pit_training_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < _PIT_USER_CAP
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def prior(t):
        return (
            F.coalesce(
                F.sum(F.when(F.col("event_type") == t, 1)).over(w), F.lit(0)
            )
            .cast("bigint")
            .alias(f"prior_{t}s")
        )

    feat = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        prior("view"),
        prior("click"),
        prior("purchase"),
        prior("error"),
        F.coalesce(
            F.col("ts").cast("long") - F.first("ts").over(w2).cast("long"),
            F.lit(0),
        )
        .cast("bigint")
        .alias("seconds_since_first"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "prior_views",
            "prior_clicks",
            "prior_purchases",
            "prior_errors",
            "seconds_since_first",
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ------------------------------------------------- ingest volume anomaly

_VOL_K2 = 2  # flag |day - mean| > K std, as (n*x - s)^2 > K^2 (n*ss - s^2)


@register(
    "events_volume_anomaly_days",
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
    CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
moments AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS ss
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.x AS n_events,
  CAST(m.n * d.x - m.s AS BIGINT) AS dev_nx,
  CAST(m.n * m.ss - m.s * m.s AS BIGINT) AS var_nn,
  (m.n * d.x - m.s) * (m.n * d.x - m.s)
    > {_VOL_K2 * _VOL_K2} * (m.n * m.ss - m.s * m.s) AS is_anomaly
FROM daily d JOIN moments m USING (event_type)
WHERE (m.n * d.x - m.s) * (m.n * d.x - m.s)
    > {_VOL_K2 * _VOL_K2} * (m.n * m.ss - m.s * m.s)
ORDER BY event_type, day
""",
    doc=f"Ingest-volume anomaly days: per event type, days whose row "
    f"count sits more than {_VOL_K2} standard deviations from that "
    "type's daily mean — the pipeline-health monitor that catches a "
    "dropped producer (crater) or a replay/duplication incident "
    "(spike) before any VALUE-level check fires (complementing "
    "events_value_anomalies, which z-scores the payload, and "
    "dq_freshness_lag, which only sees the newest row). The z test "
    "is EXACT integer arithmetic: (n*x - s)^2 > K^2(n*ss - s^2) "
    "clears both the division and the sqrt, so the flag — and "
    "therefore the hash gate — cannot drift across engines. One "
    "calendar-bounded daily rollup + a per-type moment fold joined "
    "back; all keyed, no global state.",
)
def events_volume_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    j = daily.join(F.broadcast(moments), "event_type")
    dev = F.col("n") * F.col("x") - F.col("s")
    var_nn = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    anomaly = (dev * dev) > (F.lit(_VOL_K2 * _VOL_K2) * var_nn)
    return (
        j.filter(anomaly)
        .select(
            "event_type",
            "day",
            F.col("x").alias("n_events"),
            dev.cast("bigint").alias("dev_nx"),
            var_nn.cast("bigint").alias("var_nn"),
            anomaly.alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )
