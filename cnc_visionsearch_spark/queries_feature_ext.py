"""Round-6 capability extensions ([EXT]): field-weighted lexical
ranking (BM25F) with its MAP@10 and Kendall-tau eval harnesses,
vector-arithmetic retrieval, point-in-time-correct feature assembly,
ingest volume/burstiness diagnostics (anomaly days, inter-arrival
CV^2, error->purchase cross-correlation), cross-source n-gram novelty,
time-discounted CLV, and discount elasticity — operators a production
search + ML-data platform serves that the existing 300+ registry
entries did not yet cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.functions.vector import fixed_point_q
from cnc_visionsearch_spark.queries_hybrid import _B, _BM25_CTES, _K1, _TERMS
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


# stripped fragments for composing multi-chain oracles (MAP / tau):
# the canonical BM25 chain (queries_hybrid._BM25_CTES) and the BM25F
# chain above use disjoint CTE names, so they concatenate cleanly.
_BM25_EVAL_CTES = _BM25_CTES.strip()
_BM25F_TAIL = _BM25F_CTES.strip()


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


# ------------------------------------------------------------- MAP eval


@register(
    "text_bm25_map_eval",
    oracle=f"""
WITH {_BM25_EVAL_CTES},
run AS (
  SELECT doc_id, n_terms, CAST(row_number() OVER (
    ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS r
  FROM bm25 QUALIFY r <= 10
),
marked AS (
  SELECT r, CASE WHEN n_terms = 3 THEN 1 ELSE 0 END AS rel,
    CAST(SUM(CASE WHEN n_terms = 3 THEN 1 ELSE 0 END) OVER (
      ORDER BY r ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rel
  FROM run
),
ap AS (
  SELECT CAST(SUM(CASE WHEN rel = 1 THEN
      CAST(floor(CAST(cum_rel AS DOUBLE) / CAST(r AS DOUBLE)
        * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS ap_q,
    CAST(SUM(rel) AS BIGINT) AS n_retrieved_relevant
  FROM marked
),
tot AS (
  SELECT CAST(SUM(CASE WHEN n_terms = 3 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_relevant
  FROM bm25
)
SELECT tot.n_relevant, ap.n_retrieved_relevant, ap.ap_q,
  CAST(ap.ap_q AS DOUBLE) / 1000000000.0
    / CAST(least(tot.n_relevant, 10) AS DOUBLE) AS map_at_10
FROM ap, tot
""",
    doc="MAP@10 of the BM25 ranking against binary full-coverage "
    "pseudo-qrels (relevant = contains ALL query terms — the strict "
    "complement of the nDCG harness's graded gains): average "
    "precision as the exact sum of 1e-9-quantized precision@r at "
    "each relevant rank, normalized by min(R, 10). nDCG rewards "
    "graded ordering; MAP punishes EVERY relevant doc left below "
    "the cut — together they are the standard eval pair (TREC "
    "convention) and this pins the second one. Plan: the scored set "
    "bounds to a TakeOrdered top-10; the precision cumsum runs over "
    "the 10 survivors (bounded window, gate-exempt); the relevant "
    "total folds from the same scored aggregate.",
)
def text_bm25_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.rank import global_topn
    from cnc_visionsearch_spark.queries_hybrid import _bm25_scored

    scored = _bm25_scored(spark, sf_dir)
    run = global_topn(
        scored,
        [F.col("score_q").desc(), F.col("doc_id").asc()],
        10,
        rank_col="r",
    )
    rel = F.when(F.col("n_terms") == 3, 1).otherwise(0)
    wcum = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    marked = run.select(
        "r", rel.alias("rel"), F.sum(rel).over(wcum).cast("bigint").alias("cum_rel")
    )
    ap = marked.agg(
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.floor(
                    F.col("cum_rel").cast("double")
                    / F.col("r").cast("double")
                    * F.lit(1000000000.0)
                    + F.lit(0.5)
                ).cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("ap_q"),
        F.sum("rel").cast("bigint").alias("n_retrieved_relevant"),
    )
    tot = scored.agg(
        F.sum(F.when(F.col("n_terms") == 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_relevant")
    )
    return ap.crossJoin(F.broadcast(tot)).select(
        "n_relevant",
        "n_retrieved_relevant",
        "ap_q",
        (
            F.col("ap_q").cast("double")
            / F.lit(1000000000.0)
            / F.least(F.col("n_relevant"), F.lit(10)).cast("double")
        ).alias("map_at_10"),
    )


# ------------------------------------------------ rank correlation (tau)


@register(
    "text_rank_tau_title_boost",
    oracle=f"""
WITH {_BM25_EVAL_CTES},
{_BM25F_TAIL},
runa AS (
  SELECT doc_id, CAST(row_number() OVER (
    ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS ra
  FROM bm25 QUALIFY ra <= 10
),
runb AS (
  SELECT doc_id, CAST(row_number() OVER (
    ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rb
  FROM bm25f QUALIFY rb <= 10
),
common AS (SELECT doc_id, ra, rb FROM runa JOIN runb USING (doc_id)),
pairs AS (
  SELECT CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END AS c
  FROM common x JOIN common y ON x.doc_id < y.doc_id
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(sum(c) AS BIGINT) AS concordant
  FROM pairs
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM common)
SELECT n.n_common, agg.n_pairs, agg.concordant,
  CAST(agg.n_pairs - agg.concordant AS BIGINT) AS discordant,
  CAST(2 * agg.concordant - agg.n_pairs AS DOUBLE)
    / CAST(agg.n_pairs AS DOUBLE) AS kendall_tau
FROM n, agg
""",
    doc="Kendall rank correlation between the plain-BM25 and the "
    "BM25F-title-boosted top-10s, over their common documents: "
    "tau = (C - D) / pairs with concordance decided by exact integer "
    "rank products — the quantitative answer to 'how much does field "
    "weighting actually reorder results' that a relevance engineer "
    "reads before shipping the boost (tau near 1 = cosmetic, near 0 "
    "= a different ranking; the same harness slots any two tiers, "
    "e.g. pruned-vs-exact). Both runs are TakeOrdered top-10s; the "
    "pair expansion is a <=10x10 broadcast non-equi join (bounded by "
    "the cut constant, never data) and ranks are tie-free by "
    "construction (total order), so tau needs no tie correction.",
)
def text_rank_tau_title_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.rank import global_topn
    from cnc_visionsearch_spark.queries_hybrid import _bm25_scored

    runa = global_topn(
        _bm25_scored(spark, sf_dir),
        [F.col("score_q").desc(), F.col("doc_id").asc()],
        10,
        rank_col="ra",
    ).select("doc_id", F.col("ra").cast("bigint").alias("ra"))
    runb = global_topn(
        _bm25f_scored(spark, sf_dir),
        [F.col("score_q").desc(), F.col("doc_id").asc()],
        10,
        rank_col="rb",
    ).select("doc_id", F.col("rb").cast("bigint").alias("rb"))
    both = runa.join(runb, "doc_id")
    x = both.alias("x")
    y = both.alias("y")
    pairs = x.join(
        F.broadcast(y), F.col("x.doc_id") < F.col("y.doc_id")
    ).select(
        (
            (
                (F.col("x.ra") - F.col("y.ra"))
                * (F.col("x.rb") - F.col("y.rb"))
                > 0
            ).cast("int")
        ).alias("c")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("c").cast("bigint").alias("concordant"),
    )
    n = both.agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    return n.crossJoin(agg).select(
        "n_common",
        "n_pairs",
        "concordant",
        (F.col("n_pairs") - F.col("concordant"))
        .cast("bigint")
        .alias("discordant"),
        (
            (F.lit(2) * F.col("concordant") - F.col("n_pairs")).cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("kendall_tau"),
    )


# ---------------------------------------------------- interarrival CV


@register(
    "events_interarrival_cv",
    oracle="""
WITH seq AS (
  SELECT event_type,
    date_diff('second', ts,
      lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))
      AS gap_s
  FROM events
),
gaps AS (SELECT event_type, CAST(gap_s AS BIGINT) AS g FROM seq
         WHERE gap_s IS NOT NULL),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(g) AS BIGINT) AS s, CAST(sum(g * g) AS BIGINT) AS ss
  FROM gaps GROUP BY event_type
)
SELECT event_type, n AS n_gaps,
  CAST(s // n AS BIGINT) AS mean_gap_s,
  CAST((n * ss - s * s) * 1000000 // (s * s) AS BIGINT) AS cv2_ppm,
  (n * ss - s * s) * 1000000 // (s * s) > 1000000 AS is_bursty
FROM m ORDER BY event_type
""",
    doc="Inter-arrival burstiness per event type: the squared "
    "coefficient of variation of consecutive-event gaps, computed as "
    "the exact integer rational (n*ss - s^2)/s^2 in ppm — CV^2 = 1 "
    "is the Poisson baseline, above it the stream is bursty (arrival "
    "clumping that sizes streaming state and autoscaling; the "
    "arrival-process companion to term_burstiness_report's content "
    "view and the burst-DP segmenter's input assumption). Gaps come "
    "from a per-type lead() window (keyed, never global); the "
    "moments are one partial+final fold; zero floats anywhere.",
)
def events_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (
            F.lead("ts").over(w).cast("long") - F.col("ts").cast("long")
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    m = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("ss"),
    )
    cv2 = F.expr("(n * ss - s * s) * 1000000 div (s * s)").cast("bigint")
    return m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.expr("s div n").cast("bigint").alias("mean_gap_s"),
        cv2.alias("cv2_ppm"),
        (cv2 > 1000000).alias("is_bursty"),
    ).orderBy("event_type")


# ------------------------------------------- cross-source n-gram novelty


@register(
    "doc_crosssource_ngram_novelty",
    oracle="""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS tk
              FROM documents),
grams AS (
  SELECT doc_id, source, unnest(list_distinct(list_transform(
    range(1, greatest(len(tk) - 2, 0) + 1),
    j -> tk[j] || ' ' || tk[j+1] || ' ' || tk[j+2]))) AS gram
  FROM toks
),
ref AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
probe AS (
  SELECT g.source, g.doc_id, g.gram, r.gram IS NULL AS novel
  FROM grams g LEFT JOIN ref r ON g.gram = r.gram
  WHERE g.source <> 'src0'
),
per_doc AS (
  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM probe GROUP BY source, doc_id
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_grams) AS BIGINT) AS n_grams,
  CAST(sum(n_novel) AS BIGINT) AS n_novel,
  CAST(sum(n_novel) * 1000000 // sum(n_grams) AS BIGINT) AS novelty_ppm,
  CAST(sum(CASE WHEN 2 * n_novel >= n_grams THEN 1 ELSE 0 END) AS BIGINT)
    AS n_docs_majority_novel
FROM per_doc GROUP BY source ORDER BY source
""",
    doc="Cross-source n-gram novelty: for every non-reference source, "
    "the share of its documents' distinct token trigrams that never "
    "appear in the src0 reference slice — the memorization/overlap "
    "lens BETWEEN corpus sources (doc_decontamination_overlap guards "
    "against the BENCHMARK; this measures whether a new crawl "
    "actually adds content or re-serves what the reference slice "
    "already has, the acquisition-value question). Trigram idiom is "
    "the dedup family's exact shingle convention (one definition "
    "both sides). Plan: grams shuffle once keyed on the gram for the "
    "reference anti-probe (the same join every containment query "
    "pays — text never shuffles, grams are the keys), then two "
    "bounded rollups (per doc, per source).",
)
def doc_crosssource_ngram_novelty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cnc_visionsearch_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(shingles_from_tokens(tokens("text"), 3))
        ).alias("gram"),
    )
    ref = (
        grams.filter(F.col("source") == "src0")
        .select(F.col("gram").alias("ref_gram"))
        .distinct()
    )
    probe = (
        grams.filter(F.col("source") != "src0")
        .join(ref, grams.gram == ref.ref_gram, "left")
        .select(
            "source", "doc_id", F.col("ref_gram").isNull().alias("novel")
        )
    )
    per_doc = probe.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum(F.col("novel").cast("int")).cast("bigint").alias("n_novel"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            F.sum(
                F.when(2 * F.col("n_novel") >= F.col("n_grams"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_docs_majority_novel"),
        )
        .select(
            "source",
            "n_docs",
            "n_grams",
            "n_novel",
            F.expr("CAST(n_novel * 1000000 div n_grams AS BIGINT)").alias(
                "novelty_ppm"
            ),
            "n_docs_majority_novel",
        )
        .orderBy("source")
    )


# ----------------------------------------------------- discounted CLV

_CLV_DECAY_NUM, _CLV_DECAY_DEN = 9, 10  # 10%/year discount rate
_CLV_MAX_Y = 9
_YEAR_S = 365 * 86400


def _clv_case(dialect: str) -> str:
    """value_c * (9/10)^y as exact integer CASE arms (y bounded by the
    data's date range; >= _CLV_MAX_Y collapses into the last arm) —
    identical arithmetic in both engines, no pow()/exp()."""
    div = "//" if dialect == "duckdb" else "div"
    arms = []
    for y in range(_CLV_MAX_Y):
        num, den = _CLV_DECAY_NUM**y, _CLV_DECAY_DEN**y
        arms.append(f"WHEN y = {y} THEN value_c * {num} {div} {den}")
    num, den = _CLV_DECAY_NUM**_CLV_MAX_Y, _CLV_DECAY_DEN**_CLV_MAX_Y
    return (
        "CASE " + " ".join(arms) + f" ELSE value_c * {num} {div} {den} END"
    )


@register(
    "customer_discounted_clv",
    oracle=f"""
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
aged AS (
  SELECT o_custkey,
    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS value_c,
    CAST(date_diff('second', o_orderdate, anchor.mx) // {_YEAR_S}
      AS BIGINT) AS y
  FROM orders, anchor
),
clv AS (
  SELECT o_custkey,
    CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(value_c) AS BIGINT) AS raw_c,
    CAST(sum({_clv_case("duckdb")}) AS BIGINT) AS clv_c
  FROM aged GROUP BY o_custkey
)
SELECT CAST(row_number() OVER (ORDER BY clv_c DESC, o_custkey ASC) AS INT)
    AS rank,
  o_custkey, n_orders, raw_c, clv_c
FROM clv ORDER BY clv_c DESC, o_custkey ASC LIMIT 20
""",
    doc="Time-discounted customer lifetime value: each order's cents "
    f"decayed by ({_CLV_DECAY_NUM}/{_CLV_DECAY_DEN})^years-before-"
    "anchor — recency-weighted CLV, so a customer whose spend is all "
    "ancient ranks below one still buying (raw lifetime spend sits "
    "alongside for the contrast). The decay is EXACT integer "
    "arithmetic: bounded-year CASE arms of value_c * 9^y div 10^y "
    "(no pow(), no double accumulation — the same no-libm discipline "
    "as every rational score here). One customer-keyed rollup; "
    "top-20 via TakeOrderedAndProject with the rank over the 20 "
    "survivors (operators/rank.global_topn).",
)
def customer_discounted_clv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.rank import global_topn

    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    aged = o.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("value_c"),
        F.expr(
            f"(unix_timestamp(mx) - unix_timestamp(o_orderdate))"
            f" DIV {_YEAR_S}"
        )
        .cast("bigint")
        .alias("y"),
    )
    clv = aged.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("value_c").cast("bigint").alias("raw_c"),
        F.sum(F.expr(_clv_case("spark"))).cast("bigint").alias("clv_c"),
    )
    return global_topn(
        clv,
        [F.col("clv_c").desc(), F.col("o_custkey").asc()],
        20,
        rank_col="rank",
    ).select("rank", "o_custkey", "n_orders", "raw_c", "clv_c")


# ------------------------------------------- discount-quantity elasticity


@register(
    "lineitem_discount_qty_elasticity",
    oracle="""
WITH pts AS (
  SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x,
    CAST(floor(l_quantity * 1000.0 + 0.5) AS BIGINT) AS yq
  FROM lineitem
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
    CAST(sum(x * yq) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT n, sx, sy, sxy, sxx,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / CAST(n * sxx - sx * sx AS DOUBLE) AS qty_per_discount_point
FROM s
""",
    doc="Discount-quantity elasticity: least-squares slope of order "
    "quantity (1e-3-quantized) against the discount percentage point "
    "(exact integer bands 0..10) over EVERY lineitem row — the "
    "pricing team's first-order answer to 'do discounts move "
    "volume', fit on raw rows rather than band means so heavy bands "
    "weigh properly. All five sufficient statistics are exact BIGINT "
    "sums (one partial+final fold over the fact, nothing shuffles "
    "but 5 counters); the slope is the only double. Companion to "
    "q6/q19's discounted-revenue views, which price the discount — "
    "this measures whether it works.",
)
def lineitem_discount_qty_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.floor(F.col("l_discount") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("l_quantity") * F.lit(1000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("yq"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("yq")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return s.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("qty_per_discount_point"),
    )


# --------------------------------------- error -> purchase cross-correlation

_XCORR_LAGS = (0, 1, 2)


@register(
    "events_error_purchase_xcorr",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts)::TIMESTAMP AS h,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
      AS x,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS y
  FROM events GROUP BY 1
),
lagged AS (
  {" UNION ALL ".join(
      f'''SELECT {k} AS lag, a.x, b.y
      FROM hourly a JOIN hourly b
        ON b.h = a.h + INTERVAL {k} HOUR'''
      for k in _XCORR_LAGS
  )}
),
s AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(y * y) AS BIGINT) AS syy,
    CAST(sum(x * y) AS BIGINT) AS sxy
  FROM lagged GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n, sx, sy, sxy,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
           * CAST(n * syy - sy * sy AS DOUBLE)) AS xcorr
FROM s ORDER BY lag
""",
    doc="Cross-correlation of the hourly ERROR series against the "
    "PURCHASE series at lags 0/1/2 hours — the incident-impact "
    "question ('do error spikes depress purchases, and with what "
    "delay?') that events_hourly_autocorr's self-correlation cannot "
    "answer. Hourly conditional counts come from ONE scan; each lag "
    "is an equi-join on the shifted hour key (no window at all — the "
    "series join replaces the lag() idiom, so the plan is keyed "
    "joins over the calendar-bounded hourly table); every moment is "
    "an exact BIGINT sum, the correlation one double chain.",
)
def events_error_purchase_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum((F.col("event_type") == "error").cast("int"))
        .cast("bigint")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("y"),
    )
    parts = []
    for k in _XCORR_LAGS:
        a = hourly.select(F.col("h").alias("ha"), "x")
        b = hourly.select(F.col("h").alias("hb"), "y")
        j = a.join(
            b,
            F.col("hb")
            == F.col("ha") + F.expr(f"INTERVAL {k} HOURS"),
        ).select(F.lit(k).cast("bigint").alias("lag"), "x", "y")
        parts.append(j)
    lagged = parts[0]
    for p in parts[1:]:
        lagged = lagged.unionByName(p)
    s = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "lag", "n", "sx", "sy", "sxy", (num / den).alias("xcorr")
    ).orderBy("lag")


# ------------------------------------------- recommender holdout eval

_RECO_K = 3


@register(
    "reco_holdout_hitrate",
    oracle=f"""
WITH ranked_orders AS (
  SELECT o_orderkey, o_custkey,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
    CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
  FROM orders
),
holdout AS (
  SELECT o_orderkey, o_custkey FROM ranked_orders
  WHERE rn = 1 AND n_orders >= 2
),
test AS (
  SELECT DISTINCT h.o_custkey, l.l_partkey
  FROM holdout h JOIN lineitem l ON l.l_orderkey = h.o_orderkey
),
train_lp AS (
  SELECT DISTINCT l.l_orderkey, l.l_partkey
  FROM lineitem l
  WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM holdout)
),
cnt AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
        FROM train_lp GROUP BY 1),
cab AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
    CAST(count(*) AS BIGINT) AS c
  FROM train_lp a JOIN train_lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
sim AS (
  SELECT cab.pa, cab.pb,
    CAST(floor(CAST(cab.c AS DOUBLE)
      / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))
      * 1000000000.0 + 0.5) AS BIGINT) AS sq
  FROM cab JOIN cnt na ON na.l_partkey = cab.pa
           JOIN cnt nb ON nb.l_partkey = cab.pb
),
user_parts AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM orders o
  JOIN holdout h ON h.o_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey <> h.o_orderkey
),
scored AS (
  SELECT up.o_custkey, s.pb, CAST(sum(s.sq) AS BIGINT) AS score_q
  FROM user_parts up JOIN sim s ON s.pa = up.l_partkey
  GROUP BY up.o_custkey, s.pb
),
novel AS (
  SELECT sc.o_custkey, sc.pb, sc.score_q
  FROM scored sc LEFT JOIN user_parts up
    ON up.o_custkey = sc.o_custkey AND up.l_partkey = sc.pb
  WHERE up.l_partkey IS NULL
),
recs AS (
  SELECT o_custkey, pb, score_q,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY score_q DESC, pb ASC) AS rn
  FROM novel QUALIFY rn <= {_RECO_K}
),
per_user AS (
  SELECT r.o_custkey,
    max(CASE WHEN t.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS hit3,
    max(CASE WHEN t.l_partkey IS NOT NULL AND r.rn = 1
             THEN 1 ELSE 0 END) AS hit1
  FROM recs r LEFT JOIN test t
    ON t.o_custkey = r.o_custkey AND t.l_partkey = r.pb
  GROUP BY r.o_custkey
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(hit1) AS BIGINT) AS n_hit_at_1,
  CAST(sum(hit3) AS BIGINT) AS n_hit_at_{_RECO_K},
  CAST(sum(hit1) * 1000000 // count(*) AS BIGINT) AS hitrate1_ppm,
  CAST(sum(hit3) * 1000000 // count(*) AS BIGINT)
    AS hitrate{_RECO_K}_ppm
FROM per_user
""",
    doc="Offline recommender evaluation, leave-last-order-out: hold "
    "out every multi-order customer's most recent order, train the "
    "item-item cosine co-occurrence model (the "
    "part_item_item_recommender formula) on everything else, "
    f"recommend each customer's top-{_RECO_K} NOVEL parts (already-"
    "bought parts excluded — the standard novel-recommendation "
    "protocol), and score hit@1 / hit@3 against the held-out basket "
    "in exact integer ppm. This is the recommender's shipping "
    "evidence, exactly as nDCG/MAP are retrieval's and RECALL.json "
    "is ANN's: no model change lands without this number moving. "
    "Determinism: per-pair cosines are 1e-9-quantized then "
    "BIGINT-summed per candidate; all rankings tie-break on part "
    "id. Plan: holdout selection is a per-customer window (keyed); "
    "the model is the bounded basket-pair expansion; candidate "
    "scoring is user_parts x sim keyed on the part (the only big "
    "join — the same shape serving pays); per-user top-k is "
    "WindowGroupLimit, never global.",
)
def reco_holdout_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w_u = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked_orders = o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w_u).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_custkey"))
        .cast("bigint")
        .alias("n_orders"),
    )
    holdout = ranked_orders.filter(
        (F.col("rn") == 1) & (F.col("n_orders") >= 2)
    ).select("o_orderkey", "o_custkey")
    test = (
        holdout.join(li, holdout.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    train_lp = (
        li.join(
            holdout.select("o_orderkey"),
            li.l_orderkey == holdout.o_orderkey,
            "left_anti",
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    cnt = train_lp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # Train-pair build via the SHARED bounded basket kernel
    # (queries_relational._copurchase_pair_stream: one group-by into
    # <=7-part baskets, O(21) in-row pair expansion per order) — never
    # the a.join(b, "ok") quadratic formulation. The kernel emits one
    # canonical src<dst pair per order; the directed cab table is the
    # canonical counts mirrored to both orientations (disjoint, so the
    # union needs no re-dedup).
    from cnc_visionsearch_spark.queries_relational import (
        _copurchase_pair_stream,
    )

    cpair = (
        _copurchase_pair_stream(
            li.join(
                holdout.select("o_orderkey"),
                li.l_orderkey == holdout.o_orderkey,
                "left_anti",
            )
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cab = cpair.select(
        F.col("src").alias("pa"), F.col("dst").alias("pb"), "c"
    ).union(
        cpair.select(
            F.col("dst").alias("pa"), F.col("src").alias("pb"), "c"
        )
    )
    na = cnt.select(F.col("l_partkey").alias("pa"), F.col("n").alias("na"))
    nb = cnt.select(F.col("l_partkey").alias("pb"), F.col("n").alias("nb"))
    sim = (
        cab.join(na, "pa")
        .join(nb, "pb")
        .select(
            "pa",
            "pb",
            F.floor(
                F.col("c").cast("double")
                / F.sqrt(
                    F.col("na").cast("double") * F.col("nb").cast("double")
                )
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("sq"),
        )
    )
    user_parts = (
        o.join(
            holdout.select(
                F.col("o_custkey").alias("hc"),
                F.col("o_orderkey").alias("hok"),
            ),
            o.o_custkey == F.col("hc"),
        )
        .filter(F.col("o_orderkey") != F.col("hok"))
        .join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    scored = (
        user_parts.join(sim, user_parts.l_partkey == sim.pa)
        .groupBy("o_custkey", "pb")
        .agg(F.sum("sq").cast("bigint").alias("score_q"))
    )
    owned = user_parts.select(
        F.col("o_custkey").alias("uc"), F.col("l_partkey").alias("up")
    )
    novel = scored.join(
        owned,
        (scored.o_custkey == owned.uc) & (scored.pb == owned.up),
        "left_anti",
    )
    w_r = Window.partitionBy("o_custkey").orderBy(
        F.col("score_q").desc(), F.col("pb").asc()
    )
    recs = novel.withColumn("rn", F.row_number().over(w_r)).filter(
        F.col("rn") <= _RECO_K
    )
    t = test.select(
        F.col("o_custkey").alias("tc"), F.col("l_partkey").alias("tp")
    )
    per_user = (
        recs.join(
            t, (recs.o_custkey == t.tc) & (recs.pb == t.tp), "left"
        )
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("tp").isNotNull(), 1).otherwise(0)).alias(
                "hit3"
            ),
            F.max(
                F.when(
                    F.col("tp").isNotNull() & (F.col("rn") == 1), 1
                ).otherwise(0)
            ).alias("hit1"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("hit1").cast("bigint").alias("n_hit_at_1"),
        F.sum("hit3").cast("bigint").alias(f"n_hit_at_{_RECO_K}"),
        F.expr("CAST(sum(hit1) * 1000000 DIV count(*) AS BIGINT)").alias(
            "hitrate1_ppm"
        ),
        F.expr("CAST(sum(hit3) * 1000000 DIV count(*) AS BIGINT)").alias(
            f"hitrate{_RECO_K}_ppm"
        ),
    )
