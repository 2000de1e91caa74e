"""Advanced-analytics operators ([EXT] north-star surface): sweep-line
interval concurrency, count-min-sketch heavy hitters, 2-D skyline, and
incremental aggregate maintenance. Each is hash-gated against a DuckDB
replay and carries an explicit 100 TB story in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# sweep-line interval concurrency

_SESSION_MIN = 5  # each event opens a 5-minute presence interval


@register(
    "events_max_concurrency",
    oracle=f"""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, event_type FROM events),
pts AS (
  SELECT event_type, ts AS t, 1 AS delta, event_id FROM ev
  UNION ALL
  SELECT event_type, ts + INTERVAL '{_SESSION_MIN} minutes' AS t, -1 AS delta, event_id
  FROM ev
),
sweep AS (
  SELECT event_type,
    SUM(delta) OVER (PARTITION BY event_type
                     ORDER BY t, delta, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc,
    t
  FROM pts
)
SELECT event_type,
  CAST(max(conc) AS BIGINT) AS peak_concurrency,
  min(CASE WHEN conc = mx THEN t END) AS first_peak_at
FROM (SELECT *, MAX(conc) OVER (PARTITION BY event_type) AS mx FROM sweep) s
GROUP BY event_type
""",
    doc="Peak concurrent presence per event type via a sweep line: each "
    "event opens a 5-minute interval; +1/-1 endpoint deltas are "
    "cumulative-summed in (time, delta, id) order — half-open "
    "intervals: an end at t closes before a start at t opens (delta "
    "-1 < +1). 100 TB: endpoints shuffle keyed on event_type (bounded "
    "cardinality); beyond that, sweep per (type, day) with an O(days) "
    "carry-in of open-interval counts — same operator, partitioned.",
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr(f"INTERVAL {_SESSION_MIN} MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = starts.unionAll(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = pts.withColumn("conc", F.sum("delta").over(w)).select(
        "event_type", "conc", "t"
    )
    mx = sweep.withColumn(
        "mx", F.max("conc").over(Window.partitionBy("event_type"))
    )
    return mx.groupBy("event_type").agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.min(F.when(F.col("conc") == F.col("mx"), F.col("t"))).alias(
            "first_peak_at"
        ),
    )


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters

_CMS_P = 2147483647  # 2^31 - 1
_CMS_W = 32
_CMS_HASHES = [(0, 31, 7), (1, 131, 13), (2, 257, 17)]  # (row j, a_j, b_j)


@register(
    "events_heavy_hitters_cms",
    oracle=f"""
WITH js(j, a, b) AS (VALUES {", ".join(f"({j}, {a}, {b})" for j, a, b in _CMS_HASHES)}),
sketch AS (
  SELECT j, ((a * user_id + b) % {_CMS_P}) % {_CMS_W} AS bucket,
    CAST(count(*) AS BIGINT) AS c
  FROM events CROSS JOIN js GROUP BY 1, 2
),
users AS (SELECT DISTINCT user_id FROM events),
est AS (
  SELECT u.user_id, MIN(s.c) AS est_count
  FROM users u CROSS JOIN js
  JOIN sketch s ON s.j = js.j
    AND s.bucket = ((js.a * u.user_id + js.b) % {_CMS_P}) % {_CMS_W}
  GROUP BY u.user_id
),
truth AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
          FROM events GROUP BY 1)
SELECT e.user_id, CAST(e.est_count AS BIGINT) AS est_count, t.true_count
FROM est e JOIN truth t USING (user_id)
ORDER BY est_count DESC, user_id ASC LIMIT 10
""",
    doc="Heavy hitters through a 3x32 count-min sketch (fixed affine "
    "hash rows mod 2^31-1): build the sketch (one partial-aggregating "
    "shuffle of 96 counters — constant-size mergeable state, the whole "
    "point at 100 TB), estimate each key as the min over its 3 "
    "counters, rank by estimate with the true count joined alongside "
    "so the CMS >= truth guarantee is visible in the hash-gated "
    "output. At scale the candidate set comes from per-partition "
    "top-k, not a distinct scan; the sketch itself never grows.",
)
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    js = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for j, a, b in _CMS_HASHES
        ]
    )
    hashed = ev.select("user_id", F.explode(js).alias("h")).select(
        "user_id", F.col("h.j").alias("j"), _cms_bucket_col()
    )
    sketch = hashed.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    users = ev.distinct().select("user_id", F.explode(js).alias("h")).select(
        "user_id", F.col("h.j").alias("j"), _cms_bucket_col()
    )
    est = (
        users.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )
    truth = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    return (
        est.join(truth, "user_id")
        .orderBy(F.col("est_count").desc(), F.col("user_id").asc())
        .limit(10)
    )


def _cms_bucket_col():
    h = F.col("h")
    return (
        ((h["a"] * F.col("user_id") + h["b"]) % F.lit(_CMS_P)) % F.lit(_CMS_W)
    ).alias("bucket")


# ---------------------------------------------------------------------------
# 2-D skyline

@register(
    "part_skyline_price_size",
    oracle="""
WITH grp AS (
  SELECT p_retailprice AS price, MIN(p_size) AS msize
  FROM part GROUP BY 1
),
cum AS (
  SELECT price, msize,
    MIN(msize) OVER (ORDER BY price ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cmin
  FROM grp
),
strict AS (
  SELECT price, msize, lag(cmin) OVER (ORDER BY price ASC) AS prev_cmin
  FROM cum
)
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
FROM part p JOIN strict s ON p.p_retailprice = s.price
WHERE p.p_size = s.msize
  AND (s.prev_cmin IS NULL OR s.prev_cmin > p.p_size)
""",
    doc="Skyline (Pareto frontier) of parts minimizing (retail price, "
    "size): a part survives iff no other part is <= on both dims and < "
    "on one. Computed scale-safely: per-price min-size group-by (one "
    "shuffle keyed on price), a strict-prefix running min over the "
    "DISTINCT prices (planner-sized single-partition window — bounded "
    "by price cardinality, never row count), broadcast join back. The "
    "naive NOT EXISTS self-join this replaces is O(n^2) in rows.",
)
def part_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    grp = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.min("p_size").alias("msize")
    )
    w_cum = Window.orderBy(F.col("price").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grp.withColumn("cmin", F.min("msize").over(w_cum))
    strict = cum.withColumn(
        "prev_cmin", F.lag("cmin").over(Window.orderBy(F.col("price").asc()))
    )
    return (
        part.join(
            F.broadcast(strict), part.p_retailprice == strict.price
        )
        .filter(
            (F.col("p_size") == F.col("msize"))
            & (
                F.col("prev_cmin").isNull()
                | (F.col("prev_cmin") > F.col("p_size"))
            )
        )
        .select(
            "p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size")
        )
    )


# ---------------------------------------------------------------------------
# inverted text index: build-once postings layout, pruned phrase probe

_INV_BUCKETS = 16
_PHRASE = ("hash", "join")


def ensure_inverted_built(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent inverted-index build over the documents table, once
    per corpus content (same artifact discipline as ensure_ivf_built)."""
    import os

    from cnc_visionsearch_spark.operators.text_index import inverted_build
    from cnc_visionsearch_spark.queries_ann import _ARTIFACT_ROOT, _corpus_tag

    path = (
        f"{_ARTIFACT_ROOT}/{_corpus_tag(sf_dir, 'documents')}"
        f"/inverted_b{_INV_BUCKETS}"
    )
    if not os.path.exists(os.path.join(path, "_BUILT")):
        docs = load_table(spark, sf_dir, "documents")
        inverted_build(docs, path, n_buckets=_INV_BUCKETS)
        open(os.path.join(path, "_BUILT"), "w").close()
    return path


@register(
    "text_inverted_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
  CAST(count(*) AS BIGINT) AS total_tf
FROM tok GROUP BY term
ORDER BY doc_freq DESC, term ASC LIMIT 20
""",
    doc="Build audit of the persisted inverted index: top-20 terms by "
    "document frequency read FROM the postings layout (one row per "
    "(term, doc) with tf + positions) — hash-matching the oracle's "
    "from-scratch tokenization proves the postings are complete and "
    "exact. The build shuffles (term, doc_id, positions), never text.",
)
def text_inverted_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_inverted_built(spark, sf_dir)
    return (
        spark.read.parquet(f"{path}/postings")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(20)
    )


@register(
    "text_inverted_phrase_hits",
    oracle=f"""
WITH sp AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
SELECT doc_id,
  CAST(len(list_filter(range(1, len(s)),
       j -> s[j] = '{_PHRASE[0]}' AND s[j+1] = '{_PHRASE[1]}'))
  AS BIGINT) AS n_occurrences
FROM sp
WHERE len(list_filter(range(1, len(s)),
      j -> s[j] = '{_PHRASE[0]}' AND s[j+1] = '{_PHRASE[1]}')) > 0
""",
    doc=f"Phrase query '{_PHRASE[0]} {_PHRASE[1]}' answered from the "
    "inverted layout: the probe reads ONLY the two terms' hash-bucket "
    "partitions (driver-side term_bucket, plan-pruned), joins the two "
    "postings rows per doc, and counts adjacency as |positions(a)+1 ∩ "
    "positions(b)| — per-row array arithmetic, no corpus scan, no "
    "shuffle beyond the bounded postings join. The oracle rescans the "
    "raw text, so the hash gate proves layout probe == corpus truth.",
)
def text_inverted_phrase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.text_index import phrase_probe

    path = ensure_inverted_built(spark, sf_dir)
    return phrase_probe(
        spark, path, _PHRASE[0], _PHRASE[1], n_buckets=_INV_BUCKETS
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance

_IVM_CUTOFF = "1997-01-01"


@register(
    "orders_incremental_daily_agg",
    oracle=f"""
SELECT CAST(o_orderdate AS DATE) AS order_date,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
""",
    doc="Incremental view maintenance, proven by the hash gate: the "
    "Spark side maintains the daily-revenue aggregate as BASE PARTIALS "
    f"(orders before {_IVM_CUTOFF} — the persisted agg a 100 TB "
    "pipeline keeps) merged with a DELTA batch (orders on/after), "
    "summing exact DECIMAL partials so merge order cannot perturb the "
    "result; the oracle recomputes the aggregate from scratch. "
    "Hash-match IS the maintenance invariant merge(partial(base), "
    "agg(delta)) == agg(base UNION delta) — the property that lets a "
    "daily ingest update a corpus-scale rollup by touching only the "
    "delta's partitions.",
)
def orders_incremental_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.col("o_orderdate").cast("date").alias("order_date")
        ).agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("prev"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionAll(delta)
        .groupBy("order_date")
        .agg(
            F.sum("pn").cast("bigint").alias("n_orders"),
            F.sum("prev").cast("double").alias("revenue"),
        )
    )
