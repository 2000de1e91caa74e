"""HyperLogLog cardinality sketch ([EXT]) — completes the mergeable-
sketch family (KMV = order statistics, CMS = frequencies, equi-width
histogram = quantiles, HLL = the register layout production systems
actually deploy for distinct counts).

Deterministic, engine-portable HLL: the repo's canonical md5 32-bit
hash (functions/text.hex_to_long, the KMV convention) splits into a
6-bit bucket (m = 64 registers) and a 26-bit payload; the register
value is the payload's leading-zero rank computed EXACTLY via
length(bin(w)) — no floating point, no engine-specific popcount. The
harmonic denominator is kept as an exact BIGINT (sum of 2^(27-M_j) —
dyadic rationals rescaled to integers), so the committed artifact
hash-gates the REGISTER STATE itself, and the only float in the
estimate is one final division by the standard alpha_64 bias constant
(Flajolet et al. 2007, AofA). No small-range linear-counting branch:
ln() is not a cross-engine contract (the registry's no-libm
discipline), so the raw estimator is reported next to the exact count
and the signed error — the honest form of the trade.

100 TB story: registers are CONSTANT-size mergeable state — the
per-type sketch is a (type, bucket)-keyed max aggregate (partial
combine does the merging), union across shards/streams is max() again
(proved by the merge-identity query), and the exact count sits beside
it only because fixtures are small enough to afford the truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnc_visionsearch_spark.functions.text import hex_to_long
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

_HLL_M = 64  # registers (6 bucket bits)
_HLL_PAYLOAD_BITS = 26  # 32-bit hash minus 6 bucket bits
# alpha_64 * m^2 * 2^(PAYLOAD+1) scale, precomputed in Python and inlined
# as the SAME repr literal in both engines (no cross-engine float
# expression folding): alpha_64 = 0.709 (Flajolet et al. 2007, m = 64)
_HLL_NUM = repr(0.709 * 64 * 64 * float(1 << 27))

# the 32-bit md5 slice convention shared with KMV / split assignment
_HASH_SQL = "('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT"

_HLL_REG_CTES = f"""
hashed AS (
  SELECT event_type, {_HASH_SQL} % {_HLL_M} AS bucket,
    {_HASH_SQL} // {_HLL_M} AS w
  FROM events
),
regs AS (
  SELECT event_type, bucket,
    CAST(max(CASE WHEN w = 0 THEN {_HLL_PAYLOAD_BITS + 1}
             ELSE {_HLL_PAYLOAD_BITS + 1} - length(bin(w)) END)
      AS BIGINT) AS m_j
  FROM hashed GROUP BY event_type, bucket
)"""


def hll_bucket_rho(ev: DataFrame, user_col: str = "user_id") -> DataFrame:
    """ev + (bucket, rho) columns — THE register-update projection,
    shared verbatim by the batch queries here and the streaming twin
    (streaming/stateful.hll_sketch_stream): their register-identity
    contract requires byte-equivalent hashing and rank computation."""
    hv = hex_to_long(
        F.substring(
            F.md5(F.col(user_col).cast("string").cast("binary")), 1, 8
        )
    )
    with_w = ev.withColumn("_hv", hv).select(
        "*",
        (F.col("_hv") % _HLL_M).alias("bucket"),
        F.expr(f"_hv div {_HLL_M}").alias("_w"),
    )
    rho = F.when(
        F.col("_w") == 0, F.lit(_HLL_PAYLOAD_BITS + 1)
    ).otherwise(F.lit(_HLL_PAYLOAD_BITS + 1) - F.length(F.bin(F.col("_w"))))
    return with_w.select(
        "*", rho.cast("bigint").alias("rho")
    ).drop("_hv", "_w")


def _hll_registers(ev: DataFrame, scope_col) -> DataFrame:
    """(scope, bucket, m_j) register table — a (scope, bucket)-keyed
    MAX aggregate, the mergeable-state core."""
    hashed = hll_bucket_rho(
        ev.select(scope_col.alias("scope"), "user_id")
    )
    return hashed.groupBy("scope", "bucket").agg(
        F.max("rho").cast("bigint").alias("m_j")
    )


def _hll_estimate_cols(prefix: str = ""):
    """(harmonic_q BIGINT, estimate DOUBLE) from (n_present, sum_pow)
    columns — absent registers contribute 2^27 each (M_j = 0)."""
    harmonic = F.col(f"{prefix}sum_pow") + (
        F.lit(_HLL_M) - F.col(f"{prefix}n_present")
    ) * F.lit(1 << 27)
    est = F.lit(float(_HLL_NUM)) / harmonic.cast("double")
    return harmonic.cast("bigint"), est


@register(
    "events_hll_cardinality",
    oracle=f"""
WITH {_HLL_REG_CTES},
folded AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n_present,
    CAST(sum(CAST(1 AS BIGINT) << (27 - m_j)) AS BIGINT) AS sum_pow
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type, n_present,
    CAST(sum_pow + ({_HLL_M} - n_present)
         * (CAST(1 AS BIGINT) << 27) AS BIGINT) AS harmonic_q
  FROM folded
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_present, e.harmonic_q,
  {_HLL_NUM} / CAST(e.harmonic_q AS DOUBLE) AS hll_estimate,
  x.n_exact,
  {_HLL_NUM} / CAST(e.harmonic_q AS DOUBLE) - CAST(x.n_exact AS DOUBLE)
    AS signed_err
FROM est e JOIN exact x USING (event_type)
ORDER BY event_type
""",
    doc="HyperLogLog distinct-user estimate per event type (m = 64 "
    "registers, alpha_64 = 0.709 — Flajolet/Fusy/Gandouet/Meunier "
    "2007): register = max leading-zero rank of the 26-bit md5 "
    "payload per 6-bit bucket, computed exactly via length(bin(w)); "
    "the harmonic denominator is carried as the exact BIGINT "
    "sum(2^(27-M_j)) with absent registers contributing 2^27, so the "
    "sketch STATE hash-gates and the estimate is one double division "
    "against the inlined alpha*m^2 literal. Exact count + signed "
    "error sit alongside (the measured-accuracy contract, same as "
    "KMV/CMS). 100 TB: per-type registers are 64 BIGINTs of "
    "mergeable state built by one partial-combining max aggregate — "
    "the shuffle carries registers, never user ids.",
)
def events_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 measured-and-rejected: spread_scan on the events read was
    # 1.5x SLOWER interleaved — the register hashing is light per row,
    # the two scan branches already overlap within the one action, and
    # the added exchange only moves the rows before the same shuffle.
    ev = load_table(spark, sf_dir, "events")
    regs = _hll_registers(ev, F.col("event_type"))
    folded = regs.groupBy(F.col("scope").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum(F.expr("CAST(1 AS BIGINT) << (27 - m_j)"))
        .cast("bigint")
        .alias("sum_pow"),
    )
    harmonic, est = _hll_estimate_cols()
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        folded.select(
            "event_type",
            "n_present",
            harmonic.alias("harmonic_q"),
            est.alias("hll_estimate"),
        )
        .join(exact, "event_type")
        .select(
            "event_type",
            "n_present",
            "harmonic_q",
            "hll_estimate",
            "n_exact",
            (F.col("hll_estimate") - F.col("n_exact").cast("double")).alias(
                "signed_err"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "events_hll_merge_identity",
    oracle=f"""
WITH {_HLL_REG_CTES},
merged AS (
  SELECT bucket, CAST(max(m_j) AS BIGINT) AS m_j FROM regs GROUP BY bucket
),
direct AS (
  SELECT bucket,
    CAST(max(CASE WHEN w = 0 THEN {_HLL_PAYLOAD_BITS + 1}
             ELSE {_HLL_PAYLOAD_BITS + 1} - length(bin(w)) END)
      AS BIGINT) AS m_j
  FROM hashed GROUP BY bucket
),
cmp AS (
  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
    CAST(sum(CASE WHEN m.m_j <> d.m_j THEN 1 ELSE 0 END) AS BIGINT)
      AS n_mismatches
  FROM merged m JOIN direct d USING (bucket)
),
fold AS (
  SELECT CAST(count(*) AS BIGINT) AS n_present,
    CAST(sum(CAST(1 AS BIGINT) << (27 - m_j)) AS BIGINT) AS sum_pow
  FROM merged
),
types AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_sketches
          FROM events),
exact AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
          FROM events)
SELECT types.n_sketches, cmp.n_buckets, cmp.n_mismatches,
  cmp.n_mismatches = 0 AS merge_is_lossless,
  CAST(fold.sum_pow + ({_HLL_M} - fold.n_present)
       * (CAST(1 AS BIGINT) << 27) AS BIGINT) AS merged_harmonic_q,
  {_HLL_NUM} / CAST(fold.sum_pow + ({_HLL_M} - fold.n_present)
       * (CAST(1 AS BIGINT) << 27) AS DOUBLE) AS merged_estimate,
  exact.n_exact
FROM types, cmp, fold, exact
""",
    doc="The HLL MERGEABILITY proof, hash-gated: max-merging the five "
    "per-type register sketches bucket-by-bucket reproduces the "
    "registers built directly over the union stream — zero mismatched "
    "buckets — and the merged sketch's estimate lands next to the "
    "exact all-types distinct count. This identity (register max is a "
    "semilattice join) is WHY HLL state unions across shards, days, "
    "and streaming checkpoints for free; the streaming KMV twin "
    "(streaming/stateful.py) pins the same contract for order "
    "statistics. Cost: the same one max aggregate, twice, over 64-row "
    "register tables.",
)
def events_hll_merge_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = _hll_registers(ev, F.col("event_type"))
    merged = per_type.groupBy("bucket").agg(
        F.max("m_j").cast("bigint").alias("m_j")
    )
    direct = (
        _hll_registers(ev, F.lit("ALL"))
        .select("bucket", "m_j")
    )
    cmp = (
        merged.alias("m")
        .join(direct.alias("d"), "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(
                (F.col("m.m_j") != F.col("d.m_j")).cast("int")
            )
            .cast("bigint")
            .alias("n_mismatches"),
        )
    )
    fold = merged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum(F.expr("CAST(1 AS BIGINT) << (27 - m_j)"))
        .cast("bigint")
        .alias("sum_pow"),
    )
    harmonic, est = _hll_estimate_cols()
    types = ev.agg(
        F.countDistinct("event_type").cast("bigint").alias("n_sketches")
    )
    exact = ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_exact"))
    return (
        types.crossJoin(cmp)
        .crossJoin(
            fold.select(
                harmonic.alias("merged_harmonic_q"),
                est.alias("merged_estimate"),
            )
        )
        .crossJoin(exact)
        .select(
            "n_sketches",
            "n_buckets",
            "n_mismatches",
            (F.col("n_mismatches") == 0).alias("merge_is_lossless"),
            "merged_harmonic_q",
            "merged_estimate",
            "n_exact",
        )
    )
