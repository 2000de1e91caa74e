"""Data-quality expectation suite + warehouse-ops reports ([EXT]).

The audits a 100 TB lakehouse runs BEFORE trusting a table: null/blank
profiles, primary-key uniqueness, referential integrity, cross-field
rules, value domains, header/detail reconciliation, freshness lag, and
a one-table expectation rollup (the Great-Expectations / dbt-test
shape, re-expressed as plain aggregates so the checks run at fact
scale with partial+final combining and zero driver loops). The
synthetic fixtures carry REAL violations (≈25% of orders fail
header/detail reconciliation, ≈half of lineitems ship before their
order date, the lineitem composite key has duplicates), so every audit
is hash-gated on non-trivial counts, not vacuous zeros.

Every query: one partial-aggregating scan per table touched (the
rule evaluation is a projection — no shuffle carries raw rows), tiny
result tables, DuckDB oracle replay. Reference parity: the reference
has no audits at all (its SQLite schema is the only contract,
main.py:40-48); this module is the [EXT] operational hardening around
the same data model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

# ---------------------------------------------------------------- null/blank

_NULL_AUDIT_COLS = {
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "customer": [
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    ],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
}

_NULL_AUDIT_STRING_COLS = {
    "o_orderstatus",
    "o_orderpriority",
    "c_name",
    "c_mktsegment",
    "text",
    "lang",
    "source",
}


def _null_audit_oracle() -> str:
    branches = []
    for table, cols in _NULL_AUDIT_COLS.items():
        null_sums = ", ".join(
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS nn_{c}"
            for c in cols
        )
        blank_sums = ", ".join(
            (
                f"CAST(sum(CASE WHEN trim({c}) = '' THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS nb_{c}"
                if c in _NULL_AUDIT_STRING_COLS
                else f"CAST(0 AS BIGINT) AS nb_{c}"
            )
            for c in cols
        )
        agg = (
            f"(SELECT CAST(count(*) AS BIGINT) AS n_rows, {null_sums}, "
            f"{blank_sums} FROM {table})"
        )
        for c in cols:
            branches.append(
                f"SELECT '{table}' AS table_name, '{c}' AS column_name, "
                f"n_rows, nn_{c} AS n_null, nb_{c} AS n_blank FROM {agg}"
            )
    return (
        " UNION ALL ".join(branches)
        + " ORDER BY table_name, column_name"
    )


@register(
    "dq_null_blank_audit",
    oracle=_null_audit_oracle(),
    doc="Completeness audit: per (table, column) NULL and blank-string "
    "counts for the three user-facing tables — the first expectation "
    "every ingestion contract pins. ONE partial+final aggregate per "
    "table computes every column's counters in a single scan (16 "
    "counters ride one 1-row aggregate each — never 16 scans), then "
    "the 1-row aggregates explode into the (table, column) report "
    "rows driver-side-free. At 100 TB this is the cheapest possible "
    "shape: 3 scans, zero shuffled rows beyond 3x1 aggregate rows.",
)
def dq_null_blank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, cols in _NULL_AUDIT_COLS.items():
        df = load_table(spark, sf_dir, table)
        aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
        for c in cols:
            aggs.append(
                F.sum(F.col(c).isNull().cast("int"))
                .cast("bigint")
                .alias(f"nn_{c}")
            )
            if c in _NULL_AUDIT_STRING_COLS:
                aggs.append(
                    F.sum((F.trim(F.col(c)) == "").cast("int"))
                    .cast("bigint")
                    .alias(f"nb_{c}")
                )
            else:
                aggs.append(F.lit(0).cast("bigint").alias(f"nb_{c}"))
        row = df.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"nn_{c}").alias("n_null"),
                    F.col(f"nb_{c}").alias("n_blank"),
                )
                for c in cols
            ]
        )
        outs.append(
            row.select(
                F.lit(table).alias("table_name"),
                "n_rows",
                F.explode(pairs).alias("p"),
            ).select(
                "table_name",
                F.col("p.column_name").alias("column_name"),
                "n_rows",
                F.coalesce("p.n_null", F.lit(0)).cast("bigint").alias("n_null"),
                F.coalesce("p.n_blank", F.lit(0))
                .cast("bigint")
                .alias("n_blank"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "column_name")


# ------------------------------------------------------------- PK uniqueness

_PK_SPECS = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("documents", ["doc_id"]),
    ("events", ["event_id"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
]


def _pk_oracle() -> str:
    branches = []
    for table, keys in _PK_SPECS:
        key_expr = keys[0] if len(keys) == 1 else "(" + ", ".join(keys) + ")"
        branches.append(
            f"SELECT '{table}' AS table_name, "
            f"'{','.join(keys)}' AS key_columns, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(DISTINCT {key_expr}) AS BIGINT) AS n_distinct_keys, "
            f"CAST(count(*) - count(DISTINCT {key_expr}) AS BIGINT) "
            f"AS n_excess_rows FROM {table}"
        )
    return " UNION ALL ".join(branches) + " ORDER BY table_name"


@register(
    "dq_primary_key_uniqueness",
    oracle=_pk_oracle(),
    doc="Primary-key uniqueness audit across all seven tables "
    "(lineitem checked on its COMPOSITE (orderkey, linenumber) key — "
    "which the synthetic fixture genuinely violates, so the gate "
    "carries a real duplicate count, not a vacuous zero). Each table "
    "is one scan with a distinct-count aggregate (partial+final, "
    "shuffle carries key hashes); at 100 TB swap count_distinct for "
    "approx_count_distinct per key when an exact excess count is not "
    "contractually required — the one-line trade every audit here "
    "documents once.",
)
def dq_primary_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, keys in _PK_SPECS:
        df = load_table(spark, sf_dir, table)
        outs.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct(*keys).cast("bigint").alias("n_distinct_keys"),
            ).select(
                F.lit(table).alias("table_name"),
                F.lit(",".join(keys)).alias("key_columns"),
                "n_rows",
                "n_distinct_keys",
                (F.col("n_rows") - F.col("n_distinct_keys"))
                .cast("bigint")
                .alias("n_excess_rows"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name")


# ------------------------------------------------------ referential integrity

_FK_SPECS = [
    ("orders.o_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events.user_id", "events", "user_id", "customer", "c_custkey"),
]


def _fk_oracle() -> str:
    branches = []
    for name, child, ck, parent, pk in _FK_SPECS:
        branches.append(
            f"SELECT '{name}' AS fk, CAST(count(*) AS BIGINT) AS n_child, "
            f"CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_orphans "
            f"FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p"
            f" ON c.{ck} = p.{pk}"
        )
    return " UNION ALL ".join(branches) + " ORDER BY fk"


@register(
    "dq_referential_integrity",
    oracle=_fk_oracle(),
    doc="Referential-integrity audit for every foreign key in the star "
    "(orders→customer, lineitem→orders/part/supplier, events→customer "
    "as the cross-domain identity check): child row count + orphan "
    "count per relation via left joins against the DISTINCT parent "
    "key set. Plan shape at 100 TB: dimension parents broadcast; the "
    "two fact-fact relations shuffle on the join key — the same "
    "exchange the business joins pay, so an RI sweep costs no more "
    "than one report query per relation. All-zero orphans here is the "
    "MEASURED contract (the fixture satisfies RI), sitting next to "
    "the audits that measure real violations.",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for name, child, ck, parent, pk in _FK_SPECS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk).distinct()
        joined = c.join(p, c[ck] == p[pk], "left")
        outs.append(
            joined.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child"),
                F.sum(F.col(pk).isNull().cast("int"))
                .cast("bigint")
                .alias("n_orphans"),
            ).select(F.lit(name).alias("fk"), "n_child", "n_orphans")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fk")


# -------------------------------------------------------- cross-field rules


@register(
    "dq_cross_field_rules",
    oracle="""
SELECT 'lineitem_discount_out_of_range' AS rule,
  CAST(count(*) AS BIGINT) AS n_checked,
  CAST(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, FALSE)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_quantity',
  CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN NOT coalesce(l_quantity > 0, FALSE)
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_ship_before_order',
  CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
       AS BIGINT)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem_tax_out_of_range',
  CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN NOT coalesce(l_tax BETWEEN 0 AND 1, FALSE)
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_nonpositive_total',
  CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
ORDER BY rule
""",
    doc="Cross-field business-rule audit: range rules as single-scan "
    "aggregates (discount/tax in [0,1], positive quantity/total) and "
    "the one cross-TABLE rule — lineitem shipping before its order "
    "date — as a fact-fact equi-join (the fixture violates it on "
    "~half the lines: real signal). Rule predicates are written as "
    "positive keep-conditions wrapped in coalesce(.., FALSE) so NULL "
    "operands COUNT AS VIOLATIONS in both engines — the 3VL trap "
    "(negated filters silently dropping NULL rows identically in "
    "both engines, invisible to the hash gate) this repo documents "
    "in tests/test_round5_semantics.py.",
)
def dq_cross_field_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def viol(cond):
        # violation = NOT coalesce(keep_cond, FALSE): nulls violate
        return F.sum(
            (~F.coalesce(cond, F.lit(False))).cast("int")
        ).cast("bigint")

    rows = [
        li.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            viol(F.col("l_discount").between(0, 1)).alias("n_violations"),
        ).select(
            F.lit("lineitem_discount_out_of_range").alias("rule"),
            "n_checked",
            "n_violations",
        ),
        li.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            viol(F.col("l_quantity") > 0).alias("n_violations"),
        ).select(
            F.lit("lineitem_nonpositive_quantity").alias("rule"),
            "n_checked",
            "n_violations",
        ),
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("int"))
            .cast("bigint")
            .alias("n_violations"),
        )
        .select(
            F.lit("lineitem_ship_before_order").alias("rule"),
            "n_checked",
            "n_violations",
        ),
        li.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            viol(F.col("l_tax").between(0, 1)).alias("n_violations"),
        ).select(
            F.lit("lineitem_tax_out_of_range").alias("rule"),
            "n_checked",
            "n_violations",
        ),
        o.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            viol(F.col("o_totalprice") > 0).alias("n_violations"),
        ).select(
            F.lit("orders_nonpositive_total").alias("rule"),
            "n_checked",
            "n_violations",
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("rule")


# --------------------------------------------------------- value domains

_DOMAIN_SPECS = {
    "orders": [
        ("o_orderstatus", ("F", "O", "P")),
        (
            "o_orderpriority",
            ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        ),
    ],
    "lineitem": [
        ("l_returnflag", ("A", "N", "R")),
        ("l_linestatus", ("F", "O")),
    ],
    "customer": [
        (
            "c_mktsegment",
            ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
        ),
    ],
    "documents": [("lang", ("de", "en", "es", "fr", "zh"))],
    "events": [
        ("event_type", ("click", "error", "purchase", "signup", "view"))
    ],
}


def _domain_oracle() -> str:
    branches = []
    for table, specs in _DOMAIN_SPECS.items():
        for col, dom in specs:
            dom_sql = ", ".join(f"'{v}'" for v in dom)
            branches.append(
                f"SELECT '{table}' AS table_name, '{col}' AS column_name, "
                f"CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct, "
                f"CAST(sum(CASE WHEN NOT coalesce({col} IN ({dom_sql}), "
                f"FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_domain "
                f"FROM {table}"
            )
    return " UNION ALL ".join(branches) + " ORDER BY table_name, column_name"


@register(
    "dq_value_domain_audit",
    oracle=_domain_oracle(),
    doc="Accepted-values audit: every enum-shaped column checked "
    "against its declared domain (status/priority/flag/segment/lang/"
    "event-type), reporting cardinality and out-of-domain counts — "
    "the dbt accepted_values test at fact scale. NULLs count as "
    "out-of-domain via the coalesce(.., FALSE) positive-condition "
    "discipline (3VL). One aggregate per (table, column) — the "
    "distinct-count is the only shuffled state; everything else is "
    "map-side.",
)
def dq_value_domain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, specs in _DOMAIN_SPECS.items():
        df = load_table(spark, sf_dir, table)
        for col, dom in specs:
            outs.append(
                df.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.countDistinct(col).cast("bigint").alias("n_distinct"),
                    F.sum(
                        (
                            ~F.coalesce(
                                F.col(col).isin(*dom), F.lit(False)
                            )
                        ).cast("int")
                    )
                    .cast("bigint")
                    .alias("n_out_of_domain"),
                ).select(
                    F.lit(table).alias("table_name"),
                    F.lit(col).alias("column_name"),
                    "n_rows",
                    "n_distinct",
                    "n_out_of_domain",
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "column_name")


# ------------------------------------------------ header/detail reconciliation


@register(
    "dq_order_total_reconciliation",
    oracle="""
WITH line_cents AS (
  SELECT l_orderkey,
    CAST(SUM(CAST(floor(((l_extendedprice * (1 - l_discount))
        * (1 + l_tax)) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS lines_c
  FROM lineitem GROUP BY l_orderkey
),
recon AS (
  SELECT o.o_orderstatus,
    CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
      - coalesce(lc.lines_c, 0) AS drift_c
  FROM orders o LEFT JOIN line_cents lc ON o.o_orderkey = lc.l_orderkey
)
SELECT o_orderstatus,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN drift_c <> 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_mismatched,
  CAST(sum(abs(drift_c)) AS BIGINT) AS total_abs_drift_cents
FROM recon GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    doc="Header/detail reconciliation: order header total vs the sum "
    "of its lines' gross charge (extendedprice x (1-discount) x "
    "(1+tax)), in exact integer CENTS (per-row floor(x*100+0.5) is "
    "one identical IEEE chain in both engines; every reduction after "
    "is BIGINT) — the financial-close audit every revenue warehouse "
    "runs nightly. The fixture genuinely fails it on ~25% of orders, "
    "so mismatch counts and total absolute drift are real hash-gated "
    "signal. Plan: one (orderkey)-keyed partial+final rollup of the "
    "fact + a key-join to headers — the same exchange as any "
    "order-level report; headerless/lineless orders count as full "
    "drift via the LEFT join + coalesce.",
)
def dq_order_total_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    gross_c = F.floor(
        (
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * (1 + F.col("l_tax"))
        )
        * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")
    line_cents = li.groupBy("l_orderkey").agg(
        F.sum(gross_c).cast("bigint").alias("lines_c")
    )
    header_c = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    recon = o.join(
        line_cents, o.o_orderkey == line_cents.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        (header_c - F.coalesce(F.col("lines_c"), F.lit(0))).alias("drift_c"),
    )
    return (
        recon.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((F.col("drift_c") != 0).cast("int"))
            .cast("bigint")
            .alias("n_mismatched"),
            F.sum(F.abs("drift_c")).cast("bigint").alias(
                "total_abs_drift_cents"
            ),
        )
        .orderBy("o_orderstatus")
    )


# ------------------------------------------------------------ freshness lag


@register(
    "dq_freshness_lag",
    oracle="""
WITH mx AS (SELECT max(ts) AS global_max FROM events),
per_type AS (
  SELECT event_type, max(ts) AS last_ts, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
)
SELECT event_type, last_ts, n_events,
  CAST(date_diff('second', last_ts, mx.global_max) // 60 AS BIGINT)
    AS lag_minutes,
  (date_diff('second', last_ts, mx.global_max) // 60) > 60 AS is_stale
FROM per_type, mx ORDER BY event_type
""",
    doc="Freshness audit: per event type, the newest event's lag "
    "behind the stream's high-water mark in integer minutes, with a "
    "60-minute staleness flag — the monitor that catches a dead "
    "upstream producer (one type's lag grows while the watermark "
    "advances). One partial+final aggregate; the global max folds "
    "out of the same scan and broadcasts back. The streaming twin is "
    "the watermark itself — this is its batch replay.",
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("global_max"))
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    lag_min = F.expr(
        "(unix_timestamp(global_max) - unix_timestamp(last_ts)) DIV 60"
    ).cast("bigint")
    return (
        per_type.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            "last_ts",
            "n_events",
            lag_min.alias("lag_minutes"),
            (lag_min > 60).alias("is_stale"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------- expectation rollup


@register(
    "dq_expectation_summary",
    oracle="""
WITH recon AS (
  SELECT CAST(sum(CASE WHEN drift_c <> 0 THEN 1 ELSE 0 END) * 1000000
              // count(*) AS BIGINT) AS v
  FROM (
    SELECT CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
        - coalesce(lc.lines_c, 0) AS drift_c
    FROM orders o LEFT JOIN (
      SELECT l_orderkey,
        CAST(SUM(CAST(floor(((l_extendedprice * (1 - l_discount))
            * (1 + l_tax)) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS lines_c
      FROM lineitem GROUP BY l_orderkey
    ) lc ON o.o_orderkey = lc.l_orderkey
  )
),
li_pk AS (
  SELECT CAST((count(*) - count(DISTINCT (l_orderkey, l_linenumber)))
              * 1000000 // count(*) AS BIGINT) AS v
  FROM lineitem
),
o_rows AS (SELECT CAST(count(*) AS BIGINT) AS v FROM orders),
null_keys AS (
  SELECT CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS v
  FROM lineitem
),
ship AS (
  SELECT CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
              * 1000000 // count(*) AS BIGINT) AS v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT 'lineitem_null_orderkey_count' AS expectation, null_keys.v AS measured,
  CAST(0 AS BIGINT) AS threshold, null_keys.v <= 0 AS pass FROM null_keys
UNION ALL
SELECT 'lineitem_pk_dup_rate_ppm', li_pk.v, CAST(0 AS BIGINT),
  li_pk.v <= 0 FROM li_pk
UNION ALL
SELECT 'lineitem_ship_before_order_rate_ppm', ship.v, CAST(10000 AS BIGINT),
  ship.v <= 10000 FROM ship
UNION ALL
SELECT 'orders_reconciliation_mismatch_rate_ppm', recon.v,
  CAST(50000 AS BIGINT), recon.v <= 50000 FROM recon
UNION ALL
SELECT 'orders_rowcount_min', o_rows.v, CAST(1000 AS BIGINT),
  o_rows.v >= 1000 FROM o_rows
ORDER BY expectation
""",
    doc="The expectation ROLLUP: five contract-level expectations "
    "(row-count floor, null keys, composite-PK duplicate rate, "
    "ship-before-order rate, header/detail mismatch rate) each with "
    "its measured value in exact integer ppm, its literal threshold, "
    "and the pass verdict — the one table a pipeline gate reads "
    "(dbt test / Great Expectations checkpoint shape). The fixture "
    "honestly FAILS three of the five (duplicate composite keys, "
    "~49% ship-before-order, ~25% reconciliation mismatches), so the "
    "hash gate pins real failure reporting, not a green-path mock. "
    "Each expectation is one aggregate; the whole suite costs three "
    "fact scans + one key join.",
)
def dq_expectation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    gross_c = F.floor(
        (
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * (1 + F.col("l_tax"))
        )
        * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")
    line_cents = li.groupBy("l_orderkey").agg(
        F.sum(gross_c).cast("bigint").alias("lines_c")
    )
    header_c = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    recon = (
        o.join(line_cents, o.o_orderkey == line_cents.l_orderkey, "left")
        .select(
            (header_c - F.coalesce(F.col("lines_c"), F.lit(0))).alias(
                "drift_c"
            )
        )
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN drift_c <> 0 THEN 1 ELSE 0 END) "
                "* 1000000 DIV count(*) AS BIGINT)"
            ).alias("v")
        )
    )
    li_pk = li.agg(
        F.expr(
            "CAST((count(*) - count(DISTINCT l_orderkey, l_linenumber)) "
            "* 1000000 DIV count(*) AS BIGINT)"
        ).alias("v")
    )
    o_rows = o.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    null_keys = li.agg(
        F.sum(F.col("l_orderkey").isNull().cast("int"))
        .cast("bigint")
        .alias("v")
    )
    ship = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.expr(
            "CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)"
            " * 1000000 DIV count(*) AS BIGINT)"
        ).alias("v")
    )

    def row(df, name, threshold, geq=False):
        passed = (
            (F.col("v") >= threshold) if geq else (F.col("v") <= threshold)
        )
        return df.select(
            F.lit(name).alias("expectation"),
            F.col("v").cast("bigint").alias("measured"),
            F.lit(threshold).cast("bigint").alias("threshold"),
            passed.alias("pass"),
        )

    rows = [
        row(null_keys, "lineitem_null_orderkey_count", 0),
        row(li_pk, "lineitem_pk_dup_rate_ppm", 0),
        row(ship, "lineitem_ship_before_order_rate_ppm", 10000),
        row(recon, "orders_reconciliation_mismatch_rate_ppm", 50000),
        row(o_rows, "orders_rowcount_min", 1000, geq=True),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("expectation")


# ------------------------------------------------------ backlog age waterfall


@register(
    "orders_backlog_age_waterfall",
    oracle="""
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
open_orders AS (
  SELECT CAST((date_diff('second', o_orderdate, anchor.mx)) // 86400
              AS BIGINT) AS age_days,
    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS value_c
  FROM orders, anchor WHERE o_orderstatus IN ('O', 'P')
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_open FROM open_orders),
bucketed AS (
  SELECT CASE WHEN age_days <= 30 THEN '00-30'
              WHEN age_days <= 90 THEN '31-90'
              WHEN age_days <= 180 THEN '91-180'
              ELSE '180+' END AS age_bucket,
    value_c
  FROM open_orders
)
SELECT age_bucket,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(value_c) AS BIGINT) AS value_cents,
  CAST(count(*) * 1000000 // tot.n_open AS BIGINT) AS share_ppm
FROM bucketed, tot GROUP BY age_bucket, tot.n_open ORDER BY age_bucket
""",
    doc="Open-order aging waterfall: orders still open (status O/P) "
    "bucketed by age against the book's high-water date, with order "
    "counts, value in exact cents, and integer-ppm share — the "
    "working-capital report next to orders_open_backlog_peaks' "
    "timeline view (peaks = WHEN the backlog was worst; this = HOW "
    "OLD what remains is). One pushed-filter scan (status predicate "
    "reaches parquet), the anchor folds out of the same table, "
    "bucketing is a projection, and the rollup is 4 rows.",
)
def orders_backlog_age_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    open_orders = (
        o.filter(F.col("o_orderstatus").isin("O", "P"))
        .crossJoin(F.broadcast(anchor))
        .select(
            F.expr(
                "(unix_timestamp(mx) - unix_timestamp(o_orderdate)) DIV 86400"
            )
            .cast("bigint")
            .alias("age_days"),
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("value_c"),
        )
    )
    tot = open_orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_open"))
    bucketed = open_orders.select(
        F.when(F.col("age_days") <= 30, "00-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 180, "91-180")
        .otherwise("180+")
        .alias("age_bucket"),
        "value_c",
    )
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("age_bucket", "n_open")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("value_c").cast("bigint").alias("value_cents"),
        )
        .select(
            "age_bucket",
            "n_orders",
            "value_cents",
            F.expr("CAST(n_orders * 1000000 DIV n_open AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("age_bucket")
    )


# ------------------------------------------------------ seasonality strength


@register(
    "orders_seasonality_strength",
    oracle="""
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yy,
    CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mm,
    CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
      AS BIGINT) AS rev_c
  FROM orders GROUP BY 1, 2
),
seq AS (
  SELECT yy, mm, rev_c,
    CAST(SUM(rev_c) OVER (ORDER BY yy, mm
      ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS BIGINT) AS wsum,
    CAST(count(*) OVER (ORDER BY yy, mm
      ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS BIGINT) AS wn
  FROM monthly
),
detr AS (
  SELECT yy, mm,
    (rev_c - (wsum // 13)) // 10000 AS dt
  FROM seq WHERE wn = 13
),
seasonal AS (
  SELECT mm, CAST(SUM(dt) AS BIGINT) // CAST(count(*) AS BIGINT) AS s_c
  FROM detr GROUP BY mm
),
resid AS (
  SELECT d.dt, d.dt - s.s_c AS r FROM detr d JOIN seasonal s USING (mm)
),
moments AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(dt) AS BIGINT) AS sd, CAST(sum(dt * dt) AS BIGINT) AS ssd,
    CAST(sum(r) AS BIGINT) AS sr, CAST(sum(r * r) AS BIGINT) AS ssr
  FROM resid
)
SELECT n AS n_months, sd, ssd, sr, ssr,
  1.0 - (CAST(n * ssr - sr * sr AS DOUBLE)
         / CAST(n * ssd - sd * sd AS DOUBLE)) AS seasonal_strength
FROM moments
""",
    doc="Seasonal-strength statistic (Hyndman's F_s from the STL "
    "literature, additive form): 1 - Var(remainder)/Var(detrended) "
    "over the SAME 13-month-MA decomposition "
    "orders_seasonal_decomposition publishes — near 1 means the "
    "calendar explains most post-trend variance (forecast with "
    "seasonal models), near 0 means the seasonal indices are noise. "
    "Every moment is an exact BIGINT sum over integer cents "
    "(variances via the n*Σx²-(Σx)² identity), so the only float is "
    "the final ratio; the five sufficient statistics hash-gate "
    "exactly. Corpus → calendar-month table first; the MA window is "
    "calendar-bounded (the allowlisted seasonal site).",
)
def orders_seasonality_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cnc_visionsearch_spark.queries_relational import _seasonal_detrended

    # detrended deltas rescaled cents -> 100-dollar units before any
    # square: dt^2 in cents overflows BIGINT at bench scale (DuckDB
    # silently promotes to HUGEINT; Spark does not), and the strength
    # RATIO is scale-consistent as long as both engines divide
    # identically (div == // : truncate toward zero, FIXTURES rules)
    detr = _seasonal_detrended(spark, sf_dir).select(
        "mm", F.expr("dt div 10000").cast("bigint").alias("dt")
    )
    seasonal = detr.groupBy("mm").agg(
        F.expr("CAST(SUM(dt) AS BIGINT) div CAST(count(*) AS BIGINT)")
        .cast("bigint")
        .alias("s_c")
    )
    resid = detr.join(F.broadcast(seasonal), "mm").select(
        "dt", (F.col("dt") - F.col("s_c")).alias("r")
    )
    m = resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dt").cast("bigint").alias("sd"),
        F.sum(F.col("dt") * F.col("dt")).cast("bigint").alias("ssd"),
        F.sum("r").cast("bigint").alias("sr"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("ssr"),
    )
    return m.select(
        F.col("n").alias("n_months"),
        "sd",
        "ssd",
        "sr",
        "ssr",
        (
            F.lit(1.0)
            - (
                (F.col("n") * F.col("ssr") - F.col("sr") * F.col("sr")).cast(
                    "double"
                )
                / (
                    F.col("n") * F.col("ssd") - F.col("sd") * F.col("sd")
                ).cast("double")
            )
        ).alias("seasonal_strength"),
    )


# ------------------------------------------------------ numeric profile

_NUM_PROFILE_SPECS = {
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
}


def _num_profile_oracle() -> str:
    branches = []
    for table, cols in _NUM_PROFILE_SPECS.items():
        for c in cols:
            branches.append(
                f"SELECT '{table}' AS table_name, '{c}' AS column_name, "
                f"CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS n_null, "
                f"CAST(floor(min({c}) * 1000000.0 + 0.5) AS BIGINT) AS min_q, "
                f"CAST(floor(max({c}) * 1000000.0 + 0.5) AS BIGINT) AS max_q, "
                f"CAST(SUM(CAST(floor({c} * 1000000.0 + 0.5) AS BIGINT)) "
                f"AS BIGINT) AS sum_q, "
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct "
                f"FROM {table}"
            )
    return " UNION ALL ".join(branches) + " ORDER BY table_name, column_name"


@register(
    "dq_numeric_profile_snapshot",
    oracle=_num_profile_oracle(),
    doc="Numeric-column profile snapshot: per measure column, row/null "
    "counts, 1e-6-quantized min/max/sum (exact BIGINTs — the "
    "drift-baseline fingerprint two snapshots DIFF to detect schema-"
    "preserving distribution drift, upstream scale changes, or a "
    "silent unit switch), and distinct-value cardinality (the "
    "optimizer-statistics NDV). This is the table a drift monitor "
    "stores per ingest batch — source_drift_tv_matrix compares "
    "DISTRIBUTIONS between sources; this pins the per-column "
    "sufficient statistics over time. One aggregate per column, "
    "min/max/sum map-side combinable; NDV is the only shuffled "
    "state (swap for approx_count_distinct at 100 TB, the "
    "documented audit trade).",
)
def dq_numeric_profile_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, cols in _NUM_PROFILE_SPECS.items():
        df = load_table(spark, sf_dir, table)
        for c in cols:
            q = lambda e: F.floor(e * F.lit(1000000.0) + F.lit(0.5)).cast(
                "bigint"
            )
            outs.append(
                df.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.sum(F.col(c).isNull().cast("int"))
                    .cast("bigint")
                    .alias("n_null"),
                    q(F.min(c)).alias("min_q"),
                    q(F.max(c)).alias("max_q"),
                    F.sum(q(F.col(c))).cast("bigint").alias("sum_q"),
                    F.countDistinct(c).cast("bigint").alias("n_distinct"),
                ).select(
                    F.lit(table).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    "n_rows",
                    "n_null",
                    "min_q",
                    "max_q",
                    "sum_q",
                    "n_distinct",
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "column_name")


# ---------------------------------------------------- full-row duplicates

_FULLROW_SPECS = {
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
}


def _fullrow_oracle() -> str:
    branches = []
    for table, cols in _FULLROW_SPECS.items():
        tup = "(" + ", ".join(cols) + ")"
        branches.append(
            f"SELECT '{table}' AS table_name, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(DISTINCT {tup}) AS BIGINT) AS n_distinct_rows, "
            f"CAST(count(*) - count(DISTINCT {tup}) AS BIGINT) "
            f"AS n_duplicate_rows FROM {table}"
        )
    return " UNION ALL ".join(branches) + " ORDER BY table_name"


@register(
    "dq_duplicate_full_rows",
    oracle=_fullrow_oracle(),
    doc="Whole-row duplicate audit: rows identical in EVERY column — "
    "the signature of a replayed ingest batch or an at-least-once "
    "sink without idempotent writes, and a different defect than a "
    "duplicated KEY (dq_primary_key_uniqueness catches key "
    "collisions with differing payloads; this catches exact replays "
    "— together they separate 'replay' from 'conflicting update', "
    "which have different fixes). Counted via count(DISTINCT "
    "struct(all columns)) so no cross-engine string formatting of "
    "doubles/timestamps ever happens (a md5-of-concat fingerprint "
    "would hash the FORMATTING, not the values); the shuffle carries "
    "full rows once — at 100 TB this audit rides the same exchange "
    "as the exact-dedup operator, or reuses its persisted md5 "
    "fingerprints for text-like tables.",
)
def dq_duplicate_full_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, cols in _FULLROW_SPECS.items():
        df = load_table(spark, sf_dir, table)
        outs.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct(*cols)
                .cast("bigint")
                .alias("n_distinct_rows"),
            ).select(
                F.lit(table).alias("table_name"),
                "n_rows",
                "n_distinct_rows",
                (F.col("n_rows") - F.col("n_distinct_rows"))
                .cast("bigint")
                .alias("n_duplicate_rows"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name")


# --------------------------------------------------------- l-diversity


@register(
    "customer_l_diversity",
    oracle="""
WITH quasi AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
  FROM customer
),
classes AS (
  SELECT c_nationkey, bal_band,
    CAST(count(*) AS BIGINT) AS k,
    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
  FROM quasi GROUP BY c_nationkey, bal_band
)
SELECT l,
  CAST(count(*) AS BIGINT) AS n_classes,
  CAST(sum(k) AS BIGINT) AS n_rows,
  CAST(CASE WHEN l < 2 THEN sum(k) ELSE 0 END AS BIGINT)
    AS rows_homogeneous
FROM classes GROUP BY l ORDER BY l
""",
    doc="l-diversity audit (Machanavajjhala et al. ICDE'06) — the "
    "attack k-anonymity misses: a class can be large (k high) yet "
    "HOMOGENEOUS in the sensitive attribute, so membership alone "
    "leaks it. Quasi-identifiers here are (nation, $1000 balance "
    "band); the sensitive attribute is the market segment; l = "
    "distinct sensitive values per class, and classes with l < 2 "
    "are the homogeneity-attack rows generalization must widen — "
    "the companion scan to customer_k_anonymity (same QI census, "
    "different failure mode; a governed platform runs both). One "
    "scan, one (QI) aggregate carrying count + distinct-count, one "
    "dimension-sized histogram.",
)
def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0)
            .cast("bigint")
            .alias("bal_band"),
        )
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.countDistinct("c_mktsegment").cast("bigint").alias("l"),
        )
    )
    return (
        classes.groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("k").cast("bigint").alias("n_rows"),
            F.when(F.col("l") < 2, F.sum("k"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("rows_homogeneous"),
        )
        .orderBy("l")
    )


# --------------------------------------------- substitution candidates


@register(
    "part_substitution_candidates",
    oracle="""
WITH priced AS (
  SELECT p_partkey, p_brand, p_type, p_size,
    CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_c
  FROM part
),
expensive AS (
  SELECT p_type, p_size,
    max(struct_pack(price_c := price_c, nk := -p_partkey,
                    brand := p_brand)) AS hi
  FROM priced GROUP BY p_type, p_size
),
alt AS (
  SELECT p.p_type, p.p_size,
    min(struct_pack(price_c := p.price_c, pk := p.p_partkey,
                    brand := p.p_brand)) AS lo
  FROM priced p JOIN expensive e
    ON p.p_type = e.p_type AND p.p_size = e.p_size
  WHERE p.p_brand <> e.hi.brand
  GROUP BY p.p_type, p.p_size
),
paired AS (
  SELECT e.p_type, e.p_size,
    -e.hi.nk AS expensive_part, e.hi.brand AS expensive_brand,
    e.hi.price_c AS expensive_price_c,
    a.lo.pk AS substitute_part, a.lo.brand AS substitute_brand,
    a.lo.price_c AS substitute_price_c,
    e.hi.price_c - a.lo.price_c AS savings_c
  FROM expensive e JOIN alt a
    ON e.p_type = a.p_type AND e.p_size = a.p_size
)
SELECT CAST(row_number() OVER (
    ORDER BY savings_c DESC, expensive_part ASC) AS INT) AS rank,
  p_type, CAST(p_size AS BIGINT) AS p_size,
  CAST(expensive_part AS BIGINT) AS expensive_part, expensive_brand,
  expensive_price_c,
  CAST(substitute_part AS BIGINT) AS substitute_part, substitute_brand,
  substitute_price_c, savings_c
FROM paired
ORDER BY savings_c DESC, expensive_part ASC LIMIT 15
""",
    doc="Procurement substitution candidates: within each (type, size) "
    "equivalence group — the functional-interchangeability key — pair "
    "the most expensive part with the cheapest alternative from a "
    "DIFFERENT brand and rank by the exact-cents saving: the "
    "spend-optimization list sourcing reviews next to "
    "part_price_dispersion's supplier-side arbitrage view (same "
    "question, catalog side). Both ends of each pair are struct-"
    "extrema aggregates (argmax/argmin as lexicographic struct "
    "min/max with partkey tie-breaks — no window at all), joined "
    "back on the bounded group key; top-15 is a TakeOrdered with "
    "the bounded post-limit rank.",
)
def part_substitution_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cnc_visionsearch_spark.operators.rank import global_topn

    p = load_table(spark, sf_dir, "part")
    priced = p.select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
    )
    expensive = priced.groupBy("p_type", "p_size").agg(
        F.max(
            F.struct(
                F.col("price_c"),
                (-F.col("p_partkey")).alias("nk"),
                F.col("p_brand").alias("brand"),
            )
        ).alias("hi")
    )
    alt = (
        priced.alias("p")
        .join(
            expensive.alias("e"),
            (F.col("p.p_type") == F.col("e.p_type"))
            & (F.col("p.p_size") == F.col("e.p_size")),
        )
        .filter(F.col("p.p_brand") != F.col("e.hi.brand"))
        .groupBy(F.col("p.p_type").alias("p_type"), F.col("p.p_size").alias("p_size"))
        .agg(
            F.min(
                F.struct(
                    F.col("p.price_c").alias("price_c"),
                    F.col("p.p_partkey").alias("pk"),
                    F.col("p.p_brand").alias("brand"),
                )
            ).alias("lo")
        )
    )
    paired = expensive.join(alt, ["p_type", "p_size"]).select(
        "p_type",
        F.col("p_size").cast("bigint").alias("p_size"),
        (-F.col("hi.nk")).cast("bigint").alias("expensive_part"),
        F.col("hi.brand").alias("expensive_brand"),
        F.col("hi.price_c").alias("expensive_price_c"),
        F.col("lo.pk").cast("bigint").alias("substitute_part"),
        F.col("lo.brand").alias("substitute_brand"),
        F.col("lo.price_c").alias("substitute_price_c"),
        (F.col("hi.price_c") - F.col("lo.price_c")).alias("savings_c"),
    )
    return global_topn(
        paired,
        [F.col("savings_c").desc(), F.col("expensive_part").asc()],
        15,
        rank_col="rank",
    ).select(
        "rank",
        "p_type",
        "p_size",
        "expensive_part",
        "expensive_brand",
        "expensive_price_c",
        "substitute_part",
        "substitute_brand",
        "substitute_price_c",
        "savings_c",
    )
