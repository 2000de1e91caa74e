"""Span-level dedup extensions ([EXT], round 5): exact-substring
duplicate-span extraction and the surgical span-removal rewrite (Lee
et al. 2022). A separate module so these register AFTER the frozen
50-entry driver window (registry._MODULE_ORDER ranks this module
last-group; queries_dedup feeds the window and must not grow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table


# ------------------------------ exact-substring duplicate-span extraction

# Two planted passages built from tokens OUTSIDE the fixture vocabulary
# (TESTDATA.md: the corpus draws from a small Spark-themed word list),
# so no gram straddling a splice boundary can collide with organic text.
_SPAN_HEAD = (
    "omega kappa sigma delta theta lambda epsilon zeta iota rho "
    "tau upsilon gamma beta alpha phi chi psi omicron nu"
)
_SPAN_TAIL = (
    "quartz basalt gneiss schist marble granite pumice obsidian shale "
    "slate flint chert jasper agate onyx topaz beryl garnet spinel zircon"
)
_SPAN_K = 8  # gram width (tokens) — Lee et al. use 50 BPE tokens; the
# fixture docs are ~40 words, so 8 keeps multiple gram starts per plant


@register(
    "doc_duplicate_spans",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, source,
    CASE WHEN doc_id % 37 = 0 THEN '{_SPAN_HEAD} ' || text ELSE text END
    || CASE WHEN doc_id % 41 = 0 THEN ' {_SPAN_TAIL}' ELSE '' END AS text
  FROM documents
),
tk AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM corpus
  WHERE len(string_split(text, ' ')) >= {_SPAN_K}
),
grams AS (
  SELECT doc_id, source, i,
    md5(array_to_string(tk[i : i + {_SPAN_K} - 1], ' ')) AS gfp
  FROM tk, unnest(range(1, len(tk) - {_SPAN_K} + 2)) AS t(i)
),
dupg AS (
  SELECT gfp FROM grams GROUP BY gfp HAVING count(DISTINCT doc_id) >= 2
),
covered AS (
  SELECT DISTINCT g.doc_id, g.source, g.i + o.o AS pos
  FROM grams g JOIN dupg USING (gfp), unnest(range(0, {_SPAN_K})) AS o(o)
),
islands AS (
  SELECT doc_id, source, pos,
    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM covered
),
spans AS (
  SELECT doc_id, source, grp,
    CAST(min(pos) AS BIGINT) AS span_start,
    CAST(count(*) AS BIGINT) AS span_len
  FROM islands GROUP BY doc_id, source, grp
)
SELECT source,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_affected,
  CAST(count(*) AS BIGINT) AS n_spans,
  CAST(sum(span_len) AS BIGINT) AS dup_tokens,
  CAST(max(span_len) AS BIGINT) AS max_span_len,
  CAST(sum(span_len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_span_len
FROM spans GROUP BY source ORDER BY source
""",
    doc="Exact-substring duplicate-SPAN extraction (Lee et al. 2022, "
    "'Deduplicating Training Data Makes Language Models Better'): "
    "MinHash flags near-duplicate DOCUMENTS, but verbatim passages "
    "repeated across otherwise-distinct documents (licenses, quoted "
    "headers, syndicated paragraphs) need span-level surgery — find "
    f"every {_SPAN_K}-token gram shared by >= 2 documents, mark the "
    "token positions it covers, and merge adjacent positions into "
    "MAXIMAL spans per document (gaps-and-islands: pos - row_number "
    "within the doc). The fixture corpus is random text, so two known "
    "passages (vocabulary disjoint from the corpus word list — no "
    "splice-boundary collisions) are planted deterministically IN "
    "BOTH ENGINES: a 20-token head on doc_id%37==0 and a 20-token "
    "tail on doc_id%41==0; doc 0 gets both and must yield two "
    "separate islands. The detector must recover exactly the planted "
    "token ranges. Per source: affected docs, span count, duplicated "
    "tokens, max/avg span length. Scale shape: the shuffle key is the "
    "16-byte gram md5 (text never shuffles); the duplicated-gram "
    "table is a HAVING-filtered partial aggregate that at 100 TB is "
    "orders of magnitude smaller than the gram stream, so the "
    "flag-back is a semi-join against a small build side; the island "
    "merge windows PER DOCUMENT — never a global sort. The spans "
    "table (doc_id, start, len) is the input a surgical span-removal "
    "rewrite pass consumes.",
)
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        "source",
        F.concat(
            F.when(
                F.col("doc_id") % 37 == 0,
                F.lit(_SPAN_HEAD + " "),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 41 == 0,
                F.lit(" " + _SPAN_TAIL),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    tk = corpus.select(
        "doc_id", "source", F.split("text", " ").alias("tk")
    ).filter(F.size("tk") >= _SPAN_K)
    grams = tk.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(1), F.size("tk") - (_SPAN_K - 1))
        ).alias("i"),
        "tk",
    ).select(
        "doc_id",
        "source",
        "i",
        F.md5(
            F.array_join(F.slice("tk", F.col("i"), _SPAN_K), " ").cast(
                "binary"
            )
        ).alias("gfp"),
    )
    # duplicated grams: a HAVING-filtered aggregate — tiny vs the gram
    # stream at scale, so the flag-back below is a small-build semi-join
    dupg = (
        grams.groupBy("gfp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gfp")
    )
    covered = (
        grams.join(dupg, "gfp")
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(_SPAN_K - 1))).alias("o"),
            "i",
        )
        .select("doc_id", "source", (F.col("i") + F.col("o")).alias("pos"))
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = covered.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    spans = islands.groupBy("doc_id", "source", "grp").agg(
        F.min("pos").alias("span_start"),
        F.count(F.lit(1)).alias("span_len"),
    )
    return (
        spans.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("docs_affected"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_len").cast("bigint").alias("dup_tokens"),
            F.max("span_len").cast("bigint").alias("max_span_len"),
            (
                F.sum("span_len").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_span_len"),
        )
        .orderBy("source")
    )


@register(
    "doc_span_dedup_rewrite",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, source,
    CASE WHEN doc_id % 37 = 0 THEN '{_SPAN_HEAD} ' || text ELSE text END
    || CASE WHEN doc_id % 41 = 0 THEN ' {_SPAN_TAIL}' ELSE '' END AS text
  FROM documents
),
tk AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM corpus
  WHERE len(string_split(text, ' ')) >= {_SPAN_K}
),
grams AS (
  SELECT doc_id, source, i,
    md5(array_to_string(tk[i : i + {_SPAN_K} - 1], ' ')) AS gfp
  FROM tk, unnest(range(1, len(tk) - {_SPAN_K} + 2)) AS t(i)
),
dupg AS (
  SELECT gfp FROM grams GROUP BY gfp HAVING count(DISTINCT doc_id) >= 2
),
covered AS (
  SELECT DISTINCT g.doc_id, g.source, g.i + o.o AS pos
  FROM grams g JOIN dupg USING (gfp), unnest(range(0, {_SPAN_K})) AS o(o)
),
islands AS (
  SELECT doc_id, source, pos,
    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM covered
),
spans AS (
  SELECT doc_id, source, grp,
    CAST(min(pos) AS BIGINT) AS span_start,
    CAST(count(*) AS BIGINT) AS span_len
  FROM islands GROUP BY doc_id, source, grp
),
fspans AS (
  SELECT s.doc_id, s.source, s.span_len,
    md5(array_to_string(
      t.tk[s.span_start : s.span_start + s.span_len - 1], ' ')) AS span_fp
  FROM spans s JOIN tk t USING (doc_id)
),
keep AS (
  SELECT *, min(doc_id) OVER (PARTITION BY span_fp) AS keeper FROM fspans
),
removed AS (
  SELECT source, doc_id, span_len FROM keep WHERE doc_id <> keeper
),
census AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(len(tk)) AS BIGINT) AS tokens_total
  FROM tk GROUP BY source
),
cuts AS (
  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_modified,
    CAST(sum(span_len) AS BIGINT) AS tokens_removed
  FROM removed GROUP BY source
)
SELECT c.source, c.n_docs,
  CAST(coalesce(x.docs_modified, 0) AS BIGINT) AS docs_modified,
  c.tokens_total,
  CAST(coalesce(x.tokens_removed, 0) AS BIGINT) AS tokens_removed,
  CAST(c.tokens_total - coalesce(x.tokens_removed, 0) AS BIGINT)
    AS tokens_after,
  CAST((coalesce(x.tokens_removed, 0) * 1000000) // c.tokens_total
    AS BIGINT) AS removal_ppm
FROM census c LEFT JOIN cuts x USING (source)
ORDER BY c.source
""",
    doc="The surgical rewrite pass that CONSUMES doc_duplicate_spans "
    "(Lee et al. 2022 §4: remove repeated substrings, keep one "
    "occurrence): each maximal duplicated span is content-keyed by the "
    "md5 of its tokens, the minimum doc_id holding that content keeps "
    "it, and every other holder has the span's tokens stripped. "
    "Reported per source: docs modified, tokens before/after, exact "
    "integer removal ppm — the budget line a dedup stage hands the "
    "tokenizer. On the planted fixture the keeper is the lowest "
    "planted doc and every other plant loses exactly the passage. "
    "Scale: extends the span pipeline with ONE doc_id-keyed join back "
    "to the token arrays and a window over span fingerprints (span "
    "count is corpus-small); the corpus text itself still never "
    "shuffles.",
)
def doc_span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        "source",
        F.concat(
            F.when(
                F.col("doc_id") % 37 == 0, F.lit(_SPAN_HEAD + " ")
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 41 == 0, F.lit(" " + _SPAN_TAIL)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    tk = corpus.select(
        "doc_id", "source", F.split("text", " ").alias("tk")
    ).filter(F.size("tk") >= _SPAN_K)
    grams = tk.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(1), F.size("tk") - (_SPAN_K - 1))
        ).alias("i"),
        "tk",
    ).select(
        "doc_id",
        "source",
        "i",
        F.md5(
            F.array_join(F.slice("tk", F.col("i"), _SPAN_K), " ").cast(
                "binary"
            )
        ).alias("gfp"),
    )
    dupg = (
        grams.groupBy("gfp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gfp")
    )
    covered = (
        grams.join(dupg, "gfp")
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(_SPAN_K - 1))).alias("o"),
            "i",
        )
        .select("doc_id", "source", (F.col("i") + F.col("o")).alias("pos"))
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        covered.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "source", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            F.count(F.lit(1)).alias("span_len"),
        )
    )
    fspans = spans.join(tk.select("doc_id", "tk"), "doc_id").select(
        "doc_id",
        "source",
        "span_len",
        F.md5(
            F.array_join(
                F.slice("tk", F.col("span_start"), F.col("span_len")), " "
            ).cast("binary")
        ).alias("span_fp"),
    )
    wk = Window.partitionBy("span_fp")
    removed = (
        fspans.withColumn("keeper", F.min("doc_id").over(wk))
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("source", "doc_id", "span_len")
    )
    census = tk.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("tk")).cast("bigint").alias("tokens_total"),
    )
    cuts = removed.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("docs_modified"),
        F.sum("span_len").cast("bigint").alias("tokens_removed"),
    )
    return (
        census.join(cuts, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("docs_modified", F.lit(0))
            .cast("bigint")
            .alias("docs_modified"),
            "tokens_total",
            F.coalesce("tokens_removed", F.lit(0))
            .cast("bigint")
            .alias("tokens_removed"),
            (
                F.col("tokens_total") - F.coalesce("tokens_removed", F.lit(0))
            )
            .cast("bigint")
            .alias("tokens_after"),
            F.expr(
                "CAST((coalesce(tokens_removed, 0) * 1000000) DIV "
                "tokens_total AS BIGINT)"
            ).alias("removal_ppm"),
        )
        .orderBy("source")
    )
