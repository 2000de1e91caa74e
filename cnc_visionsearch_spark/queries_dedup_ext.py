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


def _planted_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, tk) with the two fixture passages planted —
    shared by the span detector and the rewrite pass."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
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
        .select("doc_id", "source", F.split("text", " ").alias("tk"))
        .filter(F.size("tk") >= _SPAN_K)
    )


def _dup_spans(tk: DataFrame) -> DataFrame:
    """(doc_id, source, span_start, span_len) — maximal cross-document
    duplicated spans. Gram fingerprints shared by >= 2 docs mark the
    intervals [i, i+K-1]; merging touching/overlapping intervals per
    doc (running-max-end window — the interval form of
    gaps-and-islands, identical spans to a position-set merge without
    materializing K rows per gram) yields the maximal spans. The gram
    table feeds BOTH the duplicated-gram aggregate and the flag-back
    join, so it gets a lazy checkpoint barrier — without it Spark
    re-tokenizes and re-hashes the whole corpus for the second
    consumer (the same barrier discipline as the MinHash candidate
    table in operators/dedup.py)."""
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
    grams = grams.localCheckpoint(eager=False)
    dupg = (
        grams.groupBy("gfp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gfp")
    )
    flagged = grams.join(dupg, "gfp").select(
        "doc_id", "source", "i", (F.col("i") + _SPAN_K - 1).alias("endp")
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = flagged.withColumn("prev_end", F.max("endp").over(wprev))
    flagged = flagged.withColumn(
        "new_island",
        F.when(
            F.col("prev_end").isNull()
            | (F.col("i") > F.col("prev_end") + 1),
            1,
        ).otherwise(0),
    ).withColumn("gid", F.sum("new_island").over(wrun))
    return flagged.groupBy("doc_id", "source", "gid").agg(
        F.min("i").alias("span_start"),
        (F.max("endp") - F.min("i") + 1).alias("span_len"),
    )



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
    spans = _dup_spans(_planted_tokens(spark, sf_dir))
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
    tk = _planted_tokens(spark, sf_dir)
    spans = _dup_spans(tk)
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


# ------------------------------------------------- containment pairs

from cnc_visionsearch_spark.queries_dedup import (  # noqa: E402
    _MINHASH_16,
    ensure_minhash_built,
)


@register(
    "doc_containment_pairs",
    oracle=f"""
WITH {_MINHASH_16},
sigs AS (
  SELECT doc_id, list(h ORDER BY i) AS sig FROM hashes GROUP BY doc_id
),
bands AS (
  SELECT doc_id, bs.b AS band_id,
    sig[bs.b*4+1]::VARCHAR || ',' || sig[bs.b*4+2]::VARCHAR || ',' ||
    sig[bs.b*4+3]::VARCHAR || ',' || sig[bs.b*4+4]::VARCHAR AS band_sig
  FROM sigs, (SELECT unnest(range(4)) AS b) bs
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y USING (band_id, band_sig)
  WHERE x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT c.id_a, c.id_b,
    CAST(c.n_common AS BIGINT) AS n_common,
    c.n_common::DOUBLE / least(sa.n_sh, sb.n_sh)::DOUBLE AS containment,
    c.n_common::DOUBLE / (sa.n_sh + sb.n_sh - c.n_common)::DOUBLE AS jaccard
  FROM common c
  JOIN cand USING (id_a, id_b)
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, n_common, containment, jaccard
FROM scored WHERE containment >= 0.5
ORDER BY containment DESC, id_a ASC, id_b ASC
""",
    doc="CONTAINMENT near-dup pairs (Broder '97's other resemblance "
    "measure): |A∩B| / min(|A|,|B|) over the same LSH candidate set "
    "as the Jaccard pass — the detector for SUBSET duplication "
    "(a short doc quoted wholesale inside a long one), which "
    "symmetric Jaccard structurally under-scores (a 30-token quote "
    "in a 400-token doc has Jaccard ~0.08 but containment ~1.0). "
    "Candidates ride the SAME persisted banded-MinHash artifact as "
    "minhash_lsh_neardup_pairs (build-once, probe-cheap); exact "
    "shingle intersection verifies; both measures emitted so the "
    "gap between them is the quote-inclusion signal. Scale shape "
    "identical to the Jaccard pass: banded bucket join for "
    "candidates, broadcast-candidate verification, shingle shuffles "
    "keyed by md5.",
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    banded = spark.read.parquet(ensure_minhash_built(spark, sf_dir))
    pairs = minhash_lsh_pairs(
        d,
        num_hashes=16,
        bands=4,
        shingle_n=3,
        jaccard_threshold=0.0,
        banded=banded,
        with_containment=True,
    )
    return (
        pairs.filter(F.col("containment") >= 0.5)
        .select("id_a", "id_b", "n_common", "containment", "jaccard")
        .orderBy(
            F.col("containment").desc(),
            F.col("id_a").asc(),
            F.col("id_b").asc(),
        )
    )
