"""Text-analysis queries over `documents` ([EXT]: language-ID, quality
scoring, token counting, fingerprinting — the LLM-training-pipeline
text pass). Every query is a single full scan with codegen'd per-row
expressions + a hash aggregate: the shape that scales linearly to
100 TB with zero shuffle beyond the final group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    md5_fingerprint,
    quality_score,
    token_count,
    tokens,
)
from cnc_visionsearch_spark.functions.text import hex_to_long
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "doc_stats_by_lang_source",
    oracle=f"""
SELECT lang, source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  CAST(min(n_chars) AS BIGINT) AS min_chars,
  CAST(max(n_chars) AS BIGINT) AS max_chars,
  CAST(SUM(CASE WHEN n_chars = len(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok
FROM documents
GROUP BY lang, source
""",
    doc="A3/F12: corpus stats by (lang, source) incl. the n_chars==length "
    "invariant check. Integer aggregates — exact.",
)
def doc_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(token_count("text")).alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(
            F.when(F.col("n_chars") == F.length("text"), 1).otherwise(0)
        ).alias("n_len_ok"),
    )


@register(
    "doc_token_histogram",
    oracle="""
SELECT CAST(len(string_split(text, ' ')) // 10 AS BIGINT) AS token_bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(doc_id) AS BIGINT) AS sample_doc
FROM documents
GROUP BY 1
""",
    doc="Token-count distribution (bucketed by 10s) — the length-filter "
    "histogram every data pipeline runs first.",
)
def doc_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("token_bucket", (token_count("text") / 10).cast("bigint"))
        .groupBy("token_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("sample_doc"),
        )
    )


@register(
    "doc_quality_scores",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
    len(string_split(text, ' ')) AS n_tok,
    len(list_filter(string_split(text, ' '), t -> t IN ({_SW}))) AS sw_hits,
    length(text) AS n_chars,
    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS non_alpha
  FROM documents
),
q AS (
  SELECT doc_id, lang,
    0.4 * least(n_tok / 100.0, 1.0)
    + 0.3 * least((sw_hits::DOUBLE / n_tok::DOUBLE) * 4.0, 1.0)
    + 0.3 * (1.0 - non_alpha::DOUBLE / greatest(n_chars::DOUBLE, 1.0)) AS quality
  FROM scored
)
SELECT doc_id, lang, quality FROM q WHERE doc_id < 100
""",
    doc="F12 quality scoring: length/stopword/cleanliness heuristic in "
    "[0,1], pure codegen. Per-row doubles — deterministic.",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 100)
        .select("doc_id", "lang", quality_score("text").alias("quality"))
    )


@register(
    "doc_lang_id_confusion",
    oracle=f"""
WITH scores AS (
  SELECT doc_id, lang,
    {", ".join(
        f"len(list_filter(string_split(text, ' '), t -> t IN "
        f"({', '.join(repr(m) for m in markers)}))) AS hits_{lang}"
        for lang, markers in LANG_MARKERS.items()
    )}
  FROM documents
),
pred AS (
  SELECT doc_id, lang,
    CASE
      WHEN hits_es > hits_en AND hits_es >= hits_fr AND hits_es >= hits_de AND hits_es >= hits_zh THEN 'es'
      WHEN hits_fr > hits_en AND hits_fr >= hits_de AND hits_fr >= hits_zh THEN 'fr'
      WHEN hits_de > hits_en AND hits_de >= hits_zh THEN 'de'
      WHEN hits_zh > hits_en THEN 'zh'
      WHEN hits_en > 0 THEN 'en'
      ELSE 'unknown'
    END AS predicted
  FROM scores
)
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY lang, predicted
""",
    doc="F12 language-ID: marker-token scoring with a fixed precedence "
    "cascade; output is the lang x predicted confusion matrix.",
)
def doc_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.functions.text import lang_scores

    d = load_table(spark, sf_dir, "documents")
    s = lang_scores("text")
    predicted = (
        F.when(
            (s["es"] > s["en"]) & (s["es"] >= s["fr"]) & (s["es"] >= s["de"]) & (s["es"] >= s["zh"]),
            "es",
        )
        .when((s["fr"] > s["en"]) & (s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), "fr")
        .when((s["de"] > s["en"]) & (s["de"] >= s["zh"]), "de")
        .when(s["zh"] > s["en"], "zh")
        .when(s["en"] > 0, "en")
        .otherwise("unknown")
    )
    return (
        d.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "doc_bpe_token_stats",
    oracle="""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS DOUBLE)
    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS tokens_per_word
FROM documents WHERE doc_id < 100
""",
    doc="F12 token counting, BPE-ish tier: subword-style regex pieces "
    "(alnum runs + individual punctuation) vs whitespace words — the "
    "token-budget estimator an LLM-data pipeline runs corpus-wide.",
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ws = token_count("text")
    bpe = F.size(
        F.regexp_extract_all("text", F.lit("[a-z0-9]+|[^a-z0-9 ]"), F.lit(0))
    ).cast("bigint")
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (bpe.cast("double") / ws.cast("double")).alias("tokens_per_word"),
    )


@register(
    "doc_fingerprints",
    oracle="""
SELECT doc_id,
  md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
FROM documents WHERE doc_id < 50
""",
    doc="Document fingerprinting: md5 over canonicalized text — the "
    "constant-size exact-dedup key.",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id", md5_fingerprint("text").alias("fingerprint")
    )


@register(
    "doc_minhash_fingerprint",
    oracle="""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split(text, ' ')) - 4, 0) + 1),
    j -> string_split(text, ' ')[j] || ' ' || string_split(text, ' ')[j+1] || ' ' ||
         string_split(text, ' ')[j+2] || ' ' || string_split(text, ' ')[j+3] || ' ' ||
         string_split(text, ' ')[j+4]))) AS shingle
  FROM documents
)
SELECT doc_id,
  CAST(min(('0x' || substr(md5(shingle), 1, 15))::BIGINT) AS BIGINT) AS min_shingle_hash,
  CAST(count(DISTINCT shingle) AS BIGINT) AS n_shingles
FROM sh GROUP BY doc_id
""",
    doc="Rolling-shingle fingerprint: min md5-hash over distinct token "
    "5-grams (winnowing-style document sketch; portable hex->int hashing).",
)
def doc_minhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.dedup import _exploded_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = _exploded_shingles(d, "doc_id", "text", 5)
    return sh.groupBy("doc_id").agg(
        F.min(hex_to_long(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15)))
        .alias("min_shingle_hash"),
        F.countDistinct("shingle").alias("n_shingles"),
    )


@register(
    "doc_training_filter_funnel",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, n_chars,
    len(string_split(text, ' ')) AS n_tok,
    len(list_filter(string_split(text, ' '), t -> t IN ({_SW}))) AS sw_hits,
    length(text) AS t_chars,
    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS non_alpha
  FROM documents
),
verdicts AS (
  SELECT doc_id, n_chars,
    CASE
      WHEN n_tok < 20 THEN 'too_short'
      WHEN sw_hits = 0 THEN 'non_english'
      WHEN 0.4 * least(n_tok / 100.0, 1.0)
         + 0.3 * least((sw_hits::DOUBLE / n_tok::DOUBLE) * 4.0, 1.0)
         + 0.3 * (1.0 - non_alpha::DOUBLE / greatest(t_chars::DOUBLE, 1.0))
           < 0.55 THEN 'low_quality'
      ELSE 'kept'
    END AS verdict
  FROM scored
)
SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM verdicts GROUP BY verdict
""",
    doc="The composite training-data filter stage (F12 end-to-end): "
    "first-failing-rule verdict per document (too_short -> non_english "
    "-> low_quality -> kept) with per-verdict doc and char totals — the "
    "numbers a pipeline operator reports before writing the kept split. "
    "All rules are codegen scalar heuristics evaluated in ONE scan; the "
    "only shuffle carries (verdict, partial count, partial sum) — 4 "
    "groups regardless of corpus size. At 100 TB this is the cheapest "
    "possible shape: no UDF, no second pass, no wide rows on the wire.",
)
def doc_training_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.functions.text import training_filter_verdict

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            training_filter_verdict("text").alias("verdict"),
            F.col("n_chars"),
        )
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "doc_top_terms_by_lift",
    oracle="""
WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY lang, tok),
dfreq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY tok),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.lang, tf.tok, tf.tf, dfreq.df,
    CAST(tf.tf AS DOUBLE) * CAST(total.n_docs AS DOUBLE)
      / CAST(dfreq.df AS DOUBLE) AS lift
  FROM tf JOIN dfreq USING (tok), total
),
ranked AS (
  SELECT lang, tok, tf, df, lift,
    CAST(row_number() OVER (PARTITION BY lang ORDER BY lift DESC, tok ASC) AS INT) AS rn
  FROM scored
)
SELECT lang, tok, tf, df, lift, rn FROM ranked WHERE rn <= 5
""",
    doc="TF-IDF-family top terms per language: term frequency x corpus "
    "lift (tf * N / df — an exact integer-ratio double instead of the "
    "classic log-idf, because ln() is libm-dependent and would break "
    "the cross-engine hash gate; the RANKING is order-equivalent to "
    "tf-idf for df < N). One explode feeds both aggregates — tf keyed "
    "on (lang, token), df on token — then a broadcast-sized join of "
    "two token-cardinality tables and a WindowGroupLimit top-5. At "
    "100 TB the explode is the dominant cost and is the same shuffle "
    "spread as the MinHash shingle path (see SCALE.md dedup notes).",
)
def doc_top_terms_by_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tf = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lang",
            "tok",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.col("n_docs").cast("double")
                / F.col("df").cast("double")
            ).alias("lift"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("lift").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 5)
    )


@register(
    "doc_train_val_test_split",
    oracle="""
WITH assigned AS (
  SELECT lang,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
  lang, CAST(count(*) AS BIGINT) AS n_docs
FROM assigned GROUP BY split, lang
""",
    doc="Deterministic train/val/test split (80/10/10) by consistent "
    "hashing of the document id: the same document lands in the same "
    "split on every run, every engine, and every corpus size — no "
    "seeded RNG whose stream depends on partitioning (rand(seed) is "
    "per-partition in Spark and not portable to the oracle). The "
    "assignment is a pure projection; downstream writers filter on it "
    "(one scan per split, or one pass with partitionBy('split')). "
    "Adding documents never reassigns existing ones — the property that "
    "keeps eval sets stable across corpus refreshes at 100 TB.",
)
def doc_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.functions.text import split_assignment

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(split_assignment("doc_id").alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ----------------------------------------------- unigram LM surprisal


@register(
    "doc_unigram_surprisal",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY term),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
scored AS (
  SELECT t.doc_id,
    CAST(length(bin(total.n_total // tf.n)) - 1 AS BIGINT) AS bits
  FROM toks t JOIN tf USING (term), total
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(bits) AS BIGINT) AS total_bits,
  CAST(sum(bits) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bits_per_token
FROM scored GROUP BY doc_id
""",
    doc="Unigram language-model surprisal scoring — the "
    "perplexity-proxy quality signal pre-training pipelines use to "
    "rank documents (rare-token-heavy docs score high, boilerplate "
    "scores low). Per-token surprisal = floor(log2(N/tf)) computed "
    "EXACTLY in integers as length(bin(N div tf)) - 1 (both engines' "
    "bin() of a BIGINT) — whole-bit Shannon information with zero "
    "libm dependence, same doctrine as the BM25 probabilistic-idf "
    "(ln() rounds differently per engine and would break the hash "
    "gate). At 100 TB: the term-frequency model is a vocabulary-sized "
    "table (broadcast after a map-side-combined term count); the "
    "scoring join shuffles (doc_id, term) pairs only; the doc "
    "aggregate is keyed on doc_id.",
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        toks.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (
                F.length(F.bin(F.expr("n_total div n"))) - 1
            ).cast("bigint").alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("bits").alias("total_bits"),
        (
            F.sum("bits").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("bits_per_token"),
    )


@register(
    "doc_surprisal_stratified_sample",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY term),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
scored AS (
  SELECT t.doc_id,
    CAST(length(bin(total.n_total // tf.n)) - 1 AS BIGINT) AS bits
  FROM toks t JOIN tf USING (term), total
),
docs AS (
  SELECT doc_id,
    CAST(sum(bits) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bpt
  FROM scored GROUP BY doc_id
),
cuts AS (
  SELECT quantile_cont(bpt, 0.25) AS q1, quantile_cont(bpt, 0.5) AS q2,
    quantile_cont(bpt, 0.75) AS q3
  FROM docs
),
tagged AS (
  SELECT d.doc_id, d.bpt,
    CASE WHEN d.bpt < c.q1 THEN 1 WHEN d.bpt < c.q2 THEN 2
         WHEN d.bpt < c.q3 THEN 3 ELSE 4 END AS quartile,
    CASE WHEN d.bpt < c.q1 THEN 100 WHEN d.bpt < c.q2 THEN 250
         WHEN d.bpt < c.q3 THEN 500 ELSE 1000 END AS keep_permille,
    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS draw
  FROM docs d, cuts c
)
SELECT quartile, CAST(count(*) AS BIGINT) AS n_total,
  CAST(SUM(CASE WHEN draw < keep_permille THEN 1 ELSE 0 END) AS BIGINT)
    AS n_kept,
  min(bpt) AS min_bpt, max(bpt) AS max_bpt
FROM tagged GROUP BY quartile
""",
    doc="Quality-aware curriculum sampling: documents bucketed into "
    "surprisal quartiles (the unigram-LM bits-per-token quality "
    "signal), each quartile sampled at its own rate — 10%% for the "
    "most-predictable boilerplate quartile up to 100%% for the "
    "rarest-token quartile — with the same deterministic doc-id hash "
    "draw as every sampler here (reproducible across runs and "
    "backfills). This composes three oracled operators (surprisal "
    "scoring, exact quantile cuts, hash sampling) into the actual "
    "quality-weighted corpus pass; quartile boundaries come from two "
    "scalar quantile aggregates broadcast back, so the scoring scan "
    "runs once and nothing but (doc_id, term) pairs ever shuffle.",
)
def doc_surprisal_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    docs = (
        toks.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("n_total div n"))) - 1)
            .cast("bigint")
            .alias("bits"),
        )
        .groupBy("doc_id")
        .agg(
            (F.sum("bits").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "bpt"
            )
        )
    )
    cuts = docs.agg(
        F.percentile("bpt", F.lit(0.25)).alias("q1"),
        F.percentile("bpt", F.lit(0.5)).alias("q2"),
        F.percentile("bpt", F.lit(0.75)).alias("q3"),
    )
    quartile = (
        F.when(F.col("bpt") < F.col("q1"), 1)
        .when(F.col("bpt") < F.col("q2"), 2)
        .when(F.col("bpt") < F.col("q3"), 3)
        .otherwise(4)
    )
    keep = (
        F.when(F.col("bpt") < F.col("q1"), 100)
        .when(F.col("bpt") < F.col("q2"), 250)
        .when(F.col("bpt") < F.col("q3"), 500)
        .otherwise(1000)
    )
    draw = (
        hex_to_long(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8)
        )
        % 1000
    )
    tagged = docs.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "bpt",
        quartile.alias("quartile"),
        keep.alias("keep_permille"),
        draw.alias("draw"),
    )
    return tagged.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("draw") < F.col("keep_permille")).cast("int"))
        .cast("bigint")
        .alias("n_kept"),
        F.min("bpt").alias("min_bpt"),
        F.max("bpt").alias("max_bpt"),
    )


# ---------------------------------------- bigram LM surprisal (backoff)


@register(
    "doc_bigram_surprisal",
    oracle="""
WITH sp AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
idx AS (SELECT doc_id, unnest(range(1, len(s) + 1)) AS j FROM sp),
pairs AS (
  SELECT idx.doc_id, idx.j, sp.s[idx.j] AS cur,
    CASE WHEN idx.j > 1 THEN sp.s[idx.j - 1] END AS prev
  FROM idx JOIN sp USING (doc_id)
),
big AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2
  FROM pairs WHERE prev IS NOT NULL GROUP BY prev, cur
),
ctx AS (
  SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1 FROM big GROUP BY prev
),
uni AS (SELECT cur AS term, CAST(count(*) AS BIGINT) AS tf
        FROM pairs GROUP BY cur),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM pairs),
scored AS (
  SELECT p.doc_id,
    CASE WHEN p.prev IS NULL
      THEN CAST(length(bin(tot.n_total // u.tf)) - 1 AS BIGINT)
      ELSE CAST(length(bin(ctx.c1 // big.c2)) - 1 AS BIGINT)
    END AS bits
  FROM pairs p
  LEFT JOIN big ON big.prev = p.prev AND big.cur = p.cur
  LEFT JOIN ctx ON ctx.prev = p.prev
  JOIN uni u ON u.term = p.cur, tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(bits) AS BIGINT) AS total_bits,
  CAST(sum(bits) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bits_per_token
FROM scored GROUP BY doc_id
""",
    doc="Bigram language-model surprisal — doc_unigram_surprisal with "
    "one token of conditioning: per-token bits = "
    "floor(log2(c(prev) / c(prev, cur))) computed EXACTLY in integers "
    "(length(bin(n div m)) - 1, the established libm-free idiom); a "
    "document's first token backs off to the unigram model. "
    "Conditioning tightens the model, so scores drop vs the unigram "
    "tier on natural text and spike on incoherent token salads — the "
    "stronger perplexity-proxy quality filter. At 100 TB the bigram "
    "table is vocab^2-bounded in theory but Zipf-sparse in practice "
    "(broadcast after a map-side-combined count; fall back to a "
    "doc-keyed shuffle join if a corpus outgrows the broadcast "
    "budget); scoring is one explode + two joins + a doc_id "
    "aggregate.",
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "cur")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("cur").over(w))
    big = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    ctx = big.groupBy("prev").agg(F.sum("c2").alias("c1"))
    uni = pairs.groupBy(F.col("cur").alias("term")).agg(
        F.count(F.lit(1)).alias("tf")
    )
    tot = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        pairs.join(F.broadcast(big), ["prev", "cur"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .join(F.broadcast(uni), pairs.cur == F.col("term"))
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(
                F.col("prev").isNull(),
                F.length(F.bin(F.expr("n_total div tf"))) - 1,
            )
            .otherwise(F.length(F.bin(F.expr("c1 div c2"))) - 1)
            .cast("bigint")
            .alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("bits").cast("bigint").alias("total_bits"),
        (
            F.sum("bits").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("bits_per_token"),
    )


# ------------------------------------------- term association (lift/PMI)

_ASSOC_MIN_DF = 50


@register(
    "term_cooccurrence_lift",
    oracle=f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
  FROM documents
),
n_docs AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_t FROM dt GROUP BY term
  HAVING count(*) >= {_ASSOC_MIN_DF}
),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
    CAST(count(*) AS BIGINT) AS n_ab
  FROM dt a JOIN dt b
    ON a.doc_id = b.doc_id AND a.term < b.term
  WHERE a.term IN (SELECT term FROM df)
    AND b.term IN (SELECT term FROM df)
  GROUP BY 1, 2
)
SELECT p.term_a, p.term_b, p.n_ab, da.n_t AS df_a, db.n_t AS df_b,
  ((CAST(p.n_ab AS DOUBLE) * CAST(n_docs.n AS DOUBLE))
    / (CAST(da.n_t AS DOUBLE) * CAST(db.n_t AS DOUBLE))) AS lift
FROM pairs p
JOIN df da ON da.term = p.term_a
JOIN df db ON db.term = p.term_b, n_docs
ORDER BY lift DESC, p.term_a ASC, p.term_b ASC
LIMIT 20
""",
    doc="Term-association mining: document-level co-occurrence lift "
    "P(a,b)/(P(a)P(b)) — exp(PMI), the same rational no-log form as "
    "every idf/lift here — for term pairs above a df floor of "
    f"{_ASSOC_MIN_DF} docs, top 20. The text twin of "
    "part_association_rules: per-doc distinct-term sets expand to "
    "pairs IN-ROW (the _bucket_pairs basket shape — no dt self-join "
    "in the Spark plan; the oracle's self-join is the quadratic "
    "formulation), df floors bound the eligible vocabulary before "
    "expansion, and the (term_a, term_b) count shuffle carries only "
    "string pairs. Feeds phrase-lexicon induction and query "
    "suggestion at corpus scale.",
)
def term_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.dedup import _bucket_pairs

    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id",
        F.explode(F.array_distinct(tokens("text"))).alias("term"),
    )
    n_docs = dt.agg(
        F.count_distinct("doc_id").cast("bigint").alias("n")
    )
    df = (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
        .filter(F.col("n_t") >= _ASSOC_MIN_DF)
    )
    eligible = dt.join(F.broadcast(df.select("term")), "term")
    baskets = eligible.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("term")).alias("members")
    ).filter(F.size("members") >= 2)
    pairs = (
        _bucket_pairs(baskets, "named_struct('term_a', x, 'term_b', y)")
        .groupBy(
            F.col("p.term_a").alias("term_a"),
            F.col("p.term_b").alias("term_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    da = df.select(F.col("term").alias("term_a"), F.col("n_t").alias("df_a"))
    db = df.select(F.col("term").alias("term_b"), F.col("n_t").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_ab",
            "df_a",
            "df_b",
            (
                (F.col("n_ab").cast("double") * F.col("n").cast("double"))
                / (F.col("df_a").cast("double") * F.col("df_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("term_a").asc(), F.col("term_b").asc())
        .limit(20)
    )


# ------------------------------------------------- corpus-hapax audit

@register(
    "doc_hapax_share_by_source",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY term
),
per_src AS (
  SELECT tok.source,
    CAST(count(*) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN tf.tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_hapax_tokens
  FROM tok JOIN tf USING (term)
  GROUP BY tok.source
)
SELECT source, n_tokens, n_hapax_tokens,
  (n_hapax_tokens * 1000000) // n_tokens AS hapax_ppm
FROM per_src
""",
    doc="Corpus-hapax share per source: what fraction of each "
    "source's tokens are corpus-wide hapax legomena (terms occurring "
    "exactly once anywhere) — the classic OCR-garbage / "
    "mojibake / random-suffix detector (noisy extraction mints "
    "unique junk tokens, so a source whose hapax share is an outlier "
    "vs its peers needs a cleaning pass before it poisons the "
    "vocabulary; complements doc_zipf_slope's head-of-distribution "
    "view with the tail). Two shuffles: the corpus term-frequency "
    "table (vocabulary-scale — at 100 TB the tf<=1 slice still "
    "shuffles only (term, tf) pairs), then a term-keyed join back "
    "and a |sources|-row aggregate; integer-exact ppm.",
)
def doc_hapax_share_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    per_src = (
        tok.join(tf, "term")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("tf") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax_tokens"),
        )
    )
    return per_src.select(
        "source",
        "n_tokens",
        "n_hapax_tokens",
        F.expr("(n_hapax_tokens * 1000000) div n_tokens")
        .cast("bigint")
        .alias("hapax_ppm"),
    )


# ------------------------------------------- data-driven stopword list


@register(
    "doc_stopword_discovery",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
n_docs AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
n_toks AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM toks),
stats AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
    CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY term
),
ranked AS (
  SELECT term, df, tf,
    (df * 1000000) // nd AS df_ppm,
    (tf * 1000000) // nt AS token_share_ppm,
    CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS BIGINT) AS r,
    (CAST(SUM(tf) OVER (ORDER BY df DESC, term ASC
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       * 1000000) // nt AS cum_token_share_ppm
  FROM stats, n_docs, n_toks
)
SELECT term, df, tf, df_ppm, token_share_ppm, cum_token_share_ppm
FROM ranked WHERE r <= 20
ORDER BY df DESC, term ASC
""",
    doc="Data-driven stopword discovery: the 20 highest-document-"
    "frequency terms with their df share, token share, and the "
    "CUMULATIVE token share down the ranking (exact integer ppm) — "
    "the evidence for how much of the postings mass a stopword list "
    "of size k removes. This is the list the MaxScore non-essential "
    "split effectively re-derives per query and the static-pruning "
    "sweep cuts per term; discovering it from the corpus (not a "
    "hardcoded English list) is the language-agnostic choice "
    "(doc_lang_id_confusion shows this corpus is multilingual). "
    "Plan: one explode -> (term) aggregate carrying (df, tf); top-20 "
    "selection is a TakeOrderedAndProject (operators/rank."
    "global_topn — per-partition heaps, never a global sort of the "
    "vocabulary), and the cumulative-coverage window runs over the "
    "20 survivors only.",
)
def doc_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    stats = toks.groupBy("term").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df"),
        F.count(F.lit(1)).cast("bigint").alias("tf"),
    )
    n_toks = stats.agg(F.sum("tf").cast("bigint").alias("nt"))
    # top-20 by df via TakeOrderedAndProject (operators/rank.global_topn)
    # FIRST, so the ranking window and the cumulative-coverage window
    # both run over <= 20 survivor rows (bounded by construction), never
    # the vocabulary-sized stats table — cum token share down rank r
    # only needs tf of ranks 1..r, all inside the top-20
    from cnc_visionsearch_spark.operators.rank import global_topn

    order = [F.col("df").desc(), F.col("term").asc()]
    top = global_topn(stats, order, 20)
    cum = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(n_toks))
        .withColumn("cumtf", F.sum("tf").over(cum).cast("bigint"))
        .select(
            "term",
            "df",
            "tf",
            F.expr("(df * 1000000) div nd").cast("bigint").alias("df_ppm"),
            F.expr("(tf * 1000000) div nt")
            .cast("bigint")
            .alias("token_share_ppm"),
            F.expr("(cumtf * 1000000) div nt")
            .cast("bigint")
            .alias("cum_token_share_ppm"),
        )
        .orderBy(F.col("df").desc(), F.col("term").asc())
    )
