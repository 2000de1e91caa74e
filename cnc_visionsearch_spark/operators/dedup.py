"""Deduplication operators ([EXT] — BASELINE north star: exact dedup,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

Scale design notes (the point of each implementation):

* Exact dedup groups on a 16-byte md5 fingerprint, not the raw text —
  the shuffle moves 32 bytes/row instead of whole documents, and the
  keeper choice (min id) is deterministic (unlike dropDuplicates,
  whose survivor depends on partition order).

* MinHash+LSH is the canonical 100 TB near-dedup: shingle -> K min
  hashes -> band -> bucket-join. The only shuffles key on (band,
  band-signature); candidate pairs are verified with exact Jaccard so
  false positives cost nothing but compute. Hashing is md5-derived and
  portable (same bits in the DuckDB oracle).

* SimHash gives a 32-bit sketch per document; near-dups collide on
  sketch prefixes — here we emit the sketch itself (joinable on equal
  sketch or banded prefixes at scale).

* n-gram Jaccard is the exact verifier: explode distinct shingles,
  self-join on shingle (skew-prone on stopword-shingles — mitigated by
  shingle width), count co-occurrences, |A∩B|/(|A|+|B|-|A∩B|).

* Embedding near-dup: exact all-pairs cosine at test scale; the scale
  path is the LSH/ANN tier (operators/ann.py) which produces candidate
  buckets first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.functions.text import (
    hex_to_long,
    md5_fingerprint,
    token_shingles,
)
from cnc_visionsearch_spark.functions.vector import dot

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "embedding_similar_pairs",
]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via fingerprint group-by; keeper = min id.

    Returns (fingerprint, keeper_id, n_copies). Join back on keeper_id
    to materialize the deduplicated corpus.
    """
    return (
        df.select(
            F.col(id_col), md5_fingerprint(text_col).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_hash(seed_and_shingle):
    """Portable 60-bit hash: first 15 hex digits of md5."""
    return hex_to_long(F.substring(F.md5(seed_and_shingle.cast("binary")), 1, 15))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature.

    hash_i(s) = hex2long(md5(i || ':' || s)[0:15]) — one independent
    hash family member per seed i, min over the doc's distinct token
    shingles. Output: (id, hash_i BIGINT for i in 0..num_hashes-1) wide,
    via a single explode + group-by (one shuffle keyed on id).
    Documents with < shingle_n tokens have no shingles and are omitted.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(token_shingles(text_col, shingle_n))).alias(
            "shingle"
        ),
    )
    aggs = [
        F.min(
            _shingle_hash(F.concat(F.lit(f"{i}:"), F.col("shingle")))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.3,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact verification.

    Candidate generation: split the signature into `bands` bands of
    num_hashes/bands values; docs sharing any (band_id, band_signature)
    bucket are candidates. Verification: exact token-shingle Jaccard
    >= threshold. Returns (id_a, id_b, jaccard), id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.concat_ws(
            ",",
            *[
                F.col(f"h{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    # explode to (id, band_id, band_sig); bucket-join on the band key
    stacked = banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_sig")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bd"),
    ).select(id_col, "bd.band_id", "bd.band_sig")
    left = stacked.select(
        F.col(id_col).alias("id_a"), "band_id", "band_sig"
    )
    right = stacked.select(
        F.col(id_col).alias("id_b"), "band_id", "band_sig"
    )
    candidates = (
        left.join(right, ["band_id", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = ngram_jaccard_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        threshold=jaccard_threshold,
        candidates=candidates,
    )
    return verified


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash sketch over distinct tokens.

    Each token contributes ±1 per bit position (from its md5-derived
    32-bit hash); the sketch sets bit b iff the signed sum is > 0.
    Returns (id, simhash BIGINT, n_tokens). One explode (tokens x bits)
    + two aggregations, both keyed on id — no cross-doc shuffle.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("token"),
    )
    h = hex_to_long(F.substring(F.md5(F.col("token").cast("binary")), 1, 8))
    with_bits = toks.select(
        F.col(id_col),
        h.alias("th"),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    ).select(
        id_col,
        "b",
        # shiftright/shiftleft need expr form for a column shift amount
        F.when(F.expr("shiftright(th, b) & 1") == 1, 1).otherwise(-1).alias("w"),
    )
    per_bit = with_bits.groupBy(id_col, "b").agg(F.sum("w").alias("s"))
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), b)"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.1,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity pairs >= threshold.

    Explode distinct shingles -> self-equi-join on shingle -> count
    common -> Jaccard. When `candidates` (id_a, id_b) is given, only
    those pairs are scored (the LSH-verified path); otherwise all
    co-shingled pairs are scored (exact mode — quadratic in the worst
    case, use only with blocking or small corpora).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(token_shingles(text_col, shingle_n))).alias(
            "shingle"
        ),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_similar_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "nvec",
    top_n: int = 10,
) -> DataFrame:
    """Top-N most-similar embedding pairs by cosine (exact all-pairs).

    Test-scale exact tier; at 100 TB use operators/ann.py LSH buckets to
    generate candidates, then this same scoring join per bucket.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot("va", "vb").alias("cosine"))
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc())
    return (
        pairs.orderBy(F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(top_n)
    )
