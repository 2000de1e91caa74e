"""Inverted text index: build-once postings layout + pruned phrase
probes — the lexical twin of the ANN tiers' "derived layout, probed by
partition pruning" design (SURVEY §4).

Layout: ``{path}/postings`` with one row per (term, doc) —
``(term, doc_id, tf, positions)`` where positions are the 1-based
whitespace-token offsets — PARTITIONED BY ``bucket`` = the portable
31-bit md5 hash of the term (operators/dedup._base_hash, the same hash
family the MinHash tier uses) mod ``n_buckets``. A query touches only
its terms' buckets: term lookup is partition pruning, and at 100 TB a
phrase query reads |terms|/n_buckets of the postings instead of
scanning the corpus. Positions in the row make phrase adjacency a
per-row array intersection — no second corpus pass, no shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.dedup import _MERSENNE31, _base_hash

__all__ = [
    "inverted_build",
    "inverted_append",
    "term_bucket",
    "phrase_probe",
]


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of the layout's bucket hash (md5[:8] mod
    2^31-1 mod n_buckets) — lets a probe prune partitions without a
    cluster job, exactly like ivf_probe_cells ranks cells."""
    h = int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % _MERSENNE31
    return h % n_buckets


def inverted_build(
    docs: DataFrame, path: str, n_buckets: int = 16
) -> None:
    """Materialize the postings layout: posexplode the whitespace
    tokens (the corpus tokenization convention shared with every text
    oracle), aggregate per (term, doc) into tf + sorted positions, and
    write partitioned by the term's hash bucket. One shuffle, keyed on
    (term, doc_id) — the shuffle carries positions, never text."""
    _postings(docs, n_buckets).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")


def _postings(docs: DataFrame, n_buckets: int) -> DataFrame:
    sp = F.split("text", " ")
    return (
        docs.select("doc_id", F.posexplode(sp).alias("pos0", "term"))
        .withColumn("pos", F.col("pos0") + 1)
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        .withColumn("bucket", _base_hash(F.col("term")) % F.lit(n_buckets))
    )


def inverted_append(
    docs: DataFrame, path: str, n_buckets: int = 16
) -> None:
    """Append a document batch's postings into an existing layout —
    the maintenance twin of :func:`inverted_build` (same shape as
    ivf_append for the vector tiers): postings are per-document facts,
    so a batch append equals a full rebuild over the union, existing
    files stay byte-identical, and probes see the new documents at the
    same pruned cost. O(batch), never a corpus rescan."""
    _postings(docs, n_buckets).write.mode("append").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")


def phrase_probe(
    spark, path: str, first: str, second: str, n_buckets: int = 16
) -> DataFrame:
    """Adjacent-bigram phrase query over the postings layout: read ONLY
    the two terms' buckets (partition pruning, driver-side
    :func:`term_bucket`), join the two postings rows per doc, and count
    adjacency as |positions(first)+1 ∩ positions(second)| — per-row
    array arithmetic on metadata-sized rows. Returns
    (doc_id, n_occurrences > 0)."""
    buckets = sorted({term_bucket(first, n_buckets), term_bucket(second, n_buckets)})
    posts = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(buckets)
    )
    a = posts.filter(F.col("term") == first).select(
        "doc_id", F.col("positions").alias("pa")
    )
    b = posts.filter(F.col("term") == second).select(
        "doc_id", F.col("positions").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            F.size(
                F.array_intersect(
                    F.transform("pa", lambda p: p + 1), F.col("pb")
                )
            )
            .cast("bigint")
            .alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 0)
    )
