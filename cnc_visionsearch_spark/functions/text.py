"""Text-analysis expressions ([EXT] SURVEY §2.7 F12, BASELINE north
star: language-ID, quality scoring, token counting, fingerprinting).

All pure Spark column expressions (codegen'd, no UDFs): at 100 TB the
text-quality pass is a full-corpus scan, so per-row work must stay
JVM-side. Every function has an exact SQL analog used by the DuckDB
oracles (see queries_text.py) — deterministic by construction
(integer counts, md5, per-row double arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "token_shingles",
    "shingles_from_tokens",
    "hex_to_long",
    "md5_fingerprint",
    "stopword_ratio",
    "quality_score",
    "training_filter_verdict",
    "lang_scores",
    "LANG_MARKERS",
    "STOPWORDS",
]

# Small English-ish stopword list matching the synthetic fixture vocab.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Characteristic marker tokens per language for the n-gram/keyword
# language-ID heuristic. Deterministic scoring: count marker hits.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("de5", "shi4", "zai4", "le5"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (fixture text is single-space separated)."""
    return F.split(_c(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles (space-joined) from a pre-split token array.

    SQL analog: list_transform(range(1, len(toks)-n+2), j -> ...).
    Docs with < n tokens produce an empty array (consistently excluded
    downstream on both engines).

    Callers should materialize the token array in its OWN projection
    (``df.select(split(text) AS toks)`` then shingle): higher-order
    lambdas are interpreted (no codegen/CSE), so referencing a
    ``split(text)`` expression here would re-split the document for
    every element_at. CollapseProject keeps the two projections apart
    because inlining would duplicate a non-cheap expression.
    """
    tk = _c(toks)
    count = F.size(tk) - (n - 1)
    # NB: sequence(1, 0) is DESCENDING [1,0] in Spark, not empty — guard
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    parts = lambda j: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tk, j + i) for i in range(n)]
    )
    return F.transform(idx, parts)


def token_shingles(text: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles straight from text. Prefer tokenizing in a
    separate projection + ``shingles_from_tokens`` on hot paths (see
    that docstring for why)."""
    return shingles_from_tokens(tokens(text), n)


def hex_to_long(hexstr: Column | str) -> Column:
    """Parse a <=15-digit hex string into BIGINT (portable across
    engines: DuckDB side uses ('0x'||s)::BIGINT)."""
    return F.conv(_c(hexstr), 16, 10).cast("bigint")


def md5_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-canonicalized lowercase
    text — the exact-dedup key at scale (hash once, group on 32 bytes
    instead of full documents)."""
    canon = F.lower(F.regexp_replace(_c(text), r"\s+", " "))
    return F.md5(canon.cast("binary"))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0,1] (LLM-pipeline filter).

    0.4 * capped length score + 0.3 * stopword presence + 0.3 * (1 -
    non-alpha ratio). Integer counts + one double combination per row —
    deterministic, exactly reproducible in the SQL oracle.
    """
    t = _c(text)
    n_tok = token_count(t).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(t)
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    n_chars = F.length(t).cast("double")
    non_alpha = F.length(F.regexp_replace(t, r"[a-z0-9 ]", "")).cast("double")
    clean_score = F.lit(1.0) - non_alpha / F.greatest(n_chars, F.lit(1.0))
    return (
        F.lit(0.4) * len_score + F.lit(0.3) * sw_score + F.lit(0.3) * clean_score
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-token hit counts per language (keyword language-ID)."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def training_filter_verdict(
    text: Column | str, min_tokens: int = 20, min_quality: float = 0.55
) -> Column:
    """First-failing-rule verdict for a training-data keep/drop filter
    (the composite pipeline stage: every rule is one of the F12 scalar
    heuristics above). Cascade: too_short -> non_english (zero stopword
    hits from the English marker set) -> low_quality -> kept. Pure
    codegen — one pass over the document, no UDFs."""
    t = _c(text)
    return (
        F.when(token_count(t) < min_tokens, F.lit("too_short"))
        .when(stopword_ratio(t) == 0.0, F.lit("non_english"))
        .when(quality_score(t) < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )


def kmv_hash(col, mod: int = 1073741824):
    """The deterministic unit hash the KMV cardinality sketch keys on
    (md5 -> first 8 hex -> BIGINT mod 2^30). ONE definition shared by
    the batch query (events_kmv_distinct) and the streaming sketch
    (streaming/stateful.py kmv_sketch_stream) — their merge-identity
    contract requires byte-equivalent hashing."""
    from pyspark.sql import functions as F

    return (
        hex_to_long(F.substring(F.md5(col.cast("string").cast("binary")), 1, 8))
        % mod
    )


def split_assignment(id_col, train_pct: int = 80, val_pct: int = 10):
    """The canonical deterministic train/val/test assignment (md5 of
    the id, 15 hex chars, mod 100; 80/10/10 by default) — ONE
    definition shared by doc_train_val_test_split and the split-leakage
    audit, so the audited split can never drift from the written one."""
    from pyspark.sql import functions as F

    bucket = (
        hex_to_long(F.substring(F.md5(_c(id_col).cast("string").cast("binary")), 1, 15))
        % 100
    )
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
