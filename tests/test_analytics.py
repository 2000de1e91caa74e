"""Property tests for queries_analytics: each operator's defining
invariant checked against a brute-force formulation at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnc_visionsearch_spark.queries_analytics import (
    _SESSION_MIN,
    events_heavy_hitters_cms,
    events_max_concurrency,
    orders_incremental_daily_agg,
    part_skyline_price_size,
)
from cnc_visionsearch_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_skyline_matches_naive_not_exists(spark):
    """The grouped/prefix-min formulation must equal the O(n^2) NOT
    EXISTS definition of the skyline."""
    part = load_table(spark, SF, "part")
    got = {
        r.p_partkey for r in part_skyline_price_size(spark, SF).collect()
    }
    a, b = part.alias("a"), part.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
            & (F.col("b.p_size") <= F.col("a.p_size"))
            & (
                (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
                | (F.col("b.p_size") < F.col("a.p_size"))
            ),
            "left_semi",
        )
        .select("a.p_partkey")
        .collect()
    )
    naive = {r.p_partkey for r in part.select("p_partkey").collect()} - {
        r.p_partkey for r in dominated
    }
    assert got == naive and got


def test_cms_estimate_never_undercounts(spark):
    """Count-min guarantee: est >= true for every reported key."""
    rows = events_heavy_hitters_cms(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.est_count >= r.true_count


def test_max_concurrency_peak_is_attained(spark):
    """At first_peak_at, the number of open intervals (ts <= t <
    ts + 5min) must equal the reported peak — the sweep's cumulative
    sum is a real attained concurrency, not an artifact of ordering."""
    ev = load_table(spark, SF, "events")
    for r in events_max_concurrency(spark, SF).collect():
        open_now = ev.filter(
            (F.col("event_type") == r.event_type)
            & (F.col("ts") <= F.lit(r.first_peak_at))
            & (
                F.col("ts") + F.expr(f"INTERVAL {_SESSION_MIN} MINUTES")
                > F.lit(r.first_peak_at)
            )
        ).count()
        assert open_now == r.peak_concurrency, r


def test_phrase_probe_prunes_buckets_and_matches_rescan(spark):
    """The inverted-layout phrase probe must (a) surface the bucket
    filter as a PartitionFilter on the postings scan and (b) agree
    with a from-scratch corpus rescan for an arbitrary other phrase."""
    from cnc_visionsearch_spark.operators.text_index import phrase_probe
    from cnc_visionsearch_spark.plans import formatted_plan
    from cnc_visionsearch_spark.queries_analytics import (
        _INV_BUCKETS,
        ensure_inverted_built,
    )

    path = ensure_inverted_built(spark, SF)
    probe = phrase_probe(spark, path, "slow", "fast", n_buckets=_INV_BUCKETS)
    # mode-aware pruning evidence (tests/test_plans._assert_bucket_pruned
    # doctrine): on the transactional layout the proof is the scan's
    # ACTUAL file set — only the two terms' _tb= domain files enter;
    # on a legacy layout it is the hive PartitionFilters line
    from cnc_visionsearch_spark.operators.text_index import term_bucket

    files = probe.inputFiles()
    tb = sorted(
        {int(f.split("_tb=")[1].split("/")[0]) for f in files if "_tb=" in f}
    )
    if tb:
        want = {
            term_bucket(t, _INV_BUCKETS) for t in ("slow", "fast")
        }
        assert set(tb) <= want, (tb, want)
    else:
        pf = [
            ln
            for ln in formatted_plan(probe).splitlines()
            if "PartitionFilters" in ln
        ]
        assert pf and any("bucket" in ln and "IN (" in ln for ln in pf)

    docs = load_table(spark, SF, "documents")
    sp = F.split("text", " ")
    rescan = {
        (r.doc_id, r.n)
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.size(sp) - 1),
                        lambda j: (F.element_at(sp, j) == "slow")
                        & (F.element_at(sp, j + 1) == "fast"),
                    ),
                    lambda x: x,
                )
            ).alias("n"),
        )
        .filter(F.col("n") > 0)
        .collect()
    }
    got = {(r.doc_id, r.n_occurrences) for r in probe.collect()}
    assert got == rescan and got


def test_incremental_agg_merge_equals_direct(spark):
    """merge(partial(base), agg(delta)) == one-pass agg — Spark-side
    twin of the oracle hash gate."""
    orders = load_table(spark, SF, "orders")
    direct = {
        (str(r.order_date), r.n_orders, r.revenue)
        for r in orders.groupBy(
            F.col("o_orderdate").cast("date").alias("order_date")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    merged = {
        (str(r.order_date), r.n_orders, r.revenue)
        for r in orders_incremental_daily_agg(spark, SF).collect()
    }
    assert merged == direct


def test_maintenance_compacts_inverted_and_nsw_layouts(spark, tmp_path):
    """run_index_maintenance with the auxiliary layout paths: after
    append accretion, both the postings and the NSW graph shrink to
    <= one file per partition with probe results unchanged."""
    import os

    from cnc_visionsearch_spark.maintenance import run_index_maintenance
    from cnc_visionsearch_spark.operators.graph_ann import (
        nsw_append,
        nsw_build,
        nsw_search,
    )
    from cnc_visionsearch_spark.operators.knn import with_normalized
    from cnc_visionsearch_spark.operators.text_index import (
        inverted_append,
        inverted_build,
        phrase_probe,
    )

    docs = load_table(spark, SF, "documents")
    inv = str(tmp_path / "inv")
    inverted_build(docs.filter(F.col("doc_id") % 2 == 0), inv, n_buckets=4)
    inverted_append(docs.filter(F.col("doc_id") % 2 == 1), inv, n_buckets=4)

    emb = with_normalized(load_table(spark, SF, "embeddings")).select(
        "vec_id", "nvec"
    )
    nsw = str(tmp_path / "nsw")
    nsw_build(emb.filter(F.col("vec_id") < 400), nsw, m=6, n_buckets=8)
    nsw_append(
        spark, nsw, emb.filter(F.col("vec_id").between(400, 405))
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first().nvec]
    probe_before = {
        (r.doc_id, r.n_occurrences)
        for r in phrase_probe(spark, inv, "slow", "fast", n_buckets=4).collect()
    }
    nsw_before = nsw_search(spark, nsw, q, k=5)

    report = run_index_maintenance(
        spark, inverted_path=inv, nsw_path=nsw
    )
    assert report["postings_files"]["after"] <= report["postings_files"]["before"]
    assert report["nsw_graph_files"]["after"] < report["nsw_graph_files"]["before"]

    probe_after = {
        (r.doc_id, r.n_occurrences)
        for r in phrase_probe(spark, inv, "slow", "fast", n_buckets=4).collect()
    }
    assert probe_after == probe_before
    assert nsw_search(spark, nsw, q, k=5) == nsw_before


def test_inverted_delete_no_resurrection_and_resident_files_untouched(
    spark, tmp_path
):
    """Tombstone-delete on the inverted layout: deleted docs vanish
    from every probe (postings AND norms read through the filter),
    resident postings files stay byte-identical, and the tombstone-free
    layout keeps its plan shape (no tombstone scan)."""
    import glob
    import hashlib

    from pyspark.sql import functions as F

    from cnc_visionsearch_spark.operators.text_index import (
        bm25_probe,
        inverted_build,
        inverted_delete,
        read_doclens,
    )
    from cnc_visionsearch_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    idx = str(tmp_path / "inv")
    inverted_build(docs, idx, n_buckets=4)

    def digest():
        out = {}
        for f in sorted(glob.glob(f"{idx}/postings/**/*.parquet", recursive=True)):
            out[f] = hashlib.md5(open(f, "rb").read()).hexdigest()
        return out

    before_files = digest()
    full = bm25_probe(spark, idx, ["hash", "join"], n_buckets=4)
    full_ids = {r.doc_id for r in full.collect()}
    victims = sorted(full_ids)[:3]
    inverted_delete(spark, idx, victims)

    after = bm25_probe(spark, idx, ["hash", "join"], n_buckets=4)
    after_ids = {r.doc_id for r in after.collect()}
    assert not (after_ids & set(victims)), "deleted doc resurrected"
    assert digest() == before_files, "delete rewrote resident files"
    # norms shift: N excludes tombstoned docs
    n_live = read_doclens(spark, idx).count()
    assert n_live == docs.count() - len(victims)


def test_inverted_vacuum_preserves_results_and_drops_tombstones(
    spark, tmp_path
):
    """Physical delete: vacuum rewrites only tombstone-touched bucket
    partitions + the doclens table, drops the tombstone dir, and every
    probe result is bit-identical before/after (the anti-join had
    already hidden the rows)."""
    import os

    from pyspark.sql import functions as F

    from cnc_visionsearch_spark.operators.text_index import (
        bm25_probe,
        inverted_build,
        inverted_delete,
        inverted_vacuum,
    )
    from cnc_visionsearch_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    idx = str(tmp_path / "inv")
    inverted_build(docs, idx, n_buckets=4)
    inverted_delete(spark, idx, [4, 11, 25])

    before = sorted(
        (r.doc_id, r.n_terms, r.score_q)
        for r in bm25_probe(spark, idx, ["hash", "join"], n_buckets=4).collect()
    )
    inverted_vacuum(spark, idx)
    assert not os.path.exists(f"{idx}/tombstones")
    after = sorted(
        (r.doc_id, r.n_terms, r.score_q)
        for r in bm25_probe(spark, idx, ["hash", "join"], n_buckets=4).collect()
    )
    assert before == after and before
    # physically gone: raw reads no longer contain the ids
    raw = spark.read.parquet(f"{idx}/postings").filter(
        F.col("doc_id").isin([4, 11, 25])
    )
    assert raw.count() == 0


def test_iterative_driver_loops_are_budget_guarded(spark):
    """Driver-coordinated iterative loops (BPE training, PageRank,
    bounded-hop BFS) take their round count as a parameter validated by
    iterative.check_rounds — a copied query cannot silently crank the
    count into a job storm, and 0/negative/bool typos fail loudly
    before any job launches."""
    import pytest

    from cnc_visionsearch_spark.iterative import MAX_DRIVER_ROUNDS, check_rounds
    from cnc_visionsearch_spark.queries_analytics import (
        doc_bpe_train_merges,
        part_bfs_3hop_reach,
    )
    from cnc_visionsearch_spark.queries_relational import (
        part_pagerank_power_iter,
    )

    assert check_rounds(1, "t") == 1
    assert check_rounds(MAX_DRIVER_ROUNDS, "t") == MAX_DRIVER_ROUNDS
    for bad in (0, -1, MAX_DRIVER_ROUNDS + 1, True, 2.0):
        with pytest.raises(ValueError):
            check_rounds(bad, "t")
    for fn, kw in (
        (doc_bpe_train_merges, "rounds"),
        (part_bfs_3hop_reach, "hops"),
        (part_pagerank_power_iter, "iters"),
    ):
        with pytest.raises(ValueError):
            fn(spark, SF, **{kw: 0})
        with pytest.raises(ValueError):
            fn(spark, SF, **{kw: MAX_DRIVER_ROUNDS + 1})


def test_bpe_merge_table_memoized_per_corpus_fingerprint(spark):
    """r10 verdict #5: the trained BPE merge table is a session memo
    keyed by the documents table's file fingerprint + rounds — three
    registry entries consume it (train / apply / fertility), and a
    full-surface replay must pay training ONCE. A memo hit returns the
    identical list object (no retraining jobs); the DataFrame twin
    serves the same rows, so every oracle hash is unchanged."""
    from cnc_visionsearch_spark.operators.rank import (
        _KERNEL_MEMO,
        clear_kernel_memo,
    )
    from cnc_visionsearch_spark.queries_analytics import (
        bpe_train_merge_rows,
        doc_bpe_train_merges,
    )

    def bpe_keys():
        return [k for k in _KERNEL_MEMO if k[0] == "bpe_merges"]

    clear_kernel_memo()
    first = bpe_train_merge_rows(spark, SF)
    assert len(bpe_keys()) == 1 and first
    second = bpe_train_merge_rows(spark, SF)
    assert second is first  # memo hit: the same trained object, zero jobs
    via_df = doc_bpe_train_merges(spark, SF).collect()
    assert [tuple(r) for r in via_df] == [tuple(m) for m in first]
    # a different rounds budget is a different model -> trains fresh;
    # storage is the CAPPED shared LRU (no unbounded module dict)
    shorter = bpe_train_merge_rows(spark, SF, rounds=2)
    assert len(shorter) == 2 and len(bpe_keys()) == 2
    assert [tuple(m) for m in shorter] == [tuple(m) for m in first[:2]]


def test_bloom_words_distributed_build_matches_python_fold(spark):
    """The Bloom build folds bits with a distributed groupBy(word) +
    bit_or — only <= _BF_WORDS aggregated rows reach the driver, never
    the keys. Pin (a) word-exactness vs a pure-Python fold and (b) that
    the only collect in the build is the bounded word-row one."""
    import inspect

    from cnc_visionsearch_spark.queries_analytics import (
        _BF_BITS,
        _BF_BPW,
        _BF_HASHES,
        _BF_P,
        _BF_WORDS,
        _bloom_words,
    )

    keys = [3, 17, 101, 4444, 987654, 15000]
    fr = spark.createDataFrame([(k,) for k in keys], "c_custkey bigint")
    got = _bloom_words(fr)
    exp = [0] * _BF_WORDS
    for k in keys:
        for _, a, b in _BF_HASHES:
            h = ((a * k + b) % _BF_P) % _BF_BITS
            exp[h // _BF_BPW] |= 1 << (h % _BF_BPW)
    assert got == exp
    src = inspect.getsource(_bloom_words)
    assert src.count(".collect()") == 1 and "bit_or" in src


def test_inverted_vacuum_self_heals_crashed_swap(spark, tmp_path):
    """Crash-safety of the vacuum swap: simulate every crash window of
    _swap_in (a .vacuum_bak with no live dir = died between renames; a
    leftover .vacuum_tmp beside a live dir = died before the swap) and
    assert the next vacuum entry restores a probe-identical index
    instead of losing the partition."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from cnc_visionsearch_spark.operators.text_index import (
        bm25_probe,
        inverted_build,
        inverted_vacuum,
    )
    from cnc_visionsearch_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    idx = str(tmp_path / "inv")
    inverted_build(docs, idx, n_buckets=4)

    def probe():
        return sorted(
            (r.doc_id, r.n_terms, r.score_q)
            for r in bm25_probe(
                spark, idx, ["hash", "join"], n_buckets=4
            ).collect()
        )

    expected = probe()
    assert expected

    # crash window 1: died between rename(live->bak) and rename(tmp->live)
    part = next(
        f"{idx}/postings/{d}"
        for d in os.listdir(f"{idx}/postings")
        if d.startswith("bucket=")
    )
    shutil.copytree(part, part + ".vacuum_tmp")
    os.rename(part, part + ".vacuum_bak")
    shutil.rmtree(part + ".vacuum_tmp")  # tmp swap-in also never happened
    inverted_vacuum(spark, idx)  # no tombstones: heal-only entry
    assert probe() == expected, "bak-without-live not restored"

    # crash window 2: died after writing tmp, before any rename
    shutil.copytree(part, part + ".vacuum_tmp")
    inverted_vacuum(spark, idx)
    assert not os.path.exists(part + ".vacuum_tmp")
    assert probe() == expected, "leftover tmp corrupted the index"


def test_bm25_single_and_batch_probes_cannot_drift(spark, tmp_path):
    """bm25_multi_probe shares per-(term, doc) scores across queries;
    for a one-query batch its ranking and quantized scores must equal
    bm25_probe's exactly — the no-drift contract the serving stream
    relies on."""
    from pyspark.sql import functions as F

    from cnc_visionsearch_spark.operators.text_index import (
        bm25_multi_probe,
        bm25_probe,
        inverted_build,
    )
    from cnc_visionsearch_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "inv")
    inverted_build(docs, idx, n_buckets=8)
    terms = ["hash", "join", "table"]

    single = {
        (r.doc_id, r.n_terms, r.score_q)
        for r in bm25_probe(spark, idx, terms, n_buckets=8)
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(5)
        .collect()
    }
    batch = {
        (r.doc_id, r.n_terms, r.score_q)
        for r in bm25_multi_probe(
            spark, idx, [(0, terms)], n_buckets=8, k=5
        ).collect()
    }
    assert single == batch and single


def test_maxscore_pruning_is_lossless_and_actually_prunes(spark):
    """MaxScore pruned top-k == plain BM25 top-k (losslessness), AND
    on the sf0.01 fixture the rare term is the ONLY essential list —
    the two stopword-class terms' ~390-doc postings never enter the
    ranking aggregation."""
    from cnc_visionsearch_spark.operators.text_index import (
        bm25_probe,
        maxscore_pruned_topk,
    )
    from cnc_visionsearch_spark.queries_analytics import (
        _INV_BUCKETS,
        _MAXSCORE_TERMS,
        ensure_inverted_built,
    )

    sf = "/root/testdata/sf0.01"
    path = ensure_inverted_built(spark, sf)
    info: dict = {}
    pruned = maxscore_pruned_topk(
        spark,
        path,
        list(_MAXSCORE_TERMS),
        k=10,
        n_buckets=_INV_BUCKETS,
        introspect=info,
    ).collect()
    plain = (
        bm25_probe(spark, path, list(_MAXSCORE_TERMS), n_buckets=_INV_BUCKETS)
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(10)
        .collect()
    )
    assert [(r.doc_id, r.n_terms, r.score_q) for r in pruned] == [
        (r.doc_id, r.n_terms, r.score_q) for r in plain
    ]
    # the pruning decision: 'dup' (df=25, high idf) is essential; the
    # common terms are provably non-essential under θ
    assert info["essential"] == ["dup"]
    assert info["theta"] > info["u"]["vector"] + info["u"]["fast"]
