"""MMR diversity re-rank (queries_rerank.py): greedy semantics on a
hand-built case, bounded candidate stage, end-to-end shape."""

from __future__ import annotations

from collections import namedtuple

from cnc_visionsearch_spark.queries_rerank import (
    knn_mmr_rerank,
    mmr_candidates,
    mmr_select,
)

C = namedtuple("C", "id relq")
S = namedtuple("S", "ia ib simq")


def _sims(pairs: dict[tuple[int, int], int]) -> list[S]:
    out = []
    for (a, b), v in pairs.items():
        out.extend([S(a, b, v), S(b, a, v)])
    return out


def test_mmr_skips_near_duplicate_of_the_top_pick():
    # 2 is the relevance runner-up but nearly identical to 1;
    # 3 is less relevant but dissimilar -> MMR picks 1 then 3.
    cand = [C(1, 1000), C(2, 990), C(3, 700)]
    sims = _sims({(1, 2): 995, (1, 3): 100, (2, 3): 120})
    picked = mmr_select(cand, sims, k=2)
    assert [(r, i) for r, i, _ in picked] == [(1, 1), (2, 3)]


def test_mmr_ties_break_by_ascending_id():
    cand = [C(7, 1000), C(3, 1000), C(9, 500)]
    sims = _sims({(3, 7): 0, (3, 9): 0, (7, 9): 0})
    picked = mmr_select(cand, sims, k=3)
    assert picked[0][1] == 3  # equal relq -> smaller id first
    assert picked[1][1] == 7


def test_mmr_k_capped_at_candidate_count():
    cand = [C(1, 10), C(2, 5)]
    sims = _sims({(1, 2): 1})
    assert len(mmr_select(cand, sims, k=5)) == 2


def test_candidate_stage_is_parameter_bounded(spark, sf_dir):
    cand, sims = mmr_candidates(spark, sf_dir, top_n=20)
    assert cand.count() == 20
    assert sims.count() == 20 * 19


def test_mmr_rerank_end_to_end(spark, sf_dir):
    rows = knn_mmr_rerank(spark, sf_dir).collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    # self-match is the most relevant candidate: exactly 1.0 on the grid
    assert rows[0].vec_id == 1 and rows[0].relq == 10**9
    # diversity is active: the greedy tail is NOT sorted by pure
    # relevance (a later pick out-scores an earlier one on relq alone)
    tail = [r.relq for r in rows[1:]]
    assert tail != sorted(tail, reverse=True)
