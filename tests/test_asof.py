"""As-of join operator tests: <= semantics, tie-breaking, no-match
nulls, left-row preservation, and the one-shuffle plan contract.
"""

from __future__ import annotations

import datetime as dt

from cnc_visionsearch_spark.operators.asof import asof_join
from cnc_visionsearch_spark.plans import formatted_plan


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5)),   # after r2 (t=4) -> picks r2
            (2, 10, _ts(4)),   # ties r2 exactly -> <= includes it
            (3, 10, _ts(1)),   # before every right row -> null
            (4, 99, _ts(12)),  # key with no right rows -> null
        ],
        "lid: long, k: long, lt: timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(2), 2.0),
            (101, 10, _ts(4), 4.0),   # tie group: same ts as rid 102
            (102, 10, _ts(4), 44.0),  # larger rid wins the tie
            (103, 10, _ts(9), 9.0),   # after all left rows
        ],
        "rid: long, k: long, rt: timestamp, rv: double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.lid: (r.rid_asof, r.rv_asof)
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_payload=["rid", "rv"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == (102, 44.0)   # latest at-or-before t=5 is the t=4 tie winner
    assert out[2] == (102, 44.0)   # equality included (<=), tiebreak = max rid
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (None, None)  # unseen key
    assert len(out) == 4           # left rows never multiplied or dropped


def test_asof_single_shuffle(spark):
    left, right = _frames(spark)
    plan = formatted_plan(
        asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_payload=["rv"],
        )
    )
    # one hash exchange on the key (plus nothing else): the union+window
    # formulation must not introduce a join or second shuffle
    assert plan.count("Exchange hashpartitioning") <= 1 or (
        "Exchange" in plan and "Join" not in plan
    )
    assert "Join" not in plan
