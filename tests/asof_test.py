"""As-of join unit tests (operators/asof.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from tanker_spark.operators.asof import as_of_join


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_as_of_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 20, _ts(10)),
         (4, 30, _ts(1))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(10, _ts(3), 100.0), (10, _ts(5), 200.0), (10, _ts(15), 300.0),
         (20, _ts(50), 400.0)],
        ["user_id", "ts", "value"],
    )
    out = {
        r.event_id: (r.value_r, r.ts_r)
        for r in as_of_join(left, right, by="user_id", ts_col="ts",
                            right_cols=["value"]).collect()
    }
    assert out[1] == (200.0, _ts(5))    # inclusive: match AT left ts
    assert out[2] == (300.0, _ts(15))   # latest at-or-before
    assert out[3] == (None, None)       # right row is in the future
    assert out[4] == (None, None)       # no right rows for the key
    # left row count preserved (pure left join semantics)
    assert len(out) == 4


def test_as_of_join_null_payload_atomicity(spark):
    """A NULL payload in the matched right row must be carried as NULL,
    not backfilled from an older right row (matched-row atomicity)."""
    left = spark.createDataFrame(
        [(1, 10, _ts(30))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(10, _ts(5), 100.0, "a"), (10, _ts(20), None, "b")],
        ["user_id", "ts", "value", "tag"],
    )
    row = as_of_join(left, right, by="user_id", ts_col="ts",
                     right_cols=["value", "tag"]).collect()[0]
    # matched row is t=00:20 whose value is NULL — DuckDB ASOF semantics
    assert row.ts_r == _ts(20)
    assert row.value_r is None
    assert row.tag_r == "b"


def test_as_of_join_plan_single_shuffle(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(10, _ts(3), 1.0)], ["user_id", "ts", "value"])
    frame = as_of_join(left, right, by="user_id", ts_col="ts",
                       right_cols=["value"])
    plan = frame._jdf.queryExecution().executedPlan().toString()
    # union + window: no join operator at all, no nested-loop fallback
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_as_of_join_random_matches_bruteforce(spark):
    """Randomized: window lowering == per-key python scan."""
    import random

    rnd = random.Random(42)
    left = [(i, rnd.randint(1, 5), _ts(rnd.randint(0, 59)))
            for i in range(60)]
    right = [(rnd.randint(1, 5), _ts(rnd.randint(0, 59)), float(i))
             for i in range(40)]
    ldf = spark.createDataFrame(left, ["event_id", "user_id", "ts"])
    rdf = spark.createDataFrame(right, ["user_id", "ts", "value"])
    got = {
        r.event_id: (r.value_r, r.ts_r)
        for r in as_of_join(ldf, rdf, by="user_id", ts_col="ts",
                            right_cols=["value"]).collect()
    }

    def brute(uid, ts):
        cands = [(rts, v) for (ruid, rts, v) in right
                 if ruid == uid and rts <= ts]
        if not cands:
            return (None, None)
        # latest ts; tie-break must match the window ordering: among
        # equal timestamps the LAST right row in (ts, src) order wins
        best_ts = max(c[0] for c in cands)
        vals = [v for (rts, v) in cands if rts == best_ts]
        return (vals[-1], best_ts)

    assert len(got) == len(left)
    for (eid, uid, ts) in left:
        bts = brute(uid, ts)[1]
        assert got[eid][1] == bts, (eid, got[eid], bts)
        if bts is not None:
            # value must come from a right row at the matched timestamp
            valid = {v for (ruid, rts, v) in right
                     if ruid == uid and rts == bts}
            assert got[eid][0] in valid


def test_as_of_join_ts_in_right_cols_no_duplicate(spark):
    """Listing ts_col in right_cols must not emit a duplicate ts_r."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(10, _ts(3), 100.0)], ["user_id", "ts", "value"])
    out = as_of_join(left, right, by="user_id", ts_col="ts",
                     right_cols=["ts", "value"])
    assert out.columns.count("ts_r") == 1
    (row,) = out.collect()
    assert row.value_r == 100.0 and row.ts_r == _ts(3)
