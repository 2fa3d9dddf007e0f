"""Smoke test of the driver contract: every ``queries()`` entry must run
against the CURRENT testdata (round-2 shipped 3 crashing entry queries
while the unit suite was green — the entry surface needs its own gate).

Runs at sf0.001 and asserts each frame materializes; also pins the
queries()/oracle_sql() key relationship the driver relies on.
"""

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", list(QUERIES))
def test_entry_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns  # stable, non-empty schema


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset():
    """Every oracle_sql key must have a queries() entry (the driver joins
    on the queries side; orphan oracle keys would silently never run)."""
    extra = set(entry_mod.oracle_sql()) - set(QUERIES)
    assert not extra, extra


def test_driver_row_budget_ordering():
    """The driver's correctness run covers only the first 50 entries
    (round 2 lost rows this way). Round-5 replaced the hand-pinned
    ordering with a deterministic per-round ROTATION: this round's
    DEBUTS lead, oracle-checkable veterans rotate through the window
    round by round, rows-only entries stay last. Pins:

    - the first 50 entries are all oracle-checkable;
    - the debuts sit at the very front (driver-recorded in their debut
      round);
    - three consecutive rounds cover EVERY oracle-checkable veteran
      (the round-4 VERDICT counted 52 green oracle queries the driver
      had never re-recorded);
    - the rotation is stable for a fixed round number;
    - round 6: veterans with NO recorded CORRECTNESS row in any past
      round (read from the on-disk CORRECTNESS_r*.json) jump the
      queue, so a DEBUTS change can never rotate a never-seen entry
      out of the window.
    """
    oracles = set(entry_mod.oracle_sql())
    names = list(QUERIES)
    for name in names[:50]:
        assert name in oracles, "%s has no oracle but sits in the " \
            "driver's row budget" % name
    for i, name in enumerate(entry_mod.DEBUTS):
        assert names[i] == name, (i, name)

    covered = set()
    veterans = {n for n in entry_mod._all_queries()
                if n in oracles and n not in entry_mod.DEBUTS}
    for rnd in (6, 7, 8):
        window = entry_mod._ordered_names(rnd)[:50]
        assert len(window) == 50
        assert all(n in oracles for n in window)
        covered.update(window)
        # stable for a fixed round
        assert entry_mod._ordered_names(rnd) == entry_mod._ordered_names(rnd)
    missing = veterans - covered
    assert not missing, missing
    # rows-only entries never displace an oracle-checkable one
    n_rows_only = len([n for n in entry_mod._all_queries()
                       if n not in oracles])
    tail = entry_mod._ordered_names(6)[-n_rows_only:]
    assert all(n not in oracles for n in tail)


def test_events_ts_stays_timestamp():
    """Round 2 postmortem guard: the whole events pipeline assumes the
    driver's events.ts is a parquet TIMESTAMP (Spark reads NTZ). If the
    testdata is ever regenerated with int64 epoch-nanos instead, fail
    HERE with a clear message instead of three cryptic red queries —
    then flip tanker_spark/testdata.py to `ts: bigint` and route reads
    through streaming.events.with_event_ts (already dtype-adaptive)."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    t = pq.ParquetFile(
        SF_DIR + "/events.parquet"
    ).schema_arrow.field("ts").type
    assert pt.is_timestamp(t), (
        "events.ts physical type changed to %s — see this test's "
        "docstring for the fix" % t
    )


def test_q10_plan_shape(spark):
    """Q10's physical plan: filter pushed to both scans, all three dim
    joins broadcast, and Catalyst's LeftOuter->Inner conversion on the
    null-rejecting date filter."""
    df = entry_mod.queries()["q10_returned_items"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "SortMergeJoin" not in plan
