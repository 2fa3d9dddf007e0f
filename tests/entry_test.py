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
    (round 2 lost rows this way). Round-6 replaced the modular-offset
    rotation (which opened a 3-name coverage gap the moment a third
    DEBUT landed) with STALENESS ordering: DEBUTS lead, then veterans
    by ascending last-driver-recorded round (never-recorded sorts
    first), rows-only entries last. Recording a window refreshes its
    entries' staleness, so coverage advances by construction. Pins:

    - the first 50 entries are oracle-checkable except for exactly the
      ROWS_ONLY_QUOTA stalest rows-only names (r8: rows-only operators
      must eventually earn a driver no_oracle row — through r7 six of
      them never appeared in the ledger at all);
    - the debuts sit at the very front (driver-recorded in their debut
      round);
    - simulating the record-then-reorder feedback loop, three rounds
      cover EVERY oracle-checkable veteran AND every rows-only entry;
    - the ordering is stable for a fixed recording state;
    - never-recorded veterans sit ahead of every recorded one, so a
      DEBUTS change can never push a never-seen entry out of the
      window's reach.
    """
    oracles = set(entry_mod.oracle_sql())
    names = list(QUERIES)
    in_window_rows_only = [n for n in names[:50] if n not in oracles]
    assert len(in_window_rows_only) == min(
        entry_mod.ROWS_ONLY_QUOTA,
        len([n for n in names if n not in oracles]))
    for i, name in enumerate(entry_mod.DEBUTS):
        assert names[i] == name, (i, name)

    # stable for a fixed recording state
    assert entry_mod._ordered_names(6) == entry_mod._ordered_names(6)

    # red-at-latest veterans lead the veteran block (a failed driver
    # row must be retried the round its fix lands), then never-recorded
    # ones, then recorded-green by staleness
    recorded = entry_mod._recorded_rounds()
    red = entry_mod._red_names()
    ordered = entry_mod._ordered_names(6)
    vet_block = [n for n in ordered if n in oracles
                 and n not in entry_mod.DEBUTS]
    phase = 0  # 0 = red, 1 = never-recorded, 2 = recorded green
    for n in vet_block:
        p = 0 if n in red else (1 if not recorded.get(n, 0) else 2)
        assert p >= phase, \
            "%s (phase %d) sits after a phase-%d veteran" % (n, p, phase)
        phase = max(phase, p)

    # feedback-loop simulation: the driver records each round's window,
    # staleness reorders, three rounds cover every veteran. Start from
    # the CURRENT on-disk round (r7 postmortem: a literal (6, 7, 8)
    # went stale the moment the driver dropped CORRECTNESS_r07.json —
    # 44 veterans became "recorded in 7" and sorted freshest-last
    # inside the simulated past rounds).
    veterans = {n for n in entry_mod._all_queries()
                if n in oracles and n not in entry_mod.DEBUTS}
    rows_only_all = {n for n in entry_mod._all_queries()
                     if n not in oracles}
    start = max(recorded.values(), default=0) + 1
    assert entry_mod._round_no() == start
    sim = dict(recorded)
    covered = set()
    for rnd in range(start, start + 3):
        window = entry_mod._ordered_names(rnd, recorded=sim)[:50]
        assert len(window) == 50
        assert len([n for n in window if n not in oracles]) \
            <= entry_mod.ROWS_ONLY_QUOTA
        covered.update(window)
        for n in window:
            sim[n] = rnd
    missing = veterans - covered
    assert not missing, missing
    # the quota walks the rows-only set too: within
    # ceil(|rows_only| / quota) rounds every rows-only entry records
    for rnd in range(start + 3,
                     start + (len(rows_only_all) + 2) // 3 + 1):
        window = entry_mod._ordered_names(rnd, recorded=sim)[:50]
        covered.update(window)
        for n in window:
            sim[n] = rnd
    assert not rows_only_all - covered, rows_only_all - covered
    # beyond the quota, rows-only entries never displace an
    # oracle-checkable one
    n_tail = len(rows_only_all) - entry_mod.ROWS_ONLY_QUOTA
    if n_tail > 0:
        tail = entry_mod._ordered_names(6)[-n_tail:]
        assert all(n not in oracles for n in tail)


def test_rotation_survives_future_driver_recordings(monkeypatch):
    """r7 regression: the rotation-coverage pins must hold for ANY
    on-disk recording state, not just today's — plant a fake future
    CORRECTNESS history (driver recorded windows through round 12,
    unevenly) and re-assert round derivation + 3-round coverage."""
    oracles = set(entry_mod.oracle_sql())
    names = list(entry_mod._all_queries())
    fake = {n: 5 + (i % 8) for i, n in enumerate(names)}  # rounds 5..12
    monkeypatch.setattr(entry_mod, "_recorded_rounds", lambda: fake)
    start = max(fake.values()) + 1
    assert entry_mod._round_no() == start
    veterans = {n for n in names
                if n in oracles and n not in entry_mod.DEBUTS}
    sim = dict(fake)
    covered = set()
    for rnd in range(start, start + 3):
        window = entry_mod._ordered_names(rnd, recorded=sim)[:50]
        assert len(window) == 50
        covered.update(window)
        for n in window:
            sim[n] = rnd
    assert not veterans - covered


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
