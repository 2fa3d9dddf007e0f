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
    (round 2 lost rows this way): every one of the first 50 queries
    must be oracle-checkable, and the queries the round-3 VERDICT
    called out — plus the round-4 debut operators — must sit inside
    that window. Every entry demoted past 50 (60 oracle queries > 50
    slots) was driver-verified green in an earlier round and its §2
    operator row is also covered by in-window queries or the ported
    golden pytest suites."""
    names = list(QUERIES)
    oracles = set(entry_mod.oracle_sql())
    for name in names[:50]:
        assert name in oracles, "%s has no oracle but sits in the " \
            "driver's row budget" % name
    for name in ("cap_per_source", "redact_pii",
                 "boilerplate_ratio", "contamination_check",
                 "quantize_roundtrip", "not_over_or_exists",
                 "or_composite_grammar", "repetition_docs",
                 "chunk_docs_windows", "bigram_surprisal_docs",
                 "embedding_outliers",
                 "event_funnel", "q17_small_qty_revenue",
                 "q22_wealthy_inactive", "scalar_rank_suppliers",
                 "q20_nested_scalar_in", "substring_dup_docs",
                 "token_budget_sample", "stats_aggregates",
                 "string_fns_nation", "q14_promo_revenue",
                 "orders_rollup", "orders_window_rank",
                 "orders_qualify_top",
                 # round-4.3 debuts: HAVING + remaining TPC-H shapes
                 "q11_important_balances", "q18_large_volume",
                 "q19_disjunctive_preds", "q21_blocking_supplier",
                 "q2_best_balance_supplier", "q8_market_share",
                 "q9_profit_by_nation_year",
                 "q13_order_count_distribution", "q15_top_supplier",
                 "scalar_vs_scalar_nations", "scalar_field_counts",
                 "orders_grouping_sets"):
        assert names.index(name) < 50, name
    demoted = [n for n in names[50:] if n in oracles]
    assert set(demoted) == {
        "q6_forecast_revenue", "q12_priority_counts", "agg_global_stats",
        "alias_fields", "embedding_label_norms", "dict_filter_topn",
        "distinct_segments", "params_notin", "or_exists_filter",
        "text_stats", "knn_join_batch", "mix_temperature_langs",
        "event_anomalies", "user_retention_cohorts",
        "q10_returned_items", "neardup_groups_star_docs",
        "curation_pipeline_v2", "train_test_split_docs",
        "corpus_stats", "q7_volume_shipping", "neardup_dedup_rows",
        "q4_order_priority", "pii_audit_docs",
        "event_transitions_matrix", "vocab_top_tokens",
        "customer_rfm", "orders_monthly_growth",
        "every_aggregate", "filter_like_in", "order_limit_offset",
        "null_safe_buckets", "write_partial_update",
        "json_extract_events", "events_hourly", "doc_len_quantiles",
        "any_all_arrays", "stratified_sample_docs", "lang_id_confusion",
        "curation_pipeline", "events_top_types",
        # demoted for the round-4.3 TPC-H debuts — each green in
        # CORRECTNESS_r03 and pinned by golden suites (read/write/
        # delete/planner tests) or an in-window twin (q20/q21 cover
        # IN/EXISTS; q18 covers O2M aggregation)
        "o2m_nation_count", "exists_correlated", "in_subquery",
        "nested_exists_2level", "not_exists_2level",
        "write_insert_update_legs", "write_purge_filtered",
        "delete_roundtrip", "unnest_embedding", "strftime_monthly",
        "cast_trunc_extract", "or_two_not_exists",
    }, demoted


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
