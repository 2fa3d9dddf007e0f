"""Per-job profiler for bench queries (guide §1: measure first).

Runs the named bench queries once (after one warm pass) with the Spark
event log enabled, then attributes wall time to the individual Spark
jobs each query ran: callsite, duration, task count, task time, shuffle
read/write bytes, input bytes. This answers "where do the seconds of a
multi-job operator (index build + append + probe) actually go" without
the Spark UI (disabled in this harness).

Usage::

    python scripts/profile_bench.py q1_pricing_summary knn_rerank_exact
    python scripts/profile_bench.py --all-slow   # the >1s bench set
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from tanker_spark import get_spark  # noqa: E402

SLOW = [
    "knn_versioned_rerank", "bm25_incremental_search",
    "neardup_groups_spanning_docs", "knn_join_indexed_batch",
    "ngram_jaccard_docs", "neardup_decontam_docs", "knn_pq_rerank",
    "curation_pipeline_v2", "retrieval_eval_bm25", "minhash_dedup_docs",
    "dsir_select_docs", "knn_rerank_exact", "repetition_docs",
    "q18_large_volume", "hybrid_search_docs",
]


def parse_eventlog(log_dir):
    """One pass over the (single) event log file: job + stage metrics."""
    files = sorted(
        p for p in Path(log_dir).rglob("*")
        if p.is_file() and "appstatus" not in p.name
        and not p.name.startswith(".")
    )
    jobs = {}       # job_id -> dict
    stage_of = {}   # stage_id -> job_id
    stages = {}     # stage_id -> metrics accumulator
    for path in files:
        if path.name.endswith(".zstd"):
            import io
            import subprocess
            proc = subprocess.Popen(["zstd", "-dc", str(path)],
                                    stdout=subprocess.PIPE)
            fh = io.TextIOWrapper(proc.stdout)
        else:
            fh = open(path)
        with fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    sids = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
                    cs = ""
                    if ev.get("Stage Infos"):
                        cs = ev["Stage Infos"][-1].get("Stage Name", "")
                    jobs[jid] = {
                        "job": jid, "t0": ev["Submission Time"],
                        "desc": props.get("spark.job.description") or cs,
                        "stages": sids, "t1": None,
                    }
                    for s in sids:
                        stage_of[s] = jid
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    acc = stages.setdefault(sid, {
                        "name": si.get("Stage Name", ""), "tasks": 0,
                        "task_ms": 0, "sh_read": 0, "sh_write": 0,
                        "input": 0,
                    })
                    acc["tasks"] += si.get("Number of Tasks", 0)
                    for a in si.get("Accumulables", []):
                        n, v = a.get("Name"), a.get("Value")
                        if not isinstance(v, (int, float)):
                            continue
                        if n == "internal.metrics.executorRunTime":
                            acc["task_ms"] += v
                        elif n in ("internal.metrics.shuffle.read.localBytesRead",
                                   "internal.metrics.shuffle.read.remoteBytesRead"):
                            acc["sh_read"] += v
                        elif n == "internal.metrics.shuffle.write.bytesWritten":
                            acc["sh_write"] += v
                        elif n == "internal.metrics.input.bytesRead":
                            acc["input"] += v
    return jobs, stages, stage_of


def main():
    args = sys.argv[1:]
    if args and args[0] == "--all-slow":
        names = SLOW
    else:
        names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="tk_evlog_")
    spark = get_spark(app_name="tk_profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "file://" + log_dir,
    })
    queries = entry_mod.queries()
    spark.range(1).count()
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()          # warm pass (codegen, footers)
        sc = spark.sparkContext
        # marker job so we can find the timed window in the log
        sc.setJobDescription("===MARK %s===" % name)
        spark.range(1).count()
        sc.setJobDescription(None)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobDescription("===ENDMARK %s===" % name)
        spark.range(1).count()
        sc.setJobDescription(None)
        print("@@ %s wall=%.3fs" % (name, wall))
    spark.stop()

    jobs, stages, _ = parse_eventlog(log_dir)
    ordered = sorted(jobs.values(), key=lambda j: j["job"])
    current = None
    for j in ordered:
        d = j["desc"]
        if d.startswith("===MARK "):
            current = d[len("===MARK "):-3]
            print("\n## %s" % current)
            continue
        if d.startswith("===ENDMARK "):
            current = None
            continue
        if current is None:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0 if j["t1"] else float("nan")
        agg = {"tasks": 0, "task_ms": 0, "sh_read": 0, "sh_write": 0,
               "input": 0}
        for s in j["stages"]:
            if s in stages:
                for k in agg:
                    agg[k] += stages[s][k]
        print("  job %3d %7.3fs  tasks=%-4d tasktime=%6.1fs "
              "shR=%8.1fkB shW=%8.1fkB in=%9.1fkB  %s" % (
                  j["job"], dur, agg["tasks"], agg["task_ms"] / 1000.0,
                  agg["sh_read"] / 1e3, agg["sh_write"] / 1e3,
                  agg["input"] / 1e3, d[:110]))
    print("\n(eventlog: %s)" % log_dir)


if __name__ == "__main__":
    main()
