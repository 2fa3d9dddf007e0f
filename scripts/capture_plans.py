"""Capture ``.explain("formatted")`` for bench queries into plans/<tag>/.

Usage::

    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

The output round directory comes from ``$SPARK_GRAFT_PLANS_DIR``
(default ``plans/r11``) — the r10 hardcode silently overwrote the
previous round's committed evidence (r10 ADVICE).

With no query names, captures every BENCH_QUERIES entry. Building a
query's DataFrame runs its setup (index builds etc.), so this is not a
timing tool — it records plan shape (Exchange count, join strategy,
PushedFilters, Python-eval nodes) for the optimization ledger.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from tanker_spark import get_spark  # noqa: E402


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    out_dir = Path(__file__).resolve().parent.parent / "plans" / \
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11")
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tk_plans")
    queries = entry_mod.queries()
    for name in names:
        if name.startswith("write_"):
            continue  # write legs have no single DataFrame to explain
        try:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            txt = "ERROR capturing plan: %r\n" % (exc,)
        (out_dir / ("%s_%s.txt" % (name, tag))).write_text(txt)
        print("captured %s_%s (%d chars)" % (name, tag, len(txt)))


if __name__ == "__main__":
    main()
