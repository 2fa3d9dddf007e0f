"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()``
through DuckDB on the same parquet, compares row count, column names and
(order-insensitive) values. Usage::

    python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from tanker_spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sortable(v):
    v = _norm(v)
    return ("1", "") if v is None else ("0", repr(v))


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_sortable(r[i]) for i in order) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
            % (t, sf_dir, t)
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print("FAIL %-26s spark error: %s" % (name, str(e)[:200]))
            failures += 1
            continue
        if name not in oracles:
            print("rows  %-26s %d rows (no oracle)" % (name, len(srows)))
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print("FAIL %-26s duckdb error: %s" % (name, str(e)[:200]))
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append("cols %s vs %s" % (sorted(scols), sorted(ocols)))
        if len(srows) != len(orows):
            problems.append("rowcount %d vs %d" % (len(srows), len(orows)))
        if not problems:
            sk = rows_key(scols, srows)
            ok = rows_key(ocols, orows)
            if sk != ok:
                for a, b in zip(sk, ok):
                    if a != b:
                        problems.append("first diff: %r vs %r" % (a, b))
                        break
                else:
                    problems.append("value diff (prefix equal)")
        if problems:
            print("FAIL %-26s %s" % (name, "; ".join(problems)[:400]))
            failures += 1
        else:
            print("ok    %-26s %d rows" % (name, len(srows)))
    print("---")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
