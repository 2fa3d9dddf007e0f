"""``tk`` command-line front-end (reference: tanker/cli.py — same argparse
surface: read/write/delete/info/init/version, -F filters, -s sort with
``col:desc``, -l/-o limit/offset, -p purge, csv/yaml IO, ascii table and
terminal bar charts)."""

from __future__ import annotations

import argparse
import csv
import os
import sys

from .context import connect, create_tables
from .table import Table
from .utils import __version__, ctx, logger, yaml_load
from .view import View


def cli(argv=None):
    parser = argparse.ArgumentParser(description="tanker_spark CLI")
    parser.add_argument(
        "action",
        help="info, read, write, delete, sql, optimize, diff, init or "
        "version", nargs=1
    )
    parser.add_argument("table", help="Table to query", nargs="*")
    parser.add_argument(
        "--config", help='Config file (defaults to ".tk.yaml")',
        default=".tk.yaml",
    )
    parser.add_argument(
        "-D", "--root", "--db-uri", dest="root",
        help="Storage root directory (overrides config value)",
    )
    parser.add_argument("-l", "--limit", type=int)
    parser.add_argument("-o", "--offset", type=int)
    parser.add_argument(
        "-F", "--filter", action="append", help="Add filter", default=[]
    )
    parser.add_argument(
        "-p", "--purge", help="Purge table after write", action="store_true"
    )
    parser.add_argument(
        "-s", "--sort", action="append", help="Sort results (col or "
        "col:desc)", default=[],
    )
    parser.add_argument(
        "-f", "--file", help="Read/Write to file (instead of stdin/stdout)"
    )
    parser.add_argument("--yaml", action="store_true",
                        help="YAML input/output (defaults to csv)")
    parser.add_argument("--ascii-table", "-t", action="store_true",
                        help="ascii table output")
    parser.add_argument("--vbar", action="store_true",
                        help="Vertical bar plot")
    parser.add_argument("--tic", help="Tic character to use for plot")
    parser.add_argument("-d", "--debug", action="store_true")
    parser.add_argument("-H", "--hide-headers", action="store_true")
    parser.add_argument(
        "--at", type=int, metavar="VERSION",
        help="Time-travel read: pin the table to snapshot VERSION",
    )
    parser.add_argument(
        "-G", "--groupby", action="append", default=[],
        help="Explicit GROUP BY column / s-expression",
    )
    parser.add_argument(
        "--having", action="append", default=[],
        help="Post-aggregation predicate (s-expression; repeat = AND)",
    )
    parser.add_argument(
        "--qualify", help="Window predicate filter (s-expression)",
    )
    parser.add_argument(
        "--distinct", action="store_true", help="DISTINCT read",
    )
    parser.add_argument(
        "--rollup", action="store_true",
        help="GROUP BY ROLLUP over the -G columns",
    )
    parser.add_argument(
        "--cube", action="store_true",
        help="GROUP BY CUBE over the -G columns",
    )
    parser.add_argument(
        "--explain", action="store_true",
        help="Print the physical plan instead of rows",
    )

    args = parser.parse_args(argv)
    if args.debug:
        logger.setLevel("DEBUG")
    if args.action[0] == "version":
        print(__version__)
        return

    if os.path.exists(args.config):
        with open(args.config) as fh:
            cfg = yaml_load(fh)
    else:
        cfg = {}
    if args.root:
        cfg["root"] = args.root
    if cfg.get("schema") and isinstance(cfg["schema"], str) and \
            os.path.exists(os.path.expanduser(cfg["schema"])):
        with open(os.path.expanduser(cfg["schema"])) as fh:
            cfg["schema"] = yaml_load(fh)
    with connect(cfg):
        cli_main(args)


def ascii_table(rows, headers=None, sep=" "):
    rows = [list(map(str, row)) for row in rows]
    if not rows and not headers:
        return
    lengths = [len(h) for h in (headers or rows[0])]
    for row in rows:
        lengths = [max(len(i), l) for i, l in zip(row, lengths)]
    fmt = lambda xs: sep.join(
        x.ljust(l) for x, l in zip(xs, lengths)
    ) + "\n"
    if headers:
        yield fmt(headers)
        yield fmt(["-" * l for l in lengths])
    for row in rows:
        yield fmt(row)


def vbar(rows, headers, plot_width=60, tic=None):
    """Terminal horizontal-bar chart of the last (numeric) column."""
    tic = tic or "*"
    if not rows:
        return
    if not isinstance(rows[0][-1], (int, float)):
        logger.error("Last column must be numeric")
        return
    labels = [" / ".join(map(str, r[:-1])) for r in rows]
    values = [r[-1] for r in rows]
    label_len = max((len(l) for l in labels), default=0)
    vmax = max(max(values), 0)
    vmin = min(min(values), 0)
    delta = (vmax - vmin) or 1
    scale = delta / plot_width
    for label, value in zip(labels, values):
        bar = tic * int(round(abs(value) / scale))
        yield "%s %10.2f %s\n" % (label.ljust(label_len), value, bar)


def cli_input_data(view, args):
    """Load csv/yaml rows from file or stdin for write/delete."""
    if args.file:
        fh = open(args.file)
    else:
        fh = sys.stdin
    try:
        if args.yaml:
            data = yaml_load(fh.read())
            fields = sorted({k for row in data for k in row})
            rows = [[row.get(f) for f in fields] for row in data]
        else:
            reader = csv.reader(fh)
            fields = next(reader)
            rows = [
                [None if v == "" else v for v in row] for row in reader
            ]
        return fields, rows
    finally:
        if args.file:
            fh.close()


def cli_main(args):
    action = args.action[0]
    out = sys.stdout if not args.file or action != "read" else open(
        args.file, "w"
    )

    if action == "init":
        create_tables()
        return

    if action == "info":
        if args.table:
            table = Table.get(args.table[0])
            rows = [
                (c.name, c.ctype + (" %s" % c.fk if c.fk else ""))
                for c in table.columns
            ]
            for line in ascii_table(rows, headers=["column", "type"]):
                out.write(line)
        else:
            for name in sorted(ctx.registry):
                out.write(name + "\n")
        return

    if action == "optimize":
        # `tk optimize table [zorder_col ...]` — rewrite the current
        # snapshot clustered (ctx.optimize; Delta OPTIMIZE analog)
        if not args.table:
            raise SystemExit("optimize action needs a table name")
        ctx.optimize(args.table[0], zorder_by=args.table[1:] or None)
        logger.info("optimized %s", args.table[0])
        return

    if action == "diff":
        # `tk diff table SINCE [UNTIL]` — snapshot CDC between two
        # retained versions (ctx.diff; Delta CHANGE DATA FEED analog)
        if len(args.table) < 2:
            raise SystemExit("diff needs a table name and a version")
        until = int(args.table[2]) if len(args.table) > 2 else None
        df = ctx.diff(args.table[0], int(args.table[1]), until)
        rows = [tuple(r) for r in df.collect()]
        headers = None if args.hide_headers else df.columns
        if args.ascii_table:
            for line in ascii_table(rows, headers=headers):
                out.write(line)
        else:
            writer = csv.writer(out)
            if headers:
                writer.writerow(headers)
            writer.writerows(rows)
        return

    if action == "sql":
        # full-Spark-SQL escape hatch (ctx.sql): `tk sql "SELECT ..."`
        if not args.table:
            raise SystemExit("sql action needs a query string")
        df = ctx.sql(" ".join(args.table))
        if args.limit:
            df = df.limit(args.limit)
        rows = [tuple(r) for r in df.collect()]
        headers = None if args.hide_headers else df.columns
        if args.ascii_table:
            for line in ascii_table(rows, headers=headers):
                out.write(line)
        else:
            writer = csv.writer(out)
            if headers:
                writer.writerow(headers)
            writer.writerows(rows)
        return

    if not args.table:
        raise SystemExit("Table name required for %s" % action)
    table_name = args.table[0]
    field_args = args.table[1:]

    if action == "read":
        view = View(table_name, field_args or None)
        order = []
        for item in args.sort:
            if ":" in item:
                col, how = item.rsplit(":", 1)
                order.append((col, how.upper()))
            else:
                order.append(item)
        cursor = view.read(
            filters=args.filter or None,
            order=order or None,
            limit=args.limit,
            offset=args.offset,
            version=args.at,
            groupby=args.groupby or None,
            having=args.having or None,
            qualify=args.qualify,
            distinct=args.distinct,
            rollup=args.rollup,
            cube=args.cube,
        )
        if args.explain:
            plan = cursor.frame()._jdf.queryExecution() \
                .executedPlan().toString()
            out.write(plan)
            return
        rows = cursor.all()
        headers = None if args.hide_headers else [
            f.name for f in view.fields
        ]
        if args.vbar:
            for line in vbar(rows, headers, tic=args.tic):
                out.write(line)
        elif args.ascii_table:
            for line in ascii_table(rows, headers=headers):
                out.write(line)
        elif args.yaml:
            import yaml

            out.write(yaml.safe_dump(
                [dict(zip([f.name for f in view.fields], map(_plain, r)))
                 for r in rows],
                sort_keys=False,
            ))
        else:
            writer = csv.writer(out)
            if headers:
                writer.writerow(headers)
            writer.writerows(rows)
        return

    if action == "write":
        fields, rows = cli_input_data(None, args)
        view = View(table_name, field_args or fields)
        res = view.write(rows, purge=args.purge, filters=args.filter or None)
        logger.info("write result: %s", res)
        return

    if action == "delete":
        view = View(table_name, field_args or None)
        cnt = view.delete(filters=args.filter or None)
        logger.info("deleted %s rows", cnt)
        return

    raise SystemExit('Unknown action "%s"' % action)


def _plain(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


if __name__ == "__main__":
    cli()
