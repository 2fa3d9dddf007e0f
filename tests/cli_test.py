"""CLI surface tests (reference: tanker/cli.py — read/write/info/init,
csv/yaml, ascii table, vbar)."""

import csv
import io
import os
import sys

import pytest
import yaml

from tanker_spark import cli as tk


@pytest.fixture
def cfg_file(tmp_path, spark):
    from tests.conftest import SCHEMA

    schema_path = tmp_path / "schema.yaml"
    schema_path.write_text(SCHEMA)
    cfg = {"root": str(tmp_path / "db"), "schema": str(schema_path)}
    cfg_path = tmp_path / ".tk.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return str(cfg_path)


def run_cli(argv, cfg_file, stdin=None, capsys=None):
    old_stdin = sys.stdin
    if stdin is not None:
        sys.stdin = io.StringIO(stdin)
    try:
        tk.cli(["--config", cfg_file] + argv)
    finally:
        sys.stdin = old_stdin


def test_cli_roundtrip(cfg_file, capsys, spark):
    run_cli(["init"], cfg_file)
    # write teams via csv stdin
    csv_data = "name,country.name\nBlue,Belgium\nRed,Belgium\n"
    run_cli(["write", "team"], cfg_file, stdin=csv_data)
    capsys.readouterr()

    run_cli(["read", "team", "-s", "name"], cfg_file)
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[0] == ["name", "country.name"]
    assert ["Blue", "Belgium"] in rows and ["Red", "Belgium"] in rows

    # filters + ascii table
    run_cli(["read", "team", "-F", '(= name "Blue")', "-t"], cfg_file)
    out = capsys.readouterr().out
    assert "Blue" in out and "Red" not in out

    # yaml output
    run_cli(["read", "country", "name", "--yaml", "-s", "name"], cfg_file)
    out = capsys.readouterr().out
    data = yaml.safe_load(out)
    assert {"name": "Belgium"} in data

    # info
    run_cli(["info"], cfg_file)
    out = capsys.readouterr().out
    assert "team" in out and "country" in out
    run_cli(["info", "team"], cfg_file)
    out = capsys.readouterr().out
    assert "m2o" in out.lower()

    # vbar over an aggregate
    run_cli(["read", "team", "name", "(count)", "--vbar"], cfg_file)
    out = capsys.readouterr().out
    assert "*" in out

    # delete with filter
    run_cli(["delete", "team", "-F", '(= name "Blue")'], cfg_file)
    run_cli(["read", "team"], cfg_file)
    out = capsys.readouterr().out
    assert "Blue" not in out and "Red" in out

    # version
    run_cli(["version"], cfg_file)
    assert capsys.readouterr().out.strip()


def test_cli_time_travel(cfg_file, capsys, spark):
    run_cli(["init"], cfg_file)
    run_cli(["write", "country", "name"], cfg_file, stdin="name\nSpain\n")
    run_cli(["write", "country", "name"], cfg_file, stdin="name\nItaly\n")
    # current read sees both; --at pins the snapshot after the 1st write
    from tanker_spark import connect, ctx

    import yaml as _yaml
    cfg = _yaml.safe_load(open(cfg_file))
    with connect(cfg):
        versions = ctx.versions("country")
    v_after_first = versions[-2]
    capsys.readouterr()
    run_cli(["read", "country", "name", "--at", str(v_after_first),
             "-s", "name"], cfg_file)
    old = capsys.readouterr().out
    assert "Spain" in old and "Italy" not in old
    run_cli(["read", "country", "name", "-s", "name"], cfg_file)
    now = capsys.readouterr().out
    assert "Spain" in now and "Italy" in now


def test_cli_sql(cfg_file, capsys, spark):
    run_cli(["init"], cfg_file)
    run_cli(["write", "team"], cfg_file,
            stdin="name,country.name\nBlue,Belgium\nRed,Belgium\n")
    capsys.readouterr()
    run_cli(
        ["sql", "SELECT name FROM team ORDER BY name"], cfg_file
    )
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[0] == ["name"] and ["Blue"] in rows and ["Red"] in rows
    run_cli(
        ["sql", "SELECT count(*) AS n FROM team", "-t"], cfg_file
    )
    out = capsys.readouterr().out
    assert "n" in out and "2" in out


def test_cli_groupby_having_distinct(cfg_file, capsys, spark):
    run_cli(["init"], cfg_file)
    csv_data = ("name,country.name\n"
                "Blue,Belgium\nRed,Belgium\nBlue,France\n")
    run_cli(["write", "team", "name", "country.name"], cfg_file,
            stdin=csv_data)
    capsys.readouterr()

    # aggregated read + HAVING from the CLI
    run_cli(
        ["read", "team", "country.name", "(count)",
         "--having", "(> (count) 1)"],
        cfg_file,
    )
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[1:] == [["Belgium", "2"]]

    # explicit -G groupby
    run_cli(
        ["read", "team", "(count)", "-G", "country.name",
         "-s", "country.name"],
        cfg_file,
    )
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[1:] == [["2"], ["1"]]

    # --distinct
    run_cli(["read", "team", "name", "--distinct", "-s", "name"],
            cfg_file)
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[1:] == [["Blue"], ["Red"]]

    # --qualify: each country's alphabetically-first team
    run_cli(
        ["read", "team", "name", "country.name",
         "--qualify",
         "(= 1 (over (row_number) (partition country) (order name)))",
         "-s", "country.name"],
        cfg_file,
    )
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[1:] == [["Blue", "Belgium"], ["Blue", "France"]]

    # --rollup: per-country counts plus the grand-total super-row
    run_cli(
        ["read", "team", "country.name", "(count)",
         "-G", "country.name", "--rollup", "-s", "country.name"],
        cfg_file,
    )
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[1:] == [["", "3"], ["Belgium", "2"], ["France", "1"]]


def test_cli_explain(cfg_file, capsys, spark):
    run_cli(["init"], cfg_file)
    run_cli(["write", "team", "name", "country.name"], cfg_file,
            stdin="name,country.name\nBlue,Belgium\n")
    capsys.readouterr()
    run_cli(["read", "team", "name", "country.name", "--explain"],
            cfg_file)
    out = capsys.readouterr().out
    assert "Scan parquet" in out       # a real physical plan
    assert "BroadcastHashJoin" in out  # the country dim join


def test_cli_diff(cfg_file, capsys, spark):
    """`tk diff table SINCE [UNTIL]`: snapshot CDC as csv."""
    run_cli(["init"], cfg_file)
    run_cli(["write", "team"], cfg_file,
            stdin="name,country.name\nBlue,Belgium\nRed,Belgium\n")
    run_cli(["write", "team"], cfg_file,
            stdin="name,country.name\nBlue,France\nGreen,Belgium\n")
    capsys.readouterr()
    from tanker_spark import connect, ctx
    import yaml as _yaml
    cfg = _yaml.safe_load(open(cfg_file))
    with connect(cfg):
        v1, v2 = ctx.versions("team")[-2:]
    run_cli(["diff", "team", str(v1), str(v2)], cfg_file)
    out = capsys.readouterr().out
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[0][0] == "change"
    changes = {(r[0], r[rows[0].index("name")]) for r in rows[1:]}
    # team's key is (name, country): the second write INSERTS two new
    # key rows; the untouched Red row never appears
    assert changes == {("insert", "Green"), ("insert", "Blue")}
    assert not any(n == "Red" for _c, n in changes)
