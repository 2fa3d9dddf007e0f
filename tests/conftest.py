"""Shared fixtures: the reference test star schema (FIXTURES.md) over a
temporary storage root. Mirrors /root/reference/tests/base_test.py:22-110."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tanker_spark import View, connect, create_tables, get_spark  # noqa: E402

SCHEMA = """
- table: country
  columns:
    name: varchar
    teams: o2m team.country
    licensees: o2m licensee.country
  key: [name]
  values:
    - name: Belgium
    - name: France
    - name: Holland

- table: team
  columns:
    name: varchar
    country: m2o country.id
    members: o2m member.team
  key: [name, country]

- table: member
  columns:
    name: varchar
    registration_code: varchar
    created_at:
      type: timestamp
      default: current_timestamp
    team: m2o team.id
  key: [registration_code]
  use-index: brin

- table: licensee
  columns:
    country: m2o country.id
    member: m2o member.id
  key: [country, member]

- table: kitchensink
  columns:
    index: integer
    "true": bool
    "false": bool
    "null": varchar
    integer: integer
    bigint: bigint
    float: float
    bool: bool
    floor: float
    epoch: timestamp
    year: timestamp
    timestamp: timestamp
    date: date
    varchar: varchar
    int_array: integer[]
    float_array: float[]
    bool_array: bool[]
    ts_array: timestamp[]
    char_array: varchar[]
    jsonb: jsonb
    bytea: bytea
  key: [index]

- table: timeseries
  columns:
    timestamp: timestamp
    timestamptz: timestamptz
    date: date
  key: [timestamp]
"""

TEAMS = [["Blue", "Belgium"], ["Red", "Belgium"], ["Blue", "France"]]

members = [
    ("Bob", "Belgium", "Blue", "001"),
    ("Alice", "Belgium", "Red", "002"),
    ("Trudy", "France", "Blue", "003"),
]


@pytest.fixture(scope="session")
def spark():
    # default.parallelism=4: the fixtures are tens-of-rows frames, but
    # every defaultParallelism-derived fan-out (widen, the index
    # bucket/prefix repartitions) otherwise launches 32 tasks per tiny
    # job — pure task-launch overhead that made the suite time out the
    # driver's gate. Scale behavior is unchanged (the terms still
    # derive from defaultParallelism; the bench session does not set
    # this).
    return get_spark(extra_conf={
        "spark.sql.shuffle.partitions": "4",
        "spark.default.parallelism": "4",
    })


@pytest.fixture(scope="session")
def _db_template(spark, tmp_path_factory):
    """The reference star-schema db, built ONCE per pytest session.
    Each test's ``session`` fixture then file-copies this tree instead
    of re-running create_tables + the team write through Spark —
    ~5-13 s of Spark jobs per test became a ~10 ms copytree, which is
    what lets the driver's default gate finish (r10 VERDICT item 2).
    The copied tree is bit-identical to a fresh build: managed tables
    are versioned parquet dirs with relative ``_current`` pointers and
    the fixture rows contain no timestamps."""
    root = tmp_path_factory.mktemp("db_template") / "db"
    cfg = {"root": str(root), "schema": SCHEMA, "spark": spark}
    with connect(cfg):
        create_tables()
        View("team", ["name", "country.name"]).write(TEAMS)
    return root


@pytest.fixture
def session(spark, tmp_path, _db_template):
    import shutil

    root = tmp_path / "db"
    shutil.copytree(_db_template, root)
    cfg = {"root": str(root), "schema": SCHEMA, "spark": spark}
    with connect(cfg) as context:
        yield context


def check(expected, result):
    """Order-insensitive golden comparison (reference base_test.py:149-154)."""
    assert sorted(expected) == sorted(result)
