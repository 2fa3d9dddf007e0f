"""range_join: binned interval join (operators/rangejoin.py).

Semantics pinned against brute force (a collected nested loop) so the
bin-and-prune lowering can never drift from the definition; plan tests
pin the 100 TB property — a shuffle join on (keys, bin), never a
BroadcastNestedLoopJoin or cartesian product.
"""

import pytest
from pyspark.sql import functions as F

from tanker_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id int, v double"
    )


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            ("a", 0.0, 5.0),      # [0, 5)
            ("b", 5.0, 5.0),      # empty under half-open, {5} inclusive
            ("c", 3.0, 12.0),     # overlaps a
            ("d", 18.0, 19.0),
            ("bad", 9.0, 2.0),    # inverted: never matches
        ],
        "name string, lo double, hi double",
    )


def _brute(points, intervals, hi_inclusive=False):
    out = set()
    for p in points.collect():
        for r in intervals.collect():
            hi_ok = p.v <= r.hi if hi_inclusive else p.v < r.hi
            if r.lo <= p.v and hi_ok:
                out.add((p.id, r.name))
    return out


@pytest.mark.parametrize("bin_width", [
    2.0,
    pytest.param(0.5, marks=pytest.mark.slow),
    pytest.param(7.0, marks=pytest.mark.slow),
    pytest.param(100.0, marks=pytest.mark.slow),
])
def test_matches_bruteforce_any_bin_width(points, intervals, bin_width):
    got = {
        (r.id, r.name)
        for r in range_join(
            points, intervals, "v", "lo", "hi", bin_width=bin_width
        ).collect()
    }
    assert got == _brute(points, intervals)


def test_hi_inclusive(points, intervals):
    got = {
        (r.id, r.name)
        for r in range_join(
            points, intervals, "v", "lo", "hi",
            bin_width=2.0, hi_inclusive=True,
        ).collect()
    }
    assert got == _brute(points, intervals, hi_inclusive=True)
    assert (5, "b") in got  # the degenerate single-point interval


def test_left_join_keeps_unmatched_with_nulls(points, intervals):
    out = range_join(
        points, intervals, "v", "lo", "hi", bin_width=2.0, how="left"
    )
    unmatched = {r.id for r in out.filter(F.col("name").isNull()).collect()}
    assert unmatched == {12, 13, 14, 15, 16, 17, 19}
    # matched rows identical to the inner join
    matched = {
        (r.id, r.name)
        for r in out.filter(F.col("name").isNotNull()).collect()
    }
    assert matched == _brute(points, intervals)


def test_equi_keys_restrict_matches(spark):
    left = spark.createDataFrame(
        [(1, "x", 2.0), (2, "y", 2.0)], "id int, k string, v double"
    )
    right = spark.createDataFrame(
        [("x", 0.0, 5.0, "wx"), ("y", 3.0, 5.0, "wy")],
        "k string, lo double, hi double, tag string",
    )
    got = {
        (r.id, r.tag)
        for r in range_join(
            left, right, "v", "lo", "hi", on="k", bin_width=1.0
        ).collect()
    }
    assert got == {(1, "wx")}  # y's interval starts above 2.0


def test_timestamp_line_and_auto_width(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30"), (2, "2024-01-01 01:30:00")],
        "id int, ts string",
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("w1", "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "w string, lo string, hi string",
    ).select(
        "w",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    # explicit width is in SECONDS on a timestamp line
    got = [(r.id, r.w)
           for r in range_join(left, right, "ts", "lo", "hi",
                               bin_width=600).collect()]
    assert got == [(1, "w1")]
    # derived width (median interval) agrees
    got_auto = [(r.id, r.w)
                for r in range_join(left, right, "ts", "lo", "hi").collect()]
    assert got_auto == [(1, "w1")]


def test_self_derived_sides_resolve(spark):
    """Left and right both derive from ONE frame (the oracle query's
    shape: bands computed from the same events scan they join back to) —
    the aliasing must keep the equi key from collapsing trivially true."""
    ev = spark.createDataFrame(
        [("t1", 1.0), ("t1", 9.0), ("t2", 4.0)], "k string, v double"
    )
    bands = ev.groupBy("k").agg(
        F.min("v").alias("lo"), (F.max("v") + 1).alias("hi")
    )
    out = range_join(ev, bands, "v", "lo", "hi", on="k", bin_width=2.0)
    assert out.count() == 3  # every row falls in its own key's band only


def test_plan_is_shuffle_join_not_bnlj(points, intervals):
    plan = range_join(
        points, intervals, "v", "lo", "hi", bin_width=2.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_span_guard_raises(points, intervals):
    with pytest.raises(Exception, match="range_join: interval spans"):
        range_join(
            points, intervals, "v", "lo", "hi",
            bin_width=1e-6, max_bins_per_interval=10,
        ).count()


def test_bad_how_rejected(points, intervals):
    with pytest.raises(ValueError, match="inner|left"):
        range_join(points, intervals, "v", "lo", "hi",
                   bin_width=1.0, how="full")


def test_payload_collision_raises_or_suffixes(spark, points, intervals):
    """Round-5 ADVICE: a right payload column shadowing a left column
    must not silently produce two identically-named output columns —
    raise by default, rename with ``suffix``."""
    shadowing = intervals.withColumnRenamed("name", "id")  # clashes
    with pytest.raises(ValueError, match="collide"):
        range_join(points, shadowing, "v", "lo", "hi")
    out = range_join(points, shadowing, "v", "lo", "hi", suffix="_r")
    assert out.columns == ["id", "v", "id_r", "lo", "hi"]
    # renamed column is selectable and carries the right side's values
    got = {(r.id, r.id_r) for r in out.collect()}
    assert ("0", ) not in got  # smoke: ids are ints, id_r strings
    assert all(isinstance(x, str) for _, x in got)
