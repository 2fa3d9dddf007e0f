"""Range join: match left rows whose point value falls inside right-side
intervals ``[lo, hi)`` — the interval-assignment join Spark lacks a
shuffle strategy for (a bare ``l.v BETWEEN r.lo AND r.hi`` condition
plans as BroadcastNestedLoopJoin, which is quadratic the moment the
interval side outgrows a broadcast). The reference has no join surface at
all (tanker emits per-table SQL; SURVEY §2.3 "not present" list), so this
is a Spark-first extension in the same family as
:mod:`tanker_spark.operators.asof`.

Lowering (the standard distributed "bin-and-prune" shape, cf. the
published range-join strategies in the Databricks/Flink docs and the
IEJoin literature):

1. pick a bin width ``w`` (given, or derived from the median interval
   width via one tiny ``approxQuantile`` job over the interval side);
2. each LEFT row maps to the single bin ``floor(value / w)`` — map-only;
3. each RIGHT interval explodes to the bins it overlaps
   (``sequence(floor(lo/w), floor(hi/w))``) — fan-out is
   ``interval_width / w``, ~2 rows at the median by construction;
4. join on ``(on-keys…, bin)`` — Catalyst extracts the equi conjuncts as
   the hash/sort-merge key and keeps the exact range predicate as the
   join residual, so AQE treats it like any other shuffle join.

A candidate pair meets in exactly ONE bin (the left value's bin), so the
join emits no duplicates and needs no post-dedup — which is also why
``how='left'`` is just the same join run leftouter. At 100 TB this is one
shuffle keyed by (keys, bin); skew concentrates only where many intervals
overlap one bin, which widening ``bin_width`` (or AQE skew-split)
absorbs. Degenerate giant intervals are the one hazard: an interval
spanning ``s`` bins explodes to ``s`` rows — a lazy in-plan
``raise_error`` guard fails fast before a 10⁹-element ``sequence`` OOMs
an executor.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_BIN = "__rj_bin"

_TIME_TYPES = (T.TimestampType, T.TimestampNTZType, T.DateType)


def _to_line(col, dtype):
    """Project a point/bound column onto the binning number line:
    timestamps/dates → epoch microseconds (exact longs), numerics pass
    through. Both sides of the join go through the SAME mapping, so the
    residual comparison stays exact."""
    if isinstance(dtype, T.DateType):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, _TIME_TYPES):
        return F.unix_micros(col)
    return col


def _default_bin_width(right, lo_line, hi_line):
    """Median interval width (one approxQuantile over the interval side
    — the SMALL side by assumption; at 100 TB this is a sketch
    aggregation, not a collect). Median rather than max so a few giant
    intervals can't force one-bin-per-everything; they explode to more
    bins instead, which the span guard bounds."""
    widths = right.select(
        (hi_line - lo_line).cast("double").alias("__w")
    ).filter(F.col("__w") > 0)
    med = widths.approxQuantile("__w", [0.5], 0.01)
    if not med or med[0] <= 0:
        return 1.0
    return float(med[0])


def range_join(left, right, left_col, lo_col, hi_col, on=None,
               bin_width=None, hi_inclusive=False, how="inner",
               max_bins_per_interval=100_000, suffix=None):
    """Join ``left`` rows to every ``right`` interval containing
    ``left[left_col]``: ``lo <= value < hi`` (``<= hi`` when
    ``hi_inclusive``). ``on`` adds equi-key conjuncts — a string / list
    of column names present on both sides. ``how`` ∈ {'inner', 'left'}
    (leftouter keeps unmatched left rows with NULL interval payload).

    Output: all left columns + the right side's non-key columns. A
    right payload column whose name collides with a left column is an
    error unless ``suffix`` is given, in which case the right twin is
    renamed ``<col><suffix>`` (silently emitting two identically named
    columns would make every downstream name-based select ambiguous).
    Right intervals with ``lo > hi`` (empty) never match. Works on
    numeric, timestamp and date lines; both sides must live on the same
    line.
    """
    on = [on] if isinstance(on, str) else list(on or [])
    how = {"inner": "inner", "left": "leftouter"}.get(how.lower())
    if how is None:
        raise ValueError("range_join: how must be inner|left")
    clash = sorted(
        set(c for c in right.columns if c not in on) & set(left.columns)
    )
    if clash and suffix is None:
        raise ValueError(
            "range_join: right payload columns %s collide with left "
            "columns — rename them or pass suffix='_r'" % clash
        )

    v_line = _to_line(F.col(left_col), left.schema[left_col].dataType)
    lo_line = _to_line(F.col(lo_col), right.schema[lo_col].dataType)
    hi_line = _to_line(F.col(hi_col), right.schema[hi_col].dataType)

    is_time = isinstance(left.schema[left_col].dataType, _TIME_TYPES)
    if bin_width is None:
        bin_width = _default_bin_width(right, lo_line, hi_line)
    elif is_time:
        # callers give timestamp widths in SECONDS; the line is epoch µs
        bin_width = float(bin_width) * 1_000_000
    w = F.lit(float(bin_width))

    # right: one row per (interval, overlapped bin); empty and inverted
    # intervals drop here (sequence(start>stop) would count DOWN). The
    # span guard is IN the plan (raise_error), so no extra action runs.
    lo_bin = F.floor(lo_line / w).cast("long")
    hi_bin = F.floor(hi_line / w).cast("long")
    span = hi_bin - lo_bin + F.lit(1)
    hi_bin_ok = F.when(
        span > F.lit(int(max_bins_per_interval)),
        F.raise_error(F.concat(
            F.lit("range_join: interval spans "), span.cast("string"),
            F.lit(f" bins of width {bin_width} "
                  f"(max {max_bins_per_interval}); raise bin_width"),
        )).cast("long"),
    ).otherwise(hi_bin)
    # alias both sides so the join resolves unambiguously even when left
    # and right derive from the SAME source frame (self-join lineage)
    r_binned = right.filter(lo_line <= hi_line).withColumn(
        _BIN, F.explode(F.sequence(lo_bin, hi_bin_ok))
    ).alias("__rj_r")
    l_binned = left.withColumn(
        _BIN, F.floor(v_line / w).cast("long")
    ).alias("__rj_l")

    def lc(c):
        return F.col(f"__rj_l.{c}")

    def rc(c):
        return F.col(f"__rj_r.{c}")

    l_v = _to_line(lc(left_col), left.schema[left_col].dataType)
    r_lo = _to_line(rc(lo_col), right.schema[lo_col].dataType)
    r_hi = _to_line(rc(hi_col), right.schema[hi_col].dataType)
    cond = lc(_BIN) == rc(_BIN)
    for c in on:
        cond = cond & (lc(c) == rc(c))
    cond = cond & (l_v >= r_lo)
    cond = cond & ((l_v <= r_hi) if hi_inclusive else (l_v < r_hi))

    pay_cols = [c for c in right.columns if c not in on]

    def out_name(c):
        return c + suffix if suffix and c in left.columns else c

    return (
        l_binned.join(r_binned, cond, how)
        .select(*[lc(c).alias(c) for c in left.columns],
                *[rc(c).alias(out_name(c)) for c in pay_cols])
    )
