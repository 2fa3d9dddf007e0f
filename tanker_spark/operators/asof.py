"""As-of join: for each left row, the latest right row at-or-before its
timestamp (per key) — the event-history join Spark lacks natively
(tanker has no join surface at all; SURVEY §2.3 "not present" list).

Spark-first lowering: instead of a range-condition join (which Catalyst
can only plan as a broadcast-nested-loop or a skewed theta join), the
two sides are UNIONED and the match is a running ``last(..., ignorenulls)``
over a (key, time)-ordered window — ONE shuffle on the key, linear scan
per key, no row explosion. This is the standard distributed as-of shape
and survives any corpus size; skewed keys degrade to a single-task sort
per key, the same bound as any per-key window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SRC = "__asof_src"
_ROW = "__asof_row"


def as_of_join(left, right, by, ts_col, right_cols, suffix="_r"):
    """Left as-of-backward join.

    ``by``: equi-key column name(s); ``ts_col``: ordering column present
    on both sides; ``right_cols``: right-side payload columns to carry.
    Matches are inclusive (a right row AT the left row's timestamp
    wins). Right-side payload lands as ``<col><suffix>``, plus
    ``<ts_col><suffix>`` = the matched right timestamp (NULL when no
    right row precedes the left row).

    The entire matched right row is carried as ONE
    ``last(struct(...), ignorenulls)`` — the struct is non-null exactly
    on right-side rows, so every carried column (payload AND matched
    timestamp) comes from the SAME matched row even when some of its
    payload values are NULL. Carrying columns independently would let a
    NULL payload fall back to an older right row's value while the
    matched timestamp reports the newer row.
    """
    by = [by] if isinstance(by, str) else list(by)
    lcols = left.columns
    # one struct holds the whole right row: matched ts + payload
    fields = [ts_col] + [c for c in right_cols if c != ts_col]
    row_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in fields])
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias(_SRC),
        F.lit(None).cast(row_type).alias(_ROW),
    )
    r_tagged = right.select(
        *[F.col(c) if c in by or c == ts_col else F.lit(None).cast(
            left.schema[c].dataType).alias(c)
          for c in lcols],
        F.lit(0).alias(_SRC),
        F.struct(*[F.col(c) for c in fields]).alias(_ROW),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal timestamps → inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col(_SRC).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col(_ROW), ignorenulls=True).over(w)
    # ts_col is always carried once (last); listing it in right_cols
    # must not emit a duplicate, ambiguous output column
    carried = [
        matched[c].alias(c + suffix)
        for c in right_cols if c != ts_col
    ] + [
        matched[ts_col].alias(ts_col + suffix)
    ]
    out = unioned.select(*lcols, F.col(_SRC), *carried)
    return out.filter(F.col(_SRC) == 1).drop(_SRC)
