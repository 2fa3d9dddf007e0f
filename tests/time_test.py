"""Temporal type round-trips, ported from /root/reference/tests/time_test.py.

Spark collects TimestampType as naive datetimes in the session timezone
(UTC here), so tz-aware expectations compare instants, not tzinfo.
"""

from datetime import date, datetime, timezone, timedelta

from pandas import DataFrame, date_range

from tanker_spark import View

BRU = timezone(timedelta(hours=1))  # Europe/Brussels (winter)

record = {
    "timestamp": datetime(2018, 1, 1, 0, 0, 0),
    "timestamptz": datetime(2018, 1, 2, 0, 0, 0, tzinfo=BRU),
    "date": date(2018, 1, 3),
}


def test_time_basic(session):
    view = View("timeseries")
    view.write([record])
    for col in record:
        (value,) = View("timeseries", [col]).read().one()
        expected = record[col]
        if col == "timestamptz":
            # stored as instant; collected naive-UTC
            assert value.replace(tzinfo=timezone.utc) == expected
        else:
            assert value == expected


def test_time_str_formats(session):
    """String inputs parse via the closed format list (utils.TIME_FMT)."""
    view = View("timeseries")
    rows = [
        {"timestamp": "2018-01-01 00:00:00",
         "timestamptz": "2018-01-02 00:00:00+0100", "date": "2018-01-03"},
        {"timestamp": "2018-06-01T12:30:00",
         "timestamptz": "2018-06-02T12:30:00+0000", "date": "2018-06-03"},
    ]
    view.write(rows)
    res = View("timeseries", ["timestamp"]).read(
        order="timestamp"
    ).all()
    assert res[0][0] == datetime(2018, 1, 1)
    assert res[1][0] == datetime(2018, 6, 1, 12, 30)


def test_pandas_roundtrip(session):
    rng = date_range("2020-01-01", periods=24, freq="h")
    df = DataFrame({"timestamp": rng})
    view = View("timeseries", ["timestamp"])
    view.write(df)
    out = view.read(order="timestamp").df()
    assert list(out["timestamp"]) == list(rng)


def test_pa_norm_session_tz():
    """Naive TIMESTAMPTZ values staged via the arrow fast path are
    interpreted in the SESSION timezone, like the pandas/row fallbacks
    (ADVICE round 1: the paths only agreed because get_spark pins UTC)."""
    from datetime import datetime, timezone

    from pyspark.sql import types as T

    from tanker_spark.view import _pa_norm

    naive = datetime(2024, 1, 1, 12, 0)
    (out,) = _pa_norm([naive], T.TimestampType(), "Europe/Brussels")
    assert out == datetime(2024, 1, 1, 11, 0, tzinfo=timezone.utc)
    # UTC session: naive values pass through untouched — pa.array
    # stores the same wall time for a naive value as for its aware-UTC
    # twin, so no reconstruction is needed (staging fast path)
    (out_utc,) = _pa_norm([naive], T.TimestampType(), "UTC")
    assert out_utc == naive and out_utc.tzinfo is None
    aware = datetime(2024, 1, 1, 12, 0, tzinfo=timezone.utc)
    (out_aw,) = _pa_norm([aware], T.TimestampType(), "Europe/Brussels")
    assert out_aw == aware
