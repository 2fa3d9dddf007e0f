"""Threaded readers sharing one context (reference:
tests/concurrent_test.py — SparkSession is thread-safe; our ctx stack is
thread-local, so worker threads get the context pushed explicitly)."""

import threading

from tanker_spark import View
from tanker_spark.utils import CTX_STACK


def test_threaded_reads(session):
    results = {}
    errors = []

    def worker(i):
        try:
            CTX_STACK.reset([session])
            res = View("team", ["name", "country.name"]).read().all()
            results[i] = sorted(res)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    expected = sorted(
        [("Blue", "Belgium"), ("Red", "Belgium"), ("Blue", "France")]
    )
    assert all(res == expected for res in results.values())


def test_threaded_writes(session):
    errors = []

    def worker(i):
        try:
            CTX_STACK.reset([session])
            View("country", ["name"]).write([("X%d" % i,)])
        except Exception as e:
            errors.append(e)

    # writes serialize through the version-pointer flip; run sequentially
    # in threads to check ctx plumbing, not write contention
    for i in range(3):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        t.join()
    assert not errors
    names = {n for (n,) in View("country", ["name"]).read().all()}
    assert {"X0", "X1", "X2"} <= names
