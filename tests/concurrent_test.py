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


def test_concurrent_version_claim(session, tmp_path):
    """Two writers racing the version allocator get DISTINCT version
    directories (os.mkdir atomic claim) — the loser retries with the
    next number instead of clobbering the winner's files. Commit order
    stays last-pointer-flip-wins (documented optimistic model)."""
    import os

    from tanker_spark import ctx
    from tanker_spark import storage

    tdir = storage.table_dir(ctx.root, "country")
    before = set(os.listdir(tdir))
    claims = []

    def claimer():
        claims.append(storage._claim_version(tdir))

    threads = [threading.Thread(target=claimer) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    try:
        assert len(set(claims)) == 8  # no duplicate claims
    finally:
        for c in claims:  # claimed dirs are empty — clean them up
            os.rmdir(os.path.join(tdir, c))
    assert set(os.listdir(tdir)) == before
