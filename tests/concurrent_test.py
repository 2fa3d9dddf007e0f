"""Threaded readers sharing one context (reference:
tests/concurrent_test.py — SparkSession is thread-safe; our ctx stack is
thread-local, so worker threads get the context pushed explicitly)."""

import threading

import pytest

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
        # every claim left a GC-shield marker beside its directory
        for c in claims:
            assert os.path.exists(storage._claim_marker(tdir, c))
    finally:
        for c in claims:  # claimed dirs are empty — clean them up
            os.rmdir(os.path.join(tdir, c))
            os.remove(storage._claim_marker(tdir, c))
    assert set(os.listdir(tdir)) == before


def test_slow_low_version_writer_survives_gc(session, tmp_path):
    """Round-5 ADVICE: a slow writer holding a LOWER claimed version
    must not be GC'd when two later writers commit under keep=2 — its
    .claim marker shields the directory until its own commit; a STALE
    marker (crashed writer, older than CLAIM_TTL) loses the shield."""
    import os

    from tanker_spark import ctx
    from tanker_spark import storage

    tdir = storage.table_dir(ctx.root, "country")
    slow = storage._claim_version(tdir)  # slow writer: claimed, writing
    n_rows = ctx.read("country").count()
    # two fast writers commit after it: under keep=2 the slow claim
    # would previously fall out of the window and be deleted
    # (each write re-reads the CURRENT pointer: older versions get
    # GC'd under a stale lazy plan, by design)
    storage.write_table(ctx.read("country"), ctx.root, "country")
    storage.write_table(ctx.read("country"), ctx.root, "country")
    assert os.path.isdir(os.path.join(tdir, slow)), \
        "claimed-but-uncommitted version was GC'd under the writer"
    # the slow writer finishes its (long) write, then commits:
    # pointer flip sees its dir, marker gone (last-flip-wins)
    ctx.read("country").write.mode("overwrite").parquet(
        os.path.join(tdir, slow))
    storage._commit_pointer(ctx.root, "country", tdir, slow)
    assert not os.path.exists(storage._claim_marker(tdir, slow))
    # crashed-writer path: stale marker (mtime past CLAIM_TTL) is GC'd
    stale = storage._claim_version(tdir)
    marker = storage._claim_marker(tdir, stale)
    old = os.path.getmtime(marker) - storage.CLAIM_TTL - 60
    os.utime(marker, (old, old))
    storage.write_table(ctx.read("country"), ctx.root, "country")
    storage.write_table(ctx.read("country"), ctx.root, "country")
    assert not os.path.isdir(os.path.join(tdir, stale))
    assert not os.path.exists(marker)
    # a commit whose version dir vanished fails LOUDLY, pointer intact
    ghost = storage._claim_version(tdir)
    os.rmdir(os.path.join(tdir, ghost))
    with pytest.raises(RuntimeError, match="lost its version"):
        storage._commit_pointer(ctx.root, "country", tdir, ghost)
    os.remove(storage._claim_marker(tdir, ghost))
    assert ctx.read("country").count() == n_rows


def test_tanker_thread_inherits_context(session):
    """TankerThread parity (reference context.py:140-151 +
    concurrent_test.py): worker threads see the creating thread's
    context WITHOUT explicit stack plumbing — the constructor captures
    a clone of the innermost active context."""
    from queue import Queue

    from tanker_spark import TankerThread

    out_q = Queue()

    def read(i):
        res = View("team", ["name", "country.name"]).read().all()
        out_q.put((i, sorted(res)))

    threads = [TankerThread(target=read, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    expected = sorted(
        [("Blue", "Belgium"), ("Red", "Belgium"), ("Blue", "France")]
    )
    got = {}
    while not out_q.empty():
        i, res = out_q.get()
        got[i] = res
    assert len(got) == 3
    assert all(res == expected for res in got.values())


def test_tanker_thread_without_context():
    """Constructed with no active context: the thread starts with an
    empty stack (reference behavior) and engine calls raise the
    no-context error instead of leaking another thread's state."""
    from queue import Queue

    from tanker_spark import TankerThread

    q = Queue()

    def probe():
        try:
            View("team").read().all()
            q.put("no error")
        except RuntimeError as e:
            q.put(str(e))

    t = TankerThread(target=probe)
    t.start()
    t.join()
    assert "No active tanker_spark context" in q.get()


def test_clone_shares_registry_not_cache(session):
    """ctx.clone(): same registry/spark (shared, read-only), fresh
    DataFrame cache (per-context mutable state)."""
    clone = session.clone()
    assert clone.registry is session.registry
    assert clone.spark is session.spark
    assert clone._df_cache is not session._df_cache


def test_dry_threads_connect_independently(spark, tmp_path):
    """Reference concurrent_dry_test.py: threads created OUTSIDE any
    active context (dry) each open their own ``connect(cfg)`` — the
    thread-local stack keeps the contexts independent; all read the
    same stored data."""
    from queue import Queue

    from tanker_spark import connect, create_tables

    from .conftest import SCHEMA, TEAMS

    cfg = {"root": str(tmp_path / "drydb"), "schema": SCHEMA,
           "spark": spark}
    with connect(cfg):
        create_tables()
        View("team", ["name", "country.name"]).write(TEAMS)

    out_q = Queue()

    def read_in_own_context(i):
        with connect(cfg):
            res = View("team", ["name", "country.name"]).read().all()
            out_q.put((i, sorted(res)))

    threads = [threading.Thread(target=read_in_own_context, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    expected = sorted([tuple(t) for t in TEAMS][:0] or [
        ("Blue", "Belgium"), ("Red", "Belgium"), ("Blue", "France")])
    got = {}
    while not out_q.empty():
        i, res = out_q.get()
        got[i] = res
    assert len(got) == 2 and all(r == expected for r in got.values())
