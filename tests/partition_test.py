"""Partition-scoped merge: upserts rewrite only touched partitions and
hard-link the rest from the previous snapshot (storage.write_table_partial)."""

import os

from tanker_spark import View, connect, create_tables, ctx
from tanker_spark import storage

import pytest

PSCHEMA = """
- table: reading
  columns:
    site: varchar
    day: varchar
    value: float
  key: [site, day]
  partition_by: [day]
"""


@pytest.fixture
def psession(spark, tmp_path):
    cfg = {"root": str(tmp_path / "pdb"), "schema": PSCHEMA, "spark": spark}
    with connect(cfg) as context:
        create_tables()
        View("reading", ["site", "day", "value"]).write([
            ("a", "2024-01-01", 1.0),
            ("b", "2024-01-01", 2.0),
            ("a", "2024-01-02", 3.0),
            ("a", "2024-01-03", 4.0),
        ])
        yield context


def _partition_inodes(root, name):
    path = storage.current_version_path(root, name)
    out = {}
    for entry in os.listdir(path):
        if not entry.startswith("day="):
            continue
        pdir = os.path.join(path, entry)
        out[entry] = {
            fn: os.stat(os.path.join(pdir, fn)).st_ino
            for fn in os.listdir(pdir) if fn.endswith(".parquet")
        }
    return out


def test_partial_merge_links_unchanged(psession):
    before = _partition_inodes(ctx.root, "reading")
    # touch only 2024-01-02
    View("reading", ["site", "day", "value"]).write([
        ("a", "2024-01-02", 30.0),
        ("b", "2024-01-02", 31.0),
    ])
    after = _partition_inodes(ctx.root, "reading")

    # untouched partitions are hard-links of the previous version's files
    assert after["day=2024-01-01"] == before["day=2024-01-01"]
    assert after["day=2024-01-03"] == before["day=2024-01-03"]
    assert after["day=2024-01-02"] != before["day=2024-01-02"]

    res = View("reading").read(order=["day", "site"]).all()
    assert res == [
        ("a", "2024-01-01", 1.0),
        ("b", "2024-01-01", 2.0),
        ("a", "2024-01-02", 30.0),
        ("b", "2024-01-02", 31.0),
        ("a", "2024-01-03", 4.0),
    ]


def test_partition_move(psession):
    """Updating the partition column moves the row and rewrites BOTH the
    old and the new partition."""
    before = _partition_inodes(ctx.root, "reading")
    # row (a, 2024-01-03) re-keyed by id to a new day
    (rid,) = View("reading", ["id"]).read(
        '(= day "2024-01-03")'
    ).one()
    View("reading", ["id", "site", "day", "value"]).write([
        (rid, "a", "2024-01-04", 40.0)
    ])
    after = _partition_inodes(ctx.root, "reading")
    assert "day=2024-01-04" in after
    assert "day=2024-01-03" not in after or not after["day=2024-01-03"]
    assert after["day=2024-01-01"] == before["day=2024-01-01"]

    res = View("reading").read(order=["day", "site"]).all()
    assert ("a", "2024-01-04", 40.0) in res
    assert all(day != "2024-01-03" for _, day, _v in res)


def test_partition_scoped_delete(psession):
    """delete only rewrites partitions that lost rows; the rest are
    hard-links of the previous snapshot (round-1 VERDICT: delete always
    rewrote the full table)."""
    before = _partition_inodes(ctx.root, "reading")
    n = View("reading", ["site", "day"]).delete(
        filters='(= day "2024-01-02")'
    )
    assert n == 1
    after = _partition_inodes(ctx.root, "reading")
    assert "day=2024-01-02" not in after or not after["day=2024-01-02"]
    assert after["day=2024-01-01"] == before["day=2024-01-01"]
    assert after["day=2024-01-03"] == before["day=2024-01-03"]
    res = View("reading").read(order=["day", "site"]).all()
    assert [r[1] for r in res] == ["2024-01-01", "2024-01-01", "2024-01-03"]

    # delete by data: same partition scoping
    before = _partition_inodes(ctx.root, "reading")
    n = View("reading", ["site", "day"]).delete(
        data=[("b", "2024-01-01")]
    )
    assert n == 1
    after = _partition_inodes(ctx.root, "reading")
    assert after["day=2024-01-03"] == before["day=2024-01-03"]
    assert after["day=2024-01-01"] != before["day=2024-01-01"]

    # no-match delete: nothing rewritten, version pointer untouched
    v = storage.current_version_path(ctx.root, "reading")
    assert View("reading", ["site", "day"]).delete(
        filters='(= day "2099-01-01")'
    ) == 0
    assert storage.current_version_path(ctx.root, "reading") == v


def test_partial_purge(psession):
    cnt = View("reading", ["site", "day", "value"]).write(
        [("a", "2024-01-01", 1.5)],
        purge=True, filters='(= day "2024-01-01")',
    )
    assert cnt["deleted"] == 1  # (b, 2024-01-01) purged
    res = View("reading").read(order=["day", "site"]).all()
    assert res == [
        ("a", "2024-01-01", 1.5),
        ("a", "2024-01-02", 3.0),
        ("a", "2024-01-03", 4.0),
    ]


def test_partitioned_time_travel(psession):
    """Partition-scoped commits keep prior versions complete (links)
    so time travel works on partitioned tables too."""
    v = View("reading", ["site", "day", "value"])
    before = sorted(v.read().all())
    # upsert touching ONE partition -> partial commit
    v.write([("a", "2024-01-02", 99.0)])
    versions = ctx.versions("reading")
    assert len(versions) >= 2
    old = sorted(v.read(version=versions[-2]).all())
    assert old == before                      # pre-upsert snapshot intact
    now = sorted(v.read().all())
    assert ("a", "2024-01-02", 99.0) in now
    assert ("a", "2024-01-02", 3.0) not in now
    # untouched partitions readable from BOTH versions (hard links)
    assert [r for r in old if r[1] == "2024-01-01"] == \
        [r for r in now if r[1] == "2024-01-01"]


ZSCHEMA = """
- table: metric
  columns:
    mid: integer
    code: integer
    value: integer
  key: [mid]
  zorder_by: [code, value]
- table: metric_plain
  columns:
    mid: integer
    code: integer
    value: integer
  key: [mid]
"""


def test_zorder_write_clusters_files(spark, tmp_path):
    """zorder_by clusters the written files: every parquet file covers a
    narrow min/max band of EVERY zorder column (multi-column skipping),
    where the unclustered twin's files each span ~the full range."""
    import pyarrow.parquet as pq

    cfg = {"root": str(tmp_path / "zdb"), "schema": ZSCHEMA,
           "spark": spark}
    rows = [(i, i % 1000, (i * 7919) % 1000) for i in range(20000)]
    # at test scale AQE coalesces the range shuffle into ONE small file
    # (the right call for file sizing — at 100 TB the advisory size
    # yields many files, each clustered); disable coalescing here so
    # file-level stats expose the clustering on 20k rows
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    parts_key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(coalesce_key)
    old_parts = spark.conf.get(parts_key)
    spark.conf.set(coalesce_key, "false")
    spark.conf.set(parts_key, "16")  # 16 z-ranges → ~1/4 span per dim
    try:
        with connect(cfg):
            create_tables()
            View("metric", ["mid", "code", "value"]).write(rows)
            View("metric_plain", ["mid", "code", "value"]).write(rows)
    finally:
        spark.conf.set(coalesce_key, old)
        spark.conf.set(parts_key, old_parts)
    with connect(cfg):
        # round-trip intact (clustering must not lose/alter rows)
        got = View("metric", ["mid", "code", "value"]).read().all()
        assert sorted(got) == sorted(rows)

        def file_spans(tbl):
            path = storage.current_version_path(str(tmp_path / "zdb"), tbl)
            spans = []
            for fn in os.listdir(path):
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(path, fn)).metadata
                cols = {md.row_group(0).column(i).path_in_schema: i
                        for i in range(md.row_group(0).num_columns)}
                span = {}
                for cname in ("code", "value"):
                    mn = min(md.row_group(g).column(cols[cname])
                             .statistics.min for g in range(md.num_row_groups))
                    mx = max(md.row_group(g).column(cols[cname])
                             .statistics.max for g in range(md.num_row_groups))
                    span[cname] = (mx - mn) / 999.0
                spans.append(span)
            return spans

        zspans = file_spans("metric")
        pspans = file_spans("metric_plain")
        assert len(zspans) >= 8  # range partitioning produced real files
        # clustered: average per-file span well under the full range on
        # BOTH dimensions; plain: essentially full range (a file may
        # straddle a z-quadrant boundary, so individual spans vary —
        # the average carries the signal)
        for cname in ("code", "value"):
            zavg = sum(s[cname] for s in zspans) / len(zspans)
            pavg = sum(s[cname] for s in pspans) / len(pspans)
            assert zavg < 0.55, (cname, zavg)
            assert pavg > 0.9, (cname, pavg)
            assert zavg < pavg / 1.8


def test_optimize_rewrites_clustered(spark, tmp_path):
    """ctx.optimize lands a NEW clustered version: rows intact, version
    advanced, old snapshot still time-travelable."""
    from tanker_spark import ctx

    cfg = {"root": str(tmp_path / "odb"), "schema": ZSCHEMA,
           "spark": spark}
    rows = [(i, i % 100, (i * 31) % 100) for i in range(2000)]
    with connect(cfg):
        create_tables()
        View("metric_plain", ["mid", "code", "value"]).write(rows)
        v_before = max(ctx.versions("metric_plain"))
        ctx.optimize("metric_plain", zorder_by=["code", "value"])
        assert max(ctx.versions("metric_plain")) == v_before + 1
        got = View("metric_plain", ["mid", "code", "value"]).read().all()
        assert sorted(got) == sorted(rows)
        # the pre-optimize snapshot is still reachable
        old = View("metric_plain", ["mid"]).read(version=v_before).all()
        assert len(old) == 2000
        # no declared/passed clustering → plain compaction still works
        ctx.optimize("metric_plain")


def test_zorder_within_partitions(spark, tmp_path):
    """partition_by + zorder_by: rows are z-sorted INSIDE each hive
    partition (row groups get narrow code/value bands per partition)."""
    import pyarrow.parquet as pq

    schema = """
    - table: pmetric
      columns:
        mid: integer
        day: varchar
        code: integer
        value: integer
      key: [mid]
      partition_by: [day]
      zorder_by: [code, value]
    """
    cfg = {"root": str(tmp_path / "pzdb"), "schema": schema,
           "spark": spark}
    rows = [(i, "d%d" % (i % 2), i % 500, (i * 31) % 500)
            for i in range(4000)]
    with connect(cfg):
        create_tables()
        View("pmetric", ["mid", "day", "code", "value"]).write(rows)
        got = View("pmetric", ["mid", "day", "code", "value"]).read().all()
        assert sorted(got) == sorted(rows)
        path = storage.current_version_path(str(tmp_path / "pzdb"),
                                            "pmetric")
        pdirs = [d for d in os.listdir(path) if d.startswith("day=")]
        assert sorted(pdirs) == ["day=d0", "day=d1"]
        # inside each partition file the code column is z-clustered:
        # consecutive row blocks cover narrow bands → the sequence of
        # per-block code means is far from random order. Cheap proxy:
        # mean absolute diff of consecutive code values is much lower
        # than for a shuffled column (~500/3 for uniform random).
        for d in pdirs:
            pdir = os.path.join(path, d)
            (fn,) = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            codes = pq.read_table(
                os.path.join(pdir, fn), columns=["code"]
            )["code"].to_pylist()
            jumps = [abs(a - b) for a, b in zip(codes, codes[1:])]
            assert sum(jumps) / len(jumps) < 60, sum(jumps) / len(jumps)


def test_zorder_bits_fit_long(spark):
    """Regression (round-5 ADVICE): with 4 columns at the default
    bits=16 the interleave's top bit landed on the long's sign bit
    (max-valued rows sorted FIRST), and >=5 columns shifted >=64 —
    wrapped mod 64 on the JVM, silently colliding bits across columns.
    Per-column bits are now clamped so the interleave fits 63 bits."""
    import itertools

    for ncols in (4, 5):
        cols = ["c%d" % i for i in range(ncols)]
        # every min/max corner of the ncols-dim cube
        rows = [tuple(corner) for corner in
                itertools.product((0, 1000), repeat=ncols)]
        df = spark.createDataFrame(rows, cols)
        z = storage.zorder_column(df, cols)
        got = df.select(*cols, z.alias("z")).collect()
        by_row = {tuple(r[c] for c in cols): r["z"] for r in got}
        # no sign-bit flip: every z-value non-negative
        assert all(v >= 0 for v in by_row.values())
        # Morton monotonicity at the corners: all-max strictly dominates
        # every other corner, all-min is the global minimum
        zmax = by_row[(1000,) * ncols]
        zmin = by_row[(0,) * ncols]
        assert zmax == max(by_row.values())
        assert zmin == min(by_row.values())
        # no cross-column collision: every corner gets a distinct z
        assert len(set(by_row.values())) == len(rows)


def test_gc_spares_concurrent_claimed_version(tmp_path):
    """Regression (round-5 ADVICE): post-commit GC used to apply the
    keep-window over ALL version dirs — a slow concurrent writer's
    claimed-but-uncommitted v_000004 fell outside keep=2 once two newer
    commits landed, and the fast writer deleted it mid-write. GC now
    only considers versions <= the one this writer just committed."""
    tdir = tmp_path / "t"
    tdir.mkdir()
    for v in ("v_000001", "v_000002", "v_000003", "v_000004"):
        (tdir / v).mkdir()
        (tdir / v / "part-0.parquet").write_text("x")
    # this writer commits v_000003; v_000004 is a slow writer's claim
    storage._gc_versions(str(tdir), "v_000003", None)
    left = sorted(p.name for p in tdir.iterdir())
    assert left == ["v_000002", "v_000003", "v_000004"]


def test_sequential_upserts_flat_cost(spark, tmp_path):
    """Per-upsert cost must not grow with version-chain length
    (BENCH_NOTES.md: round-4's apparent monotonic pass growth was
    noise; KEEP_VERSIONS GC bounds the chain at 2 dirs so the
    hard-link loop is O(partitions), not O(history)). Guard: the last
    three of ten sequential upserts may not cost more than 2x the
    first three (generous — a real O(history) bug is >3x by pass 10)."""
    import time

    schema = """
    - table: seq
      columns:
        name: varchar
        day: varchar
        value: float
      key: [name, day]
      partition_by: [day]
    """
    cfg = {"root": str(tmp_path / "sdb"), "schema": schema,
           "spark": spark}
    rows = [("n%d" % i, "d%d" % (i % 20), float(i))
            for i in range(5000)]
    touch = [r for r in rows if r[1] in ("d0", "d1")]
    with connect(cfg):
        create_tables()
        v = View("seq", ["name", "day", "value"])
        v.write(rows)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            v.write(touch)
            times.append(time.perf_counter() - t0)
        head = sorted(times[:3])[1]
        tail = sorted(times[-3:])[1]
        assert tail <= head * 2.0, times
        # retention actually bounds the chain on disk
        assert len(ctx.versions("seq")) <= 2
