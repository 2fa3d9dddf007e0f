"""Parquet-backed table storage with snapshot versioning.

Managed tables live under ``<root>/<table>/v_NNNNNN/`` parquet directories
with a ``_current`` pointer file — a poor-man's snapshot store that gives:

- **read/write isolation**: Spark cannot overwrite a path it is lazily
  reading from; writing a fresh version directory and flipping the pointer
  sidesteps that entirely (the same reason Delta/Iceberg never rewrite in
  place).
- **atomic commits**: the pointer file is replaced with ``os.replace``.
- **time travel** for free (older versions kept until GC).

External tables (read-only inputs such as ``/root/testdata/sf*/``) are a
single ``<root>/<table>.parquet`` file or a plain parquet directory; they are
readable but not writable through this engine.

At 100 TB the write path maps 1:1 onto Delta/Iceberg commits; partitioned
tables (``partition_by`` in the schema) are written with ``partitionBy`` so
partition pruning applies on read.
"""

from __future__ import annotations

import os
import shutil

CURRENT = "_current"
KEEP_VERSIONS = 2


def table_dir(root: str, name: str) -> str:
    return os.path.join(root, name)


def _pointer_path(root, name):
    return os.path.join(table_dir(root, name), CURRENT)


def current_version_path(root, name):
    ptr = _pointer_path(root, name)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        version = fh.read().strip()
    return os.path.join(table_dir(root, name), version)


def list_versions(root, name):
    """Version numbers present on disk (ascending). The retention
    window (``keep_versions``, default 2) bounds how far back time
    travel reaches."""
    tdir = table_dir(root, name)
    if not os.path.isdir(tdir):
        return []
    return sorted(
        int(v[2:]) for v in os.listdir(tdir)
        if v.startswith("v_") and not v.endswith(".claim")
    )


def version_path(root, name, version):
    """Path of an explicit snapshot version (int), or raise KeyError
    listing what is still on disk."""
    p = os.path.join(table_dir(root, name), "v_%06d" % version)
    if not os.path.isdir(p):
        raise KeyError(
            'Table "%s" has no snapshot v_%06d — on disk: %s'
            % (name, version, list_versions(root, name))
        )
    return p


def external_path(root, name):
    """Read-only single-file / plain-dir parquet table."""
    p = os.path.join(root, name + ".parquet")
    if os.path.exists(p):
        return p
    p = os.path.join(root, name)
    if os.path.isdir(p) and not os.path.exists(os.path.join(p, CURRENT)):
        # a plain parquet dir (no version pointer): external
        if any(f.endswith(".parquet") for f in os.listdir(p)):
            return p
    return None


def resolve_path(root, name):
    cur = current_version_path(root, name)
    if cur:
        return cur
    ext = external_path(root, name)
    if ext:
        return ext
    return None


def exists(root, name):
    return resolve_path(root, name) is not None


def local_footer_schema(path, spark=None):
    """Spark schema of a LOCAL unpartitioned parquet table, decoded
    driver-side from one file footer (pyarrow) — the same trick as
    ``search._postings_read``: supplying the schema to ``spark.read``
    skips the per-read schema-inference Spark job (one job + driver
    round-trips PER read at any scale; guide §7.3). Returns ``None``
    whenever the fast path does not provably apply — remote paths,
    partitioned dirs (footers lack the partition columns), empty dirs,
    INT96 timestamps (arrow decodes them naive, Spark infers them
    TimestampType), a session whose ``inferTimestampNTZ`` flag departs
    from the 4.x default, or any pyarrow/conversion surprise — and the
    caller falls back to Spark's own inference. Footer→Spark agreement
    for the shipped testdata tables is pinned by
    tests/storage_test.py::test_footer_schema_matches_inference."""
    p = str(path)
    if "://" in p:
        return None
    try:
        if spark is not None and spark.conf.get(
            "spark.sql.parquet.inferTimestampNTZ.enabled", "true"
        ) != "true":
            return None
        if os.path.isdir(p):
            names = os.listdir(p)
            if any(os.path.isdir(os.path.join(p, n)) for n in names):
                return None  # possibly partitioned: let Spark infer
            pf = sorted(n for n in names if n.endswith(".parquet"))
            if not pf:
                return None
            p = os.path.join(p, pf[0])
        elif not p.endswith(".parquet"):
            return None
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        f = pq.ParquetFile(p)
        pq_schema = f.schema
        if any(pq_schema.column(i).physical_type == "INT96"
               for i in range(len(pq_schema.names))):
            return None
        # prefer_timestamp_ntz mirrors Spark 4's inference of naive
        # (isAdjustedToUTC=false) parquet timestamps as TimestampNTZ;
        # _nullable mirrors file-source relations always reporting
        # nullable=true regardless of the footer's required flags
        return _nullable(from_arrow_schema(f.schema_arrow,
                                           prefer_timestamp_ntz=True))
    except Exception:
        return None


def _nullable(dt):
    """Recursively mark every field/element nullable — Spark file-source
    relations report all-nullable schemas whatever the footer says."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _nullable(f.dataType), True, f.metadata)
            for f in dt.fields
        ])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_nullable(dt.keyType), _nullable(dt.valueType),
                         True)
    return dt


def read_table(spark, root, name, schema=None, version=None):
    """Load a table DataFrame; ``version`` (int) reads an older
    retained snapshot instead of the current pointer (time travel —
    Delta's ``VERSION AS OF``). External tables have no versions."""
    if version is not None:
        path = version_path(root, name, version)
    else:
        path = resolve_path(root, name)
    if path is None:
        raise KeyError(
            'Table "%s" has no data under %s — run create_tables()'
            % (name, root)
        )
    if schema is None:
        schema = local_footer_schema(path, spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


#: claimed-but-uncommitted versions older than this many seconds lose
#: their GC protection (a crashed writer's stale claim must not pin
#: garbage forever). A healthy writer that takes longer than this to
#: commit ONE version should raise it.
CLAIM_TTL = 24 * 3600


def _claim_marker(tdir, version):
    return os.path.join(tdir, version + ".claim")


def _claim_version(tdir):
    """Atomically claim the next version directory.

    Two concurrent writers both list the same latest version; the
    loser of the ``os.mkdir`` race (atomic on POSIX) retries with the
    next number instead of silently writing INTO the winner's
    directory (which Spark's overwrite mode would clobber). Commit
    ordering is still last-pointer-flip-wins — the same optimistic
    model as Delta without conflict retry; concurrent upserts to the
    same table can lose the earlier writer's rows, exactly like two
    un-coordinated MERGEs.

    A sibling ``<version>.claim`` marker (NOT inside the dir — Spark's
    overwrite mode wipes the dir contents at write start) shields the
    claimed version from :func:`_gc_versions` until the claimer commits
    and removes it: without it, a slow writer holding a LOW version
    number is GC'd as soon as two later writers commit under keep=2,
    and its eventual pointer flip would target a deleted directory.
    Stale markers (crashed writers) expire after ``CLAIM_TTL``."""
    versions = sorted(v for v in os.listdir(tdir) if v.startswith("v_")
                      and not v.endswith(".claim"))
    n = int(versions[-1][2:]) + 1 if versions else 1
    while True:
        nxt = "v_%06d" % n
        try:
            os.mkdir(os.path.join(tdir, nxt))
            with open(_claim_marker(tdir, nxt), "w") as fh:
                fh.write(str(os.getpid()))
            return nxt
        except FileExistsError:
            n += 1


def zorder_column(df, cols, bits=16):
    """Z-value ``Column`` over ``cols`` — the Morton interleave of each
    column normalized to ``bits`` bits.

    Sorting the write by this value clusters rows so every parquet file
    / row group covers a NARROW min/max range of EVERY zorder column at
    once — the multi-column file-skipping trick Delta's ``OPTIMIZE
    ZORDER BY`` uses: a filter on any one (or several) of the columns
    prunes most row groups from the scan, where a plain lexicographic
    sort only helps its leading column.

    Normalization bounds come from ONE tiny min/max aggregate (a
    metadata-scale driver action — the one extra source pass a
    clustered write costs; Delta does the same sampling). Strings use
    an order-preserving 4-byte big-endian prefix proxy; dates and
    timestamps their epoch value; NULLs sort to 0. The result embeds
    the bounds as literals, so the expression is deterministic across
    the repartition and the sort that both evaluate it."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    proxies = []
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, T.StringType):
            p = None
            for i in range(1, 5):
                b = F.coalesce(F.ascii(F.substring(col, i, 1)), F.lit(0))
                p = b if p is None else p * F.lit(256) + b
            proxies.append(p.cast("double"))
        elif isinstance(dt, T.DateType):
            proxies.append(col.cast("timestamp").cast("double"))
        else:
            proxies.append(col.cast("double"))
    aggs = []
    for i, p in enumerate(proxies):
        aggs.append(F.min(p).alias("mn%d" % i))
        aggs.append(F.max(p).alias("mx%d" % i))
    stats = df.agg(*aggs).first()
    # the full interleave must fit 63 bits: at the default bits=16 a
    # 4-column z-value would land its top bit on the long's sign bit
    # (those rows sort FIRST, breaking Morton monotonicity) and >=5
    # columns would shift >=64, which the JVM wraps mod 64 — silently
    # colliding bits across columns. Fewer bits per column is a
    # resolution loss, not a correctness loss.
    bits = min(bits, 63 // max(1, len(cols)))
    top = (1 << bits) - 1
    norms = []
    for i, p in enumerate(proxies):
        mn, mx = stats["mn%d" % i], stats["mx%d" % i]
        if mn is None or mx is None or mx == mn:
            norms.append(F.lit(0).cast("long"))
            continue
        scaled = (
            (F.coalesce(p, F.lit(mn)) - F.lit(mn))
            / F.lit(mx - mn) * F.lit(float(top))
        )
        norms.append(F.least(F.greatest(
            scaled.cast("long"), F.lit(0)), F.lit(top)))
    k = len(norms)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, n in enumerate(norms):
            bit = F.shiftright(n, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def write_table(df, root, name, partition_by=None, keep=None,
                zorder_by=None):
    """Write a new version directory and atomically flip the pointer.
    ``keep`` overrides KEEP_VERSIONS (the time-travel horizon).
    ``zorder_by`` clusters the written files by the Morton interleave
    of the named columns (see :func:`zorder_column`)."""
    tdir = table_dir(root, name)
    os.makedirs(tdir, exist_ok=True)
    nxt = _claim_version(tdir)
    target = os.path.join(tdir, nxt)
    if partition_by:
        # co-locate each hive partition's rows in one task before the
        # partitioned write: without this every one of the N shuffle
        # partitions opens a file in every hive partition (N× small
        # files — slow scans AND an N×-bigger hard-link loop on
        # partition-pruned commits). Hash-partitioning on the partition
        # cols caps it at one file per hive partition; a skewed giant
        # partition serializes into one task — split such tables by a
        # finer partition_by instead.
        df = df.repartition(*partition_by)
        if zorder_by:
            # cluster INSIDE each hive partition's single file: row
            # groups get narrow zorder-column ranges for skipping
            df = df.sortWithinPartitions(zorder_column(df, zorder_by))
    elif zorder_by:
        z = zorder_column(df, zorder_by)
        df = df.repartitionByRange(z).sortWithinPartitions(z)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
    _commit_pointer(root, name, tdir, nxt)
    _gc_versions(tdir, nxt, keep)
    return target


def _gc_versions(tdir, committed, keep):
    """GC version dirs beyond the retention window — but NEVER a version
    newer than the one this writer just committed (a concurrent writer
    may have claimed — and still be filling — a higher number), and NEVER
    a version holding a live ``.claim`` marker: a SLOW writer on a LOWER
    number would otherwise fall out of the keep window as soon as two
    later writers commit under keep=2, and its eventual pointer flip
    would target a deleted directory. Markers older than ``CLAIM_TTL``
    are treated as crashed writers and collected anyway."""
    import time

    versions = sorted(
        v for v in os.listdir(tdir)
        if v.startswith("v_") and not v.endswith(".claim")
        and v <= committed
    )
    now = time.time()
    for old in versions[:-(keep or KEEP_VERSIONS)]:
        marker = _claim_marker(tdir, old)
        try:
            if now - os.path.getmtime(marker) < CLAIM_TTL:
                continue  # claimed by a live concurrent writer
        except OSError:
            pass  # no marker: committed long ago, normal GC
        shutil.rmtree(os.path.join(tdir, old), ignore_errors=True)
        try:
            os.remove(marker)
        except OSError:
            pass


def _commit_pointer(root, name, tdir, version):
    """Atomically flip the table pointer to ``version`` and release its
    claim marker. Verifies the version directory still exists first —
    if a (mis-tuned CLAIM_TTL / manual) GC deleted it, readers must see
    the old snapshot and the writer a loud error, not a dangling
    pointer."""
    if not os.path.isdir(os.path.join(tdir, version)):
        raise RuntimeError(
            "commit of %s %s lost its version directory before the "
            "pointer flip (GC'd under this writer? raise CLAIM_TTL)"
            % (name, version)
        )
    tmp = _pointer_path(root, name) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, _pointer_path(root, name))
    try:
        os.remove(_claim_marker(tdir, version))
    except OSError:
        pass


def _link_tree(src, dst):
    """Hard-link a file tree (fall back to copy across devices)."""
    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        target_dir = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(target_dir, exist_ok=True)
        for fn in filenames:
            s = os.path.join(dirpath, fn)
            d = os.path.join(target_dir, fn)
            try:
                os.link(s, d)
            except OSError:  # cross-device: copy
                shutil.copy2(s, d)


def write_table_partial(df_changed, root, name, partition_by,
                        changed_values, keep=None, zorder_by=None):
    """Partition-scoped merge commit: write only the partitions touched by
    a merge; hard-link every untouched partition directory from the
    previous version into the new one.

    This is the snapshot-store analog of Delta's partition-pruned MERGE /
    dynamic partition overwrite: at 100 TB an upsert that touches 3 of
    10,000 date partitions rewrites only those 3 — the rest are O(1)
    directory links. ``changed_values``: list of tuples of partition-col
    values (single-level supported per partition col nesting)."""
    prev = current_version_path(root, name)
    tdir = table_dir(root, name)
    os.makedirs(tdir, exist_ok=True)
    nxt = _claim_version(tdir)
    target = os.path.join(tdir, nxt)

    df_changed = df_changed.repartition(*partition_by)
    if zorder_by:
        df_changed = df_changed.sortWithinPartitions(
            zorder_column(df_changed, zorder_by)
        )
    (df_changed
     .write.mode("overwrite").partitionBy(*partition_by)
     .parquet(target))

    # link untouched partitions from the previous version
    changed_dirs = set()
    for values in changed_values:
        parts = [
            "%s=%s" % (c, "__HIVE_DEFAULT_PARTITION__" if v is None else v)
            for c, v in zip(partition_by, values)
        ]
        changed_dirs.add(parts[0])
    if prev and os.path.isdir(prev):
        for entry in os.listdir(prev):
            if not entry.startswith(partition_by[0] + "="):
                continue  # _SUCCESS etc.
            if entry in changed_dirs:
                continue
            _link_tree(
                os.path.join(prev, entry), os.path.join(target, entry)
            )

    _commit_pointer(root, name, tdir, nxt)
    _gc_versions(tdir, nxt, keep)
    return target


def drop_table(root, name):
    shutil.rmtree(table_dir(root, name), ignore_errors=True)
