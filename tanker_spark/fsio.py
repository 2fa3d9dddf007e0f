"""Filesystem IO for index maintenance on ANY Hadoop-visible storage.

The persisted-index family (ANN indexes, dedup side tables) keeps its
DATA in parquet — which Spark reads and writes on any configured
filesystem scheme already — but its METADATA (``_ann_meta.json``, the
``_current`` version pointer) and its maintenance swaps historically
used raw ``open()``/``os.rename``, a local-POSIX-only contract
(``utils.require_local_fs``). At the 100 TB deployment target the
object store is the PRIMARY storage, so maintenance needs a path that
never renames a directory: the versioned pointer-flip scheme
(``storage.py`` is the in-repo precedent) — write the new tree as a
fresh ``v_NNNNNN`` directory, atomically overwrite the small
``_current`` pointer file (a single PUT on S3-likes), GC the old tree.

This module is the IO seam that makes that work everywhere: plain
local paths short-circuit to ``os``/``open`` (zero JVM chatter), any
scheme-carrying path goes through the JVM Hadoop ``FileSystem`` API —
the same connector configuration Spark's own reads use, so a path
Spark can read, this module can maintain. Tests exercise the Hadoop
branch by registering a mock scheme backed by the local filesystem
(``fs.mock.impl`` → ``RawLocalFileSystem``), which drives byte-for-
byte the code path an ``s3a://`` deployment takes.
"""

from __future__ import annotations

import os


def is_local(path) -> bool:
    """True when ``path`` is a plain local path (no scheme)."""
    return "://" not in str(path)


def _jfs(spark, path):
    """(jvm FileSystem, jvm Path) for ``path`` under the session's
    Hadoop configuration — the same connectors Spark's reads use."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(str(path))
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath


def exists(spark, path) -> bool:
    if is_local(path):
        return os.path.exists(path)
    fs, p = _jfs(spark, path)
    return fs.exists(p)


def read_text(spark, path) -> str:
    if is_local(path):
        with open(path) as fh:
            return fh.read()
    fs, p = _jfs(spark, path)
    stream = fs.open(p)
    try:
        jvm = spark.sparkContext._jvm
        try:
            # one JVM call for the whole file (commons-io ships with
            # Hadoop); a PQ index's metadata carries ~10⁵ codebook
            # floats as JSON — a byte-at-a-time py4j loop would be
            # 10⁵ gateway round-trips
            data = bytes(jvm.org.apache.commons.io.IOUtils
                         .toByteArray(stream))
        except Exception:
            out = bytearray()
            while True:
                b = stream.read()
                if b < 0:
                    break
                out.append(b & 0xFF)
            data = bytes(out)
        return data.decode("utf-8")
    finally:
        stream.close()


def _is_jvm_not_found(exc) -> bool:
    """True when a py4j-wrapped JVM exception is a not-found, matched
    by class name across the cause chain (Hadoop ``open()`` raises
    ``java.io.FileNotFoundException``; object-store connectors wrap
    their 404s in it). A scheme this session has NO usable connector
    for — ``UnsupportedFileSystemException`` (unknown scheme) or a
    ``ClassNotFoundException`` cause (known scheme, connector jar
    absent) — also maps to not-found: such a scheme cannot hide a
    pointer (every data read on it fails the same way), and
    classifying it as unversioned lets the maintenance ops'
    local-contract refusals fire with their documented ValueError
    instead of a raw py4j error."""
    je = getattr(exc, "java_exception", None)
    for _ in range(16):  # cause chains are short; never loop forever
        if je is None:
            return False
        name = je.getClass().getName()
        if ("FileNotFoundException" in name
                or "UnsupportedFileSystemException" in name
                or "ClassNotFoundException" in name):
            return True
        je = je.getCause()
    return False


def try_read_text(spark, path):
    """``read_text`` or None when the file does not exist. Only
    not-found maps to None — any OTHER error (permissions, transient
    store failures) PROPAGATES, because the caller that matters is
    ``current_version``/``resolve``: treating a versioned root as flat
    on a transient 503 would silently retarget readers (and side-table
    APPENDS) at the bare root beside the ``v_*`` trees, data no
    pointer-resolving reader would ever see again. Failing loudly is
    strictly better than that."""
    try:
        return read_text(spark, path)
    except FileNotFoundError:
        return None
    except Exception as exc:
        if _is_jvm_not_found(exc):
            return None
        raise


def write_text(spark, path, text: str) -> None:
    """Atomic small-file write: local → tmp + ``os.replace``; Hadoop →
    ``create(overwrite=True)`` + single stream close, which is one PUT
    on S3-likes — readers see the old or the new content, never a
    torn file. This is the pointer-flip primitive."""
    data = text.encode("utf-8")
    if is_local(path):
        parent = os.path.dirname(path)
        if parent:  # Hadoop's create() makes parents; match it
            os.makedirs(parent, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    fs, p = _jfs(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(data))
    finally:
        stream.close()


def delete(spark, path, recursive=True) -> None:
    if is_local(path):
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)
        return
    fs, p = _jfs(spark, path)
    if fs.exists(p):
        fs.delete(p, bool(recursive))


def listdir(spark, path):
    """Names (not full paths) of the children of ``path``; empty list
    when it does not exist."""
    if is_local(path):
        try:
            return sorted(os.listdir(path))
        except OSError:
            return []
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


# -- versioned (pointer-flip) directory layout -----------------------------
#
#   root/_current          text file: "v_000001"
#   root/v_000001/...      the live tree (index dir / side table)
#   root/v_000002.claim    claim marker while a writer builds v_000002
#
# The pointer overwrite is the commit. Underscore-prefixed files are
# invisible to parquet readers; the v_* dirs are only reachable via
# the pointer, so a half-written new version is never read.

POINTER = "_current"


def current_version(spark, root):
    """The live version name under ``root``, or None when ``root`` is
    not a versioned layout."""
    txt = try_read_text(spark, str(root).rstrip("/") + "/" + POINTER)
    return txt.strip() if txt else None


def resolve(spark, root):
    """Versioned root → its live version dir; plain path → unchanged.
    Every reader of a maintainable index/side-table path resolves
    through this, so a pointer flip retargets them atomically."""
    root = str(root).rstrip("/")
    cur = current_version(spark, root)
    return root + "/" + cur if cur else root


def next_version(spark, root):
    """Allocate the next version name: one past the highest existing
    ``v_NNNNNN`` dir or claim under ``root`` (claims count so two
    sequential crashed attempts never collide; concurrent writers are
    out of contract — see the single-writer note on the maintenance
    ops). Writes the claim marker and returns ``(name, claim_path)``."""
    root = str(root).rstrip("/")
    seen = [n for n in listdir(spark, root) if n.startswith("v_")]
    nums = []
    for n in seen:
        base = n[2:8]
        if base.isdigit():
            nums.append(int(base))
    name = "v_%06d" % (max(nums, default=0) + 1)
    claim = root + "/" + name + ".claim"
    write_text(spark, claim, "claim")
    return name, claim


def versioned_overwrite(df, root):
    """Overwrite a VERSIONED root's contents atomically: write ``df``
    as the next ``v_NNNNNN`` tree, flip the pointer, GC the old tree.
    The versioned twin of ``df.write.mode("overwrite")`` — an in-place
    overwrite of the live version dir would expose mid-job chaos to
    concurrent readers, which is exactly what the layout exists to
    prevent. Returns the new version dir."""
    spark = df.sparkSession
    root = str(root).rstrip("/")
    name, claim = next_version(spark, root)
    df.write.mode("overwrite").parquet(root + "/" + name)
    commit_version(spark, root, name, claim)
    return root + "/" + name


def cleanup_stale_versions(spark, root):
    """Crash-recovery sweep at maintenance entry. The maintenance ops
    are single-writer BY CONTRACT (unlike ``storage.py``'s table
    claims, which carry a TTL because table writers may race), so at
    entry nothing else can be mid-build and every non-live leftover is
    garbage:

    - a ``v_X.claim`` naming a NON-live version is a crashed writer's
      leftover — drop the tree and the marker;
    - a claim naming the LIVE version is a crash between the pointer
      flip and the claim delete — drop only the marker, never the
      committed tree;
    - a NON-live unclaimed ``v_NNNNNN`` tree is a crash between the
      flip and the old-tree GC in :func:`commit_version` — drop it (at
      the 100 TB target a leaked version tree is a full-size copy of
      the index, the dominant storage cost, and no later commit ever
      revisits it).

    No-op on a flat (pointerless) root. Returns the live version name
    (None when flat)."""
    root = str(root).rstrip("/")
    cur = current_version(spark, root)
    if not cur:
        return None
    names = listdir(spark, root)
    claimed = {n[:-len(".claim")] for n in names if n.endswith(".claim")}
    for n in names:
        if n.endswith(".claim"):
            if n[:-len(".claim")] != cur:
                delete(spark, root + "/" + n[:-len(".claim")])
            delete(spark, root + "/" + n, recursive=False)
        elif (len(n) == 8 and n.startswith("v_") and n[2:].isdigit()
              and n != cur and n not in claimed):
            delete(spark, root + "/" + n)
    return cur


def commit_version(spark, root, name, claim, gc_old=True):
    """Flip the pointer to ``name``, drop the claim, GC the previous
    version tree. The flip is the atomic commit; a reader that
    resolved the OLD version before the flip and reads after the GC
    sees a missing directory and should retry — the same (narrower)
    caveat the classic rename scheme documents."""
    root = str(root).rstrip("/")
    old = current_version(spark, root)
    write_text(spark, root + "/" + POINTER, name)
    delete(spark, claim, recursive=False)
    if gc_old and old and old != name:
        delete(spark, root + "/" + old, recursive=True)
