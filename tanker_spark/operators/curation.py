"""Training-data curation operators: deterministic sampling, per-group
caps, PII redaction, weighted and temperature-based source mixing,
context-window chunking, shard export, sequence packing.

These are the dataset-shaping verbs of a large-scale LLM data pipeline
(alongside dedup/similarity/text in this package). All are pure
DataFrame transformations: sampling, redaction and chunking are
map-only (whole-stage codegen, no shuffle); capping shuffles once on
the group key; temperature mixing aggregates only the |sources|-row
count frame. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

#: modulus for hash-bucket sampling rates (basis points: 1/10000)
SAMPLE_MOD = 10_000


def hash_bucket(col, mod=SAMPLE_MOD):
    """Deterministic [0, mod) bucket from a column value.

    xxhash64-based: decorrelated from id assignment order, stable across
    runs/cluster sizes — re-running the pipeline reproduces the exact
    sample (unlike ``df.sample``, whose result depends on partitioning).
    """
    return F.pmod(F.xxhash64(col), F.lit(mod))


def sample_hash(df, id_col, fraction, bucket_expr=None):
    """Deterministic fraction sample: keep rows whose hash bucket falls
    below ``fraction``. ``bucket_expr`` overrides the bucket source
    (e.g. a plain modulus for cross-engine reproducibility). Map-only."""
    b = bucket_expr if bucket_expr is not None else hash_bucket(
        F.col(id_col)
    )
    return df.filter(b < int(round(fraction * SAMPLE_MOD)))


def sample_stratified(df, strata_col, fractions, id_col,
                      default_fraction=0.0, bucket_expr=None):
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value → keep-fraction (e.g. downweight a crawl source, keep all of
    a curated one). Map-only: the per-row threshold is a CASE over the
    stratum column; no shuffle, no driver loop."""
    b = bucket_expr if bucket_expr is not None else hash_bucket(
        F.col(id_col)
    )
    thresh = F.lit(int(round(default_fraction * SAMPLE_MOD)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value,
            F.lit(int(round(frac * SAMPLE_MOD))),
        ).otherwise(thresh)
    return df.filter(b < thresh)


def chunk_docs(df, text_col="text", id_col="doc_id", size=64, stride=48):
    """Split documents into overlapping token windows — the
    context-window chunking step before tokenization/packing in a
    training pipeline (stride < size ⇒ overlap of ``size - stride``
    tokens between consecutive chunks, the standard trick to avoid
    truncating semantic units at window borders).

    Per row: whitespace tokens, window starts ``0, stride, 2·stride …``
    while < n_tokens; each chunk carries its 0-based ``chunk_id``, its
    token count (the final chunk may be short) and the re-joined text.

    Map-only — posexplode of a per-row start sequence, no shuffle; at
    100 TB this is a pure scan→scan stage and the output partitioning
    follows the input (good: downstream packing wants doc-locality).
    """
    from .text import tokens

    if int(size) < 1 or int(stride) < 1:
        # stride=0 reaches Spark's sequence() as a zero step — an
        # opaque executor error instead of a driver-side contract
        raise ValueError("size and stride must be >= 1, got size=%r "
                         "stride=%r" % (size, stride))
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(int(stride)),
    )
    ex = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, int(size))
    return ex.select(
        F.col(id_col),
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


#: auto-salt threshold: groups above this row count get the salted
#: pre-pass so no single task ever sorts more than ~this many rows
AUTO_SALT_TARGET = 1_000_000


def _salt_plan(max_group, k, target_rows):
    """Subgroup counts for the cascaded skew pre-passes of
    :func:`cap_per_group`, finest first.

    Level 0 splits the biggest group into ceil(max_group/target)
    subgroups so each task sorts ≤ ~target rows; its survivors are
    k·N₀ rows per group, which the next level re-salts at
    N₁ = ceil(k·N₀/target), and so on until the remaining k·Nᵢ rows
    fit one task (≤ max(target, 2k) — k rows must eventually meet in
    ONE task, so target below 2k can't be honored further). Geometric
    shrink by k/target ⇒ O(log n) levels; per-task input is bounded by
    ~target at EVERY level, independent of group size."""
    target = max(int(target_rows), 1)
    plan = [-(-int(max_group) // target)]
    floor = max(target, 2 * int(k))
    while int(k) * plan[-1] > floor:
        nxt = -(-(int(k) * plan[-1]) // target)
        if nxt >= plan[-1]:
            break  # k >= target: cannot shrink further
        plan.append(nxt)
    return plan


def cap_per_group(df, group_col, k, order_by, salt="auto",
                  target_rows=AUTO_SALT_TARGET):
    """Keep at most ``k`` rows per group (per-domain / per-source caps —
    the classic crawl-balancing op). ``order_by``: list of (col, 'asc' |
    'desc') deciding WHICH k survive. One shuffle on the group key;
    rank + filter stay in the shuffle's partitioning (no extra
    exchange).

    Skew guard (one domain = half the corpus): a pre-pass caps each of
    N deterministic hash-subgroups at ``k``, so at most ``k × N`` rows
    per group reach the final single-partition sort — the giant group
    never lands on one task. ``salt`` controls it:

    - ``"auto"`` (default): one group-count aggregation (map-side
      combined, result is one row) sizes the guard — a CASCADE of
      pre-passes (:func:`_salt_plan`) starting at N =
      ceil(max_group / target_rows), each level re-salting the k×N
      survivors of the previous one, so NO task ever sorts more than
      ~``target_rows`` rows regardless of group size (the round-4
      ceiling of 1024 subgroups left ~max_group/1024 rows in one task
      for a >10⁹-row group). Levels shrink geometrically by
      k/target_rows, so a 10¹²-row group at defaults costs 3 extra
      window passes, all in the same (group, sub) shuffle family. No
      pre-pass when every group fits ``target_rows``.
    - ``None`` / ``0``: no pre-pass (single shuffle, lazy).
    - ``N``: force exactly one pre-pass with N subgroups.

    The subgroup hash covers every HASHABLE column of the row (map
    columns can't feed ``xxhash64`` and are skipped), so a skewed
    group whose rows share the same ordering tuple still splits across
    subgroups. When ``order_by`` is a total order (e.g. it ends with a
    unique id) the salted and unsalted paths keep identical survivors;
    under ordering ties which tied rows survive is arbitrary on BOTH
    paths (``row_number`` tie-break) and may differ between them."""
    order_cols = [
        F.col(c).desc() if str(d).lower().startswith("d") else
        F.col(c).asc()
        for c, d in order_by
    ]
    plan = None
    if salt == "auto":
        mx = (
            df.groupBy(group_col).count()
            .agg(F.max("count").alias("mx")).first()["mx"]
        )
        if mx is None or mx <= target_rows:
            salt = 0
        else:
            plan = _salt_plan(mx, k, target_rows)
            salt = plan[0]
    if salt and int(salt) > 1:
        from pyspark.sql import types as T

        def _hashable(dt):
            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return _hashable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(_hashable(f.dataType) for f in dt.fields)
            return True

        cols = [f.name for f in df.schema.fields
                if _hashable(f.dataType)] or [group_col]
        # correctness of every level: a row in the group's global top-k
        # is in the top-k of ANY subgroup containing it, so it survives
        # each pre-pass — the classic top-k aggregation tree
        for lvl, n in enumerate(plan if plan is not None
                                else [int(salt)]):
            sub = F.pmod(
                F.xxhash64(*[F.col(c) for c in cols], F.lit(lvl)),
                F.lit(int(n)),
            )
            w1 = Window.partitionBy(
                F.col(group_col), sub).orderBy(*order_cols)
            df = (
                df.withColumn("__rk1", F.row_number().over(w1))
                .filter(F.col("__rk1") <= k)
                .drop("__rk1")
            )
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


#: (pattern, replacement) redaction rules — emails, phone numbers, IPv4
#: addresses. Order matters: emails before bare digits. The phone rule
#: only fires on (a) explicit international format (leading ``+``),
#: (b) NANP-style ``555-123-4567`` with ``-``/``.`` separators, or
#: (c) a bare 7-15 digit run — so ordinary numeric prose ("2020 2021
#: 2022", tables of numbers) is NOT redacted (ADVICE round 1; the old
#: rule matched any 8+-char digit/space/hyphen run). RE2-compatible
#: (no lookarounds) so the DuckDB oracle can mirror it exactly.
REDACT_RULES = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+[0-9][0-9()\-\s.]{5,17}[0-9]"
     r"|\(?[0-9]{3}\)?[-.][0-9]{3}[-.][0-9]{4}"
     r"|\b[0-9]{7,15}\b", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def pii_audit(df, text_col="text", id_col="doc_id", rules=None):
    """Per-doc PII occurrence counts (one column per redaction rule) —
    the audit pass a pipeline runs BEFORE committing to redaction, and
    the evidence trail afterwards. Map-only ``regexp_count`` chain,
    same RE2-compatible patterns as :func:`redact`."""
    import re as _re

    rules = rules or REDACT_RULES
    if rules is REDACT_RULES:
        names = ["n_emails", "n_phones", "n_ips"]
    else:
        # custom rule lists: derive a count-column name from each
        # rule's replacement token so EVERY rule gets a column — the
        # old zip against the 3 built-in names silently dropped rule
        # 4+ from the audit
        names = [
            "n_%d_%s" % (i, _re.sub(r"\W+", "", repl).lower() or "rule")
            for i, (_, repl) in enumerate(rules)
        ]
    cols = {
        name: F.regexp_count(F.col(text_col), F.lit(pattern))
        for name, (pattern, _) in zip(names, rules)
    }
    return df.select(F.col(id_col), *[
        c.alias(n) for n, c in cols.items()
    ])


def redact(col, rules=None):
    """Chained regexp_replace PII scrub — map-only, codegen'd, no UDF."""
    out = col
    for pattern, repl in (rules or REDACT_RULES):
        out = F.regexp_replace(out, pattern, repl)
    return out


def redact_df(df, text_col="text", rules=None):
    """Redact ``text_col`` in place; adds a ``redacted`` change flag."""
    clean = redact(F.col(text_col), rules)
    return df.withColumn("redacted", clean != F.col(text_col)) \
             .withColumn(text_col, clean)


def mix_sources_temperature(df, source_col, id_col, alpha=0.5,
                            bucket_expr=None):
    """Temperature-reweighted source mixing — the multilingual /
    multi-source training recipe (e.g. mBERT, XLM-R exponential
    smoothing): the kept subset's source shares follow
    ``p_i ∝ n_i^alpha``, so ``alpha < 1`` upweights small sources
    relative to their raw frequency and ``alpha = 1`` keeps the input
    mix. Keeps the largest subset honoring the target shares: with
    ``T = min_i n_i / frac_i`` the binding source keeps 100% and every
    other keeps ``frac_i · T / n_i``.

    Two tiny aggregates over the per-source count frame (|sources|
    rows) produce the keep fractions, which broadcast back onto the
    scan; row selection is the deterministic hash bucket — map-only
    over the data, reproducible across cluster sizes and re-runs.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    w = counts.select(
        source_col, "__n", F.pow("__n", F.lit(alpha)).alias("__w")
    )
    # __sw stays a true aggregate (sum is order-SENSITIVE in floating
    # point — a window rewrite could flip a keep-fraction ulp); the
    # min-based scale is order-insensitive, so it folds into the same
    # subtree as a global window, dropping one broadcast build chain
    tot = w.agg(F.sum("__w").alias("__sw"))
    k = w.crossJoin(F.broadcast(tot)).select(
        source_col, "__n", (F.col("__w") / F.col("__sw")).alias("__frac")
    )
    keep = k.withColumn(
        "__t",
        F.min(F.col("__n") / F.col("__frac")).over(
            Window.partitionBy(F.lit(1))
        ),
    ).select(
        source_col,
        F.least(
            F.col("__frac") * F.col("__t") / F.col("__n"), F.lit(1.0)
        ).alias("__keep"),
    )
    b = bucket_expr if bucket_expr is not None else hash_bucket(
        F.col(id_col)
    )
    return (
        df.join(F.broadcast(keep), source_col)
        .filter(b < F.floor(F.col("__keep") * SAMPLE_MOD))
        .drop("__keep")
    )


def split_by_group(df, group_df, fractions, id_col="doc_id",
                   group_col="group_id", bucket_expr=None):
    """Leakage-safe train/val/test assignment: the split is decided by
    the row's near-dup GROUP id (from :func:`dedup.neardup_groups`),
    so every member of a duplicate cluster lands in the SAME split —
    the guard against test-set leakage through near-duplicates that
    plain row-hash splitting cannot give. Rows without a group use
    their own id (singleton group).

    ``fractions``: ordered (name, fraction) pairs; fractions must sum
    to 1 (the last split absorbs rounding). One broadcast-friendly
    left join against the group table (tiny relative to the corpus —
    only matched rows have entries), then a map-only deterministic
    bucket of the group id. ``bucket_expr``, when given, is a CALLABLE
    Column → Column (the bucket must be computed from the resolved
    group id, not a fixed column).
    """
    pairs = list(fractions.items() if isinstance(fractions, dict)
                 else fractions)
    total = sum(f for _, f in pairs)
    if abs(total - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1, got %s" % total)
    g = group_df.select(
        F.col("id").alias("__gid_key"), F.col(group_col).alias("__gid")
    )
    joined = df.join(g, df[id_col] == g["__gid_key"], "left").drop(
        "__gid_key"
    )
    gid = F.coalesce(F.col("__gid"), F.col(id_col))
    b = bucket_expr(gid) if bucket_expr is not None else hash_bucket(gid)
    split = F.lit(pairs[-1][0])
    acc = 0.0
    conds = []
    for name, frac in pairs[:-1]:
        acc += frac
        conds.append((int(round(acc * SAMPLE_MOD)), name))
    for threshold, name in reversed(conds):
        split = F.when(b < threshold, F.lit(name)).otherwise(split)
    return joined.withColumn("split", split).drop("__gid")


def mix_sources(dfs_with_weights, id_col, bucket_expr=None):
    """Weighted dataset mixing: union of deterministic samples, one per
    (DataFrame, weight≤1) pair — the 'data recipe' op for training
    mixes. Map-only over each input; the union is plan-level (no
    shuffle)."""
    out = None
    for df, weight in dfs_with_weights:
        part = sample_hash(df, id_col, weight, bucket_expr=bucket_expr)
        out = part if out is None else out.unionByName(part)
    return out


def export_shards(df, path, n_shards, id_col, seed=42, fmt="parquet"):
    """Deterministic shuffled shard export — the delivery step of a
    training-data pipeline: rows land in ``n_shards`` hash-assigned
    shards (``shard=N`` partition dirs) with a within-shard order that
    is a deterministic function of (id, seed), so re-running the
    pipeline reproduces the exact same shard files on any cluster size.

    One shuffle (repartition on the shard id); sorting happens within
    partitions (``sortWithinPartitions`` — no global sort). Bump
    ``seed`` to re-deal the rows into a fresh epoch-level shuffle.

    ``fmt``: ``"parquet"`` (columnar, for further processing) or
    ``"jsonl"`` (Spark's JSON sink is line-delimited — the standard
    trainer-ingest delivery format). Same layout, shuffle and manifest
    either way.
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError("fmt must be 'parquet' or 'jsonl'")
    spark_fmt = "json" if fmt == "jsonl" else fmt
    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                   F.lit(n_shards)).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions(F.xxhash64(F.col(id_col), F.lit(seed + 1)))
        .write.mode("overwrite").partitionBy("shard").format(spark_fmt)
        .save(path)
    )
    # delivery manifest: per-shard row counts + params, written beside
    # the data (underscore prefix = invisible to readers) so a
    # consumer can verify completeness without a scan. Rides fsio —
    # shard export's 100 TB destination IS the object store, and a raw
    # open() would land the data then crash on the manifest
    import json

    from .. import fsio

    rows = (
        df.sparkSession.read.format(spark_fmt).load(path)
        .groupBy("shard").count().collect()
    )
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "format": fmt,
        "total_rows": sum(r["count"] for r in rows),
        "shards": {str(r["shard"]): r["count"] for r in rows},
    }
    fsio.write_text(
        df.sparkSession, str(path).rstrip("/") + "/_manifest.json",
        json.dumps(manifest, indent=1, sort_keys=True))
    return path


class _LeftmostFit:
    """Max segment tree over bin remainders: ``find(need)`` returns the
    LEFTMOST (oldest) bin whose remainder fits ``need`` in O(log B) —
    the same placement decision as a linear first-fit scan, without
    its O(bins) per item. At a 10M-row corpus a partition packs ~10⁵⁻⁶
    items; the linear scan is quadratic there (hours on adversarial
    length mixes), the tree is n·log n."""

    #: empty-leaf sentinel: far below any representable remainder, so
    #: a NEGATIVE need (corrupt length column) can never match an
    #: empty slot — it first-fits into the leftmost REAL bin exactly
    #: like the linear scan did, or opens a new one when none exist
    _EMPTY = -(1 << 62)

    def __init__(self):
        self.n = 0
        self.cap = 1
        self.t = [self._EMPTY, self._EMPTY]

    def append(self, rem):
        if self.n == self.cap:
            leaves = self.t[self.cap:self.cap + self.n]
            self.cap *= 2
            self.t = [self._EMPTY] * (2 * self.cap)
            self.t[self.cap:self.cap + self.n] = leaves
            for i in range(self.cap - 1, 0, -1):
                self.t[i] = max(self.t[2 * i], self.t[2 * i + 1])
        self._set(self.n, rem)
        self.n += 1

    def _set(self, idx, rem):
        i = self.cap + idx
        self.t[i] = rem
        i //= 2
        while i:
            self.t[i] = max(self.t[2 * i], self.t[2 * i + 1])
            i //= 2

    def find(self, need):
        """Leftmost bin index with remainder >= need, or -1."""
        if self.t[1] < need:
            return -1
        i = 1
        while i < self.cap:
            i = 2 * i if self.t[2 * i] >= need else 2 * i + 1
        return i - self.cap

    def place(self, idx, ln):
        """Deduct ``ln`` from bin ``idx``'s remainder (the tree is the
        single owner of remainders — no caller-side shadow copy to
        drift out of sync)."""
        self._set(idx, self.t[self.cap + idx] - ln)


def pack_sequences(df, id_col, len_col, budget, n_partitions=None):
    """Pack items into fixed-budget bins (context-window packing — the
    step between curation and shard export in a training pipeline).

    Distributed first-fit-decreasing: repartition by id hash, sort each
    partition by length descending, then a per-partition greedy
    first-fit over Arrow batches (``mapInPandas`` — packing is
    inherently sequential, so the Python hop is per partition, not per
    corpus). Pack ids are globally unique via the partition id. Items
    longer than the budget get singleton packs.

    Returns (id, item_len, pack_id, pack_fill) — pack_fill is the
    bin's total AFTER adding the item, so the max per pack_id is the
    bin's final occupancy.
    """
    from pyspark import TaskContext
    from pyspark.sql import types as T

    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    prepared = (
        df.select(F.col(id_col), F.col(len_col).cast("long").alias("__len"))
        .repartition(n, F.col(id_col))
        .sortWithinPartitions(F.col("__len").desc(), F.col(id_col))
    )
    out_schema = T.StructType([
        prepared.schema[id_col],
        T.StructField("item_len", T.LongType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("pack_fill", T.LongType()),
    ])

    def _pack(batches):
        import pandas as pd

        pid = TaskContext.get().partitionId()
        # bin b's remaining capacity lives in the tree at index b;
        # find() makes the IDENTICAL leftmost-first-fit choice the
        # old linear scan made, in O(log bins) per item
        tree = _LeftmostFit()
        fills = []
        for pdf in batches:
            rows = []
            for _id, ln in zip(pdf[id_col], pdf["__len"]):
                ln = int(ln)
                b = tree.find(ln)
                if b < 0:
                    b = len(fills)
                    tree.append(budget - ln)
                    fills.append(ln)
                else:
                    tree.place(b, ln)
                    fills[b] += ln
                rows.append(
                    (_id, ln, pid * 10_000_000 + b, fills[b])
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "item_len", "pack_id", "pack_fill"]
            )

    return prepared.mapInPandas(_pack, schema=out_schema)


def sample_to_token_budget(df, budget, len_col, id_col,
                           source_col=None, weights=None,
                           bucket_expr=None):
    """Deterministically sample down to a target token budget — the
    "give me ~N tokens of this corpus" step of assembling a training
    mix. With ``source_col``/``weights``, each source gets
    ``budget × w_s / Σw`` tokens (capped at what the source has; no
    redistribution of a capped source's shortfall — callers wanting
    exact totals should renormalize weights over the uncapped sources).

    Fully lazy like :func:`mix_sources_temperature`: one per-source
    (or global) token-sum aggregate computes keep fractions that
    broadcast back onto the scan, then the deterministic hash bucket
    selects rows map-side — no driver collect, reproducible across
    cluster sizes, and the expected kept token mass is
    ``frac × tokens`` per source (row-level sampling, so the realized
    total fluctuates by O(√n_docs · avg_len)).
    """
    b = bucket_expr if bucket_expr is not None else hash_bucket(
        F.col(id_col)
    )
    if source_col is None or not weights:
        # no per-source weights → uniform allocation, which is exactly
        # the global fraction (was: an empty weight map silently kept
        # ZERO rows for every source)
        tot = df.agg(F.sum(len_col).alias("__toks"))
        frac = F.least(
            F.lit(1.0), F.lit(float(budget)) / F.col("__toks")
        )
        return (
            df.crossJoin(F.broadcast(tot.select(frac.alias("__keep"))))
            .filter(b < F.floor(F.col("__keep") * SAMPLE_MOD))
            .drop("__keep")
        )
    weights = dict(weights or {})
    wsum = float(sum(weights.values())) or 1.0
    pairs = []
    for k, v in sorted(weights.items()):
        pairs.extend([F.lit(k), F.lit(float(v) / wsum)])
    wmap = F.create_map(*pairs) if pairs else F.create_map()
    counts = df.groupBy(source_col).agg(F.sum(len_col).alias("__toks"))
    keep = counts.select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(budget))
            * F.coalesce(wmap[F.col(source_col)], F.lit(0.0))
            / F.col("__toks"),
        ).alias("__keep"),
    )
    return (
        df.join(F.broadcast(keep), source_col)
        .filter(b < F.floor(F.col("__keep") * SAMPLE_MOD))
        .drop("__keep")
    )


def cluster_balance_sample(df, k=8, per_cluster=100, vec_col="embedding",
                           id_col="vec_id", seed=42, method="kmeans"):
    """Topic-balancing sample: cluster the embedding space (MLlib
    KMeans centroids, or the deterministic hash sample) and keep at
    most ``per_cluster`` rows per cluster — the standard counter to
    topic-skewed crawls, where one dominant mode would otherwise eat
    the token budget.

    Composition of existing scale-safe parts: centroids are a
    driver-collected ≤k list (similarity.ivf_centroid_vectors), cell
    assignment is the map-only literal-centroid argmax
    (similarity.ivf_cell_col — no shuffle), and the per-cluster cap is
    :func:`cap_per_group` with its salted skew guard. Appends a
    ``cluster`` column to the kept rows."""
    from .similarity import ivf_cell_col, ivf_centroid_vectors

    cents = ivf_centroid_vectors(
        df, n_cells=k, seed=seed, vec_col=vec_col, id_col=id_col,
        method=method,
    )
    tagged = df.withColumn(
        "cluster", ivf_cell_col(cents, vec_col)
    ).withColumn("__ord", F.xxhash64(F.col(id_col), F.lit(seed)))
    return cap_per_group(
        tagged, "cluster", per_cluster,
        [("__ord", "asc"), (id_col, "asc")],
    ).drop("__ord")


#: hashed-n-gram modulus for DSIR uniform draws (Gumbel keys)
_DSIR_U_MOD = 1 << 40


def _hashed_gram_buckets(text_col, ngram, n_buckets):
    """array<long> of hashed word 1..n-gram buckets for one document —
    pure Column math (lowercase, whitespace split, xxhash64 chain mod
    buckets): no UDF, no shuffle.

    n-grams are hashed WITHOUT building gram strings: level k's hash
    array is ``zip_with`` of level k-1's hashes (shifted) with the
    k-th word — ``h_k[i] = xxhash64(h_{k-1}[i], arr[i+k-1])``. The
    aligned ``slice``s mean the token array is evaluated O(ngram)
    times per ROW; the naive windowed ``element_at(arr, i+j)`` concat
    re-evaluated the split per ELEMENT and was ~30× slower."""
    arr = F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    n = F.size(arr)
    levels = [F.transform(arr, lambda w: F.xxhash64(w))]
    for k in range(2, int(ngram) + 1):
        prev, kk = levels[-1], k
        ln = F.greatest(n - (kk - 1), F.lit(0))
        levels.append(
            F.zip_with(
                F.slice(prev, 1, ln),
                F.slice(arr, kk, ln),
                lambda h, w: F.xxhash64(h, w),
            )
        )
    allh = levels[0] if len(levels) == 1 else F.concat(*levels)
    return F.transform(
        allh, lambda h: F.pmod(h, F.lit(int(n_buckets)))
    )


def _bucket_logprobs(df, text_col, ngram, n_buckets, smoothing, name):
    """(bucket → log prob) table + the smoothed log prob of an unseen
    bucket. One explode → one ≤n_buckets-row aggregate (map-side
    combined); the total is a one-row driver action."""
    import math

    from .dedup import widen

    # widen: the hashed-gram explode is the compute; a one-file corpus
    # would run it on a single core (no-op on many-split inputs)
    ex = widen(df).select(
        F.explode(
            _hashed_gram_buckets(F.col(text_col), ngram, n_buckets)
        ).alias("__b")
    )
    # cache the ≤n_buckets-row aggregate: the totals action below fills
    # it, and the downstream ratio join reuses it — the corpus is
    # exploded ONCE here, not once per action. Registered with the
    # shared cache registry so long-lived drivers can
    # ``dedup.release_caches()`` between corpora.
    from .dedup import _persist

    counts = _persist(
        ex.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    )
    total = counts.agg(F.sum("__c").alias("t")).first()["t"] or 0
    denom = float(total) + float(smoothing) * float(n_buckets)
    lp = counts.select(
        "__b",
        F.log((F.col("__c") + F.lit(float(smoothing)))
              / F.lit(denom)).alias(name),
    )
    unseen = math.log(float(smoothing) / denom)
    return lp, unseen


def dsir_weights(df, target_df, text_col="text", id_col="doc_id",
                 ngram=2, n_buckets=10_000, smoothing=1.0):
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    per-document ``logw = log p_target(x) − log p_raw(x)`` under
    bag-of-hashed-ngrams unigram models — the published recipe for
    steering a raw crawl toward a target domain before training.

    Features are word 1..``ngram``-grams hashed into ``n_buckets``
    buckets (pure Column math, no UDF). Each corpus contributes one
    explode → one ≤``n_buckets``-row count aggregate (shuffle bounded
    by the bucket space after map-side combine, NOT by corpus size);
    the two log-prob tables join into one ≤``n_buckets``-row frame
    that broadcasts into the per-doc sum. Unseen buckets get the
    add-``smoothing`` floor on both sides, so every gram contributes a
    finite log-ratio. Returns ``(id_col, logw)``.

    100 TB shape: two scans of the raw corpus (features+sum), one of
    the (much smaller) target; nothing driver-side exceeds one row per
    bucket."""
    lp_t, unseen_t = _bucket_logprobs(
        target_df, text_col, ngram, n_buckets, smoothing, "__lpt")
    lp_r, unseen_r = _bucket_logprobs(
        df, text_col, ngram, n_buckets, smoothing, "__lpr")
    ratio = (
        lp_t.join(lp_r, "__b", "full")
        .select(
            "__b",
            (F.coalesce(F.col("__lpt"), F.lit(unseen_t))
             - F.coalesce(F.col("__lpr"), F.lit(unseen_r))
             ).alias("__lr"),
        )
    )
    from .dedup import widen

    # keyed widen: the per-doc logw aggregate below clusters on the
    # id, and the ratio join broadcasts — hash(id) here means the agg
    # rides this one exchange (guide §2.4)
    doc_grams = widen(df, key=F.col(id_col)).select(
        F.col(id_col),
        F.explode(
            _hashed_gram_buckets(F.col(text_col), ngram, n_buckets)
        ).alias("__b"),
    )
    return (
        doc_grams.join(F.broadcast(ratio), "__b", "left")
        .groupBy(id_col)
        .agg(F.sum(
            # a bucket in NEITHER corpus: both probs are the smoothed
            # floor — the ratio is unseen_t - unseen_r
            F.coalesce(F.col("__lr"),
                       F.lit(unseen_t - unseen_r))
        ).alias("logw"))
    )


def dsir_resample(df, weights, k, id_col="doc_id", seed=42,
                  temperature=1.0):
    """Importance resampling over :func:`dsir_weights` output: draw
    ``k`` documents without replacement with probability ∝
    exp(logw / temperature), via the Gumbel top-k trick — key =
    logw/T + Gumbel noise, global top-k. The noise derives from
    ``xxhash64(id, seed)`` so the draw is deterministic and
    cluster-size-independent; the top-k lowers to
    TakeOrderedAndProject (per-partition heads, no global sort).
    ``temperature → 0`` degenerates to plain top-k by weight."""
    import math as _math

    u = (F.pmod(F.xxhash64(F.col(id_col).cast("string"),
                           F.lit(int(seed))),
                F.lit(_DSIR_U_MOD))
         + F.lit(0.5)) / F.lit(float(_DSIR_U_MOD))
    gumbel = -F.log(-F.log(u))
    if float(temperature) > 0.0:
        key = (F.col("logw") / F.lit(float(temperature))) + gumbel
    else:
        # T=0: plain top-k by weight (Spark's x/0 is NULL, which would
        # make the sort key all-NULL and the pick arbitrary); the
        # gumbel term only breaks exact-weight ties deterministically
        key = F.col("logw") + gumbel * F.lit(1e-12)
    return (
        df.join(weights, id_col)
        .withColumn("__gk", key)
        .orderBy(F.col("__gk").desc())
        .limit(int(k))
        .drop("__gk")
    )


def mix_unimax(df, group_col, budget, len_col, epochs=1.0,
               id_col="doc_id", bucket_expr=None):
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    distribute a total token ``budget`` as UNIFORMLY as possible
    across groups (languages/sources), capping every group at
    ``epochs × its token count`` — the anti-starvation alternative to
    temperature mixing: low-resource groups are never oversampled past
    ``epochs`` repetitions, and their unused share flows to
    high-resource groups.

    The allocation is the exact water-fill ``alloc_g = min(cap_g, λ)``
    with ``λ = max_i (budget − prefix_i) / (k − i)`` over caps sorted
    ascending (prefix_i = sum of the i smaller caps) — a closed form:
    for the binding row ``λ`` makes the uniform shares of the ``k−i``
    uncapped groups absorb exactly what the ``i`` capped groups left
    on the table. Computed entirely in-plan on the |groups|-row count
    frame (one window + one max — no driver collect), so the operator
    composes lazily like the other mixers. Row selection is the
    deterministic hash bucket at rate ``alloc_g / tokens_g`` —
    map-only, reproducible across cluster sizes and re-runs; realized
    token mass fluctuates by O(√n_docs · avg_len) per group exactly as
    :func:`sample_to_token_budget` documents.
    """
    counts = df.groupBy(group_col).agg(
        F.sum(len_col).cast("double").alias("__toks")
    )
    caps = counts.select(
        group_col, "__toks",
        (F.lit(float(epochs)) * F.col("__toks")).alias("__cap"),
    )
    w = Window.orderBy(F.col("__cap").asc(), F.col(group_col).asc())
    ordered = caps.select(
        group_col, "__toks", "__cap",
        F.coalesce(
            F.sum("__cap").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("__prefix"),
        (F.row_number().over(w) - 1).alias("__j"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ).alias("__k"),
    )
    # λ as a GLOBAL WINDOW max keeps the whole keep-fraction
    # computation one subtree — the old agg + broadcast crossJoin made
    # the |groups|-row counts aggregate a separate broadcast build (its
    # own AQE job chain recomputing the counts subtree; ~4 extra
    # 30 ms jobs per call on the profile). max is order-insensitive,
    # so the double is bit-identical to the aggregate's.
    keep = ordered.withColumn(
        "__lam",
        F.max(
            (F.lit(float(budget)) - F.col("__prefix"))
            / (F.col("__k") - F.col("__j"))
        ).over(Window.partitionBy(F.lit(1))),
    ).select(
        group_col,
        F.least(
            F.lit(1.0),
            F.least(F.col("__cap"), F.col("__lam")) / F.col("__toks"),
        ).alias("__keep"),
    )
    b = bucket_expr if bucket_expr is not None else hash_bucket(
        F.col(id_col)
    )
    return (
        df.join(F.broadcast(keep), group_col)
        .filter(b < F.floor(F.col("__keep") * SAMPLE_MOD))
        .drop("__keep")
    )


def filter_by_group_quantile(df, score_col, group_col, q=0.5,
                             keep="above"):
    """Per-group quantile cut: keep rows whose ``score_col`` is on the
    ``keep`` side ("above"/"below", inclusive) of their OWN group's
    exact interpolated ``q``-quantile — the per-language / per-source
    quality or length cut every curation recipe applies, because a
    single global threshold over-prunes low-resource groups whose
    score distribution sits lower.

    Shape at 100 TB: one (group) aggregate computes every cutoff —
    Spark's ``percentile`` is exact (sort-based within the aggregate
    buffer, spilling; the group count is tiny) — the |groups|-row
    cutoff frame broadcasts back onto the scan and the comparison
    stays in whole-stage codegen. For corpora where even per-group
    exact percentiles are too heavy, swap ``percentile`` for
    ``percentile_approx`` and accept the documented rank error.
    """
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    cuts = df.groupBy(group_col).agg(
        F.percentile(F.col(score_col), F.lit(float(q))).alias("__cut")
    )
    joined = df.join(F.broadcast(cuts), group_col)
    cond = (
        F.col(score_col) >= F.col("__cut")
        if keep == "above"
        else F.col(score_col) <= F.col("__cut")
    )
    return joined.filter(cond).drop("__cut")
