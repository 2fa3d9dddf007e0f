"""BM25 full-text relevance search over a document corpus — the lookup
side of a training-data pipeline (find near-matches of a benchmark
prompt, audit what the corpus says about a topic, build retrieval
eval sets). The reference has no search surface (tanker is an ORM-ish
query layer; SURVEY §2 "not present" list), so this is a Spark-first
extension alongside dedup/similarity/text.

Two paths, one scoring function (Lucene/Okapi BM25,
``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``):

- :func:`bm25_topk` — ad-hoc: one scan. The query-term filter sits
  immediately on the exploded tokens, so only rows for the handful of
  query terms survive the map side; the shuffles that remain are keyed
  by (doc, term) and term — both bounded by |matching docs| × |query|,
  never by corpus token count. Corpus N/avgdl ride a broadcast one-row
  frame; top-k is a TakeOrderedAndProject.
- :func:`build_text_index` + :func:`bm25_topk_indexed` — repeated
  queries: postings (term, doc, tf, dl) persisted ONCE, parquet
  hive-partitioned by a term-hash prefix. A probe prunes to the
  partitions holding its query terms (PartitionFilters) and never
  re-tokenizes the corpus — the 100 TB path, where tokenization
  dominates and must not be paid per query.

Scores are rounded (4 dp default) and ordered (score DESC, id ASC)
so the selected top-k is reproducible across engines and partition
orderings; the DuckDB oracle mirrors the scoring expression textually.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Observation
from pyspark.sql import functions as F

from .text import tokens

META_SUBDIR = "_bm25_meta"
POSTINGS_SUBDIR = "postings"
_PFX = "pfx"


def _reject_stream_layout(spark, path, caller):
    """Loud guard: the batch-layout reader/appender on a STREAM-built
    index (``streaming.ingest.text_index_sink``'s ``batch=N`` dirs)
    would silently mis-score — the one-row meta read returns one row
    PER BATCH and the stats crossJoin multiplies every posting by the
    batch count; an append would mix ``pfx=`` dirs into a ``batch=``
    partition tree and break discovery. Probe with
    ``bm25_topk_stream_indexed`` or convert once with
    ``text_index_consolidate``.

    The listing rides :mod:`fsio` (the rest of this family is plain
    Spark IO, so the index itself works on any scheme) — a driver-side
    ``os.listdir`` would return NOTHING for a remote path and silently
    wave the mis-scoring case through, the exact failure this guard
    exists to refuse."""
    from .. import fsio

    meta_dir = str(path).rstrip("/") + "/" + META_SUBDIR
    if any(d.startswith("batch=")
           for d in fsio.listdir(spark, meta_dir)):
        raise ValueError(
            "%s: %s is a stream-built index (batch=N layout) — "
            "probe with bm25_topk_stream_indexed or convert with "
            "text_index_consolidate" % (caller, path)
        )


def _pfx_repartition(postings):
    """One hash shuffle on the prefix before the partitioned write —
    each prefix lands in exactly one task, so every directory gets one
    file per write (not tasks × prefixes small files). The EXPLICIT
    partition count matters: a bare ``repartition(col)`` is
    REPARTITION_BY_COL, which AQE happily coalesces to a single
    partition on small inputs — one task then creates all 256 prefix
    dirs serially (~0.6 s of pure file-open latency per write on the
    bench box). REPARTITION_BY_NUM is never coalesced; sizing it from
    the session's parallelism keeps the write parallel at any scale
    while preserving the one-file-per-dir layout (a prefix still maps
    to exactly one task)."""
    n = postings.sparkSession.sparkContext.defaultParallelism
    return postings.repartition(n, F.col(_PFX))


def _query_terms(query):
    """Unique, lowered query terms (BM25 sums once per distinct term)."""
    terms = query.lower().split() if isinstance(query, str) else [
        t.lower() for t in query
    ]
    return sorted(set(terms))


def _bm25_expr(k1, b):
    """The per-(doc, term) contribution, written as ONE expression string
    shared (textually) with the DuckDB oracle so both engines evaluate
    the same IEEE operation sequence."""
    return (
        f"ln((n_docs - df_t + 0.5)/(df_t + 0.5) + 1)"
        f" * tf*({k1}+1)/(tf + {k1}*(1 - {b} + {b}*dl/avgdl))"
    )


def _postings(df, text_col, id_col, obs=None):
    """(id, dl, term, tf): tokenize once, keep per-doc length for the
    length normalization. Map-only until the (id, term) aggregate.
    ``widen`` fans a narrow scan out before the tokenize+explode (no-op
    on many-split inputs — the guard lives in widen).

    ``obs`` (a :class:`pyspark.sql.Observation`) piggybacks the corpus
    stats (``n_docs``/``dl_sum``/``dl_n``) on the pre-explode rows of
    whatever action consumes the postings — the index build/append use
    it to derive their one-row meta from the SAME tokenize pass that
    writes the postings, instead of re-tokenizing the corpus in a
    second stats job (guide §1.2: don't compute things twice). The
    metrics sit ABOVE the explode, so null-text docs (dropped by the
    explode) are still counted in ``n_docs`` and excluded from
    ``dl_n``/``dl_sum`` exactly like the old ``avg``/``sum`` over
    ``size(tokens(...))``.

    The widen fan-out hashes on the DOC ID (not round-robin): every
    consumer aggregates by (doc_id, term), and hash(doc_id) satisfies
    that clustering — the groupBy then rides THIS exchange instead of
    adding one of its own over the exploded token rows, which are
    ~3× the raw bytes here (guide §2.3/§2.4: one exchange, and it
    moves the raw docs, not the exploded intermediate)."""
    from .dedup import widen

    base = widen(df, key=F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    if obs is not None:
        base = base.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("__toks")).alias("dl_sum"),
            F.count(F.size("__toks")).alias("dl_n"),
        )
    return base.select("doc_id", F.size("__toks").alias("dl"),
                       F.explode("__toks").alias("term"))


def bm25_topk(df, query, k=10, text_col="text", id_col="doc_id",
              k1=1.2, b=0.75, round_to=4):
    """Top-``k`` documents by BM25 relevance to ``query`` (a string or a
    list of terms). Returns (doc_id, bm25).

    NOTE: construction is EAGER — the matches frame persists and runs
    one count job up front (it feeds both the scored rows and the df_t
    broadcast build; unpersisted, AQE re-tokenizes the corpus once per
    consumer). Callers composing plans they never execute still pay
    that job, and each distinct (corpus, query) occupies one of the
    dedup module's ``CACHE_CAP`` shared cache slots until evicted /
    ``dedup.release_caches()``. For repeated or batch querying use
    :func:`build_text_index` + :func:`bm25_topk_indexed` or
    :func:`bm25_topk_multi` instead (r10 ADVICE, documented)."""
    from .dedup import _persist, widen

    terms = _query_terms(query)
    toks = _postings(df, text_col, id_col)
    # corpus stats: one tiny aggregate, broadcast onto every scored row
    # (widened like the postings pass — the tokenize is the cost)
    stats = widen(df).select(
        tokens(F.lower(F.col(text_col))).alias("__toks")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )
    m = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    # m feeds BOTH the scored rows and the df_t broadcast build; AQE
    # compiles broadcast builds concurrently and shares no
    # ReusedExchange with the probe side, so an unpersisted m
    # re-tokenizes the corpus once per consumer (the same duplicated-
    # subtree class the pair-dedup family fixed this round). Persist +
    # eager count fills the cache BEFORE the builds compile. The
    # skew-safe groupBy(term) partial aggregation stays — a window
    # over term would funnel a hot term into one task at scale.
    m = _persist(m)
    m.count()
    dfreq = m.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        m.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", F.expr(_bm25_expr(k1, b)))
        .groupBy("doc_id")
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()) \
                 .limit(k)


def bm25_topk_multi(df, queries, k=10, text_col="text",
                    id_col="doc_id", k1=1.2, b=0.75, round_to=4,
                    return_matches=False):
    """Top-``k`` per query for a BATCH of queries in ONE corpus pass —
    row-identical to running :func:`bm25_topk` per query (pinned by
    test), but the corpus tokenizes once for the union of all query
    terms instead of once per query, and the n_docs/avgdl stats
    aggregate runs once instead of per query. ``queries`` is
    [(query_id, query)]; returns (query_id, doc_id, bm25).

    Equivalence: the per-(doc, term) BM25 contribution depends only on
    that term's corpus df and the shared stats — filtering postings to
    the UNION of terms leaves every per-term number unchanged, and each
    query then sums exactly its own terms' contributions via the
    (query_id, term) attach join. The top-k cut per query uses the same
    (bm25 DESC, id ASC) order as the single-query path.

    ``return_matches=True`` additionally returns the persisted matches
    frame ``m`` — one row per (doc_id, term ∈ union of query terms)
    with ``tf``/``dl`` — as ``(result, m)``. An eval harness derives
    graded pseudo-judgments from exactly this frame; handing it out
    saves the caller a separate corpus tokenize that recomputes it
    (guide §1.2)."""
    from pyspark.sql import Window

    from .dedup import _persist, widen

    per_q = [(qid, _query_terms(q)) for qid, q in queries]
    all_terms = sorted({t for _qid, ts in per_q for t in ts})
    toks = _postings(df, text_col, id_col)
    stats = widen(df).select(
        tokens(F.lower(F.col(text_col))).alias("__toks")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )
    m = (
        toks.filter(F.col("term").isin(all_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    # persist + eager count: see bm25_topk — the df_t broadcast build
    # (and, with return_matches, every qrels-side consumer) reuses the
    # one tokenize instead of re-running the subtree per consumer
    m = _persist(m)
    m.count()
    dfreq = m.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    qt = F.explode(
        F.array(*[
            F.struct(F.lit(qid).alias("query_id"), F.lit(t).alias("term"))
            for qid, ts in per_q for t in ts
        ])
    )
    qterms = df.sparkSession.range(1).select(qt.alias("__qt")).select(
        "__qt.query_id", "__qt.term"
    )
    scored = (
        m.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", F.expr(_bm25_expr(k1, b)))
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    out = (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= int(k))
        .select("query_id", "doc_id", "bm25")
    )
    if return_matches:
        return out, m
    return out


def term_prefix(col):
    """Partition key for the persisted postings: 2 hex chars of the term
    hash → 256 partitions, so a probe's PartitionFilters prune ~99% of
    the index regardless of vocabulary size (partitioning BY term would
    mint one directory per vocab entry — a metadata explosion)."""
    return F.substring(F.sha2(col, 256), 1, 2)


def _obs_stats(obs, df, text_col):
    """Corpus stats (n_docs, dl_sum, dl_n) from the :class:`Observation`
    that rode the postings action — with a fallback: when the optimizer
    collapses the input to an empty ``LocalRelation`` (e.g. a
    ``filter(lit(False))`` batch), the ``CollectMetrics`` node is pruned
    with it and the observation never fires (``obs.get`` raises on the
    JVM side). Recompute with an explicit aggregate then — trivially
    cheap in exactly that regime (the plan is a constant-folded empty
    scan). The fallback WARNS: if the observation ever stops firing on
    real input (listener regression, Spark upgrade), a silent recompute
    would quietly restore the 2×-tokenize cost the observed-metrics
    path removed (r10 ADVICE)."""
    try:
        return obs.get
    except Exception:
        from ..utils import logger

        logger.warning(
            "_obs_stats: observation did not fire; recomputing corpus "
            "stats with a second aggregate pass (expected only for "
            "constant-folded empty inputs)"
        )
        row = df.select(
            F.size(tokens(F.lower(F.col(text_col)))).alias("__dl")
        ).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__dl").alias("dl_sum"),
            F.count("__dl").alias("dl_n"),
        ).collect()[0]
        return {"n_docs": row["n_docs"], "dl_sum": row["dl_sum"],
                "dl_n": row["dl_n"]}


def _read_meta_row(spark, path):
    """The one-row index meta as a python dict. Local paths decode the
    single meta parquet file DRIVER-SIDE via pyarrow (~1 ms, zero Spark
    jobs) — the Spark read cost one schema-inference job plus one
    collect job per probe/append, pure per-call overhead at any scale
    (guide §7.3: serial driver time). Scheme-carrying paths (and any
    layout surprise: several files, several rows) fall back to the
    Spark read. Values are identical either way — the same parquet
    pages decode to the same longs/doubles."""
    from .. import fsio

    meta_dir = str(path).rstrip("/") + "/" + META_SUBDIR
    if fsio.is_local(meta_dir):
        import os

        import pyarrow.parquet as pq

        try:
            files = [f for f in os.listdir(meta_dir)
                     if f.endswith(".parquet")]
            if len(files) == 1:
                t = pq.read_table(os.path.join(meta_dir, files[0]))
                if t.num_rows == 1:
                    return {c: t.column(c)[0].as_py()
                            for c in t.column_names}
        except OSError:
            pass  # missing/odd dir: the Spark read raises the
            # canonical loud error below
    return spark.read.parquet(meta_dir).collect()[0].asDict()


def _write_meta(spark, path, n_docs, dl_sum, dl_n):
    """One-row (n_docs, avgdl, dl_sum, dl_n) meta frame, built JVM-side
    (``spark.range(1).select(lit...)``, NOT ``createDataFrame`` — the
    pickled-local-list path spawns a Python worker to emit one row;
    guide §4). ``avgdl`` is the same IEEE double division Spark's
    ``avg`` over an integer column performs (exact long sum, one
    double divide), so meta derived from observed stats is
    bit-identical to the old second-pass aggregate. dl_sum/dl_n ride
    along so :func:`text_index_append` can merge avgdl EXACTLY —
    null-text docs count in n_docs but not dl_n, so a merge weighted
    by n_docs alone would drift when such docs exist."""
    avgdl = float(dl_sum) / dl_n if dl_n else None
    spark.range(1).select(
        F.lit(int(n_docs)).cast("long").alias("n_docs"),
        F.lit(avgdl).cast("double").alias("avgdl"),
        F.lit(None if dl_sum is None else float(dl_sum))
        .cast("double").alias("dl_sum"),
        F.lit(int(dl_n)).cast("long").alias("dl_n"),
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{META_SUBDIR}"
    )


def build_text_index(df, path, text_col="text", id_col="doc_id"):
    """Persist the BM25 index: postings partitioned by term-hash prefix
    + a one-row meta table (n_docs, avgdl). Tokenization — the dominant
    cost — is paid ONCE here (the meta stats ride the postings write as
    observed metrics, not a second tokenize pass), never per query."""
    obs = Observation()
    toks = _postings(df, text_col, id_col, obs=obs)
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
        .withColumn(_PFX, term_prefix(F.col("term")))
    )
    # one shuffle on the prefix before the partitioned write: without
    # it every aggregate task writes a file into every prefix dir it
    # sees (tasks × 256 prefixes ≈ 32k files at the 10M soak — probe
    # listings alone cost seconds), after it each prefix lands in
    # exactly one task → one file per directory. The same lesson as
    # build_ann_index's bucket repartition, re-found by the r8
    # bm25_append soak (11 s/query probes against the 32k-file index).
    postings = _pfx_repartition(postings)
    postings.write.mode("overwrite").partitionBy(_PFX).parquet(
        f"{path}/{POSTINGS_SUBDIR}"
    )
    # postings first, meta last (crash leaves a probe failing loudly on
    # the missing meta, never silently mis-normalized) — same ordering
    # contract as text_index_append
    stats = _obs_stats(obs, df, text_col)
    _write_meta(df.sparkSession, path, stats["n_docs"],
                stats["dl_sum"], stats["dl_n"])
    return path


def text_index_append(new_df, path, text_col="text", id_col="doc_id"):
    """Incremental index maintenance for the text side — the search
    twin of ``similarity.ann_index_append``, completing the
    incremental matrix across every persisted index this package
    maintains (minhash / simhash / embedding / BM25). A batch of new
    documents tokenizes ONCE and its postings append as new partition
    files under the same term-hash prefixes; the historical corpus is
    never re-read, so at 100 TB the steady-state cost is O(batch).

    Correctness after append, by construction:

    - ``df_t`` (document frequency) needs NO stored state — both probe
      paths count it from the matching postings at query time, so it
      is exact over old+new rows the moment the files land.
    - the one-row meta (n_docs, avgdl) merges closed-form:
      ``avgdl' = (n·avgdl + nb·avgdl_b) / (n + nb)`` — two 1-row
      actions, no corpus scan. Postings append FIRST, meta flips last:
      a crash in between leaves scores normalized by the old avgdl
      (slightly stale ranking, no rows lost or double-counted). The
      meta rewrite is a Spark ``overwrite`` (delete-then-write), NOT
      an atomic pointer flip: a probe racing the rewrite window fails
      LOUDLY on the missing meta and should retry — it can never read
      a silently wrong blend of old and new stats (the meta is one
      row in one file).

    Append-only, exactly-once is the CALLER's contract (same as
    ``ann_index_append``): re-appending a doc_id double-counts its
    postings — replay protection belongs to the ingest layer
    (cf. ``streaming/ingest.py``'s batch-id dirs)."""
    _reject_stream_layout(new_df.sparkSession, path,
                          "text_index_append")
    obs = Observation()
    toks = _postings(new_df, text_col, id_col, obs=obs)
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
        .withColumn(_PFX, term_prefix(F.col("term")))
        # prefix repartition before the partitioned write — one file
        # per prefix per append instead of tasks × prefixes (see
        # build_text_index)
        .transform(_pfx_repartition)
    )
    postings.write.mode("append").partitionBy(_PFX).parquet(
        f"{path}/{POSTINGS_SUBDIR}"
    )
    spark = new_df.sparkSession
    old = _read_meta_row(spark, path)
    # the batch stats rode the postings write as observed metrics —
    # the old second tokenize pass over the batch is gone (guide §1.2)
    batch = _obs_stats(obs, new_df, text_col)
    if batch["n_docs"]:
        od = old
        # pre-append indexes lack dl_sum/dl_n: reconstruct from
        # avgdl·n_docs (exact when the old corpus had no null texts,
        # the only regime those indexes could have been correct in)
        o_sum = od.get("dl_sum")
        o_n = od.get("dl_n")
        if o_n is None:
            # avgdl itself can be NULL (empty / all-null-text index):
            # coalesce to 0.0 rather than TypeError on None * int
            o_sum = (old["avgdl"] or 0.0) * old["n_docs"]
            o_n = old["n_docs"]
        elif o_sum is None:
            # dl_n recorded but dl_sum NULL = sum() over zero non-null
            # doc lengths — the old corpus contributed nothing
            o_sum = 0.0
        dl_sum = o_sum + (batch["dl_sum"] or 0)
        dl_n = o_n + batch["dl_n"]
        _write_meta(spark, path, old["n_docs"] + batch["n_docs"],
                    dl_sum, dl_n)
    return path


def _postings_read(spark, path):
    """Reader for a batch-layout postings tree. Local paths supply the
    data schema from ONE parquet footer decoded driver-side (pyarrow),
    skipping the per-probe schema-inference Spark job (guide §7.3:
    per-call driver overhead); the ``pfx`` partition column is typed
    string explicitly — what inference unions the hex dir names to,
    and immune to the all-numeric-prefix corner where inference would
    flip it to int. Remote paths (or any conversion surprise) keep
    inference."""
    from .. import fsio

    pdir = str(path).rstrip("/") + "/" + POSTINGS_SUBDIR
    if fsio.is_local(pdir):
        try:
            import os

            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema
            from pyspark.sql.types import StringType, StructField

            first = None
            for root, _dirs, files in sorted(os.walk(pdir)):
                pf = sorted(f for f in files if f.endswith(".parquet"))
                if pf:
                    first = os.path.join(root, pf[0])
                    break
            if first is not None:
                schema = from_arrow_schema(
                    pq.ParquetFile(first).schema_arrow)
                if _PFX not in schema.fieldNames():
                    schema = schema.add(StructField(_PFX, StringType()))
                return spark.read.schema(schema).parquet(pdir)
        except Exception:
            pass
    return spark.read.parquet(pdir)


def bm25_topk_indexed(spark, path, query, k=10, k1=1.2, b=0.75,
                      round_to=4):
    """Probe a persisted index: partition-pruned postings read (only the
    query terms' hash prefixes are scanned), document-frequency counts
    from the matching postings, same scoring expression as the ad-hoc
    path — a rebuilt probe is row-identical to :func:`bm25_topk` on the
    same corpus (pinned by test). The one-row corpus stats enter the
    scoring expression as LITERALS read driver-side
    (:func:`_read_meta_row`) — same doubles the old broadcast crossJoin
    delivered, minus two Spark jobs per probe."""
    _reject_stream_layout(spark, path, "bm25_topk_indexed")
    terms = _query_terms(query)
    pfx = sorted({
        hashlib.sha256(t.encode()).hexdigest()[:2] for t in terms
    })
    m = (
        _postings_read(spark, path)
        .filter(F.col(_PFX).isin(pfx) & F.col("term").isin(terms))
    )
    md = _read_meta_row(spark, path)
    dfreq = m.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        m.join(F.broadcast(dfreq), "term")
        .withColumn("n_docs", F.lit(md["n_docs"]).cast("long"))
        .withColumn("avgdl", F.lit(md["avgdl"]).cast("double"))
        .withColumn("__s", F.expr(_bm25_expr(k1, b)))
        .groupBy("doc_id")
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()) \
                 .limit(k)


def text_index_consolidate(spark, stream_path, out_path):
    """Consolidate a STREAM-built index (``text_index_sink``'s
    batch=N layout) into the compact batch layout
    (:func:`build_text_index`'s flat postings + one-row meta) WITHOUT
    re-tokenizing anything: postings rewrite minus the batch
    dimension (one file per prefix partition instead of one per
    batch×prefix — a year of 5-minute micro-batches is ~10⁵ files per
    probe listing otherwise), and the meta row is the closed-form sum
    of the per-batch stats. Run it once the stream's checkpoint has
    passed the consolidated batches (their exactly-once replay
    guarantee is no longer needed); the output serves
    :func:`bm25_topk_indexed` and grows further via
    :func:`text_index_append`. Probe results are row-identical across
    the three readers (pinned by test)."""
    postings = spark.read.parquet(
        f"{stream_path}/{POSTINGS_SUBDIR}"
    ).drop("batch")
    (
        _pfx_repartition(postings)
        .write.mode("overwrite").partitionBy(_PFX)
        .parquet(f"{out_path}/{POSTINGS_SUBDIR}")
    )
    (
        spark.read.parquet(f"{stream_path}/{META_SUBDIR}")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            (F.sum("dl_sum") / F.sum("dl_n")).alias("avgdl"),
            F.sum("dl_sum").cast("double").alias("dl_sum"),
            F.sum("dl_n").alias("dl_n"),
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{out_path}/{META_SUBDIR}")
    )
    return out_path


def _stream_postings_read(spark, path):
    """Reader for the STREAM (``batch=N/pfx=XX``) postings layout: same
    footer-schema fast path as :func:`_postings_read`, with the two
    partition columns typed explicitly — ``batch`` long and ``pfx``
    string, what discovery infers for the ``text_index_sink`` layout
    (and for ``pfx``, immune to the all-numeric-prefix corner).
    Remote paths (or any surprise) keep inference."""
    from .. import fsio

    pdir = str(path).rstrip("/") + "/" + POSTINGS_SUBDIR
    if fsio.is_local(pdir):
        try:
            import os

            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema
            from pyspark.sql.types import (LongType, StringType,
                                           StructField)

            first = None
            for root, _dirs, files in sorted(os.walk(pdir)):
                pf = sorted(f for f in files if f.endswith(".parquet"))
                if pf:
                    first = os.path.join(root, pf[0])
                    break
            if first is not None:
                schema = from_arrow_schema(
                    pq.ParquetFile(first).schema_arrow)
                for name, typ in (("batch", LongType()),
                                  (_PFX, StringType())):
                    if name not in schema.fieldNames():
                        schema = schema.add(StructField(name, typ))
                return spark.read.schema(schema).parquet(pdir)
        except Exception:
            pass
    return spark.read.parquet(pdir)


def bm25_topk_stream_indexed(spark, path, query, k=10, k1=1.2, b=0.75,
                             round_to=4):
    """Probe a STREAM-maintained index (``streaming.ingest.
    text_index_sink``): postings read prefix-pruned across every
    ``batch=N`` directory (hive partition discovery exposes batch and
    prefix as partition columns — the prefix filter prunes inside
    every batch), corpus stats sum over the per-batch one-row stats
    frames, and the scoring expression is shared with every other BM25
    path — so the probe is row-identical to ad-hoc :func:`bm25_topk`
    over the union of all streamed batches (pinned by
    streaming_test)."""
    terms = _query_terms(query)
    pfx = sorted({
        hashlib.sha256(t.encode()).hexdigest()[:2] for t in terms
    })
    m = (
        _stream_postings_read(spark, path)
        .filter(F.col(_PFX).isin(pfx) & F.col("term").isin(terms))
    )
    stats = (
        spark.read.parquet(f"{path}/{META_SUBDIR}")
        .agg(F.sum("n_docs").alias("n_docs"),
             (F.sum("dl_sum") / F.sum("dl_n")).alias("avgdl"))
    )
    dfreq = m.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        m.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", F.expr(_bm25_expr(k1, b)))
        .groupBy("doc_id")
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()) \
                 .limit(k)


def _rank(df, score_col, id_col, round_to):
    """Deterministic dense candidate ranking: rank on the ROUNDED score
    (ties broken by id) so an engine re-implementing the same math —
    the DuckDB oracle, a rebuilt index — assigns identical ranks even
    when raw doubles differ past the rounding precision. The input is a
    post-top-k candidate list (≤ n_each rows), so the unpartitioned
    window is driver-trivial by construction — fusion never sees
    corpus-sized data."""
    from pyspark.sql import Window

    s = F.round(F.col(score_col), round_to)
    w = Window.orderBy(s.desc(), F.col(id_col).asc())
    return df.select(
        F.col(id_col).alias("__id"), F.row_number().over(w).alias("__rnk")
    )


def rrf_fuse(ranked, k=10, rrf_k=60, round_to=6):
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09):
    ``score(d) = Σ_lists 1/(rrf_k + rank_list(d))``, a list absent a
    document contributing 0. Input: [(df, score_col, id_col,
    score_round)] candidate lists, each already top-n (tiny). Returns
    (doc_id, rrf) — the standard way to combine lexical and dense
    retrieval without score calibration, since only RANKS cross lists.

    All joins/windows here run on ≤ Σ n_each rows; at 100 TB the cost
    lives entirely in the upstream retrieval ops (term-pruned BM25,
    partition-pruned ANN), which this function is agnostic to."""
    fused = None
    for i, (df, score_col, id_col, score_round) in enumerate(ranked):
        r = _rank(df, score_col, id_col, score_round).withColumnRenamed(
            "__rnk", f"__rnk{i}"
        )
        fused = r if fused is None else fused.join(r, "__id", "full_outer")
    score = None
    for i in range(len(ranked)):
        term = F.coalesce(
            1.0 / (F.lit(rrf_k) + F.col(f"__rnk{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        fused.select(
            F.col("__id").alias("doc_id"),
            F.round(score, round_to).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def hybrid_topk(docs_df, emb_df, query, probe_vec, k=10, n_each=50,
                rrf_k=60, text_col="text", doc_id_col="doc_id",
                vec_col="embedding", vec_id_col="vec_id"):
    """Hybrid retrieval: BM25 over the text corpus + exact cosine over
    the (same-id-space) embedding table, fused by reciprocal rank —
    what a retrieval-eval or hard-negative-mining pipeline runs per
    query. Each leg is its own already-audited scale path; swap in
    :func:`bm25_topk_indexed` / a persisted ANN probe for repeated
    queries at scale and reuse :func:`rrf_fuse` unchanged."""
    from .similarity import cosine_to

    lex = bm25_topk(docs_df, query, k=n_each, text_col=text_col,
                    id_col=doc_id_col)
    # the n_each candidate CUT must ride the ROUNDED score (like
    # bm25_topk's) — cutting on raw doubles lets two engines whose
    # cosines differ past 1e-6 pick different boundary candidates,
    # and rrf_fuse can't repair membership differences
    den_sim = F.round(cosine_to(vec_col, probe_vec), 6)
    den = (
        emb_df.select(F.col(vec_id_col), den_sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(vec_id_col).asc())
        .limit(n_each)
    )
    return rrf_fuse(
        [(lex, "bm25", "doc_id", 4), (den, "cos_sim", vec_id_col, 6)],
        k=k, rrf_k=rrf_k,
    )


def retrieval_metrics(results, qrels, k=10, query_col="query_id",
                      id_col="doc_id", score_col="score",
                      rel_col="rel", round_to=6):
    """Per-query IR evaluation — recall@k, MRR@k, nDCG@k — of a ranked
    ``results`` frame against a graded relevance-judgment frame
    ``qrels`` (rows with ``rel_col <= 0`` are ignored). The eval side
    of the search family: score a retrieval run (BM25, dense, hybrid)
    against judgments, per query.

    Ranks are assigned on ``(score DESC, id ASC)`` — results should
    carry an already-ROUNDED score (as :func:`bm25_topk` and
    :func:`hybrid_topk` emit) so rank assignment is engine-portable.
    Definitions: ``recall@k = |relevant in top-k| / |relevant|``;
    ``MRR@k = 1/rank`` of the first relevant in the top-k (0 when
    none); ``nDCG@k = DCG@k / IDCG@k`` with the standard graded gain
    ``(2^rel - 1)/log2(rank+1)``. Queries present in ``qrels`` but
    retrieving nothing still get their (0-valued) row; queries with
    no positive judgments are dropped (every metric is undefined).

    Returns ``(query_col, recall_at_k, mrr_at_k, ndcg_at_k)``.

    Shape at 100 TB: the ranked window and every join/aggregate are
    keyed by the query; ``results`` is top-k-bounded per query
    upstream, so all frames here are |queries|·k-sized regardless of
    corpus size — the expensive part of an eval run is the retrieval
    itself, never the metric math.
    """
    from pyspark.sql import Window

    pos = qrels.filter(F.col(rel_col) > 0).select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__d"),
        F.col(rel_col).cast("double").alias("__rel"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    topk = (
        results.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= int(k))
        .select(F.col(query_col).alias("__q"),
                F.col(id_col).alias("__d"), "__rank")
    )
    hits = topk.join(pos, ["__q", "__d"]).groupBy("__q").agg(
        F.count(F.lit(1)).alias("__nhit"),
        F.min("__rank").alias("__frank"),
        F.sum(
            (F.pow(2.0, F.col("__rel")) - 1.0)
            / F.log2(F.col("__rank") + 1.0)
        ).alias("__dcg"),
    )
    wi = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__d").asc()
    )
    ideal = (
        pos.withColumn("__ir", F.row_number().over(wi))
        .filter(F.col("__ir") <= int(k))
        .groupBy("__q")
        .agg(
            F.sum(
                (F.pow(2.0, F.col("__rel")) - 1.0)
                / F.log2(F.col("__ir") + 1.0)
            ).alias("__idcg"),
        )
    )
    totals = pos.groupBy("__q").agg(F.count(F.lit(1)).alias("__nrel"))
    return (
        totals.join(ideal, "__q")
        .join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.round(
                F.coalesce(F.col("__nhit"), F.lit(0)) / F.col("__nrel"),
                round_to,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(1.0 / F.col("__frank"), F.lit(0.0)), round_to
            ).alias("mrr_at_k"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"),
                round_to,
            ).alias("ndcg_at_k"),
        )
    )
