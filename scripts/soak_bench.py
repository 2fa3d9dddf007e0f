"""Skew/soak bench past sf0.1 (round-6 VERDICT #6): generate a
synthetic N-doc corpus with the pathologies 100 TB web text actually
has — zipfian source skew, ~25% planted EXACT duplicates in hot
classes (boilerplate copied thousands of times), ~5% near-duplicate
variants — and time the dedup-family operators end-to-end at a scale
where sf0.1 (5k docs) stresses nothing.

Generation is fully distributed (spark.range + column expressions; no
driver loop, no collect): ~10M docs ≈ 2 GB parquet in ~1 min on
local[32]. Usage:

    python scripts/soak_bench.py [--rows 10000000] [--dir /tmp/tk_soak]
    python scripts/soak_bench.py --skip-gen   # reuse an existing dir

Results are recorded in BENCH_NOTES.md (driver rounds do NOT run this
— it is the scale-evidence artifact the per-round sf0.1 bench cannot
provide)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tanker_spark import get_spark  # noqa: E402


def generate(spark, n_rows, path):
    """documents.parquet twin of the testdata schema
    (doc_id, text, lang, source, n_chars), with:

    - zipfian sources: source rank r gets ~1/r of the corpus
      (floor(1/u) capped at 50 — the classic inverse-CDF draw, from a
      per-row hash so it is deterministic and distributed);
    - 25% exact duplicates: 1000 boilerplate templates, each copied
      ~n/4000 times (hot classes — the hot-bucket killer);
    - 5% near duplicates: a template with one word swapped per doc;
    - 70% unique docs: ~60 pseudo-words derived from the row id.
    """
    n_templates = 1000
    u = (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) + 1) / 10_000.0
    src_rank = F.least(F.floor(1.0 / u), F.lit(50)).cast("int")
    roll = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100))
    tmpl_id = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_templates))
    # template text: 40 words deterministic in tmpl_id (NOT the row id)
    tmpl_words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.lit("t"), F.pmod(F.xxhash64(tmpl_id, i), F.lit(5000))
        ),
    )
    tmpl_text = F.concat_ws(" ", tmpl_words)
    # near-dup: same template, one word position replaced per doc
    swap_pos = F.pmod(F.xxhash64("id", F.lit(4)), F.lit(40)) + 1
    near_words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.when(
            i == swap_pos,
            F.concat(F.lit("x"), F.pmod(F.xxhash64("id", F.lit(5)),
                                        F.lit(100_000))),
        ).otherwise(
            F.concat(F.lit("t"), F.pmod(F.xxhash64(tmpl_id, i),
                                        F.lit(5000)))
        ),
    )
    near_text = F.concat_ws(" ", near_words)
    uniq_words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64("id", i), F.lit(50_000))
        ),
    )
    uniq_text = F.concat_ws(" ", uniq_words)
    text = (
        F.when(roll < 25, tmpl_text)
        .when(roll < 30, near_text)
        .otherwise(uniq_text)
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"),
                F.lit("fr"), F.lit("es")),
        (F.pmod(F.xxhash64("id", F.lit(6)), F.lit(6)) + 1).cast("int"),
    )
    df = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), src_rank).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    df.write.mode("overwrite").parquet(path + "/documents.parquet")


def generate_embeddings(spark, n_rows, path, dim=64, n_clusters=4096):
    """embeddings.parquet twin (vec_id, embedding float[], label) with
    the structure the similarity family is built for:

    - ``n_clusters`` true centroids (hash-derived, uniform [-1,1] per
      dim, norm ≈ √(dim/3)); every vector = centroid + 0.3-amplitude
      noise, so same-cluster strangers sit at cos ≈ 0.91 — BELOW a
      0.95 dedup threshold;
    - ~10% planted near-exact duplicates: rows in the same 10-id group
      that roll the dup branch share the GROUP's noise draw plus a
      0.002 jitter (cos ≈ 0.9999 — safely above any threshold), and
      inherit the group's cluster so they land in one cell;
    - fully distributed: per-component hash expressions, no UDF, no
      driver loop.
    """
    def unit(seed_col, j, salt):
        # deterministic pseudo-uniform in [-1, 1]
        return (
            F.pmod(F.xxhash64(seed_col, j + salt), F.lit(2001)) / 1000.0
            - 1.0
        )

    roll = F.pmod(F.xxhash64("id", F.lit(21)), F.lit(100))
    group = (F.col("id") - F.pmod(F.col("id"), F.lit(10)))
    seed = F.when(roll < 10, group).otherwise(F.col("id"))
    cluster = F.pmod(F.xxhash64(seed, F.lit(22)), F.lit(n_clusters))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            unit(cluster, j, F.lit(100))          # centroid component
            + 0.3 * unit(seed, j, F.lit(200))     # spread within cell
            + 0.002 * unit(F.col("id"), j, F.lit(300))  # dup jitter
        ).cast("float"),
    )
    df = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        cluster.cast("int").alias("label"),
    )
    df.write.mode("overwrite").parquet(path + "/embeddings.parquet")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dir", default="/tmp/tk_soak")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of bench names")
    args = ap.parse_args()
    # 10M docs on local[32] = 32 concurrent tasks sharing ONE driver
    # JVM; the per-round default (8g) OOMs during the signature
    # shuffle. 48g ~ 1.5g/task — the local-mode stand-in for ordinary
    # per-executor memory on a real cluster.
    # 128 shuffle partitions: at 10M docs the default 32 leaves ~4x
    # more per-task aggregate/window state than a real cluster would —
    # partition count is sized to the data, exactly as it would be
    # per-job at 100 TB (AQE coalesces the small ones back down)
    spark = get_spark(app_name="tanker_spark_soak",
                      extra_conf={"spark.driver.memory": "48g",
                                  "spark.sql.shuffle.partitions": "128",
                                  # soak-only: the UI REST API is the
                                  # per-leg shuffle-volume evidence
                                  "spark.ui.enabled": "true"})

    if not args.skip_gen:
        t0 = time.perf_counter()
        generate(spark, args.rows, args.dir)
        generate_embeddings(spark, args.rows, args.dir)
        print("# generated %d rows in %.1fs" % (
            args.rows, time.perf_counter() - t0), file=sys.stderr)

    from tanker_spark.operators import curation, dedup, similarity

    docs = spark.read.parquet(args.dir + "/documents.parquet")
    emb = spark.read.parquet(args.dir + "/embeddings.parquet")

    def minhash_soak():
        # spanning mode: the full expansion's intra pairs are the true
        # (quadratic) answer — ~1000 classes x (2500 choose 2) pairs at
        # 10M rows; the spanning set carries identical components
        pairs = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=4,
            threshold=0.5, expand_members=False,
        )
        n = pairs.count()
        dedup.release_caches()
        return n

    def exact_dedup_soak():
        return dedup.dedup_exact(docs, "text", "doc_id").count()

    def dsir_soak():
        target = docs.filter(F.col("source") == "src1")
        w = curation.dsir_weights(docs, target, ngram=2,
                                  n_buckets=8192)
        return curation.dsir_resample(
            docs, w, 10_000, temperature=0.5).count()

    def curation_v2_soak():
        # surprisal band re-centered for this corpus: the pseudo-word
        # vocabulary sits at 12-15 bits (vs ~6 for the driver
        # testdata); 15.0 ~ the corpus mean keeps roughly half the
        # rows so the dedup + mix stages do real work
        import __spark_entry__ as entry_mod
        return entry_mod.curation_pipeline_v2(
            spark, args.dir, surp_max=15.0).count()

    def decontam_soak():
        # the R-S decontamination shape: ~1k-doc benchmark side vs the
        # full corpus. ~25% of the bench sample are boilerplate
        # templates, so the flagged set is large — per-side exact
        # collapse and member expansion both work at scale here
        key = F.pmod(F.xxhash64("doc_id", F.lit(99)), F.lit(10_000))
        bench = docs.filter(key == 0)
        train = docs.filter(key != 0)
        _, audit = dedup.near_decontaminate(
            train, bench, threshold=0.8, return_audit=True)
        n = audit.count()
        dedup.release_caches()
        return n

    def embedding_neardup_soak():
        # auto_n_planes sizes buckets from the 10M count; planted dups
        # verify at cos ~0.9999, same-cluster strangers at ~0.91.
        # verify="gemm" pinned (auto picks it past 2M rows anyway):
        # the ~n*1024*bands candidate dots run as per-bucket BLAS
        pairs = dedup.embedding_dedup_pairs(
            emb, threshold=0.95, verify="gemm")
        n = pairs.count()
        dedup.release_caches()
        return n

    def semdedup_soak():
        # target 128 rows/cell -> k ~ 78k centroids: above
        # TWO_LEVEL_ASSIGN_MIN_K, so this drives the coarse-then-fine
        # assignment path (sqrt-k coarse matrix per task) at the scale
        # it exists for; pair space = O(128 x 10M) scored rows
        kept = similarity.semdedup(
            emb, target_cluster_rows=128, threshold=0.95)
        n = kept.count()
        dedup.release_caches()
        return n

    def knn_join_lsh_soak():
        # 10k queries vs the 10M corpus through hyperplane buckets;
        # multiprobe=1 — the ball explodes per-query candidates ~7x
        # per extra radius step and per-pair scoring is Column math
        queries = emb.filter(F.pmod("vec_id", F.lit(1000)) == 0)
        res = similarity.knn_join(queries, emb, k=5, method="lsh",
                                  multiprobe=1)
        n = res.count()
        dedup.release_caches()
        return n

    def knn_join_gemm_soak():
        # 1k queries, EXACT top-5 over all 10M rows: one BLAS multiply
        # per corpus partition against the broadcast query matrix
        queries = emb.filter(F.pmod("vec_id", F.lit(10_000)) == 0)
        res = similarity.knn_join(queries, emb, k=5, method="gemm")
        n = res.count()
        dedup.release_caches()
        return n

    def substring_dedup_soak():
        # corpus-wide duplicated-window stats: the 25% boilerplate
        # templates are full-doc duplicated spans. Shuffle volume is
        # ~tokens/stride x 8-byte hashes
        out = dedup.substring_dup_stats(docs, win=20, stride=5)
        n = out.filter(F.col("dup_ratio") > 0.5).count()
        dedup.release_caches()
        return n

    def ann_index_soak():
        # persisted quantized index at 10M + a 100-probe latency sweep:
        # the build is the one-off cost, probes must stay sub-second
        # through PartitionFilters pruning + int8 first pass
        import shutil
        path = args.dir + "/ann_index"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        similarity.build_ann_index(
            emb, path, method="lsh", n_planes=10, quantize=True)
        build_s = time.perf_counter() - t0
        probes = [r["embedding"] for r in
                  emb.filter(F.pmod("vec_id", F.lit(100_000)) == 7)
                  .collect()]
        t0 = time.perf_counter()
        total = 0
        for p in probes:
            total += len(similarity.knn_indexed(
                spark, path, p, k=10, multiprobe=1,
                rerank_df=emb).collect())
        probe_s = (time.perf_counter() - t0) / max(len(probes), 1)
        print("# ann_index: build %.1fs, %.3fs/probe over %d probes"
              % (build_s, probe_s, len(probes)), file=sys.stderr)
        return total

    def pq_index_soak():
        # PQ-coded index at 10M x 64d: train (capped driver sample) +
        # encode (one mapInPandas GEMM-argmax pass) + partitioned
        # write; then a 100-probe ADC+rerank latency sweep and the
        # on-disk size vs the int8 index (the memory rung the layout
        # buys). Rerank recall vs the full-float brute top-10 rides
        # along on 5 probes.
        import shutil
        import subprocess
        path = args.dir + "/pq_index"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        similarity.build_ann_index(
            emb, path, method="lsh", n_planes=10, quantize="pq")
        build_s = time.perf_counter() - t0
        sz = subprocess.run(["du", "-sb", path], capture_output=True,
                            text=True).stdout.split()[0]
        i8 = args.dir + "/ann_index"
        sz8 = (subprocess.run(["du", "-sb", i8], capture_output=True,
                              text=True).stdout.split()[0]
               if os.path.isdir(i8) else "n/a")
        probes = [r["embedding"] for r in
                  emb.filter(F.pmod("vec_id", F.lit(100_000)) == 7)
                  .collect()]
        t0 = time.perf_counter()
        total = 0
        for p in probes:
            total += len(similarity.knn_indexed(
                spark, path, p, k=10, multiprobe=1,
                rerank_df=emb).collect())
        probe_s = (time.perf_counter() - t0) / max(len(probes), 1)
        hits = 0
        for p in probes[:5]:
            want = {r.vec_id for r in
                    similarity.knn_brute(emb, p, k=10).collect()}
            got = {r.vec_id for r in similarity.knn_indexed(
                spark, path, p, k=10, multiprobe=1,
                rerank_df=emb).collect()}
            hits += len(want & got)
        print("# pq_index: build %.1fs, %.3fs/probe over %d probes, "
              "%s bytes on disk (int8 index: %s), recall@10 %.2f "
              "over 5 brute-checked probes"
              % (build_s, probe_s, len(probes), sz, sz8, hits / 50),
              file=sys.stderr)
        return total

    def pq_residual_soak():
        # residual vs raw PQ at the same byte budget on the CLUSTERED
        # 10M corpus (generate_embeddings plants 4096 clusters — 16x
        # more than the 256-entry codebooks can memorize raw). The
        # same-cluster top-10 margin (~1e-3 cosine between planted
        # twins) sits BELOW code resolution for both layouts, so
        # ADC-only top-10 is the wrong metric here; what the layout
        # controls is (a) reconstruction error — mean |ADC − true cos|
        # over the probed cells — and (b) whether the true top-10
        # SURVIVES into the rerank_k=256 shortlist the production
        # two-pass probe re-scores exactly.
        import shutil
        probes_src = [r["embedding"] for r in
                      emb.filter(F.pmod("vec_id", F.lit(2_000_000)) == 7)
                      .collect()]
        out = {}
        for name, resid in (("raw", False), ("residual", True)):
            path = args.dir + "/pq_" + name
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.perf_counter()
            similarity.build_ann_index(
                emb, path, method="ivf", n_cells=256, quantize="pq",
                pq_residual=resid)
            build_s = time.perf_counter() - t0
            errs, hits = [], 0
            for p in probes_src:
                true = {r.vec_id: r.cos_sim for r in
                        similarity.knn_brute(emb, p, k=10).collect()}
                adc = {r.vec_id: r.cos_sim for r in similarity.knn_indexed(
                    spark, path, p, k=4000, n_probe=32).collect()}
                errs += [abs(adc[v] - true[v])
                         for v in true if v in adc]
                got = {r.vec_id for r in similarity.knn_indexed(
                    spark, path, p, k=10, n_probe=32, rerank_df=emb,
                    rerank_k=256).collect()}
                hits += len(set(true) & got)
            out[name] = (build_s, sum(errs) / max(len(errs), 1),
                         hits / (10 * len(probes_src)))
        print("# pq_residual: raw build %.1fs adc-err %.4f "
              "rerank256-recall@10 %.2f | residual build %.1fs "
              "adc-err %.4f rerank256-recall@10 %.2f "
              "(n_probe=32/256, %d probes)"
              % (out["raw"][0], out["raw"][1], out["raw"][2],
                 out["residual"][0], out["residual"][1],
                 out["residual"][2], len(probes_src)),
              file=sys.stderr)
        return len(probes_src)

    from tanker_spark.operators import search, similarity as _sim  # noqa

    # query terms exist in the synthetic vocab: template words t0..t4999
    # (hot — boilerplate), unique-doc words w0..w49999 (long tail)
    SOAK_QUERY = "t100 t2500 w500 w31337"

    def bm25_soak():
        # one full-corpus pass: explode-filter to the 4 query terms,
        # broadcast corpus stats, sum per doc, top-k
        return search.bm25_topk(docs, SOAK_QUERY, k=10).count()

    def bm25_indexed_soak():
        # persisted postings: build once (the one-off), then a
        # 20-query latency sweep against term-pruned postings
        import shutil
        path = args.dir + "/text_index"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        search.build_text_index(docs, path)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 0
        for i in range(20):
            q = "t%d w%d" % (100 + i, 500 + i)
            n += search.bm25_topk_indexed(spark, path, q, k=10).count()
        per = (time.perf_counter() - t0) / 20
        print("# bm25_indexed: build %.1fs, %.3fs/query over 20"
              % (build_s, per), file=sys.stderr)
        return n

    def bm25_append_soak():
        # incremental text-index maintenance at 10M: build on 90% of
        # the corpus, append the last 10% — the append must cost
        # O(batch) (vs the full build), and a probe over the grown
        # index must agree with ad-hoc BM25 over the full corpus
        import shutil
        path = args.dir + "/text_index_inc"
        shutil.rmtree(path, ignore_errors=True)
        old_docs = docs.filter(F.pmod("doc_id", F.lit(10)) != 9)
        new_docs = docs.filter(F.pmod("doc_id", F.lit(10)) == 9)
        t0 = time.perf_counter()
        search.build_text_index(old_docs, path)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        search.text_index_append(new_docs, path)
        append_s = time.perf_counter() - t0
        q = SOAK_QUERY
        got = [r.asDict() for r in
               search.bm25_topk_indexed(spark, path, q, k=10).collect()]
        want = [r.asDict() for r in
                search.bm25_topk(docs, q, k=10).collect()]
        print("# bm25_append: build(90%%) %.1fs, append(10%%) %.1fs "
              "(%.2fx of build), grown-index probe == full ad-hoc: %s"
              % (build_s, append_s, append_s / build_s, got == want),
              file=sys.stderr)
        return len(got)

    def hybrid_soak():
        # BM25 + dense cosine fused by reciprocal rank, both legs over
        # the full 10M corpus (same id space by construction)
        probe = emb.filter(F.col("vec_id") == 12345) \
                   .collect()[0]["embedding"]
        return search.hybrid_topk(
            docs, emb, SOAK_QUERY, probe, k=10, n_each=50).count()

    def neardup_groups_soak():
        # pairs -> clusters end-to-end: the ~100M spanning pairs from
        # the banded-LSH stage resolved by alternating large-star/
        # small-star — the O(log n) path that exists exactly for this
        # scale (the 2500-copy hot classes are star-shaped components)
        pairs = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=4,
            threshold=0.5, expand_members=False,
        )
        groups = dedup.neardup_groups(pairs, method="star")
        n = groups.agg(F.count_distinct("group_id")).collect()[0][0]
        dedup.release_caches()
        return n

    def line_dedup_soak():
        # segments = words on this corpus (single-line docs): template
        # vocabulary t0..t4999 lands in ~24k docs each, unique-doc
        # vocabulary w0..w49999 in ~8k — min_docs=15000 removes exactly
        # the boilerplate tier. Explode is ~550M rows, counts/joins ride
        # 16-byte hash keys, rebuild state is doc-bounded
        out = dedup.line_dedup(docs, sep=" ", min_docs=15_000)
        n = out.agg(F.sum("n_removed")).collect()[0][0]
        dedup.release_caches()
        return n

    def streaming_decontam_soak():
        # ingest throughput: the WHOLE 10M-doc corpus through the
        # Bloom decontamination gate as a file stream (~1k-doc bench
        # filter built once; per batch = broadcast bitmap + codegen
        # shingle tests + the per-doc containment aggregate)
        import shutil
        from tanker_spark.operators import text as text_ops
        from tanker_spark.streaming import ingest
        base = args.dir + "/stream_soak"
        shutil.rmtree(base, ignore_errors=True)
        bloom = base + "/bloom.parquet"
        bench = docs.filter(
            F.pmod(F.xxhash64("doc_id", F.lit(99)), F.lit(10_000)) == 0)
        text_ops.build_contamination_filter(bench, bloom)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 16)
                  .parquet(args.dir + "/documents.parquet"))
        t0 = time.perf_counter()
        q = ingest.decontaminate_sink(
            stream, base + "/out", bloom, base + "/ckpt",
            max_containment=0.5)
        q.awaitTermination()
        stream_s = time.perf_counter() - t0
        n = spark.read.parquet(base + "/out").count()
        print("# streaming_decontam: %.1fs stream time -> %.0f docs/s "
              "admitted %d" % (stream_s, args.rows / stream_s, n),
              file=sys.stderr)
        shutil.rmtree(base, ignore_errors=True)
        return n

    def embedding_incremental_soak():
        # 100k-vector arriving batch (10% planted copies of indexed
        # rows) matched against the persisted 10M quantized index —
        # the steady-state ingest shape: index partitions read only at
        # the batch's Hamming-ball bucket set
        idx = args.dir + "/ann_index"
        if not os.path.exists(idx + "/_ann_meta.json"):
            similarity.build_ann_index(
                emb, idx, method="lsh", n_planes=10, quantize=True)
        batch = (
            emb.filter(F.pmod("vec_id", F.lit(100)) == 7)
            .withColumn("vec_id", F.col("vec_id") + 1_000_000_000)
        )
        pairs = similarity.embedding_incremental(
            batch, idx, threshold=0.99, multiprobe=1)
        n = pairs.count()
        dedup.release_caches()
        return n

    def semantic_gate_soak():
        # the r7 streaming op with no 10M number (r7 VERDICT #6): the
        # full 10M x 64-dim corpus through the semantic near-dup
        # ingest gate as a file stream. The source copy scatters the
        # generator's planted dup groups (consecutive ids share a
        # noise draw) across files by id mod 64, so near-dups arrive
        # CROSS-BATCH and only the index match can catch them.
        # n_planes=12 -> 4096 index partitions; per batch the index is
        # read only at the batch's Hamming-ball bucket set.
        import shutil

        from tanker_spark.streaming import ingest
        base = args.dir + "/sem_gate"
        shutil.rmtree(base, ignore_errors=True)
        src = base + "/src"
        emb.repartition(64, F.pmod("vec_id", F.lit(64))) \
           .write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(emb.schema)
                  .option("maxFilesPerTrigger", 8).parquet(src))
        t0 = time.perf_counter()
        q = ingest.semantic_filter_sink(
            stream, base + "/out", base + "/idx", base + "/ckpt",
            threshold=0.99, multiprobe=1, dim=64, n_planes=12)
        q.awaitTermination()
        stream_s = time.perf_counter() - t0
        out = spark.read.parquet(base + "/out")
        n = out.count()
        # planted ground truth from the generator formula: dup-branch
        # rows share their GROUP's draw; extras (group size - 1) are
        # what a perfect gate drops
        roll = F.pmod(F.xxhash64("id", F.lit(21)), F.lit(100))
        planted = (
            spark.range(args.rows)
            .filter(roll < 10)
            .groupBy((F.col("id") - F.pmod("id", F.lit(10))).alias("g"))
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(F.sum(F.col("m") - 1)).collect()[0][0] or 0
        )
        n_batches = len([d for d in os.listdir(base + "/out")
                         if d.startswith("batch=")])
        idx_rows = spark.read.parquet(base + "/idx").count()
        idx_parts = len([d for d in os.listdir(base + "/idx")
                         if d.startswith("__bucket=")])
        # probe-scope evidence: one batch's Hamming-ball bucket set vs
        # the index's partition count (the per-batch index read is
        # partition-pruned to this set — plan pinned in
        # operators_test::test_new_operator_plan_shapes)
        sample = spark.read.parquet(base + "/out/batch=1")
        bcol = similarity.hyperplane_bucket(
            F.col("embedding"), 64, 12, 42)
        n_base_buckets = sample.select(
            bcol.alias("b")).distinct().count()
        ball = 1 + 12  # multiprobe=1: base + one bucket per flipped bit
        # stream survivors agree with the batch matcher: a batch
        # near-dup pass over the survivor set finds (near) nothing
        resid = dedup.embedding_dedup_pairs(
            out.select("vec_id", "embedding"), threshold=0.99,
            n_planes=12, n_bands=2).count()
        print("\n# semantic_gate: %.1fs stream -> %.0f docs/s over %d "
              "batches; survivors %d (dropped %d >= %d planted dup "
              "extras — same-cluster strangers' cos tail also crosses "
              "the threshold), index rows %d in %d partitions; "
              "batch-1 ball "
              "<= %d buckets x %d probes; residual survivor near-dup "
              "pairs %d"
              % (stream_s, args.rows / stream_s, n_batches, n,
                 args.rows - n, planted, idx_rows, idx_parts,
                 n_base_buckets, ball, resid),
              file=sys.stderr)
        dedup.release_caches()
        return n

    def _shuffle_bytes():
        # app-total shuffle write bytes from the local UI REST API —
        # per-leg volume is the delta around the leg. Summed from the
        # EXECUTOR totals (cumulative, never evicted), not the stage
        # list: the UI store retains only spark.ui.retainedStages
        # completed stages (default 1000) and a 10M soak blows past
        # that, which would make deltas undercount or go negative.
        import json as _json
        import urllib.request
        ui = spark.sparkContext.uiWebUrl
        if not ui:
            return None
        try:
            apps = _json.loads(urllib.request.urlopen(
                ui + "/api/v1/applications", timeout=10).read())
            app_id = apps[0]["id"]
            execs = _json.loads(urllib.request.urlopen(
                "%s/api/v1/applications/%s/allexecutors"
                % (ui, app_id), timeout=30).read())
            return sum(e.get("totalShuffleWrite", 0) for e in execs)
        except Exception:
            return None

    def knn_join_bulk_soak():
        # the r8/r9 VERDICTs' untested-at-scale path: knn_join_indexed
        # with a MILLION-row query side against the 10M index, through
        # ALL THREE layouts (float / int8 / PQ) — probe-bucket
        # expansion (11M exploded rows at multiprobe=1), partition-
        # pruned read, per-bucket cogrouped GEMM/ADC tiles, then the
        # float-exact re-rank join for the quantized layouts. One
        # Spark job chain, no driver loop — the steady-state
        # bulk-enrichment shape. Evidence per layout: wall, result
        # rows/query, shuffle-write volume, and the per-tile occupancy
        # profile (index rows per __bucket: the cogroup tile size).
        layouts = [
            ("float", args.dir + "/float_index", dict(quantize=False)),
            ("int8", args.dir + "/ann_index", dict(quantize=True)),
            ("pq", args.dir + "/pq_index", dict(quantize="pq")),
        ]
        queries = (
            emb.filter(F.pmod("vec_id", F.lit(10)) == 3)
            .withColumn("vec_id", F.col("vec_id") + 2_000_000_000)
        )
        nq = queries.count()
        n = 0
        for name, path, kw in layouts:
            if not os.path.exists(path + "/_ann_meta.json"):
                t0 = time.perf_counter()
                similarity.build_ann_index(
                    emb, path, method="lsh", n_planes=10, **kw)
                print("# knn_join_bulk: %s index built in %.1fs"
                      % (name, time.perf_counter() - t0),
                      file=sys.stderr)
            occ = (spark.read.parquet(path).groupBy("__bucket").count()
                   .agg(F.max("count").alias("mx"),
                        F.avg("count").alias("mean"),
                        F.expr("percentile(count, 0.99)").alias("p99"))
                   .collect()[0])
            sb0 = _shuffle_bytes()
            t0 = time.perf_counter()
            res = similarity.knn_join_indexed(
                queries, path, k=5, multiprobe=1, rerank_df=emb)
            n = res.count()
            bulk_s = time.perf_counter() - t0
            sb1 = _shuffle_bytes()
            shuf = ("%.2f GiB" % ((sb1 - sb0) / 2**30)
                    if sb0 is not None and sb1 is not None else "n/a")
            print("# knn_join_bulk[%s]: %d queries -> %d rows "
                  "(%.2f rows/query) in %.1fs = %.0f q/s; shuffle "
                  "write %s; tile occupancy max/p99/mean = "
                  "%d/%.0f/%.1f rows" % (
                      name, nq, n, n / max(nq, 1), bulk_s,
                      nq / bulk_s, shuf, occ["mx"], occ["p99"],
                      occ["mean"]), file=sys.stderr)
            dedup.release_caches()
        return n

    def versioned_compact_soak():
        # r10 pointer-flip maintenance at scale: build the VERSIONED
        # int8 index on the 10M corpus, append a 100k batch 3x (one a
        # replay), compact through the atomic version flip, and pin
        # probe row-identity across the flip. The swap cost that
        # matters is the full-tree rewrite (one bucket-repartition
        # job) — the flip itself is one small-file overwrite.
        import shutil
        root = args.dir + "/versioned_index"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.perf_counter()
        similarity.build_ann_index(
            emb, root, method="lsh", n_planes=10, quantize=True,
            versioned=True)
        build_s = time.perf_counter() - t0
        batch = (emb.filter(F.pmod("vec_id", F.lit(100)) == 7)
                 .withColumn("vec_id", F.col("vec_id") + 3_000_000_000))
        t0 = time.perf_counter()
        similarity.ann_index_append(batch, root)
        append_s = time.perf_counter() - t0
        probes = [r["embedding"] for r in
                  emb.filter(F.pmod("vec_id", F.lit(500_000)) == 7)
                  .collect()]
        # identity contract: dedup compaction restores the exact
        # pre-replay probe state, so 'before' is captured pre-replay
        before = [[r.asDict() for r in similarity.knn_indexed(
            spark, root, p, k=10, multiprobe=1, rerank_df=emb
        ).collect()] for p in probes]
        similarity.ann_index_append(batch, root)  # replay
        t0 = time.perf_counter()
        similarity.ann_index_compact(spark, root, dedup_ids=True)
        compact_s = time.perf_counter() - t0
        after = [[r.asDict() for r in similarity.knn_indexed(
            spark, root, p, k=10, multiprobe=1, rerank_df=emb
        ).collect()] for p in probes]
        from tanker_spark import fsio
        ver = fsio.current_version(spark, root)
        n_rows = similarity._meta_read(
            spark, fsio.resolve(spark, root))["n_rows"]
        print("# versioned_compact: build %.1fs, 100k append %.1fs, "
              "pointer-flip compact %.1fs -> %s with %d rows "
              "(replay deduped: %s); probe identity across flip: %s "
              "over %d probes"
              % (build_s, append_s, compact_s, ver, n_rows,
                 n_rows == 10_000_000 + 100_000, before == after,
                 len(probes)), file=sys.stderr)
        return n_rows

    def text_consolidate_soak():
        # the other untested r8 path: text_index_consolidate on a
        # MANY-batch stream layout. Stream the 10M corpus through
        # text_index_sink in 128 one-file batches (≥100 batch dirs —
        # the year-of-micro-batches stand-in the r9 VERDICT demanded:
        # consolidation reads every batch=N dir, and a thousand-batch
        # stream index is where file-listing and merge behavior would
        # crack), time a probe against the batch=N layout, then
        # consolidate to the flat layout and time the same probe —
        # results must be row-identical across all three readers.
        import shutil

        from tanker_spark.streaming import ingest
        base = args.dir + "/text_stream"
        shutil.rmtree(base, ignore_errors=True)
        src = base + "/src"
        # round-robin (no key): all 128 partitions non-empty, so the
        # one-file-per-trigger stream really produces 128 batch dirs
        # (a hash repartition on pmod leaves ~1/e of them empty)
        docs.repartition(128).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        t0 = time.perf_counter()
        q = ingest.text_index_sink(
            stream, base + "/idx", base + "/ckpt")
        q.awaitTermination()
        stream_s = time.perf_counter() - t0
        n_batches = len([d for d in os.listdir(
            base + "/idx/" + search.POSTINGS_SUBDIR)
            if d.startswith("batch=")])
        t0 = time.perf_counter()
        got_stream = [r.asDict() for r in search.bm25_topk_stream_indexed(
            spark, base + "/idx", SOAK_QUERY, k=10).collect()]
        probe_stream_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        search.text_index_consolidate(spark, base + "/idx",
                                      base + "/flat")
        consol_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        got_flat = [r.asDict() for r in search.bm25_topk_indexed(
            spark, base + "/flat", SOAK_QUERY, k=10).collect()]
        probe_flat_s = time.perf_counter() - t0
        want = [r.asDict() for r in
                search.bm25_topk(docs, SOAK_QUERY, k=10).collect()]
        print("# text_consolidate: stream %.1fs over %d batches; "
              "stream-layout probe %.2fs, consolidate %.1fs, "
              "flat probe %.2fs; stream==adhoc %s, flat==adhoc %s"
              % (stream_s, n_batches, probe_stream_s, consol_s,
                 probe_flat_s, got_stream == want, got_flat == want),
              file=sys.stderr)
        return len(got_flat)

    def pack_chunk_soak():
        # the packing/chunking family's first at-scale leg (r10):
        # context-window chunking is map-only (posexplode of window
        # starts); packing is one id-hash shuffle + a per-partition
        # greedy first-fit over Arrow batches. The r10 segment-tree
        # rewrite matters exactly here — ~80k items per partition
        # against tens of thousands of open bins made the old linear
        # scan quadratic per task.
        t0 = time.perf_counter()
        n_chunks = curation.chunk_docs(docs, size=32, stride=24).count()
        chunk_s = time.perf_counter() - t0
        sized = docs.select("doc_id", "n_chars")
        t0 = time.perf_counter()
        packed = curation.pack_sequences(
            sized, "doc_id", "n_chars", budget=2048)
        st = packed.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("pack_id").alias("bins"),
            F.max("pack_fill").alias("max_fill"),
        ).collect()[0]
        pack_s = time.perf_counter() - t0
        print("# pack_chunk: chunk(32/24) %d windows in %.1fs; "
              "pack(2048) %d items -> %d bins (max fill %d) in %.1fs"
              % (n_chunks, chunk_s, st["n"], st["bins"],
                 st["max_fill"], pack_s), file=sys.stderr)
        return st["bins"]

    benches = {
        "exact_dedup": exact_dedup_soak,
        "minhash_spanning_pairs": minhash_soak,
        "dsir_select": dsir_soak,
        "curation_pipeline_v2": curation_v2_soak,
        "near_decontaminate": decontam_soak,
        "embedding_neardup": embedding_neardup_soak,
        "semdedup_two_level": semdedup_soak,
        "knn_join_lsh": knn_join_lsh_soak,
        "knn_join_gemm": knn_join_gemm_soak,
        "substring_dedup": substring_dedup_soak,
        "ann_index": ann_index_soak,
        "pq_index": pq_index_soak,
        "pq_residual": pq_residual_soak,
        "bm25_direct": bm25_soak,
        "bm25_indexed": bm25_indexed_soak,
        "bm25_append": bm25_append_soak,
        "hybrid_retrieval": hybrid_soak,
        "neardup_groups": neardup_groups_soak,
        "line_dedup": line_dedup_soak,
        "streaming_decontam": streaming_decontam_soak,
        "embedding_incremental": embedding_incremental_soak,
        "semantic_gate": semantic_gate_soak,
        "knn_join_bulk": knn_join_bulk_soak,
        "versioned_compact": versioned_compact_soak,
        "text_consolidate": text_consolidate_soak,
        "pack_chunk": pack_chunk_soak,
    }
    only = set(args.only.split(",")) if args.only else None
    for name, fn in benches.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        n = fn()
        print("%-24s %8.1fs  %d rows" % (
            name, time.perf_counter() - t0, n))


if __name__ == "__main__":
    main()
