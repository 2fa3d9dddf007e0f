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
                                  "spark.sql.shuffle.partitions": "128"})

    if not args.skip_gen:
        t0 = time.perf_counter()
        generate(spark, args.rows, args.dir)
        print("# generated %d rows in %.1fs" % (
            args.rows, time.perf_counter() - t0), file=sys.stderr)

    from tanker_spark.operators import curation, dedup

    docs = spark.read.parquet(args.dir + "/documents.parquet")

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

    benches = {
        "exact_dedup": exact_dedup_soak,
        "minhash_spanning_pairs": minhash_soak,
        "dsir_select": dsir_soak,
        "curation_pipeline_v2": curation_v2_soak,
        "near_decontaminate": decontam_soak,
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
