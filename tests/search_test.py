"""BM25 search + hybrid RRF fusion (operators/search.py).

The ad-hoc and persisted-index probes must be row-identical (same
scoring expression, same rounding); RRF fusion must be rank-only
(calibration-free), give absent lists zero contribution, and stay
deterministic under reordered input.
"""

import pytest
from pyspark.sql import functions as F

from tanker_spark.operators.search import (
    bm25_topk,
    bm25_topk_indexed,
    build_text_index,
    hybrid_topk,
    rrf_fuse,
    text_index_append,
)

DOCS = [
    (0, "spark merge window join"),
    (1, "merge spark spark window"),
    (2, "window functions in sql"),
    (3, "completely unrelated words here"),
    (4, "merge conflicts are painful"),
    (5, "the spark window merge merge"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_indexed_matches_adhoc(spark, tmp_path):
    """The persisted-postings probe re-derives the EXACT ad-hoc rows:
    same scoring string, same df/stats, same rounding — the index is a
    cost cache, never a different answer."""
    df = _docs(spark)
    adhoc = bm25_topk(df, "spark merge", k=6).collect()
    path = str(tmp_path / "bm25idx")
    build_text_index(df, path)
    probe = bm25_topk_indexed(spark, path, "spark merge", k=6).collect()
    assert [r.asDict() for r in adhoc] == [r.asDict() for r in probe]
    assert adhoc[0]["doc_id"] in (1, 5)  # heaviest term mass wins


def test_bm25_index_append_matches_adhoc(spark, tmp_path):
    """Incremental index maintenance: build on half the corpus, append
    the other half — the probe over the grown index must be
    row-identical to the ad-hoc path over the FULL corpus (df_t counts
    from old+new postings at query time; n_docs/avgdl merge
    closed-form). The grown index must also keep partition pruning."""
    df = _docs(spark)
    old = df.filter(F.col("doc_id") % 2 == 0)
    new = df.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "bm25inc")
    build_text_index(old, path)
    text_index_append(new, path)
    adhoc = bm25_topk(df, "spark merge", k=6).collect()
    probe = bm25_topk_indexed(spark, path, "spark merge", k=6).collect()
    assert [r.asDict() for r in adhoc] == [r.asDict() for r in probe]
    # meta merged exactly: n_docs = full corpus, avgdl = weighted mean
    meta = spark.read.parquet(f"{path}/_bm25_meta").collect()[0]
    assert meta["n_docs"] == 6
    want = sum(len(t.split()) for _, t in DOCS) / 6
    assert abs(meta["avgdl"] - want) < 1e-9
    # an empty batch is a no-op, not a meta corruption
    text_index_append(new.filter(F.lit(False)), path)
    meta2 = spark.read.parquet(f"{path}/_bm25_meta").collect()[0]
    assert meta2.asDict() == meta.asDict()


@pytest.mark.slow
def test_bm25_append_onto_null_text_index(spark, tmp_path):
    """An index built on an all-null-text corpus records avgdl/dl_sum
    NULL (avg/sum over zero non-null lengths); appending real docs must
    merge from that state instead of TypeError-ing on None arithmetic
    (the r8 ADVICE finding), and the grown index must score like the
    ad-hoc path over the docs that actually have text."""
    df = _docs(spark)
    nulls = spark.createDataFrame(
        [(100, None), (101, None)], "doc_id long, text string")
    path = str(tmp_path / "bm25null")
    build_text_index(nulls, path)
    meta0 = spark.read.parquet(f"{path}/_bm25_meta").collect()[0]
    assert meta0["n_docs"] == 2 and meta0["avgdl"] is None
    text_index_append(df, path)
    meta = spark.read.parquet(f"{path}/_bm25_meta").collect()[0]
    assert meta["n_docs"] == 8
    want = sum(len(t.split()) for _, t in DOCS) / 6
    assert abs(meta["avgdl"] - want) < 1e-9
    # scoring matches ad-hoc over the same corpus (null-text docs
    # contribute to n_docs on both sides)
    adhoc = bm25_topk(df.unionByName(nulls), "spark merge",
                      k=8).collect()
    probe = bm25_topk_indexed(spark, path, "spark merge", k=8).collect()
    assert [r.asDict() for r in adhoc] == [r.asDict() for r in probe]
    # legacy layout (no dl_sum/dl_n) with NULL avgdl: reconstruction
    # coalesces to 0.0 instead of None * n_docs
    legacy = str(tmp_path / "bm25legacy")
    build_text_index(nulls, legacy)
    m0 = spark.read.parquet(f"{legacy}/_bm25_meta").collect()[0]
    spark.createDataFrame([(m0["n_docs"], m0["avgdl"])],
                          "n_docs long, avgdl double") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{legacy}/_bm25_meta")
    text_index_append(df, legacy)
    meta_l = spark.read.parquet(f"{legacy}/_bm25_meta").collect()[0]
    assert meta_l["n_docs"] == 8
    # legacy reconstruction counts null-text docs in dl_n (documented
    # drift — exact only for corpora without null texts): 34/(2+6)
    assert abs(meta_l["avgdl"] -
               sum(len(t.split()) for _, t in DOCS) / 8) < 1e-9


def test_bm25_query_term_dedup_and_case(spark):
    """'Spark SPARK spark' scores once per distinct lowered term."""
    df = _docs(spark)
    a = bm25_topk(df, "Spark SPARK spark", k=6).collect()
    b = bm25_topk(df, "spark", k=6).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_rrf_both_lists_beat_one(spark):
    """A doc ranked mid in BOTH lists outscores a doc topping one list
    only: 1/(60+2)+1/(60+2) > 1/(60+1) — the point of fusion."""
    lex = spark.createDataFrame(
        [(10, 5.0), (20, 4.0), (30, 3.0)], ["doc_id", "s"])
    den = spark.createDataFrame(
        [(40, 0.99), (20, 0.98), (50, 0.97)], ["vec_id", "c"])
    out = rrf_fuse([(lex, "s", "doc_id", 4), (den, "c", "vec_id", 6)],
                   k=5)
    rows = {r["doc_id"]: r["rrf"] for r in out.collect()}
    assert rows[20] > rows[10] > rows[30]
    assert rows[20] > rows[40]
    # single-list docs: exactly 1/(60+rank), the other list adds 0
    assert abs(rows[10] - 1.0 / 61) < 1e-6
    assert abs(rows[20] - (1.0 / 62 + 1.0 / 62)) < 1e-6


def test_rrf_rank_only_ignores_score_scale(spark):
    """Multiplying one list's scores by 1000 changes nothing — fusion
    consumes ranks, not calibrated scores."""
    lex = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0)], ["doc_id", "s"])
    scaled = lex.withColumn("s", F.col("s") * 1000.0)
    den = spark.createDataFrame([(2, 0.9), (3, 0.8)], ["vec_id", "c"])
    a = rrf_fuse([(lex, "s", "doc_id", 4), (den, "c", "vec_id", 6)],
                 k=3).collect()
    b = rrf_fuse([(scaled, "s", "doc_id", 4), (den, "c", "vec_id", 6)],
                 k=3).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_rrf_tie_breaks_by_id(spark):
    """Equal rounded scores rank by id ascending — deterministic across
    partition orderings and engines."""
    lex = spark.createDataFrame(
        [(7, 1.0), (3, 1.0), (5, 1.0)], ["doc_id", "s"])
    out = rrf_fuse([(lex, "s", "doc_id", 4)], k=3).collect()
    assert [r["doc_id"] for r in out] == [3, 5, 7]
    assert [r["rrf"] for r in out] == sorted(
        [r["rrf"] for r in out], reverse=True)


def test_hybrid_topk_end_to_end(spark):
    """Docs matching the query AND near the probe fuse to the top."""
    docs = _docs(spark)
    emb = spark.createDataFrame(
        [(i, [1.0 if i in (0, 1) else -1.0] * 4) for i in range(6)],
        ["vec_id", "embedding"],
    )
    out = hybrid_topk(docs, emb, "spark merge", [1.0] * 4, k=6,
                      n_each=6).collect()
    ids = [r["doc_id"] for r in out]
    # 0 and 1 appear in both lists; 1 out-ranks 0 lexically
    assert set(ids[:2]) == {0, 1}
    scores = {r["doc_id"]: r["rrf"] for r in out}
    assert scores[1] > scores[3]


def test_retrieval_metrics(spark):
    from tanker_spark.operators.search import retrieval_metrics

    res = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0), (1, 12, 3.0),
         (2, 20, 2.0), (2, 21, 1.0),
         (3, 30, 9.0)],
        ["query_id", "doc_id", "score"])
    qrels = spark.createDataFrame(
        [(1, 11, 2), (1, 12, 1), (1, 99, 3),
         (2, 77, 1),
         (3, 30, 1),
         (4, 40, 1),          # judged query with NO results: 0-row
         (5, 50, 0)],         # rel<=0 judgments are ignored entirely
        ["query_id", "doc_id", "rel"])
    out = {r.query_id: r
           for r in retrieval_metrics(res, qrels, k=2).collect()}

    import math
    # q1 top-2 = (10, 11); hit doc 11 (rel 2) at rank 2
    dcg = (2 ** 2 - 1) / math.log2(3)
    idcg = (2 ** 3 - 1) / math.log2(2) + (2 ** 2 - 1) / math.log2(3)
    assert out[1].recall_at_k == round(1 / 3, 6)
    assert out[1].mrr_at_k == 0.5
    assert out[1].ndcg_at_k == round(dcg / idcg, 6)
    # q2: judged but nothing relevant retrieved
    assert (out[2].recall_at_k, out[2].mrr_at_k,
            out[2].ndcg_at_k) == (0.0, 0.0, 0.0)
    # q3: perfect single-hit run
    assert (out[3].recall_at_k, out[3].mrr_at_k,
            out[3].ndcg_at_k) == (1.0, 1.0, 1.0)
    # q4: judged query absent from results still reports zeros
    assert (out[4].recall_at_k, out[4].mrr_at_k,
            out[4].ndcg_at_k) == (0.0, 0.0, 0.0)
    # q5 had only rel=0 judgments -> dropped (metrics undefined)
    assert 5 not in out


def test_bm25_topk_multi_matches_per_query(spark):
    """bm25_topk_multi (one corpus pass for a query batch — the r10
    retrieval-eval optimization) is row-identical to running
    bm25_topk per query, including scores and top-k membership."""
    from tanker_spark.operators.search import bm25_topk_multi

    df = _docs(spark)
    queries = [(1, "spark merge window"), (2, "window sql"),
               (3, "nothing matches this")]
    multi = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in bm25_topk_multi(df, queries, k=3).collect()
    }
    single = {}
    for qid, q in queries:
        for r in bm25_topk(df, q, k=3).collect():
            single[(qid, r["doc_id"])] = r["bm25"]
    assert multi == single


def test_bm25_topk_multi_matches_frame_drives_qrels(spark):
    """``return_matches=True`` hands back the persisted (doc_id, term,
    tf, dl) matches frame so an eval harness can derive graded
    judgments WITHOUT a second corpus tokenize (the r10
    retrieval_eval_bm25 optimization). Pin the contract it relies on:
    joining m to (query_id, term) pairs and counting rows per
    (query_id, doc_id) gives exactly the old
    explode(array_distinct(tokens))-based distinct-term counts, and the
    ranked output is unchanged by the flag."""
    from tanker_spark.operators.search import bm25_topk_multi
    from tanker_spark.operators.text import tokens

    df = _docs(spark)
    queries = [(1, "spark merge window"), (2, "window sql")]
    plain = bm25_topk_multi(df, queries, k=3).collect()
    ranked, m = bm25_topk_multi(df, queries, k=3, return_matches=True)
    assert sorted(map(tuple, ranked.collect())) == \
        sorted(map(tuple, plain))
    qterms = spark.createDataFrame(
        [(qid, t) for qid, q in queries
         for t in sorted(set(q.split()))], ["query_id", "term"])
    got = {
        (r["query_id"], r["doc_id"]): r["rel"]
        for r in m.join(qterms, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel")).collect()
    }
    doc_terms = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(tokens(F.lower(F.col("text"))))
        ).alias("term"),
    )
    want = {
        (r["query_id"], r["doc_id"]): r["rel"]
        for r in doc_terms.join(qterms, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel")).collect()
    }
    assert got == want
