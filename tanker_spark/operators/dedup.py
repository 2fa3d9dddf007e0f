"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design: every variant is (map-stage signature) → (shuffle on small
bucket keys) → (within-bucket pair join). Nothing ever materializes the
O(n²) pair space globally — candidate generation is always bucketed, so at
100 TB the shuffle volume is ~#rows × signature bytes, and the pair join
only touches same-bucket rows. Signatures are pure Column expressions
(codegen'd), no Python in the hot path.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from .text import tokens

#: 31-bit Mersenne prime: keeps ``a*h + b`` within signed-64 range under
#: Spark's default ANSI overflow checking (a, b, h all < 2^31).
MERSENNE = (1 << 31) - 1


def _mask64(m):
    """Python int → signed-64 literal (for masks with the sign bit set)."""
    return m - (1 << 64) if m >= (1 << 63) else m


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df, key_cols, id_col="doc_id"):
    """Hash-groupBy exact dedup: one winner (min id) per identical key.

    Returns the winner frame with a ``copies`` count. One shuffle on the
    (hashed) content key; map-side partial aggregation halves the traffic.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    return (
        df.groupBy(*key_cols)
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("copies"),
        )
        .select("keep_id", "copies")
    )


def dedup_exact_rows(df, key_cols, id_col="doc_id"):
    """Return the surviving rows themselves (all columns)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def shingles(col, n=3):
    """Token n-gram shingles as an array<string> (distinct).

    Built by zip_with over shifted array copies — O(1) work per element.
    (The obvious ``transform(seq, i -> slice(toks, i, n))`` is O(n) array
    copying per element → O(n²) per row and ~3× slower at sf0.1.)"""
    toks = tokens(col)
    size = F.size(toks)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(size - k, F.lit(0)))
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(
        F.slice(grams, 1, F.greatest(size - (n - 1), F.lit(1)))
    )


def _perm_params(num_hashes, seed=42):
    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MERSENNE - 1), rnd.randrange(0, MERSENNE - 1))
        for _ in range(num_hashes)
    ]


def minhash_signature(col, num_hashes=16, shingle_n=3, seed=42):
    """array<long> MinHash signature as a single Column expression.

    Fine for a handful of hashes; for real workloads prefer
    :func:`minhash_signatures_df` — a nested-HOF expression repeated
    ``num_hashes`` times defeats codegen and recomputes the shingle
    pipeline per hash."""
    sh = shingles(col, shingle_n)
    hashed = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE)))
    mins = [
        F.array_min(
            F.transform(
                hashed,
                lambda h: F.pmod(
                    F.lit(a) * h + F.lit(b), F.lit(MERSENNE)
                ),
            )
        )
        for a, b in _perm_params(num_hashes, seed)
    ]
    return F.array(*mins)


def minhash_signatures_df(df, text_col="text", id_col="doc_id",
                          num_hashes=16, shingle_n=3, seed=42):
    """(id, sig: array<long>) via the scalable explode→agg-min shape.

    One shuffle keyed by id with map-side partial mins; each permutation
    is a flat codegen'd aggregate, not a nested HOF. This is the plan
    that survives 100 TB: shuffle volume = #(id, shingle-hash) pairs,
    combiner-reduced."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("__s"),
    )
    hashed = sh.select(
        "__id", F.pmod(F.xxhash64("__s"), F.lit(MERSENNE)).alias("__h")
    )
    aggs = [
        F.min(
            F.pmod(F.lit(a) * F.col("__h") + F.lit(b), F.lit(MERSENNE))
        ).alias("__m%d" % j)
        for j, (a, b) in enumerate(_perm_params(num_hashes, seed))
    ]
    sigs = hashed.groupBy("__id").agg(*aggs)
    return sigs.select(
        "__id",
        F.array(*[F.col("__m%d" % j) for j in range(num_hashes)]).alias(
            "__sig"
        ),
    )


def minhash_lsh_pairs(
    df, text_col="text", id_col="doc_id",
    num_hashes=16, bands=4, shingle_n=3, threshold=0.5, seed=42,
):
    """MinHash + LSH near-duplicate pairs.

    Pipeline: signature (map) → explode into ``bands`` band-hashes (map) →
    self-join on (band, band_hash) buckets (shuffle on band hash — tiny
    keys) → estimate Jaccard as fraction of agreeing minhashes → filter.
    Returns distinct (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    # Materialize signatures once: they feed the band hashes and BOTH
    # sides of the self-join (at 100 TB you'd write signatures to a
    # parquet/Delta side table instead of memory).
    base = minhash_signatures_df(
        df, text_col, id_col, num_hashes, shingle_n, seed
    ).persist()

    band_cols = [
        F.xxhash64(
            F.concat_ws(
                ",",
                F.lit(b),
                *[
                    F.element_at(F.col("__sig"), b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
        ).alias("__band%d" % b)
        for b in range(bands)
    ]
    banded = base.select("__id", "__sig", *band_cols)
    exploded = banded.select(
        "__id", "__sig",
        F.explode(
            F.array(*[F.col("__band%d" % b) for b in range(bands)])
        ).alias("__bucket"),
    )
    left = exploded.alias("L")
    right = exploded.alias("R")
    pairs = (
        left.join(
            right,
            (F.col("L.__bucket") == F.col("R.__bucket"))
            & (F.col("L.__id") < F.col("R.__id")),
        )
        .select(
            F.col("L.__id").alias("id_a"),
            F.col("R.__id").alias("id_b"),
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("L.__sig"), F.col("R.__sig"),
                            lambda x, y: (x == y).cast("int"),
                        ),
                        lambda v: v == 1,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash(col, bits=64):
    """64-bit SimHash fingerprint: per-bit majority vote of token hashes.

    Pure column math (bit tests via AND-masks — no shifts, ANSI-safe):
    O(bits × tokens) per row, map-only."""
    hashed = F.transform(tokens(col), lambda t: F.xxhash64(t))

    def _voter(mask):
        # pyspark HOFs introspect the lambda arity — keep exactly 2 args
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(mask) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    out = F.lit(0).cast("long")
    for i in range(bits):
        mask = F.lit(_mask64(1 << i)).cast("long")
        vote = F.aggregate(
            hashed, F.lit(0).cast("long"), _voter(mask)
        )
        out = out.bitwiseOR(
            F.when(vote > 0, mask).otherwise(F.lit(0).cast("long"))
        )
    return out


def simhash_df(df, text_col="text", id_col="doc_id", bits=64):
    """(id, fp) SimHash via the scalable explode→vote-agg shape: one
    shuffle keyed by id; the 64 bit-votes are flat conditional sums
    (codegen'd, combiner-reduced) instead of 64 nested HOF aggregates."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    )
    hashed = toks.select("__id", F.xxhash64("__t").alias("__h"))
    aggs = []
    for i in range(bits):
        mask = F.lit(_mask64(1 << i)).cast("long")
        aggs.append(
            F.sum(
                F.when(F.col("__h").bitwiseAND(mask) != 0, 1).otherwise(-1)
            ).alias("__v%d" % i)
        )
    votes = hashed.groupBy("__id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp.bitwiseOR(
            F.when(
                F.col("__v%d" % i) > 0, F.lit(_mask64(1 << i)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("__id", fp.alias("__fp"))


def simhash_pairs(df, text_col="text", id_col="doc_id", max_hamming=3,
                  band_bits=16):
    """SimHash near-dup candidates: band the 64-bit fingerprint into
    ``64/band_bits`` chunks; pairs agreeing on ≥1 chunk are candidates
    (any pair within hamming distance < #bands shares a chunk); verify
    with exact popcount of XOR."""
    n_bands = 64 // band_bits
    # persist: the fingerprint feeds n_bands buckets and both join sides
    base = simhash_df(df, text_col, id_col).persist()
    # bucket key per band: hash of (band idx, fp AND band-mask) — masks
    # instead of shifts keep everything in plain long arithmetic
    buckets = [
        F.xxhash64(
            F.lit(b),
            F.col("__fp").bitwiseAND(
                F.lit(
                    _mask64(((1 << band_bits) - 1) << (b * band_bits))
                ).cast("long")
            ),
        )
        for b in range(n_bands)
    ]
    exploded = base.select(
        "__id", "__fp", F.explode(F.array(*buckets)).alias("__bucket")
    )
    L, R = exploded.alias("L"), exploded.alias("R")
    return (
        L.join(
            R,
            (F.col("L.__bucket") == F.col("R.__bucket"))
            & (F.col("L.__id") < F.col("R.__id")),
        )
        .select(
            F.col("L.__id").alias("id_a"),
            F.col("R.__id").alias("id_b"),
            F.bit_count(
                F.col("L.__fp").bitwiseXOR(F.col("R.__fp"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram jaccard (exact, LSH-gated)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df, text_col="text", id_col="doc_id", n=3,
                        threshold=0.8, num_hashes=16, bands=8, seed=42):
    """Exact token-n-gram Jaccard similarity, computed only on MinHash-LSH
    candidate pairs (never O(n²)). Returns (id_a, id_b, jaccard)."""
    cands = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes=num_hashes, bands=bands,
        shingle_n=n, threshold=0.0, seed=seed,
    )
    sh = df.select(
        F.col(id_col).alias("__id"),
        shingles(F.col(text_col), n).alias("__sh"),
    )
    a = sh.alias("A")
    b = sh.alias("B")
    joined = (
        cands.join(a, cands.id_a == F.col("A.__id"))
        .join(b, cands.id_b == F.col("B.__id"))
        .select(
            "id_a", "id_b",
            (
                F.size(F.array_intersect(F.col("A.__sh"), F.col("B.__sh")))
                / F.size(F.array_union(F.col("A.__sh"), F.col("B.__sh")))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return joined


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH)
# ---------------------------------------------------------------------------

def _hyperplanes(dim, n_planes, seed=42):
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def hyperplane_bucket(vec_col, dim, n_planes=8, seed=42):
    """Random-hyperplane LSH bucket id: sign bits of ⟨v, plane_j⟩."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec_col, p) > 0, F.lit(1 << j).cast("long")
                     ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def embedding_dedup_pairs(df, vec_col="embedding", id_col="vec_id",
                          dim=64, threshold=0.95, n_planes=8, seed=42):
    """Near-duplicate embedding pairs: bucket by hyperplane signs (map),
    self-join within buckets, verify with exact cosine."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias(
            "__bucket"
        ),
    ).persist()
    L, R = base.alias("L"), base.alias("R")
    return (
        L.join(
            R,
            (F.col("L.__bucket") == F.col("R.__bucket"))
            & (F.col("L.__id") < F.col("R.__id")),
        )
        .select(
            F.col("L.__id").alias("id_a"),
            F.col("R.__id").alias("id_b"),
            cosine(F.col("L.__v"), F.col("R.__v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
