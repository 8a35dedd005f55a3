"""Similarity search over embedding columns (array<float>).

Two paths, as a 100-TB pipeline needs both:

* **brute-force cosine top-k** — the exact baseline: JVM-side dot product
  (``zip_with`` + ``aggregate``; no Python in the loop), per-query ranking
  window. Cost O(|queries|·|corpus|) — fine when one side is small enough
  to broadcast.
* **LSH-bucketed ANN** — random-hyperplane signatures (sign of dot with H
  fixed seeded planes) computed in a numpy pandas UDF; candidates share a
  bucket (optionally multi-probe by also matching Hamming-1 neighbors),
  then exact cosine only within buckets. Scale path: the corpus shuffles
  once on bucket, queries broadcast per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "cosine",
    "brute_force_knn",
    "make_hyperplane_udf",
    "lsh_knn",
    "ivf_knn",
    "ann_recall",
    "cosine_near_dup_pairs",
]


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus,
    cosine, row_number ≤ k. Returns (query_id, vec_id, cos_sim, knn_rank)."""
    from bbcrawl_spark.operators.graphops import _spread

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    # the JVM cosine fold is the whole cost and rides the corpus scan;
    # spread a one-split scan (single parquet row group) so it does not
    # run single-core — no-op for properly-split inputs
    c = _spread(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")),
        "vec_id",
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def make_hyperplane_udf(dim: int, num_planes: int = 16, seed: int = 42,
                        num_tables: int = 1):
    """pandas UDF: embedding -> array of per-table hyperplane sign buckets.

    Standard multi-table LSH: ``num_tables`` independent seeded plane sets;
    a whole Arrow batch is one numpy einsum."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, dim, num_planes)).astype(np.float64)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def hyperplane_buckets(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        m = np.array([np.asarray(v, dtype=np.float64) for v in vec])
        signs = np.einsum("nd,tdp->ntp", m, planes) > 0  # n × tables × planes
        vals = signs @ weights  # n × tables
        return pd.Series(vals.tolist())

    return hyperplane_buckets


def _with_buckets(df: DataFrame, udf, vec_alias: str) -> DataFrame:
    return df.select(
        "*", F.posexplode(udf(F.col(vec_alias))).alias("table", "bucket")
    )


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: exact cosine only for candidates sharing a bucket
    in ANY of the L hash tables (union-of-tables candidates = the classic
    recall lever). Returns (query_id, vec_id, cos_sim, knn_rank)."""
    udf = make_hyperplane_udf(dim, num_planes, num_tables=num_tables)
    c = _with_buckets(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")),
        udf, "_cvec",
    )
    q = _with_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")),
        udf, "_qvec",
    )
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .select("query_id", "vec_id", "_qvec", "_cvec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id", "vec_id", cosine(F.col("_qvec"), F.col("_cvec")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("knn_rank", F.row_number().over(w)).filter(
        F.col("knn_rank") <= k
    )


def _seed_centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((n_centroids, dim)).astype(np.float64)
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 42,
    max_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means codebook on a DETERMINISTIC corpus sample.

    Sampling is by ``id % m == 0`` (no RNG, no shuffle-order dependence) and
    the Lloyd iterations run in numpy on the driver, so the codebook — and
    therefore every downstream IVF assignment — is bit-reproducible across
    runs. This mirrors standard practice at scale (e.g. FAISS trains IVF
    codebooks on a ~10^5-10^6 vector sample, not the full corpus); a
    distributed groupBy-mean would be cheaper still but float summation
    order would make assignments flap across runs.
    """
    n = corpus.count()
    step = max(1, n // max_sample)
    # pmod: negative ids stride correctly; sparse/offset id spaces can still
    # dodge the stride entirely, so an undersized sample falls back to the
    # deterministic first-max_sample rows (TakeOrdered — no full sort)
    rows = (
        corpus.filter(F.pmod(F.col(id_col), F.lit(step)) == 0)
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    if len(rows) < n_centroids:
        rows = corpus.orderBy(id_col).limit(max_sample).select(vec_col).collect()
    if not rows:  # empty corpus: data-independent seeded codebook
        return _seed_centroids(dim, n_centroids, seed)
    m = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m = m / norms
    cents = _seed_centroids(dim, n_centroids, seed)
    for _ in range(n_iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def make_ivf_assign_udf(dim: int, n_centroids: int = 16, n_probe: int = 1,
                        seed: int = 42, centroids: np.ndarray | None = None):
    """pandas UDF: embedding -> array of the n_probe nearest centroid ids.

    ``centroids``: a trained codebook (``train_ivf_centroids``); defaults to
    seeded unit vectors (data-independent). One numpy matmul per Arrow batch.
    """
    cents = centroids if centroids is not None else _seed_centroids(dim, n_centroids, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def ivf_assign(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        m = np.array([np.asarray(v, dtype=np.float64) for v in vec])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ cents.T  # n × centroids
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series(top.astype(np.int64).tolist())

    return ivf_assign


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors live in their single nearest-centroid
    inverted list; queries probe their n_probe nearest lists and score
    exactly within them. The corpus shuffles once on centroid id — the
    classic big-corpus/small-query scale shape. Self-match guaranteed
    (a vector's own list is always its query's first probe).

    ``centroids``: trained codebook (``train_ivf_centroids``) — materially
    better recall per probe than the seeded default."""
    assign = make_ivf_assign_udf(dim, n_centroids, n_probe=1, centroids=centroids)
    probe = make_ivf_assign_udf(dim, n_centroids, n_probe=n_probe, centroids=centroids)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")
    ).withColumn("centroid", F.element_at(assign(F.col("_cvec")), 1))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).select("query_id", "_qvec", F.explode(probe(F.col("_qvec"))).alias("centroid"))
    scored = c.join(F.broadcast(q), "centroid").select(
        "query_id", "vec_id", cosine(F.col("_qvec"), F.col("_cvec")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("knn_rank", F.row_number().over(w)).filter(
        F.col("knn_rank") <= k
    )


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 3,
    num_tables: int = 16,
    n_centroids: int = 16,
    n_probe: int = 8,
    ivf_centroids: np.ndarray | None = None,
) -> DataFrame:
    """Per-query recall@k of BOTH ANN variants against exact brute force:
    (variant, query_id, recall_e4). Recall is numbers, not vibes — the
    driver records this rows-only each round and tests pin a floor on it.

    IVF uses a trained codebook (``train_ivf_centroids``) unless one is
    passed in. Ties at the k-th cosine are broken by vec_id in both the
    exact and the ANN rankings, so recall is deterministic.
    """
    if ivf_centroids is None:
        ivf_centroids = train_ivf_centroids(
            corpus, dim, n_centroids, id_col=id_col, vec_col=vec_col
        )
    truth = brute_force_knn(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select("query_id", "vec_id")
    variants = {
        "lsh": lsh_knn(
            corpus, queries, dim=dim, k=k, num_planes=num_planes,
            num_tables=num_tables, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col,
        ),
        "ivf": ivf_knn(
            corpus, queries, dim=dim, k=k, n_centroids=n_centroids,
            n_probe=n_probe, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, centroids=ivf_centroids,
        ),
    }
    out = None
    qids = queries.select(F.col(query_id_col).alias("query_id")).distinct()
    for name, df in variants.items():
        hits = (
            truth.join(df.select("query_id", "vec_id"), ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count("*").alias("n_hits"))
        )
        rec = qids.join(hits, "query_id", "left").select(
            F.lit(name).alias("variant"),
            "query_id",
            F.floor(F.coalesce(F.col("n_hits"), F.lit(0)) * 10000 / k).alias("recall_e4"),
        )
        out = rec if out is None else out.unionByName(rec)
    return out


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold), id_a < id_b.

    exact=True does the O(n²) self-join (small inputs / oracle checks).

    The LSH path is the ``minhash_lsh_pairs`` single-pass shape (the r4
    simhash fix, applied here in r6): the hyperplane UDF is evaluated
    ONCE, banded rows shuffle ONCE on (table, bucket), and candidate
    pairs expand JVM-side inside each bucket group with the cosine
    computed INLINE and thresholded BEFORE the explode — the former
    banded SELF-join evaluated the pandas UDF under both join aliases
    and shipped a full vector copy per candidate pair through the join.
    ``max_bucket_size`` drops degenerate hot buckets (one near-constant
    embedding cluster at 10^9 docs otherwise goes quadratic inside a
    single bucket) before any per-bucket materialization, via the same
    spill-safe count window as ``textops._drop_hot_buckets``; results
    become a LOWER bound — a dropped bucket can only lose pairs, never
    invent one. Memory model: a surviving bucket of k members holds its
    k (id, vec) structs (~1 KB each at 128 dims) in the collect_list row
    and ≤ k(k-1)/2 24-byte (id_a, id_b, cos) structs post-filter — keep
    the cap in the low thousands.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if exact:
        a, b = base.alias("a"), base.alias("b")
        joined = a.join(b, F.col("a.id") < F.col("b.id"))
        return (
            joined.select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                cosine(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
            .dropDuplicates(["id_a", "id_b"])
        )
    if dim is None:
        raise ValueError("dim required for the LSH path")
    udf = make_hyperplane_udf(dim, num_planes, num_tables=4)
    banded = _with_buckets(base, udf, "vec")
    if max_bucket_size is not None:
        wb = Window.partitionBy("table", "bucket")
        banded = (
            banded.withColumn("_bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    grouped = (
        banded.groupBy("table", "bucket")
        .agg(F.collect_list(F.struct("id", "vec")).alias("mem"))
        .filter(F.size("mem") >= 2)
    )
    # all i<j pairs within the bucket; members sort by id (structs compare
    # field-by-field and ids are unique), so id_a < id_b holds and the
    # pair set + cosine values are identical to the former self-join's.
    ms = F.array_sort("mem")

    def _pair(x, y):
        return F.struct(
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            cosine(x["vec"], y["vec"]).alias("cos_sim"),
        )

    pairs_arr = F.filter(
        F.flatten(
            F.transform(
                ms,
                lambda x, i: F.transform(
                    F.slice(ms, i + F.lit(2), F.size(ms)),
                    lambda y: _pair(x, y),
                ),
            )
        ),
        lambda p: p["cos_sim"] >= threshold,
    )
    return (
        grouped.select(F.explode(pairs_arr).alias("p"))
        .select("p.*")
        .dropDuplicates(["id_a", "id_b"])
    )
