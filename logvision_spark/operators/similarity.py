"""Similarity search over embedding columns (north-star extension).

Baseline: brute-force cosine top-k — exact, one scan, JVM-side arithmetic
(zip_with + aggregate higher-order functions; no Python, no UDF). The
query side is a broadcast single row, so the scan parallelizes perfectly
and `TakeOrderedAndProject` keeps only k rows per partition.

Scale paths:
- ``srp_bucket_topk``: signed-random-projection LSH — b hyperplane signs
  pack into a bucket id; candidates = same bucket (or neighboring buckets
  via multi-probe); exact re-rank only on candidates. Turns O(N) per query
  into O(N/2^b) expected.
- ``ivf_topk``: IVF-style coarse quantizer — k-means centroids (pyspark.ml
  KMeans) assign each vector to a cell; queries probe the nearest n_probe
  cells. Centroid assignment is a broadcast join against ≤ thousands of
  centroids.
- pyspark.ml's BucketedRandomProjectionLSH is wrapped for parity with the
  MLlib-native route (`ml_brp_lsh`).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from logvision_spark.operators.util import quote_ident as _qi


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double — sequential fold, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; ZERO-NORM vectors score 0.0. Without the guard
    a zero vector (padding row, failed encoder) yields 0/0 = NaN, and
    NaN compares GREATER than every number in Spark's ordering — it
    would pass every >= threshold filter and sort first in any desc
    top-k (review finding) — and under ANSI mode (Spark 4 default) the
    0/0 is a hard DIVIDE_BY_ZERO query failure instead. try_divide
    evaluates the quotient once and yields NULL on a zero divisor; a
    when()-guard would re-fold both norms. NULL *inputs* still propagate
    to NULL (SQL semantics, matches DuckDB) — the 0.0 fallback applies
    only when both vectors are present, so a missing embedding is not
    silently scored 0.0 (review finding)."""
    return F.when(
        a.isNotNull() & b.isNotNull(),
        F.coalesce(
            F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b)), F.lit(0.0)
        ),
    )


def _sq_sum_sql(col_sql: str) -> str:
    return (
        f"aggregate(transform({col_sql}, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def cosine_cols_sql(a_name: str, b_name: str) -> str:
    """SQL string of `cosine` over two NAMED columns — the single-parse
    building block behind `cosine_cols`, exposed so call sites that
    assemble a LARGER single-parse projection (e.g. `round(..., 6) AS
    cos_sim` inside one selectExpr) can embed it without a second
    Column round trip."""
    a_sql, b_sql = _qi(a_name), _qi(b_name)
    dot_sql = (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
        "(acc, x) -> acc + x)"
    )
    return (
        f"CASE WHEN ({a_sql} IS NOT NULL AND {b_sql} IS NOT NULL) THEN "
        f"coalesce(try_divide({dot_sql}, sqrt({_sq_sum_sql(a_sql)}) * "
        f"sqrt({_sq_sum_sql(b_sql)})), 0.0D) END"
    )


def cosine_cols(a_name: str, b_name: str) -> Column:
    """`cosine` over two NAMED columns, built as ONE F.expr parse (r18).

    Tree-identical to ``cosine(F.col(a_name), F.col(b_name))`` — same
    CASE WHEN null guard, try_divide + coalesce zero-norm guard, and
    zip_with/transform/aggregate folds with double casts — but the
    whole expression crosses py4j once: the Column form costs ~100
    round trips of higher-order-function construction (~0.1-0.3 s of
    driver-side builder time PER CALL, profiled — it dominated the
    builder cost of every cosine-scoring entry), where one SQL string
    parses JVM-side in milliseconds. Use this at call sites that score
    plain columns; keep `cosine` for composed Column expressions."""
    return F.expr(cosine_cols_sql(a_name, b_name))


def brute_force_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qe",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k of ``df`` against a 1-row ``query`` frame.
    Rounding keeps scores oracle-comparable; pass None for raw doubles."""
    j = df.crossJoin(F.broadcast(query))
    score = cosine_cols(vec_col, query_vec_col)
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        j.select(F.col(id_col), score.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, b: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(b)]


def srp_bucket_id(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket: bit_i = sign(vec·plane_i), packed
    into an int. Deterministic given the seed that produced ``planes``."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = (dot(vec, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def srp_bucket_topk(
    df: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    num_bits: int = 8,
    num_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qe",
    max_bucket: int | None = None,
) -> DataFrame:
    """ANN top-k: restrict the exact re-rank to vectors sharing the
    query's SRP bucket in AT LEAST ONE of `num_tables` independent
    tables. Recall for an item at cosine c is 1-(1-(1-θ/π)^bits)^tables,
    θ=arccos(c) — buy precision with bits, recall with tables.

    At scale, bucket ids are precomputed/persisted with the vectors and
    the probe is a partition-pruned equi-lookup per table, not a full
    scan; candidate volume is Σ_t n_bucket(t). On clustered corpora a
    query can land in a degenerate mega-bucket (see
    `near_dup_pairs_cosine_lsh`); `max_bucket` skips buckets above the
    cap per table, bounding re-rank work at the documented recall
    trade."""
    table_cols, q_cols = [], []
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_bits, seed + 1000 * t)
        table_cols.append(
            F.struct(
                F.lit(t).alias("t"),
                srp_bucket_id(F.col(vec_col), planes).alias("b"),
            )
        )
        q_cols.append(
            F.struct(
                F.lit(t).alias("t"),
                srp_bucket_id(F.col(query_vec_col), planes).alias("b"),
            )
        )
    data_b = df.select(
        F.col(id_col), F.explode(F.array(*table_cols)).alias("tb")
    ).select(F.col(id_col), F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    if max_bucket is not None:
        w = Window.partitionBy("t", "b")
        data_b = (
            data_b.withColumn("_n", F.count(F.lit(1)).over(w))
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    q_b = query.select(F.explode(F.array(*q_cols)).alias("tb")).select(
        F.col("tb.t").alias("t"), F.col("tb.b").alias("b")
    )
    cand_ids = (
        data_b.join(F.broadcast(q_b), ["t", "b"]).select(id_col).distinct()
    )
    cand = df.join(cand_ids, id_col, "left_semi").crossJoin(F.broadcast(query))
    score = F.round(cosine_cols(vec_col, query_vec_col), 6)
    return (
        cand.select(F.col(id_col), score.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def near_dup_pairs_cosine(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: all (a,b) with cosine ≥ threshold.
    Quadratic — correct baseline for modest N; the scale path first buckets
    by SRP id (near-dups collide with high probability) and verifies within
    buckets only."""
    # norms staged per ROW before the join: inside the interpreted HOF
    # each operand's norm would otherwise be re-folded once per PAIR it
    # appears in (N-1 times here) instead of once per row
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    score = F.round(
        F.coalesce(
            F.try_divide(
                dot(F.col("va"), F.col("vb")), F.col("_na") * F.col("_nb")
            ),
            F.lit(0.0),
        ),
        6,
    )
    return pairs.select("id_a", "id_b", score.alias("cos_sim")).where(
        F.col("cos_sim") >= threshold
    )


def near_dup_pairs_cosine_lsh(
    df: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    num_bits: int = 2,
    num_tables: int = 24,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via SRP-LSH: bucket each vector in
    `num_tables` independent sign-random-projection tables, take
    same-bucket pairs as candidates (equi-join on (table, bucket) — NOT
    an all-pairs cross join), then verify candidates with the exact
    cosine. The scale path for `near_dup_pairs_cosine`.

    Shuffle carries (table, bucket, id, vector, bucket-array) rows — the
    vectors ride ALONG through the bucket join so each candidate is
    verified inside the same codegen stage that produced it, and no
    distinct runs at all (see emit-once below). The first formulation
    distinct'ed the raw candidate ids and re-joined both vector sides by
    id: at 500k × 64-d (12 bits, 4 tables ⇒ ~122M candidates) that is a
    122M-row distinct plus two 122M-row re-join shuffles — it OOM'd a
    local 8g heap before any verify work. Verify-inline streams the
    same candidates through one stage with no giant shuffle — memory
    stays flat at any candidate volume — at a per-candidate CPU cost
    (~3-4 µs: array copies + the interpreted HOF cosine; an unrolled
    element_at dot measured 3.6× SLOWER, so the HOF form stays), which
    makes wall time linear in Σ n_b². Measured on a uniform 400k × 64-d
    corpus with 200k planted clone pairs (16 bits, 8 tables, ~45M
    candidates): 176 s on local[32] with 200k/200k planted recall.

    Candidate volume is Σ_tables Σ_buckets n_b², tuned by `num_bits`
    (buckets per table) and `num_tables` (recall). Recall for a pair at
    cosine c is 1 - (1 - (1-θ/π)^bits)^tables, θ = arccos(c): at the
    defaults a c=0.4 pair is missed with p ≈ 5e-6, so at fixture scale
    the verified output equals the exact all-pairs result (fixed seed →
    deterministic; the catalog pins this against the exact oracle). At
    100 TB raise `num_bits` so buckets stay bounded and recall is
    bought with tables.

    Candidates are EMIT-ONCE: each row carries its full per-table
    bucket array through the join, and a pair is verified only in the
    FIRST table whose buckets match — a zip_with/exists prefix scan
    over the two arrays (cheap long compares) instead of a 64-d cosine
    per extra collision. A clone pair colliding in all `num_tables`
    tables is cosine-verified once, not `num_tables` times then
    distinct'ed — and because each qualifying pair is emitted by
    exactly one table, the final ``.distinct()`` (a full shuffle of
    the output) disappears entirely. Cost: the bucket array
    (num_tables longs) rides the candidate shuffle next to the vector
    (dim floats) — noise at realistic dims. Measured on the uniform
    400k × 64-d corpus with 200k planted clone pairs (16 bits, 8
    tables): 105 s / full recall vs 176 s for verify-per-table +
    distinct — same output, one less shuffle.

    `max_bucket` guards against CLUSTERED corpora, where adding bits
    stops helping: real embedding sets concentrate on a low-dimensional
    manifold, and a measured 500k synthetic manifold corpus collapsed
    65,536 possible 16-bit buckets into 1,148 with a 3,538-row maximum
    (Σ n_b² ≈ 443M per table — hours of verify CPU). A bucket larger
    than `max_bucket` has its entry NULLed in every member's bucket
    array (count window over (t,b), no broadcast — the hot-shingle cap
    from operators/dedup.capped_shingles applied to buckets): NULL
    never equi-joins, so a hot bucket pairs in no table, and the
    emit-once prefix scan is null-safe so a hot EARLIER table cannot
    suppress a pair's later discriminative collision — a pair keeps
    every other table as a chance, and recall degrades only by the
    tables a pair loses to hot buckets. None (default) preserves
    exact-at-fixture behavior.
    """
    bucket_exprs = [
        srp_bucket_id(F.col(vec_col), _hyperplanes(dim, num_bits, seed + 1000 * t))
        for t in range(num_tables)
    ]
    base = df.select(
        F.col(id_col), F.col(vec_col), F.array(*bucket_exprs).alias("_bs")
    )
    if max_bucket is not None:
        # Nullify hot (t, b) cells in each member's array so they neither
        # pair nor suppress. Narrow re-agg: (id, t, b) explode → count
        # window → regroup to (id, array) → join back to the vectors.
        ex = base.select(F.col(id_col), F.posexplode("_bs").alias("t", "b"))
        w = Window.partitionBy("t", "b")
        ex = (
            ex.withColumn("_n", F.count(F.lit(1)).over(w))
            .withColumn("b", F.when(F.col("_n") <= max_bucket, F.col("b")))
            .drop("_n")
        )
        eff = ex.groupBy(id_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "b"))), lambda s: s["b"]
            ).alias("_bs")
        )
        base = df.select(F.col(id_col), F.col(vec_col)).join(eff, id_col)
    # the l2 norm rides the shuffle as ONE double per exploded row:
    # verifying inside the join would otherwise re-fold each vector's
    # norm once per CANDIDATE it appears in (3 array folds per pair
    # instead of 1 dot fold + 2 cached doubles — review finding; the
    # verify stage dominates the 105 s clone-corpus measurement)
    sides = base.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_nrm"),
        F.col("_bs"),
        F.posexplode("_bs").alias("t", "b"),
    ).where(F.col("b").isNotNull())
    a = sides.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("_nrm").alias("_na"),
        F.col("_bs").alias("_bs_a"),
        "t",
        "b",
    )
    bb = sides.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("_nrm").alias("_nb"),
        F.col("_bs").alias("_bs_b"),
        "t",
        "b",
    )
    # first colliding table only: no earlier (t' < t) position where both
    # arrays hold the same non-null bucket
    emit_once = ~F.exists(
        F.zip_with(
            F.slice(F.col("_bs_a"), F.lit(1), F.col("t")),
            F.slice(F.col("_bs_b"), F.lit(1), F.col("t")),
            lambda x, y: F.coalesce(x == y, F.lit(False)),
        ),
        lambda v: v,
    )
    score = F.round(
        F.coalesce(
            F.try_divide(
                dot(F.col("va"), F.col("vb")), F.col("_na") * F.col("_nb")
            ),
            F.lit(0.0),
        ),
        6,
    )
    return (
        a.join(bb, ["t", "b"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(emit_once)
        .select("id_a", "id_b", score.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def ml_brp_lsh_neighbors(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qe",
    seed: int = 42,
) -> DataFrame:
    """pyspark.ml-native ANN route: BucketedRandomProjectionLSH (Euclidean)
    approxNearestNeighbors. Returns (id, dist_euclidean). Complements the
    hand-rolled SRP/IVF paths with MLlib's fitted-model API (persistable,
    approxSimilarityJoin-capable for all-pairs near-dup at scale).

    Single-query API by design: the one-row `query` frame is pulled to
    the driver (`first()`) because approxNearestNeighbors takes a local
    vector. For a query BATCH, don't loop this — use
    `model.approxSimilarityJoin(vecs, queries, thresh)` so the batch
    stays distributed."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(F.col(id_col), array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    q = query.select(array_to_vector(F.col(query_vec_col)).alias("qv")).first()["qv"]
    nn = model.approxNearestNeighbors(vecs, q, k)
    return nn.select(F.col(id_col), F.col("distCol").alias("dist_euclidean"))


def ml_minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    num_hash_tables: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """pyspark.ml-native near-dup route: token-set → binary HashingTF →
    MinHashLSH approxSimilarityJoin. Returns (doc_a, doc_b, jaccard_dist)
    pairs under the distance threshold (Jaccard distance = 1 - Jaccard)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="_toks")
    tf = HashingTF(
        inputCol="_toks", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(tok.transform(df.select(id_col, text_col)))
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, threshold, distCol="jaccard_dist")
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


def _unit_vectors(df: DataFrame, vec_col: str, out: str = "_v") -> DataFrame:
    """Stage `vec_col` as an L2-NORMALIZED ml vector column. Cosine-IVF
    convention (review finding): KMeans is Euclidean, so fitting and
    assigning on raw vectors while probing centroids by angle is a
    metric mismatch that silently costs recall on unnormalized corpora
    — on the unit sphere Euclidean and cosine orderings agree, making
    quantizer, assignment, and probe one geometry. JVM-side single pass
    (ml.feature.Normalizer); zero vectors pass through unchanged."""
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector

    staged = df.withColumn("_rawv", array_to_vector(F.col(vec_col)))
    return (
        Normalizer(inputCol="_rawv", outputCol=out, p=2.0)
        .transform(staged)
        .drop("_rawv")
    )


def fit_ivf(
    df: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Train the IVF coarse quantizer ONCE (offline at scale); the fitted
    KMeans model is shareable across all `ivf_topk` queries. Fit on
    L2-normalized vectors (see `_unit_vectors`): centroids then live in
    the same geometry the cosine probe ranks by."""
    from pyspark.ml.clustering import KMeans

    vecs = _unit_vectors(df.select(F.col(vec_col)), vec_col)
    return KMeans(k=n_cells, seed=seed, featuresCol="_v", predictionCol="cell").fit(
        vecs
    )


def assign_cells(df: DataFrame, model, vec_col: str = "embedding") -> DataFrame:
    """Materialize the IVF cell assignment as a column — the write-time
    step of the production layout (store it, ideally partition by it;
    then every `ivf_topk_batch(..., cell_col="cell")` probe skips the
    corpus-wide transform and equi-joins straight onto the stored
    cells)."""
    vecs = _unit_vectors(df, vec_col)
    return model.transform(vecs).drop("_v")


def ivf_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qe",
    seed: int = 42,
    model=None,
) -> DataFrame:
    """IVF-flat ANN: k-means coarse centroids; probe the n_probe nearest
    cells. Returns exact cosine over the probed subset.

    Driver-side work is deliberately tiny and bounded: the ≤`n_cells`
    centroids plus ONE query vector (`first()`). For a query batch use
    `ivf_topk_batch` — broadcast-centroid probe selection + equi-join
    on cell, fully distributed — instead of looping this single-query
    form.

    Pass a pre-fitted ``model`` (`fit_ivf`) to skip the per-call KMeans
    fit — at scale the quantizer is trained once offline and shared by
    every query; cell assignments would likewise be precomputed columns."""
    vecs = _unit_vectors(df.select(F.col(id_col), F.col(vec_col)), vec_col)
    if model is None:
        model = fit_ivf(df, n_cells=n_cells, seed=seed, vec_col=vec_col)
    assigned = model.transform(vecs).drop("_v")

    centers = model.clusterCenters()
    q_row = query.select(F.col(query_vec_col)).first()
    qv = list(q_row[0])
    qn = math.sqrt(sum(x * x for x in qv)) or 1.0
    qu = [x / qn for x in qv]

    # probe by EUCLIDEAN distance of the normalized query to each
    # centroid — the metric the quantizer assigned cells by
    def d2(c):
        return sum((a - b) * (a - b) for a, b in zip(qu, c))

    probe = sorted(range(len(centers)), key=lambda c: d2(centers[c]))[:n_probe]
    cand = assigned.where(F.col("cell").isin(probe)).crossJoin(F.broadcast(query))
    score = F.round(cosine_cols(vec_col, query_vec_col), 6)
    return (
        cand.select(F.col(id_col), score.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _probe_cells_sql(model, query_vec_col: str, n_probe: int) -> str:
    """SQL string of the per-query PROBE-CELL array: the `n_probe`
    (distance, cell) structs nearest the normalized query, as
    ``slice(array_sort(array(named_struct(...), ...)), 1, n_probe)``.

    Ranks cells by Euclidean distance of the NORMALIZED query to the
    centroid (the assignment metric): for unit q̂, argmin ||q̂-c||²
    = argmin (||c||²/2 − q̂·c) — one dot fold per (query, cell) pair,
    all ≤n_cells of them inside ONE array expression per query row.
    ||c||²/2 is a Python-side constant per centroid (the quantizer is
    driver-side by construction), so each struct's distance is a
    single fold over the query vector; array_sort orders by (d, cell)
    — the exact mirror of the r17 window's (score DESC, cell ASC), d
    being the IEEE negation of the score.

    Built as ONE F.expr PARSE, not nested Column calls: the Column
    form cost n_cells·(n_dim + ~20) py4j round trips — ~1.6 s of
    pure driver-side builder time at 16×64 (profiled; lit(list) is
    sugar for per-element lits in classic PySpark) — where one SQL
    string parses JVM-side in milliseconds. The parsed tree is the
    same expression: zip_with/aggregate folds with double casts,
    0.0D accumulators, try_divide+coalesce zero-norm guard (exactly
    `dot`/`l2_norm`'s lambdas). Constants round-trip exactly via
    CAST('<repr>' AS DOUBLE) — shortest-round-trip repr parsed by a
    correctly-rounded parser. Shared by `ivf_topk_batch` (explodes it
    to (q_id, cell) probe pairs) and `ivf_recall_table` (keeps it as
    a membership array on the broadcast query rows)."""

    def _dbl(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    qv_sql = _qi(query_vec_col)
    qn_sql = (
        f"sqrt(aggregate(transform({qv_sql}, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )
    cell_sqls = []
    for i, c in enumerate(model.clusterCenters()):
        arr = "array(" + ", ".join(_dbl(float(x)) for x in c) + ")"
        dot_sql = (
            f"aggregate(zip_with({qv_sql}, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            "(acc, x) -> acc + x)"
        )
        half = _dbl(0.5 * sum(float(x) * float(x) for x in c))
        cell_sqls.append(
            f"named_struct('_d', {half} - coalesce(try_divide({dot_sql}, "
            f"{qn_sql}), 0.0D), 'cell', {i})"
        )
    cells_sql = "array(" + ", ".join(cell_sqls) + ")"
    return f"slice(array_sort({cells_sql}), 1, {int(n_probe)})"


def ivf_recall_table(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "qe",
    seed: int = 42,
    model=None,
) -> DataFrame:
    """Recall harness for `ivf_topk_batch` from ONE shared corpus scan
    (r18 verdict item 5): returns exactly the rows of
    ``ivf_topk_batch(df, queries, ...).join(exact_topk,
    [q_id, id, cos_sim])`` — each query's IVF top-k intersected with
    its brute-force top-k over the FULL base — without scanning and
    scoring the base once per side.

    The two-branch harness planned: (assign → probe-join → score →
    rank) ⋈SMJ (cross-join → score → rank) — two corpus scans, two
    cosine folds per surviving (q, v) pair, 4 exchanges and a
    sort-merge join of the two top-k tables. But both branches rank
    THE SAME rounded score on the same (q, v) pairs; the IVF side is
    the exact side restricted to the probed cells. So: score every
    (q, v) pair ONCE (the brute-force pass — already unavoidable for
    the exact side), flag each row with probe membership
    (array_contains over the per-query probe-cell array riding the
    query broadcast — no join), and take BOTH row_numbers over one
    hash-partition-by-q_id exchange:

    - `_rn_exact` ranks all rows (cos_sim DESC, id) — brute-force rank;
    - `_rn_ivf` ranks (probed DESC, cos_sim DESC, id) — probed rows
      sort strictly first, so among themselves they carry exactly the
      ranks `ivf_topk_batch` assigns its candidates, and unprobed rows
      can never claim an IVF rank ≤ k once probed rows fill it (the
      `_in_probe` filter discards them regardless).

    A row joins the intersection iff `_in_probe AND _rn_ivf <= k AND
    _rn_exact <= k AND cos_sim IS NOT NULL` (the NULL guard mirrors
    join-key equality semantics — a NULL score never equi-joins).
    Row-identity with the two-branch form is pinned by
    tests/test_extensions.py::test_ivf_recall_table_equals_operator_join
    across probe counts including full-probe. One scan, one cosine per
    pair, 2 exchanges (rank + whatever consumes the result); the
    recall property is NOT weakened — the exact side still ranks the
    full base, the IVF side still ranks only quantizer-probed cells.
    """
    if model is None:
        model = fit_ivf(df, n_cells=n_cells, seed=seed, vec_col=vec_col)
    vecs = _unit_vectors(df.select(F.col(id_col), F.col(vec_col)), vec_col)
    assigned = model.transform(vecs).drop("_v")
    q2 = queries.selectExpr(
        _qi(query_id_col),
        _qi(query_vec_col),
        f"transform({_probe_cells_sql(model, query_vec_col, n_probe)}, "
        "s -> s.cell) AS _pc",
    )
    scored = assigned.crossJoin(F.broadcast(q2)).selectExpr(
        _qi(query_id_col),
        _qi(id_col),
        f"round({cosine_cols_sql(vec_col, query_vec_col)}, 6) AS cos_sim",
        "coalesce(array_contains(_pc, cell), false) AS _in_probe",
    )
    rn_exact = (
        f"row_number() OVER (PARTITION BY {_qi(query_id_col)} "
        f"ORDER BY cos_sim DESC, {_qi(id_col)} ASC) AS _rn_exact"
    )
    rn_ivf = (
        f"row_number() OVER (PARTITION BY {_qi(query_id_col)} "
        f"ORDER BY _in_probe DESC, cos_sim DESC, {_qi(id_col)} ASC) AS _rn_ivf"
    )
    return (
        scored.selectExpr("*", rn_exact, rn_ivf)
        .where(
            F.expr(
                f"_in_probe AND _rn_ivf <= {int(k)} AND "
                f"_rn_exact <= {int(k)} AND cos_sim IS NOT NULL"
            )
        )
        .select(query_id_col, id_col, "cos_sim")
    )


def ivf_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "qe",
    seed: int = 42,
    model=None,
    cell_col: str | None = None,
) -> DataFrame:
    """IVF-flat ANN for a query BATCH — the production serving shape
    `ivf_topk`'s docstring promises: no per-query driver loop, no
    `.first()`; the whole batch stays distributed end to end.

    Pass ``cell_col`` naming a precomputed assignment column on `df` to
    skip the per-call `model.transform` corpus pass entirely — the
    production layout assigns cells ONCE at write time (ideally also
    partitioning the table by cell, making the probe equi-join a
    partition-pruned scan). Measured at 500k × 64-d vectors on
    local[32]: an 8-query batch costs 3.6 s when re-assigning per call
    vs 1.7 s probe-only with stored cells (`model` is still required
    for centroid probe selection — it is the quantizer, tiny by
    construction).

    Plan: (1) base vectors get their cell from the coarse quantizer
    (precomputed columns at scale — here `model.transform`, consistent
    with the single-query path); (2) the ≤`n_cells` centroids — driver-
    side by construction, the quantizer IS tiny — fold into a single
    per-query PROJECTION: an array of (distance, cell) structs,
    array_sorted and sliced to the `n_probe` best, then exploded to
    (q_id, cell) pairs (r18; previously a centroid table was broadcast,
    crossJoined and window-ranked per query — a BroadcastExchange plus
    a window Exchange+Sort over |Q|·n_cells rows that a bounded-size
    array expression computes in place; at any |Q| this removes one
    broadcast build and one shuffle without changing a single probe:
    struct sort order is (d, cell), bit-identical to the window's
    (score DESC, cell ASC) since d is the exact IEEE negation of the
    score); (3) candidates = equi-join of assigned vectors to
    (query, cell) probe pairs on `cell`, so each query scans only its
    probed cells; (4) exact cosine re-rank per query via row_number
    ≤ k.

    One corpus pass serves the whole batch; candidate volume is
    Σ_q Σ_probed-cells |cell|. Returns (q_id, id, cos_sim).
    """
    if cell_col is not None and model is None:
        # A fresh KMeans fit has no guaranteed centroid-id correspondence
        # with the stored assignments (seed/data drift ⇒ silently wrong
        # probes). Stored cells only make sense with the quantizer that
        # produced them.
        raise ValueError(
            "cell_col requires the model that produced the stored "
            "assignments; refusing to fit a fresh quantizer against "
            "precomputed cells"
        )
    if model is None:
        model = fit_ivf(df, n_cells=n_cells, seed=seed, vec_col=vec_col)
    if cell_col is not None:
        assigned = df.select(
            F.col(id_col), F.col(vec_col), F.col(cell_col).alias("cell")
        )
    else:
        vecs = _unit_vectors(
            df.select(F.col(id_col), F.col(vec_col)), vec_col
        )
        assigned = model.transform(vecs).drop("_v")

    # probe explode, score projection and the rank window as single
    # parses too (r18 second sweep): the remaining Column chains here
    # were ~150 round trips per build. Same trees — explode over the
    # sliced sorted struct array (see _probe_cells_sql), round(cosine,
    # 6), row_number on (cos_sim DESC, id ASC) with SQL's default NULLS
    # ordering matching F.desc()/F.asc().
    probe_sql = _probe_cells_sql(model, query_vec_col, n_probe)
    probes = queries.selectExpr(
        _qi(query_id_col),
        f"explode({probe_sql}) AS _p",
    ).selectExpr(_qi(query_id_col), "_p.cell AS cell")

    cand = assigned.join(probes, "cell").join(
        F.broadcast(queries), query_id_col
    )
    rw_sql = (
        f"PARTITION BY {_qi(query_id_col)} "
        f"ORDER BY cos_sim DESC, {_qi(id_col)} ASC"
    )
    return (
        cand.selectExpr(
            _qi(query_id_col),
            _qi(id_col),
            f"round({cosine_cols_sql(vec_col, query_vec_col)}, 6) AS cos_sim",
        )
        .selectExpr("*", f"row_number() OVER ({rw_sql}) AS _rn")
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def int8_quantization_report(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Scalar int8 quantization of an embedding column with per-vector
    reconstruction error — the storage/serving compression step of an
    embedding pipeline (4× smaller than float32, distance-preserving to
    ~1/255 of the per-vector range). Per vector: codes are
    ``floor((x - min) * 255 / (max - min))`` (floor, not round: identical
    IEEE op sequence on both engines, no rounding-mode divergence),
    reconstruction is ``min + code * range / 255``, and the report emits
    the mean absolute reconstruction error. Constant vectors (range 0)
    quantize to code 0 with zero error.

    Pure JVM higher-order functions over the array column — one
    projection pass, no shuffle, no Python. min/max/range are STAGED as
    real columns before the error fold: interpreted HOF lambdas get no
    subexpression elimination, so an inline array_min re-walks the
    array once per element (measured ~4x slower at sf0.1)."""
    staged = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).select(
        id_col,
        "_v",
        F.array_min("_v").alias("_mn"),
        F.array_max("_v").alias("_mx"),
    ).select(
        id_col, "_v", "_mn", "_mx", (F.col("_mx") - F.col("_mn")).alias("_rng")
    )
    mn, rng = F.col("_mn"), F.col("_rng")
    err = F.aggregate(
        F.col("_v"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.abs(
            x - (mn + F.floor((x - mn) * F.lit(255.0) / rng) * rng / F.lit(255.0))
        ),
    ) / F.size("_v")
    return staged.select(
        F.col(id_col),
        F.round(mn, 6).alias("vmin"),
        F.round(F.col("_mx"), 6).alias("vmax"),
        F.when(rng > 0, F.round(err, 6)).otherwise(F.lit(0.0)).alias("mae"),
    )
