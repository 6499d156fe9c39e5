"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed
approximate variant.

Brute force is the exactness baseline (oracle-checkable); the
random-hyperplane LSH variant is the 100 TB path — bucket vectors by
sign pattern against seeded hyperplanes and search only within the
EXACT bucket (no multiprobe: Hamming-1 neighbour probing would raise
recall ~n_planes× at ~n_planes× the candidates; size ``n_planes``
accordingly — the recall test pins the exact-bucket behavior), so the
candidate join is near-linear instead of O(n·m).

All vector math stays JVM-side (`zip_with` + `aggregate` fold) for the
brute-force scorer; the LSH signature uses one vectorized numpy
mapInPandas pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alix_spark.util import ensure_py_files, round6


def _dot(a: str, b: str) -> "F.Column":
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (s, v) -> s + v)")


def _norm(a: str) -> "F.Column":
    return F.sqrt(F.expr(f"aggregate({a}, cast(0 as double), (s, v) -> s + v * v)"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k neighbours per query vector by cosine similarity.

    queries is small (broadcast); the corpus side streams. Returns
    (q_id, vec_id, cos, rank) with cos rounded to 6 dp; rank by rounded
    cos desc then vec_id asc (deterministic across engines/parallelism).
    """
    # self-exclusion compares as STRINGS: with a string q_id (term
    # keys) against a numeric vec_id, Spark would promote both to
    # double, cast the key to NULL, and the filter would silently drop
    # every row; string-vs-string is type-safe and agrees with numeric
    # equality for numeric ids
    joined = emb.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col).cast("string") != F.col(q_id_col).cast("string")
    )
    scored = joined.select(
        F.col(q_id_col).alias("q_id"),
        F.col(id_col).alias("vec_id"),
        round6(
            _dot(vec_col, q_vec_col) / (_norm(vec_col) * _norm(q_vec_col))
        ).alias("cos"),
    )
    w = F.expr("cast(row_number() over (partition by q_id order by cos desc, vec_id asc) as bigint)")
    return (
        scored.withColumn("rank", w)
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def embedding_stats(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, n_vecs, null_vecs, dim_min, dim_max, min_norm,
    mean_norm, max_norm, zero_vecs): per-label vector-hygiene census
    over an embedding table — the admission gate an ANN/semantic-dedup
    stage runs BEFORE indexing: ragged dimensions (dim_min ≠ dim_max)
    break every dot product downstream, zero vectors make cosine
    undefined, NULL vectors crash UDF batches, and a drifting norm
    distribution flags an encoder/version mix.

    Float contract: per-vector norms use the SAME aggregate-lambda
    dot/norm expressions as cosine_topk against the oracle's
    pre-doubled list_transform form (the proven-green ann_cosine
    pairing); min/max of identical doubles are identical, the mean's
    sum-order noise is absorbed by round6. sqrt is exactly rounded in
    IEEE 754, so it never adds divergence.

    Scale shape: one scan, per-row column expressions, then a
    map-side-combined groupBy(label) whose output is one row per
    label — no shuffle of vector payloads, no Python stage."""
    is_null = F.col(vec_col).isNull()
    base = emb.select(
        F.col(label_col).alias("label"),
        is_null.cast("long").alias("is_null"),
        F.when(~is_null, _norm(vec_col)).alias("nrm"),
        F.when(~is_null, F.size(F.col(vec_col)).cast("long")).alias("dim"),
    )
    return (
        base.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum("is_null").cast("long").alias("null_vecs"),
            F.min("dim").alias("dim_min"),
            F.max("dim").alias("dim_max"),
            round6(F.min("nrm")).alias("min_norm"),
            round6(F.avg("nrm")).alias("mean_norm"),
            round6(F.max("nrm")).alias("max_norm"),
            # when(==0.0).otherwise(0): a NULL norm counts as 0, never
            # as NULL (an all-NULL label must report 0, not NULL)
            F.sum(
                F.when(F.col("nrm") == 0.0, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("zero_vecs"),
        )
        .orderBy("label")
    )


def lsh_planes(n_planes: int = 16, dim: int = 64, seed: int = 42) -> np.ndarray:
    """±1 (Rademacher) hyperplanes derived from md5(seed:plane:dim).

    Sign random projection is a valid LSH family for cosine with ±1
    entries, and — unlike gaussian draws — each entry is reproducible
    in ANSI SQL, so the bucketed ANN output is oracle-checkable by the
    driver contract (the constants are embedded as literals in the
    oracle query)."""
    import hashlib

    p = np.empty((n_planes, dim), dtype=np.float64)
    for j in range(n_planes):
        for d in range(dim):
            hv = int.from_bytes(
                hashlib.md5(f"{seed}:{j}:{d}".encode()).digest()[:8], "big"
            )
            p[j, d] = 1.0 if hv & 1 else -1.0
    return p


def lsh_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) — sign pattern against seeded ±1 hyperplanes,
    vectorized numpy over Arrow batches."""
    ensure_py_files(emb.sparkSession)
    planes = lsh_planes(n_planes, dim, seed)

    def gen(it):
        for pdf in it:
            # float64 like ivf_assign (and the float64 oracle
            # literals): float32 input must not compute signs in
            # float32 and bucket differently than the contract's SQL
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (m @ planes.T) > 0
            buckets = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col], "bucket": buckets.astype(np.int64)})

    schema = T.StructType(
        [
            T.StructField("vec_id", emb.schema[id_col].dataType),
            T.StructField("bucket", T.LongType()),
        ]
    )
    return emb.select(id_col, vec_col).mapInPandas(gen, schema)


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine within the bucket. Recall measured vs cosine_topk in
    tests; raise n_planes for bigger corpora (bucket size ~ n/2^planes).

    ``multiprobe``: also probe buckets within Hamming distance ≤ m of
    the query's sign pattern (Lv et al. 2007, "Multi-Probe LSH") —
    the standard recall repair for hyperplane LSH: a near neighbor
    sitting just across one or two hyperplanes lands in an adjacent
    bucket that single-bucket probing never sees. m=1 probes
    n_planes+1 buckets per query, m=2 adds the C(n_planes, 2) pairs;
    candidate volume grows by the same factor, so this trades the
    documented bucket-pruning speedup for recall without touching the
    plane count. Probe buckets are generated as XOR masks on the
    packed sign integer — a tiny per-query explode, never a second
    signature pass; each corpus vector still has exactly ONE bucket,
    so a (query, vector) pair can match at most once and the
    candidate set needs no dedup."""
    if multiprobe not in (0, 1, 2):
        raise ValueError("ann_lsh_topk: multiprobe must be 0, 1 or 2")
    sig = lsh_signatures(emb, n_planes, dim, seed)
    q_sig = lsh_signatures(
        queries.select(F.col("q_id").alias("vec_id"), F.col("q_vec").alias("embedding")),
        n_planes,
        dim,
        seed,
    ).select(F.col("vec_id").alias("q_id"), F.col("bucket").alias("q_bucket"))
    if multiprobe:
        masks = [0] + [1 << j for j in range(n_planes)]
        if multiprobe >= 2:
            masks += [
                (1 << a) | (1 << b)
                for a in range(n_planes)
                for b in range(a + 1, n_planes)
            ]
        q_sig = q_sig.select(
            "q_id",
            F.explode(
                F.array(
                    *(
                        F.col("q_bucket").bitwiseXOR(F.lit(m))
                        for m in masks
                    )
                )
            ).alias("q_bucket"),
        )
    cand = (
        emb.join(sig, "vec_id")
        .join(
            F.broadcast(queries.join(q_sig, "q_id")),
            F.col("bucket") == F.col("q_bucket"),
        )
        .filter(  # string compare: see cosine_topk's self-exclusion note
            F.col("vec_id").cast("string") != F.col("q_id").cast("string")
        )
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        round6(_dot("embedding", "q_vec") / (_norm("embedding") * _norm("q_vec"))).alias("cos"),
    )
    w = F.expr("cast(row_number() over (partition by q_id order by cos desc, vec_id asc) as bigint)")
    return scored.withColumn("rank", w).filter(F.col("rank") <= k).orderBy("q_id", "rank")


# --------------------------------------------------------------- IVF


def ivf_centroids(
    emb: DataFrame,
    n_lists: int = 16,
    dim: int = 64,
    seed: int = 42,
    iters: int = 5,
    sample: int = 4096,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means on a fixed-size
    sample, trained driver-side (numpy), seeded init — centroids are
    identical at any parallelism. At 10^12 vectors the sample is still
    a driver-sized array (training data ≪ corpus, the standard IVF
    recipe); assignment below is the distributed part."""
    key = F.concat_ws(",", F.col(vec_col).cast("array<string>"))
    rows = (
        # the string key itself tie-breaks crc32 collisions (~n²/2³²
        # expected pairs): sample membership and order must be
        # identical at any parallelism, and a bare 32-bit hash order
        # leaves collision pairs scheduler-ordered
        emb.select(F.col(vec_col).alias(vec_col), key.alias("_k"))
        .orderBy(F.crc32(F.col("_k")), F.col("_k"))
        .limit(sample)
        .collect()
    )
    x = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    if dim and x.shape[1] != dim:
        raise ValueError(
            f"embedding width {x.shape[1]} != declared dim {dim}"
        )
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(x.shape[0], size=min(n_lists, x.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine on unit vectors
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, list_id): nearest-centroid assignment, vectorized numpy
    over Arrow batches — the distributed IVF build step."""
    ensure_py_files(emb.sparkSession)
    cent = centroids

    def gen(it):
        for pdf in it:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            lists = np.argmax(m @ cent.T, axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col], "list_id": lists.astype(np.int64)})

    schema = T.StructType(
        [
            T.StructField("vec_id", emb.schema[id_col].dataType),
            T.StructField("list_id", T.LongType()),
        ]
    )
    return emb.select(id_col, vec_col).mapInPandas(gen, schema)


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k (the briefing's named scale path): corpus
    vectors partitioned into coarse-quantizer lists; each query probes
    its ``nprobe`` nearest lists and scores exact cosine only there —
    candidate count ~ n·nprobe/n_lists instead of n per query.
    Recall vs cosine_topk asserted in tests."""
    cent = ivf_centroids(emb, n_lists=n_lists, dim=dim, seed=seed)
    assign = ivf_assign(emb, cent)

    # query → probed lists, computed DISTRIBUTED: the tiny centroid
    # matrix (n_lists × dim) ships to the executors as a closure and
    # each Arrow batch of queries emits its nprobe (q_id, list_id)
    # rows — the queries table is never collect()ed driver-side, so
    # an unbounded query set (e.g. the corpus joined to itself for
    # all-pairs ANN) streams through like any other DataFrame
    # (VERDICT r04 ask #5; probe selection is the same
    # argsort(-(cent @ q)) expression the old driver loop used, so
    # results are bit-identical).
    ensure_py_files(emb.sparkSession)

    def _probe_gen(it):
        for pdf in it:
            qids: list = []
            lids: list = []
            for qid, qv in zip(pdf["q_id"], pdf["q_vec"]):
                v = np.asarray(qv, dtype=np.float64)
                v = v / max(np.linalg.norm(v), 1e-12)
                for li in np.argsort(-(cent @ v))[:nprobe]:
                    qids.append(qid)
                    lids.append(int(li))
            yield pd.DataFrame(
                {"q_id": qids, "list_id": np.asarray(lids, dtype=np.int64)}
            )

    probe_schema = T.StructType(
        [
            T.StructField("q_id", queries.schema["q_id"].dataType),
            T.StructField("list_id", T.LongType()),
        ]
    )
    probe_df = queries.select("q_id", "q_vec").mapInPandas(
        _probe_gen, probe_schema
    )

    # NO broadcast hints on the probe/query sides: both are
    # data-dependent (probe_df is an un-pinned mapInPandas over
    # queries — an eager count-guarded hint would re-run the probe
    # generation as an extra job, the pattern review batch 27
    # removed), so AQE picks broadcast-vs-shuffle from runtime sizes:
    # bounded query sets still get the broadcast plan, an unbounded
    # one degrades to a shuffle join instead of OOMing every executor
    cand = (
        emb.join(assign, "vec_id")
        .join(probe_df, "list_id")
        .join(queries, "q_id")
        .filter(  # string compare: see cosine_topk's self-exclusion note
            F.col("vec_id").cast("string") != F.col("q_id").cast("string")
        )
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        round6(_dot("embedding", "q_vec") / (_norm("embedding") * _norm("q_vec"))).alias("cos"),
    )
    w = F.expr("cast(row_number() over (partition by q_id order by cos desc, vec_id asc) as bigint)")
    return scored.withColumn("rank", w).filter(F.col("rank") <= k).orderBy("q_id", "rank")


def centroid_similarity(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label_a, label_b, n_a, n_b, cos): the domain-similarity map —
    per-label embedding centroids (dimension-wise means) and the
    cosine between every unordered label pair. The mix-design tool
    behind domain clustering and redundancy detection: two domains
    whose centroids read near 1.0 carry overlapping content, so
    upweighting both double-counts it (the SemDeDup/mix-report view
    at DOMAIN granularity, where dedup_embedding works per document).

    Centroid means are 6-dp floor-rounded BEFORE the pair products,
    so both engines dot the exact same doubles; the 64-addend pair
    sums' ordering noise is absorbed by the final round6 (lm_score
    precedent). Labels with a zero-norm centroid have no direction
    and get a NULL cosine.

    Scale shape: vectors explode to (label, dim, value) — a map-side-
    combined aggregation bounded by labels x dims, NOT by corpus
    rows — then the pairwise join runs on the tiny centroid table
    keyed by dim (never an all-pairs scan of the vectors themselves).
    One corpus-scale shuffle of pre-combined partial sums; everything
    after is centroid-table-sized. NULL labels/vectors carry no
    evidence and are excluded."""
    d = (
        df.filter(F.col(label_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("dim", "x"),
        )
        .select("label", "dim", F.col("x").cast("double").alias("x"))
    )
    cent = d.groupBy("label", "dim").agg(round6(F.avg("x")).alias("m"))
    sizes = (
        df.filter(F.col(label_col).isNotNull() & F.col(vec_col).isNotNull())
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("m").alias("ma")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim", F.col("m").alias("mb")
    )
    pairs = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ma") * F.col("mb")).alias("dot"),
            F.sum(F.col("ma") * F.col("ma")).alias("na2"),
            F.sum(F.col("mb") * F.col("mb")).alias("nb2"),
        )
    )
    cos = F.when(
        (F.col("na2") > 0) & (F.col("nb2") > 0),
        round6(F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2"))),
    )
    na = sizes.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    from alix_spark.util import maybe_broadcast

    return (
        pairs.join(maybe_broadcast(na), "label_a")
        .join(maybe_broadcast(nb), "label_b")
        .select("label_a", "label_b", "n_a", "n_b", cos.alias("cos"))
        .orderBy("label_a", "label_b")
    )
