"""ANN similarity tests: exact baseline invariants, LSH and IVF recall
vs the exact scorer, and determinism across parallelism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark.textops import similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    return df.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    ).persist()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def _hits(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], []).append(r["vec_id"])
    return out


def test_exact_topk_shape(emb, queries):
    hits = _hits(similarity.cosine_topk(emb, queries, k=10))
    assert len(hits) == 8
    assert all(len(v) == 10 for v in hits.values())


def test_ivf_recall_vs_exact(emb, queries):
    exact = _hits(similarity.cosine_topk(emb, queries, k=10))
    approx = _hits(
        similarity.ann_ivf_topk(emb, queries, k=10, n_lists=8, nprobe=4)
    )
    recalls = [
        len(set(approx.get(q, [])) & set(exact[q])) / 10 for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6  # nprobe=4 of 8 lists


def test_ivf_full_probe_equals_exact(emb, queries):
    """Probing every list = brute force (sanity: IVF only prunes)."""
    exact = _hits(similarity.cosine_topk(emb, queries, k=5))
    full = _hits(
        similarity.ann_ivf_topk(emb, queries, k=5, n_lists=8, nprobe=8)
    )
    assert full == exact


def test_lsh_recall_vs_exact(emb, queries):
    exact = _hits(similarity.cosine_topk(emb, queries, k=10))
    approx = _hits(
        similarity.ann_lsh_topk(emb, queries, k=10, n_planes=4)
    )
    recalls = [
        len(set(approx.get(q, [])) & set(exact[q])) / 10 for q in exact
    ]
    # synthetic embeddings are near-uniform — the worst case for
    # data-oblivious hyperplane LSH (single bucket, no multiprobe);
    # the data-adaptive IVF above reaches ≥0.6 on the same vectors
    assert sum(recalls) / len(recalls) >= 0.1


def test_lsh_multiprobe_recall_dominates_single_bucket(emb, queries):
    """Multi-Probe LSH (Lv et al. 2007): probing Hamming-adjacent
    buckets must never lose candidates (the m=0 bucket is in every
    probe set) and on this near-uniform corpus — hyperplane LSH's
    worst case — it must lift recall materially above the
    single-bucket floor."""
    exact = _hits(similarity.cosine_topk(emb, queries, k=10))

    def recall(m):
        approx = _hits(
            similarity.ann_lsh_topk(emb, queries, k=10, n_planes=4, multiprobe=m)
        )
        return sum(
            len(set(approx.get(q, [])) & set(exact[q])) / 10 for q in exact
        ) / len(exact)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2
    assert r2 >= 0.5  # m=2 at 4 planes probes 11 of 16 buckets


def test_lsh_multiprobe_validation(emb, queries):
    with pytest.raises(ValueError, match="multiprobe"):
        similarity.ann_lsh_topk(emb, queries, multiprobe=3)


def test_ivf_deterministic(emb, queries):
    a = similarity.ann_ivf_topk(emb, queries, k=5, n_lists=8, nprobe=2).collect()
    b = similarity.ann_ivf_topk(emb, queries, k=5, n_lists=8, nprobe=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ivf_probe_assignment_is_distributed(emb, queries):
    """The probe step must be a mapInPandas stage over the queries
    DataFrame, never a driver-side queries.collect() (VERDICT r04 ask
    #5): the physical plan carries exactly TWO Arrow-eval python
    stages (ivf_assign + the probe generator) — a collect()-built
    probe table would show as a LocalTableScan with zero python
    stages on the query side. The probe/query join sides carry NO
    broadcast hint (AQE decides from runtime sizes), so an unbounded
    query set degrades to a shuffle join instead of shipping to
    every executor."""
    plan = similarity.ann_ivf_topk(
        emb, queries, k=5, n_lists=8, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2, plan


def test_string_query_ids_not_silently_empty(spark):
    """String q_ids (term keys) vs numeric vec_ids: the self-exclusion
    filter previously promoted both to double, cast the key to NULL,
    and dropped EVERY candidate row (review regression)."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("cat", [1.0, 0.1])], "q_id string, q_vec array<double>"
    )
    rows = similarity.cosine_topk(emb, q, k=2).collect()
    assert len(rows) == 2 and rows[0]["vec_id"] == 0
    rows = similarity.ann_ivf_topk(
        emb, q, k=2, n_lists=1, nprobe=1, dim=2
    ).collect()
    assert len(rows) == 2 and rows[0]["vec_id"] == 0


class TestCentroidSimilarity:
    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        return {
            (r["label_a"], r["label_b"]): r
            for r in similarity.centroid_similarity(df).collect()
        }

    def test_known_centroid_geometry(self, spark):
        # label 1 centroid (1, 0): mean of (2,0) and (0,0)... no —
        # mean of (1,0),(1,0); label 2 (0,1); label 3 (2,0):
        # cos(1,2)=0, cos(1,3)=1, cos(2,3)=0
        got = self._run(
            spark,
            [
                (1, [1.0, 0.0], 1),
                (2, [1.0, 0.0], 1),
                (3, [0.0, 1.0], 2),
                (4, [2.0, 0.0], 3),
            ],
        )
        assert got[(1, 2)]["cos"] == 0.0
        assert got[(1, 3)]["cos"] == 1.0
        assert got[(2, 3)]["cos"] == 0.0
        assert got[(1, 2)]["n_a"] == 2 and got[(1, 2)]["n_b"] == 1

    def test_opposite_centroids_and_mean_cancellation(self, spark):
        # label 1's two vectors cancel to the zero centroid -> no
        # direction -> NULL cos; labels 2 vs 3 are antipodal -> -1
        got = self._run(
            spark,
            [
                (1, [1.0, 0.0], 1),
                (2, [-1.0, 0.0], 1),
                (3, [0.0, 3.0], 2),
                (4, [0.0, -5.0], 3),
            ],
        )
        assert got[(1, 2)]["cos"] is None
        assert got[(2, 3)]["cos"] == -1.0

    def test_null_labels_and_vectors_excluded(self, spark):
        got = self._run(
            spark,
            [
                (1, [1.0, 0.0], 1),
                (2, None, 1),
                (3, [0.0, 1.0], None),
                (4, [0.0, 1.0], 2),
            ],
        )
        assert set(got) == {(1, 2)}
        assert got[(1, 2)]["n_a"] == 1  # the NULL vector never counted


class TestEmbeddingStats:
    def test_known_norms_and_null_handling(self, spark):
        from alix_spark.textops.similarity import embedding_stats

        df = spark.createDataFrame(
            [
                (1, [3.0, 4.0], 1),
                (2, [0.0, 0.0], 1),
                (3, None, 2),
                (4, [1.0], 2),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        rows = {r.label: r for r in embedding_stats(df).collect()}
        l1 = rows[1]
        assert (l1.n_vecs, l1.null_vecs, l1.dim_min, l1.dim_max) == (2, 0, 2, 2)
        assert (l1.min_norm, l1.mean_norm, l1.max_norm) == (0.0, 2.5, 5.0)
        assert l1.zero_vecs == 1
        l2 = rows[2]
        # the NULL vector is counted but contributes no dim/norm
        assert (l2.n_vecs, l2.null_vecs, l2.dim_min, l2.dim_max) == (2, 1, 1, 1)
        assert l2.zero_vecs == 0 and l2.mean_norm == 1.0

    def test_ragged_dims_surface(self, spark):
        from alix_spark.textops.similarity import embedding_stats

        df = spark.createDataFrame(
            [(1, [1.0], 7), (2, [1.0, 0.0], 7)],
            "vec_id long, embedding array<float>, label int",
        )
        r = embedding_stats(df).collect()[0]
        assert (r.dim_min, r.dim_max) == (1, 2)
