"""Correspondence-analysis factor map from a contingency table.

Re-implements the reference's residual-SVD pipeline
(util/.../maths/ContingencySvd.java — IPF independence fit, signed
association residuals, SVD, axis weighting U·Σ^p, CA row-mass scaling;
driven by web/.../OpClades.java:1-46 for term×part factor maps and by
common/.../cli/Lucene2vec.java:1-30 for embedding exports) in numpy.

Spark does what Spark is good at — the distributed contingency
aggregation (term×part counts over billions of tokens) — and the tiny
dense matrix (top-terms × parts, e.g. 500×20) is decomposed on the
driver, exactly as the reference decomposes in-process after collecting
postings counts. Residual formulas (ContingencySvd.java:630-648):

    FT      = √O + √(O+1) − √(4E+1)
    G2      = sign(O−E) · √max(0, 2(O·ln(O/E) − O + E))
    PEARSON = (O − E)/√E
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contingency(
    tok: DataFrame, doc_parts: DataFrame, top_terms: int = 200
) -> tuple[list[str], list[str], np.ndarray]:
    """Distributed (term × part) count matrix for the most frequent
    terms. Returns (terms, parts, observed)."""
    from alix_spark.util import maybe_broadcast

    # NULL parts carry no label: excluded up front (review batch 33 —
    # a None part crashed the sorted() part axis and would otherwise
    # occupy a phantom matrix column)
    doc_parts = doc_parts.filter(F.col("part").isNotNull())
    # per-doc label table grows with the corpus: count-guarded, the
    # partition.py:458 precedent (review batch 27). The joined base is
    # lazily pinned: BOTH aggregates below (top terms + cells) read
    # it, and without the pin the corpus-scale token join ran twice
    # per call (the batch-24 shared-base discipline).
    t = tok.join(maybe_broadcast(doc_parts), "doc_id").localCheckpoint(
        eager=False
    )
    top = (
        t.groupBy("term").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term")).limit(top_terms)
    )
    cells = (
        t.join(F.broadcast(top.select("term")), "term")
        .groupBy("term", "part")
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    terms = sorted({r["term"] for r in cells})
    parts = sorted({r["part"] for r in cells})
    ti = {x: i for i, x in enumerate(terms)}
    pi = {x: i for i, x in enumerate(parts)}
    obs = np.zeros((len(terms), len(parts)))
    for r in cells:
        obs[ti[r["term"]], pi[r["part"]]] = r["freq"]
    return terms, parts, obs


def ipf_expectation(
    obs: np.ndarray, iters: int = 100, tol: float = 1e-10
) -> np.ndarray:
    """Iterative proportional fitting of the independence model
    (ContingencySvd.expectationIpf): expected matrix with the observed
    row and column margins."""
    row = obs.sum(axis=1)
    col = obs.sum(axis=0)
    e = np.outer(row, col) / max(obs.sum(), 1e-300)
    for _ in range(iters):
        rs = e.sum(axis=1)
        e *= np.where(rs > 0, row / np.where(rs > 0, rs, 1.0), 0.0)[:, None]
        cs = e.sum(axis=0)
        e *= np.where(cs > 0, col / np.where(cs > 0, cs, 1.0), 0.0)[None, :]
        if (
            np.abs(e.sum(axis=1) - row).max() < tol
            and np.abs(e.sum(axis=0) - col).max() < tol
        ):
            break
    return e


def residuals(obs: np.ndarray, exp: np.ndarray, assoc: str = "PEARSON") -> np.ndarray:
    exp_safe = np.where(exp > 0, exp, 1e-300)
    if assoc == "FT":
        return np.sqrt(obs) + np.sqrt(obs + 1.0) - np.sqrt(4.0 * exp + 1.0)
    if assoc == "G2":
        with np.errstate(divide="ignore", invalid="ignore"):
            lg = np.where(obs > 0, obs * np.log(obs / exp_safe), 0.0)
        dev = 2.0 * (lg - obs + exp)
        return np.sign(obs - exp) * np.sqrt(np.maximum(dev, 0.0))
    if assoc == "PEARSON":
        return (obs - exp) / np.sqrt(exp_safe)
    raise KeyError(assoc)


def randomized_svd(
    a: np.ndarray,
    k: int,
    oversamples: int = 20,
    power_iterations: int = 4,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Halko–Martinsson–Tropp randomized truncated SVD — the
    reference's big-matrix path (util/.../maths/RandomizedSvd.java:
    49-125; defaults oversamples=20, power iterations=4 from :52-55).

    Range finder: Y = A·Ω with a seeded Gaussian Ω (k+p columns),
    orthonormalized; ``power_iterations`` subspace-iteration passes
    with re-orthonormalization sharpen the captured range for slowly
    decaying spectra; the small (k+p)-column projection B = Qᵀ·A is
    decomposed exactly and lifted back. Deterministic for a fixed seed
    (cluster-size-invariant, same contract as the exact path).

    Returns (u, s, vt) truncated to ``k``.
    """
    m, n = a.shape
    limit = min(m, n)
    k = min(k, limit)
    sample = min(k + oversamples, limit)
    rng = np.random.RandomState(seed)
    omega = rng.standard_normal((n, sample))
    y = a @ omega
    q, _ = np.linalg.qr(y)
    for _ in range(power_iterations):
        z, _ = np.linalg.qr(a.T @ q)
        q, _ = np.linalg.qr(a @ z)
    b = q.T @ a
    ub, s, vt = np.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :k], s[:k], vt[:k]


# above this row count the exact LAPACK SVD of the residual matrix is
# no longer cheap driver-side work — switch to the randomized range
# finder (the reference flips to RandomizedSvd for its big term×doc
# CA maps for the same reason)
RANDOMIZED_SVD_MIN_ROWS = 2000


def _residual_svd(res: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(u, s) of the residual matrix: exact for small matrices,
    randomized (seeded, deterministic) for large ones."""
    if min(res.shape) <= RANDOMIZED_SVD_MIN_ROWS:
        u, s, _vt = np.linalg.svd(res, full_matrices=False)
        return u, s
    u, s, _vt = randomized_svd(res, k=min(k + 16, min(res.shape)))
    return u, s


def _stable_signs(u: np.ndarray) -> np.ndarray:
    """Deterministic SVD sign convention: the largest-|value| component
    of each left singular vector is made positive (rank-identity across
    runs and cluster sizes — SVD signs are otherwise arbitrary)."""
    idx = np.argmax(np.abs(u), axis=0)
    signs = np.sign(u[idx, np.arange(u.shape[1])])
    signs[signs == 0] = 1.0
    return signs


def ca_map(
    tok: DataFrame,
    doc_parts: DataFrame,
    top_terms: int = 200,
    axes: int = 2,
    assoc: str = "PEARSON",
    axis_power: float = 1.0,
    row_mass_scale: bool = True,
) -> pd.DataFrame:
    """Full pipeline → pandas (term, x, y, …, cos2, inertia share).

    axis_power: 0 → U, 0.5 → U√Σ, 1 → UΣ (weightAxes,
    ContingencySvd.java:571)."""
    terms, parts, obs = contingency(tok, doc_parts, top_terms)
    if obs.size == 0 or not terms:
        # no rows/parts matched (e.g. a part column NULL everywhere):
        # an empty factor map, not an argmax-of-empty crash downstream
        cols = [f"axis{i + 1}" for i in range(axes)]
        empty = pd.DataFrame(
            {"term": [], **{c: [] for c in cols}, "cos2": []}
        )
        empty.attrs["axis_inertia"] = []
        empty.attrs["parts"] = parts
        return empty
    exp = ipf_expectation(obs)
    res = residuals(obs, exp, assoc)
    u, s = _residual_svd(res, axes)
    k = min(axes, s.size)
    signs = _stable_signs(u[:, :k])
    coords = u[:, :k] * signs[None, :] * np.power(s[:k], axis_power)[None, :]
    if row_mass_scale:
        mass = obs.sum(axis=1) / max(obs.sum(), 1e-300)
        coords = coords / np.sqrt(np.where(mass > 0, mass, 1e-300))[:, None]
    total_inertia = float((res**2).sum())
    axis_inertia = (s[:k] ** 2) / max(total_inertia, 1e-300)
    # cos2: share of a row's (principal-coordinate) squared norm carried
    # by the kept axes — computed pre-mass-scaling; the row-mass factor
    # cancels in the ratio so it must not be applied to one side only
    full = u * np.power(s, axis_power)[None, :]
    cos2 = (full[:, :k] ** 2).sum(axis=1) / np.maximum(
        (full**2).sum(axis=1), 1e-300
    )
    out = {"term": terms}
    # ALWAYS emit axis1..axis{axes}: fewer parts than axes would
    # otherwise shrink the schema while the empty-input branch emits
    # all of them — downstream readers need ONE stable shape (review
    # batch 33). Axes past the spectrum carry zero inertia: 0.0.
    for j in range(axes):
        out[f"axis{j + 1}"] = (
            np.round(coords[:, j], 6) if j < k else np.zeros(len(terms))
        )
    out["cos2"] = np.round(cos2, 6)
    df = pd.DataFrame(out)
    df.attrs["axis_inertia"] = axis_inertia.tolist()
    df.attrs["parts"] = parts
    return df


def ca_map_df(spark, tok, doc_parts, top_terms=100, axes=2) -> DataFrame:
    """Spark DataFrame wrapper for the driver contract. Explicit
    schema: createDataFrame cannot infer one from the guarded
    empty-input pandas frame (review batch 33), and the column set is
    stable by construction (axis padding above)."""
    pdf = ca_map(tok, doc_parts, top_terms=top_terms, axes=axes)
    schema = "term string, " + ", ".join(
        f"axis{i + 1} double" for i in range(axes)
    ) + ", cos2 double"
    return spark.createDataFrame(pdf, schema=schema)


def embedding_export(
    tok: DataFrame,
    doc_parts: DataFrame,
    top_terms: int = 200,
    dim: int = 8,
    assoc: str = "G2",
) -> pd.DataFrame:
    """Word2vec-style term embeddings from the residual SVD — the
    reference's Lucene2vec export (common/.../cli/Lucene2vec.java:1-30:
    term×doc G² residuals → SVD → w2v vectors; here the ``U·√Σ``
    axis weighting the docblock recommends for embedding reads,
    ContingencySvd.java:571). Returns pandas (term, v0..v{dim-1}),
    rows unit-normalized (downstream readers rank by dot product)."""
    terms, _parts, obs = contingency(tok, doc_parts, top_terms)
    if obs.size == 0 or not terms:
        # same empty-input contract as ca_map (review batch 27): no
        # matched rows/parts → an empty export, not an
        # argmax-of-empty crash inside _stable_signs
        return pd.DataFrame({"term": [], **{f"v{j}": [] for j in range(dim)}})
    exp = ipf_expectation(obs)
    res = residuals(obs, exp, assoc)
    u, s = _residual_svd(res, dim)
    k = min(dim, s.size)
    signs = _stable_signs(u[:, :k])
    vecs = u[:, :k] * signs[None, :] * np.sqrt(s[:k])[None, :]
    norms = np.sqrt((vecs**2).sum(axis=1))
    vecs = vecs / np.where(norms > 0, norms, 1.0)[:, None]
    out = {"term": terms}
    # stable v0..v{dim-1} schema, zero-padded past the spectrum (the
    # ca_map rationale above; review batch 33)
    for j in range(dim):
        out[f"v{j}"] = (
            np.round(vecs[:, j], 6) if j < k else np.zeros(len(terms))
        )
    return pd.DataFrame(out)
