"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first:
  exact          — md5 hash groupBy (one shuffle, no Python)
  ngram Jaccard  — exact set similarity over word 3-gram shingles
                   (explode + equi-join on shingle; candidate pairs only)
  MinHash + LSH  — banded MinHash bucketing → candidate join → verify
                   (the 100 TB path: candidates shrink the O(n²) pair
                   space to near-linear; all hashing vectorized numpy)
  SimHash        — 64-bit weighted fingerprint, near-dup by Hamming
                   distance on rotated prefix buckets

The shingle/token contract matches alix_spark.index.simple so exact
oracle SQL exists for the exact/Jaccard tiers; MinHash/SimHash use
seeded numpy hashing (deterministic across runs and cluster sizes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alix_spark.index.simple import gram_multiplicities, tokens_array
from alix_spark.util import ensure_py_files, maybe_broadcast, round6


def _gram_md5(gram: str) -> str:
    """md5 hex of a gram — the fixed-width shuffle key for gram joins
    (bit-identical to the oracle's md5()). hashlib binds at module
    level: this runs once per distinct gram per doc (corpus-hot), and
    a per-call import is a sys.modules lookup comparable to the md5
    itself (review batch 25)."""
    return hashlib.md5(gram.encode("utf-8")).hexdigest()

MERSENNE61 = (1 << 61) - 1


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_hash, n_docs, first_doc) for texts appearing more than once."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
        .orderBy("text_hash")
    )


def doc_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, shingles array<string>, n_sh) — distinct word n-grams,
    first-occurrence order.

    Built in mapInPandas: Spark's higher-order array functions
    (transform/sequence lambdas) are interpreted, not codegen'd, and
    measured ~6x slower than the Arrow-batched python join for this
    shape. The shingle contract (space-joined lowercase token n-grams,
    distinct) is unchanged and shared with the DuckDB oracle.

    ``toks_col`` names an already-tokenized array<string> column to use
    instead of re-tokenizing ``text_col`` — the sharing hook that lets
    a composed pipeline (webpipe.training_shard) tokenize the corpus
    ONCE for shingling, quality and repetition."""
    ensure_py_files(df.sparkSession)
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    toks = df.select(F.col(id_col).alias("doc_id"), tok_expr.alias("toks"))
    # preserve the caller's id dtype (url string keys work, like the
    # minhash/simhash tiers); NULL text (failed fetches) yields no row
    id_type = toks.schema["doc_id"].dataType.simpleString()

    def gen(it):
        for pdf in it:
            ids, shs, ns = [], [], []
            for doc_id, tl in zip(pdf["doc_id"], pdf["toks"]):
                tl = list(tl) if tl is not None else []
                sh = list(dict.fromkeys(
                    " ".join(tl[i : i + n]) for i in range(len(tl) - n + 1)
                ))
                if sh:
                    ids.append(doc_id)
                    shs.append(sh)
                    ns.append(len(sh))
            if ids:
                # an all-empty batch must yield NOTHING: a fresh empty
                # DataFrame defaults every column to float64, which
                # Arrow cannot coerce to array<string>
                yield pd.DataFrame(
                    {"doc_id": ids, "shingles": shs, "n_sh": ns}
                )

    return toks.mapInPandas(
        gen, f"doc_id {id_type}, shingles array<string>, n_sh long"
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = None,
    toks_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jac >= t).

    Shape: explode distinct shingles, equi-join on shingle (candidate
    pairs share >=1 shingle — at scale, rare shingles keep this
    sparse), then jac = |A∩B| / (|A| + |B| - |A∩B|).

    ``max_shingle_df`` (the web-scale guard): shingles appearing in
    more than that many docs are dropped BEFORE the equi-join — a
    stop-phrase shingle ("all rights reserved …") otherwise produces a
    quadratic candidate blow-up on its bucket. With the cap the result
    is a documented approximation: intersections count capped shingles
    out (jac becomes a lower bound), and pairs sharing ONLY ubiquitous
    shingles are not candidates — the standard stop-shingle trade.
    Default None = exact (the oracle-matched contract setting).
    """
    sh = doc_shingles(df, id_col, text_col, n, toks_col=toks_col)
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("sh"))
    if max_shingle_df is not None:
        hot = (
            ex.groupBy("sh")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("sh")
        )
        # count-guarded: with a low cap on a web-scale corpus the hot
        # set can be a large fraction of the shingle vocabulary —
        # above the guard the plain shuffle anti-join is the right plan
        ex = ex.join(maybe_broadcast(hot), "sh", "left_anti")
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "sh")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jac",
            round6(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))),
        )
        .filter(F.col("jac") >= threshold)
        .select("doc_a", "doc_b", "jac")
        .orderBy("doc_a", "doc_b")
    )


def _md5_hash60(strings) -> "np.ndarray":
    """Deterministic 60-bit hash = first 15 hex chars of md5, as uint64.

    Chosen over SipHash because BOTH engines of the correctness
    contract can compute it: Spark ``conv(substr(md5(s),1,15),16,10)``
    and DuckDB ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)`` — which
    makes MinHash/SimHash signatures (and therefore the LSH dedup
    output) exactly oracle-checkable in SQL. 60 bits keeps every value
    inside a signed 64-bit integer on both sides."""
    import hashlib

    n = len(strings)
    out = np.empty(n, dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[:8], "big"
        ) >> 4
    return out


def minhash_perms(num_perm: int = 64, seed: int = 42):
    """The seeded permutation constants h_i(x) = (a_i·x + b_i) mod p31.

    Exposed so the DuckDB oracle SQL can embed the SAME constants as
    literals — signatures must agree bit-for-bit across engines."""
    p31 = (1 << 31) - 1
    rng = np.random.RandomState(seed)
    a = rng.randint(1, p31, size=num_perm).astype(np.uint64)
    b = rng.randint(0, p31, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signatures(
    sh: DataFrame, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """(doc_id, sig array<long>) MinHash signatures via vectorized numpy
    inside mapInPandas (Arrow batches; no per-row Python UDF).

    Shingle hash = md5-60bit (``_md5_hash60``) so the signatures — and
    the whole banded-LSH dedup output — are reproducible in ANSI SQL
    and oracle-checked by the driver contract, not just rows-only.
    Permutations h_i(x) = (a_i * x + b_i) mod p31, a/b from a seeded
    generator (``minhash_perms``) so signatures are identical at any
    parallelism (cluster-size invariant).
    """
    ensure_py_files(sh.sparkSession)
    # permutations over p = 2^31-1: a, h < 2^31 keeps a*h+b < 2^62, so
    # the whole (num_perm × n_shingles) outer product runs in native
    # uint64 — no object-dtype big-int fallback
    p31 = np.uint64((1 << 31) - 1)
    a, b = minhash_perms(num_perm, seed)

    def gen(it):
        for pdf in it:
            sigs = []
            for shingles in pdf["shingles"]:
                if len(shingles) == 0:
                    sigs.append([0] * num_perm)
                    continue
                h = _md5_hash60(shingles) % p31
                hm = (a[:, None] * h[None, :] + b[:, None]) % p31
                sigs.append(hm.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    schema = T.StructType(
        [
            T.StructField("doc_id", sh.schema["doc_id"].dataType),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    return sh.select("doc_id", "shingles").mapInPandas(gen, schema)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH, verified by exact Jaccard.

    bands × rows = num_perm; a pair collides if any band's row-slice is
    identical. Candidates are verified with the exact shingle Jaccard so
    the output is deterministic (LSH only prunes the pair space).
    """
    if num_perm % bands:
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm} — a remainder "
            "silently drops permutations and weakens the configured LSH"
        )
    rows = num_perm // bands
    # the shingle table feeds signature generation AND both sides of the
    # candidate verification join — materialize or it is computed 3x.
    # localCheckpoint (lazy), not persist(): the ContextCleaner reclaims
    # the blocks when this query's DataFrame goes out of scope, so a
    # long-lived serving session does not leak one cached shingle table
    # per call (at scale: a staging table instead)
    sh = doc_shingles(df, id_col, text_col, n).localCheckpoint(eager=False)
    sig = minhash_signatures(sh, num_perm, seed)
    band_cols = F.explode(
        F.expr(
            f"transform(sequence(0, {bands - 1}), "
            f"b -> struct(b as band, concat_ws(',', slice(sig, b * {rows} + 1, {rows})) as key))"
        )
    ).alias("bk")
    buckets = sig.select("doc_id", band_cols).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"), F.col("n_sh").alias("na"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"), F.col("n_sh").alias("nb"))
    v = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("jac", round6(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))))
        .filter(F.col("jac") >= threshold)
    )
    return v.select("doc_a", "doc_b", "jac").orderBy("doc_a", "doc_b")


SIMHASH_BITS = 60  # md5-60bit token hash → SQL-expressible oracle


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash) 60-bit SimHash over md5-hashed tokens weighted
    by tf — vectorized numpy in mapInPandas.

    60 bits (not 64) so the token hash is the shared ``_md5_hash60``
    and the fingerprint — hence the whole near-dup pair output — is
    bit-identical to the DuckDB oracle SQL; everything stays inside a
    signed 64-bit integer on both engines."""
    ensure_py_files(df.sparkSession)
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_array(df, text_col).alias("toks"))

    def gen(it):
        nb = SIMHASH_BITS
        for pdf in it:
            fps = []
            for tl in pdf["toks"]:
                if tl is None or len(tl) == 0:  # NULL text: empty doc
                    fps.append(0)
                    continue
                vals, counts = np.unique(np.asarray(tl, dtype=object), return_counts=True)
                h = _md5_hash60(vals)
                bits = ((h[:, None] >> np.arange(nb, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                fps.append(int((np.uint64(1) << np.arange(nb, dtype=np.uint64))[v > 0].sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": pd.array(fps, dtype="int64")})

    schema = T.StructType(
        [
            T.StructField("doc_id", toks.schema["doc_id"].dataType),
            T.StructField("simhash", T.LongType()),
        ]
    )
    return toks.mapInPandas(gen, schema)


def simhash_chunks(max_hamming: int) -> tuple[list[int], list[int]]:
    """(bit offsets, masks) of the ``max_hamming + 1`` chunks covering
    the 60-bit fingerprint — shared with the DuckDB oracle so both
    engines block identically."""
    n_chunks = max_hamming + 1
    base, rem = divmod(SIMHASH_BITS, n_chunks)
    if base == 0:
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_chunks} chunks over "
            f"{SIMHASH_BITS} bits — threshold too high for this scheme"
        )
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    offsets, off = [], 0
    for w in widths:
        offsets.append(off)
        off += w
    masks = [(1 << w) - 1 for w in widths]
    return offsets, masks


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Scale path: block on ``max_hamming + 1`` bit chunks (pigeonhole —
    with h differing bits and h+1 chunks, SOME chunk is untouched, so
    every qualifying pair shares at least one exact chunk key), join
    per chunk, verify with bit_count. Avoids the O(n²) cross join.
    A FIXED chunk count independent of the threshold silently loses
    pairs: 4×15-bit blocking is complete only for Hamming ≤ 3, and a
    pair differing in 4 bits spread one-per-chunk shares nothing.
    Trade-off: higher thresholds mean narrower chunks (denser buckets,
    more candidates) — the inherent recall/cost dial of this scheme.
    """
    offsets, masks = simhash_chunks(max_hamming)
    fp = simhash_fingerprints(df, id_col, text_col)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), off)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for c, (off, mask) in enumerate(zip(offsets, masks))
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the semantic dedup tier
    (briefing): (id_a, id_b, cos) for every pair with round6(cosine) ≥
    ``threshold``, id_a < id_b.

    Scale shape: candidates come from the SAME seeded ±1 hyperplane
    sign buckets as :func:`alix_spark.textops.similarity.ann_lsh_topk`
    (one mapInPandas pass, one equi-self-join on the bucket key —
    candidate space ~ Σ bucket², never corpus²); each candidate is then
    EXACTLY verified by cosine, so precision is 1.0 by construction and
    only recall depends on the planes (raise n_planes for bigger
    corpora; a near-identical pair disagrees with a random hyperplane
    with probability θ/π ≈ 0 — e.g. cos ≥ 0.95 ⇒ ≥ 0.92^n_planes
    same-bucket odds). Same candidates→verify contract as
    minhash_lsh_pairs, so the DuckDB oracle replicates it bit-for-bit
    with the plane literals embedded in the SQL."""
    from alix_spark.textops.similarity import _dot, _norm, lsh_signatures
    from alix_spark.util import round6

    # lsh_signatures names its id output 'vec_id' regardless of id_col
    sig = lsh_signatures(
        emb, n_planes, dim, seed, id_col=id_col, vec_col=vec_col
    ).withColumnRenamed("vec_id", id_col)
    tagged = emb.select(id_col, vec_col).join(sig, id_col)
    a = tagged.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        round6(_dot("va", "vb") / (_norm("va") * _norm("vb"))).alias("cos"),
    )
    return (
        scored.filter(F.col("cos") >= F.lit(threshold))
        .orderBy("id_a", "id_b")
    )


def dup_groups(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, group_id): connected components of a near-dup pair
    graph; ``group_id`` is the component's minimum doc id — the keeper
    a dedup stage retains, every other member is the drop list. Docs
    with no dup pair never appear (they keep themselves trivially).

    This is the missing step between the pair-emitting tiers
    (jaccard/minhash/simhash/embedding) and an actionable keep/drop
    decision: transitive near-dups (A~B, B~C, A!~C) must land in ONE
    group or the pipeline keeps two of the three copies.

    Scale shape: distributed min-label propagation with per-round
    POINTER JUMPING — labels start at the node id; each round every
    node takes the min of its own and its neighbors' labels, then
    shortcuts through its label's label (``label ← label(label)``,
    the Shiloach-Vishkin / large-star round-halving move: label
    chains halve in depth each round while propagation extends reach,
    so an adversarial D-hop path converges in O(log D) rounds, not
    O(D) — a 100-hop chain lands well inside max_iter=25 instead of
    raising; dup clusters are cliques/short chains, 2-3 rounds in
    practice). The edge-side work per round is unchanged — ONE
    shuffle join + ONE aggregation over the edge list; the shortcut
    is a self-join on the lazily-pinned (node, label) candidate
    table, which is ≤ the node count and far smaller than the edges. The jump is safe because
    labels are monotone non-increasing and every label value IS a
    node id in the same component, so label(label) exists and is ≤
    label. Lineage is cut per round with an eager localCheckpoint so
    the plan and the convergence check never re-execute prior
    rounds."""
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # lazily pinned (localCheckpoint eager=False): cand sits on
        # BOTH sides of the jump self-join below — the pin computes
        # the edge join + agg once and shares the partitions, instead
        # of trusting ReusedExchange to dedup the doubled subtree
        cand = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # pointer jump: label ← label(label). Left join + coalesce
        # only as belt-and-braces — every label is a live node id.
        ptr = cand.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new = (
            cand.join(ptr, cand["label"] == ptr["pnode"], "left")
            .select(
                "node",
                F.coalesce(F.col("plabel"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
        )
        done = changed.isEmpty()
        labels = new
        if done:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("group_id")
            ).orderBy("doc_id")
    raise RuntimeError(
        f"dup_groups did not converge in {max_iter} rounds — component "
        "diameter exceeds the bound; raise max_iter"
    )


def dedup_canonical(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_id, group_id, quality, keeper_id, keep): per-near-dup-
    cluster CANONICAL selection — the decision step a production dedup
    pipeline runs after connected components: instead of blindly
    keeping the minimum doc id, keep the highest-QUALITY member of
    each cluster (quality_scores' composite), ties broken by doc id
    asc. Near-dup clusters routinely mix a clean original with
    truncated/boilerplate-wrapped recrawls; min-id keeps whichever was
    crawled first, keep-best keeps the copy worth training on.

    Composition: jaccard_pairs (threshold ``threshold``) → dup_groups
    connected components → quality join → per-group argmax. The NEW
    machinery is the argmax: a row_number window over group_id
    (partitions = clusters, each a handful of rows) picks rn=1, and the
    keeper id rides back on a count-guarded broadcast join. Docs in no
    cluster keep themselves trivially and never appear (dup_groups
    contract). Determinism: quality is round6-quantized on both
    engines, so the (quality DESC, doc_id ASC) order has no float
    half-case; the window shuffles only cluster MEMBERS (a tiny
    fraction of the corpus), never the corpus itself."""
    from pyspark.sql.window import Window

    from alix_spark.textops.textstats import quality_scores

    # tokenize ONCE: both the shingle stage and the quality stage read
    # the same lazily-pinned toks column (the training_shard
    # one-tokenize pattern, review batch 15/26)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        tokens_array(df, text_col).alias("toks"),
    ).localCheckpoint(eager=False)
    pairs = jaccard_pairs(base, threshold=threshold, n=n, toks_col="toks")
    groups = dup_groups(pairs)
    quality = quality_scores(base, toks_col="toks").select(
        "doc_id", "quality"
    )
    # lazy pin: members feeds BOTH the keeper window (whose
    # maybe_broadcast count is the first action) and the final join —
    # without it the quality scan + CC join would run twice
    members = groups.join(quality, "doc_id").localCheckpoint(eager=False)
    w = Window.partitionBy("group_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    keepers = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("group_id", F.col("doc_id").alias("keeper_id"))
    )
    return (
        members.join(maybe_broadcast(keepers), "group_id")
        .select(
            "doc_id",
            "group_id",
            "quality",
            "keeper_id",
            (F.col("doc_id") == F.col("keeper_id")).alias("keep"),
        )
        .orderBy("doc_id")
    )


def dup_spans(
    docs: DataFrame,
    k: int = 50,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, n_spans, dup_tokens, dup_ratio): exact
    substring deduplication at token granularity — the ExactSubstr
    pattern of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"). A token position is *duplicated* when
    some k-token window covering it appears verbatim in >= ``min_df``
    DISTINCT documents; overlapping duplicated windows merge into
    maximal spans. Output is the per-doc audit a removal stage acts
    on: span count, covered-token count, covered fraction (round6).

    Scale shape (the suffix-array step of the paper re-expressed as
    joins): Arrow-batched k-gram md5 hashing (one pass per doc, no
    interpreted array lambdas), ONE aggregate on the gram hash for
    cross-doc df, one hash join back (count-guarded broadcast of the
    duplicated-hash set), then a per-doc window pass. Because k is
    constant, interval ends are monotone in start order, so merged
    spans need only lag(pos) — gaps-and-islands without exploding the
    k positions of every window (the naive position-explode multiplies
    the shuffle by k; at k=50 that is 50x the bytes). Per-doc work is
    O(tokens log tokens) in the window sort, never O(n^2) pairs.
    The gram stage executes twice (once under the df aggregate, once
    as the probe side) — the standard frequency-semi-join shape: the
    stage is embarrassingly parallel CPU with no shuffle of its own,
    and recomputing it beats materializing a token-count-sized gram
    table at corpus scale (callers that prefer to trade storage for
    the second pass can persist ``docs`` upstream).

    Docs with NULL/empty text or fewer than k tokens appear with zero
    spans. ``toks_col`` reuses an existing array<string> tokenization
    (the training_shard single-tokenize hook)."""
    if k < 1 or min_df < 2:
        raise ValueError(f"k={k} must be >= 1 and min_df={min_df} >= 2")
    ensure_py_files(docs.sparkSession)
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(docs, text_col)
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), tok_expr.alias("toks"))
    id_type = toks.schema["doc_id"].dataType.simpleString()
    base = toks.select(
        "doc_id",
        F.coalesce(F.size("toks"), F.lit(0)).cast("long").alias("n_tokens"),
    )

    def gen(it):
        import hashlib

        for pdf in it:
            ids, poss, hs = [], [], []
            for doc_id, tl in zip(pdf["doc_id"], pdf["toks"]):
                tl = list(tl) if tl is not None else []
                for i in range(len(tl) - k + 1):
                    ids.append(doc_id)
                    poss.append(i)
                    hs.append(
                        hashlib.md5(
                            " ".join(tl[i : i + k]).encode("utf-8")
                        ).hexdigest()
                    )
            if ids:
                yield pd.DataFrame({"doc_id": ids, "pos": poss, "gh": hs})

    grams = toks.mapInPandas(gen, f"doc_id {id_type}, pos long, gh string")
    # lazy localCheckpoint: maybe_broadcast's count job materializes
    # the (small, post-filter) duplicated-hash set, so the count and
    # the join build side share ONE gram pass instead of each
    # re-deriving it — without it the gram stage runs three times
    # (count, build, probe), not the two the contract costs out.
    # ContextCleaner reclaims the checkpoint blocks via GC.
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("df_docs"))
        .filter(F.col("df_docs") >= min_df)
        .select("gh")
        .localCheckpoint(eager=False)
    )
    starts = grams.join(maybe_broadcast(dup), "gh").select("doc_id", "pos")

    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = starts.select(
        "doc_id",
        "pos",
        # a new span begins when this window's start clears the previous
        # window's coverage ([lag, lag+k-1]) by more than one token
        F.when(
            F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > k),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    spans = (
        flagged.select(
            "doc_id",
            "pos",
            F.sum("brk")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("island"),
        )
        .groupBy("doc_id", "island")
        .agg((F.max("pos") - F.min("pos") + F.lit(k)).alias("span_toks"))
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_toks").cast("long").alias("dup_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                round6(
                    F.coalesce(F.col("dup_tokens"), F.lit(0))
                    / F.col("n_tokens")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


def source_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    max_sources_per_text: int = 64,
) -> DataFrame:
    """(source_a, source_b, n_shared, overlap): cross-source
    exact-duplicate overlap matrix — for each unordered source pair,
    the number of distinct text contents (md5, the exact-dedup key)
    present in BOTH, and the overlap coefficient
    ``n_shared / min(|A|, |B|)`` over each source's distinct contents.
    The crawl-curation signal behind mirror/syndication detection: a
    pair near 1.0 is the same feed crawled twice — deduplicate before
    mixing, or the mix double-counts that content's weight.

    Scale shape: contents collapse to distinct (source, md5) pairs
    first (one map-side-combined aggregation — the payload never
    enters the join), the matrix is an equi-JOIN on the hash (never an
    all-pairs source scan), and a df-cap drops hashes present in more
    than ``max_sources_per_text`` sources before the join: pairs grow
    as k² per shared hash, and at web scale a blank page lives in
    every domain (the same hot-key guard as the n-gram tier's
    shingle df-cap). Denominators use the UNCAPPED per-source distinct
    counts. NULL texts carry no content and are excluded."""
    d = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("source"),
            F.md5(F.col(text_col)).alias("h"),
        )
        .distinct()
    )
    capped = (
        d.groupBy("h")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") <= max_sources_per_text)
        .select("h")
    )
    dd = d.join(capped, "h")
    pairs = (
        dd.select("h", F.col("source").alias("source_a"))
        .join(dd.select("h", F.col("source").alias("source_b")), "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sizes = d.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    sa = maybe_broadcast(
        sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    )
    sb = maybe_broadcast(
        sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    )
    return (
        pairs.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            round6(
                F.col("n_shared").cast("double") / F.least("n_a", "n_b")
            ).alias("overlap"),
        )
        .orderBy("source_a", "source_b")
    )


def onion_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_grams, dup_grams, dup_ratio, keep): ONION-style
    duplicate n-gram ratio gate (Pomikalek 2011, "Removing Boilerplate
    and Duplicate Content from Web Corpora", ch. 5 — the onion tool's
    doc-level resemblance filter, order-independent variant).

    A gram POSITION is duplicate when its word n-gram occurs >= 2
    times in the whole corpus (within-doc repeats count — the
    symmetric restatement of onion's seen-before test that does not
    depend on document processing order, so the verdict is
    partitioning- and resume-stable); a doc is kept while duplicate
    positions are at most half its gram positions (onion's default
    0.5 threshold), compared in integer cross-multiplied form
    (2*dup_grams <= n_grams) so keep never touches a float. Docs with
    fewer than ``n`` tokens (or NULL text) carry no evidence:
    n_grams = 0, dup_ratio NULL, keep true.

    Scale shape: one Arrow pass emits (doc, gram-md5, multiplicity) —
    one row per DISTINCT gram per doc, never per position; gram totals
    are one map-side-combined groupBy on the fixed-width hash; the
    totals->doc join is a plain shuffle equi-join on that hash (the
    gram table is linear in corpus tokens and is never broadcast or
    collected); the per-doc rollup is a second combine-friendly
    groupBy. ``toks_col`` names a pre-tokenized array<string> column
    (the training_shard single-tokenize hook).
    """
    ensure_py_files(df.sparkSession)
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    toks = df.select(F.col(id_col).alias("doc_id"), tok_expr.alias("toks"))
    # lazy localCheckpoint: the gram table feeds the totals aggregation
    # AND the probe side of the totals->doc join — without the pin the
    # tokenize+md5 Arrow stage runs twice per action (review batch 24;
    # the minhash_lsh_pairs trade: ContextCleaner reclaims the blocks)
    ex = gram_multiplicities(
        toks, (n,), "h", "string", key_fn=_gram_md5
    ).localCheckpoint(eager=False)
    totals = ex.groupBy("h").agg(F.sum("m").alias("c"))
    per_doc = (
        ex.join(totals, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("c") > 1, F.col("m")).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_grams"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("dup_grams"), F.lit(0))
            .cast("long")
            .alias("dup_grams"),
            F.when(
                F.col("n_grams") > 0,
                round6(F.col("dup_grams") / F.col("n_grams")),
            ).alias("dup_ratio"),
            (
                2 * F.coalesce(F.col("dup_grams"), F.lit(0))
                <= F.coalesce(F.col("n_grams"), F.lit(0))
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def bloom_membership(
    docs: DataFrame,
    is_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """(doc_id, n_hits, maybe_dup): memory-bounded approximate
    membership gate (Bloom 1970) — the incremental-crawl dedup tier:
    build a Bloom filter over the exact-content md5s of the docs
    matching ``is_ref`` (the already-ingested corpus), then gate every
    candidate (non-ref) doc on membership. ``maybe_dup`` true means
    "possibly already ingested — route to the exact tier"; false is a
    GUARANTEED new content (Bloom filters have no false negatives).
    The CCNet/BigScience pre-dedup pattern: the filter is sized by
    ``m_bits`` alone, NOT by the reference corpus, so at 10^12 ingested
    docs the gate is still a fixed-size broadcast, never a join against
    the full hash set.

    Hash family: position_i = int(md5(text)[8i : 8i+8], 16) % m_bits
    for i < k (independent 32-bit slices of one md5 — deterministic,
    partitioning-stable, and expressible verbatim in ANSI SQL, which is
    what makes this tier oracle-checkable bit-for-bit). k <= 4 slices;
    false-positive rate ~= (1 - e^(-k*n_ref/m_bits))^k — size m_bits
    ~= 10 * k * n_ref for sub-percent rates.

    Scale shape: the build side collapses to DISTINCT bit positions
    (<= k * n_ref rows) then packs them into <= m_bits/32 (word, bits)
    rows via bit_or — the ONLY corpus-sized work is that one map-side-
    combined aggregation, pinned (lazy localCheckpoint) so it runs once,
    not once per probe join. The packed filter is broadcast UNCONDITIONALLY
    (its row count is structurally bounded by m_bits/32, independent of
    the corpus — the one case where a count-guard would be noise), and
    the probe is k chained broadcast hash joins + bitwise tests:
    ZERO shuffles over the candidate corpus at any scale. NULL-text
    candidates carry no content: n_hits and maybe_dup are NULL.
    Docs whose ``is_ref`` is NULL are candidates (only true builds)."""
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4] (md5 has 4 32-bit slices), got {k}")
    if m_bits < 32:
        raise ValueError(f"m_bits must be >= 32, got {m_bits}")

    def positions(h):
        return [
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
            % F.lit(int(m_bits))
            for i in range(k)
        ]

    ref = docs.filter(
        F.coalesce(is_ref, F.lit(False)) & F.col(text_col).isNotNull()
    ).select(F.md5(F.col(text_col)).alias("_h"))
    pos = ref.select(
        F.explode(F.array(*positions(F.col("_h")))).alias("_p")
    ).distinct()
    words = pos.groupBy(F.expr("_p DIV 32").alias("_w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))")
        ).alias("_bits")
    )
    # lazy localCheckpoint: the packed filter feeds k broadcast
    # exchanges — without the pin each broadcast recomputes the whole
    # reference-corpus scan + position collapse (k corpus scans); with
    # it the build runs once and the k broadcasts read the <= m/32
    # pinned rows (the minhash_lsh_pairs trade: ContextCleaner
    # reclaims the blocks)
    words = words.localCheckpoint(eager=False)

    cand = docs.filter(~F.coalesce(is_ref, F.lit(False))).select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("_h"),
    )
    probe = cand.select(
        "doc_id",
        *[p.alias(f"_p{i}") for i, p in enumerate(positions(F.col("_h")))],
    )
    # one staged select per derived layer (positions -> word/mask) so
    # the md5 expression is evaluated once per row, not once per slice
    probe = probe.select(
        "doc_id",
        *[F.expr(f"_p{i} DIV 32").alias(f"_w{i}") for i in range(k)],
        *[
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 32 AS INT))").alias(f"_m{i}")
            for i in range(k)
        ],
    )
    for i in range(k):
        flt = F.broadcast(
            words.select(
                F.col("_w").alias(f"_fw{i}"), F.col("_bits").alias(f"_fb{i}")
            )
        )
        probe = probe.join(flt, probe[f"_w{i}"] == flt[f"_fw{i}"], "left")
    hits = [
        (
            F.coalesce(F.col(f"_fb{i}"), F.lit(0).cast("long")).bitwiseAND(
                F.col(f"_m{i}")
            )
            == F.col(f"_m{i}")
        ).cast("int")
        for i in range(k)
    ]
    n_hits = hits[0]
    for h in hits[1:]:
        n_hits = n_hits + h
    return probe.select(
        "doc_id",
        n_hits.cast("long").alias("n_hits"),
        (n_hits == F.lit(k)).alias("maybe_dup"),
    ).orderBy("doc_id")
