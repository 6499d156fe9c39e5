"""Web-pipeline hygiene operators for training-data preparation:
URL canonicalization + URL-duplicate grouping, PII scrubbing, and
per-domain corpus statistics.

The reference engine ingests a frozen curated corpus (SURVEY §2.1);
a continuously-crawled training pipeline needs the steps that come
BEFORE that freeze: collapsing crawl-duplicate URLs (mirror schemes,
tracking parameters, fragments), redacting personally identifying
strings from text shards, and per-domain roll-ups for source-level
filtering decisions. All three are pure column expressions / single
partial aggregations (JVM-side, codegen'd):

- :func:`canonical_url` — deterministic URL normal form (lowercased
  scheme+authority, default ports dropped, ``utm_*`` tracking
  parameters removed, fragment and trailing slash stripped). No UDF:
  a fixed chain of ``regexp_extract`` / ``regexp_replace`` steps whose
  patterns avoid backreferences so the same chain runs verbatim in
  ANSI SQL (the DuckDB oracle replays it character for character).
- :func:`url_dup_groups` — crawl-duplicate groups keyed by the canon
  form. ONE hash aggregation with map-side partial counts; at 100 TB
  the shuffle carries one (canon, count, min_id) triple per distinct
  canon URL, never the raw rows.
- :func:`scrub_pii` — email / NANP-style phone / IPv4 redaction with
  per-doc match counts. One projection, zero shuffles; the match
  patterns are RE2-safe (no lookaround, no backrefs) so Spark's Java
  regex and the oracle's RE2 agree.
- :func:`domain_stats` — per-source doc counts, char volume, language
  spread and mean quality (reusing :mod:`textstats.quality_scores`
  channels). One join on doc_id + one 20-ish-row aggregation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alix_spark import util
from alix_spark.util import round6

# RE2- and Java-compatible: no backreferences, no lookaround.
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
# NANP 10-digit shapes: optional +1/1 prefix, (212) or 212 area code,
# -/./space separators; \b guards keep the match out of longer digit
# runs. Separator-less runs ('2125550199') are intentionally NOT
# matched — bare 10-digit integers are usually ids, not phones.
PHONE_RE = (
    "(\\+?1[-. ])?(\\([0-9]{3}\\) ?|\\b[0-9]{3}[-. ])"
    "[0-9]{3}[-. ][0-9]{4}\\b"
)
# dotted quad with octets bounded to 0-255: an unbounded [0-9]{1,3}
# quad would redact version/section strings like '10.20.300.456'
_OCT = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = f"\\b{_OCT}(\\.{_OCT}){{3}}\\b"

_PREFIX_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def md5_key(seed: str, id_col: str, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of md5(seed ':' id) as a BIGINT — the
    ONE deterministic sampling/ordering key shared by pack_shards,
    stratified_sample and data_split (``n_hex`` ≤ 15 keeps the value
    in 60 bits, exactly representable on both engines; the oracle
    twin is ``CAST(('0x' || substr(md5(...), 1, n)) AS BIGINT)``)."""
    if not 1 <= n_hex <= 15:
        raise ValueError(f"n_hex must be in [1, 15], got {n_hex}")
    return F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")),
                    "utf-8",
                )
            ),
            1,
            n_hex,
        ),
        16,
        10,
    ).cast("long")


def canonical_url(col: Column) -> Column:
    """Canonical form of an absolute URL column.

    Steps (in order, each a single regex pass):
    1. drop the fragment (``#…``);
    2. split into authority prefix (``scheme://host[:port]``) and rest;
    3. lowercase the prefix; drop the scheme's default port
       (``http…:80`` / ``https…:443``);
    4. remove ``utm_*`` tracking parameters from the query string,
       then any dangling ``?`` / ``&`` they leave behind;
    5. strip one trailing slash.

    Every pattern is backreference-free so the identical chain is
    expressible in DuckDB SQL (see entry_queries ``url_canon``)."""
    u = F.regexp_replace(col, "#.*", "")
    prefix = F.regexp_extract(u, _PREFIX_RE, 0)
    rest = F.substr(u, F.length(prefix) + F.lit(1))
    p = F.lower(prefix)
    p = (
        F.when(p.startswith("http://"), F.regexp_replace(p, ":80$", ""))
        .when(p.startswith("https://"), F.regexp_replace(p, ":443$", ""))
        .otherwise(p)
    )
    # Split rest into PATH and QUERY at the FIRST '?' (the only '?'
    # that delimits per RFC 3986 — later raw '?'s are legal DATA
    # inside param values), with the same extract+substr trick as the
    # authority split; utm params are then stripped from the query
    # ONLY, at parameter boundaries, in three backref-free passes
    # (replacement groups would need engine-specific syntax: Spark
    # '$1' vs RE2 '\\1'). An unanchored 'utm_[a-z]+=…' would eat PATH
    # segments ('/blog/utm_source=x/article-1' → '/blog') and other
    # params' VALUES ('?ref=…?utm_x=1'), collapsing distinct pages:
    # 1. '&utm_k=v' anywhere — a raw '&' always separates top-level
    #    params, so this is safe globally (both engines replace ALL);
    # 2. '^?utm_k=v&' — leading utm with more params following; the
    #    '?' must survive, so replace with '?' (fixed string). The ^
    #    anchor makes it single-match, so DuckDB's first-match-only
    #    default and Spark's replace-all agree;
    # 3. '^?utm_k=v$' — the only remaining param: drop entirely.
    path = F.regexp_extract(rest, "^[^?]*", 0)
    q = F.substr(rest, F.length(path) + F.lit(1))
    q = F.regexp_replace(q, "&utm_[a-z]+=[^&#]*", "")
    q = F.regexp_replace(q, "^\\?utm_[a-z]+=[^&#]*&", "?")
    q = F.regexp_replace(q, "^\\?utm_[a-z]+=[^&#]*$", "")
    q = F.regexp_replace(q, "[?&]$", "")
    return F.regexp_replace(F.concat(p, path, q), "/$", "")


def url_dup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(canon_url, n_urls, keeper): crawl-duplicate groups under
    :func:`canonical_url`, one row per canon form fetched 2+ times;
    ``keeper`` is the smallest id (the deterministic survivor the
    dedup stage would retain)."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            canonical_url(F.col(url_col)).alias("canon_url"),
        )
        .groupBy("canon_url")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("_id").alias("keeper"),
        )
        .filter(F.col("n_urls") > 1)
        .orderBy("canon_url")
    )


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, clean_md5): PII match counts
    plus the md5 of the redacted text (emails → ``<EMAIL>``, phones →
    ``<PHONE>``, IPv4 → ``<IP>``, replaced in that order — the order is
    part of the contract since a later pattern sees the earlier
    replacements). Counts are taken on the ORIGINAL text."""
    t = F.col(text_col)
    clean = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.md5(F.encode(clean, "utf-8")).alias("clean_md5"),
    )


def domain_stats(docs: DataFrame) -> DataFrame:
    """(source, n_docs, sum_chars, n_langs, mean_quality): per-domain
    roll-up for source-level keep/drop decisions (the step a pipeline
    runs before committing a domain's shards to the training mix).

    Char counts come from the quality channels (length of the actual
    text, not a stored column that may drift); docs whose text has no
    tokens are excluded exactly as in ``quality_scores``. ONE scan —
    source/lang ride through the quality projection (``carry=``), so
    the only shuffle is the final ~#domains-row aggregation (a doc_id
    self-join here would re-shuffle the whole corpus twice)."""
    from alix_spark.textops.textstats import quality_scores

    q = quality_scores(docs, carry=("source", "lang"))
    return (
        q.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            round6(F.avg("quality")).alias("mean_quality"),
        )
        .orderBy("source")
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_hit, hit_frac): benchmark decontamination —
    per training doc, how many of its distinct word n-grams also occur
    anywhere in the evaluation set. The step every training pipeline
    runs before freezing a mix: a doc sharing verbatim n-grams with a
    benchmark leaks test answers into the weights.

    Scale shape: the eval side collapses to ONE distinct shingle set —
    eval suites are thousands of docs, so it broadcasts (count-guarded
    via :func:`alix_spark.util.maybe_broadcast`) and the corpus-side
    explode→semi-join never shuffles the corpus on the shingle key; the
    only corpus-wide shuffle is the final doc_id-keyed count. Shingles
    are the same space-joined lowercase token n-grams as the dedup
    tiers (:func:`alix_spark.textops.dedup.doc_shingles`), so the
    DuckDB oracle replays the contract exactly. Clean docs appear with
    n_hit = 0 (the pipeline gates on hit_frac downstream; silently
    dropping clean docs would make the report unusable as a join side)."""
    from alix_spark.textops.dedup import doc_shingles
    from alix_spark.util import maybe_broadcast

    train = doc_shingles(docs, id_col, text_col, n=n)
    ev = (
        doc_shingles(eval_docs, id_col, text_col, n=n)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    hits = (
        train.select("doc_id", F.explode("shingles").alias("s"))
        .join(maybe_broadcast(ev), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
    return (
        train.select("doc_id", F.col("n_sh").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_hit.alias("n_hit"),
            round6(n_hit.cast("double") / F.col("n_grams")).alias("hit_frac"),
        )
        .orderBy("doc_id")
    )


def pack_shards(
    docs: DataFrame,
    budget: int = 1 << 22,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int | None = None,
    order: str = "id",
    seed: str = "alix",
) -> DataFrame:
    """(doc_id, n_tokens, tok_offset, shard_id): deterministic
    token-budget shard packing — ``tok_offset`` the global running
    token total before the doc, ``shard_id`` = tok_offset // budget
    (contiguous shards; a shard overruns the budget by at most its
    last doc, the standard writer contract).

    ``order`` picks the packing order: ``"id"`` (doc_id ascending —
    stable, resumable) or ``"hash"`` (md5(seed ':' doc_id) ascending —
    a deterministic global shuffle, the order a training run actually
    consumes; same seed → same permutation, so shard contents are
    replayable without any RNG state).

    A naive global window (``sum() over (order by …)``) funnels the
    whole corpus through ONE task; the prefix sum runs through the
    shared ``util.grouped_prefix_sums`` engine instead (range-partition
    → pinned split → per-partition totals → driver exclusive-sum →
    one Arrow carry pass; ONE corpus shuffle total, no global sort —
    see its docstring for the pin-the-split protocol)."""
    from alix_spark.textops.textstats import token_counts
    from alix_spark.util import grouped_prefix_sums

    if order not in ("id", "hash"):
        raise ValueError(f"order must be 'id' or 'hash', got {order!r}")
    sized = token_counts(docs, id_col, text_col).select(
        "doc_id",
        F.coalesce(F.col("ws_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
    )
    if order == "hash":
        # shared md5→60-bit-int key (md5_key): deterministic global
        # shuffle order, replayable on both engines
        sized = sized.withColumn("ord", md5_key(seed, "doc_id", 15))
    else:
        sized = sized.withColumn("ord", F.col("doc_id"))
    pre = grouped_prefix_sums(
        sized, ["ord", "doc_id"], ["n_tokens"], num_parts=num_parts
    )
    return pre.select(
        "doc_id",
        "n_tokens",
        F.col("before_n_tokens").alias("tok_offset"),
        F.expr(f"before_n_tokens DIV {int(budget)}").alias("shard_id"),
    ).orderBy("doc_id")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "alix",
    id_col: str = "doc_id",
    strat_col: str = "source",
) -> DataFrame:
    """(doc_id, stratum, sample_key): deterministic per-stratum
    sampling — the mix-weighting step that up/down-samples sources
    into a training blend. Each doc draws a uniform 24-bit key from
    ``md5(seed ':' doc_id)`` and survives iff key < rate·2²⁴ for its
    stratum's rate (unknown strata use ``default_rate``).

    Pure codegen projection + filter — zero shuffles, no RNG state:
    the same (seed, doc_id) always lands on the same side of the cut,
    so reruns, retries and incremental appends sample consistently
    (a ``df.sample()`` draw changes membership under AQE retries and
    cannot be replayed in SQL). Thresholds are integer literals
    computed ONCE here, so the DuckDB oracle embeds the identical
    integers and float rounding can never split the engines."""
    key = md5_key(seed, id_col, 6)
    scale = 1 << 24
    thr: Column = F.lit(int(default_rate * scale))
    for stratum in sorted(rates):
        thr = F.when(
            F.col(strat_col) == stratum, F.lit(int(rates[stratum] * scale))
        ).otherwise(thr)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(strat_col).alias("stratum"),
            key.alias("sample_key"),
        )
        .filter(F.col("sample_key") < thr)
        .orderBy("doc_id")
    )


def line_dedup(
    docs: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_lines, n_removed, clean_md5): line-level boilerplate
    removal (the RefinedWeb/Falcon pattern) — a line whose trimmed
    form occurs in ≥ ``min_df`` DISTINCT documents is boilerplate
    (nav menus, cookie banners, footers) and is dropped from every
    document; everything else keeps its original spelling and order.
    Whitespace-only lines are formatting, not content: never counted,
    never removed. ``clean_md5`` hashes the kept lines re-joined with
    newlines; a doc whose every line is boilerplate hashes the empty
    string (it stays in the report for the downstream gate).

    Scale shape: the boilerplate set is the ≥min_df tail of a
    (trimmed-line → distinct-doc count) aggregation — tiny next to
    the corpus, count-guarded broadcast for the removal semi-join. One
    posexplode shuffle + one doc_id reassembly agg; reassembly sorts
    the per-doc struct array (sort_array over collect_list), so the
    result is order-deterministic at any parallelism."""
    from alix_spark.util import maybe_broadcast

    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    content = lines.withColumn("l", F.trim("line")).filter(F.col("l") != "")
    # lazy localCheckpoint: the boilerplate set is tiny post-filter but
    # its lineage is a full corpus explode + distinct + aggregate —
    # maybe_broadcast's count job materializes it once, and the removal
    # join's build side reads the checkpoint instead of re-deriving
    bp = (
        content.select("doc_id", "l")
        .distinct()
        .groupBy("l")
        .agg(F.count("*").alias("ldf"))
        .filter(F.col("ldf") >= min_df)
        .select("l")
        .localCheckpoint(eager=False)
    )
    removed = content.join(maybe_broadcast(bp), "l", "left_semi").select(
        "doc_id", "pos"
    )
    kept = lines.join(removed, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "line"))).alias("ls")
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.size(F.split(F.col(text_col), "\n")), F.lit(0))
        .cast("long")
        .alias("n_lines"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            (
                F.col("n_lines")
                - F.coalesce(F.size("ls"), F.lit(0)).cast("long")
            ).alias("n_removed"),
            F.md5(
                F.encode(
                    F.concat_ws(
                        "\n", F.coalesce(F.col("ls.line"), F.array())
                    ),
                    "utf-8",
                )
            ).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


def passage_chunks(
    docs: DataFrame,
    size: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_md5): fixed-size token
    windows with overlap — the passage-chunking step an
    embedding/retrieval pipeline runs before vectorizing (every doc →
    max(1, ⌈(len−size)/stride⌉+1) chunks of ≤``size`` tokens starting
    every ``stride`` tokens; stride defaults to size, i.e. disjoint
    chunks). A start is emitted only while it adds tokens the previous
    chunk did not already cover (s = 0, or s−stride+size < len) — so
    the final chunk is never empty, never wholly contained in its
    predecessor, and a vector store gets no redundant passages when
    stride < size. ``chunk_md5`` hashes the space-joined tokens — the
    dedup/join key for the vector store.

    Pure column expressions: chunk starts come from an exploded
    ``sequence`` (bounded by the doc's own length — Spark's
    ``sequence(0, negative)`` DESCENDS, so the upper bound is clamped
    to ≥0 per the repo rule), the window is a dynamic-start ``slice``,
    and the hash is md5 over concat_ws. No Python stage, no shuffle
    besides the caller's downstream use."""
    from alix_spark.index.simple import tokens_array

    if stride is None:
        stride = size
    if size < 1 or stride < 1:
        raise ValueError(f"size={size} and stride={stride} must be >= 1")
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(docs, text_col)
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tok_expr.alias("toks")
    ).filter(F.size("toks") > 0)
    n = F.size("toks")
    # chunks beyond the first exist only while the previous chunk did
    # not already reach the end: start j*stride is valid iff
    # (j-1)*stride + size < len, so extra = ceil((len - size)/stride)
    # clamped at 0 (integer form; no float division)
    extra = F.greatest(
        F.lit(0),
        F.floor((n - F.lit(size) + F.lit(stride) - F.lit(1)) / F.lit(stride)),
    )
    n_chunks = extra + F.lit(1)
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_id") * F.lit(stride) + F.lit(1), F.lit(size)
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.md5(F.encode(F.concat_ws(" ", piece), "utf-8")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


def training_shard(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_top2: float = 0.1,
    jaccard_threshold: float = 0.08,
) -> DataFrame:
    """(doc_id, n_tokens, quality, top2_frac, clean_md5): the composed
    preparation pipeline — which documents make it into a training
    shard, and their scrubbed payload hash:

    1. near-dup keeper selection: Jaccard pairs → connected components
       (:func:`alix_spark.textops.dedup.dup_groups`), non-keepers drop;
    2. quality gate (``quality >= min_quality``);
    3. repetition gate (``top2_frac <= max_top2``; sub-5-token docs
       are out by construction);
    4. PII scrub of the survivors' text (md5 of the redacted payload).

    Each stage is the already-tested standalone operator; this op pins
    the WIRING (drop lists anti-join, gate order, column contracts) so
    a pipeline user composes one call instead of five. All joins are
    doc_id-keyed, so at scale AQE coalesces them onto one partitioning;
    the only non-doc_id shuffles are inside the pair/CC stages.

    The corpus is scanned and tokenized ONCE: a lazily
    localCheckpoint'ed (doc_id, text, toks) base feeds the shingle,
    quality and repetition stages through their ``toks_col`` hooks —
    without it each stage's plan subtree re-reads and re-tokenizes the
    input independently (4 scans, 3 tokenizations per call). Lazy
    localCheckpoint over persist() so the ContextCleaner reclaims the
    blocks when the result goes out of scope (same trade as
    dedup.minhash_lsh_pairs' shingle table)."""
    from alix_spark.index.simple import tokens_array
    from alix_spark.textops.dedup import dup_groups, jaccard_pairs
    from alix_spark.textops.textstats import quality_scores, repetition_scores

    base = docs.select(
        "doc_id", "text", tokens_array(docs, "text").alias("toks")
    ).localCheckpoint(eager=False)
    pairs = jaccard_pairs(base, threshold=jaccard_threshold, toks_col="toks")
    drops = (
        dup_groups(pairs)
        .filter(F.col("doc_id") != F.col("group_id"))
        .select("doc_id")
    )
    q = quality_scores(base, toks_col="toks").select("doc_id", "quality")
    rep = repetition_scores(base, toks_col="toks").select(
        "doc_id", "n_tokens", "top2_frac"
    )
    scrub = scrub_pii(base).select("doc_id", "clean_md5")
    return (
        rep.join(q, "doc_id")
        .join(drops, "doc_id", "left_anti")
        .filter(
            (F.col("quality") >= F.lit(min_quality))
            & (F.col("top2_frac") <= F.lit(max_top2))
        )
        .join(scrub, "doc_id")
        .select("doc_id", "n_tokens", "quality", "top2_frac", "clean_md5")
        .orderBy("doc_id")
    )


def url_filter(
    df: DataFrame,
    blocklist: DataFrame | list[str] = (),
    url_col: str = "url",
    id_col: str = "doc_id",
    max_depth: int = 6,
    max_params: int = 8,
    max_len: int = 2048,
) -> DataFrame:
    """(doc_id, host, blocked, reason): URL-level keep/drop gate — the
    stage every crawl pipeline runs before fetching or tokenizing a
    byte of page text (RefinedWeb/C4 both gate on URL blocklists and
    structural URL shape first, because it is ~free relative to any
    text op).

    Ordered rules, FIRST match wins (the order is part of the
    contract):
    1. ``blocked_domain`` — the URL's host, or ANY of its domain
       suffixes with >= 2 labels, is in the blocklist
       (``a.ads.spam.example`` matches blocked ``spam.example`` and
       blocked ``ads.spam.example`` alike — blocklists carry entries
       at arbitrary depth);
    2. ``depth`` — more than ``max_depth`` path segments (crawler
       traps: calendars, faceted navigation);
    3. ``params`` — more than ``max_params`` query parameters
       (session-state explosions);
    4. ``length`` — more than ``max_len`` characters total.

    Scale shape: the blocklist is a SMALL dimension (thousands to low
    millions of domains) joined via an explicit broadcast — the corpus
    side never shuffles; every structural rule is a column expression
    over one projection. The subdomain match explodes the host's few
    dot-suffixes and broadcast-equi-joins each against the blocklist —
    never a per-row contains-scan over the list."""
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        rows = [(d.lower(),) for d in blocklist]
        bl = spark.createDataFrame(rows or [("",)], "bdom string")
        if not rows:
            bl = bl.filter(F.lit(False))
    else:
        bl = blocklist.select(F.lower(F.col(blocklist.columns[0])).alias("bdom"))
    bl = bl.distinct()

    u = F.col(url_col)
    # fragment dropped FIRST (RFC 3986: a '?' after '#' is fragment
    # data, not a query — same order canonical_url uses); scheme is
    # OPTIONAL so scheme-relative '//host/…' frontier hrefs still hit
    # the blocklist instead of silently bypassing it
    nofrag = F.regexp_replace(u, "#.*", "")
    auth_re = "^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*"
    prefix = F.regexp_extract(nofrag, auth_re, 0)
    host = F.lower(
        F.regexp_extract(nofrag, "^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//([^/?#:]+)", 1)
    )
    rest = F.regexp_replace(
        F.substr(nofrag, F.length(prefix) + F.lit(1)), "\\?.*", ""
    )
    # path segments: '/a/b/' -> ['a','b'] (empty splits dropped)
    depth = F.size(F.filter(F.split(rest, "/"), lambda x: x != F.lit("")))
    query = F.regexp_extract(nofrag, "\\?(.*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    # all dot-suffixes of the host with >= 2 labels, full host included
    # ('a.b.c.com' -> [a.b.c.com, b.c.com, c.com]); the per-host label
    # array is tiny, so the interpreted lambda costs nothing next to
    # the scan
    suffixes = F.expr(
        "transform(sequence(0, greatest(size(split(host, '[.]')) - 2, 0)),"
        " i -> array_join(slice(split(host, '[.]'), i + 1,"
        "                       size(split(host, '[.]')) - i), '.'))"
    )

    # _rid keeps duplicate (doc_id, url) input rows distinct through
    # the explode→regroup round-trip (the gate is per-ROW, not a
    # dedup); it is computed once in the scan stage and carried as
    # data, so the regroup is stable across shuffles
    base = df.select(
        F.monotonically_increasing_id().alias("_rid"),
        F.col(id_col).alias("doc_id"),
        host.alias("host"),
        depth.cast("long").alias("_depth"),
        n_params.cast("long").alias("_nparams"),
        F.length(u).cast("long").alias("_len"),
    )
    # equi-join on the exploded suffix keys — an OR/contains join
    # condition would compile to BroadcastNestedLoopJoin (per-row scan
    # of the whole blocklist); this stays a hash join, broadcast while
    # the blocklist is verifiably small (maybe_broadcast count-guard —
    # a multi-million-domain list falls back to a shuffle join)
    keyed = base.withColumn("_key", F.explode(F.array_distinct(suffixes)))
    hit = (
        keyed.join(
            util.maybe_broadcast(bl), F.col("_key") == F.col("bdom"), "left"
        )
        .groupBy("_rid", "doc_id", "host", "_depth", "_nparams", "_len")
        .agg(F.max(F.col("bdom").isNotNull()).alias("_dom_hit"))
    )
    reason = (
        F.when(F.col("_dom_hit"), F.lit("blocked_domain"))
        .when(F.col("_depth") > max_depth, F.lit("depth"))
        .when(F.col("_nparams") > max_params, F.lit("params"))
        .when(F.col("_len") > max_len, F.lit("length"))
    )
    return (
        hit.select(
            "doc_id",
            "host",
            reason.isNotNull().alias("blocked"),
            reason.alias("reason"),
        )
        .orderBy("doc_id")
    )


def length_outliers(
    docs: DataFrame,
    lo_pct: int = 5,
    hi_pct: int = 95,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, t_lo, t_hi, outlier, reason): corpus-relative
    document-length gate — drop the shortest ``lo_pct``% and longest
    ``100−hi_pct``% of documents by token count (the Gopher/C4 length
    filter, but with thresholds LEARNED from the corpus rather than
    fixed constants, so the gate survives domain shift).

    Thresholds are exact DISCRETE quantiles: ``t_lo`` is the k-th
    smallest token count with k = ⌈n·lo_pct/100⌉ (pure integer
    arithmetic — never a float rank that the two engines could round
    apart), and docs with ``t_lo ≤ n_tokens ≤ t_hi`` are kept
    (thresholds inclusive).

    Scale shape: a global exact quantile normally needs a sort, which
    is the one thing you never do to 100 TB — instead the token counts
    aggregate into a HISTOGRAM (groupBy n_tokens → ≤ max-doc-length
    rows, map-side combined), the cumulative walk and threshold pick
    run on that tiny table (the single-partition window is bounded by
    distinct lengths, not docs), and the two thresholds ride back over
    the corpus in a broadcast 1-row crossJoin. Three narrow shuffles
    of an already-aggregated table; the corpus itself is scanned
    once."""
    from pyspark.sql import Window

    from alix_spark.index.simple import tokens_array

    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(docs, text_col)
    )
    # the tokenization runs ONCE: the (doc_id, n_tokens) projection is
    # pinned (lazy localCheckpoint, the training_shard trade) because
    # both the histogram subtree and the final per-doc projection read
    # it — without the pin Spark re-tokenizes the corpus per subtree
    counts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.size(tok_expr), F.lit(0)).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    hist = counts.groupBy("n_tokens").agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    # n comes from the tiny histogram (sum of bucket counts), never a
    # second corpus-wide aggregation
    cum = hist.select("n_tokens", F.sum("c").over(w).alias("cum")).crossJoin(
        F.broadcast(hist.agg(F.sum("c").cast("long").alias("n")))
    )
    # k = ceil(n * pct / 100) in pure integer arithmetic
    k_lo = F.expr(f"(n * {int(lo_pct)} + 99) div 100")
    k_hi = F.expr(f"(n * {int(hi_pct)} + 99) div 100")
    thresholds = cum.agg(
        F.min(F.when(F.col("cum") >= k_lo, F.col("n_tokens"))).alias("t_lo"),
        F.min(F.when(F.col("cum") >= k_hi, F.col("n_tokens"))).alias("t_hi"),
    )
    reason = F.when(F.col("n_tokens") < F.col("t_lo"), F.lit("short")).when(
        F.col("n_tokens") > F.col("t_hi"), F.lit("long")
    )
    return (
        counts.crossJoin(F.broadcast(thresholds))
        .select(
            "doc_id",
            "n_tokens",
            "t_lo",
            "t_hi",
            reason.isNotNull().alias("outlier"),
            reason.alias("reason"),
        )
        .orderBy("doc_id")
    )


def data_split(
    docs: DataFrame,
    splits: list[tuple[str, int]] = (("train", 98), ("valid", 1), ("test", 1)),
    seed: str = "alix",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, split): deterministic train/valid/test fold
    assignment — md5(seed ':' doc_id) mod 100 against cumulative
    integer percent thresholds, so membership is a pure function of
    (seed, doc_id): replayable across runs, machines and engines, no
    RNG state, and docs never migrate between folds when the corpus
    grows (the property a random split lacks — adding documents to a
    random 98/1/1 split reshuffles everything, leaking eval docs into
    training).

    ``splits`` is an ordered list of (name, integer percent) summing
    to 100 — integer thresholds shared verbatim with the SQL oracle
    (same contract as :func:`stratified_sample`). Pure column
    expressions: one scan, zero shuffles at any scale; the same
    md5→60-bit-int trick as pack_shards/stratified_sample."""
    splits = list(splits)
    pcts = [p for _, p in splits]
    if any(p <= 0 or p != int(p) for p in pcts) or sum(pcts) != 100:
        raise ValueError(f"splits must be positive integers summing to 100, got {splits}")
    bucket = md5_key(seed, id_col, 15) % 100
    out = docs.select(
        F.col(id_col).alias("doc_id"), bucket.alias("bucket")
    )
    return out.select(
        "doc_id", "bucket", split_expr(splits, F.col("bucket")).alias("split")
    ).orderBy("doc_id")


def split_expr(splits, bucket: Column) -> Column:
    """Fold name for a 0-99 bucket under cumulative integer percent
    thresholds — the single expression data_split and mix_report
    share (splits validated by the caller)."""
    cum = 0
    expr = None
    for name, pct in splits:
        cum += int(pct)
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def mix_report(
    docs: DataFrame,
    splits: list[tuple[str, int]] = (("train", 98), ("valid", 1), ("test", 1)),
    seed: str = "alix",
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source, split, n_docs, n_kept, sum_tokens, kept_tokens): the
    training-mix composition table — per (domain, fold), how many
    documents and tokens exist, and how many survive the
    hashed-classifier quality gate (:func:`textstats.classifier_scores`,
    kept ⇔ w_sum > 0; docs with <2 tokens have no classifier row and
    count as not kept). This is the report a mix owner reads before
    committing shards: fold sizes, per-domain token budgets, and gate
    pass-rates in one table.

    Scale shape: the corpus is scanned and tokenized ONCE (pinned
    (doc_id, source, toks) base via lazy localCheckpoint — the
    training_shard trade); the classifier's bigram aggregation is the
    only corpus-sized shuffle, the verdict join is doc_id-keyed, and
    the final aggregation is #sources × #folds rows. The fold column
    is a pure expression (md5_key + split_expr), never a join."""
    from alix_spark.index.simple import tokens_array
    from alix_spark.textops.textstats import classifier_scores

    splits = list(splits)
    pcts = [p for _, p in splits]
    if any(p <= 0 or p != int(p) for p in pcts) or sum(pcts) != 100:
        raise ValueError(f"splits must be positive integers summing to 100, got {splits}")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        tokens_array(docs, text_col).alias("toks"),
    ).localCheckpoint(eager=False)
    # the gate decision is classifier_scores' own `keep` column, not a
    # re-derived predicate — if the gate rule ever changes there, this
    # report follows
    clf = classifier_scores(base, toks_col="toks").select("doc_id", "keep")
    bucket = md5_key(seed, "doc_id", 15) % 100
    j = (
        base.select(
            "doc_id",
            "source",
            F.coalesce(F.size("toks"), F.lit(0)).cast("long").alias("n_tokens"),
            split_expr(splits, bucket).alias("split"),
        )
        .join(clf, "doc_id", "left")
        .select(
            "source",
            "split",
            "n_tokens",
            F.coalesce(F.col("keep"), F.lit(False)).alias("kept"),
        )
    )
    return (
        j.groupBy("source", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
        )
        .orderBy("source", "split")
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    bins_per_nat: int = 100,
) -> DataFrame:
    """(doc_id, source, n_bigrams, avg_nll, bucket): CCNet-style
    perplexity-tercile partitioning (Wenzek et al. 2020) — within each
    source, split documents into ``head`` / ``middle`` / ``tail`` by
    ascending LM score (:func:`textstats.lm_scores` avg_nll, the
    add-alpha bigram stand-in for the paper's KenLM): head reads like
    the model's training domain, tail is the noise candidate pool.
    The standard curation move is keep-head, sample-middle, drop-tail.

    Thresholds are BIN-GRANULAR exact terciles: docs land in fixed
    nll bins (``floor(avg_nll * bins_per_nat)`` — avg_nll is already
    6-dp floor-rounded, so the product and floor are the same IEEE
    ops on the same doubles in any engine), the per-source cumulative
    walk runs over the aggregated (source, bin) histogram, and the
    tercile cut is pure integer arithmetic (``3*cum >= n``, never a
    float rank). Docs sharing a bin always share a bucket, so the
    assignment is deterministic under any row order and stable under
    corpus repartitioning.

    Scale shape: the per-source quantile never sorts the corpus — the
    histogram is bounded by (sources x occupied bins), the window
    walk runs on that tiny table (the :func:`length_outliers` shape,
    per group), and thresholds ride back on a count-guarded broadcast
    join. Docs with fewer than 2 tokens carry no LM evidence and are
    excluded (lm_scores contract); NULL-``group_col`` docs have no
    stratum and are excluded."""
    if bins_per_nat < 1:
        raise ValueError("ccnet_buckets: bins_per_nat must be >= 1")
    from pyspark.sql import Window

    from alix_spark.textops import textstats
    from alix_spark.util import maybe_broadcast

    scores = textstats.lm_scores(docs, id_col=id_col, text_col=text_col)
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(group_col).alias("source")
    ).filter(F.col(group_col).isNotNull())
    # pinned: the scored projection feeds both the histogram subtree
    # and the final per-doc assignment (the length_outliers trade)
    d = (
        scores.join(src, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            "avg_nll",
            F.floor(F.col("avg_nll") * F.lit(float(bins_per_nat)))
            .cast("long")
            .alias("bin"),
        )
        .localCheckpoint(eager=False)
    )
    hist = d.groupBy("source", "bin").agg(F.count("*").cast("long").alias("c"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    th = cum.groupBy("source").agg(
        F.min(
            F.when(F.lit(3) * F.col("cum") >= F.col("n"), F.col("bin"))
        ).alias("t1"),
        F.min(
            F.when(F.lit(3) * F.col("cum") >= F.lit(2) * F.col("n"), F.col("bin"))
        ).alias("t2"),
    )
    bucket = (
        F.when(F.col("bin") <= F.col("t1"), F.lit("head"))
        .when(F.col("bin") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        d.join(maybe_broadcast(th), "source")
        .select("doc_id", "source", "n_bigrams", "avg_nll", bucket.alias("bucket"))
        .orderBy("doc_id")
    )


def sampling_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, p_raw, weight): temperature-scaled
    source sampling weights — the multilingual/multi-domain mixing
    rule from the mBERT/XLM-R/mT5 line of work: sample source i with
    probability proportional to ``n_tokens_i ** alpha`` instead of raw
    token share, boosting small sources and damping the head
    (``alpha`` = 1 reproduces p_raw, ``alpha`` -> 0 approaches
    uniform). ``p_raw`` and ``weight`` each sum to 1 across sources.

    Scale shape: one map-side-combined aggregation to (source,
    n_docs, n_tokens) — token counts are ``regexp_count`` column
    expressions over the explicit cross-engine whitespace class
    (``util.NONSPACE_RE``; Java and RE2 disagree on whether \\x0B
    is whitespace), never an array materialization — then the
    grand totals ride back over the tiny per-source table in a
    broadcast 1-row crossJoin. ``pow`` is evaluated on the same
    doubles in either engine; last-ulp libm differences are absorbed
    by round6 (the zipf_profile precedent). NULL-``group_col`` docs
    have no stratum and are excluded; NULL text counts 0 tokens."""
    if not alpha > 0:
        raise ValueError("sampling_weights: alpha must be > 0")
    s = (
        docs.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("source"),
            F.coalesce(
                F.regexp_count(F.col(text_col), F.lit(util.NONSPACE_RE)),
                F.lit(0),
            )
            .cast("long")
            .alias("toks"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )
    a = F.lit(float(alpha))
    pw = F.pow(F.col("n_tokens").cast("double"), a)
    totals = s.agg(
        F.sum(F.col("n_tokens").cast("double")).alias("tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), a)).alias("wtot"),
    )
    return (
        s.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            round6(F.col("n_tokens").cast("double") / F.col("tot")).alias("p_raw"),
            round6(pw / F.col("wtot")).alias("weight"),
        )
        .orderBy("source")
    )


def unimax_sampling(
    docs: DataFrame,
    epochs: int = 4,
    budget_tokens: int | None = None,
    budget_frac: float | None = None,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """(lang, n_docs, n_tokens, capped, alloc, weight): UniMax
    budget-capped language sampling (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining") — the successor to temperature mixing
    (:func:`sampling_weights`): given a total training-token budget B
    and a repeat cap of ``epochs`` N, walk languages SMALLEST first;
    a language whose full N-epoch supply (N·c_l) fits inside the
    current uniform share of the remaining budget is allocated all of
    it ("capped"), every remaining (larger) language splits the
    leftover budget equally. No head language is oversampled past N
    epochs and no tail language is drowned — the paper's fix for
    temperature mixing's over/under-sampling at both ends.

    The sequential greedy has a closed water-filling form, which both
    engines compute with identical window arithmetic (this is the
    oracle-parity trick — no recursive CTE needed): order languages
    by (n_tokens, lang) ascending; language i is capped iff its cap
    fits its step's uniform share, ``N·c_i · (n−i+1) ≤ B − cum_{i−1}``
    (all-BIGINT cross-multiplied — no float in any verdict), and
    because the uniform share is invariant once a language overflows
    it (b/r = (b − b/r)/(r−1)) while caps only grow, cappedness is a
    PREFIX of that order — a windowed prefix-AND. The fill level
    ``tau = (B − cum_k)/(n − k)`` and the total allocation (exactly B
    when any language is uncapped, else the all-caps sum) are ratios
    of integers, so ``alloc`` and ``weight`` are bit-identical across
    engines after round6. Budget is either ``budget_tokens`` (the
    real-world call) or ``budget_frac`` of the corpus's total tokens,
    computed IN-PLAN by a 1-row aggregate (no eager count job) and
    floored to ≥1.

    Scale shape: ONE map-side-combined corpus aggregation to (lang,
    n_docs, n_tokens) — token counts are regexp_count column
    expressions (the sampling_weights precedent); everything after
    runs on the language table (≤ a few hundred rows), where the
    un-partitioned window and broadcast 1-row joins are free. NULL
    ``group_col`` docs have no language and are excluded; NULL text
    counts 0 tokens."""
    from pyspark.sql import Window

    if (budget_tokens is None) == (budget_frac is None):
        raise ValueError(
            "unimax_sampling: exactly one of budget_tokens / "
            "budget_frac must be given"
        )
    if not (isinstance(epochs, int) and epochs >= 1):
        raise ValueError("unimax_sampling: epochs must be an int >= 1")
    if budget_tokens is not None and budget_tokens < 1:
        raise ValueError("unimax_sampling: budget_tokens must be >= 1")
    if budget_frac is not None and not budget_frac > 0:
        raise ValueError("unimax_sampling: budget_frac must be > 0")

    s = (
        docs.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("lang"),
            F.coalesce(
                F.regexp_count(F.col(text_col), F.lit(util.NONSPACE_RE)),
                F.lit(0),
            )
            .cast("long")
            .alias("toks"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )
    if budget_tokens is not None:
        btab = s.sparkSession.range(1).select(
            F.lit(int(budget_tokens)).cast("long").alias("budget")
        )
    else:
        btab = s.agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(
                    F.lit(float(budget_frac))
                    * F.sum("n_tokens").cast("double")
                ).cast("long"),
            ).alias("budget")
        )

    order = [F.col("n_tokens").asc(), F.col("lang").asc()]
    w_pre = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cap = (F.lit(int(epochs)).cast("long") * F.col("n_tokens")).alias("cap")
    w = s.select("lang", "n_docs", "n_tokens", cap).select(
        "*",
        F.sum("cap").over(w_pre).alias("cum"),
        F.row_number().over(Window.orderBy(*order)).alias("i"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    c = w.crossJoin(F.broadcast(btab)).select(
        "*",
        F.when(
            F.col("cap") * (F.col("n") - F.col("i") + F.lit(1))
            <= F.col("budget") - (F.col("cum") - F.col("cap")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("cond"),
    )
    p = c.select("*", F.min("cond").over(w_pre).alias("capped_i"))
    k = p.agg(
        F.sum("capped_i").cast("long").alias("k"),
        F.coalesce(
            F.max(F.when(F.col("capped_i") == 1, F.col("cum"))), F.lit(0)
        )
        .cast("long")
        .alias("cumk"),
        F.max("n").cast("long").alias("nn"),
        F.max("budget").cast("long").alias("bb"),
    )
    tau = F.when(
        F.col("k") < F.col("nn"),
        (F.col("bb") - F.col("cumk")).cast("double")
        / (F.col("nn") - F.col("k")).cast("double"),
    )
    total = F.when(
        F.col("k") < F.col("nn"), F.col("bb").cast("double")
    ).otherwise(F.col("cumk").cast("double"))
    alloc = F.when(
        F.col("capped_i") == 1, F.col("cap").cast("double")
    ).otherwise(tau)
    return (
        p.crossJoin(F.broadcast(k))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            (F.col("capped_i") == 1).alias("capped"),
            round6(alloc).alias("alloc"),
            round6(alloc / total).alias("weight"),
        )
        .orderBy("lang")
    )


def line_stream(text_col: str):
    """(t, lines): the ONE definition of a page's cleaned line stream,
    shared by c4_clean and fineweb_clean (review batch 25 — the two
    gates must see identical lines, and the terminator class must stay
    in sync with the oracle's `_terms` in entry_queries in exactly one
    place): NULL text -> empty page; CRLF / lone CR / NEL / LS / PS
    normalize to \\n BEFORE splitting (Java's $ tolerates a trailing
    \\r, RE2's does not); lines trim ASCII spaces and blank lines are
    formatting, never content."""
    t = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")),
        "\r\n|[\r\u0085\u2028\u2029]",
        "\n",
    )
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    return t, lines


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """(doc_id, n_lines, kept_lines, kept_words, has_lorem, has_brace,
    keep, clean_md5): the C4 line/page cleaning rules (Raffel et al.
    2020 \u00a72.2, the public recipe behind the Colossal Clean Crawled
    Corpus):

    - keep only lines that end in terminal punctuation (. ! ? "),
      have >= ``min_words_per_line`` words, and do not contain the
      word "javascript" (case-insensitive);
    - drop any page mentioning "lorem ipsum" (case-insensitive) or
      containing a curly brace '{' (code);
    - drop pages with fewer than ``min_kept_lines`` surviving lines.

    (C4's badwords-list page filter is a separate list-driven gate —
    see url_filter / quality_classifier for the list-driven pattern;
    no badwords list ships here.) ``clean_md5`` hashes the kept lines
    (trimmed, re-joined with newlines) — the text a downstream shard
    writer would emit. Blank lines are formatting, not content: never
    counted in ``n_lines``. Line terminators are normalized FIRST
    (CRLF, lone CR, NEL, LS, PS -> \\n) so the end-of-line anchor and
    the oracle's RE2 anchor see identical line strings (Java's $
    tolerates a trailing \\r; RE2's does not). Word counts use the
    explicit cross-engine whitespace class (util.NONSPACE_RE).

    Scale shape: per-document column expressions only — line
    predicates run in array higher-order functions (interpreted, but
    a few lines per doc; the alternative posexplode + reassembly is a
    full-corpus shuffle), page flags are substring tests, and there
    is NO shuffle at any corpus size. ``lines``/``kept`` are
    materialized as named columns across staged selects — Spark's
    subexpression elimination skips lambda-bearing expressions, so a
    single select would evaluate the interpreted filter chain once
    per consumer. Per-row verdict semantics: every input doc gets a
    row (NULL text = empty page)."""
    t, lines = line_stream(text_col)
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (
            F.regexp_count(l, F.lit(util.NONSPACE_RE))
            >= F.lit(int(min_words_per_line))
        )
        & ~F.lower(l).contains("javascript"),
    )
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("lines"),
        kept.alias("kept"),
        F.lower(t).contains("lorem ipsum").alias("has_lorem"),
        t.contains("{").alias("has_brace"),
    )
    m = staged.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.size("kept").cast("long").alias("kept_lines"),
        F.array_join("kept", "\n").alias("kept_text"),
        "has_lorem",
        "has_brace",
    )
    keep = (
        (F.col("kept_lines") >= F.lit(int(min_kept_lines)))
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
    )
    return m.select(
        "doc_id",
        "n_lines",
        "kept_lines",
        F.coalesce(
            F.regexp_count(F.col("kept_text"), F.lit(util.NONSPACE_RE)),
            F.lit(0),
        )
        .cast("long")
        .alias("kept_words"),
        "has_lorem",
        "has_brace",
        keep.alias("keep"),
        F.md5(F.col("kept_text")).alias("clean_md5"),
    ).orderBy("doc_id")


def fineweb_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    punct_pct: int = 12,
    short_chars: int = 30,
    short_pct: int = 67,
    dup_pct: int = 10,
) -> DataFrame:
    """(doc_id, n_lines, punct_lines, short_lines, dup_chars,
    total_chars, keep): the three FineWeb custom quality filters
    (Penedo et al. 2024, "The FineWeb Datasets", the ablation-selected
    additions on top of the C4/Gopher recipes). A page DROPS when:

    - at most ``punct_pct``% of its lines end in terminal punctuation
      (. ! ? ") — the C4-inspired doc-LEVEL restatement;
    - at least ``short_pct``% of its lines are shorter than
      ``short_chars`` characters;
    - at least ``dup_pct``% of its line characters sit in DUPLICATED
      lines (every occurrence of a line that appears >= 2 times in the
      page counts) — boilerplate nav/footer repetition.

    Every gate compares in integer cross-multiplied form
    (100*punct_lines <= punct_pct*n_lines, never a float ratio), so
    keep verdicts are bit-exact and a zero-line page (NULL/empty text)
    is keep = false through the same comparisons. Lines are c4_clean's
    exact line stream (terminator normalization, trim, blank drop) —
    the two gates share one definition of "line".

    Scale shape: the c4_clean family's — per-document array
    higher-order expressions only, NO shuffle at any corpus size.
    Duplicated-line chars avoid the naive O(L^2) per-row scan: the
    line array is array_sort'd JVM-side and a positional lambda keeps
    elements equal to a sorted neighbor (O(L log L) + O(L) interpreted
    steps per page). Staged named selects keep each lambda-bearing
    expression evaluated once (Spark's subexpression elimination
    skips lambdas — the c4_clean note)."""
    _t, lines = line_stream(text_col)
    # stage 1 materializes _lines ONCE; _srt derives from the named
    # column in stage 2 so the interpreted line chain never runs
    # twice per page (review batch 25)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("_lines"),
    ).select(
        "doc_id",
        "_lines",
        F.array_sort(F.col("_lines")).alias("_srt"),
    )
    m = staged.select(
        "doc_id",
        F.size("_lines").cast("long").alias("n_lines"),
        F.size(
            F.expr('''filter(_lines, l -> l rlike '[.!?"]$')''')
        ).cast("long").alias("punct_lines"),
        F.size(
            F.filter(F.col("_lines"), lambda l: F.length(l) < F.lit(int(short_chars)))
        ).cast("long").alias("short_lines"),
        F.expr(
            "aggregate(filter(_srt, (x, i) -> "
            "(i > 0 AND x = element_at(_srt, i)) OR "
            "(i < size(_srt) - 1 AND x = element_at(_srt, i + 2))), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
        ).alias("dup_chars"),
        F.expr(
            "aggregate(_lines, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
        ).alias("total_chars"),
    )
    keep = (
        (100 * F.col("punct_lines") > F.lit(int(punct_pct)) * F.col("n_lines"))
        & (100 * F.col("short_lines") < F.lit(int(short_pct)) * F.col("n_lines"))
        & (100 * F.col("dup_chars") < F.lit(int(dup_pct)) * F.col("total_chars"))
    )
    return m.select(
        "doc_id",
        "n_lines",
        "punct_lines",
        "short_lines",
        "dup_chars",
        "total_chars",
        keep.alias("keep"),
    ).orderBy("doc_id")


# Shared Java/RE2 letter classes for the RefinedWeb uppercase rule
# (literal chars via python escapes — both engines' regex dialects take
# them verbatim; the oracle interpolates the SAME constants):
# ASCII + Latin-1 letters, excluding the multiplication/division signs.
RW_UPPER_CLASS = "[A-Z\u00c0-\u00d6\u00d8-\u00de]"
RW_LOWER_CLASS = "[a-z\u00df-\u00f6\u00f8-\u00ff]"
RW_COUNTER_RE = "^[0-9]+ (like|share|comment|view|retweet)s?$"


def refinedweb_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_pct: int = 5,
) -> DataFrame:
    """(doc_id, n_lines, removed_lines, removed_chars, total_chars,
    keep, clean_md5): RefinedWeb line-wise corrections (Penedo et al.
    2023, "The RefinedWeb Dataset for Falcon LLM", §4.2 / Table 2):
    remove lines that are (a) mainly uppercase (more uppercase than
    lowercase letters, at least one letter), (b) without any letter
    (numeric/punctuation-only), (c) social-media counters ("3 likes",
    "12 comments", ...), or (d) a single word (no space); then DROP
    the whole document when removed characters exceed ``drop_pct``% of
    its line characters (the paper's "if they end up removing more
    than 5% of the document, remove it entirely"). ``clean_md5``
    hashes the surviving lines re-joined with newlines — the page a
    shard writer would emit.

    Lines are the SHARED c4_clean/fineweb_clean line stream
    (``line_stream``); the doc gate compares in integer
    cross-multiplied form (100*removed_chars > drop_pct*total_chars),
    so verdicts carry no float half-case. A zero-line page keeps
    keep = true (the line pass drops pages BECAUSE of removals;
    emptiness is c4/Gopher territory). Letter classes are shared
    literal-char ASCII+Latin-1 ranges (RW_UPPER_CLASS/RW_LOWER_CLASS —
    the oracle interpolates the same constants).

    Scale shape: the c4_clean family's — per-row array higher-order
    predicates, zero shuffles at any corpus size, no Python stage.
    The removed/kept split evaluates the predicate body twice per
    line (Spark lambdas cannot be named mid-expression); both runs
    sit in the same staged projection over the pinned _lines column.
    """
    _t, lines = line_stream(text_col)
    body = (
        f"(regexp_count(l, '{RW_UPPER_CLASS}') + regexp_count(l, '{RW_LOWER_CLASS}') > 0"
        f" AND regexp_count(l, '{RW_UPPER_CLASS}') > regexp_count(l, '{RW_LOWER_CLASS}'))"
        f" OR regexp_count(l, '{RW_UPPER_CLASS}') + regexp_count(l, '{RW_LOWER_CLASS}') = 0"
        f" OR l rlike '{RW_COUNTER_RE}'"
        " OR NOT l rlike ' '"
    )
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("_lines"),
    ).select(
        "doc_id",
        "_lines",
        F.expr(f"filter(_lines, l -> {body})").alias("_removed"),
        F.expr(f"filter(_lines, l -> NOT ({body}))").alias("_kept"),
    )
    m = staged.select(
        "doc_id",
        F.size("_lines").cast("long").alias("n_lines"),
        F.size("_removed").cast("long").alias("removed_lines"),
        F.expr(
            "aggregate(_removed, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
        ).alias("removed_chars"),
        F.expr(
            "aggregate(_lines, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
        ).alias("total_chars"),
        F.array_join("_kept", "\n").alias("_kept_text"),
    )
    keep = ~(100 * F.col("removed_chars") > F.lit(int(drop_pct)) * F.col("total_chars"))
    return m.select(
        "doc_id",
        "n_lines",
        "removed_lines",
        "removed_chars",
        "total_chars",
        keep.alias("keep"),
        F.md5(F.col("_kept_text")).alias("clean_md5"),
    ).orderBy("doc_id")


def dsir_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, is_target, n_feats, log_weight): DSIR importance
    weights (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling") — per-doc log importance ratio between a
    target domain's hashed-n-gram distribution and the raw corpus's.

    Features are the doc's word unigrams and bigrams hashed into
    ``n_buckets`` buckets (md5 60-bit prefix mod n_buckets — the
    md5_key idiom, bit-identical in DuckDB); both distributions are
    Laplace-smoothed over the bucket space, and

        log_weight = sum_b c_doc(b) * [ (ln(ct_b + 1) - ln(T + B))
                                      - (ln(cr_b + 1) - ln(R + B)) ]

    with ct/cr the target/raw bucket counts and T/R their totals.
    Docs above 0 look target-like; a sampler keeps doc i with
    probability proportional to exp(log_weight_i). Every ln argument
    is an integer (the token_entropy discipline — both engines ln the
    same inputs); the per-doc sum's ordering noise is absorbed by
    round6. Docs with no tokens carry no evidence: n_feats 0,
    log_weight NULL.

    ``target`` is a boolean Column over ``docs`` naming the target
    domain (e.g. ``F.col('source') == 'src1'``); NULL evaluates as
    not-target. Scale shape: one Arrow pass emits (doc, is_target,
    bucket, multiplicity) — one row per distinct bucket per doc; the
    bucket table is <= n_buckets rows (two map-side-combined groupBys
    + a 1-row totals crossJoin) and BROADCASTS to the per-doc join,
    so the only corpus-sized shuffle is the final per-doc rollup.
    """
    from alix_spark.index.simple import gram_multiplicities, tokens_array
    from alix_spark.util import ensure_py_files

    ensure_py_files(docs.sparkSession)
    tok_expr = (
        F.col(toks_col)
        if toks_col is not None
        else tokens_array(docs, text_col)
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(target, F.lit(False)).alias("is_target"),
        tok_expr.alias("toks"),
    )

    def bucket_of(feat: str) -> int:
        # hashlib binds at module level — this runs once per distinct
        # feature per doc (corpus-hot); a per-call import is a
        # sys.modules lookup comparable to the md5 (review batch 25)
        h = hashlib.md5(feat.encode("utf-8")).hexdigest()
        return int(h[:15], 16) % n_buckets

    # lazy localCheckpoint: the feature table feeds the bucket
    # aggregation AND the probe side of the broadcast delta join —
    # without the pin the tokenize+md5 Arrow stage runs three times
    # per action (review batch 24; the training_shard trade)
    feats = gram_multiplicities(
        base, (1, 2), "bucket", "long", key_fn=bucket_of
    ).localCheckpoint(eager=False)
    buckets = feats.groupBy("bucket").agg(
        F.sum("m").cast("long").alias("cr"),
        F.sum(F.when(F.col("is_target"), F.col("m")).otherwise(F.lit(0)))
        .cast("long")
        .alias("ct"),
    )
    totals = buckets.agg(
        F.sum("cr").cast("long").alias("R"),
        F.sum("ct").cast("long").alias("T"),
    )
    bt = buckets.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            (
                F.log(F.col("ct") + F.lit(1))
                - F.log(F.col("T") + F.lit(n_buckets))
            )
            - (
                F.log(F.col("cr") + F.lit(1))
                - F.log(F.col("R") + F.lit(n_buckets))
            )
        ).alias("delta"),
    )
    per_doc = (
        feats.join(F.broadcast(bt), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_feats"),
            round6(F.sum(F.col("m") * F.col("delta"))).alias("log_weight"),
        )
    )
    flags = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(target, F.lit(False)).alias("is_target"),
    )
    return (
        flags.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce(F.col("n_feats"), F.lit(0))
            .cast("long")
            .alias("n_feats"),
            "log_weight",
        )
        .orderBy("doc_id")
    )


def badwords_filter(
    docs: DataFrame,
    badwords: DataFrame | list[str] = (),
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, n_bad, n_bad_types, keep): list-driven page
    gate — the C4 "dirty word" filter (Raffel et al. 2020 §2.2 drop
    any page containing a word from a blocklist; the public instance
    is the LDNOOBW list). ``keep`` is true iff NO token of the doc is
    in the list; ``n_bad`` counts occurrences and ``n_bad_types``
    distinct listed words, so callers can soften the verdict to a
    ratio threshold. Entries are single lowercase tokens (multi-word
    list entries need phrase matching — a positional-index query, see
    query/wand.py — and are out of scope for this gate).

    NULL text tokenizes to the empty array: zero evidence, keep=true
    (the C4 rule only fires on a positive hit). Like url_filter, the
    list may arrive as a Python list or as a 1-column DataFrame.

    Scale shape: the list is a SMALL dimension. Tokens explode in the
    scan stage (narrow) and inner-join the broadcast list first, so
    only BAD-token rows — a vanishing fraction of the corpus — reach
    the per-doc groupBy; the verdict join back to the doc spine is on
    the count-guarded broadcast of that small hit table
    (util.maybe_broadcast falls back to a shuffle join if most of the
    corpus turns out dirty)."""
    spark = docs.sparkSession
    if not isinstance(badwords, DataFrame):
        rows = [(w.lower(),) for w in badwords]
        bw = spark.createDataFrame(rows or [("",)], "bad string")
        if not rows:
            bw = bw.filter(F.lit(False))
    else:
        bw = badwords.select(
            F.lower(F.col(badwords.columns[0])).alias("bad")
        )
    bw = bw.distinct()

    from alix_spark.index.simple import tokens_array

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_array(docs, text_col).alias("toks")
        if toks_col is None
        else F.col(toks_col).alias("toks"),
    )
    spine = base.select(
        "doc_id",
        F.coalesce(F.size("toks"), F.lit(0)).cast("long").alias("n_tokens"),
    )
    tok = base.select("doc_id", F.explode("toks").alias("t"))
    hits = (
        tok.join(util.maybe_broadcast(bw), F.col("t") == F.col("bad"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bad"),
            F.count_distinct("t").cast("long").alias("n_bad_types"),
        )
    )
    return (
        spine.join(util.maybe_broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_bad"), F.lit(0)).cast("long").alias("n_bad"),
            F.coalesce(F.col("n_bad_types"), F.lit(0))
            .cast("long")
            .alias("n_bad_types"),
            (F.coalesce(F.col("n_bad"), F.lit(0)) == 0).alias("keep"),
        )
        .orderBy("doc_id")
    )
