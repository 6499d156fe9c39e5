"""Multiword-expression harvest — the MWE-dictionary tuning workflow.

Reference: cli/src/java/com/github/oeuvres/alix/cli/Expressions.java
(:327-375 analyze()): stream the analysis chain; any function word
(VERB/DET/CONN/PRO/ADV groups), punctuation, stop-listed form,
digit-initial or hyphen-initial token RESETS the accumulator; every
time THREE content words accumulate consecutively the trigram is
counted and the accumulator resets (non-overlapping harvest within a
run). Top expressions by frequency feed the MWE lexicon.

Spark shape: one window pass marks reset boundaries and numbers the
content runs (cumulative reset count), a rank inside each run chunks it
into non-overlapping triples, and one groupBy counts the expressions —
all JVM-side column expressions, no Python in the path. The window
partitions by doc_id (positions are per-doc), so at 100 TB it is a
partition-local sort, never a global one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expressions(
    tok: DataFrame,
    skip: "F.Column",
    term_col: str = "term",
    n_words: int = 3,
    top: int = 2000,
) -> DataFrame:
    """(expression, freq) of non-overlapping ``n_words``-grams of
    consecutive content tokens.

    ``tok``: (doc_id, pos, ``term_col``) in-stream tokens; ``skip``: a
    boolean Column marking accumulator-resetting tokens (the caller
    encodes the reference's function-word/stop/digit/hyphen test —
    Expressions.java:340-353). Consecutive means adjacent in the
    ORIGINAL stream: any skipped token between two content words breaks
    the expression, exactly like the reference's ``form.setLength(0)``.
    A POSITION GAP breaks a run the same way (review batch 31): the
    full analysis chain DROPS stop/punctuation tokens while consuming
    a position (StopFilter gap semantics), so a hole in the pos
    numbering IS a dropped resetting token — without this,
    engine.expressions() over chain output chained content words
    across the very function words the reference resets at. On a
    stream that carries every token physically (the contract fixture),
    positions are contiguous and the gap term is a no-op.
    Ties rank expression asc for a deterministic report."""
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    gap = (
        F.col("pos")
        - F.coalesce(F.lag("pos").over(w_doc), F.col("pos") - F.lit(1))
        > F.lit(1)
    )
    marked = tok.select(
        "doc_id", "pos", F.col(term_col).alias("term"), skip.alias("skip")
    ).withColumn(
        # run id = resets seen so far (inclusive): content tokens
        # sharing a run id are consecutive in the stream; a skip row
        # and a pos hole both advance it (double-advance at a skipped
        # row that also follows a hole is harmless — run ids need only
        # separate segments, not be dense)
        "run",
        F.sum(F.col("skip").cast("int") + gap.cast("int")).over(w_doc),
    )
    content = marked.filter(~F.col("skip"))
    w_run = Window.partitionBy("doc_id", "run").orderBy("pos")
    chunked = content.withColumn(
        "idx", F.row_number().over(w_run) - F.lit(1)
    ).withColumn("chunk", (F.col("idx") / F.lit(n_words)).cast("int"))
    grams = (
        chunked.groupBy("doc_id", "run", "chunk")
        .agg(
            F.count("*").alias("n"),
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("pos", "term")))
                .getField("term")
            ).alias("expression"),
        )
        .filter(F.col("n") == n_words)  # only full chunks count
    )
    return (
        grams.groupBy("expression")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("expression"))
        .limit(top)
    )


def chain_skip_expr(stop_forms: set[str] | None = None) -> "F.Column":
    """The reference's reset test over analysis-chain output columns
    (term, pos_tag): function-word groups (VERB incl. AUX, DET, the
    CONN connector group ≈ UD ADP/CCONJ/SCONJ, PRO, ADV), punctuation,
    stop-listed surface forms (Expressions.java's embedded STOP list —
    initials, numbers in letters, common adjectives), digit-initial and
    hyphen-initial tokens."""
    groups = (
        "VERB", "AUX", "DET", "ADP", "CCONJ", "SCONJ", "PRON", "ADV",
        "PUNCT", "NUM",
    )
    c = F.col("pos_tag").isin(*groups) | F.col("term").rlike("^[-0-9]")
    if stop_forms:
        c = c | F.col("term").isin(*sorted(stop_forms))
    return c
