"""Unknown-token report (reference cli/Unknowns.java — the
piaget-errors.txt dictionary-tuning workflow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alix_spark.analysis.chain import analyzed_tokens
from alix_spark.corpus import webtext
from alix_spark.corpus.unknowns import unknown_tokens, unknowns_from_chain


def test_unknown_tokens_anti_join_and_filters(spark):
    tok = spark.createDataFrame(
        [
            (1, "bonjour"), (1, "zzzqx"), (1, "zzzqx"), (2, "zzzqx"),
            (1, "ab"),            # too short (len < 3)
            (1, "page12"),        # trailing digit
            (1, "l'"), (2, "qu’"),  # trailing apostrophe
            (2, "bonjour"), (2, "aberratio"),
        ],
        "doc_id long, term string",
    )
    known = spark.createDataFrame([("bonjour",)], "term string")
    rows = unknown_tokens(tok, known, top=10).collect()
    assert [(r["term"], r["freq"], r["docs"]) for r in rows] == [
        ("zzzqx", 3, 2),
        ("aberratio", 1, 1),
    ]


def test_unknowns_from_chain_finds_ocr_garbage(spark):
    """Inject an OCR-damaged nonsense token into real webtext pages:
    it must surface in the report; lexicon-known French words must
    not."""
    corpus = webtext.doc_ids(webtext.webtext(spark, 12, seed=4, partitions=2))
    corpus = corpus.withColumn(
        "html",
        F.concat(
            F.col("html").cast("string"),
            F.lit("<p>tlgvz scrambled tlgvz</p>"),
        ).cast("binary"),
    )
    tok = analyzed_tokens(corpus)
    rows = unknowns_from_chain(tok, top=50).collect()
    terms = {r["term"] for r in rows}
    assert "tlgvz" in terms
    by_term = {r["term"]: r for r in rows}
    assert by_term["tlgvz"]["freq"] == 24 and by_term["tlgvz"]["docs"] == 12
    # a dictionary word with a lemma never appears
    lemmed = {
        r["term"]
        for r in tok.filter(F.col("lemma") != "").select("term").distinct().collect()
    }
    assert not (terms & lemmed)
