"""alix_spark — a from-scratch PySpark-native full-text index + BM25 engine.

Re-expresses the capabilities of the reference system (oeuvres/alix, a
Java/Lucene toolkit for indexing and lexicometric search) as idiomatic
Spark DataFrame jobs:

- ``alix_spark.analysis``   — the per-document analysis chain (markup
  tokenizer, clitic split, lemma/MWE/stop/cleanup filters) as vectorized
  Arrow UDFs (reference: analysis/.../fr/FrenchAnalyzer.java:288-305).
- ``alix_spark.index``      — inverted-index build: postings, term/doc
  stats, term dictionary, delta+varint block codec with block-max skip
  data (reference sidecars: common/.../terms/TermStats.java,
  TermLexicon.java, TermRail.java).
- ``alix_spark.query``      — BM25 top-k (k1=1.2, b=0.75; reference
  common/.../terms/TermDocScorer.java:98-189) with brute-force DataFrame
  scoring and block-max WAND pruning over encoded segments.
- ``alix_spark.lexicometry``— keyness scorers (G2/Chi2/LogRatio/LogDice/
  SimpleMaths; reference common/.../terms/KeynessScorer.java), windowed
  co-occurrence, histograms, suggestions.
- ``alix_spark.textops``    — large-scale training-data pipeline ops:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
  similarity search, language-ID, quality scoring, fingerprinting,
  multimodal column plumbing.
"""

__version__ = "0.1.0"
