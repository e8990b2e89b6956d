"""snorkel_spark — a from-scratch, PySpark-native KG-construction engine.

Re-implements the query/data-processing capabilities of the reference
(``fsonntag/snorkel``, classic HazyResearch Snorkel lineage — see
SURVEY.md §0 for provenance) as an idiomatic Spark 4 DataFrame pipeline:

- interleaved text+media document ingest (Iceberg-style snapshot tables)
- sentence/span projection via Arrow-batched ``mapInPandas``
- n-gram candidate spaces + matcher algebra (dictionary/regex/union/concat)
- labeling-function application → sparse long-form (candidate_id, lf_id,
  label) matrix
- generative label model (matrix-completion / SGD over LF accuracies,
  Snorkel-MeTaL formulation) fit from a ``treeAggregate`` of sufficient
  statistics
- entity linking against a broadcast alias dictionary, canonicalization,
  salted two-phase aggregation, triple materialization with lineage and
  checkpoint/resume.

No per-row Python UDFs anywhere on the hot path — only built-in
``pyspark.sql.functions``, pandas UDFs, ``mapInPandas``/``applyInPandas``
and one metrics-free ``treeAggregate`` of NumPy arrays.
"""

__version__ = "0.1.0"
