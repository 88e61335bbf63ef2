"""etl_reconciliate_spark — a PySpark-native CDC ingest + reconciliation engine.

A from-scratch re-expression of the capabilities of the reference system
(mzrtcode/ETL-Reconciliate, a Spring Batch two-datasource payment
reconciler — see SURVEY.md) as an idiomatic Spark engine:

* binlog/WAL-style change-feed tail over conversation-transcript events
  keyed on (conv_id, turn_idx), with max-LSN dedup, key-partitioned
  repartition, and exactly-once MERGE apply into an Iceberg-style target
  (``streaming.runner``, ``operators.dedup``, ``operators.merge``,
  ``target.table``);
* automatic schema evolution and idempotent replay from per-partition
  checkpoint offsets committed atomically with the target snapshot
  (``plans.checkpoint``);
* a reconciliation pass — the Spark-first analog of the reference's
  full-outer match classification
  (reference: service/ReconciliationService.java:107-201) — classifying
  rows MATCH / SOURCE_ONLY / TARGET_ONLY / VALUE_DISCREPANCY with
  vectorized Arrow UDF text comparison and explicit salted-key skew
  handling (``operators.reconcile``);
* a faithful reference-semantics reconciler over SWIFT/JPAT-shaped
  tables for parity testing (``operators.refrecon``);
* large-scale training-data-pipeline operators: deduplication (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search (brute-force + LSH-bucketed ANN), and text analysis
  (language-ID, quality scoring, token counting, fingerprinting)
  (``operators.dedupe_docs``, ``operators.similarity``,
  ``operators.textstats``).

Everything is DataFrame-API first: Catalyst plans the physical execution;
Python appears only in Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
