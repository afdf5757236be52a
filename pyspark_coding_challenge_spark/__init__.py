"""PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference `pyspark-coding-challenge` project (sequence
feature pipeline for recommender training), extended with the relational and
LLM-data-pipeline operators a 100 TB training-data platform needs.

Design principles (see SURVEY.md §7):

* Everything is a composable ``DataFrame -> DataFrame`` function. There is no
  custom IR — Catalyst's logical plan *is* the IR.
* Explicit DDL schemas everywhere; schema inference is never used (it is what
  breaks the reference's own tests on PySpark 4.x).
* Zero row-at-a-time Python UDFs in hot paths. Built-in
  ``pyspark.sql.functions`` first, Arrow-batched pandas UDFs only where no
  builtin exists (MinHash banding, embedding kernels), ``mapInPandas`` for
  multimodal plumbing.
* Scale posture: partition/broadcast/AQE configuration + layout, not custom
  kernels. Per-customer-day history is computed once and joined back, instead
  of the reference's per-impression-row window (SURVEY §4.1).
"""

__version__ = "0.1.0"
