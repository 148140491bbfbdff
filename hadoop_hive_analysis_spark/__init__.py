"""hadoop_hive_analysis_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
the reference repo ``tludlow/Hadoop-Hive-Analysis`` (Hadoop MapReduce + HiveQL
top-K analytics over TPC-DS-style tables), built Spark-first:

* the reference's hand-rolled MR physical techniques (combiner, split sizing,
  single-reducer top-K, reduce-side join) are all subsumed by Catalyst/AQE —
  see SURVEY.md §4 — so this engine declares logical plans with the DataFrame
  API and lets Spark pick the physical strategy;
* every reference operator (SURVEY.md §2) is available both as a composable
  DataFrame function (:mod:`.operators.core`) and through the SQL entry point
  (:mod:`.sources.catalog` registers views);
* beyond reference parity, :mod:`.operators` adds the large-scale
  training-data-pipeline surface: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis, and
  multimodal column plumbing — each designed for 100 TB-scale execution.
"""

__version__ = "0.1.0"
