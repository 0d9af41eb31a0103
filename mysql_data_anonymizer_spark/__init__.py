"""PySpark-native data-anonymization & analytics engine.

A ground-up rebuild of the capabilities of zengheng3/mysql-data-anonymizer
(reference: /root/reference, PHP) as an idiomatic PySpark engine:

- the masking DSL (``Blueprint``: primary / globalWhere / column / where /
  replaceWith / replaceWithGenerator / replaceByFields / synchronizeColumn,
  reference src/Blueprint.php:99-248) compiles to a chain of
  ``pyspark.sql.Column`` expressions — Catalyst + whole-stage codegen execute
  it vectorized instead of the reference's one-UPDATE-per-row loop
  (reference src/Anonymizer.php:152-195);
- cross-table key propagation (reference's AFTER UPDATE triggers,
  src/Anonymizer.php:403-424) becomes an explicit broadcast-join key remap;
- fake values come from a deterministic hash-based generator
  (seed x primary-key -> value), replacing Faker's stateful ``unique()``
  (reference src/Blueprint.php:163-176) with uniqueness by construction —
  which also makes every mask oracle-checkable and distributable;
- beyond the reference surface: relational operators (joins, aggregates,
  windows, set ops), deduplication (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine), similarity search, text analysis, multimodal
  column plumbing, and Structured Streaming masking.
"""

from mysql_data_anonymizer_spark.anonymizer import Anonymizer
from mysql_data_anonymizer_spark.blueprint import Blueprint
from mysql_data_anonymizer_spark.session import get_spark

__all__ = ["Anonymizer", "Blueprint", "get_spark"]
__version__ = "0.1.0"
