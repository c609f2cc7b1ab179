"""datamatcher_spark — a from-scratch PySpark-native record-linkage engine.

Re-expresses the semantics of the reference desktop matcher
(Rontir/datamatcher, surveyed in SURVEY.md) as an idiomatic Spark
DataFrame pipeline: declarative Catalyst column expressions for all
normalization / merge / rule logic, a three-stage blocking → scoring →
clustering job for web-scale entity resolution, and a library of
large-scale training-data operators (dedup, similarity search, text
analysis) on top.

Design rules (enforced throughout):
  * DataFrame/SQL only — no RDDs.
  * Built-in ``pyspark.sql.functions`` wherever semantics allow; Arrow
    pandas UDFs only where Python semantics are genuinely required
    (Jaro-Winkler, byte-exact ``str.title``); never row-at-a-time UDFs.
  * Every shuffle is deliberate: broadcast small sides, salt skewed
    blocks, checkpoint iterative lineage.
"""

__version__ = "0.1.0"
