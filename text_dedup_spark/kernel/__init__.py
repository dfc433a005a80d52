"""Pure-Python/numpy kernels — no Spark imports allowed in this subpackage.

These are the bit-exact scalar cores that the pandas-UDF layer
(``text_dedup_spark.functions``) vectorizes. Keeping them Spark-free makes
them directly testable against the reference's doctest golden vectors.
"""
