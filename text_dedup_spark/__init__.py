"""text_dedup_spark — a from-scratch, PySpark-native near-duplicate detection
and clustering engine with the capabilities of the reference `text-dedup`
(weiyx16/text-dedup fork of ChenghaoMou/text-dedup).

This is NOT a port of the reference's RDD/flatMap scripts: all dataflow is
expressed with the DataFrame API (Catalyst/AQE-optimized, Arrow-batched
pandas UDFs only where the JVM genuinely cannot express the kernel), designed
for multi-executor clusters at 10^12-row scale while remaining testable on
``local[N]``.

Layout
------
- ``kernel/``     pure-Python/numpy bit-exact kernels (no Spark imports):
                  MinHash, SimHash/xxh64, interval algebra, union-find oracle.
- ``functions/``  vectorized pandas/Arrow UDF wrappers over the kernels plus
                  JVM-side (Catalyst expression) builders.
- ``operators/``  DataFrame operators: LSH banding, connected components,
                  exact/simhash/suffix dedup, ANN similarity, text analysis.
- ``sources/``    IO: table read/write, checkpoint tables, synthetic data.
- ``plans/``      end-to-end pipelines (one-shot and 3-stage checkpointed).
- ``streaming/``  Structured Streaming incremental dedup.
"""

__version__ = "0.1.0"
