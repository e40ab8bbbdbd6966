"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL system (fnote/sample-python-lambdas-
glue-and-pyspark-scripts), rebuilt Spark-first.

Layout
------
- ``session``     : tuned SparkSession factory (AQE, shuffle sizing, Arrow)
- ``schemas``     : declarative StructType schemas + constraint constants
- ``functions``   : scalar column functions (SURVEY.md §2.7)
- ``sources``     : readers/writers (SURVEY.md §2.1)
- ``operators``   : validation, transform, routing, ledger, versioning,
                    dedup, similarity, text, multimodal (SURVEY.md §2.2-2.6 + §7 M6)
- ``plans``       : end-to-end pipelines (price_zone, pa)
- ``streaming``   : incremental file-arrival processing (SURVEY.md §2.8)

Everything is a pure function over DataFrames (the reference's testable
``validator.py`` shape, generalized — see SURVEY.md §7.0).
"""

__version__ = "0.1.0"
