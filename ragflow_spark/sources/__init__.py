from ragflow_spark.sources.tables import load_tables  # noqa: F401
