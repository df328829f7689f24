from logvision_spark.sources.readers import load_table, load_tables  # noqa: F401
