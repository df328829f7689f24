from logvision_spark.functions.registry import register_sql_functions  # noqa: F401
