from logvision_spark.serving.views import ServingCatalog  # noqa: F401
