from logvision_spark.streaming.pipeline import (  # noqa: F401
    counter_views,
    start_counter_query,
)
