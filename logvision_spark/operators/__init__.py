from logvision_spark.operators.aggregations import (  # noqa: F401
    count_by,
    distinct_count,
    global_count,
    size_kb,
    status_class_counts,
    sum_mb_faithful,
    traffic_mb,
)
from logvision_spark.operators.topk import ranked, top_k  # noqa: F401
from logvision_spark.operators.joins import (  # noqa: F401
    geo_enrich,
    timeline_full_outer,
)
