from logvision_spark.ml.intrusion import (  # noqa: F401
    build_pipeline,
    evaluate,
    load_corpus,
    score_stream,
    train,
)
