from logvision_spark.plans.checks import explain_str, plan_features  # noqa: F401
