from piholelongtermstats_spark.plans.registry import QUERIES, ORACLE  # noqa: F401
