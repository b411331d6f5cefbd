from piholelongtermstats_spark.plans.registry import QUERIES, ORACLE  # noqa: F401
from piholelongtermstats_spark.plans import registry_m7  # noqa: F401  (registers M7 queries)
from piholelongtermstats_spark.plans import registry_m8  # noqa: F401  (registers M8 queries)
