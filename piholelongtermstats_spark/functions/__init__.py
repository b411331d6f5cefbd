from piholelongtermstats_spark.functions.derive import (  # noqa: F401
    ALLOWED_STATUSES,
    BLOCKED_STATUSES,
    day_period,
    enrich_time,
    preprocess,
    status_type,
)
