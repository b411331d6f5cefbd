from piholelongtermstats_spark.sources.parquet import load_table  # noqa: F401
from piholelongtermstats_spark.sources.events import dns_fact, FACT_CTE  # noqa: F401
