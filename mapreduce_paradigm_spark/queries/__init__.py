"""Query library — importing this package registers every QuerySpec."""

from mapreduce_paradigm_spark.queries import (  # noqa: F401
    analytics_ext,
    checks,
    drift,
    flagship,
    graphtext,
    llm,
    mlprep,
    pipeline,
    quality,
    relational,
    rollup_sampling,
    search_rank,
    sources_q,
    sqlx,
    statistics,
    streaming_q,
    subqueries,
    timeseries,
    warehouse,
    windows,
)
