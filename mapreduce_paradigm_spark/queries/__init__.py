"""Query library — importing this package registers every QuerySpec."""

from mapreduce_paradigm_spark.queries import (  # noqa: F401
    flagship,
    llm,
    pipeline,
    relational,
    streaming_q,
    subqueries,
    windows,
)
