"""Round-3 batch 6: hierarchical time rollups + weighted sampling.

``events_multigrain_rollup`` is the hypertable/continuous-aggregate
pattern: coarse grains are RE-AGGREGATED from the next-finer grain (day
from hour from minute), never from raw data — at 100 TB the raw stream is
read once and each further grain costs only the previous grain's row
count. The exact integer-micros representation rides the whole hierarchy,
so re-aggregation is bit-identical to direct aggregation (the oracle
computes every grain directly from raw events — the hash match IS the
reaggregation-correctness proof).

``weighted_sample_per_source`` is deterministic weighted sampling without
replacement (Efraimidis–Spirakis A-ES): key = u^(1/w) with u a stable
md5-derived uniform — same no-RNG-state / rerunnable posture as
``mixture_sample_by_source``, but weight-proportional.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table

# --- multi-grain rollup ------------------------------------------------------


@register(
    "events_multigrain_rollup",
    oracle="""
SELECT 'minute' AS grain, date_trunc('minute', ts) AS g,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val
FROM events GROUP BY 2
UNION ALL
SELECT 'hour', date_trunc('hour', ts), CAST(count(*) AS BIGINT),
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
FROM events GROUP BY 2
UNION ALL
SELECT 'day', date_trunc('day', ts), CAST(count(*) AS BIGINT),
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
FROM events GROUP BY 2
""",
    description="Hierarchical multi-granularity rollup (the hypertable / "
    "continuous-aggregate pattern): minute aggregates come from raw "
    "events; hour aggregates RE-AGGREGATE the minute rows; day "
    "re-aggregates hour — raw data is scanned exactly once, each coarser "
    "grain costs only the finer grain's cardinality. Value sums stay in "
    "exact LONG micro-units through the whole hierarchy and convert to "
    "double once per output row, so sum-of-sums is bit-identical to a "
    "direct sum — the oracle aggregates every grain directly from raw "
    "events, making the hash match a proof of reaggregation "
    "correctness. (Plain double partial sums would NOT survive this "
    "test.) The same shape maintains streaming continuous aggregates "
    "via foreachBatch upserts.",
    bench=True,
    tags=("timeseries", "rollup", "events"),
)
def q_events_multigrain_rollup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(F.date_trunc("minute", "ts").alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1e6, 0).cast("long")).alias("micros"),
    )
    hour = minute.groupBy(F.date_trunc("hour", "g").alias("g")).agg(
        F.sum("n").alias("n"), F.sum("micros").alias("micros")
    )
    day = hour.groupBy(F.date_trunc("day", "g").alias("g")).agg(
        F.sum("n").alias("n"), F.sum("micros").alias("micros")
    )

    def out(df, grain):
        return df.select(
            F.lit(grain).alias("grain"),
            "g",
            "n",
            (F.col("micros").cast("decimal(24,6)") / F.lit(1000000))
            .cast("double")
            .alias("val"),
        )

    return out(minute, "minute").unionAll(out(hour, "hour")).unionAll(
        out(day, "day")
    )


# --- weighted sampling (A-ES) ------------------------------------------------


@register(
    "weighted_sample_per_source",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         power(
           (CAST('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) + 1) / 4294967296.0,
           1.0 / n_chars
         ) AS k
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_chars,
         CAST(row_number() OVER (
             PARTITION BY source ORDER BY k DESC, doc_id
         ) AS BIGINT) AS rk
  FROM keyed
)
SELECT source, doc_id, n_chars, rk FROM ranked WHERE rk <= 3
""",
    description="Weighted sampling without replacement (Efraimidis–"
    "Spirakis A-ES): per-item key u^(1/w) with weight w = n_chars and u "
    "a stable md5-derived uniform — the top-k keys per source ARE a "
    "weight-proportional sample, computed distributed with one window "
    "(or per-partition top-k at scale), no RNG state, identical on "
    "every rerun and cluster size. This is how a training pipeline "
    "over-samples long/high-quality documents reproducibly. The float "
    "key is ordering-only (never output), so cross-engine pow() ulp "
    "differences can only matter on exact key ties, which doc_id "
    "tie-breaking resolves identically.",
    tags=("llm", "sampling", "window"),
)
def q_weighted_sample_per_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.pow(u, 1.0 / F.col("n_chars")).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("source", "doc_id", "n_chars", "rk")
    )
