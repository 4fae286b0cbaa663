"""Round-4 batch 1: ML feature-preparation tier.

Feature-engineering operators a training-data pipeline runs upstream of a
model: smoothed target (mean) encoding of a categorical, the pairwise
correlation matrix feature-selection starts from, lag-1 autocorrelation as a
per-entity signal feature, and the array higher-order-function suite over
the embedding column (the vector analog of the map-HOF suite in
``queries/quality.py``). The reference (single inverted-index pipeline,
``src/main.cpp``) has no analog for any of these.

All Catalyst-native. Float outputs follow the registry conventions: exact
integer/decimal accumulation wherever a sum feeds a formula, identical
double expression trees on both engines, round(4|6) at the edge.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.functions import dsum
from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table

# --- smoothed target encoding ------------------------------------------------


@register(
    "segment_target_encoding",
    oracle="""
WITH j AS (
  SELECT c_mktsegment, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
),
seg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
  FROM j GROUP BY 1
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS gn,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS gs
  FROM j
)
SELECT c_mktsegment, n_orders,
       round(s / n_orders, 4) AS mean_price,
       round((s + 50 * (gs / gn)) / (n_orders + 50), 4) AS enc_price
FROM seg, g
""",
    description="Smoothed target (mean) encoding of a categorical feature — "
    "the leakage-prone ML-prep step done right: per-segment mean order "
    "price shrunk toward the global mean with pseudo-count m=50, "
    "enc = (Σ_seg + m·µ_global) / (n_seg + m). Low-support categories "
    "collapse to the prior instead of memorizing noise. Sums are exact "
    "long-micros (dsum) so the double formula — identical expression "
    "tree on both engines — is bit-deterministic before the final "
    "round(4). One broadcast dim join + one groupBy; the 1-row global "
    "aggregate joins back broadcast, so a 100 TB fact table shuffles "
    "only its (segment, micros) pairs — and with partial aggregation "
    "that is |segments|·partitions rows, not data-linear.",
    tags=("mlprep", "agg", "join", "orders"),
)
def q_segment_target_encoding(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_totalprice")
    seg = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "s")
    )
    g = j.agg(
        F.count(F.lit(1)).alias("gn"), dsum(F.col("o_totalprice"), "gs")
    )
    return seg.crossJoin(F.broadcast(g)).select(
        "c_mktsegment",
        "n_orders",
        F.round(F.col("s") / F.col("n_orders"), 4).alias("mean_price"),
        F.round(
            (F.col("s") + F.lit(50) * (F.col("gs") / F.col("gn")))
            / (F.col("n_orders") + F.lit(50)),
            4,
        ).alias("enc_price"),
    )


# --- pairwise correlation matrix ---------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]  # noqa: E203
]


def _corr_matrix_oracle() -> str:
    aggs = ", ".join(
        f"round(corr({a}, {b}), 4) AS c{i}"
        for i, (a, b) in enumerate(_CORR_PAIRS)
    )
    arms = " UNION ALL ".join(
        f"SELECT '{a}' AS x_col, '{b}' AS y_col, c{i} AS corr_val FROM m"
        for i, (a, b) in enumerate(_CORR_PAIRS)
    )
    return f"WITH m AS (SELECT {aggs} FROM lineitem) {arms}"


@register(
    "lineitem_corr_matrix",
    oracle=_corr_matrix_oracle(),
    description="Pairwise Pearson correlation matrix of the four numeric "
    "lineitem measures, unpivoted to (x_col, y_col, corr) rows — the "
    "feature-selection screen (drop one of any near-collinear pair) "
    "before model training. All C(4,2)=6 correlations come from ONE "
    "scan / one aggregate row (each corr is a five-sum combination the "
    "partial-aggregate tree merges shard-wise), then stack() melts the "
    "1×6 row to long form driver-free. round(4) absorbs summation-order "
    "ulps (the convention lineitem_stats_suite already proved "
    "hash-stable for corr). At 100 TB this stays a single map-side-"
    "partial scan — the matrix never materializes more than "
    "|cols|² cells.",
    tags=("mlprep", "agg", "lineitem"),
)
def q_lineitem_corr_matrix(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"c{i}")
            for i, (a, b) in enumerate(_CORR_PAIRS)
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', c{i}" for i, (a, b) in enumerate(_CORR_PAIRS)
    )
    return m.select(
        F.expr(
            f"stack({len(_CORR_PAIRS)}, {stack_args}) "
            "AS (x_col, y_col, corr_val)"
        )
    )


# --- per-user lag-1 autocorrelation ------------------------------------------


@register(
    "user_value_autocorr",
    oracle="""
WITH seq AS (
  SELECT user_id,
         CAST(round(value * 1000000, 0) AS BIGINT) AS y,
         lag(CAST(round(value * 1000000, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
         ) AS x
  FROM events
),
s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM seq WHERE x IS NOT NULL GROUP BY 1
)
SELECT user_id, n AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 4) AS autocorr
FROM s
WHERE n >= 10 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
""",
    description="Lag-1 autocorrelation of each user's event-value series — "
    "the persistence/burstiness feature (near +1: momentum; near 0: "
    "noise). lag() over the per-user event order pairs x_{t-1} with "
    "x_t; Pearson corr is then assembled from EXACT integer power sums "
    "(micros in long, squares accumulated in decimal/HUGEINT — the "
    "quantity_moment_stats convention) so the only float math is the "
    "final identical-expression division, round(4). Zero-variance and "
    "short series are excluded by exact integer predicates, never by a "
    "float epsilon. One window shuffle + one aggregate, both keyed by "
    "user_id — a 100 TB event log reuses the same partitioning for "
    "both stages.",
    tags=("mlprep", "window", "timeseries", "events"),
)
def q_user_value_autocorr(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ym = F.round(F.col("value") * 1e6, 0).cast("long")
    seq = ev.select(
        "user_id",
        ym.alias("y"),
        F.lag(ym).over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    dec = "decimal(38,0)"
    s = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).alias("sxx"),
        F.sum((F.col("y").cast(dec) * F.col("y"))).alias("syy"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.filter((F.col("n") >= 10) & (varx > 0) & (vary > 0))
        .select(
            "user_id",
            F.col("n").alias("n_pairs"),
            F.round(
                cov.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double")),
                4,
            ).alias("autocorr"),
        )
    )


# --- array higher-order functions over embeddings ----------------------------


@register(
    "embedding_array_hof_suite",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
       round(list_max(e), 6) AS max_val,
       CAST(list_position(e, list_max(e)) AS BIGINT) AS idx_max,
       round(list_reduce(list_transform(e, x -> abs(x)),
                         (a, b) -> a + b), 4) AS l1_norm,
       round(list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                              list_transform(list_filter(e, x -> x > 0),
                                             x -> x)),
                 (a, b) -> a + b), 4) AS pos_mass
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
""",
    description="Array higher-order-function suite over the embedding "
    "column — the vector analog of the map-HOF suite: filter/exists "
    "(positive-coordinate count), array_max + 1-based argmax position, "
    "and two lambda folds (L1 norm, positive mass). Spark's "
    "aggregate() and DuckDB's list_reduce are both sequential left "
    "folds over the same parquet floats cast to double, so the sums are "
    "bit-identical before round(4) (the dot_product convention from "
    "operators/similarity.py). Everything is per-row JVM codegen — no "
    "shuffle, no UDF; at 100 TB this is a pure map stage that reads "
    "only (vec_id, embedding) columns. The pos_mass fold seeds an "
    "explicit 0.0 accumulator on both engines so empty filter results "
    "agree.",
    tags=("mlprep", "array", "embeddings"),
)
def q_embedding_array_hof_suite(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    return emb.select(
        "vec_id",
        F.size(F.filter("e", lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.round(F.array_max("e"), 6).alias("max_val"),
        F.array_position(F.col("e"), F.array_max("e"))
        .cast("bigint")
        .alias("idx_max"),
        F.round(
            F.aggregate(
                "e", F.lit(0.0), lambda acc, x: acc + F.abs(x)
            ),
            4,
        ).alias("l1_norm"),
        F.round(
            F.aggregate(
                F.filter("e", lambda x: x > 0),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("pos_mass"),
    )


@register(
    "embedding_pca_project",
    oracle=None,  # eigendecomposition is not SQL-expressible → rows-only;
    # loadings and projections pinned vs exact local numpy PCA in pytest
    description="PCA projection of the embedding corpus onto its top-4 "
    "principal components: one mapInPandas pass emits per-batch moment "
    "partials (count, Σx, Σxxᵀ — dim² floats, tiny), the driver reduces "
    "them sorted and eigendecomposes the dim×dim covariance, and the "
    "projection runs JVM-side as literal-array dot products inside "
    "whole-stage codegen — corpus scanned once per phase, never "
    "shuffled, no Python in the projection path. Component signs "
    "canonicalized for rerun stability (operators/similarity.py: "
    "pca_project). The pc array is rendered as a fixed-precision "
    "space-joined string at the registry boundary (house convention — "
    "the driver's pandas canonicalization cannot sort raw list "
    "columns); the raw-array operator output stays numpy-pinned in "
    "pytest.",
    tags=("mlprep", "embeddings", "llm"),
)
def q_embedding_pca_project(spark, sf_dir):
    from mapreduce_paradigm_spark.operators.similarity import pca_project

    return (
        pca_project(load_table(spark, sf_dir, "embeddings"), n_components=4)
        .withColumnRenamed("id", "vec_id")
        .select(
            "vec_id",
            F.array_join(
                F.transform("pc", lambda x: F.format_string("%.6f", x)), " "
            ).alias("pc"),
        )
    )


@register(
    "label_score_auc",
    oracle="""
WITH s AS (
  SELECT CAST(embedding[1] AS DOUBLE) AS score,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
g AS (
  SELECT score,
         CAST(sum(y) AS BIGINT) AS np_s,
         CAST(count(*) - sum(y) AS BIGINT) AS nn_s
  FROM s GROUP BY score
),
c AS (
  SELECT np_s, nn_s,
         CAST(coalesce(sum(nn_s) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS nn_below
  FROM g
)
SELECT CAST(sum(np_s) AS BIGINT) AS n_pos,
       CAST(sum(nn_s) AS BIGINT) AS n_neg,
       round(sum(np_s * (nn_below + nn_s / 2.0))
             / (sum(np_s) * sum(nn_s)), 6) AS auc
FROM c
""",
    description="Binary ROC-AUC of a score column (first embedding "
    "coordinate vs label≥5) via the rank-sum identity, computed in the "
    "DISTRIBUTED shape: aggregate to per-distinct-score (n_pos, n_neg) "
    "counts first, then one cumulative window over the distinct-score "
    "stream — AUC = Σ np(s)·(nn_below(s) + nn(s)/2) / (np·nn), ties "
    "handled exactly by the nn/2 term. The global window runs over "
    "DISTINCT SCORES, not rows, so its state is score-cardinality-sized "
    "— the standard scale trick vs ranking every row in one partition. "
    "Every term is an exact integer (or exact .5), so the sum is "
    "order-independent and hash-stable; full oracle.",
    tags=("mlprep", "statistics", "embeddings"),
)
def q_label_score_auc(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("score").agg(
        F.sum("y").cast("long").alias("np_s"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("nn_s"),
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.select(
        "np_s",
        "nn_s",
        F.coalesce(F.sum("nn_s").over(w), F.lit(0)).cast("long").alias("nn_below"),
    )
    return c.agg(
        F.sum("np_s").cast("long").alias("n_pos"),
        F.sum("nn_s").cast("long").alias("n_neg"),
        F.round(
            F.sum(F.col("np_s") * (F.col("nn_below") + F.col("nn_s") / 2.0))
            / (F.sum("np_s") * F.sum("nn_s")),
            6,
        ).alias("auc"),
    )


@register(
    "label_score_calibration",
    oracle="""
WITH s AS (
  SELECT vec_id,
         CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS sm,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
r AS (
  SELECT sm, y,
         row_number() OVER (ORDER BY sm, vec_id) AS rn,
         count(*) OVER () AS n
  FROM s
)
SELECT CAST(((rn - 1) * 10) // n AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(sm) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_score,
       round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate,
       round(CAST(sum(CAST((sm - y * 1000000) AS DECIMAL(19,0))
                      * (sm - y * 1000000)) AS DOUBLE)
             / count(*) / 1e12, 6) AS brier
FROM r GROUP BY 1
""",
    description="Reliability diagram (calibration deciles) + per-bucket "
    "Brier score for a score column vs the binary label: rank-decile "
    "buckets (deterministic (rn−1)·10 DIV n on a vec_id-tie-broken "
    "order), then per-bucket mean score, positive rate, and Brier — the "
    "model-eval triple a training pipeline reads before trusting a "
    "quality classifier's scores as probabilities. Integer-micros "
    "discipline throughout: scores micro-round BEFORE summing and the "
    "Brier numerator is an exact 128-bit-decimal sum of integer "
    "squares, so every output is an exact-integer ratio — "
    "order-independent, hash-stable. The global row_number is the "
    "oracle-parity form; at 100 TB decile edges come from "
    "approx_percentile (or a distributed sort) and the bucket join "
    "broadcasts — same downstream rollup.",
    tags=("mlprep", "statistics", "embeddings"),
)
def q_label_score_calibration(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.select(
        "vec_id",
        F.round(F.element_at("embedding", 1).cast("double") * 1000000, 0)
        .cast("long")
        .alias("sm"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
    )
    wr = Window.orderBy("sm", "vec_id")
    wn = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    r = s.select(
        "sm",
        "y",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    sq = (F.col("sm") - F.col("y") * 1000000).cast("decimal(19,0)") * (
        F.col("sm") - F.col("y") * 1000000
    )
    return (
        r.groupBy(
            F.expr("((rn - 1) * 10) DIV n").cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum("sm").cast("double") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("avg_score"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 6
            ).alias("pos_rate"),
            F.round(
                F.sum(sq).cast("double") / F.count(F.lit(1)) / 1e12, 6
            ).alias("brier"),
        )
    )


@register(
    "label_score_isotonic",
    oracle=None,  # PAV's sequential pooling is not SQL-expressible →
    # rows-only; monotonicity, weighted-mean preservation, and equality
    # with a brute-force numpy PAV pinned in pytest
    description="Isotonic (PAV) calibration FIT of the score column vs "
    "the binary label — the monotone correction that turns a "
    "ranking-quality score into an acceptance probability (Zadrozny & "
    "Elkan). One shuffle reduces the corpus to per-gridded-score integer "
    "counts; the driver pools adjacent violators over that bounded axis "
    "(exact cross-multiplied integer comparisons, no float in merge "
    "decisions) and the fitted step function returns plan-side "
    "(operators/calibrate.py). Complements label_score_calibration "
    "(diagnosis) with the repair.",
    tags=("mlprep", "statistics", "embeddings"),
)
def q_label_score_isotonic(spark, sf_dir):
    from mapreduce_paradigm_spark.operators.calibrate import (
        isotonic_calibration,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
    )
    return isotonic_calibration(emb, "score", "y", grid=10000)


# --- feature scaling (min-max + z-score) -------------------------------------


@register(
    "customer_feature_scaling",
    oracle="""
WITH m AS (
  SELECT c_custkey, c_acctbal,
         CAST(round(c_acctbal * 1000000, 0) AS BIGINT) AS v
  FROM customer
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS HUGEINT) AS s,
         CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sxx,
         min(v) AS mn, max(v) AS mx
  FROM m
)
SELECT c_custkey, c_acctbal,
       CAST(CAST((2 * (v - mn) * 10000 + (mx - mn)) // (2 * (mx - mn))
                 AS DECIMAL(24,4)) / 10000 AS DOUBLE) AS bal_minmax,
       CAST(CAST(CAST(round((CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / n)
             / sqrt(CAST(sxx AS DOUBLE) / n
                    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             * 1000000, 0) AS BIGINT) AS DECIMAL(24,6)) / 1000000 AS DOUBLE)
         AS bal_zscore
FROM m, g
""",
    description="Feature scaling suite: min-max normalization to [0,1] and "
    "population z-score of customer balance — the two standard numeric "
    "feature transforms, computed from ONE global aggregate (count, "
    "exact long-micros sum, exact decimal sum of squares, min, max) "
    "broadcast back to the row level via a 1-row cross join. Mean and "
    "variance come from exact integer power sums (the "
    "quantity_moment_stats convention). The min-max ratio is RATIONAL "
    "with 2dp-granular inputs, so 4dp ties are common at scale and "
    "round(double) resolves them differently per engine (Spark via "
    "shortest-decimal BigDecimal, DuckDB in binary — caught by the "
    "sf0.1 sweep); it is therefore rounded in EXACT integer arithmetic, "
    "HALF_UP(x/y) = (2x+y)//(2y), no float involved. The z-score "
    "(irrational denominator, ties measure-zero) uses the house "
    "integer-micro 6dp edge. At 100 TB: one partial-aggregated scan "
    "for the stats, one map-side pass for the transform; the stats row "
    "is broadcast, nothing else moves.",
    tags=("mlprep", "agg", "customer"),
)
def q_customer_feature_scaling(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    m = cust.select(
        "c_custkey",
        "c_acctbal",
        F.round(F.col("c_acctbal") * 1e6, 0).cast("long").alias("v"),
    )
    dec = "decimal(38,0)"
    g = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast(dec).alias("s"),
        F.sum(F.col("v").cast(dec) * F.col("v")).alias("sxx"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("sxx").cast("double") / F.col("n") - mean * mean
    z = (F.col("v").cast("double") - mean) / F.sqrt(var)
    return m.crossJoin(F.broadcast(g)).select(
        "c_custkey",
        "c_acctbal",
        (
            F.expr("(2 * (v - mn) * 10000 + (mx - mn)) div (2 * (mx - mn))")
            .cast("decimal(24,4)")
            / 10000
        )
        .cast("double")
        .alias("bal_minmax"),
        (F.round(z * 1e6, 0).cast("long").cast("decimal(24,6)") / 1000000)
        .cast("double")
        .alias("bal_zscore"),
    )


# --- activity heatmap (dow × hour) -------------------------------------------


@register(
    "events_dow_hour_heatmap",
    oracle="""
WITH c AS (
  SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INTEGER) AS dow_sun1,
         CAST(hour(ts) AS INTEGER) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT dow_sun1, hr, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY dow_sun1), 6) AS share_of_dow
FROM c
""",
    description="Day-of-week × hour activity heatmap with per-day share "
    "normalization — the seasonality profile (and the input grid any "
    "time-of-day feature encoding starts from). One aggregate over at "
    "most 7×24 cells + a ratio-to-report window on the aggregated "
    "grid; day-of-week uses the cross-engine Sunday=1 alignment the "
    "date-function suite established. The full-data shuffle carries "
    "only (dow, hour) pairs and partial counts — at 100 TB this is "
    "map-side-combined into ≤168 rows per partition.",
    tags=("mlprep", "timeseries", "agg", "events"),
)
def q_events_dow_hour_heatmap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.dayofweek("ts").cast("int").alias("dow_sun1"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("dow_sun1")
    return c.select(
        "dow_sun1",
        "hr",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wd), 6).alias(
            "share_of_dow"
        ),
    )


# --- weight-of-evidence / information value ----------------------------------


@register(
    "quantity_woe_iv",
    oracle="""
WITH base AS (
  SELECT CAST(floor((l_quantity - 1) / 5) + 1 AS BIGINT) AS bin,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
  FROM lineitem
),
bins AS (
  SELECT bin,
         CAST(count(*) FILTER (WHERE bad = 0) AS BIGINT) AS n_good,
         CAST(count(*) FILTER (WHERE bad = 1) AS BIGINT) AS n_bad
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_good) AS BIGINT) AS tot_good,
         CAST(sum(n_bad) AS BIGINT) AS tot_bad
  FROM bins
)
SELECT CAST(b.bin AS BIGINT) AS bin, b.n_good, b.n_bad,
       round(ln((CAST(b.n_good AS DOUBLE) * t.tot_bad)
                / (CAST(b.n_bad AS DOUBLE) * t.tot_good)), 6) AS woe,
       round((CAST(b.n_good AS DOUBLE) / t.tot_good
              - CAST(b.n_bad AS DOUBLE) / t.tot_bad)
             * ln((CAST(b.n_good AS DOUBLE) * t.tot_bad)
                  / (CAST(b.n_bad AS DOUBLE) * t.tot_good)), 6) AS iv_contrib
FROM bins b CROSS JOIN tot t
WHERE b.n_good > 0 AND b.n_bad > 0
""",
    description="Weight-of-evidence binning + information value (the "
    "credit-scoring / feature-screening standard): l_quantity bucketed "
    "into 10 fixed bins (floor((q-1)/5)+1; Spark width_bucket has no "
    "DuckDB twin so both engines share the explicit form), binary "
    "target = returnflag 'R', per-bin WoE = ln(good-share / bad-share) "
    "and its IV contribution (sum of iv_contrib = the feature's IV). "
    "One conditional-aggregate pass builds all bins (no per-bin scans), "
    "totals ride a broadcast 1-row cross join; WoE's argument is a "
    "ratio of exact integer products, so the ln sees bit-identical "
    "input on both engines (the tfidf convention). Zero-count bins are "
    "excluded by integer predicate (standard practice is merging or "
    "Laplace-smoothing them; exclusion keeps the oracle trivially "
    "equivalent). Scale: cost == one groupBy on a 10-value key; for "
    "equi-DEPTH bins swap in the price_equidepth_histogram edges.",
    tags=("mlprep", "statistics"),
)
def q_quantity_woe_iv(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.floor((F.col("l_quantity") - 1) / 5) + 1).cast("long").alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
    )
    bins = base.groupBy("bin").agg(
        F.count_if(F.col("bad") == 0).alias("n_good"),
        F.count_if(F.col("bad") == 1).alias("n_bad"),
    )
    tot = bins.agg(
        F.sum("n_good").alias("tot_good"), F.sum("n_bad").alias("tot_bad")
    )
    woe = F.log(
        (F.col("n_good").cast("double") * F.col("tot_bad"))
        / (F.col("n_bad").cast("double") * F.col("tot_good"))
    )
    share_gap = (
        F.col("n_good").cast("double") / F.col("tot_good")
        - F.col("n_bad").cast("double") / F.col("tot_bad")
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .filter((F.col("n_good") > 0) & (F.col("n_bad") > 0))
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_good",
            "n_bad",
            F.round(woe, 6).alias("woe"),
            F.round(share_gap * woe, 6).alias("iv_contrib"),
        )
    )


# --- Theil-Sen robust slope --------------------------------------------------


@register(
    "user_value_theil_sen",
    oracle="""
WITH pts AS (
  SELECT user_id,
         list_transform(
           list_sort(list(
             [CAST(date_diff('microsecond', TIMESTAMP '2024-01-01', ts) AS DOUBLE),
              CAST(CAST(round(value * 1000000, 0) AS BIGINT) AS DOUBLE)])),
           p -> p) AS a
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id HAVING count(*) >= 2
),
slopes AS (
  SELECT user_id,
         list_sort(flatten(list_transform(a, (p, i) ->
           list_transform(a[i+1:len(a)],
             q -> CASE WHEN q[1] <> p[1]
                       THEN (q[2] - p[2]) / (q[1] - p[1]) * 3600000000.0
                       END)))) AS sl
  FROM pts
),
cleaned AS (
  SELECT user_id, list_filter(sl, x -> x IS NOT NULL) AS sl FROM slopes
)
SELECT user_id,
       CAST(len(sl) AS BIGINT) AS n_pairs,
       round((sl[(len(sl) + 1) // 2]
              + sl[len(sl) // 2 + 1]) / 2, 6) AS theil_slope
FROM cleaned WHERE len(sl) >= 1
""",
    description="Theil-Sen robust trend per user: the MEDIAN of all "
    "pairwise slopes (value-micros per hour) — up to ~29% outlier "
    "contamination leaves the estimate intact, where the per-user OLS "
    "slope (user_value_trend) follows a single wild point. Pairwise "
    "slopes generate IN-ARRAY per group (the jaccard-postings "
    "combination-explode trick on the per-user point array — no "
    "self-join, no row explosion; O(n²) confined within each group, "
    "fine for per-entity series, cap or sample points for groups "
    "beyond ~10³), and the median is the same explicit sorted-array "
    "middle formula on both engines (trusting two quantile "
    "implementations to interpolate identically is exactly the kind "
    "of cross-engine assumption this registry avoids). Slope inputs "
    "are exact integer micros; equal-timestamp pairs are excluded by "
    "integer predicate. One shuffle (the per-user collect).",
    tags=("mlprep", "statistics", "robust"),
)
def q_user_value_theil_sen(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = (
        events.select(
            "user_id",
            F.array(
                F.expr(
                    "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01', ts) AS DOUBLE)"
                ),
                F.round(F.col("value") * 1e6, 0).cast("long").cast("double"),
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("p")).alias("a"))
        .filter(F.size("a") >= 2)
    )
    slopes = pts.select(
        "user_id",
        F.expr(
            "array_sort(filter(flatten(transform(a, (p, i) -> "
            "transform(slice(a, i + 2, size(a)), q -> "
            "CASE WHEN q[0] <> p[0] "
            "THEN (q[1] - p[1]) / (q[0] - p[0]) * 3600000000.0 END))), "
            "x -> x IS NOT NULL))"
        ).alias("sl"),
    ).filter(F.size("sl") >= 1)
    m = F.size("sl")
    med = (
        F.element_at("sl", ((m + 1) / 2).cast("int"))
        + F.element_at("sl", (m / 2 + 1).cast("int"))
    ) / 2
    return slopes.select(
        "user_id",
        m.cast("long").alias("n_pairs"),
        F.round(med, 6).alias("theil_slope"),
    )


@register(
    "user_value_mann_kendall",
    oracle="""
WITH pts AS (
  SELECT user_id,
         list_sort(list(
           [CAST(date_diff('microsecond', TIMESTAMP '2024-01-01', ts) AS BIGINT)
              * 1000000 + event_id,
            CAST(round(value * 1000000, 0) AS BIGINT)])) AS a
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id HAVING count(*) >= 20
),
scored AS (
  SELECT user_id, CAST(len(a) AS BIGINT) AS n,
         CAST(list_sum(flatten(list_transform(a, (p, i) ->
           list_transform(a[i+1:len(a)],
             q -> CASE WHEN q[2] > p[2] THEN 1
                       WHEN q[2] < p[2] THEN -1 ELSE 0 END)))) AS BIGINT) AS s
  FROM pts
)
SELECT user_id, n, s,
       round((s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
             / sqrt(n * (n - 1.0) * (2 * n + 5) / 18), 4) AS z
FROM scored
""",
    description="Mann-Kendall trend test per user: S = sum of "
    "sign(v_j - v_i) over all time-ordered pairs — the nonparametric "
    "significance companion to user_value_theil_sen's slope (same "
    "in-array pairwise machinery, same per-entity O(n²) confinement); "
    "|z| > 1.96 flags a monotone trend with no linearity or normality "
    "assumption. Chronological order rides a single packed (micros, "
    "event_id) key INSIDE the sorted array so j > i means strictly "
    "later; S is a pure integer; the continuity-corrected z uses the "
    "no-ties variance formula (value ties contribute 0 to S and are "
    "rare at micro resolution; the tie-corrected variance drops in "
    "without changing the shape). One shuffle — the per-user collect.",
    tags=("mlprep", "statistics", "timeseries"),
)
def q_user_value_mann_kendall(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    key = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01', ts) AS BIGINT)"
    ) * F.lit(1000000) + F.col("event_id")
    pts = (
        events.select(
            "user_id",
            F.array(
                key, F.round(F.col("value") * 1e6, 0).cast("long")
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("p")).alias("a"))
        .filter(F.size("a") >= 20)
    )
    scored = pts.select(
        "user_id",
        F.size("a").cast("long").alias("n"),
        F.expr(
            "CAST(aggregate(flatten(transform(a, (p, i) -> "
            "transform(slice(a, i + 2, size(a)), q -> "
            "CASE WHEN q[1] > p[1] THEN 1 WHEN q[1] < p[1] THEN -1 ELSE 0 END))), "
            "0, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("s"),
    )
    n, sc = F.col("n"), F.col("s")
    corr = F.when(sc > 0, 1).when(sc < 0, -1).otherwise(0)
    z = (sc - corr) / F.sqrt(
        n * (n - F.lit(1.0)) * (2 * n + 5) / F.lit(18.0)
    )
    return scored.select("user_id", "n", "s", F.round(z, 4).alias("z"))


# --- contrastive in-batch negative mining ------------------------------------


@register(
    "contrastive_inbatch_negatives",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source,
         md5(CAST(doc_id AS VARCHAR)) AS hkey,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS batch
  FROM documents
),
led AS (
  SELECT doc_id AS anchor_id, source AS a_src,
         lead(doc_id, 1) OVER w AS n1, lead(source, 1) OVER w AS s1,
         lead(doc_id, 2) OVER w AS n2, lead(source, 2) OVER w AS s2,
         lead(doc_id, 3) OVER w AS n3, lead(source, 3) OVER w AS s3
  FROM keyed
  WINDOW w AS (PARTITION BY batch ORDER BY hkey)
)
SELECT anchor_id, negative_id, slot FROM (
  SELECT anchor_id, a_src, n1 AS negative_id, s1 AS n_src,
         CAST(1 AS BIGINT) AS slot FROM led
  UNION ALL
  SELECT anchor_id, a_src, n2, s2, CAST(2 AS BIGINT) FROM led
  UNION ALL
  SELECT anchor_id, a_src, n3, s3, CAST(3 AS BIGINT) FROM led
) u
WHERE negative_id IS NOT NULL AND n_src <> a_src
""",
    description="In-batch negative mining for contrastive training: docs "
    "are dealt into 16 pseudo-random batches by the first md5 hex digit "
    "of their id, ordered within batch by the full md5 key, and each "
    "anchor takes its next 3 batch-neighbors as negatives, masking "
    "same-source collisions (the standard in-batch scheme — negatives "
    "come from the batch you already have, so mining is LINEAR, never "
    "an all-pairs similarity pass). Deterministic: md5 ordering is "
    "engine-independent, no RNG. Scale: one hash-partition shuffle + "
    "per-batch sort; batch count scales freely, window state is 3 rows.",
    tags=("mlprep", "llm"),
)
def q_contrastive_inbatch_negatives(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("batch"),
    )
    w = Window.partitionBy("batch").orderBy("hkey")
    led = keyed.select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("a_src"),
        *[F.lead("doc_id", k).over(w).alias(f"n{k}") for k in (1, 2, 3)],
        *[F.lead("source", k).over(w).alias(f"s{k}") for k in (1, 2, 3)],
    )
    stacked = led.select(
        "anchor_id",
        "a_src",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"n{k}").alias("negative_id"),
                        F.col(f"s{k}").alias("n_src"),
                        F.lit(k).cast("long").alias("slot"),
                    )
                    for k in (1, 2, 3)
                ]
            )
        ).alias("x"),
    )
    return (
        stacked.filter(
            F.col("x.negative_id").isNotNull() & (F.col("x.n_src") != F.col("a_src"))
        )
        .select("anchor_id", F.col("x.negative_id").alias("negative_id"), F.col("x.slot").alias("slot"))
    )


@register(
    "kfold_split_summary",
    oracle="""
WITH folds AS (
  SELECT ('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5
           AS fold,
         source, n_chars
  FROM documents
)
SELECT fold,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
FROM folds GROUP BY 1
""",
    description="Deterministic 5-fold cross-validation assignment + "
    "per-fold balance summary: fold = md5-hash of a salted doc key mod "
    "5 — no RNG state, so folds are identical across engines, reruns, "
    "and cluster sizes (the property sampleBy cannot give), and any "
    "worker can recompute membership locally (no fold table to "
    "broadcast). The summary (docs, distinct sources, char mass per "
    "fold) is the balance check run before trusting the split. One "
    "grouped aggregate; exact-integer outputs; full oracle.",
    tags=("mlprep", "sampling", "llm"),
)
def q_kfold_split_summary(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fold = F.expr(
        "CAST(conv(substr(md5(concat('fold:', CAST(doc_id AS STRING))), 1, 15),"
        " 16, 10) AS BIGINT) % 5"
    )
    return (
        docs.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("source").cast("long").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
        )
    )
