"""Round-5 batch: preference / evaluation-data operators — the RLHF-side
companion of the corpus-curation tier. A preference-data pipeline ingests
pairwise comparisons from multiple annotators and needs: the win-rate
matrix (with majority votes), inter-annotator agreement (Cohen's kappa per
annotator pair), and a fitted Bradley-Terry strength table (Hunter '04 MM
iterations).

The comparison corpus is synthesized deterministically from ``documents``:
8 items with true strengths 1..8, one comparison per document between
items derived from doc_id, and three annotators whose votes are md5-hash
thresholded at s_lo/(s_lo+s_hi) — i.e. the votes are EXACT Bradley-Terry
samples with hash-derived (engine-independent) randomness, so the fitted
scores recover the planted ordering.

Cross-engine determinism: votes are integer hash comparisons; the BT MM
iterations run in integer micro fixed-point with truncating division
(DIV/​//), so five unrolled rounds produce bit-identical BIGINTs in Spark
and DuckDB — no accumulated float drift, the repo's integer-fixed-point
convention for iterative numerics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table

_N_ITEMS = 8
_ANNOTATORS = (1, 2, 3)

# Shared SQL fragment: one vote row per (comparison document, annotator).
# lo/hi are the compared items (lo < hi), strengths are item+1, and the
# vote is for lo iff hash % (s_lo + s_hi) < s_lo.
_VOTES_SQL = f"""
comps AS (
  SELECT doc_id,
         LEAST(doc_id % {_N_ITEMS},
               (doc_id % {_N_ITEMS} + 1 + (doc_id // {_N_ITEMS}) % {_N_ITEMS - 1})
                 % {_N_ITEMS}) AS lo,
         GREATEST(doc_id % {_N_ITEMS},
               (doc_id % {_N_ITEMS} + 1 + (doc_id // {_N_ITEMS}) % {_N_ITEMS - 1})
                 % {_N_ITEMS}) AS hi
  FROM documents
),
votes AS (
  SELECT c.doc_id, c.lo, c.hi, r.r,
         CASE WHEN ('0x' || substr(md5('vote:' || CAST(r.r AS VARCHAR) || ':'
                                       || CAST(c.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % (c.lo + c.hi + 2) < c.lo + 1
              THEN c.lo ELSE c.hi END AS winner
  FROM comps c CROSS JOIN (VALUES (1), (2), (3)) r(r)
)
"""


def _votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lo, hi, r, winner) — one row per comparison x annotator."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = F.col("doc_id") % _N_ITEMS
    b = (a + 1 + F.expr(f"doc_id DIV {_N_ITEMS}") % (_N_ITEMS - 1)) % _N_ITEMS
    comps = docs.select(
        "doc_id", F.least(a, b).alias("lo"), F.greatest(a, b).alias("hi")
    )
    comps = comps.select(
        "doc_id", "lo", "hi", F.explode(F.array(*[F.lit(r) for r in _ANNOTATORS])).alias("r")
    )
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("vote:"),
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (F.col("lo") + F.col("hi") + 2)
    )
    return comps.select(
        "doc_id",
        "lo",
        "hi",
        "r",
        F.when(h < F.col("lo") + 1, F.col("lo")).otherwise(F.col("hi")).alias(
            "winner"
        ),
    )


@register(
    "preference_winrate_matrix",
    oracle=f"""
WITH {_VOTES_SQL},
maj AS (
  SELECT doc_id, lo, hi,
         CAST(count(*) FILTER (WHERE winner = lo) AS BIGINT) AS lo_votes
  FROM votes GROUP BY 1, 2, 3
)
SELECT lo AS item_a, hi AS item_b,
       CAST(count(*) AS BIGINT) AS n_comparisons,
       CAST(count(*) FILTER (WHERE lo_votes >= 2) AS BIGINT) AS a_majority_wins,
       round(count(*) FILTER (WHERE lo_votes >= 2) * 1.0 / count(*), 4)
         AS a_winrate
FROM maj GROUP BY 1, 2
""",
    description="Pairwise win-rate matrix over 3-annotator majority votes — "
    "the first diagnostic read on a preference-data batch (is any item "
    "pair under-sampled? do empirical win rates order the items "
    "consistently?). One pass over the vote stream, one (pair) "
    "aggregate for majorities, one for the matrix — both key-partitioned "
    "and map-combined; the matrix is items²-sized, never corpus-sized. "
    "Votes are md5-thresholded exact Bradley-Terry samples (strengths "
    "1..8 planted), so downstream fits recover the ordering; full "
    "oracle.",
    tags=("preference", "llm", "aggregation"),
)
def q_preference_winrate_matrix(spark, sf_dir):
    votes = _votes(spark, sf_dir)
    maj = votes.groupBy("doc_id", "lo", "hi").agg(
        F.sum((F.col("winner") == F.col("lo")).cast("long")).alias("lo_votes")
    )
    return maj.groupBy(
        F.col("lo").alias("item_a"), F.col("hi").alias("item_b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_comparisons"),
        F.sum((F.col("lo_votes") >= 2).cast("long")).alias("a_majority_wins"),
        F.round(
            F.sum((F.col("lo_votes") >= 2).cast("double")) / F.count(F.lit(1)), 4
        ).alias("a_winrate"),
    )


@register(
    "annotator_agreement_kappa",
    oracle=f"""
WITH {_VOTES_SQL},
pairs AS (
  SELECT v1.r AS rater_a, v2.r AS rater_b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE v1.winner = v2.winner) AS BIGINT) AS agree,
         CAST(count(*) FILTER (WHERE v1.winner = v1.lo) AS BIGINT) AS a_lo,
         CAST(count(*) FILTER (WHERE v2.winner = v2.lo) AS BIGINT) AS b_lo
  FROM votes v1
  JOIN votes v2 ON v1.doc_id = v2.doc_id AND v1.r < v2.r
  GROUP BY 1, 2
)
SELECT rater_a, rater_b, n,
       round(agree * 1.0 / n, 4) AS p_observed,
       round((a_lo * b_lo + (n - a_lo) * (n - b_lo)) * 1.0 / (n * n), 4)
         AS p_expected,
       round((agree * 1.0 / n
              - (a_lo * b_lo + (n - a_lo) * (n - b_lo)) * 1.0 / (n * n))
             / (1.0 - (a_lo * b_lo + (n - a_lo) * (n - b_lo)) * 1.0 / (n * n)),
             4) AS cohen_kappa
FROM pairs
""",
    description="Inter-annotator agreement: Cohen's kappa per annotator "
    "pair over the shared comparison set (binary categories lo-wins / "
    "hi-wins, marginal-product chance correction) — the QA gate a "
    "preference batch passes before it trains a reward model; low kappa "
    "means the labels are noise. The rater-pair join is keyed on the "
    "comparison id (co-partitioned, 3 rows per key), aggregates "
    "map-combine to one row per rater pair, and kappa is exact integer "
    "counts with the one closed-form float at the edge (house stats "
    "convention). Full oracle.",
    tags=("preference", "llm", "statistics"),
)
def q_annotator_agreement_kappa(spark, sf_dir):
    votes = _votes(spark, sf_dir)
    v1, v2 = votes.alias("v1"), votes.alias("v2")
    pairs = (
        v1.join(
            v2,
            (F.col("v1.doc_id") == F.col("v2.doc_id"))
            & (F.col("v1.r") < F.col("v2.r")),
        )
        .groupBy(
            F.col("v1.r").alias("rater_a"), F.col("v2.r").alias("rater_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (F.col("v1.winner") == F.col("v2.winner")).cast("long")
            ).alias("agree"),
            F.sum((F.col("v1.winner") == F.col("v1.lo")).cast("long")).alias(
                "a_lo"
            ),
            F.sum((F.col("v2.winner") == F.col("v2.lo")).cast("long")).alias(
                "b_lo"
            ),
        )
    )
    po = F.col("agree") / F.col("n")
    pe = (
        F.col("a_lo") * F.col("b_lo")
        + (F.col("n") - F.col("a_lo")) * (F.col("n") - F.col("b_lo"))
    ) / (F.col("n") * F.col("n"))
    return pairs.select(
        "rater_a",
        "rater_b",
        "n",
        F.round(po, 4).alias("p_observed"),
        F.round(pe, 4).alias("p_expected"),
        F.round((po - pe) / (F.lit(1.0) - pe), 4).alias("cohen_kappa"),
    )


_BT_ROUNDS = 5
_MICRO = 1_000_000


def _bt_oracle() -> str:
    """Unrolled integer fixed-point MM rounds as chained CTEs."""
    parts = [
        f"""
pair_votes AS (
  SELECT lo, hi,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE winner = lo) AS BIGINT) AS lo_w
  FROM votes GROUP BY 1, 2
),
items AS (SELECT CAST(unnest(range({_N_ITEMS})) AS BIGINT) AS item),
wins AS (
  SELECT i.item,
         CAST(coalesce(sum(CASE WHEN p.lo = i.item THEN p.lo_w
                                WHEN p.hi = i.item THEN p.n - p.lo_w END),
                       0) AS BIGINT) AS w
  FROM items i LEFT JOIN pair_votes p ON p.lo = i.item OR p.hi = i.item
  GROUP BY 1
),
s0 AS (SELECT item, CAST({_MICRO} AS BIGINT) AS s FROM items)"""
    ]
    for r in range(1, _BT_ROUNDS + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"""
d{r} AS (
  SELECT t.item, CAST(sum(t.c) AS BIGINT) AS denom
  FROM (
    SELECT p.lo AS item,
           (p.n * {_MICRO} * {_MICRO}) // (sa.s + sb.s) AS c
    FROM pair_votes p
    JOIN {prev} sa ON sa.item = p.lo JOIN {prev} sb ON sb.item = p.hi
    UNION ALL
    SELECT p.hi,
           (p.n * {_MICRO} * {_MICRO}) // (sa.s + sb.s)
    FROM pair_votes p
    JOIN {prev} sa ON sa.item = p.lo JOIN {prev} sb ON sb.item = p.hi
  ) t GROUP BY 1
),
s{r} AS (
  SELECT w.item,
         CASE WHEN d.denom > 0 THEN (w.w * {_MICRO} * {_MICRO}) // d.denom
              ELSE {_MICRO} END AS s
  FROM wins w JOIN d{r} d ON d.item = w.item
)"""
        )
    body = ",".join(parts)
    return f"""
WITH {_VOTES_SQL},{body}
SELECT s.item, w.w AS wins, CAST(s.s AS BIGINT) AS score_micro,
       CAST(row_number() OVER (ORDER BY s.s DESC, s.item ASC) AS BIGINT)
         AS rank
FROM s{_BT_ROUNDS} s JOIN wins w ON w.item = s.item
"""


@register(
    "preference_bradley_terry",
    oracle=_bt_oracle(),
    description="Bradley-Terry strength fitting over the vote stream "
    f"(Hunter '04 MM updates, {_BT_ROUNDS} unrolled rounds): "
    "s_i' = W_i / sum_pairs n_ij/(s_i+s_j) — the reward-model-free "
    "ranking a preference pipeline reports per batch. The corpus-scale "
    "work is ONE (pair) vote aggregate; the MM rounds then run on the "
    "collected items²-bounded pair table DRIVER-SIDE (28 rows here — "
    "the bounded-driver-read convention the k-means centroid and LSH "
    "bucket steps use), because at any corpus size the fit's state is "
    "items-scale, and running item-scale rounds as Spark jobs pays "
    "whole-job scheduling latency per round for 28-row work (measured: "
    "36 s at sf0.1 as distributed rounds — plan re-embedding plus 4 "
    "jobs/round of fixed overhead — vs corpus-aggregate cost alone "
    "driver-side). All round arithmetic is integer micro fixed-point "
    "with truncating division on nonnegative operands, so five rounds "
    "stay bit-identical across engines and across Python/SQL (no "
    "accumulated float drift — the integer-fixed-point convention the "
    "SPRT/OBF walks use). Votes are exact hash-thresholded BT samples "
    "with planted strengths 1..8, and the fitted ranking recovers the "
    "planted order; full oracle.",
    bench=True,
    tags=("preference", "llm", "iterative"),
)
def q_preference_bradley_terry(spark, sf_dir):
    votes = _votes(spark, sf_dir)
    pair_votes = votes.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("winner") == F.col("lo")).cast("long")).alias("lo_w"),
    )
    # the ONLY corpus-scale job; everything below is items²-bounded
    pv = [
        (r["lo"], r["hi"], r["n"], r["lo_w"]) for r in pair_votes.collect()
    ]
    wins = {i: 0 for i in range(_N_ITEMS)}
    for lo, hi, n, lo_w in pv:
        wins[lo] += lo_w
        wins[hi] += n - lo_w
    s = {i: _MICRO for i in range(_N_ITEMS)}
    for _ in range(_BT_ROUNDS):
        denom = {i: 0 for i in range(_N_ITEMS)}
        for lo, hi, n, _lw in pv:
            c = (n * _MICRO * _MICRO) // (s[lo] + s[hi])
            denom[lo] += c
            denom[hi] += c
        s = {
            i: (wins[i] * _MICRO * _MICRO) // denom[i]
            if denom[i] > 0
            else _MICRO
            for i in range(_N_ITEMS)
        }
    ranked = sorted(range(_N_ITEMS), key=lambda i: (-s[i], i))
    rows = [
        (i, wins[i], s[i], ranked.index(i) + 1) for i in range(_N_ITEMS)
    ]
    return spark.createDataFrame(
        rows, "item BIGINT, wins BIGINT, score_micro BIGINT, rank BIGINT"
    )


# --- Fleiss' multi-rater kappa -----------------------------------------------


@register(
    "preference_fleiss_kappa",
    oracle=f"""
WITH {_VOTES_SQL},
per_item AS (
  SELECT doc_id,
         CAST(count(*) FILTER (WHERE winner = lo) AS BIGINT) AS n_lo
  FROM votes GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(n_lo) AS BIGINT) AS s_lo,
         CAST(sum(n_lo * n_lo + (3 - n_lo) * (3 - n_lo) - 3) AS BIGINT) AS a
  FROM per_item
)
SELECT n_items,
       round(a * 1.0 / (6 * n_items), 6) AS p_observed,
       round((s_lo * s_lo + (3 * n_items - s_lo) * (3 * n_items - s_lo)) * 1.0
             / (9.0 * n_items * n_items), 6) AS p_expected,
       round((3 * n_items * a
              - 2 * (s_lo * s_lo + (3 * n_items - s_lo) * (3 * n_items - s_lo)))
             * 1.0
             / (18.0 * n_items * n_items
                - 2 * (s_lo * s_lo
                       + (3 * n_items - s_lo) * (3 * n_items - s_lo))),
             6) AS fleiss_kappa
FROM s
""",
    description="Fleiss' kappa over ALL THREE annotators at once (binary "
    "lo-wins/hi-wins categories) — the multi-rater batch-level agreement "
    "gate that complements the pairwise Cohen's table "
    "(annotator_agreement_kappa): one number for 'is this labeling "
    "process better than chance', robust to which pair you look at. "
    "P-bar = mean item agreement sum n_ij(n_ij-1)/(n(n-1)); chance from "
    "pooled category marginals. One item-level aggregate then one "
    "corpus-scalar reduce, both map-combined; kappa is derived as a "
    "single EXACT integer ratio ((3NA - 2B) / (18N^2 - 2B), no "
    "intermediate float division at all) with the final rounded "
    "division at the edge — the house stats convention. Full oracle.",
    tags=("preference", "llm", "statistics"),
)
def q_preference_fleiss_kappa(spark, sf_dir):
    votes = _votes(spark, sf_dir)
    per_item = votes.groupBy("doc_id").agg(
        F.sum((F.col("winner") == F.col("lo")).cast("long")).alias("n_lo")
    )
    s = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("n_lo").alias("s_lo"),
        F.sum(
            F.col("n_lo") * F.col("n_lo")
            + (3 - F.col("n_lo")) * (3 - F.col("n_lo"))
            - 3
        ).alias("a"),
    )
    b = (
        F.col("s_lo") * F.col("s_lo")
        + (3 * F.col("n_items") - F.col("s_lo"))
        * (3 * F.col("n_items") - F.col("s_lo"))
    )
    return s.select(
        "n_items",
        F.round(F.col("a") * 1.0 / (6 * F.col("n_items")), 6).alias(
            "p_observed"
        ),
        F.round(
            b * 1.0 / (9.0 * F.col("n_items") * F.col("n_items")), 6
        ).alias("p_expected"),
        F.round(
            (3 * F.col("n_items") * F.col("a") - 2 * b)
            * 1.0
            / (18.0 * F.col("n_items") * F.col("n_items") - 2 * b),
            6,
        ).alias("fleiss_kappa"),
    )


# --- per-annotator confusion vs consensus (Dawid-Skene M-step) -----------------


@register(
    "annotator_confusion_vs_consensus",
    oracle=f"""
WITH {_VOTES_SQL},
enc AS (
  SELECT doc_id, r, CASE WHEN winner = hi THEN 1 ELSE 0 END AS v
  FROM votes
),
truth AS (
  SELECT doc_id,
         CASE WHEN sum(v) >= 2 THEN 1 ELSE 0 END AS t
  FROM enc GROUP BY 1
),
conf AS (
  SELECT e.r AS rater, truth.t AS consensus, e.v AS vote,
         CAST(count(*) AS BIGINT) AS n
  FROM enc e JOIN truth ON e.doc_id = truth.doc_id
  GROUP BY 1, 2, 3
),
tot AS (
  SELECT rater, consensus, CAST(sum(n) AS BIGINT) AS n_t
  FROM conf GROUP BY 1, 2
)
SELECT c.rater, c.consensus, c.vote, c.n,
       round(c.n * 1.0 / t.n_t, 6) AS rate
FROM conf c JOIN tot t
  ON t.rater = c.rater AND t.consensus = c.consensus
""",
    description="Per-annotator confusion matrix against the majority "
    "consensus — exactly the M-step of Dawid-Skene '79 annotator-"
    "quality estimation (P(vote | consensus truth) per rater), the "
    "diagnostic that tells you WHICH annotator to retrain/deweight "
    "when Fleiss/Cohen only say THAT the batch disagrees. Consensus = "
    "majority of 3 (no ties); one vote-level aggregate then "
    "rater-scale (3x2x2) rate normalization — corpus is touched once. "
    "Rates are exact-integer ratios rounded 6dp. Full oracle.",
    tags=("preference", "llm", "quality"),
)
def q_annotator_confusion_vs_consensus(spark, sf_dir):
    from pyspark.sql.window import Window

    votes = _votes(spark, sf_dir)
    enc = votes.select(
        "doc_id",
        "r",
        (F.col("winner") == F.col("hi")).cast("int").alias("v"),
    )
    truth = enc.groupBy("doc_id").agg(
        (F.sum("v") >= 2).cast("int").alias("t")
    )
    conf = (
        enc.join(truth, "doc_id")
        .groupBy(
            F.col("r").alias("rater"),
            F.col("t").alias("consensus"),
            F.col("v").alias("vote"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wtot = Window.partitionBy("rater", "consensus")
    return conf.select(
        "rater",
        "consensus",
        "vote",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(wtot), 6).alias("rate"),
    )
