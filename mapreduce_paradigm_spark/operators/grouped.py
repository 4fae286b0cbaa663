"""Grouped-map pandas operators (``groupBy().applyInPandas``) — the escape
hatch for per-group logic with no Catalyst expression (model fits, custom
numerics). Each group arrives as ONE Arrow-backed pandas DataFrame on an
executor, so groups must fit executor memory — the right tool for
many-small-groups workloads (per-user, per-session), not for whole-table
math. State-free (safe under retries/speculation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

TREND_SCHEMA = "user_id BIGINT, n_events BIGINT, slope DOUBLE"


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user least-squares trend of ``value`` over event time (hours
    since the user's first event): the textbook grouped-map shape.

    slope = cov(x, y) / var(x) — the same population-moment formula as SQL
    ``regr_slope``; x is centered before the products, so conditioning stays
    good even though raw epochs are ~1.7e9. Groups with zero time variance
    are dropped (slope undefined; SQL mirror: HAVING var_pop(x) > 0).
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].astype("datetime64[us]")
        x = (ts - ts.min()).dt.total_seconds().to_numpy() / 3600.0
        y = pdf["value"].to_numpy(dtype=np.float64)
        xc = x - x.mean()
        denom = float((xc * xc).sum())
        if len(pdf) < 2 or denom == 0.0:
            return pd.DataFrame({"user_id": [], "n_events": [], "slope": []})
        slope = float((xc * (y - y.mean())).sum()) / denom
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "slope": [round(slope, 6)],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fit, schema=TREND_SCHEMA)
    )


COGROUP_SCHEMA = (
    "user_id BIGINT, n_clicks BIGINT, n_purchases BIGINT, "
    "click_value DOUBLE, purchase_value DOUBLE"
)


def clicks_purchases_cogrouped(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Per-user merge of two event streams via ``cogroup().applyInPandas`` —
    the two-sided grouped-map surface: each key's rows from BOTH inputs
    arrive together as two pandas frames (one co-partitioning shuffle per
    side, no join materialization). The right tool when per-key logic needs
    both sides at once (sessionized attribution, feature joins with custom
    alignment); here the payload is counts + exact value sums so the result
    is SQL-mirrorable (FILTER aggregates over the union).

    Full-outer semantics: a user present on either side emits one row; the
    absent side contributes 0. Sums accumulate in integer micro-units
    (round₆ then int64) — the same order-independent exact arithmetic as
    ``functions.dsum``, so values hash-match the DuckDB decimal oracle.
    """

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        def micro_sum(pdf: pd.DataFrame) -> float:
            # Cardinality-only actions (count()) let Spark 4 prune the
            # cogroup children down to the grouping key, so ``value`` may
            # be absent; its contribution is unread in those plans, so 0.0
            # is safe — full-output actions always deliver every column.
            if not len(pdf) or "value" not in pdf.columns:
                return 0.0
            return float((pdf["value"] * 1e6).round().astype(np.int64).sum()) / 1e6

        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_clicks": [len(left)],
                "n_purchases": [len(right)],
                "click_value": [micro_sum(left)],
                "purchase_value": [micro_sum(right)],
            }
        )

    lc = clicks.select("user_id", "value")
    rp = purchases.select("user_id", "value")
    return (
        lc.groupBy("user_id")
        .cogroup(rp.groupBy("user_id"))
        .applyInPandas(merge, schema=COGROUP_SCHEMA)
    )
