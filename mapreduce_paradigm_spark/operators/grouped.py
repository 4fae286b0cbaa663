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
