"""Gap-based sessionization of an event stream — pure window composition.

A new session starts when the gap to the previous event of the same user
exceeds ``gap``; session ids are the running count of session starts. Two
window passes over the same (user, time) ordering → a single shuffle on
user_id; Catalyst reuses the sort between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap: str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Add ``session_id`` (1-based per user, BIGINT) to each event row."""
    order = [F.asc(ts_col), F.asc(order_tiebreak)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + F.expr(gap)), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__new_session", is_new).withColumn(
        "session_id", F.sum("__new_session").over(running).cast("long")
    ).drop("__new_session")
