"""Gap-based sessionization: derive Metrica-style visits from raw hits.

Yandex Metrica's visit IS a gap session -- hits of one user grouped
until an inactivity timeout (30 min default).  The reference receives
visits precomputed by Metrica (ddl/visits.sql), so an engine replacing
that stack needs to DERIVE them from the hits stream: this operator
closes that loop.

Batch path uses Spark's native ``session_window`` (merges events
closer than the gap; window = [first, last+gap)); the streaming form
is the same expression under ``withWatermark`` -- session_window is
one of the few aggregations Structured Streaming supports with merge
semantics out of the box.  One shuffle on the user key.

Boundary semantics: a new session starts when the inter-event gap is
>= the timeout (an event exactly at window end opens a new session);
the DuckDB oracle mirrors this with lag/cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    hits: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session rollup: (user, session_start, n_events,
    duration_sec, is_bounce) -- the visit-table core derived from hits
    (cf. ddl/visits.sql StartDate/PageViews/Duration/IsBounce).
    """
    return (
        hits.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.timestamp_diff(
                    "MICROSECOND", F.min(ts_col), F.max(ts_col)
                )
                / F.lit(1_000_000)
            )
            .cast("long")
            .alias("duration_sec"),
            (F.count(F.lit(1)) == 1).alias("is_bounce"),
        )
        .drop("session_window")
    )
