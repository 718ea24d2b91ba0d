"""ClickHouse ``WITH TOTALS`` as a one-pass rollup (SURVEY.md A9).

The reference's visits-by-day chart query uses ``GROUP BY date WITH
TOTALS`` (/root/reference/README.md:83): grouped rows plus ONE
grand-total row computed over all rows passing WHERE.  Under the
default ``totals_mode`` the totals row is computed BEFORE HAVING while
HAVING filters only the group rows.

Spark has no out-of-band totals channel, so the totals row is emitted
in-band with null group keys -- exactly what ``rollup`` produces.  One
pass, partial-aggregate friendly; the DuckDB oracle formulation is
``GROUP BY ROLLUP`` + the same grouping filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FLAG = "__grouping_id"


def with_totals(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    having: Column | None = None,
) -> DataFrame:
    """``df.groupBy(group_cols).agg(aggs) WITH TOTALS`` + optional HAVING.

    Returns group rows (for multi-key grouping, only the full-detail
    level) plus the single grand-total row (all keys null), with HAVING
    applied to group rows only -- ClickHouse default ``totals_mode =
    before_having`` semantics.
    """
    n = len(group_cols)
    full_detail = 0
    grand_total = (1 << n) - 1
    rolled = df.rollup(*group_cols).agg(
        *aggs, F.grouping_id(*group_cols).alias(_FLAG)
    )
    keep = F.col(_FLAG) == grand_total
    detail = F.col(_FLAG) == full_detail
    if having is not None:
        detail = detail & having
    return rolled.where(keep | detail).drop(_FLAG)
