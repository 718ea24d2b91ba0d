"""Full-fidelity schema checks: every DDL column is present, the
nested-group <-> dotted projections round-trip, and the DataLens
charts run unchanged on the COMPLETE 224-column visits model.
"""

from __future__ import annotations

from datetime import date

from yc_data_transfer_clickhouse_from_yandex_metrica_spark import schemas_full as sf
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.queries import metrica


def test_column_counts_match_ddl():
    # ddl/hits.sql:5-110 and ddl/visits.sql:5-227 column inventories
    assert len(sf.DOTTED_HITS_COLUMNS) == 106
    assert len(sf.DOTTED_VISITS_COLUMNS) == 224
    # grouped form loses nothing: scalars + sum over group members
    def dotted_count(schema):
        from pyspark.sql import types as T

        n = 0
        for f in schema.fields:
            if isinstance(f.dataType, T.ArrayType) and isinstance(
                f.dataType.elementType, T.StructType
            ):
                n += len(f.dataType.elementType.fields)
            else:
                n += 1
        return n

    assert dotted_count(sf.HITS_FULL_SCHEMA) == 106
    assert dotted_count(sf.VISITS_FULL_SCHEMA) == 224


def test_dotted_view_restores_ddl_names(spark):
    df = spark.createDataFrame([], sf.VISITS_FULL_SCHEMA)
    dotted = metrica.dotted_nested_view(df)
    assert set(dotted.columns) == set(sf.DOTTED_VISITS_COLUMNS)


def test_charts_run_on_full_schema(spark):
    from pyspark.sql import types as T

    # ClickHouse arrays are non-nullable with default [] -- mirror that
    base = {
        f.name: ([] if isinstance(f.dataType, T.ArrayType) else None)
        for f in sf.VISITS_FULL_SCHEMA.fields
    }
    row = {
        **base,
        "CounterID": 1,
        "StartDate": date(2023, 11, 1),
        "CounterUserIDHash": 7,
        "VisitID": 1,
        "Sign": 1,
        "VisitVersion": 1,
        "Duration": 60,
        "IsBounce": 0,
        "PageViews": 3,
        "TrafficSource": [
            {
                **{
                    sub.name: None
                    for sub in sf.VISITS_FULL_SCHEMA["TrafficSource"].dataType.elementType.fields
                },
                "ID": 2,
                "Model": 2,
                "UTMSource": "yandex-s",
            }
        ],
        "EPurchase": [
            {
                **{
                    sub.name: None
                    for sub in sf.VISITS_FULL_SCHEMA["EPurchase"].dataType.elementType.fields
                },
                "ID": "p1",
            }
        ],
    }
    df = spark.createDataFrame([row], sf.VISITS_FULL_SCHEMA)

    visits = metrica.visits_by_day(df, date(2023, 11, 1), date(2023, 11, 2))
    assert [(r["ym:s:date"], r["ym:s:visits"]) for r in visits.collect()] == [
        (date(2023, 11, 1), 1),
        (None, 1),
    ]

    traffic = metrica.traffic_sources(df, date(2023, 11, 1), date(2023, 11, 2))
    r = traffic.collect()[0]
    assert r["ym:s:lastSignUTMSource"] == "yandex-s"
    assert r["ym:s:visits"] == 1 and r["ym:s:ecommercePurchases"] == 1
