"""Metrica data model mapped onto Spark types (SURVEY.md section 1).

Miniatures of the reference tables keeping every column its queries
touch (FIXTURES.md F-1..F-3):

- visits: multi-version CDC ledger, engine columns (Sign, VisitVersion)
  from /root/reference/ddl/visits.sql:8-10, metrics from :34,:112,:129,
  nested groups as array-of-struct (SURVEY.md 1.2 decision) from
  :179-218 (TrafficSource), :58-68 (EPurchase), :130-140 (ParsedParams).
- hits: append-only fact, the 12-column YQ projection
  (/root/reference/README.md:201-213,240-253) + ddl/hits.sql:5-9 keys.
- dim_browser_country: SCD-2 dimension
  (/root/reference/csv/dim_browser_country.csv:1-3).

Type mapping per SURVEY.md 1.2: unsigned ints widen one step; UInt64
hash/id columns ride as LongType (opaque: group/join keys only).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRAFFIC_SOURCE = T.ArrayType(
    T.StructType(
        [
            T.StructField("ID", T.ByteType(), True),
            T.StructField("Model", T.ShortType(), True),
            T.StructField("UTMSource", T.StringType(), True),
            T.StructField("UTMMedium", T.StringType(), True),
            T.StructField("UTMCampaign", T.StringType(), True),
        ]
    )
)

EPURCHASE = T.ArrayType(
    T.StructType(
        [
            T.StructField("ID", T.StringType(), True),
            T.StructField("Revenue", T.LongType(), True),
        ]
    )
)

PARSED_PARAMS = T.ArrayType(
    T.StructType(
        [
            T.StructField("Key1", T.StringType(), True),
            T.StructField("Quantity", T.LongType(), True),
        ]
    )
)

VISITS_SCHEMA = T.StructType(
    [
        T.StructField("CounterID", T.LongType(), False),       # ddl/visits.sql:5
        T.StructField("StartDate", T.DateType(), False),       # :6
        T.StructField("CounterUserIDHash", T.LongType(), False),  # :7
        T.StructField("VisitID", T.LongType(), False),         # :8
        T.StructField("Sign", T.ByteType(), False),            # :9
        T.StructField("VisitVersion", T.IntegerType(), False),  # :10
        T.StructField("Duration", T.LongType(), True),         # :34
        T.StructField("IsBounce", T.ShortType(), True),        # :112
        T.StructField("PageViews", T.IntegerType(), True),     # :129
        T.StructField("TrafficSource", TRAFFIC_SOURCE, True),  # :179-218
        T.StructField("EPurchase", EPURCHASE, True),           # :58-68
        T.StructField("ParsedParams", PARSED_PARAMS, True),    # :130-140
    ]
)

HITS_SCHEMA = T.StructType(
    [
        T.StructField("CounterID", T.LongType(), False),        # ddl/hits.sql:5
        T.StructField("EventDate", T.DateType(), False),        # :6
        T.StructField("CounterUserIDHash", T.LongType(), False),  # :7
        T.StructField("UTCEventTime", T.TimestampType(), False),  # :8
        T.StructField("WatchID", T.LongType(), False),          # :9
        T.StructField("AdvEngineID", T.IntegerType(), True),    # :10
        T.StructField("AdvEngineStrID", T.StringType(), True),  # :11
        T.StructField("BrowserCountry", T.StringType(), True),  # :12 FixedString(2)
        T.StructField("BrowserEngineID", T.IntegerType(), True),   # :13
        T.StructField("BrowserEngineStrID", T.StringType(), True),  # :14
        T.StructField("URL", T.StringType(), True),             # :96
        T.StructField("GoalsReached", T.ArrayType(T.LongType()), True),  # :30
    ]
)

DIM_BROWSER_COUNTRY_SCHEMA = T.StructType(
    [
        T.StructField("BrowserCountry", T.StringType(), False),
        T.StructField("BrowserCountryDesc", T.StringType(), False),
        T.StructField("FromDT", T.DateType(), False),
        T.StructField("ToDT", T.DateType(), False),
    ]
)

# the reference dimension rows, verbatim (csv/dim_browser_country.csv:2-3)
DIM_BROWSER_COUNTRY_ROWS = [
    ("ru", "Russian Fed.", "2023-01-01", "2023-11-01"),
    ("ru", "Russian Federation", "2023-11-02", "2099-12-31"),
]
