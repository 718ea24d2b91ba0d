"""Property tests for the URL component codec (functions/ch.py
``url_encode_component`` / ``url_decode_component``) against Python's
urllib — an independent RFC-3986 implementation.

The docstrings claim CH ``encodeURLComponent`` semantics: keep
exactly the RFC-3986 unreserved set [A-Za-z0-9._~-], percent-encode
everything else as uppercase UTF-8 octets, never emit '+'.  Python's
``urllib.parse.quote(s, safe="")`` implements precisely that rule, so
it is the model.  Decoding is checked three ways: the round-trip
decode(encode(s)) == s, the fully-encoded form (every octet as %XX —
a different input class than encode emits), and lowercase hex digits
(%2f == %2F).
"""

from __future__ import annotations

import urllib.parse

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch

# printable-ish unicode incl. the three Java-fixup characters and
# multibyte UTF-8; exclude surrogates (hypothesis default)
_texts = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x2FFF
    ),
    max_size=20,
).map(lambda s: s)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_encode_matches_urllib_and_roundtrips(spark, texts):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i long, s string")
    rows = df.select(
        "i",
        "s",
        ch.url_encode_component("s").alias("enc"),
        ch.url_decode_component(ch.url_encode_component("s")).alias("rt"),
    ).collect()
    for r in rows:
        s = r["s"]
        want = urllib.parse.quote(s, safe="")
        assert r["enc"] == want, (s, r["enc"], want)
        assert r["rt"] == s, (s, r["rt"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_texts, min_size=1, max_size=8), st.booleans())
def test_decode_fully_encoded_and_case_insensitive_hex(spark, texts, lower):
    # every UTF-8 octet percent-encoded — including the characters
    # encode would keep bare; decode must accept this maximal form
    def full_enc(s: str) -> str:
        h = "".join(f"%{b:02X}" for b in s.encode("utf-8"))
        return h.lower() if lower else h

    df = spark.createDataFrame(
        [(i, full_enc(s)) for i, s in enumerate(texts)], "i long, e string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", ch.url_decode_component("e").alias("d")
        ).collect()
    }
    for i, s in enumerate(texts):
        assert got[i] == s, (s, full_enc(s), got[i])
