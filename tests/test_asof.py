"""as-of join operator: union-LOCF plan vs hand-computed expectations."""

import datetime as dt

from olympian_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    T = dt.datetime
    left = spark.createDataFrame(
        [
            ("a", T(2024, 1, 1, 0, 0, 10), 1),
            ("a", T(2024, 1, 1, 0, 1, 0), 2),
            ("a", T(2024, 1, 1, 0, 5, 0), 3),
            ("b", T(2024, 1, 1, 0, 0, 5), 4),   # no prior right row
        ],
        "k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            ("a", T(2024, 1, 1, 0, 0, 10), 100.0),  # simultaneous: visible (<=)
            ("a", T(2024, 1, 1, 0, 2, 0), 200.0),
            ("b", T(2024, 1, 1, 0, 0, 30), 300.0),  # after left row: invisible
        ],
        "k string, ts timestamp, v double",
    )
    out = {
        r.lid: r.v_asof
        for r in asof_join(left, right, key="k", payload_cols=["v"]).collect()
    }
    assert out == {1: 100.0, 2: 100.0, 3: 200.0, 4: None}


def test_asof_tolerance(spark):
    from pyspark.sql import functions as F

    from olympian_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 100.0), ("k", 200.0), ("k", 5000.0)], "key STRING, t DOUBLE"
    )
    right = spark.createDataFrame(
        [("k", 90.0, 7), ("k", 199.0, 8)], "key STRING, t DOUBLE, v INT"
    )
    out = {
        r["t"]: r["v_asof"]
        for r in asof_join(
            left, right, key="key", left_ts="t", right_ts="t",
            payload_cols=["v"], tolerance_s=50.0,
        ).collect()
    }
    assert out[100.0] == 7       # delta 10 <= 50
    assert out[200.0] == 8       # delta 1
    assert out[5000.0] is None   # match exists (199) but stale
    # without tolerance the stale match comes through
    out2 = {
        r["t"]: r["v_asof"]
        for r in asof_join(
            left, right, key="key", left_ts="t", right_ts="t", payload_cols=["v"]
        ).collect()
    }
    assert out2[5000.0] == 8
