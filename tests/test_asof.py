import datetime as dt

from tdr_draft_metadata_validator_spark.pipeline.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u2", _ts(5)), (4, "u3", _ts(9))],
        "event_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(8), 1.0), ("u1", _ts(15), 2.0), ("u2", _ts(5), 9.0)],
        "user_id string, ts timestamp, value double",
    )
    out = {r["event_id"]: r["value_asof"] for r in
           asof_join(left, right).collect()}
    assert out[1] == 1.0        # latest right <= t10 is t8
    assert out[2] == 2.0        # latest right <= t20 is t15
    assert out[3] == 9.0        # equal timestamps are INCLUSIVE (<=)
    assert out[4] is None       # u3 has no right rows -> null


def test_asof_join_keeps_left_columns(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10), "x")],
        "event_id int, user_id string, ts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(1), 5.0)], "user_id string, ts timestamp, value double"
    )
    row = asof_join(left, right).collect()[0]
    assert row["payload"] == "x" and row["value_asof"] == 5.0
