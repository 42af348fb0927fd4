"""As-of join and bucketized range join (temporal.py)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from information_retrieval_system_spark.temporal import asof_join, range_join_buckets


def _ts(m, s=0):
    return datetime(2024, 1, 1, 12, m, s, tzinfo=timezone.utc)


def _fixtures(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(0), 7),    # before any status -> NULL
            (2, _ts(5), 7),    # exactly at the 12:05 change -> sees it
            (3, _ts(9), 7),    # between changes -> 12:05 state
            (4, _ts(20), 7),   # after the 12:10 change
            (5, _ts(20), 8),   # other key, no status rows at all
        ],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(7, _ts(5), 50), (7, _ts(10), 60)],
        "user_id long, ts timestamp, status long",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _fixtures(spark)
    out = {r.event_id: r.status for r in
           asof_join(left, right, on="user_id", value_cols=["status"]).collect()}
    assert out == {1: None, 2: 50, 3: 50, 4: 60, 5: None}


def test_asof_tolerance(spark):
    left, right = _fixtures(spark)
    out = {r.event_id: r.status for r in
           asof_join(left, right, on="user_id", value_cols=["status"],
                     tolerance_sec=360).collect()}
    # event 4 at 12:20 is 600 s after the 12:10 change -> outside 360 s
    assert out == {1: None, 2: 50, 3: 50, 4: None, 5: None}


def test_asof_no_join_node(spark):
    """The union+window shape must plan WITHOUT any join operator —
    that's the point (one shuffle, nothing to skew-split)."""
    left, right = _fixtures(spark)
    plan = (asof_join(left, right, on="user_id", value_cols=["status"])
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "Join" not in plan


def test_range_join_buckets_edges_and_overlap(spark):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 29.99), (3, 30.0), (4, 44.0), (5, 45.0), (6, 100.0)],
        "fid long, v double",
    )
    iv = spark.createDataFrame(
        [(0, 0.0, 45.0), (1, 30.0, 75.0)], "label long, lo double, hi double"
    )
    out = sorted((r.fid, r.label) for r in
                 range_join_buckets(facts, iv, "v", width=10.0).collect())
    # [0,45): fids 1-4; [30,75): fids 3,4,5 (45.0 excluded from [0,45))
    assert out == [(1, 0), (2, 0), (3, 0), (3, 1), (4, 0), (4, 1), (5, 1)]


def test_range_join_is_hash_join(spark):
    facts = spark.createDataFrame([(i, float(i)) for i in range(50)], "fid long, v double")
    iv = spark.createDataFrame([(0, 0.0, 25.0), (1, 20.0, 50.0)],
                               "label long, lo double, hi double")
    plan = (range_join_buckets(facts, iv, "v", width=5.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against pandas merge_asof (backward, by-key) on a
    deterministic many-key fixture including same-timestamp ties."""
    import pandas as pd

    lrows, rrows = [], []
    for i in range(400):
        u = i % 7
        lrows.append((i, pd.Timestamp("2024-01-01", tz="UTC")
                      + pd.Timedelta(seconds=(i * 37) % 5000), u))
        if i % 3 == 0:
            rrows.append((u, pd.Timestamp("2024-01-01", tz="UTC")
                          + pd.Timedelta(seconds=(i * 53) % 5000), i))
    lpd = pd.DataFrame(lrows, columns=["event_id", "ts", "user_id"])
    rpd = (pd.DataFrame(rrows, columns=["user_id", "ts", "status"])
           .sort_values(["ts", "status"])
           .drop_duplicates(["user_id", "ts"], keep="last"))
    expected = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
    ).set_index("event_id")["status"].to_dict()

    left = spark.createDataFrame(lpd, "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(rpd, "user_id long, ts timestamp, status long")
    got = {r.event_id: r.status for r in
           asof_join(left, right, on="user_id", value_cols=["status"]).collect()}
    import math
    norm = {k: (None if (isinstance(v, float) and math.isnan(v)) else int(v))
            for k, v in expected.items()}
    assert got == norm


def test_asof_null_right_value_not_skipped(spark):
    """A newer right row with a NULL value must WIN the as-of match
    (yielding NULL), never leak an older stale value — and tolerance
    must measure against the MATCHED row's timestamp."""
    left = spark.createDataFrame(
        [(1, _ts(30), 7)], "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(
        [(7, _ts(0), 5), (7, _ts(29), None)],
        "user_id long, ts timestamp, status long")
    out = asof_join(left, right, on="user_id", value_cols=["status"]).collect()
    assert out[0].status is None  # matched the t=29 row, whose value is NULL
    out2 = asof_join(left, right, on="user_id", value_cols=["status"],
                     tolerance_sec=120).collect()
    assert out2[0].status is None  # never 5: t=0 is not the matched row


def test_latest_file_version_picks_max_per_key(spark):
    from information_retrieval_system_spark.sources.corpus import latest_file_version

    rows = [
        ("r1", "a.py", 1, "v1"),
        ("r1", "a.py", 3, "v3"),
        ("r1", "a.py", 2, "v2"),
        ("r1", "b.py", 7, "only"),
        ("r2", "a.py", 5, "other-repo"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, version long, content string")
    got = {(r.repo, r.path): (r.version, r.content)
           for r in latest_file_version(df, version_col="version").collect()}
    assert got == {
        ("r1", "a.py"): (3, "v3"),
        ("r1", "b.py"): (7, "only"),
        ("r2", "a.py"): (5, "other-repo"),
    }
