"""Round-5 second-batch window operators: per-key running MIN/MAX,
inter-event gap statistics, and delta-from-first-value — each pinned by a
randomized differential test against DuckDB window functions (the same
template as tests/test_round5_ops.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus(seed, n=3000, keys=50):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "user_id": rng.integers(0, keys, n),
        "ts": pd.to_datetime("2020-01-01") + pd.to_timedelta(
            rng.integers(0, 3600 * 24, n), unit="s"),
        "value": rng.normal(size=n).round(3)})
    df.loc[rng.choice(n, n // 12, replace=False), "value"] = np.nan
    df.loc[rng.choice(n, n // 60, replace=False), "ts"] = pd.NaT
    dup = rng.choice(n - 1, n // 15, replace=False)
    df.loc[dup + 1, "ts"] = df.loc[dup, "ts"].values
    return df


class TestRunningMinMax:
    @pytest.mark.parametrize("seed", [3, 23])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import running_min_max
        df = _corpus(seed)
        got = running_min_max(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select event_id,
                   min(value) over (partition by user_id
                       order by ts, event_id
                       rows unbounded preceding) as running_min,
                   max(value) over (partition by user_id
                       order by ts, event_id
                       rows unbounded preceding) as running_max
            from events order by event_id""").df()
        m = got.merge(exp, on="event_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        for c in ("running_min", "running_max"):
            assert np.isclose(m[c + "_g"].to_numpy(),
                              m[c + "_e"].to_numpy(),
                              equal_nan=True).all()

    def test_null_carries_extremes(self, ray_session):
        import ray.data
        from engine.relational import running_min_max
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(pd.to_datetime(
                ["2020-01-01 00:00", "2020-01-01 00:01",
                 "2020-01-01 00:02", "2020-01-01 00:03"])),
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "value": pa.array([None, 4.0, None, 2.0], pa.float64())}))
        out = running_min_max(ds).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert np.isnan(out["running_min"].iloc[0])  # before first value
        assert out["running_min"].iloc[2] == 4.0     # NULL carries
        assert out["running_min"].iloc[3] == 2.0
        assert out["running_max"].iloc[3] == 4.0

    def test_null_keys_form_one_partition(self, ray_session):
        import ray.data
        from engine.relational import running_min_max
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(pd.to_datetime(
                ["2020-01-01", "2020-01-02", "2020-01-03"])),
            "user_id": pa.array([None, None, None], pa.int64()),
            "value": pa.array([5.0, 1.0, 3.0], pa.float64())}))
        out = running_min_max(ds).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["running_min"].tolist() == [5.0, 1.0, 1.0]
        assert out["running_max"].tolist() == [5.0, 5.0, 5.0]


class TestInterEventGapStats:
    @pytest.mark.parametrize("seed", [11, 41])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import interevent_gap_stats
        df = _corpus(seed)
        got = interevent_gap_stats(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with g as (
              select user_id,
                     epoch(ts - lag(ts) over (
                         partition by user_id order by ts, event_id))
                         as gap
              from events where ts is not null)
            select user_id, count(gap)::bigint as n_gaps,
                   avg(gap) as avg_gap_s, max(gap) as max_gap_s
            from g group by user_id order by user_id""").df()
        m = got.merge(exp, on="user_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["n_gaps_g"] == m["n_gaps_e"]).all()
        for c in ("avg_gap_s", "max_gap_s"):
            assert np.isclose(m[c + "_g"].to_numpy(),
                              m[c + "_e"].to_numpy(),
                              equal_nan=True).all()

    def test_single_event_key_reports_zero_gaps(self, ray_session):
        import ray.data
        from engine.relational import interevent_gap_stats
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(pd.to_datetime(
                ["2020-01-01 00:00", "2020-01-01 01:00",
                 "2020-01-01 00:30"])),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "value": pa.array([0.0, 0.0, 0.0], pa.float64())}))
        out = interevent_gap_stats(ds).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        assert out["n_gaps"].tolist() == [1, 0]
        assert out["avg_gap_s"].iloc[0] == 3600.0
        assert np.isnan(out["avg_gap_s"].iloc[1])
        assert np.isnan(out["max_gap_s"].iloc[1])


class TestDeltaFromFirst:
    @pytest.mark.parametrize("seed", [13, 47])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import delta_from_first
        df = _corpus(seed)
        got = delta_from_first(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select event_id,
                   value - first_value(value) over (
                       partition by user_id order by ts, event_id
                       rows unbounded preceding) as delta_from_first
            from events order by event_id""").df()
        m = got.merge(exp, on="event_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert np.isclose(m["delta_from_first_g"].to_numpy(),
                          m["delta_from_first_e"].to_numpy(),
                          equal_nan=True).all()

    def test_null_first_value_nulls_the_key(self, ray_session):
        import ray.data
        from engine.relational import delta_from_first
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(pd.to_datetime(
                ["2020-01-01 00:00", "2020-01-01 00:01"])),
            "user_id": pa.array([4, 4], pa.int64()),
            "value": pa.array([None, 9.0], pa.float64())}))
        out = delta_from_first(ds).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert np.isnan(out["delta_from_first"]).all()

    def test_null_keys_form_one_partition(self, ray_session):
        import ray.data
        from engine.relational import delta_from_first
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(pd.to_datetime(
                ["2020-01-01 00:00", "2020-01-01 00:01"])),
            "user_id": pa.array([None, None], pa.int64()),
            "value": pa.array([1.5, 4.0], pa.float64())}))
        out = delta_from_first(ds).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["delta_from_first"].tolist() == [0.0, 2.5]
