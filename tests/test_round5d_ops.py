"""Round-5 fourth batch: per-group histogram, per-key min-max scaling,
and per-key activity-span profiles — randomized differentials vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(seed, n=3000, keys=60):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "user_id": rng.integers(0, keys, n),
        "event_type": rng.choice(["click", "view", "purchase", None], n,
                                 p=[0.4, 0.3, 0.2, 0.1]),
        "ts": pd.to_datetime("2020-01-01") + pd.to_timedelta(
            rng.integers(0, 3600 * 24 * 14, n), unit="s"),
        "value": rng.uniform(-10, 110, n).round(3)})
    df.loc[rng.choice(n, n // 10, replace=False), "value"] = np.nan
    df.loc[rng.choice(n, n // 30, replace=False), "ts"] = pd.NaT
    return df


class TestGroupedHistogram:
    @pytest.mark.parametrize("seed", [9, 37])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import grouped_histogram
        df = _events(seed)
        got = grouped_histogram(
            ray.data.from_pandas(df), group_col="event_type",
            col="value", lo=0.0, hi=100.0, bins=10).to_pandas() \
            .sort_values(["event_type", "bin"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select event_type,
                   least(floor((value - 0.0) * 10 / 100.0),
                         9)::bigint as bin,
                   count(*)::bigint as n
            from events
            where value >= 0.0 and value <= 100.0
              and event_type is not null
            group by event_type, bin
            order by event_type, bin""").df()
        assert got["event_type"].tolist() == exp["event_type"].tolist()
        assert got["bin"].tolist() == exp["bin"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()

    def test_all_filtered_typed_empty(self, ray_session):
        import ray.data
        from engine.stats import grouped_histogram
        ds = ray.data.from_arrow(pa.table({
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([None, None], pa.float64())}))
        out = grouped_histogram(ds, group_col="event_type", col="value",
                                lo=0.0, hi=1.0, bins=4)
        schema = out.schema().base_schema
        assert out.count() == 0
        assert schema.field("event_type").type == pa.string()
        assert schema.field("bin").type == pa.int64()


class TestGroupedMinmaxScale:
    @pytest.mark.parametrize("seed", [15, 59])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import grouped_minmax_scale
        df = _events(seed)
        got = grouped_minmax_scale(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select event_id,
                   case when max(value) over (partition by user_id)
                             > min(value) over (partition by user_id)
                        then (value - min(value) over (
                                 partition by user_id))
                             / (max(value) over (partition by user_id)
                                - min(value) over (
                                    partition by user_id))
                   end as scaled
            from events where value is not null
            order by event_id""").df()
        m = got.merge(exp, on="event_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert np.isclose(m["scaled_g"].to_numpy(),
                          m["scaled_e"].to_numpy(),
                          equal_nan=True).all()

    def test_constant_key_reports_null(self, ray_session):
        import ray.data
        from engine.relational import grouped_minmax_scale
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, 1], pa.int64()),
            "value": pa.array([3.0, 3.0], pa.float64())}))
        out = grouped_minmax_scale(ds).to_pandas()
        assert np.isnan(out["scaled"]).all()


class TestUserActivitySpan:
    @pytest.mark.parametrize("seed", [21, 73])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import user_activity_span
        df = _events(seed)
        got = user_activity_span(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select user_id, count(*)::bigint as n_events,
                   count(distinct date_trunc('day', ts))::bigint
                       as n_active_days,
                   min(ts) as first_ts, max(ts) as last_ts
            from events where ts is not null
            group by user_id order by user_id""").df()
        m = got.merge(exp, on="user_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        for c in ("n_events", "n_active_days", "first_ts", "last_ts"):
            assert (m[c + "_g"] == m[c + "_e"]).all()

    def test_cross_batch_day_merge(self, ray_session):
        import ray.data
        from engine.relational import user_activity_span
        # same (user, day) split across batches must count ONE day
        df = pd.DataFrame({
            "user_id": np.array([1] * 40, dtype=np.int64),
            "ts": pd.to_datetime("2021-06-01 12:00")
            + pd.to_timedelta(np.arange(40) % 3, unit="h")})
        got = user_activity_span(
            ray.data.from_pandas(df), batch_size=4).to_pandas()
        assert len(got) == 1
        assert got["n_events"].iloc[0] == 40
        assert got["n_active_days"].iloc[0] == 1


class TestQ6ForecastRevenue:
    def test_differential_vs_duckdb(self, ray_session):
        import ray.data
        from engine.relational import q6_forecast_revenue
        rng = np.random.default_rng(31)
        n = 5000
        df = pd.DataFrame({
            "l_shipdate": pd.to_datetime("1995-06-01") + pd.to_timedelta(
                rng.integers(0, 3 * 365, n), unit="D"),
            "l_discount": rng.choice(
                [0.0, 0.04, 0.05, 0.06, 0.07, 0.08], n),
            "l_quantity": rng.integers(1, 50, n).astype(np.float64),
            "l_extendedprice": rng.uniform(100, 9000, n).round(2)})
        got = q6_forecast_revenue(ray.data.from_pandas(df)).to_pandas()
        con = duckdb.connect()
        con.register("lineitem", df)
        exp = con.execute("""
            select sum(l_extendedprice * l_discount) as revenue,
                   count(*)::bigint as n_items
            from lineitem
            where l_shipdate >= timestamp '1996-01-01'
              and l_shipdate < timestamp '1997-01-01'
              and l_discount >= 0.05 and l_discount <= 0.07
              and l_quantity < 24""").df()
        assert got["n_items"].iloc[0] == exp["n_items"].iloc[0] > 0
        assert np.isclose(got["revenue"].iloc[0], exp["revenue"].iloc[0])

    def test_empty_selection_reports_sql_null(self, ray_session):
        import ray.data
        from engine.relational import q6_forecast_revenue
        df = pd.DataFrame({
            "l_shipdate": pd.to_datetime(["1990-01-01"]),
            "l_discount": [0.06], "l_quantity": [5.0],
            "l_extendedprice": [100.0]})
        got = q6_forecast_revenue(ray.data.from_pandas(df)).to_pandas()
        assert got["n_items"].iloc[0] == 0
        assert np.isnan(got["revenue"].iloc[0])


class TestEventTypeCooccurrence:
    @pytest.mark.parametrize("seed", [27, 83])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import event_type_cooccurrence
        df = _events(seed)
        # small batches force cross-batch distinct merging per key
        got = event_type_cooccurrence(
            ray.data.from_pandas(df), batch_size=64).to_pandas() \
            .sort_values(["type_a", "type_b"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with dt as (
              select distinct user_id, event_type
              from events
              where user_id is not null and event_type is not null)
            select a.event_type as type_a, b.event_type as type_b,
                   count(*)::bigint as n_keys
            from dt a join dt b
              on a.user_id = b.user_id
             and a.event_type < b.event_type
            group by type_a, type_b order by type_a, type_b""").df()
        assert got["type_a"].tolist() == exp["type_a"].tolist()
        assert got["type_b"].tolist() == exp["type_b"].tolist()
        assert got["n_keys"].tolist() == exp["n_keys"].tolist()

    def test_no_pairs_typed_empty(self, ray_session):
        import ray.data
        from engine.relational import event_type_cooccurrence
        ds = ray.data.from_arrow(pa.table({
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string())}))
        out = event_type_cooccurrence(ds)
        assert out.count() == 0
        assert out.schema().base_schema.field("type_a").type \
            == pa.string()


class TestCollectDistinctSorted:
    @pytest.mark.parametrize("seed", [33, 89])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import collect_distinct_sorted
        df = _events(seed)
        got = collect_distinct_sorted(
            ray.data.from_pandas(df), batch_size=64).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select user_id,
                   string_agg(distinct event_type, ','
                              order by event_type) as vals,
                   count(distinct event_type)::bigint as n_distinct
            from events
            where user_id is not null and event_type is not null
            group by user_id order by user_id""").df()
        m = got.merge(exp, on="user_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["vals_g"] == m["vals_e"]).all()
        assert (m["n_distinct_g"] == m["n_distinct_e"]).all()


class TestMutualInformation:
    @pytest.mark.parametrize("seed", [39, 97])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import mutual_information
        df = _events(seed)
        got = mutual_information(
            ray.data.from_pandas(df), a_col="event_type", b_col="value",
            lo=0.0, hi=100.0, bins=8).to_pandas()
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with c as (
              select event_type as a,
                     least(floor((value - 0.0) * 8 / 100.0),
                           7)::bigint as b,
                     count(*)::double as n
              from events
              where value >= 0.0 and value <= 100.0
                and event_type is not null
              group by a, b),
            tot as (select sum(n) as t from c),
            ma as (select a, sum(n) as na from c group by a),
            mb as (select b, sum(n) as nb from c group by b)
            select sum((n / t.t) * ln((n * t.t) / (na * nb))) as mi,
                   sum(n)::bigint as n
            from c join ma using (a) join mb using (b), tot t""").df()
        assert got["n"].iloc[0] == exp["n"].iloc[0] > 0
        assert np.isclose(got["mi"].iloc[0], exp["mi"].iloc[0])
        assert got["mi"].iloc[0] >= -1e-12  # MI is non-negative

    def test_all_filtered_reports_null(self, ray_session):
        import ray.data
        from engine.stats import mutual_information
        ds = ray.data.from_arrow(pa.table({
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([None, None], pa.float64())}))
        got = mutual_information(ds, a_col="event_type", b_col="value",
                                 lo=0.0, hi=1.0, bins=4).to_pandas()
        assert len(got) == 1
        assert got["n"].iloc[0] == 0
        assert pd.isna(got["mi"].iloc[0])

    def test_independent_columns_near_zero(self, ray_session):
        import ray.data
        from engine.stats import mutual_information
        rng = np.random.default_rng(0)
        n = 20000
        df = pd.DataFrame({"event_type": rng.choice(["x", "y"], n),
                           "value": rng.uniform(0, 1, n)})
        got = mutual_information(
            ray.data.from_pandas(df), a_col="event_type", b_col="value",
            lo=0.0, hi=1.0, bins=4).to_pandas()
        assert got["mi"].iloc[0] < 0.001


class TestGroupedGini:
    @pytest.mark.parametrize("seed", [45, 101])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import grouped_gini
        df = _events(seed)
        got = grouped_gini(
            ray.data.from_pandas(df), group_col="event_type",
            value_col="value").to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with r as (
              select event_type, value,
                     row_number() over (partition by event_type
                                        order by value) as rn,
                     count(*) over (partition by event_type) as n,
                     sum(value) over (partition by event_type) as s
              from events
              where value is not null and event_type is not null)
            select event_type,
                   case when any_value(s) != 0 then
                       sum((2.0 * rn - n - 1) * value)
                       / (any_value(n) * any_value(s))
                   end as gini,
                   any_value(n)::bigint as n
            from r group by event_type order by event_type""").df()
        m = got.merge(exp, on="event_type", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["n_g"] == m["n_e"]).all()
        assert np.isclose(m["gini_g"].to_numpy(),
                          m["gini_e"].to_numpy(), equal_nan=True).all()

    def test_known_values(self, ray_session):
        import ray.data
        from engine.stats import grouped_gini
        ds = ray.data.from_arrow(pa.table({
            "g": pa.array(["e", "e", "e", "z", "z"], pa.string()),
            "v": pa.array([1.0, 1.0, 1.0, 0.0, 10.0], pa.float64())}))
        out = grouped_gini(ds, group_col="g", value_col="v") \
            .to_pandas().sort_values("g").reset_index(drop=True)
        assert np.isclose(out["gini"].iloc[0], 0.0)  # perfectly equal
        assert np.isclose(out["gini"].iloc[1], 0.5)  # one holds all

    def test_zero_sum_reports_null(self, ray_session):
        import ray.data
        from engine.stats import grouped_gini
        ds = ray.data.from_arrow(pa.table({
            "g": pa.array(["a", "a"], pa.string()),
            "v": pa.array([-1.0, 1.0], pa.float64())}))
        out = grouped_gini(ds, group_col="g", value_col="v").to_pandas()
        assert np.isnan(out["gini"].iloc[0])


class TestGroupedIqrOutliers:
    @pytest.mark.parametrize("seed", [49, 103])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import grouped_iqr_outliers
        df = _events(seed)
        # heavy tail so fences actually trigger
        rng = np.random.default_rng(seed + 1)
        df.loc[rng.choice(len(df), 30, replace=False), "value"] = 5000.0
        got = grouped_iqr_outliers(
            ray.data.from_pandas(df), group_col="event_type",
            value_col="value", id_col="event_id").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with f as (
              select event_type,
                     quantile_cont(value, 0.25) as q1,
                     quantile_cont(value, 0.75) as q3
              from events
              where value is not null and event_type is not null
              group by event_type)
            select e.event_id, e.event_type, e.value
            from events e join f using (event_type)
            where e.value is not null
              and (e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                   or e.value > f.q3 + 1.5 * (f.q3 - f.q1))
            order by e.event_id""").df()
        assert len(got) == len(exp) > 0
        assert got["event_id"].tolist() == exp["event_id"].tolist()
        assert np.isclose(got["value"].to_numpy(),
                          exp["value"].to_numpy()).all()


class TestSpearmanCorr:
    @pytest.mark.parametrize("seed", [57, 107])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import spearman_corr
        rng = np.random.default_rng(seed)
        n = 4000
        x = rng.integers(0, 40, n).astype(np.float64)  # heavy ties
        y = x * 2 + rng.normal(0, 20, n).round(1)      # correlated
        df = pd.DataFrame({"x": x, "y": y})
        df.loc[rng.choice(n, n // 10, replace=False), "x"] = np.nan
        df.loc[rng.choice(n, n // 10, replace=False), "y"] = np.nan
        got = spearman_corr(ray.data.from_pandas(df), x_col="x",
                            y_col="y").to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute("""
            with d as (select x, y from t
                       where x is not null and y is not null),
            r as (select (rank() over (order by x)
                          + (count(*) over (partition by x) - 1) / 2.0)
                             as rx,
                         (rank() over (order by y)
                          + (count(*) over (partition by y) - 1) / 2.0)
                             as ry
                  from d)
            select corr(rx, ry) as r, count(*)::bigint as n
            from r""").df()
        assert got["n"].iloc[0] == exp["n"].iloc[0] > 0
        assert np.isclose(got["spearman_r"].iloc[0], exp["r"].iloc[0])

    def test_monotone_is_one(self, ray_session):
        import ray.data
        from engine.stats import spearman_corr
        df = pd.DataFrame({"x": np.arange(100, dtype=np.float64),
                           "y": np.exp(np.arange(100) / 10.0)})
        got = spearman_corr(ray.data.from_pandas(df), x_col="x",
                            y_col="y").to_pandas()
        assert np.isclose(got["spearman_r"].iloc[0], 1.0)

    def test_constant_side_reports_null(self, ray_session):
        import ray.data
        from engine.stats import spearman_corr
        df = pd.DataFrame({"x": [1.0, 1.0, 1.0],
                           "y": [1.0, 2.0, 3.0]})
        got = spearman_corr(ray.data.from_pandas(df), x_col="x",
                            y_col="y").to_pandas()
        assert got["n"].iloc[0] == 3
        assert pd.isna(got["spearman_r"].iloc[0])

    def test_all_null_pairwise(self, ray_session):
        import ray.data
        from engine.stats import spearman_corr
        df = pd.DataFrame({"x": [np.nan, 1.0], "y": [1.0, np.nan]})
        got = spearman_corr(ray.data.from_pandas(df), x_col="x",
                            y_col="y").to_pandas()
        assert got["n"].iloc[0] == 0
        assert pd.isna(got["spearman_r"].iloc[0])


class TestCorrMatrix:
    @pytest.mark.parametrize("seed", [63, 109])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import corr_matrix
        rng = np.random.default_rng(seed)
        n = 3000
        a = rng.normal(size=n)
        df = pd.DataFrame({"a": a, "b": a * 0.5 + rng.normal(size=n),
                           "c": rng.normal(size=n)})
        df.loc[rng.choice(n, n // 8, replace=False), "a"] = np.nan
        df.loc[rng.choice(n, n // 8, replace=False), "b"] = np.nan
        got = corr_matrix(ray.data.from_pandas(df),
                          cols=["a", "b", "c"]).to_pandas() \
            .sort_values(["col_x", "col_y"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute("""
            select 'a' as col_x, 'b' as col_y, corr(a, b) as r,
                   count(*) filter (a is not null and b is not null) as n
            from t
            union all select 'a', 'c', corr(a, c),
                   count(*) filter (a is not null and c is not null)
            from t
            union all select 'b', 'c', corr(b, c),
                   count(*) filter (b is not null and c is not null)
            from t order by col_x, col_y""").df()
        assert got["col_x"].tolist() == exp["col_x"].tolist()
        assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
        assert np.isclose(got["r"].to_numpy(), exp["r"].to_numpy(),
                          equal_nan=True).all()

    def test_constant_column_null_r(self, ray_session):
        import ray.data
        from engine.stats import corr_matrix
        df = pd.DataFrame({"a": [1.0, 1.0, 1.0], "b": [1.0, 2.0, 3.0]})
        got = corr_matrix(ray.data.from_pandas(df),
                          cols=["a", "b"]).to_pandas()
        assert pd.isna(got["r"].iloc[0])
        assert got["n"].iloc[0] == 3


class TestDenseDailyCounts:
    @pytest.mark.parametrize("seed", [69])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import dense_daily_counts
        df = _events(seed)
        got = dense_daily_counts(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("day").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with c as (select date_trunc('day', ts) as day,
                              count(*)::bigint as n
                       from events where ts is not null group by day),
            b as (select min(day) as lo, max(day) as hi from c),
            cal as (select unnest(generate_series(lo, hi,
                                                  interval 1 day)) as day
                    from b)
            select cal.day, coalesce(c.n, 0)::bigint as n
            from cal left join c using (day) order by day""").df()
        assert len(got) == len(exp)
        assert (got["day"].to_numpy() == exp["day"].to_numpy()).all()
        assert got["n"].tolist() == exp["n"].tolist()

    def test_gap_days_are_zero(self, ray_session):
        import ray.data
        from engine.relational import dense_daily_counts
        df = pd.DataFrame({"ts": pd.to_datetime(
            ["2021-01-01 10:00", "2021-01-04 09:00",
             "2021-01-04 11:00"])})
        got = dense_daily_counts(ray.data.from_pandas(df)).to_pandas() \
            .sort_values("day").reset_index(drop=True)
        assert len(got) == 4
        assert got["n"].tolist() == [1, 0, 0, 2]

    def test_empty_input_typed(self, ray_session):
        import ray.data
        from engine.relational import dense_daily_counts
        df = pd.DataFrame({"ts": pd.to_datetime([pd.NaT])})
        out = dense_daily_counts(ray.data.from_pandas(df))
        assert out.count() == 0
        assert out.schema().base_schema.field("n").type == pa.int64()


class TestSessionDurationStats:
    @pytest.mark.parametrize("seed", [75, 113])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import session_duration_stats
        df = _events(seed)
        got = session_duration_stats(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with e as (select user_id, ts from events
                       where ts is not null and user_id is not null),
            m as (select user_id, ts,
                         case when lag(ts) over w is null
                                   or ts - lag(ts) over w
                                      > interval 30 minutes
                              then 1 else 0 end as new_s
                  from e window w as (partition by user_id order by ts)),
            s as (select user_id, ts,
                         sum(new_s) over (partition by user_id
                             order by ts rows unbounded preceding)
                             as sid
                  from m),
            d as (select user_id, sid, epoch(max(ts) - min(ts)) as dur
                  from s group by user_id, sid)
            select user_id, count(*)::bigint as n_sessions,
                   avg(dur) as avg_session_s, max(dur) as max_session_s
            from d group by user_id order by user_id""").df()
        m = got.merge(exp, on="user_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["n_sessions_g"] == m["n_sessions_e"]).all()
        for c in ("avg_session_s", "max_session_s"):
            assert np.isclose(m[c + "_g"].to_numpy(),
                              m[c + "_e"].to_numpy(),
                              equal_nan=True).all()

    def test_single_event_sessions_last_zero(self, ray_session):
        import ray.data
        from engine.relational import session_duration_stats
        df = pd.DataFrame({
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime(["2021-01-01 00:00",
                                  "2021-01-01 02:00",
                                  "2021-01-01 00:00"])})
        got = session_duration_stats(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        assert got["n_sessions"].tolist() == [2, 1]
        assert got["avg_session_s"].tolist() == [0.0, 0.0]
