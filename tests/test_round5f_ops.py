"""Round-5 sixth batch: multi-key profile aggregate, vocabulary stats,
and Jaccard query search — randomized differentials vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "iota", "kappa"]


def _docs(seed, n=400):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, rng.integers(0, 25)))
             if rng.random() > 0.05 else None for _ in range(n)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "source": rng.choice(["s0", "s1", "s2", None], n,
                             p=[0.4, 0.3, 0.2, 0.1]),
        "lang": rng.choice(["en", "de", None], n, p=[0.6, 0.3, 0.1]),
        "n_chars": np.array([len(t) if t else 0 for t in texts],
                            dtype=np.int64)})


class TestGroupedCountMean:
    @pytest.mark.parametrize("seed", [33, 133])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import grouped_count_mean
        df = _docs(seed)
        got = grouped_count_mean(
            ray.data.from_pandas(df), group_cols=["source", "lang"],
            value_col="n_chars").to_pandas() \
            .sort_values(["source", "lang"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute("""
            select source, lang, count(*)::bigint as n,
                   avg(n_chars) as mean
            from documents
            where source is not null and lang is not null
              and n_chars is not null
            group by source, lang order by source, lang""").df()
        assert got["source"].tolist() == exp["source"].tolist()
        assert got["lang"].tolist() == exp["lang"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()
        assert np.isclose(got["mean"].to_numpy(),
                          exp["mean"].to_numpy()).all()

    def test_all_filtered_typed_empty(self, ray_session):
        import ray.data
        from engine.stats import grouped_count_mean
        df = pd.DataFrame({"source": ["a"], "lang": [None],
                           "n_chars": [3]})
        out = grouped_count_mean(
            ray.data.from_pandas(df), group_cols=["source", "lang"],
            value_col="n_chars")
        assert out.count() == 0
        assert out.schema().base_schema.field("n").type == pa.int64()


class TestVocabularyStats:
    @pytest.mark.parametrize("seed", [41, 137])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.textstats import vocabulary_stats
        rng = np.random.default_rng(seed)
        # a long-tail corpus with real hapaxes: common words + uniques
        texts = []
        for i in range(300):
            words = list(rng.choice(VOCAB, rng.integers(0, 10)))
            if rng.random() < 0.3:
                words.append(f"unique{i}")
            texts.append(" ".join(words) if words else None)
        df = pd.DataFrame({"text": texts})
        got = vocabulary_stats(
            ray.data.from_pandas(df), batch_size=32).to_pandas()
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
            with tok as (
              select unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) as t
              from documents),
            c as (select t, count(*)::bigint as n from tok group by t)
            select count(*)::bigint as vocab_size,
                   coalesce(count(*) filter (n = 1), 0)::bigint
                       as hapax_count,
                   coalesce(sum(n), 0)::bigint as total_tokens
            from c""").df()
        for c in ("vocab_size", "hapax_count", "total_tokens"):
            assert got[c].iloc[0] == exp[c].iloc[0]
        assert got["hapax_count"].iloc[0] > 0

    def test_empty_corpus(self, ray_session):
        import ray.data
        from engine.textstats import vocabulary_stats
        df = pd.DataFrame({"text": [None, ""]})
        got = vocabulary_stats(ray.data.from_pandas(df)).to_pandas()
        assert got["vocab_size"].iloc[0] == 0
        assert got["total_tokens"].iloc[0] == 0


class TestJaccardToQuery:
    @pytest.mark.parametrize("seed", [47, 139])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.textstats import jaccard_to_query
        df = _docs(seed)
        qrow = df.loc[df["doc_id"] == 0, "text"].iloc[0]
        qtoks = (qrow or "").split()
        got = jaccard_to_query(
            ray.data.from_pandas(df[["doc_id", "text"]]),
            query_tokens=qtoks, k=10).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
            with q as (
              select list_distinct(regexp_extract_all(
                  coalesce(text, ''), '\S+')) as qs
              from documents where doc_id = 0),
            d as (
              select doc_id, list_distinct(regexp_extract_all(
                  coalesce(text, ''), '\S+')) as ts
              from documents)
            select d.doc_id,
                   len(list_intersect(d.ts, q.qs))::double
                   / nullif(len(list_distinct(d.ts || q.qs)), 0)
                       as jaccard
            from d, q
            order by jaccard desc nulls last, doc_id
            limit 10""").df()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert np.isclose(got["jaccard"].to_numpy(),
                          exp["jaccard"].to_numpy(),
                          equal_nan=True).all()

    def test_identity_and_empty(self, ray_session):
        import ray.data
        from engine.textstats import jaccard_to_query
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "a b", ""], pa.string())}))
        got = jaccard_to_query(ds, query_tokens=["a", "b", "c"], k=3) \
            .to_pandas().reset_index(drop=True)
        assert got["doc_id"].tolist() == [1, 2, 3]
        assert np.isclose(got["jaccard"].iloc[0], 1.0)
        assert np.isclose(got["jaccard"].iloc[1], 2 / 3)
        assert got["jaccard"].iloc[2] == 0.0


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


class TestEmbeddingCovariance:
    @pytest.mark.parametrize("seed", [53, 141])
    def test_differential_vs_numpy(self, seed, ray_session):
        import ray.data
        from engine.similarity import embedding_covariance
        rng = np.random.default_rng(seed)
        n, d = 500, 6
        x = rng.normal(size=(n, d))
        tbl = pa.table({"embedding": pa.array(
            [row.tolist() for row in x],
            pa.list_(pa.float32()))})
        got = embedding_covariance(
            ray.data.from_arrow(tbl), dim=d, batch_size=64) \
            .to_pandas().sort_values(["i", "j"]).reset_index(drop=True)
        exp = np.cov(x.astype(np.float32).astype(np.float64),
                     rowvar=False, ddof=1)
        iu, ju = np.triu_indices(d)
        assert got["i"].tolist() == iu.tolist()
        assert got["j"].tolist() == ju.tolist()
        assert (got["n"] == n).all()
        assert np.allclose(got["cov"].to_numpy(), exp[iu, ju],
                           atol=1e-9)

    def test_single_row_reports_null(self, ray_session):
        import ray.data
        from engine.similarity import embedding_covariance
        tbl = pa.table({"embedding": pa.array([[1.0, 2.0]],
                                              pa.list_(pa.float32()))})
        got = embedding_covariance(ray.data.from_arrow(tbl),
                                   dim=2).to_pandas()
        assert pd.isna(got["cov"]).all()
        assert (got["n"] == 1).all()


class TestEventTransitionMatrix:
    @pytest.mark.parametrize("seed", [59, 149])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import event_transition_matrix
        df = _events(seed)
        got = event_transition_matrix(ray.data.from_pandas(df)) \
            .to_pandas().sort_values(["from_type", "to_type"]) \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with s as (
              select user_id, event_type,
                     lead(event_type) over (
                         partition by user_id
                         order by ts, event_id) as nxt
              from events
              where ts is not null and user_id is not null
                and event_type is not null)
            select event_type as from_type, nxt as to_type,
                   count(*)::bigint as n
            from s where nxt is not null
            group by from_type, to_type
            order by from_type, to_type""").df()
        assert got["from_type"].tolist() == exp["from_type"].tolist()
        assert got["to_type"].tolist() == exp["to_type"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()

    def test_total_transitions_invariant(self, ray_session):
        import ray.data
        from engine.relational import event_transition_matrix
        df = _events(11)
        sub = df[df["ts"].notna() & df["event_type"].notna()]
        expected = sum(max(0, c - 1)
                       for c in sub.groupby("user_id").size())
        got = event_transition_matrix(ray.data.from_pandas(df)) \
            .to_pandas()
        assert int(got["n"].sum()) == expected


class TestTimeToFirstTarget:
    @pytest.mark.parametrize("seed", [61, 151])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import time_to_first_target
        df = _events(seed)
        got = time_to_first_target(
            ray.data.from_pandas(df), target="purchase",
            batch_size=64).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with f as (
              select user_id, min(ts) as first_ts from events
              where ts is not null and user_id is not null
              group by user_id),
            p as (
              select user_id, min(ts) as first_purchase from events
              where ts is not null and user_id is not null
                and event_type = 'purchase'
              group by user_id)
            select f.user_id,
                   epoch(p.first_purchase - f.first_ts)
                       as seconds_to_target
            from f left join p using (user_id)
            order by user_id""").df()
        m = got.merge(exp, on="user_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert np.isclose(m["seconds_to_target_g"].to_numpy(),
                          m["seconds_to_target_e"].to_numpy(),
                          equal_nan=True).all()

    def test_never_converting_key_is_null(self, ray_session):
        import ray.data
        from engine.relational import time_to_first_target
        df = pd.DataFrame({
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime(["2021-01-01 00:00",
                                  "2021-01-01 01:00",
                                  "2021-01-01 00:00"]),
            "event_type": ["click", "purchase", "click"]})
        got = time_to_first_target(
            ray.data.from_pandas(df), target="purchase").to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        assert got["seconds_to_target"].iloc[0] == 3600.0
        assert np.isnan(got["seconds_to_target"].iloc[1])


class TestDailyActiveUsers:
    @pytest.mark.parametrize("seed", [67, 157])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import daily_active_users
        df = _events(seed)
        got = daily_active_users(
            ray.data.from_pandas(df), batch_size=64).to_pandas() \
            .sort_values("day").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select strftime(ts, '%Y-%m-%d') as day,
                   count(distinct user_id)::bigint as dau
            from events
            where ts is not null and user_id is not null
            group by day order by day""").df()
        assert got["day"].tolist() == exp["day"].tolist()
        assert got["dau"].tolist() == exp["dau"].tolist()


class TestPeakHourlyRate:
    @pytest.mark.parametrize("seed", [71, 163])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import peak_hourly_rate
        df = _events(seed)
        got = peak_hourly_rate(
            ray.data.from_pandas(df), batch_size=64).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            with c as (
              select user_id, date_trunc('hour', ts) as h,
                     count(*)::bigint as n
              from events
              where ts is not null and user_id is not null
              group by user_id, h)
            select user_id, max(n)::bigint as peak_events_per_hour
            from c group by user_id order by user_id""").df()
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["peak_events_per_hour"].tolist() \
            == exp["peak_events_per_hour"].tolist()


class TestOrdersPerCustomerHistogram:
    def test_differential_vs_duckdb_with_dangling_and_zero(
            self, ray_session):
        import ray.data
        from engine.relational import orders_per_customer_histogram
        rng = np.random.default_rng(23)
        customer = pd.DataFrame({
            "c_custkey": np.arange(1, 101, dtype=np.int64)})
        # keys 1..80 order; 200 is DANGLING; 81..100 never order
        fk = np.r_[rng.integers(1, 81, 400), [200, 200]]
        orders = pd.DataFrame({"o_custkey": fk.astype(np.int64)})
        got = orders_per_customer_histogram(
            ray.data.from_pandas(orders),
            ray.data.from_pandas(customer)).to_pandas() \
            .sort_values("n_orders").reset_index(drop=True)
        con = duckdb.connect()
        con.register("orders", orders)
        con.register("customer", customer)
        exp = con.execute("""
            with o as (
              select o_custkey, count(*)::bigint as n
              from orders where o_custkey is not null
              group by o_custkey)
            select coalesce(o.n, 0)::bigint as n_orders,
                   count(*)::bigint as n_customers
            from customer c left join o on c.c_custkey = o.o_custkey
            group by n_orders order by n_orders""").df()
        assert got["n_orders"].tolist() == exp["n_orders"].tolist()
        assert got["n_customers"].tolist() == exp["n_customers"].tolist()
        # the zero bin exists and the dangling key is not a customer
        assert got["n_orders"].iloc[0] == 0
        assert int(got["n_customers"].sum()) == len(customer)
