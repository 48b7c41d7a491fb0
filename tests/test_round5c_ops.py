"""Round-5 third batch: grouped weighted mean, lexical-diversity stats,
sliding-window text chunking, exact bigram top-k, and normalized dedup —
each pinned by a randomized differential test against DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

VOCAB = ["alpha", "beta", "Gamma", "delta", "EPS", "zeta", "eta", "THETA"]


def _texts(seed, n=400):
    rng = np.random.default_rng(seed)
    seps = [" ", "  ", "\t", " \n ", "   "]
    out = []
    for i in range(n):
        k = int(rng.integers(0, 40))
        words = rng.choice(VOCAB, k) if k else []
        sep_choice = [seps[j] for j in rng.integers(0, len(seps), max(k, 1))]
        t = ""
        for w, s in zip(words, sep_choice):
            t += w + s
        if rng.random() < 0.1:
            t = " " + t
        out.append(t if k or rng.random() < 0.5 else None)
    return pd.DataFrame({"doc_id": np.arange(1, n + 1, dtype=np.int64),
                         "text": pd.array(out, dtype="string[python]")
                         .astype(object)})


class TestGroupedWeightedMean:
    @pytest.mark.parametrize("seed", [5, 29])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.stats import grouped_weighted_mean
        rng = np.random.default_rng(seed)
        n = 4000
        df = pd.DataFrame({
            "g": rng.choice(list("ABCDEF"), n),
            "v": rng.normal(size=n).round(3),
            "w": rng.uniform(0.0, 5.0, n).round(3)})
        df.loc[rng.choice(n, n // 10, replace=False), "v"] = np.nan
        df.loc[rng.choice(n, n // 10, replace=False), "w"] = np.nan
        got = grouped_weighted_mean(
            ray.data.from_pandas(df), group_col="g", value_col="v",
            weight_col="w").to_pandas().sort_values("g") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute("""
            select g, count(*)::bigint as n,
                   sum(v * w) / sum(w) as weighted_mean
            from t where v is not null and w is not null
            group by g order by g""").df()
        m = got.merge(exp, on="g", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["n_g"] == m["n_e"]).all()
        assert np.isclose(m["weighted_mean_g"].to_numpy(),
                          m["weighted_mean_e"].to_numpy(),
                          equal_nan=True).all()

    def test_zero_weight_sum_reports_null(self, ray_session):
        import ray.data
        from engine.stats import grouped_weighted_mean
        df = pd.DataFrame({"g": ["a", "a", "b"],
                           "v": [1.0, 2.0, 3.0],
                           "w": [1.0, -1.0, 2.0]})
        out = grouped_weighted_mean(
            ray.data.from_pandas(df), group_col="g", value_col="v",
            weight_col="w").to_pandas().sort_values("g") \
            .reset_index(drop=True)
        assert np.isnan(out["weighted_mean"].iloc[0])
        assert out["weighted_mean"].iloc[1] == 3.0

    def test_all_filtered_typed_empty(self, ray_session):
        import ray.data
        from engine.stats import grouped_weighted_mean
        df = pd.DataFrame({"g": pd.array([1, 2], dtype="int64"),
                           "v": [np.nan, np.nan], "w": [1.0, 1.0]})
        out = grouped_weighted_mean(
            ray.data.from_pandas(df), group_col="g", value_col="v",
            weight_col="w")
        schema = out.schema().base_schema
        assert out.count() == 0
        assert schema.field("g").type == pa.int64()
        assert schema.field("weighted_mean").type == pa.float64()


class TestTokenTypeRatio:
    @pytest.mark.parametrize("seed", [17, 53])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.textstats import token_type_ratio
        df = _texts(seed)
        got = token_type_ratio(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
            with toks as (
              select doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') as t
              from documents)
            select doc_id, len(t)::bigint as n_tokens,
                   len(list_distinct(t))::bigint as n_distinct,
                   case when len(t) = 0 then null
                        else len(list_distinct(t))::double / len(t)
                   end as ttr
            from toks order by doc_id""").df()
        m = got.merge(exp, on="doc_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["n_tokens_g"] == m["n_tokens_e"]).all()
        assert (m["n_distinct_g"] == m["n_distinct_e"]).all()
        assert np.isclose(m["ttr_g"].to_numpy(), m["ttr_e"].to_numpy(),
                          equal_nan=True).all()


class TestTextChunks:
    @pytest.mark.parametrize("seed,size,stride", [(7, 8, 4), (43, 5, 5)])
    def test_differential_vs_duckdb(self, seed, size, stride, ray_session):
        import ray.data
        from engine.textstats import text_chunks
        df = _texts(seed)
        got = text_chunks(ray.data.from_pandas(df), chunk_tokens=size,
                          stride=stride).to_pandas() \
            .sort_values(["doc_id", "chunk_start"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(rf"""
            with toks as (
              select doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') as t
              from documents)
            select doc_id, s::bigint as chunk_start,
                   least({size}, len(t) - s)::bigint as n_tokens,
                   array_to_string(t[s + 1: s + {size}], ' ') as chunk
            from toks,
                 lateral (select unnest(range(0, greatest(len(t), 1),
                                              {stride})) as s)
            where s < len(t)
            order by doc_id, chunk_start""").df()
        assert len(got) == len(exp)
        assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
        assert (got["chunk_start"].to_numpy()
                == exp["chunk_start"].to_numpy()).all()
        assert (got["n_tokens"].to_numpy()
                == exp["n_tokens"].to_numpy()).all()
        assert (got["chunk"] == exp["chunk"]).all()

    def test_edge_docs(self, ray_session):
        import ray.data
        from engine.textstats import text_chunks
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([None, "", "one", "a b c d e"],
                             pa.string())}))
        out = text_chunks(ds, chunk_tokens=3, stride=2).to_pandas() \
            .sort_values(["doc_id", "chunk_start"]).reset_index(drop=True)
        # doc 3: one 1-token chunk; doc 4: starts 0,2,4
        assert out["doc_id"].tolist() == [3, 4, 4, 4]
        assert out["chunk"].tolist() == ["one", "a b c", "c d e", "e"]
        assert out["n_tokens"].tolist() == [1, 3, 3, 1]

    def test_rejects_bad_params(self, ray_session):
        import ray.data
        from engine.textstats import text_chunks
        ds = ray.data.from_items([{"doc_id": 1, "text": "x"}])
        with pytest.raises(ValueError):
            text_chunks(ds, chunk_tokens=0, stride=1)
        with pytest.raises(ValueError):
            text_chunks(ds, chunk_tokens=4, stride=0)


class TestBigramHeavyHitters:
    @pytest.mark.parametrize("seed", [3, 61])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.textstats import bigram_heavy_hitters
        df = _texts(seed)
        # small batches force cross-batch partial merging
        got = bigram_heavy_hitters(
            ray.data.from_pandas(df), k=15, batch_size=32) \
            .to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
            with toks as (
              select doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') as t
              from documents),
            z as (select unnest(list_zip(t[1:-2], t[2:-1])) as p
                  from toks where len(t) >= 2)
            select p[1] || ' ' || p[2] as bigram,
                   count(*)::bigint as n_occurrences
            from z group by bigram
            order by n_occurrences desc, bigram limit 15""").df()
        assert got["bigram"].tolist() == exp["bigram"].tolist()
        assert got["n_occurrences"].tolist() == \
            exp["n_occurrences"].tolist()

    def test_no_bigrams(self, ray_session):
        import ray.data
        from engine.textstats import bigram_heavy_hitters
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["solo", None], pa.string())}))
        assert bigram_heavy_hitters(ds, k=5).count() == 0


class TestNormalizedDuplicates:
    def test_case_and_whitespace_variants_group(self, ray_session):
        import ray.data
        from engine.dedup import normalized_duplicates
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["Hello  World", "hello world ",
                              "\thello\nworld", "different", None],
                             pa.string())}))
        out = normalized_duplicates(ds).to_pandas() \
            .sort_values("keep_id").reset_index(drop=True)
        assert len(out) == 3  # hello-world group, 'different', empty
        grp = out[out["keep_id"] == 1].iloc[0]
        assert grp["dup_count"] == 3

    @pytest.mark.parametrize("seed", [11])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.dedup import normalized_duplicates
        df = _texts(seed)
        got = normalized_duplicates(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("norm_hash").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
            with n as (
              select doc_id,
                     md5(regexp_replace(regexp_replace(
                         lower(coalesce(text, '')), '\s+', ' ', 'g'),
                         '^ | $', '', 'g')) as norm_hash
              from documents)
            select norm_hash, min(doc_id) as keep_id,
                   count(*) as dup_count
            from n group by norm_hash order by norm_hash""").df()
        assert got["norm_hash"].tolist() == exp["norm_hash"].tolist()
        assert got["keep_id"].tolist() == exp["keep_id"].tolist()
        assert got["dup_count"].tolist() == exp["dup_count"].tolist()


class TestTokenEntropy:
    @pytest.mark.parametrize("seed", [19, 67])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.textstats import token_entropy
        df = _texts(seed)
        got = token_entropy(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
            with tok as (
              select doc_id, token, count(*)::double as c
              from (select doc_id,
                           unnest(regexp_extract_all(coalesce(text, ''),
                                                     '\S+')) as token
                    from documents)
              group by doc_id, token)
            select d.doc_id,
                   coalesce(sum(t.c), 0)::bigint as n_tokens,
                   -sum((t.c / s.n) * ln(t.c / s.n)) as entropy,
                   max(t.c) / any_value(s.n) as top_share
            from documents d
            left join tok t using (doc_id)
            left join (select doc_id, sum(c) as n from tok
                       group by doc_id) s using (doc_id)
            group by d.doc_id order by d.doc_id""").df()
        m = got.merge(exp, on="doc_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["n_tokens_g"] == m["n_tokens_e"]).all()
        for c in ("entropy", "top_share"):
            assert np.isclose(m[c + "_g"].to_numpy(),
                              m[c + "_e"].to_numpy(),
                              equal_nan=True).all()

    def test_degenerate_docs(self, ray_session):
        import ray.data
        from engine.textstats import token_entropy
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([None, "x x x x", "a b"], pa.string())}))
        out = token_entropy(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert np.isnan(out["entropy"].iloc[0])       # empty doc
        assert out["entropy"].iloc[1] == 0.0          # pure repetition
        assert out["top_share"].iloc[1] == 1.0
        assert np.isclose(out["entropy"].iloc[2], np.log(2))
        assert out["top_share"].iloc[2] == 0.5


class TestGroupedZscore:
    @pytest.mark.parametrize("seed", [23, 71])
    def test_differential_vs_duckdb(self, seed, ray_session):
        import ray.data
        from engine.relational import grouped_zscore
        rng = np.random.default_rng(seed)
        n = 3000
        df = pd.DataFrame({
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "user_id": rng.integers(0, 60, n),
            "value": rng.normal(size=n).round(3)})
        df.loc[rng.choice(n, n // 10, replace=False), "value"] = np.nan
        got = grouped_zscore(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
            select event_id,
                   case when stddev_samp(value) over (
                            partition by user_id) > 0
                        then (value - avg(value) over (
                                 partition by user_id))
                             / stddev_samp(value) over (
                                 partition by user_id)
                   end as z
            from events where value is not null
            order by event_id""").df()
        m = got.merge(exp, on="event_id", suffixes=("_g", "_e"))
        assert len(m) == len(exp) == len(got)
        assert np.isclose(m["z_g"].to_numpy(), m["z_e"].to_numpy(),
                          equal_nan=True).all()

    def test_single_and_constant_keys_report_null(self, ray_session):
        import ray.data
        from engine.relational import grouped_zscore
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 2, 2, 3], pa.int64()),
            "value": pa.array([5.0, 7.0, 7.0, None], pa.float64())}))
        out = grouped_zscore(ds).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert len(out) == 3  # NULL value dropped
        assert np.isnan(out["z"]).all()  # single-row + constant keys
