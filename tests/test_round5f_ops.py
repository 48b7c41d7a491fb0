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
