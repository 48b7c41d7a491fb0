"""Sampling/split determinism tests."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(ray_session):
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_split_deterministic_and_disjoint(docs, ray_session):
    from engine.sampling import assign_split
    a = assign_split(docs, train_frac=0.8).to_pandas()
    b = assign_split(docs, train_frac=0.8).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()
    frac = (a["split"] == "train").mean()
    assert 0.7 < frac < 0.9


def test_fast_mode_stable(docs, ray_session):
    from engine.sampling import sample_fraction
    a = sample_fraction(docs, 0.3, fast=True).to_pandas()
    b = sample_fraction(docs, 0.3, fast=True).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 0.2 < len(a) / 500 < 0.4


def test_reservoir_sample_exact_k(docs, ray_session):
    from engine.sampling import reservoir_sample
    t = reservoir_sample(docs, 37, seed=1)
    assert t.num_rows == 37
    assert len(set(t.column("doc_id").to_pylist())) == 37


class TestStratifiedSample:
    def _docs(self):
        import pyarrow as pa
        import ray.data
        n = 4000
        langs = [None if i % 40 == 0 else ("en", "de", "fr")[i % 3]
                 for i in range(n)]
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "lang": pa.array(langs, pa.string())}))

    def test_rates_deterministic_and_null_stratum(self, ray_session):
        from engine.sampling import stratified_sample
        docs = self._docs()
        fr = {"en": 0.5, "de": 0.1}
        a = stratified_sample(docs, fr, strat_col="lang",
                              default_frac=0.05).to_pandas()
        b = stratified_sample(docs, fr, strat_col="lang",
                              default_frac=0.05).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # deterministic
        rates = a.groupby(a["lang"].fillna("~null~")).size()
        assert abs(rates.get("en", 0) / 1300 - 0.5) < 0.08
        assert abs(rates.get("de", 0) / 1300 - 0.1) < 0.05
        # fr and NULL both fall to default_frac
        assert rates.get("fr", 0) / 1300 < 0.12
        assert 0 <= rates.get("~null~", 0) <= 25

    def test_fast_mode_rates(self, ray_session):
        from engine.sampling import stratified_sample
        docs = self._docs()
        out = stratified_sample(docs, {"en": 0.4}, strat_col="lang",
                                default_frac=0.0, fast=True).to_pandas()
        assert set(out["lang"]) == {"en"}
        assert abs(len(out) / 1300 - 0.4) < 0.08
