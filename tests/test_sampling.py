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
