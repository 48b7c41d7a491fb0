"""Regression tests for round-3 review findings (ADVICE round 3):
EWMA NULL contract, schemaless-empty guards in value_histogram /
count_distinct, and the empty-micro-batch path of stream_dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_ewma_null_values_match_sql_recurrence(ray_session):
    """NULL values are dropped before the recurrence (emit no row, do not
    advance the state) — parity with the recursive-CTE oracle's
    ``WHERE value IS NOT NULL``. Without the drop, pandas ewm would
    carry-and-reweight past the NaN and diverge (ADVICE r3, low)."""
    import duckdb
    import ray.data
    from engine.relational import ewma
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 8, 8], pa.int64()),
        "ts": pa.array([10, 20, 30, 10, 20, 30], pa.int64()),
        "value": pa.array([1.0, None, 3.0, None, 5.0, 7.0], pa.float64()),
    })
    got = ewma(ray.data.from_arrow(t), key_col="user_id", ts_col="ts",
               val_col="value", id_col="event_id", alpha=0.3) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute("""
        with recursive
        s as (select event_id, user_id, value,
                     row_number() over (partition by user_id
                                        order by ts, event_id) as rn
              from events where value is not null),
        e(user_id, rn, event_id, y) as (
          select user_id, rn, event_id, value from s where rn = 1
          union all
          select s.user_id, s.rn, s.event_id, 0.3*s.value + 0.7*e.y
          from e join s on s.user_id = e.user_id and s.rn = e.rn + 1)
        select event_id, y as ewma from e order by event_id
    """).df()
    assert got["event_id"].tolist() == exp["event_id"].tolist() == \
        [1, 3, 5, 6]
    np.testing.assert_allclose(got["ewma"].to_numpy(),
                               exp["ewma"].to_numpy(), rtol=1e-12)
    # manual check: NULL neither emits nor advances state
    np.testing.assert_allclose(
        got["ewma"].to_numpy(), [1.0, 0.3*3 + 0.7*1.0, 5.0, 0.3*7 + 0.7*5.0])


def test_value_histogram_all_filtered_returns_typed_empty(ray_session):
    """When every value is out of range the result must be a typed empty
    (bin, n) table, not a schemaless zero-column one (ADVICE r3)."""
    import ray.data
    from engine.stats import value_histogram
    t = pa.table({"v": pa.array([100.0, 200.0, None], pa.float64())})
    out = value_histogram(ray.data.from_arrow(t), "v",
                          lo=0.0, hi=10.0, bins=4)
    sch = out.schema().base_schema  # typed, not schemaless zero-column
    assert sch.names == ["bin", "n"]
    assert sch.field("bin").type == pa.int64()
    assert sch.field("n").type == pa.int64()
    # downstream select/sort must not break (Ray's sort still strips the
    # schema of an empty result — a documented Ray sharp edge — but the
    # operations themselves succeed)
    assert out.select_columns(["bin"]).take_all() == []
    assert out.sort("bin").take_all() == []


def test_count_distinct_all_filtered_returns_typed_empty(ray_session):
    import ray.data
    from engine.relational import count_distinct
    t = pa.table({"g": pa.array([None, None], pa.string()),
                  "v": pa.array([1, 2], pa.int64())})
    out = count_distinct(ray.data.from_arrow(t), group_col="g",
                         value_col="v")
    sch = out.schema().base_schema
    assert sch.names == ["g", "n_distinct"]
    assert sch.field("g").type == pa.string()
    assert sch.field("n_distinct").type == pa.int64()
    assert out.select_columns(["g"]).take_all() == []
    assert out.sort("g").take_all() == []


def test_stream_dedup_empty_micro_batch(ray_session, tmp_path):
    """An empty delivery is routine in streaming: it must commit an empty
    version (typed key column) and not crash; a later batch must still
    dedup against earlier state (ADVICE r3, medium)."""
    import ray.data
    from engine.streaming import stream_dedup_micro_batch
    sd = str(tmp_path / "dstate")
    full = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["aaa", "bbb"], pa.string())})
    kept, s = stream_dedup_micro_batch(
        ray.data.from_arrow(full), sd, batch_id="b1")
    kept = _as_table(kept)
    assert s["batch_docs_kept"] == 2

    empty = ray.data.from_arrow(full.slice(0, 0))
    kept2, s2 = stream_dedup_micro_batch(empty, sd, batch_id="b2")
    kept2 = _as_table(kept2)
    assert len(kept2) == 0
    assert s2["batch_docs_kept"] == 0

    nxt = pa.table({
        "doc_id": pa.array([12, 13], pa.int64()),
        "text": pa.array(["aaa", "ccc"], pa.string())})
    kept3, s3 = stream_dedup_micro_batch(
        ray.data.from_arrow(nxt), sd, batch_id="b3")
    kept3 = _as_table(kept3)
    # 'aaa' was seen in b1; the empty commit between must not break the
    # hash-file read path (null-typed parquet column regression)
    assert sorted(kept3.column("doc_id").to_pylist()) == [13]


def _as_table(x) -> pa.Table:
    if isinstance(x, pa.Table):
        return x
    if hasattr(x, "to_arrow_refs"):  # ray Dataset
        df = x.to_pandas()
        return pa.Table.from_pandas(df, preserve_index=False)
    return pa.table(x)


class TestStreamingDriverBounds:
    """VERDICT r3 items 2+3: the streaming operators must never
    materialize driver-side data proportional to the micro-batch or to
    key cardinality — only suspect-sized frames (dedup) and O(blocks)
    meta scalars (windows) may touch the driver."""

    def _spy_to_pandas(self, monkeypatch):
        import ray.data
        sizes = []
        orig = ray.data.Dataset.to_pandas

        def spy(ds, *a, **k):
            df = orig(ds, *a, **k)
            sizes.append(len(df))
            return df
        monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
        return sizes

    def test_stream_dedup_driver_holds_only_suspects(
            self, ray_session, tmp_path, monkeypatch):
        import ray.data
        from engine.streaming import stream_dedup_micro_batch
        sizes = self._spy_to_pandas(monkeypatch)
        n = 20_000
        b1 = pa.table({
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array([f"doc-{i}" for i in range(n)])})
        _, s1 = stream_dedup_micro_batch(
            ray.data.from_arrow(b1), str(tmp_path / "st"), batch_id="b1")
        assert s1["batch_docs_kept"] == n
        # first batch: no prior state -> nothing at all reaches the driver
        assert sizes == []
        # second batch: 100 true dups + Bloom fpr -> only that sparse
        # suspect set may become driver pandas, never the 20k candidates
        b2 = pa.table({
            "doc_id": pa.array(np.arange(n, 2 * n), pa.int64()),
            "text": pa.array(
                [f"doc-{i}" for i in range(100)] +
                [f"new-{i}" for i in range(n - 100)])})
        _, s2 = stream_dedup_micro_batch(
            ray.data.from_arrow(b2), str(tmp_path / "st"), batch_id="b2")
        assert s2["batch_docs_kept"] == n - 100
        assert s2["bloom_hits"] >= 100
        assert sizes and max(sizes) <= max(2 * s2["bloom_hits"], 64)
        assert max(sizes) < n // 10

    def test_streaming_windows_state_merge_is_distributed(
            self, ray_session, tmp_path, monkeypatch):
        """20k-key open state: the carry-forward merge must happen inside
        the distributed groupby — the driver never sees a per-key frame
        (spy: zero to_pandas calls from the engine)."""
        import ray.data
        from engine.streaming import process_micro_batch
        sizes = self._spy_to_pandas(monkeypatch)
        n_keys = 20_000
        base = np.datetime64("2024-01-01T00:00:00", "us")
        b1 = pa.table({
            "user_id": pa.array(np.arange(n_keys), pa.int64()),
            "ts": pa.array([base] * n_keys, pa.timestamp("us")),
            "value": pa.array(np.ones(n_keys), pa.float64())})
        c1, s1 = process_micro_batch(
            ray.data.from_arrow(b1), str(tmp_path / "ws"),
            window="1h", allowed_lateness="0s")
        assert s1["open_windows"] == n_keys and c1.count() == 0
        # batch 2 touches every key again, then advances time far enough
        # to close all 20k carried windows
        later = base + np.timedelta64(30, "m")
        far = base + np.timedelta64(3, "h")
        b2 = pa.table({
            "user_id": pa.array(
                np.concatenate([np.arange(n_keys), [0]]), pa.int64()),
            "ts": pa.array([later] * n_keys + [far], pa.timestamp("us")),
            "value": pa.array(np.ones(n_keys + 1), pa.float64())})
        c2, s2 = process_micro_batch(
            ray.data.from_arrow(b2), str(tmp_path / "ws"),
            window="1h", allowed_lateness="0s")
        assert s2["closed_windows"] == n_keys
        assert c2.count() == n_keys
        # every first-hour window merged state (1) + batch-2 partial (1)
        bad = c2.map_batches(
            lambda b: b.filter(pa.compute.not_equal(
                b.column("n_events"), 2)), batch_format="pyarrow")
        assert bad.count() == 0
        assert sizes == []  # the engine never driver-merged anything


class TestFloodCapDefaults:
    """Round-3 VERDICT #4: the shingle-blocking flood cap now DEFAULTS to
    a finite bound (256); ``None`` (uncapped, oracle-parity) is opt-in."""

    @staticmethod
    def _flood_docs(n_docs: int, id_base: int = 0, tag: str = "u"):
        import ray.data
        # every doc shares the 3-gram "common alpha beta"; all other
        # shingles are doc-unique -> one flood bucket of size n_docs
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(id_base, id_base + n_docs),
                               pa.int64()),
            "text": pa.array([
                f"common alpha beta {tag}{i}a {tag}{i}b {tag}{i}c"
                for i in range(n_docs)]),
        }))

    def test_default_cap_bounds_flood_pair_volume(self, ray_session):
        from engine.cluster import shingle_candidate_pairs
        docs = self._flood_docs(300)
        # default (cap 256): the 300-doc flood bucket is dropped entirely
        assert shingle_candidate_pairs(docs).count() == 0
        # explicit uncap restores the full quadratic candidate set
        uncapped = shingle_candidate_pairs(docs, max_bucket_size=None)
        assert uncapped.count() == 300 * 299 // 2

    def test_contamination_auto_cap(self, ray_session):
        from engine.contamination import cross_corpus_near_duplicates
        # distinct tags -> a cross (train_i, test_j) pair shares ONLY the
        # flood shingle: jaccard = 1/7 (~0.143), above threshold 0.1
        train = self._flood_docs(150, tag="t")
        test = self._flood_docs(150, id_base=10_000, tag="s")
        # 150 + 150 = 300 docs share the flood shingle > 256 -> bucket
        # dropped under the "auto" default, so no candidates survive
        capped = cross_corpus_near_duplicates(
            train, test, threshold=0.1, method="shingle")
        assert capped.count() == 0
        # uncapped: every cross pair is a candidate and passes jaccard
        full = cross_corpus_near_duplicates(
            train, test, threshold=0.1, method="shingle",
            max_bucket_size=None)
        assert full.count() == 150 * 150
