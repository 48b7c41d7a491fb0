"""Round-5 regression pins for the round-4 ADVICE items.

Each test reproduces a latent NULL-contract or typed-empty gap that the
fixtures (NULL-free keys, never-all-filtered values) could not catch:

- ewma / ewma_halflife crashed in the worker on NULL partition keys
  (pandas groupby drops NaN-key rows, so the ewm series came back
  shorter than the sorted frame). The contract is now key IS NOT NULL,
  mirrored in the oracles' recursive-CTE seed.
- lag_diff and the _rolling_frames kernels silently diverged from SQL
  PARTITION BY: NaN != NaN is elementwise True, so every NULL-key row
  became its own partition; SQL groups them as ONE.
- grouped_moments / grouped_corr returned a SCHEMALESS empty on an
  all-filtered corpus (Ray never invokes UDFs on empty blocks), breaking
  downstream .sort(); count_distinct's typed-empty fallback guessed
  pa.string() for the key dtype when plan metadata was absent.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(keys, vals, ids=None, ts=None):
    import ray.data
    n = len(keys)
    ids = ids if ids is not None else list(range(1, n + 1))
    ts = ts if ts is not None else pd.to_datetime(
        ["2020-01-01 00:%02d" % i for i in range(n)])
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(keys, pa.int64()),
        "value": pa.array(vals, pa.float64())}))


class TestEcmaClassLiteralBracket:
    def test_literal_bracket_in_class_escaped(self):
        """ECMA allows a bare '[' inside a class; Python's re warns
        'Possible nested set' on '[[' (slated to become an error) — the
        translator must emit it escaped, with identical semantics."""
        import warnings
        from engine.ecma import compile_ecma, translate_ecma
        assert translate_ecma("[[a]") == r"[\[a]"
        assert translate_ecma("[^[]") == r"[^\[]"
        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            r = compile_ecma("x[[:y]")
            assert r is not None
            assert r.search("x[") and r.search("x:") and not r.search("xz")


class TestSimhashBlockScaling:
    """The SimHash near-dup bucket space must GROW with corpus size
    (Manku block-combination LSH) instead of saturating at the old fixed
    2^16 chunks."""

    def test_block_count_grows_with_corpus(self):
        from engine.dedup import simhash_block_count
        sizes = [1_000, 10**5, 10**7, 10**9, 10**11]
        ms = [simhash_block_count(n) for n in sizes]
        assert ms == sorted(ms)
        assert ms[0] == 4 and ms[-1] == 8
        widths = [(m - 3) * (64 // m) for m in ms]
        assert widths[0] == 16 and widths[-1] == 40   # 2^16 -> 2^40
        assert simhash_block_count(None) == 6         # unknown: mid-ladder

    @pytest.mark.parametrize("m", [5, 6])
    def test_near_dup_recall_at_wider_blocks(self, m, ray_session):
        """Identical docs (hamming 0) must pair under every block count —
        the combination guarantee, not an artifact of the m=4 layout."""
        import ray.data
        texts = [f"unique filler document number {i} about topic {i*13}"
                 for i in range(20)]
        texts.append(texts[0])
        from engine.dedup import simhash_near_duplicates
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(21), pa.int64()),
            "text": pa.array(texts, pa.string())}))
        pairs = simhash_near_duplicates(ds, n_blocks=m).to_pandas()
        got = set(map(tuple, pairs[["key_a", "key_b"]].values))
        assert (0, 20) in got
        assert pairs.set_index(["key_a", "key_b"])["hamming"] \
            .loc[(0, 20)] == 0

    def test_n_blocks_must_exceed_max_hamming(self, ray_session):
        import ray.data
        from engine.dedup import simhash_near_duplicates
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["x"], pa.string())}))
        with pytest.raises(ValueError):
            simhash_near_duplicates(ds, n_blocks=3)


class TestEwmaNullKey:
    def test_ewma_null_key_rows_dropped_no_crash(self, ray_session):
        """NULL-key rows must be dropped (oracle: user_id IS NOT NULL),
        not crash the worker with a length-mismatched ewm series."""
        from engine.relational import ewma
        ds = _events([7, None, 7, None], [1.0, 50.0, 3.0, 60.0])
        out = ewma(ds, alpha=0.5).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["event_id"].tolist() == [1, 3]
        assert out["ewma"].tolist() == [1.0, 2.0]

    def test_ewma_halflife_null_key_rows_dropped_no_crash(self,
                                                          ray_session):
        from engine.relational import ewma_halflife
        ds = _events([7, None, 7], [2.0, 50.0, 2.0])
        out = ewma_halflife(ds, halflife_seconds=3600.0).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["event_id"].tolist() == [1, 3]
        # constant series stays constant regardless of decay weights
        assert np.allclose(out["ewma_hl"].to_numpy(), [2.0, 2.0])


class TestNullKeyOnePartition:
    """SQL PARTITION BY groups NULL keys as ONE partition."""

    def test_lag_diff_null_keys_form_one_partition(self, ray_session):
        from engine.relational import lag_diff
        ds = _events([None, 7, None, 7], [10.0, 1.0, 13.0, 5.0])
        out = lag_diff(ds).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        got = [None if np.isnan(x) else x for x in out["lag_diff"]]
        # NULL-key rows 1 and 3 are one partition: row 3 diffs vs row 1
        assert got == [None, None, 3.0, 4.0]

    def test_rolling_null_keys_form_one_partition(self, ray_session):
        from engine.relational import (rolling_window_mean,
                                       rolling_window_sum_count)
        ds = _events([None, None, 3], [1.0, 3.0, 9.0])
        m = rolling_window_mean(ds, window_seconds=3600).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert m["rolling_mean"].tolist() == [1.0, 2.0, 9.0]
        s = rolling_window_sum_count(ds, window_seconds=3600) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        assert s["rolling_sum"].tolist() == [1.0, 4.0, 9.0]
        assert s["rolling_n"].tolist() == [1, 2, 1]


class TestAllFilteredTypedEmpty:
    """All-filtered input must yield a TYPED empty (with the real key
    dtype), not a schemaless one that breaks downstream .sort()."""

    def _all_null(self):
        import ray.data
        return ray.data.from_arrow(pa.table({
            "g": pa.array([4, 4, 9], pa.int64()),
            "x": pa.array([None, None, None], pa.float64()),
            "y": pa.array([None, None, None], pa.float64())}))

    @staticmethod
    def _schema_of(ds):
        # Ray to_pandas() on an EMPTY dataset drops the schema (known
        # sharp edge) — assert in Arrow land instead.
        sorted_ds = ds.sort("g")          # downstream sort must not break
        assert sorted_ds.count() == 0
        sch = ds.schema().base_schema
        return {f.name: f.type for f in sch}

    def test_grouped_moments_all_filtered(self, ray_session):
        from engine.stats import grouped_moments
        out = grouped_moments(self._all_null(), group_col="g",
                              value_col="x")
        sch = self._schema_of(out)
        assert sch["g"] == pa.int64()
        assert list(sch) == ["g", "n", "mean", "std_samp", "vmin", "vmax"]

    def test_grouped_corr_all_filtered(self, ray_session):
        from engine.stats import grouped_corr
        out = grouped_corr(self._all_null(), group_col="g",
                           x_col="x", y_col="y")
        sch = self._schema_of(out)
        assert sch["g"] == pa.int64()
        assert list(sch) == ["g", "n", "corr"]

    def test_count_distinct_empty_keeps_int_key_dtype(self, ray_session):
        """A transformed plan with no metadata schema must fall back to
        a fetched schema, not guess pa.string() for an int key."""
        import ray.data
        from engine.relational import count_distinct
        base = ray.data.from_arrow(pa.table({
            "g": pa.array([1, 2], pa.int64()),
            "v": pa.array([None, None], pa.float64())}))
        # a map_batches wrapper clears cheap plan metadata
        ds = base.map_batches(lambda b: b, batch_format="pyarrow")
        out = count_distinct(ds, group_col="g", value_col="v")
        sch = self._schema_of(out)
        assert sch["g"] == pa.int64()
        assert sch["n_distinct"] == pa.int64()


class TestKeepLatestDtypeStability:
    def test_nullable_int_key_keeps_declared_dtype(self, ray_session):
        """A NULL-containing block degrades int64->float64 inside the
        pandas kernel; the output must cast back to the declared input
        schema (no between-block drift)."""
        import ray.data
        from engine.relational import keep_latest
        ds = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(pd.to_datetime(
                ["2020-01-01", "2020-01-02", "2020-01-03",
                 "2020-01-04"])),
            "user_id": pa.array([7, None, 7, 9], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())}))
        out = keep_latest(ds)
        sch = {f.name: f.type for f in out.schema().base_schema}
        assert sch["user_id"] == pa.int64()
        assert sch["event_id"] == pa.int64()
        t = out.to_pandas().sort_values("event_id").reset_index(drop=True)
        # winners: NULL key -> id 2; key 7 -> id 3 (latest ts); key 9 -> 4
        assert t["event_id"].tolist() == [2, 3, 4]
