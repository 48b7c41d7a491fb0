"""Train/test contamination detection: near-duplicate pairs ACROSS two
corpora (benchmark decontamination — find evaluation documents leaked into
a training set).

Two candidate generators share one verification path:

* ``method="shingle"`` — exact blocking on shared word n-gram shingles
  (every cross pair with any shared shingle is a candidate). Deterministic
  and SQL-expressible, so the pipeline can be oracled end-to-end; the
  candidate volume grows with shared-shingle frequency, so cap flood
  shingles (``max_bucket_size``) in large runs.
* ``method="minhash"`` — MinHash band buckets over the tagged union (the
  scale path: candidate volume tracks actual near-dups, not shared
  vocabulary). Same shape as ``dedup.minhash_near_duplicates``.

Both tag each side, co-locate candidates by bucket hash, emit only
cross-side pairs inside the coarse-partition pair kernel, and verify with
exact n-gram jaccard over the tagged union — the corpus shuffles only
64-bit hashes, and only the sparse cross-pair set is ever materialized.

Key spaces of the two sides must be disjoint (true for any global doc-id
scheme); identical ids on both sides would collapse into one blocking row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.dedup import (_add_bkey, _doc_shingle_hashes,
                          _pairs_via_partitions, _unique_pairs,
                          verify_pairs_jaccard, _MinHashBandBatch,
                          tune_bands)

_TRAIN, _TEST = 0, 1


def _tag(ds, side: int, text_col: str, key_col: str):
    def _fn(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b.column(key_col),
            text_col: b.column(text_col),
            "side": pa.array(np.full(len(b), side, dtype=np.int8))})
    return ds.map_batches(_fn, batch_format="pyarrow")


def _cross_only(df):
    """Keep pairs whose sides differ, oriented train -> test."""
    if not len(df):
        return df
    sa = df["side_a"].to_numpy()
    sb = df["side_b"].to_numpy()
    sub = df[sa != sb]
    if not len(sub):
        return sub.drop(columns=["side_a", "side_b"])
    swap = sub["side_a"].to_numpy() == _TEST
    ka = np.where(swap, sub["key_b"].to_numpy(), sub["key_a"].to_numpy())
    kb = np.where(swap, sub["key_a"].to_numpy(), sub["key_b"].to_numpy())
    out = sub.drop(columns=["side_a", "side_b"]).copy()
    out["key_a"] = ka
    out["key_b"] = kb
    return out


def cross_corpus_near_duplicates(train, test, *, text_col: str = "text",
                                 key_col: str = "doc_id", n: int = 3,
                                 threshold: float = 0.8,
                                 method: str = "minhash",
                                 minhash_k: int = 64,
                                 max_bucket_size: int | None | str = "auto"):
    """(train_id=key_a, test_id=key_b, jaccard) for cross-corpus pairs with
    exact word n-gram jaccard >= ``threshold``.

    ``max_bucket_size="auto"`` (default) applies the SAFE per-method flood
    cap (shingle: 256, minhash: 64); pass ``None`` to uncap (oracle
    comparisons only — the SQL self-join is flood-blind), or an int."""
    import pandas as pd

    union = _tag(train, _TRAIN, text_col, key_col) \
        .union(_tag(test, _TEST, text_col, key_col))

    if method == "shingle":
        def _shingles(df):
            if text_col not in df.columns or not len(df):
                return pd.DataFrame({
                    "key": [], "side": pd.array([], dtype="int8"),
                    "bkey": pd.array([], dtype="int64")})
            h, counts = _doc_shingle_hashes(df[text_col].tolist(), n)
            return pd.DataFrame({
                "key": np.repeat(df[key_col].to_numpy(), counts),
                "side": np.repeat(df["side"].to_numpy(), counts),
                "bkey": (h >> np.uint64(1)).astype(np.int64),
            }).drop_duplicates(subset=["key", "bkey"])

        cand = union.map_batches(_shingles, batch_format="pandas")
        cap = 256 if max_bucket_size == "auto" else (
            max_bucket_size if max_bucket_size is not None else 1 << 30)
    elif method == "minhash":
        bands, _r = tune_bands(threshold, minhash_k)
        banded = union.map_batches(
            _MinHashBandBatch(text_col, key_col, minhash_k, bands,
                              shingle_n=n, extra_cols=["side"]),
            batch_format="pyarrow")
        cand = banded.map_batches(_add_bkey(["band", "band_hash"]),
                                  batch_format="pyarrow")
        cap = 64 if max_bucket_size == "auto" else (
            max_bucket_size if max_bucket_size is not None else 1 << 30)
    else:
        raise ValueError(f"unknown method {method!r}")

    pairs = _pairs_via_partitions(cand, max_bucket_size=cap,
                                  value_col="side", post=_cross_only)
    uniq = _unique_pairs(pairs)
    return verify_pairs_jaccard(uniq, union, text_col=text_col,
                                key_col=key_col, n=n, threshold=threshold)
