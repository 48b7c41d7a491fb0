"""Deduplication operators over the ``documents`` table.

Five dedup families, each Ray-Data-first (combiner inside ``map_batches``
before any shuffle; the shuffle key is always a short hash, never the text):

* **exact**: md5(text) groups -> keep lowest doc_id (hash-partition + per-group
  first; md5 so a DuckDB oracle can reproduce it bit-for-bit).
* **MinHash + LSH**: word-shingle -> K minhashes (one base hash per shingle +
  K cheap splitmix re-mixes, per-doc min via reduceat) -> band buckets ->
  within-bucket candidate pairs -> signature-similarity filter.
* **SimHash**: 64-bit sign-of-weighted-sum fingerprints; near-dup candidates
  by exact match on any of 4 16-bit chunks (Hamming<=3 guaranteed recall for
  <=3-bit flips by pigeonhole).
* **n-gram Jaccard**: exact verification kernel for candidate pairs.
* **embedding cosine**: random-hyperplane LSH buckets -> within-bucket cosine
  >= threshold (brute-force verify for small buckets).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from engine.sketches import _splitmix, hash64

# ---------------------------------------------------------------------------
# exact dedup


def _md5_hex(texts) -> list[str]:
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def exact_duplicates(ds, *, text_col: str = "text", key_col: str = "doc_id",
                     batch_size: int = 8192, concurrency=None):
    """Groups of byte-identical texts: (text_hash, keep_id, dup_count).

    In-batch combiner first, so the groupby shuffles one row per distinct
    text per batch (md5 keys, 32 bytes) — never the text bytes.
    """
    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        h = np.array(_md5_hex(batch.column(text_col).to_pylist()),
                     dtype=object)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"text_hash": h, "k": keys})
        g = df.groupby("text_hash")["k"].agg(["min", "count"]).reset_index()
        return pa.table({
            "text_hash": pa.array(g["text_hash"], pa.string()),
            "keep_id": pa.array(g["min"].tolist()),  # native key dtype
            "cnt": pa.array(g["count"].astype(np.int64)),
        })

    from engine.shuffle import balance
    partials = balance(ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=batch_size,
                       concurrency=concurrency))
    from ray.data.aggregate import Min, Sum
    agg = partials.groupby("text_hash").aggregate(
        Min("keep_id"), Sum("cnt"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": b.column("text_hash"),
            "keep_id": b.column("min(keep_id)"),
            "dup_count": b.column("sum(cnt)"),
        })

    return agg.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles + minhash


def _doc_shingle_hashes(texts: list, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Flattened 64-bit hashes of word n-gram shingles + doc offsets."""
    all_shingles: list = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = (t or "").lower().split()
        if len(words) < n:
            sh = [" ".join(words)] if words else []
        else:
            sh = [" ".join(words[j:j + n]) for j in range(len(words) - n + 1)]
        all_shingles.extend(sh)
        counts[i] = len(sh)
    if all_shingles:
        h = hash64(np.array(all_shingles, dtype=object))
    else:
        h = np.zeros(0, dtype=np.uint64)
    return h, counts


def minhash_signatures_batch(texts: list, k: int = 64,
                             shingle_n: int = 3) -> np.ndarray:
    """(len(texts), k) uint64 signature matrix; empty docs get all-max."""
    h, counts = _doc_shingle_hashes(texts, shingle_n)
    sig = np.full((len(texts), k), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = counts > 0
    if not nonempty.any():
        return sig
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    sel_starts = starts[nonempty]
    with np.errstate(over="ignore"):
        for j in range(k):
            hj = _splitmix(h, j + 101)
            mins = np.minimum.reduceat(hj, sel_starts)
            sig[nonempty, j] = mins
    return sig


def _band_hashes(sig: np.ndarray, bands: int, r: int) -> np.ndarray:
    """(n * bands,) uint64 band hashes, band-major."""
    n = len(sig)
    bh = np.empty(bands * n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            chunk = sig[:, b * r:(b + 1) * r]
            acc = np.zeros(n, dtype=np.uint64)
            for c in range(r):
                acc = _splitmix(acc ^ chunk[:, c], b + 7)
            bh[b * n:(b + 1) * n] = acc
    return bh


class _MinHashBandBatch:
    """batch -> LIGHT (band, band_hash, key) rows for the LSH groupby.

    Signatures are deliberately NOT shipped: at 10^12 docs x 16 bands the
    512-byte signature would dominate the shuffle (~8 KB/doc). Candidates
    surviving the hot-bucket filter are sparse, so their signatures are
    recomputed afterwards on the filtered corpus slice instead.
    """

    def __init__(self, text_col: str, key_col: str, k: int, bands: int,
                 shingle_n: int):
        self.text_col = text_col
        self.key_col = key_col
        self.k = k
        self.bands = bands
        self.r = k // bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        sig = minhash_signatures_batch(texts, self.k, self.shingle_n)
        n = len(texts)
        return pa.table({
            "band": pa.array(np.repeat(np.arange(self.bands,
                                                 dtype=np.int32), n)),
            "band_hash": pa.array(_band_hashes(sig, self.bands, self.r),
                                  pa.uint64()),
            "key": pa.array(np.tile(keys, self.bands).tolist()),
        })


def _bucket_key_pairs(df):
    """Candidate (key_a, key_b) pairs within one (band, band_hash) bucket."""
    import pandas as pd
    keys = np.unique(df["key"].to_numpy())
    rows = [{"key_a": keys[i], "key_b": keys[j]}
            for i in range(len(keys)) for j in range(i + 1, len(keys))]
    return pd.DataFrame(rows, columns=["key_a", "key_b"])


def _hot_bucket_filter(banded, cols: list[str]):
    """Filter an LSH-banded dataset down to buckets with >= 2 members.

    ``map_groups`` over millions of mostly-singleton buckets pays python
    overhead per group; instead, count buckets with a NATIVE groupby
    aggregate, broadcast the (small) hot-bucket key set, and keep only rows
    whose bucket is hot — the expensive per-group pair scan then runs on the
    candidate sliver only. At near-dup rates of a few %, the sliver is a few
    % of the banded rows.
    """
    import pyarrow.compute as pc
    import ray

    from engine.shuffle import balance
    banded = balance(banded).materialize()  # reused by count + filter passes
    counts = banded.groupby(cols).count()

    def _hot_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("count()"), 2))

    hot = counts.map_batches(_hot_only, batch_format="pyarrow")
    hot_df = hot.to_pandas()
    hot_keys = set(map(tuple, hot_df[cols].itertuples(index=False)))
    ref = ray.put(hot_keys)

    def _filter(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        col_vals = [b.column(c).to_pylist() for c in cols]
        mask = np.array([tuple(v) in keys for v in zip(*col_vals)],
                        dtype=bool)
        return b.filter(pa.array(mask))

    return banded.map_batches(_filter, batch_format="pyarrow")


def minhash_near_duplicates(ds, *, text_col: str = "text",
                            key_col: str = "doc_id", k: int = 64,
                            bands: int = 16, shingle_n: int = 3,
                            threshold: float = 0.7,
                            batch_size: int = 8192, concurrency=None):
    """Near-duplicate pairs (key_a, key_b, est_jaccard) with est >= threshold.

    Scale shape: (1) LIGHT band rows (int32, uint64, key) shuffle — no
    signatures; (2) native count aggregate drops singleton buckets;
    (3) surviving buckets emit candidate key pairs; (4) signatures are
    recomputed ONLY for candidate docs (sparse corpus filter, broadcast
    key->sig lookup) and score est_jaccard.
    """
    import ray

    banded = ds.map_batches(
        _MinHashBandBatch(text_col, key_col, k, bands, shingle_n),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)
    cand = _hot_bucket_filter(banded, ["band", "band_hash"])
    pairs = cand.groupby(["band", "band_hash"]).map_groups(
        _bucket_key_pairs, batch_format="pandas")
    # a pair can surface from several bands: keep one copy
    uniq_pairs = pairs.groupby(["key_a", "key_b"]).count()

    # candidate signatures: sparse corpus filter -> broadcast key->sig
    cand_keys: set = set()
    pair_rows = uniq_pairs.select_columns(["key_a", "key_b"]).to_pandas()
    for a, b in pair_rows.itertuples(index=False):
        cand_keys.add(a)
        cand_keys.add(b)
    keys_ref = ray.put(cand_keys)

    def _sig_candidates(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        keys = batch.column(key_col).to_pylist()
        mask = np.array([v in ks for v in keys], dtype=bool)
        if not mask.any():
            return pa.table({"key": pa.array([], batch.schema.field(
                key_col).type), "sig": pa.array([], pa.binary())})
        sub = batch.filter(pa.array(mask))
        sig = minhash_signatures_batch(
            sub.column(text_col).to_pylist(), k, shingle_n)
        return pa.table({
            "key": sub.column(key_col),
            "sig": pa.array([sig[i].tobytes() for i in range(len(sub))],
                            pa.binary()),
        })

    sig_lookup = {}
    for row in ds.map_batches(_sig_candidates, batch_format="pyarrow",
                              batch_size=batch_size).iter_rows():
        sig_lookup[row["key"]] = np.frombuffer(row["sig"], dtype=np.uint64)
    sig_ref = ray.put(sig_lookup)

    def _score(batch: pa.Table) -> pa.Table:
        sigs = ray.get(sig_ref)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        out = {"key_a": [], "key_b": [], "est_jaccard": []}
        for a, b in zip(ka, kb):
            sa, sb = sigs.get(a), sigs.get(b)
            if sa is None or sb is None:
                continue
            est = float((sa == sb).mean())
            if est >= threshold:
                out["key_a"].append(a)
                out["key_b"].append(b)
                out["est_jaccard"].append(est)
        return pa.table({
            "key_a": pa.array(out["key_a"],
                              batch.schema.field("key_a").type),
            "key_b": pa.array(out["key_b"],
                              batch.schema.field("key_b").type),
            "est_jaccard": pa.array(out["est_jaccard"], pa.float64()),
        })

    return uniq_pairs.map_batches(_score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash


def simhash_batch(texts: list, shingle_n: int = 2) -> np.ndarray:
    """64-bit simhash per text (sign of token-hash bit-vote sums)."""
    h, counts = _doc_shingle_hashes(texts, shingle_n)
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if len(h) == 0:
        return out
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32) * 2 - 1  # (tokens, 64) in {-1,1}
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nonempty = counts > 0
    sums = np.add.reduceat(bits, starts[nonempty], axis=0)
    fp = (sums > 0).astype(np.uint64)
    vals = np.zeros(len(sums), dtype=np.uint64)
    for b in range(64):
        vals |= fp[:, b] << np.uint64(b)
    out[nonempty] = vals
    return out


def simhash_fingerprints(ds, *, text_col: str = "text",
                         key_col: str = "doc_id", shingle_n: int = 2,
                         batch_size: int = 8192, concurrency=None):
    def _fp(batch: pa.Table) -> pa.Table:
        fps = simhash_batch(batch.column(text_col).to_pylist(), shingle_n)
        return pa.table({
            key_col: batch.column(key_col),
            "simhash": pa.array(fps, pa.uint64()),
        })

    return ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def simhash_near_duplicates(ds, *, text_col: str = "text",
                            key_col: str = "doc_id", max_hamming: int = 3,
                            shingle_n: int = 2, batch_size: int = 8192,
                            concurrency=None):
    """Pairs with Hamming(simhash) <= max_hamming via 4x16-bit chunk LSH
    (any pair within 3 bits must agree on >=1 chunk)."""
    import pandas as pd

    def _chunks(batch: pa.Table) -> pa.Table:
        fps = simhash_batch(batch.column(text_col).to_pylist(), shingle_n)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        n = len(fps)
        rows = {"chunk": [], "chunk_val": [], "key": [], "simhash": []}
        for c in range(4):
            rows["chunk"].extend([c] * n)
            rows["chunk_val"].extend(
                ((fps >> np.uint64(16 * c)) & np.uint64(0xFFFF)).tolist())
            rows["key"].extend(keys.tolist())
            rows["simhash"].extend(fps.tolist())
        return pa.table({
            "chunk": pa.array(rows["chunk"], pa.int32()),
            "chunk_val": pa.array(rows["chunk_val"], pa.int32()),
            "key": pa.array(rows["key"]),
            "simhash": pa.array(rows["simhash"], pa.uint64()),
        })

    def _pairs(df):
        keys = df["key"].to_numpy()
        fps = df["simhash"].to_numpy().astype(np.uint64)
        out = []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if keys[i] == keys[j]:
                    continue
                d = int(bin(int(fps[i]) ^ int(fps[j])).count("1"))
                if d <= max_hamming:
                    a, b = sorted((keys[i], keys[j]))
                    out.append({"key_a": a, "key_b": b, "hamming": d})
        return pd.DataFrame(out, columns=["key_a", "key_b", "hamming"])

    chunked = ds.map_batches(_chunks, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=batch_size,
                             concurrency=concurrency)
    cand = _hot_bucket_filter(chunked, ["chunk", "chunk_val"])
    pairs = cand.groupby(["chunk", "chunk_val"]).map_groups(
        _pairs, batch_format="pandas")
    from ray.data.aggregate import Min
    agg = pairs.groupby(["key_a", "key_b"]).aggregate(Min("hamming"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"key_a": b.column("key_a"),
                         "key_b": b.column("key_b"),
                         "hamming": b.column("min(hamming)")})

    return agg.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram jaccard (verification kernel)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3,
                  mode: str = "word") -> float:
    def grams(t: str) -> set:
        if mode == "word":
            w = (t or "").lower().split()
            if len(w) < n:
                return {" ".join(w)} if w else set()
            return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
        t = (t or "").lower()
        return {t[i:i + n] for i in range(max(len(t) - n + 1, 0))} or set()

    a, b = grams(text_a), grams(text_b)
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def verify_pairs_jaccard(ds_pairs, docs_ds, *, text_col: str = "text",
                         key_col: str = "doc_id", n: int = 3,
                         threshold: float = 0.6):
    """Exact-jaccard verification of candidate pairs.

    Scale shape: the candidate KEY SET (sparse — near-dup pairs only) is
    collected and broadcast, the corpus is filtered down to candidate docs
    (map-only membership test), and only THOSE texts form the broadcast
    lookup — never the whole corpus.
    """
    import ray

    cand_keys: set = set()
    for row in ds_pairs.select_columns(["key_a", "key_b"]).iter_rows():
        cand_keys.add(row["key_a"])
        cand_keys.add(row["key_b"])
    keys_ref = ray.put(cand_keys)

    def _keep_candidates(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        vals = batch.column(key_col).to_pylist()
        mask = pa.array([v in ks for v in vals])
        return batch.select([key_col, text_col]).filter(mask)

    cand_docs = docs_ds.map_batches(_keep_candidates,
                                    batch_format="pyarrow")
    lookup = {r[key_col]: r[text_col] for r in cand_docs.iter_rows()}
    ref = ray.put(lookup)

    def _verify(batch: pa.Table) -> pa.Table:
        import ray as _ray
        texts = _ray.get(ref)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        jac = [ngram_jaccard(texts.get(a, ""), texts.get(b, ""), n)
               for a, b in zip(ka, kb)]
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        import pyarrow.compute as pc
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return ds_pairs.map_batches(_verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding cosine near-dup (random hyperplane LSH)


def embedding_near_duplicates(ds, *, vec_col: str = "embedding",
                              key_col: str = "vec_id", dim: int = 64,
                              n_planes: int = 12, n_tables: int = 3,
                              threshold: float = 0.95,
                              seed: int = 13, batch_size: int = 8192,
                              concurrency=None):
    """Pairs with cosine >= threshold: random-hyperplane sign-LSH buckets,
    ``n_tables`` independent hash tables (recall boost for pairs straddling
    one table's boundaries).

    Scale shape mirrors minhash: LIGHT (table, bucket, key) rows shuffle
    (the 512-byte vector never does); singleton buckets drop via a native
    count aggregate; candidate pairs are key-only; candidate vectors are
    fetched with one sparse map-only pass and broadcast for scoring.
    """
    import pandas as pd
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes))

    def _bucket(batch: pa.Table) -> pa.Table:
        from engine.similarity import _batch_matrix
        mat = _batch_matrix(batch, vec_col)
        norm = np.linalg.norm(mat, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        unit = mat / norm
        n = len(batch)
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        tables, buckets = [], []
        for ti in range(n_tables):
            signs = (unit @ planes[ti]) > 0
            bucket = np.zeros(n, dtype=np.int64)
            for p in range(n_planes):
                bucket |= signs[:, p].astype(np.int64) << p
            tables.append(np.full(n, ti, dtype=np.int32))
            buckets.append(bucket)
        return pa.table({
            "table": pa.array(np.concatenate(tables)),
            "bucket": pa.array(np.concatenate(buckets)),
            "key": pa.concat_arrays([keys] * n_tables),
        })

    def _key_pairs(df):
        keys = np.unique(df["key"].to_numpy())
        out = [{"key_a": min(keys[i], keys[j]),
                "key_b": max(keys[i], keys[j])}
               for i in range(len(keys)) for j in range(i + 1, len(keys))]
        return pd.DataFrame(out, columns=["key_a", "key_b"])

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size,
                              concurrency=concurrency)
    cand = _hot_bucket_filter(bucketed, ["table", "bucket"])
    pairs = cand.groupby(["table", "bucket"]).map_groups(
        _key_pairs, batch_format="pandas")
    uniq_pairs = pairs.groupby(["key_a", "key_b"]).count()

    pair_rows = uniq_pairs.select_columns(["key_a", "key_b"]).to_pandas()
    cand_keys = set(pair_rows["key_a"]) | set(pair_rows["key_b"])
    keys_ref = ray.put(cand_keys)

    def _fetch_vecs(batch: pa.Table) -> pa.Table:
        from engine.similarity import _batch_matrix, _normalize
        ks = ray.get(keys_ref)
        keys = batch.column(key_col).to_pylist()
        mask = np.array([k in ks for k in keys], dtype=bool)
        if not mask.any():
            return pa.table({"key": pa.array([], batch.schema.field(
                key_col).type), "vec": pa.array([], pa.binary())})
        sub = batch.filter(pa.array(mask))
        unit = _normalize(_batch_matrix(sub, vec_col))
        return pa.table({
            "key": sub.column(key_col),
            "vec": pa.array([unit[i].tobytes() for i in range(len(sub))],
                            pa.binary()),
        })

    vec_lookup = {}
    for row in ds.map_batches(_fetch_vecs, batch_format="pyarrow",
                              batch_size=batch_size).iter_rows():
        vec_lookup[row["key"]] = np.frombuffer(row["vec"], dtype=np.float64)
    vec_ref = ray.put(vec_lookup)

    def _score(batch: pa.Table) -> pa.Table:
        vecs = ray.get(vec_ref)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        out = {"key_a": [], "key_b": [], "cosine": []}
        for a, b in zip(ka, kb):
            va, vb = vecs.get(a), vecs.get(b)
            if va is None or vb is None:
                continue
            cos = float(va @ vb)
            if cos >= threshold:
                out["key_a"].append(a)
                out["key_b"].append(b)
                out["cosine"].append(cos)
        return pa.table({
            "key_a": pa.array(out["key_a"],
                              batch.schema.field("key_a").type),
            "key_b": pa.array(out["key_b"],
                              batch.schema.field("key_b").type),
            "cosine": pa.array(out["cosine"], pa.float64()),
        })

    return uniq_pairs.map_batches(_score, batch_format="pyarrow")
