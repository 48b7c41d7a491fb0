"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the DRIVER before this module is imported; nothing here
calls ``ray.init``/``ray.shutdown``. Each ``queries()`` entry is one operator
/ pipeline from SURVEY.md §2 (plus the training-data operators); each
``oracle_sql()`` entry is the DuckDB-equivalent SQL over the pre-registered
views (region nation customer supplier part orders lineitem events documents
embeddings). Column names match exactly between the Ray result and the SQL.

Float-valued aggregates are rounded half-away-from-zero on BOTH sides (same
decimals) so summation-order differences cannot flip the value hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# helpers

#: below this on-disk size the read is split to cluster width explicitly —
#: a small single-row-group file otherwise becomes ONE block and every
#: downstream map_batches stage runs on one CPU; large tables keep Ray's
#: natural per-file/row-group splitting (an override there would CAP read
#: parallelism, the opposite failure)
_SPLIT_SMALL_READ_BYTES = 256 * 1024 * 1024


def _split_blocks(path: str):
    try:
        if os.path.getsize(path) >= _SPLIT_SMALL_READ_BYTES:
            return None
    except OSError:  # pragma: no cover - remote path
        return None
    from engine.shuffle import reduce_blocks
    return reduce_blocks()


def _docs(sf_dir: str, columns=None):
    return _read(sf_dir, "documents", columns=columns)


def _read(sf_dir: str, name: str, columns=None):
    """Column-pruned parquet read: pass ``columns`` so only the needed
    columns leave storage (Ray does not push projections through
    ``map_batches``; at 100 TB an unpruned scan is the largest wasted-IO
    multiplier)."""
    import ray.data
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=_split_blocks(path))


def _round_half_away(x, decimals: int):
    """Matches DuckDB ROUND (half away from zero), unlike numpy's half-even."""
    f = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(np.asarray(x, dtype=np.float64)) * f
                                 + 0.5) / f


def _round_cols(df, cols: dict):
    for c, d in cols.items():
        df[c] = _round_half_away(df[c].to_numpy(), d)
    return df


#: Typed-validation schema applied to the ``documents`` table — exercises
#: required / type / bounds / length / enum / pattern keywords on real data.
DOCS_SCHEMA_JSON = """
{"type": "object",
 "required": ["doc_id", "text", "lang", "source", "n_chars"],
 "properties": {
   "doc_id": {"type": "integer", "minimum": 0},
   "text":   {"type": "string", "minLength": 1, "maxLength": 400},
   "lang":   {"enum": ["en", "de", "fr", "es"]},
   "source": {"type": "string", "pattern": "^src[0-9]$"},
   "n_chars": {"type": "integer", "minimum": 0, "maximum": 500}}}
"""

#: List-keyword schema applied to ``embeddings`` — array length, per-element
#: bounds, uniqueItems, integer bounds on ``label``.
EMB_SCHEMA_JSON = """
{"type": "object",
 "required": ["vec_id", "embedding", "label"],
 "properties": {
   "vec_id": {"type": "integer", "minimum": 0},
   "embedding": {"type": "array", "minItems": 64, "maxItems": 64,
                  "uniqueItems": true,
                  "items": {"type": "number", "minimum": -0.5,
                            "maximum": 0.45}},
   "label": {"type": "integer", "minimum": 0, "maximum": 8}}}
"""


# ---------------------------------------------------------------------------
# queries

def _q_validate_documents(sf_dir: str):
    from engine.dataset import validate_dataset
    v = validate_dataset(_docs(sf_dir), DOCS_SCHEMA_JSON,
                         key_column="doc_id", carry_columns=(),
                         with_message=False)
    return v.select_columns(["doc_id", "error_kind", "instance_path"])


def _q_validate_embeddings(sf_dir: str):
    from engine.dataset import validate_dataset
    v = validate_dataset(_read(sf_dir, "embeddings"), EMB_SCHEMA_JSON,
                         key_column="vec_id", carry_columns=(),
                         with_message=False)
    return v.select_columns(["vec_id", "error_kind", "instance_path"])


def _q_stats_documents(sf_dir: str):
    from engine.stats import column_stats
    st = column_stats(_docs(sf_dir)).to_pandas()
    st = st[["column", "count", "nulls", "null_rate"]].rename(
        columns={"count": "cnt", "nulls": "n_nulls"})
    return st.sort_values("column").reset_index(drop=True)


def _q_duplicate_keys_lineitem(sf_dir: str):
    from engine.uniqueness import duplicate_keys
    d = duplicate_keys(_read(sf_dir, "lineitem", columns=["l_orderkey"]),
                       key="l_orderkey")

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b.column("key"),
                         "dup_count": b.column("dup_count")})
    return d.map_batches(_rename, batch_format="pyarrow")


def _q_referential_orders(sf_dir: str):
    from engine.referential import count_dangling_fk
    return count_dangling_fk(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        _read(sf_dir, "customer", columns=["c_custkey"]),
        fk="o_custkey", pk="c_custkey")


def _q_referential_lineitem_part(sf_dir: str):
    from engine.referential import count_dangling_fk
    return count_dangling_fk(
        _read(sf_dir, "lineitem", columns=["l_partkey"]),
        _read(sf_dir, "part", columns=["p_partkey"]),
        fk="l_partkey", pk="p_partkey")


def _q_token_doc_frequency(sf_dir: str):
    from engine.textstats import token_doc_frequency
    return token_doc_frequency(_docs(sf_dir, columns=["doc_id", "text"]))


def _q_anti_join_orders(sf_dir: str):
    # exact distributed anti-join against a restricted customer dimension
    # (c_custkey % 7 != 0) so the dangling set is non-empty and checkable
    from engine.referential import dangling_fk_rows

    def _restrict(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_numpy(zero_copy_only=False)
        return b.filter(pa.array((keys % 7) != 0))

    dim = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        _restrict, batch_format="pyarrow")
    d = dangling_fk_rows(_read(sf_dir, "orders", columns=["o_custkey"]), dim,
                         fk="o_custkey", pk="c_custkey")

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b.column("key"),
                         "n_occurrences": b.column("n_occurrences")})
    return d.map_batches(_rename, batch_format="pyarrow")


def _q_dedup_exact(sf_dir: str):
    from engine.dedup import exact_duplicates
    return exact_duplicates(_docs(sf_dir, columns=["doc_id", "text"]))


def _q_token_counts(sf_dir: str):
    from engine.textstats import token_counts
    return token_counts(_docs(sf_dir, columns=["doc_id", "text"]))


def _q_bpe_token_counts(sf_dir: str):
    from engine.textstats import bpe_ish_token_counts
    return bpe_ish_token_counts(_docs(sf_dir, columns=["doc_id", "text"]))


def _q_quality(sf_dir: str):
    import pyarrow.compute as pc
    from engine.textstats import token_count_batch

    def _fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(pc.fill_null(pc.utf8_length(t), 0), pa.int64()),
            "n_tokens": pc.cast(pc.fill_null(token_count_batch(t), 0),
                                pa.int64()),
            "n_punct": pc.cast(pc.fill_null(
                pc.count_substring_regex(t, r"[.,!?;:]"), 0), pa.int64()),
            "n_digits": pc.cast(pc.fill_null(
                pc.count_substring_regex(t, r"[0-9]"), 0), pa.int64()),
        })

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_lang_distribution(sf_dir: str):
    ds = _docs(sf_dir, columns=["lang"]).groupby("lang").count()

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b.column("lang"),
                         "n_docs": b.column("count()")})
    return ds.map_batches(_rename, batch_format="pyarrow")


def _q_q1(sf_dir: str):
    from engine.relational import q1_pricing_summary
    df = q1_pricing_summary(_read(sf_dir, "lineitem", columns=[
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount"])).to_pandas()
    return _round_cols(df, {"sum_qty": 4, "sum_base_price": 4,
                            "sum_disc_price": 4, "avg_qty": 4})


def _q_q5(sf_dir: str):
    """TPC-H Q5: revenue per nation where customer and supplier share an
    ASIA nation, orders in 1996 — six-table join with size-gated
    dimension routing."""
    from engine.relational import q5_local_supplier_volume
    df = q5_local_supplier_volume(
        _read(sf_dir, "lineitem", columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        _read(sf_dir, "orders", columns=[
            "o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        _read(sf_dir, "nation"),
        _read(sf_dir, "region")).to_pandas()
    df = _round_cols(df, {"revenue": 4})
    return df.sort_values("n_name").reset_index(drop=True)


def _q_revenue_by_segment(sf_dir: str):
    from engine.relational import revenue_by_segment
    df = revenue_by_segment(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        _read(sf_dir, "customer",
              columns=["c_custkey", "c_mktsegment"])).to_pandas()
    return _round_cols(df, {"revenue": 4})


def _q_events_window(sf_dir: str):
    from engine.relational import events_per_user_hour
    df = events_per_user_hour(_read(sf_dir, "events", columns=[
        "user_id", "ts", "value"])).to_pandas()
    return _round_cols(df, {"value_sum": 4})


def _q_sessionize(sf_dir: str):
    from engine.relational import sessionize
    return sessionize(_read(sf_dir, "events", columns=["user_id", "ts"]),
                       gap_minutes=30)


def _q_top_event_types(sf_dir: str):
    from engine.relational import top_event_types
    out = top_event_types(_read(sf_dir, "events", columns=["event_type"]),
                          k=5).to_pandas()
    return out.sort_values(["n_events", "event_type"],
                           ascending=[False, True]).reset_index(drop=True)


def _q_top_orders_per_priority(sf_dir: str):
    """Grouped top-k: the 5 highest-value orders per order priority,
    ties broken by o_orderkey — ``row_number()`` window parity."""
    from engine.relational import grouped_topk
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = grouped_topk(orders, group_col="o_orderpriority",
                       score_col="o_totalprice", id_col="o_orderkey", k=5)
    return out.sort(["o_orderpriority", "o_totalprice", "o_orderkey"],
                    descending=[False, True, False])


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq
    from engine.similarity import cosine_topk
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    df = emb.to_pandas().set_index("vec_id")
    qids = [0, 7]
    queries = np.stack([np.asarray(df.loc[q, "embedding"]) for q in qids])
    out = cosine_topk(_read(sf_dir, "embeddings",
                            columns=["vec_id", "embedding"]),
                      queries, k=5).to_pandas()
    out["query_id"] = out["query_id"].map(
        {i: q for i, q in enumerate(qids)}).astype("int32")
    out = _round_cols(out, {"cosine": 4})
    out = out.rename(columns={"key": "vec_id"})
    return out[["query_id", "vec_id", "cosine", "rank"]]


# --- rows-only queries (non-SQL-expressible; weaker driver check) ----------

def _spans_corpus(sf_dir: str, partitions: int = 4):
    from engine.synth import SynthSpans
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        SynthSpans(replicate=1, partitions=partitions, seed=42),
        batch_format="pyarrow", batch_size=4096)


def _q_validate_spans(sf_dir: str):
    from engine.dataset import validate_dataset
    v = validate_dataset(_spans_corpus(sf_dir))
    return v.select_columns(["doc_id", "error_seq", "error_kind",
                             "instance_path", "message"])


def _q_spans_verdicts(sf_dir: str):
    from engine.dataset import partition_verdicts
    return partition_verdicts(_spans_corpus(sf_dir))


def _q_spans_drift(sf_dir: str):
    from engine.drift import build_baseline, drift_check
    ds = _spans_corpus(sf_dir)
    baseline = build_baseline(ds, exclude_partitions=["p0003"])
    return drift_check(_spans_corpus(sf_dir), baseline)


def _q_spans_dangling_refs(sf_dir: str):
    import ray.data
    from engine.referential import check_references
    from engine.synth import CATALOG_SIZE, media_ref_for
    catalog = ray.data.from_arrow(pa.table({
        "media_ref": [media_ref_for(i) for i in range(CATALOG_SIZE)]}))
    return check_references(_spans_corpus(sf_dir), catalog, exact=True)


def _q_spans_stats(sf_dir: str):
    from engine.stats import column_stats
    return column_stats(_spans_corpus(sf_dir))


def _q_minhash_near_dup(sf_dir: str):
    from engine.dedup import minhash_near_duplicates
    return minhash_near_duplicates(_docs(sf_dir, columns=["doc_id", "text"]),
                                   threshold=0.5)


def _q_simhash(sf_dir: str):
    from engine.dedup import simhash_fingerprints

    def _cast(b: pa.Table) -> pa.Table:
        # uint64 -> hex string for portable hashing by the driver
        # (np.char.mod formats the whole column in one call — no per-row
        # Python loop)
        v = b.column("simhash").to_numpy(zero_copy_only=False)
        hx = np.char.mod("%016x", v.astype(np.uint64))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "simhash": pa.array(hx.tolist(), pa.string())})
    return simhash_fingerprints(
        _docs(sf_dir, columns=["doc_id", "text"])).map_batches(
        _cast, batch_format="pyarrow")


def _q_embedding_near_dup(sf_dir: str):
    """Embedding near-dup over the embeddings table augmented with planted
    exact copies (vec_id + 1_000_000 for vec_id < 20) so the answer is
    non-empty and SQL-checkable: identical vectors land in the same LSH
    bucket in every table (guaranteed recall), cosine = 1.0 >= 0.99; the max
    organic pairwise cosine in the synthetic corpus is ~0.51."""
    import pyarrow.compute as pc
    from engine.dedup import embedding_near_duplicates
    base = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _planted(b: pa.Table) -> pa.Table:
        sub = b.filter(pc.less(b.column("vec_id"), 20))
        return pa.table({
            "vec_id": pc.add(sub.column("vec_id"), 1_000_000),
            "embedding": sub.column("embedding")})

    aug = base.union(base.map_batches(_planted, batch_format="pyarrow"))
    out = embedding_near_duplicates(aug, threshold=0.99)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "key_a": b.column("key_a"), "key_b": b.column("key_b"),
            "cosine": pa.array(_round_half_away(
                b.column("cosine").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow")


def _q_jaccard_verify(sf_dir: str):
    """Exact n-gram Jaccard verification of a deterministic candidate-pair
    set (consecutive doc_ids among the first 200 docs), SQL-checkable via
    DuckDB list_intersect over split word-3-gram shingles."""
    import ray.data
    from engine.dedup import verify_pairs_jaccard
    n_pairs = 199
    pairs = ray.data.from_arrow(pa.table({
        "key_a": pa.array(list(range(0, n_pairs)), pa.int64()),
        "key_b": pa.array(list(range(1, n_pairs + 1)), pa.int64())}))
    out = verify_pairs_jaccard(
        pairs, _docs(sf_dir, columns=["doc_id", "text"]),
        n=3, threshold=0.0)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "key_a": b.column("key_a"), "key_b": b.column("key_b"),
            "jaccard": pa.array(_round_half_away(
                b.column("jaccard").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow")


def _q_embedding_dup_clusters(sf_dir: str):
    """Connected components over embedding near-dup pairs: plant one extra
    copy of vec_id < 20 and a second copy of vec_id < 10, so components of
    size 3 (transitive closure across two planted pairs) and 2 both occur.
    Identical vectors co-bucket in every LSH table (guaranteed recall) and
    the max organic cosine in the corpus is ~0.51, so the SQL brute-force
    pair set matches the LSH candidate set exactly at threshold 0.99."""
    import pyarrow.compute as pc
    from engine.dedup import embedding_near_duplicates
    from engine.cluster import connected_components
    base = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _planted(limit: int, offset: int):
        def _fn(b: pa.Table) -> pa.Table:
            sub = b.filter(pc.less(b.column("vec_id"), limit))
            return pa.table({
                "vec_id": pc.add(sub.column("vec_id"), offset),
                "embedding": sub.column("embedding")})
        return _fn

    aug = base.union(
        base.map_batches(_planted(20, 1_000_000), batch_format="pyarrow"),
        base.map_batches(_planted(10, 2_000_000), batch_format="pyarrow"))
    pairs = embedding_near_duplicates(aug, threshold=0.99)
    comps = connected_components(pairs)

    def _name(b: pa.Table) -> pa.Table:
        return pa.table({"vec_id": b.column("node"),
                         "cluster_id": b.column("cluster_id")})
    return comps.map_batches(_name, batch_format="pyarrow").sort("vec_id")


def _q_near_dup_survivors(sf_dir: str):
    """Deduplicated corpus view: every near-dup cluster keeps only its
    minimum doc_id (resolve_duplicates over the oracled cluster edges);
    singletons pass through. Output = surviving doc_ids."""
    from engine.cluster import resolve_near_duplicates
    # max_bucket_size=None UNCAPS the shingle blocking — required for
    # oracle parity (the SQL self-join is flood-blind); scale runs keep
    # the safe capped default
    out = resolve_near_duplicates(_docs(sf_dir, columns=["doc_id", "text"]),
                                  threshold=0.6, max_bucket_size=None)

    def _ids(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id")})
    return out.map_batches(_ids, batch_format="pyarrow").sort("doc_id")


def _q_train_test_contamination(sf_dir: str):
    """Benchmark decontamination: near-dup pairs ACROSS a deterministic
    train/test split of the documents table (doc_id % 5 == 0 is the test
    side). The shingle-blocked generator is exact, so DuckDB reproduces
    the pair set and jaccard values bit-for-bit."""
    import pyarrow.compute as pc
    from engine.contamination import cross_corpus_near_duplicates
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def _side(keep_test: bool):
        def _fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 5) == 0
            return b.filter(pa.array(m if keep_test else ~m))
        return _fn

    train = docs.map_batches(_side(False), batch_format="pyarrow")
    test = docs.map_batches(_side(True), batch_format="pyarrow")
    out = cross_corpus_near_duplicates(train, test, threshold=0.6,
                                       method="shingle",
                                       max_bucket_size=None)

    def _name(b: pa.Table) -> pa.Table:
        return pa.table({
            "train_id": b.column("key_a"), "test_id": b.column("key_b"),
            "jaccard": pa.array(_round_half_away(
                b.column("jaccard").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_name, batch_format="pyarrow") \
        .sort(["train_id", "test_id"])


def _q_near_dup_clusters(sf_dir: str):
    """Near-dup cluster resolution: shingle-blocked candidates -> exact
    word-3-gram jaccard >= 0.6 edges -> connected components (one row per
    clustered doc, cluster_id = min member). The candidate blocking is
    exact (docs sharing any shingle), so the whole pipeline is
    SQL-expressible: DuckDB reproduces the edges via a distinct-gram
    self-join and the components via a recursive-CTE reachability closure.
    Hash-collision extra candidates cannot change the edge set — a pair
    passing jaccard >= 0.6 > 0 must share a real gram (engine/cluster.py).
    """
    from engine.cluster import near_dup_clusters
    out = near_dup_clusters(_docs(sf_dir, columns=["doc_id", "text"]),
                            threshold=0.6, max_bucket_size=None)

    def _name(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("node"),
                         "cluster_id": b.column("cluster_id")})
    return out.map_batches(_name, batch_format="pyarrow") \
        .sort("doc_id")


def _q_ivf_topk(sf_dir: str):
    import pyarrow.parquet as pq
    from engine.similarity import ivf_topk, train_codebook
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).to_pandas()
    queries = np.stack([np.asarray(v)
                        for v in emb["embedding"].head(3)])
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cb = train_codebook(ds, n_cells=8)
    return ivf_topk(ds, queries, cb, k=5, nprobe=4)


def _q_heavy_hitters(sf_dir: str):
    """SpaceSaving heavy-hitter tokens, shuffle-free. The documents
    vocabulary is far below the sketch capacity, so no counter is ever
    evicted and the sketch is EXACT — making the exhaustive SQL top-k a
    valid hash oracle (max_error provably 0)."""
    from engine.textstats import heavy_hitter_tokens
    return heavy_hitter_tokens(_docs(sf_dir, columns=["doc_id", "text"]),
                               k=20, capacity=4096)


def _q_langid(sf_dir: str):
    """Marker-word language id; both sides count matches with RE2 (pyarrow
    count_substring_regex here, DuckDB regexp_extract_all in the oracle), so
    scores are bit-identical IEEE divisions of the same integer counts."""
    from engine.textstats import language_id
    out = language_id(_docs(sf_dir, columns=["doc_id", "text"]))

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang_pred": b.column("lang_pred"),
            "lang_score": pa.array(_round_half_away(
                b.column("lang_score").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow")


def _q_fingerprints(sf_dir: str):
    from engine.textstats import fingerprints
    return fingerprints(_docs(sf_dir, columns=["doc_id", "text"]))


def _q_infer_schema_documents(sf_dir: str):
    """Reverse codegen (C10): infer a JSON Schema from the documents table's
    Arrow schema, one row per property with its schema fragment."""
    import json as _json
    import pyarrow.parquet as pq
    from engine.schema_compiler import arrow_schema_to_json_schema
    sch = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).schema_arrow
    inferred = arrow_schema_to_json_schema(sch)
    rows = [{"property": k, "fragment": _json.dumps(v, sort_keys=True)}
            for k, v in sorted(inferred["properties"].items())]
    return pa.Table.from_pylist(rows)


def _q_audio_features(sf_dir: str):
    import ray.data
    from engine.multimodal import audio_features, synth_media_table
    from engine.synth import media_ref_for
    refs = [media_ref_for(i) for i in range(200)]
    ds = ray.data.from_arrow(synth_media_table(refs))
    out = audio_features(ds, n_samples=1024, batch_size=32).to_pandas()
    out["audio_features"] = out["audio_features"].map(
        lambda a: np.asarray(a, dtype=np.float32).tolist())
    return out


def _q_multimodal_features(sf_dir: str):
    import ray.data
    from engine.multimodal import decode_and_featurize, synth_media_table
    from engine.synth import media_ref_for
    refs = [media_ref_for(i) for i in range(200)]
    ds = ray.data.from_arrow(synth_media_table(refs))
    out = decode_and_featurize(ds, target=16, batch_size=32).to_pandas()
    out["features"] = out["features"].map(
        lambda a: np.asarray(a, dtype=np.float32).tolist())
    return out


def _q_train_test_split(sf_dir: str):
    from engine.sampling import assign_split
    out = assign_split(_docs(sf_dir, columns=["doc_id"]), key_col="doc_id",
                       train_frac=0.9)
    return out.select_columns(["doc_id", "split"])


def _q_sample_fraction(sf_dir: str):
    from engine.sampling import sample_fraction
    out = sample_fraction(_docs(sf_dir, columns=["doc_id"]), 0.25,
                          key_col="doc_id")
    return out.select_columns(["doc_id"])


def _q_exact_quantiles(sf_dir: str):
    """Exact quantile_cont over l_extendedprice via the distributed
    selection operator (three map-only passes; the corpus never shuffles)
    — bit-compatible with DuckDB's interpolation."""
    from engine.stats import exact_quantiles
    qs = [0.25, 0.5, 0.75, 0.95]
    got = exact_quantiles(
        _read(sf_dir, "lineitem", columns=["l_extendedprice"]),
        "l_extendedprice", qs)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value": pa.array(_round_half_away(
            np.array([got[q] for q in qs]), 4), pa.float64())})


def _q_asof_last_purchase(sf_dir: str):
    """Point-in-time join: for every non-purchase event, the value of the
    user's latest purchase at or before the event (DuckDB ASOF JOIN
    parity; right-side ties dedup to the greatest event_id)."""
    from engine.relational import asof_join
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _split(want_purchase: bool):
        def _fn(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = pc.equal(b.column("event_type"), "purchase")
            return b.filter(m if want_purchase else pc.invert(m))
        return _fn

    left = ev.map_batches(_split(False), batch_format="pyarrow")
    right = ev.map_batches(_split(True), batch_format="pyarrow")
    out = asof_join(left, right)

    def _name(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({
            "event_id": b.column("event_id"),
            "last_purchase_value": _pc.cast(b.column("value"),
                                            pa.float64())})
    return out.map_batches(_name, batch_format="pyarrow").sort("event_id")


def _q_events_after_purchase(sf_dir: str):
    """Range join: every non-purchase event inside the 2-hour window after
    a purchase by the same user (overlapping windows emit one row per
    match) — bounded-length interval-join parity with a DuckDB
    inequality join."""
    from engine.relational import interval_join
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def _points(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return b.filter(_pc.invert(_pc.equal(b.column("event_type"),
                                             "purchase")))

    def _windows(df):
        import pandas as pd
        sub = df[df["event_type"] == "purchase"]
        return pd.DataFrame({
            "purchase_id": sub["event_id"].to_numpy(),
            "user_id": sub["user_id"].to_numpy(),
            "start": sub["ts"].to_numpy(),
            "end": sub["ts"].to_numpy() + np.timedelta64(2, "h")})

    out = interval_join(
        ev.map_batches(_points, batch_format="pyarrow"),
        ev.map_batches(_windows, batch_format="pandas"),
        max_duration_s=7200.0, interval_id_col="purchase_id")
    return out.select_columns(["event_id", "purchase_id"]) \
        .sort(["event_id", "purchase_id"])


def _q_rolling_user_mean(sf_dir: str):
    """Per-user trailing 3-hour rolling mean of event values — RANGE-frame
    window parity (tie peers included, composite-timestamp vectorization,
    no per-user Python loop)."""
    from engine.relational import rolling_window_mean
    out = rolling_window_mean(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]),
        window_seconds=3 * 3600)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "rolling_mean": pa.array(_round_half_away(
                b.column("rolling_mean").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_pack_sequences(sf_dir: str):
    """Shard-local next-fit sequence packing (token budget 512, shard =
    doc_id // 128) — recursive-CTE recurrence parity."""
    from engine.textstats import pack_sequences
    out = pack_sequences(_docs(sf_dir, columns=["doc_id", "text"]),
                         token_budget=512, shard_size=128)
    return out.sort("doc_id")


def _q_pack_sequences_bpe(sf_dir: str):
    """Tokenizer-aware packing: same shard-local next-fit, but bins sized
    by the BPE-ish proxy token count (letter runs + single digits +
    punctuation) — punctuation-heavy docs pack into more bins than their
    whitespace length suggests."""
    from engine.textstats import pack_sequences
    out = pack_sequences(_docs(sf_dir, columns=["doc_id", "text"]),
                         token_budget=512, shard_size=128, counter="bpe")
    return out.sort("doc_id")


def _q_pii_flags(sf_dir: str):
    """PII pattern counts over documents with deterministically planted
    markers (the synthetic corpus has no organic PII): doc_id % 7 == 0
    gains an email, % 11 == 0 an IPv4 — both sides reproduce the
    augmentation, and pyarrow + DuckDB share RE2 semantics."""
    from engine.textstats import pii_flags
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def _plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        import pyarrow.compute as _pc
        base = _pc.fill_null(_pc.cast(b.column("text"), pa.string()), "")
        texts = base.to_pylist()
        out = [t + (f" contact_{i}@example.com" if i % 7 == 0 else "")
               + (f" ip 10.0.0.{i % 256}" if i % 11 == 0 else "")
               for i, t in zip(ids, texts)]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    return pii_flags(docs.map_batches(_plant, batch_format="pyarrow")) \
        .sort("doc_id")


def _q_redact_pii(sf_dir: str):
    """Redacted view of the planted-marker corpus (same augmentation as
    pii_flags_docs): every PII match replaced with its typed tag, in the
    operator's fixed pattern order — regexp_replace(…, 'g') parity."""
    from engine.textstats import redact_pii
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def _plant(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        base = _pc.fill_null(_pc.cast(b.column("text"), pa.string()), "")
        texts = base.to_pylist()
        out = [t + (f" contact_{i}@example.com" if i % 7 == 0 else "")
               + (f" ip 10.0.0.{i % 256}" if i % 11 == 0 else "")
               for i, t in zip(ids, texts)]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    return redact_pii(docs.map_batches(_plant, batch_format="pyarrow")) \
        .sort("doc_id")


def _q_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality signal per document (no SQL analog
    — rows-only; differential-tested against zlib directly)."""
    from engine.textstats import compression_ratio
    out = compression_ratio(_docs(sf_dir, columns=["doc_id", "text"]))
    return out.sort("doc_id")


def _q_ngram_novelty(sf_dir: str):
    """Novelty of docs doc_id >= 100 vs the doc_id < 100 reference corpus
    (fraction of distinct word 3-grams absent from the reference) — the
    exact broadcast mode, SQL-reproducible via a left join on unnested
    distinct grams."""
    import pyarrow.compute as _pc
    from engine.textstats import ngram_novelty
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def _side(ref: bool):
        def _fn(b: pa.Table) -> pa.Table:
            m = _pc.less(b.column("doc_id"), 100)
            return b.filter(m if ref else _pc.invert(m))
        return _fn

    out = ngram_novelty(docs.map_batches(_side(False),
                                         batch_format="pyarrow"),
                        docs.map_batches(_side(True),
                                         batch_format="pyarrow"))
    return out.sort("doc_id")


def _q_percentile_rank_events(sf_dir: str):
    """Exact per-row percentile rank of events.value —
    percent_rank() window parity."""
    from engine.stats import percentile_rank
    out = percentile_rank(
        _read(sf_dir, "events", columns=["event_id", "value"]),
        "value", id_col="event_id")
    return out.sort("event_id")


def _q_ewma_user_value(sf_dir: str):
    """Per-user EWMA of event values in (ts, event_id) order — recurrence
    parity with a DuckDB recursive CTE."""
    from engine.relational import ewma
    out = ewma(_read(sf_dir, "events",
                     columns=["event_id", "ts", "user_id", "value"]),
               alpha=0.3)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "ewma": pa.array(_round_half_away(
                b.column("ewma").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_ewma_halflife_user_value(sf_dir: str):
    """Per-user TIME-DECAYED EWMA of event values (halflife 1 h): weights
    halve per hour of elapsed time, not per row — recurrence parity with
    a DuckDB recursive CTE carrying (w, y) in pandas' exact op order."""
    from engine.relational import ewma_halflife
    out = ewma_halflife(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]),
        halflife_seconds=3600.0)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "ewma_hl": pa.array(_round_half_away(
                b.column("ewma_hl").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_lag_diff_user_value(sf_dir: str):
    """Per-user first difference of event values in (ts, event_id) order
    — ``value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` parity; first row of each user is NULL."""
    from engine.relational import lag_diff
    out = lag_diff(_read(sf_dir, "events",
                         columns=["event_id", "ts", "user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        v = b.column("lag_diff").to_numpy(zero_copy_only=False)
        r = _round_half_away(v, 4)
        return pa.table({
            "event_id": b.column("event_id"),
            "lag_diff": pa.array([None if np.isnan(x) else float(x)
                                  for x in r], pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_grouped_moments_lineitem(sf_dir: str):
    """Per-returnflag count/mean/sample-stddev/min/max of
    l_extendedprice from one-pass sufficient-statistics combiners."""
    from engine.stats import grouped_moments
    out = grouped_moments(
        _read(sf_dir, "lineitem", columns=["l_returnflag",
                                           "l_extendedprice"]),
        group_col="l_returnflag", value_col="l_extendedprice")

    def _round(b: pa.Table) -> pa.Table:
        def r4(c):
            return pa.array(_round_half_away(
                b.column(c).to_numpy(zero_copy_only=False), 4),
                pa.float64())
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "n": b.column("n"), "mean": r4("mean"),
            "std_samp": r4("std_samp"),
            "vmin": r4("vmin"), "vmax": r4("vmax")})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort("l_returnflag")


def _q_grouped_corr_lineitem(sf_dir: str):
    """Per-returnflag Pearson correlation of (l_quantity,
    l_extendedprice) from one-pass sufficient statistics."""
    from engine.stats import grouped_corr
    out = grouped_corr(
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_quantity", "l_extendedprice"]),
        group_col="l_returnflag", x_col="l_quantity",
        y_col="l_extendedprice")

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "n": b.column("n"),
            "pearson_r": pa.array(_round_half_away(
                b.column("corr").to_numpy(zero_copy_only=False), 6),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort("l_returnflag")


def _q_winsorize_events(sf_dir: str):
    """events.value clipped to its exact [p05, p95] quantile fences (the
    fences from the distributed selection operator, quantile_cont-exact)."""
    from engine.stats import winsorize
    out = winsorize(_read(sf_dir, "events", columns=["event_id", "value"]),
                    "value", lower_q=0.05, upper_q=0.95)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "value": pa.array(_round_half_away(
                b.column("value").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_distinct_users(sf_dir: str):
    """Exact distinct users per event type — the two-level count-distinct
    shape (in-batch pair dedup, pair-hash co-location, bounded final
    sum)."""
    from engine.relational import count_distinct
    out = count_distinct(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        group_col="event_type", value_col="user_id")
    return out.sort("event_type")


def _q_histogram_orders(sf_dir: str):
    """20-bin histogram of o_totalprice over [0, 600000] — identical
    float64 binning expression on both engines."""
    from engine.stats import value_histogram
    out = value_histogram(_read(sf_dir, "orders", columns=["o_totalprice"]),
                          "o_totalprice", lo=0.0, hi=600000.0, bins=20)
    return out.sort("bin")


def _q_grouped_quantiles(sf_dir: str):
    """Per-return-flag exact quantiles of l_extendedprice —
    group-quantile_cont parity."""
    from engine.stats import grouped_quantiles
    out = grouped_quantiles(
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_extendedprice"]),
        group_col="l_returnflag", value_col="l_extendedprice",
        qs=[0.5, 0.9])

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "q": b.column("q"),
            "value": pa.array(_round_half_away(
                b.column("value").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["l_returnflag", "q"])


def _q_outlier_events(sf_dir: str):
    """Tukey-fence outliers on events.value — fences from the exact
    quantile operator, so the flagged row set is deterministic and
    SQL-reproducible."""
    from engine.stats import iqr_outliers
    out = iqr_outliers(_read(sf_dir, "events",
                             columns=["event_id", "value"]), "value")
    return out.select_columns(["event_id", "value"]).sort("event_id")


def _q_stratified_sample(sf_dir: str):
    """Per-language stratified sample of documents: 30% of 'en', 10% of
    'de', 5% of everything else — deterministic md5 buckets salted with
    the stratum, SQL-reproducible."""
    from engine.sampling import stratified_sample
    out = stratified_sample(
        _docs(sf_dir, columns=["doc_id", "lang"]),
        {"en": 0.30, "de": 0.10}, strat_col="lang", key_col="doc_id",
        default_frac=0.05)
    return out.select_columns(["doc_id", "lang"]).sort("doc_id")


def _q_events_props_validation(sf_dir: str):
    from engine.dataset import validate_json_column
    schema = ('{"type":"object","required":["k"],'
              '"properties":{"k":{"type":"integer","minimum":0,'
              '"maximum":50}}}')
    out = validate_json_column(
        _read(sf_dir, "events", columns=["event_id", "props"]), schema,
        column="props", key_column="event_id")
    return out.select_columns(["event_id", "error_seq", "error_kind",
                               "instance_path"])


def _q_q3(sf_dir: str):
    from engine.relational import q3_shipping_priority
    return q3_shipping_priority(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice",
                                           "l_discount", "l_shipdate"]),
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"]),
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]))


#: Second documents schema for the one-pass multi-schema query: stricter
#: bounds so its violation set differs from DOCS_SCHEMA_JSON.
DOCS_SCHEMA_STRICT_JSON = """
{"type": "object",
 "required": ["doc_id", "text"],
 "properties": {
   "text":   {"type": "string", "minLength": 20},
   "n_chars": {"type": "integer", "maximum": 200}}}
"""


def _q_multi_validate(sf_dir: str):
    """C1's dataset face: N schemas validated in ONE corpus pass
    (MultiValidateBatch), violations tagged with schema_name — one scan
    replaces N at 100 TB."""
    from engine.dataset import validate_dataset_multi
    v = validate_dataset_multi(
        _docs(sf_dir),
        {"base": DOCS_SCHEMA_JSON, "strict": DOCS_SCHEMA_STRICT_JSON},
        key_column="doc_id")
    return v.select_columns(["schema_name", "doc_id", "error_kind",
                             "instance_path"])


def _q_streaming_dedup(sf_dir: str):
    """Streaming exact dedup: documents replayed as four doc_id-ordered
    micro-batches through the Bloom+exact seen-state operator; the union
    of emitted keeps must equal batch exact dedup (min doc_id per md5) —
    which is exactly the DuckDB oracle."""
    import tempfile
    import pyarrow.compute as _pc
    from engine.streaming import stream_dedup_micro_batch
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    n = docs.count()
    size = (n + 3) // 4
    state = tempfile.mkdtemp(prefix="streamdedup_")
    kept = []
    for i in range(4):
        lo_k, hi_k = i * size, (i + 1) * size

        def _slice(b: pa.Table, lo_k=lo_k, hi_k=hi_k) -> pa.Table:
            ids = b.column("doc_id")
            return b.filter(_pc.and_(_pc.greater_equal(ids, lo_k),
                                     _pc.less(ids, hi_k)))
        out, _ = stream_dedup_micro_batch(
            docs.map_batches(_slice, batch_format="pyarrow"), state,
            batch_id=f"b{i}")
        df = out.to_pandas()  # keeps are a Dataset; small at test sf
        if "doc_id" in df.columns and len(df):
            kept.append(pa.table({"doc_id": pa.array(
                df["doc_id"].to_numpy(), pa.int64())}))
    t = pa.concat_tables(kept)
    return pa.table({"doc_id": t.column("doc_id")}).sort_by("doc_id")


def _q_streaming_windows(sf_dir: str):
    """Micro-batch streaming windows: the events table replayed as three
    time-ordered micro-batches through the watermark operator; with in-order
    arrival the union of closed + flushed windows must equal the plain
    (user, hour) groupby — which is exactly the DuckDB oracle."""
    import tempfile
    import pyarrow.compute as pc
    from engine.streaming import flush, process_micro_batch

    import pandas as pd
    from ray.data.aggregate import Max, Min
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    bounds = ev.aggregate(Min("ts"), Max("ts"))
    lo = pd.Timestamp(bounds["min(ts)"])
    hi = pd.Timestamp(bounds["max(ts)"])
    cuts = [pa.scalar((lo + (hi - lo) * i / 3).to_datetime64(),
                      pa.timestamp("us")) for i in (1, 2)]
    sd = tempfile.mkdtemp(prefix="stream_state_")
    parts = []

    def _between(lo_c, hi_c):
        def _fn(b: pa.Table) -> pa.Table:
            ts = pc.cast(b.column("ts"), pa.timestamp("us"))
            mask = pa.array(np.ones(len(b), dtype=bool))
            if lo_c is not None:
                mask = pc.and_(mask, pc.greater_equal(ts, lo_c))
            if hi_c is not None:
                mask = pc.and_(mask, pc.less(ts, hi_c))
            return b.filter(mask)
        return _fn

    slices = [
        ev.map_batches(_between(None, cuts[0]), batch_format="pyarrow"),
        ev.map_batches(_between(cuts[0], cuts[1]), batch_format="pyarrow"),
        ev.map_batches(_between(cuts[1], None), batch_format="pyarrow"),
    ]
    for sl in slices:
        closed, _ = process_micro_batch(
            sl, sd, key_col="user_id", ts_col="ts", value_col="value",
            window="1h", allowed_lateness="30m")
        parts.append(closed)
    parts.append(flush(sd))
    # closed windows are Datasets now; small at test sf — collect the
    # arrow blocks (empty ones come out schemaless, drop them)
    import ray as _ray
    tbls = []
    for p in parts:
        for r in p.to_arrow_refs():
            t = _ray.get(r)
            if t.num_columns and len(t):
                tbls.append(t)
    out = pa.concat_tables(tbls)
    return pa.table({
        "user_id": out.column("key"),
        "window_start": out.column("window_start"),
        "n_events": out.column("n_events"),
        "value_sum": pa.array(_round_half_away(
            out.column("value_sum").to_numpy(zero_copy_only=False), 4),
            pa.float64())})


def _q_latest_event_per_user(sf_dir: str):
    """Log compaction: each user's single most recent event by
    (ts, event_id) — ``row_number() OVER (PARTITION BY user_id ORDER BY
    ts DESC, event_id DESC) = 1`` parity; all columns pass through."""
    from engine.relational import keep_latest
    out = keep_latest(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]),
        key_col="user_id", ts_col="ts", id_col="event_id")
    return out.select_columns(["user_id", "event_id", "ts", "value"]) \
        .sort("user_id")


def _q_pivot_events_value(sf_dir: str):
    """Per-user value sums pivoted over the five declared event types —
    ``coalesce(sum(value) FILTER (WHERE event_type = v), 0)`` per
    column."""
    from engine.relational import pivot_agg
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = pivot_agg(
        _read(sf_dir, "events",
              columns=["user_id", "event_type", "value"]),
        group_col="user_id", pivot_col="event_type", value_col="value",
        values=kinds)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            **{f"sum_{k}": pa.array(_round_half_away(
                b.column(f"sum_{k}").to_numpy(zero_copy_only=False), 4),
                pa.float64()) for k in kinds}})
    return out.map_batches(_round, batch_format="pyarrow").sort("user_id")


def _hi_value_users(sf_dir: str, kind: str):
    """Events of one type with value > 95, projected to user_id — the
    filtered side of the set-op queries (vectorized Arrow filter)."""
    import pyarrow.compute as pc

    def _keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("event_type"), kind),
                    pc.greater(b.column("value"), 95.0))
        return b.filter(m).select(["user_id"])

    return _read(sf_dir, "events",
                 columns=["user_id", "event_type", "value"]) \
        .map_batches(_keep, batch_format="pyarrow")


def _q_click_not_purchase_users(sf_dir: str):
    """Distinct users with a high-value (>95) click but NO high-value
    purchase — SQL EXCEPT parity over two filtered event sets."""
    from engine.relational import except_distinct
    return except_distinct(_hi_value_users(sf_dir, "click"),
                           _hi_value_users(sf_dir, "purchase"),
                           key_col="user_id").sort("user_id")


def _q_click_and_purchase_users(sf_dir: str):
    """Distinct users with BOTH a high-value click and a high-value
    purchase — SQL INTERSECT parity over two filtered event sets."""
    from engine.relational import intersect_distinct
    return intersect_distinct(_hi_value_users(sf_dir, "click"),
                              _hi_value_users(sf_dir, "purchase"),
                              key_col="user_id").sort("user_id")


def _q_click_xor_purchase_users(sf_dir: str):
    """Distinct users with a high-value click or purchase but NOT both —
    SQL ``(a EXCEPT b) UNION (b EXCEPT a)`` parity in one pass."""
    from engine.relational import symmetric_difference_distinct
    return symmetric_difference_distinct(
        _hi_value_users(sf_dir, "click"),
        _hi_value_users(sf_dir, "purchase"),
        key_col="user_id").sort("user_id")


def _q_session_value_sums(sf_dir: str):
    """Gap-based sessions with per-session value SUM and non-NULL count
    in the same vectorized pass as sessionization."""
    from engine.relational import session_aggregate
    out = session_aggregate(
        _read(sf_dir, "events", columns=["user_id", "ts", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("value_sum").to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "user_id": b.column("user_id"),
            "session_id": b.column("session_id"),
            "n_events": b.column("n_events"),
            "session_start": b.column("session_start"),
            "session_end": b.column("session_end"),
            "value_sum": pa.array([None if np.isnan(x) else float(x)
                                   for x in v], pa.float64()),
            "n_values": b.column("n_values")})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["user_id", "session_id"])


def _q_mode_event_type_per_user(sf_dir: str):
    """Each user's most frequent event type, ties to the
    lexicographically smallest — deterministic mode with max-count /
    min-value join parity."""
    from engine.relational import grouped_mode
    return grouped_mode(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        group_col="user_id", value_col="event_type") \
        .sort("user_id")


def _q_running_sum_user_value(sf_dir: str):
    """Per-user cumulative event-value sum in (ts, event_id) order —
    ``coalesce(sum(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING), 0)`` parity."""
    from engine.relational import running_sum
    out = running_sum(_read(sf_dir, "events",
                            columns=["event_id", "ts", "user_id",
                                     "value"]))

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "running_sum": pa.array(_round_half_away(
                b.column("running_sum").to_numpy(zero_copy_only=False),
                4), pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_rolling_user_sum(sf_dir: str):
    """Per-user trailing 3-hour rolling value SUM and non-NULL COUNT —
    RANGE-frame window parity (tie peers included, SQL NULL
    semantics)."""
    from engine.relational import rolling_window_sum_count
    out = rolling_window_sum_count(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        v = b.column("rolling_sum").to_numpy(zero_copy_only=False)
        r = _round_half_away(v, 4)
        return pa.table({
            "event_id": b.column("event_id"),
            "rolling_sum": pa.array([None if np.isnan(x) else float(x)
                                     for x in r], pa.float64()),
            "rolling_n": b.column("rolling_n")})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_rolling_user_min_max(sf_dir: str):
    """Per-user trailing 3-hour rolling value MIN and MAX — RANGE-frame
    window parity (tie peers included; NULL values ignored; an all-NULL
    frame reports NULL), computed by a sparse-table range reduce over
    the shared frame bounds."""
    from engine.relational import rolling_window_min_max
    out = rolling_window_min_max(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        def _col(name):
            v = _round_half_away(
                b.column(name).to_numpy(zero_copy_only=False), 4)
            return pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64())
        return pa.table({"event_id": b.column("event_id"),
                         "rolling_min": _col("rolling_min"),
                         "rolling_max": _col("rolling_max")})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_window_ranks_events(sf_dir: str):
    """Per-user ROW_NUMBER / RANK / DENSE_RANK of event values ascending
    (NULLS LAST; row_number tie-broken by event_id) — window-rank
    parity."""
    from engine.relational import window_ranks
    return window_ranks(
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "value"])).sort("event_id")


def _q_tfidf_top_terms(sf_dir: str):
    """Top-5 TF-IDF terms per document (tf * ln(N/df), whitespace
    tokens, ties to the lexicographically smallest token)."""
    from engine.textstats import tfidf_topk
    out = tfidf_topk(_read(sf_dir, "documents",
                           columns=["doc_id", "text"]), k=5)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "token": b.column("token"),
            "tf": b.column("tf"),
            "score": pa.array(_round_half_away(
                b.column("score").to_numpy(zero_copy_only=False), 6),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["doc_id", "token"])


def _q_label_centroids(sf_dir: str):
    """Per-label mean embedding vector (long format: label, dim, value)
    — one-pass scatter-add combiner, elementwise-avg parity."""
    from engine.similarity import grouped_centroids
    out = grouped_centroids(
        _read(sf_dir, "embeddings", columns=["label", "embedding"]),
        group_col="label", vec_col="embedding", dim=64)

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": b.column("label"),
            "dim": b.column("dim"),
            "value": pa.array(_round_half_away(
                b.column("value").to_numpy(zero_copy_only=False), 6),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["label", "dim"])


def _q_quantile_buckets_events(sf_dir: str):
    """Equal-frequency quartile bucket per event value — exact
    quantile_cont fences from the distributed selection, then a map-only
    searchsorted assign (``1 + (v > q1) + (v > q2) + (v > q3)``
    parity)."""
    from engine.stats import quantile_buckets
    out = quantile_buckets(
        _read(sf_dir, "events", columns=["event_id", "value"]), "value")

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b.column("event_id"),
                         "bucket": b.column("bucket")})
    return out.map_batches(_proj, batch_format="pyarrow").sort("event_id")


def _q_robust_zscore_events(sf_dir: str):
    """Median/MAD robust z-score per event value — two exact selection
    passes (median, then median absolute deviation) and a map-only
    score."""
    from engine.stats import robust_zscore
    out = robust_zscore(
        _read(sf_dir, "events", columns=["event_id", "value"]),
        "value", id_col="event_id")

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("rz").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "event_id": b.column("event_id"),
            "rz": pa.array([None if np.isnan(x) else float(x)
                            for x in v], pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_window_rank_fractions_events(sf_dir: str):
    """Per-user PERCENT_RANK / CUME_DIST / NTILE(4) of event values —
    fraction-rank window parity (peer-based fractions; NTILE
    deterministic via the event_id tiebreak)."""
    from engine.relational import window_rank_fractions
    out = window_rank_fractions(
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "value"]), ntile_k=4)

    def _round(b: pa.Table) -> pa.Table:
        def _col(name):
            return pa.array(_round_half_away(
                b.column(name).to_numpy(zero_copy_only=False), 6),
                pa.float64())
        return pa.table({"event_id": b.column("event_id"),
                         "pct_rank": _col("pct_rank"),
                         "cume_dist": _col("cume_dist"),
                         "bucket": b.column("bucket")})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_grouped_median_orders(sf_dir: str):
    """Exact per-priority median order price — the grouped-quantile path
    at q=0.5 (quantile_cont parity)."""
    from engine.stats import grouped_quantiles
    out = grouped_quantiles(
        _read(sf_dir, "orders",
              columns=["o_orderpriority", "o_totalprice"]),
        group_col="o_orderpriority", value_col="o_totalprice", qs=[0.5])

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "q": b.column("q"),
            "value": pa.array(_round_half_away(
                b.column("value").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["o_orderpriority", "q"])


def _q_user_event_sequences(sf_dir: str):
    """Each user's full ordered event-type history as one token string —
    ``string_agg(event_type, ',' ORDER BY ts, event_id)`` parity."""
    from engine.relational import collect_sequence
    return collect_sequence(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "event_type"])) \
        .sort("user_id")


def _q_click_or_purchase_users(sf_dir: str):
    """Distinct users with a high-value (>95) click OR purchase — SQL
    UNION parity over two filtered event sets."""
    from engine.relational import union_distinct
    return union_distinct(_hi_value_users(sf_dir, "click"),
                          _hi_value_users(sf_dir, "purchase"),
                          key_col="user_id").sort("user_id")


def _q_semi_join_events(sf_dir: str):
    """Events of users who made a high-value (>95) purchase — row-
    preserving WHERE EXISTS parity (every qualifying event passes
    through once, all columns intact)."""
    from engine.relational import semi_join
    left = _read(sf_dir, "events",
                 columns=["event_id", "ts", "user_id", "value"])
    return semi_join(left, _hi_value_users(sf_dir, "purchase"),
                     key_col="user_id").sort("event_id")


def _q_anti_join_events(sf_dir: str):
    """Events of users with NO high-value (>95) purchase — WHERE NOT
    EXISTS parity."""
    from engine.relational import anti_join
    left = _read(sf_dir, "events",
                 columns=["event_id", "ts", "user_id", "value"])
    return anti_join(left, _hi_value_users(sf_dir, "purchase"),
                     key_col="user_id").sort("event_id")


def _q_running_min_max_user_value(sf_dir: str):
    """Per-user cumulative event-value MIN and MAX in (ts, event_id)
    order — ``min/max(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING)`` parity (NULL values carry the
    running extremes; NULL before a user's first non-NULL value)."""
    from engine.relational import running_min_max
    out = running_min_max(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        def _col(name):
            v = _round_half_away(
                b.column(name).to_numpy(zero_copy_only=False), 4)
            return pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64())
        return pa.table({"event_id": b.column("event_id"),
                         "running_min": _col("running_min"),
                         "running_max": _col("running_max")})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_user_gap_stats(sf_dir: str):
    """Per-user inter-event gap stats (count / mean / max seconds) over
    ``ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)``;
    single-event users report (0, NULL, NULL); NULL-ts rows dropped."""
    from engine.relational import interevent_gap_stats
    out = interevent_gap_stats(
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"]))

    def _round(b: pa.Table) -> pa.Table:
        def _col(name):
            v = _round_half_away(
                b.column(name).to_numpy(zero_copy_only=False), 4)
            return pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64())
        return pa.table({"user_id": b.column("user_id"),
                         "n_gaps": b.column("n_gaps"),
                         "avg_gap_s": _col("avg_gap_s"),
                         "max_gap_s": _col("max_gap_s")})
    return out.map_batches(_round, batch_format="pyarrow").sort("user_id")


def _q_delta_from_first_user_value(sf_dir: str):
    """Per-event delta from the user's first event value — ``value -
    FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` parity (positional first, RESPECT NULLS)."""
    from engine.relational import delta_from_first
    out = delta_from_first(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("delta_from_first").to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "event_id": b.column("event_id"),
            "delta_from_first": pa.array(
                [None if np.isnan(x) else float(x) for x in v],
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_weighted_avg_price_by_flag(sf_dir: str):
    """Per-returnflag quantity-weighted mean extended price —
    ``sum(price * qty) / sum(qty)`` from one-pass combiner rows."""
    from engine.stats import grouped_weighted_mean
    out = grouped_weighted_mean(
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_extendedprice", "l_quantity"]),
        group_col="l_returnflag", value_col="l_extendedprice",
        weight_col="l_quantity")

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "n": b.column("n"),
            "weighted_mean": pa.array(_round_half_away(
                b.column("weighted_mean").to_numpy(zero_copy_only=False),
                4), pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort("l_returnflag")


def _q_token_type_ratio_docs(sf_dir: str):
    """Per-document lexical diversity: whitespace token count, distinct
    token count, type-token ratio (NULL for empty docs). Map-only."""
    from engine.textstats import token_type_ratio
    out = token_type_ratio(_docs(sf_dir, columns=["doc_id", "text"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("ttr").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens"),
            "n_distinct": b.column("n_distinct"),
            "ttr": pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("doc_id")


def _q_text_chunks_docs(sf_dir: str):
    """Sliding 64-token / stride-32 chunking of every document — the
    training-pipeline context-window splitter, map-only and vectorized
    (repeat/cumsum chunk membership + one gather + binary_join)."""
    from engine.textstats import text_chunks
    return text_chunks(_docs(sf_dir, columns=["doc_id", "text"]),
                       chunk_tokens=64, stride=32) \
        .sort(["doc_id", "chunk_start"])


def _q_bigram_heavy_hitters(sf_dir: str):
    """EXACT top-20 adjacent-token bigrams corpus-wide (in-batch exact
    counts -> light (bigram, count) shuffle -> per-block top-k)."""
    from engine.textstats import bigram_heavy_hitters
    return bigram_heavy_hitters(_docs(sf_dir, columns=["doc_id", "text"]),
                                k=20)


def _q_dedup_normalized(sf_dir: str):
    """Duplicate groups after text canonicalization (lower, collapse
    whitespace, strip) — md5 of the normalized text so DuckDB reproduces
    the hash bit-for-bit."""
    from engine.dedup import normalized_duplicates
    return normalized_duplicates(_docs(sf_dir, columns=["doc_id", "text"]))


def _q_token_entropy_docs(sf_dir: str):
    """Per-document unigram Shannon entropy + top-token share (the
    repetition/diversity quality signals). Map-only."""
    from engine.textstats import token_entropy
    out = token_entropy(_docs(sf_dir, columns=["doc_id", "text"]))

    def _round(b: pa.Table) -> pa.Table:
        def _col(name):
            v = _round_half_away(
                b.column(name).to_numpy(zero_copy_only=False), 6)
            return pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64())
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_tokens": b.column("n_tokens"),
                         "entropy": _col("entropy"),
                         "top_share": _col("top_share")})
    return out.map_batches(_round, batch_format="pyarrow").sort("doc_id")


def _q_grouped_zscore_events(sf_dir: str):
    """Per-event z-score within the user's value distribution —
    ``(value - avg) / stddev_samp`` window parity; NULL for single-row
    or constant users."""
    from engine.relational import grouped_zscore
    out = grouped_zscore(
        _read(sf_dir, "events", columns=["event_id", "user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(b.column("z").to_numpy(zero_copy_only=False),
                             6)
        return pa.table({
            "event_id": b.column("event_id"),
            "z": pa.array([None if np.isnan(x) else float(x) for x in v],
                          pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_grouped_histogram_events(sf_dir: str):
    """Per-event-type fixed-bin histogram of value over [0, 500] x 20
    bins — (group, bin, n) combiner rows only, bit-for-bit SQL bin
    edges."""
    from engine.stats import grouped_histogram
    return grouped_histogram(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        group_col="event_type", col="value", lo=0.0, hi=500.0,
        bins=20).sort(["event_type", "bin"])


def _q_grouped_minmax_scale_events(sf_dir: str):
    """Per-event min-max scaled value within the user's distribution —
    ``(v - min) / (max - min)`` window parity; NULL for constant
    users."""
    from engine.relational import grouped_minmax_scale
    out = grouped_minmax_scale(
        _read(sf_dir, "events", columns=["event_id", "user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("scaled").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "event_id": b.column("event_id"),
            "scaled": pa.array([None if np.isnan(x) else float(x)
                                for x in v], pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_user_activity_span(sf_dir: str):
    """Per-user activity profile: event count, distinct active days,
    first/last event timestamp — the (key, day) combiner makes COUNT
    DISTINCT a row count."""
    from engine.relational import user_activity_span
    return user_activity_span(
        _read(sf_dir, "events", columns=["user_id", "ts"])) \
        .sort("user_id")


def _q_q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6-style forecast revenue: filtered
    ``sum(l_extendedprice * l_discount)`` — one partial row per block,
    scalar tree-fold, no shuffle."""
    from engine.relational import q6_forecast_revenue
    out = q6_forecast_revenue(
        _read(sf_dir, "lineitem",
              columns=["l_shipdate", "l_discount", "l_quantity",
                       "l_extendedprice"]))
    rev = out.column("revenue").to_numpy(zero_copy_only=False)
    return pa.table({
        "revenue": pa.array([None if np.isnan(x) else float(
            _round_half_away(x, 4)) for x in rev], pa.float64()),
        "n_items": out.column("n_items")})


def _q_event_type_cooccurrence(sf_dir: str):
    """Per-pair event-type co-occurrence over users (market-basket):
    distinct (user, type) -> within-key self-merge -> vocabulary²
    groupby."""
    from engine.relational import event_type_cooccurrence
    return event_type_cooccurrence(
        _read(sf_dir, "events", columns=["user_id", "event_type"])) \
        .sort(["type_a", "type_b"])


def _q_user_event_type_set(sf_dir: str):
    """Per-user sorted DISTINCT event-type set —
    ``string_agg(DISTINCT event_type, ',' ORDER BY event_type)``
    parity; the combiner dedups inside each batch."""
    from engine.relational import collect_distinct_sorted
    return collect_distinct_sorted(
        _read(sf_dir, "events", columns=["user_id", "event_type"])) \
        .sort("user_id")


def _q_type_value_mutual_information(sf_dir: str):
    """Mutual information (nats) between event_type and the 10-bin
    bucketing of value over [0, 500] — vocabulary x bins contingency
    combiner, worker-side reduce."""
    from engine.stats import mutual_information
    out = mutual_information(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        a_col="event_type", b_col="value", lo=0.0, hi=500.0, bins=10)

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(b.column("mi").to_numpy(zero_copy_only=False),
                             6)
        return pa.table({
            "mi": pa.array([None if np.isnan(x) else float(x) for x in v],
                           pa.float64()),
            "n": b.column("n")})
    return out.map_batches(_round, batch_format="pyarrow")


def _q_value_gini_by_type(sf_dir: str):
    """Per-event-type Gini concentration of value — sorted-rank identity,
    one sort per coarse partition."""
    from engine.stats import grouped_gini
    out = grouped_gini(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        group_col="event_type", value_col="value")

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("gini").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "event_type": b.column("event_type"),
            "gini": pa.array([None if np.isnan(x) else float(x)
                              for x in v], pa.float64()),
            "n": b.column("n")})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort("event_type")


def _q_grouped_iqr_outliers_events(sf_dir: str):
    """Events outside their type's Tukey fences (per-group exact
    quartiles computed in-partition — no fence join)."""
    from engine.stats import grouped_iqr_outliers
    return grouped_iqr_outliers(
        _read(sf_dir, "events",
              columns=["event_id", "event_type", "value"]),
        group_col="event_type", value_col="value",
        id_col="event_id").sort("event_id")


def _q_spearman_qty_price(sf_dir: str):
    """Spearman rank correlation of l_quantity vs l_extendedprice —
    average-rank CDF broadcast + map-only sufficient statistics."""
    from engine.stats import spearman_corr
    out = spearman_corr(
        _read(sf_dir, "lineitem",
              columns=["l_quantity", "l_extendedprice"]),
        x_col="l_quantity", y_col="l_extendedprice")
    r = out.column("spearman_r").to_numpy(zero_copy_only=False)
    return pa.table({
        "spearman_r": pa.array([None if np.isnan(v) else float(
            _round_half_away(v, 6)) for v in r], pa.float64()),
        "n": out.column("n")})


def _q_corr_matrix_lineitem(sf_dir: str):
    """All pairwise Pearson correlations of the four lineitem measures
    in ONE corpus pass (pairwise NULL exclusion)."""
    from engine.stats import corr_matrix
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    out = corr_matrix(_read(sf_dir, "lineitem", columns=cols), cols=cols)

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(b.column("r").to_numpy(zero_copy_only=False),
                             6)
        return pa.table({
            "col_x": b.column("col_x"), "col_y": b.column("col_y"),
            "r": pa.array([None if np.isnan(x) else float(x) for x in v],
                          pa.float64()),
            "n": b.column("n")})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["col_x", "col_y"])


def _q_daily_event_counts_dense(sf_dir: str):
    """Gap-filled daily event counts (generate_series LEFT JOIN parity;
    zero-days present)."""
    from engine.relational import dense_daily_counts
    return dense_daily_counts(
        _read(sf_dir, "events", columns=["ts"])).sort("day")


def _q_session_duration_stats(sf_dir: str):
    """Per-user session count and mean/max session duration under the
    30-minute gap sessionizer."""
    from engine.relational import session_duration_stats
    out = session_duration_stats(
        _read(sf_dir, "events", columns=["user_id", "ts"]))

    def _round(b: pa.Table) -> pa.Table:
        def _col(name):
            v = _round_half_away(
                b.column(name).to_numpy(zero_copy_only=False), 4)
            return pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64())
        return pa.table({"user_id": b.column("user_id"),
                         "n_sessions": b.column("n_sessions"),
                         "avg_session_s": _col("avg_session_s"),
                         "max_session_s": _col("max_session_s")})
    return out.map_batches(_round, batch_format="pyarrow").sort("user_id")


def _q_events_rollup(sf_dir: str):
    """GROUPING SETS rollup of event counts over (event_type, day) —
    one corpus pass; coarser grains derive from the bounded fine
    contingency."""
    from engine.relational import rollup_counts
    return rollup_counts(
        _read(sf_dir, "events", columns=["event_type", "ts"])) \
        .sort(["lvl", "event_type", "day"])


def _q_activity_heatmap(sf_dir: str):
    """Day-of-week x hour-of-day event counts (calendar heatmap,
    DuckDB dayofweek parity)."""
    from engine.relational import activity_heatmap
    return activity_heatmap(_read(sf_dir, "events", columns=["ts"])) \
        .sort(["dow", "hod"])


def _q_doc_length_quartiles_by_lang(sf_dir: str):
    """Per-language equal-frequency length quartile of every document
    (in-partition exact fences)."""
    from engine.stats import grouped_quantile_buckets
    return grouped_quantile_buckets(
        _docs(sf_dir, columns=["doc_id", "lang", "n_chars"]),
        group_col="lang", value_col="n_chars",
        id_col="doc_id").sort("doc_id")


def _q_user_hour_entropy(sf_dir: str):
    """Per-user hour-of-day activity entropy (behavioral regularity
    feature)."""
    from engine.relational import user_hour_entropy
    out = user_hour_entropy(
        _read(sf_dir, "events", columns=["user_id", "ts"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("hour_entropy").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "user_id": b.column("user_id"),
            "hour_entropy": pa.array(
                [None if np.isnan(x) else float(x) for x in v],
                pa.float64()),
            "n_events": b.column("n_events")})
    return out.map_batches(_round, batch_format="pyarrow").sort("user_id")


def _q_value_mad_by_type(sf_dir: str):
    """Per-event-type median absolute deviation of value (robust spread
    profile)."""
    from engine.stats import grouped_mad
    out = grouped_mad(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        group_col="event_type", value_col="value")

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("mad").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "event_type": b.column("event_type"),
            "mad": pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64()),
            "n": b.column("n")})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort("event_type")


def _q_cohort_retention(sf_dir: str):
    """Cohort retention triangle: distinct active users per (first-day
    cohort, day offset)."""
    from engine.relational import cohort_retention
    return cohort_retention(
        _read(sf_dir, "events", columns=["user_id", "ts"])) \
        .sort(["cohort", "day_offset"])


def _q_rolling_rows_mean_user(sf_dir: str):
    """Per-user trailing 3-ROWS mean of value (ROWS-frame parity: NULL
    rows occupy frame slots; all-NULL frame is NULL)."""
    from engine.relational import rolling_rows_mean
    out = rolling_rows_mean(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]),
        window_rows=3)

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("rolling_mean").to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "event_id": b.column("event_id"),
            "rolling_mean": pa.array(
                [None if np.isnan(x) else float(x) for x in v],
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("event_id")


def _q_active_days_histogram(sf_dir: str):
    """Histogram of users' distinct-active-day counts — composition of
    user_activity_span -> value_histogram (both oracled ops)."""
    from engine.relational import user_activity_span
    from engine.stats import value_histogram
    span = user_activity_span(
        _read(sf_dir, "events", columns=["user_id", "ts"]))
    return value_histogram(span, "n_active_days", lo=0.0, hi=100.0,
                           bins=20).sort("bin")


def _q_top_tokens_per_lang(sf_dir: str):
    """Top-3 tokens by occurrence per language — (lang, token) count
    combiner + the grouped top-k kernel."""
    from engine.relational import grouped_topk
    from engine.textstats import token_counts_by_group
    counts = token_counts_by_group(
        _docs(sf_dir, columns=["lang", "text"]), group_col="lang")
    out = grouped_topk(counts, group_col="lang", score_col="cnt",
                       id_col="token", k=3, ascending=False)

    def _shape(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b.column("lang"),
                         "token": b.column("token"),
                         "cnt": b.column("cnt")})
    return out.map_batches(_shape, batch_format="pyarrow") \
        .sort(["lang", "token"])


def _q_q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in one
    quarter, enriched with acctbal and nation."""
    from engine.relational import q10_returned_item_reporting
    out = q10_returned_item_reporting(
        _read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                       "l_discount"]),
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_acctbal",
                       "c_nationkey"]),
        _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]))
    out["revenue"] = _round_half_away(out["revenue"].to_numpy(), 4)
    return out


def _q_revenue_pareto_share(sf_dir: str):
    """Share of total order revenue held by the top 20% of customers
    (Pareto concentration)."""
    from engine.stats import pareto_share
    out = pareto_share(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        key_col="o_custkey", value_col="o_totalprice")

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("top_share").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "top_share": pa.array([None if np.isnan(x) else float(x)
                                   for x in v], pa.float64()),
            "n_keys": b.column("n_keys")})
    return out.map_batches(_round, batch_format="pyarrow")


def _q_daily_value_quantiles(sf_dir: str):
    """Per-day p50/p90 of event value — grouped_quantiles keyed by the
    calendar day (composition of two oracled ops)."""
    from engine.stats import grouped_quantiles

    def _day(b: pa.Table) -> pa.Table:
        import pandas as pd
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        keep = ~pd.isna(ts)
        sub = b.filter(pa.array(keep))
        day = np.datetime_as_string(
            sub.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[D]"))
        return pa.table({"day": pa.array(day, pa.string()),
                         "value": sub.column("value")})

    days = _read(sf_dir, "events", columns=["ts", "value"]) \
        .map_batches(_day, batch_format="pyarrow")
    out = grouped_quantiles(days, group_col="day", value_col="value",
                            qs=[0.5, 0.9])

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": b.column("day"), "q": b.column("q"),
            "value": pa.array(_round_half_away(
                b.column("value").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["day", "q"])


def _q_duplicate_custkey_orderdate(sf_dir: str):
    """Composite-key uniqueness: (custkey, orderdate) pairs placing more
    than one order — the single-key salted uniqueness kernel over a
    concatenated key."""
    from engine.uniqueness import duplicate_keys

    def _key(b: pa.Table) -> pa.Table:
        import pandas as pd
        day = pd.Series(b.column("o_orderdate")
                        .to_numpy(zero_copy_only=False)) \
            .dt.strftime("%Y-%m-%d")
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({"ckey": pa.array(
            [f"{c}|{d}" for c, d in zip(ck.tolist(), day.tolist())],
            pa.string())})

    keyed = _read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderdate"]) \
        .map_batches(_key, batch_format="pyarrow")
    return duplicate_keys(keyed, key="ckey").sort("key")


def _q_source_lang_profile(sf_dir: str):
    """Per-(source, lang) document count and mean length — the generic
    multi-key profile aggregate."""
    from engine.stats import grouped_count_mean
    out = grouped_count_mean(
        _docs(sf_dir, columns=["source", "lang", "n_chars"]),
        group_cols=["source", "lang"], value_col="n_chars")

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b.column("source"), "lang": b.column("lang"),
            "n_docs": b.column("n"),
            "mean_chars": pa.array(_round_half_away(
                b.column("mean").to_numpy(zero_copy_only=False), 4),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["source", "lang"])


def _q_vocabulary_stats(sf_dir: str):
    """Corpus vocabulary profile: distinct tokens, hapax count, total
    occurrences (one pass)."""
    from engine.textstats import vocabulary_stats
    return vocabulary_stats(_docs(sf_dir, columns=["text"]))


def _q_similar_docs_to_first(sf_dir: str):
    """Top-10 documents by token-set Jaccard to doc 0 — the
    find-similar-documents search with a broadcast query set."""
    import ray.data
    from engine.textstats import jaccard_to_query
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    row = docs.filter(lambda r: r["doc_id"] == 0).take(1)
    qtoks = (row[0]["text"] or "").split() if row else []
    out = jaccard_to_query(docs, query_tokens=qtoks, k=10)

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("jaccard").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "jaccard": pa.array([None if np.isnan(x) else float(x)
                                 for x in v], pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow")


def _q_embedding_covariance(sf_dir: str):
    """Sample covariance of the first 4 embedding dimensions (the
    distributed Gram-matrix op, oracle-sized slice)."""
    from engine.similarity import embedding_covariance
    out = embedding_covariance(
        _read(sf_dir, "embeddings", columns=["embedding"]),
        dim=64, use_dims=4)

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("cov").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "i": b.column("i"), "j": b.column("j"),
            "cov": pa.array([None if np.isnan(x) else float(x)
                             for x in v], pa.float64()),
            "n": b.column("n")})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["i", "j"])


def _q_event_transition_matrix(sf_dir: str):
    """First-order Markov transition counts between consecutive event
    types per user."""
    from engine.relational import event_transition_matrix
    return event_transition_matrix(
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "ts", "event_type"])) \
        .sort(["from_type", "to_type"])


def _q_time_to_first_purchase(sf_dir: str):
    """Per-user seconds from first event to first purchase (NULL when
    the user never purchases)."""
    from engine.relational import time_to_first_target
    out = time_to_first_target(
        _read(sf_dir, "events",
              columns=["user_id", "ts", "event_type"]),
        target="purchase")

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("seconds_to_target").to_numpy(zero_copy_only=False),
            4)
        return pa.table({
            "user_id": b.column("user_id"),
            "seconds_to_purchase": pa.array(
                [None if np.isnan(x) else float(x) for x in v],
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("user_id")


def _q_daily_active_users(sf_dir: str):
    """Daily active users (distinct users per calendar day)."""
    from engine.relational import daily_active_users
    return daily_active_users(
        _read(sf_dir, "events", columns=["user_id", "ts"])).sort("day")


def _q_peak_hourly_rate(sf_dir: str):
    """Per-user burst detector: max events in any single clock hour."""
    from engine.relational import peak_hourly_rate
    return peak_hourly_rate(
        _read(sf_dir, "events", columns=["user_id", "ts"])) \
        .sort("user_id")


def _q_orders_per_customer_histogram(sf_dir: str):
    """Zero-inflated engagement histogram: customers per order count,
    INCLUDING customers with no orders (zero bin by arithmetic — no
    anti-join ships rows)."""
    from engine.relational import orders_per_customer_histogram
    return orders_per_customer_histogram(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        _read(sf_dir, "customer", columns=["c_custkey"])) \
        .sort("n_orders")


def _q_doc_mean_idf(sf_dir: str):
    """Per-document lexical rarity (mean ln(N/df) over distinct
    tokens)."""
    from engine.textstats import doc_mean_idf
    out = doc_mean_idf(_docs(sf_dir, columns=["doc_id", "text"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("mean_idf").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "mean_idf": pa.array([None if np.isnan(x) else float(x)
                                  for x in v], pa.float64()),
            "n_distinct": b.column("n_distinct")})
    return out.map_batches(_round, batch_format="pyarrow").sort("doc_id")


def _q_priority_share_by_month(sf_dir: str):
    """Order-priority mix per month — counts plus each priority's share
    of its month."""
    from engine.relational import share_within_group

    def _month(b: pa.Table) -> pa.Table:
        import pandas as pd
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = ~pd.isna(od)
        sub = b.filter(pa.array(keep))
        month = np.datetime_as_string(
            sub.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[M]"))
        return pa.table({"month": pa.array(month, pa.string()),
                         "pri": sub.column("o_orderpriority")})

    keyed = _read(sf_dir, "orders",
                  columns=["o_orderdate", "o_orderpriority"]) \
        .map_batches(_month, batch_format="pyarrow")
    out = share_within_group(keyed, outer_col="month", inner_col="pri")

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": b.column("month"), "pri": b.column("pri"),
            "n": b.column("n"),
            "share": pa.array(_round_half_away(
                b.column("share").to_numpy(zero_copy_only=False), 6),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort(["month", "pri"])


def _q_user_repeat_rate(sf_dir: str):
    """Per-user fraction of consecutive same-type event pairs."""
    from engine.relational import user_repeat_rate
    out = user_repeat_rate(
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "ts", "event_type"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("repeat_rate").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "user_id": b.column("user_id"),
            "n_transitions": b.column("n_transitions"),
            "repeat_rate": pa.array(
                [None if np.isnan(x) else float(x) for x in v],
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("user_id")


def _q_user_value_concentration(sf_dir: str):
    """Per-user share of the single largest event value in the user's
    total (associative max/sum combiner)."""
    from engine.relational import user_value_concentration
    out = user_value_concentration(
        _read(sf_dir, "events", columns=["user_id", "value"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("max_share").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "user_id": b.column("user_id"),
            "max_share": pa.array([None if np.isnan(x) else float(x)
                                   for x in v], pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("user_id")


def _q_daily_conversion_ratio(sf_dir: str):
    """Daily purchases-per-click conversion ratio time series."""
    from engine.relational import daily_ratio
    out = daily_ratio(
        _read(sf_dir, "events", columns=["ts", "event_type"]))

    def _round(b: pa.Table) -> pa.Table:
        v = _round_half_away(
            b.column("ratio").to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "day": b.column("day"), "n_num": b.column("n_num"),
            "n_den": b.column("n_den"),
            "ratio": pa.array([None if np.isnan(x) else float(x)
                               for x in v], pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow").sort("day")


def _q_discount_by_qty_bucket(sf_dir: str):
    """Mean discount per 10-unit quantity bucket — grouped_count_mean
    over a computed bin (composition)."""
    from engine.stats import grouped_count_mean

    def _bucket(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            keep = ~np.isnan(q)
        sub = b.filter(pa.array(keep))
        bucket = np.floor(q[keep] / 10.0).astype(np.int64)
        return pa.table({"qty_bucket": pa.array(bucket, pa.int64()),
                         "l_discount": sub.column("l_discount")})

    keyed = _read(sf_dir, "lineitem",
                  columns=["l_quantity", "l_discount"]) \
        .map_batches(_bucket, batch_format="pyarrow")
    out = grouped_count_mean(keyed, group_cols=["qty_bucket"],
                             value_col="l_discount")

    def _round(b: pa.Table) -> pa.Table:
        return pa.table({
            "qty_bucket": b.column("qty_bucket"),
            "n": b.column("n"),
            "mean_discount": pa.array(_round_half_away(
                b.column("mean").to_numpy(zero_copy_only=False), 6),
                pa.float64())})
    return out.map_batches(_round, batch_format="pyarrow") \
        .sort("qty_bucket")


def _q_longest_daily_streak(sf_dir: str):
    """Per-user longest consecutive-active-day streak + island count
    (gaps-and-islands)."""
    from engine.relational import longest_daily_streak
    return longest_daily_streak(
        _read(sf_dir, "events", columns=["user_id", "ts"])) \
        .sort("user_id")


def entry() -> Any:
    """Flagship pipeline at sf0.001: synthesize the interleaved spans corpus
    from documents.parquet, validate it against the FIXTURES §3 schema,
    return the violations Dataset."""
    return _q_validate_spans("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # keyword validation over real typed tables (SQL-checked)
        "validate_documents": _q_validate_documents,
        "validate_embeddings": _q_validate_embeddings,
        "multi_validate_documents": _q_multi_validate,
        # corpus-level checks
        "stats_documents": _q_stats_documents,
        "duplicate_keys_lineitem": _q_duplicate_keys_lineitem,
        "referential_orders": _q_referential_orders,
        "referential_lineitem_part": _q_referential_lineitem_part,
        "anti_join_orders_restricted": _q_anti_join_orders,
        "token_doc_frequency": _q_token_doc_frequency,
        "heavy_hitter_tokens": _q_heavy_hitters,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "dedup_normalized": _q_dedup_normalized,
        "minhash_near_dup": _q_minhash_near_dup,
        "simhash_fingerprints": _q_simhash,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_dup_clusters": _q_embedding_dup_clusters,
        "jaccard_verify": _q_jaccard_verify,
        "near_dup_clusters": _q_near_dup_clusters,
        "near_dup_survivors": _q_near_dup_survivors,
        "train_test_contamination": _q_train_test_contamination,
        # text analysis
        "token_counts": _q_token_counts,
        "bpe_token_counts": _q_bpe_token_counts,
        "quality_scores": _q_quality,
        "lang_distribution": _q_lang_distribution,
        "language_id": _q_langid,
        "fingerprints": _q_fingerprints,
        # similarity search
        "ann_cosine_topk": _q_ann_topk,
        "ivf_topk": _q_ivf_topk,
        # relational
        "q1_pricing_summary": _q_q1,
        "q5_local_supplier_volume": _q_q5,
        "q3_shipping_priority": _q_q3,
        "revenue_by_segment": _q_revenue_by_segment,
        "events_per_user_hour": _q_events_window,
        "sessionize_events": _q_sessionize,
        "top_event_types": _q_top_event_types,
        "top_orders_per_priority": _q_top_orders_per_priority,
        # interleaved spans corpus (derived deterministically from documents)
        "validate_spans": _q_validate_spans,
        "spans_verdicts": _q_spans_verdicts,
        "spans_drift": _q_spans_drift,
        "spans_dangling_refs": _q_spans_dangling_refs,
        "spans_stats": _q_spans_stats,
        # deterministic sampling / splits
        "train_test_split": _q_train_test_split,
        "sample_fraction": _q_sample_fraction,
        "stratified_sample_docs": _q_stratified_sample,
        "exact_quantiles_lineitem": _q_exact_quantiles,
        "grouped_quantiles_lineitem": _q_grouped_quantiles,
        "histogram_orders": _q_histogram_orders,
        "distinct_users_per_event_type": _q_distinct_users,
        "ewma_user_value": _q_ewma_user_value,
        "ewma_halflife_user_value": _q_ewma_halflife_user_value,
        "lag_diff_user_value": _q_lag_diff_user_value,
        "grouped_moments_lineitem": _q_grouped_moments_lineitem,
        "grouped_corr_lineitem": _q_grouped_corr_lineitem,
        "winsorize_events": _q_winsorize_events,
        "latest_event_per_user": _q_latest_event_per_user,
        "pivot_events_value": _q_pivot_events_value,
        "click_not_purchase_users": _q_click_not_purchase_users,
        "click_xor_purchase_users": _q_click_xor_purchase_users,
        "session_value_sums": _q_session_value_sums,
        "click_and_purchase_users": _q_click_and_purchase_users,
        "mode_event_type_per_user": _q_mode_event_type_per_user,
        "running_sum_user_value": _q_running_sum_user_value,
        "click_or_purchase_users": _q_click_or_purchase_users,
        "user_event_sequences": _q_user_event_sequences,
        "rolling_user_sum": _q_rolling_user_sum,
        "rolling_user_min_max": _q_rolling_user_min_max,
        "running_min_max_user_value": _q_running_min_max_user_value,
        "user_gap_stats": _q_user_gap_stats,
        "delta_from_first_user_value": _q_delta_from_first_user_value,
        "window_ranks_events": _q_window_ranks_events,
        "window_rank_fractions_events": _q_window_rank_fractions_events,
        "quantile_buckets_events": _q_quantile_buckets_events,
        "label_centroids": _q_label_centroids,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "robust_zscore_events": _q_robust_zscore_events,
        "grouped_median_orders": _q_grouped_median_orders,
        "weighted_avg_price_by_flag": _q_weighted_avg_price_by_flag,
        "token_type_ratio_docs": _q_token_type_ratio_docs,
        "text_chunks_docs": _q_text_chunks_docs,
        "bigram_heavy_hitters": _q_bigram_heavy_hitters,
        "token_entropy_docs": _q_token_entropy_docs,
        "grouped_zscore_events": _q_grouped_zscore_events,
        "grouped_histogram_events": _q_grouped_histogram_events,
        "grouped_minmax_scale_events": _q_grouped_minmax_scale_events,
        "user_activity_span": _q_user_activity_span,
        "q6_forecast_revenue": _q_q6_forecast_revenue,
        "event_type_cooccurrence": _q_event_type_cooccurrence,
        "user_event_type_set": _q_user_event_type_set,
        "type_value_mutual_information": _q_type_value_mutual_information,
        "value_gini_by_type": _q_value_gini_by_type,
        "grouped_iqr_outliers_events": _q_grouped_iqr_outliers_events,
        "spearman_qty_price": _q_spearman_qty_price,
        "corr_matrix_lineitem": _q_corr_matrix_lineitem,
        "daily_event_counts_dense": _q_daily_event_counts_dense,
        "session_duration_stats": _q_session_duration_stats,
        "events_rollup": _q_events_rollup,
        "activity_heatmap": _q_activity_heatmap,
        "doc_length_quartiles_by_lang": _q_doc_length_quartiles_by_lang,
        "user_hour_entropy": _q_user_hour_entropy,
        "value_mad_by_type": _q_value_mad_by_type,
        "cohort_retention": _q_cohort_retention,
        "rolling_rows_mean_user": _q_rolling_rows_mean_user,
        "active_days_histogram": _q_active_days_histogram,
        "top_tokens_per_lang": _q_top_tokens_per_lang,
        "q10_returned_items": _q_q10_returned_items,
        "revenue_pareto_share": _q_revenue_pareto_share,
        "daily_value_quantiles": _q_daily_value_quantiles,
        "duplicate_custkey_orderdate": _q_duplicate_custkey_orderdate,
        "source_lang_profile": _q_source_lang_profile,
        "vocabulary_stats": _q_vocabulary_stats,
        "similar_docs_to_first": _q_similar_docs_to_first,
        "embedding_covariance": _q_embedding_covariance,
        "event_transition_matrix": _q_event_transition_matrix,
        "time_to_first_purchase": _q_time_to_first_purchase,
        "daily_active_users": _q_daily_active_users,
        "peak_hourly_rate": _q_peak_hourly_rate,
        "orders_per_customer_histogram": _q_orders_per_customer_histogram,
        "doc_mean_idf": _q_doc_mean_idf,
        "priority_share_by_month": _q_priority_share_by_month,
        "user_repeat_rate": _q_user_repeat_rate,
        "user_value_concentration": _q_user_value_concentration,
        "daily_conversion_ratio": _q_daily_conversion_ratio,
        "discount_by_qty_bucket": _q_discount_by_qty_bucket,
        "longest_daily_streak": _q_longest_daily_streak,
        "semi_join_events_purchases": _q_semi_join_events,
        "anti_join_events_purchases": _q_anti_join_events,
        "percentile_rank_events": _q_percentile_rank_events,
        "ngram_novelty_docs": _q_ngram_novelty,
        "compression_ratio_docs": _q_compression_ratio,
        "pii_flags_docs": _q_pii_flags,
        "redact_pii_docs": _q_redact_pii,
        "pack_sequences_docs": _q_pack_sequences,
        "pack_sequences_bpe": _q_pack_sequences_bpe,
        "outlier_events": _q_outlier_events,
        "rolling_user_mean": _q_rolling_user_mean,
        "asof_last_purchase": _q_asof_last_purchase,
        "events_after_purchase": _q_events_after_purchase,
        # dynamic JSON column validation
        "events_props_validation": _q_events_props_validation,
        # micro-batch streaming windows with watermarks
        "streaming_windows": _q_streaming_windows,
        "streaming_dedup": _q_streaming_dedup,
        # schema compiler / reverse codegen
        "infer_schema_documents": _q_infer_schema_documents,
        # multimodal plumbing (stubbed decode, real pipeline)
        "multimodal_features": _q_multimodal_features,
        "audio_features": _q_audio_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "validate_documents": """
            with d as (select * from documents)
            select doc_id, 'MissingRequired' as error_kind,
                   '/text' as instance_path from d where text is null
            union all
            select doc_id, 'MissingRequired', '/lang' from d
            where lang is null
            union all
            select doc_id, 'MissingRequired', '/source' from d
            where source is null
            union all
            select doc_id, 'MissingRequired', '/n_chars' from d
            where n_chars is null
            union all
            select doc_id, 'BelowMinimum', '/doc_id' from d
            where doc_id < 0
            union all
            select doc_id, 'TooShort', '/text' from d
            where text is not null and length(text) < 1
            union all
            select doc_id, 'TooLong', '/text' from d
            where text is not null and length(text) > 400
            union all
            select doc_id, 'NotInEnum', '/lang' from d
            where lang is not null
              and lang not in ('en', 'de', 'fr', 'es')
            union all
            select doc_id, 'PatternMismatch', '/source' from d
            where source is not null
              and not regexp_matches(source, '^src[0-9]$')
            union all
            select doc_id, 'BelowMinimum', '/n_chars' from d
            where n_chars < 0
            union all
            select doc_id, 'AboveMaximum', '/n_chars' from d
            where n_chars > 500
        """,
        "validate_embeddings": """
            with e as (select * from embeddings),
            elems as (
              select vec_id, unnest(embedding) as v,
                     generate_subscripts(embedding, 1) as i from e)
            select vec_id, 'TooFewItems' as error_kind,
                   '/embedding' as instance_path
            from e where len(embedding) < 64
            union all
            select vec_id, 'TooManyItems', '/embedding' from e
            where len(embedding) > 64
            union all
            select vec_id, 'DuplicateArrayItems', '/embedding' from e
            where len(list_distinct(embedding)) <> len(embedding)
            union all
            select vec_id, 'BelowMinimum',
                   '/embedding/' || (i - 1) from elems where v < -0.5
            union all
            select vec_id, 'AboveMaximum',
                   '/embedding/' || (i - 1) from elems where v > 0.45
            union all
            select vec_id, 'BelowMinimum', '/label' from e where label < 0
            union all
            select vec_id, 'AboveMaximum', '/label' from e where label > 8
        """,
        "multi_validate_documents": """
            with d as (select * from documents),
            base as (
              select doc_id, 'MissingRequired' as error_kind,
                     '/text' as instance_path from d where text is null
              union all
              select doc_id, 'MissingRequired', '/lang' from d
              where lang is null
              union all
              select doc_id, 'MissingRequired', '/source' from d
              where source is null
              union all
              select doc_id, 'MissingRequired', '/n_chars' from d
              where n_chars is null
              union all
              select doc_id, 'BelowMinimum', '/doc_id' from d
              where doc_id < 0
              union all
              select doc_id, 'TooShort', '/text' from d
              where text is not null and length(text) < 1
              union all
              select doc_id, 'TooLong', '/text' from d
              where text is not null and length(text) > 400
              union all
              select doc_id, 'NotInEnum', '/lang' from d
              where lang is not null
                and lang not in ('en', 'de', 'fr', 'es')
              union all
              select doc_id, 'PatternMismatch', '/source' from d
              where source is not null
                and not regexp_matches(source, '^src[0-9]$')
              union all
              select doc_id, 'BelowMinimum', '/n_chars' from d
              where n_chars < 0
              union all
              select doc_id, 'AboveMaximum', '/n_chars' from d
              where n_chars > 500),
            strict as (
              select doc_id, 'MissingRequired' as error_kind,
                     '/text' as instance_path from d where text is null
              union all
              select doc_id, 'TooShort', '/text' from d
              where text is not null and length(text) < 20
              union all
              select doc_id, 'AboveMaximum', '/n_chars' from d
              where n_chars > 200)
            select 'base' as schema_name, * from base
            union all
            select 'strict', * from strict
        """,
        "stats_documents": """
            with d as (select * from documents),
            cols as (
              select 'doc_id' as "column",
                     count(*) as cnt,
                     sum(case when doc_id is null then 1 else 0
                         end)::bigint as n_nulls from d
              union all
              select 'lang', count(*), sum(case when lang is null then 1
                     else 0 end)::bigint from d
              union all
              select 'n_chars', count(*), sum(case when n_chars is null
                     then 1 else 0 end)::bigint from d
              union all
              select 'source', count(*), sum(case when source is null
                     then 1 else 0 end)::bigint from d
              union all
              select 'text', count(*), sum(case when text is null then 1
                     else 0 end)::bigint from d)
            select "column", cnt, n_nulls,
                   n_nulls::double / cnt as null_rate
            from cols order by "column"
        """,
        "duplicate_keys_lineitem": """
            select l_orderkey, count(*) as dup_count
            from lineitem group by l_orderkey having count(*) > 1
        """,
        "duplicate_custkey_orderdate": """
            select o_custkey::varchar || '|'
                   || strftime(o_orderdate, '%Y-%m-%d') as key,
                   count(*) as dup_count
            from orders group by key having count(*) > 1
            order by key
        """,
        "source_lang_profile": """
            select source, lang, count(*)::bigint as n_docs,
                   round(avg(n_chars), 4) as mean_chars
            from documents
            where source is not null and lang is not null
              and n_chars is not null
            group by source, lang order by source, lang
        """,
        "vocabulary_stats": r"""
            with tok as (
              select unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) as t
              from documents),
            c as (select t, count(*)::bigint as n from tok group by t)
            select count(*)::bigint as vocab_size,
                   coalesce(count(*) filter (n = 1), 0)::bigint
                       as hapax_count,
                   coalesce(sum(n), 0)::bigint as total_tokens
            from c
        """,
        "similar_docs_to_first": r"""
            with q as (
              select list_distinct(regexp_extract_all(
                  coalesce(text, ''), '\S+')) as qs
              from documents where doc_id = 0),
            d as (
              select doc_id, list_distinct(regexp_extract_all(
                  coalesce(text, ''), '\S+')) as ts
              from documents),
            s as (
              select d.doc_id,
                     len(list_intersect(d.ts, q.qs))::double
                     / nullif(len(list_distinct(d.ts || q.qs)), 0)
                         as j
              from d, q)
            select doc_id, round(j, 6) as jaccard
            from s order by j desc nulls last, doc_id limit 10
        """,
        "embedding_covariance": """
            with p as (
              select unnest([
                  struct_pack(i := 0, j := 0),
                  struct_pack(i := 0, j := 1),
                  struct_pack(i := 0, j := 2),
                  struct_pack(i := 0, j := 3),
                  struct_pack(i := 1, j := 1),
                  struct_pack(i := 1, j := 2),
                  struct_pack(i := 1, j := 3),
                  struct_pack(i := 2, j := 2),
                  struct_pack(i := 2, j := 3),
                  struct_pack(i := 3, j := 3)], recursive := true))
            select p.i::bigint as i, p.j::bigint as j,
                   round(covar_samp(embedding[p.i + 1],
                                    embedding[p.j + 1]), 6) as cov,
                   count(*)::bigint as n
            from embeddings, p
            group by p.i, p.j order by i, j
        """,
        "event_transition_matrix": """
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
            group by from_type, to_type order by from_type, to_type
        """,
        "time_to_first_purchase": """
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
                   round(epoch(p.first_purchase - f.first_ts), 4)
                       as seconds_to_purchase
            from f left join p using (user_id) order by user_id
        """,
        "daily_active_users": """
            select strftime(ts, '%Y-%m-%d') as day,
                   count(distinct user_id)::bigint as dau
            from events
            where ts is not null and user_id is not null
            group by day order by day
        """,
        "peak_hourly_rate": """
            with c as (
              select user_id, date_trunc('hour', ts) as h,
                     count(*)::bigint as n
              from events
              where ts is not null and user_id is not null
              group by user_id, h)
            select user_id, max(n)::bigint as peak_events_per_hour
            from c group by user_id order by user_id
        """,
        "orders_per_customer_histogram": """
            with o as (
              select o_custkey, count(*)::bigint as n
              from orders where o_custkey is not null
              group by o_custkey)
            select coalesce(o.n, 0)::bigint as n_orders,
                   count(*)::bigint as n_customers
            from customer c left join o on c.c_custkey = o.o_custkey
            group by n_orders order by n_orders
        """,
        "doc_mean_idf": r"""
            with tok as (
              select doc_id,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) as t
              from documents),
            dt as (select distinct doc_id, t from tok where t <> ''),
            df as (select t, count(*)::double as df from dt group by t),
            n as (select count(*)::double as n from documents)
            select dt.doc_id, round(avg(ln(n.n / df.df)), 6) as mean_idf,
                   count(*)::bigint as n_distinct
            from dt join df using (t), n
            group by dt.doc_id order by dt.doc_id
        """,
        "priority_share_by_month": """
            with c as (
              select strftime(o_orderdate, '%Y-%m') as month,
                     o_orderpriority as pri, count(*)::bigint as n
              from orders
              where o_orderdate is not null
                and o_orderpriority is not null
              group by month, pri)
            select month, pri, n,
                   round(n / sum(n) over (partition by month), 6)
                       as share
            from c order by month, pri
        """,
        "user_repeat_rate": """
            with s as (
              select user_id, event_type,
                     lead(event_type) over (
                         partition by user_id
                         order by ts, event_id) as nxt
              from events
              where ts is not null and user_id is not null
                and event_type is not null)
            select user_id,
                   count(*) filter (nxt is not null)::bigint
                       as n_transitions,
                   round(count(*) filter (nxt = event_type)::double
                         / nullif(count(*) filter (nxt is not null), 0),
                         6) as repeat_rate
            from s group by user_id order by user_id
        """,
        "user_value_concentration": """
            select user_id,
                   round(max(value) / nullif(sum(value), 0), 6)
                       as max_share
            from events
            where user_id is not null and value is not null
            group by user_id order by user_id
        """,
        "daily_conversion_ratio": """
            with c as (
              select strftime(ts, '%Y-%m-%d') as day,
                     count(*) filter (event_type = 'purchase')::bigint
                         as n_num,
                     count(*) filter (event_type = 'click')::bigint
                         as n_den
              from events
              where ts is not null
                and event_type in ('purchase', 'click')
              group by day)
            select day, n_num, n_den,
                   round(n_num::double / nullif(n_den, 0), 6) as ratio
            from c order by day
        """,
        "discount_by_qty_bucket": """
            select floor(l_quantity / 10.0)::bigint as qty_bucket,
                   count(*)::bigint as n,
                   round(avg(l_discount), 6) as mean_discount
            from lineitem
            where l_quantity is not null and l_discount is not null
            group by qty_bucket order by qty_bucket
        """,
        "longest_daily_streak": """
            with d as (
              select distinct user_id, date_trunc('day', ts) as day
              from events
              where ts is not null and user_id is not null),
            r as (
              select user_id, day,
                     row_number() over (partition by user_id
                                        order by day) as rn
              from d),
            g as (select user_id, day - rn * interval 1 day as grp
                  from r),
            s as (select user_id, count(*)::bigint as len
                  from g group by user_id, grp)
            select user_id, max(len)::bigint as longest_streak,
                   count(*)::bigint as n_streaks
            from s group by user_id order by user_id
        """,
        "referential_orders": """
            select count(*)::bigint as n_dangling from orders
            where o_custkey is not null
              and o_custkey not in (select c_custkey from customer)
        """,
        "referential_lineitem_part": """
            select count(*)::bigint as n_dangling from lineitem
            where l_partkey is not null
              and l_partkey not in (select p_partkey from part)
        """,
        "anti_join_orders_restricted": """
            select o_custkey, count(*) as n_occurrences
            from orders
            where o_custkey % 7 = 0
            group by o_custkey
        """,
        "token_doc_frequency": r"""
            select token, count(distinct doc_id) as df
            from (select doc_id,
                         unnest(string_split_regex(coalesce(text, ''),
                                                   '\s+')) as token
                  from documents)
            where token <> ''
            group by token
        """,
        "heavy_hitter_tokens": r"""
            select token, count(*)::bigint as est_count,
                   0::bigint as max_error
            from (select unnest(regexp_extract_all(coalesce(text, ''),
                                                   '\S+')) as token
                  from documents)
            group by token
            order by est_count desc, token
            limit 20
        """,
        "dedup_exact": """
            select md5(coalesce(text, '')) as text_hash,
                   min(doc_id) as keep_id,
                   count(*) as dup_count
            from documents group by md5(coalesce(text, ''))
        """,
        "dedup_normalized": r"""
            with n as (
              select doc_id,
                     md5(regexp_replace(regexp_replace(
                         lower(coalesce(text, '')), '\s+', ' ', 'g'),
                         '^ | $', '', 'g')) as norm_hash
              from documents)
            select norm_hash, min(doc_id) as keep_id,
                   count(*) as dup_count
            from n group by norm_hash
        """,
        "weighted_avg_price_by_flag": """
            select l_returnflag, count(*)::bigint as n,
                   round(sum(l_extendedprice * l_quantity)
                         / sum(l_quantity), 4) as weighted_mean
            from lineitem
            where l_extendedprice is not null and l_quantity is not null
            group by l_returnflag order by l_returnflag
        """,
        "token_type_ratio_docs": r"""
            with toks as (
              select doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') as t
              from documents)
            select doc_id, len(t)::bigint as n_tokens,
                   len(list_distinct(t))::bigint as n_distinct,
                   case when len(t) = 0 then null
                        else round(len(list_distinct(t))::double
                                   / len(t), 6) end as ttr
            from toks order by doc_id
        """,
        "text_chunks_docs": r"""
            with toks as (
              select doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') as t
              from documents)
            select doc_id, s::bigint as chunk_start,
                   least(64, len(t) - s)::bigint as n_tokens,
                   array_to_string(t[s + 1: s + 64], ' ') as chunk
            from toks,
                 lateral (select unnest(range(0, greatest(len(t), 1),
                                              32)) as s)
            where s < len(t)
            order by doc_id, chunk_start
        """,
        "bigram_heavy_hitters": r"""
            with toks as (
              select doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') as t
              from documents),
            z as (select unnest(list_zip(t[1:-2], t[2:-1])) as p
                  from toks where len(t) >= 2)
            select p[1] || ' ' || p[2] as bigram,
                   count(*)::bigint as n_occurrences
            from z group by bigram
            order by n_occurrences desc, bigram limit 20
        """,
        "token_entropy_docs": r"""
            with tok as (
              select doc_id, token, count(*)::double as c
              from (select doc_id,
                           unnest(regexp_extract_all(coalesce(text, ''),
                                                     '\S+')) as token
                    from documents)
              group by doc_id, token)
            select d.doc_id,
                   coalesce(sum(t.c), 0)::bigint as n_tokens,
                   round(-sum((t.c / s.n) * ln(t.c / s.n)), 6) as entropy,
                   round(max(t.c) / any_value(s.n), 6) as top_share
            from documents d
            left join tok t using (doc_id)
            left join (select doc_id, sum(c) as n from tok
                       group by doc_id) s using (doc_id)
            group by d.doc_id order by d.doc_id
        """,
        "grouped_zscore_events": """
            select event_id,
                   case when stddev_samp(value) over (
                            partition by user_id) > 0
                        then round((value - avg(value) over (
                                 partition by user_id))
                             / stddev_samp(value) over (
                                 partition by user_id), 6)
                   end as z
            from events where value is not null order by event_id
        """,
        "token_counts": r"""
            select doc_id,
                   len(regexp_extract_all(coalesce(text, ''),
                                          '\S+'))::bigint as n_tokens
            from documents
        """,
        "bpe_token_counts": r"""
            select doc_id,
                   len(regexp_extract_all(
                       coalesce(text, ''),
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::bigint
                   as n_bpe_tokens
            from documents
        """,
        "quality_scores": r"""
            with d as (select doc_id, coalesce(text, '') as t from documents)
            select doc_id,
                   length(t)::bigint as n_chars,
                   len(regexp_extract_all(t, '\S+'))::bigint as n_tokens,
                   len(regexp_extract_all(t, '[.,!?;:]'))::bigint as n_punct,
                   len(regexp_extract_all(t, '[0-9]'))::bigint as n_digits
            from d
        """,
        "lang_distribution": """
            select lang, count(*) as n_docs from documents group by lang
        """,
        "ann_cosine_topk": """
            with q as (
              select vec_id as query_id, embedding as qe
              from embeddings where vec_id in (0, 7)),
            scored as (
              select q.query_id, e.vec_id,
                     list_cosine_similarity(
                         e.embedding::double[], q.qe::double[]) as cos
              from embeddings e, q),
            ranked as (
              select query_id, vec_id, cos,
                     row_number() over (partition by query_id
                                        order by cos desc, vec_id)
                         as rank
              from scored)
            select query_id::int as query_id, vec_id,
                   round(cos, 4) as cosine, rank::int as rank
            from ranked where rank <= 5
        """,
        "q1_pricing_summary": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) as sum_qty,
                   round(sum(l_extendedprice), 4) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                       as sum_disc_price,
                   round(sum(l_quantity) / count(*), 4) as avg_qty,
                   count(*) as count_order
            from lineitem group by l_returnflag, l_linestatus
        """,
        "q5_local_supplier_volume": """
            select n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                       as revenue
            from customer, orders, lineitem, supplier, nation, region
            where c_custkey = o_custkey and l_orderkey = o_orderkey
              and l_suppkey = s_suppkey and c_nationkey = s_nationkey
              and s_nationkey = n_nationkey and n_regionkey = r_regionkey
              and r_name = 'ASIA'
              and o_orderdate >= date '1996-01-01'
              and o_orderdate < date '1997-01-01'
            group by n_name order by n_name
        """,
        "q3_shipping_priority": """
            with r as (
              select l.l_orderkey, o.o_orderdate,
                     round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                         as revenue
              from customer c
              join orders o on c.c_custkey = o.o_custkey
              join lineitem l on l.l_orderkey = o.o_orderkey
              where c.c_mktsegment = 'BUILDING'
                and o.o_orderdate < timestamp '1998-06-01'
                and l.l_shipdate > timestamp '1998-06-01'
              group by 1, 2)
            select l_orderkey, o_orderdate, revenue from r
            order by revenue desc, o_orderdate, l_orderkey limit 10
        """,
        "revenue_by_segment": """
            select c_mktsegment, round(sum(o_totalprice), 4) as revenue,
                   count(*) as n_orders
            from orders o join customer c on o.o_custkey = c.c_custkey
            group by c_mktsegment
        """,
        "events_per_user_hour": """
            select user_id, date_trunc('hour', ts) as "hour",
                   count(*) as n_events,
                   round(sum(value), 4) as value_sum
            from events group by 1, 2
        """,
        "top_event_types": """
            select event_type, count(*) as n_events from events
            group by event_type
            order by n_events desc, event_type limit 5
        """,
        "top_orders_per_priority": """
            select o_orderpriority, o_totalprice, o_orderkey
            from (select o_orderpriority, o_totalprice, o_orderkey,
                         row_number() over (
                             partition by o_orderpriority
                             order by o_totalprice desc, o_orderkey) as rn
                  from orders) t
            where rn <= 5
            order by o_orderpriority, o_totalprice desc, o_orderkey
        """,
        "sessionize_events": """
            with marked as (
              select user_id, ts,
                     case when ts - lag(ts) over w > interval 30 minutes
                          or lag(ts) over w is null then 1 else 0 end as new_s
              from events
              window w as (partition by user_id order by ts)
            ), sess as (
              select user_id, ts,
                     sum(new_s) over (partition by user_id order by ts
                                      rows unbounded preceding)::bigint
                         as session_id
              from marked)
            select user_id, session_id, count(*) as n_events,
                   min(ts) as session_start, max(ts) as session_end
            from sess group by 1, 2
        """,
        "train_test_split": f"""
            select doc_id,
                   case when substr(md5(cast(doc_id as varchar)), 1, 8)
                        < printf('%08x', {int(0.9 * 2**32)})
                        then 'train' else 'test' end as split
            from documents
        """,
        "sample_fraction": f"""
            select doc_id from documents
            where substr(md5(cast(doc_id as varchar)), 1, 8)
                  < printf('%08x', {int(0.25 * 2**32)})
        """,
        "stratified_sample_docs": f"""
            select doc_id, lang from documents
            where substr(md5(cast(doc_id as varchar) || '|'
                             || coalesce(lang, '')), 1, 8)
                  < case coalesce(lang, '')
                      when 'en' then printf('%08x', {int(0.30 * 2**32)})
                      when 'de' then printf('%08x', {int(0.10 * 2**32)})
                      else printf('%08x', {int(0.05 * 2**32)})
                    end
            order by doc_id
        """,
        "exact_quantiles_lineitem": """
            select 0.25::double as q,
                   round(quantile_cont(l_extendedprice, 0.25), 4) as value
            from lineitem
            union all select 0.5::double,
                   round(quantile_cont(l_extendedprice, 0.5), 4)
            from lineitem
            union all select 0.75::double,
                   round(quantile_cont(l_extendedprice, 0.75), 4)
            from lineitem
            union all select 0.95::double,
                   round(quantile_cont(l_extendedprice, 0.95), 4)
            from lineitem
            order by q
        """,
        "histogram_orders": """
            select least(floor((o_totalprice - 0.0) * 20 / 600000.0),
                         19)::bigint as bin,
                   count(*) as n
            from orders
            where o_totalprice >= 0.0 and o_totalprice <= 600000.0
            group by bin order by bin
        """,
        "q6_forecast_revenue": """
            select round(sum(l_extendedprice * l_discount), 4)
                       as revenue,
                   count(*)::bigint as n_items
            from lineitem
            where l_shipdate >= timestamp '1996-01-01'
              and l_shipdate < timestamp '1997-01-01'
              and l_discount >= 0.05 and l_discount <= 0.07
              and l_quantity < 24
        """,
        "event_type_cooccurrence": """
            with dt as (
              select distinct user_id, event_type
              from events
              where user_id is not null and event_type is not null)
            select a.event_type as type_a, b.event_type as type_b,
                   count(*)::bigint as n_keys
            from dt a join dt b
              on a.user_id = b.user_id
             and a.event_type < b.event_type
            group by type_a, type_b order by type_a, type_b
        """,
        "user_event_type_set": """
            select user_id,
                   string_agg(distinct event_type, ','
                              order by event_type) as vals,
                   count(distinct event_type)::bigint as n_distinct
            from events
            where user_id is not null and event_type is not null
            group by user_id order by user_id
        """,
        "type_value_mutual_information": """
            with c as (
              select event_type as a,
                     least(floor((value - 0.0) * 10 / 500.0),
                           9)::bigint as b,
                     count(*)::double as n
              from events
              where value >= 0.0 and value <= 500.0
                and event_type is not null
              group by a, b),
            tot as (select sum(n) as t from c),
            ma as (select a, sum(n) as na from c group by a),
            mb as (select b, sum(n) as nb from c group by b)
            select round(sum((n / t.t) * ln((n * t.t) / (na * nb))), 6)
                       as mi,
                   sum(n)::bigint as n
            from c join ma using (a) join mb using (b), tot t
        """,
        "spearman_qty_price": """
            with d as (
              select l_quantity as x, l_extendedprice as y
              from lineitem
              where l_quantity is not null
                and l_extendedprice is not null),
            r as (
              select (rank() over (order by x)
                      + (count(*) over (partition by x) - 1) / 2.0)
                         as rx,
                     (rank() over (order by y)
                      + (count(*) over (partition by y) - 1) / 2.0)
                         as ry
              from d)
            select round(corr(rx, ry), 6) as spearman_r,
                   count(*)::bigint as n
            from r
        """,
        "corr_matrix_lineitem": """
            with p as (
              select 'l_quantity' as col_x, 'l_extendedprice' as col_y,
                     corr(l_quantity, l_extendedprice) as r,
                     count(*) filter (l_quantity is not null and
                                      l_extendedprice is not null) as n
              from lineitem
              union all
              select 'l_quantity', 'l_discount',
                     corr(l_quantity, l_discount),
                     count(*) filter (l_quantity is not null and
                                      l_discount is not null)
              from lineitem
              union all
              select 'l_quantity', 'l_tax', corr(l_quantity, l_tax),
                     count(*) filter (l_quantity is not null and
                                      l_tax is not null)
              from lineitem
              union all
              select 'l_extendedprice', 'l_discount',
                     corr(l_extendedprice, l_discount),
                     count(*) filter (l_extendedprice is not null and
                                      l_discount is not null)
              from lineitem
              union all
              select 'l_extendedprice', 'l_tax',
                     corr(l_extendedprice, l_tax),
                     count(*) filter (l_extendedprice is not null and
                                      l_tax is not null)
              from lineitem
              union all
              select 'l_discount', 'l_tax', corr(l_discount, l_tax),
                     count(*) filter (l_discount is not null and
                                      l_tax is not null)
              from lineitem)
            select col_x, col_y, round(r, 6) as r, n::bigint as n
            from p order by col_x, col_y
        """,
        "daily_event_counts_dense": """
            with c as (
              select date_trunc('day', ts) as day, count(*)::bigint as n
              from events where ts is not null group by day),
            b as (select min(day) as lo, max(day) as hi from c),
            cal as (select unnest(generate_series(lo, hi,
                                                  interval 1 day)) as day
                    from b)
            select cal.day, coalesce(c.n, 0)::bigint as n
            from cal left join c using (day) order by day
        """,
        "session_duration_stats": """
            with e as (
              select user_id, ts from events
              where ts is not null and user_id is not null),
            m as (
              select user_id, ts,
                     case when lag(ts) over w is null
                               or ts - lag(ts) over w
                                  > interval 30 minutes
                          then 1 else 0 end as new_s
              from e window w as (partition by user_id order by ts)),
            s as (
              select user_id, ts,
                     sum(new_s) over (partition by user_id order by ts
                         rows unbounded preceding) as sid
              from m),
            d as (
              select user_id, sid, epoch(max(ts) - min(ts)) as dur
              from s group by user_id, sid)
            select user_id, count(*)::bigint as n_sessions,
                   round(avg(dur), 4) as avg_session_s,
                   round(max(dur), 4) as max_session_s
            from d group by user_id order by user_id
        """,
        "events_rollup": """
            select grouping_id(event_type,
                               strftime(ts, '%Y-%m-%d'))::bigint as lvl,
                   event_type, strftime(ts, '%Y-%m-%d') as day,
                   count(*)::bigint as n
            from events
            where ts is not null and event_type is not null
            group by grouping sets
                ((event_type, strftime(ts, '%Y-%m-%d')),
                 (event_type), (strftime(ts, '%Y-%m-%d')), ())
            order by lvl, event_type nulls last, day nulls last
        """,
        "activity_heatmap": """
            select dayofweek(ts)::bigint as dow, hour(ts)::bigint as hod,
                   count(*)::bigint as n
            from events where ts is not null
            group by dow, hod order by dow, hod
        """,
        "doc_length_quartiles_by_lang": """
            with f as (
              select lang,
                     quantile_cont(n_chars, 0.25) as q1,
                     quantile_cont(n_chars, 0.5) as q2,
                     quantile_cont(n_chars, 0.75) as q3
              from documents
              where n_chars is not null and lang is not null
              group by lang)
            select d.doc_id, d.lang,
                   cast(1 + cast(d.n_chars > f.q1 as int)
                          + cast(d.n_chars > f.q2 as int)
                          + cast(d.n_chars > f.q3 as int) as bigint)
                       as bucket
            from documents d join f using (lang)
            where d.n_chars is not null
            order by doc_id
        """,
        "user_hour_entropy": """
            with c as (
              select user_id, hour(ts) as hod, count(*)::double as n
              from events
              where ts is not null and user_id is not null
              group by user_id, hod),
            t as (select user_id, sum(n) as tot from c group by user_id)
            select c.user_id,
                   round(-sum((n / tot) * ln(n / tot)), 6)
                       as hour_entropy,
                   sum(n)::bigint as n_events
            from c join t using (user_id)
            group by c.user_id order by c.user_id
        """,
        "value_mad_by_type": """
            with m as (
              select event_type, median(value) as med
              from events
              where value is not null and event_type is not null
              group by event_type)
            select e.event_type,
                   round(median(abs(e.value - m.med)), 6) as mad,
                   count(*)::bigint as n
            from events e join m using (event_type)
            where e.value is not null
            group by e.event_type order by e.event_type
        """,
        "cohort_retention": """
            with e as (
              select user_id, date_trunc('day', ts) as day
              from events
              where ts is not null and user_id is not null),
            f as (select user_id, min(day) as cohort from e
                  group by user_id)
            select strftime(f.cohort, '%Y-%m-%d') as cohort,
                   datediff('day', f.cohort, e.day)::bigint as day_offset,
                   count(distinct e.user_id)::bigint as n_users
            from e join f using (user_id)
            group by 1, 2 order by 1, 2
        """,
        "rolling_rows_mean_user": """
            select event_id,
                   round(avg(value) over (
                       partition by user_id order by ts, event_id
                       rows between 2 preceding and current row),
                       4) as rolling_mean
            from events order by event_id
        """,
        "active_days_histogram": """
            with s as (
              select user_id,
                     count(distinct date_trunc('day', ts))::double as d
              from events where ts is not null group by user_id)
            select least(floor((d - 0.0) * 20 / 100.0), 19)::bigint
                       as bin,
                   count(*) as n
            from s where d >= 0.0 and d <= 100.0
            group by bin order by bin
        """,
        "top_tokens_per_lang": r"""
            with tok as (
              select lang,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) as token
              from documents where lang is not null),
            c as (select lang, token, count(*)::bigint as cnt
                  from tok group by lang, token),
            rk as (select *, row_number() over (partition by lang
                       order by cnt desc, token) as rn
                   from c)
            select lang, token, cnt from rk where rn <= 3
            order by lang, token
        """,
        "q10_returned_items": """
            select c.c_custkey, c.c_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                       as revenue,
                   c.c_acctbal, n.n_name
            from lineitem l
            join orders o on l.l_orderkey = o.o_orderkey
            join customer c on o.o_custkey = c.c_custkey
            join nation n on c.c_nationkey = n.n_nationkey
            where o.o_orderdate >= timestamp '1996-01-01'
              and o.o_orderdate < timestamp '1996-04-01'
              and l.l_returnflag = 'R'
            group by c.c_custkey, c.c_name, c.c_acctbal, n.n_name
            order by revenue desc, c_custkey limit 20
        """,
        "revenue_pareto_share": """
            with r as (
              select o_custkey, sum(o_totalprice) as rev
              from orders
              where o_custkey is not null and o_totalprice is not null
              group by o_custkey),
            rk as (
              select rev,
                     row_number() over (order by rev desc, o_custkey)
                         as rn,
                     count(*) over () as n,
                     sum(rev) over () as tot
              from r)
            select round(sum(case when rn <= ceil(0.2 * n)
                                  then rev else 0 end)
                         / any_value(tot), 6) as top_share,
                   any_value(n)::bigint as n_keys
            from rk
        """,
        "daily_value_quantiles": """
            with e as (
              select strftime(ts, '%Y-%m-%d') as day, value
              from events where ts is not null and value is not null)
            select day, 0.5 as q,
                   round(quantile_cont(value, 0.5), 4) as value
            from e group by day
            union all
            select day, 0.9 as q,
                   round(quantile_cont(value, 0.9), 4) as value
            from e group by day
            order by day, q
        """,
        "value_gini_by_type": """
            with r as (
              select event_type, value,
                     row_number() over (partition by event_type
                                        order by value, event_id) as rn,
                     count(*) over (partition by event_type) as n,
                     sum(value) over (partition by event_type) as s
              from events
              where value is not null and event_type is not null)
            select event_type,
                   case when any_value(s) != 0 then
                       round(sum((2.0 * rn - n - 1) * value)
                             / (any_value(n) * any_value(s)), 6)
                   end as gini,
                   any_value(n)::bigint as n
            from r group by event_type order by event_type
        """,
        "grouped_iqr_outliers_events": """
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
            order by e.event_id
        """,
        "grouped_histogram_events": """
            select event_type,
                   least(floor((value - 0.0) * 20 / 500.0),
                         19)::bigint as bin,
                   count(*) as n
            from events
            where value >= 0.0 and value <= 500.0
              and event_type is not null
            group by event_type, bin order by event_type, bin
        """,
        "grouped_minmax_scale_events": """
            select event_id,
                   case when max(value) over (partition by user_id)
                             > min(value) over (partition by user_id)
                        then round((value - min(value) over (
                                 partition by user_id))
                             / (max(value) over (partition by user_id)
                                - min(value) over (
                                    partition by user_id)), 6)
                   end as scaled
            from events where value is not null order by event_id
        """,
        "user_activity_span": """
            select user_id, count(*)::bigint as n_events,
                   count(distinct date_trunc('day', ts))::bigint
                       as n_active_days,
                   min(ts) as first_ts, max(ts) as last_ts
            from events where ts is not null
            group by user_id order by user_id
        """,
        "distinct_users_per_event_type": """
            select event_type, count(distinct user_id) as n_distinct
            from events
            where event_type is not null and user_id is not null
            group by event_type order by event_type
        """,
        "ewma_user_value": """
            with recursive
            s as (select event_id, user_id, value,
                         row_number() over (partition by user_id
                                            order by ts, event_id) as rn
                  from events
                  where value is not null and user_id is not null),
            e(user_id, rn, event_id, y) as (
              select user_id, rn, event_id, value from s where rn = 1
              union all
              select s.user_id, s.rn, s.event_id,
                     0.3 * s.value + 0.7 * e.y
              from e join s on s.user_id = e.user_id and s.rn = e.rn + 1)
            select event_id, round(y, 4) as ewma
            from e order by event_id
        """,
        "ewma_halflife_user_value": """
            with recursive
            s as (select event_id, user_id, value,
                         epoch_us(ts) as tus,
                         row_number() over (partition by user_id
                                            order by ts, event_id) as rn
                  from events
                  where value is not null and ts is not null
                    and user_id is not null),
            e(user_id, rn, event_id, tus, w, y) as (
              -- seed w must be DOUBLE: a bare 1.0 types the CTE column
              -- DECIMAL(2,1) and rounds the carried weight every step
              select user_id, rn, event_id, tus, 1.0::double, value
              from s where rn = 1
              union all
              select s.user_id, s.rn, s.event_id, s.tus,
                     e.w * pow(0.5, (s.tus - e.tus) / 3600000000.0) + 1.0,
                     (e.w * pow(0.5, (s.tus - e.tus) / 3600000000.0) * e.y
                      + s.value)
                     / (e.w * pow(0.5, (s.tus - e.tus) / 3600000000.0)
                        + 1.0)
              from e join s on s.user_id = e.user_id and s.rn = e.rn + 1)
            select event_id, round(y, 4) as ewma_hl
            from e order by event_id
        """,
        "percentile_rank_events": """
            select event_id,
                   percent_rank() over (order by value) as pct_rank
            from events where value is not null
            order by event_id
        """,
        "lag_diff_user_value": """
            select event_id,
                   round(value - lag(value) over (
                       partition by user_id order by ts, event_id),
                         4) as lag_diff
            from events order by event_id
        """,
        "grouped_moments_lineitem": """
            select l_returnflag, count(l_extendedprice) as n,
                   round(avg(l_extendedprice), 4) as mean,
                   round(stddev_samp(l_extendedprice), 4) as std_samp,
                   round(min(l_extendedprice), 4) as vmin,
                   round(max(l_extendedprice), 4) as vmax
            from lineitem group by l_returnflag order by l_returnflag
        """,
        "grouped_corr_lineitem": """
            select l_returnflag, count(*) as n,
                   round(corr(l_quantity, l_extendedprice), 6) as pearson_r
            from lineitem
            where l_quantity is not null and l_extendedprice is not null
            group by l_returnflag order by l_returnflag
        """,
        "winsorize_events": """
            with b as (
                select quantile_cont(value, 0.05) as lo,
                       quantile_cont(value, 0.95) as hi
                from events where value is not null)
            select event_id,
                   round(least(greatest(value, b.lo), b.hi), 4) as value
            from events, b where value is not null
            order by event_id
        """,
        "pack_sequences_docs": r"""
            with recursive
            s as (
              select doc_id, doc_id // 128 as shard,
                     len(regexp_extract_all(coalesce(text, ''),
                         '\S+'))::bigint as n,
                     row_number() over (partition by doc_id // 128
                                        order by doc_id) as rn
              from documents),
            p(shard, rn, doc_id, n, running, bin) as (
              select shard, rn, doc_id, n, n, 0::bigint from s
              where rn = 1
              union all
              select s.shard, s.rn, s.doc_id, s.n,
                     case when p.running + s.n <= 512
                          then p.running + s.n else s.n end,
                     case when p.running + s.n <= 512
                          then p.bin else p.bin + 1 end
              from p join s on s.shard = p.shard and s.rn = p.rn + 1)
            select doc_id, shard, bin, n as n_tokens
            from p order by doc_id
        """,
        "pack_sequences_bpe": r"""
            with recursive
            s as (
              select doc_id, doc_id // 128 as shard,
                     len(regexp_extract_all(coalesce(text, ''),
                         '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::bigint as n,
                     row_number() over (partition by doc_id // 128
                                        order by doc_id) as rn
              from documents),
            p(shard, rn, doc_id, n, running, bin) as (
              select shard, rn, doc_id, n, n, 0::bigint from s
              where rn = 1
              union all
              select s.shard, s.rn, s.doc_id, s.n,
                     case when p.running + s.n <= 512
                          then p.running + s.n else s.n end,
                     case when p.running + s.n <= 512
                          then p.bin else p.bin + 1 end
              from p join s on s.shard = p.shard and s.rn = p.rn + 1)
            select doc_id, shard, bin, n as n_tokens
            from p order by doc_id
        """,
        "pii_flags_docs": r"""
            with d as (
              select doc_id,
                     coalesce(text, '')
                     || case when doc_id % 7 = 0
                             then ' contact_' || doc_id || '@example.com'
                             else '' end
                     || case when doc_id % 11 = 0
                             then ' ip 10.0.0.' || (doc_id % 256)
                             else '' end as t
              from documents)
            select doc_id,
                   len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                       ))::bigint as n_emails,
                   len(regexp_extract_all(t,
                       '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b'
                       ))::bigint as n_phones,
                   len(regexp_extract_all(t,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'
                       ))::bigint as n_ipv4,
                   len(regexp_extract_all(t,
                       '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'
                       ))::bigint as n_ssn_like,
                   (len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                       )) > 0
                    or len(regexp_extract_all(t,
                       '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) > 0
                    or len(regexp_extract_all(t,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'
                       )) > 0
                    or len(regexp_extract_all(t,
                       '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) > 0) as has_pii
            from d order by doc_id
        """,
        "redact_pii_docs": r"""
            with d as (
              select doc_id,
                     coalesce(text, '')
                     || case when doc_id % 7 = 0
                             then ' contact_' || doc_id || '@example.com'
                             else '' end
                     || case when doc_id % 11 = 0
                             then ' ip 10.0.0.' || (doc_id % 256)
                             else '' end as t
              from documents)
            select doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                       '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
                       '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b',
                       '[PHONE]', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '[IP]', 'g') as redacted_text
            from d order by doc_id
        """,
        "streaming_dedup": """
            select min(doc_id) as doc_id from documents
            group by md5(coalesce(text, ''))
            order by doc_id
        """,
        "ngram_novelty_docs": r"""
            with d as (
              select doc_id,
                     list_filter(string_split_regex(
                         lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') as w
              from documents),
            g as (
              select doc_id,
                     list_distinct(case
                       when len(w) = 0 then []::varchar[]
                       when len(w) < 3 then [array_to_string(w, ' ')]
                       else list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     end) as grams
              from d),
            refg as (select distinct unnest(grams) as gram from g
                     where doc_id < 100),
            ex as (select doc_id, unnest(grams) as gram from g
                   where doc_id >= 100),
            sc as (select e.doc_id,
                          count(*) as total_grams,
                          count(*) filter (r.gram is null) as novel_grams
                   from ex e left join refg r on r.gram = e.gram
                   group by e.doc_id)
            select b.doc_id,
                   coalesce(sc.novel_grams, 0) as novel_grams,
                   coalesce(sc.total_grams, 0) as total_grams,
                   coalesce(sc.novel_grams::double / sc.total_grams,
                            0.0) as novelty
            from (select doc_id from g where doc_id >= 100) b
            left join sc on sc.doc_id = b.doc_id
            order by b.doc_id
        """,
        "grouped_quantiles_lineitem": """
            select l_returnflag, q, round(v, 4) as value
            from (
              select l_returnflag, 0.5 as q,
                     quantile_cont(l_extendedprice, 0.5) as v
              from lineitem group by l_returnflag
              union all
              select l_returnflag, 0.9,
                     quantile_cont(l_extendedprice, 0.9)
              from lineitem group by l_returnflag)
            order by l_returnflag, q
        """,
        "outlier_events": """
            with q as (select quantile_cont(value, 0.25) as q1,
                              quantile_cont(value, 0.75) as q3
                       from events)
            select event_id, value from events, q
            where value < q1 - 1.5 * (q3 - q1)
               or value > q3 + 1.5 * (q3 - q1)
            order by event_id
        """,
        "rolling_user_mean": """
            select event_id,
                   round(avg(value) over (
                       partition by user_id order by ts
                       range between interval 3 hours preceding
                             and current row), 4) as rolling_mean
            from events order by event_id
        """,
        "asof_last_purchase": """
            with l as (select event_id, user_id, ts from events
                       where event_type <> 'purchase'),
            r as (select user_id, ts, value from events
                  where event_type = 'purchase'
                  qualify row_number() over (partition by user_id, ts
                                             order by event_id desc) = 1)
            select l.event_id, r.value as last_purchase_value
            from l asof join r
              on l.user_id = r.user_id and l.ts >= r.ts
            order by l.event_id
        """,
        "events_after_purchase": """
            select l.event_id, r.event_id as purchase_id
            from (select event_id, user_id, ts from events
                  where event_type <> 'purchase') l
            join (select event_id, user_id, ts from events
                  where event_type = 'purchase') r
              on l.user_id = r.user_id
             and l.ts >= r.ts
             and l.ts < r.ts + interval 2 hours
            order by l.event_id, purchase_id
        """,
        "streaming_windows": """
            select user_id, date_trunc('hour', ts) as window_start,
                   count(*) as n_events,
                   round(sum(value), 4) as value_sum
            from events group by 1, 2
        """,
        "events_props_validation": """
            with e as (select event_id, props from events),
            k as (
              select event_id, props,
                     json_extract(props, '$.k') as kv,
                     json_type(props, '$.k') as kt
              from e where props is not null and json_valid(props))
            select event_id, 0 as error_seq,
                   'MissingInstance' as error_kind, '' as instance_path
            from e where props is null
            union all
            select event_id, 0, 'InvalidJson', '' from e
            where props is not null and not json_valid(props)
            union all
            select event_id, 0, 'MissingRequired', '/k' from k
            where kv is null
            union all
            select event_id, 0, 'ExpectedInteger', '/k' from k
            where kv is not null and kt not in ('UBIGINT', 'BIGINT')
            union all
            select event_id, 0, 'BelowMinimum', '/k' from k
            where kt in ('UBIGINT', 'BIGINT') and kv::bigint < 0
            union all
            select event_id, 0, 'AboveMaximum', '/k' from k
            where kt in ('UBIGINT', 'BIGINT') and kv::bigint > 50
        """,
        "embedding_near_dup": """
            with aug as (
              select vec_id, embedding from embeddings
              union all
              select vec_id + 1000000, embedding from embeddings
              where vec_id < 20),
            pairs as (
              select a.vec_id as key_a, b.vec_id as key_b,
                     list_cosine_similarity(a.embedding::double[],
                                            b.embedding::double[]) as cos
              from aug a join aug b on a.vec_id < b.vec_id)
            select key_a, key_b, round(cos, 4) as cosine
            from pairs where cos >= 0.99
        """,
        "embedding_dup_clusters": """
            with recursive
            aug as (
              select vec_id, embedding from embeddings
              union all
              select vec_id + 1000000, embedding from embeddings
              where vec_id < 20
              union all
              select vec_id + 2000000, embedding from embeddings
              where vec_id < 10),
            e as (
              select a.vec_id as u, b.vec_id as v
              from aug a join aug b on a.vec_id < b.vec_id
              where list_cosine_similarity(a.embedding::double[],
                                           b.embedding::double[]) >= 0.99),
            sym as (select u as a, v as b from e
                    union all select v, u from e),
            reach(node, l) as (
              select distinct a, a from sym
              union
              select s.b, r.l from reach r join sym s on s.a = r.node)
            select node as vec_id, min(l) as cluster_id
            from reach group by node order by vec_id
        """,

        "language_id": r'''
            with t as (select doc_id, coalesce(text, '') as txt
                       from documents),
            b as (select doc_id, txt,
                    greatest(len(regexp_extract_all(txt, '\S+')),
                             1)::double as denom,
                    greatest(length(txt), 1)::double as nchars
                  from t),
            s as (select doc_id, [
                    struct_pack(prio := 0, lang := 'en',
                      score := len(regexp_extract_all(txt,
                        '(?i)\b(the|and|of|to|a|in|is|that|it|for)\b'
                        ))::double / denom),
                    struct_pack(prio := 1, lang := 'de',
                      score := len(regexp_extract_all(txt,
                        '(?i)\b(der|die|und|das|ist|nicht|ein|mit|zu)\b'
                        ))::double / denom),
                    struct_pack(prio := 2, lang := 'fr',
                      score := len(regexp_extract_all(txt,
                        '(?i)\b(le|la|les|et|des|est|une|dans|que)\b'
                        ))::double / denom),
                    struct_pack(prio := 3, lang := 'es',
                      score := len(regexp_extract_all(txt,
                        '(?i)\b(el|la|los|de|que|y|en|un|una|es)\b'
                        ))::double / denom),
                    struct_pack(prio := 4, lang := 'zh',
                      score := len(regexp_extract_all(txt,
                        '[\x{4e00}-\x{9fff}]'))::double / nchars * 5.0)
                  ] as cand from b),
            u as (select doc_id, unnest(cand, recursive := true) from s),
            r as (select doc_id, lang, score,
                         row_number() over (partition by doc_id
                                            order by score desc, prio) as rn
                  from u)
            select doc_id,
                   case when score > 0.01 then lang else 'und'
                       end as lang_pred,
                   round(score, 4) as lang_score
            from r where rn = 1
        ''',
        "jaccard_verify": r"""
            with d as (
              select doc_id,
                     list_filter(string_split_regex(
                         lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') as w
              from documents where doc_id <= 199),
            sh as (
              select doc_id,
                     case
                       when len(w) = 0 then []::varchar[]
                       when len(w) < 3 then [array_to_string(w, ' ')]
                       else list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     end as grams
              from d),
            g as (select doc_id, list_distinct(grams) as grams from sh),
            pairs as (
              select a.doc_id as key_a, b.doc_id as key_b,
                     a.grams as ga, b.grams as gb
              from g a join g b on b.doc_id = a.doc_id + 1
              where a.doc_id < 199)
            select key_a, key_b,
                   round(case
                     when len(ga) = 0 and len(gb) = 0 then 1.0
                     else len(list_distinct(list_intersect(ga, gb)))::double
                          / len(list_distinct(ga || gb))
                   end, 4) as jaccard
            from pairs
        """,
        "near_dup_clusters": r"""
            with recursive
            d as (
              select doc_id,
                     list_filter(string_split_regex(
                         lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') as w
              from documents),
            g as (
              select doc_id,
                     list_distinct(case
                       when len(w) = 0 then []::varchar[]
                       when len(w) < 3 then [array_to_string(w, ' ')]
                       else list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     end) as grams
              from d),
            ex as (select doc_id, unnest(grams) as gram from g),
            cand as (
              select distinct a.doc_id as u, b.doc_id as v
              from ex a join ex b using (gram)
              where a.doc_id < b.doc_id),
            e as (
              select u, v from cand
              join g ga on ga.doc_id = cand.u
              join g gb on gb.doc_id = cand.v
              where (case when len(ga.grams) = 0 and len(gb.grams) = 0
                          then 1.0
                          else len(list_distinct(list_intersect(
                                   ga.grams, gb.grams)))::double
                               / len(list_distinct(ga.grams || gb.grams))
                     end) >= 0.6),
            sym as (select u as a, v as b from e
                    union all select v, u from e),
            reach(node, l) as (
              select distinct a, a from sym
              union
              select s.b, r.l from reach r join sym s on s.a = r.node)
            select node as doc_id, min(l) as cluster_id
            from reach group by node order by doc_id
        """,
        "near_dup_survivors": r"""
            with recursive
            d as (
              select doc_id,
                     list_filter(string_split_regex(
                         lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') as w
              from documents),
            g as (
              select doc_id,
                     list_distinct(case
                       when len(w) = 0 then []::varchar[]
                       when len(w) < 3 then [array_to_string(w, ' ')]
                       else list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     end) as grams
              from d),
            ex as (select doc_id, unnest(grams) as gram from g),
            cand as (
              select distinct a.doc_id as u, b.doc_id as v
              from ex a join ex b using (gram)
              where a.doc_id < b.doc_id),
            e as (
              select u, v from cand
              join g ga on ga.doc_id = cand.u
              join g gb on gb.doc_id = cand.v
              where (case when len(ga.grams) = 0 and len(gb.grams) = 0
                          then 1.0
                          else len(list_distinct(list_intersect(
                                   ga.grams, gb.grams)))::double
                               / len(list_distinct(ga.grams || gb.grams))
                     end) >= 0.6),
            sym as (select u as a, v as b from e
                    union all select v, u from e),
            reach(node, l) as (
              select distinct a, a from sym
              union
              select s.b, r.l from reach r join sym s on s.a = r.node),
            comp as (select node, min(l) as cluster_id
                     from reach group by node),
            losers as (select node from comp where node <> cluster_id)
            select doc_id from documents
            where doc_id not in (select node from losers)
            order by doc_id
        """,
        "train_test_contamination": r"""
            with d as (
              select doc_id,
                     list_filter(string_split_regex(
                         lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') as w
              from documents),
            g as (
              select doc_id,
                     list_distinct(case
                       when len(w) = 0 then []::varchar[]
                       when len(w) < 3 then [array_to_string(w, ' ')]
                       else list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     end) as grams
              from d),
            ex as (select doc_id, unnest(grams) as gram from g),
            cand as (
              select distinct a.doc_id as u, b.doc_id as v
              from ex a join ex b using (gram)
              where a.doc_id % 5 <> 0 and b.doc_id % 5 = 0),
            j as (
              select u, v,
                     (case when len(ga.grams) = 0 and len(gb.grams) = 0
                           then 1.0
                           else len(list_distinct(list_intersect(
                                    ga.grams, gb.grams)))::double
                                / len(list_distinct(ga.grams || gb.grams))
                      end) as jac
              from cand
              join g ga on ga.doc_id = cand.u
              join g gb on gb.doc_id = cand.v)
            select u as train_id, v as test_id, round(jac, 4) as jaccard
            from j where jac >= 0.6
            order by train_id, test_id
        """,
        "latest_event_per_user": """
            select user_id, event_id, ts, value
            from (select user_id, event_id, ts, value,
                         row_number() over (partition by user_id
                             order by ts desc, event_id desc) as rn
                  from events)
            where rn = 1
            order by user_id
        """,
        "pivot_events_value": """
            select user_id,
                   round(coalesce(sum(value) filter (
                       where event_type = 'click'), 0), 4) as sum_click,
                   round(coalesce(sum(value) filter (
                       where event_type = 'error'), 0), 4) as sum_error,
                   round(coalesce(sum(value) filter (
                       where event_type = 'purchase'), 0), 4)
                       as sum_purchase,
                   round(coalesce(sum(value) filter (
                       where event_type = 'signup'), 0), 4) as sum_signup,
                   round(coalesce(sum(value) filter (
                       where event_type = 'view'), 0), 4) as sum_view
            from events
            where user_id is not null
            group by user_id
            order by user_id
        """,
        "click_not_purchase_users": """
            select user_id from (
              select distinct user_id from events
              where event_type = 'click' and value > 95.0
                and user_id is not null
              except
              select distinct user_id from events
              where event_type = 'purchase' and value > 95.0
                and user_id is not null)
            order by user_id
        """,
        "click_xor_purchase_users": """
            with c as (
              select distinct user_id from events
              where event_type = 'click' and value > 95.0
                and user_id is not null),
            p as (
              select distinct user_id from events
              where event_type = 'purchase' and value > 95.0
                and user_id is not null)
            select user_id from (
              (select user_id from c except select user_id from p)
              union
              (select user_id from p except select user_id from c))
            order by user_id
        """,
        "session_value_sums": """
            with marked as (
              select user_id, ts, value,
                     case when ts - lag(ts) over w > interval 30 minutes
                          or lag(ts) over w is null then 1 else 0
                     end as new_s
              from events
              window w as (partition by user_id order by ts)
            ), sess as (
              select user_id, ts, value,
                     sum(new_s) over (partition by user_id order by ts
                                      rows unbounded preceding)::bigint
                         as session_id
              from marked)
            select user_id, session_id, count(*) as n_events,
                   min(ts) as session_start, max(ts) as session_end,
                   round(sum(value), 4) as value_sum,
                   count(value) as n_values
            from sess group by 1, 2
            order by user_id, session_id
        """,
        "click_and_purchase_users": """
            select user_id from (
              select distinct user_id from events
              where event_type = 'click' and value > 95.0
                and user_id is not null
              intersect
              select distinct user_id from events
              where event_type = 'purchase' and value > 95.0
                and user_id is not null)
            order by user_id
        """,
        "mode_event_type_per_user": """
            with c as (
              select user_id, event_type, count(*) as n
              from events where event_type is not null
                and user_id is not null
              group by user_id, event_type),
            m as (select user_id, max(n) as mn from c group by user_id)
            select c.user_id,
                   min(c.event_type) as mode_value,
                   m.mn as n
            from c join m on c.user_id = m.user_id and c.n = m.mn
            group by c.user_id, m.mn
            order by c.user_id
        """,
        "running_sum_user_value": """
            select event_id,
                   round(coalesce(sum(value) over (
                       partition by user_id order by ts, event_id
                       rows unbounded preceding), 0), 4) as running_sum
            from events
            order by event_id
        """,
        "rolling_user_min_max": """
            select event_id,
                   round(min(value) over (
                       partition by user_id order by ts
                       range between interval 3 hours preceding
                             and current row), 4) as rolling_min,
                   round(max(value) over (
                       partition by user_id order by ts
                       range between interval 3 hours preceding
                             and current row), 4) as rolling_max
            from events where ts is not null order by event_id
        """,
        "running_min_max_user_value": """
            select event_id,
                   round(min(value) over (
                       partition by user_id order by ts, event_id
                       rows unbounded preceding), 4) as running_min,
                   round(max(value) over (
                       partition by user_id order by ts, event_id
                       rows unbounded preceding), 4) as running_max
            from events order by event_id
        """,
        "user_gap_stats": """
            with g as (
              select user_id,
                     epoch(ts - lag(ts) over (
                         partition by user_id order by ts, event_id))
                         as gap
              from events where ts is not null)
            select user_id, count(gap)::bigint as n_gaps,
                   round(avg(gap), 4) as avg_gap_s,
                   round(max(gap), 4) as max_gap_s
            from g group by user_id order by user_id
        """,
        "delta_from_first_user_value": """
            select event_id,
                   round(value - first_value(value) over (
                       partition by user_id order by ts, event_id
                       rows unbounded preceding), 4) as delta_from_first
            from events order by event_id
        """,
        "window_ranks_events": """
            select event_id,
                   row_number() over (partition by user_id
                       order by value asc nulls last, event_id)
                       as row_number,
                   rank() over (partition by user_id
                       order by value asc nulls last) as rank,
                   dense_rank() over (partition by user_id
                       order by value asc nulls last) as dense_rank
            from events order by event_id
        """,
        "tfidf_top_terms": r"""
            with tok as (
              select doc_id, token, count(*)::bigint as tf
              from (select doc_id,
                           unnest(string_split_regex(coalesce(text, ''),
                                                     '\s+')) as token
                    from documents)
              where token <> '' group by doc_id, token),
            d as (select token, count(*)::bigint as df
                  from tok group by token),
            n as (select count(*)::double as n from documents),
            scored as (
              select t.doc_id, t.token, t.tf,
                     t.tf * ln(n.n / d.df) as score,
                     row_number() over (partition by t.doc_id
                         order by t.tf * ln(n.n / d.df) desc,
                                  t.token) as rn
              from tok t join d using(token), n)
            select doc_id, token, tf, round(score, 6) as score
            from scored where rn <= 5
            order by doc_id, token
        """,
        "label_centroids": """
            select cast(label as bigint) as label,
                   i as dim,
                   round(avg(embedding[i + 1]), 6) as value
            from embeddings, range(64) t(i)
            where label is not null and len(embedding) = 64
            group by label, i
            order by label, dim
        """,
        "quantile_buckets_events": """
            with f as (
              select quantile_cont(value, 0.25) as q1,
                     quantile_cont(value, 0.5) as q2,
                     quantile_cont(value, 0.75) as q3
              from events where value is not null)
            select event_id,
                   cast(1 + cast(value > q1 as int)
                          + cast(value > q2 as int)
                          + cast(value > q3 as int) as bigint) as bucket
            from events, f where value is not null
            order by event_id
        """,
        "robust_zscore_events": """
            with m as (
              select quantile_cont(value, 0.5) as med
              from events where value is not null),
            d as (
              select quantile_cont(abs(value - med), 0.5) as mad
              from events, m where value is not null)
            select event_id, round((value - med) / mad, 6) as rz
            from events, m, d where value is not null
            order by event_id
        """,
        "window_rank_fractions_events": """
            select event_id,
                   round(percent_rank() over (partition by user_id
                       order by value asc nulls last), 6) as pct_rank,
                   round(cume_dist() over (partition by user_id
                       order by value asc nulls last), 6) as cume_dist,
                   ntile(4) over (partition by user_id
                       order by value asc nulls last, event_id) as bucket
            from events order by event_id
        """,
        "grouped_median_orders": """
            select o_orderpriority, cast(0.5 as double) as q,
                   round(quantile_cont(o_totalprice, 0.5), 4) as value
            from orders group by o_orderpriority
            order by o_orderpriority, q
        """,
        "rolling_user_sum": """
            select event_id,
                   round(sum(value) over (
                       partition by user_id order by ts
                       range between interval 3 hours preceding
                             and current row), 4) as rolling_sum,
                   count(value) over (
                       partition by user_id order by ts
                       range between interval 3 hours preceding
                             and current row) as rolling_n
            from events order by event_id
        """,
        "user_event_sequences": """
            select user_id,
                   string_agg(event_type, ','
                       order by ts, event_id) as seq,
                   count(event_type) as n_items
            from events
            where user_id is not null
            group by user_id
            having count(event_type) > 0
            order by user_id
        """,
        "click_or_purchase_users": """
            select user_id from (
              select distinct user_id from events
              where event_type = 'click' and value > 95.0
                and user_id is not null
              union
              select distinct user_id from events
              where event_type = 'purchase' and value > 95.0
                and user_id is not null)
            order by user_id
        """,
        "semi_join_events_purchases": """
            select event_id, ts, user_id, value from events e
            where exists (
              select 1 from events p
              where p.user_id = e.user_id
                and p.event_type = 'purchase' and p.value > 95.0)
            order by event_id
        """,
        "anti_join_events_purchases": """
            select event_id, ts, user_id, value from events e
            where not exists (
              select 1 from events p
              where p.user_id = e.user_id
                and p.event_type = 'purchase' and p.value > 95.0)
            order by event_id
        """,
    }
