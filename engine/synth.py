"""Deterministic interleaved text+media corpus synthesis (Ray pipeline).

``BASELINE.json`` input_hint fixes the table under validation as
``documents(doc_id: string, spans: list<struct<kind, text, media_ref,
offset>>)``. This module derives that table deterministically from the
driver-provided ``documents.parquet`` (TESTDATA.md) — every span sequence and
every injected violation is a pure function of ``(source doc_id, replica,
seed)``, so any run at any parallelism produces byte-identical logical rows.

Violation injection rates follow FIXTURES.md §1 (~1-5% per keyword): wrong
span kind, over-long text, pattern-breaking media_ref, negative/huge offset,
duplicate spans (uniqueItems), bad/duplicate doc_id (including one hot key for
skew-split exercise), dangling media_ref, and one drifted partition (shifted
offset distribution + skewed kind mix) for KS/PSI.

Runs as an idiomatic Ray pipeline: ``read_parquet -> map_batches(SynthSpans)
-> write_parquet(partition_cols=["partition_id"])`` — the partitioned layout
doubles as the resumable checkpoint unit.
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np
import pyarrow as pa

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

CORPUS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
    ("partition_id", pa.string()),
])

KINDS = ("image", "audio", "table")
CATALOG_SIZE = 10_000
HOT_DOC_ID = "doc-0hot"


def media_ref_for(idx: int) -> str:
    h = hashlib.sha1(f"media-{idx}".encode()).hexdigest()[:16]
    return f"media://{h}"


def write_media_catalog(out_dir: str, size: int = CATALOG_SIZE) -> str:
    """The media-ref universe; the Bloom filter side input is built from it."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "media_catalog.parquet")
    if not os.path.exists(path):
        import pyarrow.parquet as pq
        refs = [media_ref_for(i) for i in range(size)]
        sizes = [(i * 2654435761) % 10_000_000 for i in range(size)]
        pq.write_table(
            pa.table({"media_ref": refs, "bytes": pa.array(sizes, pa.int64())}),
            path)
    return path


class SynthSpans:
    """Actor-pool batch stage: source documents rows -> interleaved spans docs.

    ``replicate`` multiplies the corpus (replica r gets distinct doc_ids and
    an independent violation draw) so small source tables can stand in for
    large ones in benchmarks.
    """

    def __init__(self, replicate: int = 1, partitions: int = 16,
                 seed: int = 42, violation_rate: float = 0.02):
        self.replicate = replicate
        self.partitions = partitions
        self.seed = seed
        self.rate = violation_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_ids: list = []
        out_spans: list = []
        out_parts: list = []
        for r in range(self.replicate):
            for src_id, text in zip(doc_ids, texts):
                doc_id, spans, part = self._make_doc(int(src_id), r, text or "")
                out_ids.append(doc_id)
                out_spans.append(spans)
                out_parts.append(part)
        return pa.table({
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, pa.list_(SPAN_TYPE)),
            "partition_id": pa.array(out_parts, pa.string()),
        })

    def _make_doc(self, src_id: int, replica: int, text: str):
        uid = src_id * max(self.replicate, 1) + replica
        rng = random.Random((self.seed << 32) ^ uid)
        part_idx = rng.randrange(self.partitions)
        part = f"p{part_idx:04d}"
        drifted = part_idx == self.partitions - 1  # last partition drifts

        doc_id = f"doc-{uid:x}"
        roll = rng.random()
        if roll < self.rate * 0.5:
            doc_id = f"DOC_{uid}"          # pattern violation
        elif roll < self.rate * 0.75:
            doc_id = ""                     # minLength violation
        elif roll < self.rate:
            doc_id = HOT_DOC_ID             # duplicate + hot key (skew)

        # chunk the text into word-aligned text spans
        words = text.split()
        n_chunks = min(max(1, len(words) // 6), 12)
        chunk_size = max(1, len(words) // n_chunks) if words else 1
        spans = []
        offset = 0
        for c in range(n_chunks):
            chunk = " ".join(words[c * chunk_size:(c + 1) * chunk_size])
            spans.append({"kind": "text", "text": chunk, "media_ref": "",
                          "offset": offset})
            offset += len(chunk) + 1
            if rng.random() < (0.6 if drifted else 0.25):
                kind = KINDS[rng.randrange(3)] if not drifted else "image"
                ref_idx = rng.randrange(CATALOG_SIZE)
                if rng.random() < self.rate:
                    ref_idx += CATALOG_SIZE  # dangling ref (not in catalog)
                spans.append({"kind": kind, "text": "",
                              "media_ref": media_ref_for(ref_idx),
                              "offset": offset})
                offset += 1
        if drifted:
            # shifted offset distribution for the KS check
            spans = [{**s, "offset": s["offset"] + 5000} for s in spans]

        # keyword-violation injection (each an independent draw)
        if rng.random() < self.rate and spans:
            spans[rng.randrange(len(spans))]["kind"] = "video"  # enum
        if rng.random() < self.rate and spans:
            i = rng.randrange(len(spans))
            spans[i]["text"] = "x" * 4097                        # maxLength
        if rng.random() < self.rate and spans:
            i = rng.randrange(len(spans))
            spans[i]["media_ref"] = "media:/broken"              # pattern
        if rng.random() < self.rate and spans:
            spans[rng.randrange(len(spans))]["offset"] = -rng.randrange(1, 99)
        if rng.random() < self.rate and spans:
            spans[rng.randrange(len(spans))]["offset"] = 2_000_000  # maximum
        if rng.random() < self.rate and spans:
            spans.append(dict(spans[rng.randrange(len(spans))]))  # uniqueItems
        if rng.random() < self.rate * 0.5:
            spans = []                                            # minItems
        if len(spans) > 16:
            spans = spans[:17] if rng.random() < self.rate else spans[:16]
        return doc_id, spans, part


def build_corpus(sf_dir: str, out_dir: str, *, replicate: int = 1,
                 partitions: int = 16, seed: int = 42,
                 concurrency=None) -> str:
    """Materialize the spans corpus (idempotent: skips when already built)."""
    import ray.data

    corpus_dir = os.path.join(out_dir, "documents_spans")
    done_marker = os.path.join(out_dir, "_SYNTH_DONE")
    write_media_catalog(out_dir)
    if os.path.exists(done_marker):
        return corpus_dir
    # crash safety: write into a temp dir and commit via atomic rename, so a
    # killed build never leaves a partial corpus that a rerun appends to
    import shutil
    tmp_dir = corpus_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    if os.path.exists(corpus_dir):
        shutil.rmtree(corpus_dir)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    ds = ds.map_batches(
        SynthSpans(replicate=replicate, partitions=partitions, seed=seed),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency)
    ds.write_parquet(tmp_dir, partition_cols=["partition_id"])
    os.rename(tmp_dir, corpus_dir)
    with open(done_marker, "w") as f:
        f.write("ok")
    return corpus_dir
