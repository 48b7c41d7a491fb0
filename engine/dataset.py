"""Ray Data wiring: streaming validation of a Dataset against a schema.

Pipeline shape (SURVEY.md §3.1 engine equivalent): the plan is compiled once
per actor (``ValidateBatch.__init__``), batches flow zero-copy as
``pyarrow.Table`` (``batch_format="pyarrow", zero_copy_batch=True``), and the
violations stream is itself a Dataset that can be written, aggregated or
joined without materializing the corpus. Nothing here calls ``ray.init``.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from engine import errors as E
from engine.compile import compile_plan
from engine.kernels import validate_batch
from engine.pointer import encode_pointer
from engine.schema import parse_schema

#: FIXTURES.md §3 — the primary schema applied to the interleaved documents
#: table; exercises every keyword the reference validator implements.
DOC_SCHEMA_JSON = """
{
  "$schema": "https://json-schema.org/draft/2020-12/schema",
  "type": "object",
  "required": ["doc_id", "spans"],
  "properties": {
    "doc_id": { "type": "string", "minLength": 1, "maxLength": 64,
                "pattern": "^doc-[0-9a-f]+$" },
    "spans": {
      "type": "array", "minItems": 1, "maxItems": 16, "uniqueItems": true,
      "items": { "$ref": "#/$defs/Span" }
    }
  },
  "additionalProperties": false,
  "$defs": {
    "Span": {
      "type": "object",
      "required": ["kind", "offset"],
      "properties": {
        "kind":      { "enum": ["text", "image", "audio", "table"] },
        "text":      { "type": "string", "maxLength": 4096 },
        "media_ref": { "anyOf": [ { "const": "" },
                                  { "type": "string",
                                    "pattern": "^media://[0-9a-f]{16}$" } ] },
        "offset":    { "type": "integer", "minimum": 0, "maximum": 1000000 }
      },
      "additionalProperties": false
    }
  }
}
"""

_META_COLUMNS = ("partition_id",)


class ValidateBatch:
    """Stateful batch validator stage for ``map_batches``.

    The plan (with compiled regexes) is built ONCE on the driver in
    ``__init__`` and shipped with the stage — fixing the reference's
    per-call regex recompile (``validator/mod.rs:260``) without changing
    observable behavior.

    Output: one violations row per error — ``(partition_id?, <key>, error_seq,
    error_kind, instance_path, message, context, <carry columns>)`` — where
    the carried ``spans`` column preserves the source span sequence exactly
    (the BASELINE.json per-row invariant).
    """

    def __init__(self, schema_json: str = DOC_SCHEMA_JSON, *,
                 key_column: str = "doc_id",
                 carry_columns: Sequence[str] = ("spans",),
                 instance_columns: Optional[Sequence[str]] = None,
                 with_message: bool = True):
        self.plan = compile_plan(parse_schema(schema_json))
        self.key_column = key_column
        self.carry_columns = tuple(carry_columns)
        self.instance_columns = (tuple(instance_columns)
                                 if instance_columns is not None else None)
        self.with_message = with_message

    def __call__(self, batch: pa.Table) -> pa.Table:
        inst_cols = self.instance_columns
        if inst_cols is None:
            inst_cols = [c for c in batch.column_names
                         if c not in _META_COLUMNS]
        inst = batch.select(list(inst_cols))
        errs = validate_batch(self.plan, inst)

        rows = np.array([r for r, _, _ in errs], dtype=np.int64)
        take = pa.array(rows)
        cols: dict = {}
        if "partition_id" in batch.column_names:
            cols["partition_id"] = batch.column("partition_id").take(take)
        cols[self.key_column] = batch.column(self.key_column).take(take)
        cols["error_seq"] = pa.array(
            np.array([s for _, s, _ in errs], dtype=np.int32))
        cols["error_kind"] = pa.array([e["kind"] for _, _, e in errs],
                                      pa.string())
        cols["instance_path"] = pa.array(
            [encode_pointer(e["path"]) for _, _, e in errs], pa.string())
        if self.with_message:
            cols["message"] = pa.array(
                [E.render_message(e) for _, _, e in errs], pa.string())
        cols["context"] = pa.array(
            [json.dumps({k: v for k, v in e.items()
                         if k not in ("kind", "path")}, default=str)
             for _, _, e in errs], pa.string())
        for c in self.carry_columns:
            if c in batch.column_names and c != self.key_column:
                cols[c] = batch.column(c).take(take)
        return pa.table(cols)


def validate_dataset(ds, schema_json: str = DOC_SCHEMA_JSON, *,
                     key_column: str = "doc_id",
                     carry_columns: Sequence[str] = ("spans",),
                     instance_columns: Optional[Sequence[str]] = None,
                     batch_size: int = 8192, concurrency=None,
                     with_message: bool = True):
    """``ds`` -> violations Dataset (streaming, zero-copy batches)."""
    return ds.map_batches(
        ValidateBatch(schema_json, key_column=key_column,
                      carry_columns=carry_columns,
                      instance_columns=instance_columns,
                      with_message=with_message),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


class MultiValidateBatch:
    """Validate every row against N schemas in ONE corpus pass (the
    dataset-level face of C1 batch compile): one plan per schema compiled
    up-front, violations tagged with ``schema_name``. One scan replaces N —
    the dominant cost at 100 TB is the read, not the predicate evaluation."""

    def __init__(self, schema_jsons: dict, *, key_column: str = "doc_id",
                 instance_columns: Optional[Sequence[str]] = None):
        self.stages = {
            name: ValidateBatch(sj, key_column=key_column,
                                carry_columns=(), with_message=False,
                                instance_columns=instance_columns)
            for name, sj in schema_jsons.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for name, stage in self.stages.items():
            out = stage(batch)
            out = out.append_column(
                "schema_name", pa.array([name] * len(out), pa.string()))
            parts.append(out)
        return pa.concat_tables(parts)


def validate_dataset_multi(ds, schema_jsons: dict, *,
                           key_column: str = "doc_id",
                           instance_columns: Optional[Sequence[str]] = None,
                           batch_size: int = 8192, concurrency=None):
    """One streaming pass, N schemas -> tagged violations Dataset."""
    return ds.map_batches(
        MultiValidateBatch(schema_jsons, key_column=key_column,
                           instance_columns=instance_columns),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


class _DocVerdictBatch:
    """Per-batch partial aggregate: (partition_id, docs, violation_docs,
    violations) — combine inside map_batches, tiny groupby after
    (partial+final pattern; avoids shuffling the corpus)."""

    def __init__(self, schema_json: str = DOC_SCHEMA_JSON,
                 instance_columns: Optional[Sequence[str]] = None):
        self.plan = compile_plan(parse_schema(schema_json))
        self.instance_columns = (tuple(instance_columns)
                                 if instance_columns is not None else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        inst_cols = self.instance_columns
        if inst_cols is None:
            inst_cols = [c for c in batch.column_names
                         if c not in _META_COLUMNS]
        inst = batch.select(list(inst_cols))
        errs = validate_batch(self.plan, inst)
        bad_rows = np.unique(np.array([r for r, _, _ in errs],
                                      dtype=np.int64))
        if "partition_id" in batch.column_names:
            parts = batch.column("partition_id").to_numpy(
                zero_copy_only=False)
        else:
            parts = np.full(len(batch), "all", dtype=object)
        uniq, counts = np.unique(parts, return_counts=True)
        bad_mask = np.zeros(len(batch), dtype=bool)
        bad_mask[bad_rows] = True
        err_parts = parts[[r for r, _, _ in errs]] if errs else parts[:0]
        out = []
        for p, total in zip(uniq.tolist(), counts.tolist()):
            out.append({
                "partition_id": p,
                "docs": int(total),
                "violation_docs": int((bad_mask & (parts == p)).sum()),
                "violations": int((err_parts == p).sum()),
            })
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("partition_id", pa.string()), ("docs", pa.int64()),
            ("violation_docs", pa.int64()), ("violations", pa.int64())]))


def partition_verdicts(ds, schema_json: str = DOC_SCHEMA_JSON, *,
                       instance_columns: Optional[Sequence[str]] = None,
                       batch_size: int = 8192, concurrency=None):
    """Per-partition pass/fail verdicts: partial counts inside map_batches,
    then a small groupby-sum over (partitions x batches) rows only."""
    partials = ds.map_batches(
        _DocVerdictBatch(schema_json, instance_columns),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)
    agg = partials.groupby("partition_id").sum(
        ["docs", "violation_docs", "violations"])
    agg = agg.map_batches(_finalize_verdict, batch_format="pyarrow")
    return agg


def _finalize_verdict(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    viol = batch.column("sum(violations)")
    viol_np = viol.to_numpy(zero_copy_only=False)
    checks_failed = pa.array(
        [["keyword_validation"] if v > 0 else [] for v in viol_np],
        pa.list_(pa.string()))
    return pa.table({
        "partition_id": batch.column("partition_id"),
        "docs": batch.column("sum(docs)"),
        "violation_docs": batch.column("sum(violation_docs)"),
        "violations": viol,
        "pass": pc.equal(viol, 0),
        "checks_failed": checks_failed,
    })


class JsonColumnValidator:
    """Dynamic-JSON fallback: validate a column of JSON *strings* (arbitrary,
    heterogeneous instances) with the row-wise oracle — the path for data the
    typed kernels cannot express (actor pool; compiled schema held per actor).
    """

    def __init__(self, schema_json: str, column: str, key_column: str):
        from engine.oracle import validate as oracle_validate
        self.schema = parse_schema(schema_json)
        self.column = column
        self.key_column = key_column
        self._validate = oracle_validate

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        keys = batch.column(self.key_column).to_pylist()
        out = []
        for key, txt in zip(keys, texts):
            if txt is None:
                # absent instance is at least as severe as malformed JSON —
                # record it rather than silently passing the row
                out.append({self.key_column: key, "error_seq": 0,
                            "error_kind": "MissingInstance",
                            "instance_path": "",
                            "message": "instance column is null"})
                continue
            try:
                inst = json.loads(txt)
            except json.JSONDecodeError:
                out.append({self.key_column: key, "error_seq": 0,
                            "error_kind": "InvalidJson", "instance_path": "",
                            "message": "instance is not valid JSON"})
                continue
            for seq, err in enumerate(self._validate(self.schema, inst)):
                out.append({
                    self.key_column: key, "error_seq": seq,
                    "error_kind": err["kind"],
                    "instance_path": encode_pointer(err["path"]),
                    "message": E.render_message(err),
                })
        return pa.Table.from_pylist(out, schema=pa.schema([
            (self.key_column, batch.schema.field(self.key_column).type),
            ("error_seq", pa.int32()), ("error_kind", pa.string()),
            ("instance_path", pa.string()), ("message", pa.string())]))


def validate_json_column(ds, schema_json: str, *, column: str = "props",
                         key_column: str = "event_id",
                         batch_size: int = 4096, concurrency=None):
    return ds.map_batches(
        JsonColumnValidator(schema_json, column, key_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
