"""Checkpointed validation job: per-partition outputs, lineage, resume.

North-rule requirement: a killed run must resume without recomputing
validated partitions. Design (SURVEY.md §4): partition identity derives from
the INPUT layout (hive ``partition_id=...`` directories written by synth),
never from runtime block order. Each unit writes its outputs under a
partition-keyed directory with ``mode="overwrite"`` (idempotent on retry) and
finishes by writing a ``_manifest/<pid>.json`` lineage record — the manifest
write is the commit point, so a kill between outputs and manifest just re-runs
that partition. Global (cross-partition) checks — uniqueness, referential,
drift — run as separately-manifested steps after the per-partition pass.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from typing import Optional, Sequence

from engine.dataset import DOC_SCHEMA_JSON


def _input_fingerprint(paths: Sequence[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}".encode())
    return h.hexdigest()[:16]


def _manifest_dir(out_dir: str) -> str:
    d = os.path.join(out_dir, "_manifest")
    os.makedirs(d, exist_ok=True)
    return d


def list_partitions(corpus_dir: str) -> dict[str, list[str]]:
    """partition_id -> input parquet files (from the hive layout)."""
    parts: dict[str, list[str]] = {}
    for d in sorted(glob.glob(os.path.join(corpus_dir, "partition_id=*"))):
        pid = os.path.basename(d).split("=", 1)[1]
        parts[pid] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not parts:  # unpartitioned input: single unit
        parts["all"] = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    return parts


def completed_partitions(out_dir: str) -> dict[str, dict]:
    done = {}
    for p in glob.glob(os.path.join(out_dir, "_manifest", "*.json")):
        with open(p) as f:
            rec = json.load(f)
        done[rec["partition_id"]] = rec
    return done


def run_validation_job(corpus_dir: str, out_dir: str, *,
                       schema_json: str = DOC_SCHEMA_JSON,
                       catalog_path: Optional[str] = None,
                       baseline_exclude: Sequence[str] = (),
                       max_units: Optional[int] = None,
                       batch_size: int = 8192) -> dict:
    """Validate a partitioned corpus with checkpoint/resume.

    Returns a summary dict. Call again after a kill: completed partitions
    (manifest present with matching input fingerprint) are skipped.
    """
    import ray.data
    from engine.dataset import partition_verdicts, validate_dataset

    os.makedirs(out_dir, exist_ok=True)
    parts = list_partitions(corpus_dir)
    done = completed_partitions(out_dir)
    summary = {"partitions": len(parts), "skipped": 0, "processed": 0,
               "violations": 0}

    units = 0
    for pid, files in parts.items():
        if pid.startswith("__"):
            continue
        fp = _input_fingerprint(files)
        if pid in done and done[pid].get("input_fingerprint") == fp:
            summary["skipped"] += 1
            continue
        if max_units is not None and units >= max_units:
            continue
        units += 1
        started = time.time()

        def _ensure_pid(b, _pid=pid):
            import pyarrow as pa
            if "partition_id" in b.column_names:
                return b
            return b.append_column(
                "partition_id", pa.array([_pid] * len(b), pa.string()))

        # attach the partition column when the files don't carry it
        def _drop_pid(b):
            # the hive directory name carries partition_id; keeping it
            # in-file too makes hive readers see a duplicate column
            return (b.drop_columns(["partition_id"])
                    if "partition_id" in b.column_names else b)

        ds = ray.data.read_parquet(files).map_batches(
            _ensure_pid, batch_format="pyarrow")
        viol_dir = os.path.join(out_dir, "violations", f"partition_id={pid}")
        viol = validate_dataset(ds, schema_json, batch_size=batch_size)
        viol.map_batches(_drop_pid, batch_format="pyarrow").write_parquet(
            viol_dir, mode="overwrite")
        verd = partition_verdicts(ds, schema_json, batch_size=batch_size)
        verd_dir = os.path.join(out_dir, "verdicts", f"partition_id={pid}")
        verd.map_batches(_drop_pid, batch_format="pyarrow").write_parquet(
            verd_dir, mode="overwrite")
        vrows = verd.to_pandas()
        n_viol = int(vrows["violations"].sum())
        summary["processed"] += 1
        summary["violations"] += n_viol
        record = {
            "partition_id": pid,
            "input_fragments": [os.path.basename(f) for f in files],
            "input_fingerprint": fp,
            "started_at": started,
            "finished_at": time.time(),
            "outputs": [viol_dir, verd_dir],
            "metrics": {"docs": int(vrows["docs"].sum()),
                        "violation_docs": int(vrows["violation_docs"].sum()),
                        "violations": n_viol},
        }
        # manifest write is the commit point for this partition
        with open(os.path.join(_manifest_dir(out_dir), f"{pid}.json"),
                  "w") as f:
            json.dump(record, f)

    if max_units is None:
        _run_global_checks(corpus_dir, out_dir, catalog_path,
                           baseline_exclude, summary)
    return summary


def _run_global_checks(corpus_dir: str, out_dir: str,
                       catalog_path: Optional[str],
                       baseline_exclude: Sequence[str],
                       summary: dict) -> None:
    import ray.data
    from engine.drift import build_baseline, drift_check
    from engine.referential import check_references
    from engine.uniqueness import duplicate_keys

    done = completed_partitions(out_dir)
    checks_dir = os.path.join(out_dir, "checks")
    ds = ray.data.read_parquet(corpus_dir)

    def _step(name: str, fn) -> None:
        marker = f"__global_{name}"
        if marker in done:
            summary[name] = "skipped"
            return
        started = time.time()
        result_ds = fn()
        out = os.path.join(checks_dir, name)
        result_ds.write_parquet(out, mode="overwrite")
        with open(os.path.join(_manifest_dir(out_dir), f"{marker}.json"),
                  "w") as f:
            json.dump({"partition_id": marker, "outputs": [out],
                       "started_at": started, "finished_at": time.time()}, f)
        summary[name] = "done"

    _step("uniqueness", lambda: duplicate_keys(ds, "doc_id"))
    if catalog_path:
        catalog = ray.data.read_parquet(catalog_path)
        _step("referential",
              lambda: check_references(ds, catalog, exact=False))
    baseline = build_baseline(ds, exclude_partitions=baseline_exclude)
    _step("drift", lambda: drift_check(ds, baseline))
