"""Checkpoint/lineage/resume tests: kill-between-partitions simulation."""

import glob
import json
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from engine.synth import build_corpus
    out = str(tmp_path_factory.mktemp("ckpt"))
    d = build_corpus(SF_DIR, out, replicate=2, partitions=4, seed=42)
    return out, d


def test_resume_skips_completed_partitions(corpus, ray_session, tmp_path):
    from engine.checkpoint import run_validation_job, completed_partitions

    out_root, corpus_dir = corpus
    out = str(tmp_path / "job")
    catalog = os.path.join(out_root, "media_catalog.parquet")

    # "killed" run: only 2 of 4 partitions complete, no global checks
    s1 = run_validation_job(corpus_dir, out, catalog_path=catalog, max_units=2)
    assert s1["processed"] == 2 and s1["skipped"] == 0
    done = completed_partitions(out)
    assert len(done) == 2
    mtimes = {p: os.path.getmtime(p)
              for p in glob.glob(os.path.join(out, "violations", "*", "*"))}

    # resume: completed partitions skipped byte-identically, rest processed
    s2 = run_validation_job(corpus_dir, out, catalog_path=catalog)
    assert s2["skipped"] == 2 and s2["processed"] == 2
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, f"recomputed {p}"
    assert s2["uniqueness"] == "done"
    assert s2["referential"] == "done"
    assert s2["drift"] == "done"

    # fully-resumed run: everything skipped
    s3 = run_validation_job(corpus_dir, out, catalog_path=catalog)
    assert s3["skipped"] == 4 and s3["processed"] == 0
    assert s3["uniqueness"] == "skipped"

    # outputs exist per partition + lineage records carry fingerprints
    for rec in completed_partitions(out).values():
        if rec["partition_id"].startswith("__"):
            continue
        assert rec["input_fingerprint"]
        assert rec["metrics"]["docs"] > 0
        for o in rec["outputs"]:
            assert os.path.isdir(o) and glob.glob(os.path.join(o, "*.parquet"))


def test_changed_input_invalidates_checkpoint(corpus, ray_session, tmp_path):
    import shutil
    from engine.checkpoint import run_validation_job

    out_root, corpus_dir = corpus
    # copy the corpus so we can mutate an input file
    mut = str(tmp_path / "mut_corpus")
    shutil.copytree(corpus_dir, mut)
    out = str(tmp_path / "job2")
    s1 = run_validation_job(mut, out)
    assert s1["processed"] == 4

    # rewrite one partition's file -> size/fingerprint changes -> reprocessed
    part = sorted(glob.glob(os.path.join(mut, "partition_id=*", "*.parquet")))[0]
    import pyarrow.parquet as pq
    t = pq.read_table(part)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), part)

    s2 = run_validation_job(mut, out)
    assert s2["processed"] == 1 and s2["skipped"] == 3


def test_cli_validate_doc(tmp_path):
    import subprocess, sys
    schema = tmp_path / "s.json"
    schema.write_text('{"type":"object","required":["a"],'
                      '"properties":{"a":{"type":"integer"}}}')
    good = tmp_path / "good.json"
    good.write_text('{"a": 3}')
    bad = tmp_path / "bad.json"
    bad.write_text('{"a": "x"}')
    r = subprocess.run([sys.executable, "-m", "engine.cli", "validate-doc",
                        "-s", str(schema), "-p", str(good)],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "engine.cli", "validate-doc",
                        "-s", str(schema), "-p", str(bad)],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 1
    assert '/a: expected integer, got string' in r.stderr
    assert 'validation failed with 1 error(s)' in r.stderr


def test_drift_folds_into_verdicts(corpus, ray_session, tmp_path):
    from engine.checkpoint import run_validation_job
    _, corpus_dir = corpus
    out = str(tmp_path / "jobd")
    run_validation_job(corpus_dir, out, baseline_exclude=["p0003"])
    import pyarrow.parquet as pq
    v = pq.read_table(os.path.join(out, "verdicts")).to_pandas()
    drifted = v[v["checks_failed"].map(lambda c: "drift" in list(c))]
    assert "p0003" in set(drifted["partition_id"].astype(str))
    assert not drifted["pass"].any()
