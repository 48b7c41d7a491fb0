"""Conformance harness: runs the JSON corpus in the official test-suite file
format (``{description, schema, tests: [{description, data, valid}]}``,
reference ``tests/json_schema_test_suite.rs:21-33``) extended with
``expected_errors`` in emission order. Hard-fails if the corpus is missing
(mirroring the reference's suite-missing guard)."""

import glob
import json
import os

import pytest

from engine.errors import render_message
from engine.oracle import validate
from engine.pointer import encode_pointer
from engine.schema import parse_schema

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "conformance")


def load_cases():
    files = sorted(glob.glob(os.path.join(CORPUS_DIR, "*.json")))
    assert files, f"conformance corpus missing under {CORPUS_DIR}"
    cases = []
    for path in files:
        for group in json.load(open(path)):
            schema = parse_schema(group["schema"])
            for t in group["tests"]:
                cases.append(pytest.param(
                    schema, t,
                    id=f"{group['description']} :: {t['description']}"))
    return cases


@pytest.mark.parametrize("schema,case", load_cases())
def test_conformance_case(schema, case):
    errs = validate(schema, case["data"])
    assert (not errs) == case["valid"], \
        f"validity mismatch; errors: {[render_message(e) for e in errs]}"
    if "expected_errors" in case:
        got = []
        for e in errs:
            entry = {"kind": e["kind"], "path": encode_pointer(e["path"])}
            entry.update({k: v for k, v in e.items()
                          if k not in ("kind", "path")})
            got.append(entry)
        exp = case["expected_errors"]
        assert len(got) == len(exp), f"{got} vs {exp}"
        for g, x in zip(got, exp):
            for key, val in x.items():
                assert g.get(key) == val, f"{key}: {g} vs {x}"


def test_corpus_counts():
    files = sorted(glob.glob(os.path.join(CORPUS_DIR, "*.json")))
    n_groups = sum(len(json.load(open(p))) for p in files)
    assert n_groups >= 15
