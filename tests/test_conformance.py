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
                if "data_deep_nest" in t:  # synthesize a deep {"a": {...}}
                    d: dict = {}
                    for _ in range(t["data_deep_nest"]):
                        d = {"a": d}
                    t = {**t, "data": d}
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


@pytest.mark.parametrize("schema,case", load_cases())
def test_conformance_case_as_dataset(schema, case):
    """Every reference-style keyword case re-run as a DATASET-level
    assertion (north-star requirement): the instance becomes a 1-row Arrow
    table under a wrapper property, and the vectorized engine must produce
    exactly the oracle's error stream for that table."""
    import pyarrow as pa

    from engine.compile import compile_plan
    from engine.kernels import validate_batch
    from engine.rows import table_to_json_rows
    from engine.schema import Schema

    data = case["data"]
    try:
        col = pa.array([data])
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        pytest.skip("instance not representable as a typed Arrow column")
    if pa.types.is_null(col.type) and data is None:
        col = pa.array([None], pa.int64())  # typed null column
    table = pa.table({"value": col})
    wrapper = Schema(type="object", properties={"value": schema})
    plan = compile_plan(wrapper)
    got = validate_batch(plan, table)
    expected = []
    for r, inst in enumerate(table_to_json_rows(table)):
        for s, err in enumerate(validate(wrapper, inst)):
            expected.append((r, s, err))
    assert got == expected


def test_corpus_counts():
    files = sorted(glob.glob(os.path.join(CORPUS_DIR, "*.json")))
    n_groups = sum(len(json.load(open(p))) for p in files)
    assert n_groups >= 15


def test_jsts_subset_category_coverage():
    """Official-suite subset coverage tally, mirroring the per-category
    accounting of the reference's suite runner
    (``tests/json_schema_test_suite.rs:68-163``). The suite itself cannot be
    vendored in this sandbox (the reference clones it from the network at
    test time — ``research/scripts/clone-json-schema-test-suite.sh``), so
    ``tests/conformance/draft2020_12_suite.json`` reproduces the
    draft2020-12 cases for the supported keyword subset from the public
    suite, with reference-semantics deviations pinned explicitly in the
    case descriptions (integer storage kinds, int-vs-float value identity,
    untyped bound keywords, $ref cycles)."""
    path = os.path.join(CORPUS_DIR, "draft2020_12_suite.json")
    groups = json.load(open(path))
    by_category: dict = {}
    for g in groups:
        cat = g["description"].split(":")[0].replace("jsts ", "")
        by_category.setdefault(cat, 0)
        by_category[cat] += len(g["tests"])
    expected_min = {
        "type": 40, "required": 7, "properties": 7,
        "additionalProperties": 8, "enum": 9, "const": 11, "maximum": 5,
        "minimum": 7, "maxLength": 4, "minLength": 5, "pattern": 3,
        "items": 7, "maxItems": 3, "minItems": 3, "uniqueItems": 11,
        "allOf": 4, "anyOf": 8, "oneOf": 8, "ref": 9,
    }
    for cat, n_min in expected_min.items():
        assert by_category.get(cat, 0) >= n_min, \
            f"{cat}: {by_category.get(cat, 0)} < {n_min}"
