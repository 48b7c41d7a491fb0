"""Pluggable check-emitter registry (engine/registry.py) — the engine analog
of the reference CodeGenBackend extension contract (code_gen/mod.rs:27-40):
register keyword -> compile -> predicate and the check participates in parse,
oracle, typed kernels (emit + anyOf validity) and message rendering."""

import contextlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from engine.errors import render_message
from engine.oracle import validate
from engine.registry import CheckSpec, register_check, unregister_check
from engine.schema import SchemaParseError, parse_schema


def _multiple_of_spec():
    def compile_(raw):
        if not isinstance(raw, (int, float)) or isinstance(raw, bool) \
                or raw <= 0:
            raise ValueError("multipleOf must be a positive number")
        return float(raw)

    def predicate(state, val, active):
        f = pc.fill_null(pc.cast(val, pa.float64(), safe=False), 0.0) \
            .to_numpy(zero_copy_only=False)
        rem = np.mod(f, state)
        return np.isclose(rem, 0.0) | np.isclose(rem, state)

    def scalar_predicate(state, v):
        rem = float(v) % state
        return bool(np.isclose(rem, 0.0) or np.isclose(rem, state))

    return CheckSpec(
        keyword="multipleOf", kind="NotMultipleOf",
        types=("integer", "number"),
        compile=compile_, predicate=predicate,
        scalar_predicate=scalar_predicate,
        message=lambda state, v: f"value {v} is not a multiple of "
                                 f"{state:g}")


@contextlib.contextmanager
def registered(spec):
    register_check(spec)
    try:
        yield
    finally:
        unregister_check(spec.keyword)


SCHEMA = ('{"type":"object","required":["n"],'
          '"properties":{"n":{"type":"integer","minimum":0,'
          '"multipleOf":3}}}')


class TestRegistryParse:
    def test_registered_keyword_parses_strict(self):
        with registered(_multiple_of_spec()):
            s = parse_schema(SCHEMA, strict=True)
            spec, state = s.properties["n"].custom["multipleOf"]
            assert spec.keyword == "multipleOf" and state == 3.0

    def test_unregistered_keyword_rejected_strict(self):
        with pytest.raises(SchemaParseError):
            parse_schema(SCHEMA, strict=True)
        # lenient parse ignores it, matching the reference default
        s = parse_schema(SCHEMA)
        assert s.properties["n"].custom == {}

    def test_bad_value_is_schema_error(self):
        with registered(_multiple_of_spec()):
            with pytest.raises(SchemaParseError):
                parse_schema('{"type":"integer","multipleOf":-1}')

    def test_builtin_keyword_shadowing_rejected(self):
        # Registering e.g. 'minimum' would silently hijack the built-in
        # keyword's parsing and disable its validation.
        spec = _multiple_of_spec()
        bad = CheckSpec(keyword="minimum", kind=spec.kind, types=spec.types,
                        compile=spec.compile, predicate=spec.predicate,
                        scalar_predicate=spec.scalar_predicate,
                        message=spec.message)
        with pytest.raises(ValueError, match="shadows"):
            register_check(bad)

    def test_parsed_schema_survives_registry_clearing(self):
        # A Ray worker unpickles the Schema in a process whose registry is
        # empty; checks must have been captured at parse time (spec+state
        # stored in Schema.custom), not re-resolved at validation time.
        # cloudpickle is what Ray ships closures with.
        from ray import cloudpickle as pickle

        with registered(_multiple_of_spec()):
            s = parse_schema(SCHEMA, strict=True)
            blob = pickle.dumps(s)
        # registry now empty again (context manager unregistered)
        s2 = pickle.loads(blob)
        errs = validate(s2, {"n": 7})
        assert [e["kind"] for e in errs] == ["NotMultipleOf"]
        assert validate(s2, {"n": 9}) == []


class TestRegistryOracle:
    def test_oracle_emits_after_builtins(self):
        with registered(_multiple_of_spec()):
            s = parse_schema(SCHEMA)
            errs = validate(s, {"n": 7})
            assert [e["kind"] for e in errs] == ["NotMultipleOf"]
            assert errs[0]["path"] == ("n",)
            assert render_message(errs[0]) == \
                "/n: value 7 is not a multiple of 3"
            assert validate(s, {"n": 9}) == []
            # builtin violation AND custom violation: builtin first
            errs = validate(s, {"n": -7})
            assert [e["kind"] for e in errs] == \
                ["BelowMinimum", "NotMultipleOf"]
            # type mismatch suppresses the custom check
            errs = validate(s, {"n": "x"})
            assert [e["kind"] for e in errs] == ["ExpectedInteger"]


class TestRegistryKernels:
    def _validate_tbl(self, schema_json, tbl):
        from engine.compile import compile_plan
        from engine.kernels import validate_batch
        plan = compile_plan(parse_schema(schema_json))
        return validate_batch(plan, tbl)

    def test_kernel_matches_oracle(self):
        with registered(_multiple_of_spec()):
            tbl = pa.table({"n": pa.array([7, 9, -7, 0, None, 3000],
                                          pa.int64())})
            got = self._validate_tbl(SCHEMA, tbl)
            s = parse_schema(SCHEMA)
            exp = []
            for r in range(len(tbl)):
                inst = {k: v for k, v in
                        {"n": tbl.column("n")[r].as_py()}.items()
                        if v is not None}
                for seq, e in enumerate(validate(s, inst)):
                    exp.append((r, seq, e["kind"], e["path"]))
            got_flat = [(r, seq, e["kind"], e["path"]) for r, seq, e in got]
            assert got_flat == exp

    def test_any_of_validity_includes_custom(self):
        with registered(_multiple_of_spec()):
            sj = ('{"type":"object","properties":{"n":{"anyOf":['
                  '{"type":"integer","multipleOf":3},'
                  '{"type":"integer","minimum":100}]}}}')
            tbl = pa.table({"n": pa.array([9, 7, 101], pa.int64())})
            got = self._validate_tbl(sj, tbl)
            bad_rows = sorted({r for r, _, _ in got})
            assert bad_rows == [1]  # 9 matches multipleOf arm, 101 minimum

    def test_number_and_boolean_arms(self):
        called = {}

        def bool_pred(state, val, active):
            called["v"] = True
            return np.asarray(val.to_numpy(zero_copy_only=False) == state)

        spec = CheckSpec(
            keyword="mustBe", kind="MustBe", types=("boolean",),
            compile=lambda raw: bool(raw),
            predicate=bool_pred,
            scalar_predicate=lambda state, v: v == state,
            message=lambda state, v: f"expected {state}")
        with registered(spec):
            sj = '{"type":"boolean","mustBe":true}'
            tbl = pa.table({"b": pa.array([True, False])})
            from engine.compile import compile_plan
            from engine.kernels import validate_batch
            plan = compile_plan(parse_schema(
                '{"type":"object","properties":{"b":' + sj + '}}'))
            got = validate_batch(plan, tbl)
            assert [(r, e["kind"]) for r, _, e in got] == [(1, "MustBe")]
            assert called["v"]


class TestRegistryDataset:
    def test_dataset_level(self, ray_session):
        import ray.data
        from engine.dataset import validate_dataset
        with registered(_multiple_of_spec()):
            ds = ray.data.from_arrow(
                pa.table({"n": pa.array([3, 7], pa.int64())}))
            out = validate_dataset(
                ds, SCHEMA, key_column="n", carry_columns=()).to_pandas()
            assert list(out["error_kind"]) == ["NotMultipleOf"]
            assert list(out["message"]) == \
                ["/n: value 7 is not a multiple of 3"]
