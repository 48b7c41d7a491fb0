"""Schema-compiler operator tests, ported from the reference's rust_backend
semantics (``rust_backend.rs:641-919``, ``:203-305``)."""

import json

import pyarrow as pa
import pytest

from engine.schema import parse_schema
from engine.schema_compiler import (BatchCompileError, CodeGenError,
                                    arrow_schema_to_json_schema,
                                    compile_batch, dedupe_schemas,
                                    merge_all_of, narrow_numeric_type,
                                    resolve_all_of, structural_key,
                                    target_arrow_schema)


def s(j):
    return parse_schema(j)


class TestAllOfMerge:
    def test_property_union_and_required_order(self):
        m = merge_all_of([
            s('{"type":"object","properties":{"a":{"type":"string"}},'
              '"required":["a"]}'),
            s('{"type":"object","properties":{"b":{"type":"integer"}},'
              '"required":["b","a"]}'),
        ])
        assert set(m.properties) == {"a", "b"}
        assert m.required == ["a", "b"]  # first-occurrence ordered union
        assert m.type == "object"

    def test_numeric_bounds_tighten(self):
        m = merge_all_of([
            s('{"type":"object","properties":{"n":{"type":"integer",'
              '"minimum":0,"maximum":100}}}'),
            s('{"type":"object","properties":{"n":{"type":"integer",'
              '"minimum":10,"maximum":50}}}'),
        ])
        assert m.properties["n"].minimum == 10.0
        assert m.properties["n"].maximum == 50.0

    def test_crossing_bounds_error(self):
        with pytest.raises(CodeGenError) as e:
            merge_all_of([
                s('{"type":"object","properties":{"n":{"type":"integer",'
                  '"minimum":60}}}'),
                s('{"type":"object","properties":{"n":{"type":"integer",'
                  '"maximum":50}}}'),
            ])
        assert e.value.kind == "AllOfMergeConflictingNumericBounds"

    def test_conflicting_type_error(self):
        with pytest.raises(CodeGenError) as e:
            merge_all_of([
                s('{"type":"object","properties":{"x":{"type":"string"}}}'),
                s('{"type":"object","properties":{"x":{"type":"integer"}}}'),
            ])
        assert e.value.kind == "AllOfMergeConflictingPropertyType"

    def test_conflicting_pattern_error(self):
        with pytest.raises(CodeGenError) as e:
            merge_all_of([
                s('{"type":"object","properties":{"x":{"type":"string","pattern":"a"}}}'),
                s('{"type":"object","properties":{"x":{"type":"string","pattern":"b"}}}'),
            ])
        assert e.value.kind == "AllOfMergeConflictingPattern"

    def test_deep_object_merge(self):
        m = merge_all_of([
            s('{"type":"object","properties":{"o":{"type":"object",'
              '"properties":{"x":{"type":"string"}}}}}'),
            s('{"type":"object","properties":{"o":{"type":"object",'
              '"properties":{"y":{"type":"integer"}}}}}'),
        ])
        assert set(m.properties["o"].properties) == {"x", "y"}

    def test_non_object_subschema_error(self):
        with pytest.raises(CodeGenError) as e:
            merge_all_of([s('{"type":"string"}')])
        assert e.value.kind == "AllOfMergeNonObjectSubschema"
        assert e.value.ctx["index"] == 0

    def test_empty_all_of_is_error(self):
        with pytest.raises(CodeGenError):
            resolve_all_of(s('{"allOf": []}'))
        assert resolve_all_of(s('{"type":"string"}')).type == "string"


class TestNumericNarrowing:
    @pytest.mark.parametrize("schema_json,expected", [
        ('{"type":"integer","minimum":0,"maximum":255}', pa.uint8()),
        ('{"type":"integer","minimum":0,"maximum":256}', pa.uint16()),
        ('{"type":"integer","minimum":0,"maximum":70000}', pa.uint32()),
        ('{"type":"integer","minimum":0,"maximum":5e9}', pa.uint64()),
        ('{"type":"integer","minimum":-128,"maximum":127}', pa.int8()),
        ('{"type":"integer","minimum":-129,"maximum":127}', pa.int16()),
        ('{"type":"integer","minimum":-1,"maximum":1e6}', pa.int32()),
        ('{"type":"integer"}', pa.int64()),
        ('{"type":"integer","minimum":1.5,"maximum":9}', pa.int64()),
        ('{"type":"number","minimum":0,"maximum":1}', pa.float32()),
        ('{"type":"number"}', pa.float64()),
        ('{"type":"number","minimum":0,"maximum":1e39}', pa.float64()),
    ])
    def test_narrowing(self, schema_json, expected):
        assert narrow_numeric_type(s(schema_json)) == expected


class TestTargetSchema:
    def test_struct_emission(self):
        sch = target_arrow_schema(s('''
            {"type":"object","required":["id"],
             "properties":{
               "id":{"type":"integer","minimum":0,"maximum":1000},
               "name":{"type":"string"},
               "tags":{"type":"array","items":{"type":"string"}},
               "score":{"type":"number","minimum":0,"maximum":1}}}'''))
        assert sch.field("id").type == pa.uint16()
        assert not sch.field("id").nullable
        assert sch.field("name").nullable
        assert sch.field("tags").type == pa.list_(pa.string())
        assert sch.field("score").type == pa.float32()


class TestDedupe:
    def test_structural_dedupe(self):
        # reference DedupeKey (functional mode): title is PART of the key
        # (rust_backend.rs:581); $id/description/$comment/examples are not
        a = s('{"type":"object","properties":{"x":{"type":"string"}},'
              '"title":"A","description":"d1","$id":"i1"}')
        a2 = s('{"type":"object","properties":{"x":{"type":"string"}},'
               '"title":"A","description":"d2","$id":"i2"}')
        b = s('{"type":"object","properties":{"x":{"type":"string"}},'
              '"title":"B"}')
        c = s('{"type":"object","properties":{"x":{"type":"integer"}}}')
        from engine.schema_compiler import DEDUPE_FUNCTIONAL as FUNC
        assign, canonical = dedupe_schemas([a, a2, b, c], FUNC)
        assert assign == [0, 0, 1, 2]  # description/$id ignored, title kept
        assert len(canonical) == 3
        assert structural_key(a, FUNC) == structural_key(a2, FUNC)
        assert structural_key(a, FUNC) != structural_key(b, FUNC)
        assert structural_key(a, FUNC) != structural_key(c, FUNC)
        # reference DEFAULT mode is Full (settings.rs:23-25): $id /
        # description differences now separate a and a2
        assign_full, _ = dedupe_schemas([a, a2, b, c])
        assert assign_full == [0, 1, 2, 3]


class TestBatchCompile:
    def test_all_or_nothing_with_indices(self):
        good = '{"type":"string"}'
        bad = '{"minLength": -1}'
        with pytest.raises(BatchCompileError) as e:
            compile_batch([good, bad, good, '{"type": 3}'])
        assert [i for i, _ in e.value.failures] == [1, 3]
        plans = compile_batch([good, good])
        assert len(plans) == 2


class TestReverse:
    def test_roundtrip_through_arrow(self):
        t = pa.schema([
            pa.field("id", pa.int32(), nullable=False),
            pa.field("name", pa.string()),
            pa.field("vals", pa.list_(pa.float64())),
            pa.field("meta", pa.struct([("k", pa.uint8())])),
        ])
        j = arrow_schema_to_json_schema(t)
        assert j["required"] == ["id"]
        assert j["properties"]["id"] == {
            "type": "integer", "minimum": -(2**31), "maximum": 2**31 - 1}
        assert j["properties"]["vals"]["items"]["type"] == "number"
        assert j["properties"]["vals"]["items"]["maximum"] > 1e300
        assert j["properties"]["meta"]["properties"]["k"]["maximum"] == 255
        # inferred schema parses and validates matching data
        sch = parse_schema(j)
        from engine.oracle import validate
        assert validate(sch, {"id": 1, "name": "x", "vals": [0.5],
                              "meta": {"k": 3}}) == []
        assert validate(sch, {"name": "x"}) != []  # id required


class TestCodeGenSettings:
    """DedupeMode / ModelNameSource parity (code_gen/settings.rs:5-33;
    mode-matrix mirrors rust_backend.rs dedupe tests at 4218-4280)."""

    A = '{"type":"object","title":"T","properties":{"a":{"type":"integer"}},"description":"first"}'
    B = '{"type":"object","title":"T","properties":{"a":{"type":"integer"}},"description":"second"}'
    C = '{"type":"object","title":"T","properties":{"a":{"type":"integer"}},"description":"first"}'

    def _schemas(self):
        from engine.schema import parse_schema
        return [parse_schema(self.A), parse_schema(self.B),
                parse_schema(self.C)]

    def test_functional_merges_across_descriptions(self):
        from engine.schema_compiler import DEDUPE_FUNCTIONAL, dedupe_schemas
        assign, canonical = dedupe_schemas(self._schemas(),
                                           DEDUPE_FUNCTIONAL)
        assert assign == [0, 0, 0]
        assert len(canonical) == 1

    def test_full_separates_by_description(self):
        from engine.schema_compiler import DEDUPE_FULL, dedupe_schemas
        assign, canonical = dedupe_schemas(self._schemas(), DEDUPE_FULL)
        assert assign == [0, 1, 0]
        assert len(canonical) == 2

    def test_disabled_never_merges(self):
        from engine.schema_compiler import DEDUPE_DISABLED, dedupe_schemas
        assign, canonical = dedupe_schemas(self._schemas(), DEDUPE_DISABLED)
        assert assign == [0, 1, 2]
        assert len(canonical) == 3

    def test_full_separates_by_deprecated_and_comment(self):
        from engine.schema import parse_schema
        from engine.schema_compiler import (DEDUPE_FULL, DEDUPE_FUNCTIONAL,
                                            structural_key)
        base = parse_schema('{"type":"object"}')
        dep = parse_schema('{"type":"object","deprecated":true}')
        com = parse_schema('{"type":"object","$comment":"c"}')
        assert structural_key(base, DEDUPE_FULL) != \
            structural_key(dep, DEDUPE_FULL)
        assert structural_key(base, DEDUPE_FULL) != \
            structural_key(com, DEDUPE_FULL)
        assert structural_key(base, DEDUPE_FUNCTIONAL) == \
            structural_key(dep, DEDUPE_FUNCTIONAL)
        assert structural_key(base, DEDUPE_FUNCTIONAL) == \
            structural_key(com, DEDUPE_FUNCTIONAL)

    def test_title_stays_functional(self):
        from engine.schema import parse_schema
        from engine.schema_compiler import DEDUPE_FUNCTIONAL, structural_key
        a = parse_schema('{"type":"object","title":"X"}')
        b = parse_schema('{"type":"object","title":"Y"}')
        assert structural_key(a, DEDUPE_FUNCTIONAL) != \
            structural_key(b, DEDUPE_FUNCTIONAL)

    def test_structural_key_rejects_disabled(self):
        import pytest
        from engine.schema import parse_schema
        from engine.schema_compiler import DEDUPE_DISABLED, structural_key
        with pytest.raises(ValueError):
            structural_key(parse_schema('{"type":"object"}'),
                           DEDUPE_DISABLED)


class TestModelNameSource:
    """struct_name_from parity (rust_backend.rs:611-637)."""

    def test_title_first(self):
        from engine.sanitizers import struct_name_from
        assert struct_name_from("My Title", "prop_key") == "MyTitle"
        assert struct_name_from(None, "prop_key") == "PropKey"
        assert struct_name_from("  ", "prop_key") == "PropKey"

    def test_property_key_first(self):
        from engine.sanitizers import struct_name_from
        assert struct_name_from("My Title", "prop_key",
                                name_source="property-key") == "PropKey"
        assert struct_name_from("My Title", None,
                                name_source="property-key") == "MyTitle"

    def test_root_and_unnamed_fallbacks(self):
        from engine.sanitizers import struct_name_from
        assert struct_name_from(None, None, is_root=True) == "Root"
        assert struct_name_from(None, None) == "Unnamed"
        assert struct_name_from("", None, is_root=True) == "Root"


class TestReverseCodegenDepth:
    """C10 depth: integer widths -> bounds, metadata -> title/description,
    and bounds round-trip through narrow_numeric_type (derive.rs:284+)."""

    def test_int_width_bounds_round_trip(self):
        import pyarrow as pa
        from engine.schema import parse_schema
        from engine.schema_compiler import (arrow_type_to_json_schema,
                                            narrow_numeric_type)
        for t in (pa.int8(), pa.int16(), pa.int32(), pa.uint8(),
                  pa.uint16(), pa.uint32()):
            frag = arrow_type_to_json_schema(t)
            assert frag["type"] == "integer"
            assert "minimum" in frag and "maximum" in frag
            # identity round-trip through the forward narrowing
            back = narrow_numeric_type(parse_schema(json.dumps(frag)))
            assert back == t, f"{t} -> {frag} -> {back}"

    def test_int64_round_trips_and_uint64_degrades_to_i64_gate(self):
        import pyarrow as pa
        from engine.schema import parse_schema
        from engine.schema_compiler import (arrow_type_to_json_schema,
                                            narrow_numeric_type)
        frag = arrow_type_to_json_schema(pa.int64())
        assert narrow_numeric_type(parse_schema(json.dumps(frag))) \
            == pa.int64()
        # uint64 bounds exceed the reference's i64 narrowing gate
        # (rust_backend.rs I64_MAX_AS_F64), so the forward pass falls back
        frag = arrow_type_to_json_schema(pa.uint64())
        assert frag["maximum"] == 2**64 - 1
        assert narrow_numeric_type(parse_schema(json.dumps(frag))) \
            == pa.int64()

    def test_metadata_to_title_description(self):
        import pyarrow as pa
        from engine.schema_compiler import arrow_schema_to_json_schema
        sch = pa.schema(
            [pa.field("a", pa.int32(), nullable=False,
                      metadata={b"title": b"FieldA",
                                b"description": b"the a field"}),
             pa.field("b", pa.string())],
            metadata={b"title": b"RootModel",
                      b"description": b"root docs"})
        out = arrow_schema_to_json_schema(sch)
        assert out["title"] == "RootModel"
        assert out["description"] == "root docs"
        assert out["properties"]["a"]["title"] == "FieldA"
        assert out["properties"]["a"]["description"] == "the a field"
        assert "title" not in out["properties"]["b"]
        assert out["required"] == ["a"]


class TestMergeNestedDefs:
    """reverse_code_gen/mod.rs:160-200 parity."""

    def test_flattens_two_levels(self):
        from engine.schema_compiler import merge_nested_defs_into_root
        schema = s('''{"type":"object",
            "properties":{"o":{"$ref":"#/$defs/Outer"}},
            "$defs":{"Outer":{"type":"object",
                "properties":{"i":{"$ref":"#/$defs/Inner"}},
                "$defs":{"Inner":{"type":"integer"}}}}}''')
        root_defs = {}
        out = merge_nested_defs_into_root(schema, root_defs)
        assert out.defs is None
        assert set(root_defs) == {"Outer", "Inner"}
        assert root_defs["Outer"].defs is None
        assert root_defs["Inner"].type == "integer"
        # refs resolve against the flattened root
        from engine.schema import Schema
        root = Schema(type="object", properties=out.properties,
                      defs=root_defs)
        from engine.oracle import validate
        assert validate(root, {"o": {"i": 3}}) == []
        assert [e["kind"] for e in validate(root, {"o": {"i": "x"}})] == \
            ["ExpectedInteger"]

    def test_first_definition_wins_on_collision(self):
        from engine.schema_compiler import merge_nested_defs_into_root
        schema = s('''{"type":"object",
            "$defs":{"A":{"type":"integer",
                          "$defs":{"B":{"type":"string"}}},
                     "B":{"type":"number"}}}''')
        root_defs = {}
        merge_nested_defs_into_root(schema, root_defs)
        # stack order: A's nested B is reached while processing A; the
        # reference or_insert keeps whichever lands first — assert the
        # deterministic outcome and that both names exist exactly once
        assert set(root_defs) == {"A", "B"}
        assert root_defs["A"].type == "integer"

    def test_input_not_mutated(self):
        from engine.schema_compiler import merge_nested_defs_into_root
        schema = s('{"type":"object","$defs":{"X":{"type":"integer"}}}')
        root_defs = {}
        out = merge_nested_defs_into_root(schema, root_defs)
        assert schema.defs is not None  # original untouched
        assert out.defs is None
        assert root_defs["X"].type == "integer"

    def test_no_defs_passthrough(self):
        from engine.schema_compiler import merge_nested_defs_into_root
        schema = s('{"type":"string"}')
        root_defs = {}
        out = merge_nested_defs_into_root(schema, root_defs)
        assert out.type == "string" and root_defs == {}


class TestReverseFloatAndMap:
    def test_float_bounds_round_trip(self):
        import pyarrow as pa
        from engine.schema import parse_schema
        from engine.schema_compiler import (arrow_type_to_json_schema,
                                            narrow_numeric_type)
        f32 = arrow_type_to_json_schema(pa.float32())
        assert narrow_numeric_type(parse_schema(json.dumps(f32))) \
            == pa.float32()
        f64 = arrow_type_to_json_schema(pa.float64())
        assert narrow_numeric_type(parse_schema(json.dumps(f64))) \
            == pa.float64()

    def test_map_to_additional_properties_schema(self):
        import pyarrow as pa
        from engine.schema_compiler import arrow_type_to_json_schema
        t = pa.map_(pa.string(), pa.int32())
        out = arrow_type_to_json_schema(t)
        assert out["type"] == "object"
        assert out["additionalProperties"]["type"] == "integer"
        assert out["additionalProperties"]["maximum"] == 2**31 - 1
