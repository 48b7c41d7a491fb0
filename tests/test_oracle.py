"""Oracle validator tests: keyword-level golden cases ported from the
reference's colocated unit tests (``json_schema_rs/src/validator/mod.rs``,
cited per test). Each case asserts the FULL expected error list in emission
order — same strategy as the reference (expected-first exact equality).
"""

import json

from engine import errors as E
from engine.oracle import validate
from engine.schema import parse_schema


def v(schema_json: str, instance) -> list[dict]:
    return validate(parse_schema(schema_json), instance)


def kinds(errs):
    return [(e["kind"], e["path"]) for e in errs]


class TestRefs:
    def test_ref_to_defs_valid(self):  # validator/mod.rs:475
        s = '''{"$defs": {"Address": {"type": "object",
              "properties": {"city": {"type": "string"}}, "required": ["city"]}},
              "type": "object",
              "properties": {"address": {"$ref": "#/$defs/Address"}},
              "required": ["address"]}'''
        assert v(s, {"address": {"city": "NYC"}}) == []

    def test_ref_to_missing_defs(self):  # validator/mod.rs:498
        s = '{"type":"object","properties":{"x":{"$ref":"#/$defs/Missing"}}}'
        assert v(s, {"x": "hi"}) == [{
            "kind": E.INVALID_REF, "path": ("x",),
            "ref_str": "#/$defs/Missing",
            "reason": 'DefsMissing { ref_str: "#/$defs/Missing" }',
        }]

    def test_ref_cycle(self):  # validator/mod.rs:523
        s = '''{"$defs": {"A": {"$ref": "#/$defs/B"}, "B": {"$ref": "#/$defs/A"}},
               "type": "object", "properties": {"x": {"$ref": "#/$defs/A"}}}'''
        assert v(s, {"x": 42}) == [{
            "kind": E.INVALID_REF, "path": ("x",), "ref_str": "#/$defs/A",
            "reason": 'RefCycle { ref_str: "#/$defs/A" }',
        }]

    def test_ref_not_found_in_defs(self):
        s = '{"$defs":{"A":{}},"properties":{"x":{"$ref":"#/$defs/B"}},"type":"object"}'
        assert v(s, {"x": 1}) == [{
            "kind": E.INVALID_REF, "path": ("x",), "ref_str": "#/$defs/B",
            "reason": 'DefNotFound { ref_str: "#/$defs/B", name: "B" }',
        }]

    def test_non_fragment_ref_unsupported(self):
        s = '{"properties":{"x":{"$ref":"http://ex/s.json"}},"type":"object"}'
        errs = v(s, {"x": 1})
        assert errs[0]["reason"] == \
            'UnsupportedRef { ref_str: "http://ex/s.json" }'


class TestObject:
    def test_missing_required(self):  # validator/mod.rs:578-597
        s = '{"type":"object","required":["name"],"properties":{"name":{"type":"string"}}}'
        assert v(s, {}) == [{"kind": E.MISSING_REQUIRED, "path": ("name",),
                             "property": "name"}]

    def test_required_error_order_is_required_list_order(self):
        s = '{"type":"object","required":["z","a","m"]}'
        assert [e["property"] for e in v(s, {})] == ["z", "a", "m"]

    def test_expected_object(self):
        assert v('{"type":"object"}', 3) == [
            {"kind": E.EXPECTED_OBJECT, "path": (), "got": "number"}]
        assert v('{"type":"object"}', None)[0]["got"] == "null"

    def test_additional_properties_forbid(self):  # validator/mod.rs:600+
        s = ('{"type":"object","required":["a"],"properties":{"a":{"type":"string"}},'
             '"additionalProperties":false}')
        assert v(s, {"a": "x", "extra": 1}) == [{
            "kind": E.DISALLOWED_ADDITIONAL_PROPERTY, "path": ("extra",),
            "property": "extra"}]
        assert [e["property"] for e in v(s, {"a": "x", "z2": 1, "z1": 2})] == \
            ["z1", "z2"]  # lexicographic (BTreeMap) order
        assert v(s, {"a": "y"}) == []

    def test_additional_properties_allow(self):
        s = '{"type":"object","properties":{"a":{"type":"string"}}}'
        assert v(s, {"a": "x", "extra": 1}) == []

    def test_additional_properties_schema_children_order(self):
        # Extras pop BEFORE named properties and in REVERSE key order
        # (validator/mod.rs:220-228 vs :192-201).
        s = ('{"type":"object","properties":{"m":{"type":"integer"}},'
             '"additionalProperties":{"type":"string"}}')
        errs = v(s, {"m": "notint", "a": 1, "z": 2})
        assert kinds(errs) == [
            (E.EXPECTED_STRING, ("z",)),
            (E.EXPECTED_STRING, ("a",)),
            (E.EXPECTED_INTEGER, ("m",)),
        ]

    def test_property_children_lexicographic(self):
        s = ('{"type":"object","properties":{"b":{"type":"integer"},'
             '"a":{"type":"integer"},"c":{"type":"integer"}}}')
        errs = v(s, {"c": "x", "a": "y", "b": "z"})
        assert [e["path"] for e in errs] == [("a",), ("b",), ("c",)]

    def test_node_errors_before_child_errors(self):
        s = ('{"type":"object","required":["r"],"properties":{"a":{"type":"integer"}},'
             '"additionalProperties":false}')
        errs = v(s, {"a": "bad", "x": 1})
        assert kinds(errs) == [
            (E.MISSING_REQUIRED, ("r",)),
            (E.DISALLOWED_ADDITIONAL_PROPERTY, ("x",)),
            (E.EXPECTED_INTEGER, ("a",)),
        ]

    def test_no_type_still_checks_required_and_properties(self):
        # validator/mod.rs:417-441: no additionalProperties check in this arm.
        s = ('{"required":["r"],"properties":{"a":{"type":"integer"}},'
             '"additionalProperties":false}')
        errs = v(s, {"a": "bad", "x": 1})
        assert kinds(errs) == [
            (E.MISSING_REQUIRED, ("r",)),
            (E.EXPECTED_INTEGER, ("a",)),
        ]

    def test_no_type_non_object_instance_no_errors(self):
        assert v('{"required":["r"]}', 42) == []


class TestString:
    def test_length_code_points(self):  # validator/mod.rs:239-258, chars not bytes
        s = '{"type":"string","minLength":3,"maxLength":3}'
        assert v(s, "héé") == []  # 3 code points, 5 UTF-8 bytes
        assert v(s, "ab") == [{"kind": E.TOO_SHORT, "path": (),
                               "min_length": 3, "actual_length": 2}]
        assert v(s, "abcd") == [{"kind": E.TOO_LONG, "path": (),
                                 "max_length": 3, "actual_length": 4}]

    def test_non_string_skips_length_and_pattern(self):  # validator/mod.rs:4623
        s = '{"type":"string","pattern":"^[0-9]+$","minLength":5}'
        assert v(s, 42) == [{"kind": E.EXPECTED_STRING, "path": (),
                             "got": "number"}]

    def test_pattern_search_not_anchored(self):  # regress re.find semantics
        assert v('{"type":"string","pattern":"[0-9]+"}', "ab123cd") == []

    def test_pattern_mismatch(self):  # validator/mod.rs:4605
        assert v('{"type":"string","pattern":"^[0-9]+$"}', "12a3") == [{
            "kind": E.PATTERN_MISMATCH, "path": (), "pattern": "^[0-9]+$",
            "value": "12a3"}]

    def test_invalid_pattern(self):  # validator/mod.rs:4638-4653
        assert v('{"type":"string","pattern":"["}', "x") == [{
            "kind": E.INVALID_PATTERN_IN_SCHEMA, "path": (), "pattern": "["}]

    def test_multi_error_order_toolong_before_pattern(self):  # :4655-4677
        s = '{"type":"string","pattern":"^[0-9]+$","maxLength":2}'
        assert v(s, "12a") == [
            {"kind": E.TOO_LONG, "path": (), "max_length": 2, "actual_length": 3},
            {"kind": E.PATTERN_MISMATCH, "path": (), "pattern": "^[0-9]+$",
             "value": "12a"},
        ]

    def test_dollar_is_end_of_input_not_before_newline(self):
        # ECMA $: end of input only; Python's $-before-trailing-newline must
        # NOT apply (ecma.py translation).
        assert v('{"type":"string","pattern":"^abc$"}', "abc\n") == [{
            "kind": E.PATTERN_MISMATCH, "path": (), "pattern": "^abc$",
            "value": "abc\n"}]


class TestNumeric:
    def test_integer_rejects_float_one(self):  # validator/mod.rs:2109 semantics
        assert v('{"type":"integer"}', 1.0) == [{
            "kind": E.EXPECTED_INTEGER, "path": (), "got": "number"}]
        assert v('{"type":"integer"}', 1) == []

    def test_integer_rejects_bool_and_huge(self):
        assert v('{"type":"integer"}', True)[0]["got"] == "boolean"
        assert v('{"type":"integer"}', 2**63)[0]["got"] == "number"
        assert v('{"type":"integer"}', -(2**63)) == []

    def test_integer_bounds(self):  # validator/mod.rs:2681
        s = '{"type":"integer","minimum":10,"maximum":20}'
        assert v(s, 5) == [{"kind": E.BELOW_MINIMUM, "path": (),
                            "minimum": 10.0, "actual": 5.0}]
        assert v(s, 25) == [{"kind": E.ABOVE_MAXIMUM, "path": (),
                             "maximum": 20.0, "actual": 25.0}]
        assert v(s, 10) == [] and v(s, 20) == []  # inclusive

    def test_no_bounds_check_when_wrong_type(self):
        # else-if: ExpectedInteger suppresses bounds errors.
        assert len(v('{"type":"integer","minimum":10}', 1.5)) == 1

    def test_number_accepts_int_and_float(self):  # validator/mod.rs:2394-2646
        assert v('{"type":"number"}', 1) == []
        assert v('{"type":"number"}', 1.5) == []
        assert v('{"type":"number"}', "x")[0]["kind"] == E.EXPECTED_NUMBER
        assert v('{"type":"number"}', True)[0]["got"] == "boolean"

    def test_number_bounds(self):  # validator/mod.rs:2863
        s = '{"type":"number","minimum":0.5,"maximum":1.5}'
        assert v(s, 2.0) == [{"kind": E.ABOVE_MAXIMUM, "path": (),
                              "maximum": 1.5, "actual": 2.0}]


class TestArray:
    def test_expected_array(self):
        assert v('{"type":"array"}', {})[0]["kind"] == E.EXPECTED_ARRAY

    def test_min_max_items(self):  # validator/mod.rs:3550
        s = '{"type":"array","minItems":2,"maxItems":3}'
        assert v(s, [1]) == [{"kind": E.TOO_FEW_ITEMS, "path": (),
                              "min_items": 2, "actual_count": 1}]
        assert v(s, [1, 2, 3, 4]) == [{"kind": E.TOO_MANY_ITEMS, "path": (),
                                       "max_items": 3, "actual_count": 4}]
        assert v(s, [1, 2]) == []

    def test_unique_items_first_duplicate_only(self):  # validator/mod.rs:3296
        s = '{"type":"array","uniqueItems":true}'
        assert v(s, [3, 1, 2, 1, 3]) == [{
            "kind": E.DUPLICATE_ARRAY_ITEMS, "path": (),
            "duplicate_value": "3"}]  # first i with a later equal j
        assert v(s, [1, 2, 3]) == []
        assert v(s, [1, 1.0]) == []  # int vs float: distinct serde variants

    def test_unique_items_structs(self):
        s = '{"type":"array","uniqueItems":true}'
        arr = [{"k": "a", "o": 1}, {"k": "a", "o": 2}, {"o": 1, "k": "a"}]
        assert v(s, arr) == [{"kind": E.DUPLICATE_ARRAY_ITEMS, "path": (),
                              "duplicate_value": '{"k":"a","o":1}'}]

    def test_items_element_errors_in_order(self):  # validator/mod.rs:3173
        s = '{"type":"array","items":{"type":"integer"}}'
        errs = v(s, [1, "a", 2, "b"])
        assert kinds(errs) == [(E.EXPECTED_INTEGER, ("1",)),
                               (E.EXPECTED_INTEGER, ("3",))]

    def test_array_node_errors_before_element_errors(self):
        s = '{"type":"array","minItems":3,"items":{"type":"integer"}}'
        errs = v(s, ["a", "b"])
        assert kinds(errs) == [
            (E.TOO_FEW_ITEMS, ()),
            (E.EXPECTED_INTEGER, ("0",)),
            (E.EXPECTED_INTEGER, ("1",)),
        ]


class TestEnumConst:
    def test_enum(self):
        s = '{"enum": ["a", "b", 3]}'
        assert v(s, "a") == [] and v(s, 3) == []
        assert v(s, "c") == [{"kind": E.NOT_IN_ENUM, "path": (),
                              "invalid_value": '"c"',
                              "allowed": ['"a"', '"b"', "3"]}]

    def test_empty_enum_unconstrained(self):  # validator/mod.rs:96-108
        assert v('{"enum": [], "type": "integer"}', "x")[0]["kind"] == \
            E.EXPECTED_INTEGER  # empty enum skipped, type still checked

    def test_enum_failure_short_circuits_node(self):
        s = '{"enum": ["a"], "type": "integer"}'
        assert kinds(v(s, "zz")) == [(E.NOT_IN_ENUM, ())]

    def test_const(self):
        s = '{"const": {"a": 1}}'
        assert v(s, {"a": 1}) == []
        assert v(s, {"a": 2}) == [{"kind": E.NOT_CONST, "path": (),
                                   "expected": '{"a":1}', "actual": '{"a":2}'}]

    def test_const_checked_before_enum(self):
        s = '{"const": "x", "enum": ["y"]}'
        assert kinds(v(s, "z")) == [(E.NOT_CONST, ())]

    def test_const_null(self):
        assert v('{"const": null}', None) == []
        assert v('{"const": null}', 0)[0]["kind"] == E.NOT_CONST


class TestCombinators:
    def test_any_of_pass_suppresses_siblings(self):  # validator/mod.rs:109-133
        s = '{"anyOf":[{"type":"string"}],"type":"integer"}'
        assert v(s, "x") == []  # integer check suppressed even though pass

    def test_any_of_fail(self):
        s = '{"anyOf":[{"type":"string"},{"type":"integer"}]}'
        assert v(s, 1.5) == [{"kind": E.NO_SUBSCHEMA_MATCHED, "path": (),
                              "subschema_count": 2}]

    def test_any_of_empty(self):
        assert v('{"anyOf": []}', 1) == [{"kind": E.NO_SUBSCHEMA_MATCHED,
                                          "path": (), "subschema_count": 0}]

    def test_one_of_exactly_one(self):  # validator/mod.rs:134-163
        s = '{"oneOf":[{"type":"integer"},{"type":"number"}]}'
        assert v(s, 1.5) == []  # only "number" matches the float
        assert v(s, 2) == [{"kind": E.MULTIPLE_SUBSCHEMAS_MATCHED, "path": (),
                            "subschema_count": 2, "match_count": 2}]
        assert v(s, "x") == [{"kind": E.NO_SUBSCHEMA_MATCHED, "path": (),
                              "subschema_count": 2}]

    def test_all_of_accumulates_branch_errors_in_branch_order(self):
        s = '{"allOf":[{"type":"string","minLength":5},{"type":"string","pattern":"^[a-z]+$"}]}'
        errs = v(s, "ab1")
        assert kinds(errs) == [(E.TOO_SHORT, ()), (E.PATTERN_MISMATCH, ())]

    def test_all_of_empty_falls_through_to_type(self):
        s = '{"allOf": [], "type": "integer"}'
        assert v(s, "x")[0]["kind"] == E.EXPECTED_INTEGER

    def test_const_checked_before_any_of(self):
        s = '{"const": 1, "anyOf": [{"type": "string"}]}'
        assert kinds(v(s, 2)) == [(E.NOT_CONST, ())]

    def test_nested_combinator_subschema_errors_discarded(self):
        s = ('{"type":"object","properties":{"v":{"anyOf":'
             '[{"type":"integer"},{"type":"object","required":["k"]}]}}}')
        errs = v(json.loads(s) and s, {"v": {"nope": 1}})
        assert kinds(errs) == [(E.NO_SUBSCHEMA_MATCHED, ("v",))]


class TestBoolean:
    def test_boolean(self):
        assert v('{"type":"boolean"}', True) == []
        assert v('{"type":"boolean"}', 1)[0]["kind"] == E.EXPECTED_BOOLEAN


class TestDeepNesting:
    def test_nested_paths_and_order(self):
        s = '''{"type":"object","properties":{
                "a":{"type":"array","items":{"type":"object",
                     "required":["k"],
                     "properties":{"k":{"type":"string","maxLength":1}}}},
                "b":{"type":"integer"}}}'''
        inst = {"a": [{"k": "xx"}, {}], "b": "bad"}
        errs = v(s, inst)
        assert kinds(errs) == [
            (E.TOO_LONG, ("a", "0", "k")),
            (E.MISSING_REQUIRED, ("a", "1", "k")),
            (E.EXPECTED_INTEGER, ("b",)),
        ]

    def test_pointer_escaping_in_paths(self):
        s = '{"type":"object","properties":{"a/b":{"type":"integer"}}}'
        errs = v(s, {"a/b": "x"})
        from engine.pointer import encode_pointer
        assert encode_pointer(errs[0]["path"]) == "/a~1b"
