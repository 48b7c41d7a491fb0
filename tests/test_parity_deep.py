"""Deep-structure parity cases the random fuzzer doesn't reach: nested
lists, combinators over object shapes, $refs inside allOf branches,
non-ASCII keys, enum-with-null, composite consts."""

import pyarrow as pa

from tests.test_kernels import assert_parity
from engine import errors as E


class TestNestedLists:
    def test_list_of_lists(self):
        s = '''{"type":"object","properties":{"m":{
              "type":"array","minItems":1,
              "items":{"type":"array","maxItems":2,
                       "items":{"type":"integer","minimum":0}}}}}'''
        t = pa.table({"m": pa.array(
            [[[1, 2], [3]], [[-1], [0, 1, 2]], [], None,
             [[None, 5]]],
            pa.list_(pa.list_(pa.int64())))})
        errs = assert_parity(s, t)
        by_doc = [(d, e["kind"], e["path"]) for d, _, e in errs]
        assert (1, E.BELOW_MINIMUM, ("m", "0", "0")) in by_doc   # -1
        assert (1, E.TOO_MANY_ITEMS, ("m", "1")) in by_doc       # [0,1,2]
        assert (2, E.TOO_FEW_ITEMS, ("m",)) in by_doc            # []
        assert (4, E.EXPECTED_INTEGER, ("m", "0", "0")) in by_doc  # null elem

    def test_unique_items_on_list_of_lists_python_fallback(self):
        s = '{"type":"object","properties":{"m":{"type":"array","uniqueItems":true}}}'
        t = pa.table({"m": pa.array(
            [[[1, 2], [1, 2]], [[1], [2]], [[1, 2], [1, 2, 3]]],
            pa.list_(pa.list_(pa.int64())))})
        errs = assert_parity(s, t)
        assert [e["duplicate_value"] for _, _, e in errs] == ["[1,2]"]

    def test_list_of_structs_with_string_checks(self):
        s = '''{"type":"object","properties":{"sp":{
              "type":"array","items":{"type":"object","required":["k"],
                "properties":{"k":{"type":"string","pattern":"^[a-z]+$"},
                              "n":{"type":"array","items":{"type":"number"}}},
                "additionalProperties":false}}}}'''
        st = pa.struct([("k", pa.string()), ("n", pa.list_(pa.float64())),
                        ("x", pa.int64())])
        t = pa.table({"sp": pa.array(
            [[{"k": "ok", "n": [1.0]}, {"k": "BAD", "x": 5},
              {"n": [1.5, None]}]], pa.list_(st))})
        assert_parity(s, t)


class TestCombinatorsDeep:
    def test_oneof_over_object_shapes(self):
        # FIXTURES variant: text-span vs media-span shapes
        s = '''{"type":"object","properties":{"span":{
          "oneOf":[
            {"type":"object","required":["text"],
             "properties":{"text":{"type":"string","minLength":1},
                           "ref":{"const":""}}},
            {"type":"object","required":["ref"],
             "properties":{"ref":{"type":"string","pattern":"^m:"},
                           "text":{"const":""}}}]}}}'''
        st = pa.struct([("text", pa.string()), ("ref", pa.string())])
        t = pa.table({"span": pa.array([
            {"text": "hi", "ref": ""},        # matches 1 only
            {"text": "", "ref": "m:abc"},     # matches 2 only
            {"text": "", "ref": ""},          # wait: branch1 needs text minLength 1 -> no; branch2 needs ref pattern -> no
            {"text": "hi", "ref": "m:abc"},   # neither (consts fail both)
            None,
        ], st)})
        assert_parity(s, t)

    def test_anyof_with_nested_required(self):
        s = '''{"type":"object","properties":{"v":{
              "anyOf":[{"type":"object","required":["a"],
                        "properties":{"a":{"type":"integer"}},
                        "additionalProperties":false},
                       {"type":"object","required":["b"]}]}}}'''
        st = pa.struct([("a", pa.string()), ("b", pa.int64())])
        t = pa.table({"v": pa.array(
            [{"a": "x"}, {"b": 1}, {"a": "x", "b": 2}, {}], st)})
        assert_parity(s, t)

    def test_allof_with_refs_in_branches(self):
        s = '''{"$defs":{"HasA":{"type":"object","required":["a"]},
                         "HasB":{"type":"object","required":["b"]}},
               "type":"object","properties":{"o":{
                 "allOf":[{"$ref":"#/$defs/HasA"},{"$ref":"#/$defs/HasB"}]}}}'''
        st = pa.struct([("a", pa.int64()), ("b", pa.int64())])
        t = pa.table({"o": pa.array(
            [{"a": 1, "b": 2}, {"a": 1}, {"b": 2}, {}], st)})
        errs = assert_parity(s, t)
        # branch order: HasA error before HasB error for the empty struct
        doc3 = [(e["kind"], e["path"]) for d, _, e in errs if d == 3]
        assert doc3 == [(E.MISSING_REQUIRED, ("o", "a")),
                        (E.MISSING_REQUIRED, ("o", "b"))]

    def test_ref_to_root(self):
        # '#' self-reference applied to a nested object of the same shape
        s = '''{"type":"object","required":["name"],
               "properties":{"name":{"type":"string"},
                             "child":{"$ref":"#"}}}'''
        child_t = pa.struct([("name", pa.string())])
        st = pa.struct([("name", pa.string()), ("child", child_t)])
        t = pa.table({"name": pa.array(["a", None]),
                      "child": pa.array([{"name": None}, None], child_t)})
        errs = assert_parity(s, t)
        assert (E.MISSING_REQUIRED, ("child", "name")) in \
            [(e["kind"], e["path"]) for _, _, e in errs]


class TestValueEdgeCases:
    def test_non_ascii_property_names(self):
        s = ('{"type":"object","required":["héllo"],'
             '"properties":{"héllo":{"type":"integer"}}}')
        t = pa.table({"héllo": pa.array([1, None, "x" and 3], pa.int64())})
        assert_parity(s, t)

    def test_enum_with_null_member(self):
        # list elements: null element is JSON null and matches enum null
        s = ('{"type":"object","properties":{"xs":{"type":"array",'
             '"items":{"enum":[null,"a",1]}}}}')
        t = pa.table({"xs": pa.array([["a", None, "b"], [None]],
                                     pa.list_(pa.string()))})
        errs = assert_parity(s, t)
        assert [(d, e["path"]) for d, _, e in errs] == [(0, ("xs", "2"))]

    def test_composite_const_on_struct_column(self):
        s = ('{"type":"object","properties":{"o":{"const":{"k":"v","n":1}}}}')
        st = pa.struct([("k", pa.string()), ("n", pa.int64())])
        t = pa.table({"o": pa.array(
            [{"k": "v", "n": 1}, {"k": "v", "n": 2}, None], st)})
        errs = assert_parity(s, t)
        assert [e["kind"] for _, _, e in errs] == [E.NOT_CONST]
        assert errs[0][2]["actual"] == '{"k":"v","n":2}'

    def test_composite_const_on_list_column(self):
        s = '{"type":"object","properties":{"xs":{"const":[1,2]}}}'
        t = pa.table({"xs": pa.array([[1, 2], [2, 1], []],
                                     pa.list_(pa.int64()))})
        errs = assert_parity(s, t)
        assert len(errs) == 2

    def test_max_items_zero(self):
        s = '{"type":"object","properties":{"xs":{"type":"array","maxItems":0}}}'
        t = pa.table({"xs": pa.array([[], [1]], pa.list_(pa.int64()))})
        errs = assert_parity(s, t)
        assert [e["kind"] for _, _, e in errs] == [E.TOO_MANY_ITEMS]

    def test_float32_column_values(self):
        # f32 storage widens to f64 exactly like serde would see the value
        s = '{"type":"object","properties":{"x":{"type":"number","maximum":0.1}}}'
        t = pa.table({"x": pa.array([0.1, 0.05], pa.float32())})
        errs = assert_parity(s, t)
        # float32(0.1) widens to 0.10000000149... > 0.1 -> violation
        assert [e["kind"] for _, _, e in errs] == [E.ABOVE_MAXIMUM]
