"""Vectorized engine vs row-wise oracle: differential tests.

Strategy (SURVEY.md §5b): every (schema, table) pair is validated two ways —
per-row through ``engine.oracle`` on the JSON conversion of each row, and
vectorized through ``engine.kernels.validate_batch`` — and the FULL error
streams (kind, path, context, order) must be identical.
"""

import json
import random

import numpy as np
import pyarrow as pa
import pytest

from engine import errors as E
from engine.compile import compile_plan
from engine.kernels import validate_batch
from engine.oracle import validate as oracle_validate
from engine.rows import table_to_json_rows
from engine.schema import parse_schema


def assert_parity(schema_json: str, table: pa.Table):
    schema = parse_schema(schema_json)
    plan = compile_plan(schema)
    got = validate_batch(plan, table)
    rows = table_to_json_rows(table)
    expected = []
    for r, inst in enumerate(rows):
        for seq, err in enumerate(oracle_validate(schema, inst)):
            expected.append((r, seq, err))
    assert got == expected, (
        f"engine/oracle mismatch:\nengine  ={got}\nexpected={expected}")
    return got


SPANS_SCHEMA = """
{
  "type": "object",
  "required": ["doc_id", "spans"],
  "properties": {
    "doc_id": { "type": "string", "minLength": 1, "maxLength": 64,
                "pattern": "^doc-[0-9a-f]+$" },
    "spans": {
      "type": "array", "minItems": 1, "maxItems": 4, "uniqueItems": true,
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
        "text":      { "type": "string", "maxLength": 10 },
        "media_ref": { "anyOf": [ { "const": "" },
                                  { "type": "string",
                                    "pattern": "^media://[0-9a-f]{4}$" } ] },
        "offset":    { "type": "integer", "minimum": 0, "maximum": 100 }
      },
      "additionalProperties": false
    }
  }
}
"""


def spans_table(rows):
    typ = pa.struct([("kind", pa.string()), ("text", pa.string()),
                     ("media_ref", pa.string()), ("offset", pa.int32())])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "spans": pa.array([r.get("spans") for r in rows], pa.list_(typ)),
    })


class TestSpansFixture:
    def test_clean_docs(self):
        t = spans_table([
            {"doc_id": "doc-1a", "spans": [
                {"kind": "text", "text": "hi", "media_ref": "", "offset": 0}]},
            {"doc_id": "doc-2b", "spans": [
                {"kind": "image", "text": "", "media_ref": "media://0a1b",
                 "offset": 3}]},
        ])
        assert assert_parity(SPANS_SCHEMA, t) == []

    def test_violation_mix(self):
        t = spans_table([
            {"doc_id": "DOC-X", "spans": [
                {"kind": "video", "text": "x", "media_ref": "", "offset": -5},
                {"kind": "text", "media_ref": "nope", "offset": 7},
            ]},
            {"doc_id": "doc-ff", "spans": []},
            {"doc_id": "doc-aa", "spans": [
                {"kind": "text", "text": "toolongtoolong", "media_ref": "",
                 "offset": 5},
                {"kind": "text", "text": "toolongtoolong", "media_ref": "",
                 "offset": 5},
                {"kind": "audio", "text": "", "media_ref": "media://zzzz",
                 "offset": 101},
            ]},
            {"doc_id": "doc-bb", "spans": [
                {"kind": "table", "text": "t", "media_ref": "", "offset": 1}]},
        ])
        errs = assert_parity(SPANS_SCHEMA, t)
        assert len(errs) > 0

    def test_missing_required_column_values(self):
        t = spans_table([
            {"doc_id": None, "spans": [
                {"kind": "text", "text": "a", "media_ref": "", "offset": 0}]},
            {"doc_id": "doc-1", "spans": None},
        ])
        errs = assert_parity(SPANS_SCHEMA, t)
        kinds = [(e[2]["kind"], e[2]["path"]) for e in errs]
        assert (E.MISSING_REQUIRED, ("doc_id",)) in kinds
        assert (E.MISSING_REQUIRED, ("spans",)) in kinds


class TestTypedColumns:
    def test_integer_vs_float_column(self):
        s = '{"type":"object","properties":{"x":{"type":"integer","minimum":0}}}'
        t_int = pa.table({"x": pa.array([1, -2, None, 5], pa.int64())})
        t_flt = pa.table({"x": pa.array([1.0, 2.5, None], pa.float64())})
        errs = assert_parity(s, t_int)
        assert [e[2]["kind"] for e in errs] == [E.BELOW_MINIMUM]
        errs = assert_parity(s, t_flt)
        assert [e[2]["kind"] for e in errs] == [E.EXPECTED_INTEGER] * 2

    def test_number_bounds_on_ints(self):
        s = '{"type":"object","properties":{"x":{"type":"number","minimum":0.5,"maximum":2.5}}}'
        t = pa.table({"x": pa.array([0, 1, 3], pa.int32())})
        errs = assert_parity(s, t)
        assert [e[2]["kind"] for e in errs] == [E.BELOW_MINIMUM, E.ABOVE_MAXIMUM]

    def test_uint64_overflow_fails_integer(self):
        s = '{"type":"object","properties":{"x":{"type":"integer"}}}'
        t = pa.table({"x": pa.array([1, 2**63, 2**64 - 1], pa.uint64())})
        errs = assert_parity(s, t)
        assert [e[2]["kind"] for e in errs] == [E.EXPECTED_INTEGER] * 2

    def test_string_checks(self):
        s = ('{"type":"object","properties":{"x":{"type":"string",'
             '"minLength":2,"maxLength":4,"pattern":"^[a-z]+$"}}}')
        t = pa.table({"x": pa.array(["ok", "a", "toolong", "ABC", "héé", None])})
        assert_parity(s, t)

    def test_wrong_type_column(self):
        s = '{"type":"object","properties":{"x":{"type":"string"}}}'
        t = pa.table({"x": pa.array([1, 2], pa.int64())})
        errs = assert_parity(s, t)
        assert [e["got"] for _, _, e in errs] == ["number", "number"]

    def test_boolean(self):
        s = '{"type":"object","properties":{"x":{"type":"boolean"}}}'
        assert_parity(s, pa.table({"x": pa.array([True, None, False])}))
        assert_parity(s, pa.table({"x": pa.array(["y"])}))

    def test_enum_int_float_kinds(self):
        s = '{"type":"object","properties":{"x":{"enum":[1,2,"a"]}}}'
        # float column: 1.0 is NOT the integer 1 in serde terms
        t = pa.table({"x": pa.array([1.0, 2.0], pa.float64())})
        errs = assert_parity(s, t)
        assert [e[2]["kind"] for e in errs] == [E.NOT_IN_ENUM] * 2
        t2 = pa.table({"x": pa.array([1, 3], pa.int64())})
        errs = assert_parity(s, t2)
        assert [e[2]["kind"] for e in errs] == [E.NOT_IN_ENUM]

    def test_const_string(self):
        s = '{"type":"object","properties":{"x":{"const":""}}}'
        assert_parity(s, pa.table({"x": pa.array(["", "x", None])}))

    def test_null_list_elements_are_json_null(self):
        s = '{"type":"object","properties":{"x":{"type":"array","items":{"type":"integer"}}}}'
        t = pa.table({"x": pa.array([[1, None, 3]], pa.list_(pa.int64()))})
        errs = assert_parity(s, t)
        assert [(e["kind"], e["path"], e["got"]) for _, _, e in errs] == \
            [(E.EXPECTED_INTEGER, ("x", "1"), "null")]

    def test_unique_items_on_scalar_lists(self):
        s = '{"type":"object","properties":{"x":{"type":"array","uniqueItems":true}}}'
        t = pa.table({"x": pa.array([[3, 1, 2, 1, 3], [1, 2], None, [5, 5]],
                                    pa.list_(pa.int64()))})
        errs = assert_parity(s, t)
        assert [e["duplicate_value"] for _, _, e in errs] == ["3", "5"]

    def test_nested_objects(self):
        s = '''{"type":"object","properties":{"o":{"type":"object",
              "required":["k"],"properties":{"k":{"type":"string"},
              "n":{"type":"integer","maximum":9}}}}}'''
        typ = pa.struct([("k", pa.string()), ("n", pa.int64())])
        t = pa.table({"o": pa.array(
            [{"k": "a", "n": 5}, {"n": 10}, None, {"k": "b", "n": 100}], typ)})
        assert_parity(s, t)

    def test_additional_properties_forbid_on_columns(self):
        s = ('{"type":"object","properties":{"a":{"type":"integer"}},'
             '"additionalProperties":false}')
        t = pa.table({"a": pa.array([1, 2]), "zz": pa.array(["x", None]),
                      "bb": pa.array([None, 1.5], pa.float64())})
        errs = assert_parity(s, t)
        # row 0: bb absent -> only zz flagged; row 1: only bb flagged
        assert [(d, e["property"]) for d, _, e in errs] == [(0, "zz"), (1, "bb")]

    def test_additional_properties_schema_ordering(self):
        s = ('{"type":"object","properties":{"m":{"type":"integer"}},'
             '"additionalProperties":{"type":"string"}}')
        t = pa.table({"m": pa.array(["bad"]), "a": pa.array([1]),
                      "z": pa.array([2])})
        errs = assert_parity(s, t)
        assert [e["path"] for _, _, e in errs] == [("z",), ("a",), ("m",)]

    def test_anyof_oneof_on_columns(self):
        s = '''{"type":"object","properties":{
               "x":{"anyOf":[{"const":""},{"type":"string","minLength":3}]},
               "y":{"oneOf":[{"type":"integer","minimum":5},
                             {"type":"integer","maximum":10}]}}}'''
        t = pa.table({"x": pa.array(["", "ab", "abcd", None]),
                      "y": pa.array([7, 3, 20, None], pa.int64())})
        assert_parity(s, t)

    def test_allof_branch_order(self):
        s = '''{"type":"object","properties":{"x":{"allOf":[
               {"type":"string","minLength":5},
               {"type":"string","pattern":"^[a-z]+$"}]}}}'''
        t = pa.table({"x": pa.array(["ab1", "abcdef", "xy"])})
        errs = assert_parity(s, t)
        assert [e[2]["kind"] for e in errs if e[0] == 0] == \
            [E.TOO_SHORT, E.PATTERN_MISMATCH]

    def test_ref_error_per_row(self):
        s = '{"type":"object","properties":{"x":{"$ref":"#/$defs/Nope"}}}'
        t = pa.table({"x": pa.array([1, None, 3])})
        errs = assert_parity(s, t)
        assert [e[2]["kind"] for e in errs] == [E.INVALID_REF] * 2

    def test_invalid_pattern_per_string_row(self):
        s = '{"type":"object","properties":{"x":{"type":"string","pattern":"["}}}'
        t = pa.table({"x": pa.array(["a", None, "b"])})
        errs = assert_parity(s, t)
        assert [e[2]["kind"] for e in errs] == [E.INVALID_PATTERN_IN_SCHEMA] * 2


class TestRandomizedParity:
    """Seeded fuzz: random tables vs the spans schema and a gnarly schema."""

    def test_fuzz_spans(self):
        rng = random.Random(42)
        kinds = ["text", "image", "audio", "table", "video", None]
        rows = []
        for i in range(300):
            doc = {"doc_id": rng.choice(
                [f"doc-{i:x}", f"DOC-{i}", "", None, "doc-" + "f" * 70])}
            if rng.random() < 0.9:
                spans = []
                for j in range(rng.randint(0, 6)):
                    spans.append({
                        "kind": rng.choice(kinds),
                        "text": rng.choice(["", "short", "x" * 12, None]),
                        "media_ref": rng.choice(
                            ["", "media://0a1b", "media://zz", None, "bad"]),
                        "offset": rng.choice([0, 5, -1, 101, None]),
                    })
                if spans and rng.random() < 0.3:
                    spans.append(dict(spans[0]))  # duplicate for uniqueItems
                doc["spans"] = spans
            else:
                doc["spans"] = None
            rows.append(doc)
        assert_parity(SPANS_SCHEMA, spans_table(rows))

    def test_fuzz_mixed_types(self):
        schema = '''{"type":"object","required":["a","b"],"properties":{
            "a":{"type":"integer","minimum":-5,"maximum":5},
            "b":{"type":"array","minItems":1,"maxItems":3,"uniqueItems":true,
                 "items":{"type":"number","minimum":0}},
            "c":{"enum":["r","g","b"]},
            "d":{"type":"string","minLength":1,"pattern":"a+"}},
            "additionalProperties":false}'''
        rng = random.Random(7)
        n = 200
        t = pa.table({
            "a": pa.array([rng.choice([None, -10, -5, 0, 7]) for _ in range(n)],
                          pa.int64()),
            "b": pa.array([rng.choice(
                [None, [], [1.0], [1.0, 1.0], [-1.0, 2.0, 3.0, 4.0]])
                for _ in range(n)], pa.list_(pa.float64())),
            "c": pa.array([rng.choice([None, "r", "x"]) for _ in range(n)]),
            "d": pa.array([rng.choice([None, "", "aaa", "bbb"]) for _ in range(n)]),
            "extra": pa.array([rng.choice([None, 1]) for _ in range(n)],
                              pa.int64()),
        })
        assert_parity(schema, t)


class TestEcmaTranslation:
    """ECMA-vs-Python divergences the translator must fix
    (validator/mod.rs:259-277 regress semantics, non-unicode-flag mode)."""

    def _m(self, pattern, s):
        from engine.ecma import compile_ecma
        rx = compile_ecma(pattern)
        assert rx is not None, pattern
        return rx.search(s) is not None

    def test_digit_is_ascii(self):
        assert self._m(r"^\d$", "7")
        assert not self._m(r"^\d$", "٣")  # ARABIC-INDIC DIGIT THREE
        assert self._m(r"^\D$", "٣")

    def test_word_is_ascii(self):
        assert self._m(r"^\w+$", "ab_9")
        assert not self._m(r"^\w$", "é")
        assert self._m(r"^\W$", "é")

    def test_space_is_ecma_set(self):
        assert self._m(r"^\s$", " ")
        assert self._m(r"^\s$", "﻿")   # ECMA includes BOM; Python not
        assert not self._m(r"^\s$", "\x1c")  # Python \s includes FS; ECMA not
        assert self._m(r"^\S$", "\x1c")

    def test_word_boundary_ascii(self):
        # é is a non-word char in ECMA, so a boundary precedes x
        assert self._m(r"\bx", "éx")
        assert not self._m(r"\bx", "ax")
        assert self._m(r"a\B", "ab")  # a-b: word/word => \B holds

    def test_dot_excludes_ecma_line_terminators(self):
        assert self._m("^a.b$", "a b")
        assert not self._m("^a.b$", "a b")
        assert not self._m("^a.b$", "a\nb")

    def test_dollar_end_of_input_only(self):
        assert self._m("^abc$", "abc")
        assert not self._m("^abc$", "abc\n")

    def test_class_expansions(self):
        assert self._m(r"^[\d]$", "5")
        assert not self._m(r"^[\d]$", "٣")
        assert self._m(r"^[\w-]+$", "a-b_c9")
        assert not self._m(r"^[\w]$", "é")
        assert self._m(r"^[\s]$", "﻿")

    def test_named_group_translates(self):
        from engine.ecma import compile_ecma
        rx = compile_ecma(r"(?<year>[0-9]{4})-(?<month>[0-9]{2})")
        m = rx.search("2024-07")
        assert m.group("year") == "2024" and m.group("month") == "07"

    def test_lookbehind_untouched(self):
        assert self._m(r"(?<=a)b", "ab")
        assert not self._m(r"(?<=a)b", "cb")
        assert self._m(r"(?<!a)b", "cb")

    def test_invalid_pattern_still_none(self):
        from engine.ecma import compile_ecma
        assert compile_ecma("[") is None
        assert compile_ecma("(") is None

    def test_control_escape(self):
        # \cX = chr(X % 32); Python re has no \c, translator emits \xNN
        assert self._m(r"^\cA$", "\x01")
        assert self._m(r"^\cj$", "\n")          # lowercase letter too
        assert not self._m(r"^\cA$", "A")
        assert self._m(r"^[\cM\cJ]$", "\r")      # inside a class
        assert self._m(r"^[\c1]$", "\x11")       # Annex B: digits in class
        # Annex B: \c with no control letter is literal backslash + 'c'
        assert self._m(r"^\c$", "\\c")
        assert self._m(r"^\c-$", "\\c-")

    def test_annex_b_octal_escapes(self):
        assert self._m(r"^\1$", "\x01")     # no groups: legacy octal
        assert self._m(r"^\12$", "\n")
        assert self._m(r"^\377$", "\xff")
        assert self._m(r"^\400$", " 0")      # \40 (space) + literal '0'
        assert self._m(r"^\8$", "8")         # identity escape
        assert self._m(r"^\19$", "\x019")    # \1 + literal '9'
        assert self._m(r"^[\1]$", "\x01")    # class digits always octal
        assert self._m(r"^[\8]$", "8")
        assert self._m(r"^(x)\12$", "x\n")   # 12 > 1 group: whole-run octal

    def test_backreferences(self):
        assert self._m(r"^(ab)\1$", "abab")
        assert not self._m(r"^(ab)\1$", "abc")
        assert self._m(r"^(a)\2$", "a\x02")  # \2 > groups: octal
        assert self._m(r"^\1(a)$", "a")      # forward ref matches empty
        assert self._m(r"^(a\1b)$", "ab")    # self ref matches empty
        assert self._m(r"^(?<g>q)x\1$", "qxq")  # named groups count
        from engine.ecma import compile_ecma
        assert compile_ecma("(a)" * 100 + r"\100") is None  # no spelling

    def test_non_participating_group_backref_matches_empty(self):
        # ECMA: a backref to a group that closed WITHOUT participating
        # matches empty (a bare Python \N would fail the match) — emitted
        # as the conditional (?(N)\N)
        assert self._m(r"^(?:(a)|b)\1$", "b")     # b-branch: \1 -> empty
        assert self._m(r"^(?:(a)|b)\1$", "aa")    # a-branch: \1 -> "a"
        assert not self._m(r"^(?:(a)|b)\1$", "ba")
        assert not self._m(r"^(?:(a)|b)\1$", "a")  # capture must repeat
        assert self._m(r"^(a)?\1$", "")           # optional group unset
        assert self._m(r"^(a)?\1$", "aa")
        assert not self._m(r"^(a)?\1$", "a")
        # conditional emission still can't merge with a trailing digit
        assert self._m(r"^(q)\1 1$", "qq 1")

    def test_quantified_group_capture_retention_divergence(self):
        # DOCUMENTED divergence (engine/ecma.py): ECMA clears a
        # quantified group's captures at the start of every iteration,
        # so "ab" vs ^(?:(a)|b)+\1$ MATCHES in ECMA (final b-iteration
        # leaves group 1 undefined -> \1 empty). Python retains the
        # capture from the earlier a-iteration; no Python spelling
        # exists for per-iteration clearing. Pin the Python behavior so
        # any change is deliberate.
        assert not self._m(r"^(?:(a)|b)+\1$", "ab")   # ECMA: True
        assert self._m(r"^(?:(a)|b)+\1$", "aba")      # both: True
        # outside a quantifier the conditional IS exact (previous test)

    def test_class_inner_complements_exact(self):
        # \D \W \S inside a class expand to exact ECMA complement ranges
        # (Python's unicode-flavored \D\W\S would diverge on these inputs)
        assert self._m(r"^[\D]$", "٣")    # non-ASCII digit: ECMA non-digit
        assert self._m(r"^[\W]$", "é")    # non-ASCII letter: ECMA non-word
        assert self._m(r"^[\S]$", "\x1c")  # FS: not ECMA whitespace
        assert not self._m(r"^[\S]$", "﻿")  # BOM: ECMA whitespace
        assert self._m(r"^[\Da]+$", "a٣é")       # union with literals
        assert self._m(r"^[^\D]+$", "123")        # negated: digits only
        assert not self._m(r"^[^\D]$", "x")


class TestEcmaCrossEngineFuzz:
    """RE2 (pyarrow.compute) implements ASCII \\d \\w \\b exactly like ECMA,
    so it is an independent oracle for the translated Python patterns on
    those classes (\\s and `.` differ between RE2 and ECMA and are excluded;
    their ECMA semantics are pinned in TestEcmaTranslation)."""

    def test_digit_word_boundary_agree_with_re2(self):
        import pyarrow as pa
        import pyarrow.compute as pc
        from engine.ecma import compile_ecma
        import random
        rng = random.Random(5)
        alphabet = "ab1 _-é٣日\t"
        strings = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
                   for _ in range(300)]
        patterns = [r"\d", r"\d+", r"^\d+$", r"\w", r"^\w+$", r"\w\d",
                    r"\bx", r"\ba", r"a\b", r"\B1", r"\D", r"\W",
                    r"[\d]", r"[\w]+", r"^[\w\d]*$"]
        arr = pa.array(strings, pa.string())
        for p in patterns:
            rx = compile_ecma(p)
            assert rx is not None, p
            mine = [rx.search(s) is not None for s in strings]
            re2 = pc.match_substring_regex(arr, p).to_pylist()
            assert mine == re2, (
                p, [s for s, m, r in zip(strings, mine, re2) if m != r])
