"""Property-based invariants (hypothesis): pointer round-trips, sanitizer
idempotence, sketch merge algebra, ECMA translator safety."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

SEGMENT = st.text(min_size=0, max_size=12)


class TestPointerProperties:
    @given(st.lists(SEGMENT, max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_encode_parse_round_trip(self, segs):
        from engine.pointer import encode_pointer, parse_pointer
        assert parse_pointer(encode_pointer(segs)) == tuple(segs)

    @given(st.lists(SEGMENT, min_size=1, max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_push_pop_inverse(self, segs):
        from engine.pointer import JsonPointer
        p = JsonPointer.from_segments(segs[:-1])
        assert p.push(segs[-1]).pop() == p


class TestSanitizerProperties:
    @given(st.text(max_size=24))
    @settings(max_examples=200, deadline=None)
    def test_field_name_eventually_stable(self, s):
        """Reference parity note: the digit-prefix early return
        (sanitizers.rs:52-54) skips the invalid-char scrub, so one
        application may emit punctuation (e.g. ':' -> 'field_0:') — in the
        REFERENCE too; a second application reaches a fixed point."""
        from engine.sanitizers import sanitize_field_name
        twice = sanitize_field_name(sanitize_field_name(s))
        assert sanitize_field_name(twice) == twice
        assert twice.isidentifier()

    @given(st.text(max_size=24))
    @settings(max_examples=200, deadline=None)
    def test_struct_name_eventually_stable(self, s):
        """heck's PascalCase is not one-shot idempotent on acronym runs
        ("aA" -> "AA" -> "Aa") — reference semantics; a second application
        is a fixed point."""
        from engine.sanitizers import sanitize_struct_name
        twice = sanitize_struct_name(sanitize_struct_name(s))
        assert sanitize_struct_name(twice) == twice


class TestSketchProperties:
    @given(st.lists(st.integers(min_value=0, max_value=50),
                    min_size=0, max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_spacesaving_overestimates_within_bound(self, values):
        import collections
        from engine.sketches import SpaceSaving
        ss = SpaceSaving(8).update(values)
        exact = collections.Counter(values)
        for v, est in ss.counts.items():
            assert est >= exact[v]
            assert est - exact[v] <= ss.errors[v]

    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                              width=32), min_size=0, max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_tdigest_merge_total_weight(self, values):
        from engine.sketches import TDigest
        half = len(values) // 2
        a = TDigest().update(np.array(values[:half], dtype=np.float64))
        b = TDigest().update(np.array(values[half:], dtype=np.float64))
        a.merge(b)
        assert abs(a.total - len(values)) < 1e-6


class TestEcmaProperties:
    @given(st.text(alphabet="abc123().*+?[]\\dws^$|{}-", max_size=16))
    @settings(max_examples=300, deadline=None)
    def test_compile_never_raises(self, pattern):
        from engine.ecma import compile_ecma
        rx = compile_ecma(pattern)  # None or compiled, never an exception
        if rx is not None:
            rx.search("a1 b2é")  # and searching never raises either

    @given(st.integers(min_value=0, max_value=0x10FFFF))
    @settings(max_examples=400, deadline=None)
    def test_class_inner_complements_exact_membership(self, cp):
        """Class-inner \\D \\W \\S expand to codepoint ranges that agree
        with direct membership in the ECMA sets, for any codepoint."""
        import unicodedata
        from engine.ecma import compile_ecma, _DIGIT_IV, _WORD_IV, _SPACE_IV
        if unicodedata.category(chr(cp)) in ("Cs",):  # lone surrogates
            return
        s = chr(cp)
        for esc, ivs in (("D", _DIGIT_IV), ("W", _WORD_IV), ("S", _SPACE_IV)):
            rx = compile_ecma(f"^[\\{esc}]$")
            in_set = any(lo <= cp <= hi for lo, hi in ivs)
            assert (rx.search(s) is not None) == (not in_set), (esc, hex(cp))
            # and the positive class agrees with membership too
            rx_pos = compile_ecma(f"^[\\{esc.lower()}]$")
            assert (rx_pos.search(s) is not None) == in_set, (esc, hex(cp))
