"""JsonPointer value-object parity — ports the reference's colocated test
suite (json_pointer.rs:327-612)."""

import pytest

from engine.pointer import JsonPointer, JsonPointerError


class TestConstruction:
    def test_root_is_empty(self):
        p = JsonPointer.root()
        assert p.is_root() and p.is_empty() and len(p) == 0
        assert p.as_str() == "" and str(p) == ""

    def test_try_from_empty_string(self):
        assert JsonPointer.from_string("") == JsonPointer.root()

    def test_try_from_slash_a(self):
        p = JsonPointer.from_string("/a")
        assert list(p.segments()) == ["a"] and p.as_str() == "/a"

    def test_try_from_slash_a_slash_b(self):
        p = JsonPointer.from_string("/a/b")
        assert list(p.segments()) == ["a", "b"]

    def test_try_from_encoded_slash_and_tilde(self):
        assert list(JsonPointer.from_string("/a~1b").segments()) == ["a/b"]
        assert list(JsonPointer.from_string("/a~0b").segments()) == ["a~b"]
        assert list(JsonPointer.from_string("/~1").segments()) == ["/"]

    def test_invalid_escapes(self):
        with pytest.raises(JsonPointerError):
            JsonPointer.from_string("/a~")
        with pytest.raises(JsonPointerError):
            JsonPointer.from_string("/a~2b")
        with pytest.raises(JsonPointerError):
            JsonPointer.from_string("a/b")  # no leading slash

    def test_from_bytes(self):
        assert JsonPointer.from_bytes(b"/a/b").as_str() == "/a/b"
        with pytest.raises(JsonPointerError):
            JsonPointer.from_bytes(b"/\xff\xfe")

    def test_from_segments(self):
        assert JsonPointer.from_segments([]).is_root()
        p = JsonPointer.from_segments(["a", "b"])
        assert p.as_str() == "/a/b"

    def test_empty_segment(self):
        p = JsonPointer.from_string("/a//b")
        assert list(p.segments()) == ["a", "", "b"]
        assert p.as_str() == "/a//b"


class TestNavigation:
    def test_push_encodes(self):
        p = JsonPointer.root().push("a").push("x/y").push("t~z")
        assert p.as_str() == "/a/x~1y/t~0z"
        assert list(p.segments()) == ["a", "x/y", "t~z"]
        assert len(p) == 3

    def test_pop_and_parent(self):
        p = JsonPointer.from_string("/a/b/c")
        assert p.pop().as_str() == "/a/b"
        assert p.parent() == p.pop()
        assert JsonPointer.from_string("/a").pop().is_root()
        assert JsonPointer.root().pop().is_root()

    def test_truncate(self):
        p = JsonPointer.from_string("/a/b/c")
        assert p.truncate(0).is_root()
        assert p.truncate(1).as_str() == "/a"
        assert p.truncate(3) == p
        assert p.truncate(99) == p

    def test_remove(self):
        p = JsonPointer.from_string("/a/b/c")
        assert p.remove(1).as_str() == "/a/c"
        assert p.remove(0).as_str() == "/b/c"
        assert p.remove(99) == p

    def test_segment_at(self):
        p = JsonPointer.from_string("/a/b")
        assert p.segment_at(0) == "a"
        assert p.segment_at(1) == "b"
        assert p.segment_at(2) is None


class TestDisplayAndRoundTrip:
    def test_display_root_or_path(self):
        assert JsonPointer.root().display_root_or_path() == "root"
        assert JsonPointer.from_string("/a").display_root_or_path() == "/a"

    def test_round_trip_build_serialize_parse(self):
        p = JsonPointer.root().push("a~b").push("c/d").push("")
        q = JsonPointer.from_string(p.as_str())
        assert p == q and list(q.segments()) == ["a~b", "c/d", ""]

    def test_round_trip_parse_serialize_parse(self):
        s = "/x~0y/z~1w//plain"
        p = JsonPointer.from_string(s)
        assert p.as_str() == s
        assert JsonPointer.from_string(p.as_str()) == p

    def test_hash_eq(self):
        assert hash(JsonPointer.from_string("/a")) == \
            hash(JsonPointer.root().push("a"))
