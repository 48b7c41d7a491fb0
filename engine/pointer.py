"""RFC 6901 JSON Pointer helpers.

Parity target: reference ``json_schema_rs/src/json_pointer.rs:35-57`` (encode:
``~`` -> ``~0`` then ``/`` -> ``~1``; decode: the reverse, ``~`` must be
followed by ``0`` or ``1``) and ``:230-236`` (``display_root_or_path``: root
renders as the literal string ``"root"``).

Paths are represented as tuples of *decoded* segment strings; encoding happens
only when producing the pointer string (same as the reference's cached-encoding
model).
"""

from __future__ import annotations


class JsonPointerError(ValueError):
    """Invalid escape: ``~`` not followed by ``0`` or ``1``."""


def encode_segment(segment: str) -> str:
    return segment.replace("~", "~0").replace("/", "~1")


def decode_token(token: str) -> str:
    out = []
    it = iter(range(len(token)))
    i = 0
    n = len(token)
    while i < n:
        c = token[i]
        if c == "~":
            if i + 1 >= n or token[i + 1] not in "01":
                raise JsonPointerError(
                    "invalid JSON Pointer escape: ~ must be followed by 0 or 1"
                )
            out.append("~" if token[i + 1] == "0" else "/")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def encode_pointer(segments: tuple[str, ...] | list[str]) -> str:
    """Encoded RFC 6901 string: "" for root, else "/seg1/seg2/..."."""
    if not segments:
        return ""
    return "/" + "/".join(encode_segment(s) for s in segments)


def display_root_or_path(segments: tuple[str, ...] | list[str]) -> str:
    """Root displays as ``"root"``, everything else as the encoded pointer."""
    return encode_pointer(segments) or "root"


def parse_pointer(s: str) -> tuple[str, ...]:
    if s == "":
        return ()
    if not s.startswith("/"):
        raise JsonPointerError("JSON Pointer must be empty or start with '/'")
    return tuple(decode_token(tok) for tok in s[1:].split("/"))


class JsonPointer:
    """Immutable JSON Pointer value object — full API parity with the
    reference ``JsonPointer`` (``json_pointer.rs:74-237``): construction
    from strings/bytes/segment lists, ``push``/``pop``/``parent``/
    ``truncate``/``remove``/``segment_at``, cached encoded form, root
    displayed as ``"root"``. The engine's hot paths keep using bare segment
    tuples (this class wraps the same helpers)."""

    __slots__ = ("_segments", "_encoded")

    def __init__(self, segments=()):
        self._segments = tuple(segments)
        self._encoded = encode_pointer(self._segments)

    # -- constructors (reference TryFrom impls, :246-298) -------------------
    @classmethod
    def root(cls) -> "JsonPointer":
        return cls(())

    @classmethod
    def from_string(cls, s: str) -> "JsonPointer":
        return cls(parse_pointer(s))

    @classmethod
    def from_bytes(cls, b: bytes) -> "JsonPointer":
        try:
            return cls.from_string(b.decode("utf-8"))
        except UnicodeDecodeError as e:
            raise JsonPointerError(f"invalid UTF-8 in pointer: {e}") from e

    @classmethod
    def from_segments(cls, segments) -> "JsonPointer":
        return cls(tuple(segments))

    # -- navigation ---------------------------------------------------------
    def push(self, segment: str) -> "JsonPointer":
        return JsonPointer(self._segments + (segment,))

    def pop(self) -> "JsonPointer":
        if not self._segments:
            return self
        return JsonPointer(self._segments[:-1])

    def parent(self) -> "JsonPointer":
        return self.pop()

    def truncate(self, n: int) -> "JsonPointer":
        if n >= len(self._segments):
            return self
        return JsonPointer(self._segments[:n])

    def remove(self, index: int) -> "JsonPointer":
        if index >= len(self._segments):
            return self
        segs = self._segments[:index] + self._segments[index + 1:]
        return JsonPointer(segs)

    # -- accessors ----------------------------------------------------------
    def segments(self):
        return iter(self._segments)

    def segment_at(self, index: int):
        if 0 <= index < len(self._segments):
            return self._segments[index]
        return None

    def __len__(self) -> int:
        return len(self._segments)

    def is_empty(self) -> bool:
        return not self._segments

    def is_root(self) -> bool:
        return not self._segments

    def as_str(self) -> str:
        return self._encoded

    def display_root_or_path(self) -> str:
        return self._encoded or "root"

    def as_tuple(self) -> tuple:
        return self._segments

    def __str__(self) -> str:
        return self._encoded

    def __repr__(self) -> str:  # pragma: no cover
        return f"JsonPointer({self._encoded!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, JsonPointer) and \
            self._segments == other._segments

    def __hash__(self) -> int:
        return hash(self._segments)
