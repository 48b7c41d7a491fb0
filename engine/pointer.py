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
