"""Fragment-only ``$ref`` resolution against a root schema.

Parity target: reference ``json_schema_rs/src/json_schema/ref_resolver.rs``:
supported forms ``#`` / ``""`` (root), ``#/$defs/<name>``,
``#/definitions/<name>`` — exactly two fragment segments, ``~0``/``~1``
decoding in the name (``:40-110``); transitive resolution with cycle detection
on the ref *strings* (``:164-182``).

``RefError.reason`` reproduces the Rust ``{:?}`` Debug rendering of
``RefResolutionError`` because the validator stores ``format!("{e:?}")`` in
``InvalidRef.reason`` (``validator/mod.rs:78``).
"""

from __future__ import annotations

from typing import Optional

from engine.schema import Schema


def _rust_str_debug(s: str) -> str:
    """Rust Debug formatting of a string (escaped, double-quoted)."""
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20:
            out.append("\\u{%x}" % ord(ch))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


class RefError(Exception):
    """A ``$ref`` could not be parsed or resolved.

    ``variant`` is the reference's ``RefResolutionError`` variant name;
    ``debug()`` renders the Rust ``{:?}`` string (field order as declared,
    ``ref_resolver.rs:13-31``).
    """

    def __init__(self, variant: str, ref_str: str, name: Optional[str] = None):
        self.variant = variant
        self.ref_str = ref_str
        self.name = name
        super().__init__(self.debug())

    def debug(self) -> str:
        fields = [f"ref_str: {_rust_str_debug(self.ref_str)}"]
        if self.name is not None:
            fields.append(f"name: {_rust_str_debug(self.name)}")
        return f"{self.variant} {{ {', '.join(fields)} }}"


def _decode_segment(seg: str, ref_str: str) -> str:
    if "~" not in seg:
        return seg
    out = []
    i, n = 0, len(seg)
    while i < n:
        c = seg[i]
        if c != "~":
            out.append(c)
            i += 1
            continue
        nxt = seg[i + 1] if i + 1 < n else None
        if nxt == "0":
            out.append("~")
        elif nxt == "1":
            out.append("/")
        else:
            raise RefError("InvalidPointerEscape", ref_str)
        i += 2
    return "".join(out)


def parse_ref(ref_str: str) -> tuple[str, Optional[str]]:
    """Returns ("root", None), ("defs", name) or ("definitions", name)."""
    if ref_str == "" or ref_str == "#":
        return ("root", None)
    if not ref_str.startswith("#"):
        raise RefError("UnsupportedRef", ref_str)
    frag = ref_str[1:]
    if frag == "":
        return ("root", None)
    if not frag.startswith("/"):
        raise RefError("UnsupportedFragment", ref_str)
    parts = frag[1:].split("/")
    container = parts[0] if parts else ""
    raw_name = parts[1] if len(parts) > 1 else ""
    if container == "" or raw_name == "" or len(parts) > 2:
        raise RefError("UnsupportedFragment", ref_str)
    name = _decode_segment(raw_name, ref_str)
    if container == "$defs":
        return ("defs", name)
    if container == "definitions":
        return ("definitions", name)
    raise RefError("UnsupportedFragment", ref_str)


def resolve_ref(root: Schema, ref_str: str) -> Schema:
    """Single-step resolution against the root schema."""
    kind, name = parse_ref(ref_str)
    if kind == "root":
        return root
    if kind == "defs":
        if root.defs is None:
            raise RefError("DefsMissing", ref_str)
        target = root.defs.get(name)
        if target is None:
            raise RefError("DefNotFound", ref_str, name)
        return target
    if root.definitions is None:
        raise RefError("DefinitionsMissing", ref_str)
    target = root.definitions.get(name)
    if target is None:
        raise RefError("DefinitionNotFound", ref_str, name)
    return target


def resolve_transitive(root: Schema, schema: Schema) -> Schema:
    """Follow ``$ref`` until the effective schema has none; cycle detection on
    the ref strings encountered (``ref_resolver.rs:164-182``)."""
    current = schema
    visited: set[str] = set()
    while current.ref is not None:
        ref_str = current.ref
        if ref_str in visited:
            raise RefError("RefCycle", ref_str)
        visited.add(ref_str)
        current = resolve_ref(root, ref_str)
    return current
