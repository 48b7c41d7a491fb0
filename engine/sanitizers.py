"""Identifier / path sanitization for emitted artifact names.

Parity target: reference ``json_schema_rs/src/sanitizers.rs`` (C9 in
SURVEY.md §2.3) — the engine uses these for output dataset column names,
artifact file names, and enum-variant labels in compiled-plan summaries.
The word-splitting mirrors heck's rules (boundary at separators,
lower->upper transitions, and acronym ends like ``HTTPResponse`` ->
``http response``); non-ASCII chars are replaced with ``_`` first.
"""

from __future__ import annotations

import os
import re

PY_ESQUE_KEYWORDS = {
    # the reference escapes Rust field keywords with a trailing underscore;
    # we keep the identical list so outputs match (sanitizers.rs:22-28)
    "as", "async", "await", "break", "const", "continue", "crate", "dyn",
    "else", "enum", "extern", "false", "fn", "for", "if", "impl", "in",
    "let", "loop", "match", "mod", "move", "mut", "pub", "ref", "return",
    "self", "static", "struct", "super", "trait", "true", "type", "unsafe",
    "use", "where", "while", "abstract", "become", "box", "do", "final",
    "gen", "macro", "override", "priv", "try", "typeof", "unsized",
    "virtual", "yield",
}


def _replace_non_ascii(s: str) -> str:
    return "".join(c if c.isascii() else "_" for c in s)


def _split_words(s: str) -> list[str]:
    """heck-style word split: EVERY non-alphanumeric char is a separator
    (heck drops punctuation — ``":a"`` pascal-cases to ``"A"``), plus
    boundaries at lower/digit->upper and before the last upper of an
    acronym run."""
    parts = re.split(r"[^A-Za-z0-9]+", s)
    words: list[str] = []
    for part in parts:
        if not part:
            continue
        buf = ""
        for i, c in enumerate(part):
            if buf:
                prev = buf[-1]
                nxt = part[i + 1] if i + 1 < len(part) else ""
                boundary = (
                    (prev.islower() or prev.isdigit()) and c.isupper()
                ) or (prev.isupper() and c.isupper() and nxt.islower())
                if boundary:
                    words.append(buf)
                    buf = ""
            buf += c
        if buf:
            words.append(buf)
    return words


def to_snake_case(s: str) -> str:
    return "_".join(w.lower() for w in _split_words(s))


def to_pascal_case(name: str) -> str:
    """``address`` -> ``Address``; empty -> ``Unnamed``; leading digit ->
    ``N``-prefixed (sanitizers.rs:78-96)."""
    name = _replace_non_ascii(name)
    if not name:
        return "Unnamed"
    words = _split_words(name)
    pascal = "".join(w[:1].upper() + w[1:].lower() if not w.isupper()
                     else w[:1].upper() + w[1:].lower() for w in words)
    if not pascal:
        return "Unnamed"
    if pascal[0].isdigit():
        return f"N{pascal}"
    return pascal


def sanitize_field_name(key: str) -> str:
    """JSON property key -> snake_case identifier (sanitizers.rs:42-75):
    ``-`` -> ``_``; empty -> ``empty``; leading digit -> ``field_`` prefix;
    bare ``_`` -> ``empty``; keywords get a trailing ``_``."""
    key = _replace_non_ascii(key)
    s = key.replace("-", "_")
    if not s:
        return "empty"
    if s[0].isdigit():
        return f"field_{s}"
    s = "".join(c if (c == "_" or c.isascii() and c.isalnum()) else "_"
                for c in s)
    if s == "_":
        return "empty"
    s = to_snake_case(s)
    if s in PY_ESQUE_KEYWORDS:
        return f"{s}_"
    return s


def _normalize_enum_value(s: str) -> str:
    """sanitizers.rs:97-119: invalid chars -> ``_`` (collapsed), word
    separators ``_ - <space>`` preserved for pascal-casing, trimmed."""
    s = _replace_non_ascii(s)
    out = []
    prev_underscore = False
    for c in s:
        keep = c.isascii() and (c.isalnum() or c in "- ")
        if c == "_" or not keep:
            if not prev_underscore:
                out.append("_")
                prev_underscore = True
        else:
            out.append(c)
            prev_underscore = False
    return "".join(out).strip("_")


def enum_variant_name_from_value(s: str) -> str:
    """Enum value -> PascalCase variant; digit-leading / ``Self`` / empty
    get an ``E`` prefix (sanitizers.rs:120-157)."""
    normalized = _normalize_enum_value(s)
    if not normalized:
        return "EUnnamed"
    pascal = to_pascal_case(normalized)
    if normalized[0].isdigit():
        suffix = pascal[1:] if pascal.startswith("N") else pascal
        return f"E{suffix}"
    if pascal[0].isdigit():
        return f"E{pascal}"
    if pascal == "Self":
        return "ESelf"
    if any(not (c.isascii() and (c.isalnum() or c == "_")) for c in pascal):
        return f"E{pascal}"
    return pascal


def enum_variant_names_with_collision_resolution(
        values: list[str]) -> list[tuple[str, str]]:
    """(value, variant) pairs; colliding bases get 0,1,2 suffixes in input
    order (sanitizers.rs:159-189)."""
    bases = [(v, enum_variant_name_from_value(v)) for v in values]
    by_base: dict[str, list[str]] = {}
    for value, base in bases:
        by_base.setdefault(base, []).append(value)
    out = []
    for value, base in bases:
        group = by_base[base]
        if len(group) == 1:
            out.append((value, base))
        else:
            out.append((value, f"{base}{group.index(value)}"))
    return out


def sanitize_struct_name(s: str) -> str:
    pascal = to_pascal_case(s)
    if pascal and pascal[0].isdigit():
        pascal = f"N{pascal}"
    if pascal == "Self":
        return f"{pascal}_"
    return pascal


def sanitize_path_component(component: str) -> str:
    """File/dir name -> identifier-safe component (sanitizers.rs:209-231)."""
    component = _replace_non_ascii(component)
    s = "".join(c if (c == "-" or c == "_" or c.isalnum()) else "_"
                for c in component).replace("-", "_")
    if not s:
        return "schema"
    if s[0].isdigit():
        return f"_{s}"
    return s


def sanitize_module_name(s: str) -> str:
    """snake-ish module name (sanitizers.rs:252-276)."""
    s = _replace_non_ascii(s)
    s = "".join("_" if c in "-. " else c for c in s)
    s = "".join(c for c in s if c == "_" or c.isalnum())
    if not s:
        return "schema"
    if s[0].isdigit():
        return f"schema_{s}"
    if s in ("crate", "self", "super"):
        return f"{s}_mod"
    return s


def module_name_from_path(path: str) -> str:
    stem = os.path.splitext(os.path.basename(path))[0] or "schema"
    return sanitize_module_name(stem)


def struct_name_from(title, from_key, *, is_root: bool = False,
                     name_source: str = "title-first") -> str:
    """Model name per CodeGenSettings.model_name_source
    (``rust_backend.rs:611-637``): title-first prefers a non-blank trimmed
    ``title``, property-key prefers the property key; fallback is the other
    source, then ``"Root"`` for the root schema / ``"Unnamed"`` otherwise."""
    title_trimmed = title.strip() if title is not None and title.strip() \
        else None
    first, second = ((title_trimmed, from_key)
                     if name_source == "title-first"
                     else (from_key, title_trimmed))
    pick = first if first is not None else second
    if pick is not None:
        return sanitize_struct_name(pick)
    return "Root" if is_root else "Unnamed"
