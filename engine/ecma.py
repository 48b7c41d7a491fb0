"""ECMA 262 pattern handling: compile-time triage + Python translation.

The reference matches patterns with ``regress`` (ECMA 262) using *search*
semantics (``re.find``, not anchored) and recompiles per string instance
(``validator/mod.rs:259-277``). We compile once per plan (fixing the perf bug
without changing observable behavior) and triage each pattern at compile time:

* ``translate_ecma``: ECMA -> Python ``re`` pattern. The one systematic
  divergence handled: ECMA ``$`` (non-multiline) matches only at end-of-input,
  while Python ``$`` also matches before a trailing newline — so unescaped
  ``$`` outside character classes becomes ``\\Z``. Remaining known corners
  (ECMA ``\\d``/``\\w`` are ASCII-only, Python's are Unicode-aware) are
  documented in DESIGN.md; fixture patterns avoid them.
* ``re2_safe``: conservative whitelist for zero-copy evaluation with
  ``pyarrow.compute.match_substring_regex`` (RE2). Patterns outside the
  whitelist use the compiled Python regex in a per-batch kernel instead.

Invalid patterns compile to ``None`` -> the plan emits a constant per-row
``InvalidPatternInSchema`` for string instances (``validator/mod.rs:270-275``).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Optional

_SAFE_ESCAPES = set(".\\+*?()[]{}|^$/-tnr0fvu")  # escaped literals / anchors


def translate_ecma(pattern: str) -> str:
    """Rewrite an ECMA pattern for Python ``re``: unescaped ``$`` outside a
    character class -> ``\\Z`` (ECMA end-of-input semantics)."""
    out = []
    in_class = False
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
        elif c == "[":
            in_class = True
            out.append(c)
        elif c == "$":
            out.append(r"\Z")
        else:
            out.append(c)
        i += 1
    return "".join(out)


@lru_cache(maxsize=4096)
def compile_ecma(pattern: str) -> Optional[re.Pattern]:
    """Compile an ECMA pattern for search semantics; None when invalid."""
    try:
        return re.compile(translate_ecma(pattern))
    except re.error:
        return None


def re2_safe(pattern: str) -> bool:
    """True when ``pattern`` evaluates identically under RE2 partial match
    (``pc.match_substring_regex``) and under the translated Python regex.

    Conservative: ASCII-only, no perl classes (``\\d\\w\\s\\b``, whose ASCII vs
    Unicode semantics differ between engines), no lookaround/backrefs, ``$``
    only as the final character (RE2 ``$`` = end-of-text, same as ECMA).
    """
    if not pattern.isascii():
        return False
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n or pattern[i + 1] not in _SAFE_ESCAPES:
                return False
            if pattern[i + 1] == "u":  # \uXXXX escapes differ; bail out
                return False
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "$":
            if i != n - 1:
                return False
        elif c == "(":
            if pattern.startswith(("(?=", "(?!", "(?<", "(?P", "(?#"), i):
                return False
        i += 1
    return not in_class
