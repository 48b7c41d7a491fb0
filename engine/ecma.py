"""ECMA 262 pattern handling: compile-time triage + Python translation.

The reference matches patterns with ``regress`` (ECMA 262) using *search*
semantics (``re.find``, not anchored) and recompiles per string instance
(``validator/mod.rs:259-277``). We compile once per plan (fixing the perf bug
without changing observable behavior) and triage each pattern at compile time:

* ``translate_ecma``: ECMA -> Python ``re`` pattern. Systematic divergences
  handled (ECMA 262 non-unicode-flag semantics, the mode ``regress`` uses
  for ``pattern``):

  - ``$`` (non-multiline) matches only at end-of-input -> ``\\Z``
  - ``\\d``/``\\D`` are ASCII ``[0-9]`` -> explicit class
  - ``\\w``/``\\W`` are ASCII ``[A-Za-z0-9_]`` -> explicit class
  - ``\\s``/``\\S`` is ECMA WhiteSpace+LineTerminator (includes U+FEFF,
    excludes Python's ``\\x1c-\\x1f``/``\\x85``) -> explicit class
  - ``\\b``/``\\B`` use the ASCII word-char set -> lookaround pairs
  - ``.`` excludes all ECMA LineTerminators (U+2028/U+2029 included) ->
    explicit negated class
  - ``(?<name>...)`` named groups -> ``(?P<name>...)``
  - ``\\cX`` control escapes -> ``\\xNN`` (``chr(X % 32)``); a ``\\c`` with
    no control letter is Annex-B literal ``\\c``
  - ``\\D``/``\\W``/``\\S`` *inside* a character class -> exact complement
    codepoint ranges (a union with a complement has no nested-negation
    form, so the complement is expanded to bare ranges)
  - Annex-B decimal escapes: ``\\N`` with N > the pattern's capture-group
    count re-parses as a LegacyOctalEscapeSequence (-> ``\\xNN`` + literal
    tail digits; ``\\8``/``\\9`` -> literal digit); inside a class digits
    are ALWAYS octal. A backref that appears before its group closes
    (forward ref / self ref) always matches empty in ECMA -> ``(?:)``.
  - A backref to a *closed* group emits as the conditional ``(?(N)\\N)``:
    ECMA matches empty when the group closed without participating (the
    other alternation branch matched) where a bare Python ``\\N`` would
    fail the match; the conditional reproduces both arms exactly.

  Remaining divergences (documented, divergence-tested):

  - backrefs to groups numbered > 99 have no Python spelling (compile
    to ``None``) — requires an absurd 100-capture-group schema pattern;
  - ECMA clears a quantified group's captures at the START of every
    iteration (RepeatMatcher, ES2023 22.2.2.3.1), so after
    ``(?:(a)|b)+`` a final ``b`` iteration leaves group 1 UNDEFINED and
    a later ``\\1`` matches empty — Python retains the capture from the
    earlier ``a`` iteration and the conditional therefore requires it.
    No Python spelling exists for per-iteration capture clearing;
    patterns that backreference an alternation-captured group INSIDE a
    quantifier keep Python semantics.
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


#: ECMA word characters (ASCII; ECMA 262 `WordCharacters` without the u flag)
_WORD = "A-Za-z0-9_"
#: ECMA WhiteSpace + LineTerminator set (what `\s` matches): TAB VT FF SP NBSP
#: ZWNBSP(U+FEFF) USP(Zs) + LF CR LS PS. Differs from Python's `\s`, which
#: adds \x1c-\x1f and \x85 and lacks ﻿.
_SPACE = ("\\t\\n\\x0b\\f\\r \\u00a0\\u1680\\u2000-\\u200a"
          "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff")
#: ECMA `.`: any character except LineTerminator (LF CR LS PS)
_DOT = "[^\\n\\r\\u2028\\u2029]"
#: `\b` / `\B` with the ASCII word-char set, via lookaround pairs
_WORD_BOUNDARY = (f"(?:(?<![{_WORD}])(?=[{_WORD}])"
                  f"|(?<=[{_WORD}])(?![{_WORD}]))")
_NON_WORD_BOUNDARY = (f"(?:(?<=[{_WORD}])(?=[{_WORD}])"
                      f"|(?<![{_WORD}])(?![{_WORD}]))")

#: the three ECMA sets as sorted (lo, hi) codepoint intervals — the basis
#: for exact complement ranges inside character classes
_DIGIT_IV = [(0x30, 0x39)]
_WORD_IV = [(0x30, 0x39), (0x41, 0x5A), (0x5F, 0x5F), (0x61, 0x7A)]
_SPACE_IV = [(0x09, 0x0D), (0x20, 0x20), (0xA0, 0xA0), (0x1680, 0x1680),
             (0x2000, 0x200A), (0x2028, 0x2029), (0x202F, 0x202F),
             (0x205F, 0x205F), (0x3000, 0x3000), (0xFEFF, 0xFEFF)]


def _esc_cp(cp: int) -> str:
    if cp <= 0xFF:
        return f"\\x{cp:02x}"
    if cp <= 0xFFFF:
        return f"\\u{cp:04x}"
    return f"\\U{cp:08x}"


def _complement_fragment(intervals) -> str:
    """Class fragment (bare ranges) matching every codepoint NOT in the
    intervals — how ``\\D``/``\\W``/``\\S`` become exact inside a class,
    where a complement cannot be expressed as a nested negation."""
    parts = []
    prev = 0
    for lo, hi in intervals:
        if lo > prev:
            parts.append((prev, lo - 1))
        prev = hi + 1
    if prev <= 0x10FFFF:
        parts.append((prev, 0x10FFFF))
    return "".join(_esc_cp(lo) if lo == hi else f"{_esc_cp(lo)}-{_esc_cp(hi)}"
                   for lo, hi in parts)


_CLASS_EXPANSIONS = {  # inside [...]: bare ranges, no brackets
    "d": "0-9", "D": _complement_fragment(_DIGIT_IV),
    "w": _WORD, "W": _complement_fragment(_WORD_IV),
    "s": _SPACE, "S": _complement_fragment(_SPACE_IV),
}
_TOP_EXPANSIONS = {
    "d": "[0-9]", "D": "[^0-9]",
    "w": f"[{_WORD}]", "W": f"[^{_WORD}]",
    "s": f"[{_SPACE}]", "S": f"[^{_SPACE}]",
    "b": _WORD_BOUNDARY, "B": _NON_WORD_BOUNDARY,
}

_OCTAL = "01234567"


def _legacy_octal(digits: str) -> tuple[int, int]:
    """(codepoint, digits consumed) of an Annex-B LegacyOctalEscapeSequence
    prefix of ``digits``; (-1, 0) when the first digit is 8/9 (identity
    escape -> literal digit). First digit 0-3: up to three octal digits;
    4-7: up to two — so the value never exceeds 0o377."""
    if digits[0] not in _OCTAL:
        return -1, 0
    limit = 3 if digits[0] in "0123" else 2
    n = 1
    while n < limit and n < len(digits) and digits[n] in _OCTAL:
        n += 1
    return int(digits[:n], 8), n


def _scan_groups(pattern: str):
    """(capture count, close position by group number). Group numbering
    counts named groups, matching both ECMA and Python ``re``."""
    closes: dict[int, int] = {}
    stack: list[int] = []
    g = 0
    i, n, in_class = 0, len(pattern), False
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            named = (pattern.startswith("(?<", i)
                     and i + 3 < n and pattern[i + 3] not in "=!")
            if named or not pattern.startswith("(?", i):
                g += 1
                stack.append(g)
            else:
                stack.append(0)
        elif c == ")" and stack:
            gn = stack.pop()
            if gn:
                closes[gn] = i
        i += 1
    return g, closes


def translate_ecma(pattern: str) -> str:
    """Rewrite an ECMA pattern for Python ``re`` (see module docstring for
    the divergence list). Output is a Python pattern with identical match
    semantics for the supported ECMA subset."""
    groups, closes = _scan_groups(pattern)
    out = []
    in_class = False
    cls_prev_atom = False   # last class item was an atom able to open a range
    cls_range_open = False  # a bare range-operator '-' was just emitted

    def _cls_atom(times: int = 1):
        # advance the class range-state machine past emitted atom(s) —
        # used to decide whether a later '-' is a range operator (bare)
        # or a literal/range-end (escaped, see the '-' branch below)
        nonlocal cls_prev_atom, cls_range_open
        for _ in range(times):
            if cls_range_open:
                cls_range_open = False
                cls_prev_atom = False
            else:
                cls_prev_atom = True

    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            esc = pattern[i + 1]
            if esc in "123456789":
                j = i + 1
                while j < n and pattern[j].isdigit():
                    j += 1
                digits = pattern[i + 1:j]
                if not in_class and int(digits) <= groups:
                    N = int(digits)
                    if N > 99:  # no Python spelling for 3-digit backrefs
                        raise re.error(
                            f"backreference \\{N} not translatable")
                    close = closes.get(N)
                    if close is not None and i > close:
                        # conditional backref: ECMA matches EMPTY when the
                        # group closed without participating (e.g. the
                        # other alternation branch matched) where a bare
                        # Python \N would fail the match. (?(N)\N) is
                        # exact: participated -> must match the capture,
                        # else -> empty. The wrapper also keeps a
                        # following literal digit from merging into a
                        # larger backref number.
                        out.append(f"(?({N})\\{digits})")
                    else:
                        # forward/self reference: the group cannot have
                        # captured yet -> ECMA matches empty
                        out.append("(?:)")
                    i = j
                    continue
                # Annex B: re-parse as LegacyOctalEscapeSequence; leftover
                # digits fall through the loop as literals. \8 \9 are
                # identity escapes (the bare digit).
                val, used = _legacy_octal(digits)
                if used == 0:
                    out.append(digits[0])
                    i += 2
                else:
                    out.append(_esc_cp(val))
                    i += 1 + used
                if in_class:
                    _cls_atom()
                continue
            if esc == "c":
                # ECMA \cX control escape (X a letter; Annex B also allows
                # digits and _ inside classes): chr(X % 32). Python re has
                # no \c, so emit the control char as \xNN. A \c with no
                # following control letter is, per Annex B, a LITERAL
                # backslash followed by 'c'.
                nxt = pattern[i + 2] if i + 2 < n else ""
                is_ctl = nxt.isascii() and (
                    nxt.isalpha() or (in_class and (nxt.isdigit()
                                                    or nxt == "_")))
                if is_ctl:
                    out.append(f"\\x{ord(nxt) % 32:02x}")
                    if in_class:
                        _cls_atom()
                    i += 3
                else:
                    out.append("\\\\c")
                    if in_class:
                        _cls_atom(2)  # literal backslash + 'c' = two atoms
                    i += 2
                continue
            if in_class:
                # \d \w \s -> bare ranges; \D \W \S -> exact complement
                # ranges (see _complement_fragment). Other escapes pass
                # through unchanged.
                out.append(_CLASS_EXPANSIONS.get(esc) or pattern[i:i + 2])
                _cls_atom()
            else:
                out.append(_TOP_EXPANSIONS.get(esc) or pattern[i:i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
                out.append(c)
            elif c == "[":
                # ECMA allows a literal "[" inside a class; Python's re
                # warns "Possible nested set" on "[[" (a future hard
                # error) — emit it escaped. Same match semantics.
                out.append("\\[")
                _cls_atom()
            elif c == "-":
                # Python's re warns (future hard error) on '--', and the
                # warn-free spellings are exact: a range-END '-' and a
                # LITERAL '-' both escape to '\-' (same parse), while a
                # range OPERATOR '-' stays bare. The state machine
                # mirrors sre's rule: an atom followed by '-' whose next
                # char isn't ']' opens a range.
                nxt = pattern[i + 1] if i + 1 < n else ""
                if cls_range_open:
                    out.append("\\-")  # the END atom of an open range
                    cls_range_open = False
                    cls_prev_atom = False
                elif cls_prev_atom and nxt and nxt != "]":
                    out.append("-")    # range operator
                    cls_range_open = True
                    cls_prev_atom = False
                else:
                    out.append("\\-")  # literal (can still open a range)
                    cls_prev_atom = True
            elif c in "|&~":
                # always-literal in a class for both engines; escaping
                # kills the '||' / '&&' / '~~' future-set-op warnings
                out.append("\\" + c)
                _cls_atom()
            elif c == "^" and out and out[-1] == "[":
                out.append(c)  # negation marker, not an atom
            else:
                out.append(c)
                _cls_atom()
        elif c == "[":
            in_class = True
            cls_prev_atom = False
            cls_range_open = False
            out.append(c)
        elif c == "$":
            out.append(r"\Z")
        elif c == ".":
            out.append(_DOT)
        elif c == "(" and pattern.startswith("(?<", i) \
                and i + 3 < n and pattern[i + 3] not in "=!":
            out.append("(?P<")
            i += 3
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


@lru_cache(maxsize=4096)
def compile_ecma(pattern: str) -> Optional[re.Pattern]:
    """Compile an ECMA pattern for search semantics; None when invalid.

    Warnings are recorded and re-emitted only when the compile SUCCEEDS:
    a pattern this function rejects (returns None, a data-level error
    upstream) must not spam FutureWarnings from the failed parse — the
    translator already emits warn-free spellings for every construct a
    VALID pattern can contain (see the class range-state machine)."""
    import warnings
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            rx = re.compile(translate_ecma(pattern))
    except re.error:
        return None
    for w in caught:  # pragma: no cover - valid patterns compile clean
        warnings.warn_explicit(w.message, w.category, w.filename, w.lineno)
    return rx


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
