"""Housenumber parsing with exact C semantics (InterpolationWriter.hpp).

The interpolation validator's error ladder depends on ``atoi`` prefix parsing
(InterpolationWriter.hpp:81,88), the ``len == floor(log10(n))+1`` format check
(:132-133) that rejects "123%&" and leading zeros, and the alphabetic
housenumber split (:93-118).
"""

from __future__ import annotations

import math


def atoi(s: str) -> int:
    """C ``atoi``: optional whitespace, optional sign, leading digits, else 0."""
    i, n = 0, len(s)
    while i < n and s[i] in " \t\n\r\v\f":
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        if s[i] == "-":
            sign = -1
        i += 1
    j = i
    while j < n and s[j].isdigit():
        j += 1
    if j == i:
        return 0
    return sign * int(s[i:j])


def is_plain_number(raw: str, value: int) -> bool:
    """InterpolationWriter.hpp:132-133 — ``len(raw) == floor(log10(value))+1``.

    Rejects trailing garbage and leading zeros. ``value`` must be > 0 (the
    ladder checks ``first == 0`` separately first; log10(0) in C returns -inf
    and the comparison is false, which this mirrors by returning False).
    """
    if value <= 0:
        return False
    return len(raw) == math.floor(math.log10(value)) + 1


def _c_isalpha(c: str) -> bool:
    """C ``isalpha`` (ASCII, "C" locale) — NOT Python's Unicode-aware isalpha."""
    return ("a" <= c <= "z") or ("A" <= c <= "Z")


def _char_at_c(s: str, idx: int) -> str:
    """``std::string::operator[]`` guard: out-of-range reads yield ``'\\0'``.

    The reference indexes ``raw[len-2]`` without a guard
    (InterpolationWriter.hpp:95-96); for len<2 that is UB in C++ — we resolve
    it to the null character (non-alphabetic), the benign reading.
    """
    if 0 <= idx < len(s):
        return s[idx]
    return "\0"


def alphabetic_parts(first_raw: str, last_raw: str):
    """InterpolationWriter.hpp:93-118 — classify an ``alphabetic`` endpoint pair.

    Returns (status, first, last, first_numeric) where status is one of:
    - ``"ok"``: both endpoints are <digits><single trailing letter> with equal
      numeric parts; first/last are the ord() of the trailing letters.
    - ``"numeric parts of housenumbers not identical"``
    - ``"no alphabetic part in addr:housenumber"``
    - ``"skip"``: the second-last character of either raw IS alphabetic — the
      reference skips the whole alphabetic branch and sets no error.
    """
    if _c_isalpha(_char_at_c(first_raw, len(first_raw) - 2)) or _c_isalpha(
        _char_at_c(last_raw, len(last_raw) - 2)
    ):
        return "skip", None, None, None
    if _c_isalpha(_char_at_c(first_raw, len(first_raw) - 1)) and _c_isalpha(
        _char_at_c(last_raw, len(last_raw) - 1)
    ):
        first_numeric = first_raw[:-1]
        last_numeric = last_raw[:-1]
        if first_numeric == last_numeric:
            return "ok", ord(first_raw[-1]), ord(last_raw[-1]), first_numeric
        return "numeric parts of housenumbers not identical", None, None, None
    return "no alphabetic part in addr:housenumber", None, None, None
