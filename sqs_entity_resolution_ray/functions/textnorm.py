"""Text normalization for matching (NOT for the byte-identical gate).

The extracted text is the frozen artifact; normalization below feeds the
matcher only (shingling/minhash). Mirrors the role of Senzing's internal
feature normalization (reference behavior: ``flow-output.jsonl:1-2``
unifies name/date/address spelling variants before matching).
"""

from __future__ import annotations

import re
import unicodedata

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_WS_RE = re.compile(r"\s+")
_DIGITS_RE = re.compile(r"\D+")


def normalize_for_match(text: str) -> str:
    """casefold + NFKC + whitespace collapse — deterministic."""
    t = unicodedata.normalize("NFKC", text).casefold()
    return _WS_RE.sub(" ", t).strip()


def tokenize(text: str) -> list[str]:
    """Word tokens (``\\w+``) of the casefolded text.

    Assumes input is already unicode-normalized (the frozen extractor
    emits NFC); ``\\w+`` over ``casefold()`` is the match tokenization.
    """
    return _TOKEN_RE.findall(text.casefold())


def normalize_phone(s: str) -> str:
    """Digits only; drop leading US country code 1 on 11-digit numbers."""
    d = _DIGITS_RE.sub("", s)
    if len(d) == 11 and d.startswith("1"):
        d = d[1:]
    return d


_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}
_DATE_NUM_RE = re.compile(r"^(\d{1,4})[/\-.](\d{1,2})[/\-.](\d{1,4})$")
_DATE_TEXT_RE = re.compile(r"^([A-Za-z]{3,9})\.?\s+(\d{1,2}),?\s+(\d{2,4})$")


def normalize_date(s: str) -> str:
    """Normalize the reference's observed date spellings to YYYY-MM-DD.

    Handles ``12/11/1978``, ``Mar 1 1970``, ``3/1/70``, ``1970-03-01``
    (the variants in the reference fixture
    ``test/fixtures/customers.jsonl`` that Senzing unifies,
    ``flow-output.jsonl:2``). Ambiguous input returns "" (no feature).
    """
    s = s.strip()
    if not s:
        return ""
    m = _DATE_NUM_RE.match(s)
    if m:
        a, b, c = (int(x) for x in m.groups())
        if a > 31:                       # YYYY-MM-DD
            y, mo, d = a, b, c
        else:                            # MM/DD/YY(YY) — US order, as in fixture
            mo, d, y = a, b, c
        if y < 100:
            y += 1900 if y >= 30 else 2000
        if 1 <= mo <= 12 and 1 <= d <= 31:
            return f"{y:04d}-{mo:02d}-{d:02d}"
        return ""
    m = _DATE_TEXT_RE.match(s)
    if m:
        mon = _MONTHS.get(m.group(1)[:3].lower())
        if mon is None:
            return ""
        d, y = int(m.group(2)), int(m.group(3))
        if y < 100:
            y += 1900 if y >= 30 else 2000
        if 1 <= d <= 31:
            return f"{y:04d}-{mon:02d}-{d:02d}"
    return ""


def normalize_name(s: str) -> str:
    """Uppercase, strip punctuation, collapse whitespace."""
    t = unicodedata.normalize("NFKC", s).upper()
    t = re.sub(r"[^\w\s]", " ", t)
    return _WS_RE.sub(" ", t).strip()
