"""Frozen, pure HTML→text extractor (trafilatura-*style*, stdlib-only).

The north rule's per-row invariant is "byte-identical extracted text per
url", so the extractor is implemented in-repo with no third-party parser
(no library-version drift) and pinned by golden tests. The reference's
analogue is Senzing's internal feature normalization, observable only in
output ``FEAT_DESC_VALUES`` (reference ``test/fixtures/flow-output.jsonl:1-2``
unifies ``Mar 1 1970`` ≡ ``3/1/1970``).

Contract (version 2 — bump ``EXTRACTOR_VERSION`` if ANY behavior changes):

1. Decode bytes as UTF-8 (``errors="replace"``).
2. Drop ``<!-- -->`` comments, ``<script>``/``<style>``/``<noscript>``/
   ``<template>`` elements, the entire ``<head>``, and the boilerplate
   containers ``<nav>``/``<footer>``/``<header>``/``<aside>`` (main-
   content extraction: site chrome otherwise dominates the shingle sets
   of short pages and near-dups them across unrelated sites).
3. Block-level tags (p, div, br, li, tr, h1-h6, …) become newlines;
   all other tags are deleted.
4. HTML entities are unescaped (``&amp;`` → ``&``).
5. Unicode NFC normalization.
6. Within each line, runs of whitespace collapse to a single space and
   the line is stripped; empty lines are dropped.
7. Lines are joined with ``"\n"``. No trailing newline.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

EXTRACTOR_VERSION = 2

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_DROP_ELEMENT_RE = re.compile(
    r"<(script|style|noscript|template|nav|footer|header|aside)\b[^>]*>"
    r".*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.DOTALL | re.IGNORECASE)
# tags that imply a line break when they open or close
_BLOCK_TAGS = (
    "p|div|br|hr|li|ul|ol|tr|td|th|table|thead|tbody|blockquote|pre|"
    "h1|h2|h3|h4|h5|h6|section|article|header|footer|nav|aside|form|"
    "figure|figcaption|dl|dt|dd|address|main|title"
)
_BLOCK_TAG_RE = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_LINE_WS_RE = re.compile(r"[ \t\r\f\v ]+")


def extract_text(html: bytes | str | None) -> str:
    """Extract plain text from one HTML document. Pure and frozen.
    ``None`` (a null page body) extracts to the empty string."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _COMMENT_RE.sub(" ", s)
    s = _DROP_ELEMENT_RE.sub(" ", s)
    s = _HEAD_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _ANY_TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = unicodedata.normalize("NFC", s)
    # one global collapse pass, then per-line C-level strip: the ws class
    # contains no \n, so sub() commutes with split("\n") — byte-identical
    # to the v2 per-line sub loop (pinned by test_extraction goldens) at
    # a fraction of the regex-invocation cost (~200 calls/doc → 1)
    s = _LINE_WS_RE.sub(" ", s)
    return "\n".join(
        t for line in s.split("\n") if (t := line.strip())
    )


def extract_title(html: bytes | str | None) -> str:
    """Extract the <title> text (normalized like extract_text lines)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    m = re.search(r"<title\b[^>]*>(.*?)</title\s*>", s, re.DOTALL | re.IGNORECASE)
    if not m:
        return ""
    t = _html.unescape(_ANY_TAG_RE.sub(" ", m.group(1)))
    t = unicodedata.normalize("NFC", t)
    return _LINE_WS_RE.sub(" ", t.replace("\n", " ")).strip()
