"""Text-analysis kernels for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprints.
All operate on pandas Series / numpy arrays for vectorized use inside
``map_batches``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .hashing import hash_str_array, hash_u64_pairs

# Small, fixed stopword inventories (top function words per language).
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "on", "with", "as", "are", "be", "this", "at", "by", "not"},
    "es": {"el", "la", "de", "que", "y", "a", "en", "un", "ser", "se",
           "no", "haber", "por", "con", "su", "para", "como", "estar",
           "tener", "le", "los", "las", "una", "es"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht",
           "ein", "eine", "als"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "dans", "qui", "pour", "pas", "sur", "au", "il",
           "ne"},
}

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# ASCII whitespace class, not \S+: the DuckDB oracles tokenize with RE2,
# whose \s is exactly [\t\n\f\r ] — Python's Unicode \S would split on
# \v / NBSP etc. where RE2 does not (see stages/curation.py _WS_RE).
_WS_TOKEN_RE = re.compile(r"[^ \t\n\r\f]+")
# BPE-ish pre-tokenizer: words, numbers, punctuation runs (GPT-2-style
# coarse approximation, public pattern family)
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_SENT_END_RE = re.compile(r"[.!?]")


def detect_language(texts: pd.Series) -> pd.Series:
    """Best-guess ISO 639-1 code per text: CJK scripts by unicode range,
    European languages by stopword-hit ratios.

    Returns "und" (undetermined) when nothing scores.
    """
    langs = list(STOPWORDS)
    out = []
    for t in texts.fillna(""):
        sample = t[:4000]
        if sample:
            cjk = sum(1 for c in sample[:500]
                      if "\u4e00" <= c <= "\u9fff" or
                      "\u3040" <= c <= "\u30ff" or
                      "\uac00" <= c <= "\ud7af")
            if cjk > len(sample[:500]) * 0.2:
                # distinguish: kana → ja, hangul → ko, else zh
                kana = sum(1 for c in sample[:500] if "\u3040" <= c <= "\u30ff")
                hangul = sum(1 for c in sample[:500] if "\uac00" <= c <= "\ud7af")
                out.append("ja" if kana > cjk * 0.2
                           else ("ko" if hangul > cjk * 0.5 else "zh"))
                continue
        words = _WORD_RE.findall(sample.lower())
        if not words:
            out.append("und")
            continue
        best_lang, best = "und", 0
        for lang in langs:
            sw = STOPWORDS[lang]
            hits = sum(1 for w in words if w in sw)
            if hits > best:
                best_lang, best = lang, hits
        out.append(best_lang if best > 0 else "und")
    return pd.Series(out, index=texts.index, dtype="object")


def token_counts(texts: pd.Series, mode: str = "whitespace") -> np.ndarray:
    """Token count per text: ``whitespace`` (\\S+ runs) or ``bpe`` (regex
    pre-tokenizer approximating subword segmentation)."""
    rex = _WS_TOKEN_RE if mode == "whitespace" else _BPE_RE
    return np.fromiter(
        (len(rex.findall(t)) if t else 0 for t in texts.fillna("")),
        dtype=np.int64,
        count=len(texts),
    )


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic document-quality features.

    Columns: n_chars, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio (en), digit_ratio, sentence_count, quality (0..1
    composite — higher is better prose).
    """
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_tokens = np.zeros(n, dtype=np.int64)
    mean_tok = np.zeros(n, dtype=np.float64)
    punct = np.zeros(n, dtype=np.float64)
    stopr = np.zeros(n, dtype=np.float64)
    digr = np.zeros(n, dtype=np.float64)
    sents = np.zeros(n, dtype=np.int64)
    en_stop = STOPWORDS["en"]
    for i, t in enumerate(texts.fillna("")):
        n_chars[i] = len(t)
        toks = _WS_TOKEN_RE.findall(t)
        n_tokens[i] = len(toks)
        if toks:
            mean_tok[i] = sum(len(w) for w in toks) / len(toks)
            words = [w.lower().strip(".,;:!?\"'()") for w in toks]
            stopr[i] = sum(1 for w in words if w in en_stop) / len(words)
        if t:
            punct[i] = len(_PUNCT_RE.findall(t)) / len(t)
            digr[i] = sum(c.isdigit() for c in t) / len(t)
        sents[i] = len(_SENT_END_RE.findall(t))
    # composite: prose-like docs have stopwords, moderate token length,
    # low punctuation/digit density, and at least one sentence.
    quality = (
        np.clip(stopr / 0.4, 0, 1) * 0.4
        + np.clip(1.0 - np.abs(mean_tok - 5.0) / 5.0, 0, 1) * 0.2
        + np.clip(1.0 - punct / 0.2, 0, 1) * 0.2
        + np.clip(1.0 - digr / 0.2, 0, 1) * 0.1
        + (sents > 0).astype(np.float64) * 0.1
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": mean_tok,
            "punct_ratio": punct,
            "stopword_ratio": stopr,
            "digit_ratio": digr,
            "sentence_count": sents,
            "quality": quality,
        },
        index=texts.index,
    )


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """64-bit rolling-hash fingerprint of each full text (exact-dup key).

    Built from the SipHash of the text plus a second salted pass combined
    with a mixing step — collision probability ~2^-64 per pair, stable
    across runs.
    """
    h1 = hash_str_array(texts.fillna("").tolist(), salt="fp1")
    h2 = hash_str_array(texts.fillna("").tolist(), salt="fp2")
    return hash_u64_pairs(h1, h2)
