"""Text-analysis Dataset stages: language ID, quality, tokens,
fingerprints, repetition scoring.

Thin vectorized ``map_batches`` wrappers over functions/textstats.py for
the documents table shape (doc_id, text, ...).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.textstats import (
    detect_language,
    fingerprint64,
    quality_scores,
    token_counts,
)

# ASCII whitespace class (engine parity with the RE2 '\s+' oracles,
# which excludes \v — see stages/curation.py _WS_RE)
_WS_RE = re.compile(r"[^ \t\n\r\f]+")


def language_id(ds: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    def f(batch: pd.DataFrame) -> pa.Table:
        return pa.table({
            id_col: pa.array(batch[id_col]),
            "lang_pred": pa.array(detect_language(batch[text_col]), pa.string()),
        })
    return ds.map_batches(f, batch_format="pandas")


def token_count(ds: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id", mode: str = "whitespace") -> rd.Dataset:
    def f(batch: pd.DataFrame) -> pa.Table:
        return pa.table({
            id_col: pa.array(batch[id_col]),
            "n_tokens": pa.array(token_counts(batch[text_col], mode=mode),
                                 pa.int64()),
        })
    return ds.map_batches(f, batch_format="pandas")


def quality(ds: rd.Dataset, text_col: str = "text",
            id_col: str = "doc_id") -> rd.Dataset:
    def f(batch: pd.DataFrame) -> pa.Table:
        q = quality_scores(batch[text_col])
        cols = {id_col: pa.array(batch[id_col])}
        for c in q.columns:
            cols[c] = pa.array(q[c])
        return pa.table(cols)
    return ds.map_batches(f, batch_format="pandas")


def repetition(ds: rd.Dataset, text_col: str = "text",
               id_col: str = "doc_id") -> rd.Dataset:
    """Gopher-style within-document repetition quality signals:

    - ``top_token_frac``: count of the most frequent token / total
      tokens (1.0 = the document is one token repeated);
    - ``dup_2gram_frac``: 1 − distinct-bigram / total-bigram count
      (high = the text loops over the same phrases).

    Boilerplate, SEO spam and generation loops score high on both; a
    curation pipeline gates on them before training. Embarrassingly
    parallel (no shuffle); all arithmetic is exact float64 division of
    integer counts, so the DuckDB oracle matches bit-for-bit. Docs with
    no tokens score 0.0 on both (<2 tokens ⇒ dup_2gram_frac 0.0)."""

    def f(batch: pd.DataFrame) -> pa.Table:
        batch = batch.reset_index(drop=True)
        nb = len(batch)
        toks = batch[text_col].fillna("").str.findall(_WS_RE)
        counts = toks.str.len().to_numpy(dtype=np.int64)
        ex = toks.explode().dropna()
        row = ex.index.to_numpy(dtype=np.int64)
        flat = ex.to_numpy(dtype=object)

        top = np.zeros(nb, dtype=np.float64)
        if len(flat):
            vc = pd.DataFrame({"row": row, "tok": flat}).groupby(
                ["row", "tok"], sort=False).size()
            mx = vc.groupby(level=0).max()
            top[mx.index.to_numpy()] = mx.to_numpy()
        top_frac = np.where(counts > 0,
                            top / np.maximum(counts, 1), 0.0)

        dup_frac = np.zeros(nb, dtype=np.float64)
        if len(flat) > 1:
            same = row[:-1] == row[1:]
            bg = pd.DataFrame({"row": row[:-1][same],
                               "x": flat[:-1][same], "y": flat[1:][same]})
            total_bg = np.bincount(bg["row"], minlength=nb)
            dist = bg.drop_duplicates().groupby("row", sort=False).size()
            dist_arr = np.zeros(nb, dtype=np.float64)
            dist_arr[dist.index.to_numpy()] = dist.to_numpy()
            dup_frac = np.where(
                total_bg > 0,
                1.0 - dist_arr / np.maximum(total_bg, 1), 0.0)

        return pa.table({
            id_col: pa.array(batch[id_col]),
            "top_token_frac": pa.array(top_frac, pa.float64()),
            "dup_2gram_frac": pa.array(dup_frac, pa.float64()),
        })

    return ds.map_batches(f, batch_format="pandas")


def fingerprints(ds: rd.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> rd.Dataset:
    def f(batch: pd.DataFrame) -> pa.Table:
        return pa.table({
            id_col: pa.array(batch[id_col]),
            "fingerprint": pa.array(fingerprint64(batch[text_col]).astype("int64"),
                                    pa.int64()),
        })
    return ds.map_batches(f, batch_format="pandas")
