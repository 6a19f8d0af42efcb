"""Text-analysis Dataset stages: language ID, quality, tokens, fingerprints.

Thin vectorized ``map_batches`` wrappers over functions/textstats.py for
the documents table shape (doc_id, text, ...).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.textstats import (
    detect_language,
    fingerprint64,
    quality_scores,
    token_counts,
)


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


def fingerprints(ds: rd.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> rd.Dataset:
    def f(batch: pd.DataFrame) -> pa.Table:
        return pa.table({
            id_col: pa.array(batch[id_col]),
            "fingerprint": pa.array(fingerprint64(batch[text_col]).astype("int64"),
                                    pa.int64()),
        })
    return ds.map_batches(f, batch_format="pandas")
