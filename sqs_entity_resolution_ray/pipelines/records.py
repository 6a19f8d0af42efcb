"""Record-model ER: the reference's own domain (flat person/org records).

The pages pipeline (resolve.py) covers the north rule's web-page corpus;
this pipeline covers the reference's native record shape — flat
string-keyed records in the Senzing Generic Entity Specification
(``test/fixtures/customers.jsonl``: DATA_SOURCE, RECORD_ID,
PRIMARY_NAME_*, DATE_OF_BIRTH, ADDR_*, PHONE_NUMBER, EMAIL_ADDRESS,
SSN_NUMBER, …; required keys enforced at ``consumer.py:188,201-204``).

Pipeline: feature extraction (map_batches) → blocking-key flat emission
(exact identifiers + name/dob keys) → per-block pair enumeration → pair
dedup → feature join → evidence-weighted scoring with MATCH_KEY
explanation (the ``+NAME+DOB+PHONE`` strings of ``flow-output.jsonl:1``)
→ connected components → entity clusters.

Observable Senzing behaviors reproduced (from the golden fixture, not
its implementation): date variants unify (``Mar 1 1970`` ≡ ``3/1/1970``,
flow-output.jsonl:2), day/month-transposed DOBs still corroborate
(records 1001 vs 1002: 12/11/1978 vs 11/12/1978 resolve with
``+NAME+DOB+PHONE``), address suffix variants unify (``1515 Adela Ln`` ≡
``1515 Adela Lane``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import PipelineConfig, effective_concurrency, effective_partitions
from ..functions.strsim import jaro_winkler
from ..functions.textnorm import (
    normalize_date,
    normalize_name,
    normalize_phone,
)

REQUIRED_KEYS = ("DATA_SOURCE", "RECORD_ID")  # consumer.py:188

_ADDR_SUFFIX = {
    "ST": "STREET", "AVE": "AVENUE", "RD": "ROAD", "LN": "LANE",
    "DR": "DRIVE", "BLVD": "BOULEVARD", "CT": "COURT", "PL": "PLACE",
    "TER": "TERRACE", "HWY": "HIGHWAY", "APT": "", "STE": "", "UNIT": "",
}
_ADDR_SUFFIX_RE = re.compile(
    r"\b(?:" + "|".join(sorted(_ADDR_SUFFIX, key=len, reverse=True)) + r")\b"
)


def normalize_addr(line1: str, city: str = "", postal: str = "") -> str:
    t = normalize_name(line1 or "")
    toks = [(_ADDR_SUFFIX.get(w, w)) for w in t.split()]
    base = " ".join(w for w in toks if w)
    extra = normalize_name(city or "") or (postal or "").strip()
    return (base + " " + extra).strip() if base else ""


def _scol(batch: pd.DataFrame, key: str) -> pd.Series:
    """Column as stripped strings, missing/null → "" (the _get analogue,
    whole-column)."""
    if key not in batch.columns:
        return pd.Series("", index=batch.index, dtype=object)
    s = batch[key]
    return s.where(s.notna(), "").astype(str).str.strip()


def _norm_name_s(s: pd.Series) -> pd.Series:
    """Vectorized :func:`normalize_name`: NFKC + upper + strip
    punctuation + collapse whitespace."""
    t = s.str.normalize("NFKC").str.upper()
    t = t.str.replace(r"[^\w\s]", " ", regex=True)
    return t.str.replace(r"\s+", " ", regex=True).str.strip()


_DATE_NUM_S = re.compile(r"^(\d{1,4})[/\-.](\d{1,2})[/\-.](\d{1,4})$")
_DATE_TEXT_S = re.compile(r"^([A-Za-z]{3,9})\.?\s+(\d{1,2}),?\s+(\d{2,4})$")
_MONTHS_S = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


def _fmt_ymd(y: np.ndarray, mo: np.ndarray, d: np.ndarray,
             valid: np.ndarray) -> np.ndarray:
    y = np.where(y < 100, np.where(y >= 30, y + 1900, y + 2000), y)
    out = np.char.add(
        np.char.add(np.char.zfill(y.astype("U4"), 4), "-"),
        np.char.add(np.char.add(np.char.zfill(mo.astype("U2"), 2), "-"),
                    np.char.zfill(d.astype("U2"), 2)),
    )
    return np.where(valid, out, "")


def _norm_date_s(s: pd.Series) -> pd.Series:
    """Vectorized :func:`normalize_date` (same spellings, same output)."""
    s = s.str.strip()
    out = np.full(len(s), "", dtype=object)
    num = s.str.extract(_DATE_NUM_S)
    has = num[0].notna().to_numpy()
    if has.any():
        a = pd.to_numeric(num[0][has]).to_numpy(dtype=np.int64)
        b = pd.to_numeric(num[1][has]).to_numpy(dtype=np.int64)
        c = pd.to_numeric(num[2][has]).to_numpy(dtype=np.int64)
        ymd_first = a > 31                 # YYYY-MM-DD else MM/DD/YY(YY)
        y = np.where(ymd_first, a, c)
        mo = np.where(ymd_first, b, a)
        d = np.where(ymd_first, c, b)
        valid = (mo >= 1) & (mo <= 12) & (d >= 1) & (d <= 31)
        out[has] = _fmt_ymd(y, mo, d, valid)
    txt = s.str.extract(_DATE_TEXT_S)
    hast = txt[0].notna().to_numpy() & ~has
    if hast.any():
        mo = (txt[0][hast].str[:3].str.lower().map(_MONTHS_S)
              .to_numpy(dtype=np.float64))
        d = pd.to_numeric(txt[1][hast]).to_numpy(dtype=np.int64)
        y = pd.to_numeric(txt[2][hast]).to_numpy(dtype=np.int64)
        valid = ~np.isnan(mo) & (d >= 1) & (d <= 31)
        out[hast] = _fmt_ymd(y, np.nan_to_num(mo).astype(np.int64), d, valid)
    return pd.Series(out, index=s.index, dtype=object)


def extract_record_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Wide record batch → feature frame (one row per valid record).

    Records missing DATA_SOURCE/RECORD_ID are dropped (the nack/DLQ path,
    consumer.py:201-204 — quarantine them upstream if needed). Fully
    column-vectorized (pandas .str kernels + numpy); the only per-match
    Python is the address-suffix replacement callable and the month-name
    map — both bounded by match counts, not row counts.
    """
    ds_ = _scol(batch, "DATA_SOURCE")
    rid = _scol(batch, "RECORD_ID")
    keep = (ds_ != "") & (rid != "")
    b = batch[keep]
    ds_, rid = ds_[keep], rid[keep]

    last = _norm_name_s(_scol(b, "PRIMARY_NAME_LAST"))
    first = _norm_name_s(_scol(b, "PRIMARY_NAME_FIRST"))
    middle = _norm_name_s(_scol(b, "PRIMARY_NAME_MIDDLE"))
    joined = (first + " " + middle + " " + last).str.replace(
        r"\s+", " ", regex=True).str.strip()
    full = _norm_name_s(_scol(b, "PRIMARY_NAME_FULL"))
    full = full.where(full != "", joined)
    org = _norm_name_s(_scol(b, "PRIMARY_NAME_ORG"))
    org = org.where(org != "", _norm_name_s(_scol(b, "SECONDARY_NAME_ORG")))

    dob = _norm_date_s(_scol(b, "DATE_OF_BIRTH"))
    y, m, d = dob.str[:4], dob.str[5:7], dob.str[8:10]
    d_num = pd.to_numeric(d, errors="coerce")
    can_swap = (dob != "") & (d_num <= 12) & (m != d)
    dob_swapped = (y + "-" + d + "-" + m).where(can_swap, "")

    phone = _scol(b, "PHONE_NUMBER").str.replace(r"\D+", "", regex=True)
    phone = phone.where(
        ~((phone.str.len() == 11) & phone.str.startswith("1")), phone.str[1:]
    )

    def _ident(key: str) -> pd.Series:
        return _scol(b, key).str.upper().str.replace(" ", "", regex=False)

    line1 = _scol(b, "ADDR_LINE1")
    line1 = line1.where(line1 != "", _scol(b, "ADDR_FULL"))
    base = _norm_name_s(line1).str.replace(
        _ADDR_SUFFIX_RE, lambda mt: _ADDR_SUFFIX[mt.group(0)], regex=True
    ).str.replace(r"\s+", " ", regex=True).str.strip()
    extra = _norm_name_s(_scol(b, "ADDR_CITY"))
    extra = extra.where(extra != "", _scol(b, "ADDR_POSTAL_CODE"))
    addr = (base + " " + extra).str.strip().where(base != "", "")

    return pd.DataFrame({
        "rec_key": (ds_ + ":" + rid),
        "data_source": ds_,
        "record_id": rid,
        "name_full": full.where(full != "", org),
        "name_last": last.where(last != "", org),
        "dob": dob,
        "dob_swapped": dob_swapped,
        "phone": phone,
        "email": _scol(b, "EMAIL_ADDRESS").str.lower(),
        "ssn": _scol(b, "SSN_NUMBER").str.replace(r"\D", "", regex=True),
        "passport": _ident("PASSPORT_NUMBER"),
        "drivers_license": _ident("DRIVERS_LICENSE_NUMBER"),
        "national_id": _ident("NATIONAL_ID_NUMBER"),
        "addr": addr,
    }).reset_index(drop=True)


_IDENTIFIER_KEYS = ("phone", "email", "ssn", "passport", "drivers_license",
                    "national_id", "addr")


def emit_blocking_keys(batch: pd.DataFrame) -> pd.DataFrame:
    """features → (block_key, rec_key) rows.

    Keys: each exact identifier value (prefixed), last-name+dob-year,
    last-name+first-initial. The J2 candidate-index analogue.
    """
    keys, recs = [], []
    for row in batch.itertuples(index=False):
        rk = row.rec_key
        for f in _IDENTIFIER_KEYS:
            v = getattr(row, f)
            if v:
                keys.append(f"{f}={v}")
                recs.append(rk)
        if row.name_last:
            if row.dob:
                keys.append(f"lastdob={row.name_last}|{row.dob[:4]}")
                recs.append(rk)
            if row.dob_swapped:
                keys.append(f"lastdob={row.name_last}|{row.dob_swapped[:4]}")
                recs.append(rk)
            first = (row.name_full.split()[0][:1] if row.name_full else "")
            keys.append(f"nameinit={row.name_last}|{first}")
            recs.append(rk)
    return pd.DataFrame({"block_key": keys, "rec_key": recs})


def _pairs_in_partition(group: pd.DataFrame,
                        max_block: int = 100) -> pd.DataFrame:
    """ONE Python call per hash partition of (block_key, rec_key) rows —
    not per block key (the per-key map_groups alternative makes one call
    per distinct identifier value: millions at scale, the measured
    cliff; see stages/blocking.py). Blocks inside the partition are
    found with a vectorized argsort; crowd identifiers (e.g. a
    call-center phone shared by thousands) walk the connectivity-
    preserving overlap-chunk split instead of a silent truncation, so a
    genuine crowd still resolves into one component and enumeration
    stays O(chunk²) per chunk."""
    from ..stages.blocking import chunk_ranges

    n = len(group)
    empty = pd.DataFrame({"rec_a": pd.Series(dtype=object),
                          "rec_b": pd.Series(dtype=object)})
    if n < 2:
        return empty
    keys = group["block_key"].to_numpy()
    recs = group["rec_key"].to_numpy()
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    bounds = np.flatnonzero(sk[1:] != sk[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    multi = np.flatnonzero(ends - starts >= 2)
    a, b = [], []
    for g in multi:
        members = sorted(set(recs[order[starts[g]:ends[g]]]))
        m = len(members)
        if m < 2:
            continue
        for cs, ce in chunk_ranges(m, max_block):
            for i in range(cs, ce):
                for j in range(i + 1, ce):
                    a.append(members[i])
                    b.append(members[j])
    if not a:
        return empty
    return pd.DataFrame({"rec_a": a, "rec_b": b})


# evidence weights (the MatchConfig analogue for the record domain)
W = {
    "ssn": 0.9, "passport": 0.9, "drivers_license": 0.9, "national_id": 0.9,
    "email": 0.8, "phone": 0.5, "addr": 0.4,
    "name": 0.50, "dob_exact": 0.30, "dob_swapped": 0.25, "dob_year": 0.10,
    "dob_conflict": -0.35, "ssn_conflict": -0.5,
}
RECORD_MATCH_THRESHOLD = 0.7

_KEY_LABEL = {
    "ssn": "SSN", "passport": "PASSPORT", "drivers_license": "DL",
    "national_id": "NATID", "email": "EMAIL", "phone": "PHONE",
    "addr": "ADDRESS",
}


def score_record_pair(fa: pd.Series, fb: pd.Series) -> tuple[float, str]:
    """One pair → (score, match_key). Pure, deterministic."""
    score = 0.0
    plus: list[str] = []
    minus: list[str] = []
    jw = jaro_winkler(fa["name_full"], fb["name_full"]) if fa["name_full"] and fb["name_full"] else 0.0
    name_score = max(0.0, (jw - 0.6) / 0.4) * W["name"]
    if name_score > 0:
        score += name_score
        if name_score >= 0.2:
            plus.append("NAME")
    if fa["dob"] and fb["dob"]:
        if fa["dob"] == fb["dob"]:
            score += W["dob_exact"]; plus.append("DOB")
        elif fb["dob"] == fa["dob_swapped"] or fa["dob"] == fb["dob_swapped"]:
            score += W["dob_swapped"]; plus.append("DOB")
        elif fa["dob"][:4] == fb["dob"][:4]:
            score += W["dob_year"]
        else:
            score += W["dob_conflict"]; minus.append("DOB")
    for f in ("phone", "email", "addr", "passport", "drivers_license",
              "national_id"):
        if fa[f] and fb[f] and fa[f] == fb[f]:
            score += W[f]
            plus.append(_KEY_LABEL[f])
    if fa["ssn"] and fb["ssn"]:
        if fa["ssn"] == fb["ssn"]:
            score += W["ssn"]; plus.append("SSN")
        else:
            score += W["ssn_conflict"]; minus.append("SSN")
    mk = "".join(f"+{p}" for p in plus) + "".join(f"-{m}" for m in minus)
    return score, mk


class RecordPairScorer:
    """Actor-pool scorer for joined record pairs (T1 analogue)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scores, mks = [], []
        a_cols = {c[:-2]: c for c in batch.columns if c.endswith("_a")}
        b_cols = {c[:-2]: c for c in batch.columns if c.endswith("_b")}
        for _, row in batch.iterrows():
            fa = pd.Series({k: row[v] for k, v in a_cols.items()})
            fb = pd.Series({k: row[v] for k, v in b_cols.items()})
            s, mk = score_record_pair(fa, fb)
            scores.append(s)
            mks.append(mk)
        out = batch[["rec_a", "rec_b"]].copy()
        out["score"] = np.asarray(scores)
        out["match_key"] = mks
        out["is_match"] = out["score"] >= RECORD_MATCH_THRESHOLD
        return out


def resolve_records(records: rd.Dataset, cfg: PipelineConfig | None = None):
    """records Dataset (wide Senzing-spec columns) → artifacts dict with
    features / edges / clusters Datasets. Cluster ids are deterministic
    min-hash labels like the page pipeline."""
    from ..stages.clustering import clusters_with_size, connected_components

    from ..config import partitions_for

    cfg = cfg or PipelineConfig()

    # coerce to Arrow blocks: Project/rename/join operators expect Arrow
    features = records.map_batches(
        lambda df: pa.Table.from_pandas(extract_record_features(df),
                                        preserve_index=False),
        batch_format="pandas",
    ).materialize()
    n_part = partitions_for(features.count(), cfg)

    from ..config import bucket_partitions
    from ..functions.hashing import hash_str_array

    n_bucket = bucket_partitions(cfg, 32)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = emit_blocking_keys(df)
        h = hash_str_array(out["block_key"].tolist()) if len(out) else np.empty(0, np.uint64)
        out["part"] = (h % np.uint64(n_bucket)).astype(np.int64)
        return out

    blocks = features.map_batches(add_part, batch_format="pandas")
    pairs = blocks.groupby("part", num_partitions=n_bucket).map_groups(
        _pairs_in_partition, batch_format="pandas"
    )
    # same pair may emerge from several keys → vectorized hash dedup
    from ..stages.agg import hash_aggregate

    pairs = hash_aggregate(
        pairs, ["rec_a", "rec_b"], {"n_keys": ("rec_a", "count")}, cfg=cfg
    ).select_columns(["rec_a", "rec_b"])

    feat_cols = ["rec_key", "name_full", "name_last", "dob", "dob_swapped",
                 "phone", "email", "ssn", "passport", "drivers_license",
                 "national_id", "addr"]
    side = features.select_columns(feat_cols)
    a = side.rename_columns({c: f"{c}_a" for c in feat_cols}).rename_columns(
        {"rec_key_a": "rec_a"}
    )
    b = side.rename_columns({c: f"{c}_b" for c in feat_cols}).rename_columns(
        {"rec_key_b": "rec_b"}
    )
    joined = pairs.join(a, join_type="inner", num_partitions=n_part, on=("rec_a",))
    joined = joined.join(b, join_type="inner", num_partitions=n_part, on=("rec_b",))
    scored = joined.map_batches(
        RecordPairScorer,
        batch_format="pandas",
        batch_size=cfg.scorer_batch_size,
        concurrency=effective_concurrency(cfg),
    )
    edges = scored.map_batches(
        lambda df: pa.Table.from_pandas(
            df[df["is_match"]][["rec_a", "rec_b", "score", "match_key"]],
            preserve_index=False,
        ),
        batch_format="pandas",
    ).materialize()

    # reuse the generic CC machinery (node column is named url internally)
    nodes = features.select_columns(["rec_key"]).rename_columns({"rec_key": "url"})
    cc_edges = edges.rename_columns({"rec_a": "url_a", "rec_b": "url_b"})
    labels = connected_components(nodes, cc_edges, cfg)
    clusters = clusters_with_size(labels, cfg).rename_columns({"url": "rec_key"})
    return {
        "features": features,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
    }


def load_jsonl_records(path: str) -> rd.Dataset:
    """Read Senzing-spec JSONL (the reference's input format, S10) into a
    wide Dataset — pandas-normalized so ragged keys become null columns."""
    import json

    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    df = pd.DataFrame(rows)
    return rd.from_pandas(df)
