"""Deterministic synthetic people-records fixture (FIXTURES.md §5).

Senzing-spec wide records with known truth clusters — covers the
reference's record shape without copying its fixture data. Perturbation
menu mirrors what the golden output shows Senzing tolerating
(``flow-output.jsonl:1-2``): DOB format variants and day/month
transposition, address suffix variants, partial records linked by a
shared identifier, name typos.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import stable_rng

_FIRST = ["ROBERT", "MARIA", "JAMES", "LINDA", "DAVID", "SUSAN", "MICHAEL",
          "KAREN", "WILLIAM", "PATRICIA", "JOHN", "BARBARA", "THOMAS",
          "ELIZABETH", "DANIEL", "JENNIFER", "CARLOS", "ANNA", "PETER",
          "LAURA"]
_LAST = ["SMITH", "GARCIA", "JOHNSON", "MILLER", "DAVIS", "MARTINEZ",
         "BROWN", "WILSON", "ANDERSON", "TAYLOR", "THOMAS", "MOORE",
         "JACKSON", "WHITE", "HARRIS", "CLARK", "LEWIS", "WALKER",
         "HALL", "YOUNG"]
_STREETS = ["MAIN STREET", "OAK AVENUE", "ADELA LANE", "CEDAR ROAD",
            "HILL DRIVE", "PARK BOULEVARD", "LAKE COURT", "RIVER PLACE"]
_SUFFIX_VARIANTS = {"STREET": "ST", "AVENUE": "AVE", "LANE": "LN",
                    "ROAD": "RD", "DRIVE": "DR", "BOULEVARD": "BLVD",
                    "COURT": "CT", "PLACE": "PL"}


def _dob_variant(dob: str, rng: np.random.Generator) -> str:
    """Render YYYY-MM-DD in one of the fixture's observed spellings."""
    y, m, d = dob.split("-")
    style = int(rng.integers(0, 4))
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
              "Sep", "Oct", "Nov", "Dec"]
    if style == 0:
        return f"{int(m)}/{int(d)}/{y}"
    if style == 1:
        return f"{months[int(m) - 1]} {int(d)} {y}"
    if style == 2:
        return f"{int(m)}/{int(d)}/{y[2:]}"
    return dob  # ISO


def generate_people(n_persons: int = 40, seed: int = 7) -> tuple[pd.DataFrame, pd.Series]:
    """Returns (records_df, truth: rec_key → person id)."""
    rng = stable_rng(f"people-v1-{seed}")
    rows: list[dict] = []
    truth: dict[str, str] = {}
    rid = 1000

    for p in range(n_persons):
        pid = f"P{p:04d}"
        first = _FIRST[int(rng.integers(0, len(_FIRST)))]
        last = _LAST[int(rng.integers(0, len(_LAST)))]
        dob = f"{1950 + int(rng.integers(0, 55)):04d}-{int(rng.integers(1, 13)):02d}-{int(rng.integers(1, 29)):02d}"
        phone = f"702{rng.integers(1000000, 9999999)}"
        email = f"{first[0].lower()}{last.lower()}{p}@mail.com"
        ssn = f"{rng.integers(100000000, 999999999)}"
        street_no = int(rng.integers(100, 9999))
        street = _STREETS[int(rng.integers(0, len(_STREETS)))]
        n_records = int(rng.integers(1, 5))
        for v in range(n_records):
            rid += 1
            rec = {
                "DATA_SOURCE": "CUSTOMERS" if v % 2 == 0 else "WATCHLIST",
                "RECORD_ID": str(rid),
                "RECORD_TYPE": "PERSON",
                "PRIMARY_NAME_LAST": last,
                "PRIMARY_NAME_FIRST": first,
            }
            # v0 is the full "golden" record carrying every evidence
            # field; variants keep random subsets (so whatever evidence a
            # variant has, it overlaps with v0 — no orphaned records)
            if v == 0:
                rec["DATE_OF_BIRTH"] = _dob_variant(dob, rng)
                rec["PHONE_NUMBER"] = f"{phone[:3]}-{phone[3:6]}-{phone[6:]}"
                rec["EMAIL_ADDRESS"] = email
                rec["SSN_NUMBER"] = f"{ssn[:3]}-{ssn[3:5]}-{ssn[5:]}"
                rec["ADDR_LINE1"] = f"{street_no} {street.title()}"
                rec["ADDR_CITY"] = "Las Vegas"
                rec["ADDR_STATE"] = "NV"
                rec["ADDR_POSTAL_CODE"] = "89132"
                rows.append(rec)
                truth[f"{rec['DATA_SOURCE']}:{rec['RECORD_ID']}"] = pid
                continue
            if rng.random() < 0.8:
                d = dob
                if v > 0 and rng.random() < 0.2:
                    y, m, dd = dob.split("-")
                    if int(dd) <= 12 and m != dd:  # day/month transposition
                        d = f"{y}-{dd}-{m}"
                rec["DATE_OF_BIRTH"] = _dob_variant(d, rng)
            if rng.random() < 0.6:
                rec["PHONE_NUMBER"] = f"{phone[:3]}-{phone[3:6]}-{phone[6:]}"
            if rng.random() < 0.5:
                rec["EMAIL_ADDRESS"] = email
            if rng.random() < 0.3:
                rec["SSN_NUMBER"] = f"{ssn[:3]}-{ssn[3:5]}-{ssn[5:]}"
            if rng.random() < 0.6:
                st = street
                if rng.random() < 0.5:
                    for full, abbr in _SUFFIX_VARIANTS.items():
                        st = st.replace(full, abbr)
                rec["ADDR_LINE1"] = f"{street_no} {st.title()}"
                rec["ADDR_CITY"] = "Las Vegas"
                rec["ADDR_STATE"] = "NV"
                rec["ADDR_POSTAL_CODE"] = "89132"
            if v > 0 and rng.random() < 0.3:  # name typo
                f2 = list(first)
                i = int(rng.integers(1, len(f2)))
                f2[i] = "X"
                rec["PRIMARY_NAME_FIRST"] = "".join(f2)
            # a record with ONLY a name can never corroborate — guarantee
            # at least one piece of matchable evidence
            if not any(k in rec for k in ("DATE_OF_BIRTH", "PHONE_NUMBER",
                                          "EMAIL_ADDRESS", "SSN_NUMBER",
                                          "ADDR_LINE1")):
                rec["DATE_OF_BIRTH"] = _dob_variant(dob, rng)
            rows.append(rec)
            truth[f"{rec['DATA_SOURCE']}:{rec['RECORD_ID']}"] = pid

    # singleton noise persons (1 record each, no shared identifiers)
    for s in range(n_persons // 2):
        rid += 1
        pid = f"N{s:04d}"
        rec = {
            "DATA_SOURCE": "REFERENCE",
            "RECORD_ID": str(rid),
            "RECORD_TYPE": "PERSON",
            "PRIMARY_NAME_LAST": _LAST[int(rng.integers(0, len(_LAST)))],
            "PRIMARY_NAME_FIRST": _FIRST[int(rng.integers(0, len(_FIRST)))],
            "DATE_OF_BIRTH": f"{1950 + int(rng.integers(0, 55))}-"
                             f"{int(rng.integers(1, 13)):02d}-"
                             f"{int(rng.integers(1, 29)):02d}",
        }
        rows.append(rec)
        truth[f"{rec['DATA_SOURCE']}:{rec['RECORD_ID']}"] = pid

    df = pd.DataFrame(rows)
    return df, pd.Series(truth, name="person_id")
