"""Golden-content gate for the ER trio (VERDICT r2 item 4).

resolve_pages / entity_report / records_er have no DuckDB oracle, so a
pinned sf0.001 golden asserts their exact content: the cluster
partition (set-of-frozensets) and the full report payload. Any
semantic drift in extraction, sketching, blocking, scoring, clustering
or report assembly fails here BY CONTENT, not count. Regenerate (after
an intentional semantics change) with::

    python tests/golden_util.py
"""

import json
import os

import pytest

from golden_util import GOLDEN_PATH, compute_golden

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def golden():
    path = os.path.join(_REPO, GOLDEN_PATH)
    if not os.path.exists(path):
        pytest.fail(
            f"golden file missing: {path} — run `python tests/golden_util.py`"
        )
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def current(ray_session):
    return compute_golden()


def test_resolve_pages_partition_golden(golden, current):
    assert current["resolve_pages"] == golden["resolve_pages"]


def test_entity_report_content_golden(golden, current):
    assert current["entity_report"] == golden["entity_report"]


def test_records_er_partition_golden(golden, current):
    assert current["records_er"] == golden["records_er"]
