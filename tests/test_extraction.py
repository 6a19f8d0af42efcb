"""Extraction gate: byte-identical extracted text per url (north rule)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqs_entity_resolution_ray.functions.html_extract import extract_text, extract_title


CASES = [
    # (html, expected)
    (b"<p>hello</p>", "hello"),
    (b"", ""),
    (b"plain text no tags", "plain text no tags"),
    (b"<div>a<br>b</div>", "a\nb"),
    (b"<script>drop();</script><p>kept</p>", "kept"),
    (b"<style>p{}</style><p>kept</p>", "kept"),
    (b"<!-- comment --><p>kept</p>", "kept"),
    (b"<head><title>T</title><meta x></head><body>B</body>", "B"),
    (b"<p>a &amp; b &lt;c&gt;</p>", "a & b <c>"),
    (b"<p>  lots    of\t spaces  </p>", "lots of spaces"),
    (b"<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
    ("<p>café naïve</p>".encode(), "café naïve"),
    # NFC normalization: e + combining acute → é
    ("<p>café</p>".encode(), "café"),
    (b"<p>unclosed <b>bold", "unclosed bold"),
    (b"<P>UPPER TAGS</P>", "UPPER TAGS"),
    (b"\xff\xfe invalid utf8 <p>x</p>", "�� invalid utf8\nx"),
]


@pytest.mark.parametrize("html,expected", CASES)
def test_extract_cases(html, expected):
    assert extract_text(html) == expected


def test_extract_idempotent_and_stable():
    html = b"<html><body><h1>Title</h1><p>one two</p></body></html>"
    out1 = extract_text(html)
    out2 = extract_text(html)
    assert out1 == out2 == "Title\none two"


def test_title():
    assert extract_title(b"<head><title> A  &amp; B </title></head>") == "A & B"
    assert extract_title(b"<p>no title</p>") == ""


def test_corpus_golden_byte_identical(corpus, ray_session):
    """Run the extraction stage over the corpus through Ray Data and
    compare against the pinned golden table, byte for byte per url."""
    import ray.data as rd

    from sqs_entity_resolution_ray.stages.extract import extract_batch

    pages = rd.read_parquet(corpus + "/pages.parquet")
    extracted = pages.map_batches(extract_batch, batch_format="pyarrow")
    df = extracted.to_pandas()
    # upsert semantics: keep max warc_ts per url
    df = df.sort_values(["url", "warc_ts"]).drop_duplicates("url", keep="last")
    golden = pq.read_table(corpus + "/extraction_golden.parquet").to_pandas()
    merged = golden.merge(df[["url", "extracted_text"]], on="url", how="left")
    assert merged["extracted_text"].notna().all()
    mismatches = merged[merged["expected_text"] != merged["extracted_text"]]
    assert len(mismatches) == 0, mismatches.head()
