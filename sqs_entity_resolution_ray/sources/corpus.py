"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-4).

Generates the four fixture tables with NO external data, fully seeded:

- ``pages``: (url, warc_ts, html, text, lang) per BASELINE.json input_hint
- ``extraction_golden``: (url, expected_text) — byte-identical gate
- ``labeled_pairs``: (url_a, url_b, is_match, hardness) — F1 ≥ 0.99 gate
- ``expected_clusters``: (url, entity_id) — cluster-equivalence gate

Mirrors the role of the reference's fixtures
(``test/fixtures/customers.jsonl`` → golden ``flow-output.jsonl``,
count-asserted at ``test/test_flow.py:90-91``) but content-aware and at
page granularity. Duplicate structure: each entity has 1–6 near-duplicate
page variants (token typos, boilerplate swaps, paragraph-order jitter);
noise singletons (some sharing a viral "lure" paragraph across different
entities — hard negatives); a template farm (one big near-dup cluster —
the engineered hot block for skew handling); and byte-exact url
duplicates differing only in warc_ts (input upsert dedup, reference
semantics: add_record with same (DATA_SOURCE, RECORD_ID) replaces —
``README.md:222-228``).
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import stable_rng
from ..functions.html_extract import extract_text

CORPUS_VERSION = 7

# Fixed 512-word vocabulary (deterministic, generated from a seeded walk
# over consonant-vowel syllables — no external wordlist).
_CONS = list("bcdfghjklmnprstvwz")
_VOW = list("aeiou")


def _build_vocab(n: int = 512) -> list[str]:
    rng = stable_rng("vocab-v1")
    vocab = set()
    while len(vocab) < n:
        syls = rng.integers(2, 4)
        w = "".join(
            _CONS[rng.integers(0, len(_CONS))] + _VOW[rng.integers(0, len(_VOW))]
            for _ in range(syls)
        )
        vocab.add(w)
    return sorted(vocab)


_VOCAB = _build_vocab()
_NAVS = [
    "Home News Archive About Contact",
    "Start Latest Topics Team Imprint",
    "Index Stories Sections Authors Legal",
]
_FOOTERS = [
    "Copyright 2024 Example Media. All rights reserved.",
    "Terms of service apply. Privacy policy available.",
]
_LURE = (
    "subscribe to our weekly newsletter for curated updates delivered "
    "directly to your inbox every friday morning without fail"
)

_EPOCH = _dt.datetime(2024, 1, 1)


def _words(rng: np.random.Generator, n: int) -> list[str]:
    idx = rng.integers(0, len(_VOCAB), size=n)
    return [_VOCAB[i] for i in idx]


def _typo(word: str, rng: np.random.Generator) -> str:
    if len(word) < 3:
        return word + "x"
    i = int(rng.integers(1, len(word) - 1))
    op = int(rng.integers(0, 3))
    if op == 0:  # swap
        return word[: i - 1] + word[i] + word[i - 1] + word[i + 1 :]
    if op == 1:  # drop
        return word[:i] + word[i + 1 :]
    return word[:i] + "q" + word[i:]  # insert


def _perturb_tokens(tokens: list[str], rate: float, rng: np.random.Generator) -> list[str]:
    out = list(tokens)
    n_typos = int(round(len(tokens) * rate))
    if n_typos:
        pos = rng.choice(len(tokens), size=min(n_typos, len(tokens)), replace=False)
        for p in pos:
            out[p] = _typo(out[p], rng)
    return out


def _render_html(title: str, nav: str, paragraphs: list[str], footer: str) -> bytes:
    body = "\n".join(f"    <p>{p}</p>" for p in paragraphs)
    html = (
        "<html>\n<head>\n"
        f"  <title>{title}</title>\n"
        '  <script>var t = Date.now() < 1; track(t);</script>\n'
        '  <style>p { margin: 4px; }</style>\n'
        "</head>\n<body>\n"
        f"  <nav>{nav}</nav>\n"
        "  <!-- rendered by staticgen -->\n"
        f"  <h1>{title}</h1>\n"
        "  <div class=\"content\">\n"
        f"{body}\n"
        "  </div>\n"
        f"  <footer>{footer}</footer>\n"
        "</body>\n</html>\n"
    )
    return html.encode("utf-8")


def generate_corpus(
    n_entities: int = 120,
    n_noise: int = 150,
    farm_size: int = 60,
    seed: int = 42,
    neg_pairs_per_entity: int = 3,
) -> dict[str, pa.Table]:
    """Build the four fixture tables. Fully deterministic in its args."""
    rng = stable_rng(f"corpus-v{CORPUS_VERSION}-{seed}")
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    crawler_texts: list[str] = []
    langs: list[str] = []
    entity_of: list[str] = []          # truth cluster per page (incl. singletons)

    def add_page(url, ts_min, html, lang, entity):
        urls.append(url)
        tss.append(int((_EPOCH + _dt.timedelta(minutes=int(ts_min))).timestamp() * 1_000_000))
        htmls.append(html)
        # crawler-provided text: sometimes empty, sometimes a lossy strip
        r = rng.random()
        crawler_texts.append("" if r < 0.5 else extract_text(html)[:200])
        langs.append(lang)
        entity_of.append(entity)

    # --- duplicate entities -------------------------------------------------
    for e in range(n_entities):
        ent_id = f"ent-{e:06d}"
        title_toks = _words(rng, int(rng.integers(3, 7)))
        paras = [
            " ".join(_words(rng, int(rng.integers(25, 45))))
            for _ in range(int(rng.integers(3, 6)))
        ]
        n_variants = int(rng.integers(1, 7))
        lang = "en" if rng.random() < 0.9 else ("es" if rng.random() < 0.5 else "de")
        nav0 = int(rng.integers(0, len(_NAVS)))
        for v in range(n_variants):
            if v == 0:
                vtitle, vparas, nav = title_toks, paras, nav0
            else:
                hard = rng.random() < 0.3
                rate = 0.03 if hard else 0.01
                vtitle = _perturb_tokens(title_toks, rate, rng)
                vparas = [" ".join(_perturb_tokens(p.split(), rate, rng)) for p in paras]
                if rng.random() < 0.5:  # boilerplate swap
                    nav = int(rng.integers(0, len(_NAVS)))
                else:
                    nav = nav0
                if hard and len(vparas) > 2 and rng.random() < 0.5:
                    # paragraph-order jitter (swap two adjacent)
                    i = int(rng.integers(0, len(vparas) - 1))
                    vparas[i], vparas[i + 1] = vparas[i + 1], vparas[i]
            url = f"https://www.site-{e % 50:02d}.example.com/articles/{e:06d}/v{v}"
            html = _render_html(
                " ".join(vtitle), _NAVS[nav], vparas,
                _FOOTERS[int(rng.integers(0, len(_FOOTERS)))],
            )
            add_page(url, rng.integers(0, 500_000), html, lang, ent_id)
            # byte-exact url duplicate with different warc_ts for ~2% of pages
            if rng.random() < 0.02:
                stale = _render_html(" ".join(vtitle), _NAVS[nav], vparas[:-1] or vparas,
                                     _FOOTERS[0])
                # stale row: EARLIER ts, different html — dedup must drop it
                urls.append(url)
                tss.append(tss[-1] - 3_600_000_000)
                htmls.append(stale)
                crawler_texts.append("")
                langs.append(lang)
                entity_of.append(ent_id)

    # --- noise singletons (some with the shared lure paragraph) -------------
    for s in range(n_noise):
        ent_id = f"noise-{s:06d}"
        title = " ".join(_words(rng, int(rng.integers(3, 7))))
        paras = [
            " ".join(_words(rng, int(rng.integers(25, 45))))
            for _ in range(int(rng.integers(3, 6)))
        ]
        if s % 10 == 0:  # every 10th noise page carries the viral lure
            paras.insert(int(rng.integers(0, len(paras))), _LURE)
        url = f"https://www.noise-{s % 30:02d}.example.org/posts/{s:06d}"
        html = _render_html(title, _NAVS[int(rng.integers(0, len(_NAVS)))], paras,
                            _FOOTERS[int(rng.integers(0, len(_FOOTERS)))])
        add_page(url, rng.integers(0, 500_000), html, "en", ent_id)

    # --- template farm: one big near-dup cluster (hot block) ----------------
    if farm_size > 0:
        base_paras = [
            " ".join(_words(rng, 30)) for _ in range(4)
        ]
        for f in range(farm_size):
            # identical template; only a short product code + one number vary
            paras = list(base_paras)
            paras.append(f"product code A{f:05d} in stock now")
            url = f"https://shop.example.net/catalog/item-{f:05d}"
            html = _render_html("catalog listing page", _NAVS[0], paras, _FOOTERS[0])
            add_page(url, rng.integers(0, 500_000), html, "en", "ent-farm")

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(crawler_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )

    # --- golden extraction + expected clusters over DEDUPED pages -----------
    # upsert semantics: per url keep max warc_ts
    best: dict[str, int] = {}
    for i, u in enumerate(urls):
        if u not in best or tss[i] > tss[best[u]]:
            best[u] = i
    ded_idx = sorted(best.values())
    golden = pa.table(
        {
            "url": pa.array([urls[i] for i in ded_idx], pa.string()),
            "expected_text": pa.array(
                [extract_text(htmls[i]) for i in ded_idx], pa.string()
            ),
        }
    )
    expected_clusters = pa.table(
        {
            "url": pa.array([urls[i] for i in ded_idx], pa.string()),
            "entity_id": pa.array([entity_of[i] for i in ded_idx], pa.string()),
        }
    )

    # --- labeled pairs -------------------------------------------------------
    by_entity: dict[str, list[str]] = {}
    for i in ded_idx:
        by_entity.setdefault(entity_of[i], []).append(urls[i])
    pa_a, pa_b, pa_m, pa_h = [], [], [], []

    def add_pair(a, b, m, h):
        a, b = (a, b) if a < b else (b, a)
        pa_a.append(a); pa_b.append(b); pa_m.append(m); pa_h.append(h)

    ent_keys = sorted(by_entity)
    for ent in ent_keys:
        members = sorted(by_entity[ent])
        if len(members) < 2:
            continue
        cap = members if len(members) <= 12 else members[:12]
        for i in range(len(cap)):
            for j in range(i + 1, len(cap)):
                add_pair(cap[i], cap[j], True,
                         "hard" if ent == "ent-farm" else "easy")
    # negatives: random cross-entity
    all_urls = sorted(best)
    n_neg = min(len(pa_a) * 2, n_entities * neg_pairs_per_entity * 2)
    for _ in range(n_neg):
        i, j = rng.integers(0, len(all_urls), size=2)
        if i == j:
            continue
        a, b = all_urls[int(i)], all_urls[int(j)]
        ia, ib = best[a], best[b]
        if entity_of[ia] != entity_of[ib]:
            add_pair(a, b, False, "negative_random")
    # lure negatives: pairs of noise pages sharing the viral paragraph
    lure_urls = sorted(
        urls[best[u]] for u in best
        if entity_of[best[u]].startswith("noise-")
        and int(entity_of[best[u]].split("-")[1]) % 10 == 0
    )
    for i in range(len(lure_urls)):
        for j in range(i + 1, min(i + 4, len(lure_urls))):
            add_pair(lure_urls[i], lure_urls[j], False, "negative_lure")

    # dedupe labeled pairs
    seen = set()
    keep = []
    for idx2 in range(len(pa_a)):
        key = (pa_a[idx2], pa_b[idx2])
        if key not in seen:
            seen.add(key)
            keep.append(idx2)
    labeled_pairs = pa.table(
        {
            "url_a": pa.array([pa_a[i] for i in keep], pa.string()),
            "url_b": pa.array([pa_b[i] for i in keep], pa.string()),
            "is_match": pa.array([pa_m[i] for i in keep], pa.bool_()),
            "hardness": pa.array([pa_h[i] for i in keep], pa.string()),
        }
    )
    return {
        "pages": pages,
        "extraction_golden": golden,
        "labeled_pairs": labeled_pairs,
        "expected_clusters": expected_clusters,
    }


def pages_from_documents(
    sf_dir: str,
    variants_per_doc: int = 3,
    repeat_docs: int = 1,
    pad_tokens: int = 0,
    root: str = "/tmp/ser_ray_docpages",
) -> str:
    """Derive a deterministic pages corpus from a testdata documents table.

    Each document becomes an entity with 1..variants_per_doc perturbed
    HTML page variants (token typos, boilerplate swap) — the input shape
    mandated by BASELINE.json's input_hint, at a size that scales with
    the sf directory. Cached on disk; key = (sf_dir identity, params).
    Also writes expected_clusters.parquet (truth = source doc).
    """
    doc_path = os.path.join(sf_dir, "documents.parquet")
    import hashlib

    st = os.stat(doc_path)
    key = (f"{os.path.abspath(sf_dir)}|{st.st_size}|{variants_per_doc}|"
           f"{repeat_docs}|{pad_tokens}")
    tag = f"v{CORPUS_VERSION}_{hashlib.sha256(key.encode()).hexdigest()[:12]}"
    out = os.path.join(root, tag)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out

    docs = pq.read_table(doc_path, columns=["doc_id", "text", "lang"])
    base_ids = docs.column("doc_id").to_pylist()
    base_texts = docs.column("text").to_pylist()
    base_langs = docs.column("lang").to_pylist()

    # repeat_docs amplifies the corpus for throughput/scaling runs; each
    # repeat is heavily re-tokenized (35% token substitution) so repeats
    # do NOT near-dup into each other — cluster sizes stay realistic.
    # All randomness is seeded PER (doc, repeat) so generation is
    # order-independent and chunks can run as parallel Ray tasks.
    doc_rows = []  # (doc_id, repeat, text, lang)
    max_id = (max(base_ids) + 1) if base_ids else 0
    for r in range(repeat_docs):
        for d, text, lang in zip(base_ids, base_texts, base_langs):
            doc_rows.append((d + r * max_id, r, text, lang))

    tmp = out + ".tmp"
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    # chunk size balances task parallelism (pages corpus reads want many
    # fragments anyway) against per-task overhead; content is identical
    # regardless of chunking thanks to per-doc seeding
    chunk_size = 512
    chunks = [doc_rows[i:i + chunk_size] for i in range(0, len(doc_rows), chunk_size)]

    import ray

    if ray.is_initialized() and len(chunks) > 1:
        gen = ray.remote(num_cpus=1)(_gen_pages_chunk)
        truth_parts = ray.get([
            gen.remote(ci, chunk, variants_per_doc, pad_tokens, tmp)
            for ci, chunk in enumerate(chunks)
        ])
    else:
        truth_parts = [
            _gen_pages_chunk(ci, chunk, variants_per_doc, pad_tokens, tmp)
            for ci, chunk in enumerate(chunks)
        ]

    urls = [u for part in truth_parts for u in part[0]]
    entity_of = [e for part in truth_parts for e in part[1]]
    truth = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "entity_id": pa.array(entity_of, pa.string()),
        }
    )
    pq.write_table(truth, os.path.join(tmp, "expected_clusters.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write(tag)
    if os.path.exists(out):
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def _gen_pages_chunk(
    chunk_idx: int,
    chunk: list[tuple],
    variants_per_doc: int,
    pad_tokens: int,
    tmp_dir: str,
) -> tuple[list[str], list[str]]:
    """Render one chunk of (doc_id, repeat, text, lang) rows to a parquet
    shard. Deterministic per doc (seeded by final doc id), so the corpus
    content does not depend on chunking or execution order. Returns the
    (urls, entity_ids) truth columns for the shard."""
    vocab_arr = np.array(_VOCAB)
    urls, tss, htmls, out_langs, entity_of = [], [], [], [], []
    for d, r, text, lang in chunk:
        rng = stable_rng(f"docpages-{variants_per_doc}-{pad_tokens}-{d}")
        toks = (text or "").split()
        if r > 0:
            toks = _perturb_tokens(toks, 0.35, rng)
        if pad_tokens > 0:
            # unique per-doc padding to realistic web-page weight (~8 KB
            # html at 1600 tokens): adds compute without adding cross-doc
            # similarity; variants share it (they perturb the padded text)
            idx = rng.integers(0, len(vocab_arr), size=pad_tokens)
            toks = toks + list(vocab_arr[idx])
        n_var = 1 + int(d) % variants_per_doc
        title = " ".join(toks[:5]) if toks else f"document {d}"
        for v in range(n_var):
            vtoks = toks if v == 0 else _perturb_tokens(toks, 0.01, rng)
            paras = [" ".join(vtoks[i:i + 40]) for i in range(0, max(len(vtoks), 1), 40)]
            html = _render_html(
                title,
                _NAVS[(int(d) + v) % len(_NAVS)],
                paras,
                _FOOTERS[int(d) % len(_FOOTERS)],
            )
            urls.append(f"https://docs.example.com/{d}/v{v}")
            tss.append(int((_EPOCH + _dt.timedelta(minutes=int(d) % 100000)).timestamp() * 1_000_000))
            htmls.append(html)
            out_langs.append(lang or "en")
            entity_of.append(f"doc-{d}")

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )
    pq.write_table(
        pages, os.path.join(tmp_dir, "pages", f"part-{chunk_idx:05d}.parquet")
    )
    return urls, entity_of


def corpus_dir(
    n_entities: int = 120,
    n_noise: int = 150,
    farm_size: int = 60,
    seed: int = 42,
    root: str = "/tmp/ser_ray_corpus",
) -> str:
    """Generate (or reuse a cached copy of) the corpus as parquet files.

    Cache key = all generation parameters + CORPUS_VERSION; safe across
    test/bench processes.
    """
    tag = f"v{CORPUS_VERSION}_e{n_entities}_n{n_noise}_f{farm_size}_s{seed}"
    out = os.path.join(root, tag)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tables = generate_corpus(n_entities, n_noise, farm_size, seed)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(tmp, f"{name}.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write(tag)
    if os.path.exists(out):  # lost a race with another process — reuse theirs
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out
