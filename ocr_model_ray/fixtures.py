"""Deterministic synthetic `pages` corpus generator (FIXTURES.md §1).

A pure function of (seed, tier, multiplier) — no wall clock, no global
RNG. Produces the input table fixed by BASELINE.json `input_hint`:

    url:string, warc_ts:timestamp[us], html:binary (large_binary),
    text:string, lang:string

Row categories (FIXTURES.md §1): html-article, html-table, html-minimal,
pdf-digital, pdf-scanned, text-plain, dup-content, giant-blob, malformed.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
import random

import pyarrow as pa

from .spec import PSEUDO_PDF_HEADER, PSEUDO_PNG_HEADER

BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

#: bump when the corpus recipe changes — keys the on-disk fixture caches
RECIPE_VERSION = 2

# (category, t1_count, t2_count)
CATEGORY_COUNTS = [
    ("html-article", 20, 2000),
    ("html-table", 10, 500),
    ("html-minimal", 5, 200),
    ("pdf-digital", 10, 500),
    ("pdf-scanned", 5, 200),
    ("text-plain", 5, 200),
    ("dup-content", 6, 300),
    ("giant-blob", 2, 20),
    ("malformed", 3, 80),
    ("docx", 3, 150),
]


def _docx_payload(rng: random.Random) -> bytes:
    """Minimal WordprocessingML zip (deterministic bytes: ZIP_STORED,
    fixed timestamps)."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    paras = []
    for _ in range(rng.randint(2, 5)):
        paras.append(f"<w:p><w:r><w:t>{escape(_paragraph(rng))}</w:t></w:r></w:p>")
    paras.append("<w:p><w:r><w:t>   </w:t></w:r></w:p>")  # empty-para skip case
    table = ""
    if rng.random() < 0.5:
        nr, nc = rng.randint(2, 3), rng.randint(2, 3)
        rows = []
        for r in range(nr):
            cells = "".join(
                f"<w:tc><w:p><w:r><w:t>{_words(rng, 1)[0]}{r}{c}</w:t></w:r></w:p></w:tc>"
                for c in range(nc))
            rows.append(f"<w:tr>{cells}</w:tr>")
        table = "<w:tbl>" + "".join(rows) + "</w:tbl>"
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{w}"><w:body>{"".join(paras)}{table}'
           f"</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        info = zipfile.ZipInfo("word/document.xml", date_time=(1980, 1, 1, 0, 0, 0))
        zf.writestr(info, doc)
    return buf.getvalue()

_LOREM = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua enim "
          "ad minim veniam quis nostrud exercitation ullamco laboris nisi "
          "aliquip ex ea commodo consequat duis aute irure in reprehenderit "
          "voluptate velit esse cillum fugiat nulla pariatur excepteur sint "
          "occaecat cupidatat non proident sunt culpa qui officia deserunt "
          "mollit anim id est laborum").split()

_DE = "der die das und ist mit von auf für nicht eine werden haben".split()
_FR = "le la les et des une dans pour que pas sur avec tout".split()


def _words(rng: random.Random, n: int, vocab=None) -> list[str]:
    vocab = vocab or _LOREM
    return [vocab[rng.randrange(len(vocab))] for _ in range(n)]


def _sentence(rng: random.Random, lo: int = 6, hi: int = 16, vocab=None) -> str:
    ws = _words(rng, rng.randint(lo, hi), vocab)
    return " ".join(ws).capitalize() + "."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 5, vocab=None) -> str:
    return " ".join(_sentence(rng, vocab=vocab) for _ in range(rng.randint(lo, hi)))


def _nav_html(rng: random.Random) -> str:
    links = "".join(f'<li><a href="/s/{w}">{w}</a></li>'
                    for w in _words(rng, rng.randint(4, 8)))
    return f"<nav><ul>{links}</ul></nav>"


def _footer_html(rng: random.Random) -> str:
    links = " | ".join(f'<a href="/f/{w}">{w} {w2}</a>'
                       for w, w2 in zip(_words(rng, 5), _words(rng, 5)))
    return f"<footer><p>{links}</p><p>copyright {rng.randint(1999, 2024)} fixture corp</p></footer>"


def _sidebar_html(rng: random.Random) -> str:
    links = "".join(f'<li><a href="/r/{w}">related {w} article</a></li>'
                    for w in _words(rng, rng.randint(3, 6)))
    return f"<aside><h3>related</h3><ul>{links}</ul></aside>"


def _article_html(rng: random.Random, vocab=None, n_paras: int | None = None,
                  tables: int = 0) -> str:
    n_paras = n_paras if n_paras is not None else rng.randint(3, 8)
    title = " ".join(_words(rng, rng.randint(3, 6), vocab)).title()
    body_parts = [f"<h1>{title}</h1>"]
    for i in range(n_paras):
        if i == 1 and rng.random() < 0.4:
            body_parts.append(f"<h2>{' '.join(_words(rng, 3, vocab)).title()}</h2>")
        body_parts.append(f"<p>{_paragraph(rng, vocab=vocab)}</p>")
        if tables and i == min(1, n_paras - 1):
            for _ in range(tables):
                body_parts.append(_table_html(rng))
    if rng.random() < 0.3:
        items = "".join(f"<li>{_sentence(rng, 5, 10, vocab)}</li>"
                        for _ in range(rng.randint(3, 5)))
        body_parts.append(f"<ul>{items}</ul>")
    return ("<!DOCTYPE html><html><head><title>" + title + "</title>"
            "<script>var x=1;</script><style>p{margin:0}</style></head><body>"
            + _nav_html(rng) + "<header><p>site fixture banner</p></header>"
            "<main><article>" + "".join(body_parts) + "</article></main>"
            + _sidebar_html(rng) + _footer_html(rng) + "</body></html>")


def _table_html(rng: random.Random) -> str:
    nr, nc = rng.randint(2, 5), rng.randint(2, 4)
    rows = []
    header = "".join(f"<th>col {c}</th>" for c in range(nc))
    rows.append(f"<tr>{header}</tr>")
    for r in range(nr):
        cells = []
        c = 0
        while c < nc:
            span = 2 if (c + 1 < nc and rng.random() < 0.15) else 1
            val = f"{_words(rng, 1)[0]} {rng.randint(0, 999)}"
            cells.append(f'<td colspan="{span}">{val}</td>' if span > 1 else f"<td>{val}</td>")
            c += span
        rows.append("<tr>" + "".join(cells) + "</tr>")
    return "<table>" + "".join(rows) + "</table>"


def _pdf_payload(rng: random.Random, n_pages: int, scanned: bool = False,
                 with_table: bool = False, giant: bool = False) -> bytes:
    pages = []
    for _ in range(n_pages):
        w, h = 612, 792
        page: dict = {"width": w, "height": h, "spans": [], "image": None}
        if scanned:
            words = []
            y = 40.0
            for _li in range(rng.randint(3, 7)):
                x = 30.0
                for wd in _words(rng, rng.randint(3, 8)):
                    wid = 7.0 * len(wd)
                    conf = round(0.62 + rng.random() * 0.38, 4)
                    words.append([wd, x, y, x + wid, y + 12.0, conf])
                    x += wid + 6.0
                y += 18.0
            img = PSEUDO_PNG_HEADER + json.dumps({"w": w, "h": h, "words": words}).encode()
            page["image"] = base64.b64encode(img).decode("ascii")
        else:
            spans = []
            y = 50.0
            n_lines = rng.randint(8, 20) * (40 if giant else 1)
            for _li in range(n_lines):
                x = 40.0
                for wd in _words(rng, rng.randint(4, 9)):
                    wid = 6.5 * len(wd)
                    spans.append([wd, x, y, x + wid, y + 11.0, 11, False])
                    x += wid + 5.0
                y += 14.0
            if rng.random() < 0.1:
                spans.append(["   ", 10.0, y, 30.0, y + 11.0, 11, False])  # whitespace-only span
            page["spans"] = spans
            if with_table:
                tx, ty = 40.0, y + 30.0
                trows, tcols = rng.randint(3, 5), rng.randint(2, 4)
                for r in range(trows):
                    for c in range(tcols):
                        wd = f"{_words(rng, 1)[0]}{r}{c}"
                        x1 = tx + c * 120.0
                        y1 = ty + r * 20.0
                        page["spans"].append([wd, x1, y1, x1 + 7.0 * len(wd), y1 + 10.0, 10, False])
                page["tables"] = [[tx - 5.0, ty - 5.0,
                                   tx + tcols * 120.0, ty + trows * 20.0 + 5.0]]
        pages.append(page)
    return PSEUDO_PDF_HEADER + json.dumps({"pages": pages}).encode("utf-8")


def _text_payload(rng: random.Random, idx: int) -> bytes:
    paras = [_paragraph(rng) for _ in range(rng.randint(2, 5))]
    text = "\n\n".join(paras)
    if idx % 5 == 3:
        text = "café résumé " + text  # non-ASCII
        return text.encode("latin-1")  # exercises the encoding fallback chain
    if idx % 5 == 4:
        return ("naïve — " + text).encode("utf-8")
    return text.encode("utf-8")


def _lang(rng: random.Random) -> tuple[str, list[str] | None]:
    r = rng.random()
    if r < 0.9:
        return "en", None
    if r < 0.95:
        return "de", _DE
    return "fr", _FR


def _replica_rows(seed: int, tier: str, rep: int, suffix: str) -> list[dict]:
    """One replica's rows (seeded independently per replica — the unit
    the streaming writer generates at a time)."""
    rows: list[dict] = []
    rng = random.Random(seed * 1_000_003 + rep)
    article_payloads: list[bytes] = []
    i_global = 0
    for cat, n1, n2 in CATEGORY_COUNTS:
        n = n1 if tier == "t1" else n2
        for i in range(n):
            url = f"https://fixture.test/{cat}/{i:06d}{suffix}"
            lang, vocab = _lang(rng)
            if cat == "html-article":
                payload = _article_html(rng, vocab=vocab).encode("utf-8")
                article_payloads.append(payload)
            elif cat == "html-table":
                payload = _article_html(rng, vocab=vocab,
                                        tables=rng.randint(1, 3)).encode("utf-8")
            elif cat == "html-minimal":
                variant = i % 3
                if variant == 0:
                    payload = b"<html><body><p>short</p></body></html>"
                elif variant == 1:
                    payload = b"<html><body></body></html>"
                else:
                    payload = b"<html><body><p>   </p><p>\n\t </p></body></html>"
            elif cat == "pdf-digital":
                payload = _pdf_payload(rng, rng.randint(1, 5),
                                       with_table=(i % 4 == 0))
            elif cat == "pdf-scanned":
                payload = _pdf_payload(rng, rng.randint(1, 2), scanned=True)
            elif cat == "text-plain":
                payload = _text_payload(rng, i)
            elif cat == "dup-content":
                payload = article_payloads[i % len(article_payloads)]
            elif cat == "giant-blob":
                if i % 2 == 0:
                    payload = _article_html(rng, n_paras=400).encode("utf-8")
                else:
                    payload = _pdf_payload(rng, 3, giant=True)
            elif cat == "docx":
                payload = _docx_payload(rng)
            else:  # malformed
                variant = i % 3
                if variant == 0:
                    base = _article_html(rng).encode("utf-8")
                    payload = base[: len(base) // 2]  # truncated mid-document
                elif variant == 1:
                    payload = b"\x00\x01\x02" + bytes(rng.randrange(256) for _ in range(64))
                else:
                    payload = PSEUDO_PDF_HEADER + b"{not json!!"
            ts = BASE_TS + dt.timedelta(seconds=i_global + rep * 86400)
            rows.append({
                "url": url,
                "warc_ts": ts,
                "html": payload,
                "text": " ".join(_words(rng, 20)),
                "lang": lang,
            })
            i_global += 1
    return rows


def generate_rows(seed: int, tier: str, multiplier: int = 1) -> list[dict]:
    """All fixture rows for a tier ('t1' | 't2'), optionally replicated
    ``multiplier`` times with distinct content (seeded per replica) and
    url suffixes — the bench recipe from FIXTURES.md."""
    assert tier in ("t1", "t2")
    rows: list[dict] = []
    for rep in range(multiplier):
        suffix = "" if multiplier == 1 else f"?rep={rep}"
        rows.extend(_replica_rows(seed, tier, rep, suffix))
    return rows


PAGES_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("warc_ts", pa.timestamp("us")),
    pa.field("html", pa.large_binary()),
    pa.field("text", pa.string()),
    pa.field("lang", pa.string()),
])


def pages_table(seed: int = 0, tier: str = "t1", multiplier: int = 1) -> pa.Table:
    rows = generate_rows(seed, tier, multiplier)
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_pages_parquet(path: str, seed: int = 0, tier: str = "t1",
                        multiplier: int = 1, rows_per_file: int = 2000) -> str:
    """Write the corpus as a directory of parquet shards (multiple files so
    read_parquet parallelizes). Returns ``path``."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    # STREAM replica-by-replica: peak memory is one replica plus one
    # shard buffer, not the whole corpus (the old build-then-slice path
    # held ~8 GB for a 200x corpus and could not finish). Shard
    # contents and names are byte-identical to the old layout.
    buf: list[dict] = []
    shard = 0

    def flush(final: bool = False) -> None:
        nonlocal buf, shard
        while len(buf) >= rows_per_file or (final and buf):
            chunk, buf = buf[:rows_per_file], buf[rows_per_file:]
            pq.write_table(pa.Table.from_pylist(chunk, schema=PAGES_SCHEMA),
                           os.path.join(path, f"pages-{shard:05d}.parquet"))
            shard += 1

    for rep in range(multiplier):
        suffix = "" if multiplier == 1 else f"?rep={rep}"
        buf.extend(_replica_rows(seed, tier, rep, suffix))
        flush()
    flush(final=True)
    return path
