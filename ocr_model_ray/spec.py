"""Frozen determinism spec for the extraction engine (SURVEY.md §2.8).

Pure-Python, stdlib-only functions that define EXACTLY what the engine
computes per document. Both the committed goldens and the Ray Data
stages call these same functions, so "byte-identical extracted text per
url" is a property of this module, not of the execution engine.

Semantics mirrored from the reference (citations are file:line under
/root/reference/):

* mime sniff by magic bytes        -> worker/pipeline/io_conversion.py:14-26
* empty-span skipping, conf=1.0    -> worker/pipeline/processors/pdf_processor.py:59-76
* scanned-page predicate           -> worker/pipeline/processors/pdf_processor.py:27-47
* OCR ensemble dedup + sort        -> models/ocr_models.py:174-183
* token->line region grouping @12px-> worker/pipeline/text_regions.py:9-28
* page/doc text assembly           -> worker/document_processor.py:434,474-488
* row assembly w/ provenance       -> worker/pipeline/postprocess.py:9-37
* table row/col clustering         -> worker/pipeline/tables.py:13-160
* encoding fallback chain          -> worker/document_processor.py:526-549
* summary fields                   -> worker/document_processor.py:791-845
* confidence defaults              -> worker/document_processor.py:490-500,768-789

The HTML branch (reference treats .html as plain text,
worker/document_processor.py:388) is reference-free: a
Readability/Boilerpipe-style text-density / link-density block scorer
with the thresholds frozen below (SURVEY.md §2.8 rule 7).

Nothing in this module may read the clock, use uuid/random, or depend
on dict iteration order of non-insertion-ordered inputs.
"""

from __future__ import annotations

import base64
import hashlib
import json
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Optional

SPEC_VERSION = "1.0.0"

# ----------------------------------------------------------------------------
# Frozen thresholds
# ----------------------------------------------------------------------------
REGION_Y_SPLIT = 12.0          # text_regions.py:11-27 — new region when |y_center jump| > 12
REVIEW_CONF = 0.8              # tables.py:157 — needs_review when any conf < 0.8
TABLE_ROW_MIN_THRESH = 8       # tables.py:63-65 — row split threshold max(8, 0.6*median_h)
TABLE_ROW_MEDIAN_FACTOR = 0.6
TABLE_COL_MIN_GAP = 20.0       # tables.py:125 — column gap max(20, 0.04*span)
TABLE_COL_SPAN_FACTOR = 0.04
HTML_MIN_BLOCK_CHARS = 25      # HTML branch (reference-free, frozen here)
HTML_MIN_HEADING_CHARS = 3
HTML_MAX_LINK_DENSITY = 0.33
HTML_MAX_HEADING_LINK_DENSITY = 0.2
PAGE_SEP = "\n\n"              # document_processor.py:474-488 — pages joined "\n\n"
ENCODING_CHAIN = ("utf-8", "latin-1", "cp1252", "iso-8859-1")  # document_processor.py:526-549

# Magic prefixes (io_conversion.py:14-26)
PDF_MAGIC = b"%PDF"
JPEG_MAGIC = b"\xff\xd8\xff"
PNG_MAGIC = b"\x89PNG"
ZIP_MAGIC = b"PK"

# Pseudo-container tags for fixture payloads (no pdf/image libs in env;
# the container format is ours, the *extraction semantics* are the spec'd ones).
PSEUDO_PDF_HEADER = b"%PDF-1.7\n%CURIO1\n"
PSEUDO_PNG_HEADER = b"\x89PNG\r\n\x1a\n"


# ----------------------------------------------------------------------------
# Small value types (plain dicts keep Arrow conversion trivial)
# ----------------------------------------------------------------------------
def token(text: str, x1: float, y1: float, x2: float, y2: float, conf: float) -> dict:
    return {"text": text, "x1": float(x1), "y1": float(y1),
            "x2": float(x2), "y2": float(y2), "conf": float(conf)}


@dataclass
class Region:
    rtype: str                    # line | paragraph | heading | list_item | code | quote
    tokens: list = field(default_factory=list)

    @property
    def text(self) -> str:
        return " ".join(t["text"] for t in self.tokens)

    @property
    def bbox(self) -> tuple:
        xs1 = min(t["x1"] for t in self.tokens)
        ys1 = min(t["y1"] for t in self.tokens)
        xs2 = max(t["x2"] for t in self.tokens)
        ys2 = max(t["y2"] for t in self.tokens)
        return (xs1, ys1, xs2, ys2)

    @property
    def conf(self) -> float:
        if not self.tokens:
            return 1.0
        return sum(t["conf"] for t in self.tokens) / len(self.tokens)

    @property
    def min_conf(self) -> float:
        if not self.tokens:
            return 1.0
        return min(t["conf"] for t in self.tokens)


class SimpleRegion:
    """Layout-free region (text + conf only): used by the layout=False
    fast path for branches whose synthetic bboxes carry no information
    (HTML/plain-text flow layout). Duck-types Region for
    assemble_summary; never reaches full assemble()."""
    __slots__ = ("rtype", "text", "conf")

    def __init__(self, rtype: str, text: str, conf: float = 1.0) -> None:
        self.rtype = rtype
        self.text = text
        self.conf = conf


@dataclass
class PageOut:
    page_num: int                 # 1-based
    width: int
    height: int
    is_scanned: bool
    regions: list = field(default_factory=list)   # list[Region]
    region_sep: str = " "         # pdf/ocr: " " (document_processor.py:434); html/text: "\n\n"


@dataclass
class TableOut:
    page_num: int
    bbox: tuple
    cells: list                   # list[(r, c, text, conf)]
    n_rows: int
    n_cols: int
    conf: float
    needs_review: bool


@dataclass
class DocOut:
    """Full per-document extraction result (pre-Arrow)."""
    doc_kind: str                 # html | digital_pdf | scanned_pdf | scanned_image | text | unknown
    pages: list = field(default_factory=list)     # list[PageOut]
    tables: list = field(default_factory=list)    # list[TableOut]
    error: Optional[str] = None


# ----------------------------------------------------------------------------
# MIME sniff + kind dispatch (S3 + M16 semantics)
# ----------------------------------------------------------------------------
def sniff_mime(payload: bytes) -> str:
    """Magic-number MIME sniff — io_conversion.py:14-26 order preserved."""
    if payload.startswith(PDF_MAGIC):
        return "application/pdf"
    if payload.startswith(JPEG_MAGIC):
        return "image/jpeg"
    if payload.startswith(PNG_MAGIC):
        return "image/png"
    if payload.startswith(ZIP_MAGIC):
        return "application/zip"
    head = payload[:512].lstrip()
    if head[:1] == b"<":
        return "text/html"
    return "text/plain"


def content_hash(payload: bytes) -> str:
    """sha256 hex digest — storage_manager.py:27-28."""
    return hashlib.sha256(payload).hexdigest()


def decode_text(payload: bytes) -> str:
    """Encoding fallback chain — document_processor.py:526-549.

    utf-8 first, then latin-1 (which cannot fail), preserving the
    reference's declared order utf-8 -> latin-1 -> cp1252 -> iso-8859-1.
    """
    for enc in ENCODING_CHAIN:
        try:
            return payload.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return payload.decode("utf-8", errors="replace")  # unreachable; latin-1 never fails


# ----------------------------------------------------------------------------
# OCR stub engine (deterministic function of image bytes) + ensemble rules
# ----------------------------------------------------------------------------
def ocr_stub(image_bytes: bytes) -> list[dict]:
    """Seeded stub OCR: deterministic tokens from image bytes (SURVEY.md §5.2.5).

    If the bytes are a pseudo-PNG container (PSEUDO_PNG_HEADER + JSON
    {"w","h","words":[[text,x1,y1,x2,y2,conf],...]}), emit exactly those
    words. Otherwise derive pseudo-words from sha256 of the bytes so ANY
    image input yields stable output.
    """
    if image_bytes.startswith(PSEUDO_PNG_HEADER):
        try:
            payload = json.loads(image_bytes[len(PSEUDO_PNG_HEADER):].decode("utf-8"))
            return [token(w[0], w[1], w[2], w[3], w[4], w[5]) for w in payload.get("words", [])]
        except (ValueError, UnicodeDecodeError, IndexError, TypeError):
            pass
    h = hashlib.sha256(image_bytes).digest()
    n = 1 + h[0] % 5
    toks = []
    for i in range(n):
        word = "w" + h[i * 4:i * 4 + 3].hex()
        x1 = 10.0 + 60.0 * i
        y1 = 10.0 + 20.0 * (h[i + 8] % 4)
        conf = 0.5 + (h[i + 16] % 128) / 256.0
        toks.append(token(word, x1, y1, x1 + 50.0, y1 + 14.0, round(conf, 4)))
    return toks


def _token_sort_key(t: dict) -> tuple:
    """TOTAL ordering for tokens: reading order (y1, x1) with full-field
    tie-breaks, so grouping is invariant to input permutation (§2.8.8 —
    the reference's bare (y1, x1) sort is stable-sort-order-dependent
    for coincident tokens; a total key removes the latent
    nondeterminism without changing any non-tied ordering)."""
    return (t["y1"], t["x1"], t["y2"], t["x2"], t["text"], t["conf"])


def rotate_tokens(tokens: list[dict], rotation: int, width: float,
                  height: float) -> list[dict]:
    """Rotate token boxes by 0/90/180/270 deg within a (width, height)
    page — geometry helper for the orientation sweep."""
    if rotation == 0:
        return tokens
    out = []
    for t in tokens:
        if rotation == 180:
            x1, y1 = width - t["x2"], height - t["y2"]
            x2, y2 = width - t["x1"], height - t["y1"]
        elif rotation == 90:
            x1, y1 = height - t["y2"], t["x1"]
            x2, y2 = height - t["y1"], t["x2"]
        else:  # 270
            x1, y1 = t["y1"], width - t["x2"]
            x2, y2 = t["y2"], width - t["x1"]
        out.append(token(t["text"], x1, y1, x2, y2, t["conf"]))
    return out


def ocr_rotation_sweep(image_bytes: bytes, width: float = 0.0,
                       height: float = 0.0) -> tuple[int, list[dict]]:
    """Orientation sweep (M17 — worker/model_manager.py:288-345): OCR at
    0/90/180/270 and keep the best by (avg confidence, token count),
    ties broken by the smaller rotation. With the stub engine the
    payload decodes identically at every angle, so rotation 0 wins —
    the MECHANISM (4 inferences + scoring + deterministic tie-break) is
    what a real engine plugs into. Returns (rotation_deg, tokens in the
    page's upright frame)."""
    best: tuple[float, int, int] | None = None  # (-avg_conf, -n, rotation)
    best_toks: list[dict] = []
    for rotation in (0, 90, 180, 270):
        toks = ocr_stub(image_bytes)
        if rotation and width and height:
            toks = rotate_tokens(toks, rotation, width, height)
        n = len(toks)
        avg = sum(t["conf"] for t in toks) / n if n else 0.0
        key = (-avg, -n, rotation)
        if best is None or key < best:
            best = key
            best_toks = toks
    return (best[2], best_toks)


def ensemble_merge(token_lists: list[list[dict]]) -> list[dict]:
    """OCR ensemble merge — models/ocr_models.py:174-183.

    Dedup on key (text, bbox) keeping max confidence, then sort (y1, x1).
    """
    best: dict[tuple, dict] = {}
    for toks in token_lists:
        for t in toks:
            key = (t["text"], (t["x1"], t["y1"], t["x2"], t["y2"]))
            prev = best.get(key)
            if prev is None or t["conf"] > prev["conf"]:
                best[key] = t
    return sorted(best.values(), key=_token_sort_key)


# ----------------------------------------------------------------------------
# Token -> line region grouping (M11)
# ----------------------------------------------------------------------------
def group_tokens_into_lines(tokens: list[dict]) -> list[Region]:
    """Sort (y1, x1 + total tie-break); new region when the token's
    y-center differs from the CURRENT REGION'S FIRST token's y-center by
    more than REGION_Y_SPLIT px — the anchor stays fixed while tokens
    append, exactly as text_regions.py:9-28 (``current_y`` is set only
    when a region starts), so gradually drifting lines still split."""
    if not tokens:
        return []
    toks = sorted(tokens, key=_token_sort_key)
    regions: list[Region] = []
    cur: Optional[Region] = None
    anchor_yc = None
    for t in toks:
        yc = (t["y1"] + t["y2"]) / 2.0
        if cur is None or abs(yc - anchor_yc) > REGION_Y_SPLIT:
            cur = Region(rtype="line")
            regions.append(cur)
            anchor_yc = yc
        cur.tokens.append(t)
    return regions


# ----------------------------------------------------------------------------
# Table structure from tokens (T2) — worker/pipeline/tables.py:13-160
# ----------------------------------------------------------------------------
def _tokens_in_bbox(tokens: list[dict], bbox: tuple,
                    overlap_threshold: float = 0.5) -> list[dict]:
    """Token inclusion — tables.py:299-334 `_inside`: full containment
    fast-path, else IoU (intersection over UNION of token and table
    boxes) >= 0.5."""
    bx1, by1, bx2, by2 = bbox
    out = []
    for t in tokens:
        if t["x1"] >= bx1 and t["y1"] >= by1 and t["x2"] <= bx2 and t["y2"] <= by2:
            out.append(t)
            continue
        ix1, iy1 = max(t["x1"], bx1), max(t["y1"], by1)
        ix2, iy2 = min(t["x2"], bx2), min(t["y2"], by2)
        if ix1 >= ix2 or iy1 >= iy2:
            continue
        inter = (ix2 - ix1) * (iy2 - iy1)
        t_area = (t["x2"] - t["x1"]) * (t["y2"] - t["y1"])
        box_area = (bx2 - bx1) * (by2 - by1)
        union = t_area + box_area - inter
        if union > 0 and inter / union >= overlap_threshold:
            out.append(t)
    return out


def _ward_cluster_1d(centers: list[float], t: float = 20.0) -> list[float]:
    """1-D Ward hierarchical clustering, cut at cophenetic distance ``t``
    (tables.py:233-265 uses scipy linkage(...,'ward') + fcluster
    criterion='distance'; for 1-D data Ward clusters are contiguous in
    sorted order, so agglomerating the closest adjacent pair reproduces
    the scipy dendrogram). Returns sorted cluster means."""
    if len(centers) <= 1:
        return list(centers)
    xs = sorted(centers)
    # clusters as (n, mean)
    clusters: list[tuple[int, float]] = [(1, x) for x in xs]

    def ward_dist(a: tuple[int, float], b: tuple[int, float]) -> float:
        na, ma = a
        nb, mb = b
        return ((2.0 * na * nb / (na + nb)) ** 0.5) * abs(ma - mb)

    while len(clusters) > 1:
        dists = [ward_dist(clusters[i], clusters[i + 1])
                 for i in range(len(clusters) - 1)]
        i = min(range(len(dists)), key=lambda k: dists[k])
        if dists[i] > t:
            break
        (na, ma), (nb, mb) = clusters[i], clusters[i + 1]
        clusters[i:i + 2] = [(na + nb, (na * ma + nb * mb) / (na + nb))]
    return [m for (_n, m) in clusters]


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    n = len(s)
    if n == 0:
        return 0.0
    mid = n // 2
    if n % 2 == 1:
        return s[mid]
    return (s[mid - 1] + s[mid]) / 2.0


def table_from_tokens(tokens: list[dict], bbox: tuple, page_num: int) -> Optional[TableOut]:
    """Reconstruct a row/column cell grid from tokens inside ``bbox`` —
    mirrors tables.py `extract_table_content` exactly:

    * inclusion: containment OR IoU >= 0.5 (`_inside`, tables.py:299-334);
    * tokens sorted (y1, x1) reading order (+ total tie-break, §2.8.8);
    * ROW grouping by token y-CENTER vs the row's FIRST token (anchor
      fixed), threshold ``max(8, int(0.6 * median_height))``
      (tables.py:60-86 — note the int() truncation);
    * COLUMN positions: >= 8 token centers -> 1-D Ward clustering cut at
      t=20 (tables.py:233-265); else gap clustering over sorted token
      CENTER xs with min_gap = max(20, 0.04 * center-span), comparing
      each center to the LAST element appended to the current cluster;
      positions = cluster means (tables.py:113-139);
    * CELL assignment: token center x into half-open column-midpoint
      bounds (tables.py:268-296), tokens in row order;
    * needs_review: any included token conf < 0.8 (tables.py:157).
    """
    toks = _tokens_in_bbox(tokens, bbox)
    if not toks:
        return None
    in_table = sorted(toks, key=_token_sort_key)

    heights = [t["y2"] - t["y1"] for t in in_table]
    row_thresh = max(TABLE_ROW_MIN_THRESH,
                     int(TABLE_ROW_MEDIAN_FACTOR * _median(heights)))
    rows: list[list[dict]] = []
    cur_row: list[dict] = []
    anchor_ty = None
    for t in in_table:
        ty = (t["y1"] + t["y2"]) / 2.0
        if anchor_ty is None:
            anchor_ty = ty
            cur_row.append(t)
            continue
        if abs(ty - anchor_ty) > row_thresh:
            if cur_row:
                rows.append(cur_row)
            cur_row = [t]
            anchor_ty = ty
        else:
            cur_row.append(t)
    if cur_row:
        rows.append(cur_row)

    centers = sorted((t["x1"] + t["x2"]) / 2.0 for t in in_table)
    col_positions: list[float] = []
    if len(centers) >= 8:
        col_positions = _ward_cluster_1d(centers, t=20.0)
    if not col_positions:
        span = max(1.0, centers[-1] - centers[0])
        min_gap = max(TABLE_COL_MIN_GAP, TABLE_COL_SPAN_FACTOR * span)
        clustered: list[list[float]] = [[centers[0]]]
        for c in centers[1:]:
            if abs(c - clustered[-1][-1]) > min_gap:
                clustered.append([c])
            else:
                clustered[-1].append(c)
        col_positions = [sum(cl) / len(cl) for cl in clustered]

    col_bounds = ([float("-inf")]
                  + [(a + b) / 2.0 for a, b in zip(col_positions[:-1],
                                                   col_positions[1:])]
                  + [float("inf")])
    cells: dict[tuple, list[dict]] = {}
    for r, row_toks in enumerate(rows):
        for t in row_toks:
            cx = (t["x1"] + t["x2"]) / 2.0
            for ci in range(len(col_bounds) - 1):
                if col_bounds[ci] <= cx < col_bounds[ci + 1]:
                    cells.setdefault((r, ci), []).append(t)
                    break

    cell_list = []
    for (r, c) in sorted(cells.keys()):
        ctoks = cells[(r, c)]
        text = " ".join(t["text"] for t in ctoks)
        cell_list.append((r, c, text, min(t["conf"] for t in ctoks)))
    needs_review = any(t["conf"] < REVIEW_CONF for t in in_table)
    confs = [cf for (_r, _c, _tx, cf) in cell_list]
    conf = sum(confs) / len(confs) if confs else 1.0
    return TableOut(page_num=page_num, bbox=tuple(float(v) for v in bbox),
                    cells=cell_list, n_rows=len(rows),
                    n_cols=len(col_positions), conf=conf,
                    needs_review=needs_review)


# ----------------------------------------------------------------------------
# Pseudo-PDF branch (digital span walk M2 + scanned predicate M1 + OCR A1-A4)
# ----------------------------------------------------------------------------
def parse_pseudo_pdf(payload: bytes) -> dict:
    """Parse the pseudo-PDF container: header + JSON body.

    Body: {"pages":[{"width":W,"height":H,
                     "spans":[[text,x1,y1,x2,y2,size,bold],...],
                     "image": base64-str|null,
                     "tables":[[x1,y1,x2,y2],...]}]}
    Raises ValueError on malformed payloads (-> error column).
    """
    if not payload.startswith(PDF_MAGIC):
        raise ValueError("not a pdf payload")
    idx = payload.find(b"\n%CURIO1\n")
    if idx < 0:
        raise ValueError("unsupported pdf container (no CURIO1 marker)")
    body = payload[idx + len(b"\n%CURIO1\n"):]
    try:
        doc = json.loads(body.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise ValueError(f"pdf body parse failed: {exc}") from exc
    if not isinstance(doc, dict) or "pages" not in doc:
        raise ValueError("pdf body missing pages")
    return doc


def pdf_metadata(payload: bytes) -> dict:
    """PDF metadata projection (M5, pdf_processor.py:238-274): document
    info keys plus derived flags — page_count, file_size, has_toc,
    has_links (any page with links), has_images (any page with an
    image), form_fields. The pseudo-PDF container carries ``meta``
    (title/author/...), ``toc``, per-page ``links`` and ``form_fields``
    as optional keys; absent keys mean False/empty, same as a PDF
    without them. Parse failures return {"error": ...} like the
    reference."""
    try:
        doc = parse_pseudo_pdf(payload)
    except ValueError as exc:
        return {"error": f"Failed to extract metadata: {exc}"}
    pages = doc.get("pages") or []
    meta = dict(doc.get("meta") or {})
    meta.update({
        "page_count": len(pages),
        "file_size": len(payload),
        "has_toc": bool(doc.get("toc")),
        "has_links": any(p.get("links") for p in pages),
        "has_images": any(p.get("image") is not None for p in pages),
        "form_fields": bool(doc.get("form_fields")),
    })
    return meta


def extract_pdf(payload: bytes, max_pages: int = 0, ocr=None) -> DocOut:
    """Digital/scanned PDF extraction.

    Per page (pdf_processor.py:119-164): classify scanned-vs-digital by
    span presence (pdf_processor.py:27-47); digital -> span walk dropping
    whitespace-only spans, token conf=1.0 (pdf_processor.py:59-76);
    scanned -> OCR stub + ensemble merge (ocr_models.py:174-183). Tokens
    group into line regions (text_regions.py:9-28). ``max_pages`` > 0
    caps processed pages (pdf_processor.py:188-192).
    """
    doc = parse_pseudo_pdf(payload)
    pages_in = doc["pages"]
    if max_pages and max_pages > 0:
        pages_in = pages_in[:max_pages]
    out = DocOut(doc_kind="digital_pdf")
    any_scanned = False
    for pi, page in enumerate(pages_in, start=1):
        width = int(page.get("width", 0))
        height = int(page.get("height", 0))
        spans = page.get("spans") or []
        toks = []
        for s in spans:
            text = str(s[0])
            if text.strip() == "":
                continue  # whitespace-only span skip (pdf_processor.py:61-63)
            toks.append(token(text, s[1], s[2], s[3], s[4], 1.0))
        # classify on RAW span presence (pdf_processor.py:34-45: ANY
        # span, even whitespace-only, marks the page digital); the
        # whitespace-only skip above applies only to the span WALK
        # (pdf_processor.py:61-63). A page of only-whitespace spans plus
        # an image is digital-with-empty-text, not OCR'd.
        is_scanned = len(spans) == 0 and page.get("image") is not None
        if is_scanned:
            any_scanned = True
            img = base64.b64decode(page["image"])
            toks = ensemble_merge([(ocr or ocr_stub)(img)])
        regions = group_tokens_into_lines(toks)
        out.pages.append(PageOut(page_num=pi, width=width, height=height,
                                 is_scanned=is_scanned, regions=regions,
                                 region_sep=" "))
        for tb in page.get("tables") or []:
            t = table_from_tokens(toks, tuple(tb), pi)
            if t is not None:
                out.tables.append(t)
    if any_scanned:
        out.doc_kind = "scanned_pdf"
    return out


def extract_image(payload: bytes, ocr=None) -> DocOut:
    """Standalone scanned image: OCR -> ensemble merge -> line regions."""
    toks = ensemble_merge([(ocr or ocr_stub)(payload)])
    regions = group_tokens_into_lines(toks)
    page = PageOut(page_num=1, width=0, height=0, is_scanned=True,
                   regions=regions, region_sep=" ")
    return DocOut(doc_kind="scanned_image", pages=[page])


# ----------------------------------------------------------------------------
# Plain-text branch
# ----------------------------------------------------------------------------
def extract_plain_text(payload: bytes, layout: bool = True) -> DocOut:
    """Plain text: decode with the fallback chain, split into paragraphs on
    blank lines, whitespace-normalize each paragraph. One page; regions
    join with "\\n\\n". ``layout=False`` skips synthetic token boxes
    (identical text/conf output, far less allocation)."""
    text = decode_text(payload)
    paras = [p for p in re.split(r"\n\s*\n", text) if p.strip()]
    regions = []
    for si, para in enumerate(paras):
        words = para.split()
        if not layout:
            regions.append(SimpleRegion("paragraph", " ".join(words)))
            continue
        toks = []
        x = 0.0
        y = 20.0 * si
        for w in words:
            wid = 8.0 * len(w)
            toks.append(token(w, x, y, x + wid, y + 16.0, 1.0))
            x += wid + 8.0
        r = Region(rtype="paragraph", tokens=toks)
        regions.append(r)
    page = PageOut(page_num=1, width=0, height=0, is_scanned=False,
                   regions=regions, region_sep=PAGE_SEP)
    return DocOut(doc_kind="text", pages=[page])


# ----------------------------------------------------------------------------
# HTML branch (M18; reference-free, frozen spec — SURVEY.md §2.8 rule 7)
# ----------------------------------------------------------------------------
_DROP_TAGS = frozenset({"script", "style", "nav", "header", "footer", "aside",
                        "noscript", "form", "button", "svg", "iframe", "select",
                        "template", "head"})
_FLUSH_TAGS = frozenset({"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre",
                         "blockquote", "div", "article", "section", "main",
                         "body", "ul", "ol", "br", "tr", "td", "th", "table"})
_KIND_TAGS = {"p": "paragraph", "h1": "heading", "h2": "heading", "h3": "heading",
              "h4": "heading", "h5": "heading", "h6": "heading",
              "li": "list_item", "pre": "code", "blockquote": "quote"}
_VOID_TAGS = frozenset({"br", "img", "hr", "meta", "link", "input"})


class _BlockParser(HTMLParser):
    """Streaming HTML -> (blocks, tables) with link-char accounting.

    Blocks: (kind, raw_text, link_chars) flushed at block-tag boundaries.
    Tables: cell texts per (table, row) captured inside <table>, excluded
    from main-content blocks.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str, int]] = []
        self.tables: list[list[list[tuple[int, str]]]] = []  # table -> rows -> [(colspan, text)]
        self._buf: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._link_depth = 0
        self._kind = "paragraph"
        self._table_depth = 0
        self._cell_buf: Optional[list[str]] = None
        self._cell_span = 1
        self._cur_row: Optional[list[tuple[int, str]]] = None

    def _flush(self) -> None:
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append((self._kind, text, self._link_chars))
        self._buf = []
        self._link_chars = 0
        self._kind = "paragraph"

    # -- tag handling -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_TAGS:
            if tag not in _VOID_TAGS:
                self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "table":
            self._flush()
            self._table_depth += 1
            if self._table_depth == 1:
                self.tables.append([])
            return
        if self._table_depth:
            if tag == "tr":
                self._end_cell()
                self._cur_row = []
                self.tables[-1].append(self._cur_row)
            elif tag in ("td", "th"):
                self._end_cell()
                span = 1
                for k, v in attrs:
                    if k == "colspan" and v and str(v).isdigit():
                        span = max(1, int(v))
                self._cell_buf = []
                self._cell_span = span
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag in _FLUSH_TAGS:
            self._flush()
            if tag in _KIND_TAGS:
                self._kind = _KIND_TAGS[tag]

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "table":
            self._end_cell()
            self._cur_row = None
            self._table_depth = max(0, self._table_depth - 1)
            return
        if self._table_depth:
            if tag in ("td", "th"):
                self._end_cell()
            elif tag == "tr":
                self._end_cell()
                self._cur_row = None
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag in _FLUSH_TAGS:
            self._flush()

    def _end_cell(self) -> None:
        if self._cell_buf is not None and self._cur_row is not None:
            self._cur_row.append((self._cell_span, "".join(self._cell_buf)))
        self._cell_buf = None
        self._cell_span = 1

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        if self._table_depth:
            if self._cell_buf is not None:
                self._cell_buf.append(data)
            return
        self._buf.append(data)
        if self._link_depth:
            self._link_chars += len(data.strip())

    def close(self) -> None:  # flush trailing text
        super().close()
        self._end_cell()
        self._flush()


def _keep_block(kind: str, norm_text: str, link_chars: int) -> bool:
    """Frozen main-content classification (HTML branch)."""
    n = len(norm_text)
    if n == 0:
        return False
    ld = min(1.0, link_chars / n)
    if kind == "heading":
        return n >= HTML_MIN_HEADING_CHARS and ld <= HTML_MAX_HEADING_LINK_DENSITY
    if kind == "list_item":
        return n >= HTML_MIN_BLOCK_CHARS and ld <= HTML_MAX_HEADING_LINK_DENSITY
    return n >= HTML_MIN_BLOCK_CHARS and ld <= HTML_MAX_LINK_DENSITY


# --- fast HTML tokenizer ---------------------------------------------------
# html.parser's per-character goahead() machinery is ~90% of extraction
# wall time. This scanner emits the IDENTICAL event stream
# (handle_starttag / handle_endtag / handle_data with the same
# lowercasing, attr parsing via html.parser's own attrfind_tolerant,
# unescape()d data outside raw-text elements, raw data inside
# script/style, startend = start+end) for well-formed markup, and BAILS
# (returns False -> caller reparses with html.parser) on anything
# irregular: quoted '>' in attributes, bogus '<', marked sections,
# malformed end tags, ambiguous raw-text closers. Equivalence is pinned
# by tests forcing both paths over every HTML fixture plus adversarial
# constructs; the byte-identity goldens are the final gate.
_FAST_START = re.compile(r"<([a-zA-Z][^\t\n\r\f />\x00]*)")
_FAST_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_RAW_TEXT_TAGS = ("script", "style")
_RAW_CLOSERS = {t: re.compile(r"</\s*%s" % t, re.IGNORECASE)
                for t in _RAW_TEXT_TAGS}
_COMMENT_CLOSE = re.compile(r"--\s*>")


def _fast_feed(parser: "_BlockParser", text: str) -> bool:
    """Feed ``text`` through the fast scanner. True = full event stream
    delivered; False = unsupported construct seen (parser state may be
    partial — caller must reparse on a FRESH parser)."""
    from html import unescape
    from html.parser import attrfind_tolerant
    i, n = 0, len(text)
    while i < n:
        lt = text.find("<", i)
        if lt < 0:
            parser.handle_data(unescape(text[i:]))
            return True
        if lt > i:
            parser.handle_data(unescape(text[i:lt]))
        nxt = text[lt + 1:lt + 2]
        if nxt == "!":
            if text.startswith("<!--", lt):
                # html.parser closes comments on '--\s*>' (parse_comment),
                # not only the literal '-->'
                cm = _COMMENT_CLOSE.search(text, lt + 4)
                if cm is None:
                    return False
                i = cm.end()
                continue
            end = text.find(">", lt)
            if end < 0 or "[" in text[lt:end]:  # marked section / EOF
                return False
            i = end + 1  # doctype/decl — handle_decl is a no-op here
            continue
        if nxt == "?":
            end = text.find(">", lt)
            if end < 0:
                return False
            i = end + 1  # processing instruction — no-op handler
            continue
        if nxt == "/":
            m = _FAST_END.match(text, lt)
            if not m:
                return False
            parser.handle_endtag(m.group(1).lower())
            i = m.end()
            continue
        m = _FAST_START.match(text, lt)
        if not m:
            return False  # bogus '<' — html.parser folds it into data
        tag = m.group(1).lower()
        # walk to the closing '>' with html.parser's attr grammar as a
        # tiny state machine (SEP / NAME / AFTER_EQ / UNQUOTED / QUOTED):
        # * a quote opens a value ONLY as the first sig char after '='
        #   (attrfind: \s*=+\s*('...'|"..."|unquoted)); quotes inside
        #   unquoted values (x=don't) and inside names BAIL;
        # * unquoted values eat '/', '=', quotes literally and stop at
        #   whitespace or '>' ([^>\s]*), so src=foo/ is NOT self-closing;
        # * '/' in separator/name position is a separator (/(?!>)), so
        #   the tag is self-closing iff the char before '>' is a
        #   SEPARATOR slash ('<a //>' is startend, 'a=b//>' is not);
        # * '=' at attribute-NAME position and '<' inside the tag BAIL.
        SEP, NAME, AFTER_EQ, UNQUOTED, QUOTED = 0, 1, 2, 3, 4
        j = m.end()
        state = SEP
        qch = ""
        sep_slash_at = -2
        while j < n:
            c = text[j]
            if state == QUOTED:
                if c == qch:
                    state = SEP
            elif c == ">":
                break
            elif c == "<":
                return False
            elif state == UNQUOTED:
                if c in " \t\n\r\f":
                    state = SEP
                # quotes / '=' / '/' are literal value chars here
            elif c in "\"'":
                if state == AFTER_EQ:
                    state = QUOTED
                    qch = c
                else:
                    return False  # quote in name/separator position
            elif c == "=":
                if state == NAME:
                    state = AFTER_EQ
                elif state == AFTER_EQ:
                    pass  # attrfind allows =+
                else:
                    return False  # '=' at attr-name position
            elif c == "/":
                if state == AFTER_EQ:
                    state = UNQUOTED  # '/' starts an unquoted value
                else:
                    sep_slash_at = j  # separator slash (SEP or ends NAME)
                    state = SEP
            elif c in " \t\n\r\f":
                if state == NAME:
                    state = SEP
                elif state == AFTER_EQ:
                    pass  # \s*=+\s* allows space before the value
            else:
                if state == SEP:
                    state = NAME
                elif state == AFTER_EQ:
                    state = UNQUOTED
                # NAME / UNQUOTED: stay
            j += 1
        else:
            return False
        if state == QUOTED:
            return False
        attr_chunk = text[m.end():j]
        startend = sep_slash_at == j - 1
        if startend:
            attr_chunk = attr_chunk[:-1]
        # _BlockParser reads attrs ONLY on td/th (colspan); every other
        # handler ignores them, so [] is event-equivalent there. For
        # td/th, replicate html.parser's sequential attrfind loop
        # exactly (lookbehind needs the leading separator) and bail on
        # any residue its loop would have rejected.
        attrs = []
        if tag in ("td", "th") and attr_chunk.strip():
            # skip the leading separators tagfind_tolerant consumes (the
            # attrfind lookbehind needs them BEHIND the match position)
            k = 0
            while k < len(attr_chunk) and attr_chunk[k] in " \t\n\r\f/":
                k += 1
            while k < len(attr_chunk):
                am = attrfind_tolerant.match(attr_chunk, k)
                if not am or am.end() == k:
                    break
                name = am.group(1).lower()
                value = am.group(3)
                if value is None:
                    pass
                elif value[:1] == "'" == value[-1:] or \
                        value[:1] == '"' == value[-1:]:
                    value = value[1:-1]
                if value:
                    value = unescape(value)
                attrs.append((name, value))
                k = am.end()
            if attr_chunk[k:].strip():
                return False
        if startend:
            parser.handle_startendtag(tag, attrs)
            i = j + 1
            continue
        parser.handle_starttag(tag, attrs)
        i = j + 1
        if tag in _RAW_TEXT_TAGS:
            # raw-text mode: data passes through UN-unescaped until the
            # simple matching closer; an ambiguous prefix closer
            # (</scriptx) or a non-trivial closing form bails
            cm = _RAW_CLOSERS[tag].search(text, i)
            if cm is None:
                if i < n:
                    parser.handle_data(text[i:])
                return True  # never closed: tail is raw data (parser parity)
            em = _FAST_END.match(text, cm.start())
            if em is None or em.group(1).lower() != tag:
                return False
            if cm.start() > i:
                parser.handle_data(text[i:cm.start()])
            parser.handle_endtag(tag)
            i = em.end()
    return True


def extract_html(payload: bytes, layout: bool = True) -> DocOut:
    """HTML main-content extraction (M18).

    Parse with the stdlib tolerant parser; drop nav/header/footer/aside/
    script/style subtrees; flush text runs at block boundaries;
    whitespace-normalize each block; keep blocks passing the frozen
    text-length / link-density thresholds; each kept block is a region;
    one page; regions join with "\\n\\n". <table> elements become
    TableOut grids (cells row-major, colspan advances the column index)
    and are excluded from the main text.
    """
    text = decode_text(payload)
    parser = _BlockParser()
    if _fast_feed(parser, text):
        parser._end_cell()   # close()'s own cleanup, minus the (empty)
        parser._flush()      # html.parser goahead flush
    else:  # irregular markup: reparse from scratch with html.parser
        parser = _BlockParser()
        parser.feed(text)
        parser.close()

    regions: list = []
    seq = 0
    for kind, raw, link_chars in parser.blocks:
        norm = " ".join(raw.split())
        if not _keep_block(kind, norm, link_chars):
            continue
        if not layout:
            regions.append(SimpleRegion(kind, norm))
            seq += 1
            continue
        words = norm.split()
        toks = []
        x = 0.0
        y = 20.0 * seq
        for w in words:
            wid = 8.0 * len(w)
            toks.append(token(w, x, y, x + wid, y + 16.0, 1.0))
            x += wid + 8.0
        regions.append(Region(rtype=kind, tokens=toks))
        seq += 1

    out = DocOut(doc_kind="html")
    out.pages = [PageOut(page_num=1, width=0, height=0, is_scanned=False,
                         regions=regions, region_sep=PAGE_SEP)]
    for ti, rows in enumerate(parser.tables):
        cell_list = []
        n_cols = 0
        for r, row in enumerate(rows):
            c = 0
            for span, raw in row:
                norm = " ".join(raw.split())
                cell_list.append((r, c, norm, 1.0))
                c += span
            n_cols = max(n_cols, c)
        if cell_list:
            out.tables.append(TableOut(page_num=1, bbox=(0.0, 0.0, 0.0, 0.0),
                                       cells=cell_list, n_rows=len(rows),
                                       n_cols=n_cols, conf=1.0,
                                       needs_review=False))
    return out


# ----------------------------------------------------------------------------
# DOCX branch (S6 + T5 — worker/document_processor.py:551-604 semantics:
# python-docx paragraphs + tables, reimplemented on stdlib zipfile + etree)
# ----------------------------------------------------------------------------
_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def extract_docx(payload: bytes, layout: bool = True) -> DocOut:
    """DOCX (WordprocessingML zip): paragraphs outside tables become
    regions (runs joined, whitespace-normalized, empties skipped —
    document_processor.py:560-567); <w:tbl> grids become TableOut rows of
    cell texts (document_processor.py:570-577). One page; regions join
    with "\\n\\n". Raises ValueError on non-docx zips (-> error column).
    """
    import io
    import zipfile
    import xml.etree.ElementTree as ET

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        with zf.open("word/document.xml") as f:
            root = ET.parse(f).getroot()
    except (zipfile.BadZipFile, KeyError, ET.ParseError) as exc:
        raise ValueError(f"docx parse failed: {exc}") from exc

    def para_text(p) -> str:
        return " ".join("".join(t.text or "" for t in p.iter(f"{_W_NS}t")).split())

    body = root.find(f"{_W_NS}body")
    if body is None:
        raise ValueError("docx missing body")

    regions: list = []
    tables: list[TableOut] = []
    si = 0
    for child in body:
        if child.tag == f"{_W_NS}p":
            text = para_text(child)
            if not text:
                continue
            if layout:
                toks = []
                x = 0.0
                y = 20.0 * si
                for w in text.split():
                    wid = 8.0 * len(w)
                    toks.append(token(w, x, y, x + wid, y + 16.0, 1.0))
                    x += wid + 8.0
                regions.append(Region(rtype="paragraph", tokens=toks))
            else:
                regions.append(SimpleRegion("paragraph", text))
            si += 1
        elif child.tag == f"{_W_NS}tbl":
            cells = []
            n_cols = 0
            rows = child.findall(f"{_W_NS}tr")
            for r, tr in enumerate(rows):
                for c, tc in enumerate(tr.findall(f"{_W_NS}tc")):
                    cells.append((r, c, " ".join(
                        "".join(t.text or "" for t in tc.iter(f"{_W_NS}t")).split()),
                        1.0))
                    n_cols = max(n_cols, c + 1)
            if cells:
                tables.append(TableOut(page_num=1, bbox=(0.0, 0.0, 0.0, 0.0),
                                       cells=cells, n_rows=len(rows),
                                       n_cols=n_cols, conf=1.0,
                                       needs_review=False))
    page = PageOut(page_num=1, width=0, height=0, is_scanned=False,
                   regions=regions, region_sep=PAGE_SEP)
    return DocOut(doc_kind="docx", pages=[page], tables=tables)


# ----------------------------------------------------------------------------
# Dispatch + document assembly (M13/M14/M15 + rows M12)
# ----------------------------------------------------------------------------
def extract_document(payload: bytes, max_pages: int = 0,
                     layout: bool = True, ocr=None) -> DocOut:
    """Type dispatch (S2/S3/M16) -> branch extraction. Exceptions become the
    ``error`` field on an empty DocOut (dead-letter semantics; never
    poisons a batch). ``layout=False`` is the summary fast path: HTML and
    plain-text branches skip synthetic token-box materialization (the PDF
    and OCR branches keep boxes — their geometry is real input data).
    ``ocr`` overrides the OCR engine (bytes -> token list); None = the
    deterministic seeded stub (golden-reproducible default; pass
    stages.engines.ocr_engine() for a real engine when installed)."""
    try:
        mime = sniff_mime(payload)
        if mime == "application/pdf":
            return extract_pdf(payload, max_pages=max_pages, ocr=ocr)
        if mime in ("image/png", "image/jpeg"):
            return extract_image(payload, ocr=ocr)
        if mime == "text/html":
            return extract_html(payload, layout=layout)
        if mime == "application/zip":
            return extract_docx(payload, layout=layout)
        return extract_plain_text(payload, layout=layout)
    except Exception as exc:  # noqa: BLE001 — per-row dead letter
        return DocOut(doc_kind="unknown", error=f"{type(exc).__name__}: {exc}")


def assemble(url: str, doc: DocOut) -> dict:
    """DocOut -> flat result record with byte-identity text + char spans.

    extracted_text = page texts joined with "\\n\\n", final .strip()
    (document_processor.py:474-488); page text = region texts joined with
    the branch's region_sep (" " for pdf/ocr per document_processor.py:434,
    "\\n\\n" for html/text). Region char spans index into extracted_text;
    the strip() offset is accounted for exactly.
    """
    page_texts = []
    # (page_idx, region_idx, start_in_unstripped, end) computed as we build
    spans: list[tuple[int, int, int, int]] = []
    offset = 0
    for pidx, page in enumerate(doc.pages):
        if pidx > 0:
            offset += len(PAGE_SEP)
        parts = []
        for ridx, region in enumerate(page.regions):
            if ridx > 0:
                offset += len(page.region_sep)
            rtext = region.text
            spans.append((pidx, ridx, offset, offset + len(rtext)))
            parts.append(rtext)
            offset += len(rtext)
        page_texts.append(page.region_sep.join(parts))
    unstripped = PAGE_SEP.join(page_texts)
    extracted_text = unstripped.strip()
    lead = len(unstripped) - len(unstripped.lstrip())

    regions_out = []
    rows_out = []
    row_n = 0
    for (pidx, ridx, start, end) in spans:
        page = doc.pages[pidx]
        region = page.regions[ridx]
        rid = f"{url}#p{page.page_num}:r{ridx}"
        cs = max(0, start - lead)
        ce = max(0, end - lead)
        bbox = region.bbox if region.tokens else (0.0, 0.0, 0.0, 0.0)
        regions_out.append({
            "region_id": rid, "type": region.rtype, "page": page.page_num,
            "x1": bbox[0], "y1": bbox[1], "x2": bbox[2], "y2": bbox[3],
            "text": region.text, "char_start": cs, "char_end": ce,
            "conf": region.conf,
            "needs_review": region.min_conf < REVIEW_CONF,
        })
        # Row assembly (postprocess.py:9-37): blank rows skipped, ids row_N
        # 1-based, provenance confidence = min token conf (default 1.0).
        if region.text.strip():
            row_n += 1
            rows_out.append({
                "row_id": f"row_{row_n}", "page": page.page_num,
                "region_id": rid,
                "bbox": [float(b) for b in bbox],
                "text": region.text,
                "min_conf": region.min_conf,
                "needs_review": region.min_conf < REVIEW_CONF,
            })

    tables_out = []
    for ti, t in enumerate(doc.tables):
        tables_out.append({
            "table_id": f"{url}#t{ti}", "page": t.page_num,
            "x1": t.bbox[0], "y1": t.bbox[1], "x2": t.bbox[2], "y2": t.bbox[3],
            "n_rows": t.n_rows, "n_cols": t.n_cols,
            "cells": [{"r": r, "c": c, "text": tx, "conf": cf}
                      for (r, c, tx, cf) in t.cells],
            "conf": t.conf, "needs_review": t.needs_review,
        })

    # document confidence: FLAT mean over every token/span confidence
    # (document_processor.py:490-500 averages block confidences, one per
    # span; :768-789 averages OCR items — both flat, not mean-of-region-
    # means); native-text default 1.0, error default 0.0
    conf_sum = 0.0
    n_conf = 0
    for page in doc.pages:
        for region in page.regions:
            for t in getattr(region, "tokens", ()):
                conf_sum += t["conf"]
                n_conf += 1
    if doc.error is not None:
        confidence = 0.0
    elif n_conf:
        confidence = conf_sum / n_conf
    else:
        confidence = 1.0

    return {
        "url": url,
        "extracted_text": extracted_text,
        "doc_kind": doc.doc_kind,
        "n_pages": len(doc.pages),
        "confidence": confidence,
        "word_count": len(extracted_text.split()),   # document_processor.py:791-845
        "char_count": len(extracted_text),
        "table_count": len(tables_out),
        "region_count": len(regions_out),
        "error": doc.error,
        "pages": [{"page_num": p.page_num, "width": p.width, "height": p.height,
                   "is_scanned": p.is_scanned, "n_regions": len(p.regions)}
                  for p in doc.pages],
        "regions": regions_out,
        "rows": rows_out,
        "tables": tables_out,
    }


def assemble_summary(url: str, doc: DocOut) -> dict:
    """Summary-only assembly: identical extracted_text / counts /
    confidence as assemble(), but no per-region dict materialization —
    the hot path for pipelines that only consume text + stats (the
    nested layout columns are a projection concern; computing them for
    a consumer that drops them wastes allocator bandwidth)."""
    page_texts = []
    conf_sum = 0.0
    n_conf = 0
    n_regions = 0
    for page in doc.pages:
        parts = []
        for region in page.regions:
            parts.append(region.text)
            n_regions += 1
            tokens = getattr(region, "tokens", None)
            if tokens is None:  # SimpleRegion fast path: uniform conf
                conf_sum += region.conf
                n_conf += 1
            else:
                for t in tokens:
                    conf_sum += t["conf"]
                    n_conf += 1
        page_texts.append(page.region_sep.join(parts))
    extracted_text = PAGE_SEP.join(page_texts).strip()
    if doc.error is not None:
        confidence = 0.0
    elif n_conf:
        confidence = conf_sum / n_conf
    else:
        confidence = 1.0
    return {
        "url": url,
        "extracted_text": extracted_text,
        "doc_kind": doc.doc_kind,
        "n_pages": len(doc.pages),
        "confidence": confidence,
        "word_count": len(extracted_text.split()),
        "char_count": len(extracted_text),
        "table_count": len(doc.tables),
        "region_count": n_regions,
        "error": doc.error,
    }


def extract_and_assemble(url: str, payload: bytes, max_pages: int = 0) -> dict:
    """The one-call per-document spec: payload bytes -> full result record."""
    return assemble(url, extract_document(payload, max_pages=max_pages))
