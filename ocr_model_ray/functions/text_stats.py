"""Text analysis operators over a document table (large-scale
training-data-pipeline additions; graded alongside SURVEY.md §2).

All operators are ``map_batches`` transforms: token counting and ratio
metrics use vectorized pandas string kernels; language-ID is a stopword
n-gram heuristic in an actor-pool class (patterns compiled once per
actor). Oracles: token/quality metrics have exact DuckDB SQL twins
(__ray_entry__); lang-id and fingerprints are heuristic (rows-only
checks) but deterministic.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

import ray.data as rd

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.,;:!?]")
_DIGIT = re.compile(r"[0-9]")

#: Tiny per-language stopword inventories for the n-gram/stopword
#: language heuristic (public common-word lists).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "nicht", "eine", "ich"},
    "fr": {"le", "la", "les", "et", "des", "une", "dans", "pour", "que", "pas"},
    "es": {"el", "la", "los", "y", "de", "que", "en", "un", "una", "por"},
}


def md5_hex(texts: pd.Series) -> pd.Series:
    """md5 hex per value; null-preserving like SQL's md5(NULL)=NULL
    (non-strings — None/NaN — map to None instead of raising)."""
    return texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
                     if isinstance(t, str) else None)


def deterministic_sample_batch(df: pd.DataFrame, hex_digits: int = 1,
                               keep_below: int = 4,
                               text_col: str = "text") -> pd.DataFrame:
    """Deterministic content-hash sampling: keep rows whose md5(text)
    first ``hex_digits`` hex value < ``keep_below`` (defaults: first
    nibble < 4 = a reproducible 25% sample). Shuffle-free, engine-
    independent (the SQL oracle computes the identical predicate), and
    stable across reruns/partitionings — the property a training-data
    downsampler needs."""
    hx = md5_hex(df[text_col]).str[:hex_digits]
    # null text -> null hash -> excluded, matching SQL (WHERE NULL < k
    # is not true)
    h = hx.map(lambda v: int(v, 16) if isinstance(v, str) else keep_below)
    return df[h < keep_below]


def hash_split_batch(df: pd.DataFrame, train_pct: int = 80,
                     val_pct: int = 10, id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """Deterministic train/val/test split by content hash: bucket =
    int(md5(text)[:4], 16) % 100; < train_pct -> train, < train+val ->
    val, else test. Content-keyed (not id-keyed) so exact duplicates
    land in the SAME split — the property that prevents train/eval
    leakage through dup documents. Shuffle-free, stable across reruns
    and partitionings; the SQL oracle computes the identical predicate.
    Null text -> null split (matches SQL CASE over NULL)."""
    hx = md5_hex(df[text_col]).str[:4]
    # keep object dtype: a plain .map would coerce the None bucket to
    # float NaN, and NaN<80 comparisons silently fall through to 'test'
    b = hx.map(lambda v: int(v, 16) % 100 if isinstance(v, str) else None)
    split = b.map(lambda v: None if pd.isna(v) else
                  ("train" if v < train_pct else
                   "val" if v < train_pct + val_pct else "test"))
    return pd.DataFrame({id_col: df[id_col].astype("int64"),
                         "split": split.astype(object)})


def stratified_quota_split(ds: rd.Dataset,
                           strata: "list[str]" = None,
                           quota: int = 10,
                           id_col: str = "doc_id",
                           num_buckets: int = 32) -> rd.Dataset:
    """Exact per-stratum eval-set construction: within every stratum
    (e.g. (lang, source)), the FIRST ``quota`` docs in the frozen
    content-blind order (md5(CAST(id AS VARCHAR)), id) become
    ``eval``; everything else is ``train``. Unlike ``hash_split``'s
    percentage buckets this guarantees an exact held-out count per
    stratum — the benchmark-construction primitive (fixed-size eval
    slices per language x source, reproducibly, with no global sort).

    Id-keyed by design (quota exactness); run exact/near dedup first
    if duplicate documents must not straddle the split (hash_split's
    content-keyed rule is the complementary guard).

    Output: (id_col, *strata, split). Scale shape: ONE bucketed
    exchange of (strata-hash, strata, md5, id) rows — payloads never
    move; a hot stratum costs one bucket a longer sort, never the
    driver (host_doc_cap's shape generalized to arbitrary keys).

    SQL twin: ``ROW_NUMBER() OVER (PARTITION BY strata ORDER BY
    md5(CAST(id AS VARCHAR)), id) <= quota``."""
    from .tiers import _id_md5
    from .window import hash_partitioned_window
    strata = list(strata or ["lang", "source"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        key = df[strata[0]].astype(str)
        for c in strata[1:]:
            key = key + "\x1f" + df[c].astype(str)
        sh = pd.util.hash_array(key.to_numpy(dtype=object),
                                categorize=False).view(np.int64)
        ids = df[id_col].to_numpy()
        out = pd.DataFrame({"__s": sh})
        for c in strata:
            out[c] = df[c].to_numpy()
        out["__mu"] = _id_md5(ids)
        out[id_col] = ids
        return out

    def kern(g: pd.DataFrame, new_key: pd.Series) -> pd.DataFrame:
        # g arrives sorted by (__s, *strata, __mu, id); a stratum
        # never splits across __s values, so cumcount over the true
        # strata keys IS the within-stratum md5 rank
        rank = g.groupby(strata, sort=False).cumcount()
        out = g[strata + [id_col]].copy()
        out["split"] = np.where(rank.to_numpy() < quota,
                                "eval", "train")
        return out[[id_col] + strata + ["split"]]

    return hash_partitioned_window(
        ds.map_batches(project, batch_format="pandas"),
        "__s", strata + ["__mu", id_col], kern,
        num_buckets=num_buckets)


def token_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace token count — matches SQL
    ``len(regexp_split_to_array(trim(text),'\\s+'))`` with empty guard."""
    stripped = df[text_col].str.strip()
    n = stripped.str.split().str.len().fillna(0).astype("int64")
    n[stripped == ""] = 0
    return pd.DataFrame({"doc_id": df["doc_id"], "n_tokens": n})


#: BPE-ish pre-tokenizer (GPT-2-style split classes, ASCII form so the
#: DuckDB RE2 oracle matches byte-for-byte): an optional leading space
#: glued to a run of letters, digits, or other non-space symbols.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s"


def bpe_token_count_batch(df: pd.DataFrame,
                          text_col: str = "text") -> pd.DataFrame:
    """Token count under the BPE-ish pre-tokenizer split (the
    whitespace-run fallback alternative counts pure-whitespace stretches
    as one token each, mirroring GPT-2's pre-tokenization shape).
    Vectorized str.count over the compiled pattern."""
    n = df[text_col].str.count(BPE_TOKEN_PATTERN).fillna(0).astype("int64")
    return pd.DataFrame({"doc_id": df["doc_id"], "n_bpe_tokens": n})


def quality_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality metrics: char/word counts, punctuation & digit ratios,
    mean word length. Ratios rounded to 6 (same in the SQL oracle)."""
    text = df[text_col]
    n_chars = text.str.len().astype("int64")
    words = text.str.strip().str.split()
    n_words = words.str.len().fillna(0).astype("int64")
    n_words[text.str.strip() == ""] = 0
    n_punct = text.str.count(_PUNCT).astype("int64")
    n_digit = text.str.count(_DIGIT).astype("int64")
    denom = n_chars.clip(lower=1)
    total_word_chars = words.map(lambda ws: sum(len(w) for w in ws)
                                 if isinstance(ws, list) else 0)
    # ratios are int/int divisions — bit-identical to the SQL oracle's
    # integer float-division, so no rounding is needed (or wanted:
    # rounding rationals can land exactly on round-half midpoints)
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": n_punct / denom,
        "digit_ratio": n_digit / denom,
        "avg_word_len": total_word_chars / n_words.clip(lower=1),
    })


def repetition_batch(df: pd.DataFrame,
                     text_col: str = "text") -> pd.DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
    fraction of tokens taken by the single most frequent word and by
    the most frequent word bigram, plus the duplicate-line fraction
    (1 - distinct/total lines split on newline). Highly repetitive
    machine-generated pages score near 1 and get filtered upstream of
    training. Vectorized: explode + groupby, no per-row Counter loop.
    Empty/null texts yield null fractions (matches the SQL oracle's
    join semantics); fractions are exact int/int divisions so the
    DuckDB double division is bit-identical."""
    text = df[text_col]
    idx = pd.RangeIndex(len(df))
    toks = text.str.strip().str.split()
    toks.index = idx
    n_words = toks.str.len().fillna(0).astype("int64")

    e = toks.explode().dropna()
    if len(e):
        wc = e.groupby([e.index, e]).size()
        top_word = wc.groupby(level=0).max()
    else:
        top_word = pd.Series(dtype="int64")
    top_word_frac = (top_word.reindex(idx) /
                     n_words.where(n_words > 0))

    # bigrams via a group-wise shift over the exploded tokens
    nxt = e.groupby(level=0).shift(-1)
    bi = (e + " " + nxt).dropna()
    n_bi = (n_words - 1).clip(lower=0)
    if len(bi):
        bc = bi.groupby([bi.index, bi]).size()
        top_bi = bc.groupby(level=0).max()
    else:
        top_bi = pd.Series(dtype="int64")
    top_bigram_frac = (top_bi.reindex(idx) /
                       n_bi.where(n_bi > 0))

    lines = text.str.split("\n")
    lines.index = idx
    n_lines = lines.str.len()
    n_distinct = lines.map(lambda ls: len(set(ls))
                           if isinstance(ls, list) else None)
    dup_line_frac = 1.0 - n_distinct / n_lines

    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "n_words": n_words.to_numpy(),
        "top_word_frac": top_word_frac.to_numpy(),
        "top_bigram_frac": top_bigram_frac.to_numpy(),
        "dup_line_frac": dup_line_frac.to_numpy(),
    })


#: small fixed English stopword probe shared with the SQL oracle
#: (Gopher requires >= 2 distinct "stop words" present)
GOPHER_STOPWORDS = ("the", "and", "of", "to", "in", "a", "is", "for")


def gopher_flags_batch(df: pd.DataFrame,
                       text_col: str = "text") -> pd.DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1) not already covered
    by quality/repetition: word-count bounds, mean-word-length bounds,
    alphabetic-word fraction, symbol-to-word ratio, stopword presence —
    plus the combined ``keep`` verdict. Null text is treated as ''
    (both sides coalesce), so every row gets a concrete verdict.

    Rules (flags are True when the rule PASSES):
      r_count:  50 <= n_words <= 100000
      r_wlen:   3.0 <= mean word length <= 10.0
      r_alpha:  >= 0.8 of words contain an ASCII letter
      r_symbol: (#'#' + #'...') / n_words <= 0.1
      r_stop:   >= 2 distinct probe stopwords present as tokens
    """
    text = df[text_col].fillna("")
    words = text.str.strip().str.split()
    n_words = words.str.len().fillna(0).astype("int64")
    n_words[text.str.strip() == ""] = 0
    denom = n_words.clip(lower=1)
    total_chars = words.map(lambda ws: sum(len(w) for w in ws)
                            if isinstance(ws, list) else 0)
    mean_wlen = total_chars / denom
    alpha_re = re.compile(r"[A-Za-z]")
    n_alpha = words.map(lambda ws: sum(1 for w in ws if alpha_re.search(w))
                        if isinstance(ws, list) else 0)
    alpha_frac = n_alpha / denom
    n_sym = (text.str.count("#") + text.str.count(r"\.\.\.")).astype("int64")
    sym_ratio = n_sym / denom
    stop = set(GOPHER_STOPWORDS)
    n_stop = words.map(lambda ws: len(stop & set(ws))
                       if isinstance(ws, list) else 0).astype("int64")
    r_count = (n_words >= 50) & (n_words <= 100000)
    r_wlen = (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    r_alpha = alpha_frac >= 0.8
    r_symbol = sym_ratio <= 0.1
    r_stop = n_stop >= 2
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype("int64"),
        "n_words": n_words,
        "mean_word_len": mean_wlen,
        "alpha_word_frac": alpha_frac,
        "symbol_word_ratio": sym_ratio,
        "n_stopwords": n_stop,
        "r_count": r_count, "r_wlen": r_wlen, "r_alpha": r_alpha,
        "r_symbol": r_symbol, "r_stop": r_stop,
        "keep": r_count & r_wlen & r_alpha & r_symbol & r_stop,
    })


class LangIdWorker:
    """Actor-pool language-ID (stopword-hit heuristic). State (compiled
    token pattern, stopword tables) built once per actor."""

    def __init__(self) -> None:
        self.word = re.compile(r"[a-zàâçéèêëîïôûùüÿñæœäöüß]+")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        scores = []
        for text in df["text"]:
            toks = self.word.findall(text.lower())[:200]
            best_lang, best_hits = "unknown", 0
            for lang in sorted(self.tables):  # sorted -> deterministic ties
                hits = sum(1 for t in toks if t in self.tables[lang])
                if hits > best_hits:
                    best_lang, best_hits = lang, hits
            preds.append(best_lang)
            scores.append(round(best_hits / max(1, len(toks)), 6))
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": preds,
                             "stopword_hit_ratio": scores})


def lang_id(ds: rd.Dataset,
            concurrency: int | tuple | None = None) -> rd.Dataset:
    """Language-ID stage. Default = stateless TASKS (the worker's state
    is a compiled regex + frozensets — rebuilt in microseconds, so an
    actor pool only adds ~5s spin-up); pass ``concurrency`` to pin an
    actor pool when a real model replaces the heuristic."""
    if concurrency is None:
        return ds.map_batches(LangIdWorker(), batch_format="pandas",
                              batch_size=1024)
    return ds.map_batches(LangIdWorker, batch_format="pandas",
                          batch_size=1024, concurrency=concurrency)


_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)
_ROLL_BASE = np.uint64(1099511628211)  # FNV prime


def _gram_hashes(text: str, k: int) -> np.ndarray:
    """Vectorized 64-bit rolling hashes of all character k-grams:
    h_i = sum_j byte[i+j] * base^(k-1-j) (mod 2^64, via uint64 wrap),
    finalized with a multiplicative mix. No Python loop over grams."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(data) < k:
        windows = data[None, :]
    else:
        windows = np.lib.stride_tricks.sliding_window_view(data, k)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        powers = np.empty(windows.shape[1], dtype=np.uint64)
        powers[-1] = np.uint64(1)
        for j in range(windows.shape[1] - 2, -1, -1):
            powers[j] = powers[j + 1] * _ROLL_BASE
        h = (windows.astype(np.uint64) * powers[None, :]).sum(
            axis=1, dtype=np.uint64)
        h = (h ^ (h >> np.uint64(33))) * _HASH_MULT
        h ^= h >> np.uint64(29)
    return h


def simhash64(text: str, ngram: int = 3) -> int:
    """64-bit SimHash over character n-grams (vectorized rolling-hash
    features; deterministic, no external libs)."""
    h = _gram_hashes(text, ngram)
    if len(h) == 0:
        return 0
    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(h)
    out = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return int(out)


def simhash_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "simhash_hex": df[text_col].map(lambda t: f"{simhash64(t):016x}"),
    })


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    vectorized rolling hashes over k-grams, then the min hash of each
    sliding window (leftmost-min tie-break), deduped by picked position."""
    hs = _gram_hashes(text, k)
    if len(hs) == 0:
        return []
    if len(hs) <= window:
        return [int(hs.min())]
    wins = np.lib.stride_tricks.sliding_window_view(hs, window)
    pos = wins.argmin(axis=1) + np.arange(len(wins))  # leftmost min per window
    vals = hs[pos]
    keep = np.empty(len(pos), dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]
    return [int(v) for v in vals[keep]]


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    # min/max emit as zero-padded hex: the raw uint64 values overflow
    # int64 (pandas would fall back to object dtype) and hex strings
    # hash/compare identically everywhere (DuckDB golden join included)
    fps = df[text_col].map(winnow_fingerprints)
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_fingerprints": fps.str.len().astype("int64"),
        "fingerprint_min": fps.map(lambda f: f"{min(f):016x}" if f else ""),
        "fingerprint_max": fps.map(lambda f: f"{max(f):016x}" if f else "")})


# ---------------------------------------------------------------------------
# Cleaning operators (PII scrub + normalization) — training-data
# preprocessing staples. Patterns use ASCII classes shared verbatim with
# the DuckDB RE2 oracles, and compile with re.ASCII: Python's \d and \b
# are Unicode-aware by default where RE2's are ASCII, so without the
# flag 'café192.168.0.1' would leave the IP UNSCRUBBED (é counts as a
# word char, killing the \b) and Arabic-Indic digits would match \d —
# both diverging from the oracle and the first one leaking PII.
# ---------------------------------------------------------------------------
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d() -]{7,}\d"
_PII = [(re.compile(PII_EMAIL, re.ASCII), "[EMAIL]", "n_emails"),
        (re.compile(PII_IP, re.ASCII), "[IP]", "n_ips"),
        (re.compile(PII_PHONE, re.ASCII), "[PHONE]", "n_phones")]

WS_CLASS = r"[ \t\n\r\f\v]+"
CTRL_CLASS = "[\x00-\x08\x0e-\x1f\x7f]"
_WS_EXPLICIT = re.compile(WS_CLASS)
_CTRL = re.compile(CTRL_CLASS)


def pii_scrub_batch(df: pd.DataFrame,
                    text_col: str = "text") -> pd.DataFrame:
    """Redact emails -> IPs -> phones (in that order: the email pass
    removes @-adjacent digit runs before the looser phone pattern can
    see them) with typed placeholders, plus per-kind match counts.
    Output: doc_id, scrubbed, n_emails, n_ips, n_phones."""
    out = {"doc_id": df["doc_id"]}
    s = df[text_col]
    for pat, repl, cnt_col in _PII:
        out[cnt_col] = s.str.count(pat).astype("int64")
        s = s.str.replace(pat, repl, regex=True)
    out["scrubbed"] = s
    return pd.DataFrame(out)[["doc_id", "scrubbed", "n_emails", "n_ips",
                              "n_phones"]]


def normalize_text_batch(df: pd.DataFrame,
                         text_col: str = "text") -> pd.DataFrame:
    """Unicode NFC + control-char strip + whitespace collapse + trim —
    the canonical text-normalization pass before tokenization/dedup.
    Output: doc_id, normalized, n_chars_raw, n_chars_norm."""
    import unicodedata
    raw = df[text_col]
    nfc = raw.map(lambda t: unicodedata.normalize("NFC", t))
    cleaned = (nfc.str.replace(_CTRL, "", regex=True)
               .str.replace(_WS_EXPLICIT, " ", regex=True)
               .str.strip(" "))
    return pd.DataFrame({
        "doc_id": df["doc_id"], "normalized": cleaned,
        "n_chars_raw": raw.str.len().astype("int64"),
        "n_chars_norm": cleaned.str.len().astype("int64")})


def weighted_sample_batch(df: pd.DataFrame, target_tokens: int = 64,
                          text_col: str = "text") -> pd.DataFrame:
    """Deterministic WEIGHTED sampling: keep a document with probability
    min(1, n_tokens / target_tokens) — length-proportional subsampling,
    the shape quality- or domain-weighted training mixtures use. The
    coin is a content-keyed uniform (first 8 md5 hex digits / 2^32),
    so the decision is reproducible across reruns and partitionings and
    exact duplicates sample identically. The comparison is an INTEGER
    cross-multiplication (u * target < n_tokens * 2^32) — no float
    rounding, so the SQL oracle's identical expression is bit-equal.
    Null text -> excluded (NULL < x is not true in SQL)."""
    h8 = md5_hex(df[text_col]).str[:8]
    u = h8.map(lambda v: int(v, 16) if isinstance(v, str) else None)
    stripped = df[text_col].str.strip()
    n = stripped.str.split().str.len().fillna(0).astype("int64")
    n[stripped == ""] = 0
    u = pd.array(u, dtype="Int64")
    keep = (u * int(target_tokens) < (n.to_numpy() * (1 << 32))) \
        .fillna(False).to_numpy(dtype=bool)
    out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[keep],
                        "n_tokens": n.to_numpy()[keep]})
    return out.astype({"doc_id": "int64", "n_tokens": "int64"})


#: script-class patterns (explicit codepoint ranges, NOT \p{Script}
#: properties — property tables drift across Unicode versions while a
#: literal range means the same thing in every RE2 build; both Arrow
#: and DuckDB run RE2, so counts agree bit-for-bit). Whitespace is
#: RE2's ASCII \s, the repo's frozen convention.
SCRIPT_PATTERNS: dict[str, str] = {
    "n_latin": "[A-Za-z]",
    "n_digit": "[0-9]",
    "n_cyrillic": "[Ѐ-ӿ]",
    "n_han": "[一-鿿]",
    "n_space": "[\t\n\f\r ]",
}


def script_ratio_batch(t, text_col: str = "text"):
    """Per-document script/charset composition (the RefinedWeb-style
    multilingual gate signal): counts of Latin letters, digits,
    Cyrillic, Han and ASCII whitespace codepoints plus their ratios
    over the total codepoint count. Null text counts as '' (0 chars,
    NULL ratios) — matching the SQL twin's coalesce.

    Arrow-native (``batch_format='pyarrow'``): counting runs in RE2
    via ``pc.count_substring_regex`` — the SAME regex engine DuckDB
    uses, so every count and each single IEEE ratio division is
    bit-identical to the oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    txt = t[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    cols = {"doc_id": t["doc_id"], "n_chars": pa.array(n_chars)}
    nz = n_chars > 0
    denom = np.where(nz, n_chars, 1).astype(np.float64)
    for name, pat in SCRIPT_PATTERNS.items():
        c = pc.count_substring_regex(txt, pat) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cols[name] = pa.array(c)
        cols[name.replace("n_", "") + "_ratio"] = pa.array(
            c.astype(np.float64) / denom, pa.float64(), mask=~nz)
    return pa.table(cols)


#: mojibake (double-encoded UTF-8) signature: a Latin-1 lead byte
#: glyph (\u00c3 \u00c2 \u00ce \u00cf \u00d0 \u00d1 -- the latin-1 renderings of UTF-8
#: lead bytes C3/C2/CE/CF/D0/D1) immediately followed by a codepoint
#: in the latin-1 continuation range U+0080-U+00BF. Explicit
#: codepoints (the SCRIPT_PATTERNS doctrine) so the RE2 count is
#: bit-identical between Arrow and the DuckDB twin.
MOJIBAKE_PATTERN = "[\u00c3\u00c2\u00ce\u00cf\u00d0\u00d1][\u0080-\u00bf]"


def mojibake_batch(t, text_col: str = "text"):
    """Per-document encoding-damage signal (the ftfy-style heuristic a
    web corpus needs before training: double-encoded UTF-8 shows up as
    'caf\u00c3\u00a9'): count of mojibake signature bigrams + a boolean
    flag. Null text counts as '' (0, false) -- matching the SQL twin."""
    import pyarrow as pa
    import pyarrow.compute as pc

    txt = t[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    n = pc.count_substring_regex(txt, MOJIBAKE_PATTERN) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"doc_id": t["doc_id"],
                     "n_mojibake": pa.array(n),
                     "mojibake": pa.array(n > 0)})


def repair_mojibake(texts: pd.Series) -> pd.Series:
    """Best-effort repair of double-encoded UTF-8: when a text carries
    the mojibake signature AND its latin-1 re-encode round-trips as
    valid UTF-8, return the decoded form; otherwise return the text
    unchanged (never lossy -- a failed roundtrip means the damage is
    something else). Library transform for a cleaning stage; per-row
    Python but only on the FLAGGED subset, which web-scale corpora
    keep small."""
    import re
    pat = re.compile(MOJIBAKE_PATTERN)

    def fix(x):
        if not isinstance(x, str) or not pat.search(x):
            return x
        try:
            return x.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return x

    return texts.map(fix)
