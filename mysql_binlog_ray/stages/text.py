"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Each is a callable class for ``map_batches(Cls, batch_format="pandas",
concurrency=N)`` — regexes/tables compiled once per actor in
``__init__``, vectorized pandas string kernels per batch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# shared ASCII word tokenizer: lowercase [a-z0-9]+ runs, with "\n" as a
# document separator that can never be part of a token.  ALL blob-trick
# tokenizations in the repo (repetition stats, term frequency,
# contamination grams) go through tokenize_with_doc_idx so the token
# definition can never silently diverge between operators that share
# oracles.
BLOB_TOKEN_RE = re.compile(r"[a-z0-9]+|\n", re.ASCII)


def tokenize_with_doc_idx(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a batch of texts in ONE ``re.findall`` pass (the blob
    trick): join all texts with ``"\\n"`` separators, tokenize once,
    recover each token's 0-based document index by counting separators.
    In-document newlines are flattened to spaces first — they are never
    part of a token, so this changes nothing except making the
    separator-based boundaries exact.  Returns ``(words, doc_idx)`` as
    object/int64 numpy arrays."""
    texts = texts.fillna("").str.lower().str.replace("\n", " ", regex=False)
    arr = np.array(BLOB_TOKEN_RE.findall("\n".join(texts)), dtype=object)
    is_sep = arr == "\n"
    doc_idx = np.cumsum(is_sep)
    return arr[~is_sep], doc_idx[~is_sep]


class TokenCounter:
    """Whitespace token count + a BPE-ish subword estimate (word chunks of
    <=4 chars + digits/punct singles), vectorized."""

    # ASCII character classes THROUGHOUT this module where a DuckDB
    # oracle exists: DuckDB's RE2 \w/\s are ASCII-only, while Python's
    # are Unicode-aware — the oracle comparison must not depend on
    # whether the corpus contains accented letters
    ASCII_WS = " \t\n\r\f\v"

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.ws = re.compile(r"\s+", re.ASCII)
        self.bpe = re.compile(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]", re.ASCII)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        # strip ASCII whitespace only (SQL: trim(text, ' \t\n\r\f\v'))
        stripped = t.str.strip(self.ASCII_WS)
        batch = batch.copy()
        # tokens = whitespace runs + 1 (matches SQL string_split_regex len)
        batch["n_tokens"] = stripped.str.count(self.ws) + 1
        batch["n_bpe_tokens"] = t.str.count(self.bpe)
        return batch


_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "por"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"},
}


class LangId:
    """n-gram/stopword heuristic language ID over {en,fr,es,de,zh}:
    CJK char ratio decides zh; otherwise the stopword-set with the most
    hits wins (ties -> first of en,fr,es,de).  Fully vectorized: one
    compiled alternation per language counted via ``str.count`` — the
    lookarounds reproduce set-membership over ``[a-zà-ÿ]+`` word runs
    exactly (word boundaries are the letter class, NOT ``\\w``: in
    "1a1" the run "a" counts as a word)."""

    LANGS = ("en", "fr", "es", "de")

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.cjk = re.compile(r"[一-鿿]")
        self.stop_res = [
            re.compile(
                r"(?<![a-zà-ÿ])(?:"
                + "|".join(sorted(_STOPWORDS[lang]))
                + r")(?![a-zà-ÿ])"
            )
            for lang in self.LANGS
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        # zh decision on the RAW text (codepoint ratio)
        zh = (t.str.count(self.cjk) / t.str.len().clip(lower=1)) > 0.05
        head = t.str.lower().str.slice(0, 2000)
        counts = np.stack(
            [head.str.count(rx).to_numpy() for rx in self.stop_res], axis=1
        )
        # first-max tie-break == the strict-> scan over en,fr,es,de
        pred = np.asarray(self.LANGS, dtype=object)[np.argmax(counts, axis=1)]
        batch = batch.copy()
        batch["pred_lang"] = np.where(zh.to_numpy(), "zh", pred)
        return batch


class QualityScorer:
    """Heuristic document quality: length, punctuation ratio, stopword
    ratio, mean word length, repetition — the standard web-corpus
    filters, fully vectorized."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # ASCII classes: the DuckDB oracle's RE2 \w is ASCII-only
        self.word = re.compile(r"\w+", re.ASCII)
        self.punct = re.compile(r"[^\w\s]", re.ASCII)
        # one compiled alternation counts every stopword occurrence as a
        # standalone \w+ run (vectorized str.count — no per-row Python)
        self.stop_re = re.compile(
            r"\b(?:" + "|".join(sorted(_STOPWORDS["en"])) + r")\b", re.ASCII
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        n_chars = t.str.len()
        n_words = t.str.count(self.word)
        n_punct = t.str.count(self.punct)
        batch = batch.copy()
        batch["q_n_chars"] = n_chars
        batch["q_punct_ratio"] = (n_punct / n_chars.clip(lower=1)).round(6)
        batch["q_mean_word_len"] = (
            (n_chars - t.str.count(r"\s")) / n_words.clip(lower=1)
        ).round(6)
        n_stop = t.str.lower().str.count(self.stop_re)
        batch["q_stop_ratio"] = (n_stop / n_words.clip(lower=1)).round(6)
        # simple score in [0,1]
        ok_len = ((n_chars >= 50) & (n_chars <= 100_000)).astype(float)
        ok_punct = (batch["q_punct_ratio"] < 0.3).astype(float)
        ok_stop = (batch["q_stop_ratio"] > 0.01).astype(float)
        batch["q_score"] = ((ok_len + ok_punct + ok_stop) / 3.0).round(6)
        return batch


class Fingerprinter:
    """Rolling-hash document fingerprint (winnowing-style): the minimum
    64-bit hash over all k-gram windows — a cheap content identity that
    survives reordering-free edits; plus a full-content hash."""

    def __init__(self, text_col: str = "text", k: int = 8) -> None:
        self.text_col = text_col
        self.k = k

    _B = np.uint64(1099511628211)

    def _fp_small(self, data: bytes) -> int:
        # docs of <= k bytes have no k-windows: fall back to the SAME
        # polynomial hash folded over all bytes (SQL-expressible, unlike
        # the blake2b this used to be — the oracle covers every doc now);
        # empty text folds to 0
        h = 0
        for b in data:
            h = (h * 1099511628211 + b) % (1 << 64)
        return h >> 1

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        k = self.k
        enc = [s.encode("utf-8", "ignore") for s in t]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        fps = np.zeros(len(enc), dtype=np.uint64)
        big = lens > k
        if big.any():
            # ONE rolling-hash pass over the whole batch's concatenated
            # bytes; windows crossing a document boundary are masked out,
            # then per-doc mins come from a single reduceat
            blob = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
            n = len(blob)
            h = np.zeros(n - k + 1, dtype=np.uint64)
            for i in range(k):
                h = h * self._B + blob[i : n - k + 1 + i]
            starts = np.zeros(len(enc), dtype=np.int64)
            starts[1:] = np.cumsum(lens)[:-1]
            doc_of = np.repeat(np.arange(len(enc)), lens)
            mx = np.uint64(0xFFFFFFFFFFFFFFFF)
            valid = doc_of[: n - k + 1] == doc_of[k - 1 :]
            h = np.where(valid, h, mx)
            # pad with MAX so every starts[] index is in range (short or
            # empty docs at the tail are overridden by _fp_small anyway)
            h = np.concatenate([h, np.full(k, mx, dtype=np.uint64)])
            mins = np.minimum.reduceat(h, starts)
            fps[big] = mins[big] >> np.uint64(1)
        for d in np.nonzero(~big)[0]:
            fps[d] = self._fp_small(enc[d])
        batch = batch.copy()
        batch["fingerprint"] = fps.astype(np.int64)
        batch["content_md5"] = t.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return batch


def term_frequency_topk(ds, text_col: str, k: int = 50):
    """Corpus-wide term frequency top-k: tokenize (lowercase ASCII
    ``[a-z0-9]+`` runs), count, return the k most frequent terms with
    deterministic (count desc, term asc) tie-break.

    Scale shape: per batch, ALL texts are joined with a separator and
    tokenized in ONE ``re.findall`` + ``np.unique`` pass (no per-row
    Python), emitting (term, n) partials — one row per distinct term per
    batch.  The vocabulary-cardinality reduce goes through ONE keyed
    exchange (``keyed_reduce``, adaptive fanout, vectorized per-partition
    sum), then the standard bounded local-top-k + tiny driver sort.
    Returns a pyarrow table (term, n)."""
    from .relational import keyed_reduce, top_k

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # corpus-wide counts don't need doc boundaries; the shared
        # tokenizer keeps the token definition identical to the other
        # blob-trick operators (object dtype guards np.unique([]) from
        # defaulting to float64 and poisoning the shuffle schema)
        toks, _ = tokenize_with_doc_idx(batch[text_col])
        terms, counts = np.unique(toks, return_counts=True)
        return pd.DataFrame(
            # explicit string dtype: an all-empty batch must still emit
            # (term: string, n: int64), not (null, int64)
            {"term": pd.array(terms, dtype="string"), "n": counts.astype(np.int64)}
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    def sum_terms(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", sort=False)["n"].sum()
        return agg.reset_index()

    totals = keyed_reduce(partials, ["term"], sum_terms)
    return top_k(totals, [("n", True), ("term", False)], k)


def tfidf_top_terms(
    ds,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    id_type: str = "int64",
):
    """Per-document top-k terms by tf-idf (the classic keyword-extraction
    / relevance-weighting step of a text-corpus pipeline).

    ``score = tf * n_docs / df`` — the raw idf quotient, computed as
    integer ``tf * n_docs`` then ONE float divide, so a SQL oracle
    (``CAST(tf*n AS DOUBLE)/df``) is bit-identical; log-idf would hang
    exactness on libm.  Ties break (score desc, term asc).

    Scale shape: (doc, term, tf) pairs are built per batch with the
    shared blob tokenizer (docs never span batches, so batch-local
    counts are exact).  ``df`` needs NO join: one keyed exchange on term
    co-locates each term's pairs, and a vectorized ``transform("size")``
    attaches the document frequency to every pair in place (pairs are
    distinct per (doc, term), so rows-per-term == df) — vocabulary is
    O(corpus), nothing is broadcast, and there is no join stage to feed.
    The final per-doc top-k is one more keyed exchange with a vectorized
    sort+head.  ``n_docs`` is the CORPUS document count (including
    token-less docs), supplied by the caller — typically the source's
    metadata row count, no extra pass.  ``id_type`` is the Arrow type
    alias of ``id_col`` (default int64) — it shapes the empty-block
    protos, which can't inspect a row."""
    from .relational import grouped_top_n, keyed_reduce, normalize_empty_blocks

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        toks, idx = tokenize_with_doc_idx(batch[text_col])
        if not len(toks):
            return pd.DataFrame(
                {
                    id_col: pd.array([], dtype=id_type),
                    "term": pd.array([], dtype="string"),
                    "tf": pd.array([], dtype="int64"),
                }
            )
        ids = batch[id_col].to_numpy()[idx]
        g = (
            pd.DataFrame({id_col: ids, "term": pd.array(toks, dtype="string")})
            .groupby([id_col, "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        g["tf"] = g["tf"].astype(np.int64)
        return g

    pairs_ds = ds.map_batches(pairs, batch_format="pandas")

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = (
            g.groupby("term", sort=False)[id_col].transform("size").astype(np.int64)
        )
        return g

    joined = keyed_reduce(pairs_ds, ["term"], attach_df)

    # the keyed exchange can emit zero-column empty blocks for group-less
    # partitions; downstream name-based column access would fail on them
    joined = normalize_empty_blocks(
        joined,
        {id_col: id_type, "term": "string", "tf": "int64", "df": "int64"},
    )

    def score(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy(zero_copy_only=False)
        dfv = b.column("df").to_numpy(zero_copy_only=False)
        s = (tf * n_docs).astype(np.float64) / dfv
        return b.append_column("score", pa.array(s))

    scored = joined.map_batches(score, batch_format="pyarrow")
    top = grouped_top_n(scored, [id_col], [("score", True), ("term", False)], k)
    # also strips pandas extension-dtype metadata so consumers see
    # canonical Arrow string blocks, not pandas "string" round-trips
    top = normalize_empty_blocks(
        top,
        {
            id_col: id_type,
            "term": "string",
            "tf": "int64",
            "df": "int64",
            "score": "float64",
        },
    )
    return top.select_columns([id_col, "term", "tf", "df", "score"])


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document word-repetition statistics (the Gopher-style
    repetition filters: `Rae et al. 2021, arXiv:2112.11446 §A1.1` uses
    duplicate-line/-n-gram fractions as quality gates): word count,
    distinct-word count, the most frequent word's count and the most
    frequent word-2-gram's count.  Counts, not fractions, so a DuckDB
    oracle matches exactly with zero float-rounding risk; callers derive
    `dup_word_frac = 1 - n_distinct_words/n_words` etc.

    Fully vectorized per batch: ONE ``re.findall`` over the batch's
    texts joined with a separator (:func:`tokenize_with_doc_idx`), doc
    boundaries recovered by counting separator tokens, then pandas
    C-kernel groupbys — no per-row Python.  Embarrassingly parallel
    (no shuffle; each doc is scored within its batch)."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        words, doc_of_word = tokenize_with_doc_idx(batch[text_col])

        n_words = np.zeros(n, dtype=np.int64)
        n_distinct = np.zeros(n, dtype=np.int64)
        top_word = np.zeros(n, dtype=np.int64)
        top_gram = np.zeros(n, dtype=np.int64)
        if len(words):
            wf = pd.DataFrame({"d": doc_of_word, "w": pd.factorize(words)[0]})
            per_word = wf.groupby(["d", "w"], sort=False).size()
            agg = per_word.groupby(level="d").agg(["sum", "size", "max"])
            di = agg.index.to_numpy()
            n_words[di] = agg["sum"].to_numpy()
            n_distinct[di] = agg["size"].to_numpy()
            top_word[di] = agg["max"].to_numpy()
            # 2-grams: consecutive word-code pairs within the same doc
            same = doc_of_word[1:] == doc_of_word[:-1]
            if same.any():
                gf = pd.DataFrame(
                    {
                        "d": doc_of_word[1:][same],
                        "a": wf["w"].to_numpy()[:-1][same],
                        "b": wf["w"].to_numpy()[1:][same],
                    }
                )
                pg = gf.groupby(["d", "a", "b"], sort=False).size()
                gm = pg.groupby(level="d").max()
                top_gram[gm.index.to_numpy()] = gm.to_numpy()
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_words": n_words,
                "n_distinct_words": n_distinct,
                "top_word_n": top_word,
                "top_2gram_n": top_gram,
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


# PII / identifier scrub presets: RE2-compatible (no lookarounds, no
# backrefs) so a DuckDB regexp_replace oracle runs the SAME pattern
PII_PRESETS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    "phone": (r"\+?\d[\d()\- ]{6,}\d\b", "[PHONE]"),
    "id": (r"#[0-9]+", "#[ID]"),
}


class Redactor:
    """Regex scrub stage (PII / identifier anonymization — the standard
    pre-training privacy pass): applies an ordered list of
    ``(pattern, replacement)`` rules to a string column and records how
    many spans were redacted per row.  Patterns compile ONCE per worker
    (callable-class contract); application is pandas vectorized
    ``str.count`` + ``str.replace``.  Rule order matters when patterns
    overlap (e.g. emails contain digits — redact emails before phones);
    rules apply sequentially, each over the previous rule's output,
    exactly like chained SQL ``regexp_replace`` calls."""

    def __init__(
        self,
        col: str,
        rules: list[str | tuple[str, str]],
        out_col: str | None = None,
        count_col: str = "n_redacted",
    ) -> None:
        self.col = col
        self.out_col = out_col or f"{col}_redacted"
        self.count_col = count_col
        self.rules = [
            (re.compile(p), r)
            for p, r in (PII_PRESETS[x] if isinstance(x, str) else x for x in rules)
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("")
        total = np.zeros(len(batch), dtype=np.int64)
        for pat, repl in self.rules:
            total += s.str.count(pat).to_numpy(dtype=np.int64)
            s = s.str.replace(pat, repl, regex=True)
        batch = batch.copy()
        batch[self.out_col] = s
        batch[self.count_col] = total
        return batch


class TextNormalizer:
    """Canonical text normalization for training corpora (map-only,
    vectorized): ASCII case-fold -> Unicode NFC -> collapse ASCII
    whitespace AND C0 control bytes to single spaces -> trim.

    ASCII-only case folding (``str.translate`` over A-Z) instead of
    ``lower()`` is deliberate: Python and DuckDB disagree on Unicode
    case mappings (``'İ'.lower()`` is ``'i'+COMBINING DOT`` in Python
    but ``'i'`` in DuckDB), so a full lower() could never carry an exact
    SQL oracle; NFC itself is identical on both sides (verified
    empirically, incl. compatibility chars like fullwidth forms, which
    NFC deliberately preserves).  The SQL twin is
    ``trim(regexp_replace(nfc_normalize(translate(t, UPPER, lower)),
    '[ \\t\\n\\r\\f\\v\\x00-\\x1f]+', ' ', 'g'), ' ')``.
    """

    _TBL = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
    )
    _WS = re.compile(r"[ \t\n\r\f\v\x00-\x1f]+")

    def __init__(self, text_col: str = "text", out_col: str = "norm_text") -> None:
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        s = s.str.translate(self._TBL).str.normalize("NFC")
        s = s.str.replace(self._WS, " ", regex=True).str.strip(" ")
        batch = batch.copy()
        batch[self.out_col] = s
        batch["n_chars_norm"] = s.str.len().to_numpy(dtype=np.int64)
        return batch


class GopherQualityFilter:
    """The Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1), map-only and fully vectorized — the
    standard pre-training corpus gate:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio ('#' chars + '...'/'…' runs) < 0.1
    - < 90% of lines start with a bullet ('-', '*', '•')
    - < 30% of lines end with an ellipsis
    - >= 80% of words contain an ASCII letter
    - >= 2 distinct Gopher stop words present

    Every emitted ratio is a SINGLE division of two exact integers, so
    the float64 is bit-identical to the SQL oracle's (no rounding
    anywhere); word = ASCII-whitespace token (shared tokenizer
    semantics); stop-word match is ASCII-case-insensitive via the same
    translate trick as :class:`TextNormalizer` (Python/DuckDB Unicode
    lower() diverge).
    """

    STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
    _WS = r"[ \t\n\r\f\v]"

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        ws = self._WS
        self.re_token_alpha = re.compile(rf"[^{ws[1:-1]}]*[A-Za-z][^{ws[1:-1]}]*")
        self.re_ws_runs = re.compile(rf"{ws}+")
        self.re_bullet = re.compile(r"(?m)^[ \t]*[-*•]")
        self.re_ellipsis_end = re.compile(r"(?m)(\.\.\.|…)$")
        self.re_stop = [
            re.compile(rf"(?:^|{ws}){w}(?:{ws}|$)") for w in self.STOPWORDS
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        stripped = s.str.strip(" \t\n\r\f\v")
        nonempty = stripped.str.len().to_numpy(dtype=np.int64) > 0
        n_words = np.where(
            nonempty,
            stripped.str.count(self.re_ws_runs).to_numpy(dtype=np.int64) + 1,
            0,
        )
        # sum of word lengths == non-whitespace chars
        n_wchars = s.str.replace(self.re_ws_runs, "", regex=True).str.len().to_numpy(np.int64)
        n_hash = s.str.count(re.escape("#")).to_numpy(np.int64)
        n_ell = s.str.count(re.escape("...")).to_numpy(np.int64) + s.str.count(
            "…"
        ).to_numpy(np.int64)
        n_lines = s.str.count("\n").to_numpy(np.int64) + (
            s.str.len().to_numpy(np.int64) > 0
        )
        n_bullet = s.str.count(self.re_bullet).to_numpy(np.int64)
        n_ell_end = s.str.count(self.re_ellipsis_end).to_numpy(np.int64)
        n_alpha = s.str.count(self.re_token_alpha).to_numpy(np.int64)
        low = s.str.translate(TextNormalizer._TBL)
        n_stop = np.zeros(len(s), dtype=np.int64)
        for pat in self.re_stop:
            # contains (first-match short-circuit), not count: only
            # presence feeds the rule
            n_stop += low.str.contains(pat, regex=True).to_numpy(dtype=np.int64)
        wd = np.maximum(n_words, 1).astype(np.float64)
        ld = np.maximum(n_lines, 1).astype(np.float64)
        mean_wl = n_wchars / wd
        symbol_ratio = (n_hash + n_ell) / wd
        bullet_ratio = n_bullet / ld
        ell_ratio = n_ell_end / ld
        alpha_ratio = n_alpha / wd
        keep = (
            (n_words >= 50)
            & (n_words <= 100_000)
            & (mean_wl >= 3.0)
            & (mean_wl <= 10.0)
            & (symbol_ratio < 0.1)
            & (bullet_ratio < 0.9)
            & (ell_ratio < 0.3)
            & (alpha_ratio >= 0.8)
            & (n_stop >= 2)
        )
        out = batch.copy()
        out["g_n_words"] = n_words
        out["g_mean_word_len"] = mean_wl
        out["g_symbol_ratio"] = symbol_ratio
        out["g_bullet_ratio"] = bullet_ratio
        out["g_ellipsis_ratio"] = ell_ratio
        out["g_alpha_ratio"] = alpha_ratio
        out["g_n_stopwords"] = n_stop
        out["g_keep"] = keep.astype(np.int64)
        return out


# ---------------------------------------------------------------------------
# content-defined chunking (Gear rolling hash — the FastCDC/dedup-storage
# boundary primitive; Xia et al., "FastCDC", USENIX ATC 2016)
# ---------------------------------------------------------------------------

_GEAR: np.ndarray | None = None


def _gear_table() -> np.ndarray:
    """Per-byte gear values = word_hash64('gear_' + chr(b)) so the SQL
    oracle reproduces them with md5_number_lower('gear_' || c) exactly
    (ASCII parity — same documented caveat as Fingerprinter)."""
    global _GEAR
    if _GEAR is None:
        from .dedup import word_hash64

        _GEAR = np.array(
            [word_hash64("gear_" + chr(b)) for b in range(256)], dtype=np.uint64
        )
    return _GEAR


def gear_chunk_stats(
    batch: "pd.DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_bits: int = 6,
) -> "pd.DataFrame":
    """Content-defined chunk boundaries per document: a cut AFTER char
    position i (1-based, i < len) whenever the Gear hash

        h_i = sum_{j=max(1, i-63)..i} G[c_j] * 2^(i-j)  (mod 2^64)

    has its low ``avg_bits`` bits zero — boundaries move WITH the
    content, so an insertion early in a document shifts at most one
    chunk instead of re-chunking everything (the property fixed-size
    chunking lacks, and why dedup storage uses CDC).  This is the pure
    boundary rule (expected chunk length 2^avg_bits); production
    min/max clamps are a caller-side post-pass and deliberately NOT
    applied here so the rule stays exactly SQL-reproducible.

    Fully vectorized: one concatenated gear array for the whole batch
    (63 zero-gear separators keep windows from crossing documents —
    zeros contribute nothing to the sum), 64 shifted adds, one boolean
    scan.  Returns (id, n_chunks, first_cut, last_cut).
    """
    encoded, cut_lists = _gear_cuts(batch[text_col].fillna("").tolist(), avg_bits)
    ids = batch[id_col].to_numpy()
    n_docs = len(encoded)
    n_chunks = np.empty(n_docs, dtype=np.int64)
    first = np.full(n_docs, -1, dtype=np.int64)
    last = np.full(n_docs, -1, dtype=np.int64)
    for d, (b, cuts) in enumerate(zip(encoded, cut_lists)):
        if len(b) == 0:
            n_chunks[d] = 0
            continue
        n_chunks[d] = len(cuts) + 1
        if len(cuts):
            first[d] = cuts[0]
            last[d] = cuts[-1]
    return pd.DataFrame(
        {
            id_col: ids.astype(np.int64),
            "n_chunks": n_chunks,
            "first_cut": first,
            "last_cut": last,
        }
    )


def _gear_cuts(
    texts: list[str], avg_bits: int
) -> tuple[list[bytes], list[np.ndarray]]:
    """ONE Gear boundary kernel for both chunk consumers: per document,
    the utf-8 bytes and the byte positions (1-based, < len) whose window
    hash has the low ``avg_bits`` bits zero.  Vectorized: one
    concatenated gear array for the whole batch (63 zero-gear separators
    keep windows from crossing documents — zeros contribute nothing to
    the sum), 64 shifted adds, one boolean scan.  Positions are BYTE
    offsets throughout; slicing/hashing must use the returned bytes,
    never the str (byte vs char offsets diverge on non-ASCII text)."""
    G = _gear_table()
    zero_gap = np.zeros(63, dtype=np.uint64)
    encoded: list[bytes] = []
    parts: list[np.ndarray] = []
    for t in texts:
        raw = t.encode()
        encoded.append(raw)
        parts.append(zero_gap)
        parts.append(G[np.frombuffer(raw, dtype=np.uint8)])
    cut_lists: list[np.ndarray] = []
    if not parts:
        return encoded, cut_lists
    g = np.concatenate(parts)
    h = g.copy()
    for k in range(1, 64):
        h[k:] += g[:-k] << np.uint64(k)  # uint64 wraparound == mod 2^64
    is_cut = (h & np.uint64((1 << avg_bits) - 1)) == 0
    pos = 0
    empty = np.empty(0, dtype=np.int64)
    for raw in encoded:
        n = len(raw)
        pos += 63  # separator
        # cuts allowed after positions 1..n-1 (never after the last byte)
        cut_lists.append(
            np.flatnonzero(is_cut[pos : pos + n - 1]) + 1 if n > 1 else empty
        )
        pos += n
    return encoded, cut_lists


def gear_chunk_rows(
    batch: "pd.DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_bits: int = 6,
) -> "pd.DataFrame":
    """Slim (chunk_hash64, chunk_len) rows under the same Gear boundary
    rule as :func:`gear_chunk_stats` (shared kernel: :func:`_gear_cuts`)
    — the input to chunk-level storage dedup.  Chunks are BYTE slices
    hashed as bytes (internally consistent for any input); on ASCII text
    that equals ``md5_number_lower(chunk)``, the SQL twin (same
    documented parity caveat as Fingerprinter).  Only hashes and lengths
    ever shuffle; chunk bodies stay in this task."""
    import hashlib as _hl

    encoded, cut_lists = _gear_cuts(batch[text_col].fillna("").tolist(), avg_bits)
    out_h: list[int] = []
    out_l: list[int] = []
    for raw, cuts in zip(encoded, cut_lists):
        n = len(raw)
        if n == 0:
            continue
        lo = 0
        for hi in [*cuts.tolist(), n]:
            out_h.append(
                int.from_bytes(_hl.md5(raw[lo:hi]).digest()[8:16], "little")
            )
            out_l.append(hi - lo)
            lo = hi
    return pd.DataFrame(
        {
            "h": np.array(out_h, dtype=np.uint64).view(np.int64)
            if out_h
            else pd.Series(dtype="int64"),
            "l": pd.Series(out_l, dtype="int64"),
        }
    )
