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
    hits wins (ties -> 'en')."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.word = re.compile(r"[a-zà-ÿ]+")
        self.cjk = re.compile(r"[一-鿿]")

    def _score(self, text: str) -> str:
        if text and len(self.cjk.findall(text)) / max(1, len(text)) > 0.05:
            return "zh"
        words = self.word.findall(text.lower()[:2000])
        best, best_n = "en", 0
        for lang, sw in _STOPWORDS.items():
            n = sum(1 for w in words if w in sw)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["pred_lang"] = batch[self.text_col].fillna("").map(self._score)
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

    def _fp(self, text: str) -> int:
        data = text.encode("utf-8", "ignore")
        k = self.k
        if len(data) <= k:
            h = hashlib.blake2b(data, digest_size=8).digest()
            return int.from_bytes(h, "big") >> 1
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        # polynomial rolling hash over k-byte windows, vectorized
        h = np.zeros(len(arr) - k + 1, dtype=np.uint64)
        B = np.uint64(1099511628211)
        for i in range(k):
            h = h * B + arr[i : len(arr) - k + 1 + i]
        return int(h.min() >> np.uint64(1))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        batch = batch.copy()
        batch["fingerprint"] = t.map(self._fp)
        batch["content_md5"] = t.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return batch
