"""Byte-pair-encoding vocabulary induction and application.

The tokenizer-training member of the text family (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): learn
``num_merges`` BPE merges from the corpus, then encode documents with
the learned table.  Reference surface: absent (the reference is a CDC
client) — SURVEY.md §2.7 M10 / LLM-pipeline extension.

Scale shape, stated honestly:
- The distributed parts are the WORD-FREQUENCY table (per-batch
  ``value_counts`` partials through ONE keyed exchange) and the top-K
  truncation (one distributed sort of the word-count table) — at 100 TB
  neither the corpus nor per-doc rows ever funnel to the driver.
- The merge LOOP runs on the driver over the top-K word-frequency
  table.  That is the standard formulation (BPE statistics depend only
  on word forms x counts, not on document boundaries); K bounds driver
  state, and the truncation is disclosed, not silent — natural-language
  corpora put >99% of token mass in the top ~100k word forms.
- APPLY is a stateless broadcast ``map_batches``: the merge table ships
  once via ``ray.put``; encoding memoizes per DISTINCT word per worker,
  so the per-word merge scan never runs per row.

Determinism: merge ties break on (count desc, pair lexicographic asc);
the top-K cutoff sorts (count desc, word asc) — same corpus, same
merges, regardless of block layout.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_WORD_RE = re.compile(r"[a-z]+")
END = "</w>"


def _word_counts(ds: rd.Dataset, text_col: str) -> rd.Dataset:
    """Distributed (word, cnt) table: vectorized per-batch findall +
    value_counts partials, summed through one keyed exchange."""
    from .relational import keyed_reduce

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[text_col].str.lower().str.findall(_WORD_RE)
        vc = words.explode().dropna().value_counts()
        return pd.DataFrame({"word": vc.index.astype(str), "cnt": vc.to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("word", sort=False)["cnt"].sum()
        return pd.DataFrame({"word": agg.index.astype(str), "cnt": agg.to_numpy(np.int64)})

    return keyed_reduce(parts, ["word"], combine)


def learn_merges(
    word_counts: pd.DataFrame, num_merges: int
) -> list[tuple[str, str]]:
    """Classic indexed BPE learner over a (word, cnt) frame: incremental
    pair statistics — each merge touches only the words containing the
    merged pair (pair -> word-id index), not the whole vocabulary."""
    words: list[list[str]] = [
        list(w) + [END] for w in word_counts["word"].tolist()
    ]
    counts = word_counts["cnt"].to_numpy(np.int64)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = int(counts[wi])
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # min by (-count, pair asc): deterministic regardless of dict order
        (a, b), best_cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_cnt <= 0:
            break
        merges.append((a, b))
        new_sym = a + b
        for wi in list(pair_words.get((a, b), ())):
            syms = words[wi]
            c = int(counts[wi])
            # remove this word's old pair contributions
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop(p, None)
            # apply the merge within the word (left-to-right)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def train_bpe(
    ds: rd.Dataset,
    text_col: str = "text",
    num_merges: int = 200,
    top_words: int = 1 << 17,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus (see module
    docstring for the scale contract)."""
    wc = _word_counts(ds, text_col)
    top = wc.sort(["cnt", "word"], descending=[True, False]).limit(top_words)
    return learn_merges(top.to_pandas(), num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank pair first (the standard
    BPE apply order — equivalent to replaying merges in learned order)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


_WORD_MEMO_CAP = 2_000_000  # ~entries; reset beyond (bounds worker heap)
_WORD_MEMO: dict[int, dict[str, int]] = {}  # worker-global, keyed by table


def apply_bpe(
    ds: rd.Dataset,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Encode every document with a learned merge table; returns
    (id, n_words, n_bpe_tokens) per document.  The table is broadcast
    once; encoding memoizes per DISTINCT word per WORKER PROCESS — the
    memo lives in a module-global keyed by the merge table (a dict in
    the driver-built closure would be re-deserialized per task, shrinking
    the memo's scope to one task), and resets past ``_WORD_MEMO_CAP``
    entries so a huge vocabulary cannot grow a worker's heap unboundedly."""
    from .relational import broadcast_once

    get_ranks = broadcast_once(
        merges, prepare=lambda ms: {tuple(p): i for i, p in enumerate(ms)}
    )
    memo_key = hash(tuple(map(tuple, merges)))

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        ranks = get_ranks()
        memo = _WORD_MEMO.setdefault(memo_key, {})
        if len(memo) > _WORD_MEMO_CAP:
            memo.clear()
        words = batch[text_col].str.lower().str.findall(_WORD_RE)
        n_words = words.str.len().fillna(0).astype(np.int64)
        flat = words.explode().dropna()
        uniq = flat.unique()
        for w in uniq:
            if w not in memo:
                memo[w] = len(encode_word(w, ranks))
        per_word = flat.map(memo).groupby(level=0).sum()
        n_tok = per_word.reindex(batch.index, fill_value=0).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_words": n_words.to_numpy(),
                "n_bpe_tokens": n_tok.to_numpy(),
            }
        )

    return ds.map_batches(encode, batch_format="pandas")
