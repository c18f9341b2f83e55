"""Brute-force pandas BM25 oracle — the `sau` analog.

The reference trusts its uncompressed plain-suffix-array implementation as
the oracle for differential testing (reference: sau/SAu.c:253-392, usage in
utils/run_queries.c:420-422).  Ours is a 60-line pure-pandas scorer: no
Spark, no compression, no pruning — every engine result must be
rank-identical to it (docIDs exact, scores to rtol=1e-9).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from full_text_index_spark.tokenizer import tokenize_py

K1 = 1.2
B = 0.75
RANK_ROUND = 6


def bm25_oracle(
    docs: pd.DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    doc_id_col: str = "doc_id",
) -> pd.DataFrame:
    """docs: DataFrame with [doc_id, text]. queries: [(qid, terms)].
    Returns (qid, rank, doc_id, score) with the engine's tie policy."""
    toks = {int(r[doc_id_col]): tokenize_py(r["text"]) for _, r in docs.iterrows()}
    doclen = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(doclen.values()) / n
    tf = {d: Counter(t) for d, t in toks.items()}
    df_counter: Counter = Counter()
    for d, c in tf.items():
        df_counter.update(c.keys())

    rows = []
    for qid, terms in queries:
        terms = sorted(set(terms))
        scores: dict[int, float] = {}
        for t in terms:
            dft = df_counter.get(t)
            if not dft:
                continue
            idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
            for d, c in tf.items():
                f = c.get(t)
                if not f:
                    continue
                norm = k1 * (1.0 - b + b * doclen[d] / avgdl)
                scores[d] = scores.get(d, 0.0) + idf * f * (k1 + 1.0) / (f + norm)
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], RANK_ROUND), kv[0])
        )[:k]
        for r, (d, s) in enumerate(ranked, start=1):
            rows.append((qid, r, d, s))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])
