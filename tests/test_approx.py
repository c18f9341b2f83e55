"""Approximate (edit-distance) matching: kernel exactness vs brute-force
DP, index-path == scan-path differential (the q-gram lemma must only
prune, never lose), zero-fill, and e=0 degenerating to exact search."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from full_text_index_spark.approx import (
    _distinct_threshold,
    approx_count,
    approx_locate,
    approx_positions_np,
)
from full_text_index_spark.build import prepare_corpus
from full_text_index_spark.index import InvertedIndex
from full_text_index_spark.substring import build_gram_index


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        nd = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            nd[j] = min(d[j] + 1, nd[j - 1] + 1,
                        d[j - 1] + (a[i - 1] != b[j - 1]))
        d = nd
    return d[len(b)]


def _brute_positions(pat: str, text: str, e: int) -> list[int]:
    m = len(pat)
    out = []
    for i in range(len(text)):
        best = min(
            _lev(pat, text[i:i + L]) for L in range(max(m - e, 0), m + e + 1)
        )
        if best <= e:
            out.append(i + 1)
    return out


def test_kernel_matches_brute_force_fuzz():
    rng = random.Random(1234)
    for _ in range(250):
        alpha = rng.choice(["ab", "abc", "abcd"])
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 50)))
        pat = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        e = rng.randint(0, 2)
        got = approx_positions_np(pat, text, e).tolist()
        assert got == _brute_positions(pat, text, e), (pat, text, e)


def test_threshold_formula():
    # m=8, k=3, e=1, all grams distinct: (8-3+1) - 3 = 3
    assert _distinct_threshold("abcdefgh", 3, 1) == 3
    # too short to prune at e=1
    assert _distinct_threshold("abc", 3, 1) < 1
    # duplicated gram slots lower the distinct bound: "aaaa" has 2 slots,
    # 1 distinct gram -> dup=1, T_occ = 2-3 = -1 -> -2
    assert _distinct_threshold("aaaa", 3, 1) < 1


TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a quick brawn fox jumped over a lazy dig by the river",
    "wholly unrelated content about spark shuffles and postings lists",
    "the quvck brown fax is not quite the same animal",
    "bank rivers and lazy dogs, quick quick slow",
]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(len(TEXTS)),
        "url": [f"u://{i}" for i in range(len(TEXTS))],
        "text": TEXTS,
    })
    docs = spark.createDataFrame(pdf)
    root = str(tmp_path_factory.mktemp("approxidx"))
    build_gram_index(spark, prepare_corpus(docs), root, k=3, n_segments=2,
                     block_size=8)
    return InvertedIndex.open(spark, root), docs


PATTERNS = [
    "quick brown",   # exact in 0; 1-sub variants in 1 and 3
    "lazy dog",      # exact + "lazy dig"
    "river bank",    # word order / partial
    "xyzzyqwert",    # absent even at e
    "fox",           # below prune threshold at e=1 -> scan fallback
]


def _as_sets(rows):
    out = {}
    for r in rows:
        out.setdefault((r["pattern"], r["doc_id"]), set()).add(r["cpos"])
    return out


@pytest.mark.parametrize("e", [0, 1, 2])
def test_index_path_equals_scan_path(setup, e):
    idx, docs = setup
    stats = {}
    via_index = approx_locate(idx, docs, PATTERNS, max_edits=e,
                              stats=stats).collect()
    via_scan = approx_locate(None, docs, PATTERNS, max_edits=e).collect()
    assert _as_sets(via_index) == _as_sets(via_scan)
    # and both equal brute force
    want = {}
    for p in PATTERNS:
        for i, t in enumerate(TEXTS):
            pos = _brute_positions(p, t, e)
            if pos:
                want[(p, i)] = set(pos)
    assert _as_sets(via_index) == want
    # "quick brown": 9 gram slots, all distinct -> threshold 9-3e >= 3,
    # always pruned here; "fox" (one gram slot) prunes only at e=0
    assert "quick brown" in stats["pruned"]
    if e == 0:
        assert "fox" in stats["pruned"]
    else:
        assert "fox" in stats["scanned"]


def test_count_zero_fill(setup):
    idx, docs = setup
    rows = {r["pattern"]: r for r in
            approx_count(idx, docs, PATTERNS, max_edits=1).collect()}
    assert set(rows) == set(PATTERNS)
    assert rows["xyzzyqwert"]["n_docs_matching"] == 0
    assert rows["xyzzyqwert"]["n_positions"] == 0
    assert rows["quick brown"]["n_docs_matching"] >= 2


def test_e0_equals_exact_substring(setup):
    idx, docs = setup
    got = _as_sets(
        approx_locate(idx, docs, ["quick", "the "], max_edits=0).collect()
    )
    want = {}
    for p in ["quick", "the "]:
        for i, t in enumerate(TEXTS):
            pos = [j + 1 for j in range(len(t) - len(p) + 1)
                   if t[j:j + len(p)] == p]
            if pos:
                want[(p, i)] = set(pos)
    assert got == want


def test_banded_equals_full_dp_fuzz():
    """The banded O(e·m) kernel and the band-free full DP must emit
    identical hit sets, including e >= m degeneracy, truncated tails and
    the early-exit path (VERDICT r04 #5)."""
    from full_text_index_spark.approx import (
        _approx_positions_banded,
        approx_positions_full_np,
    )

    rng = random.Random(77)
    for _ in range(300):
        alpha = rng.choice(["ab", "abc", "abcdef"])
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        pat = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
        e = rng.randint(0, 3)
        full = approx_positions_full_np(pat, text, e).tolist()
        if e < len(pat):
            banded = _approx_positions_banded(pat, text, e).tolist()
            assert banded == full, (pat, text, e)
        got = approx_positions_np(pat, text, e).tolist()
        assert got == full, (pat, text, e)


def test_anchor_starts_cover_every_hit_fuzz():
    """The position-restricted verify (r05) may only SKIP non-hits: for a
    pruned pattern (threshold >= 1), every brute-force hit start must lie
    inside the ±e expansion of the anchors {gram_char_pos − slot} built
    from ALL indexed occurrences of the pattern's k-grams — the
    edit-untouched-slot survival argument in _anchor_starts."""
    import numpy as np

    from full_text_index_spark.approx import (
        _anchor_starts,
        _distinct_threshold,
        approx_positions_np,
    )

    k = 3
    rng = random.Random(1234)
    checked = 0
    for _ in range(400):
        alpha = rng.choice(["ab", "abc", "abcd"])
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(5, 80)))
        pat = "".join(rng.choice(alpha) for _ in range(rng.randint(4, 9)))
        e = rng.randint(0, 2)
        if _distinct_threshold(pat, k, e) < 1:
            continue
        # anchors exactly as the Spark plan builds them: every text
        # occurrence of every pattern gram, at (1-based char pos − slot)
        anchors = sorted({
            i + 1 - j
            for j in range(len(pat) - k + 1)
            for i in range(len(text) - k + 1)
            if text[i:i + k] == pat[j:j + k]
        })
        full = approx_positions_np(pat, text, e).tolist()
        starts0 = _anchor_starts(anchors, e, len(text))
        restricted = approx_positions_np(pat, text, e, starts0).tolist()
        assert restricted == full, (pat, text, e, anchors)
        if full:
            checked += 1
            hit0 = np.asarray(full, dtype=np.int64) - 1
            assert np.isin(hit0, starts0).all(), (pat, text, e)
    assert checked >= 30  # the fuzz actually exercised hit-bearing cases


def test_banded_core_chunking_matches_unchunked(monkeypatch):
    """The _BANDED_CHUNK memory guard splits the start vector into
    independent sweeps; forcing a tiny chunk must not change the hit set
    (chunks are independent because each start's verdict depends only on
    its own window)."""
    import full_text_index_spark.approx as A

    rng = random.Random(913)
    for _ in range(40):
        alpha = "abc"
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(5, 80)))
        pat = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 6)))
        e = rng.randint(0, min(2, len(pat) - 1))
        want = A._approx_positions_banded(pat, text, e).tolist()
        monkeypatch.setattr(A, "_BANDED_CHUNK", 3)
        got = A._approx_positions_banded(pat, text, e).tolist()
        monkeypatch.undo()
        assert got == want, (pat, text, e)
