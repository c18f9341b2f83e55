"""regex_search: required-literal extraction soundness (randomized, against
Python re as the match oracle), and index-pruned vs whole-corpus-scan
differential on a real gram index."""

from __future__ import annotations

import random
import re

import pandas as pd
import pytest

from full_text_index_spark.build import prepare_corpus
from full_text_index_spark.index import InvertedIndex
from full_text_index_spark.regex_search import (
    regex_count,
    regex_docs,
    required_literal_branches,
)
from full_text_index_spark.substring import build_gram_index

TEXTS = [
    "the fast key order sort table scan merge part window",
    "spark group query row data slow small filter customer",
    "scan merge scan join batch batch batch stream window",
    "row scan row scal row sca slow join sort agg part",
    "value partition column filter key data a part batch",
    "query plan cache hit ratio scan join merge window dup",
    "aaaa bbbb aaaa batch batch window stream stream agg",
    "join hash join sort merge join broadcast join limit",
]

PATTERNS = [
    "scan (merge|join)",     # group alternation → literal "scan "
    "batch( batch)+",        # variable pure group → "batch batch"
    "window|stream",         # top-level alternation, two branch literals
    "qu[aeiou]ry",           # class splits runs → short literals "qu","ry"
    "ro[wv] sca",            # class mid-pattern
    "zzz+q",                 # required literal absent → 0 without scanning
    "[0-9]+",                # no literal → scan fallback
    "jo.n (sort|hash)",      # dot + group alternation
    "a{3,} b",               # bounded-below repetition
]


@pytest.fixture(scope="module")
def regex_setup(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(len(TEXTS)),
        "url": [f"u://{i}" for i in range(len(TEXTS))],
        "text": TEXTS,
    })
    docs = prepare_corpus(spark.createDataFrame(pdf)).cache()
    root = str(tmp_path_factory.mktemp("regexidx"))
    build_gram_index(spark, docs, root, k=3, n_segments=2, block_size=8)
    return InvertedIndex.open(spark, root), docs


def _pairs(df):
    return sorted((r["pattern"], r["doc_id"]) for r in df.collect())


def test_parser_fixed_cases():
    assert required_literal_branches("scan (merge|join)") == [["scan "]]
    assert required_literal_branches("batch( batch)+") == [
        ["batch batch", " batch"]
    ]
    assert required_literal_branches("window|stream") == [
        ["window"], ["stream"]
    ]
    assert required_literal_branches("qu[aeiou]ry") == [["qu", "ry"]]
    assert required_literal_branches(r"\bjoin\b") == [["join"]]
    assert required_literal_branches("a{3}b") == [["aaab"]]
    assert required_literal_branches(r"x\.y") == [["x.y"]]
    assert required_literal_branches("(?:sort) merge") == [["sort merge"]]
    # unprunable: optional/classes leave a branch with no required literal,
    # or the parser bails on unmodeled syntax
    assert required_literal_branches("[0-9]+") is None
    assert required_literal_branches("a|") is None
    assert required_literal_branches("(a)|b?") is None
    assert required_literal_branches(r"back\1ref") is None
    assert required_literal_branches("((a)(b") is None
    assert required_literal_branches("(?i)case") is None
    assert required_literal_branches("x(?=y)") is None


def _random_pattern(rng: random.Random, depth: int = 0) -> str:
    """Random pattern over the modeled subset (and a few unmodeled bits —
    the parser must BAIL on those, never mis-prune)."""
    n_atoms = rng.randint(1, 4)
    out = []
    for _ in range(n_atoms):
        roll = rng.random()
        if roll < 0.45:
            atom = rng.choice("abcd ")
        elif roll < 0.6:
            atom = rng.choice(["[ab]", "[^c]", ".", r"\d", r"\w"])
        elif roll < 0.75 and depth < 2:
            inner = "|".join(
                _random_pattern(rng, depth + 1)
                for _ in range(rng.randint(1, 2))
            )
            atom = f"({inner})"
        else:
            atom = rng.choice("abcd")
        if rng.random() < 0.35:
            atom += rng.choice(["*", "+", "?", "{2}", "{2,}", "{1,3}"])
        out.append(atom)
    return "".join(out)


def test_required_literals_sound_randomized():
    """Every regex match must contain every required literal of at least
    one branch — checked against Python re over random texts.  A pruning
    bug here would silently drop true matches at query time."""
    rng = random.Random(1234)
    texts = [
        "".join(rng.choice("abcd ") for _ in range(rng.randint(5, 60)))
        for _ in range(120)
    ]
    checked = 0
    for _ in range(400):
        pat = _random_pattern(rng)
        branches = required_literal_branches(pat)
        if branches is None:
            continue
        try:
            cre = re.compile(pat)
        except re.error:
            continue
        checked += 1
        for t in texts:
            if cre.search(t):
                assert any(
                    all(lit in t for lit in runs) for runs in branches
                ), f"pattern {pat!r} branches {branches} text {t!r}"
    assert checked >= 50  # the generator must actually exercise pruning


def test_index_matches_scan_differential(regex_setup):
    idx, docs = regex_setup
    stats: dict = {}
    got = _pairs(regex_docs(idx, docs, PATTERNS, stats=stats))
    want = _pairs(regex_docs(None, docs, PATTERNS))
    assert got == want
    assert len(want) > 0
    # only the literal-free pattern scanned; everything else pruned
    assert stats["scanned"] == ["[0-9]+"]
    assert set(stats["pruned"]) == set(PATTERNS) - {"[0-9]+"}


def test_absent_literal_answers_zero_without_scan(regex_setup):
    idx, docs = regex_setup
    stats: dict = {}
    out = {
        r["pattern"]: r["n_docs_matching"]
        for r in regex_count(idx, docs, ["zzz+q"], stats=stats).collect()
    }
    assert out == {"zzz+q": 0}
    assert stats["scanned"] == []          # answered from the index
    assert stats["n_candidates"] == 0      # dead branch pruned everything


def test_candidates_bounded_by_literal_selectivity(regex_setup):
    idx, docs = regex_setup
    n_docs = docs.count()
    stats: dict = {}
    got = _pairs(regex_docs(idx, docs, ["batch( batch)+"], stats=stats))
    # "batch batch" appears in 2 docs — candidates must reflect the
    # literal's selectivity, not the corpus size
    assert stats["n_candidates"] < n_docs
    assert stats["n_candidates"] == len(got) == 2


def test_count_zero_fills_and_matches_scan(regex_setup):
    idx, docs = regex_setup
    a = {
        r["pattern"]: r["n_docs_matching"]
        for r in regex_count(idx, docs, PATTERNS).collect()
    }
    b = {
        r["pattern"]: r["n_docs_matching"]
        for r in regex_count(None, docs, PATTERNS).collect()
    }
    assert a == b
    assert set(a) == set(PATTERNS)
    assert a["zzz+q"] == 0 and a["[0-9]+"] == 0
    assert a["window|stream"] >= 4
