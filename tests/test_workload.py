"""Workload-file compatibility (reference genpatterns/genintervals formats +
run_queries consumption; utils/genpatterns.c:187-218,
utils/genintervals.c:105-119, utils/run_queries.c:315,344)."""

import os

import pytest

from full_text_index_spark import workload as W
from tests.conftest import spark  # noqa: F401


def test_patterns_file_roundtrip(tmp_path):
    pats = ["abcde", "xy z.", "Q,9!r"]
    p = str(tmp_path / "pats")
    W.write_patterns_file(p, pats, source_file="corpus.txt", forbidden="\\n")
    meta, back = W.read_patterns_file(p)
    assert back == pats
    assert meta == {
        "number": 3, "length": 5, "file": "corpus.txt", "forbidden": "\\n"
    }
    # byte-exact header (the reference fscanf format, run_queries.c:315)
    with open(p, "rb") as fh:
        head = fh.readline()
    assert head == b"# number=3 length=5 file=corpus.txt forbidden=\\n\n"
    # body is raw bytes, no separators (genpatterns.c:212-218)
    with open(p, "rb") as fh:
        fh.readline()
        assert fh.read() == b"abcdexy z.Q,9!r"


def test_patterns_file_rejects_ragged(tmp_path):
    with pytest.raises(ValueError, match="byte length"):
        W.write_patterns_file(str(tmp_path / "p"), ["abc", "abcd"])


def test_patterns_file_truncation_detected(tmp_path):
    p = str(tmp_path / "p")
    with open(p, "wb") as fh:
        fh.write(b"# number=4 length=5 file=f forbidden=\nabcde")
    with pytest.raises(ValueError, match="truncated"):
        W.read_patterns_file(p)


def test_intervals_file_roundtrip(tmp_path):
    ivls = [(0, 9), (100, 109), (55, 64)]
    p = str(tmp_path / "ivl")
    W.write_intervals_file(p, ivls, source_file="corpus.txt")
    meta, back = W.read_intervals_file(p)
    assert back == ivls
    assert meta == {"number": 3, "length": 10, "file": "corpus.txt"}
    with open(p, "rb") as fh:
        assert fh.readline() == b"# number=3 length=10 file=corpus.txt\n"
        assert fh.readline() == b"0,9\n"  # %i,%i lines (genintervals.c:114)


def test_gen_patterns_deterministic_and_hit(spark, small_docs):
    pats1 = W.gen_patterns(small_docs, length=8, number=12, seed=7)
    pats2 = W.gen_patterns(small_docs, length=8, number=12, seed=7)
    assert pats1 == pats2
    assert len(pats1) == 12 and all(len(p) == 8 for p in pats1)
    # every sampled pattern must occur in the corpus (guaranteed-hit
    # sampling is the genpatterns contract)
    texts = [r["text"] for r in small_docs.select("text").collect()]
    assert all(any(p in t for t in texts) for p in pats1)
    # a different seed produces a different workload
    assert W.gen_patterns(small_docs, length=8, number=12, seed=8) != pats1


def test_gen_patterns_forbidden(spark, small_docs):
    pats = W.gen_patterns(
        small_docs, length=6, number=10, seed=3, forbidden=" e"
    )
    assert all(" " not in p and "e" not in p for p in pats)


def test_gen_intervals_bounds():
    ivls = W.gen_intervals(total_chars=500, length=20, number=40, seed=5)
    assert len(ivls) == 40
    assert all(b - a == 19 and 0 <= a and b < 500 for a, b in ivls)
    assert ivls == W.gen_intervals(500, 20, 40, seed=5)


def test_flat_extract_matches_python_concat(spark, small_docs):
    """Differential: extract_flat_intervals == slicing the driver-side
    concatenation of texts in doc_id order (the reference's flat-file
    view), including intervals that cross document boundaries."""
    rows = sorted(
        small_docs.select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    flat = "".join(r["text"] for r in rows)
    # place one interval straddling the first doc boundary on purpose
    b0 = len(rows[0]["text"])
    ivls = [(0, 9), (b0 - 5, b0 + 4), (len(flat) - 10, len(flat) - 1), (17, 17)]
    got = {
        r["ivl_id"]: r["snippet"]
        for r in W.extract_flat_intervals(small_docs, ivls).collect()
    }
    for i, (a, b) in enumerate(ivls):
        assert got[i] == flat[a:b + 1], f"interval {i} [{a},{b}]"


def test_doc_offsets_prefix_sum(spark, small_docs):
    rows = sorted(
        small_docs.select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    expect, acc = {}, 0
    for r in rows:
        expect[r["doc_id"]] = acc
        acc += len(r["text"])
    got = {
        r["doc_id"]: r["start"] for r in W.doc_offsets(small_docs).collect()
    }
    assert got == expect


def test_workload_file_through_substring_index(spark, small_docs, tmp_path):
    """End-to-end run_queries -c analog: genpatterns → file → read →
    substring_count on the gram index; counts must equal a Python scan
    (overlapping occurrences)."""
    from full_text_index_spark.index import InvertedIndex
    from full_text_index_spark.substring import build_gram_index

    pats = W.gen_patterns(small_docs, length=7, number=8, seed=11)
    path = str(tmp_path / "pats")
    W.write_patterns_file(path, pats)
    root = str(tmp_path / "grams")
    build_gram_index(spark, small_docs, root, k=3, n_segments=2)
    idx = InvertedIndex.open(spark, root)
    got = {
        r["pattern"]: (r["n_docs_matching"], r["n_occurrences"])
        for r in W.run_patterns_file(idx, path).collect()
    }
    texts = [r["text"] for r in small_docs.select("text").collect()]

    def occ(t: str, p: str) -> int:
        n = start = 0
        while True:
            i = t.find(p, start)
            if i < 0:
                return n
            n, start = n + 1, i + 1  # overlapping, reference semantics

    for p in set(pats):
        docs_hit = sum(1 for t in texts if p in t)
        n_occ = sum(occ(t, p) for t in texts)
        assert got[p] == (docs_hit, n_occ), p


def test_patterns_file_split_multibyte_roundtrips_as_bytes(tmp_path):
    """A fixed-byte-length pattern file whose slicing splits a multi-byte
    character must ROUND-TRIP byte-exactly (VERDICT r03 #6: the reference
    format is raw bytes): the mid-char slices come back as ``bytes``,
    re-writing reproduces the identical file, and only the char-domain
    search path (decode_patterns) rejects them — with a clear error."""
    import pytest

    from full_text_index_spark.workload import (
        decode_patterns,
        read_patterns_file,
        write_patterns_file,
    )

    path = str(tmp_path / "pats")
    # header promises 2 patterns of 3 bytes; 'é' (2 bytes) straddles the
    # first boundary: b"ab\xc3" | b"\xa9cd"
    body = "abé".encode("utf-8") + b"cd"
    with open(path, "wb") as fh:
        fh.write(b"# number=2 length=3 file=x forbidden=\n")
        fh.write(body[:6])
    meta, pats = read_patterns_file(path)
    assert pats == [b"ab\xc3", b"\xa9cd"]
    out = str(tmp_path / "pats2")
    write_patterns_file(out, pats, source_file="x")
    assert open(out, "rb").read() == open(path, "rb").read()
    with pytest.raises(ValueError, match="whole-character"):
        decode_patterns(pats)


@pytest.fixture()
def utf8_docs(spark):
    """A small NON-ASCII corpus: byte and char domains genuinely differ."""
    import pandas as pd

    from full_text_index_spark.build import prepare_corpus

    pdf = pd.DataFrame({
        "url": [f"u://{i}" for i in range(8)],
        "text": [
            "café touché résumé — naïve",
            "œuvre cœur æther déjà vu",
            "plain ascii filler text here",
            "ñandú piñata jalapeño señor",
            "übermäßig schön größer grüße",
            "crème brûlée à la carte",
            "another plain ascii document",
            "păsări țânțar șosea românește",
        ],
    })
    return prepare_corpus(spark.createDataFrame(pdf)).cache()


def test_gen_patterns_utf8_byte_length(spark, utf8_docs):
    """Byte-domain sampling over a UTF-8 corpus: every pattern is exactly
    the requested BYTE length, whole-char, and actually occurs."""
    pats = W.gen_patterns(utf8_docs, length=7, number=6, seed=3)
    texts = [r["text"] for r in utf8_docs.select("text").collect()]
    assert all(len(p.encode("utf-8")) == 7 for p in pats)
    assert any(len(p) != 7 for p in pats)  # a multi-byte char made it in
    assert all(any(p in t for t in texts) for p in pats)


def test_patterns_file_utf8_roundtrip(spark, utf8_docs, tmp_path):
    pats = W.gen_patterns(utf8_docs, length=7, number=6, seed=3)
    path = str(tmp_path / "pats_utf8")
    W.write_patterns_file(path, pats, source_file="utf8corpus")
    meta, back = W.read_patterns_file(path)
    assert back == pats           # whole-char patterns decode back to str
    assert meta["length"] == 7    # BYTE length in the header
    # re-writing what we read reproduces the identical byte stream
    out = str(tmp_path / "pats_utf8_2")
    W.write_patterns_file(out, back, source_file="utf8corpus")
    assert open(out, "rb").read() == open(path, "rb").read()


def test_flat_extract_bytes_matches_python_concat(spark, utf8_docs):
    """Byte-domain flat extract over a UTF-8 corpus: offsets address the
    UTF-8 byte stream (octet_length prefix sums) and snippets are raw
    bytes — including intervals that split a multi-byte character and
    cross a doc boundary (the reference's exact semantics)."""
    rows = sorted(
        utf8_docs.select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    flat = b"".join(r["text"].encode("utf-8") for r in rows)
    b0 = len(rows[0]["text"].encode("utf-8"))
    # interval 1 straddles the first doc boundary; interval 3 starts
    # mid-character ('é' in café is bytes 3-4 → start at byte 4)
    ivls = [(0, 9), (b0 - 5, b0 + 4), (len(flat) - 10, len(flat) - 1), (4, 8)]
    got = {
        r["ivl_id"]: bytes(r["snippet"])
        for r in W.extract_flat_intervals(utf8_docs, ivls,
                                          unit="bytes").collect()
    }
    for i, (a, b) in enumerate(ivls):
        assert got[i] == flat[a:b + 1], f"interval {i} [{a},{b}]"


def test_doc_offsets_bytes(spark, utf8_docs):
    rows = sorted(
        utf8_docs.select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    expect, acc = {}, 0
    for r in rows:
        expect[r["doc_id"]] = acc
        acc += len(r["text"].encode("utf-8"))
    got = {
        r["doc_id"]: r["start"]
        for r in W.doc_offsets(utf8_docs, unit="bytes").collect()
    }
    assert got == expect
