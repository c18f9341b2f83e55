"""Invariant tests for the pipeline operators (dedup / similarity /
textstats / multimodal). Cross-engine value parity is covered by
tools/parity_check.py; these check the algorithmic properties."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from full_text_index_spark.functions import dedup as D
from full_text_index_spark.functions import multimodal as MM
from full_text_index_spark.functions import similarity as S
from full_text_index_spark.functions import textstats as TS
from full_text_index_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today", "en"),  # near dup
        (4, "der hund und die katze sind nicht da", "de"),
        (5, "le chat est une belle surprise et la vie", "fr"),
        (6, "completely different words about spark engines", "en"),
        (7, "zz yy xx ww vv uu tt ss", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in D.exact_dedup(docs).collect()}
    assert out[2]["canonical_id"] == 1 and out[2]["is_duplicate"]
    assert out[1]["canonical_id"] == 1 and not out[1]["is_duplicate"]
    assert out[1]["group_size"] == 2
    assert out[3]["group_size"] == 1 and not out[3]["is_duplicate"]


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r for r in
             D.ngram_jaccard_pairs(docs, k=3, min_jaccard=0.2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)]["jaccard_i"] == 10_000  # identical
    assert (1, 3) in pairs and 0 < pairs[(1, 3)]["jaccard_i"] < 10_000
    assert all(a < b for a, b in pairs)


def test_minhash_lsh_candidates(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs            # identical docs share every band
    assert (1, 7) not in pairs        # disjoint docs share none


def test_minhash_lsh_partial_band_not_dropped(spark):
    """When bands does not divide n_funcs, the trailing funcs form a short
    band (matching the oracle's j // rpb banding) instead of being dropped:
    identical docs agree on ALL ceil(n_funcs/rpb) band slots, including the
    partial one — 10 funcs / 4 bands = rpb 2 -> 5 slots, not 4."""
    a = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame([(1, a), (2, a)], "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["n_bands_shared"] for r in
             D.minhash_lsh_pairs(docs, n_funcs=10, bands=4).collect()}
    assert pairs[(1, 2)] == 5


def test_minhash_lsh_rejects_bad_band_count(docs):
    with pytest.raises(ValueError, match="bands must satisfy"):
        D.minhash_lsh_pairs(docs, n_funcs=16, bands=32)
    with pytest.raises(ValueError, match="bands must satisfy"):
        D.minhash_lsh_pairs(docs, n_funcs=16, bands=0)


def test_minhash_is_jaccard_estimator(spark):
    """Minhash agreement rate ≈ true Jaccard (within a loose tolerance)."""
    a = " ".join(f"w{i}" for i in range(60))
    b = " ".join(f"w{i}" for i in range(30, 90))  # 3-shingle overlap ~ 28/86
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    sig = D.minhash_signatures(docs, n_funcs=64).toPandas()
    piv = sig.pivot(index="j", columns="doc_id", values="minhash")
    agree = float((piv[1] == piv[2]).mean())
    sh_a = {" ".join([f"w{i+k}" for k in range(3)]) for i in range(58)}
    sh_b = {" ".join([f"w{i+k}" for k in range(3)]) for i in range(30, 88)}
    true_j = len(sh_a & sh_b) / len(sh_a | sh_b)
    assert abs(agree - true_j) < 0.25


def test_simhash_hamming_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sh[1] == sh[2]  # identical docs → identical simhash
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[7]).count("1")
    assert ham_near < ham_far
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             D.simhash_near_pairs(docs, max_hamming=0).collect()}
    assert pairs.get((1, 2)) == 0


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    rows = [(i, vecs[i].tolist(), 0) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = S.cosine_topk(emb, [0], k=5).toPandas()
    v = vecs.astype(np.float64)
    sims = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    expect = np.argsort(-np.floor(sims * 10_000))[:5]
    assert out["vec_id"].tolist() == [int(i) for i in expect]


def test_lsh_topk_subset_of_brute(spark):
    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    rows = [(i, vecs[i].tolist(), 0) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    brute = S.cosine_topk(emb, [3], k=200).toPandas()
    lsh = S.lsh_cosine_topk(emb, [3], k=200, n_planes=4).toPandas()
    # LSH candidates are a subset, with identical sims for shared vec_ids
    merged = lsh.merge(brute, on="vec_id", suffixes=("_l", "_b"))
    assert len(lsh) <= len(brute) and len(lsh) > 0
    assert (merged["sim_i_l"] == merged["sim_i_b"]).all()


def test_ivf_topk_subset_of_brute(spark):
    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    rows = [(i, vecs[i].tolist(), 0) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    brute = S.cosine_topk(emb, [7], k=300).toPandas()
    ivf = S.ivf_cosine_topk(emb, [7], k=300, n_centroids=8, nprobe=3).toPandas()
    merged = ivf.merge(brute, on="vec_id", suffixes=("_i", "_b"))
    assert 0 < len(ivf) < len(brute)  # probing prunes, but finds candidates
    assert (merged["sim_i_i"] == merged["sim_i_b"]).all()  # exact re-rank
    # recall sanity: isotropic gaussian data gives ~nprobe/n_centroids
    # recall (no cluster structure) — at least the expected share survives
    top3 = set(brute.head(3)["vec_id"])
    assert len(top3 & set(ivf["vec_id"])) >= 1


LANG_SENTENCES = {
    "en": ["the quick brown fox is jumping over the lazy dog and the cat",
           "reading and writing are the things that make learning interesting",
           "the children are playing in the park and singing all day"],
    "de": ["der hund und die katze sind schön und ich singe ein lied",
           "ich möchte ein buch über die geschichte der deutschen sprache",
           "die kinder spielen im garten und der vater kocht ein essen"],
    "fr": ["les enfants que je vois mangent du pain et elle était contente",
           "les livres que nous lisons sont intéressants et elle les aimait",
           "le gouvernement a annoncé que les écoles resteraient ouvertes"],
    "es": ["los niños están jugando en el parque y cantando una canción",
           "la organización ha confirmado el resultado de la votación",
           "estamos celebrando la reunión en el salón principal"],
    "it": ["gli amici della ragazza hanno una canzone che piace a tutti",
           "la situazione della regione è migliorata con la nuova direzione",
           "gli studenti hanno fatto una bella presentazione del progetto"],
    "pt": ["a canção dos meninos é bonita e eles estão no parquinho",
           "a informação sobre a eleição chegou em boa situação",
           "o carrinho do menininho ficou em casa com a televisão"],
    "nl": ["het meisje heeft een mooi huis en de jongen gaat naar school",
           "het weer is vandaag een beetje raar maar wij gaan naar buiten",
           "een oude boom staat naast het huis aan de waterkant"],
    "sv": ["och sedan gick vi till staden för att handla mat på torget",
           "det är en vacker dag och jag vill åka till sjön för att bada",
           "för att lyckas måste man arbeta hårt och det vet alla"],
    "pl": ["dzieci bawią się w parku i śpiewają piosenki których nie znam",
           "nie wiem czego oczekiwać od nowego rządu i jego polityki",
           "w tym regionie nie ma dobrych dróg ani szybkiego internetu"],
    "tr": ["çocuklar parkta oynuyor ve bir şarkı söylüyorlar bugün",
           "öğrenciler yarın bir sınava giriyor ve çok çalışıyorlar",
           "bir kitap okuyordum ve kahvemi içiyordum akşam saatlerinde"],
}


def test_lang_id_accuracy_10_languages(spark):
    """Char-trigram profiles over 10 languages: ≥90% accuracy on a natural
    multilingual fixture; gibberish → 'und'."""
    rows, i = [], 0
    for lang, sents in sorted(LANG_SENTENCES.items()):
        for s in sents:
            rows.append((i, s, lang))
            i += 1
    rows.append((i, "zz yy xx ww vv uu tt ss", "und"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: (r["lang_true"], r["lang_pred"])
           for r in TS.lang_id(docs).collect()}
    correct = sum(1 for t, p in out.values() if t == p)
    acc = correct / len(out)
    assert acc >= 0.9, f"accuracy {acc}: {out}"
    assert out[i] == ("und", "und")


def test_fingerprint_order_sensitivity(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in TS.doc_fingerprint(docs).collect()}
    assert fp[1] == fp[3] and fp[1] != fp[2]


def test_h0_entropy_uniform(spark):
    """Uniform 4-token corpus → exactly 2 bits."""
    docs = spark.createDataFrame([(1, "a b c d a b c d")], "doc_id long, text string")
    row = TS.h0_entropy(docs).first()
    assert row["n_tokens"] == 8 and row["vocab"] == 4
    assert row["h0_milli"] == 20_000


def test_quality_score_values(spark):
    docs = spark.createDataFrame([(1, "the the xyz")], "doc_id long, text string")
    r = TS.quality_score(docs).first()
    assert r["n_tokens"] == 3
    assert r["stop_ratio_i"] == int(2 * 10_000 / 3)
    assert r["uniq_ratio_i"] == int(2 * 10_000 / 3)
    assert r["mean_tok_len_i"] == 3_0000  # (3+3+3)/3 = 3.0 → 30000


def test_decode_payload_real_ppm_and_wav():
    """decode_payload REALLY parses: header fields round-trip, reductions
    match closed-form integer math, corrupt payloads are rejected."""
    for d in (0, 2, 7, 13, 198):
        f = MM.decode_payload(MM.synth_payload(d))
        if d % 2 == 0:
            w, h = MM.ppm_dims(d)
            n = w * h * 3
            s = sum((d * 31 + 7 * i) % 256 for i in range(n))
            assert f == {"kind": "ppm", "dim1": w, "dim2": h, "n_units": n,
                         "mean_i": s * 10_000 // n,
                         "checksum": s % 2_147_483_647}
        else:
            n = MM.wav_n_samples(d)
            words = [(d * 13 + 17 * i) % 65536 for i in range(n)]
            s_abs = sum(abs(wd - 32768) for wd in words)
            assert f == {"kind": "wav", "dim1": MM.WAV_RATE, "dim2": 1,
                         "n_units": n, "mean_i": s_abs * 10_000 // n,
                         "checksum": sum(words) % 2_147_483_647}


def test_decode_payload_parses_headers_not_offsets():
    """The PPM parser must honor the header (comments, multi-digit dims),
    not assume fixed offsets."""
    import numpy as np

    raster = bytes(range(30)) * 12  # 10x4 RGB = 120 bytes... use 360
    raster = bytes((i * 3) % 256 for i in range(10 * 12 * 3))
    payload = b"P6\n# a comment\n10 12\n255\n" + raster
    f = MM.decode_payload(payload)
    assert (f["dim1"], f["dim2"], f["n_units"]) == (10, 12, 360)
    assert f["checksum"] == int(np.sum(np.frombuffer(raster, np.uint8),
                                       dtype=np.int64)) % 2_147_483_647


def test_decode_payload_rejects_unknown_magic():
    with pytest.raises(ValueError, match="unknown media magic"):
        MM.decode_payload(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_payload(b"P6\n4 4\n255\n\x00\x01")


def test_multimodal_features_pipeline(spark, docs):
    """The Spark plumbing end-to-end: synth → binary column → Arrow-batched
    decode must equal calling decode_payload directly."""
    rows = MM.binary_features(MM.synth_payloads(docs)).collect()
    for r in rows:
        f = MM.decode_payload(MM.synth_payload(r["doc_id"]))
        assert (r["kind"], r["dim1"], r["dim2"], r["n_units"], r["mean_i"],
                r["checksum"]) == (
            f["kind"], f["dim1"], f["dim2"], f["n_units"], f["mean_i"],
            f["checksum"])


def test_token_hash_matches_python_reference():
    """The Spark fold must equal the straightforward Python rendering."""
    def py_hash(tok: str) -> int:
        acc = TS.HASH_SEED
        for ch in tok:
            acc = (acc * 31 + ord(ch)) % TS.HASH_P
        return acc

    from full_text_index_spark.session import get_spark

    spark = get_spark("fti-tests", cpus=8, shuffle_partitions=8)
    toks = ["a", "join", "zz9", "w123456789"]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = {r["t"]: r["h"] for r in
           df.select("t", TS.token_hash(F.col("t")).alias("h")).collect()}
    assert got == {t: py_hash(t) for t in toks}


def test_ngram_counts_matches_brute(docs):
    from collections import Counter

    got = TS.ngram_counts(docs, n=2, top_n=10).collect()
    cf, dfc = Counter(), Counter()
    for r in docs.collect():
        toks = tokenize_py(r.text)
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        cf.update(grams)
        dfc.update(set(grams))
    want = sorted(cf, key=lambda g: (-cf[g], g))[:10]
    assert [r.ngram for r in got] == want
    for r in got:
        assert (r.cf, r.df) == (cf[r.ngram], dfc[r.ngram])


def test_ngram_counts_topk_plan_has_no_global_sort(docs):
    plan = (
        TS.ngram_counts(docs, n=2, top_n=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_resize_image_nearest_neighbor():
    doc_id = 4  # even → PPM
    w, h = MM.ppm_dims(doc_id)
    buf = MM.synth_payload(doc_id)
    out = MM.resize_image(buf, 2)
    f = MM.decode_payload(out)  # re-decode: resized payload must be valid P6
    assert (f["dim1"], f["dim2"]) == (-(-w // 2), -(-h // 2))
    # pixel-exact vs numpy strided reference
    i = np.arange(w * h * 3, dtype=np.int64)
    img = ((doc_id * 31 + 7 * i) % 256).astype(np.uint8).reshape(h, w, 3)
    want = img[::2, ::2, :]
    got = np.frombuffer(out.split(b"\n", 3)[3], dtype=np.uint8).reshape(
        want.shape
    )
    assert np.array_equal(got, want)


def test_sample_frames_decimation():
    doc_id = 7  # odd → WAV
    n = MM.wav_n_samples(doc_id)
    out = MM.sample_frames(MM.synth_payload(doc_id), 4)
    f = MM.decode_payload(out)
    assert f["kind"] == "wav" and f["n_units"] == -(-n // 4)
    i = np.arange(n, dtype=np.int64)[::4]
    want = (((doc_id * 13 + 17 * i) % 65536) - 32768).astype(np.int64)
    assert f["mean_i"] == (int(np.abs(want).sum()) * 10_000) // len(want)


def test_resample_stride_one_is_identity(spark):
    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    base = MM.binary_features(MM.synth_payloads(docs)).orderBy("doc_id").collect()
    same = (
        MM.media_resample(MM.synth_payloads(docs), img_stride=1, wav_stride=1)
        .orderBy("doc_id").collect()
    )
    assert [tuple(r) for r in base] == [tuple(r) for r in same]


def test_repetition_stats_matches_brute(docs):
    got = {r.doc_id: r for r in TS.repetition_stats(docs).collect()}
    for row in docs.collect():
        toks = tokenize_py(row.text)
        for n in (2, 3):
            grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            want_total = max(len(toks) - n + 1, 0)
            want_dup = (
                ((len(grams) - len(set(grams))) * 10_000) // len(grams)
                if grams else 0
            )
            r = got[row.doc_id]
            assert r[f"n_{n}grams"] == want_total
            assert r[f"dup_{n}gram_frac_i"] == want_dup, (row.doc_id, n)


def test_repetition_stats_no_shuffle(docs):
    # the kernel form is map-only except the parallelism widen (a single
    # round-robin exchange on narrow inputs — never a hash/agg shuffle)
    plan = (
        TS.repetition_stats(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1
    assert "hashpartitioning" not in plan and "HashAggregate" not in plan


def test_repetition_stats_kernel_matches_expr(docs, small_docs):
    """The doc-local repetition kernel must be bit-identical to the
    column-expression rendering on both fixtures."""
    for d in (docs, small_docs):
        kern = {r["doc_id"]: tuple(r)[1:]
                for r in TS.repetition_stats(d).collect()}
        expr = {r["doc_id"]: tuple(r)[1:]
                for r in TS.repetition_stats_expr(d).collect()}
        assert kern == expr and len(kern) > 0


def test_pii_redact_counts_and_replacement(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org and sue@y.io now"),
            (2, "call 555-1234 or 800-9999, server 192.168.1.255 up"),
            (3, "clean text with digits 12345 and a dot. end"),
            (4, "u@a.bc at 10.0.0.1 dial 123-4567"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in TS.pii_redact(docs).collect()}
    assert (got[1].n_email, got[1].n_phone, got[1].n_ipv4) == (2, 0, 0)
    assert got[1].clean_text == "mail <EMAIL> and <EMAIL> now"
    assert (got[2].n_email, got[2].n_phone, got[2].n_ipv4) == (0, 2, 1)
    assert got[2].clean_text == "call <PHONE> or <PHONE>, server <IP> up"
    assert (got[3].n_email, got[3].n_phone, got[3].n_ipv4) == (0, 0, 0)
    assert got[3].clean_text == docs.collect()[2].text
    assert (got[4].n_email, got[4].n_phone, got[4].n_ipv4) == (1, 1, 1)
    assert got[4].clean_text == "<EMAIL> at <IP> dial <PHONE>"


def test_pii_redact_idempotent_and_ordered(spark):
    # digits inside an email's local part must NOT count as phones (email
    # redaction runs first); placeholders match none of the patterns
    docs = spark.createDataFrame(
        [(1, "x 555-1234abc@q.co y 10.1.2.3")],
        "doc_id long, text string",
    )
    first = TS.pii_redact(docs).collect()[0]
    assert (first.n_email, first.n_phone, first.n_ipv4) == (1, 0, 1)
    again = TS.pii_redact(
        docs.sparkSession.createDataFrame(
            [(1, first.clean_text)], "doc_id long, text string"
        )
    ).collect()[0]
    assert again.clean_text == first.clean_text
    assert (again.n_email, again.n_phone, again.n_ipv4) == (0, 0, 0)


def test_pii_redact_no_shuffle(docs):
    plan = (
        TS.pii_redact(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_collocations_matches_brute(docs):
    import math

    rows = docs.select("doc_id", "text").collect()
    uni, big = {}, {}
    t_u = t_b = 0
    for r in rows:
        toks = tokenize_py(r.text)
        t_u += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            t_b += 1
    want = []
    for (a, b), cf in big.items():
        if cf < 2:
            continue
        pmi = math.log(cf * t_u * t_u / (t_b * uni[a] * uni[b]))
        want.append((f"{a} {b}", cf, math.floor(pmi * 10_000 + 0.5)))
    want.sort(key=lambda x: (-x[2], x[0]))
    got = [(r.ngram, r.cf, r.pmi_i)
           for r in TS.collocations(docs, top_n=10, min_cf=2).collect()]
    assert got == want[:10]
    assert len(got) >= 5


def test_containment_catches_superset_jaccard_misses(spark):
    small = "one two three four five six seven"
    big = small + " " + " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated text with other words only")],
        "doc_id long, text string",
    )
    cont = {(r.src_doc, r.dst_doc): r.containment_i
            for r in D.containment_pairs(docs, k=3,
                                         min_containment=0.5).collect()}
    # the small doc is fully contained in the big one...
    assert cont[(1, 2)] == 10_000
    # ...but not vice versa, and Jaccard at the same bar misses the pair
    assert (2, 1) not in cont
    jac = {(r.doc_a, r.doc_b)
           for r in D.ngram_jaccard_pairs(docs, k=3,
                                          min_jaccard=0.5).collect()}
    assert (1, 2) not in jac


def test_minhash_kernel_matches_expr_rendering(spark):
    """The Arrow minhash kernel must be BIT-IDENTICAL to the column-
    expression rendering (which the DuckDB oracle mirrors): same tokens,
    same codepoint Horner fold, same affine family, same distinct-then-min.
    Edge rows: null text, empty text, < k tokens (absent), repeated
    shingles (distinct), unicode separators/case, and a 64-func signature
    (multiplier up to 127 — the widest int64 product path)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a b"),
        (3, None),
        (4, "x y z x y z x y z"),
        (5, "Héllo WÖRLD foo bar baz — teST 42 foo bar baz"),
        (6, ""),
        (7, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
        (8, "  leading   separators\t\nand trailing  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n_funcs in (16, 64):
        got = {(r.doc_id, r.j): r.minhash
               for r in D.minhash_signatures(docs, n_funcs=n_funcs).collect()}
        want = {(r.doc_id, r.j): r.minhash
                for r in D.minhash_signatures_expr(docs, n_funcs=n_funcs).collect()}
        assert got == want and got, n_funcs
    assert not any(d == 3 or d == 6 or d == 2 for d, _ in got)


def test_scan_count_overlapping_semantics(spark):
    """scan_count counts OVERLAPPING occurrences — identical semantics to
    the indexed substring_count, so the adaptive cutover never changes
    answers ('aa' in 'aaaa' = 3, not the replace-based 2)."""
    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "xaax"), (2, "bb")], "doc_id long, text string"
    )
    got = {
        r["pattern"]: (r["n_docs_matching"], r["n_occurrences"])
        for r in TS.scan_count(docs, ["aa", "zz"]).collect()
    }
    assert got["aa"] == (2, 4)   # 3 overlapping in 'aaaa' + 1 in 'xaax'
    assert got["zz"] == (0, 0)


def test_doc_token_stats_ws_tokens_ignore_padding(spark):
    """n_ws_tokens must not count the empty fields Spark split keeps for
    leading/trailing whitespace ( ' a b ' is 2 tokens, '' is 0)."""
    docs = spark.createDataFrame(
        [(0, " a b "), (1, ""), (2, "one")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_ws_tokens"]
           for r in TS.doc_token_stats(docs).collect()}
    assert got == {0: 2, 1: 0, 2: 1}


def test_sample_frames_stereo_frames_and_header():
    """Multi-channel decimation strides over FRAMES (co-timed L/R stay
    together) and the header derives byteRate/blockAlign from the channel
    count."""
    import struct

    import numpy as np

    rate, ch = 8000, 2
    frames = np.arange(20, dtype="<i2").reshape(10, 2)  # L=even, R=odd
    data = frames.reshape(-1).tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                rate * 2 * ch, 2 * ch, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out = MM.sample_frames(wav, 3)
    r2, ch2, samples = MM._parse_wav(out)
    assert (r2, ch2) == (rate, ch)
    kept = samples.reshape(-1, 2)
    # frames 0, 3, 6, 9 — each with its own co-timed L/R pair
    assert kept.tolist() == [[0, 1], [6, 7], [12, 13], [18, 19]]
    # header fields: byteRate and blockAlign match the channel count
    byte_rate, block_align = struct.unpack_from("<IH", out, 28)
    assert byte_rate == rate * 2 * ch and block_align == 2 * ch


def test_simhash_kernel_matches_expr(docs, small_docs):
    """The doc-local simhash kernel must be bit-identical to the
    column-expression rendering (`simhash_expr`, the in-Spark differential
    oracle) on both the edge-case fixture and a 300-doc generated corpus."""
    for d in (docs, small_docs):
        kern = {r["doc_id"]: r["simhash"] for r in D.simhash(d).collect()}
        expr = {r["doc_id"]: r["simhash"]
                for r in D.simhash_expr(d).collect()}
        assert kern == expr and len(kern) > 0
