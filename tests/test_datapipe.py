"""Data-pipeline operators: dedup, similarity, text analysis, multimodal
plumbing — over the driver's documents/embeddings tables plus hand-built
fixtures with known answers."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_tiny):
    return spark.read.parquet(f"{sf_tiny}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_tiny):
    return spark.read.parquet(f"{sf_tiny}/embeddings.parquet").cache()


def test_exact_duplicates(spark):
    from motive_spark.datapipe import exact_duplicates

    d = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc"), (4, "aa bb"), (5, "cc x")],
        "doc_id long, text string",
    )
    rows = exact_duplicates(d).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 3 and rows[0].min_doc_id == 1


def test_word_ngrams_known(spark):
    from motive_spark.datapipe.dedup import word_ngrams

    d = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    grams = {r.gram for r in word_ngrams(d, 3).collect()}
    assert grams == {"a b c", "b c d"}


def test_ngram_jaccard_near_dup(spark):
    from motive_spark.datapipe import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    edited = base.replace("lazy", "sleepy")
    other = "completely different words nothing shared here at all whatsoever truly"
    d = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "doc_id long, text string"
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(d, 3, 0.3).collect()}
    assert (1, 2) in pairs
    assert all(p in {(1, 2)} for p in pairs)
    # manual jaccard check
    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    ga, gb = grams(base), grams(edited)
    want = len(ga & gb) / len(ga | gb)
    assert math.isclose(pairs[(1, 2)], round(want, 6), abs_tol=1e-9)


def test_minhash_lsh_finds_near_dups(docs, spark):
    from motive_spark.datapipe import minhash_lsh_candidates, ngram_jaccard_pairs

    # plant a near-duplicate pair on top of real documents
    extra = spark.createDataFrame(
        [
            (100001, " ".join(["alpha beta gamma delta"] * 20)),
            (100002, " ".join(["alpha beta gamma delta"] * 19) + " alpha beta gamma end"),
        ],
        "doc_id long, text string",
    )
    d = docs.select("doc_id", "text").union(extra)
    cands = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(d, n=3, num_hashes=12, bands=4).collect()
    }
    assert (100001, 100002) in cands
    # LSH candidates should cover all high-jaccard pairs (recall check)
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(d, 3, threshold=0.8).collect()
    }
    assert truth <= cands


def test_simhash_close_for_near_dups(spark):
    from motive_spark.datapipe import simhash_signatures

    a = " ".join(f"tok{i}" for i in range(60))
    b = a.replace("tok30", "tokX")
    c = " ".join(f"other{i}" for i in range(60))
    d = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(d, n=2).collect()}
    ham = lambda x, y: sum(1 for p, q in zip(x, y) if p != q)  # noqa: E731
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])
    assert len(sigs[1]) == 32


def test_brute_force_topk_matches_numpy(emb):
    from motive_spark.datapipe import brute_force_topk

    got = brute_force_topk(emb, k=5, n_queries=5).collect()
    pdf = emb.toPandas().sort_values("vec_id")
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(vecs, axis=1)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        qi = np.where(ids == q)[0][0]
        sims = np.round(vecs @ vecs[qi] / (norms * norms[qi]), 6)
        sims[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:5]
        want = [(int(ids[i]), sims[i]) for i in order]
        got_pairs = [(r.neighbor_id, r.cos) for r in sorted(rows, key=lambda r: r.rank)]
        assert [p[0] for p in got_pairs] == [w[0] for w in want]
        for (gn, gc), (wn, wc) in zip(got_pairs, want):
            assert math.isclose(gc, wc, abs_tol=2e-6)


def test_lsh_topk_recall_vs_brute_force(emb):
    from motive_spark.datapipe import brute_force_topk, lsh_bucketed_topk

    exact = brute_force_topk(emb, k=3, n_queries=20).collect()
    approx = lsh_bucketed_topk(emb, k=3, n_planes=4, n_queries=20).collect()
    exact_top1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_map = {}
    for r in approx:
        approx_map.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for q, n1 in exact_top1.items() if n1 in approx_map.get(q, set())
    )
    assert hits / len(exact_top1) >= 0.3  # recall floor for 4 planes


def test_text_stats_and_quality(docs):
    from motive_spark.datapipe import quality_scores, token_stats

    ts = token_stats(docs).collect()
    for r in ts[:50]:
        assert r.n_tokens >= 1 and r.n_chars >= 1
    q = quality_scores(docs).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in q)


def test_detect_language_markers(spark):
    from motive_spark.datapipe import detect_language

    d = spark.createDataFrame(
        [
            (1, "the cat and the dog with hats"),
            (2, "der hund und der nicht katze und"),
            (3, "xyz qqq zzz"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in detect_language(d).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_document_fingerprint_stable_under_suffix(spark):
    from motive_spark.datapipe import document_fingerprint

    base = " ".join(f"w{i}" for i in range(40))
    d = spark.createDataFrame(
        [(1, base), (2, base + " extra trailing words here")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: tuple(r.fingerprint) for r in document_fingerprint(d).collect()}
    # min-k sketch shares most entries despite the suffix edit
    shared = len(set(fp[1]) & set(fp[2]))
    assert shared >= 3


def test_multimodal_plumbing(docs):
    from motive_spark.datapipe.multimodal import (
        attach_binary_payload,
        byte_histogram_features,
        decode_image,
        frame_sample_plan,
    )

    table = attach_binary_payload(docs.limit(20))
    rows = table.collect()
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray))
        assert r.meta.n_bytes == len(r.payload)
    feats = byte_histogram_features(table).collect()
    assert len(feats) == len(rows)
    for r in feats:
        assert len(r.features) == 32
        assert math.isclose(sum(r.features), 1.0, abs_tol=1e-5)
    # determinism
    feats2 = byte_histogram_features(table).collect()
    assert {r.doc_id: tuple(r.features) for r in feats} == {
        r.doc_id: tuple(r.features) for r in feats2
    }
    plan = frame_sample_plan(table, every_n=2)
    assert plan.count() >= 20
    with pytest.raises(ValueError):  # compressed formats stay opaque
        decode_image(b"\x89PNG")


def test_embedding_near_duplicates_lsh_recall(emb):
    """LSH near-dup pairs are a subset of the exact pairs with usable
    recall at high similarity (the dedup regime)."""
    from motive_spark.datapipe import embedding_near_duplicates

    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_duplicates(emb, 0.45, method="exact").collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_duplicates(emb, 0.45, method="lsh").collect()
    }
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.4


def test_multimodal_resize_plumbing(docs, spark):
    """resize_payload: batch transform updates payload bytes and metadata
    consistently (the real-resize Arrow contract, body stubbed)."""
    from motive_spark.datapipe.multimodal import attach_binary_payload, resize_payload

    table = attach_binary_payload(docs.limit(20))
    out = resize_payload(table, factor=4).collect()
    orig = {r["doc_id"]: r["meta"]["n_bytes"] for r in table.collect()}
    assert len(out) == 20
    for r in out:
        n0 = orig[r["doc_id"]]
        want = (n0 + 3) // 4  # ceil(n/4) bytes survive a stride-4 subsample
        assert r["meta"]["n_bytes"] == want == len(r["payload"])
        assert r["meta"]["format"].endswith(";resized/4")


def test_ivf_topk_recall_and_cell_partition(emb):
    """IVF probes 4/16 cells: top-1 recall well above the 1/4 random
    floor, every vector lands in exactly one cell, and the candidate
    set actually shrinks (approximate, not brute force in disguise)."""
    from motive_spark.datapipe import brute_force_topk, ivf_topk
    from motive_spark.datapipe.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, 16)
    assert cents.count() == 16
    assign = ivf_assign(emb, cents)
    n = emb.count()
    assert assign.count() == n  # exactly one cell per vector
    assert assign.select("cid").distinct().count() > 1

    exact = brute_force_topk(emb, k=3, n_queries=20).collect()
    approx = ivf_topk(emb, k=3, n_queries=20, n_centroids=16, n_probe=4).collect()
    exact_top1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_map = {}
    for r in approx:
        approx_map.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for q, n1 in exact_top1.items() if n1 in approx_map.get(q, set())
    )
    assert hits / len(exact_top1) >= 0.4


def test_gopher_filter_rules(spark):
    from motive_spark.datapipe import gopher_quality_filter

    good = "the deal and most of councils " + " ".join(
        f"word{i}" for i in range(50)
    )
    bullets = "\n".join(f"- the point {i} and more of it" for i in range(20))
    dots = "\n".join(f"the thing and of number {i}..." for i in range(20))
    duplines = "\n".join(["the same line and of it"] * 9 + ["one more the of"])
    numeric = "the of " + " ".join(str(i) for i in range(60))
    rows = [
        (0, good),                                    # passes all nine
        (1, "too short"),                             # R1 fails
        (2, " ".join(["a"] * 60)),                    # R2+R4 fail
        (3, " ".join(["@@@#!"] * 60)),                # R3 fails (symbols)
        (4, " ".join(["same"] * 60)),                 # R4 fails
        (5, bullets),                                 # R5 fails (all bullets)
        (6, dots),                                    # R6 fails (ellipses)
        (7, " ".join(f"w{i}" for i in range(40))),    # R7 fails (no stopwords)
        (8, duplines),                                # R8 fails (dup lines)
        (9, numeric),                                 # R9 fails (digit words)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_filter(docs).collect()}
    assert out[0].passes and out[0].n_stopwords >= 2
    assert not out[1].rule_word_count and not out[1].passes
    assert not out[2].rule_word_len and not out[2].passes
    assert not out[3].rule_symbols and not out[3].passes
    assert not out[4].rule_repetition and not out[4].passes
    assert out[5].bullet_ratio == 1.0
    assert not out[5].rule_bullets and not out[5].passes
    assert out[6].ellipsis_ratio == 1.0
    assert not out[6].rule_ellipsis and not out[6].passes
    assert out[7].n_stopwords == 0
    assert not out[7].rule_stopwords and not out[7].passes
    assert out[8].dup_line_ratio == 0.8
    assert not out[8].rule_dup_lines and not out[8].passes
    assert out[9].alpha_ratio < 0.8
    assert not out[9].rule_alpha_words and not out[9].passes


def test_detect_language_ngram_heldout_accuracy(spark):
    """Hashed char-trigram NB classifier: >=95% on held-out seeded docs
    (a different seed than training), and bit-identical to the
    pure-python scorer — the integer-quantization exactness contract."""
    from motive_spark.datapipe import detect_language_ngram
    from motive_spark.datapipe.langid_train import (
        LANGS,
        py_score,
        synthetic_docs,
        train,
    )

    rows, want = [], {}
    i = 0
    for lang in LANGS:
        for doc in synthetic_docs(lang, 25, seed=99):  # train() used seed=13
            rows.append((i, doc))
            want[i] = lang
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in detect_language_ngram(df).collect()}
    acc = sum(got[k] == v for k, v in want.items()) / len(want)
    assert acc >= 0.95, acc
    weights = train()
    assert all(got[k] == py_score(txt, weights) for k, txt in rows)


def test_langid_model_regenerable():
    """The committed weights module is exactly what the trainer
    produces (guards against hand-edits / drift)."""
    from motive_spark.datapipe import langid_model
    from motive_spark.datapipe.langid_train import LANGS, N_BUCKETS, train

    assert langid_model.LANGS == LANGS
    assert langid_model.N_BUCKETS == N_BUCKETS
    assert langid_model.WEIGHTS == train()


def test_image_codec_roundtrip_and_real_resize(docs, spark):
    """Pure-numpy PPM/PGM/BMP codec: encode->decode is exact; the Spark
    resize path decodes real pixels and nearest-neighbor subsamples
    them; featurize returns exact pixel statistics."""
    import numpy as np

    from motive_spark.datapipe import (
        attach_image_payload,
        decode_image,
        encode_bmp,
        encode_ppm,
        image_stats_features,
        resize_payload,
    )

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    assert (decode_image(encode_ppm(rgb)) == rgb).all()
    assert (decode_image(encode_ppm(gray)) == gray).all()
    assert (decode_image(encode_bmp(rgb)) == rgb).all()  # padding+BGR+flip
    # header comments and multi-whitespace are tolerated
    hdr = b"P6\n# comment line\n 17\t13 \n255\n" + rgb.tobytes()
    assert (decode_image(hdr) == rgb).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG....")

    # Spark path: synthetic image table -> resize -> decode matches numpy
    imgs = attach_image_payload(docs.limit(4), width=24, height=16)
    resized = {r.doc_id: r for r in resize_payload(imgs, factor=4).collect()}
    orig = {r.doc_id: r for r in imgs.collect()}
    for did, row in resized.items():
        full = decode_image(bytes(orig[did].payload))
        small = decode_image(bytes(row.payload))
        assert (small == full[::4, ::4]).all()
        assert row.meta.format == "image/ppm;resized/4"
        assert row.meta.n_bytes == len(bytes(row.payload))

    # featurize: exact per-channel means + luminance histogram
    feats = {r.doc_id: r for r in image_stats_features(imgs).collect()}
    for did, row in feats.items():
        img = decode_image(bytes(orig[did].payload)).reshape(-1, 3).astype(float)
        assert (row.width, row.height) == (24, 16)
        want_mean = img.mean(axis=0)
        got = row.features
        assert np.allclose(got[:3], want_mean, atol=1e-4)
        assert abs(sum(got[6:14]) - 1.0) < 1e-5

    # undecodable payloads -> NULL features (mixed-corpus contract)
    from motive_spark.datapipe import attach_binary_payload

    opaque = image_stats_features(attach_binary_payload(docs.limit(3)))
    assert opaque.where("features IS NOT NULL").count() == 0


def test_kmeans_clusters_matches_numpy_oracle(emb, spark):
    """Integer-exact Lloyd's: the Spark result equals a from-scratch
    numpy replication (same quantization, md5 seeding, round-half-up
    integer means, smallest-j tie-break) on every vector."""
    import hashlib

    import numpy as np

    from motive_spark.datapipe import kmeans_clusters

    k, iters = 4, 3
    got = {
        r.vec_id: (r.cluster, r.dist2)
        for r in kmeans_clusters(emb, k=k, iters=iters).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    V = np.array(
        [[round(float(x) * 1_000_000) + 1_000_000 for x in r.embedding]
         for r in rows],
        dtype=np.int64,
    )
    order = sorted(
        range(len(ids)),
        key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest(),
    )[:k]
    C = V[order].copy()
    for _ in range(iters):
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        for j in range(k):
            members = V[cl == j]
            if len(members):
                s = members.sum(axis=0)
                n = len(members)
                C[j] = (s + n // 2) // n
    want = {
        ids[i]: (int(cl[i]), int(d2[i, cl[i]])) for i in range(len(ids))
    }
    assert got == want
    assert len({c for c, _ in got.values()}) > 1  # nontrivial clustering


def test_bm25_topk_matches_python(spark):
    """BM25 scores vs a from-scratch python computation of the same
    formula on a tiny corpus (same tokenization, same idf variant)."""
    import math as m

    from motive_spark.datapipe import bm25_topk

    corpus = [
        (0, "the cat sat on the mat"),
        (1, "the dog barked at the cat loudly today"),
        (2, "machine learning model training data pipeline"),
        (3, "no relevant words here whatsoever"),
        (4, "data data data model"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    q = ["the", "data", "model"]
    got = {
        r.doc_id: (r.bm25, r.rank)
        for r in bm25_topk(docs, q, top_k=5).collect()
    }

    texts = {i: t.split(" ") for i, t in corpus}
    N = len(texts)
    avgdl = sum(len(v) for v in texts.values()) / N
    k1, b = 1.2, 0.75
    want = {}
    for i, toks in texts.items():
        s = 0.0
        for t in q:
            tf = toks.count(t)
            df = sum(1 for v in texts.values() if t in v)
            idf = m.log((N - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(toks) / avgdl)
            )
        want[i] = round(s, 6)
    for i, (score, _) in got.items():
        assert abs(score - want[i]) < 1e-6, (i, score, want[i])
    # doc 4 (data x3 + model) outranks doc 3 (nothing)
    assert got[4][1] < got[3][1]


def test_group_percentiles_exact(spark):
    """Histogram percentiles == the value at rank ceil(p*n) of the
    sorted group, including duplicate-heavy and tiny groups."""
    import random as _r

    from motive_spark.datapipe import group_percentiles

    rng = _r.Random(3)
    rows = [("a", rng.randrange(0, 50)) for _ in range(997)]
    rows += [("b", 7)] * 10          # constant group
    rows += [("c", v) for v in (5, 1, 9)]  # tiny group
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n_rows, r.p50, r.p95)
        for r in group_percentiles(df, "g", "v").collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        want50 = vals[-(-n // 2) - 1]        # ceil(n/2), 1-based
        want95 = vals[-(-19 * n // 20) - 1]  # ceil(19n/20)
        assert got[g] == (n, want50, want95), g


def test_dedup_clusters_transitive(spark):
    """a~b and b~c land in ONE cluster even when a~c is sub-threshold;
    keeper is the min doc_id; singletons are absent."""
    from motive_spark.datapipe import dedup_clusters, ngram_jaccard_pairs

    words = [f"w{i}" for i in range(30)]
    a = " ".join(words)
    b = " ".join(words[:24] + [f"x{i}" for i in range(6)])   # ~a
    c = " ".join(words[:16] + [f"x{i}" for i in range(14)])  # ~b, not ~a
    lone = " ".join(f"z{i}" for i in range(30))
    d = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, lone)], "doc_id long, text string"
    )
    thr = 0.35
    pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(d, 3, threshold=thr).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs
    out = {r.doc_id: r for r in dedup_clusters(d, 3, threshold=thr).collect()}
    assert set(out) == {1, 2, 3}  # lone doc absent
    assert {out[i].cluster for i in (1, 2, 3)} == {1}
    assert all(out[i].cluster_size == 3 for i in (1, 2, 3))
    assert out[1].is_keeper and not out[2].is_keeper and not out[3].is_keeper


def _docs_frame(spark, n=400, seed=9):
    import random as _random

    rng = _random.Random(seed)
    langs = ["en", "en", "en", "de", "fr", "zh"]
    rows = [(i, rng.choice(langs), f"doc text {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hash_sample_deterministic_and_rate(spark):
    from motive_spark.datapipe import hash_sample

    docs = _docs_frame(spark)
    s1 = sorted(r.doc_id for r in hash_sample(docs, 0.5, ["doc_id"], seed=1).collect())
    s2 = sorted(r.doc_id for r in hash_sample(docs, 0.5, ["doc_id"], seed=1).collect())
    assert s1 == s2
    # binomial(400, 0.5): 6 sigma = 60
    assert 140 <= len(s1) <= 260
    # different seed decorrelates
    s3 = sorted(r.doc_id for r in hash_sample(docs, 0.5, ["doc_id"], seed=2).collect())
    assert s1 != s3
    # python replay: exact membership
    import hashlib

    want = [
        i
        for i in range(400)
        if int(hashlib.md5(f"{i}|1".encode()).hexdigest()[:8], 16)
        < int(0.5 * (1 << 32))
    ]
    assert s1 == want


def test_hash_sample_is_pure_filter_no_exchange(spark):
    from motive_spark.datapipe import hash_sample

    docs = _docs_frame(spark)
    plan = (
        hash_sample(docs, 0.25, ["doc_id"], seed=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_hash_sample_strata_override(spark):
    from motive_spark.datapipe import hash_sample

    docs = _docs_frame(spark)
    out = hash_sample(
        docs, 1.0, ["doc_id"], seed=7, frac_by={"en": 0.0}, strata_col="lang"
    ).collect()
    assert out and all(r.lang != "en" for r in out)
    n_other = docs.where("lang <> 'en'").count()
    assert len(out) == n_other


def test_stratified_topn_exact_quota_and_replay(spark):
    import hashlib
    from collections import defaultdict

    from motive_spark.datapipe import stratified_topn

    docs = _docs_frame(spark)
    got = stratified_topn(docs, ["lang"], 15, ["doc_id"], seed=5).collect()
    by_lang = defaultdict(list)
    for r in got:
        by_lang[r.lang].append((r.strat_rank, r.doc_id))
    # python replay: md5-ranked first 15 per lang
    pool = defaultdict(list)
    for r in docs.collect():
        pool[r.lang].append(r.doc_id)
    for lang, ids in pool.items():
        ranked = sorted(
            ids,
            key=lambda i: (hashlib.md5(f"{i}|5".encode()).hexdigest(), str(i)),
        )[:15]
        want = [(k + 1, i) for k, i in enumerate(ranked)]
        assert sorted(by_lang[lang]) == want, lang


def test_collocations_pmi_vs_python(spark):
    """PMI of every surviving bigram matches a pure-python count."""
    from collections import Counter

    from motive_spark.datapipe import collocations_pmi

    texts = [
        "new york is a big city in new york state",
        "new york and san francisco",
        "san francisco is a city",
        "the city of new york",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.w1, r.w2): (r.c12, r.c1, r.c2, r.pmi)
        for r in collocations_pmi(docs, min_count=2, top_k=100).collect()
    }
    toks = [t.split(" ") for t in texts]
    uni = Counter(w for t in toks for w in t)
    bi = Counter((a, b) for t in toks for a, b in zip(t, t[1:]))
    n = sum(uni.values())
    nb = sum(bi.values())
    want = {}
    for (a, b), c12 in bi.items():
        if c12 >= 2:
            pmi = round(
                math.log(c12 * float(n) * float(n) / (float(nb) * uni[a] * uni[b]))
                / math.log(2.0),
                6,
            )
            want[(a, b)] = (c12, uni[a], uni[b], pmi)
    assert got == want
    # ranking: top-1 is the oracle's argmax (pmi desc, then w1, w2)
    top = collocations_pmi(docs, min_count=2, top_k=1).collect()[0]
    best = min(want.items(), key=lambda kv: (-kv[1][3], kv[0]))
    assert (top.w1, top.w2) == best[0]


def test_ngram_contamination_known(spark):
    from motive_spark.datapipe import ngram_contamination

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),        # shares "a b c" + "b c d" with doc 1
            (1, "a b c d x"),
            (2, "p q r s t"),        # fully novel
            (3, "x y"),              # too short for 3-grams: no row
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_shared, r.contamination_rate)
        for r in ngram_contamination(docs, n=3, min_df=2).collect()
    }
    assert got == {
        0: (3, 2, round(2 / 3, 6)),
        1: (3, 2, round(2 / 3, 6)),
        2: (3, 0, 0.0),
    }


def test_redact_pii_rewrites(spark):
    from motive_spark.datapipe import redact_pii

    rows = [
        (0, "mail bob.smith+x@corp.example.com and carol@ex.org now"),
        (1, "server 10.0.255.7 talked to 192.168.1.1"),
        (2, "card 4111111111111111 acct 12345678901234567"),
        (3, "clean text with short 123 and 1.2 numbers"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[0].n_email == 2 and out[0].redacted == "mail <EMAIL> and <EMAIL> now"
    assert out[1].n_ipv4 == 2 and out[1].redacted == "server <IP> talked to <IP>"
    assert out[2].n_longnum == 2 and out[2].redacted == "card <NUM> acct <NUM>"
    r3 = out[3]
    assert (r3.n_email, r3.n_ipv4, r3.n_longnum) == (0, 0, 0)
    assert r3.redacted == rows[3][1]


def test_multi_signal_dedup_cross_signal_chain(spark):
    """A lexical link (1~2) chained with a semantics-only link (2~3,
    near-identical embeddings but disjoint text) must close into ONE
    cluster — the union property neither signal alone provides."""
    from motive_spark.datapipe import multi_signal_dedup

    words = [f"w{i}" for i in range(30)]
    t1 = " ".join(words)
    t2 = " ".join(words[:24] + [f"x{i}" for i in range(6)])  # ~t1 lexically
    t3 = " ".join(f"q{i}" for i in range(30))  # lexically unrelated
    lone = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3), (9, lone)], "doc_id long, text string"
    )
    # embeddings: 2 and 3 nearly parallel; 1 and 9 orthogonal to them
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.999, 0.01, 0.0]),
            (9, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.doc_id: r
        for r in multi_signal_dedup(
            docs, emb, n=3, jaccard_threshold=0.35, cos_threshold=0.95,
            method="exact",
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert {out[i].cluster for i in (1, 2, 3)} == {1}
    assert out[1].is_keeper and out[1].cluster_size == 3


def test_weighted_sample_topn_replay_and_bias(spark):
    """A-ES weighted sample: (1) bit-for-bit replay of a pure-python
    A-ES over the same md5 draws; (2) weight-proportional inclusion —
    a 50x-weight item appears in essentially every small sample."""
    import hashlib
    import math

    from motive_spark.datapipe import weighted_sample_topn

    rows = [(f"k{i:03d}", 50 if i % 20 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id string, w long")
    got = weighted_sample_topn(
        df, n=10, weight_col="w", key_cols=["id"], seed=3
    ).collect()
    # pure-python replay of the exact same draw
    def aes_key(k, w, seed=3):
        h = int(hashlib.md5(f"{k}|{seed}".encode()).hexdigest()[:8], 16)
        return round(math.log((h + 1) / 4294967296.0) / w, 9)

    want = sorted(rows, key=lambda r: (-aes_key(r[0], r[1]), r[0]))[:10]
    assert [(r.id, r.w) for r in sorted(got, key=lambda r: r.aes_rank)] == want
    # heavy items (10 of 200 ids carry 50/240ths of the weight each)
    # dominate the sample
    heavy = sum(1 for r in got if r.w == 50)
    assert heavy >= 5, heavy  # uniform expectation would be 0.5
    # zero/negative weights are never sampled
    df2 = spark.createDataFrame(
        [("a", 0), ("b", -5), ("c", 1)], "id string, w long"
    )
    got2 = weighted_sample_topn(
        df2, n=3, weight_col="w", key_cols=["id"]
    ).collect()
    assert [r.id for r in got2] == ["c"]


def test_blocked_link_pairs_semantics(spark):
    """Blocking bounds the comparison space: cross-block pairs are
    never compared even when their names are identical; within-block
    pairs respect the distance band; oversized blocks are dropped."""
    from motive_spark.datapipe import blocked_link_pairs

    rows = [
        (1, "red bolt", "b1"),
        (2, "ted bolt", "b1"),   # dist 1 from red bolt, same block
        (3, "red gear", "b2"),   # other block, never compared to 1/2
        (4, "red bolt", "b2"),   # identical name -> distance 0
        (5, "junk", "b3"), (6, "junk", "b3"), (7, "junk", "b3"),
    ]
    df = spark.createDataFrame(rows, "k long, name string, brand string")
    from pyspark.sql import functions as SF

    blk = [SF.element_at(SF.split(SF.col("name"), " "), -1)]
    got = blocked_link_pairs(
        df, "k", "name", blk, max_distance=2, min_distance=0,
        carry_cols=["brand"],
    ).collect()
    pairs = {(r.a_k, r.b_k): r.distance for r in got}
    assert pairs[(1, 2)] == 1 and pairs[(1, 4)] == 0 and pairs[(2, 4)] == 1
    assert (1, 3) not in pairs and (5, 6) in pairs
    # min_distance band excludes exact duplicates
    fuzzy = blocked_link_pairs(
        df, "k", "name", blk, max_distance=2, min_distance=1
    ).collect()
    assert all(r.distance >= 1 for r in fuzzy)
    assert {(r.a_k, r.b_k) for r in fuzzy} == {(1, 2), (2, 4)}
    # block-size cap drops the junk block entirely
    capped = blocked_link_pairs(
        df, "k", "name", blk, max_distance=2, max_block_size=2
    ).collect()
    assert all(r.a_k not in (5, 6, 7) for r in capped)


def test_blocked_link_pairs_bounded_levenshtein_equivalence(spark):
    """r6: the banded threshold levenshtein + length-difference
    prefilter must return EXACTLY the pairs and distances a full
    unbounded levenshtein would: compare against a pure-python DP over
    every within-block candidate."""
    from pyspark.sql import functions as SF

    from motive_spark.datapipe import blocked_link_pairs

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    import random

    rng = random.Random(17)
    vocab = ["bolt", "gear", "cog", "axle", "shaft", "washer"]
    rows = []
    for k in range(120):
        w = rng.choice(vocab)
        # mutate: insert/delete/substitute 0-3 chars
        name = list(w + " " + rng.choice(vocab))
        for _ in range(rng.randint(0, 3)):
            pos = rng.randrange(len(name))
            op = rng.randint(0, 2)
            if op == 0:
                name.insert(pos, rng.choice("abcxyz"))
            elif op == 1 and len(name) > 1:
                del name[pos]
            else:
                name[pos] = rng.choice("abcxyz")
        rows.append((k, "".join(name)))
    df = spark.createDataFrame(rows, "k long, name string")
    blk = [SF.element_at(SF.split(SF.col("name"), " "), -1)]
    got = {
        (r.a_k, r.b_k): r.distance
        for r in blocked_link_pairs(
            df, "k", "name", blk, max_distance=2, min_distance=1
        ).collect()
    }
    # python oracle over the same blocks
    names = dict(rows)
    blocks: dict[str, list[int]] = {}
    for k, nm in rows:
        blocks.setdefault(nm.split(" ")[-1], []).append(k)
    want = {}
    for members in blocks.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                d = lev(names[lo], names[hi])
                if 1 <= d <= 2:
                    want[(lo, hi)] = d
    assert got == want


def test_blocked_link_pairs_distinct_name_expansion(spark):
    """r6: comparison runs over DISTINCT (block, name) and expands back
    to row pairs — duplicate-heavy inputs, identical-name pairs under
    min_distance=0, NULL names, and the sig-prefilter fallback path
    (max_distance > 2) must all replay the naive row-pair semantics."""
    import itertools

    from pyspark.sql import functions as SF

    from motive_spark.datapipe import blocked_link_pairs

    def lev(a, b):
        if a is None or b is None:
            return None
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = [
        (1, "red bolt"), (2, "red bolt"), (3, "red bolt"),  # dup name x3
        (4, "ted bolt"), (5, "red colt"), (6, None), (7, None),
        (8, ""), (9, ""), (10, "x"), (11, "blue bolt"),
    ]
    df = spark.createDataFrame(rows, "k long, nm string")
    names = dict(rows)

    def brute(md, mind):
        out = {}
        for a, b in itertools.combinations(sorted(names), 2):
            d = lev(names[a], names[b])
            if d is not None and mind <= d <= md:
                out[(a, b)] = d
        return out

    for md, mind in [(2, 0), (2, 1), (0, 0), (3, 0), (4, 1)]:
        got = {
            (r.a_k, r.b_k): r.distance
            for r in blocked_link_pairs(
                df, "k", "nm", [SF.lit(1)], max_distance=md,
                min_distance=mind,
            ).collect()
        }
        assert got == brute(md, mind), f"md={md} mind={mind}"

    # long names (> the deletion-neighborhood length guard) must fall
    # back to the self-join path and still replay exactly
    long_rows = [
        (1, "q" * 200), (2, "q" * 199 + "z"), (3, "q" * 150),
        (4, "q" * 200),
    ]
    ldf = spark.createDataFrame(long_rows, "k long, nm string")
    lnames = dict(long_rows)
    got = {
        (r.a_k, r.b_k): r.distance
        for r in blocked_link_pairs(
            ldf, "k", "nm", [SF.lit(1)], max_distance=2, min_distance=0
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(lnames), 2):
        d = lev(lnames[a], lnames[b])
        if d <= 2:
            want[(a, b)] = d
    assert got == want


def test_countmin_sketch_guarantee(spark):
    """CMS one-sided error: estimate >= exact for EVERY token, exact
    for tokens with no collisions; sketch size bounded by depth*width."""
    from motive_spark.datapipe import (
        countmin_estimate,
        countmin_sketch,
        heavy_hitters_cms,
    )

    rows = [(f"t{i % 7}",) for i in range(100)] + [("rare",)]
    counts = (
        spark.createDataFrame(rows, "token string")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cms = countmin_sketch(counts, depth=3, width=8)
    assert cms.count() <= 3 * 8
    est = {
        r.token: r.cms_estimate
        for r in countmin_estimate(
            cms, counts.select("token"), depth=3, width=8
        ).collect()
    }
    exact = {r.token: r.cnt for r in counts.collect()}
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)
    # wide sketch -> no collisions among 8 tokens: exact recovery
    cms_wide = countmin_sketch(counts, depth=4, width=4096)
    est_w = {
        r.token: r.cms_estimate
        for r in countmin_estimate(
            cms_wide, counts.select("token"), depth=4, width=4096
        ).collect()
    }
    assert est_w == exact
    # heavy_hitters surfaces the most frequent token first
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id long, text string"
    )
    hh = heavy_hitters_cms(docs, top_k=2, depth=4, width=64).collect()
    assert hh[0].token == "a" and hh[0].exact_count == 4
    assert all(r.overestimate >= 0 for r in hh)


def test_association_rules_vs_python(spark):
    """Supports/confidence/lift against a brute-force python oracle."""
    from itertools import combinations

    from motive_spark.datapipe import association_rules

    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["a", "c"],
        4: ["b", "c"],
        5: ["a", "b", "d"],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, "b", "i", min_support=2, top_k=None
        ).collect()
    }
    n = len(baskets)
    ic: dict = {}
    pc: dict = {}
    for items in baskets.values():
        for i in items:
            ic[i] = ic.get(i, 0) + 1
        for x, y in combinations(sorted(items), 2):
            pc[(x, y)] = pc.get((x, y), 0) + 1
    want = {}
    for (x, y), c in pc.items():
        if c >= 2:
            want[(x, y)] = (c, ic[x], ic[y], round(c / ic[x], 6),
                            round(c * n / (ic[x] * ic[y]), 6))
            want[(y, x)] = (c, ic[y], ic[x], round(c / ic[y], 6),
                            round(c * n / (ic[x] * ic[y]), 6))
    assert set(got) == set(want)
    for k, (p, a, co, conf, lift) in want.items():
        r = got[k]
        assert (r.pair_count, r.ante_count, r.cons_count) == (p, a, co)
        assert abs(r.confidence - conf) < 1e-9
        assert abs(r.lift - lift) < 1e-9
    # basket-size cap drops the whole oversized basket
    capped = association_rules(
        df, "b", "i", min_support=1, top_k=None, max_basket_size=2
    ).collect()
    assert {(r.antecedent, r.consequent) for r in capped} == {
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"),
        ("c", "b"),
    }


def test_incremental_dedup_semantics(spark):
    """New docs screen against the corpus only: exact copies flagged
    with jaccard 1.0; novel docs pass with NULL match; corpus-internal
    duplicates never appear in the output."""
    from motive_spark.datapipe import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (2, "the quick brown fox jumps over the lazy dog"),
            (4, "the quick brown fox jumps over the lazy dog"),  # corp dup
            (6, "completely different corpus text about spark engines"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # dup of 2
            (3, "an entirely novel document with fresh unseen words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup(
        new, corpus, n=3, threshold=0.5).collect()}
    assert set(out) == {1, 3}
    assert out[1].is_dup and out[1].dup_of == 2 and out[1].jaccard == 1.0
    assert not out[3].is_dup and out[3].dup_of is None


def test_salted_join_equals_plain_join(spark):
    """Salted join returns EXACTLY the plain join's multiset (dup keys
    included); the hot key's rows actually spread over multiple salts;
    only_keys path composes plain+salted without loss."""
    from collections import Counter

    from motive_spark.datapipe import salted_join, top_keys_by_count

    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(50)] + [(2, "x"), (3, "y"), (3, "z")],
        "k long, lv string",
    )
    right = spark.createDataFrame(
        [(1, "r1"), (1, "r2"), (2, "r"), (4, "never")], "k long, rv string"
    )
    plain = Counter(tuple(r) for r in left.join(right, "k").collect())
    for kwargs in ({"n_salts": 4}, {"n_salts": 4, "only_keys": [1]}):
        got = Counter(
            tuple(r) for r in salted_join(left, right, "k", **kwargs).collect()
        )
        assert got == plain, kwargs
    # the hot key occupies >1 salt bucket (md5 spread)
    from pyspark.sql import functions as SF

    salts = (
        left.where("k = 1")
        .select(
            SF.pmod(
                SF.conv(
                    SF.substring(
                        SF.md5(SF.concat_ws("\x1f", SF.col("k").cast("string"),
                                            SF.col("lv").cast("string"))),
                        1, 8,
                    ), 16, 10,
                ).cast("long"),
                SF.lit(4),
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert salts > 1
    hot = top_keys_by_count(left, ["k"], top_k=1).collect()
    assert hot[0].k == 1 and hot[0].n_rows == 50
    # overlapping non-key columns are rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(left, left, "k")


def test_bloom_semi_join_no_false_negatives(spark):
    """Bloom pruning NEVER loses a true match (no false negatives);
    with a tiny filter false positives appear; with a huge filter the
    pass set equals the exact semi-join."""
    from motive_spark.datapipe import bloom_bits, bloom_semi_join

    dim = spark.createDataFrame([(i,) for i in range(0, 50)], "k long")
    fact = spark.createDataFrame(
        [(i, f"v{i}") for i in range(0, 500)], "k long, v string"
    )
    true_keys = set(range(50))
    for bits in (64, 1 << 20):
        bloom = bloom_bits(dim, "k", n_hashes=2, n_bits=bits)
        got = {r.k for r in bloom_semi_join(
            fact, bloom, "k", n_hashes=2, n_bits=bits).collect()}
        assert true_keys <= got, bits  # no false negatives, ever
        if bits == 1 << 20:
            assert got == true_keys  # wide filter: exact
        else:
            assert len(got) >= len(true_keys)  # tiny filter: FPs allowed


def test_kmv_sketch_accuracy_and_setops(spark):
    """KMV: exact below k; ~1/sqrt(k) relative error above; union and
    intersection estimates near truth on known overlapping sets."""
    from motive_spark.datapipe import kmv_distinct, kmv_set_ops

    # group A: 1000 distinct keys; group B: 600, overlapping 300
    rows = [("a", f"k{i}") for i in range(1000)] + [
        ("b", f"k{i}") for i in range(700, 1300)
    ]
    df = spark.createDataFrame(rows, "g string, key string")
    est = {r.g: r.est_distinct for r in kmv_distinct(df, "g", "key", k=256).collect()}
    assert abs(est["a"] - 1000) / 1000 < 0.25, est
    assert abs(est["b"] - 600) / 600 < 0.25, est
    # below-k groups are exact
    small = spark.createDataFrame(
        [("s", f"x{i}") for i in range(10)], "g string, key string"
    )
    got = kmv_distinct(small, "g", "key", k=64).collect()[0]
    assert got.est_distinct == 10.0 and got.sketch_size == 10
    ops = kmv_set_ops(df, "g", "key", "a", "b", k=256).collect()[0]
    assert abs(ops.est_union - 1300) / 1300 < 0.25, ops
    assert abs(ops.est_intersection - 300) / 300 < 0.45, ops
