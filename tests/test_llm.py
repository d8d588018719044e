"""LLM-pipeline operator tests: planted-duplicate invariants (the
oracle can only confirm engine-vs-engine equality; these confirm the
operators actually FIND duplicates), ANN recall vs the exact baseline,
and the multimodal stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import hbase_compact_spark.workload_llm as llm
from hbase_compact_spark.functions import text as TX
from hbase_compact_spark.functions.multimodal import (
    decode_image,
    extract_payload_meta,
    sample_frames,
    with_binary_payload,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green bottles hang quietly on the old stone wall near the river "
    "bank and a small boat drifts slowly past the tall reeds under a "
    "pale morning sky full of scattered clouds moving east"
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """documents.parquet with planted exact + near duplicates."""
    words = BASE.split()
    near = " ".join(["shiny" if i == 10 else w for i, w in enumerate(words)])
    rows = [
        (0, BASE, "en", "src0", len(BASE)),
        (1, BASE, "en", "src1", len(BASE)),  # exact dup of 0
        (2, near, "en", "src2", len(near)),  # near dup of 0
        (3, "completely different tiny text", "en", "src3", 31),
        (4, "another unrelated document about spark shuffles", "en", "src4", 48),
    ]
    d = str(tmp_path_factory.mktemp("planted"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_dedup_exact_finds_planted(spark, planted_dir):
    out = llm.dedup_exact(spark, planted_dir)
    dup = out.filter(F.col("n_copies") == 2).collect()
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_dedup_fuzzy_finds_planted(spark, planted_dir):
    out = llm.dedup_fuzzy(spark, planted_dir)
    pairs = {p: e for (p, e) in ((tuple(r[:2]), r[2]) for r in out.collect())}
    assert pairs.get((0, 1)) == 1.0  # exact dup: identical signature
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5  # near dup caught
    assert (3, 4) not in pairs  # unrelated not caught


def test_dedup_ngram_jaccard_finds_planted(spark, planted_dir):
    out = llm.dedup_ngram_jaccard(spark, planted_dir)
    got = {tuple(r[:2]): r[2] for r in out.collect()}
    assert got.get((0, 1)) == 1.0
    assert (0, 2) in got and 0.5 <= got[(0, 2)] < 1.0
    assert (3, 4) not in got


def test_simhash_hamming_property(spark, planted_dir):
    out = {r["doc_id"]: r["simhash"] for r in llm.dedup_simhash(spark, planted_dir).collect()}
    assert out[0] == out[1]  # identical text -> identical sketch
    ham_near = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[3]).count("1")
    assert ham_near <= 8
    assert ham_near < ham_far


def test_minhash_estimates_true_jaccard(spark, planted_dir):
    """Signature agreement should approximate true shingle Jaccard."""
    fuzzy = {tuple(r[:2]): r[2] for r in llm.dedup_fuzzy(spark, planted_dir).collect()}
    true_j = {tuple(r[:2]): r[2] for r in llm.dedup_ngram_jaccard(spark, planted_dir).collect()}
    if (0, 2) in fuzzy and (0, 2) in true_j:
        assert abs(fuzzy[(0, 2)] - true_j[(0, 2)]) < 0.35  # k=16 -> coarse


def test_ann_recall_vs_exact(spark):
    sf = "/root/testdata/sf0.001"
    exact = llm.similarity_topk(spark, sf)
    approx = llm.ann_lsh(spark, sf)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"ANN recall@10 too low: {recall}"


def test_ivf_recall_dial(spark):
    """IVF recall must track n_probe/n_lists on isotropic data and
    reach the exact answer when every list is probed."""
    from hbase_compact_spark.functions.similarity import ivf_topk
    from hbase_compact_spark.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in llm.similarity_topk(spark, sf).collect()
    }
    n_lists = emb.select("label").distinct().count()
    lo = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(q, emb, k=10, n_probe=2).collect()
    }
    hi = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(q, emb, k=10, n_probe=n_lists).collect()
    }
    assert len(exact & lo) / len(exact) >= 0.1  # ~ n_probe/n_lists
    assert len(exact & hi) / len(exact) == 1.0  # all lists = exhaustive
    assert len(lo) <= len(hi)


def test_multimodal_stub_contract(spark, planted_dir):
    # entropy-coded formats (JPEG here) stay an honest stub boundary
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg soi")
    frames = sample_frames(b"x" * 2500, every_n=1000)
    assert len(frames) == 3 and frames == sample_frames(b"x" * 2500, every_n=1000)

    from hbase_compact_spark.tables import load_table

    docs = load_table(spark, planted_dir, "documents")
    meta = extract_payload_meta(with_binary_payload(docs)).collect()
    by_id = {r["doc_id"]: r for r in meta}
    assert by_id[0]["n_bytes"] == len(BASE.encode())
    import hashlib

    assert by_id[0]["payload_md5"] == hashlib.md5(BASE.encode()).hexdigest()


def test_multimodal_frames(spark, planted_dir):
    import hashlib

    from hbase_compact_spark.functions.multimodal import sample_frames

    out = {
        r["doc_id"]: r
        for r in llm.multimodal_frames(spark, planted_dir).collect()
    }
    payload = BASE.encode()
    frames = sample_frames(payload, every_n=100)
    assert out[0]["n_frames"] == len(frames)
    assert out[0]["frames_md5"] == hashlib.md5(b"".join(frames)).hexdigest()
    # deterministic across runs
    again = {
        r["doc_id"]: r["frames_md5"]
        for r in llm.multimodal_frames(spark, planted_dir).collect()
    }
    assert again == {k: v["frames_md5"] for k, v in out.items()}


def test_embedding_dup_detection_planted(spark):
    """The oracle can only prove engine-vs-engine equality (and the
    fixture corpus has no >=0.9 pairs); this proves the operator
    actually FINDS planted near-duplicate vectors."""
    import numpy as np

    from hbase_compact_spark.functions.similarity import embedding_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 64)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(20)]
    # vec 100 = near-copy of vec 0 (tiny noise); vec 101 = exact copy of 1
    near = base[0] + rng.normal(scale=0.01, size=64).astype(np.float32)
    rows.append((100, near.tolist()))
    rows.append((101, base[1].tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in embedding_dup_pairs(emb, 0.9).collect()
    }
    assert (0, 100) in pairs and pairs[(0, 100)] > 0.99
    assert (1, 101) in pairs and pairs[(1, 101)] == 1.0
    # random pairs (cos ~ 0 at d=64) must not appear
    assert all(a in (0, 1) and b > 99 for (a, b) in pairs)


def test_lsh_sketch_sql_and_blas_agree(spark):
    """The pure-SQL lsh_sketch (reference implementation) and the
    BLAS path inside lsh_topk must compute the same sign sketch from
    the same literal hyperplanes (sign boundaries at |dot| ~ 1e-16
    could in principle differ — the fixtures stay far from them)."""
    import numpy as np

    from hbase_compact_spark.functions.similarity import (
        N_HYPERPLANES,
        _hyperplane,
        lsh_sketch,
    )
    from hbase_compact_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    sql_sk = {
        r["vec_id"]: list(r["s"])
        for r in emb.select("vec_id", lsh_sketch("embedding").alias("s")).collect()
    }
    pdf = emb.select("vec_id", "embedding").toPandas()
    H = np.array(
        [[_hyperplane(i, d) for d in range(64)] for i in range(N_HYPERPLANES)]
    )
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    blas = (M @ H.T > 0).astype(int)
    blas_sk = {int(v): list(map(int, row)) for v, row in zip(pdf["vec_id"], blas)}
    assert sql_sk == blas_sk


def test_embedding_quantize_accuracy(spark):
    """Int8 quantization must reconstruct within scale/2 per element
    and keep cosine-to-original ~1, deterministically."""
    out = llm.embedding_quantize(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    for r in out:
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
        assert r["cos_to_original"] > 0.999
    again = {r["vec_id"]: r["scale"] for r in
             llm.embedding_quantize(spark, "/root/testdata/sf0.001").collect()}
    assert again == {r["vec_id"]: r["scale"] for r in out}


def test_corpus_filter_composes(spark, planted_dir):
    """corpus_filter = dedup survivors ∩ quality ∩ length band: the
    planted exact duplicate (doc 1) must be gone, its original kept
    (given it passes the length band)."""
    out = {r["doc_id"] for r in llm.corpus_filter(spark, planted_dir).collect()}
    assert 1 not in out  # exact dup of doc 0 never survives
    assert 0 in out  # original survives (45 tokens, quality > 0.2)


def test_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([("ab cd",)], "text string").select(
        TX.shingles("text", 5).alias("sh")
    )
    assert df.collect()[0]["sh"] == ["ab cd"]


def test_embedding_dup_block_decomposition_exact(spark):
    """The block-pair decomposition must be exact: every unordered
    vector pair meets in exactly one block-pair task, so the emitted
    pair set is identical for any block count (including B=1, the
    single-task degenerate case)."""
    from hbase_compact_spark.functions.similarity import embedding_dup_pairs
    from hbase_compact_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def pairs(nb):
        return {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in embedding_dup_pairs(emb, 0.35, n_blocks=nb).collect()
        }

    p1, p4, p7 = pairs(1), pairs(4), pairs(7)
    assert len(p1) > 0  # non-vacuous at this threshold on the fixtures
    assert p1 == p4 == p7
    assert all(a < b for (a, b) in p1)


def test_ivf_refined_centroids_full_probe_exhaustive(spark):
    """Lloyd's refinement must keep k stable and keep the search
    correct: probing every refined list is still an exhaustive exact
    search, and the default 2-probe path still returns k results."""
    from pyspark.sql import functions as F

    from hbase_compact_spark.functions.similarity import (
        ivf_topk,
        kmeans_refine,
        label_centroids,
    )
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    n_lists = emb.select("label").distinct().count()

    cents = label_centroids(emb)
    refined = kmeans_refine(emb, cents, 2)
    assert refined.count() == n_lists
    assert all(len(r["cv"]) == 64 for r in refined.collect())

    exact = {
        (r["query_id"], r["vec_id"])
        for r in llm.similarity_topk(spark, sf).collect()
    }
    hi = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(q, emb, k=10, n_probe=n_lists, refine_iters=2).collect()
    }
    assert hi == exact  # all lists probed = exhaustive, refined or not
    lo = ivf_topk(q, emb, k=10, n_probe=2, refine_iters=2).collect()
    assert len(lo) == 50  # 5 queries x k


def test_bmp_codec_roundtrip_exact():
    """decode(encode(img)) must be bit-exact for arbitrary sizes,
    including widths whose rows need 4-byte padding."""
    import numpy as np

    from hbase_compact_spark.functions.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        assert out.shape == (h, w, 3)
        assert (out == img).all()
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG not a bmp")


def test_wav_codec_roundtrip_exact():
    import numpy as np

    from hbase_compact_spark.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(12)
    for n, ch in [(1, 1), (777, 1), (1024, 2)]:
        samples = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
        rate, out = decode_wav(encode_wav(samples, 8000))
        assert rate == 8000
        assert out.shape == (n, ch)
        assert (out == samples).all()
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_png_codec_roundtrip_all_filters():
    """decode(encode(img)) must be bit-exact for every PNG row-filter
    type (None/Sub/Up/Average/Paeth) and odd sizes."""
    import numpy as np

    from hbase_compact_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(13)
    for ft in range(5):
        for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            out = decode_png(encode_png(img, filter_type=ft))
            assert out.shape == (h, w, 3), (ft, h, w)
            assert (out == img).all(), (ft, h, w)
    with pytest.raises(ValueError):
        decode_png(b"BM not a png")


def test_png_decoder_handles_rgba_and_rejects_exotic():
    """Colortype 6 (RGBA) decodes with alpha dropped; interlaced or
    16-bit profiles raise ValueError rather than mis-decoding."""
    import struct
    import zlib as _z

    import numpy as np

    from hbase_compact_spark.functions.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(14)
    h, w = 4, 3
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    payload = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == rgba[:, :, :3]).all()
    interlaced = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(interlaced)


def test_decode_image_dispatches_by_container_and_rejects_compressed():
    import numpy as np

    from hbase_compact_spark.functions.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert (decode_image(encode_bmp(img)) == img).all()
    assert (decode_image(encode_png(img)) == img).all()
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg soi")


def test_multimodal_decode_queries_deterministic_and_correct(spark, planted_dir):
    """The declared decode queries must produce features that match a
    direct local decode of the same deterministic payloads, twice."""
    import hashlib as _hl

    import numpy as np

    from hbase_compact_spark.functions.multimodal import (
        _det_bytes,
        decode_wav,
        encode_wav,
    )
    from hbase_compact_spark.tables import load_table

    out1 = {r["doc_id"]: r for r in llm.multimodal_image_decode(spark, planted_dir).collect()}
    out2 = {r["doc_id"]: r for r in llm.multimodal_image_decode(spark, planted_dir).collect()}
    assert {k: v["img_md5"] for k, v in out1.items()} == {
        k: v["img_md5"] for k, v in out2.items()
    }
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, planted_dir, "documents").collect()}
    # independently recompute features from the generator spec: doc 0
    # rides a BMP container, doc 1 a PNG — identical pixel derivation
    for doc_id, container in [(0, "bmp"), (1, "png")]:
        raw = np.frombuffer(
            _det_bytes(f"img:{docs[doc_id]}", 16 * 16 * 3), dtype=np.uint8
        )
        img = raw.reshape(16, 16, 3)
        row = out1[doc_id]
        assert row["container"] == container
        assert row["width"] == 16 and row["height"] == 16
        assert row["img_md5"] == _hl.md5(img.tobytes()).hexdigest()
        assert abs(row["mean_r"] - round(float(img[:, :, 0].mean()), 6)) < 1e-9

    audio = {r["doc_id"]: r for r in llm.multimodal_audio_decode(spark, planted_dir).collect()}
    rate, samples = decode_wav(
        encode_wav(
            np.frombuffer(_det_bytes(f"wav:{docs[0]}", 1024 * 2), dtype="<i2").reshape(-1, 1),
            8000,
        )
    )
    flat = samples.astype(np.float64).ravel()
    assert audio[0]["sample_rate"] == 8000
    assert audio[0]["n_samples"] == 1024
    assert audio[0]["rms"] == round(float(np.sqrt(np.mean(flat**2))), 6)
    assert audio[0]["peak"] == int(np.max(np.abs(samples)))


def test_dedup_clusters_transitive_closure(spark, planted_dir):
    """Pairs (0,1) and (0,2) must collapse into one cluster {0,1,2}
    labeled by the minimum doc_id; unrelated docs stay singletons."""
    out = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in llm.dedup_clusters(spark, planted_dir).collect()}
    assert out[0] == (0, 3) and out[1] == (0, 3) and out[2] == (0, 3)
    assert out[3] == (3, 1) and out[4] == (4, 1)
    assert len(out) == 5  # every document labeled exactly once


def test_doc_pack_invariants(spark):
    """FFD sequence packing: every doc in exactly one pack, packs
    never exceed the budget unless they hold a single oversize doc,
    pack stats are consistent, and the assignment is deterministic."""
    from hbase_compact_spark.workload_llm import PACK_TOKEN_BUDGET

    sf = "/root/testdata/sf0.001"
    rows = llm.doc_pack(spark, sf).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows) == 500
    by_pack = {}
    for r in rows:
        by_pack.setdefault((r["lang"], r["pack_id"]), []).append(r)
    for (lang, _), members in by_pack.items():
        tokens = sum(m["n_tokens"] for m in members)
        assert all(m["pack_tokens"] == tokens for m in members)
        assert all(m["pack_docs"] == len(members) for m in members)
        if len(members) > 1:
            assert tokens <= PACK_TOKEN_BUDGET
    again = {r["doc_id"]: (r["lang"], r["pack_id"])
             for r in llm.doc_pack(spark, sf).collect()}
    assert again == {r["doc_id"]: (r["lang"], r["pack_id"]) for r in rows}


def test_repetition_ratio_detects_repeats(spark, tmp_path):
    """A degenerate doc of one repeated word must score near 1; a
    doc of all-distinct words must score 0."""
    d = str(tmp_path / "rep")
    rows = [
        (0, " ".join(["spam"] * 50), "en", "s", 0),
        (1, " ".join(f"w{i}" for i in range(50)), "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r["rep_ratio"] for r in
           llm.repetition_ratio(spark, d).collect()}
    assert out[0] > 0.97  # 48 identical trigrams
    assert out[1] == 0.0


def test_pq_recall_vs_exact(spark):
    """PQ+ADC with exact rerank: the ADC candidate pool then a
    true-cosine rerank should recover most of the exact top-10 even on
    isotropic fixtures — the hardest case for quantized ordering."""
    sf = "/root/testdata/sf0.001"
    exact = llm.similarity_topk(spark, sf)
    approx = llm.ann_pq(spark, sf)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # rerank_factor=80 default since r12 (the >=0.9 operating point)
    assert recall >= 0.9, f"PQ recall@10 too low: {recall}"


def test_pq_codes_compact_and_deterministic(spark):
    from hbase_compact_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        pq_codebook,
        pq_encode,
    )
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cb = pq_codebook(emb, iters=1)
    assert cb.count() == PQ_M * PQ_K
    enc1 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    enc2 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    assert enc1 == enc2  # seedless training/encoding is reproducible
    assert all(len(c) == PQ_M for c in enc1.values())
    assert all(0 <= x < PQ_K for c in enc1.values() for x in c)



def test_corpus_mix_hits_target_mixture(spark):
    """The rebalanced corpus's language proportions must sit near the
    declared target mixture (hash-sampling granularity is 1/1000)."""
    from collections import Counter

    kept = llm.corpus_mix(spark, "/root/testdata/sf0.01").collect()
    n = len(kept)
    got = Counter(r["lang"] for r in kept)
    assert set(got) == set(llm.MIX_TARGET)
    for lang, share in llm.MIX_TARGET.items():
        assert abs(got[lang] / n - share) < 0.06, (lang, got[lang] / n)


def test_corpus_mix_with_custom_target(spark):
    """Weights-as-input API: an arbitrary caller mixture (subset of
    languages included) rebalances to ITS shares, not MIX_TARGET's."""
    from collections import Counter

    target = {"en": 0.5, "de": 0.5}
    kept = llm.corpus_mix_with(spark, "/root/testdata/sf0.01", target).collect()
    n = len(kept)
    got = Counter(r["lang"] for r in kept)
    assert set(got) == set(target)  # other languages fully dropped
    for lang, share in target.items():
        assert abs(got[lang] / n - share) < 0.06, (lang, got[lang] / n)


def test_resize_image_invariants_and_query(spark, planted_dir):
    """Pure-numpy NN resize: identity size is a no-op, constant images
    stay constant at any size, the center-aligned 2x downscale picks
    the expected source pixels — and the declared multimodal_resize
    query reproduces an independent decode+resize recomputation."""
    import hashlib as _hl

    import numpy as np

    from hbase_compact_spark.functions.multimodal import (
        _det_bytes,
        resize_image,
    )
    from hbase_compact_spark.tables import load_table

    rng = np.frombuffer(_det_bytes("rz", 16 * 16 * 3), dtype=np.uint8)
    img = rng.reshape(16, 16, 3)
    assert np.array_equal(resize_image(img, (16, 16)), img)  # identity
    const = np.full((10, 10, 3), 7, dtype=np.uint8)
    assert np.array_equal(resize_image(const, (4, 6)), np.full((4, 6, 3), 7))
    # center-aligned NN 2x down: output (i, j) = source (2i+1, 2j+1)
    # since floor((i + .5) * 2) = 2i + 1
    down = resize_image(img, (8, 8))
    assert np.array_equal(down, img[1::2, 1::2])
    up = resize_image(img, (32, 32))
    assert up.shape == (32, 32, 3)

    out = {r["doc_id"]: r for r in llm.multimodal_resize(spark, planted_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, planted_dir, "documents").collect()}
    for doc_id in (0, 1):
        src = np.frombuffer(
            _det_bytes(f"img:{docs[doc_id]}", 16 * 16 * 3), dtype=np.uint8
        ).reshape(16, 16, 3)
        want = resize_image(src, (8, 8))
        row = out[doc_id]
        assert (row["src_w"], row["src_h"]) == (16, 16)
        assert (row["out_w"], row["out_h"]) == (8, 8)
        assert row["resized_md5"] == _hl.md5(want.tobytes()).hexdigest()
        assert abs(row["mean_g"] - round(float(want[:, :, 1].mean()), 6)) < 1e-9


# ------------------------------------------------------------- BPE
def test_bpe_first_merge_matches_independent_argmax(spark):
    """The first learned merge must equal the most frequent adjacent
    character pair computed INDEPENDENTLY (python fold over the
    collected vocab — small by construction), with the same
    (freq desc, pair asc) tie-break."""
    from collections import Counter

    from hbase_compact_spark.functions.bpe import (
        END_MARK,
        build_vocab,
        learn_merges,
    )
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    vocab = build_vocab(load_table(spark, sf, "documents"))
    rows = vocab.select("w", "freq").collect()
    counts: Counter = Counter()
    for r in rows:
        syms = list(r["w"]) + [END_MARK]
        for x, y in zip(syms, syms[1:]):
            counts[(x, y)] += r["freq"]
    expect = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = learn_merges(vocab, 1)[0]
    assert (got[1], got[2]) == expect[0]
    assert got[3] == expect[1]


def test_bpe_merges_deterministic_and_monotone(spark):
    """Re-learning yields the identical merge list; pair frequencies
    are non-increasing (a merge can only create pairs bounded by the
    merged pair's own count)."""
    from hbase_compact_spark.functions.bpe import build_vocab, learn_merges
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    m1 = learn_merges(build_vocab(docs), 5)
    m2 = learn_merges(build_vocab(docs), 5)
    assert m1 == m2
    assert len(m1) == 5
    freqs = [c for _, _, _, c in m1]
    assert freqs == sorted(freqs, reverse=True)
    # merged symbols are compounds of earlier symbols (e.g. 'er</w>')
    assert all(a and b for _, a, b, _ in m1)


def test_bpe_learn_merges_driver_branch_parity(spark, monkeypatch):
    """The r15 driver-side merge loop (vocab under
    HCS_BPE_DRIVER_VOCAB_MAX, collected once) must produce the
    IDENTICAL merge list as the distributed per-merge job loop
    (forced with cap=0) — same pair counts, same (count desc, a, b)
    tie-break, same greedy left-to-right rewrite."""
    from hbase_compact_spark.functions.bpe import build_vocab, learn_merges
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    monkeypatch.setenv("HCS_BPE_DRIVER_VOCAB_MAX", "200000")
    local = learn_merges(build_vocab(docs), 6)
    monkeypatch.setenv("HCS_BPE_DRIVER_VOCAB_MAX", "0")
    dist = learn_merges(build_vocab(docs), 6)
    assert local == dist
    assert len(local) == 6


def test_corpus_split_assignment_is_content_independent(spark):
    """The split contract: assignment depends ONLY on the stable doc
    key, so computing it over any subset (or after appends) yields
    identical labels for the same doc_ids. A salt/text regression in
    the hash expression breaks this immediately."""
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_llm import (
        _SPLIT_HASH_S,
        _SPLIT_TRAIN_PCT,
        _SPLIT_VAL_PCT,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    bucket = F.expr(_SPLIT_HASH_S) % 100
    label = (
        F.when(bucket < _SPLIT_TRAIN_PCT, "train")
        .when(bucket < _SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    full = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", label.alias("s")).collect()
    }
    subset = {
        r["doc_id"]: r["s"]
        for r in docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", label.alias("s"))
        .collect()
    }
    assert subset == {k: v for k, v in full.items() if k % 3 == 0}
    # all three splits are populated at fixture scale
    assert set(full.values()) == {"train", "val", "test"}


def test_dedup_clusters_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The size-adaptive CC split must be invisible in the result:
    forcing the distributed label-propagation path (threshold 0)
    yields exactly the driver union-find labeling."""
    sf = "/root/testdata/sf0.001"
    fast = {
        (r["doc_id"]): (r["cluster_id"], r["cluster_size"])
        for r in llm.dedup_clusters(spark, sf).collect()
    }
    monkeypatch.setattr(llm, "CC_DRIVER_MAX_PAIRS", 0)
    slow = {
        (r["doc_id"]): (r["cluster_id"], r["cluster_size"])
        for r in llm.dedup_clusters(spark, sf).collect()
    }
    assert fast == slow
    assert any(size > 1 for _, size in fast.values())  # non-vacuous


def test_distributed_branch_env_hooks():
    """The HCS_* cap overrides must reach the module constants: the
    full oracle sweep relies on them to FORCE the distributed
    branches (dedup_clusters label propagation, snapshot_merge
    all-candidates) under the hash compare at any scale."""
    import subprocess
    import sys as _sys

    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    code = (
        "import os; "
        "os.environ['HCS_CC_DRIVER_MAX_PAIRS']='0'; "
        "os.environ['HCS_MERGE_KEY_PROBE_CAP']='0'; "
        f"import sys; sys.path.insert(0, {repo!r}); "
        "import hbase_compact_spark.workload_llm as l; "
        "from hbase_compact_spark.compaction import snapshots as s; "
        "print(l.CC_DRIVER_MAX_PAIRS, s.MERGE_KEY_PROBE_CAP)"
    )
    out = subprocess.check_output([_sys.executable, "-c", code], text=True)
    assert out.split() == ["0", "0"]


def test_dedup_lines_drops_planted_boilerplate(spark, planted_dir):
    """Line-dedup invariants on the planted corpus: docs 0/1 are
    exact duplicates so EVERY line is shared by >=2 docs and both
    reduce to empty text; the near-dup doc 2 differs only at token 10,
    so exactly its line 1 (tokens 10-19) survives and every other
    line is dropped as boilerplate; unique docs 3/4 keep everything.
    Books must balance for all docs."""
    out = {r["doc_id"]: r for r in llm.dedup_lines(spark, planted_dir).collect()}
    assert len(out) == 5
    for r in out.values():
        assert r["n_kept"] + r["n_dropped"] == r["n_lines"]
    assert out[0]["n_kept"] == 0 and out[0]["clean_text"] == ""
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""
    toks = BASE.split()
    expected_line1 = " ".join(
        ["shiny" if i == 10 else toks[i] for i in range(10, 20)]
    )
    assert out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == expected_line1
    for d in (3, 4):
        assert out[d]["n_dropped"] == 0
        assert out[d]["clean_text"] == " ".join(out[d]["clean_text"].split())
        assert out[d]["n_kept"] == out[d]["n_lines"]


def test_ngram_novelty_invariants(spark, sf_dir):
    """Structural invariants the oracle hash alone can't localize:
    the earliest doc is 100% novel, ratios stay in (0, 1], and every
    distinct corpus shingle is novel in exactly one doc (the n_novel
    column partitions the distinct-shingle universe)."""
    from hbase_compact_spark.functions import text as TX
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_llm import _NOVELTY_W, ngram_novelty

    rows = ngram_novelty(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    by_id = {r["doc_id"]: r for r in rows}
    first_doc = min(by_id)
    assert by_id[first_doc]["novelty"] == 1.0
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_ngrams"]
        assert r["novelty"] == r["n_novel"] / r["n_ngrams"]
    n_distinct = (
        docs.select(
            F.explode(
                F.array_distinct(TX.shingles("text", _NOVELTY_W))
            ).alias("s")
        )
        .agg(F.countDistinct("s"))
        .collect()[0][0]
    )
    assert sum(r["n_novel"] for r in rows) == n_distinct


def test_ngram_novelty_hash_keyed_shuffle(spark, sf_dir):
    """The corpus-scale groupBy must key on xxhash64(shingle), not
    the shingle text (the dedup_lines shuffle-bytes discipline)."""
    from hbase_compact_spark.workload_llm import ngram_novelty

    import inspect
    import re

    from hbase_compact_spark.workload_llm import ngram_novelty as nn

    plan = ngram_novelty(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    if "xxhash64" not in plan:
        # the shared shingle frame is localCheckpoint'ed (so the
        # explode+hash pipeline runs ONCE for its two consumers);
        # the hash then lives inside the checkpointed segment and the
        # downstream plan shows a Scan ExistingRDD carrying ONLY
        # (doc_id, h) — which is itself the 8-byte-shuffle-key claim
        assert re.search(r"Scan ExistingRDD\[doc_id#\d+L,h#\d+L\]", plan), plan
        assert "xxhash64" in inspect.getsource(nn)


def test_mlm_span_corrupt_reconstruction(spark, sf_dir):
    """Per-row round trip: token count preserved, every non-mask
    position identical to the source, targets are exactly the masked
    tokens in order, n_masked books, global mask rate near the 3/16
    design point, and determinism across runs."""
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_llm import mlm_span_corrupt

    out = {
        r["doc_id"]: r for r in mlm_span_corrupt(spark, sf_dir).collect()
    }
    src = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert set(out) == set(src)
    tot_tokens = tot_masked = 0
    for d, text in src.items():
        toks = text.split(" ")
        masked = out[d]["masked_text"].split(" ")
        assert len(masked) == len(toks)
        targets = []
        for t, m in zip(toks, masked):
            if m == "<MASK>":
                targets.append(t)
            else:
                assert m == t
        assert " ".join(targets) == out[d]["targets"]
        assert out[d]["n_masked"] == len(targets)
        tot_tokens += len(toks)
        tot_masked += len(targets)
    rate = tot_masked / tot_tokens
    assert 0.13 < rate < 0.25, rate  # design point 3/16 = 0.1875
    again = {
        r["doc_id"]: r["masked_text"]
        for r in mlm_span_corrupt(spark, sf_dir).collect()
    }
    assert all(again[d] == out[d]["masked_text"] for d in out)


def test_phrase_search_counts_match_python(spark, sf_dir):
    """Exact-phrase occurrence counts vs a straight Python scan of
    the same corpus — the index-adjacency join must agree with the
    naive definition, including multiple occurrences per doc."""
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_llm import (
        _PHRASE_A,
        _PHRASE_B,
        phrase_search,
    )

    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(spark, sf_dir).collect()
    }
    want = {}
    for r in load_table(spark, sf_dir, "documents").collect():
        toks = r["text"].split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == _PHRASE_A and toks[i + 1] == _PHRASE_B
        )
        if n:
            want[r["doc_id"]] = n
    assert got == want
    assert want, "fixture must contain the phrase somewhere"


def _py_bpe_encode(text: str, merges) -> tuple[int, int, int]:
    """Reference BPE application: greedy left-to-right
    non-overlapping fold per merge, in rank order (the classic
    algorithm and exactly functions/bpe.py's rewrite)."""
    import re

    from hbase_compact_spark.functions.bpe import END_MARK

    words = re.findall(r"[a-z0-9]+", text.lower())
    n_syms = n_tokens = 0
    for w in words:
        syms = list(w) + [END_MARK]
        n_syms += len(syms)
        for _, a, b, _c in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        n_tokens += len(syms)
    return len(words), n_syms, n_tokens


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """Bit-parity of the chained codegen fold against the Python
    reference on every doc, using the SAME memoized merge table the
    query trained; compression ratio books check out."""
    import json
    import posixpath

    from hbase_compact_spark.sources.memo import memo_root
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_llm import bpe_encode

    out = {r["doc_id"]: r for r in bpe_encode(spark, sf_dir).collect()}
    root, complete = memo_root(
        sf_dir, "bpemerges", "documents", logic_rev="r8a"
    )
    assert complete, "bpe_encode must have memoized its merge table"
    with open(posixpath.join(root, "merges.json")) as fh:
        merges = [tuple(m) for m in json.load(fh)]
    assert len(merges) > 0
    src = load_table(spark, sf_dir, "documents").collect()
    assert set(out) == {r["doc_id"] for r in src}
    for r in src:
        n_words, n_syms, n_tokens = _py_bpe_encode(r["text"], merges)
        row = out[r["doc_id"]]
        assert row["n_words"] == n_words, r["doc_id"]
        assert row["n_syms"] == n_syms, r["doc_id"]
        assert row["n_tokens"] == n_tokens, r["doc_id"]
        assert row["compression"] == n_tokens / n_syms
        assert 0 < row["n_tokens"] <= row["n_syms"]


def test_grouped_topk_per_group_books(spark, sf_dir):
    """Each source yields exactly min(k, group size) rows, ranks are
    1..k dense, and the selected docs are truly the longest per
    source (ties by doc_id)."""
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_llm import (
        _TOPK_PER_GROUP,
        grouped_topk,
    )

    rows = grouped_topk(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append((-r["n_chars"], r["doc_id"]))
    got = {}
    for r in rows:
        got.setdefault(r["source"], []).append((r["rn"], r["doc_id"]))
    assert set(got) == set(by_src)
    for src, pairs in got.items():
        pairs.sort()
        k = min(_TOPK_PER_GROUP, len(by_src[src]))
        assert [rn for rn, _ in pairs] == list(range(1, k + 1))
        want_ids = [d for _, d in sorted(by_src[src])[:k]]
        assert [d for _, d in pairs] == want_ids


def test_cross_corpus_overlap_books(spark, sf_dir):
    """Matrix invariants: no diagonal, n_common symmetric,
    containment = n_common / |shingles(source_a)| in (0, 1], and a
    spot-checked pair matches a direct Python set computation."""
    from hbase_compact_spark.functions import text as TX
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_llm import (
        _XC_W,
        cross_corpus_overlap,
    )

    rows = cross_corpus_overlap(spark, sf_dir).collect()
    got = {(r["source_a"], r["source_b"]): r for r in rows}
    assert all(a != b for a, b in got)
    for (a, b), r in got.items():
        assert 0 < r["containment"] <= 1.0
        assert got[(b, a)]["n_common"] == r["n_common"]
    # direct recomputation for one pair
    sh = {}
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("source", TX.shingles("text", _XC_W).alias("sh"))
        .collect()
    ):
        sh.setdefault(r["source"], set()).update(r["sh"])
    # not every pair shares a 5-gram at tiny scale — spot-check the
    # lexicographically first pair the matrix actually contains, and
    # confirm absent pairs truly share nothing
    a, b = min(got)
    want_common = len(sh[a] & sh[b])
    r = got[(a, b)]
    assert r["n_common"] == want_common > 0
    assert r["containment"] == want_common / len(sh[a])
    for x in sh:
        for y in sh:
            if x != y and (x, y) not in got:
                assert not (sh[x] & sh[y]), (x, y)


def test_fan_out_leaves_non_file_scans_alone(spark, planted_dir):
    """fan_out keys off inputFiles(); an in-memory or post-shuffle
    DataFrame reports zero files — that is 'no information', and
    adding a repartition there would bolt a shuffle onto an
    already-wide plan (ADVICE r9). Only genuine few-file scans get
    the spread."""
    from hbase_compact_spark.functions.multimodal import fan_out

    mem = spark.range(1000).toDF("doc_id")  # in-memory: inputFiles()=[]
    assert mem.inputFiles() == []
    assert "Exchange" not in fan_out(mem)._jdf.queryExecution().executedPlan().toString()

    scan = spark.read.parquet(f"{planted_dir}/documents.parquet")
    n_files = len(scan.inputFiles())
    plan = fan_out(scan)._jdf.queryExecution().executedPlan().toString()
    if n_files < spark.sparkContext.defaultParallelism:
        assert "Exchange RoundRobinPartitioning" in plan  # few files: spread


def _synth_embeddings_dir(spark, tmp_path, n=5000, dims=64, protos=20, seed=7):
    """Synthetic embeddings fixture: n vectors around `protos`
    prototype directions (one shared label → ONE assignment cluster),
    written in the real fixture schema so dedup_semantic can read it
    as an sf_dir. Prototype structure guarantees a dense band of
    true near-duplicate pairs that spans tile boundaries."""
    import numpy as np

    rng = np.random.default_rng(seed)
    P = rng.normal(size=(protos, dims))
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    M = P[np.arange(n) % protos] + rng.normal(scale=0.05, size=(n, dims))
    rows = [
        (int(i), [float(x) for x in M[i].astype(np.float32)], 0)
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _naive_semantic_pairs(tmp_path, thr):
    """Driver-side full-matrix reference for the blocked walk: one
    n x n matmul, strict upper triangle, the query's exact slack +
    round-to-6 convention."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(str(tmp_path / "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    M = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    S = M @ M.T
    slack = 0.35 - (0.5e-6 + 1e-12)
    mask = np.triu(S >= slack, k=1)
    ai, bi = np.nonzero(mask)
    cos = np.round(S[ai, bi], 6)
    keep = cos >= 0.35
    return {
        (int(ids[a]), int(ids[b]), float(c))
        for a, b, c in zip(ai[keep], bi[keep], cos[keep])
    }


def test_dedup_semantic_blocked_tiles_match_naive(spark, tmp_path):
    """A >4096-member cluster forces the multi-tile paths (diagonal
    upper-triangle tiles AND off-diagonal full tiles); the blocked
    walk's pair set must equal a driver-side full-matrix reference
    bit-for-bit at the 6-decimal grain."""
    sf_dir = _synth_embeddings_dir(spark, tmp_path, n=5000)
    got = {
        (int(r["vec_a"]), int(r["vec_b"]), float(r["cos_sim"]))
        for r in llm.dedup_semantic(spark, sf_dir).collect()
    }
    want = _naive_semantic_pairs(tmp_path, llm.SEMANTIC_DUP_THRESHOLD)
    assert len(want) > 1000  # non-vacuous: pairs span tiles
    assert got == want


def test_dedup_semantic_salted_split_is_result_identical(spark, tmp_path, monkeypatch):
    """Force the oversized-cluster salted split (cap far below the
    synthetic cluster's 5000 members → s = ceil(5000/600) = 9
    sub-lists, 45 tasks) and pin the pair set EQUAL to the unsplit
    pass — the split is a pure parallelism change. Also pins that the
    plan still contains zero join nodes (the split map ships as a
    literal, not a join)."""
    sf_dir = _synth_embeddings_dir(spark, tmp_path, n=5000)
    unsplit = {
        (int(r["vec_a"]), int(r["vec_b"]), float(r["cos_sim"]))
        for r in llm.dedup_semantic(spark, sf_dir).collect()
    }
    monkeypatch.setattr(llm, "SEMANTIC_SPLIT_CAP", 600)
    df = llm.dedup_semantic(spark, sf_dir)
    split = {
        (int(r["vec_a"]), int(r["vec_b"]), float(r["cos_sim"]))
        for r in df.collect()
    }
    assert split == unsplit
    p = df._jdf.queryExecution().executedPlan().toString()
    for node in (
        "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    ):
        assert node not in p, f"unexpected {node} in split plan"


def test_ivf_index_incremental_maintenance_and_drift_gate(spark, tmp_path):
    """The persistent IVF index's maintenance contract: a corpus
    append costs one O(|delta|) frozen-centroid assignment committed
    as an APPEND to the index's snapshot log (base rows untouched);
    the appended assignments equal a direct assignment against the
    stored centroids; and a genuinely drifted delta (vectors
    orthogonal to every centroid) trips the drift gate — retrain
    decision, NO commit."""
    import numpy as np

    from hbase_compact_spark.compaction.snapshots import (
        SnapshotLog,
        read_table_at,
    )
    from hbase_compact_spark.functions.similarity import (
        _assign_lists_pandas,
        _cent_rows,
        build_ivf_index,
        extend_ivf_index,
    )
    from hbase_compact_spark.tables import load_table

    root = str(tmp_path / "idx")
    base = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    info = build_ivf_index(spark, base, root)
    assert info["n_vectors"] == base.count()
    alog = SnapshotLog(spark, f"{root}/assign")
    v1 = alog.latest()
    base_files = alog.files(v1)

    delta = base.limit(100).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
        "label",
    )
    res = extend_ivf_index(spark, delta, root)
    assert res["mode"] == "incremental" and res["appended"] == 100
    v2 = alog.latest()
    assert v2 == v1 + 1 and alog.read(v2).get("op") == "append-partitioned"
    # append-only: every base file carried untouched
    assert set(base_files) <= set(alog.files(v2))

    # persisted-centroid equality: the committed incr rows == a direct
    # assignment against the stored centroid table
    cents = _cent_rows(read_table_at(spark, f"{root}/cents"))
    want = {
        (int(r["vec_id"]), int(r["list_id"]))
        for r in _assign_lists_pandas(
            delta, "vec_id", "v", cents, 1
        ).collect()
    }
    got = {
        (int(r["vec_id"]), int(r["list_id"]))
        for r in read_table_at(spark, f"{root}/assign")
        .where(F.col("src") == "incr")
        .collect()
    }
    assert got == want

    # drift gate: vectors orthogonal to EVERY centroid score ~0
    # cosine — far below the base mean — so the gate must refuse to
    # extend and must leave the log untouched
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    _, _, Vt = np.linalg.svd(C, full_matrices=True)
    null_basis = Vt[len(C):]  # rows orthogonal to all centroids
    drifted_rows = [
        (int(50_000 + i), [float(x) for x in null_basis[i % len(null_basis)]], 0)
        for i in range(50)
    ]
    drifted = spark.createDataFrame(
        drifted_rows, "vec_id long, embedding array<float>, label int"
    )
    out = extend_ivf_index(spark, drifted, root)
    assert out["mode"] == "retrain", out
    assert out["new_mean"] < out["base_mean"]
    assert alog.latest() == v2  # no commit on retrain decision

    # empty delta (ADVICE r10): a no-op return, never a raise from
    # append_partitioned's zero-file guard, and no commit
    empty = extend_ivf_index(spark, delta.limit(0), root)
    assert empty == {
        "mode": "incremental",
        "appended": 0,
        "base_mean": out["base_mean"],
        "new_mean": None,
    }
    assert alog.latest() == v2

    # r14: PQ codes ride the same commits — every appended row holds
    # a bit-packed code + reconstruction error, and the delta was
    # encoded against the FROZEN codebook (bit-parity with a direct
    # encode; the O(|delta|) claim extends to the search structure)
    from hbase_compact_spark.functions.similarity import pq_encode_packed

    cb = read_table_at(spark, f"{root}/codebook")
    want_codes = {
        (int(r["vec_id"]), int(r["code"]))
        for r in pq_encode_packed(delta, cb).collect()
    }
    incr = read_table_at(spark, f"{root}/assign").where(
        F.col("src") == "incr"
    )
    got_codes = {
        (int(r["vec_id"]), int(r["code"])) for r in incr.collect()
    }
    assert got_codes == want_codes
    assert incr.where(F.col("qerr").isNull()).count() == 0

    # quantization drift gate: a ratio floor any real delta exceeds
    # forces the retrain decision (reason=quantization_drift), no
    # commit — the codebook-staleness guard, independent of the
    # assignment-cosine gate
    delta2 = base.limit(20).select(
        (F.col("vec_id") + 60_000).alias("vec_id"), "embedding", "label"
    )
    out2 = extend_ivf_index(spark, delta2, root, qerr_ratio=1e-9)
    assert out2["mode"] == "retrain", out2
    assert out2["reason"] == "quantization_drift"
    assert alog.latest() == v2  # still no commit


def test_ann_index_pq_serving_recall(spark):
    """The persistent index is SERVABLE (r14): ann_index_pq answers
    from stored centroids + stored bit-packed codes (base AND
    incrementally appended delta), holds the >=0.9 recall floor
    against exact brute force over the full corpus, and is
    deterministic run-to-run."""
    from pyspark.sql import functions as F

    from hbase_compact_spark.functions.similarity import brute_force_topk
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    base = load_table(spark, sf, "embeddings")
    union = base.unionByName(
        base.select(
            (F.col("vec_id") + llm.ANN_IDX_OFFSET).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
            "label",
        )
    )
    # r15: the fixture MOR-deletes id % ANN_IDX_DEL_MOD == 0 after
    # the build, so the ground truth is brute force over SURVIVORS
    live = union.filter(F.col("vec_id") % llm.ANN_IDX_DEL_MOD != 0)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(
            base.filter(F.col("vec_id") < 5), live, k=10
        ).collect()
    }
    got = sorted(
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in llm.ann_index_pq(spark, sf).collect()
    )
    pairs = {(a, b) for a, b, _, _ in got}
    assert not any(
        b % llm.ANN_IDX_DEL_MOD == 0 for _, b in pairs
    ), "a deleted corpus id served from the index"
    recall = len(exact & pairs) / len(exact)
    assert recall >= 0.9, f"served-index recall@10 too low: {recall}"
    again = sorted(
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in llm.ann_index_pq(spark, sf).collect()
    )
    assert got == again, "served-index search must be deterministic"


def test_index_serve_time_delete_guard_without_maintenance(spark, tmp_path):
    """The serve-time anti-join ALONE keeps a deleted corpus row out
    of top-k — before any prune_ivf_index maintenance pass — and
    recall on the survivors holds the 0.9 floor (VERDICT r14 task 4
    invariant). Also pins index_pending_deletes' resolution of
    POSITIONAL entries and its re-append exemption: a deleted-then-
    re-inserted id must NOT be excluded."""
    from pyspark.sql import functions as F

    from hbase_compact_spark.compaction.snapshots import (
        SnapshotLog,
        append_partitioned,
        read_table_at,
        snapshot_delete,
    )
    from hbase_compact_spark.functions.similarity import (
        brute_force_topk,
        build_ivf_index,
        index_pending_deletes,
        ivfpq_index_topk,
    )
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    base = load_table(spark, sf, "embeddings")
    index_root = str(tmp_path / "idx")
    build_ivf_index(spark, base, index_root)
    corpus_root = str(tmp_path / "corpus")
    base.repartitionByRange(4, "vec_id").write.parquet(corpus_root)
    SnapshotLog(spark, corpus_root).bootstrap()
    # MOR-delete a contiguous block (positional entries), then
    # RE-APPEND one of the deleted ids — it is alive again and must
    # not be excluded
    snapshot_delete(
        spark, corpus_root, {"vec_id": (100, 119)}, mode="mor"
    )
    revived = base.filter(F.col("vec_id") == 105)
    append_partitioned(spark, corpus_root, revived)
    dead = index_pending_deletes(spark, corpus_root)
    dead_ids = {r["vec_id"] for r in dead.collect()}
    assert dead_ids == set(range(100, 120)) - {105}
    live = read_table_at(spark, corpus_root)
    got = ivfpq_index_topk(
        spark,
        base.filter(F.col("vec_id") < 5),
        live,
        index_root,
        k=10,
        n_probe=9,
        rerank_factor=160,
        deleted_ids=dead,
    ).collect()
    served = {r["vec_id"] for r in got}
    assert not served & dead_ids, "deleted ids served from stale codes"
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(
            base.filter(F.col("vec_id") < 5),
            base.join(
                dead.withColumnRenamed(dead.columns[0], "vec_id"),
                "vec_id",
                "left_anti",
            ),
            k=10,
        ).collect()
    }
    pairs = {(r["query_id"], r["vec_id"]) for r in got}
    recall = len(exact & pairs) / len(exact)
    assert recall >= 0.9, f"survivor recall too low: {recall}"


def test_ann_high_recall_operating_points(spark):
    """The 0.9-recall operating points named in RECALL_r11's dial
    curves hold as floors — ivf n_probe=9 and pq rerank_factor=80
    each recover >= 0.9 of the exact top-10 on the isotropic fixtures
    (their worst case; measured 0.98 / 1.0 at sf0.001 and 0.98 / 0.96
    at sf0.1). Since r12 these ARE the registered ann_ivf / ann_pq
    defaults (VERDICT r11 task 5: the dial curves showed the 0.9
    points cost nothing — rerank/ADC dominate, extra probes are
    free), so the registered queries are asserted at the same floor
    below."""
    from pyspark.sql import functions as F

    from hbase_compact_spark.functions.similarity import ivf_topk, pq_topk
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["query_id"], r["vec_id"])
        for r in llm.similarity_topk(spark, sf).collect()
    }
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(q, emb, k=10, n_probe=9, refine_iters=2).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.9
    pq = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(q, emb, k=10, rerank_factor=80).collect()
    }
    assert len(exact & pq) / len(exact) >= 0.9
    # the REGISTERED queries now run at these operating points
    reg_ivf = {
        (r["query_id"], r["vec_id"])
        for r in llm.ann_ivf(spark, sf).collect()
    }
    assert len(exact & reg_ivf) / len(exact) >= 0.9
    reg_pq = {
        (r["query_id"], r["vec_id"])
        for r in llm.ann_pq(spark, sf).collect()
    }
    assert len(exact & reg_pq) / len(exact) >= 0.9


def test_ann_ivfpq_composed(spark):
    """Composed IVF+PQ (r13): the registered operating point
    (n_probe=9, rerank_factor=80) holds the >=0.9 recall floor
    (measured 0.98 at sf0.001 AND sf0.01 — PQ error inside probed
    lists washes out in the 80x rerank pool), the search is
    deterministic run-to-run (seedless k-means + hash-init PQ), and
    opening every dial (all lists probed, unbounded rerank) recovers
    the EXACT brute-force answer — the correctness anchor under the
    approximation."""
    from pyspark.sql import functions as F

    from hbase_compact_spark.functions.similarity import ivfpq_topk
    from hbase_compact_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["query_id"], r["vec_id"])
        for r in llm.similarity_topk(spark, sf).collect()
    }
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    reg = sorted(
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in llm.ann_ivfpq(spark, sf).collect()
    )
    pairs = {(a, b) for a, b, _, _ in reg}
    assert len(exact & pairs) / len(exact) >= 0.9
    again = sorted(
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in llm.ann_ivfpq(spark, sf).collect()
    )
    assert reg == again, "composed ANN must be deterministic"
    full = {
        (r["query_id"], r["vec_id"])
        for r in ivfpq_topk(
            q, emb, k=10, n_probe=10, rerank_factor=10**6
        ).collect()
    }
    assert full == exact, "full dial must recover the exact answer"
