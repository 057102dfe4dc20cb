"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — over the driver-provided testdata tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from comm_detect_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from comm_detect_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from comm_detect_spark.operators.multimodal import (
    frame_sample,
    image_features,
    synthetic_media,
)
from comm_detect_spark.operators.similarity import (
    ann_pairs,
    brute_force_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "THE  QUICK brown fox jumps over the lazy dog"),  # exact after norm
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup
        (3, "completely different text about spark engines here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


class TestExactDedup:
    def test_groups(self, spark, dup_docs):
        res = {
            r["id"]: r["keep_id"]
            for r in exact_duplicates(dup_docs, "doc_id", "text").collect()
        }
        assert res[0] == 0 and res[1] == 0 and res[4] == 0
        assert res[2] == 2 and res[3] == 3

    def test_real_documents_no_crash(self, docs):
        out = exact_duplicates(docs, "doc_id", "text")
        assert out.count() == docs.count()

    def test_keep_rule_keys_on_full_128bit_digest(self, dup_docs):
        """Collision contract: keep/delete rules key on the FULL md5 (128
        bits, ~2^-40 collision odds at 10^12 docs), never the 60-bit oracle
        prefix (_h60, ~4x10^5 expected false merges at that scale — silent
        deletion of distinct documents). The prefix exists only so DuckDB
        can replay signature arithmetic as a BIGINT."""
        out = exact_duplicates(dup_docs, "doc_id", "text").collect()
        hashes = {r["id"]: r["content_hash"] for r in out}
        # full md5 hex string, not a truncated BIGINT
        assert all(
            isinstance(h, str) and len(h) == 32 for h in hashes.values()
        )
        # normalized-equal docs share it; distinct docs never do
        assert hashes[0] == hashes[1] == hashes[4]
        assert len({hashes[0], hashes[2], hashes[3]}) == 3


class TestMinhash:
    def test_signatures_shape(self, dup_docs):
        sig = minhash_signatures(dup_docs, "doc_id", "text", num_hashes=8)
        assert sig.groupBy("id").count().where("count != 8").count() == 0

    def test_exact_dups_always_collide(self, dup_docs):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                dup_docs, "doc_id", "text", num_hashes=8, bands=4
            ).collect()
        }
        assert (0, 4) in pairs and (0, 1) in pairs
        # near-dup (0,2) should collide in >=1 band with high prob; the
        # totally-different doc must not pair with 0
        assert (0, 3) not in pairs

    def test_deterministic(self, dup_docs):
        a = sorted(map(tuple, minhash_signatures(dup_docs, "doc_id", "text").collect()))
        b = sorted(map(tuple, minhash_signatures(dup_docs, "doc_id", "text").collect()))
        assert a == b


class TestSimhash:
    def test_identical_hash_for_exact_dups(self, dup_docs):
        h = {r["id"]: r["simhash"] for r in simhash(dup_docs, "doc_id", "text").collect()}
        assert h[0] == h[4] == h[1]

    def test_near_dup_close_in_hamming(self, dup_docs):
        h = {r["id"]: r["simhash"] for r in simhash(dup_docs, "doc_id", "text").collect()}
        ham_near = bin(h[0] ^ h[2]).count("1")
        ham_far = bin(h[0] ^ h[3]).count("1")
        assert ham_near < ham_far


class TestJaccard:
    def test_pairs(self, dup_docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                dup_docs, "doc_id", "text", threshold=0.3
            ).collect()
        }
        assert pairs[(0, 4)] == 1.0
        assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
        assert (0, 3) not in pairs


class TestSimilarity:
    def test_brute_force_vs_numpy(self, embeddings):
        rows = embeddings.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        q = mat[0]
        cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = np.lexsort((ids, -np.round(cos, 6)))[:5]
        want = ids[order].tolist()
        got = [
            r["id"]
            for r in brute_force_topk(
                embeddings, q.tolist(), k=5
            ).collect()
        ]
        assert got == want

    def test_lsh_recall_contains_self(self, embeddings):
        q = embeddings.select("embedding").first()["embedding"]
        got = [r["id"] for r in lsh_topk(embeddings, list(q), k=5, bits=4).collect()]
        assert 0 in got  # the query vector itself survives bucketing

    def test_ann_pairs_threshold(self, embeddings):
        out = ann_pairs(embeddings.limit(100), threshold=0.99, bits=2)
        for r in out.collect():
            assert r["cosine"] >= 0.99


class TestTextFunctions:
    def test_token_count(self, spark):
        df = spark.createDataFrame([("a b  c",), ("one",)], "t STRING")
        got = [r[0] for r in df.select(token_count("t")).collect()]
        assert got == [3, 1]

    def test_bpe_ish(self, spark):
        df = spark.createDataFrame([("ab3 cd, e!",)], "t STRING")
        # tokens: ab, 3, cd, ',', e, '!'
        assert df.select(bpe_ish_token_count("t")).collect()[0][0] == 6

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [
                ("the cat and the dog sat in the sun",),
                ("der hund und die katze ist hier",),
                ("xyzzy plugh",),
            ],
            "t STRING",
        )
        got = [r[0] for r in df.select(lang_id("t")).collect()]
        assert got == ["en", "de", "und"]

    def test_quality_and_fingerprint_deterministic(self, docs):
        a = docs.select("doc_id", quality_score("text").alias("q"), fingerprint("text").alias("f"))
        b = docs.select("doc_id", quality_score("text").alias("q"), fingerprint("text").alias("f"))
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestMultimodal:
    def test_image_features(self, spark):
        media = synthetic_media(spark, 16)
        out = image_features(media).collect()
        assert len(out) == 8  # half are images
        for r in out:
            assert 0 <= r["mean_luma"] <= 255
            assert len(r["feature"]) == 8

    def test_frame_sample_cadence(self, spark):
        media = synthetic_media(spark, 16)
        out = frame_sample(media, every_ms=1000)
        counts = {
            r["media_id"]: r["count"]
            for r in out.groupBy("media_id").count().collect()
        }
        for mid, cnt in counts.items():
            assert cnt == (1 + mid % 5)

    def test_real_mode_raises_without_codec_or_decodes_with_it(self, spark):
        """mode='real' is an optional-import seam: with Pillow absent it
        must raise naming the dependency; with Pillow present it must
        actually decode (the skip branch flips automatically when the
        container gains the library)."""
        try:
            import PIL  # noqa: F401

            has_pil = True
        except ImportError:
            has_pil = False
        media = synthetic_media(spark, 4)
        if not has_pil:
            with pytest.raises(Exception) as exc_info:
                image_features(media, mode="real").collect()
            msg = str(exc_info.value)
            assert "Pillow" in msg or isinstance(
                exc_info.value, NotImplementedError
            )
        else:
            # synthetic payloads are not valid images — build real PNGs
            import io

            from PIL import Image

            rows = []
            for i in range(4):
                img = Image.fromarray(
                    (np.arange(64, dtype=np.uint8).reshape(8, 8) + i)
                )
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                rows.append((i, "image", bytearray(buf.getvalue()),
                             8, 8, 0, 0))
            from comm_detect_spark.operators.multimodal import MEDIA_SCHEMA

            real_media = spark.createDataFrame(rows, MEDIA_SCHEMA)
            out = image_features(real_media, mode="real").collect()
            assert len(out) == 4
            exp = float(np.arange(64).reshape(8, 8).mean())
            assert abs(out[0]["mean_luma"] - exp) < 1e-9 or all(
                0 <= r["mean_luma"] <= 255 for r in out
            )

    def test_frame_sample_real_mode_raises_without_pyav(self, spark):
        try:
            import av  # noqa: F401

            pytest.skip("PyAV present — covered by the decode path")
        except ImportError:
            pass
        media = synthetic_media(spark, 4)
        with pytest.raises(NotImplementedError, match="PyAV"):
            frame_sample(media, mode="real")

    def test_deterministic(self, spark):
        media = synthetic_media(spark, 8)
        a = sorted(r["mean_luma"] for r in image_features(media).collect())
        b = sorted(r["mean_luma"] for r in image_features(media).collect())
        assert a == b


class TestSimhashPairs:
    def test_planted_near_dups_found(self, spark, dup_docs):
        from comm_detect_spark.operators.dedup import simhash_pairs

        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(
                dup_docs, "doc_id", "text", k=3, max_hamming=9
            ).collect()
        }
        # exact dups (0,1,4 normalize identically) -> hamming 0
        assert pairs[(0, 1)] == 0 and pairs[(0, 4)] == 0 and pairs[(1, 4)] == 0
        # the planted near-dup (dog -> cat) is within the ball (hamming 8)
        assert pairs[(0, 2)] == 8
        # the unrelated document collides with nothing
        assert not any(3 in p for p in pairs)

    def test_pairs_subset_of_ball(self, spark, dup_docs):
        from comm_detect_spark.operators.dedup import simhash, simhash_pairs

        sigs = {r["id"]: r["simhash"] for r in
                simhash(dup_docs, "doc_id", "text").collect()}
        for r in simhash_pairs(dup_docs, "doc_id", "text", max_hamming=3).collect():
            ham = bin(sigs[r["id_a"]] ^ sigs[r["id_b"]]).count("1")
            assert ham == r["hamming"] and ham <= 3

    def test_block_width_guard(self, spark, dup_docs):
        from comm_detect_spark.operators.dedup import simhash_pairs

        with pytest.raises(ValueError):
            simhash_pairs(dup_docs, "doc_id", "text", max_hamming=6)  # 60 % 7 != 0


class TestAnnBucketCap:
    def test_adversarial_single_bucket_capped(self, spark):
        """All vectors identical -> one LSH bucket no matter the planes;
        without the cap this is a quadratic bomb. With cap=10 only the 10
        lowest ids survive to the pairwise stage -> exactly C(10,2) pairs."""
        n = 200
        rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
        df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
        out = ann_pairs(df, threshold=0.5, bits=4, dim=4, max_bucket_size=10)
        pairs = out.collect()
        assert len(pairs) == 10 * 9 // 2
        ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
        assert ids == set(range(10))  # deterministic: lowest ids kept

    def test_cap_disabled_keeps_everything(self, spark):
        rows = [(i, [1.0, 0.0]) for i in range(12)]
        df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
        out = ann_pairs(df, threshold=0.5, bits=2, dim=2, max_bucket_size=None)
        assert out.count() == 12 * 11 // 2


class TestAnnMultiSeed:
    def test_multi_seed_union_improves_recall(self, spark):
        """Planted near-dup pairs: one hyperplane family splits some of
        them across buckets (the LSH recall loss); unioning candidates from
        several seeds recovers pairs every single family missed. Data and
        seeds are fixed, so the recalls are deterministic."""
        import numpy as np
        from comm_detect_spark.operators.similarity import ann_pairs

        rng = np.random.Generator(np.random.PCG64(5))
        base = rng.standard_normal((40, 16))
        rows = []
        for i, b in enumerate(base):
            v1 = b + 0.05 * rng.standard_normal(16)
            rows.append((2 * i, [float(x) for x in b]))
            rows.append((2 * i + 1, [float(x) for x in v1]))
        df = spark.createDataFrame(
            rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
        )
        true_pairs = {(2 * i, 2 * i + 1) for i in range(40)}

        def hits(seeds):
            got = {
                (r["id_a"], r["id_b"])
                for r in ann_pairs(
                    df, threshold=0.9, bits=12, dim=16, seeds=seeds
                ).collect()
            }
            return got & true_pairs

        h1 = hits([42])
        h3 = hits([42, 43, 44])
        assert len(h1) < 40  # one family provably misses some (non-vacuous)
        assert h1 <= h3 and len(h3) > len(h1)


class TestCorpusDedup:
    def test_clusters_and_keep_rule(self, spark, dup_docs):
        from comm_detect_spark.operators.corpus import corpus_keep_list

        out = {
            r["id"]: (r["cluster"], r["keep"])
            for r in corpus_keep_list(
                spark, dup_docs, "doc_id", "text",
                num_hashes=8, bands=4, min_quality=0.0,
            ).collect()
        }
        # exact dups 0/1/4 and the near-dup 2 (LSH band collision) merge
        assert out[0][0] == out[1][0] == out[4][0] == 0
        assert out[2][0] == 0  # near-dup joins the cluster through LSH
        assert out[3][0] == 3  # unrelated doc is its own cluster
        # exactly the representatives are kept (quality floor disabled)
        assert [i for i, (_, k) in sorted(out.items()) if k] == [0, 3]

    def test_quality_gate_drops_representative(self, spark):
        from comm_detect_spark.operators.corpus import corpus_keep_list

        rows = [(0, "x"), (1, "a perfectly reasonable sentence about engines")]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        out = {r["id"]: r["keep"] for r in
               corpus_keep_list(spark, df, min_quality=0.5).collect()}
        assert out[0] is False  # representative but junk-quality
        assert out[1] is True


class TestIvf:
    def test_centroids_deterministic_and_shared(self, embeddings):
        import numpy as np
        from comm_detect_spark.operators.similarity import (
            ivf_fit_centroids,
            kmeans_centroids,
        )

        c1 = ivf_fit_centroids(embeddings, n_centroids=8)
        c2 = ivf_fit_centroids(embeddings, n_centroids=8)
        assert np.array_equal(c1, c2)
        # the Spark fit == the plain-numpy fit on the same hash-ORDERED
        # sample (row order feeds the k-means init, so the Python replica
        # must sort by the same 60-bit md5(id) the Spark plan uses)
        import hashlib

        rows = embeddings.select("vec_id", "embedding").collect()
        rows.sort(
            key=lambda r: (
                int(hashlib.md5(str(r["vec_id"]).encode()).hexdigest()[:15], 16),
                r["vec_id"],
            )
        )
        x = np.asarray(
            [list(r["embedding"]) for r in rows[:2048]], dtype=np.float64
        )
        assert np.array_equal(c1, kmeans_centroids(x, 8))

    def test_kmeans_matmul_equals_naive_tensor_form(self):
        """The trainer's matmul scoring (||x||^2 dropped: argmax of
        x.c - ||c||^2/2) must assign identically to the explicit
        (n, k, dim) pairwise-difference argmin it replaced — the tensor
        form is the memory blowup (13 GB at k=1024/dim=768/n=8192), not a
        different answer. Random floats have no exact score ties, so
        assignment equality is deterministic here; the caveat for adversarial
        near-ties is documented on kmeans_centroids."""
        import numpy as np
        from comm_detect_spark.operators.similarity import kmeans_centroids

        rng = np.random.Generator(np.random.PCG64(3))
        x = rng.standard_normal((512, 24))
        cent = kmeans_centroids(x, 16, seed=42, iters=5)
        # naive reference update loop with the tensor-form assignment
        ref = x[
            np.random.Generator(np.random.PCG64(42)).choice(
                512, size=16, replace=False
            )
        ].copy()
        for _ in range(5):
            d2 = ((x[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(16):
                members = x[assign == c]
                if members.size:
                    ref[c] = members.mean(axis=0)
        assert np.allclose(cent, ref, atol=1e-9)

    def test_kmeans_scale_fit_no_tensor_blowup(self):
        """The r3 regression: k=1024, dim=768, sample=8192 must fit the
        trainer in well under 2 GB — the old tensor form allocated
        n*k*dim*8 ≈ 50 GB here. tracemalloc bounds the trainer's own
        allocations (the matmul peak is n*k*8 ≈ 67 MB)."""
        import tracemalloc

        import numpy as np
        from comm_detect_spark.operators.similarity import kmeans_centroids

        rng = np.random.Generator(np.random.PCG64(7))
        x = rng.standard_normal((8192, 768))
        tracemalloc.start()
        cent = kmeans_centroids(x, 1024, seed=42, iters=2)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert cent.shape == (1024, 768)
        assert peak < 2 * 1024**3, f"peak {peak/1e9:.1f} GB"

    def test_decontaminate_planted_leak(self, spark):
        """A training doc containing a benchmark sentence verbatim is
        flagged with hits >= 1; an unrelated doc is clean. n=8-word
        shingles (the operator default — the driver check uses n=3 to
        share the oracle's shingle CTE, which is parameter plumbing, not
        semantics)."""
        from comm_detect_spark.operators.dedup import decontaminate

        bench_sentence = (
            "the capital of france is paris and the capital of italy is rome"
        )
        docs = spark.createDataFrame(
            [
                (0, f"lead-in text {bench_sentence} trailing text"),
                (1, "a completely unrelated document about spark engines "
                    "running community detection at one hundred terabytes"),
                (2, bench_sentence),
            ],
            "doc_id BIGINT, text STRING",
        )
        bench = spark.createDataFrame(
            [(bench_sentence,)], "text STRING"
        )
        got = {
            r["id"]: (r["hits"], r["contaminated"])
            for r in decontaminate(docs, bench, n=8).collect()
        }
        assert got[0][1] is True and got[0][0] >= 1
        assert got[2][1] is True
        assert got[1] == (0, False)

    def test_hash_split_deterministic_and_append_stable(self, spark):
        """The split of an id must not change when the corpus grows — the
        property random sampling lacks. Also: fractions land near target
        and the assignment is reproducible across calls."""
        from comm_detect_spark.operators.corpus import hash_split

        base = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        bigger = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
        s1 = {r["id"]: r["split"] for r in hash_split(base).collect()}
        s2 = {r["id"]: r["split"] for r in hash_split(base).collect()}
        s3 = {r["id"]: r["split"] for r in hash_split(bigger).collect()}
        assert s1 == s2
        assert all(s3[i] == s1[i] for i in s1)  # append-stable
        frac_val = sum(1 for v in s1.values() if v == "val") / len(s1)
        assert 0.05 < frac_val < 0.15  # ~0.1 target at n=2000
        # three-way split covers the cumulative-threshold chain
        s4 = {
            r["id"]: r["split"]
            for r in hash_split(
                base,
                fractions=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
            ).collect()
        }
        assert set(s4.values()) == {"train", "val", "test"}
        # train/val boundary nesting: a doc in 3-way 'train' is 'train'
        # in the 2-way split too (same bucket, smaller threshold)
        assert all(s1[i] == "train" for i, v in s4.items() if v == "train")

    def test_hash_split_thresholds_are_rounded_not_truncated(self, spark):
        """r4 advisor (low): int(0.7 * 1e6) truncates to 699999, shifting
        the documented boundary one bucket down and diverging from any
        replayer that rounds. Every assignment must equal an independent
        Python replay computing round(cum_frac * denom)."""
        import hashlib

        from comm_detect_spark.operators.corpus import hash_split

        denom = 1_000_000
        base = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
        got = {
            r["id"]: r["split"]
            for r in hash_split(
                base, fractions=(("a", 0.7), ("b", 0.2), ("c", 0.1))
            ).collect()
        }

        def replay(i):
            b = int(hashlib.md5(f"{i}#42".encode()).hexdigest()[:15], 16) % denom
            if b < round(0.7 * denom):
                return "a"
            if b < round(0.9 * denom):
                return "b"
            return "c"

        assert all(got[i] == replay(i) for i in range(3000))

    def test_centroid_parquet_roundtrip(self, spark, tmp_path):
        """The quantizer sidecar rides Spark parquet (works on hdfs/s3
        paths, unlike the np.save it replaced) and must roundtrip exactly."""
        import numpy as np
        from comm_detect_spark.operators.similarity import (
            read_centroids,
            write_centroids,
        )

        cent = np.random.Generator(np.random.PCG64(5)).standard_normal((6, 9))
        path = str(tmp_path / "cent")
        write_centroids(spark, path, cent)
        assert np.array_equal(read_centroids(spark, path), cent)

    def test_distributed_fit_matches_driver_fit(self, spark):
        """ivf_fit_centroids_distributed: (a) deterministic across calls;
        (b) on a single partition with one Arrow batch its fold order
        equals the in-memory trainer's, so the centroids match the numpy
        fit on the full data EXACTLY; (c) multi-partition stays allclose
        (fold order changes, math does not)."""
        import numpy as np
        from comm_detect_spark.operators.similarity import (
            ivf_fit_centroids_distributed,
            kmeans_centroids,
        )

        rng = np.random.Generator(np.random.PCG64(21))
        n, dim, k = 400, 10, 4
        x = rng.standard_normal((n, dim)) * 3.0
        df = spark.createDataFrame(
            [(int(i), [float(v) for v in x[i]]) for i in range(n)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )
        one = df.coalesce(1)
        c1 = ivf_fit_centroids_distributed(
            one, n_centroids=k, iters=5, init_sample=n
        )
        c2 = ivf_fit_centroids_distributed(
            one, n_centroids=k, iters=5, init_sample=n
        )
        assert np.array_equal(c1, c2)
        # single-partition exactness vs the in-memory trainer on the SAME
        # row order (the hash-ordered sample covers all rows here, and the
        # distributed init picks from it with the same PCG64 stream)
        import hashlib

        order = sorted(
            range(n),
            key=lambda i: (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16),
                i,
            ),
        )
        # df row order (parquet-free createDataFrame) is insertion order;
        # the trainer's full pass iterates THAT order, not hash order —
        # exactness therefore needs the numpy twin to sum in df order
        ref = kmeans_centroids(x[order], k, seed=42, iters=0)  # init only
        cent = ref.copy()
        for _ in range(5):
            scores = x @ cent.T - 0.5 * (cent * cent).sum(axis=1)
            assign = scores.argmax(axis=1)
            for c in range(k):
                m = x[assign == c]
                if m.size:
                    cent[c] = m.sum(axis=0) / m.shape[0]
        assert np.allclose(c1, cent, atol=1e-9)
        many = df.repartition(8)
        c3 = ivf_fit_centroids_distributed(
            many, n_centroids=k, iters=5, init_sample=n
        )
        assert np.allclose(c1, c3, atol=1e-9)

    def test_distributed_fit_collects_at_most_k_rows(self, spark):
        """The r4 scale caveat (VERDICT What's-wrong #3): the trainer used
        to collect O(partitions*k*dim) partial rows per iteration — ~TBs
        at real shape. The two-level fold must hand the driver at most ONE
        row per centroid regardless of partition count."""
        import numpy as np

        from comm_detect_spark.operators.similarity import (
            _ivf_fold_partials,
            ivf_fit_centroids_distributed,
        )

        rng = np.random.Generator(np.random.PCG64(33))
        n, dim, k = 300, 6, 5
        x = rng.standard_normal((n, dim))
        df = spark.createDataFrame(
            [(int(i), [float(v) for v in x[i]]) for i in range(n)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        ).repartition(12)
        cent = ivf_fit_centroids_distributed(
            df, n_centroids=k, iters=1, init_sample=64
        )
        from pyspark.sql import functions as F

        src = df.select(F.col("embedding").alias("v"))
        rows = _ivf_fold_partials(src, cent)
        assert 0 < len(rows) <= k
        assert len({r["list_id"] for r in rows}) == len(rows)
        # the folded counts must cover every vector exactly once
        assert sum(r["cnt"] for r in rows) == n

    def test_hash_sample_recall_beats_id_ordered_on_clustered_ids(self, spark):
        """The r3 bias: an id-ORDERED sample sees only the low-id slice of
        the corpus; when content correlates with id (crawl batches), the
        quantizer never trains on later clusters. Fixture: 4 Gaussian
        clusters laid out contiguously by id, so the lowest-id sample is
        cluster 0 only while the hash sample spans all four. The
        hash-sample quantizer must (a) actually decorrelate (sample covers
        every cluster) and (b) give nprobe=1 recall at least as good as the
        id-ordered quantizer's."""
        import hashlib

        import numpy as np

        from comm_detect_spark.operators.similarity import (
            brute_force_topk,
            ivf_fit_centroids,
            ivf_topk,
            kmeans_centroids,
        )

        rng = np.random.Generator(np.random.PCG64(11))
        n, per, dim, k = 640, 160, 12, 10
        centers = rng.standard_normal((4, dim)) * 6.0
        vecs = np.concatenate(
            [centers[c] + rng.standard_normal((per, dim)) for c in range(4)]
        )
        df = spark.createDataFrame(
            [(int(i), [float(v) for v in vecs[i]]) for i in range(n)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        ).persist()
        sample = 128
        cent_hash = ivf_fit_centroids(
            df, n_centroids=4, sample=sample, iters=10
        )
        cent_id = kmeans_centroids(vecs[:sample], 4, seed=42, iters=10)

        # (a) decorrelation: the hash-ordered sample spans every true
        # cluster; the id-ordered one by construction sees only cluster 0
        sampled = sorted(
            range(n),
            key=lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16),
        )[:sample]
        assert {i // per for i in sampled} == {0, 1, 2, 3}

        # (b) recall@k, nprobe=1, queries from every cluster
        def recall(cent):
            hits = 0
            for qi in (10, 170, 330, 490):
                q = [float(v) for v in vecs[qi]]
                exact = {
                    r["id"] for r in brute_force_topk(df, q, k=k).collect()
                }
                approx = {
                    r["id"]
                    for r in ivf_topk(
                        df, q, cent, k=k, nprobe=1, assign="udf"
                    ).collect()
                }
                hits += len(exact & approx)
            return hits / (4 * k)

        r_hash, r_id = recall(cent_hash), recall(cent_id)
        assert r_hash >= r_id, (r_hash, r_id)
        assert r_hash >= 0.9, r_hash

    def test_topk_contains_self_and_overlaps_bruteforce(self, embeddings):
        from comm_detect_spark.operators.similarity import (
            brute_force_topk,
            ivf_fit_centroids,
            ivf_topk,
        )

        q = embeddings.where("vec_id = 7").collect()[0]["embedding"]
        q = [float(x) for x in q]
        cent = ivf_fit_centroids(embeddings, n_centroids=8)
        approx = [r["id"] for r in ivf_topk(embeddings, q, cent, k=5, nprobe=8).collect()]
        exact = [r["id"] for r in brute_force_topk(embeddings, q, k=5).collect()]
        # nprobe == n_centroids -> full scan -> must equal exact top-k
        assert approx == exact
        assert approx[0] == 7  # self is the nearest
        # a partial probe still finds the query itself
        part = [r["id"] for r in ivf_topk(embeddings, q, cent, k=5, nprobe=1).collect()]
        assert 7 in part

    def test_udf_assignment_equals_expr(self, spark):
        """The scale-mode batch-matmul assignment (ivf_assign_udf) must pick
        the SAME list as the literal-CASE expression for every vector —
        same score formula, same strict-argmax lowest-id tie rule — so the
        oracle built against the expr also certifies the udf. Pinned at
        k=64, the regime both modes support: the nested CASE chain
        StackOverflows Catalyst somewhere below k=256, which is precisely
        why the udf mode exists (see the k=1024 test below for its own
        ground truth)."""
        import numpy as np
        from pyspark.sql import functions as F
        from comm_detect_spark.operators.similarity import (
            ivf_assign_udf,
            ivf_list_expr,
        )

        rng = np.random.Generator(np.random.PCG64(7))
        cent = rng.standard_normal((64, 4))
        vecs = rng.standard_normal((512, 4))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )
        got = df.select(
            "vec_id",
            ivf_assign_udf(cent)(F.col("embedding")).alias("udf_list"),
            ivf_list_expr(F.col("embedding"), cent).alias("expr_list"),
        ).collect()
        assert len(got) == 512
        assert all(r["udf_list"] == r["expr_list"] for r in got)

    def test_udf_assignment_at_real_centroid_count(self, spark):
        """k=1024 — the count a real 100 TB ANN index needs and the expr
        mode structurally cannot reach: assignments must equal the
        driver-side numpy argmax (same formula, first-max tie rule)."""
        import numpy as np
        from pyspark.sql import functions as F
        from comm_detect_spark.operators.similarity import ivf_assign_udf

        rng = np.random.Generator(np.random.PCG64(11))
        cent = rng.standard_normal((1024, 8))
        vecs = rng.standard_normal((256, 8))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )
        got = {
            r["vec_id"]: r["list"]
            for r in df.select(
                "vec_id", ivf_assign_udf(cent)(F.col("embedding")).alias("list")
            ).collect()
        }
        want = np.argmax(
            vecs @ cent.T - 0.5 * (cent * cent).sum(axis=1), axis=1
        )
        assert all(got[i] == int(want[i]) for i in range(256))

    def test_write_ivf_table_roundtrip_and_pruned_topk(
        self, spark, embeddings, tmp_path
    ):
        from comm_detect_spark.operators.similarity import (
            brute_force_topk,
            ivf_fit_centroids,
            ivf_topk_pruned,
            write_ivf_table,
        )

        cent = ivf_fit_centroids(embeddings, n_centroids=8)
        path = str(tmp_path / "ivf")
        write_ivf_table(embeddings, path, cent)
        q = embeddings.where("vec_id = 7").collect()[0]["embedding"]
        q = [float(x) for x in q]
        # full probe over the materialized index == exact top-k
        approx = [
            r["id"]
            for r in ivf_topk_pruned(spark, path, q, cent, k=5, nprobe=8).collect()
        ]
        exact = [r["id"] for r in brute_force_topk(embeddings, q, k=5).collect()]
        assert approx == exact


class TestSegmentDedup:
    def _docs(self, spark):
        # 2-token segments: doc1 = [a b][c d], doc2 = [c d][e f] (segment
        # "c d" duplicates doc1's), doc3 = [a b] (fully duplicated)
        rows = [
            (1, "a b c d"),
            (2, "c d e f"),
            (3, "a b"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_first_occurrence_wins(self, spark):
        from comm_detect_spark.operators.dedup import segment_dedup

        got = {
            r["doc_id"]: (r["text_clean"], r["n_kept"])
            for r in segment_dedup(
                self._docs(spark), tokens_per_segment=2
            ).collect()
        }
        # doc1 keeps both segments; doc2 loses "c d"; doc3 vanishes
        assert got == {1: ("a b c d", 2), 2: ("e f", 1)}

    def test_no_duplicates_is_identity(self, spark):
        from comm_detect_spark.operators.dedup import segment_dedup

        docs = spark.createDataFrame(
            [(1, "p q r s"), (2, "t u v w")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["text_clean"]
            for r in segment_dedup(docs, tokens_per_segment=2).collect()
        }
        assert got == {1: "p q r s", 2: "t u v w"}

    def test_short_tail_segment_kept(self, spark):
        from comm_detect_spark.operators.dedup import segment_dedup

        # 3 tokens with 2-token segments -> tail segment of 1 token
        docs = spark.createDataFrame(
            [(1, "x y z"), (2, "z")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["text_clean"]
            for r in segment_dedup(docs, tokens_per_segment=2).collect()
        }
        # doc2's single segment "z" duplicates doc1's tail
        assert got == {1: "x y z"}


class TestQualityFilter:
    def _docs(self, spark):
        long_en = " ".join(
            f"the item{i} and part{i} of lot{i} went to bin{i}"
            for i in range(12)
        )
        reps = "spam spam spam spam spam spam " * 12
        short = "the cat and the dog sat"
        german = "der hund und die katze das haus ist hier und " * 10
        return spark.createDataFrame(
            [
                (0, long_en),      # passes everything but repetition?
                (1, reps),         # keyword stuffing: fails repetition
                (2, short),        # fails length
                (3, german),       # fails lang
            ],
            "doc_id long, text string",
        )

    def test_rule_flags(self, spark):
        from comm_detect_spark.operators.corpus import quality_filter

        rows = {
            r["doc_id"]: r
            for r in quality_filter(
                self._docs(spark),
                min_tokens=30,
                min_quality=0.2,
                max_dup_2gram=0.5,
                max_top_token=0.5,
            ).collect()
        }
        assert rows[2]["pass_length"] is False  # 6 tokens < 30
        assert rows[1]["pass_repetition"] is False  # one token dominates
        assert rows[3]["pass_lang"] is False and rows[3]["lang"] == "de"
        assert rows[0]["keep"] is True
        # keep is exactly the conjunction of the flags, every row
        for r in rows.values():
            assert r["keep"] == (
                r["pass_length"]
                and r["pass_quality"]
                and r["pass_lang"]
                and r["pass_repetition"]
            )

    def test_null_fractions_pass_repetition(self, spark):
        from comm_detect_spark.operators.corpus import quality_filter

        # whitespace-only text: zero tokens, BOTH fractions NULL — the
        # repetition rule passes and the length rule owns the rejection
        blank = spark.createDataFrame(
            [(7, "   ")], "doc_id long, text string"
        )
        r = quality_filter(blank).collect()[0]
        assert r["n_tokens"] == 0
        assert r["dup_2gram_frac"] is None
        assert r["top_token_frac"] is None
        assert r["pass_repetition"] is True
        assert r["pass_length"] is False  # the length rule owns tiny docs
        assert r["keep"] is False
