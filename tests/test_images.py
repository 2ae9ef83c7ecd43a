"""Image payload invariants (input_hint): decoded-pixel allclose /
PSNR≥40dB for lossy, caption byte-equality per row, phash stability."""

from __future__ import annotations

import numpy as np
import pytest

from meilisearchcrawler_spark.fixtures import imagegen as I
from meilisearchcrawler_spark.fixtures.webgen import generate_web


class TestCodecs:
    @pytest.mark.parametrize("fmt", ["bmp", "png", "jpeg"])
    def test_roundtrip(self, fmt):
        px = I.pixels_for("img-test-1", 96, 64)
        fmt2, out = I.decode(I.encode(px, fmt))
        assert fmt2 == fmt
        assert out.shape == px.shape
        if fmt in ("bmp", "png"):
            assert np.array_equal(out, px)
        else:
            assert I.psnr(out, px) >= 40.0
            assert not np.array_equal(out, px)  # genuinely lossy

    def test_determinism(self):
        assert np.array_equal(I.pixels_for("a", 32, 32), I.pixels_for("a", 32, 32))
        assert not np.array_equal(I.pixels_for("a", 32, 32), I.pixels_for("b", 32, 32))

    def test_phash_stability_and_sensitivity(self):
        px = I.pixels_for("img-test-2", 128, 96)
        h1 = I.phash64(px)
        # jpeg round-trip must not move the perceptual hash far
        _, lossy = I.decode(I.encode(px, "jpeg"))
        assert I.hamming64(h1, I.phash64(lossy)) <= 4
        other = I.pixels_for("completely-different", 128, 96)
        assert I.hamming64(h1, I.phash64(other)) > 10


@pytest.fixture(scope="module")
def images_fixture(tmp_path_factory):
    fx = generate_web(seed=11, n_sites=2, pages_per_site=30)
    rows = I.generate_images(fx.page_images, seed=11)
    path = str(tmp_path_factory.mktemp("img") / "images.parquet")
    I.write_images_parquet(rows, path)
    return fx, rows, path


class TestImageOperators:
    def test_decode_and_verify_invariants(self, spark, images_fixture):
        from meilisearchcrawler_spark.operators.images import decode_and_verify

        _, rows, path = images_fixture
        assert rows, "fixture produced no images"
        df = spark.read.parquet(path)
        out = decode_and_verify(df, truth_fn=I.pixels_for).collect()
        assert len(out) == len(rows)
        for r in out:
            assert r["decode_ok"], r["image_id"]
            if r["fmt"] in ("bmp", "png"):
                assert r["pixels_exact"], r["image_id"]
                assert r["phash_hamming"] == 0, r["image_id"]
            else:
                assert r["psnr_db"] >= 40.0, (r["image_id"], r["psnr_db"])
                # phash stability under lossy re-encode
                assert r["phash_hamming"] <= 4, r["image_id"]

    def test_caption_byte_equality(self, spark, images_fixture):
        """Caption survives the crawl: images.caption == the page's
        img@alt (crawler.py:626 alt→caption) — per-row byte equality."""
        fx, _, path = images_fixture
        images = spark.read.parquet(path)
        pi = spark.createDataFrame(fx.page_images)
        both = images.selectExpr("image_id", "caption as c1").join(
            pi.selectExpr("image_id", "caption as c2"), "image_id").collect()
        assert len(both) == len(fx.page_images)
        assert all(r["c1"].encode() == r["c2"].encode() for r in both)

    def test_image_features(self, spark, images_fixture):
        from meilisearchcrawler_spark.operators.images import image_features

        _, rows, path = images_fixture
        feats = image_features(spark.read.parquet(path)).collect()
        assert len(feats) == len(rows)
        assert all(f["mean_r"] is not None for f in feats)

    def test_phash_near_pairs_finds_lossy_twin(self, spark, images_fixture):
        from meilisearchcrawler_spark.operators.images import phash_near_pairs

        _, rows, path = images_fixture
        df = spark.read.parquet(path)
        # add a jpeg re-encode of the first image under a new id —
        # a true near-duplicate the phash join must find
        first = rows[0]
        px = I.pixels_for(first["image_id"], first["w"], first["h"])
        _, lossy = I.decode(I.encode(px, "jpeg"))
        twin_hash = np.int64(np.uint64(I.phash64(lossy))).item()
        twin = spark.createDataFrame(
            [{"image_id": "zzz_twin", "phash": twin_hash}])
        pairs = phash_near_pairs(
            df.select("image_id", "phash").unionByName(twin), max_hamming=6)
        hits = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (first["image_id"], "zzz_twin") in hits


class TestCodecIndependence:
    """The engine decoder (operators/imagecodec.py) and the fixture
    encoder (fixtures/imagegen.py) are separate implementations of the
    payload format spec (round-4 verdict next-step #6): the operator
    kernels must not import the fixture codec, and the two sides must
    round-trip to the same truth."""

    def test_operator_kernels_import_no_fixtures(self):
        import ast
        import inspect

        from meilisearchcrawler_spark.operators import images as mod

        for node in ast.walk(ast.parse(inspect.getsource(mod))):
            if isinstance(node, ast.Import):
                names = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                names = [node.module or ""] + [a.name for a in node.names]
            else:
                continue
            assert not any("fixtures" in n or n == "imagegen"
                           for n in names), (
                "operator kernel must use the engine codec, not the "
                f"fixture codec: {names}")

    def test_cross_implementation_roundtrip(self):
        from meilisearchcrawler_spark.operators import imagecodec as C

        fx = generate_web(seed=23, n_sites=2, pages_per_site=25)
        rows = I.generate_images(fx.page_images, seed=23)
        assert rows
        for r in rows:
            fmt, px = C.decode(r["bytes"])
            assert fmt == r["fmt"]
            truth = I.pixels_for(r["image_id"], r["w"], r["h"])
            if fmt in ("bmp", "png"):
                # fixture-encoded lossless decodes byte-exact on the
                # ENGINE side
                assert np.array_equal(px, truth), r["image_id"]
            else:
                assert C.psnr(px, truth) >= 40.0, r["image_id"]
            # phash bit-equality on identical pixels across the two
            # implementations (stored hash came from the fixture side)
            assert C.phash64(truth) == np.uint64(
                np.int64(r["phash"])).item(), r["image_id"]

    def test_engine_codec_rejects_malformed(self):
        import pytest

        from meilisearchcrawler_spark.operators import imagecodec as C

        with pytest.raises(ValueError):
            C.decode(b"NOPE" + b"\x00" * 16)
        with pytest.raises(ValueError):
            C.decode(b"MCSI")  # short header
        good = I.encode(I.pixels_for("x", 32, 32), "bmp")
        with pytest.raises(ValueError):
            C.decode(good[:-7])  # truncated body
