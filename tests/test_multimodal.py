"""Multimodal plumbing: batch shapes, deterministic stub decode,
resize metadata rewrite, frame sampling."""

from __future__ import annotations

import pytest

from pennsieve_streaming_spark.llm.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_from_documents(docs)


def test_media_schema(media):
    assert set(media.columns) == {"media_id", "kind", "payload", "meta"}
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_deterministic(media):
    a = extract_features(media).orderBy("media_id").limit(5).collect()
    b = extract_features(media).orderBy("media_id").limit(5).collect()
    for ra, rb in zip(a, b):
        assert ra["digest"] == rb["digest"]
        assert ra["feature"] == rb["feature"]
        assert len(ra["feature"]) == FEATURE_DIM
        assert ra["n_bytes"] > 0


def test_feature_extraction_unstubbed_raises(media):
    with pytest.raises(Exception) as exc:
        extract_features(media, decode_stub=False).limit(1).collect()
    assert "NotImplementedError" in str(exc.value) or "codecs" in str(exc.value)


def test_resize_metadata(media):
    out = resize_images(media, 224, 224)
    rows = out.limit(5).collect()
    for r in rows:
        assert r["meta"]["width"] == 224 and r["meta"]["height"] == 224
        assert r["scale_x"] > 0 and r["scale_y"] > 0
    assert out.count() == media.filter("kind = 'image'").count()


def test_frame_sampling_bounds(media):
    frames = sample_frames(media, every_nth=5).collect()
    n_frames = {
        r["media_id"]: r["meta"]["n_frames"]
        for r in media.filter("kind = 'video'").collect()
    }
    for r in frames:
        assert r["frame_idx"] <= max(n_frames[r["media_id"]] - 1, 0)
        assert r["frame_idx"] % 5 == 0


# --------------------------------------------------------------------------
# perceptual dHash (llm/imagehash)
# --------------------------------------------------------------------------

def test_dhash_brightness_invariant():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import dhash64, synthetic_gray

    g = synthetic_gray(7)
    assert dhash64(g) == dhash64(g + 17)  # global brightness shift
    assert dhash64(g) == dhash64(g * 1)   # identity sanity


def test_dhash_gradient_orientation():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import (
        GRID_H,
        GRID_W,
        dhash64,
    )

    inc = np.tile(np.arange(GRID_W), (GRID_H, 1))       # brightens rightward
    dec = inc[:, ::-1].copy()                            # brightens leftward
    assert dhash64(inc) == 0          # every left cell < right cell
    # every left cell > right cell: all 8x8 comparison bits set
    want = 0
    for r in range(8):
        for c in range(8):
            want |= 1 << (r * 8 + c)
    if want >= 1 << 63:
        want -= 1 << 64
    assert dhash64(dec) == want


def test_dhash_block_resize_consistent():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import dhash64, synthetic_gray

    g = synthetic_gray(42)
    up = np.kron(g, np.ones((2, 2), dtype=np.int64))  # 32x36 upsample
    assert dhash64(up) == dhash64(g)
    import pytest

    with pytest.raises(ValueError):
        dhash64(np.zeros((17, 18), dtype=np.int64))


def test_dhash_sign_bit_roundtrip():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import dhash64

    # a decreasing gradient sets bit 63 (r=7, c=7) -> negative int64
    inc = np.tile(np.arange(18), (16, 1))
    v = dhash64(inc[:, ::-1].copy())
    assert v < 0 and np.int64(v) == v


def test_dhash_synthetic_duplicate_groups(spark):
    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.llm.imagehash import dhash_synthetic

    docs = spark.range(520).selectExpr("id AS doc_id")
    dh = dhash_synthetic(docs)
    # docs congruent mod 256 render identical images -> identical hash
    rows = {r.media_id: r.dhash for r in dh.collect()}
    assert rows[3] == rows[3 + 256]
    assert rows[10] == rows[10 + 256]


def test_dhash_over_real_png_decode():
    """End-to-end real plumbing: encode a gradient as an actual PNG,
    decode it with llm/png, gray it, dHash it — and the hash must be
    invariant to a PNG-roundtripped brightness shift, the property
    perceptual near-dup screening relies on."""
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import dhash64
    from pennsieve_streaming_spark.llm.png import decode_png, encode_png

    h, w = 32, 36  # 2x the 16x18 grid -> exact block reduction
    base = (
        np.tile(np.arange(w, dtype=np.int64) * 5, (h, 1))
        + np.arange(h, dtype=np.int64).reshape(-1, 1)
    ) % 200
    rgb = np.stack([base, base, base], axis=-1).astype(np.uint8)
    decoded = decode_png(encode_png(rgb))
    gray = decoded.astype(np.int64).sum(axis=-1) // 3
    h1 = dhash64(gray)

    brighter = np.clip(rgb.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    gray2 = decode_png(encode_png(brighter)).astype(np.int64).sum(axis=-1) // 3
    h2 = dhash64(gray2)
    assert h1 == h2  # brightness shift survives the PNG round trip

    # a genuinely different image (inverted gradient) lands far away
    h3 = dhash64(255 - base)
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") > 16


def test_phash_kernel_properties():
    """DCT pHash: locality (one-pixel tweak flips few bits), distinct
    structures land far apart, block-resize path consistent, signed
    packing round-trips bit 63."""
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import (
        GRID_H,
        GRID_W,
        phash64,
        synthetic_gray,
    )

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    base = synthetic_gray(7)
    tweak = base.copy()
    tweak[3, 5] += 4  # tiny local perturbation
    assert ham(phash64(base), phash64(tweak)) <= 6
    # structurally different fields differ in many bits
    other = (base * base + 37) % 256
    assert ham(phash64(base), phash64(other)) >= 16
    # 2x block-resize reduces to the same grid: hash of the upscaled
    # image equals hash of the base (block sums scale uniformly by 4,
    # scaling every DCT coef AND the median by 4 -> identical bits)
    up = np.kron(base, np.ones((2, 2), dtype=np.int64))
    assert phash64(up) == phash64(base)
    # signed int64 round-trip
    for d in range(40):
        v = phash64(synthetic_gray(d))
        assert -(2**63) <= v < 2**63


def test_phash_synthetic_duplicate_groups(spark):
    from pennsieve_streaming_spark.llm.imagehash import phash_synthetic

    docs = spark.range(300).selectExpr("id AS doc_id")
    rows = {r.media_id: r.phash for r in phash_synthetic(docs).collect()}
    assert rows[3] == rows[3 + 256] and rows[20] == rows[20 + 256]


def test_phash_overflow_guard_raises():
    """Block-resized inputs past the int64-exact envelope must raise,
    not silently wrap (numpy matmul wraps without error)."""
    import numpy as np
    import pytest

    from pennsieve_streaming_spark.llm.imagehash import phash64

    big = np.full((192, 216), 255, dtype=np.int64)  # 12x12 blocks
    with pytest.raises(ValueError, match="envelope"):
        phash64(big)
    # well inside the envelope still works (10x11 blocks, area 110)
    ok = np.full((160, 198), 255, dtype=np.int64)
    assert isinstance(phash64(ok), int)


def test_quality_stats_blur_and_flat_semantics():
    """The Laplacian-variance focus measure drops under blur and is
    exactly 0 for flat and linear-gradient fields (Laplacian kills
    affine terms); contrast follows the global value spread."""
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import quality_stats

    rng = np.random.default_rng(9)
    sharp = rng.integers(0, 256, size=(16, 18)).astype(np.int64)
    # 3x3 box blur (valid region) — recompute on the blurred interior
    k = np.ones((3, 3), dtype=np.int64)
    blurred = np.zeros((14, 16), dtype=np.int64)
    for di in range(3):
        for dj in range(3):
            blurred += sharp[di : di + 14, dj : dj + 16]
    blurred //= 9

    def lap_var(img):
        n, sg, sg2, gr, nl, sl, sl2 = quality_stats(img)
        return (nl * sl2 - sl * sl) / (nl * nl)

    assert lap_var(blurred) < lap_var(sharp) / 2
    flat = np.full((8, 8), 77, dtype=np.int64)
    n, sg, sg2, gr, nl, sl, sl2 = quality_stats(flat)
    assert gr == 0 and nl * sl2 - sl * sl == 0
    grad = np.add.outer(np.arange(8), 2 * np.arange(8)).astype(np.int64)
    _, _, _, gr2, nl2, slg, sl2g = quality_stats(grad)
    assert nl2 * sl2g - slg * slg == 0  # affine field -> zero Laplacian
    assert gr2 == 7 + 2 * 7


def test_quality_synthetic_survives_empty_partitions(spark):
    """A 1-row input spread over 8 partitions exercises the empty
    Arrow-batch path (a (0,)-shaped asarray would break the column
    slicing without the guard)."""
    from pennsieve_streaming_spark.llm.imagehash import quality_synthetic

    docs = spark.createDataFrame(
        [(1, "x")], "doc_id long, text string"
    ).repartition(8)
    rows = quality_synthetic(docs).collect()
    assert len(rows) == 1 and rows[0].n_px == 288


def test_ssim_identity_and_degradation_ordering(spark):
    """SSIM(x, x) = 1 exactly; the planted degradation lands strictly
    below 1; sums match an independent numpy evaluation of the Wang
    formula."""
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import (
        ssim_synthetic,
        ssim_sums,
        synthetic_gray,
    )

    docs = spark.createDataFrame([(0,), (7,)], "doc_id long")
    out = {r.media_id: r for r in ssim_synthetic(docs).collect()}
    for d, r in out.items():
        assert 0.0 < r.ssim < 1.0
        x = synthetic_gray(d).astype(np.float64)
        y = np.floor(x / 2) + 40
        n = x.size
        mx, my = x.mean(), y.mean()
        vx, vy = (x * x).mean() - mx * mx, (y * y).mean() - my * my
        cov = (x * y).mean() - mx * my
        ref = ((2 * mx * my + 6.5025) * (2 * cov + 58.5225)) / (
            (mx * mx + my * my + 6.5025) * (vx + vy + 58.5225)
        )
        assert abs(r.ssim - ref) < 1e-9, (d, r.ssim, ref)

    # identity: plug x = y sums into the same formula -> exactly 1
    x = synthetic_gray(3)
    n, sx, sy, sxx, syy, sxy = ssim_sums(x, x)
    mx = sx / n
    vx = sxx / n - mx * mx
    ssim_id = ((2 * mx * mx + 6.5025) * (2 * vx + 58.5225)) / (
        (2 * mx * mx + 6.5025) * (2 * vx + 58.5225)
    )
    assert ssim_id == 1.0


def test_sobel_stats_flat_ramp_and_step():
    """Flat frame: zero everywhere. Linear ramp: constant interior
    energy below threshold. A hard vertical step: huge gx at the
    step columns."""
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import sobel_stats

    flat = np.full((8, 8), 7)
    n, edges, s, mx = sobel_stats(flat)
    assert (n, edges, s, mx) == (36, 0, 0, 0)

    ramp = np.arange(8).reshape(1, -1).repeat(8, axis=0) * 13
    n, edges, s, mx = sobel_stats(ramp)
    assert edges == 0 and mx == (8 * 13) ** 2  # gx = 8*slope, gy = 0

    step = np.zeros((8, 8), dtype=int)
    step[:, 4:] = 255
    n, edges, s, mx = sobel_stats(step, t2=100_000)
    assert edges > 0 and mx == (4 * 255) ** 2


def test_edge_density_synthetic_runs(spark):
    from pennsieve_streaming_spark.llm.imagehash import (
        edge_density_synthetic,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    )
    out = {r.media_id: r for r in edge_density_synthetic(docs).collect()}
    assert len(out) == 6
    for r in out.values():
        assert r.n_interior == 14 * 16
        assert 0.0 <= r.edge_density <= 1.0
    # wrap lines differ across docs -> density is not constant
    assert len({r.n_edges for r in out.values()}) > 1
