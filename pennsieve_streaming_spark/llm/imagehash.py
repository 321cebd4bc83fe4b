"""Perceptual image hashing (dHash) for multimodal near-dup detection.

The image analogue of SimHash text dedup: a 64-bit difference hash
over a block-averaged grayscale thumbnail (Krawetz's dHash — the
public-domain standard for scalable image near-dup screening). Two
re-encodes / mild crops / brightness shifts of the same picture land
within a few bits of hamming distance, so the whole text near-dup
machinery (banded blocking, hot-bucket caps, hamming verify —
llm/dedup.simhash_near_pairs) applies verbatim to the image corpus by
feeding it (media_id, dhash) instead of (doc_id, simhash).

Exactness contract: the hash compares BLOCK SUMS, not means — blocks
are equal-sized so the comparison is identical, and integer sums are
engine-exact (no division, no float). That makes the hash replayable
bit-for-bit by a SQL oracle on any deterministic pixel source, which
is how the registry gates it: the oracle query runs the same grid
arithmetic in DuckDB over the synthetic luminance field, while the
REAL decode path (PNG/JPEG/BMP via llm/png, llm/jpeg, llm/rawimg)
feeds actual pixels through the identical ``dhash64`` kernel
(unit-tested: brightness invariance, gradient orientation, decode
round-trip).

Grid: GRID_H×GRID_W = 16×18 pixels block-averaged 2×2 into 8×9 cells;
bit k = r*8 + c is set iff sum(cell[r][c]) > sum(cell[r][c+1]) for
r in 0..7, c in 0..7 — 64 bits, stored as a signed int64 (bit 63 is
the sign bit; banding masks after arithmetic shifts extract fields
correctly on both engines).

Scale shape: the hash is a narrow per-row map (mapInPandas over Arrow
batches, no shuffle); pair mining shuffles only the 8-byte hashes
through the banded equi-join — image bytes never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID_H = 16
GRID_W = 18
CELL = 2  # block edge: 16x18 -> 8x9 cells
ROWS = GRID_H // CELL   # 8
COLS = GRID_W // CELL   # 9


def dhash64(gray: "np.ndarray") -> int:
    """64-bit difference hash of a grayscale image (any H×W ≥ grid).

    The image is first box-resized to GRID_H×GRID_W by integer block
    sums (exact: each target pixel is the sum of its source block —
    requires H, W divisible by the grid for exactness; callers resize
    or crop first, the synthetic path emits the grid size directly),
    then 2×2 cell sums are compared left-to-right.
    """
    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    if (h, w) != (GRID_H, GRID_W):
        if h % GRID_H or w % GRID_W:
            raise ValueError(
                f"image {h}x{w} not divisible by grid {GRID_H}x{GRID_W}"
            )
        g = g.reshape(GRID_H, h // GRID_H, GRID_W, w // GRID_W).sum(
            axis=(1, 3)
        )
    cells = g.reshape(ROWS, CELL, COLS, CELL).sum(axis=(1, 3))
    bits = cells[:, :-1] > cells[:, 1:]  # 8x8
    val = 0
    for r in range(ROWS):
        for c in range(COLS - 1):
            if bits[r, c]:
                val |= 1 << (r * 8 + c)
    if val >= 1 << 63:  # store as signed int64 (bit 63 = sign bit)
        val -= 1 << 64
    return val


# Synthetic luminance field for the oracle-gated registry query: a
# deterministic pure-arithmetic pixel source both engines can emit.
# pixel(i, j) = (doc_id*31 + i*7 + j*13) mod 256 — docs congruent
# mod 256 render IDENTICAL images (hamming-0 duplicate groups), the
# realistic shape image dedup exists to catch.
SYN_A, SYN_B, SYN_C, SYN_MOD = 31, 7, 13, 256


def synthetic_gray(doc_id: int) -> "np.ndarray":
    i = np.arange(GRID_H).reshape(-1, 1)
    j = np.arange(GRID_W).reshape(1, -1)
    return (doc_id * SYN_A + i * SYN_B + j * SYN_C) % SYN_MOD


def dhash_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → (media_id, dhash) over the synthetic luminance field
    — the oracle-gated plumbing proof; swap ``synthetic_gray`` for a
    decoded frame (llm/multimodal.extract_features path) for real
    corpora. Narrow mapInPandas, no shuffle."""

    def run(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "dhash": np.fromiter(
                        (dhash64(synthetic_gray(int(d))) for d in ids),
                        dtype=np.int64,
                        count=len(ids),
                    ),
                }
            )

    return documents.select("doc_id").mapInPandas(
        run, "media_id long, dhash long"
    )


# --- pHash: DCT perceptual hash -------------------------------------
#
# The robust cousin of dHash (Krawetz's pHash writeup; Zauner 2010
# "Implementation and Benchmarking of Perceptual Image Hash
# Functions"): a 2-D DCT-II of the thumbnail, keep the 8x8
# low-frequency block, set bit (u*8+v) iff coef > median(block).
# Survives blur/resize/gamma better than dHash because the bits live
# in the frequency domain.
#
# Exactness contract (power_spectrum's trick): the DCT basis is
# quantized ONCE in Python to integer tables round(cos(*)*PH_Q), so
# every coefficient is an exact integer bilinear form Bi @ g @ Bj^T —
# engine-replayable bit-for-bit, no float anywhere. The median is the
# lower median (32nd smallest of 64), an order statistic of integers.
# Overflow: |coef| <= 16*18*255*PH_Q^2 ~ 7.3e16 < 2^63.

PH_BLOCK = 8
PH_Q = 1_000_000


def dct_basis_q(n: int) -> "np.ndarray":
    """Integer-quantized DCT-II basis rows u=0..PH_BLOCK-1 over a
    length-``n`` axis: B[u][i] = round(cos(pi*(2i+1)*u/(2n)) * PH_Q).
    Generated once in Python so BOTH engines consume identical
    integers (engine cos() is libm-vs-JVM divergent at the last
    ulp)."""
    u = np.arange(PH_BLOCK).reshape(-1, 1).astype(np.float64)
    i = np.arange(n).reshape(1, -1).astype(np.float64)
    return np.round(
        np.cos(np.pi * (2.0 * i + 1.0) * u / (2.0 * n)) * PH_Q
    ).astype(np.int64)


_BI = dct_basis_q(GRID_H)   # 8 x 16
_BJ = dct_basis_q(GRID_W)   # 8 x 18


# Exactness envelope for phash64's int64 bilinear form: |coef| <=
# GRID_H*GRID_W * max|g| * PH_Q^2 must stay under 2^63, so the
# block-sum magnitude (block_area * 255 for 8-bit input) is capped —
# numpy int64 matmul wraps SILENTLY past it (a 192x216 bright image
# would corrupt the hash without this guard).
PH_MAX_CELL = (2**63 - 1) // (GRID_H * GRID_W * PH_Q * PH_Q)  # 32023


def phash64(gray: "np.ndarray") -> int:
    """64-bit DCT perceptual hash of a GRID_H x GRID_W grayscale
    image (callers block-resize first, as with :func:`dhash64`).

    Inputs larger than the grid block-reduce by integer sums; the
    reduction factor is bounded so every DCT coefficient stays an
    exact int64 (see ``PH_MAX_CELL`` — ~125x area, i.e. up to roughly
    176x198 8-bit pixels). Larger sources must be pre-resized; the
    guard raises instead of silently wrapping."""
    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    if (h, w) != (GRID_H, GRID_W):
        if h % GRID_H or w % GRID_W:
            raise ValueError(
                f"image {h}x{w} not divisible by grid {GRID_H}x{GRID_W}"
            )
        g = g.reshape(GRID_H, h // GRID_H, GRID_W, w // GRID_W).sum(
            axis=(1, 3)
        )
    peak = int(np.abs(g).max()) if g.size else 0
    if peak > PH_MAX_CELL:
        raise ValueError(
            f"phash64 cell magnitude {peak} exceeds the int64-exact "
            f"envelope {PH_MAX_CELL}; pre-resize the image"
        )
    coef = _BI @ g @ _BJ.T          # 8x8, exact int64
    flat = coef.reshape(-1)
    med = int(np.sort(flat)[PH_BLOCK * PH_BLOCK // 2 - 1])  # lower median
    val = 0
    for k in range(PH_BLOCK * PH_BLOCK):
        if int(flat[k]) > med:
            val |= 1 << k
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def phash_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → (media_id, phash) over the synthetic luminance field
    — oracle-gated plumbing proof, same contract as
    :func:`dhash_synthetic`. Narrow mapInPandas, no shuffle."""

    def run(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "phash": np.fromiter(
                        (phash64(synthetic_gray(int(d))) for d in ids),
                        dtype=np.int64,
                        count=len(ids),
                    ),
                }
            )

    return documents.select("doc_id").mapInPandas(
        run, "media_id long, phash long"
    )


def quality_stats(gray: "np.ndarray") -> tuple[int, int, int, int, int, int, int]:
    """Exact integer image-quality sums over one grayscale frame:
    (n_px, sum_g, sum_g2, grange, n_lap, sum_lap, sum_lap2) — the
    inputs to RMS contrast (global variance) and the
    variance-of-Laplacian focus/blur measure (Pech-Pacheco et al.
    2000, the standard autofocus operator). Integer arithmetic only."""
    g = gray.astype(np.int64)
    n = int(g.size)
    sg = int(g.sum())
    sg2 = int((g * g).sum())
    grange = int(g.max() - g.min())
    lap = (
        4 * g[1:-1, 1:-1]
        - g[:-2, 1:-1]
        - g[2:, 1:-1]
        - g[1:-1, :-2]
        - g[1:-1, 2:]
    )
    return n, sg, sg2, grange, int(lap.size), int(lap.sum()), int(
        (lap * lap).sum()
    )


def quality_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → per-media quality metrics over the synthetic
    luminance field (the dhash_synthetic plumbing contract: the REAL
    :func:`quality_stats` kernel, oracle-replayable because the field
    is a closed form — swap in decoded frames for real corpora).

    Output: (media_id, n_px, grange, contrast_var, lap_var) with
    contrast_var = (n·Σg² − (Σg)²)/n² (RMS contrast²) and
    lap_var = (nl·ΣL² − (ΣL)²)/nl² (variance of Laplacian — low =
    blurry/flat, high = sharp detail), both one fixed float
    expression over exact BIGINTs, rounded to 9 dp."""

    def run(batches):
        for pdf in batches:
            if pdf.empty:  # empty Arrow batch: (0,)-shaped asarray
                continue   # would break the [:, k] column slicing
            ids = pdf["doc_id"].to_numpy()
            rows = [quality_stats(synthetic_gray(int(d))) for d in ids]
            arr = np.asarray(rows, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_px": arr[:, 0],
                    "sg": arr[:, 1],
                    "sg2": arr[:, 2],
                    "grange": arr[:, 3],
                    "n_lap": arr[:, 4],
                    "sl": arr[:, 5],
                    "sl2": arr[:, 6],
                }
            )

    sums = documents.select("doc_id").mapInPandas(
        run,
        "media_id long, n_px long, sg long, sg2 long, grange long, "
        "n_lap long, sl long, sl2 long",
    )
    return sums.select(
        "media_id",
        "n_px",
        "grange",
        F.expr(
            "round((CAST(n_px AS DOUBLE) * CAST(sg2 AS DOUBLE) "
            "- CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) "
            "/ (CAST(n_px AS DOUBLE) * CAST(n_px AS DOUBLE)), 9)"
        ).alias("contrast_var"),
        F.expr(
            "round((CAST(n_lap AS DOUBLE) * CAST(sl2 AS DOUBLE) "
            "- CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) "
            "/ (CAST(n_lap AS DOUBLE) * CAST(n_lap AS DOUBLE)), 9)"
        ).alias("lap_var"),
    )


# Global SSIM (Wang et al. 2004, single-window variant) as ONE fixed
# float expression over five exact BIGINT pixel sums — shared verbatim
# with the DuckDB oracle. C1 = (0.01*255)^2, C2 = (0.03*255)^2 as
# decimal literals (Spark's DECIMAL parse casts to the same nearest
# double DuckDB parses directly). Population variances (/N).
_SSIM_MX = "(CAST(sum_x AS DOUBLE) / n_px)"
_SSIM_MY = "(CAST(sum_y AS DOUBLE) / n_px)"
SSIM_EXPR = (
    f"((2 * {_SSIM_MX} * {_SSIM_MY} + 6.5025) "
    f"* (2 * (CAST(sum_xy AS DOUBLE) / n_px - {_SSIM_MX} * {_SSIM_MY}) "
    f"+ 58.5225)) "
    f"/ (({_SSIM_MX} * {_SSIM_MX} + {_SSIM_MY} * {_SSIM_MY} + 6.5025) "
    f"* (CAST(sum_xx AS DOUBLE) / n_px - {_SSIM_MX} * {_SSIM_MX} "
    f"+ CAST(sum_yy AS DOUBLE) / n_px - {_SSIM_MY} * {_SSIM_MY} "
    f"+ 58.5225))"
)

# The planted degradation for the driver-gated query: halve contrast,
# +40 brightness — integer-exact (no clipping: x <= 255 -> y <= 167),
# so the oracle replays it closed-form.
SSIM_DEGRADE = "x // 2 + 40"


def ssim_sums(x: "np.ndarray", y: "np.ndarray"):
    """Exact integer sums feeding SSIM_EXPR — the kernel both the
    Spark path and the goldens call."""
    xl = x.astype(np.int64)
    yl = y.astype(np.int64)
    return (
        int(xl.size),
        int(xl.sum()),
        int(yl.sum()),
        int((xl * xl).sum()),
        int((yl * yl).sum()),
        int((xl * yl).sum()),
    )


def ssim_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → global SSIM between the synthetic luminance field
    and its planted degradation (contrast/2, +40 brightness) — the
    full-reference image-quality metric next to the no-reference pair
    (quality_synthetic): the luminance term penalizes the shift, the
    contrast term the halving, the structure term stays ~1 (same
    pattern). All five moments are exact BIGINT sums the oracle
    replays from the field's closed form; SSIM is the one shared
    fixed expression. Swap the degraded field for a second decoded
    frame for real corpora (the dhash_synthetic plumbing contract).

    Output: (media_id, n_px, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
    ssim).
    """
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "media_id": [], "n_px": [], "sum_x": [], "sum_y": [],
                "sum_xx": [], "sum_yy": [], "sum_xy": [],
            }
            for d in pdf["doc_id"]:
                x = synthetic_gray(int(d))
                y = x // 2 + 40
                n, sx, sy, sxx, syy, sxy = ssim_sums(x, y)
                out["media_id"].append(int(d))
                out["n_px"].append(n)
                out["sum_x"].append(sx)
                out["sum_y"].append(sy)
                out["sum_xx"].append(sxx)
                out["sum_yy"].append(syy)
                out["sum_xy"].append(sxy)
            yield pd.DataFrame(out)

    sums = documents.select("doc_id").mapInPandas(
        run,
        "media_id long, n_px long, sum_x long, sum_y long, "
        "sum_xx long, sum_yy long, sum_xy long",
    )
    return sums.withColumn("ssim", F.expr(SSIM_EXPR))


SOBEL_T2 = 100_000  # threshold on gx^2+gy^2: the synthetic field's
# smooth interior sits at 104^2+56^2 = 13,952; mod-256 wrap lines jump
# by +-256 per tap and land far above — so density counts real edges.


def sobel_stats(gray: "np.ndarray", t2: int = SOBEL_T2) -> tuple:
    """Exact integer Sobel edge sums over one grayscale frame:
    (n_interior, n_edges, sum_e2, max_e2) with e2 = gx²+gy² — the
    inputs to edge density (structure vs flat/noise discrimination,
    the cheapest sharpness/content gate in image-dedup pipelines)."""
    g = gray.astype(np.int64)
    gx = (
        (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
    )
    gy = (
        (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
    )
    e2 = gx * gx + gy * gy
    return (
        int(e2.size),
        int((e2 > t2).sum()),
        int(e2.sum()),
        int(e2.max()),
    )


def edge_density_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → Sobel edge statistics over the synthetic luminance
    field (the dhash_synthetic plumbing contract: REAL
    :func:`sobel_stats` kernel, closed-form field so the oracle
    replays it): edge_density is the interior fraction above the
    gradient-energy threshold, mean_grad_energy the average e2 —
    both single fixed divisions over exact BIGINTs.

    Output: (media_id, n_interior, n_edges, edge_density,
    mean_grad_energy, max_e2)."""

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            rows = [sobel_stats(synthetic_gray(int(d))) for d in ids]
            arr = np.asarray(rows, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_interior": arr[:, 0],
                    "n_edges": arr[:, 1],
                    "se2": arr[:, 2],
                    "max_e2": arr[:, 3],
                }
            )

    sums = documents.select("doc_id").mapInPandas(
        run, "media_id long, n_interior long, n_edges long, se2 long, "
        "max_e2 long"
    )
    return sums.select(
        "media_id",
        "n_interior",
        "n_edges",
        F.expr(
            "round(CAST(n_edges AS DOUBLE) / n_interior, 9)"
        ).alias("edge_density"),
        F.expr(
            "round(CAST(se2 AS DOUBLE) / n_interior, 9)"
        ).alias("mean_grad_energy"),
        "max_e2",
    )


# RGB synthetic field: three phase-shifted copies of the gray closed
# form (offsets 0/85/170 mod 256) — the oracle replays the same
# arithmetic; the REAL kernels below consume any decoded RGB planes.
SYN_G_OFF, SYN_B_OFF = 85, 170


def synthetic_rgb(doc_id: int):
    g = synthetic_gray(doc_id)
    return g, (g + SYN_G_OFF) % SYN_MOD, (g + SYN_B_OFF) % SYN_MOD


def colorfulness_stats(
    r: "np.ndarray", g: "np.ndarray", b: "np.ndarray"
) -> tuple[int, int, int, int, int]:
    """Exact integer sums feeding the Hasler-Süsstrunk colorfulness
    metric (CVPR-HVEI 2003): opponent axes rg = R − G and
    yb2 = R + G − 2B (2× the usual yb, kept integral). Returns
    (n_px, Σrg, Σrg², Σyb2, Σyb2²)."""
    rl = r.astype(np.int64)
    gl = g.astype(np.int64)
    bl = b.astype(np.int64)
    rg = rl - gl
    yb2 = rl + gl - 2 * bl
    return (
        int(rg.size),
        int(rg.sum()),
        int((rg * rg).sum()),
        int(yb2.sum()),
        int((yb2 * yb2).sum()),
    )


# Fixed float finish shared verbatim with the oracle: with yb = yb2/2,
# σ_yb² = σ_yb2²/4 and μ_yb = μ_yb2/2; C = sqrt(σ_rg² + σ_yb²)
# + 0.3·sqrt(μ_rg² + μ_yb²).
_CF_VRG = (
    "(CAST(s_rg2 AS DOUBLE) / n_px "
    "- (CAST(s_rg AS DOUBLE) / n_px) * (CAST(s_rg AS DOUBLE) / n_px))"
)
_CF_VYB = (
    "((CAST(s_yb2q AS DOUBLE) / n_px "
    "- (CAST(s_yb AS DOUBLE) / n_px) * (CAST(s_yb AS DOUBLE) / n_px)) "
    "/ 4e0)"
)
_CF_MRG = "(CAST(s_rg AS DOUBLE) / n_px)"
_CF_MYB = "(CAST(s_yb AS DOUBLE) / (2e0 * n_px))"
COLORFULNESS_EXPR = (
    f"round(sqrt(greatest(0e0, {_CF_VRG} + {_CF_VYB})) "
    f"+ 0.3 * sqrt({_CF_MRG} * {_CF_MRG} + {_CF_MYB} * {_CF_MYB}), 9)"
)


def colorfulness_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → Hasler-Süsstrunk colorfulness over the synthetic
    RGB field (the dhash_synthetic plumbing contract: REAL
    :func:`colorfulness_stats` kernel, closed-form-replayable field —
    swap in decoded planes for real corpora).

    Output: (media_id, n_px, colorfulness), one fixed sqrt finish
    over exact opponent-axis BIGINT moments, rounded to 9 dp."""

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            rows = [
                colorfulness_stats(*synthetic_rgb(int(d))) for d in ids
            ]
            arr = np.asarray(rows, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_px": arr[:, 0],
                    "s_rg": arr[:, 1],
                    "s_rg2": arr[:, 2],
                    "s_yb": arr[:, 3],
                    "s_yb2q": arr[:, 4],
                }
            )

    sums = documents.select("doc_id").mapInPandas(
        run,
        "media_id long, n_px long, s_rg long, s_rg2 long, "
        "s_yb long, s_yb2q long",
    )
    return sums.select(
        "media_id",
        "n_px",
        F.expr(COLORFULNESS_EXPR).alias("colorfulness"),
    )


BLOCK_EDGE = 8  # codec block size whose boundaries blockiness probes


def blockiness_stats(gray: "np.ndarray", block: int = BLOCK_EDGE):
    """Exact integer sums feeding the blockiness ratio (Wang, Sheikh
    & Bovik 2002's boundary-vs-interior gradient comparison, sum
    form): Σ|Δ| across horizontal neighbors AT block-column
    boundaries vs elsewhere. Returns (n_b, Σ|Δ|_b, n_nb, Σ|Δ|_nb)."""
    g = np.asarray(gray, dtype=np.int64)
    d = np.abs(g[:, 1:] - g[:, :-1])
    w = g.shape[1]
    # column pair (j, j+1), 0-based j; boundary when (j+1) % block == 0
    jb = (np.arange(w - 1) + 1) % int(block) == 0
    db = d[:, jb]
    dn = d[:, ~jb]
    return int(db.size), int(db.sum()), int(dn.size), int(dn.sum())


def blockiness_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → block-boundary gradient ratio over the synthetic
    luminance field: ratio ≈ 1 for natural gradients, ≫ 1 for
    block-coded artifacts — the codec-damage screen next to
    mm_image_quality's blur score. REAL kernel, closed-form oracle.

    Output: (media_id, n_boundary, n_interior, blockiness) with
    blockiness = (Σ|Δ|_b/n_b) / (Σ|Δ|_i/n_i), one fixed division
    rounded to 9 dp (flat interiors report the 0.0 sentinel)."""

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            rows = [
                blockiness_stats(synthetic_gray(int(d))) for d in ids
            ]
            arr = np.asarray(rows, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_b": arr[:, 0],
                    "s_b": arr[:, 1],
                    "n_nb": arr[:, 2],
                    "s_nb": arr[:, 3],
                }
            )

    sums = documents.select("doc_id").mapInPandas(
        run, "media_id long, n_b long, s_b long, n_nb long, s_nb long"
    )
    return sums.select(
        "media_id",
        F.col("n_b").alias("n_boundary"),
        F.col("n_nb").alias("n_interior"),
        F.expr(
            "CASE WHEN s_nb > 0 THEN "
            "round((CAST(s_b AS DOUBLE) / n_b) "
            "/ (CAST(s_nb AS DOUBLE) / n_nb), 9) ELSE 0e0 END"
        ).alias("blockiness"),
    )


def histogram_entropy_stats(gray: "np.ndarray") -> list[tuple[int, int]]:
    """Exact (level, count) histogram of one grayscale frame — the
    inputs to the Shannon image-entropy fold (low entropy = flat /
    synthetic / over-compressed frames; the texture-information
    number QA dashboards pair with contrast and blur)."""
    g = np.asarray(gray, dtype=np.int64).ravel()
    counts = np.bincount(g, minlength=0)
    return [(int(v), int(c)) for v, c in enumerate(counts) if c > 0]


def image_entropy_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → grayscale histogram entropy over the synthetic
    luminance field (REAL kernel, closed-form-replayable field — the
    dhash_synthetic plumbing contract).

    Determinism: level counts are exact integers; the entropy folds
    Σ c·(lnq(n) − lnq(c)) in 1e9-quantized nats (the nano-nat class),
    finished by one division.

    Output: (media_id, n_px, n_levels, entropy_nats)."""

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for d in pdf["doc_id"].to_numpy():
                for v, c in histogram_entropy_stats(
                    synthetic_gray(int(d))
                ):
                    out.append((int(d), v, c))
            yield pd.DataFrame(
                out, columns=["media_id", "level", "cnt"]
            )

    counts = documents.select("doc_id").mapInPandas(
        run, "media_id long, level long, cnt long"
    )
    LNQ = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1000000000) AS BIGINT)"
    tot = counts.groupBy("media_id").agg(
        F.sum("cnt").cast("long").alias("n_px"),
        F.count(F.lit(1)).cast("long").alias("n_levels"),
    )
    j = counts.join(tot, "media_id")
    return (
        j.select(
            "media_id",
            "n_px",
            "n_levels",
            F.expr(
                f"CAST(cnt AS DECIMAL(38,0)) "
                f"* ({LNQ.format(x='n_px')} - {LNQ.format(x='cnt')})"
            ).alias("_hq"),
        )
        .groupBy("media_id", "n_px", "n_levels")
        .agg(F.sum("_hq").alias("_h"))
        .select(
            "media_id",
            "n_px",
            "n_levels",
            F.expr(
                "CAST(_h AS DOUBLE) / (CAST(n_px AS DOUBLE) "
                "* 1000000000)"
            ).alias("entropy_nats"),
        )
    )


# --- edge orientation: integer-Sobel octant histogram ----------------
#
# The HOG-lite texture signature: bucket every interior pixel's Sobel
# gradient into one of 8 octants using ONLY integer sign/magnitude
# comparisons — no atan2, no floats — so the DuckDB oracle replays the
# binning bit-for-bit from the closed-form synthetic field. Bucket -1
# is the zero-gradient "flat" bin.
#
# The branch ORDER is the contract (first match wins); numpy and SQL
# share it via orientation_case_sql / the np.select below.

def orientation_case_sql(gx: str, gy: str) -> str:
    """The shared octant CASE over integer gradient expressions."""
    return (
        f"CASE WHEN {gx} = 0 AND {gy} = 0 THEN -1 "
        f"WHEN {gy} >= 0 AND {gx} > 0 AND {gx} > {gy} THEN 0 "
        f"WHEN {gy} > 0 AND {gx} >= 0 THEN 1 "
        f"WHEN {gy} > 0 AND {gx} < 0 AND {gy} > -({gx}) THEN 2 "
        f"WHEN {gy} >= 0 AND {gx} < 0 THEN 3 "
        f"WHEN {gy} < 0 AND {gx} < 0 AND -({gx}) >= -({gy}) THEN 4 "
        f"WHEN {gy} < 0 AND {gx} <= 0 THEN 5 "
        f"WHEN {gy} < 0 AND {gx} > 0 AND -({gy}) > {gx} THEN 6 "
        f"ELSE 7 END"
    )


def edge_orientation_stats(gray: "np.ndarray") -> list[tuple[int, int]]:
    """(octant, count) histogram of integer-Sobel orientations over
    the interior pixels of one grayscale frame — the numpy twin of
    :func:`orientation_case_sql` (same branch order via np.select)."""
    g = np.asarray(gray, dtype=np.int64)
    gx = (
        (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
    )
    gy = (
        (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
    )
    conds = [
        (gx == 0) & (gy == 0),
        (gy >= 0) & (gx > 0) & (gx > gy),
        (gy > 0) & (gx >= 0),
        (gy > 0) & (gx < 0) & (gy > -gx),
        (gy >= 0) & (gx < 0),
        (gy < 0) & (gx < 0) & (-gx >= -gy),
        (gy < 0) & (gx <= 0),
        (gy < 0) & (gx > 0) & (-gy > gx),
    ]
    octs = np.select(conds, [-1, 0, 1, 2, 3, 4, 5, 6], default=7)
    vals, counts = np.unique(octs, return_counts=True)
    return [(int(v), int(c)) for v, c in zip(vals, counts)]


def edge_orientation_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → per-octant edge-orientation histogram over the
    synthetic luminance field (REAL integer-Sobel kernel, closed-form
    oracle): the texture-anisotropy readout beside mm_image_edges'
    density — a natural image spreads mass over octants, a synthetic
    gradient/scan-line artifact concentrates it.

    Determinism: gradients and octants are pure integer arithmetic
    (no atan2 anywhere); counts are exact; share is one fixed
    division by the literal interior-pixel count rounded to 9 dp.

    Output: (media_id, octant, n_px, share) — octant −1 is the flat
    (zero-gradient) bin; absent octants emit no row.

    Plan / 100 TB: narrow mapInPandas (≤9 rows/frame out), one
    groupBy-free projection — the decode parallelism IS the scan
    parallelism.
    """
    interior = (GRID_H - 2) * (GRID_W - 2)

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for d in pdf["doc_id"].to_numpy():
                for o, c in edge_orientation_stats(
                    synthetic_gray(int(d))
                ):
                    out.append((int(d), o, c))
            yield pd.DataFrame(
                out, columns=["media_id", "octant", "n_px"]
            )

    counts = documents.select("doc_id").mapInPandas(
        run, "media_id long, octant long, n_px long"
    )
    return counts.select(
        "media_id",
        "octant",
        "n_px",
        F.expr(
            f"round(CAST(n_px AS DOUBLE) / {interior}e0, 9)"
        ).alias("share"),
    )


def equalize_synthetic(documents: DataFrame) -> DataFrame:
    """Histogram equalization checksum per media item over the
    synthetic luminance field (REAL kernel): the classic contrast-
    enhancement mapping eq(v) = ⌊(cdf(v) − cdf_min)·255 / (n_px −
    cdf_min)⌋ — emitted as exact integer aggregates so the driver
    gate proves the whole remap (any off-by-one in the CDF moves
    sum_eq).

    Determinism: level counts, running CDF (level-ordered window)
    and the floor-div remap are ALL exact integers — no floats
    anywhere. Degenerate single-level images (n_px = cdf_min) map to
    the 0 level by documented sentinel.

    Output: (media_id, n_px, n_levels_in, n_levels_out, sum_eq,
    min_eq, max_eq).

    Plan / 100 TB: the entropy shape — narrow mapInPandas histogram
    rows (≤256/frame), one level-ordered window per image, one
    rollup.
    """
    from pyspark.sql import Window

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for d in pdf["doc_id"].to_numpy():
                for v, c in histogram_entropy_stats(
                    synthetic_gray(int(d))
                ):
                    out.append((int(d), v, c))
            yield pd.DataFrame(
                out, columns=["media_id", "level", "cnt"]
            )

    counts = documents.select("doc_id").mapInPandas(
        run, "media_id long, level long, cnt long"
    )
    w = (
        Window.partitionBy("media_id")
        .orderBy("level")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lev = counts.select(
        "media_id",
        "level",
        "cnt",
        F.sum("cnt").over(w).alias("cdf"),
        F.first("cnt").over(w).alias("cdf_min"),
    )
    tot = counts.groupBy("media_id").agg(
        F.sum("cnt").cast("long").alias("n_px")
    )
    eq = (
        lev.join(tot, "media_id")
        .withColumn(
            "eq",
            F.expr(
                "CASE WHEN n_px > cdf_min THEN "
                "((cdf - cdf_min) * 255) div (n_px - cdf_min) "
                "ELSE 0 END"
            ).cast("long"),
        )
    )
    return eq.groupBy("media_id").agg(
        F.max("n_px").cast("long").alias("n_px"),
        F.count(F.lit(1)).cast("long").alias("n_levels_in"),
        F.countDistinct("eq").cast("long").alias("n_levels_out"),
        F.sum(F.expr("eq * cnt")).cast("long").alias("sum_eq"),
        F.min("eq").cast("long").alias("min_eq"),
        F.max("eq").cast("long").alias("max_eq"),
    )


def rle_stats(gray: "np.ndarray") -> tuple[int, int, int]:
    """(n_px, n_h_runs, n_v_runs): horizontal/vertical run counts of
    one frame — the exact inputs to the RLE-compressibility ratio."""
    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    n_h = h + int((g[:, 1:] != g[:, :-1]).sum())
    n_v = w + int((g[1:, :] != g[:-1, :]).sum())
    return h * w, n_h, n_v


def rle_synthetic(documents: DataFrame) -> DataFrame:
    """Run-length-encoding compressibility per media item over the
    synthetic luminance field (REAL kernel, closed-form oracle): the
    ratio of horizontal/vertical runs to pixels — the cheapest
    flat-vs-textured screen (screenshots/solid fills compress to few
    runs; natural texture doesn't), beside mm_image_entropy's
    histogram view which is BLIND to spatial arrangement.

    Determinism: run counts are exact integer neighbor-inequality
    sums; ratios are single fixed divisions rounded to 9 dp.

    Output: (media_id, n_px, n_h_runs, n_v_runs, h_ratio, v_ratio).

    Plan / 100 TB: one narrow mapInPandas row per frame — decode
    parallelism is scan parallelism, nothing shuffles.
    """

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            # posterize to 8 levels: the raw linear field has NO equal
            # neighbors (every step moves +13/+7 mod 256), so runs only
            # exist after quantization — the realistic flat-region shape
            rows = [
                rle_stats(synthetic_gray(int(d)) // 32) for d in ids
            ]
            arr = np.asarray(rows, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_px": arr[:, 0],
                    "n_h_runs": arr[:, 1],
                    "n_v_runs": arr[:, 2],
                }
            )

    stats = documents.select("doc_id").mapInPandas(
        run, "media_id long, n_px long, n_h_runs long, n_v_runs long"
    )
    return stats.select(
        "media_id",
        "n_px",
        "n_h_runs",
        "n_v_runs",
        F.expr(
            "round(CAST(n_h_runs AS DOUBLE) / CAST(n_px AS DOUBLE), 9)"
        ).alias("h_ratio"),
        F.expr(
            "round(CAST(n_v_runs AS DOUBLE) / CAST(n_px AS DOUBLE), 9)"
        ).alias("v_ratio"),
    )


# --- round-10 addition: dominant-color palette --------------------------

PALETTE_BITS = 2    # 2 bits/channel -> 64 RGB bins
PALETTE_TOP_K = 4


def palette_counts(
    r: "np.ndarray",
    g: "np.ndarray",
    b: "np.ndarray",
    bits: int = PALETTE_BITS,
    top_k: int = PALETTE_TOP_K,
):
    """Exact dominant-color extraction: quantize each 8-bit channel to
    ``bits`` (uniform cube — the fixed-grid flavor of median-cut
    palette extraction), count pixels per RGB bin, return the top_k
    (count DESC, bin ASC) as [(rank, bin_id, n), ...]. All integers."""
    shift = 8 - int(bits)
    side = 1 << int(bits)
    rl = np.asarray(r, dtype=np.int64) >> shift
    gl = np.asarray(g, dtype=np.int64) >> shift
    bl = np.asarray(b, dtype=np.int64) >> shift
    bins = (rl * side + gl) * side + bl
    counts = np.bincount(bins.ravel(), minlength=side**3)
    order = np.lexsort((np.arange(side**3), -counts))
    out = []
    for rank, bin_id in enumerate(order[: int(top_k)], start=1):
        if counts[bin_id] == 0:
            break
        out.append((rank, int(bin_id), int(counts[bin_id])))
    return out


def palette_synthetic(documents: DataFrame) -> DataFrame:
    """(doc_id) → top-4 dominant RGB bins over the synthetic RGB field
    (the dhash_synthetic plumbing contract: REAL
    :func:`palette_counts` kernel, closed-form-replayable field —
    swap in decoded planes for real corpora). The color-quantization
    panel next to colorfulness (spread) and entropy (texture):
    palette coverage is the poster/screenshot-vs-photo signal.

    Determinism: bin ids and counts are exact integers; the top-k
    order is the total order (count DESC, bin ASC); share is ONE
    fixed division rounded to 9 dp.

    Output: (media_id, rank, bin_id, n_px_bin, n_px, share).

    Plan / 100 TB: one narrow mapInPandas (decode parallelism = scan
    parallelism, zero shuffle), ≤ top_k rows out per media item.
    """

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for d in pdf["doc_id"].to_numpy():
                rgb = synthetic_rgb(int(d))
                n_px = rgb[0].size
                for rank, bin_id, n in palette_counts(*rgb):
                    recs.append((int(d), rank, bin_id, n, int(n_px)))
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "rank", "bin_id", "n_px_bin", "n_px",
                ],
            )

    out = documents.select("doc_id").mapInPandas(
        run,
        "media_id long, rank long, bin_id long, n_px_bin long, "
        "n_px long",
    )
    return out.select(
        "media_id",
        "rank",
        "bin_id",
        "n_px_bin",
        "n_px",
        F.expr(
            "round(CAST(n_px_bin AS DOUBLE) / n_px, 9)"
        ).alias("share"),
    )
