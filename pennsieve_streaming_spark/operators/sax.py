"""SAX symbolization (Lin, Keogh et al. 2003): z-normalized
Piecewise-Aggregate-Approximation windows mapped to a small alphabet —
the classic symbolic representation behind time-series motif discovery,
anomaly detection (HOT SAX) and indexing at scale.

The reference engine serves raw samples only; SAX is the standard
downstream representation an analytics engine precomputes so that
motif / similarity scans run over short strings instead of raw floats.

Algorithm per (channel, window of ``window_samples`` rows in (ts,
value) order):

1. quantize values to BIGINT (``round(value * QUANT)``) so every
   aggregate is an exact integer sum (engine-independent fold order);
2. PAA: cut the window into ``n_segments`` equal runs, segment mean =
   exact segment sum / segment length;
3. z-normalize segment means with the window mean/std, both derived
   from the exact sums in ONE fixed float expression;
4. map each z to a symbol via the N(0,1) quartile breakpoints
   (±0.6744897501960817, 0) → alphabet 'a'..'d'; a zero-variance
   window maps every segment to 'c' (z = 0 by convention).

Determinism: every float op is a fixed expression over exact BIGINTs,
so the DuckDB oracle replays bit-identically; symbol boundaries
compare bit-identical doubles against shared literals. QUANT = 100
keeps sum-of-squares < 2^63 for windows ≤ 64 at |value| ≤ ~3.8e6
(64·(3.8e6·100)² ≈ 9.2e18 ≈ 2^63−1); beyond that Spark's BIGINT sum
wraps while DuckDB's HUGEINT errors — widen the accumulator to
DECIMAL(38,0) (the power_spectrum pattern) if a corpus exceeds it.

Plan / scale: one window shuffle on (channel) for the ranking, then
two partial-agg groupBys (segment, then window) and one broadcast-size
join back of window stats to segments. Parallelism is
|channels|×|windows|; ragged tails are dropped (count-downsample
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 100  # value quantum: exact BIGINT sums, sum-of-squares < 2^63

BREAK_HI = "0.6744897501960817"  # N(0,1) upper quartile
BREAK_LO = "-0.6744897501960817"


def sax_symbol_case(z_expr: str) -> str:
    """Shared CASE text mapping a z-score expression to 'a'..'d'
    (identical in Spark SQL and DuckDB — parity by construction)."""
    return (
        f"CASE WHEN std = 0 THEN 'c' "
        f"WHEN {z_expr} < {BREAK_LO} THEN 'a' "
        f"WHEN {z_expr} < 0 THEN 'b' "
        f"WHEN {z_expr} < {BREAK_HI} THEN 'c' "
        f"ELSE 'd' END"
    )


def window_stats_exprs(window_samples: int) -> tuple[str, str]:
    """(mean, std) expression texts over exact sums sx/sxx, shared
    verbatim by both engines."""
    n = int(window_samples)
    q = QUANT
    mean = f"CAST(sx AS DOUBLE) / ({n} * {q}.0)"
    var = (
        f"GREATEST(CAST(sxx AS DOUBLE) / ({n} * {q}.0 * {q}.0) "
        f"- ({mean}) * ({mean}), 0.0)"
    )
    return mean, f"sqrt({var})"


def seg_z_expr(seg_samples: int) -> str:
    """z-score expression for a segment's exact sum ``ssum`` given
    window ``mean``/``std`` columns — shared verbatim by both engines."""
    return (
        f"(CAST(ssum AS DOUBLE) / ({int(seg_samples)} * {QUANT}.0) - mean) / std"
    )


def sax_words(
    samples: DataFrame,
    window_samples: int = 64,
    n_segments: int = 8,
) -> DataFrame:
    """Per-(channel, window) SAX word. Output: (channel, win, mean,
    std, sax_word); windows shorter than ``window_samples`` (ragged
    tails) are dropped."""
    ws, ns = int(window_samples), int(n_segments)
    assert ws % ns == 0, "window_samples must divide into n_segments"
    seg_len = ws // ns
    w = Window.partitionBy("channel").orderBy("ts", "value")
    ranked = samples.select(
        "channel",
        "ts",
        "value",
        (F.row_number().over(w) - 1).alias("_rn"),
    ).select(
        "channel",
        F.floor(F.col("_rn") / ws).alias("win"),
        F.floor((F.col("_rn") % ws) / seg_len).alias("seg"),
        F.expr(f"CAST(round(value * {QUANT}) AS BIGINT)").alias("vq"),
    )
    segs = ranked.groupBy("channel", "win", "seg").agg(
        F.sum("vq").alias("ssum"),
        F.sum(F.expr("vq * vq")).alias("ssq"),
        F.count(F.lit(1)).alias("scnt"),
    )
    mean_e, std_e = window_stats_exprs(ws)
    wins = (
        segs.groupBy("channel", "win")
        .agg(
            F.sum("ssum").alias("sx"),
            F.sum("ssq").alias("sxx"),
            F.sum("scnt").alias("n"),
        )
        .filter(F.col("n") == ws)
        .select(
            "channel",
            "win",
            F.expr(mean_e).alias("mean"),
            F.expr(std_e).alias("std"),
        )
    )
    sym = sax_symbol_case(seg_z_expr(seg_len))
    worded = (
        segs.join(wins, ["channel", "win"])
        .withColumn("sym", F.expr(sym))
        .groupBy("channel", "win")
        .agg(
            F.first("mean").alias("mean"),
            F.first("std").alias("std"),
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(seg, sym))), s -> s.sym), '')"
            ).alias("sax_word"),
        )
    )
    return worded.select("channel", "win", "mean", "std", "sax_word")


def sax_discords(
    samples: DataFrame,
    window_samples: int = 64,
    n_segments: int = 8,
    k: int = 3,
) -> DataFrame:
    """Discord discovery over the SAX symbolization — the HOT SAX
    heuristic (Keogh, Lin & Fu 2005): windows whose SAX word is among
    the channel's ``k`` RAREST words are the anomaly candidates (the
    magic-word ordering HOT SAX uses to prioritize its search). The
    motif query's mirror image: rarity instead of support.

    Deterministic ranking: word count ASC, then word ASC (a total
    order over the per-channel word table); every window carrying a
    top-k-rare word is emitted, so ties at the same count surface all
    their instances.

    Output: (channel, win, sax_word, word_count, rank) — ``rank`` is
    the rarity rank of the word (1 = rarest), ``word_count`` its
    channel support.

    Plan / scale: rides :func:`sax_words` (one per-channel window
    pass), collapses to the bounded |channels|×|words| table for the
    rarity rank (alphabet^segments caps it), then one broadcast-size
    join back to the word table — the heavy window table never passes
    through a rank window.
    """
    w = sax_words(samples, window_samples, n_segments)
    c = w.groupBy("channel", "sax_word").agg(
        F.count(F.lit(1)).cast("long").alias("word_count")
    )
    wr = Window.partitionBy("channel").orderBy(
        F.asc("word_count"), F.asc("sax_word")
    )
    rare = (
        c.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= int(k))
    )
    return (
        w.join(F.broadcast(rare), ["channel", "sax_word"])
        .select("channel", "win", "sax_word", "word_count", "rank")
    )


def sax_motifs(
    samples: DataFrame,
    window_samples: int = 64,
    n_segments: int = 8,
    k: int = 3,
) -> DataFrame:
    """Motif discovery over the SAX symbolization (Lin & Keogh 2002's
    intended use): the ``k`` most frequent SAX words per channel — the
    channel's dominant shapes — with their support. Deterministic
    ranking: count DESC, then word ASC (a total order; word is unique
    within channel after the groupBy).

    Output: (channel, sax_word, n_windows, motif_count, share, rank).

    Plan: rides :func:`sax_words` (per-channel window pass), then two
    map-side-partial groupBys down to |channels|×|words| rows and a
    per-channel rank window over that already-collapsed table —
    |words| <= alphabet^segments is bounded, so the window never sees
    big partitions.
    """
    w = sax_words(samples, window_samples, n_segments)
    c = w.groupBy("channel", "sax_word").agg(
        F.count(F.lit(1)).cast("long").alias("motif_count")
    )
    t = c.groupBy("channel").agg(
        F.sum("motif_count").cast("long").alias("n_windows")
    )
    wr = Window.partitionBy("channel").orderBy(
        F.desc("motif_count"), F.asc("sax_word")
    )
    return (
        c.join(t, "channel")
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select(
            "channel",
            "sax_word",
            "n_windows",
            "motif_count",
            (
                F.col("motif_count").cast("double") / F.col("n_windows")
            ).alias("share"),
            "rank",
        )
    )
