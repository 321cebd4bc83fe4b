"""Montage: pairwise channel re-referencing (J1/J2/J4, F2/F3).

EEG montaging recombines electrode channels into virtual channels
``lead<->secondary`` whose signal is the elementwise difference of the
two source channels. The reference zips two positionally-aligned
per-channel streams (query/TimeSeriesQueryRawHttp.scala:326-334) and
must defensively validate alignment (server/TimeSeriesFlow.scala:264-304);
with explicit timestamps a time equi-join both aligns and validates.

Montage schemes are the standard clinical 10-20 pairings; the tables
below reproduce the reference's scheme definitions
(server/Montage.scala:263-329) as plain data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEPARATOR = "<->"

MONTAGE_SCHEMES: dict[str, list[tuple[str, str]]] = {
    # server/Montage.scala:263-285 (BipolarAntPos)
    "bipolar_ant_pos": [
        ("Fp1", "F7"), ("F7", "T7"), ("T7", "P7"), ("P7", "O1"),
        ("Fp2", "F8"), ("F8", "T8"), ("T8", "P8"), ("P8", "O2"),
        ("Fp1", "F3"), ("F3", "C3"), ("C3", "P3"), ("P3", "O1"),
        ("Fp2", "F4"), ("F4", "C4"), ("C4", "P4"), ("P4", "O2"),
        ("Fz", "Cz"), ("Cz", "Fz"),
    ],
    # server/Montage.scala:287-307 (BipolarTransverse)
    "bipolar_transverse": [
        ("F7", "F3"), ("F3", "Fz"), ("Fz", "F4"), ("F4", "F8"),
        ("A1", "T7"), ("T7", "C3"), ("C3", "Cz"), ("Cz", "C4"),
        ("C4", "T8"), ("T8", "A2"), ("P7", "P3"), ("P3", "Pz"),
        ("Pz", "P4"), ("P4", "P8"), ("Fp1", "A1"), ("Fp2", "A2"),
        ("Q1", "A1"), ("Q2", "A2"),
    ],
    # server/Montage.scala:309-329 (ReferentialVsCz)
    "referential_vs_cz": [
        ("Fp1", "Cz"), ("Fp2", "Cz"), ("F7", "Cz"), ("F8", "Cz"),
        ("T7", "Cz"), ("T8", "Cz"), ("P7", "Cz"), ("P8", "Cz"),
        ("F3", "Cz"), ("F4", "Cz"), ("C3", "Cz"), ("C4", "Cz"),
        ("P3", "Cz"), ("P4", "Cz"), ("Q1", "Cz"), ("Q2", "Cz"),
        ("F2", "Cz"), ("P2", "Cz"),
    ],
}

# Caller-supplied pairs (MontageType.CustomMontage,
# server/Montage.scala:233-257): the scheme name is fixed, the pairs
# arrive with the request (TSJsonSupport.scala:238 ``montageMap``).
CUSTOM_MONTAGE = "custom"

# Reference wire names (TSJsonSupport.scala:252-270) -> engine scheme
# names; NOT_MONTAGED maps to None (clear the montage).
WIRE_MONTAGE_NAMES: dict[str, str | None] = {
    "NOT_MONTAGED": None,
    "BIPOLAR_ANT_POS": "bipolar_ant_pos",
    "BIPOLAR_TRANSVERSE": "bipolar_transverse",
    "REFERENTIAL_VS_CZ": "referential_vs_cz",
    "CUSTOM_MONTAGE": CUSTOM_MONTAGE,
}


def resolve_pairs(
    scheme: str, custom_pairs: list[tuple[str, str]] | None = None
) -> list[tuple[str, str]]:
    """Pair list for a scheme name; ``custom`` uses the caller-supplied
    pairs (CustomMontage.pairs, server/Montage.scala:236-239)."""
    if scheme == CUSTOM_MONTAGE:
        return list(custom_pairs or [])
    if scheme not in MONTAGE_SCHEMES:
        raise MontageValidationError(f"unknown montage scheme: {scheme}")
    return MONTAGE_SCHEMES[scheme]


class MontageValidationError(Exception):
    """Channels required by the montage are missing from the package
    (reference TimeSeriesException.PackageMissingChannels,
    server/Montage.scala:141-157). ``channel_names`` carries the
    offending channels for the error wire shape (server/Error.scala)."""

    def __init__(self, message: str, channel_names: list[str] | None = None):
        super().__init__(message)
        self.channel_names = channel_names or []


def montage_name(lead: str, secondary: str | None = None) -> str:
    """`lead<->secondary` virtual channel name
    (server/Montage.scala:187-196)."""
    return lead if secondary is None else f"{lead}{SEPARATOR}{secondary}"


def parse_montage_name(name: str) -> tuple[str, str | None]:
    """Split/validate a virtual channel name
    (server/Montage.scala:203-211)."""
    parts = name.split(SEPARATOR)
    if len(parts) == 1:
        return parts[0], None
    if len(parts) == 2:
        return parts[0], parts[1]
    raise MontageValidationError(f"invalid montage name: {name}")


def montage_pairs(spark: SparkSession, scheme: str | list[tuple[str, str]]) -> DataFrame:
    """Tiny (lead, secondary, virtual_channel) dimension DataFrame —
    broadcast side of the montage join."""
    pairs = resolve_pairs(scheme) if isinstance(scheme, str) else scheme
    rows = [(l, s, montage_name(l, s)) for l, s in pairs]
    return spark.createDataFrame(rows, "lead string, secondary string, virtual_channel string")


def validate_montage(
    channel_names: list[str],
    scheme: str,
    custom_pairs: list[tuple[str, str]] | None = None,
) -> None:
    """All channels referenced by the scheme must exist in the package
    (checkMontageability, server/Montage.scala:96-117)."""
    need = {c for pair in resolve_pairs(scheme, custom_pairs) for c in pair}
    missing = need - set(channel_names)
    if missing:
        raise MontageValidationError(
            f"package is missing montage channels: {sorted(missing)}",
            channel_names=sorted(missing),
        )


def apply_montage(samples: DataFrame, pairs: DataFrame) -> DataFrame:
    """Compute virtual-channel signals: for each (lead, secondary) pair,
    value = lead.value - secondary.value at equal ts (F2,
    query/TimeSeriesQueryRawHttp.scala:332).

    Plan shape: `pairs` is tiny → broadcast; the lead/secondary
    self-join of samples is a shuffle equi-join on (channel fanned to
    virtual channel, ts). With ingest layout bucketed by channel the
    join co-locates.
    """
    lead = samples.join(
        F.broadcast(pairs), samples["channel"] == pairs["lead"], "inner"
    ).select("virtual_channel", "secondary", "ts", F.col("value").alias("lead_value"))
    sec = samples.select(
        F.col("channel").alias("secondary"),
        F.col("ts").alias("sec_ts"),
        F.col("value").alias("sec_value"),
    )
    return (
        lead.join(
            sec,
            (lead["secondary"] == sec["secondary"])
            & (lead["ts"] == sec["sec_ts"]),
            "inner",
        )
        .select(
            F.col("virtual_channel").alias("channel"),
            "ts",
            (F.col("lead_value") - F.col("sec_value")).alias("value"),
        )
    )


def montage_two_channels(samples: DataFrame, lead: str, secondary: str) -> DataFrame:
    """Single-pair montage via a ts equi-join (J1)."""
    l = samples.filter(F.col("channel") == lead).select("ts", F.col("value").alias("lv"))
    s = samples.filter(F.col("channel") == secondary).select(
        "ts", F.col("value").alias("sv")
    )
    return l.join(s, "ts", "inner").select(
        F.lit(montage_name(lead, secondary)).alias("channel"),
        "ts",
        (F.col("lv") - F.col("sv")).alias("value"),
    )
