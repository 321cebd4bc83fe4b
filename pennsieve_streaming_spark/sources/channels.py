"""Pluggable channel-catalog backends (the reference's GetChannelsQuery
seam).

The reference resolves a package's channel list through a
``GetChannelsQuery`` trait with two implementations: the default
Postgres-backed lookup and the Discover-API flavor that first resolves
the package's organization through an external service, then runs the
same lookup scoped to it
(server/discover/DiscoverGetChannelsQuery.scala:28-39; client trait
clients/DiscoverApiClient.scala:33-47). This module reproduces the seam
so the engine has a proven second backend:

- ``DataFrameChannelsQuery`` — the default: a channels dimension
  DataFrame (e.g. ``tables.channels_view``) filtered per package.
- ``DiscoverChannelsQuery`` — resolves package -> organization through a
  ``DiscoverClient``, rejects non-timeseries packages
  (``NotTimeSeriesError``, Error.scala:56-63), surfaces client failures
  as ``DiscoverApiError`` (Error.scala:126-133), then delegates to a
  per-organization catalog.
- ``JsonFileDiscoverClient`` — file-backed stand-in for the Discover
  HTTP API (the sandbox has no network): reads
  ``{package_id: {"organizationId": N, "isTimeSeries": bool}}``,
  mirroring ``extractOrganizationId``'s isTimeSeries guard
  (clients/DiscoverApiClient.scala:36-47).
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ChannelsError(Exception):
    """Error wire shape carrier (server/Error.scala): ``name`` is the
    protocol error name, ``channel_names`` the offending channels."""

    name = "UnexpectedError"

    def __init__(self, reason: str, channel_names: list[str] | None = None):
        super().__init__(reason)
        self.channel_names = channel_names or []


class NotTimeSeriesError(ChannelsError):
    """Package exists but is not a timeseries package
    (TimeSeriesException.NotTimeSeries, server/Error.scala:56-63)."""

    name = "NotTimeSeries"


class DiscoverApiError(ChannelsError):
    """Discover lookup failed (TimeSeriesException.DiscoverApiError,
    server/Error.scala:126-133)."""

    name = "DiscoverApiError"


class GetChannelsQuery(ABC):
    """One method: package id -> channels dimension DataFrame
    (node_id/name/rate/... schema per SURVEY §1.1)."""

    @abstractmethod
    def get_channels(self, package_id: str) -> DataFrame: ...


@dataclass
class DataFrameChannelsQuery(GetChannelsQuery):
    """Default backend: a channels dimension DataFrame, optionally
    carrying a ``package_id`` column to scope per package; without one
    every package sees the whole catalog (single-package embed)."""

    channels: DataFrame

    def get_channels(self, package_id: str) -> DataFrame:
        df = self.channels
        if "package_id" in df.columns:
            df = df.filter(F.col("package_id") == package_id)
        return df


class DiscoverClient(ABC):
    """Subset of the Discover API the catalog needs
    (clients/DiscoverApiClient.scala:33-47)."""

    @abstractmethod
    def get_organization_id(self, package_id: str) -> int: ...


class JsonFileDiscoverClient(DiscoverClient):
    """File-backed Discover API stand-in: the file plays the
    ``/packages/{id}/files`` response page; ``isTimeSeries`` false →
    NotTimeSeries, missing package → DiscoverApiError (the HTTP-error
    lane of the real client)."""

    def __init__(self, path: str):
        self.path = path

    def get_organization_id(self, package_id: str) -> int:
        try:
            with open(self.path) as fh:
                pages = json.load(fh)
        except OSError as e:
            raise DiscoverApiError(f"discover lookup failed: {e}") from e
        page = pages.get(package_id)
        if page is None:
            raise DiscoverApiError(f"no discover entry for package {package_id}")
        if not page.get("isTimeSeries", False):
            raise NotTimeSeriesError(f"package {package_id} is not a timeseries")
        return int(page["organizationId"])


@dataclass
class DiscoverChannelsQuery(GetChannelsQuery):
    """Discover-backed catalog: resolve the organization first, then
    run the per-organization lookup — the exact composition of
    DiscoverGetChannelsQuery.query
    (server/discover/DiscoverGetChannelsQuery.scala:31-39)."""

    client: DiscoverClient
    catalogs_by_org: dict[int, GetChannelsQuery]

    def get_channels(self, package_id: str) -> DataFrame:
        org_id = self.client.get_organization_id(package_id)
        catalog = self.catalogs_by_org.get(org_id)
        if catalog is None:
            raise DiscoverApiError(
                f"no catalog for organization {org_id} (package {package_id})"
            )
        return catalog.get_channels(package_id)
