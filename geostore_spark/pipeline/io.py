"""Pluggable URL opener — the cloud-IO seam for every pipeline file read.

The reference reads metadata and assets through one boto3 S3 client
injected as ``url_reader`` (geostore/s3.py; check_stac_metadata/
utils.py:85-96 takes it as a constructor argument), which is what makes
its tasks testable and storage-portable. The Spark engine's analog is a
scheme → opener registry: traversal document reads, checksum streaming
reads, and import copies all resolve their opener HERE, defaulting to
local filesystem IO (the test/storage stand-in), so a cluster
deployment registers ``s3`` / ``gs`` openers once and every pipeline
operator follows — no per-operator IO code.

Executor shipping: Python workers are separate processes, so a scheme
registered on the driver after module import would be invisible to
executors. Plan-building code therefore calls :func:`opener_snapshot`
at build time and ships the returned dict in the task closure (openers
must be picklable — top-level functions, not lambdas over live
clients; a real S3 opener captures its config and builds the client
lazily per worker, the standard boto3-under-Spark pattern).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import IO

_SCHEME_RE = re.compile(r"^([a-z][a-z0-9+.-]*)://")


def local_open(url: str, mode: str = "rb") -> IO:
    """Default opener: plain/``file://`` paths via ``open``."""
    return open(re.sub("^file:(//)?", "", url), mode)


_OPENERS: dict[str, Callable[..., IO]] = {"": local_open, "file": local_open}


def url_scheme(url: str) -> str:
    m = _SCHEME_RE.match(url)
    return m.group(1) if m else ""


def register_scheme(scheme: str, opener: Callable[..., IO]) -> None:
    """Register/replace the opener for ``scheme`` (e.g. ``"s3"``).
    ``opener(url, mode)`` must return a file-like object and raise
    ``FileNotFoundError`` for missing objects (an S3 opener maps
    NoSuchKey to it) so the validation taxonomy stays uniform."""
    _OPENERS[scheme] = opener


def opener_snapshot() -> dict[str, Callable[..., IO]]:
    """Picklable snapshot of the current registry, for task closures."""
    return dict(_OPENERS)


def open_url(url: str, mode: str = "rb", openers: dict | None = None) -> IO:
    """Open ``url`` through the registry (or a shipped ``openers``
    snapshot inside an executor task). Unregistered schemes raise
    ``ValueError`` — a loud configuration error, not a per-row skip."""
    table = _OPENERS if openers is None else openers
    scheme = url_scheme(url)
    opener = table.get(scheme)
    if opener is None:
        raise ValueError(f"no opener registered for scheme {scheme!r} ({url})")
    return opener(url, mode)
