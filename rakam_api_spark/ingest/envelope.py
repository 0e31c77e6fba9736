"""S3/S4/S7/S8: batch envelope handling — checksum validation,
ndjson parsing, remote-URL fetch, and the pixel GET source.

Reference EventListDeserializer (rakam/.../collection/
EventListDeserializer.java:42-186) and EventCollectionHttpService
(:278-397, :464-545).
"""

from __future__ import annotations

import hashlib
import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession


class ChecksumMismatch(ValueError):
    pass


def verify_checksum(api_key: str, api_version: str | None, upload_time, body: str, checksum: str) -> None:
    """F9: MD5 over api_key ‖ api_version ‖ upload_time ‖ body,
    hex-compared case-insensitively
    (EventListDeserializer.java:159-186)."""
    expect = hashlib.md5(
        (f"{api_key}{api_version or ''}{upload_time if upload_time is not None else ''}{body}").encode()
    ).hexdigest()
    if expect.lower() != (checksum or "").lower():
        raise ChecksumMismatch("checksum of the request body does not match the checksum parameter")


def parse_event_list(body: str, checksum: str | None = None) -> list[dict]:
    """EventList envelope ``{"api": {...}, "events": [...]}`` —
    property order independent (api before or after events); unknown
    top-level keys rejected (EventListDeserializer.java:71-83)."""
    doc = json.loads(body)
    unknown = set(doc) - {"api", "events"}
    if unknown:
        raise ValueError(f"unknown top-level fields in event list: {sorted(unknown)}")
    if "events" not in doc:
        raise ValueError("event list has no events")
    api = doc.get("api") or {}
    if checksum or api.get("checksum"):
        verify_checksum(
            api.get("api_key", ""),
            api.get("api_version"),
            api.get("upload_time"),
            json.dumps(doc["events"], separators=(",", ":")),
            checksum or api.get("checksum"),
        )
    return doc["events"]


def read_ndjson(spark: SparkSession, path: str, multi_line: bool = False) -> DataFrame:
    """S4: ndjson (one object per line) or a single JSON array body
    (``multi_line=True``) — application/x-ndjson and
    application/x-rawjson (EventCollectionHttpService.java:365-397)."""
    return spark.read.option("multiLine", str(multi_line).lower()).json(path)


def fetch_remote(url: str, timeout: float = 5.0, max_bytes: int = 100 * 1024 * 1024) -> bytes:
    """S7: remote bulk fetch with the reference's 5 s timeouts
    (EventCollectionHttpService.java:517-519)."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read(max_bytes)


def pixel_event(query_params: dict[str, str]) -> tuple[str, dict]:
    """S8: pixel GET → (collection, properties): ``prop.*`` params
    become string properties; ``_time`` parsed as epoch-millis long
    (EventCollectionHttpService.java:278-348)."""
    collection = query_params.get("collection")
    if not collection:
        raise ValueError("collection query parameter is required")
    props: dict = {}
    for k, v in query_params.items():
        if k.startswith("prop."):
            name = k[len("prop.") :]
            if name == "_time":
                try:
                    props[name] = int(v)
                except ValueError:
                    continue
            else:
                props[name] = v
    return collection, props
