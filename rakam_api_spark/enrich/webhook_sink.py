"""P7: outbound webhook fan-out.

Reference WebhookEventMapper (rakam/.../analysis/webhook/
WebhookEventMapper.java:36-222): every event is queued; a scheduled
flush POSTs ``{"activities": [{"collection": …, <properties>…}]}``
to the configured URL with retries; the mapper never blocks the
ingest path.

Spark shape: a ``foreachBatch`` sink — each stored micro-batch is
serialized to the activities payload and handed to the sender.  The
sender is pluggable (tests inject a capturing function; production
uses urllib with the retry loop below).
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Sender = Callable[[str, bytes], None]

MAX_RETRIES = 3  # reference retries ×3 (WebhookEventMapper)


def http_sender(url: str, payload: bytes) -> None:
    last: Exception | None = None
    for attempt in range(MAX_RETRIES):
        try:
            req = urllib.request.Request(
                url, data=payload, headers={"Content-Type": "application/json"}
            )
            urllib.request.urlopen(req, timeout=5)  # noqa: S310
            return
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(0.2 * (attempt + 1))
    raise last  # type: ignore[misc]


class WebhookSink:
    def __init__(self, url: str, sender: Sender | None = None, batch_size: int = 1000):
        self.url = url
        self.sender = sender or http_sender
        self.batch_size = batch_size

    def send_batch(self, collection: str, df: DataFrame) -> int:
        """Serialize a stored micro-batch and POST it in chunks.
        Rows stream through ``toLocalIterator`` so only one chunk is
        in driver memory at a time."""
        sent = 0
        chunk: list[dict] = []
        for row in df.withColumn("__collection", F.lit(collection)).toLocalIterator():
            d = row.asDict(recursive=True)
            coll = d.pop("__collection")
            chunk.append({"collection": coll, **{k: _js(v) for k, v in d.items()}})
            if len(chunk) >= self.batch_size:
                self._flush(chunk)
                sent += len(chunk)
                chunk = []
        if chunk:
            self._flush(chunk)
            sent += len(chunk)
        return sent

    def _flush(self, activities: list[dict]) -> None:
        self.sender(self.url, json.dumps({"activities": activities}, default=str).encode())


def _js(v):
    return v
