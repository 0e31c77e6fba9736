"""P6/S9: custom per-project transforms — the Spark re-expression of
the reference's sandboxed JavaScript extension points.

Reference surface:
- custom event mapper: per-project stored JS ``mapper(events, …)``
  that reads/mutates event properties, can add new fields (which
  triggers schema evolution) and set cookies
  (rakam/.../plugin/CustomEventMapperHttpService.java:269-361);
- webhook source: stored JS ``module(queryParams, body, params,
  headers) → {collection, properties}``
  (rakam/.../collection/WebHookHttpService.java:154-268).

Here transforms are named Python callables in a registry (the
engine's "stored procedures").  Event-mapper transforms run inside
the ingest pipeline as DataFrame→DataFrame stages — row-local, so
any Python work rides mapInPandas/Arrow, and new columns flow into
the post-enrichment inference pass for schema evolution.  Webhook
transforms run at the gateway on the raw request.

Sandboxing note: the reference locks the Nashorn engine down
(JSCodeCompiler.java:113-149).  Python callables here are trusted
code registered by the operator — the engine does not execute
user-uploaded source strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

EventTransform = Callable[[DataFrame, dict], DataFrame]
WebhookTransform = Callable[[dict, str, dict, dict], dict | None]


@dataclass
class TransformRegistry:
    event_mappers: dict[tuple[str, str], EventTransform] = field(default_factory=dict)
    webhooks: dict[tuple[str, str], WebhookTransform] = field(default_factory=dict)

    # --- custom event mappers (P6) --------------------------------------

    def register_event_mapper(self, project: str, name: str, fn: EventTransform) -> None:
        self.event_mappers[(project, name)] = fn

    def event_mappers_for(self, project: str) -> list[EventTransform]:
        return [fn for (p, _), fn in sorted(self.event_mappers.items()) if p == project]

    # --- webhook source transforms (S9) ---------------------------------

    def register_webhook(self, project: str, hook_id: str, fn: WebhookTransform) -> None:
        self.webhooks[(project, hook_id)] = fn

    def invoke_webhook(
        self,
        project: str,
        hook_id: str,
        query_params: dict | None = None,
        body: str = "",
        params: dict | None = None,
        headers: dict | None = None,
    ) -> dict | None:
        """Run a webhook transform on a raw request; returns the
        event dict ``{"collection": …, "properties": {…}}`` or None
        to drop (reference returns null → no event)."""
        fn = self.webhooks.get((project, hook_id))
        if fn is None:
            raise KeyError(f"webhook does not exist: {project}/{hook_id}")
        return fn(query_params or {}, body, params or {}, headers or {})


class CustomMapperStage:
    """Adapter running a project's registered event-mapper transforms
    as one pipeline stage (ordered by name, as the reference runs
    its mapper list in registration order)."""

    name = "custom"

    def __init__(self, registry: TransformRegistry, project: str):
        self.registry = registry
        self.project = project

    def dependency(self):
        from .pipeline import FieldDependency

        return FieldDependency()

    def triggers(self) -> set[str]:
        return set()

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        for fn in self.registry.event_mappers_for(self.project):
            df = fn(df, ctx)
        return df
