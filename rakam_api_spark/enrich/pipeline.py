"""Mapper pipeline driver + field-dependency bookkeeping."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..types import FieldType


@dataclass
class FieldDependency:
    """What a mapper adds to the schema (reference
    FieldDependencyBuilder): ``constant_fields`` are always present;
    ``dependent_fields[trigger]`` are added only when the trigger
    column appears in the incoming event schema.  Trigger columns
    themselves are *not stored* (reference sourceFields exclusion,
    PostgresqlEventStore.java:353-377)."""

    constant_fields: dict[str, FieldType] = field(default_factory=dict)
    dependent_fields: dict[str, dict[str, FieldType]] = field(default_factory=dict)


class Mapper:
    """Base mapper: subclasses declare dependencies and implement
    ``apply``.  ``apply`` must be a narrow transformation (row-local
    exprs or broadcast joins only)."""

    name: str = "mapper"

    def dependency(self) -> FieldDependency:
        return FieldDependency()

    def triggers(self) -> set[str]:
        return set(self.dependency().dependent_fields)

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        return df


class EnrichmentPipeline:
    """Ordered mapper chain.

    ``resolve_fields`` performs the SchemaChecker role (rakam-spi/
    .../analysis/metadata/SchemaChecker.java:27-55): injects constant
    fields and trigger-activated dependent fields into the schema
    the metastore will register, and reports trigger columns to drop
    before storage.
    """

    def __init__(self, mappers: list[Mapper]):
        self.mappers = mappers

    def resolve_fields(self, incoming: dict[str, FieldType]) -> tuple[dict[str, FieldType], set[str]]:
        out = dict(incoming)
        drop: set[str] = set()
        for m in self.mappers:
            dep = m.dependency()
            for name, ft in dep.constant_fields.items():
                # constant (magic) fields own their type even when the
                # client sent a conflicting value
                out[name] = ft
            for trigger, fields in dep.dependent_fields.items():
                if trigger in incoming:
                    drop.add(trigger)
                    for name, ft in fields.items():
                        out.setdefault(name, ft)
        for t in drop:
            out.pop(t, None)
        return out, drop

    def apply(self, df: DataFrame, ctx: dict | None = None) -> DataFrame:
        ctx = ctx or {}
        for m in self.mappers:
            trigger_cols = m.triggers()
            if trigger_cols and not (trigger_cols & set(df.columns)):
                continue
            df = m.apply(df, ctx)
        return df
