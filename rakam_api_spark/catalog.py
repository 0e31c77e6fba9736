"""Metastore: projects, collections, and dynamically evolving
schemas.

Re-expresses the reference's Metastore SPI (rakam-spi/.../analysis/
metadata/Metastore.java:11-27) and its Postgres implementation's
semantics (PostgresqlMetastore.java:142-365):

- a *project* is a tenant namespace (reference: one PG schema);
- a *collection* is an event table created lazily on first event;
- schema evolution is ADD-COLUMN-ONLY: types never change once set
  (getOrCreateCollectionFields, PostgresqlMetastore.java:253-354);
- hard caps: ≤200 columns per collection
  (PostgresqlMetastore.java:277-279);
- magic fields: `_time` TIMESTAMP on every collection
  (TimestampEventMapper.addFieldDependency), `$server_time`
  TIMESTAMP (PostgresqlMetastore.java:305); `$server_time` is
  reserved for clients (SchemaChecker.java:27-55);
- `_user`'s type is pinned project-wide on first sight
  (JsonEventDeserializer.java:390-397, InternalConfig.java:5-6);
- fixed-schema mode: schema changes require master key
  (JsonEventDeserializer.java:460-463).

Storage: one JSON document per project under
``{warehouse}/_metastore/{project}.json`` — the Spark-world analog
of the reference's metadata tables; cheap to cache driver-side (the
reference caches schemas 30 min / 1 min — JsonEventDeserializer.
java:53-56, PostgresqlMetastore.java:50-63).  Concurrent evolution
is serialized through this driver-side object (the reference instead
retries concurrent DDL ×20, PostgresqlMetastore.java:343-346).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from dataclasses import dataclass, field

from pyspark.sql import types as T

from .types import (
    FieldType,
    InvalidFieldName,
    strip_collection_name,
    strip_name,
    to_struct_field,
)

MAX_COLUMNS = 200
RESERVED_FIELDS = ("$server_time",)
MAGIC_FIELDS: dict[str, FieldType] = {
    "_time": FieldType.TIMESTAMP,
    "$server_time": FieldType.TIMESTAMP,
}
USER_FIELD = "_user"
ALLOWED_USER_TYPES = (FieldType.STRING, FieldType.LONG, FieldType.INTEGER)


class MetastoreError(Exception):
    pass


class ColumnCapExceeded(MetastoreError):
    pass


class TypeMismatch(MetastoreError):
    """A field arrived with a type conflicting with the registered
    one — the caller coerces or dead-letters the value; the schema
    never changes (reference JsonEventDeserializer.getValue)."""


class FixedSchemaViolation(MetastoreError):
    pass


@dataclass
class CollectionSchema:
    fields: dict[str, FieldType] = field(default_factory=dict)

    def to_struct(self) -> T.StructType:
        return T.StructType([to_struct_field(n, ft) for n, ft in self.fields.items()])


@dataclass
class Project:
    name: str
    collections: dict[str, CollectionSchema] = field(default_factory=dict)
    config: dict[str, object] = field(default_factory=dict)  # USER_TYPE, FIXED_SCHEMA


class Metastore:
    def __init__(self, warehouse_dir: str):
        self.warehouse_dir = warehouse_dir
        self._dir = os.path.join(warehouse_dir, "_metastore")
        os.makedirs(self._dir, exist_ok=True)
        self._lock = threading.RLock()
        self._projects: dict[str, Project] = {}
        # schema-change event bus (reference M4: SystemEvents /
        # AbstractMetastore.java:22-36): listeners get
        # (event, payload) for project_created / collection_created /
        # collection_fields_created — the auto-indexer hook point
        # (PostgresqlModule.java:192-242; on Spark the analog is
        # stats/compaction scheduling, see EventStore.compact)
        self._listeners: list = []
        self._load_all()

    def add_listener(self, fn) -> None:
        self._listeners.append(fn)

    def _emit(self, event: str, **payload) -> None:
        for fn in self._listeners:
            fn(event, payload)

    # --- persistence ----------------------------------------------------

    def _path(self, project: str) -> str:
        return os.path.join(self._dir, f"{project}.json")

    def _load_all(self) -> None:
        for fn in os.listdir(self._dir):
            if fn.endswith(".json"):
                with open(os.path.join(self._dir, fn)) as f:
                    doc = json.load(f)
                proj = Project(
                    name=doc["name"],
                    collections={
                        c: CollectionSchema({n: FieldType(t) for n, t in cols.items()})
                        for c, cols in doc["collections"].items()
                    },
                    config=doc.get("config", {}),
                )
                self._projects[proj.name] = proj

    def _persist(self, project: Project) -> None:
        doc = {
            "name": project.name,
            "collections": {
                c: {n: ft.value for n, ft in cs.fields.items()} for c, cs in project.collections.items()
            },
            "config": project.config,
        }
        # atomic rename so concurrent readers never see torn JSON
        fd, tmp = tempfile.mkstemp(dir=self._dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._path(project.name))

    # --- project DDL (reference M1) -------------------------------------

    def create_project(self, name: str) -> Project:
        name = strip_collection_name(name)
        with self._lock:
            if name not in self._projects:
                self._projects[name] = Project(name=name)
                self._persist(self._projects[name])
                self._emit("project_created", project=name)
            return self._projects[name]

    def delete_project(self, name: str) -> None:
        with self._lock:
            self._projects.pop(name, None)
            try:
                os.remove(self._path(name))
            except FileNotFoundError:
                pass

    def projects(self) -> list[str]:
        with self._lock:
            return sorted(self._projects)

    def project(self, name: str) -> Project:
        try:
            return self._projects[name]
        except KeyError:
            raise MetastoreError(f"project does not exist: {name}") from None

    # --- config KV (reference M9 / ConfigManager) -----------------------

    def set_config_once(self, project: str, key: str, value) -> object:
        """First-write-wins (reference ConfigManager.setConfigOnce)."""
        with self._lock:
            proj = self.project(project)
            if key not in proj.config:
                proj.config[key] = value
                self._persist(proj)
            return proj.config[key]

    def get_config(self, project: str, key: str, default=None):
        return self.project(project).config.get(key, default)

    def set_config(self, project: str, key: str, value) -> None:
        with self._lock:
            proj = self.project(project)
            proj.config[key] = value
            self._persist(proj)

    # --- collection schema (reference M2/M3) ----------------------------

    def collections(self, project: str) -> dict[str, T.StructType]:
        proj = self.project(project)
        return {c: cs.to_struct() for c, cs in proj.collections.items()}

    def get_collection(self, project: str, collection: str) -> T.StructType | None:
        cs = self.project(project).collections.get(strip_collection_name(collection))
        return cs.to_struct() if cs else None

    def get_or_create_collection_fields(
        self,
        project: str,
        collection: str,
        new_fields: dict[str, FieldType],
        master_key: bool = False,
    ) -> T.StructType:
        """Additive-only evolution with magic-field injection.

        Returns the (possibly extended) schema.  Existing fields are
        never retyped: a conflicting type raises TypeMismatch and the
        caller coerces/dead-letters the *value* (reference keeps the
        registered type and routes bad values to $invalid_schema).
        """
        collection = strip_collection_name(collection)
        with self._lock:
            proj = self.project(project)
            creating = collection not in proj.collections
            if creating and self.get_config(project, "FIXED_SCHEMA") and not master_key:
                # M6 explicit-schema mode: collections are declared
                # up front (MysqlExplicitMetastore.java:48-196);
                # ingest cannot create one implicitly
                raise FixedSchemaViolation(
                    f"project {project} has a fixed schema; master key required to "
                    f"create collection {collection}"
                )
            if creating and not new_fields:
                # reference refuses to create an empty collection
                # implicitly (schema comes with first event)
                proj.collections[collection] = CollectionSchema()
            cs = proj.collections.setdefault(collection, CollectionSchema())
            # normalize + validate client names
            cleaned: dict[str, FieldType] = {}
            for raw, ft in new_fields.items():
                name = raw if raw in MAGIC_FIELDS else strip_name(raw)
                if name in RESERVED_FIELDS and raw not in MAGIC_FIELDS:
                    raise InvalidFieldName(f"{name} is a reserved field name")
                cleaned[name] = ft
            # _user type pinning (project-wide, first sight wins)
            if USER_FIELD in cleaned:
                want = cleaned[USER_FIELD]
                if want not in ALLOWED_USER_TYPES:
                    raise TypeMismatch(f"_user must be STRING/LONG/INTEGER, got {want}")
                pinned = self.set_config_once(project, "USER_TYPE", want.value)
                cleaned[USER_FIELD] = FieldType(pinned)
            # magic fields on every collection; their types are fixed
            # regardless of what the client sent (SchemaChecker
            # collision policing)
            for name, ft in MAGIC_FIELDS.items():
                cleaned[name] = ft
            truly_new = {n: ft for n, ft in cleaned.items() if n not in cs.fields}
            if truly_new and not creating:
                if self.get_config(project, "FIXED_SCHEMA") and not master_key:
                    raise FixedSchemaViolation(
                        f"project {project} has a fixed schema; master key required to add "
                        f"{sorted(truly_new)}"
                    )
            if len(cs.fields) + len(truly_new) > MAX_COLUMNS:
                raise ColumnCapExceeded(
                    f"{collection} would have {len(cs.fields) + len(truly_new)} columns (max {MAX_COLUMNS})"
                )
            conflicts = {
                n: (cs.fields[n], ft) for n, ft in cleaned.items() if n in cs.fields and cs.fields[n] != ft
            }
            if truly_new:
                cs.fields.update(truly_new)
                self._persist(proj)
                if creating:
                    self._emit("collection_created", project=project, collection=collection)
                self._emit(
                    "collection_fields_created",
                    project=project,
                    collection=collection,
                    fields=dict(truly_new),
                )
            if conflicts:
                raise TypeMismatch(
                    "; ".join(f"{n}: registered {a.value}, got {b.value}" for n, (a, b) in conflicts.items())
                )
            return cs.to_struct()
