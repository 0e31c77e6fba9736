"""Mutable user-profile store — the reference's "CRM side".

Re-expresses UserStorage (rakam-spi/.../plugin/user/UserStorage.
java:12-76) and the Postgres implementation's semantics
(PostgresqlUserStorage.java):

- one ``_users`` table per project: ``id`` PK + ``created_at`` +
  dynamic columns, id type pinned project-wide (U10);
- set / setOnce / increment / unset property ops (U3-U6) with
  cross-type coercion on set ("2" → 2.0 into a DOUBLE column,
  TestUserStorage contract) and column auto-creation with inferred
  types (getPostgresqlType probing, :810-843);
- create-or-merge on duplicate id (U1, :227-236);
- ordered batch ops per user (U7, :768-808);
- ``$anonymous_id_mapping`` identity stitching (U11,
  PostgresqlModule.java:244-264).

Spark design — MERGE as one plan: a batch of ops is *folded
driver-side into one closed form per (user, property)* — a
(mode, base, delta) triple where mode ∈ {keep, set, setonce} — then
applied to the big table as a single full-outer join + CASE
projection (the "single MERGE with per-op CASE logic" shape).  The
ops list is request-sized (the reference caps batches at 5000 ops);
the user table is the big side and is never collected.  Writes are
versioned directories with the current version tracked in the
metastore — atomic swap, readers never see partial files; at 100 TB
the same plan runs as a Delta/Iceberg MERGE INTO with the identical
join+CASE core.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import Metastore
from .ingest.coerce import _scalar_coerce
from .ingest.infer import infer_field_type
from .types import FieldType, strip_name, to_spark_type

USERS_COLLECTION = "_users"
ANON_MAPPING = "$anonymous_id_mapping"

SET = "set"
SET_ONCE = "set_once"
INCREMENT = "increment"
UNSET = "unset"


@dataclass
class UserOp:
    user: object
    op: str  # set|set_once|increment|unset
    properties: dict  # prop -> value (for unset: {prop: None})


def _fold_ops(ops: list[UserOp]) -> dict[object, dict[str, tuple[str, object, float]]]:
    """Sequentially fold each user's ordered op list into one closed
    form per property: (mode, base, delta) meaning

    - ("keep",   None, d): current + d (increment-only)
    - ("set",    v,    d): v + d       (set/unset won; unset ⇒ v None)
    - ("setonce", v,   d): coalesce(current, v) + d
    """
    state: dict[object, dict[str, tuple[str, object, float]]] = {}
    for o in ops:
        user_state = state.setdefault(o.user, {})
        for raw_prop, value in o.properties.items():
            prop = strip_name(raw_prop)
            if prop == "id":
                prop = "_id"
            mode, base, delta = user_state.get(prop, ("keep", None, 0.0))
            if o.op == SET:
                mode, base, delta = "set", value, 0.0
            elif o.op == UNSET:
                mode, base, delta = "set", None, 0.0
            elif o.op == SET_ONCE:
                if mode == "keep":
                    mode, base = "setonce", value
                elif mode == "set" and base is None and delta == 0.0:
                    # set-null/unset followed by setOnce: the column
                    # is null at that point, so setOnce writes
                    base = value
                # after a non-null set, or an earlier setOnce: no effect
            elif o.op == INCREMENT:
                if not isinstance(value, (int, float)) or isinstance(value, bool):
                    raise TypeError(f"increment requires a numeric value for {prop}")
                delta += value
            user_state[prop] = (mode, base, delta)
    return state


class UserStorage:
    def __init__(self, spark: SparkSession, metastore: Metastore):
        self.spark = spark
        self.metastore = metastore
        self.warehouse = metastore.warehouse_dir

    # --- table plumbing -------------------------------------------------

    def _version(self, project: str) -> int:
        return int(self.metastore.get_config(project, "USERS_VERSION", 0))

    def _path(self, project: str, version: int) -> str:
        return os.path.join(self.warehouse, project, f"_users_v{version}")

    def _user_type(self, project: str) -> FieldType:
        pinned = self.metastore.get_config(project, "USER_TYPE")
        return FieldType(pinned) if pinned else FieldType.STRING

    def _schema(self, project: str) -> T.StructType:
        """Registered user schema; created on first use (U10)."""
        self.metastore.create_project(project)
        fields = self.metastore.project(project).collections.get(USERS_COLLECTION)
        id_type = self._user_type(project)
        base = [
            T.StructField("id", to_spark_type(id_type), False),
            T.StructField("created_at", T.TimestampType()),
        ]
        if fields is None:
            return T.StructType(base)
        extra = [
            T.StructField(n, to_spark_type(ft))
            for n, ft in fields.fields.items()
            if n not in ("id", "created_at", "_time", "$server_time")
        ]
        return T.StructType(base + extra)

    def _register_fields(self, project: str, new_fields: dict[str, FieldType]) -> None:
        if new_fields:
            self.metastore.get_or_create_collection_fields(project, USERS_COLLECTION, new_fields)

    def table(self, project: str) -> DataFrame:
        """Current user table (U9 metadata = .schema)."""
        schema = self._schema(project)
        v = self._version(project)
        path = self._path(project, v)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.parquet(path)
        cols = []
        have = {f.name for f in df.schema.fields}
        for fld in schema.fields:
            if fld.name in have:
                cols.append(F.col(f"`{fld.name}`").cast(fld.dataType).alias(fld.name))
            else:
                cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
        return df.select(*cols)

    def _swap_in(self, project: str, df: DataFrame) -> None:
        v = self._version(project) + 1
        df.write.mode("overwrite").parquet(self._path(project, v))
        self.metastore.set_config(project, "USERS_VERSION", v)

    # --- ops (U1-U7) ----------------------------------------------------

    def create(self, project: str, user_id, properties: dict | None = None) -> None:
        """U1/U2: create-or-merge (duplicate id falls back to set)."""
        ops = [UserOp(user_id, SET, properties or {})]
        self.batch(project, ops, create_missing=True)

    def batch_create(self, project: str, users: list[tuple[object, dict]]) -> None:
        self.batch(project, [UserOp(u, SET, p) for u, p in users], create_missing=True)

    def set_properties(self, project: str, user_id, properties: dict) -> None:
        self.batch(project, [UserOp(user_id, SET, properties)])

    def set_properties_once(self, project: str, user_id, properties: dict) -> None:
        self.batch(project, [UserOp(user_id, SET_ONCE, properties)])

    def increment_property(self, project: str, user_id, prop: str, delta) -> None:
        self.batch(project, [UserOp(user_id, INCREMENT, {prop: delta})])

    def unset_properties(self, project: str, user_id, props: list[str]) -> None:
        self.batch(project, [UserOp(user_id, UNSET, {p: None for p in props})])

    def batch(self, project: str, ops: list[UserOp], create_missing: bool = True) -> None:
        """U7: ordered op batch applied as ONE merge plan."""
        if not ops:
            return
        self.metastore.create_project(project)
        # pin id type from the first seen user id
        first_user = ops[0].user
        if self.metastore.get_config(project, "USER_TYPE") is None:
            ft = FieldType.LONG if isinstance(first_user, int) else FieldType.STRING
            self.metastore.set_config_once(project, "USER_TYPE", ft.value)

        folded = _fold_ops(ops)

        # infer + register new columns (probing string values for
        # date/timestamp like getPostgresqlType)
        known = (
            dict(self.metastore.project(project).collections.get(USERS_COLLECTION).fields)
            if USERS_COLLECTION in self.metastore.project(project).collections
            else {}
        )
        new_fields: dict[str, FieldType] = {}
        for user_state in folded.values():
            for prop, (mode, base, delta) in user_state.items():
                if prop in known or prop in new_fields:
                    continue
                if delta and mode == "keep":
                    new_fields[prop] = FieldType.DOUBLE  # increment creates numeric col
                else:
                    ft = infer_field_type(base)
                    if ft is not None:
                        new_fields[prop] = ft
        self._register_fields(project, new_fields)

        schema = self._schema(project)
        id_type = schema["id"].dataType
        prop_fields = [f for f in schema.fields if f.name not in ("id", "created_at")]
        touched = {p for s in folded.values() for p in s}

        # updates frame: one row per user; per touched prop:
        # mode (string), base (string-encoded), delta (double)
        upd_schema = T.StructType(
            [T.StructField("id", id_type, False)]
            + [
                fld
                for p in sorted(touched)
                for fld in (
                    T.StructField(f"{p}__mode", T.StringType()),
                    T.StructField(f"{p}__base", T.StringType()),
                    T.StructField(f"{p}__delta", T.DoubleType()),
                )
            ]
        )
        rows = []
        for user, user_state in folded.items():
            vals: dict = {"id": user}
            for p in sorted(touched):
                mode, base, delta = user_state.get(p, ("keep", None, 0.0))
                vals[f"{p}__mode"] = mode
                if isinstance(base, bool):
                    vals[f"{p}__base"] = "true" if base else "false"
                elif isinstance(base, (list, dict)):
                    import json

                    vals[f"{p}__base"] = json.dumps(base)
                else:
                    vals[f"{p}__base"] = None if base is None else str(base)
                vals[f"{p}__delta"] = float(delta)
            rows.append(Row(**vals))
        updates = self.spark.createDataFrame(rows, upd_schema)

        current = self.table(project)
        merged = current.alias("t").join(updates.alias("u"), on="id", how="full_outer")

        out_cols = [F.col("id")]
        # created_at: setOnce semantics on create
        out_cols.append(
            F.coalesce(F.col("t.created_at"), F.current_timestamp()).alias("created_at")
        )
        for fld in prop_fields:
            p = fld.name
            cur = F.col(f"t.`{p}`")
            if p not in touched:
                out_cols.append(cur.alias(p))
                continue
            from .types import from_spark_type

            ft = from_spark_type(fld.dataType, dict(fld.metadata) if fld.metadata else None)
            base = _scalar_coerce(F.col(f"u.`{p}__base`"), T.StringType(), ft if not (ft.is_array or ft.is_map) else FieldType.STRING, 10_000)
            if ft.is_array or ft.is_map:
                from .ingest.coerce import coerce_expr

                base = coerce_expr(F.col(f"u.`{p}__base`"), T.StringType(), ft, 10_000)
            mode = F.col(f"u.`{p}__mode`")
            delta = F.col(f"u.`{p}__delta`")
            merged_val = (
                F.when(mode.isNull(), cur)  # user row untouched by batch
                .when(mode == "set", base)
                .when(mode == "setonce", F.coalesce(cur, base))
                .otherwise(cur)
            )
            if isinstance(fld.dataType, (T.DoubleType, T.LongType, T.IntegerType, T.DecimalType)):
                inc = F.when(
                    mode.isNotNull() & (delta != 0.0),
                    F.coalesce(merged_val.cast("double"), F.lit(0.0)) + delta,
                ).otherwise(merged_val.cast("double"))
                merged_val = inc.cast(fld.dataType)
            out_cols.append(merged_val.alias(p))
        result = merged.select(*out_cols)
        if not create_missing:
            result = result.where(F.col("t.id").isNotNull() | F.col("u.id").isNull())
        # the new version is a different directory, so the plan can
        # stream-read the current version while writing v+1
        self._swap_in(project, result)

    # --- lookups (U8/U9) ------------------------------------------------

    def get_user(self, project: str, user_id) -> dict | None:
        rows = self.table(project).where(F.col("id") == F.lit(user_id)).limit(1).collect()
        return rows[0].asDict() if rows else None

    def get_metadata(self, project: str) -> T.StructType:
        return self._schema(project)

    # --- identity stitching (U11) ---------------------------------------

    def _anon_path(self, project: str) -> str:
        return os.path.join(self.warehouse, project, "_anonymous_id_mapping")

    ANON_SCHEMA = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("_user", T.StringType()),
            T.StructField("created_at", T.TimestampType()),
            T.StructField("merged_at", T.TimestampType()),
        ]
    )

    def merge_anonymous(self, project: str, anonymous_id: str, user_id, created_at=None) -> None:
        """Record an anon→identified mapping (reference
        PostgresqlUserService.merge)."""
        self.metastore.create_project(project)
        row = self.spark.createDataFrame(
            [(str(anonymous_id), str(user_id))], "id string, _user string"
        ).select(
            "id",
            "_user",
            (F.lit(created_at).cast("timestamp") if created_at else F.current_timestamp()).alias(
                "created_at"
            ),
            F.current_timestamp().alias("merged_at"),
        )
        row.write.mode("append").parquet(self._anon_path(project))

    def anonymous_mapping(self, project: str) -> DataFrame:
        path = self._anon_path(project)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], self.ANON_SCHEMA)
        return self.spark.read.parquet(path)

    def stitch(self, project: str, events: DataFrame, user_col: str = "_user") -> DataFrame:
        """Rewrite anonymous ids in an event frame to their merged
        identity via a broadcast join on the (small) mapping table."""
        mapping = self.anonymous_mapping(project).select(
            F.col("id").alias("__anon"), F.col("_user").alias("__resolved")
        )
        from pyspark.sql.functions import broadcast

        out = events.join(
            broadcast(mapping), events[user_col].cast("string") == F.col("__anon"), "left"
        )
        return out.withColumn(
            user_col, F.coalesce(F.col("__resolved"), F.col(user_col).cast("string"))
        ).drop("__anon", "__resolved")
