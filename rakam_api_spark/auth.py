"""API-key service (reference M10): per-project write/master/read
keys gating ingest and schema changes.

Mirrors rakam-spi/src/main/java/org/rakam/analysis/ApiKeyService.java:9-84:
``createApiKeys`` issues the three key levels on project create,
``checkPermission`` resolves (project, key) → level (the JSON
deserializer resolves api_key → project WRITE-then-MASTER,
JsonEventDeserializer.java:274-291), ``revokeApiKeys`` invalidates.

Keys persist as one JSON doc under the warehouse metastore dir —
gateway-side state, deliberately outside the Spark plans.
"""

from __future__ import annotations

import hashlib
import json
import os
import secrets
import tempfile
import threading


class KeyLevel:
    READ = "read_key"
    WRITE = "write_key"
    MASTER = "master_key"
    ALL = (READ, WRITE, MASTER)


class ProjectNotFound(KeyError):
    pass


class ApiKeyService:
    def __init__(self, warehouse_dir: str):
        self._path = os.path.join(warehouse_dir, "_metastore", "_api_keys.json")
        self._lock = threading.Lock()
        self._keys: dict[str, dict[str, str]] = {}
        if os.path.exists(self._path):
            with open(self._path) as f:
                self._keys = json.load(f)

    def _persist(self) -> None:
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self._path))
        with os.fdopen(fd, "w") as f:
            json.dump(self._keys, f)
        os.replace(tmp, self._path)

    @staticmethod
    def _new_key(level: str) -> str:
        return f"{level[:1]}k_{secrets.token_hex(16)}"

    def create_api_keys(self, project: str) -> dict[str, str]:
        """Issue read/write/master keys for a project (replaces any
        prior set — the reference's create is also per-call fresh)."""
        with self._lock:
            keys = {level: self._new_key(level) for level in KeyLevel.ALL}
            self._keys[project] = {
                level: hashlib.sha256(k.encode()).hexdigest() for level, k in keys.items()
            }
            self._persist()
        return keys

    def check_permission(self, project: str, api_key: str) -> str | None:
        """(project, key) → level, or None.  Only hashes are stored."""
        entry = self._keys.get(project)
        if not entry:
            raise ProjectNotFound(project)
        h = hashlib.sha256(api_key.encode()).hexdigest()
        for level in (KeyLevel.MASTER, KeyLevel.WRITE, KeyLevel.READ):
            if entry.get(level) == h:
                return level
        return None

    def resolve_project(self, api_key: str) -> tuple[str, str] | None:
        """api_key → (project, level): the deserializer's WRITE-then-
        MASTER fallback resolution across all projects."""
        h = hashlib.sha256(api_key.encode()).hexdigest()
        for level in (KeyLevel.WRITE, KeyLevel.MASTER, KeyLevel.READ):
            for project, entry in self._keys.items():
                if entry.get(level) == h:
                    return project, level
        return None

    def revoke_api_keys(self, project: str) -> None:
        with self._lock:
            self._keys.pop(project, None)
            self._persist()
