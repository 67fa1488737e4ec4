"""Deployment-scoped storage layout — multi-deployment isolation.

The reference namespaces every storage surface by an optional deployment
id so several deployments can share one backing store:

- ClickHouse tables get a ``<deploymentID>_`` prefix
  (chlogstore.go:34-44: ``prefix + "events"``, ``prefix + "attempts"``).
- Redis tenant-store keys get a ``<deploymentID>:`` prefix
  (redistenantstore.go:98-122: ``deploymentPrefix() + "tenant:..."``).

Spark-first equivalent: a deployment is a *path layout* under one
warehouse root.  Each table a component reads or writes — events,
attempts, tenants, destinations — and each streaming checkpoint lives
under a deployment-prefixed directory, so two deployments sharing a
warehouse can never touch each other's files, partitions, or streaming
state.  All existing APIs take caller-supplied paths, so the layout is
purely additive: resolve paths here, pass them anywhere.

At 100 TB this matters operationally: retention drops, compaction
rewrites, and checkpoint recovery all operate on whole directories, and
the prefix guarantees those directory operations are deployment-local.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_-]*$")

# Table names the layout serves; mirrors the surfaces the reference
# prefixes (chlogstore tables + redistenantstore key families).
_TABLES = ("events", "attempts", "tenants", "destinations")


class InvalidDeploymentID(ValueError):
    """Deployment id would escape the warehouse path or collide."""


@dataclass(frozen=True)
class DeploymentLayout:
    """Path layout for one deployment inside a shared warehouse.

    ``deployment_id=""`` is the single-tenant default: bare table names,
    exactly like the reference's empty-prefix branch (chlogstore.go:35-38).
    """

    warehouse: str
    deployment_id: str = ""

    def __post_init__(self) -> None:
        if self.deployment_id and not _ID_RE.match(self.deployment_id):
            raise InvalidDeploymentID(
                f"deployment id {self.deployment_id!r} must match"
                " [A-Za-z0-9][A-Za-z0-9_-]* (it becomes a path component)"
            )

    @property
    def prefix(self) -> str:
        """``<id>_`` or ``""`` — chlogstore.go:34-44 verbatim semantics."""
        return f"{self.deployment_id}_" if self.deployment_id else ""

    def table_path(self, table: str) -> str:
        if table not in _TABLES:
            raise ValueError(f"unknown table {table!r}; expected one of {_TABLES}")
        return f"{self.warehouse.rstrip('/')}/{self.prefix}{table}"

    @property
    def events_path(self) -> str:
        return self.table_path("events")

    @property
    def attempts_path(self) -> str:
        return self.table_path("attempts")

    @property
    def tenants_path(self) -> str:
        return self.table_path("tenants")

    @property
    def destinations_path(self) -> str:
        return self.table_path("destinations")

    def checkpoint_path(self, stream: str) -> str:
        """Checkpoint dir for a named stream, deployment-scoped.

        Lives under ``_checkpoints/`` (underscore-prefixed: invisible to
        Spark partition discovery on the warehouse root, same convention
        the retention job relies on for its staging dirs).  The deployment
        id is its own directory component — NOT a ``_``-joined prefix —
        because ``_`` is legal in both ids and stream names, so a joined
        prefix would let ("a", "x_y") and ("a_x", "y") collide on one
        checkpoint dir and corrupt each other's streaming state.
        """
        if not re.match(r"^[A-Za-z0-9][A-Za-z0-9_-]*$", stream):
            raise ValueError(f"invalid stream name {stream!r}")
        scope = self.deployment_id or "_default"
        return f"{self.warehouse.rstrip('/')}/_checkpoints/{scope}/{stream}"
