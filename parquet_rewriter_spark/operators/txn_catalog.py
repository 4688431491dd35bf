"""Cross-table atomic transactions: a catalog pointer over SortedTables.

A single SortedTable already commits atomically (create-exclusive
version claim + pointer rename, table.py:_commit_manifest). Real
pipelines mutate SEVERAL tables that must stay mutually consistent — a
fact table and its rollup, a corpus and its index. Each table's own
commit protocol can't provide that: between table A's flip and table
B's flip, a reader sees new-A with old-B.

The fix is one level of indirection — the same trick the per-table
manifest plays over parquet files, replayed over manifests: a tiny
catalog file pins (table → version) for every participating table, and
readers resolve tables THROUGH the catalog via each table's retained
version snapshots (time-travel reads). Writers mutate tables freely
(each table advances its own versions — those are invisible to catalog
readers), then flip the catalog pointer once, atomically, with the same
create-exclusive claim the tables use. A writer crash between table
merges leaves the pointer untouched: catalog readers keep seeing the
old, mutually-consistent set. Object-store equivalent: conditional put
of the catalog object.

Scale: the catalog is O(#tables) bytes; commits add one round trip. All
heavy work stays in the tables' own merge machinery (dirty-file-pruned,
zone-mapped — the reference's economy, untouched). Vacuum caveat: each
table must retain the versions the catalog pins (retain_versions >
catalog lag), or pinned reads fail like any vacuumed time travel.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from parquet_rewriter_spark.table import CommitConflictError, SortedTable

_POINTER = "_txncat.json"


class TransactionCatalog:
    """A (table name → pinned version) snapshot pointer, committed with
    the same atomic protocol as a SortedTable manifest."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------ state

    @classmethod
    def create(cls, spark: SparkSession, path: str,
               tables: dict[str, SortedTable]) -> "TransactionCatalog":
        """Pin every table at its CURRENT version as catalog v0."""
        os.makedirs(path, exist_ok=True)
        cat = cls(spark, path)
        pins = {
            name: {"path": t.path, "version": t.manifest().version}
            for name, t in tables.items()
        }
        cat._commit({"version": 0, "tables": pins})
        return cat

    def _state(self) -> dict:
        with open(os.path.join(self.path, _POINTER)) as fh:
            return json.load(fh)

    def snapshot(self) -> dict[str, int]:
        """(table name → pinned version) of the current catalog commit."""
        return {n: d["version"] for n, d in self._state()["tables"].items()}

    def version(self) -> int:
        return self._state()["version"]

    def table(self, name: str) -> SortedTable:
        return SortedTable(self.spark, self._state()["tables"][name]["path"])

    def read(self, name: str) -> DataFrame:
        """Read ``name`` at its PINNED version — never a mid-transaction
        state, whatever the underlying table's head is."""
        d = self._state()["tables"][name]
        return SortedTable(self.spark, d["path"]).read(version=d["version"])

    # ----------------------------------------------------------- commit

    def commit(self, new_versions: dict[str, int]) -> int:
        """Atomically advance the pins of ``new_versions``' tables (other
        tables keep their pins). The underlying table merges must
        already be durable — this only flips visibility. Raises
        ``CommitConflictError`` if another catalog writer won the
        version claim first."""
        state = self._state()
        for name, v in new_versions.items():
            if name not in state["tables"]:
                raise KeyError(f"table {name!r} not in catalog")
            state["tables"][name]["version"] = v
        state["version"] += 1
        self._commit(state)
        return state["version"]

    def _commit(self, state: dict) -> None:
        snap = os.path.join(self.path, f"_txncat.v{state['version']}.json")
        tmp = snap + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        pointer = os.path.join(self.path, _POINTER)
        try:
            os.link(tmp, snap)  # create-exclusive version claim
        except FileExistsError:
            os.unlink(tmp)
            # Roll the existing claim forward before conflicting: a
            # writer that crashed between link (claim) and replace
            # (pointer flip) would otherwise wedge the catalog forever —
            # every retry recomputes the same next version and loses the
            # claim race against the orphan. Finishing the claimant's
            # pointer flip is idempotent (same content) if it is merely
            # in-flight, and unwedges it if it is dead; either way the
            # caller re-reads an ADVANCED state and can retry.
            try:
                with open(snap) as fh:
                    claimed = json.load(fh)
                if claimed.get("version", -1) > self._state().get("version", -1):
                    heal = snap + f".heal-{uuid.uuid4().hex}"
                    with open(heal, "w") as fh:
                        json.dump(claimed, fh)
                    os.replace(heal, pointer)
            except OSError:
                pass
            raise CommitConflictError(
                f"catalog version {state['version']} already committed"
            )
        os.replace(tmp, pointer)
