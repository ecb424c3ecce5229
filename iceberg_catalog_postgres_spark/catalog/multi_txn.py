"""Multi-table ATOMIC transactions (r13 continuation).

The reference's CAS protocol (mod.rs:296-347) swaps ONE pointer; real
pipelines routinely need two or more tables to move together — archive
rows out of a hot table into a cold one, keep a fact table and its summary
in lock-step, publish a batch across sharded tables. Iceberg's REST
catalog spec added exactly this (multi-table commits); on a plain SQL
catalog the same guarantee falls out of the database's own transaction:
every ``UPDATE ... WHERE metadata_location = <expected>`` CAS runs in one
``BEGIN ... COMMIT`` block and the batch lands iff every rowcount is 1
(``SqlBackend.execute_atomic_cas``).

Protocol (two-phase, like any Iceberg commit — data first, pointer last):

1. **Prepare** — every staged per-table ``Transaction`` builds and WRITES
   its new metadata document (manifests, snapshot, lineage ids) exactly as
   a solo commit would, but hands the pointer swap back to this
   coordinator (``Transaction.commit(pointer_swap=...)``) instead of
   CASing it.
2. **Swap** — one ``catalog.update_tables`` call: all pointers move in one
   database transaction, or none do. A reader can never observe table A's
   new snapshot next to table B's old one.
3. **Retry** — on conflict (any pointer stale), every transaction rebases
   onto the freshly-loaded winner state and re-prepares; appends commute,
   while overwrite/delete/rowdelta transactions validate their base
   file set first (the same validateNoNewFiles rule solo commits apply)
   and refuse loudly if a concurrent writer changed it.

Failed prepares leave only uniquely-named orphan metadata/manifest files —
the identical debris a lost solo CAS race leaves — and orphan GC collects
them.

Scale: the prepare phase is per-table metadata work (unchanged); the swap
adds ONE short database transaction over N single-row updates. Nothing
data-plane is serialized across tables — only the pointer flips are.
"""

from __future__ import annotations

from iceberg_catalog_postgres_spark.catalog.catalog import (
    CommitConflictError,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.table import Table, Transaction

__all__ = ["MultiTableTransaction"]


class MultiTableTransaction:
    """Stage transactions on several tables; commit all pointer swaps
    atomically. Usage::

        mt = MultiTableTransaction(catalog)
        mt.transaction(hot).overwrite_dataframe(kept)
        mt.transaction(cold).append_dataframe(archived)
        hot2, cold2 = mt.commit()
    """

    def __init__(self, catalog, max_retries: int = 5):
        self.catalog = catalog
        self.max_retries = max_retries
        self._txns: list[Transaction] = []

    def transaction(self, table: Table, branch: str = "main") -> Transaction:
        """A staged ``Transaction`` on ``table`` — the same object
        ``new_transaction`` returns, so every staging method (append /
        overwrite / row delta / fence / set_properties / sort_by) works
        unchanged. One table may appear once per multi-transaction."""
        if table.catalog is not self.catalog:
            raise ValueError(
                f"{table.identifier} belongs to a different catalog"
            )
        if any(
            str(t.table.identifier) == str(table.identifier)
            for t in self._txns
        ):
            raise ValueError(
                f"table {table.identifier} is already staged in this "
                f"multi-table transaction"
            )
        txn = Transaction(table, branch=branch)
        self._txns.append(txn)
        return txn

    def commit(self) -> list[Table]:
        """Prepare every staged transaction, swap all pointers in ONE
        database transaction, and return the committed tables in staging
        order. All-or-nothing: a conflict on ANY table commits NOTHING
        (then rebases and retries, bounded)."""
        if not self._txns:
            return []
        for attempt in range(self.max_retries + 1):
            swaps: list[tuple[TableIdentifier, str, str]] = []
            prepared: list[tuple[int, TableIdentifier]] = []
            results: list[Table | None] = [None] * len(self._txns)

            for i, txn in enumerate(self._txns):
                def record(ident, new_loc, prev_loc, _i=i):
                    swaps.append((ident, new_loc, prev_loc))
                    prepared.append((_i, ident))
                    return None

                out = txn.commit(pointer_swap=record)
                if out is not None:
                    # empty transaction or an already-landed fence epoch:
                    # nothing to swap for this table
                    results[i] = out
            if not swaps:
                return results
            try:
                committed = self.catalog.update_tables(swaps)
            except CommitConflictError:
                if attempt == self.max_retries:
                    raise
                self._rebase()
                continue
            for (i, _ident), table in zip(prepared, committed):
                results[i] = table
            return results
        raise AssertionError("unreachable")

    def _rebase(self) -> None:
        """Reload every staged table at the winner's state. Appends (and
        MOR deletes) re-apply cleanly; overwrite/rowdelta transactions
        whose base FILE SET changed refuse — their staged files were
        computed from state that no longer exists (validateNoNewFiles,
        the same rule ``Transaction.commit`` applies to solo retries)."""
        for txn in self._txns:
            fresh = self.catalog.load_table(txn.table.identifier)
            if txn._operation in ("overwrite", "rowdelta"):
                winner_files = frozenset(fresh.metadata.current_data_files())
                if winner_files != txn._base_data_files:
                    raise CommitConflictError(
                        f"{txn.table.identifier}: concurrent commit changed "
                        "the data-file set during a multi-table "
                        f"{txn._operation}; recompute from the current "
                        "snapshot and retry"
                    )
            txn.table = fresh
