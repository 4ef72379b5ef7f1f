"""Incremental materialized views over manifest tables.

A MaterializedView is a grouped aggregate of a source manifest table,
materialized as its OWN manifest table and maintained from the
source's commit log: ``refresh()`` reads only the data files ADDED
since the last refreshed source version, computes their partial
aggregates, and MERGES them into the view (count → sum of counts,
sum → sum of sums, min/max → min/max, avg → carried as sum+count) —
the classic algebraic-aggregate IVM that turns "recompute a 100 TB
rollup" into "aggregate one commit's files and merge".

Commits that change rows beyond pure addition (overwrite, compaction
rewrites observed as removals, merge-on-read delete vectors) cannot
be folded into an algebraic merge; ``refresh()`` detects them from
the log and falls back to ONE full recompute, then resumes
incremental maintenance. Maintenance commits that change nothing
visible (vector consolidation, WAP aborts, schema-evolution events)
fold as no-ops; staged WAP snapshots and branch commits are not on
main and are skipped outright.

The view's state — last refreshed source version, group-by columns,
aggregate spec — rides in the view table's commit meta (``mv`` key),
so a fresh MaterializedView handle on the same roots resumes exactly
where the last one stopped, and the publish-time build aborts with
:class:`ConcurrentModificationError` if a racing refresh advanced the
state first (no double-merge).

Known limitation (documented, matching the stream's fixed-schema
contract): the view spec names source columns; a rename of a
REFERENCED column on the source breaks the next scan — re-declare the
view under the new names (renames of unreferenced columns fold as
no-ops).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.manifest import (
    ConcurrentModificationError,
    Manifest,
    ManifestTable,
)

# ops that add rows only (the view can fold their added files);
# branch-fastforward carries a publish-time added list and is chosen
# ONLY when nothing on the branch line changed rows — the same
# contract the stream source folds it under
_APPEND_OPS = {
    "commit",
    "append",
    "seed",
    "stream-append",
    "wap-publish",
    "branch-fastforward",
    "clone",
}
# ops that change nothing a grouped aggregate can see
_NOOP_OPS = {"dv-consolidate", "wap-abort", "rename_column", "drop_column", "add_column"}


class MaterializedView:
    """``aggs`` maps output column -> (fn, source_col) with fn one of
    ``count`` (source_col ignored, pass "*"), ``sum``, ``min``,
    ``max``, ``avg``. Aggregates are maintained in their mergeable
    decomposition; ``read()`` presents the declared columns."""

    def __init__(
        self,
        source: ManifestTable,
        view_root: str,
        group_by: list[str],
        aggs: dict[str, tuple[str, str]],
        filter: str | None = None,
    ):
        for name, (fn, _col) in aggs.items():
            if fn not in ("count", "sum", "min", "max", "avg"):
                raise ValueError(f"unsupported aggregate {fn!r} for {name!r}")
        self.source = source
        self.view = ManifestTable(view_root)
        self.group_by = list(group_by)
        self.aggs = dict(aggs)
        # pre-aggregation row filter (SQL condition): filters commute
        # with the partial/merge decomposition, so incremental
        # maintenance applies it per added-file scan
        self.filter = filter

    # ---------- internal: mergeable decomposition ----------

    def _internal_cols(self) -> dict[str, tuple[str, str]]:
        """Physical view columns -> (merge_fn, source_col). avg(x)
        decomposes to __sum_<name> + __cnt_<name>; count decomposes to
        a summable count column."""
        out: dict[str, tuple[str, str]] = {}
        for name, (fn, col) in self.aggs.items():
            if fn == "count":
                out[f"__cnt_{name}"] = ("count", col)
            elif fn == "avg":
                out[f"__sum_{name}"] = ("sum", col)
                out[f"__cnt_{name}"] = ("countv", col)
            else:
                out[f"__{fn}_{name}"] = (fn, col)
        return out

    def _partial(self, df: DataFrame) -> DataFrame:
        if self.filter is not None:
            df = df.where(F.expr(self.filter))
        exprs = []
        for phys, (fn, col) in self._internal_cols().items():
            if fn == "count":
                exprs.append(F.count("*").alias(phys))
            elif fn == "countv":
                exprs.append(F.count(col).alias(phys))  # avg ignores NULLs
            else:
                exprs.append(getattr(F, fn)(col).alias(phys))
        return df.groupBy(*self.group_by).agg(*exprs)

    def _merge(self, parts: DataFrame) -> DataFrame:
        exprs = []
        for phys, (fn, _col) in self._internal_cols().items():
            merge_fn = "sum" if fn in ("count", "countv") else fn
            exprs.append(getattr(F, merge_fn)(phys).alias(phys))
        return parts.groupBy(*self.group_by).agg(*exprs)

    # ---------- state ----------

    def _state(self) -> tuple[int | None, Manifest | None]:
        """(last refreshed source version, view manifest) or (None, None)."""
        try:
            m = self.view.read_manifest()
        except FileNotFoundError:
            return None, None
        mv = m.meta.get("mv")
        if mv is None:
            raise ValueError(f"{self.view.root} exists but is not a materialized view")
        return mv["source_version"], m

    # ---------- refresh ----------

    def refresh(self, spark: SparkSession) -> int | None:
        """Advance the view to the source's current main head. Returns
        the view's committed version, or None when already current."""
        src_head = self.source.current_version()
        if src_head is None:
            return None
        last, view_m = self._state()
        if last == src_head:
            return None

        incremental = last is not None
        added: list[str] = []
        if incremental:
            for v in range(last + 1, src_head + 1):
                try:
                    m = self.source.read_manifest(v)
                except (FileNotFoundError, OSError):
                    incremental = False  # history pruned under the view
                    break
                if "wap" in m.meta or "branch" in m.meta:
                    continue  # not on main
                op_changes_rows = (
                    m.operation not in _APPEND_OPS and m.operation not in _NOOP_OPS
                )
                # a "pure-append op" that still removed files (partial
                # replace spelled as append) or landed delete vectors
                # is a row change too — compare against its parent set
                if not op_changes_rows and m.operation in _APPEND_OPS:
                    if m.added is None:
                        incremental = False
                        break
                    prev = self._vector_paths_of(m.parent)
                    n_parent = self._file_count_of(m.parent)
                    if prev is None or n_parent is None:
                        incremental = False  # parent pruned under the walk
                        break
                    if self._vector_paths(m) != prev:
                        incremental = False  # new/changed delete vectors
                        break
                    if len(m.files) != n_parent + len(m.added):
                        incremental = False  # files were also removed
                        break
                    added.extend(m.added)
                elif op_changes_rows:
                    incremental = False
                    break
        if incremental and not added:
            # only no-op maintenance commits: just advance the pointer
            return self._publish(spark, None, src_head, view_m, mode="noop")
        if incremental:
            head_m = self.source.read_manifest(src_head)
            src_df = self.source._scan_files(
                spark,
                added,
                annotate_positions=self.source._has_positional_dvs(head_m),
                evolution=head_m.meta.get("schema_evolution"),
            )
            # ACTIVE delete vectors apply snapshot-wide — including to
            # newly added files (a re-inserted deleted key stays hidden
            # until a compaction, exactly as the read path documents).
            # Folding the raw added rows would make the view count rows
            # the source read hides; apply the head's vectors to the
            # delta scan so the fold sees what a reader sees.
            # (Positional vectors name pre-existing files, so they
            # anti-join to nothing here — harmless.)
            from octopufs_spark.manifest import _strip_dropped

            src_df = _strip_dropped(
                self.source._apply_delete_vectors(spark, src_df, head_m)
            )
            delta = self._partial(src_df)
            return self._publish(spark, delta, src_head, view_m, mode="incremental")
        full = self._partial(self.source.read(spark, version=src_head))
        # view_m rides along so the publish still CAS-checks the state
        # pointer; the full recompute just ignores the old content
        return self._publish(spark, full, src_head, view_m, mode="full")

    def _vector_paths(self, m: Manifest) -> tuple:
        return tuple(sorted(dv["path"] for dv in m.meta.get("delete_vectors", [])))

    def _vector_paths_of(self, version: int | None):
        if version is None:
            return ()
        try:
            return self._vector_paths(self.source.read_manifest(version))
        except (FileNotFoundError, OSError):
            return None

    def _file_count_of(self, version: int | None) -> int | None:
        if version is None:
            return 0
        try:
            return len(self.source.read_manifest(version).files)
        except (FileNotFoundError, OSError):
            return None

    def _publish(
        self,
        spark: SparkSession,
        delta: DataFrame | None,
        src_head: int,
        view_m: Manifest | None,
        mode: str,
    ) -> int:
        """Stage the merged view content and commit it with the
        advanced source pointer; abort if a racing refresh advanced the
        view first (its merge already covers our delta)."""
        expected = (view_m.meta["mv"]["source_version"] if view_m else None)
        if delta is None:
            staged_files = list(view_m.files) if view_m else []
        else:
            merged = delta
            if view_m is not None and mode == "incremental":
                current = self.view.read(spark, version=view_m.version)
                merged = self._merge(current.unionByName(delta))
            staged = f"mv-{uuid.uuid4().hex[:12]}"
            merged.write.mode("errorifexists").parquet(f"{self.view.root}/{staged}")
            staged_files = self.view._data_files_under(staged)

        meta = {
            "mv": {
                "source": self.source.root,
                "source_version": src_head,
                "group_by": self.group_by,
                "aggs": {k: list(v) for k, v in self.aggs.items()},
                "mode": mode,
            }
        }

        def build(parent: Manifest | None) -> list[str]:
            cur = (parent.meta.get("mv") or {}).get("source_version") if parent else None
            if cur != expected:
                raise ConcurrentModificationError(
                    f"materialized view {self.view.root} was refreshed "
                    f"concurrently (source_version {cur}, expected {expected}) "
                    "— rerun refresh()"
                )
            return sorted(staged_files)

        return self.view._commit_with_retry(build, "mv-refresh", meta)

    # ---------- read ----------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The view with its DECLARED columns (avg recomposed)."""
        df = self.view.read(spark, version=version)
        cols = [F.col(c) for c in self.group_by]
        for name, (fn, _col) in self.aggs.items():
            if fn == "count":
                cols.append(F.col(f"__cnt_{name}").alias(name))
            elif fn == "avg":
                cols.append(
                    (F.col(f"__sum_{name}") / F.col(f"__cnt_{name}")).alias(name)
                )
            else:
                cols.append(F.col(f"__{fn}_{name}").alias(name))
        return df.select(*cols)

    def last_refreshed_source_version(self) -> int | None:
        return self._state()[0]
