"""Atomic multi-table transactions over manifest tables.

Single-table commits are atomic already; what a lakehouse cannot do
with per-table logs alone is flip SEVERAL tables together — the
classic fact+dimension or documents+embeddings update where a reader
must never see one side's new data with the other side's old. The
``Catalog`` closes that gap with a catalog-level commit log (the
Nessie/LakeFS idea, built from this repo's own primitives):

- A catalog version is a tiny manifest (no data files) whose meta
  pins ``{table name -> root, version}``. Readers resolve a table
  THROUGH the catalog (``catalog.read``) and get a cross-table
  consistent snapshot: every pin in one catalog version was published
  by one atomic catalog commit.

- ``MultiTableTransaction`` stages each table's write as a WAP
  snapshot (``wap_id = txn id``): durable, version-addressed,
  invisible to the tables' own main readers. ``commit()`` then
  publishes ONE catalog version re-pinning every written table at its
  staged snapshot — the atomic flip — then fast-forwards each staged
  snapshot onto its table's main (``publish_wap``, idempotent) and
  re-pins the catalog at the published versions so pins outlive the
  staged manifests' retention window. A crash anywhere after the flip
  loses nothing: catalog readers already see the new pins (staged
  snapshots are readable by version) and ``Catalog.heal()`` re-runs
  the idempotent publish + re-pin steps.

- Write-write conflicts are detected against the pin OBSERVED AT
  WRITE TIME: two transactions writing the same table serialize — the
  second's commit aborts with :class:`ConcurrentModificationError`
  (its staged snapshots simply expire), it never silently replaces
  the first's rows. Transactions touching DISJOINT tables merge.

Retention: the CURRENT catalog version's pins converge to their
tables' main heads, which vacuum always retains. Pins inside OLDER
catalog versions age out with each table's own retention policy
(``keep_versions``), exactly like any time travel — tag the pinned
versions to hold a historical catalog state durably.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from octopufs_spark.manifest import (
    ConcurrentModificationError,
    Manifest,
    ManifestTable,
    write_and_commit,
)


class _Raced(Exception):
    pass


class Catalog:
    """A catalog rooted at ``root`` (its own manifest log, no data
    files). Tables are registered by name with their root path."""

    def __init__(self, root: str):
        self.log = ManifestTable(root)

    # ---------- state ----------

    def snapshot(self, version: int | None = None) -> dict[str, dict]:
        """{name: {"root": ..., "version": ...}} at a catalog version.
        An EXPLICIT version that no longer exists propagates its
        missing-version error — only the empty-catalog default reads
        as {} (reporting a pruned historical version as 'no such
        table' would misdirect the caller)."""
        try:
            m = self.log.read_manifest(version)
        except FileNotFoundError:
            if version is not None:
                raise
            return {}
        return dict(m.meta.get("tables", {}))

    def current_version(self) -> int | None:
        return self.log.current_version()

    # ---------- commits ----------

    def _commit_pins(
        self, updates: dict[str, dict], op: str, expected: dict[str, int | None]
    ) -> int:
        """Publish a catalog version = live pins merged with
        ``updates``. ``expected`` holds, per updated table, the pin
        version the CALLER based its work on — if the live pin moved
        (a racing transaction re-pinned the same table), abort instead
        of silently replacing its rows. Disjoint racers merge via
        retry."""
        for _ in range(5):
            base = self.snapshot()
            for name in updates:
                cur = (base.get(name) or {}).get("version")
                if cur != expected[name]:
                    raise ConcurrentModificationError(
                        f"catalog {self.log.root}: table {name!r} was re-pinned "
                        f"concurrently (v{cur}, expected v{expected[name]}) — "
                        "rerun the transaction against the new snapshot"
                    )
            merged = {**base, **updates}

            def guard(parent: Manifest | None) -> list[str]:
                live = dict(parent.meta.get("tables", {})) if parent else {}
                if live != base:
                    raise _Raced()  # someone committed since we merged
                return []

            try:
                return self.log._commit_with_retry(guard, op, {"tables": merged})
            except _Raced:
                continue
        raise RuntimeError(f"lost the catalog commit race 5 times on {self.log.root}")

    def register(self, name: str, table: ManifestTable, version: int | None = None) -> int:
        """Pin an existing table into the catalog (its current main
        head by default)."""
        if version is None:
            version = table.current_version()
            if version is None:
                raise FileNotFoundError(f"no committed manifest under {table.root}")
        expected = {name: (self.snapshot().get(name) or {}).get("version")}
        return self._commit_pins(
            {name: {"root": table.root, "version": version}},
            "catalog-register",
            expected,
        )

    # ---------- reads ----------

    def table(self, name: str) -> tuple[ManifestTable, int]:
        pin = self.snapshot().get(name)
        if pin is None:
            raise KeyError(f"no table {name!r} in catalog {self.log.root}")
        return ManifestTable(pin["root"]), pin["version"]

    def read(
        self, spark: SparkSession, name: str, catalog_version: int | None = None
    ) -> DataFrame:
        """Read a table AT ITS PINNED VERSION — the cross-table
        consistent view. ``catalog_version`` time-travels the whole
        catalog (every table as of that catalog commit).

        The vacuum pre-check (one metadata call per data file) runs
        only for pins BEHIND the table's main head: the common case —
        a converged pin equal to the head — reads without it, since
        vacuum never removes the current snapshot's files."""
        pin = self.snapshot(catalog_version).get(name)
        if pin is None:
            raise KeyError(f"no table {name!r} in catalog {self.log.root}")
        t = ManifestTable(pin["root"])
        current = catalog_version is None and pin["version"] == t.current_version()
        return t.read(spark, version=pin["version"], check_vacuumed=not current)

    # ---------- catalog tags (durable multi-table pins) ----------

    def _member_tag(self, name: str, t_name: str) -> str:
        """Member-table tag name for catalog tag ``name``. Both the
        tag and the table name may contain the separator characters,
        and two catalogs can share a member table — so the name embeds
        a digest of (catalog root, tag, table), which cannot collide
        across boundaries the way naive concatenation can, plus a
        readable suffix."""
        import hashlib

        digest = hashlib.md5(
            f"{self.log.root}\x00{name}\x00{t_name}".encode()
        ).hexdigest()[:12]
        return f"catalog-{digest}-{name}"[:128]

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Durably pin a WHOLE catalog state: every member table is
        tagged at its pinned version (table-level tags are what each
        table's vacuum honors), then the catalog version itself is
        tagged — the commit point, created LAST so a crashed attempt
        leaves only member tags that a retry reuses. This closes the
        retention caveat on historical catalog reads: a
        ``read(..., catalog_version=tagged)`` stays materializable
        forever, not just within each table's keep window."""
        v = version if version is not None else self.log.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed catalog under {self.log.root}")
        snap = self.snapshot(v)
        for t_name, pin in snap.items():
            t = ManifestTable(pin["root"])
            member = self._member_tag(name, t_name)
            try:
                t.create_tag(member, version=pin["version"])
            except FileExistsError:
                if t.tag_version(member) != pin["version"]:
                    raise  # a different state under this exact identity
        self.log.create_tag(name, version=v)
        return v

    def delete_tag(self, name: str) -> None:
        """Release a catalog tag and its member-table pins."""
        v = self.log.tag_version(name)
        for t_name, pin in self.snapshot(v).items():
            try:
                ManifestTable(pin["root"]).delete_tag(self._member_tag(name, t_name))
            except FileNotFoundError:
                pass  # half-created or already released
        self.log.delete_tag(name)

    def read_tagged(self, spark: SparkSession, name: str, table: str) -> DataFrame:
        """Read a member table as of a catalog tag."""
        return self.read(spark, table, catalog_version=self.log.tag_version(name))

    # ---------- transactions ----------

    def transaction(self) -> "MultiTableTransaction":
        return MultiTableTransaction(self)

    def _repin_published(self, name: str, root: str, staged_v: int, published_v: int) -> None:
        """Advance a pin from its staged version to the published one.
        A pin that MOVED in the meantime makes this step moot, never a
        failure: the transaction already committed at its flip, so the
        mover is either a healer (advanced it to our published version)
        or a LATER transaction that legitimately pinned past us (its
        own publish re-applies on a head that includes our rows). The
        publish that preceded this call still converged the table's
        main either way."""
        try:
            self._commit_pins(
                {name: {"root": root, "version": published_v}},
                "catalog-txn-publish",
                {name: staged_v},
            )
        except ConcurrentModificationError:
            pass

    def _converge(self, name: str, pin: dict) -> dict:
        """Ensure a pin points at a PUBLISHED main snapshot: a pin
        still on a staged WAP snapshot (a transaction crashed between
        its flip and its publishes) is published — force-replace for a
        replace-type staging, since the flip already committed that
        content as the table's truth — and re-pinned. Returns the
        resulting pin. Idempotent and race-tolerant (concurrent
        convergers publish the same snapshot to the same outcome)."""
        t = ManifestTable(pin["root"])
        try:
            m = t.read_manifest(pin["version"])
        except FileNotFoundError:
            return pin  # vacuumed beyond repair: nothing to converge
        if "wap" not in m.meta:
            return pin
        pv = t.publish_wap(version=pin["version"], on_conflict="force-replace")
        self._repin_published(name, pin["root"], pin["version"], pv)
        return self.snapshot().get(name) or {**pin, "version": pv}

    def heal(self) -> dict[str, int]:
        """Complete the convergence steps of any committed transaction
        that crashed between its catalog flip and its table publishes:
        publish still-staged pinned snapshots and re-pin them at the
        published versions. Idempotent; returns {name: converged-to
        version} for work actually done."""
        out: dict[str, int] = {}
        for name, pin in self.snapshot().items():
            converged = self._converge(name, pin)
            if converged["version"] != pin["version"]:
                out[name] = converged["version"]
        return out


class MultiTableTransaction:
    """Stage writes to several tables, then land them as ONE atomic
    catalog flip. Usage::

        txn = catalog.transaction()
        txn.write("orders", orders_df, mode="append")
        txn.write("rollup", rollup_df)           # overwrite
        txn.commit()
    """

    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.txn_id = f"txn-{uuid.uuid4().hex[:12]}"
        self._staged: dict[str, dict] = {}  # name -> {"root", "version"}
        self._expected: dict[str, int | None] = {}  # pin seen at write time
        self._done = False

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        **write_kwargs,
    ) -> int:
        """Stage a write to a registered table (WAP snapshot, invisible
        to the table's main readers until the transaction commits)."""
        if self._done:
            raise RuntimeError("transaction already resolved")
        if name in self._staged:
            raise ValueError(f"table {name!r} already written in this transaction")
        pin = self.catalog.snapshot().get(name)
        if pin is None:
            raise KeyError(f"no table {name!r} in catalog {self.catalog.log.root}")
        # SERIALIZE behind any in-flight transaction first: if the pin
        # still names a staged snapshot (a prior transaction flipped
        # but hasn't converged — or crashed), converge it NOW. Staging
        # our write against main while the pin is staged would
        # otherwise let our commit pass the conflict check (expected ==
        # that staged pin) yet our snapshot would LACK the prior
        # transaction's rows — replacing its pin would lose them.
        pin = self.catalog._converge(name, pin)
        table = ManifestTable(pin["root"])
        sv = write_and_commit(df, table, mode=mode, wap_id=self.txn_id, **write_kwargs)
        self._staged[name] = {"root": pin["root"], "version": sv}
        self._expected[name] = pin["version"]
        return sv

    def commit(self) -> int:
        """The atomic flip: one catalog commit re-pins every written
        table at its staged snapshot (conflict-checked against the
        pins observed at write time), then each staged snapshot is
        published onto its table's main and the catalog re-pins the
        published versions (both steps idempotent — a crash is
        repaired by ``Catalog.heal``). Returns the flip's catalog
        version."""
        if self._done:
            raise RuntimeError("transaction already resolved")
        if not self._staged:
            raise ValueError("empty transaction")
        cv = self.catalog._commit_pins(self._staged, "catalog-txn", self._expected)
        self._done = True
        # phase 2: converge each table's main head + re-pin so the pin
        # outlives the staged manifest's retention window
        for name, pin in self._staged.items():
            table = ManifestTable(pin["root"])
            # force-replace: the flip committed this content as the
            # table's truth, so convergence is unconditional — a direct
            # overwrite-racing write loses to the transaction
            pv = table.publish_wap(version=pin["version"], on_conflict="force-replace")
            self.catalog._repin_published(name, pin["root"], pin["version"], pv)
        return cv

    def abort(self) -> None:
        """Mark every staged snapshot aborted (their files expire via
        vacuum); the catalog never saw them."""
        if self._done:
            raise RuntimeError("transaction already resolved")
        for _name, pin in self._staged.items():
            ManifestTable(pin["root"]).abort_wap(version=pin["version"])
        self._done = True
