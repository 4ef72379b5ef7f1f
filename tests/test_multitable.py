"""Atomic multi-table transactions: catalog-level pin flips over
WAP-staged per-table snapshots, crash healing, write-write conflicts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octopufs_spark.manifest import (
    ConcurrentModificationError,
    ManifestTable,
    write_and_commit,
)
from octopufs_spark.multitable import Catalog


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def _ids(df):
    return {r.id for r in df.collect()}


@pytest.fixture()
def setup(spark, tmp_path):
    cat = Catalog(str(tmp_path / "catalog"))
    a = ManifestTable(str(tmp_path / "a"))
    b = ManifestTable(str(tmp_path / "b"))
    write_and_commit(_df(spark, 0, 10), a)
    write_and_commit(_df(spark, 100, 110), b)
    cat.register("a", a)
    cat.register("b", b)
    return cat, a, b


def test_transaction_flips_both_tables_atomically(spark, setup):
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    txn.write("b", _df(spark, 110, 115), mode="append")
    # nothing visible anywhere before commit
    assert _ids(cat.read(spark, "a")) == set(range(10))
    assert _ids(cat.read(spark, "b")) == set(range(100, 110))
    assert _ids(a.read(spark)) == set(range(10))
    cv = txn.commit()
    assert _ids(cat.read(spark, "a")) == set(range(15))
    assert _ids(cat.read(spark, "b")) == set(range(100, 115))
    # direct readers converged too (phase 2 published onto main)
    assert _ids(a.read(spark)) == set(range(15))
    assert _ids(b.read(spark)) == set(range(100, 115))
    # catalog time travel: the pre-txn catalog version still reads old
    assert _ids(cat.read(spark, "a", catalog_version=cv - 1)) == set(range(10))


def test_crash_between_flip_and_publish_heals(spark, setup):
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    txn.write("b", _df(spark, 110, 115), mode="append")

    orig = ManifestTable.publish_wap
    ManifestTable.publish_wap = lambda self, **kw: (_ for _ in ()).throw(
        OSError("crash before publish")
    )
    try:
        with pytest.raises(OSError, match="crash"):
            txn.commit()
    finally:
        ManifestTable.publish_wap = orig
    # the FLIP landed: the pins name the staged snapshots (checked at
    # the manifest level — cat.read would itself auto-heal now)...
    for name, t in (("a", a), ("b", b)):
        _t, v = cat.table(name)
        assert "wap" in t.read_manifest(v).meta
    # ...while the tables' own mains have not converged yet
    assert _ids(a.read(spark)) == set(range(10))
    healed = cat.heal()
    assert set(healed) == {"a", "b"}
    assert _ids(a.read(spark)) == set(range(15))
    assert _ids(b.read(spark)) == set(range(100, 115))
    # pins now point at PUBLISHED (main) versions
    for name in ("a", "b"):
        t, v = cat.table(name)
        assert "wap" not in t.read_manifest(v).meta
    assert cat.heal() == {}  # idempotent


def test_second_txn_converges_crashed_predecessor(spark, setup):
    """Review finding: T1 flips and crashes before publishing; T2 then
    writes the same table. T2's write must CONVERGE T1's staged pin
    first — staging against main and replacing the pin would silently
    lose T1's committed (catalog-visible) rows."""
    cat, a, b = setup
    t1 = cat.transaction()
    t1.write("a", _df(spark, 10, 15), mode="append")
    orig = ManifestTable.publish_wap
    ManifestTable.publish_wap = lambda self, **kw: (_ for _ in ()).throw(
        OSError("crash before publish")
    )
    try:
        with pytest.raises(OSError):
            t1.commit()
    finally:
        ManifestTable.publish_wap = orig
    # T1 committed (flip landed): catalog already shows its rows
    assert _ids(cat.read(spark, "a")) == set(range(15))
    t2 = cat.transaction()
    t2.write("a", _df(spark, 20, 25), mode="append")
    t2.commit()
    # both transactions' rows survive, everywhere
    want = set(range(15)) | set(range(20, 25))
    assert _ids(cat.read(spark, "a")) == want
    assert _ids(a.read(spark)) == want


def test_overwrite_txn_converges_past_racing_direct_append(spark, setup):
    """Review finding: an overwrite-mode transaction racing a direct
    append previously dead-ended AFTER its flip (publish conflicted
    forever and the pin eventually expired). The flip owns the table's
    truth: convergence force-replaces, the direct racer loses — what a
    blind overwrite means."""
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 500, 505))  # overwrite
    write_and_commit(_df(spark, 900, 905), a, mode="append")  # direct racer
    txn.commit()  # must not raise
    assert _ids(cat.read(spark, "a")) == set(range(500, 505))
    assert _ids(a.read(spark)) == set(range(500, 505))
    # pin converged to a published main version
    t, v = cat.table("a")
    assert "wap" not in t.read_manifest(v).meta


def test_heal_converges_replace_staged_pin(spark, setup):
    """heal() completes a crashed overwrite transaction even when the
    table's main moved under the staged snapshot."""
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 500, 505))  # overwrite
    orig = ManifestTable.publish_wap
    ManifestTable.publish_wap = lambda self, **kw: (_ for _ in ()).throw(
        OSError("crash")
    )
    try:
        with pytest.raises(OSError):
            txn.commit()
    finally:
        ManifestTable.publish_wap = orig
    write_and_commit(_df(spark, 900, 905), a, mode="append")  # main moves
    healed = cat.heal()
    assert "a" in healed
    assert _ids(cat.read(spark, "a")) == set(range(500, 505))
    assert _ids(a.read(spark)) == set(range(500, 505))


def test_catalog_snapshot_explicit_missing_version_raises(spark, setup):
    cat, a, b = setup
    with pytest.raises(FileNotFoundError):
        cat.snapshot(version=999)


def test_member_tag_names_unambiguous(spark, setup, tmp_path):
    """Review finding: naive 'catalog-{tag}-{table}' collides when
    names contain the separator; the digest-based scheme must not."""
    cat, a, b = setup
    cat.create_tag("v1-prod")
    cat.create_tag("v1")  # would collide under naive concatenation
    assert {cat._member_tag("v1-prod", n) for n in ("a", "b")}.isdisjoint(
        {cat._member_tag("v1", n) for n in ("a", "b")}
    )
    cat.delete_tag("v1-prod")
    # 'v1' member pins survive the other tag's release
    assert _ids(cat.read_tagged(spark, "v1", "a")) == set(range(10))


def test_same_table_transactions_serialize(spark, setup):
    cat, a, b = setup
    t1 = cat.transaction()
    t2 = cat.transaction()
    t1.write("a", _df(spark, 20, 25), mode="append")
    t2.write("a", _df(spark, 30, 35), mode="append")
    t1.commit()
    with pytest.raises(ConcurrentModificationError, match="re-pinned"):
        t2.commit()
    # the loser's rows never appear anywhere
    assert _ids(cat.read(spark, "a")) == set(range(10)) | set(range(20, 25))
    assert _ids(a.read(spark)) == set(range(10)) | set(range(20, 25))


def test_disjoint_transactions_merge(spark, setup):
    cat, a, b = setup
    t1 = cat.transaction()
    t2 = cat.transaction()
    t1.write("a", _df(spark, 20, 25), mode="append")
    t2.write("b", _df(spark, 120, 125), mode="append")
    t1.commit()
    t2.commit()
    assert _ids(cat.read(spark, "a")) == set(range(10)) | set(range(20, 25))
    assert _ids(cat.read(spark, "b")) == set(range(100, 110)) | set(range(120, 125))


def test_abort_leaves_no_trace(spark, setup):
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 50, 55), mode="append")
    txn.abort()
    assert _ids(cat.read(spark, "a")) == set(range(10))
    assert _ids(a.read(spark)) == set(range(10))
    with pytest.raises(RuntimeError, match="already resolved"):
        txn.commit()


def test_txn_overwrite_mode(spark, setup):
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 500, 505))  # overwrite
    txn.commit()
    assert _ids(cat.read(spark, "a")) == set(range(500, 505))
    assert _ids(a.read(spark)) == set(range(500, 505))


def test_txn_basics_and_errors(spark, setup, tmp_path):
    cat, a, b = setup
    with pytest.raises(KeyError):
        cat.read(spark, "nope")
    txn = cat.transaction()
    with pytest.raises(ValueError, match="empty"):
        txn.commit()
    txn.write("a", _df(spark, 10, 12), mode="append")
    with pytest.raises(ValueError, match="already written"):
        txn.write("a", _df(spark, 12, 14), mode="append")
    txn.commit()
    with pytest.raises(RuntimeError, match="already resolved"):
        txn.write("b", _df(spark, 0, 1))


def test_direct_pure_appends_coexist_with_txn(spark, setup):
    """A direct (non-catalog) append landing mid-transaction is a
    pure append: the staged publish re-applies on the advanced head
    and nothing is lost on either path."""
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    write_and_commit(_df(spark, 900, 905), a, mode="append")  # direct racer
    txn.commit()
    assert _ids(a.read(spark)) == set(range(15)) | set(range(900, 905))
    # the catalog pin (published version) includes the racer too
    assert _ids(cat.read(spark, "a")) == set(range(15)) | set(range(900, 905))


def test_catalog_tag_pins_whole_state_through_vacuum(spark, setup):
    """A catalog tag pins EVERY member table's version through each
    table's own vacuum, so a historical multi-table state stays
    readable after rewrites + aggressive retention."""
    from octopufs_spark.manifest import compact_and_commit

    cat, a, b = setup
    cv = cat.create_tag("release-1")
    # evolve and fully rewrite both tables, then vacuum hard
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 20), mode="append")
    txn.write("b", _df(spark, 110, 120), mode="append")
    txn.commit()
    compact_and_commit(spark, a)
    compact_and_commit(spark, b)
    cat.register("a", a)  # re-pin at the compacted heads
    cat.register("b", b)
    for t in (a, b):
        assert t.vacuum(keep_versions=1, retention_seconds=0)
    # the tagged catalog state still reads in full
    assert _ids(cat.read_tagged(spark, "release-1", "a")) == set(range(10))
    assert _ids(cat.read_tagged(spark, "release-1", "b")) == set(range(100, 110))
    assert _ids(cat.read(spark, "a", catalog_version=cv)) == set(range(10))
    # live view unaffected
    assert _ids(cat.read(spark, "a")) == set(range(20))
    # releasing the tag frees the pins on the next vacuum
    cat.delete_tag("release-1")
    for t in (a, b):
        t.vacuum(keep_versions=1, retention_seconds=0)
    with pytest.raises(Exception):
        cat.read_tagged(spark, "release-1", "a")


def test_multitable_txn_fuzz(spark, setup):
    """Transactions under contention: concurrent same-table and
    disjoint transactions, direct pure appends, a healer, and
    per-table vacuums. Serializable outcome: every table holds its
    seed + its direct appends + exactly the batches of transactions
    that reported success — losers leave no rows; the catalog pin for
    each table reads the same content as the table's main."""
    import threading

    cat, a, b = setup
    lock = threading.Lock()
    committed: list[tuple[str, range]] = []  # (table, rows) of WINNING txns
    direct: list[tuple[str, range]] = []
    errors: list[BaseException] = []
    stop = threading.Event()
    tables = {"a": a, "b": b}

    def txn_worker(w: int):
        # each worker runs 2 transactions touching one or both tables
        for r in range(2):
            names = ["a", "b"] if (w + r) % 2 == 0 else [["a"], ["b"]][w % 2]
            lo = 10000 + 1000 * w + 100 * r
            txn = cat.transaction()
            batches = []
            try:
                for i, n in enumerate(names):
                    rg = range(lo + 10 * i, lo + 10 * i + 5)
                    txn.write(n, _df(spark, rg.start, rg.stop), mode="append")
                    batches.append((n, rg))
                txn.commit()
                with lock:
                    committed.extend(batches)
            except ConcurrentModificationError:
                pass  # serialized loser: rows must never appear
            except BaseException as e:  # noqa: BLE001
                with lock:
                    errors.append(e)
                return

    def direct_appender(name: str, lo: int):
        try:
            write_and_commit(_df(spark, lo, lo + 5), tables[name], mode="append")
            with lock:
                direct.append((name, range(lo, lo + 5)))
        except BaseException as e:  # noqa: BLE001
            with lock:
                errors.append(e)

    def healer():
        while not stop.is_set():
            try:
                cat.heal()
            except ConcurrentModificationError:
                pass
            except BaseException as e:  # noqa: BLE001
                with lock:
                    errors.append(e)
                return

    def vacuumer():
        while not stop.is_set():
            try:
                a.vacuum()
                b.vacuum()
            except BaseException as e:  # noqa: BLE001
                with lock:
                    errors.append(e)
                return

    def reader():
        # exercises r9 reader auto-heal under contention: a read that
        # catches a pin mid-convergence must either converge it itself
        # (idempotent with the healer/committers via the publish-marker
        # walk) or fall back to the staged snapshot — never error, and
        # every read returns a consistent committed state
        while not stop.is_set():
            try:
                for n in ("a", "b"):
                    cat.read(spark, n).count()
            except BaseException as e:  # noqa: BLE001
                with lock:
                    errors.append(e)
                return

    threads = [threading.Thread(target=txn_worker, args=(w,)) for w in range(3)]
    threads += [
        threading.Thread(target=direct_appender, args=(n, 90000 + 100 * i))
        for i, n in enumerate(("a", "b"))
    ]
    ht, vt, rt = (
        threading.Thread(target=healer),
        threading.Thread(target=vacuumer),
        threading.Thread(target=reader),
    )
    ht.start()
    vt.start()
    rt.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    ht.join()
    vt.join()
    rt.join()
    assert not errors, f"background thread crashed: {errors[0]!r}"

    cat.heal()  # settle any in-flight convergence
    expect = {"a": set(range(10)), "b": set(range(100, 110))}
    txn_rows = {"a": set(range(10)), "b": set(range(100, 110))}
    for name, rg in committed:
        expect[name] |= set(rg)
        txn_rows[name] |= set(rg)
    for name, rg in direct:
        expect[name] |= set(rg)
    for name, table in tables.items():
        got_main = _ids(table.read(spark))
        got_cat = _ids(cat.read(spark, name))
        assert got_main == expect[name], f"table {name} main diverged"
        # The catalog view holds every WINNING transaction's rows (each
        # winner re-pins at/after its publish, and later publishes
        # re-apply on heads containing earlier winners) and nothing
        # outside main. It may legitimately LAG direct appends that
        # landed after the last pin — direct writers bypass the
        # catalog until someone re-pins.
        assert txn_rows[name] <= got_cat <= got_main, f"table {name} catalog view diverged"
        rows = table.read(spark).collect()
        assert len(rows) == len({r.id for r in rows}), f"table {name} duplicated rows"


def test_catalog_commit_race_merges_disjoint(spark, setup):
    """Two catalog commits racing at the log level: the loser re-reads
    and merges, neither pin is lost."""
    cat, a, b = setup
    cat2 = Catalog(cat.log.root)
    orig = type(cat.log)._commit_with_retry
    fired = {"done": False}

    def racing(self, build, operation, meta, *args, **kw):
        if operation == "catalog-register" and not fired["done"]:
            fired["done"] = True
            write_and_commit(_df(spark, 120, 125), b, mode="append")
            cat2.register("b", b, version=b.current_version())
        return orig(self, build, operation, meta, *args, **kw)

    type(cat.log)._commit_with_retry = racing
    try:
        write_and_commit(_df(spark, 20, 25), a, mode="append")
        cat.register("a", a, version=a.current_version())
    finally:
        type(cat.log)._commit_with_retry = orig
    assert fired["done"]
    assert _ids(cat.read(spark, "a")) == set(range(10)) | set(range(20, 25))
    assert _ids(cat.read(spark, "b")) == set(range(100, 110)) | set(range(120, 125))


def _crash_publishes(txn):
    """Run txn.commit() with publish_wap crashing — the flip lands,
    phase 2 never does."""
    orig = ManifestTable.publish_wap
    ManifestTable.publish_wap = lambda self, **kw: (_ for _ in ()).throw(
        OSError("crash before publish")
    )
    try:
        with pytest.raises(OSError, match="crash"):
            txn.commit()
    finally:
        ManifestTable.publish_wap = orig


def test_crashed_txn_survives_aggressive_vacuum(spark, setup):
    """The durability gap: a txn that crashed between its catalog flip
    and phase-2 publish used to leave its staged snapshot protected
    only by retention_seconds — an aggressive vacuum then deleted
    committed, catalog-VISIBLE data. commit() now tags each staged
    version before the flip (tags are unconditional vacuum pins), so
    the un-healed state survives any vacuum; heal() converges and
    releases the tag."""
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    _crash_publishes(txn)
    # a direct append pushes the staged snapshot out of keep_versions,
    # then the most aggressive vacuum possible runs
    write_and_commit(_df(spark, 50, 55), a, mode="append")
    a.vacuum(keep_versions=1, retention_seconds=0)
    # the staged snapshot survived — durably pinned by the txn tag,
    # not the clock (read_manifest would raise if vacuum took it)
    _t, v = cat.table("a")
    assert "wap" in a.read_manifest(v).meta
    # the first catalog reader sees the txn's rows AND converges the
    # pin (publish onto the advanced main + re-pin)
    assert _ids(cat.read(spark, "a")) == set(range(15)) | set(range(50, 55))
    assert _ids(a.read(spark)) == set(range(15)) | set(range(50, 55))
    assert cat.heal() == {}  # nothing left for the operator pass
    # convergence released the durable pin
    assert not [t for t in a.tags() if t.startswith("txn-")]


def test_wedged_append_staging_heals_by_content(spark, setup):
    """A pure-append staging whose table evolved its schema AFTER
    staging cannot publish file-wise (the staged files were written
    under the old contract) — previously this wedged convergence
    forever. heal(spark) now re-applies the staged commit's ROWS onto
    the evolved head; heal() without spark raises the dedicated error
    and the pin stays durable."""
    from octopufs_spark.multitable import WedgedConvergenceError

    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    _crash_publishes(txn)
    a.add_column("flag", "integer", default=7)
    with pytest.raises(WedgedConvergenceError, match="heal"):
        cat.heal()
    # still durable after the failed heal: pin intact, snapshot staged
    # (cat.read with spark would itself heal-by-content now, so the
    # durability check stays at the manifest level)
    _t, v = cat.table("a")
    assert "wap" in a.read_manifest(v).meta
    healed = cat.heal(spark)
    assert "a" in healed
    got = a.read(spark)
    assert _ids(got) == set(range(15))
    assert got.where("flag = 7").count() == 15  # evolved default everywhere
    assert _ids(cat.read(spark, "a")) == set(range(15))
    assert not [t for t in a.tags() if t.startswith("txn-")]
    # idempotent: a second heal is a no-op
    assert cat.heal(spark) == {}


def test_reapplied_content_conforms_to_new_hidden_layout(spark, setup, tmp_path):
    """Content re-apply must write files in the HEAD's hidden layout:
    a group missing the hidden column would break the by-name union
    of every subsequent read. Staged under bucket(4), the head moves
    to bucket(8) — the re-applied rows land as bucket(8) files."""
    cat, a, b = setup
    c = ManifestTable(str(tmp_path / "c"))
    write_and_commit(_df(spark, 0, 10), c, hidden_partition={"hb": ("bucket", "id", 4)})
    cat.register("c", c)
    txn = cat.transaction()
    txn.write(
        "c", _df(spark, 10, 15), mode="append", hidden_partition={"hb": ("bucket", "id", 4)}
    )
    _crash_publishes(txn)
    # the hidden spec evolves via a direct overwrite after staging —
    # file-wise publish of the bucket(4) staging is now impossible
    write_and_commit(_df(spark, 60, 70), c, hidden_partition={"hb": ("bucket", "id", 8)})
    healed = cat.heal(spark)
    assert "c" in healed
    # overwrite content + the transaction's appended rows, readable
    assert _ids(c.read(spark)) == set(range(10, 15)) | set(range(60, 70))
    # every live file carries the hidden dir segment (one layout union)
    m = c.read_manifest()
    assert m.files and all("hb=" in f for f in m.files)
    assert not [t for t in c.tags() if t.startswith("txn-")]


def test_release_stale_txn_tags_sweeps_preflip_orphans(spark, setup):
    """A crash BETWEEN tag creation and the catalog flip leaves tags
    pinning stagings that can never be pinned — the sweeper releases
    them after the grace window, and never touches live convergence
    work or user tags."""
    cat, a, b = setup
    # orphan: staged + tagged, flip never landed
    sv = write_and_commit(_df(spark, 90, 95), a, mode="append", wap_id="txn-00000000dead")
    a.create_tag("txn-00000000dead", version=sv)
    a.create_tag("release-1", version=a.current_version())  # user tag, untouched
    # a crashed POST-flip txn: its tag pins the catalog pin itself
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    _crash_publishes(txn)
    swept = cat.release_stale_txn_tags(older_than_seconds=0)
    assert swept == {"a": ["txn-00000000dead"]}
    assert "release-1" in a.tags()
    # the live (pinned) txn tag survived the sweep and heal converges
    assert [t for t in a.tags() if t.startswith("txn-")] == [txn.txn_id]
    cat.heal()
    assert _ids(a.read(spark)) == set(range(15))


def test_conflicted_flip_releases_durable_tags(spark, setup):
    """A transaction whose catalog flip ABORTS (write-write conflict)
    must release the durable tags it created pre-flip — otherwise the
    loser's tags pin its dead staged snapshots until the stale-tag
    sweeper's grace window."""
    cat, a, b = setup
    t1, t2 = cat.transaction(), cat.transaction()
    t1.write("a", _df(spark, 10, 15), mode="append")
    t2.write("a", _df(spark, 20, 25), mode="append")
    t1.commit()
    with pytest.raises(ConcurrentModificationError):
        t2.commit()
    assert not [t for t in a.tags() if t.startswith("txn-")]


def test_convergence_never_deletes_coincident_user_tags(spark, setup):
    """_release_txn_tag is scoped to transaction-minted ids: a USER tag
    whose name happens to equal an interactive WAP's wap_id (a
    deliberate retention pin on the audited snapshot) must survive
    convergence passes."""
    cat, a, b = setup
    sv = write_and_commit(_df(spark, 10, 15), a, mode="append", wap_id="audit-q3")
    a.create_tag("audit-q3", version=sv)
    pv = a.publish_wap(wap_id="audit-q3")
    cat.register("a", a, version=pv)  # pin lands on the publish commit
    txn = cat.transaction()
    txn.write("a", _df(spark, 20, 25), mode="append")
    txn.commit()
    assert "audit-q3" in a.tags()  # the user's pin survived


def test_reader_auto_heals_unconverged_pin(spark, setup):
    """r8 verdict #7: the FIRST catalog reader touching a pin left
    staged by a crashed transaction converges it — publish onto the
    table's main + re-pin — so durability needs no operator heal()
    call. Tables the reader never touched stay staged until their own
    first touch; historical reads never converge anything."""
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    txn.write("b", _df(spark, 110, 115), mode="append")
    orig = ManifestTable.publish_wap
    ManifestTable.publish_wap = lambda self, **kw: (_ for _ in ()).throw(
        OSError("crash before publish")
    )
    try:
        with pytest.raises(OSError, match="crash"):
            txn.commit()
    finally:
        ManifestTable.publish_wap = orig
    cv = cat.current_version()
    # a historical read does NOT converge (old pins are history)
    assert _ids(cat.read(spark, "a", catalog_version=cv - 1)) == set(range(10))
    _t, va = cat.table("a")
    assert "wap" in a.read_manifest(va).meta  # still staged

    # the first current-state read returns the txn's rows AND heals "a"
    assert _ids(cat.read(spark, "a")) == set(range(15))
    assert _ids(a.read(spark)) == set(range(15))  # main converged
    _t, va = cat.table("a")
    assert "wap" not in a.read_manifest(va).meta  # re-pinned at published
    # the durable txn tag was released by convergence
    assert not any(tag.startswith("txn-") for tag in a.tags())

    # "b" was untouched: still staged until ITS first reader
    _t, vb = cat.table("b")
    assert "wap" in b.read_manifest(vb).meta
    assert _ids(b.read(spark)) == set(range(100, 110))
    assert _ids(cat.read(spark, "b")) == set(range(100, 115))
    assert _ids(b.read(spark)) == set(range(100, 115))
    # nothing left for the operator pass
    assert cat.heal() == {}


def test_reader_auto_heal_fails_soft_without_write_access(spark, setup, monkeypatch):
    """Review finding on r9 auto-heal: convergence WRITES, so a reader
    that cannot publish (read-only credentials, replica mount) must
    fall back to reading the staged snapshot — the pre-auto-heal
    behavior — never raise."""
    cat, a, b = setup
    txn = cat.transaction()
    txn.write("a", _df(spark, 10, 15), mode="append")
    orig = ManifestTable.publish_wap
    ManifestTable.publish_wap = lambda self, **kw: (_ for _ in ()).throw(
        OSError("read-only storage")
    )
    try:
        with pytest.raises(OSError):
            txn.commit()
        # publish still broken: the read returns the staged rows anyway
        assert _ids(cat.read(spark, "a")) == set(range(15))
    finally:
        ManifestTable.publish_wap = orig
    # pin untouched (still staged), so a later heal converges normally
    _t, v = cat.table("a")
    assert "wap" in a.read_manifest(v).meta
    assert "a" in cat.heal()
    assert _ids(a.read(spark)) == set(range(15))
