"""Lakehouse platform demo — the capstone layers composed:

1. a CATALOG manages a fact table and a dimension table; an
   incremental MATERIALIZED VIEW maintains a rollup over the facts,
2. an atomic MULTI-TABLE TRANSACTION appends to both tables — catalog
   readers see the update together or not at all; the MV folds ONLY
   the appended commit's files (incremental mode),
3. a second transaction CRASHES between its catalog flip and its
   table publishes — catalog readers already see it, and
   ``Catalog.heal()`` converges the tables' mains,
4. a CATALOG TAG pins the whole multi-table state durably: both
   tables are then rewritten and aggressively vacuumed, and the
   tagged state still reads in full.

Run: python examples/lakehouse_platform_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.manifest import (  # noqa: E402
    ManifestTable,
    compact_and_commit,
    write_and_commit,
)
from octopufs_spark.multitable import Catalog  # noqa: E402
from octopufs_spark.mv import MaterializedView  # noqa: E402
from octopufs_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark()
    work = tempfile.mkdtemp(prefix="platform_demo_")

    def facts_rows(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("order_id"),
            (F.col("id") % 5).alias("region"),
            (F.col("id") % 100 + 1).alias("amount"),
        )

    def dims_rows(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("order_id"), (F.col("id") % 3).alias("priority")
        )

    # 1. catalog + tables + MV over facts
    facts = ManifestTable(f"{work}/facts")
    dims = ManifestTable(f"{work}/dims")
    write_and_commit(facts_rows(0, 2000), facts)
    write_and_commit(dims_rows(0, 2000), dims)
    cat = Catalog(f"{work}/catalog")
    cat.register("facts", facts)
    cat.register("dims", dims)
    mv = MaterializedView(
        facts,
        f"{work}/facts_by_region",
        ["region"],
        {"n": ("count", "*"), "total": ("sum", "amount")},
    )
    mv.refresh(spark)
    print(f"catalog v{cat.current_version()}; MV mode:",
          mv.view.read_manifest().meta["mv"]["mode"])

    # 2. atomic txn + incremental MV fold
    txn = cat.transaction()
    txn.write("facts", facts_rows(2000, 500), mode="append")
    txn.write("dims", dims_rows(2000, 500), mode="append")
    assert cat.read(spark, "facts").count() == 2000  # nothing visible yet
    txn.commit()
    joined = cat.read(spark, "facts").join(cat.read(spark, "dims"), "order_id")
    assert joined.count() == 2500  # facts and dims flipped together
    mv.refresh(spark)
    mode = mv.view.read_manifest().meta["mv"]["mode"]
    assert mode == "incremental"
    total = mv.read(spark).agg(F.sum("n")).collect()[0][0]
    print(f"txn committed: join={joined.count()} rows; MV refresh mode={mode}, "
          f"rows covered={total}")
    assert total == 2500

    # 3. crashed transaction -> heal
    txn2 = cat.transaction()
    txn2.write("facts", facts_rows(9000, 100), mode="append")
    txn2.write("dims", dims_rows(9000, 100), mode="append")
    orig = ManifestTable.publish_wap
    ManifestTable.publish_wap = lambda self, **kw: (_ for _ in ()).throw(
        OSError("simulated crash before publish")
    )
    try:
        txn2.commit()
    except OSError:
        pass
    finally:
        ManifestTable.publish_wap = orig
    assert facts.read(spark).count() == 2500  # main not yet converged
    # the FIRST catalog reader auto-heals the crashed txn's pin:
    # reading it publishes the staged snapshot onto main and re-pins
    assert cat.read(spark, "facts").count() == 2600  # flip landed
    assert facts.read(spark).count() == 2600  # ...and main converged
    healed = cat.heal()  # finishes the table the reader never touched
    assert sorted(healed) == ["dims"]
    assert facts.read(spark).count() == 2600
    print(f"crash healed: facts by its first reader, {sorted(healed)} by "
          f"heal(); facts main = {facts.read(spark).count()} rows")

    # 4. catalog tag survives rewrite + aggressive vacuum
    cat.create_tag("release-2026-08")
    compact_and_commit(spark, facts)
    compact_and_commit(spark, dims)
    cat.register("facts", facts)
    cat.register("dims", dims)
    removed = facts.vacuum(keep_versions=1, retention_seconds=0)
    removed += dims.vacuum(keep_versions=1, retention_seconds=0)
    tagged = cat.read_tagged(spark, "release-2026-08", "facts").count()
    print(f"vacuum pruned {len(removed)} objects; tagged catalog state still "
          f"reads {tagged} fact rows")
    assert tagged == 2600

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
