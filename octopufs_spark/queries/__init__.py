"""Declared query inventory (SURVEY.md §2C).

Importing this package registers every query into
``octopufs_spark.registry.REGISTRY``.
"""

from octopufs_spark.queries import (  # noqa: F401
    aggs,
    analytics,
    extras,
    filters,
    graph,
    joins,
    llm_ext,
    pipeline,
    scalars,
    scans,
    setops,
    sorts,
    spark4,
    streaming_batch,
    tpch,
    tsq,
    windows,
)

# Imported last ON PURPOSE: registration order feeds the registry's
# fresh-first driver-sample ordering — brand-new queries must queue
# behind previously unsampled ones so the verification ledger drains.
from octopufs_spark.queries import trainprep  # noqa: E402,F401
from octopufs_spark.queries import curation  # noqa: E402,F401
from octopufs_spark.queries import subq  # noqa: E402,F401
from octopufs_spark.queries import buckets  # noqa: E402,F401
from octopufs_spark.queries import lakehouse_evo  # noqa: E402,F401
from octopufs_spark.queries import lakehouse_wap  # noqa: E402,F401
