"""Scale-adaptive shuffle sizing for small driver-synchronized batches.

A micro-batch / loop round far below the session's shuffle width gets few
partitions and no AQE (adaptive replanning costs an extra job per stage —
pure overhead when every shuffle is small by construction).  Big batches
keep the session settings untouched, AQE included — the bound derives
from the observed batch size, never from the local core count, so the
same code is right on a laptop and on a 1000-executor cluster.

Extracted from ``IncrementalIndexer._micro_batch_tuning`` (r5) so the
stateful screen loops can share the recipe.
"""

from __future__ import annotations

import contextlib

ROWS_PER_PARTITION = 50_000
MIN_PARTITIONS = 4


def small_batch_tuning(spark, batch_rows: int):
    """Context manager: inside the block, shuffles are sized to
    ``batch_rows`` (``rows // 50k`` clamped to ``[4, session setting]``)
    and AQE is off; both restored on exit.  A no-op when the batch
    already warrants the session width."""
    conf = spark.conf
    sess_parts = int(conf.get("spark.sql.shuffle.partitions"))
    parts = max(MIN_PARTITIONS,
                min(sess_parts, batch_rows // ROWS_PER_PARTITION))
    if parts >= sess_parts:
        return contextlib.nullcontext()

    @contextlib.contextmanager
    def tuned():
        prev_aqe = conf.get("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            yield
        finally:
            conf.set("spark.sql.adaptive.enabled", prev_aqe)
            conf.set("spark.sql.shuffle.partitions", str(sess_parts))

    return tuned()
