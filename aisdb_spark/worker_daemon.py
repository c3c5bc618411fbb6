"""Python worker daemon with vectorized-library preload.

Every Python-boundary stage here hands batches to numpy/pandas/pyarrow
kernels (guide §4.2), so every worker needs those modules — but with the
stock ``pyspark.daemon`` each forked worker imports them from scratch:
N workers × ~1 s of heavy imports, paid the first time a Python stage
runs (measured: 12-15 s wall for the first codec stage at local[32] on
a loaded box, ~2 s once warm). Importing them in the daemon BEFORE it
forks lets every worker inherit the already-initialized modules via
copy-on-write — one import instead of N.

Wired via ``spark.python.daemon.module`` in session.get_spark (opt-out:
``SPARK_GRAFT_PRELOAD=0``). The imports are best-effort: a worker
environment without pandas still forks a functional daemon and pays the
per-worker import exactly as before. Cluster note: this module ships
with the package (``--py-files``), so the same preload applies per
executor — the win scales with cores-per-executor.
"""

from __future__ import annotations

try:  # best-effort preload — absence only costs the old per-worker import
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # Kernel-bearing modules are pickled BY REFERENCE into Python stages
    # (they are importable module-level functions), so every worker
    # imports them — and through them pyspark.sql and the package graph
    # — on first use. Import them once here instead.
    import aisdb_spark.multimodal  # noqa: F401
    import aisdb_spark.operators.asof  # noqa: F401
    import aisdb_spark.operators.codec  # noqa: F401
    import aisdb_spark.operators.codec_arrow  # noqa: F401
    import aisdb_spark.operators.downsample  # noqa: F401
    import aisdb_spark.operators.encoder  # noqa: F401
    import aisdb_spark.operators.interp  # noqa: F401
    import aisdb_spark.streaming.stateful  # noqa: F401
except Exception:  # pragma: no cover - degraded environments
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
