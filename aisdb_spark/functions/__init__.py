from aisdb_spark.functions.scalars import (  # noqa: F401
    circular_diff,
    epoch_s,
    from_epoch_s,
    sanitize_csv_text,
    wrap_mod,
)
