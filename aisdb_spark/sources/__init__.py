from aisdb_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_CTE,
    VALUE_EXPR,
    load_events,
    load_transcripts,
    synth_transcripts,
    with_value,
)
