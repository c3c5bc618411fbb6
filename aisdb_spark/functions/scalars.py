"""Scalar helper functions (SURVEY.md §2.7) — all thin built-in
compositions, JVM-side, codegen-friendly.

Reference precedents: circular course difference with mod-360 wraparound
(``aisdb/proc_util.py:80-163`` split criteria), coordinate wrapping
``shiftcoord`` (``aisdb/gis.py:18-35``), epoch conversions
``dt_2_epoch``/``epoch_2_dt`` (``aisdb/gis.py:38-90``), CSV sanitization
stripping ``,#"'\\n`` and chr(130) (``aisdb/proc_util.py:14-31``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def circular_diff(a: Column, b: Column, modulus: int = 360) -> Column:
    """Smallest absolute difference on a circle of size ``modulus`` —
    AISdb's course-delta wraparound: least(|d|, 360-|d|)."""
    d = F.abs(a - b) % F.lit(modulus)
    return F.least(d, F.lit(modulus) - d)


def wrap_mod(x: Column, lo: int = -180, hi: int = 180) -> Column:
    """Wrap into [lo, hi): the shiftcoord ``((x+180) % 360) - 180`` shape."""
    span = hi - lo
    return ((x - F.lit(lo)) % F.lit(span) + F.lit(span)) % F.lit(span) + F.lit(lo)


def epoch_s(ts: Column) -> Column:
    """timestamp → epoch seconds (dt_2_epoch)."""
    return F.unix_timestamp(ts)


def from_epoch_s(s: Column) -> Column:
    """epoch seconds → timestamp (epoch_2_dt)."""
    return F.timestamp_seconds(s)


def sanitize_csv_text(c: Column) -> Column:
    """Strip the characters AISdb's CSV writer removes."""
    return F.regexp_replace(c, "[,#\"'\\n\\r]", " ")
