"""Drain-path partial algebra: the tier-as-state rollup drain's merge
invariants (split-invariance under arbitrary micro-batch partitions,
multi-wave convergence to the one-shot batch answer) and the round-5
crash-safety properties of the journaled tier commit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aisdb_spark.streaming import rollup_stream


def test_rollup_partial_merge_is_split_invariant(spark):
    """Hypothesis over random events and random micro-batch partitions for
    the EVENTS rollup-partial algebra (the tier-as-state drain path,
    drained_rollup_1min): merging per-part partials reproduces the one-shot
    rollup_measures answer for EVERY split — including first/last under
    duplicate timestamps, where only the (ts, event_id) total order
    disambiguates (slots collide constantly at max_size=14 over 10 slots,
    and values differ per event so a wrong winner changes first/last)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    base = dt.datetime(2025, 3, 1, 12, 0)

    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # (user, 20-sec slot — NON-unique, so ts ties happen)
            st.tuples(st.integers(0, 1), st.integers(0, 9)),
            min_size=1, max_size=14,
        ),
        st.lists(st.integers(0, 2), min_size=14, max_size=14),  # part per event
    )
    def run(evts, parts_assign):
        rows = [
            (i, u, base + dt.timedelta(seconds=20 * slot),
             float(i) * 0.37 - 1.0, parts_assign[i])
            for i, (u, slot) in enumerate(evts)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, value double, part int",
        )
        whole = rollup_stream.rollup_measures(ev)
        u = None
        for p in range(3):
            pp = rollup_stream.rollup_partials_events(
                ev.filter(F.col("part") == p)
            )
            u = pp if u is None else u.unionByName(pp)
        merged = rollup_stream.merge_rollup_partials(u).select(
            *rollup_stream._ROLLUP_TIER_COLS
        )
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0

    run()


def test_multiwave_partial_drain_matches_batch(spark, tmp_path):
    """Three hand-driven waves through upsert_rollup_partials_batch — the
    tier itself is the cross-batch state — must converge to the one-shot
    batch rollup, with waves 2 and 3 landing LATE rows into buckets wave 1
    already wrote (the no-watermark losslessness claim), and a replayed
    epoch must be a no-op on the tier bytes."""
    base = dt.datetime(2025, 3, 1, 12, 0)
    tier = str(tmp_path / "tier")

    def ev_df(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )

    # wave 1: bucket 12:00 and 12:01; wave 2: late row back into 12:00
    # (same user — must merge n/sum and steal first via smaller event_id);
    # wave 3: new user + a last-stealing row (same ts as event 2, larger id)
    w1 = [(10, 1, base + dt.timedelta(seconds=30), 5.00),
          (20, 1, base + dt.timedelta(seconds=90), 7.00)]
    w2 = [(5, 1, base + dt.timedelta(seconds=10), 3.00)]
    w3 = [(30, 2, base + dt.timedelta(seconds=45), 9.00),
          (40, 1, base + dt.timedelta(seconds=30), 1.00)]
    for e, rows in enumerate([w1, w2, w3]):
        rollup_stream.upsert_rollup_partials_batch(
            spark, ev_df(rows), tier, epoch_id=e
        )
    got = spark.read.parquet(tier).select(*rollup_stream._ROLLUP_TIER_COLS)
    expected = rollup_stream.rollup_measures(ev_df(w1 + w2 + w3))
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # the 12:00/user-1 bucket saw all three waves: first stolen by wave 2,
    # last stolen by wave 3's tie-breaking larger event_id
    row = got.filter(
        (F.col("user_id") == 1) & (F.col("bucket_start") == base)
    ).first()
    assert (row.n_events, row.first_cents, row.last_cents) == (3, 300, 100)
    # replayed epoch: skipped via _epoch.json, tier unchanged
    rollup_stream.upsert_rollup_partials_batch(
        spark, ev_df([(99, 9, base, 99.0)]), tier, epoch_id=2
    )
    assert got.filter(F.col("user_id") == 9).count() == 0
