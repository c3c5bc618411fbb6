"""Live TCP receiver path (SURVEY §2.8): socket stream == batch rollup.

Mirrors the reference's receiver tests (``aisdb/tests/test_013_network.py``
style: feed a live socket, assert the decoded/flushed output) — here the
assertion is full-column equality between the socket-ingested streaming
rollup and the batch aggregation of the same events.
"""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

from aisdb_spark.sources.normalize import read_parquet
from aisdb_spark.streaming import receiver, rollup_stream
from tests.conftest import SF_SMALL


def test_socket_receiver_matches_batch(spark):
    ev = (
        read_parquet(spark, f"{SF_SMALL}/events.parquet")
        .orderBy("event_id")
        .limit(400)
        .cache()
    )
    rows = ev.select(
        "event_id",
        F.unix_micros("ts").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).collect()
    lines = [receiver.event_to_line(r.asDict()) for r in rows]
    payload = ("\n".join(lines) + "\n").encode()
    # one malformed line up front: the receiver must skip it, not die
    payload = b"this is not json\n" + payload

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def serve():
        conn, _ = srv.accept()
        try:
            conn.sendall(payload)
            done.wait(90)
        finally:
            conn.close()
            srv.close()

    feeder = threading.Thread(target=serve, daemon=True)
    feeder.start()

    agg = receiver.stream_rollup_socket(spark, "127.0.0.1", port)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sock_rollup")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # total n_events across windows == events fed ⇒ every line has been
        # aggregated into the complete-mode table
        deadline = time.monotonic() + 90
        fed = len(rows)
        while time.monotonic() < deadline:
            got = (
                spark.table("sock_rollup")
                .agg(F.sum("n_events").alias("n"))
                .collect()[0]["n"]
            )
            if got == fed:
                break
            time.sleep(0.5)
        else:
            raise AssertionError(f"socket stream drained {got}/{fed} events")
        streamed = spark.table("sock_rollup").cache()
        streamed.count()
    finally:
        done.set()
        q.stop()

    batch = rollup_stream.rollup_measures(ev)
    assert set(streamed.columns) == set(batch.columns)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def _udp_listener(n_expected: int, out: list, started: threading.Event):
    """Collect datagrams on an ephemeral UDP port; returns via closure."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 22)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(1.0)
    port = sock.getsockname()[1]

    def drain():
        started.set()
        deadline = time.monotonic() + 60
        while len(out) < n_expected and time.monotonic() < deadline:
            try:
                data, _ = sock.recvfrom(1 << 16)
                out.append(data.decode("utf-8"))
            except socket.timeout:
                continue
        sock.close()

    t = threading.Thread(target=drain, daemon=True)
    t.start()
    return port, t


def test_rebroadcast_udp_batch(spark):
    """receiver.rs fan-out analog: every line of a multi-partition batch
    arrives at the UDP consumer, sent from executor tasks (never via the
    driver)."""
    lines = [f'{{"event_id":{i},"payload":"x{i}"}}' for i in range(500)]
    df = spark.createDataFrame([(l,) for l in lines], "value string").repartition(8)
    got: list = []
    started = threading.Event()
    port, t = _udp_listener(len(lines), got, started)
    started.wait(10)
    sent = receiver.rebroadcast_udp(df, "127.0.0.1", port)
    assert sent == len(lines)
    t.join(60)
    assert sorted(got) == sorted(lines)  # at-most-once held on loopback


def test_stream_rebroadcast_socket(spark):
    """TCP in -> UDP out end-to-end: the streaming side-sink re-emits the
    full feed to a downstream UDP consumer."""
    lines = [f'{{"event_id":{i},"v":{i * 2}}}' for i in range(300)]
    payload = ("\n".join(lines) + "\n").encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    in_port = srv.getsockname()[1]
    done = threading.Event()

    def serve():
        conn, _ = srv.accept()
        try:
            conn.sendall(payload)
            done.wait(90)
        finally:
            conn.close()
            srv.close()

    threading.Thread(target=serve, daemon=True).start()

    got: list = []
    started = threading.Event()
    out_port, t = _udp_listener(len(lines), got, started)
    started.wait(10)

    q = receiver.stream_rebroadcast_socket(
        spark, "127.0.0.1", in_port, "127.0.0.1", out_port
    )
    try:
        t.join(60)
        assert sorted(got) == sorted(lines)
    finally:
        done.set()
        q.stop()
