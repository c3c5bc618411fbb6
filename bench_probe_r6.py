"""Round-6 probe: where does the time go? (not part of bench.py contract)

Phase-level dissection of the heavy queries: apply_per_conv parallelism,
streaming drain phases, cascade write phases.
"""
import os, sys, time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF = os.environ["SPARK_GRAFT_SF_DIR"]

from aisdb_spark.session import get_spark
from aisdb_spark.sources.transcripts import load_transcripts, with_value

spark = get_spark("probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
sc = spark.sparkContext
tv = with_value(load_transcripts(spark, SF))
print("n_turns", tv.count(), "n_convs", tv.select("conv_id").distinct().count())


def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    print(f"{label}: {best:.3f}s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- 1. apply_per_conv parallelism check ---
from pyspark.sql import functions as F
import pandas as pd

def kernel(pdf):
    import os as _os, time as _time
    return pd.DataFrame({"pid": [_os.getpid()], "n": [len(pdf)]})

from aisdb_spark.plans.sharding import apply_per_conv
res = apply_per_conv(tv.select("conv_id", "turn_idx", "ts", "value"),
                     kernel, "pid long, n long")
pdf = res.toPandas()
print("apply_per_conv: groups=", len(pdf), "distinct python pids=", pdf["pid"].nunique())

# how many tasks did the final stage use?
from aisdb_spark.operators import interp
sc.setJobDescription("probe: ewma")
t("ewma_03", lambda: noop(interp.ewma(tv, alpha=0.3)))

from aisdb_spark.operators import downsample
sc.setJobDescription("probe: lttb")
t("lttb_64", lambda: noop(downsample.lttb(tv, n_out=64)))

from aisdb_spark.operators import segmentation
from aisdb_spark.operators import interp as it
segd = segmentation.gap_split(tv, gap_seconds=3600)
sc.setJobDescription("probe: spline")
t("interp_cubic_spline", lambda: noop(it.interp_cubic_spline(segd, step_seconds=600)))

# --- 2. streaming drain phase dissection ---
import tempfile
from aisdb_spark.streaming import rollup_stream as rs
from aisdb_spark.sources.normalize import ensure_ltz, normalize_session

sc.setJobDescription("probe: drain rollup (full)")
t("drained_rollup_1min full", lambda: noop(rs.drained_rollup_1min(spark, SF, glob="events.parquet")), n=2)

# phases: batch-equivalent upsert without streaming machinery
def phase_rollup():
    normalize_session(spark)
    base = tempfile.mkdtemp(prefix="probe_ru_")
    ev = ensure_ltz(spark.read.schema(rs.EVENTS_SCHEMA).parquet(f"{SF}/events.parquet"))
    t0 = time.monotonic()
    rs.upsert_rollup_partials_batch(spark, ev, f"{base}/tier", epoch_id=0)
    t1 = time.monotonic()
    noop(spark.read.parquet(f"{base}/tier").select(*rs._ROLLUP_TIER_COLS))
    t2 = time.monotonic()
    print(f"  upsert_batch={t1-t0:.3f}s readback={t2-t1:.3f}s")

sc.setJobDescription("probe: drain rollup phases")
phase_rollup()
phase_rollup()

sc.setJobDescription("probe: drain sessions (full)")
t("drained_user_sessions full", lambda: noop(rs.drained_user_sessions(spark, SF, glob="events.parquet")), n=2)

def phase_sess():
    normalize_session(spark)
    base = tempfile.mkdtemp(prefix="probe_se_")
    ev = ensure_ltz(spark.read.schema(rs.EVENTS_SCHEMA).parquet(f"{SF}/events.parquet"))
    t0 = time.monotonic()
    parts = rs.sessionize_events(ev)
    rs.upsert_sessions_batch(spark, parts, f"{base}/tier", epoch_id=0)
    t1 = time.monotonic()
    noop(spark.read.parquet(f"{base}/tier").select(*rs._SESSION_TIER_COLS))
    t2 = time.monotonic()
    print(f"  sessionize+upsert={t1-t0:.3f}s readback={t2-t1:.3f}s")

sc.setJobDescription("probe: drain sessions phases")
phase_sess()
phase_sess()

# raw streaming machinery cost: drain the same file through a foreachBatch
# that does nothing
def stream_noop():
    base = tempfile.mkdtemp(prefix="probe_nb_")
    reader = spark.readStream.schema(rs.EVENTS_SCHEMA).option("pathGlobFilter", "events.parquet")
    src = ensure_ltz(reader.parquet(SF))
    q = (src.writeStream.foreachBatch(lambda b, e: None)
         .option("checkpointLocation", f"{base}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()

sc.setJobDescription("probe: stream machinery only")
t("stream noop-batch drain", stream_noop, n=2)

# --- 3. cascade phases ---
from aisdb_spark import checkpoint
import shutil

def cascade():
    d = tempfile.mkdtemp(prefix="probe_casc_")
    t0 = time.monotonic()
    tiers = checkpoint.materialize_cascade(spark, tv, d, force=True)
    dt = time.monotonic() - t0
    secs = {k: round(m["seconds"], 2) for k, m in tiers.items()}
    print(f"  cascade total={dt:.3f}s write_secs={secs}")
    shutil.rmtree(d, ignore_errors=True)

sc.setJobDescription("probe: cascade")
cascade()
cascade()

# fingerprint cost alone
t("input_fingerprint", lambda: checkpoint.input_fingerprint(tv))

print("done")
