"""SparkSession factory.

The reference creates bare sessions per job
(``FullPreprocessingPipeline.java:34-36``, ``ChurnPrediction.java:44-49``).
The rebuild centralizes session construction with scale-aware defaults:
AQE (runtime coalescing + skew-join splitting), UTC session timezone (oracle
parity with DuckDB), Arrow for any pandas exchange, and shuffle parallelism
sized to the machine instead of Spark's default 200.

On a real cluster the same factory applies — only ``master`` and the memory
settings come from spark-submit instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "retail_sales_project_bigdata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    AQE handles runtime re-planning (partition coalescing, skew joins,
    broadcast conversion) so the same logical plans survive a 100× scale-up:
    at sf0.1 local the shuffles coalesce down; at 100 TB on a cluster the
    same code runs with ``spark.sql.shuffle.partitions`` sized by the
    submitter and AQE splitting skewed partitions.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # local-mode heap: the ONE driver JVM hosts all executor threads,
        # every shuffle buffer, broadcast, and cached frame.  PySpark's
        # unset default is 1 GiB — running local[32] in that budget
        # caused GCLocker allocation stalls and, at 186 queries × 3
        # bench passes, a broadcast-build OOM.  Size it to the machine
        # (only applies when this process launches the JVM; on a real
        # cluster spark-submit owns the memory settings).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # InferFiltersFromGenerate clones the generator's child expression
        # into a pre-Generate Filter (size(e)>0 AND isnotnull(e)).  When
        # that child is a higher-order function (shingling: transform over
        # sequence), the clone is (a) interpreted, not codegen'd, and (b)
        # pushed below any repartition — so the most expensive expression
        # in the plan is evaluated 3× per row on the scan's (possibly
        # single-partition) side.  Our explodes are over arrays that are
        # almost never empty, so the inferred skip-empty filter saves
        # nothing and costs 5× on the MinHash pipeline; exclude the rule.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif os.environ.get("SPARK_MASTER"):
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def gate_mode() -> bool:
    """True when ``SPARK_GRAFT_GATE_MODE`` is set truthy — local
    correctness-gate sweeps shrink the ML hyperparameter search (smaller
    k-sweep, single-point CV grid) so a full-registry oracle run fits the
    gate budget.  Only rows-only queries are affected (the ML trainers
    have no SQL oracle); the property tests in tests/ run WITHOUT gate
    mode and keep the full-strength sweeps."""
    return os.environ.get("SPARK_GRAFT_GATE_MODE", "") not in ("", "0")


# SparkContext application ids that already had the package zip shipped
# (plain set of strings — contexts are recreated with fresh ids, and a
# dead context's leftover id costs nothing).  Guarded by _PKG_LOCK: two
# threads racing through a first read_table would otherwise both pass
# the membership check and addPyFile the same name twice (Spark rejects
# a re-registration).  The zip itself is built ONCE per Python process
# and reused across contexts; its staging dir is removed at interpreter
# exit.
_PKG_SHIPPED: set[str] = set()
_PKG_ZIP_PATH: list[str] = []  # lazily-built singleton [path]
import threading as _threading  # noqa: E402

_PKG_LOCK = _threading.Lock()


def _package_zip() -> str:
    # Built once per Python process and cached: workers see the
    # IMPORT-TIME snapshot of the package for the life of the process.
    # Fine for the driver/bench/tests (fresh process per run); in a
    # long-lived interactive session, source edits after the first
    # Arrow-boundary query require a new interpreter (or clearing
    # _PKG_ZIP_PATH/_PKG_SHIPPED) to reach the workers.  (VERDICT r7
    # item 7.)
    if not _PKG_ZIP_PATH:
        import atexit
        import shutil
        import tempfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        staging = tempfile.mkdtemp(prefix="pkg_ship_")
        atexit.register(shutil.rmtree, staging, ignore_errors=True)
        zip_base = os.path.join(
            staging, "retail_sales_project_bigdata_spark_pkg"
        )
        _PKG_ZIP_PATH.append(
            shutil.make_archive(
                zip_base,
                "zip",
                root_dir=os.path.dirname(pkg_dir),
                base_dir=os.path.basename(pkg_dir),
            )
        )
    return _PKG_ZIP_PATH[0]


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to the Python workers via ``addPyFile`` — once
    per SparkContext.

    Why: module-level functions used inside ``mapInPandas`` /
    ``applyInPandas(WithState)`` are pickled BY REFERENCE, so every
    Python worker must be able to ``import retail_sales_project_bigdata_spark``.
    In local mode that silently works only when the driver's cwd is the
    repo root: the JVM launches workers with ``python -m pyspark.daemon``,
    and ``-m`` prepends the daemon's cwd (= the driver JVM's cwd) to
    ``sys.path``.  A driver that loads ``__spark_entry__.py`` by file
    path from a foreign cwd (exactly what the round driver does) gets
    ``ModuleNotFoundError`` from every Arrow-boundary query.  Shipping a
    package zip through the standard ``addPyFile`` channel makes the
    contract hold from ANY cwd — and is the same mechanism a real
    cluster deployment uses, so nothing here is local-mode-specific.

    Called from ``sources.read_table`` (the entry point every query
    shares); one zip of the pure-Python package (~a few hundred KB),
    built once per process in a temp dir that is removed at interpreter
    exit, fetched once per worker.
    """
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _PKG_SHIPPED:
        return
    with _PKG_LOCK:
        if app_id in _PKG_SHIPPED:
            return
        sc.addPyFile(_package_zip())
        _PKG_SHIPPED.add(app_id)
