"""S5: JVM-stats (JMX) poller source (reference ``pull_jvm_stats.js:15-84``,
entry shape ``entries.js:243-310``).

The reference shells out to a WildFly management CLI per host, rewrites the
CLI's multi-JSON-blob output into one JSON document (``cliToJSON``,
``pull_jvm_stats.js:15-33``), extracts 16 typed gauges per host into a
``JmxEntry``, and enqueues CSV lines. Re-expressed for Spark:

  * the transport is PLUGGABLE — ``poll_jvm_stats`` takes any
    ``host -> raw CLI output`` callable, so tests (and container
    environments with no WildFly) inject a fake while production wires a
    subprocess or HTTP management call;
  * polling is a driver-side control-plane step BY DESIGN: the host list is
    dozens of boxes (BASELINE.md: ~70 tails), i.e. dim-table sized — one
    poll produces |hosts| rows per tick. The DATA-plane join/rollup over
    the resulting gauge table is what runs distributed (jmx_rollup);
  * the stage boundary is a typed DataFrame with an explicit schema, not a
    pipe-delimited queue line.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# entries.js:246-275 field-for-field (type 'jx' tag is implied by the table).
JMX_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("server", T.StringType(), False),
        T.StructField("ds_inuse_nodes", T.LongType(), True),
        T.StructField("ds_active_nodes", T.LongType(), True),
        T.StructField("ds_available_nodes", T.LongType(), True),
        T.StructField("heap_used", T.LongType(), True),
        T.StructField("heap_committed", T.LongType(), True),
        T.StructField("heap_max", T.LongType(), True),
        T.StructField("meta_used", T.LongType(), True),
        T.StructField("meta_committed", T.LongType(), True),
        T.StructField("meta_max", T.LongType(), True),
        T.StructField("sys_load", T.DoubleType(), True),
        T.StructField("class_cnt", T.LongType(), True),
        T.StructField("thread_cnt", T.LongType(), True),
        T.StructField("daemon_thread_cnt", T.LongType(), True),
        T.StructField("bean_pool_available", T.LongType(), True),
        T.StructField("bean_pool_current", T.LongType(), True),
        T.StructField("bean_pool_max", T.LongType(), True),
    ]
)

_RX_WARNING = re.compile(r"^[a-zA-Z]")
_RX_OPEN = re.compile(r"^\{")


def parse_cli_output(resources: Iterable[str], output: str) -> dict:
    """CLI→JSON rewriter (``cliToJSON``, ``pull_jvm_stats.js:15-33``): the
    management CLI prints one bare JSON object per queried resource plus
    free-text warning lines. Joins adjacent blobs with commas, names each
    blob after its resource (in query order), drops warning lines, and
    parses the result as one document."""
    res = list(resources)
    fixed = str(output).replace("\n}\n{", "\n},\n{")
    out_lines = []
    for line in fixed.split("\n"):
        if _RX_WARNING.match(line):
            continue  # discard CLI warning chatter
        if _RX_OPEN.match(line):
            out_lines.append(f'"{res.pop(0)}" : {{')
        else:
            out_lines.append(line)
    return json.loads("{" + "\n".join(out_lines) + "}")


def _opt_int(v) -> int | None:
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def _opt_float(v) -> float | None:
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def jmx_row(
    ts: int, server: str, stats: dict, shorten_hostname: bool = True
) -> tuple:
    """One typed gauge row from a parsed stats document
    (``entries.js:246-275``; hostname shortening ``pull_jvm_stats.js:78``)."""
    if shorten_hostname:
        server = re.sub(r"\..*", "", server)
    bean0 = (stats.get("bean", {}).get("result") or [{}])[0].get("result", {})
    return (
        int(ts),
        server,
        _opt_int(stats.get("ds", {}).get("result", {}).get("InUseCount")),
        _opt_int(stats.get("ds", {}).get("result", {}).get("ActiveCount")),
        _opt_int(stats.get("ds", {}).get("result", {}).get("AvailableCount")),
        _opt_int(stats.get("heap", {}).get("result", {}).get("used")),
        _opt_int(stats.get("heap", {}).get("result", {}).get("committed")),
        _opt_int(stats.get("heap", {}).get("result", {}).get("max")),
        _opt_int(stats.get("meta", {}).get("result", {}).get("used")),
        _opt_int(stats.get("meta", {}).get("result", {}).get("committed")),
        _opt_int(stats.get("meta", {}).get("result", {}).get("max")),
        _opt_float(stats.get("sysload", {}).get("result")),
        _opt_int(stats.get("classcnt", {}).get("result")),
        _opt_int(stats.get("threading", {}).get("result", {}).get("thread-count")),
        _opt_int(
            stats.get("threading", {}).get("result", {}).get("daemon-thread-count")
        ),
        _opt_int(bean0.get("pool-available-count")),
        _opt_int(bean0.get("pool-current-size")),
        _opt_int(bean0.get("pool-max-size")),
    )


def poll_jvm_stats(
    spark: SparkSession,
    ts: int,
    hosts: Iterable[str],
    transport: Callable[[str], str],
    resources: Iterable[str] = ("ds", "heap", "meta", "sysload", "classcnt", "threading", "bean"),
    shorten_hostname: bool = True,
) -> DataFrame:
    """Poll every host once and return the typed gauge DataFrame. A host
    whose transport raises is skipped (reference drops it the same way,
    ``pull_jvm_stats.js:52-55``)."""
    res = tuple(resources)
    rows = []
    for host in hosts:
        try:
            stats = parse_cli_output(res, transport(host))
        except Exception:  # noqa: BLE001 — unreachable/garbled host: skip
            continue
        rows.append(jmx_row(ts, host, stats, shorten_hostname))
    return spark.createDataFrame(rows, JMX_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic fleet — lets the collector run under the driver's
# correctness gate end-to-end (transport -> CLI rewriter -> typed frame) with
# a VALUES oracle built from the SAME per-host formulas. The media_features
# precedent: plumbing is real and graded, only the remote endpoint is faked.
# ---------------------------------------------------------------------------

SYNTH_TS = 1_700_000_000_000
SYNTH_HOSTS = tuple(f"app{i}.dc.example" for i in range(1, 9))


def _synth_gauges(i: int) -> dict:
    return {
        "ds_inuse": i,
        "ds_active": i + 1,
        "ds_avail": 20,
        "heap_used": i * 1000,
        "heap_committed": i * 2000,
        "heap_max": 4096,
        "meta_used": 70 + i,
        "meta_committed": 80 + i,
        "meta_max": 99,
        "sys_load": i * 0.25,  # exactly representable doubles
        "class_cnt": i * 11,
        "thread_cnt": 100 + i,
        "daemon_thread_cnt": 50 + i,
        "bean_avail": 5,
        "bean_current": 2,
        "bean_max": 10,
    }


def synthetic_transport(host: str) -> str:
    """CLI-shaped output for a synthetic host (index parsed from its name),
    including the warning chatter the rewriter must drop."""
    i = int(re.sub(r"\D", "", host.split(".")[0]))
    g = _synth_gauges(i)
    return f"""WARN: Picked up JDK_JAVA_OPTIONS
{{
    "result" : {{"InUseCount" : {g['ds_inuse']}, "ActiveCount" : {g['ds_active']}, "AvailableCount" : {g['ds_avail']}}}
}}
{{
    "result" : {{"used" : {g['heap_used']}, "committed" : {g['heap_committed']}, "max" : {g['heap_max']}}}
}}
{{
    "result" : {{"used" : {g['meta_used']}, "committed" : {g['meta_committed']}, "max" : {g['meta_max']}}}
}}
{{
    "result" : {g['sys_load']!r}
}}
{{
    "result" : {g['class_cnt']}
}}
{{
    "result" : {{"thread-count" : {g['thread_cnt']}, "daemon-thread-count" : {g['daemon_thread_cnt']}}}
}}
{{
    "result" : [ {{"result" : {{"pool-available-count" : {g['bean_avail']}, "pool-current-size" : {g['bean_current']}, "pool-max-size" : {g['bean_max']}}}}} ]
}}
"""


def jmx_poll_synthetic(spark: SparkSession) -> DataFrame:
    return poll_jvm_stats(
        spark, ts=SYNTH_TS, hosts=SYNTH_HOSTS, transport=synthetic_transport
    )


def jmx_poll_oracle_sql() -> str:
    cols = ", ".join(f.name for f in JMX_SCHEMA.fields)
    rows = []
    for host in SYNTH_HOSTS:
        i = int(re.sub(r"\D", "", host.split(".")[0]))
        g = _synth_gauges(i)
        def big(v: int) -> str:
            # bare integer VALUES literals land as INT32 in DuckDB; the
            # schema (and Spark) say BIGINT
            return f"CAST({v} AS BIGINT)"

        rows.append(
            f"({big(SYNTH_TS)}, 'app{i}', {big(g['ds_inuse'])}, "
            f"{big(g['ds_active'])}, {big(g['ds_avail'])}, "
            f"{big(g['heap_used'])}, {big(g['heap_committed'])}, "
            f"{big(g['heap_max'])}, {big(g['meta_used'])}, "
            f"{big(g['meta_committed'])}, {big(g['meta_max'])}, "
            f"CAST({g['sys_load']!r} AS DOUBLE), {big(g['class_cnt'])}, "
            f"{big(g['thread_cnt'])}, {big(g['daemon_thread_cnt'])}, "
            f"{big(g['bean_avail'])}, {big(g['bean_current'])}, "
            f"{big(g['bean_max'])})"
        )
    return (
        f"SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols})"
    )


def subprocess_transport(
    client_jar: str,
    jmx_port: int,
    user: str,
    password: str,
    cmd_list: str,
    timeout_ms: int = 5000,
) -> Callable[[str], str]:
    """Production transport mirroring the reference's CLI invocation
    (``pull_jvm_stats.js:38``): builds a ``host -> raw output`` callable
    that shells out to the management client jar. Kept import-light and
    unexercised in tests (no WildFly in the container)."""
    import subprocess

    def run(host: str) -> str:
        cmd = [
            "java", "-jar", client_jar, "--output-json",
            f"--timeout={timeout_ms}", f"--controller={host}:{jmx_port}",
            f"--user={user}", f"--password={password}",
            "--connect", f"commands={cmd_list}",
        ]
        return subprocess.run(
            cmd, capture_output=True, check=True, timeout=timeout_ms / 1000 + 5
        ).stdout.decode()

    return run
