"""S5 JMX poller source: CLI-output rewriter + typed poll DataFrame
(reference pull_jvm_stats.js:15-84, entries.js:243-310) driven through a
deterministic fake transport — no WildFly in the container."""

from __future__ import annotations

from apmbackend_spark.sources.jmx import (
    JMX_SCHEMA,
    parse_cli_output,
    poll_jvm_stats,
)

RESOURCES = ("ds", "heap", "meta", "sysload", "classcnt", "threading", "bean")


def _fake_cli_output(seed: int) -> str:
    # WildFly management CLI shape: one bare JSON blob per queried resource,
    # separated by newlines, with free-text warning chatter interleaved.
    return f"""WARN: Picked up JDK_JAVA_OPTIONS
{{
    "result" : {{"InUseCount" : {seed}, "ActiveCount" : {seed + 1}, "AvailableCount" : 20}}
}}
{{
    "result" : {{"used" : {seed * 1000}, "committed" : {seed * 2000}, "max" : 4096}}
}}
{{
    "result" : {{"used" : 77, "committed" : 88, "max" : 99}}
}}
{{
    "result" : 0.25
}}
{{
    "result" : {seed * 11}
}}
{{
    "result" : {{"thread-count" : 120, "daemon-thread-count" : 80}}
}}
{{
    "result" : [ {{"result" : {{"pool-available-count" : 5, "pool-current-size" : 2, "pool-max-size" : 10}}}} ]
}}
"""


def test_parse_cli_output_rewrites_blobs_and_drops_warnings():
    doc = parse_cli_output(RESOURCES, _fake_cli_output(3))
    assert set(doc) == set(RESOURCES)
    assert doc["ds"]["result"]["InUseCount"] == 3
    assert doc["sysload"]["result"] == 0.25
    assert doc["bean"]["result"][0]["result"]["pool-max-size"] == 10


def test_poll_builds_typed_frame_and_skips_dead_hosts(spark):
    def transport(host):
        if host.startswith("dead"):
            raise ConnectionError("unreachable")
        return _fake_cli_output(int(host.split(".")[0][-1]))

    df = poll_jvm_stats(
        spark,
        ts=1_700_000_000_000,
        hosts=["app1.corp.example", "dead1.corp.example", "app2.corp.example"],
        transport=transport,
    )
    assert df.schema == JMX_SCHEMA
    rows = {r["server"]: r for r in df.collect()}
    # dead host dropped, hostnames shortened (pull_jvm_stats.js:78)
    assert set(rows) == {"app1", "app2"}
    assert rows["app1"]["ds_inuse_nodes"] == 1
    assert rows["app2"]["heap_used"] == 2000
    assert rows["app1"]["sys_load"] == 0.25
    assert rows["app2"]["bean_pool_current"] == 2
    assert rows["app1"]["timestamp"] == 1_700_000_000_000


def test_poll_full_hostname_when_shorten_disabled(spark):
    df = poll_jvm_stats(
        spark,
        ts=1,
        hosts=["app1.corp.example"],
        transport=lambda h: _fake_cli_output(1),
        shorten_hostname=False,
    )
    assert df.collect()[0]["server"] == "app1.corp.example"
