"""stool CLI command construction (SURVEY §2.13 ktool parity surface).

Pure unit tests over build_command — no kubectl/broker needed.
"""

from __future__ import annotations

from flink_tank_spark.tools import stool


def _build(argv: list[str], monkeypatch) -> tuple[str, str | None]:
    captured = {}

    def fake_kexec(ns, pod, cmd, stdin=None):
        captured["cmd"], captured["stdin"] = cmd, stdin
        return 0

    monkeypatch.setattr(stool, "_kexec", fake_kexec)
    monkeypatch.setattr(stool, "discover_pod", lambda ns, label: None)
    assert stool.main(argv) == 0
    return captured["cmd"], captured["stdin"]


def test_list_topics(monkeypatch):
    cmd, _ = _build(["list-topics"], monkeypatch)
    assert "kafka-topics.sh" in cmd and "--list" in cmd


def test_describe(monkeypatch):
    cmd, _ = _build(["describe", "-t", "input-events"], monkeypatch)
    assert "--describe --topic input-events" in cmd


def test_consume_full_flag_surface(monkeypatch):
    cmd, _ = _build(
        [
            "consume", "-t", "output-results", "-n", "5", "--from-beginning",
            "--partition", "0", "--show-key", "--print-timestamp",
            "--timeout-ms", "10000",
        ],
        monkeypatch,
    )
    assert "kafka-console-consumer.sh" in cmd
    assert "--topic output-results" in cmd
    assert "--from-beginning" in cmd
    assert "--max-messages 5" in cmd
    assert "--partition 0" in cmd
    assert "print.key=true" in cmd
    assert "print.timestamp=true" in cmd  # ktool.py:111-153 parity
    assert "--timeout-ms 10000" in cmd


def test_produce_message_goes_to_stdin(monkeypatch):
    cmd, stdin = _build(
        ["produce", "-t", "input-events", "-m", 'k1:{"id":"u1"}'], monkeypatch
    )
    assert "kafka-console-producer.sh" in cmd
    assert "parse.key=true" in cmd
    assert stdin == 'k1:{"id":"u1"}'


def test_query_offsets(monkeypatch):
    cmd, _ = _build(["query", "-t", "input-events"], monkeypatch)
    assert "kafka-get-offsets.sh" in cmd and "--topic input-events" in cmd


def test_query_single_partition_spec(monkeypatch):
    # ktool.py:212-225: -p builds a topic:partition spec
    cmd, _ = _build(["query", "-t", "input-events", "--partition", "2"], monkeypatch)
    assert "--topic input-events:2" in cmd


def test_topic_names_are_shell_quoted(monkeypatch):
    cmd, _ = _build(["describe", "-t", "weird topic;rm"], monkeypatch)
    assert "'weird topic;rm'" in cmd


def test_pod_discovery_command_string():
    # ktool.py:20-41 parity: broker pod resolved by Strimzi label via
    # kubectl jsonpath lookup
    cmd = stool.discover_pod_command("kafka", stool.DEFAULT_POD_LABEL)
    assert cmd[:5] == ["kubectl", "get", "pod", "-n", "kafka"]
    assert "strimzi.io/cluster=kafka-cluster,strimzi.io/kind=Kafka" in cmd
    assert "jsonpath={.items[0].metadata.name}" in cmd


def test_pod_resolution_precedence(monkeypatch):
    """Explicit --pod wins; else label discovery; else the fixed default."""
    import argparse

    ns = argparse.Namespace(pod="explicit-0", namespace="kafka", pod_label="x")
    assert stool.resolve_pod(ns) == "explicit-0"
    ns.pod = None
    monkeypatch.setattr(stool, "discover_pod", lambda n, l: "discovered-kafka-1")
    assert stool.resolve_pod(ns) == "discovered-kafka-1"
    monkeypatch.setattr(stool, "discover_pod", lambda n, l: None)
    assert stool.resolve_pod(ns) == stool.DEFAULT_POD


def test_run_query_cli_list_and_check(spark, capsys):
    """run_query CLI: --list covers the whole registry; --check runs the
    gate comparison for one query."""
    from flink_tank_spark.plans.registry import all_queries
    from flink_tank_spark.tools.run_query import main

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in all_queries():
        assert name in out
    assert main(["q6_forecast_revenue", "--check", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "OK" in capsys.readouterr().out
    assert main(["nope", "--check"]) == 2


def test_run_query_adhoc_sql(spark, capsys):
    """--sql runs free-form Spark SQL over the registered catalog views."""
    from flink_tank_spark.tools.run_query import main

    assert main([
        "--sql", "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang",
        "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    out = capsys.readouterr().out
    assert "lang" in out and "n" in out and "en" in out


def test_pod_discovery_timeout_falls_back(monkeypatch):
    """A hung kubectl (unreachable API server) must not hang the CLI:
    TimeoutExpired resolves to None and the fixed default pod is used."""
    import subprocess as sp

    def hang(*a, **kw):
        raise sp.TimeoutExpired(cmd="kubectl", timeout=kw.get("timeout", 5))

    monkeypatch.setattr(stool.subprocess, "run", hang)
    assert stool.discover_pod("kafka", stool.DEFAULT_POD_LABEL) is None
