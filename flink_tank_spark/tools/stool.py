"""Kafka ops CLI — same command surface as the reference's ktool
(`kafka-tools/ktool.py`, SURVEY §2.13: list-topics / describe / consume /
produce / query), reimplemented fresh for the Spark deployment.

Engine-adjacent tooling, not engine code: each subcommand shells out to
the Kafka console tools inside the broker pod via kubectl exec (the same
operational approach the reference takes, with this repo's own layout
and flags).

Usage:
    python -m flink_tank_spark.tools.stool list-topics
    python -m flink_tank_spark.tools.stool describe -t input-events
    python -m flink_tank_spark.tools.stool consume -t output-results -n 10 --from-beginning
    python -m flink_tank_spark.tools.stool produce -t input-events -m '{"id":"u1",...}'
    python -m flink_tank_spark.tools.stool query -t input-events
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys

DEFAULT_NAMESPACE = "kafka"
DEFAULT_POD = "kafka-cluster-kafka-0"
# Strimzi labels every broker pod of a cluster; discovery-by-label keeps
# the CLI working when pod names change (reference ktool.py:14-41 finds
# its broker the same way).
DEFAULT_POD_LABEL = "strimzi.io/cluster=kafka-cluster,strimzi.io/kind=Kafka"
BOOTSTRAP = "localhost:9092"
KAFKA_BIN = "/opt/kafka/bin"


def discover_pod_command(ns: str, label: str) -> list[str]:
    """kubectl invocation that resolves a broker pod name by label
    (pure construction — unit-testable without a cluster)."""
    return [
        "kubectl", "get", "pod", "-n", ns, "-l", label,
        "-o", "jsonpath={.items[0].metadata.name}",
    ]


def discover_pod(ns: str, label: str) -> str | None:
    """First broker pod matching ``label``, or None (no cluster / no
    match / lookup slower than 5 s — an unreachable API server must not
    hang the CLI, which previously proceeded instantly on DEFAULT_POD)."""
    try:
        out = subprocess.run(
            discover_pod_command(ns, label),
            capture_output=True, text=True, check=True, timeout=5,
        ).stdout.strip()
        return out or None
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError):
        return None


def resolve_pod(args) -> str:
    """--pod wins if given; else label discovery; else the fixed default."""
    if args.pod is not None:
        return args.pod
    return discover_pod(args.namespace, args.pod_label) or DEFAULT_POD


def _kexec(ns: str, pod: str, cmd: str, stdin: str | None = None) -> int:
    full = ["kubectl", "exec", "-n", ns]
    if stdin is not None:
        full.append("-i")
    full += [pod, "--", "sh", "-c", cmd]
    proc = subprocess.run(full, input=stdin.encode() if stdin else None)
    return proc.returncode


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="stool", description="Kafka ops for the Spark deployment")
    ap.add_argument("-n", "--namespace", default=DEFAULT_NAMESPACE)
    ap.add_argument(
        "-p", "--pod", default=None,
        help=f"broker pod (default: discover by label, else {DEFAULT_POD})",
    )
    ap.add_argument("--pod-label", default=DEFAULT_POD_LABEL,
                    help="label selector for broker-pod discovery")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-topics", help="list all topics")

    d = sub.add_parser("describe", help="describe a topic")
    d.add_argument("-t", "--topic", required=True)

    c = sub.add_parser("consume", help="console-consume a topic")
    c.add_argument("-t", "--topic", required=True)
    c.add_argument("-n", "--max-messages", type=int, default=None)
    c.add_argument("--from-beginning", action="store_true")
    c.add_argument("--partition", type=int, default=None)
    c.add_argument("--offset", default=None)
    c.add_argument("--show-key", action="store_true")
    # ktool parity: message-timestamp printing + consumer timeout
    # (/root/reference/kafka-tools/ktool.py:111-153 --print-timestamp /
    # --timeout-ms)
    c.add_argument("--print-timestamp", action="store_true")
    c.add_argument("--timeout-ms", type=int, default=None)

    p = sub.add_parser("produce", help="console-produce to a topic")
    p.add_argument("-t", "--topic", required=True)
    p.add_argument("-m", "--message", default=None, help="message (else read stdin)")
    p.add_argument("-f", "--file", default=None, help="file with one message per line")
    p.add_argument("--key-separator", default=":", help="'key:value' splitting for keyed sends")

    q = sub.add_parser("query", help="high-water-mark offsets for a topic")
    q.add_argument("-t", "--topic", required=True)
    # ktool parity: single-partition offset query via topic:partition spec
    # (/root/reference/kafka-tools/ktool.py:212-225 --partition)
    q.add_argument("--partition", type=int, default=None)

    args = ap.parse_args(argv)
    cmd, stdin = build_command(args)
    return _kexec(args.namespace, resolve_pod(args), cmd, stdin=stdin)


def build_command(args) -> tuple[str, str | None]:
    """Pure command-string construction (unit-testable without kubectl)."""
    if args.cmd == "list-topics":
        cmd = f"{KAFKA_BIN}/kafka-topics.sh --bootstrap-server {BOOTSTRAP} --list"
    elif args.cmd == "describe":
        cmd = (
            f"{KAFKA_BIN}/kafka-topics.sh --bootstrap-server {BOOTSTRAP} "
            f"--describe --topic {shlex.quote(args.topic)}"
        )
    elif args.cmd == "consume":
        parts = [
            f"{KAFKA_BIN}/kafka-console-consumer.sh --bootstrap-server {BOOTSTRAP}",
            f"--topic {shlex.quote(args.topic)}",
        ]
        if args.from_beginning:
            parts.append("--from-beginning")
        if args.max_messages is not None:
            parts.append(f"--max-messages {args.max_messages}")
        if args.partition is not None:
            parts.append(f"--partition {args.partition}")
        if args.offset is not None:
            parts.append(f"--offset {shlex.quote(str(args.offset))}")
        if args.show_key:
            parts.append("--property print.key=true --property key.separator=:")
        if args.print_timestamp:
            parts.append("--property print.timestamp=true")
        if args.timeout_ms is not None:
            parts.append(f"--timeout-ms {args.timeout_ms}")
        cmd = " ".join(parts)
    elif args.cmd == "produce":
        parts = [
            f"{KAFKA_BIN}/kafka-console-producer.sh --bootstrap-server {BOOTSTRAP}",
            f"--topic {shlex.quote(args.topic)}",
            "--property parse.key=true",
            f"--property key.separator={shlex.quote(args.key_separator)}",
        ]
        cmd = " ".join(parts)
        if args.message is not None:
            stdin = args.message
        elif args.file is not None:
            with open(args.file) as f:
                stdin = f.read()
        else:
            stdin = sys.stdin.read()
        return cmd, stdin
    elif args.cmd == "query":
        spec = args.topic
        if getattr(args, "partition", None) is not None:
            spec = f"{args.topic}:{args.partition}"
        cmd = (
            f"{KAFKA_BIN}/kafka-get-offsets.sh --bootstrap-server {BOOTSTRAP} "
            f"--topic {shlex.quote(spec)}"
        )
    else:  # pragma: no cover
        raise SystemExit(f"unknown command {args.cmd}")

    return cmd, None


if __name__ == "__main__":
    raise SystemExit(main())
