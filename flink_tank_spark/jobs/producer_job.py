"""Synthetic producer entrypoint (reference S4, EventProducer.kt:53-123).

Same distributions as the reference producer; writes to Kafka when a
client is available, else to a JSONL directory (useful as a file-source
feed for the streaming jobs in offline environments).
"""

from __future__ import annotations

import argparse

from flink_tank_spark.producer import run_live, write_jsonl


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="Synthetic event producer")
    ap.add_argument("--brokers", default=None, help="Kafka brokers (live mode)")
    ap.add_argument("--topic", default="input-events")
    ap.add_argument("--rate", type=float, default=2.0, help="events/second (live)")
    ap.add_argument("--jsonl", default=None, help="write N events to this file instead")
    ap.add_argument("--count", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    if args.jsonl:
        n = write_jsonl(args.jsonl, args.count, seed=args.seed)
        print(f"wrote {n} events to {args.jsonl}")
    elif args.brokers:
        run_live(args.brokers, args.topic, events_per_second=args.rate, seed=args.seed)
    else:
        ap.error("pass --jsonl PATH for file output or --brokers for live Kafka")


if __name__ == "__main__":
    main()
