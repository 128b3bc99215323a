"""PySpark worker daemon with the heavy imports pre-loaded.

Drop-in replacement for ``pyspark.daemon`` (wired via the public
``spark.python.daemon.module`` conf in session.get_spark): the daemon
process imports numpy / pandas / pyarrow ONCE before it starts forking
task workers, so every forked worker inherits the already-initialized
modules through copy-on-write instead of re-importing them on first use.

Why it matters here (guide §4.5 — heavyweight init once, measured r14):
on this VM family a COLD Python worker servicing its first Arrow batch
paid ~8 s (32 concurrent forks × numpy/pandas import under CPU steal
and a cold page cache); with ~15 registry queries crossing the Python
boundary, first-touch runs of the similarity / multimodal / SRP
families were dominated by worker spawn (mm_wav_roundtrip cold profile:
run=2624 s across 32 tasks vs cpu=7 s — tasks *waiting*, not
computing). Pre-importing in the daemon turns that per-worker cost into
one per-executor cost.

The same trick works unchanged on a real cluster: the conf ships with
the job, and each executor's daemon pays the import once instead of
``spark.executor.cores`` times. If any import is missing the daemon
falls back silently to a bare pyspark.daemon — identical behavior,
just without the warm start (workers import on demand as before).
"""

from __future__ import annotations

for _mod in ("numpy", "pandas", "pyarrow"):
    try:  # pragma: no cover - trivial import guard
        __import__(_mod)
    except Exception:  # noqa: BLE001 - any import failure = plain daemon
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
