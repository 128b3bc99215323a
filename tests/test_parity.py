"""Oracle parity for every registered query (mirrors the driver's gate).

Runs each QuerySpec's Spark plan vs its DuckDB oracle at sf0.001 and
asserts exact value equality after canonicalization. Queries without an
oracle get a rows-only smoke check.
"""

from __future__ import annotations

import pytest

from flink_tank_spark.plans.oracle import check_query
from flink_tank_spark.plans.registry import all_queries

SPECS = sorted(all_queries().values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_parity(spark, sf_dir, spec):
    problems = check_query(spark, sf_dir, spec)
    assert not problems, "\n".join(problems)
