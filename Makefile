# Developer entrypoints (mirrors .claude/skills/verify/SKILL.md)

.PHONY: test verify bench slow-parity list

test:
	python -m pytest tests/ -q

verify:
	python scripts/verify_gate.py

bench:
	python bench.py 2>/dev/null | tail -1

slow-parity:
	SPARK_GRAFT_SLOW_TESTS=1 python -m pytest tests/test_parity_sf01.py -q

list:
	python -m flink_tank_spark.tools.run_query --list
