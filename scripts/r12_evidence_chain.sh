#!/bin/bash
# Round-12 evidence chain — run AFTER the sf1 gate frees the machine.
# Each step logs to /tmp and appends a DONE marker; timing-sensitive
# steps (bench) run first on the quiet machine.
set -x
cd /root/repo

# 1. headline bench at sf0.1 (cold JVM, then the warm pass inside)
timeout 3600 python bench.py > /tmp/bench_r12.log 2>/dev/null
echo DONE_BENCH >> /tmp/bench_r12.log

# 2. sf5 two-layout partition invariance for round-new/changed queries
ONLY=emb_srp_recall_mp,doc_dsir_topk,doc_containment_corpus,ev_json_extract,doc_bpe_merges256,doc_bpe_tokens256,doc_dsir_weights,doc_bpe_tokens
timeout 5400 python scripts/partition_invariance.py data/sf5 32 32 --only=$ONLY > /tmp/pi_a.txt 2>/dev/null
timeout 5400 python scripts/partition_invariance.py data/sf5 5 11 --only=$ONLY > /tmp/pi_b.txt 2>/dev/null
{ diff /tmp/pi_a.txt /tmp/pi_b.txt && echo INVARIANT-OK; } > /tmp/invariance_r12.log 2>&1
cat /tmp/pi_a.txt >> /tmp/invariance_r12.log
echo DONE_INVARIANCE >> /tmp/invariance_r12.log

# 3. streaming curation drains incl. the new BPE twin (bit-parity inside)
timeout 7200 python scripts/bench_streaming_curation.py data/sf1 16 8 > /tmp/curation_bench_r12.log 2>/dev/null
echo DONE_CURATION_BENCH >> /tmp/curation_bench_r12.log

# 4. end-to-end curation job rehearsal at sf1, every optional stage on
{ time timeout 3600 python -m flink_tank_spark.jobs.curation_job \
    --sf-dir data/sf1 --out /tmp/curation_sf1_corpus --containment \
    --sample-k 5000 --dsir-scores --vocab-stats 2>/dev/null ; } \
    > /tmp/curation_sf1_r12.log 2>&1
echo DONE_CURATION_SF1 >> /tmp/curation_sf1_r12.log

# 5. full pytest
timeout 7200 python -m pytest tests/ -q > /tmp/pytest_r12.log 2>&1
echo DONE_PYTEST >> /tmp/pytest_r12.log

echo ALL_DONE
