#!/bin/bash
# Round-13 evidence queue, phase 2 (after the emb_n revert)
set -x
cd /root/repo

# 6. full sf1 gate
timeout 7200 python scripts/verify_gate.py data/sf1 24 > GATE_SF1_r13_full.log 2>&1

# 7. sf5 two-layout invariance for the round-touched queries
python scripts/partition_invariance.py data/sf5 32 32 --only=doc_containment_corpus,doc_ppjoin_near_dups,doc_lsh_near_dups,doc_bpe_merges256,doc_bpe_tokens256 2>/dev/null > /tmp/pi_a13.txt
python scripts/partition_invariance.py data/sf5 5 11 --only=doc_containment_corpus,doc_ppjoin_near_dups,doc_lsh_near_dups,doc_bpe_merges256,doc_bpe_tokens256 2>/dev/null > /tmp/pi_b13.txt
diff /tmp/pi_a13.txt /tmp/pi_b13.txt > /tmp/q7_invariance.diff 2>&1 && echo INVARIANT-OK >> /tmp/q7_invariance.diff
cp /tmp/pi_a13.txt INVARIANCE_SF5_r13.txt
cat /tmp/q7_invariance.diff >> INVARIANCE_SF5_r13.txt

# 8. 100TB-conf safety check
timeout 3600 python scripts/conf_100tb_check.py /root/testdata/sf0.1 16 > /tmp/q8_conf.log 2>&1
tail -1 /tmp/q8_conf.log > CONF100TB_r13.json

# 9. local bench at sf0.1 (spread-aware)
timeout 3600 python bench.py 2>/dev/null | tail -1 > BENCH_LOCAL_r13.json

# 10. full pytest suite, run 2
timeout 3600 python -m pytest tests/ -q > /tmp/q10_pytest2.log 2>&1

# follow-ups
timeout 3600 python scripts/containment_sidecar_bench.py synth:12000:2000000 16 CONTAINMENT_SIDECAR_r13_smallbatch.json 16 > /tmp/f1_sidecar_small.log 2>&1
timeout 3600 python scripts/oracle_ab_r13.py data/sf1 2bb1c3c /tmp/oab_ppjoin_final.json doc_ppjoin_near_dups > /tmp/f2_ppjoin_final_ab.log 2>&1

echo DONE > /tmp/r13_queue2.done
