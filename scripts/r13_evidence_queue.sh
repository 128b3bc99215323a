#!/bin/bash
# Round-13 evidence queue — heavy jobs strictly sequential so no
# measurement is contaminated by a sibling Spark/DuckDB process.
set -x
cd /root/repo

# 1. targeted sf0.01 gate over the 16 oracle-changed queries
SPARK_GRAFT_GATE_ONLY=doc_lsh_near_dups,doc_containment_dups,emb_near_dup_pairs,emb_srp_near_dups,doc_dedup_groups,doc_containment_corpus,doc_ppjoin_near_dups,doc_split_leakage,doc_dedup_corpus,emb_semantic_dedup,doc_minhash_est,doc_pagerank,doc_triangles,doc_kcore,doc_canonical_by_pr,emb_srp_near_dups_mp \
  timeout 1200 python scripts/verify_gate.py > /tmp/q1_gate16.log 2>&1

# 2. same-host old-vs-new oracle A/B at sf1 (frames asserted equal)
timeout 5400 python scripts/oracle_ab_r13.py data/sf1 2bb1c3c ORACLE_AB_r13.json > /tmp/q2_oracle_ab.log 2>&1

# 3. containment sidecar A/B on the high-vocabulary synthetic corpus
timeout 5400 python scripts/containment_sidecar_bench.py synth:12000:2000000 16 CONTAINMENT_SIDECAR_r13.json > /tmp/q3_sidecar.log 2>&1

# 4. full pytest suite, run 1
timeout 3600 python -m pytest tests/ -q > /tmp/q4_pytest1.log 2>&1

# 5. full sf0.01 gate at HEAD
timeout 1200 python scripts/verify_gate.py > /tmp/q5_gate001.log 2>&1

# 6. full sf1 gate (the r12 log's biggest oracle rows should be visibly down)
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

echo DONE > /tmp/r13_queue.done
