#!/bin/bash
# Round-14 evidence queue — heavy jobs strictly sequential so no
# measurement is contaminated by a sibling Spark/DuckDB process.
# Order follows the r13 verdict's ranked list: the never-run follow-up
# A/Bs and the attribution artifacts first, gates after.
set -x
cd /root/repo
Q=/tmp/r14q

# 1. emb_semantic_dedup same-host oracle A/B at sf1 (verdict #1b — the
#    r13 queue timed out before measuring it; 1.82x was inferred)
timeout 5400 python scripts/oracle_ab_r13.py data/sf1 2bb1c3c ORACLE_AB_r14_semantic.json emb_semantic_dedup > $Q-1_semantic_ab.log 2>&1

# 2. emb_srp_near_dups_mp oracle gate-row attribution (verdict #3 —
#    gate read 180.8 s vs the measured 71.7 s A/B; quiet-host
#    interleaved old/new decides contention vs pessimization)
timeout 5400 python scripts/oracle_ab_r13.py data/sf1 2bb1c3c ORACLE_AB_r14_srp_mp.json emb_srp_near_dups_mp > $Q-2_srp_mp_ab.log 2>&1

# 3. cross-round same-host bench attribution (verdict #2): r12 HEAD's
#    bench.py interleaved with r14 HEAD, plus isolated A/B of the four
#    >2x raw movers
timeout 5400 python scripts/bench_attribution.py 93340e3 BENCH_R12CODE_ON_R14HOST.json --movers emb_srp_topk,emb_srp_topk_mp,ev_funnel_conversion,emb_near_dup_pairs > $Q-3_bench_attr.log 2>&1

# 4. BPE batched-vs-unbatched END-TO-END in the >=1e6-pair-dict regime
#    (verdict #5): multi-script 1M-word vocabulary, 256 merges both ways
timeout 5400 python scripts/bpe_incremental_scale.py 1000000 256 BPE_SCALE_r14.json multiscript 1 > $Q-4_bpe.log 2>&1

# 5. full pytest suite, run 1
timeout 4500 python -m pytest tests/ -q > $Q-5_pytest1.log 2>&1

# 6. full sf0.01 gate at queue HEAD
timeout 1200 python scripts/verify_gate.py > $Q-6_gate001.log 2>&1

# 7. full sf1 gate
timeout 7200 python scripts/verify_gate.py data/sf1 24 > GATE_SF1_r14_full.log 2>&1

# 8. sf5 two-layout invariance — no registry query changed this round,
#    so rotate freshness through the r10-stale cert head
ONLY=doc_quality,emb_cosine_topk,emb_ivf_topk,doc_simhash_near_dups,doc_weighted_sample,doc_vocab_coverage
python scripts/partition_invariance.py data/sf5 32 32 --only=$ONLY 2>/dev/null > /tmp/pi_a14.txt
python scripts/partition_invariance.py data/sf5 5 11 --only=$ONLY 2>/dev/null > /tmp/pi_b14.txt
diff /tmp/pi_a14.txt /tmp/pi_b14.txt > /tmp/q8_invariance.diff 2>&1 && echo INVARIANT-OK >> /tmp/q8_invariance.diff
cp /tmp/pi_a14.txt INVARIANCE_SF5_r14.txt
cat /tmp/q8_invariance.diff >> INVARIANCE_SF5_r14.txt

# 9. 100TB-conf safety check
timeout 3600 python scripts/conf_100tb_check.py /root/testdata/sf0.1 16 > $Q-9_conf.log 2>&1
tail -1 $Q-9_conf.log > CONF100TB_r14.json

# 10. local bench at sf0.1 (tail-safe JSON: warm total/queries last)
timeout 3600 python bench.py 2>/dev/null | tail -1 > BENCH_LOCAL_r14.json

# 11. full pytest suite, run 2
timeout 4500 python -m pytest tests/ -q > $Q-11_pytest2.log 2>&1

echo DONE > /tmp/r14_queue.done
