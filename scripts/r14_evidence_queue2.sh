#!/bin/bash
# Round-14 evidence queue, phase 2 — runs AFTER the measurement phase
# (r14_evidence_queue.sh steps 1-4) and after the round's code is
# final and committed, so pytest and the gates certify committed HEAD,
# not mid-edit disk state. Strictly sequential as always.
set -x
cd /root/repo
Q=/tmp/r14q

# 4b. BPE lazy-heap argmax measured in the SAME regime that produced
#     the batched trainer's negative result (same corpus recipe, same
#     host class): heap vs scan back-to-back, batched for reference,
#     bit-equality asserted in-script
timeout 5400 python scripts/bpe_incremental_scale.py 1000000 256 BPE_SCALE_r14_heap.json multiscript 1 > $Q-4b_bpe_heap.log 2>&1

# 5. full pytest suite, run 1
timeout 4500 python -m pytest tests/ -q > $Q-5_pytest1.log 2>&1

# 6. full sf0.01 gate (includes the new doc_source_overlap)
timeout 1200 python scripts/verify_gate.py > $Q-6_gate001.log 2>&1

# 7. full sf1 gate
timeout 7200 python scripts/verify_gate.py data/sf1 24 > GATE_SF1_r14_full.log 2>&1

# 8. sf5 two-layout invariance — the round-new query plus a rotating
#    slice of the r10-stale cert head
ONLY=doc_source_overlap,doc_quality,emb_cosine_topk,emb_ivf_topk,doc_simhash_near_dups,doc_weighted_sample,doc_vocab_coverage
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

echo DONE > /tmp/r14_queue2.done
