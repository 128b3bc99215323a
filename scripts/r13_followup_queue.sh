#!/bin/bash
# waits for the main r13 queue, then runs the follow-up measurements
set -x
cd /root/repo
while [ ! -f /tmp/r13_queue.done ]; do sleep 30; done

# small-probe-batch sidecar A/B: the streaming regime (300-doc batches
# against the >1e6-row accumulated index)
timeout 5400 python scripts/containment_sidecar_bench.py synth:12000:2000000 16 CONTAINMENT_SIDECAR_r13_smallbatch.json 16 > /tmp/f1_sidecar_small.log 2>&1

# emb_semantic_dedup same-host A/B (timed out of the main queue's step 2)
timeout 3600 python scripts/oracle_ab_r13.py data/sf1 2bb1c3c /tmp/oab_semantic.json emb_semantic_dedup > /tmp/f2_semantic_ab.log 2>&1

echo DONE > /tmp/r13_followup.done
