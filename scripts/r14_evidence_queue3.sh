#!/bin/bash
# Round-14 OPTIMIZATION evidence queue — strictly sequential so no
# measurement is contaminated by a sibling Spark/DuckDB process.
set -x
cd /root/repo
Q=/tmp/r14q3

# 1. full sf0.01 oracle gate at optimized HEAD (the correctness gate)
timeout 2400 python scripts/verify_gate.py > $Q-1_gate001.log 2>&1

# 2. interleaved same-host bench attribution: r14 PRE-OPTIMIZATION HEAD
#    (76417b5) vs optimized HEAD, old,new,old,new + isolated movers
timeout 7200 python scripts/bench_attribution.py 76417b5 BENCH_R14PRE_VS_R14OPT.json --movers doc_triangles,doc_bpe_tokens,mm_wav_roundtrip,dim_scd2_asof_join,ev_funnel_conversion,emb_srp_topk_mp > $Q-2_bench_ab.log 2>&1

# 3. full pytest
timeout 5400 python -m pytest tests/ -q > $Q-3_pytest.log 2>&1

# 4. 100TB-conf safety check (join-strategy flips under cluster conf)
timeout 3600 python scripts/conf_100tb_check.py /root/testdata/sf0.1 16 > $Q-4_conf.log 2>&1
tail -1 $Q-4_conf.log > CONF100TB_r14.json

# 5. final local bench (tail-safe JSON)
timeout 3600 python bench.py 2>/dev/null | tail -1 > BENCH_LOCAL_r14.json

echo DONE > /tmp/r14_queue3.done
