#!/bin/sh
# Config-4 probe-ranking ablation at 12-block scale (12.58M rows, same
# 64-dupe cluster density as the 100M run; n_blocks=24576, nlist=4096 =
# 1.3*sqrt(N) scaling).  Measures whether the two untested block-RANKING
# noise sources — bf16 mini-centroid rounding and the ungated noise
# field — bound the probe-limited recall frontier that spill+OPQ left
# (CONFIG4_r04_sweep2.json: rerank_c 320->1280 flat => probe-bound).
# Probe budgets are the SAME block fractions as the 100M sweep points
# (2048..8192 of 196608  <=>  256..1024 of 24576).
set -e
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
STORE=/tmp/archi_host_store/cfg4_12.bf16
IDX=/tmp/cfg4_12_idx
ROWS=12582912

python scripts/fill_host_store.py --blocks 12 --threads 8 \
    --sub-rows 65536 --out "$STORE"

# control: the exact r4 production settings (bf16 bc, sub=8, no gate)
python scripts/run_config4.py /root/repo/benchmark_results/r5/cfg4_12_control.json \
    --rows $ROWS --nlist 4096 --spill 0.15 --opq 4 \
    --index "$IDX" --store "$STORE" --no-adc \
    --rerank-sweep 256:320,384:320,512:320,768:320,1024:320

# treatment 1: f32 mini-centroids (kills the ~0.3% bf16 ranking noise)
python scripts/run_config4.py /root/repo/benchmark_results/r5/cfg4_12_f32bc.json \
    --rows $ROWS --nlist 4096 --spill 0.15 --opq 4 \
    --index "$IDX" --store "$STORE" --no-adc --bc-dtype f32 \
    --rerank-sweep 256:320,384:320,512:320,768:320

# treatment 2: f32 bc + cell gate (shrinks the block-ranking noise
# field by nlist/gate; gate chosen at the same cell fraction that the
# probe budget implies)
python scripts/run_config4.py /root/repo/benchmark_results/r5/cfg4_12_gate.json \
    --rows $ROWS --nlist 4096 --spill 0.15 --opq 4 \
    --index "$IDX" --store "$STORE" --no-adc --bc-dtype f32 \
    --rerank-sweep 256:320:1:256,384:320:1:384,512:320:1:512,768:320:1:768
echo ABLATION_DONE
