#!/bin/sh
# Second config-4 probe-ranking ablation wave (runs on the index saved
# by ablation_cfg4_probe.sh).  Tests the spill-alignment hypothesis:
# probe-spill appends boundary rows to their 2nd cell's blocks AFTER
# the cell's natural rows, so 64-row sub-centroids (sub=8 at block=512)
# are no longer cluster-pure — sub=16 (32-row granularity) restores an
# undiluted mini-centroid per natural cluster.  Also probes the QPS
# side: hier_t=32 halves the final merge width vs 64 at a measured
# recall cost (hier_t must cover a block's share of the true top-C;
# clusters are 64 dupes, so 32 MAY truncate — that cost is the point).
set -e
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
STORE=/tmp/archi_host_store/cfg4_12.bf16
IDX=/tmp/cfg4_12_idx
ROWS=12582912

# treatment 3: f32 bc + sub=16
python scripts/run_config4.py /root/repo/benchmark_results/r5/cfg4_12_sub16.json \
    --rows $ROWS --nlist 4096 --spill 0.15 --opq 4 \
    --index "$IDX" --store "$STORE" --no-adc --bc-dtype f32 --sub 16 \
    --rerank-sweep 256:320,384:320,512:320,768:320

# treatment 4: QPS lever — hier_t=32 at the recall frontier points
python scripts/run_config4.py /root/repo/benchmark_results/r5/cfg4_12_hier32.json \
    --rows $ROWS --nlist 4096 --spill 0.15 --opq 4 \
    --index "$IDX" --store "$STORE" --no-adc --bc-dtype f32 --hier-t 32 \
    --rerank-sweep 512:320,768:320
echo ABLATION2_DONE
