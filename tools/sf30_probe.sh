#!/bin/bash
# r12 stretch item: extend the scale evidence another half-decade — a
# pooled-minimum bench probe of the capstone quartet at sf30 (300x the
# gate tile; 3x the sf10 register scale). One tile, two runs, minima;
# the result lands in BENCH_ALL.json as an "sf30" key on the four rows
# (and a narrative row in SURVEY §5 if a knee shows up).
set -e
cd /root/repo
SF30=${SF30TILE:-/tmp/sf30_r13}
REG='^(ta_pipeline_full|mm_pipeline_full|dd_pipeline_indexed|st_pipeline_monitor)$'
[ -d $SF30 ] || SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 $SF30 300"
for i in 1 2; do
  SPARK_DRIVER_MEM=96g SPARK_GRAFT_SHUFFLE=512 \
    sbt -batch "runMain graft.BenchScale $SF30 2 /tmp/s30_$i.json \"$REG\""
done
python3 tools/pool_mins.py /tmp/s30_pooled.json /tmp/s30_{1,2}.json
python3 - <<'EOF'
import json
donor = json.load(open('/tmp/s30_pooled.json'))
tgt = json.load(open('BENCH_ALL.json'))
for k, v in donor['queries_min'].items():
    row = tgt['entries'][k]
    row['sf30'] = v
    if row.get('sf0.1'):
        row['r300'] = round(v / row['sf0.1'], 2)
    if 'queries_first' in donor and k in donor['queries_first']:
        row['sf30_first'] = donor['queries_first'][k]
    print(k, row)
json.dump(tgt, open('BENCH_ALL.json', 'w'))
print('wrote BENCH_ALL.json with sf30 probe rows')
EOF
echo SF30_PROBE_DONE
