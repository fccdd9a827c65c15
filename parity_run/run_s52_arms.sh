#!/bin/bash
# Round-5 precision-tail arms (VERDICT r4 #7): second seed (52) for the
# bf16 / f32 / bf16+f32-tail three-arm comparison, plus a tail-length
# sensitivity point (tail 50 on the round-4 seed). Serialized: only one
# process may hold the tunneled TPU. Resumable: arms whose run dir has a
# finished.marker are skipped, so a VM restart costs at most the arm in
# flight — rerun this script to continue.
set -u
cd /root/repo
for cfg in shape_r5_bf16_s52 shape_r5_tail100_s52 shape_r5_f32_s52 shape_r5_tail50_sA; do
  if ls output/experiments/TPU-Demo/${cfg}_*/finished.marker >/dev/null 2>&1; then
    echo "=== $cfg already finished, skipping"
    continue
  fi
  echo "=== $(date +%H:%M:%S) training $cfg"
  timeout 10800 python -m garment_pattern_estimation_tpu.cli.train -c demo_configs/${cfg}.yaml > /tmp/${cfg}.log 2>&1
  echo "=== $(date +%H:%M:%S) $cfg exit=$?"
done
echo ALL_ARMS_DONE
