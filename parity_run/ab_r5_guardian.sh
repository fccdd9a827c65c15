#!/bin/bash
# Guardian for the resumable ab_r5 campaign: the environment can restart at
# any moment and wipes untracked state, so (1) commit the per-arm flushed
# report whenever it changes, (2) when the campaign process exits, compute
# the paired bootstrap CI and commit the final artifacts. Prose/table in
# docs/ParityResults.md is written by hand from the committed numbers.
set -u
cd /root/repo
PID=$(cat /tmp/ab_r5.pid 2>/dev/null || echo 0)
while kill -0 "$PID" 2>/dev/null; do
  sleep 300
  if ! git diff --quiet -- parity_run/train_ab_r5_a.json; then
    git add parity_run/train_ab_r5_a.json
    git commit -q -m "ab_r5: campaign checkpoint (arm flushed)

No-Verification-Needed: measurement artifact flush only" || true
  fi
done
python3 parity_run/paired_ci.py parity_run/train_ab_r5_a.json \
  --output parity_run/paired_ci.json > parity_run/paired_ci.log 2>&1
git add parity_run/train_ab_r5_a.json parity_run/paired_ci.json \
  parity_run/paired_ci.log parity_run/train_ab_r5_resume.log
git commit -q -m "ab_r5: campaign finished — report + paired bootstrap CI artifacts

No-Verification-Needed: measurement artifacts only" || true
echo GUARDIAN_DONE
