#!/bin/bash
# Regenerate the ab_r5 campaign dataset bit-faithfully after a VM restart
# (the ./data directory is untracked and does not survive re-provisioning).
# Recipe verified by parity_run/dataset_fingerprint_probe.py: the regenerated
# copy must reproduce the campaign's matched-init torch step-0 loss
# 0.752232552 to <1e-4 relative. Two load-bearing details discovered the
# hard way (2026-08-20 restart):
#   * NO with_scan (scan generation consumes extra RNG draws and shifts
#     every subsequent datapoint's geometry);
#   * panel_classes.json must be panel_classes_for_templates() (the
#     role-based classes introduced with the round-5 templates), NOT the
#     older per-panel classes shipped in parity_run/data_big.
set -eu
cd /root/repo
python -c "
from garment_pattern_estimation_tpu.utils.synthetic import (
    generate_dataset, panel_classes_for_templates)
generate_dataset('data', samples_per_folder=300, seed=0)
panel_classes_for_templates('data/panel_classes.json')
print('data/ regenerated')
"
JAX_PLATFORM_NAME=cpu python parity_run/dataset_fingerprint_probe.py
