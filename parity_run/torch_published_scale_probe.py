"""Measured root cause for why the trained A/B cannot run at the published
att scale in this environment (VERDICT r4 #4 asked for a published-scale
paired A/B "or a root-caused gap").

Times ONE training step (forward + composed loss + backward + Adam) of the
torch reference replica at the published att scale (EConv 200/150,
encodings 250, N=2000, batch 30 — models/att/att.yaml:44-118) on this
machine's single CPU core, and extrapolates the cost of one 6-pair A/B
campaign at the reference's 350-epoch recipe. The reference itself trained
on GPUs for 2-4 days (docs/Running.md:84); this container has no GPU and
one CPU core (nproc=1), so the torch side of a published-scale A/B is the
binding constraint — our JAX side trains in minutes on the TPU.

Writes parity_run/torch_published_scale_probe.json.
"""
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import torch

from garment_pattern_estimation_tpu.experiment.torch_reference import (
    TorchGarmentSegmentPattern3D, torch_composed_loss, _torch_gt)


def main():
    torch.manual_seed(0)
    P, L = 9, 14
    model = TorchGarmentSegmentPattern3D(
        max_pattern_len=P, max_panel_len=L, panel_encoding_size=250,
        panel_hidden_size=250, panel_n_layers=3, econv_hidden=200,
        econv_hidden_depth=2, econv_feature=150, k_neighbors=5, conv_depth=2)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    rng = np.random.default_rng(0)
    B, N = 30, 2000
    feats = torch.from_numpy(rng.normal(size=(B, N, 3)).astype(np.float32))
    gt = _torch_gt({
        'outlines': rng.normal(size=(B, P, L, 4)).astype(np.float32),
        'rotations': rng.normal(size=(B, P, 4)).astype(np.float32),
        'translations': rng.normal(size=(B, P, 3)).astype(np.float32),
        'num_edges': np.full((B, P), 6, np.int64),
        'num_panels': np.full((B,), P, np.int64),
        'empty_panels_mask': np.zeros((B, P), bool),
        'stitches': np.zeros((B, 2, 24), np.int64),
        'num_stitches': np.ones((B,), np.int64),
        'free_edges_mask': np.ones((B, P, L), bool),
        'stitch_tags': rng.normal(size=(B, P, L, 3)).astype(np.float32),
    })
    pad = torch.zeros(4)

    times = []
    for i in range(4):
        t0 = time.perf_counter()
        opt.zero_grad()
        preds = model(feats)
        loss, _ = torch_composed_loss(preds, gt, pad, 1.0)
        loss.backward()
        opt.step()
        times.append(time.perf_counter() - t0)
        print(f'step {i}: {times[-1]:.1f} s (loss {float(loss):.4f})')

    step_s = float(np.median(times[1:]))  # drop the first (allocator warmup)
    steps_per_epoch = 897 // B            # the 897-garment dataset
    arms = 6
    epochs = 350                          # published recipe, att.yaml:148
    campaign_h = arms * epochs * steps_per_epoch * step_s / 3600
    out = {
        'torch_train_step_s_published_scale': round(step_s, 2),
        'batch': B, 'points': N, 'cpu_cores': 1,
        'steps_per_epoch_897_garments': steps_per_epoch,
        'campaign_hours_6_pairs_350_epochs': round(campaign_h, 1),
        'note': ('one 6-pair matched-init A/B at the published scale costs '
                 f'~{campaign_h:.0f} h of single-core torch training; the '
                 'reference used multi-day GPU training for ONE run. The '
                 'round-5 instrument therefore runs at EConv 64/48 / '
                 'mesh 500 with a 300-garment test split instead '
                 '(parity_run/ab_r5.yaml).'),
    }
    Path(__file__).with_name('torch_published_scale_probe.json').write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
