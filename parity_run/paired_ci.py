"""Bootstrap CI over matched-init paired A/B deltas (VERDICT r4 #4).

Combines one or more parity_check reports that trained matched-init pairs
on IDENTICAL materialized batches (same config + dataset + split + loader
seeds; init seeds differ per pair): for report with train_seed s and
--jax_seeds/--noise_seeds N, pairs are (torch_s, jax_s), (torch_{s+1},
jax_{s+1}), ... Emits, per metric, the mean signed relative delta
(jax - torch) / |torch| with a percentile-bootstrap 95% CI over pairs.

Usage:
    python parity_run/paired_ci.py report1.json report2.json ... \
        [--output parity_run/paired_ci.json]
"""
import argparse
import json
from pathlib import Path

import numpy as np

METRICS = ('panel_shape_l2', 'num_panels_accuracy', 'num_edges_accuracy',
           'rotation_l2', 'translation_l2')


def pairs_from_report(report):
    """[(torch_metrics, jax_metrics)] matched by init seed.

    Falls back to the incremental `_resume_*` stashes parity_check flushes
    after every arm, so a campaign interrupted mid-run still yields every
    completed pair."""
    torch_pool = [report.get('torch_trained_metrics')
                  or report.get('_resume_torch_base_metrics')] \
        + list(report.get('torch_noise_seed_metrics')
               or report.get('_resume_torch_noise_metrics', []))
    jax_pool = [report.get('trained_shape_metrics')
                or report.get('_resume_jax_base_metrics')] \
        + list(report.get('jax_seed_metrics')
               or report.get('_resume_jax_seed_metrics', []))
    return [(t, j) for t, j in zip(torch_pool, jax_pool)
            if t is not None and j is not None]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('reports', nargs='+')
    parser.add_argument('--output', default='parity_run/paired_ci.json')
    parser.add_argument('--bootstrap', type=int, default=20000)
    args = parser.parse_args(argv)

    all_pairs = []
    for path in args.reports:
        report = json.loads(Path(path).read_text())
        found = pairs_from_report(report)
        print(f'{path}: {len(found)} matched pairs')
        all_pairs += found

    rng = np.random.default_rng(0)
    out = {'n_pairs': len(all_pairs), 'reports': list(args.reports),
           'metrics': {}}
    for key in METRICS:
        deltas = np.array([
            (j[key] - t[key]) / max(abs(t[key]), 1e-3)
            for t, j in all_pairs
            if t.get(key) is not None and j.get(key) is not None])
        if not len(deltas):
            continue
        boots = rng.choice(deltas, size=(args.bootstrap, len(deltas)),
                           replace=True).mean(axis=1)
        lo, hi = np.percentile(boots, [2.5, 97.5])
        out['metrics'][key] = {
            'per_pair_signed': [round(float(d), 5) for d in deltas],
            'mean_signed': round(float(deltas.mean()), 5),
            'ci95': [round(float(lo), 5), round(float(hi), 5)],
            'ci_halfwidth': round(float((hi - lo) / 2), 5),
            'pair_std': round(float(deltas.std(ddof=1)), 5)
            if len(deltas) > 1 else None,
        }
        print(f"{key:24s} mean {deltas.mean():+.4f}  "
              f"95% CI [{lo:+.4f}, {hi:+.4f}]  (n={len(deltas)})")

    Path(args.output).write_text(json.dumps(out, indent=1))
    print(f'-> {args.output}')


if __name__ == '__main__':
    main()
