"""Serving latency/throughput vs batch size for the exported bf16 artifact
(att model, 2000 points). Production-serving operating curve: batch 1 is the
interactive single-garment latency; large batches amortize the fixed
selection-pass cost per tile.

Usage: python parity_run/serving_sweep.py  (needs the real TPU, exclusively)
Writes one JSON row per point to parity_run/serving_sweep.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import bench  # noqa: E402

OUT = Path(__file__).parent / 'serving_sweep.json'
# iteration counts sized so the fixed ~30 ms tunnel-dispatch cost is <3%
# of the timed on-device loop at every batch (small batches need thousands
# of iterations: b=1 runs ~0.22 ms/dispatch)
BATCHES = [(1, 5000), (8, 1000), (32, 250), (64, 100), (128, 50), (256, 50)]

results = []
for b, iters in BATCHES:
    t0 = time.time()
    try:
        clouds_per_sec = bench.measure_serving_artifact(batch=b, iters=iters)
        row = {'batch': b, 'iters': iters,
               'latency_ms': round(b / clouds_per_sec * 1e3, 3),
               'clouds_per_sec': round(clouds_per_sec, 1),
               'wall_s': round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        row = {'batch': b, 'iters': iters,
               'error': f'{type(e).__name__}: {e}',
               'wall_s': round(time.time() - t0, 1)}
    results.append(row)
    print(json.dumps(row), flush=True)
    OUT.write_text(json.dumps(results, indent=1))
print('sweep done', flush=True)
