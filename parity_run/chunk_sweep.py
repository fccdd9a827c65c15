"""On-chip sweep of NN.edgeconv_train_chunk for the 128x10k stress training
step (VERDICT r3 #9). Runs bench.measure_train_step at each chunk width and
writes one JSON line per point to parity_run/chunk_sweep.json.

Usage: python parity_run/chunk_sweep.py  (needs the real TPU)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import bench  # noqa: E402

OUT = Path(__file__).parent / 'chunk_sweep.json'
CHUNKS = [None, 128, 256, 512, 1024, 2048]  # None = current heuristic

results = []
for chunk in CHUNKS:
    t0 = time.time()
    try:
        ms = bench.measure_train_step(batch=128, num_points=10000, steps=3,
                                      edgeconv_train_chunk=chunk)
        row = {'chunk': chunk, 'stress_train_step_ms': round(ms, 1),
               'wall_s': round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        row = {'chunk': chunk, 'error': f'{type(e).__name__}: {e}',
               'wall_s': round(time.time() - t0, 1)}
    results.append(row)
    print(json.dumps(row), flush=True)
    OUT.write_text(json.dumps(results, indent=1))
print('sweep done', flush=True)
