"""On-chip stress-scale (128x10k f32) train-step timing of the three
EdgeConv training sweep schedules (ops/edgeconv_train `mode`;
docs/Roofline.md "Layer-streamed statistics"). Writes
parity_run/edgeconv_mode_sweep.json."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import measure_train_step

out = {'batch': 128, 'points': 10000, 'dtype': 'f32'}
for mode in ('chunked', 'fused_final', 'streamed'):
    try:
        ms = measure_train_step(batch=128, num_points=10000, steps=2,
                                edgeconv_train_mode=mode)
        out[mode + '_ms'] = round(ms, 2)
    except Exception as e:  # noqa: BLE001 — OOM/compile failures recorded
        out[mode + '_error'] = f'{type(e).__name__}: {e}'[:300]
    print(mode, out.get(mode + '_ms', out.get(mode + '_error')), flush=True)

Path(__file__).with_name('edgeconv_mode_sweep.json').write_text(
    json.dumps(out, indent=1))
print(json.dumps(out, indent=1))
