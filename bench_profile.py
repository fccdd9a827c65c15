"""Per-op TPU time breakdown of the flagship train/inference steps.

Captures a `jax.profiler` trace of the benched computation on the real chip
and aggregates XLA op durations from the trace events — the data that decides
which kernel gets optimized next. Not part of the driver bench contract;
a development tool (README §Tests & bench).

    python bench_profile.py [train|infer|infer_bf16|train_bf16] [top_n]
"""
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def _aggregate_trace(log_dir):
    """Sum durations per (pid/device, op name) from the profiler's
    trace.json.gz; returns [(name, total_us, count)] on the TPU device."""
    paths = glob.glob(str(Path(log_dir) / '**' / '*.trace.json.gz'),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f'no trace.json.gz under {log_dir}')
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])

    # find TPU device pids (process names like '/device:TPU:0' / 'TPU:0')
    pid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e.get('args', {}).get('name', '')
    tpu_pids = {pid for pid, name in pid_names.items()
                if 'TPU' in name.upper() and 'host' not in name.lower()}

    totals = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in tpu_pids:
            continue
        name = e.get('name', '?')
        # keep the XLA-op lane: skip the step-number lane (pure digits) and
        # the module envelope lane ('jit_<fn>(fingerprint)')
        if name.isdigit() or name.startswith('jit_'):
            continue
        totals[name][0] += float(e.get('dur', 0.0))
        totals[name][1] += 1
    return sorted(((n, t, c) for n, (t, c) in totals.items()),
                  key=lambda x: -x[1])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'train'
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    log_dir = Path('/tmp/gpe_profile') / mode
    log_dir.mkdir(parents=True, exist_ok=True)

    import jax
    import bench

    compute_dtype = 'bfloat16' if mode.endswith('_bf16') else None
    if mode == 'stress':
        # stress training step (128x10k): the chunked EdgeConv path
        bench.measure_train_step(batch=128, num_points=10000, steps=1)
        with jax.profiler.trace(str(log_dir)):
            ms = bench.measure_train_step(batch=128, num_points=10000,
                                          steps=2)
        print(f'stress train step: {ms:.2f} ms')
    elif mode.startswith('train'):
        # warm compile outside the trace
        bench.measure_train_step(steps=2, compute_dtype=compute_dtype)
        with jax.profiler.trace(str(log_dir)):
            ms = bench.measure_train_step(steps=10, compute_dtype=compute_dtype)
        print(f'train step: {ms:.2f} ms')
        iters = 10 + 2  # compile call runs one step too? (kept: report raw)
    else:
        bench.measure_inference(bench.BATCH, bench.NUM_POINTS, warmup=1,
                                iters=2, compute_dtype=compute_dtype)
        with jax.profiler.trace(str(log_dir)):
            tput, elapsed = bench.measure_inference(
                bench.BATCH, bench.NUM_POINTS, warmup=1, iters=5,
                compute_dtype=compute_dtype)
        print(f'inference: {tput:.1f} clouds/s ({elapsed * 1e3:.2f} ms/batch)')

    rows = _aggregate_trace(log_dir)
    total = sum(t for _, t, _ in rows)
    print(f'\n{"us total":>12} {"#":>6}  {"%":>5}  op')
    for name, t_us, count in rows[:top_n]:
        print(f'{t_us:12.0f} {count:6d}  {100 * t_us / max(total, 1e-9):5.1f}  '
              f'{name[:110]}')
    print(f'{total:12.0f}        100.0  TOTAL (device op time)')


if __name__ == '__main__':
    main()
