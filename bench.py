"""Benchmark: flagship-model inference throughput (point clouds/sec/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

`vs_baseline` compares against a single-core CPU run of the same model
(the reference implementation is CPU/GPU torch; BASELINE.json's north star is
">=20x CPU-reference point-clouds/sec/chip at batch 64"). The CPU number is
measured once in a subprocess (JAX_PLATFORMS=cpu) and cached in
.bench_cpu_baseline.json.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

BATCH = 64
NUM_POINTS = 2000
CPU_BATCH = 4          # CPU is ~3 orders slower; throughput is per-cloud
CACHE = Path(__file__).parent / '.bench_cpu_baseline.json'


def measure(batch, num_points, warmup=1, iters=5):
    """Per-batch forward time with the iteration loop ON DEVICE (one host
    dispatch), so tunnel/dispatch latency doesn't pollute the number."""
    from garment_pattern_estimation_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, str(Path(__file__).parent))
    from __graft_entry__ import entry

    forward, (features,) = entry(batch_size=batch, num_points=num_points)

    @jax.jit
    def run(v):
        def step(_, acc):
            out = forward(v + acc * 1e-12)  # chain: no cross-iteration overlap
            return out['outlines'].sum() * 1e-12
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    for _ in range(warmup):
        np.asarray(run(features))  # compile + full sync
    start = time.perf_counter()
    np.asarray(run(features))
    elapsed = (time.perf_counter() - start) / iters
    return batch / elapsed, elapsed


def cpu_baseline():
    if CACHE.exists():
        return json.loads(CACHE.read_text())['clouds_per_sec']
    # JAX_PLATFORM_NAME: JAX_PLATFORMS alone is ignored when the axon TPU
    # plugin is present
    env = dict(os.environ, JAX_PLATFORMS='cpu', JAX_PLATFORM_NAME='cpu')
    code = (
        'import json, sys; sys.path.insert(0, "."); '
        'from bench import measure; '
        f'tput, t = measure({CPU_BATCH}, {NUM_POINTS}, warmup=1, iters=2); '
        'print("CPU_RESULT", json.dumps({"clouds_per_sec": tput}))'
    )
    result = subprocess.run([sys.executable, '-c', code], env=env,
                            capture_output=True, text=True, timeout=3600,
                            cwd=str(Path(__file__).parent))
    for line in result.stdout.splitlines():
        if line.startswith('CPU_RESULT'):
            payload = json.loads(line.split(' ', 1)[1])
            CACHE.write_text(json.dumps(payload))
            return payload['clouds_per_sec']
    print(result.stdout[-2000:], file=sys.stderr)
    print(result.stderr[-2000:], file=sys.stderr)
    raise RuntimeError('bench::CPU baseline measurement failed')


def main():
    tput, step_time = measure(BATCH, NUM_POINTS)
    try:
        baseline = cpu_baseline()
        vs_baseline = tput / baseline
    except Exception as e:
        print(f'bench::warning::no CPU baseline ({e})', file=sys.stderr)
        vs_baseline = None
    print(json.dumps({
        'metric': f'inference point-clouds/sec/chip (att model, batch {BATCH}, '
                  f'{NUM_POINTS} pts)',
        'value': round(tput, 2),
        'unit': 'clouds/s',
        'vs_baseline': round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == '__main__':
    main()
