"""Benchmark: flagship-model throughput on the real chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

The headline metric is inference point-clouds/sec/chip at the published
scale (att model, batch 64, 2000 points). `vs_baseline` divides it by the
**torch reference model running on CPU** (BASELINE.json north star:
">=20x CPU-reference clouds/sec/chip"; the reference implementation is
torch — experiment/torch_reference.py replicates its architecture exactly).
`extras` carries the training-step time at the published batch size (30,
composed loss + quality metrics, reference recipe: configs/att.yaml) and the
stress-config kNN (batch 128 x 10k points, HBM-streaming kernel).

The CPU baseline runs once in a subprocess and is cached in
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
CPU_BATCH = 30   # the published recipe's batch size (configs/att.yaml) — the
                 # baseline is measured at the same batch the reference trains
                 # and serves with, so `vs_baseline` has no normalization caveat
CACHE = Path(__file__).parent / '.bench_cpu_baseline.json'


def measure_inference(batch, num_points, warmup=1, iters=50,
                      compute_dtype=None):
    """Per-batch forward time with the iteration loop ON DEVICE (one host
    dispatch), so tunnel/dispatch latency doesn't pollute the number.
    The dispatch+fetch round trip through the tunnel is ~30 ms — measured
    directly (13.7 ms/batch extrapolated true time vs 19.99 ms at iters=5,
    15.05 at 25, 14.36 at 50) — so the iteration count must amortize it:
    at iters=50 the residual overhead is <5% of the reading.

    `compute_dtype='bfloat16'` times the mixed-precision serving mode
    (encoder matmuls + fused-EdgeConv gathers in bf16; outputs f32)."""
    from garment_pattern_estimation_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, str(Path(__file__).parent))
    from __graft_entry__ import entry

    forward, (features,) = entry(batch_size=batch, num_points=num_points,
                                 compute_dtype=compute_dtype)

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


def measure_train_step(batch=30, num_points=2000, steps=50,
                       compute_dtype=None, edgeconv_train_chunk=None,
                       f32_conv_layers=(), edgeconv_train_mode=None):
    """Published training recipe step time — and, at (128, 10000), the
    stress-config TRAINING step: the chunked rematerialized EdgeConv path
    (ops/edgeconv_train, auto-enabled past 128 MB of gathered edges) keeps
    the backward pass inside HBM where the unfused gather would OOM.

    `compute_dtype='bfloat16'` times the mixed-precision training mode
    (encoder matmuls on the MXU in bf16, params/optimizer/loss in f32 —
    the `nn.compute_dtype` config knob). `edgeconv_train_chunk` overrides
    the chunked-training sweep width (NN.edgeconv_train_chunk);
    `f32_conv_layers` measures the precision-island mode
    (NN.f32_conv_layers). `edgeconv_train_mode` selects the chunked-path
    sweep schedule (NN.edgeconv_train_mode: chunked|fused_final|streamed)."""
    return _measure_train_step(batch, num_points, steps, compute_dtype,
                               edgeconv_train_chunk, f32_conv_layers,
                               edgeconv_train_mode)


def _measure_train_step(batch, num_points, steps, compute_dtype=None,
                        edgeconv_train_chunk=None, f32_conv_layers=(),
                        edgeconv_train_mode=None):
    """Published training recipe step time: att model at full scale, composed
    loss with quality metrics (configs/att.yaml), Adam, donated buffers.
    Steps are dispatched back-to-back (async) and synced once at the end —
    how the trainer actually runs (one sync per epoch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    sys.path.insert(0, str(Path(__file__).parent))
    from __graft_entry__ import DATA_CONFIG, NN_CONFIG
    from garment_pattern_estimation_tpu.models import build_model

    loss_config = {   # configs/att.yaml loss section, pre-stitch phase
        'loss_components': ['shape', 'loop', 'rotation', 'translation'],
        'quality_components': ['shape', 'discrete', 'rotation', 'translation'],
        'panel_origin_invariant_loss': False,
        'panel_order_inariant_loss': False,
    }
    nn_config = dict(NN_CONFIG)
    if compute_dtype:
        nn_config['compute_dtype'] = compute_dtype
    if edgeconv_train_chunk:
        nn_config['edgeconv_train_chunk'] = edgeconv_train_chunk
    if f32_conv_layers:
        nn_config['f32_conv_layers'] = list(f32_conv_layers)
    if edgeconv_train_mode:
        nn_config['edgeconv_train_mode'] = edgeconv_train_mode
    model = build_model('GarmentSegmentPattern3D', DATA_CONFIG, nn_config,
                        loss_config)

    rng = np.random.default_rng(0)
    P, L = DATA_CONFIG['max_pattern_len'], DATA_CONFIG['max_panel_len']
    batch_data = {
        'features': jnp.asarray(
            rng.normal(size=(batch, num_points, 3)).astype(np.float32)),
        'ground_truth': {
            'outlines': jnp.asarray(rng.normal(size=(batch, P, L, 4)).astype(np.float32)),
            'rotations': jnp.asarray(rng.normal(size=(batch, P, 4)).astype(np.float32)),
            'translations': jnp.asarray(rng.normal(size=(batch, P, 3)).astype(np.float32)),
            'num_edges': jnp.full((batch, P), 6, jnp.int32),
            'num_panels': jnp.full((batch,), P, jnp.int32),
            'empty_panels_mask': jnp.zeros((batch, P), bool),
            'stitches': jnp.zeros((batch, 2, 24), jnp.int32),
            'num_stitches': jnp.ones((batch,), jnp.int32),
            'free_edges_mask': jnp.ones((batch, P, L), bool),
            'stitch_tags': jnp.asarray(rng.normal(size=(batch, P, L, 3)).astype(np.float32)),
        },
    }

    variables = model.init_variables(jax.random.PRNGKey(0),
                                     batch_data['features'][:2])
    tx = optax.adam(2e-3)
    params, batch_stats = variables['params'], variables['batch_stats']
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, batch, rng):
        def loss_fn(p):
            preds, mutated = model.module.apply(
                {'params': p, 'batch_stats': batch_stats},
                batch['features'], train=True, mutable=['batch_stats'],
                rngs={'recurrent_init': rng, 'dropout': rng})
            loss, loss_dict, _ = model.loss(
                preds, batch['ground_truth'], epoch=0, rng=rng)
            return loss, (loss_dict, mutated['batch_stats'])

        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats,
                new_opt_state, loss)

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    key = jax.random.PRNGKey(1)
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, batch_data, key)  # compile
    jax.block_until_ready(loss)

    start = time.perf_counter()
    for i in range(steps):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, batch_data,
            jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    step_ms = (time.perf_counter() - start) / steps * 1e3
    assert np.isfinite(float(loss)), 'bench::training step produced NaN'
    return step_ms


def measure_stress_knn(batch=128, num_points=10000, k=5, iters=10):
    """Stress config: kNN over 128 clouds x 10k points — too large for the
    VMEM-resident kernels, exercises the HBM-streaming double-buffered DMA
    path (ops/knn.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from garment_pattern_estimation_tpu.ops.knn import knn_pallas

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(batch, num_points, 3)).astype(np.float32))

    @jax.jit
    def run(x):
        def step(_, acc):
            idx = knn_pallas(x + acc * 1e-12, k)
            return jnp.float32(idx.sum()) * 1e-12
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    np.asarray(run(pts))  # compile + sync
    start = time.perf_counter()
    np.asarray(run(pts))
    return (time.perf_counter() - start) / iters * 1e3


def measure_stress_forward(batch=128, num_points=10000, iters=10):
    """Stress config full forward (BASELINE.json config 5): att model over
    128 clouds x 10k points through the column-tiled/streaming fused
    EdgeConv kernels — the unfused path OOMs HBM on the (B, N, k, C)
    gather intermediate at this size."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, str(Path(__file__).parent))
    from __graft_entry__ import entry

    forward, (features,) = entry(batch_size=batch, num_points=num_points)

    @jax.jit
    def run(v):
        def step(_, acc):
            out = forward(v + acc * 1e-12)
            return out['outlines'].sum() * 1e-12
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    np.asarray(run(features))  # compile + sync
    start = time.perf_counter()
    np.asarray(run(features))
    return (time.perf_counter() - start) / iters * 1e3


def measure_mesh_to_prediction(batch=64, num_points=2000, v_cap=4096,
                               f_cap=8192, iters=25):
    """End-to-end mesh -> prediction: the on-device sampling stage
    (area-weighted surface draw + noise + standardization,
    preprocess/device_sampling) fused into the same jit as the flagship
    forward — the pipeline the `dataset.on_device_sampling` mode runs,
    with zero host-side preprocessing per batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, str(Path(__file__).parent))
    from __graft_entry__ import entry, DATA_CONFIG
    from garment_pattern_estimation_tpu.preprocess.device_sampling import (
        make_batch_sampler)

    forward, _ = entry(batch_size=batch, num_points=num_points)
    data_config = dict(DATA_CONFIG, mesh_samples=num_points, point_noise_w=0.01)
    data_config['standardize'] = dict(
        DATA_CONFIG['standardize'],
        f_shift=[0.037, -28.06, 1.078], f_scale=[16.35, 30.95, 9.60])
    sampler = make_batch_sampler(data_config)

    rng = np.random.default_rng(0)
    verts = rng.normal(size=(batch, v_cap, 3)).astype(np.float32) * 20.0
    faces = rng.integers(0, v_cap, size=(batch, f_cap, 3)).astype(np.int32)
    mesh = {'verts': jnp.asarray(verts), 'faces': jnp.asarray(faces),
            'n_verts': jnp.full((batch,), v_cap, jnp.int32),
            'vert_labels': jnp.zeros((batch, v_cap), jnp.int32)}

    @jax.jit
    def run(mesh_batch, key):
        def step(i, acc):
            pts, _ = sampler(jax.random.fold_in(key, i), mesh_batch)
            out = forward(pts + acc * 1e-12)
            return out['outlines'].sum() * 1e-12
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    key = jax.random.PRNGKey(0)
    np.asarray(run(mesh, key))  # compile + sync
    start = time.perf_counter()
    np.asarray(run(mesh, key))
    return (time.perf_counter() - start) / iters * 1e3


def measure_serving_artifact(batch=64, num_points=2000, iters=50):
    """Export the bf16 serving artifact ON THIS BACKEND (fused Pallas
    kernels embedded when that backend is TPU), load it back through
    `load_serving_artifact`, and time the LOADED program — demonstrating
    deployed-artifact throughput ~= live-jit throughput. Returns clouds/s."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, str(Path(__file__).parent))
    from __graft_entry__ import DATA_CONFIG, NN_CONFIG
    from garment_pattern_estimation_tpu.models import build_model
    from garment_pattern_estimation_tpu.experiment.serving import (
        export_serving_artifact, load_serving_artifact)

    model = build_model('GarmentSegmentPattern3D', DATA_CONFIG,
                        dict(NN_CONFIG, compute_dtype='bfloat16'), {})
    variables = model.init_variables(
        jax.random.PRNGKey(0),
        jnp.zeros((2, num_points, 3), jnp.float32))

    rng = np.random.default_rng(0)
    points = jnp.asarray(
        rng.normal(size=(batch, num_points, 3)).astype(np.float32))

    with tempfile.TemporaryDirectory() as tmp:
        export_serving_artifact(model, variables, DATA_CONFIG, tmp,
                                batch_size=batch, num_points=num_points)
        served = load_serving_artifact(tmp)

    call = served._exported.call  # composable into jit: on-device loop

    @jax.jit
    def run(v):
        def step(_, acc):
            out = call(v + acc * 1e-12)
            return out['outlines'].sum().astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    np.asarray(run(points))  # compile + sync
    start = time.perf_counter()
    np.asarray(run(points))
    elapsed = (time.perf_counter() - start) / iters
    return batch / elapsed


def torch_cpu_baseline():
    """clouds/s of the torch reference model (published att scale) on CPU,
    measured at BOTH the published batch size (30) and at batch 2.

    Measured clean (idle host): ~4.1 clouds/s at batch 30 vs ~5.8 at
    batch 2 — batching UP costs ~1.4x per cloud because the torch
    EdgeConv's (B, N, N) distance and (B*N*k, 2C) edge intermediates
    (~0.5 GB/layer at batch 30) blow past the LLC while batch 2 stays
    partly cache-resident. This also resolves the earlier cross-round
    anomaly (6.0 at batch 2 in round 2 vs 1.25 at batch 30 in round 3):
    the 1.25 reading was taken while another training shared this host's
    single core — contention, not batching, caused most of that drop.
    Returns (headline clouds/s at the published batch, {extras}) — the
    headline divides by the published-batch number (how the reference
    actually runs); the batch-2 number is reported alongside so the
    denominator is visibly NOT cherry-picked (batch 2 is the baseline's
    own best case of the two)."""
    if CACHE.exists():
        payload = json.loads(CACHE.read_text())
        if payload.get('batch') == CPU_BATCH \
                and 'torch_clouds_per_sec' in payload \
                and 'torch_clouds_per_sec_batch2' in payload:
            return payload['torch_clouds_per_sec'], payload
    code = f'''
import json, time
import numpy as np
import torch
torch.manual_seed(0)
from garment_pattern_estimation_tpu.experiment.torch_reference import (
    TorchGarmentSegmentPattern3D)
model = TorchGarmentSegmentPattern3D().eval()   # published att.yaml scale
def measure(batch, iters):
    x = torch.from_numpy(np.random.default_rng(0)
                         .normal(size=(batch, {NUM_POINTS}, 3))
                         .astype(np.float32))
    with torch.no_grad():
        model(x)                                # warmup
        start = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - start) / iters
    return batch / dt
print("CPU_RESULT", json.dumps(
    {{"torch_clouds_per_sec": measure({CPU_BATCH}, 2),
      "torch_clouds_per_sec_batch2": measure(2, 5),
      "batch": {CPU_BATCH}}}))
'''
    result = subprocess.run([sys.executable, '-c', code], env=dict(os.environ),
                            capture_output=True, text=True, timeout=3600,
                            cwd=str(Path(__file__).parent))
    for line in result.stdout.splitlines():
        if line.startswith('CPU_RESULT'):
            payload = json.loads(line.split(' ', 1)[1])
            CACHE.write_text(json.dumps(payload))
            return payload['torch_clouds_per_sec'], payload
    print(result.stdout[-2000:], file=sys.stderr)
    print(result.stderr[-2000:], file=sys.stderr)
    raise RuntimeError('bench::torch CPU baseline measurement failed')


def main():
    tput, _ = measure_inference(BATCH, NUM_POINTS)
    extras = {}
    try:
        tput_bf16, _ = measure_inference(BATCH, NUM_POINTS,
                                         compute_dtype='bfloat16')
        extras['inference_clouds_per_sec_bf16'] = round(tput_bf16, 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::bf16 inference bench failed ({e})',
              file=sys.stderr)
    try:
        extras['train_step_ms_batch30'] = round(measure_train_step(), 2)
    except Exception as e:  # noqa: BLE001 — report, don't sink the headline
        print(f'bench::warning::train-step bench failed ({e})', file=sys.stderr)
    try:
        extras['train_step_ms_batch30_bf16'] = round(
            measure_train_step(compute_dtype='bfloat16'), 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::bf16 train-step bench failed ({e})',
              file=sys.stderr)
    try:
        extras['stress_knn_128x10k_ms'] = round(measure_stress_knn(), 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::stress bench failed ({e})', file=sys.stderr)
    try:
        extras['stress_forward_128x10k_ms'] = round(measure_stress_forward(), 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::stress forward failed ({e})', file=sys.stderr)
    try:
        extras['mesh_to_pred_64x2000_ms'] = round(measure_mesh_to_prediction(), 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::mesh-to-pred bench failed ({e})', file=sys.stderr)
    try:
        extras['stress_train_step_128x10k_ms'] = round(
            measure_train_step(batch=128, num_points=10000, steps=2), 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::stress train bench failed ({e})', file=sys.stderr)
    try:
        # mixed-precision stress training (newly chunked-path-capable):
        # streamed is fastest where its bf16 buffers compile; fall back to
        # the default fused_final schedule if the compile service balks
        try:
            ms = measure_train_step(batch=128, num_points=10000, steps=2,
                                    compute_dtype='bfloat16',
                                    edgeconv_train_mode='streamed')
            extras['stress_train_step_bf16_mode'] = 'streamed'
        except Exception:  # noqa: BLE001
            ms = measure_train_step(batch=128, num_points=10000, steps=2,
                                    compute_dtype='bfloat16')
            extras['stress_train_step_bf16_mode'] = 'fused_final'
        extras['stress_train_step_bf16_128x10k_ms'] = round(ms, 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::bf16 stress train bench failed ({e})',
              file=sys.stderr)
    try:
        extras['serving_artifact_clouds_per_sec'] = round(
            measure_serving_artifact(), 2)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::serving artifact bench failed ({e})',
              file=sys.stderr)
    try:
        # interactive single-cloud latency of the loaded artifact (full
        # operating curve: parity_run/serving_sweep.json, Running.md)
        extras['serving_latency_b1_ms'] = round(
            1e3 / measure_serving_artifact(batch=1, iters=2000), 3)
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::serving b1 latency bench failed ({e})',
              file=sys.stderr)
    try:
        baseline, cpu_payload = torch_cpu_baseline()
        extras['torch_reference_cpu_clouds_per_sec'] = round(baseline, 3)
        extras['torch_reference_cpu_clouds_per_sec_batch2'] = round(
            cpu_payload.get('torch_clouds_per_sec_batch2', 0.0), 3)
        vs_baseline = tput / baseline
    except Exception as e:  # noqa: BLE001
        print(f'bench::warning::no CPU baseline ({e})', file=sys.stderr)
        vs_baseline = None
    print(json.dumps({
        'metric': f'inference point-clouds/sec/chip (att model, batch {BATCH}, '
                  f'{NUM_POINTS} pts)',
        'value': round(tput, 2),
        'unit': 'clouds/s',
        'vs_baseline': round(vs_baseline, 2) if vs_baseline else None,
        'extras': extras,
    }))


if __name__ == '__main__':
    main()
