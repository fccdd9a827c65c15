"""Kernel-level TPU microbenchmarks: Pallas kNN vs XLA kNN, forward stages.

Not part of the driver's bench contract (bench.py is); this is the
engineering tool for optimizing the hot path. Run on the TPU:

    python bench_kernels.py [--stress]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, warmup=2, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        jax.block_until_ready(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def bench_knn(shapes):
    from garment_pattern_estimation_tpu.ops.knn import knn_pallas, knn_xla

    for (B, N, D) in shapes:
        x = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, D))
                        .astype(np.float32))
        pallas_fn = jax.jit(lambda v: knn_pallas(v, 5))
        xla_fn = jax.jit(lambda v: knn_xla(v, 5))
        try:
            t_pallas = timeit(pallas_fn, x)
        except Exception as e:
            t_pallas = float('nan')
            print(f'  pallas failed: {type(e).__name__}: {str(e)[:200]}')
        try:
            t_xla = timeit(xla_fn, x)
        except Exception as e:
            t_xla = float('nan')
            print(f'  xla failed: {type(e).__name__}: {str(e)[:200]}')
        flops = 2 * B * N * N * D
        print(f'knn B={B} N={N} D={D}: pallas {t_pallas*1e3:8.2f} ms '
              f'({flops/t_pallas/1e12:6.2f} TF/s) | '
              f'xla {t_xla*1e3:8.2f} ms ({flops/t_xla/1e12:6.2f} TF/s)')


def bench_forward_stages(batch=64, n_points=2000):
    """Time the encoder vs attention vs decoder stages of the att model."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from __graft_entry__ import _build

    model = _build()
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, n_points, 3)).astype(np.float32))
    variables = model.init_variables(jax.random.PRNGKey(0), feats[:2])

    full = jax.jit(lambda v: model.module.apply(variables, v, train=False))
    t_full = timeit(full, feats)

    enc = jax.jit(lambda v: model.module.apply(
        variables, v, train=False,
        method=lambda m, x, train: m.panel_encodings_from_3d(x, train=train)))
    t_enc = timeit(enc, feats)

    print(f'forward B={batch} N={n_points}: full {t_full*1e3:.1f} ms '
          f'({batch/t_full:.0f} clouds/s) | encoder+attention {t_enc*1e3:.1f} ms '
          f'| decoder ~{(t_full-t_enc)*1e3:.1f} ms')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--stress', action='store_true')
    args = parser.parse_args()

    shapes = [(30, 2000, 3), (30, 2000, 150), (64, 2000, 150)]
    if args.stress:
        shapes += [(128, 10000, 3), (16, 10000, 150)]
    bench_knn(shapes)
    bench_forward_stages()
    if args.stress:
        bench_forward_stages(batch=128, n_points=10000)
