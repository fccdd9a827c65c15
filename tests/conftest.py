"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware; the real
single-chip TPU is exercised by bench.py / __graft_entry__.py instead.
"""
import os

# Force the CPU backend. Env vars alone are not enough under pytest: a
# sitecustomize may import jax (freezing env-derived config) before this
# conftest runs, so also override the live jax config — safe as long as no
# backend has been *initialized* yet.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

try:
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_platform_name', 'cpu')
except Exception:  # config name drift across jax versions
    pass

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped on purpose: every test sees the same draws on every
    # run regardless of which other tests ran — selection-sensitive kernel
    # comparisons (packed-quantization bucket edges) must be deterministic
    return np.random.default_rng(42)


@pytest.fixture(scope='session')
def synthetic_dataset_root(tmp_path_factory):
    """Small synthetic dataset shared across tests (generation is not free)."""
    from garment_pattern_estimation_tpu.utils import synthetic
    root = tmp_path_factory.mktemp('synth_data')
    synthetic.generate_dataset(root, samples_per_folder=6, seed=7)
    synthetic.panel_classes_for_templates(root / 'panel_classes.json')
    return root
