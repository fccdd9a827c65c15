"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware; the real
single-chip TPU is exercised by bench.py / __graft_entry__.py instead.
"""
import os

# JAX_PLATFORMS alone is not honored when the axon TPU plugin is installed;
# JAX_PLATFORM_NAME forces the backend reliably.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('JAX_PLATFORM_NAME', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope='session')
def synthetic_dataset_root(tmp_path_factory):
    """Small synthetic dataset shared across tests (generation is not free)."""
    from garment_pattern_estimation_tpu.utils import synthetic
    root = tmp_path_factory.mktemp('synth_data')
    synthetic.generate_dataset(root, samples_per_folder=6, seed=7)
    synthetic.panel_classes_for_templates(root / 'panel_classes.json')
    return root
