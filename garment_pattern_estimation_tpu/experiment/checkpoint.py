"""Checkpoint serialization: msgpack pytrees (flax.serialization).

Checkpoints store a plain dict, e.g.::

    {'epoch': int, 'variables': {'params': ..., 'batch_stats': ...},
     'opt_state': ..., 'schedule_step': int}

`template` enables structure-aware restore (exact dtypes/shapes); without it
the raw nested-dict form is returned.
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    # jax.device_get starts an async host copy of EVERY leaf before blocking
    # on any — one round-trip of latency for the whole tree. A per-leaf
    # np.asarray is one blocking transfer per leaf, which over a tunneled
    # device transport turns a ~40 MB checkpoint into >10 s of latency.
    fetched = jax.device_get(tree)
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, 'shape') else x, fetched)


def save_checkpoint_file(state, path):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # to_state_dict turns non-dict pytree nodes (optax namedtuples, tuples)
    # into msgpack-serializable nested dicts
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy_tree(state)))
    # append rather than replace the suffix: with_suffix('.tmp') would make
    # same-stem targets ('state.msgpack' / 'state.json') collide on one
    # tmp file and install each other's bytes
    tmp = path.with_name(path.name + '.tmp')
    tmp.write_bytes(data)
    tmp.replace(path)  # atomic on POSIX: no torn checkpoints on crashes
    return path


def load_checkpoint_file(path, template=None):
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(path)
    restored = serialization.msgpack_restore(path.read_bytes())
    if template is not None:
        restored = serialization.from_state_dict(template, restored)
    return restored
