"""AOT serving export: a self-contained, relocatable inference artifact.

The reference has no deployment story — serving means carrying the full
research codebase, a torch install, and a `.pth` checkpoint to the target
machine and re-running `predict_per_example.py`
(/root/reference/nn/evaluation_scripts/predict_per_example.py:114-210).
Here the whole serving pipeline — feature standardization, the shape-model
forward (f32 or the bf16 MXU serving mode, including the fused Pallas
EdgeConv kernels when exported on TPU), and prediction un-standardization
back to physical units — is traced ONCE and serialized with `jax.export`
(StableHLO + calling convention). The artifact directory holds:

    model.jaxexport   the serialized program (weights baked in as constants)
    manifest.json     input/output shapes + dtypes, the data config needed to
                      decode tensors into sewing patterns, export metadata

A server loads it with `load_serving_artifact` — no flax trace, no checkpoint
import, no model code at startup — and calls
``points (B, N, 3) in physical units -> pattern tensors in physical units``.
Exported programs enforce their lowering platforms at call time, so a
TPU-exported artifact refuses to silently run (slowly, or wrongly) on CPU.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

SERVING_FORMAT_VERSION = 1
_BLOB_NAME = 'model.jaxexport'
_MANIFEST_NAME = 'manifest.json'

# prediction keys that un-standardize back to physical units (the same
# per-key `pred * scale + shift` the dataset save path applies,
# data/datasets.py::unstandardize_prediction); everything else
# (free-edge logits, attention weights) passes through raw
_GT_KEYS = ('outlines', 'rotations', 'translations', 'stitch_tags')


def build_serving_fn(model, variables, data_config):
    """The full serving pipeline as one jittable closure.

    raw points --(f_shift/f_scale)--> standardized cloud --model forward-->
    standardized predictions --(gt_shift/gt_scale per key)--> physical units.
    Standardization stats come from `data_config['standardize']`; a missing
    `f_shift`/`f_scale` (synthetic configs) means identity."""
    import jax.numpy as jnp

    std = data_config.get('standardize', {})
    f_shift = jnp.asarray(std.get('f_shift', [0.0, 0.0, 0.0]), jnp.float32)
    f_scale = jnp.asarray(std.get('f_scale', [1.0, 1.0, 1.0]), jnp.float32)
    gt_shift = {k: jnp.asarray(v, jnp.float32)
                for k, v in std.get('gt_shift', {}).items() if k in _GT_KEYS}
    gt_scale = {k: jnp.asarray(v, jnp.float32)
                for k, v in std.get('gt_scale', {}).items() if k in _GT_KEYS}

    def serve(points):
        x = (points.astype(jnp.float32) - f_shift) / f_scale
        preds = model.module.apply(variables, x, train=False)
        out = {}
        for key, value in preds.items():
            if key in gt_shift:
                out[key] = value * gt_scale[key] + gt_shift[key]
            else:
                out[key] = value
        return out

    return serve


def export_serving_artifact(model, variables, data_config, out_dir, *,
                            batch_size=64, num_points=2000, platforms=None,
                            extra_manifest=None):
    """Trace + serialize the serving pipeline into `out_dir`.

    `platforms`: lowering platforms for `jax.export` (default: the current
    backend). Returns the manifest dict."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    serve = build_serving_fn(model, variables, data_config)
    in_spec = jax.ShapeDtypeStruct((batch_size, num_points, 3), jnp.float32)
    exported = jax_export.export(
        jax.jit(serve),
        platforms=list(platforms) if platforms else None)(in_spec)
    blob = exported.serialize()
    (out_dir / _BLOB_NAME).write_bytes(blob)

    out_info = {name: {'shape': list(leaf.shape), 'dtype': str(leaf.dtype)}
                for name, leaf in zip(
                    _output_names(exported), exported.out_avals)}
    manifest = {
        'format_version': SERVING_FORMAT_VERSION,
        'model': model.name,
        'platforms': list(exported.platforms),
        'input': {'shape': [batch_size, num_points, 3], 'dtype': 'float32',
                  'units': 'physical (unstandardized) point coordinates'},
        'outputs': out_info,
        'data_config': _jsonable(data_config),
        'blob_bytes': len(blob),
    }
    manifest.update(extra_manifest or {})
    (out_dir / _MANIFEST_NAME).write_text(json.dumps(manifest, indent=2))
    return manifest


def _output_names(exported):
    """Flattened output names, recovered EXACTLY: unflatten the out_tree
    with position indices as leaves, then read each dict key's index — no
    assumption that jax's flattening order matches sorted() (it currently
    does for dicts, but the manifest must not silently mislabel outputs if
    that ever changes or the tree gains nesting)."""
    try:
        import jax
        leaves_template = list(range(len(exported.out_avals)))
        tree = jax.tree_util.tree_unflatten(exported.out_tree, leaves_template)
        if isinstance(tree, dict) and all(
                isinstance(v, int) for v in tree.values()):
            names = [None] * len(leaves_template)
            for key, leaf_idx in tree.items():
                names[leaf_idx] = str(key)
            if all(n is not None for n in names):
                return names
    except Exception:  # noqa: BLE001 — names are informational only
        pass
    return [f'out_{i}' for i in range(len(exported.out_avals))]


def _jsonable(value):
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, np.ndarray):
        return value.tolist()
    return value


class ServingModel:
    """A loaded serving artifact: validates inputs, calls the deserialized
    program, returns the prediction dict in physical units."""

    def __init__(self, exported, manifest):
        self._exported = exported
        self.manifest = manifest
        self.input_shape = tuple(manifest['input']['shape'])
        self.platforms = tuple(manifest.get('platforms', ()))

    @property
    def data_config(self):
        return self.manifest['data_config']

    def __call__(self, points):
        points = np.asarray(points, dtype=np.float32) \
            if not hasattr(points, 'dtype') else points
        if tuple(points.shape) != self.input_shape:
            raise ValueError(
                f'ServingModel::input shape {tuple(points.shape)} does not '
                f'match the exported program {self.input_shape}; re-export '
                'with the serving batch/point count or pad the batch')
        return self._exported.call(points)


def load_serving_artifact(path):
    """Load a `ServingModel` from an artifact directory (or its blob path)."""
    from jax import export as jax_export

    path = Path(path)
    if path.is_file():
        path = path.parent
    blob_path, manifest_path = path / _BLOB_NAME, path / _MANIFEST_NAME
    if not blob_path.exists():
        raise FileNotFoundError(f'load_serving_artifact::{blob_path} missing')
    manifest = json.loads(manifest_path.read_text()) \
        if manifest_path.exists() else {'input': {'shape': None}}
    exported = jax_export.deserialize(blob_path.read_bytes())
    if manifest['input']['shape'] is None:  # manifest-less blob: recover shape
        manifest['input'] = {'shape': list(exported.in_avals[0].shape),
                             'dtype': str(exported.in_avals[0].dtype)}
        manifest.setdefault('platforms', list(exported.platforms))
    return ServingModel(exported, manifest)
