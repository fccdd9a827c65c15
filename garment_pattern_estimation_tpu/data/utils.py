"""Non-dataset data helpers: arbitrary-mesh sampling + prediction saving
(counterpart of nn/data/utils.py:96-160)."""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core import NNSewingPattern, InvalidPatternDefError
from ..preprocess import mesh as mesh_ops
from ..losses.stitches import tags_to_stitches_np


def sample_points_from_meshes(mesh_paths, data_config, seed=None):
    """Sample standardized point clouds from arbitrary triangle meshes."""
    points_list = []
    for i, mesh_path in enumerate(mesh_paths):
        verts, faces = mesh_ops.read_triangle_mesh(str(mesh_path))
        points = mesh_ops.sample_mesh_points(
            data_config['mesh_samples'], verts, faces,
            seed=None if seed is None else seed + i)
        if 'standardize' in data_config:
            points = (points - np.asarray(data_config['standardize']['f_shift'])) \
                / np.asarray(data_config['standardize']['f_scale'])
        points_list.append(points.astype(np.float32))
    return points_list


def save_garments_prediction(predictions, save_to, data_config=None, datanames=None,
                             stitches_from_stitch_tags=False, panel_classifier=None):
    """Save arbitrary (non-dataset) pattern predictions to disk."""
    save_to = Path(save_to)
    batch_size = np.asarray(predictions['outlines']).shape[0]
    if datanames is None:
        datanames = [f'pred_{i}' for i in range(batch_size)]

    for idx, name in enumerate(datanames):
        prediction = {key: np.asarray(predictions[key][idx]) for key in predictions}

        if data_config is not None and 'standardize' in data_config:
            gt_shifts = data_config['standardize']['gt_shift']
            gt_scales = data_config['standardize']['gt_scale']
            for key in gt_shifts:
                if key == 'stitch_tags' and not data_config.get('explicit_stitch_tags', False):
                    continue
                prediction[key] = prediction[key] * np.asarray(gt_scales[key]) \
                    + np.asarray(gt_shifts[key])

        stitches = None
        if stitches_from_stitch_tags:
            stitches = tags_to_stitches_np(prediction['stitch_tags'],
                                           prediction['free_edges_mask'])

        pattern = NNSewingPattern(view_ids=False, panel_classifier=panel_classifier)
        pattern.name = name
        try:
            pattern.pattern_from_tensors(
                prediction['outlines'], prediction['rotations'],
                prediction['translations'], stitches=stitches, padded=True)
            pattern.serialize(save_to, to_subfolder=True)
        except (RuntimeError, InvalidPatternDefError, TypeError) as e:
            print(e)
            print(f'Saving predictions::skipping pattern {name}')
