"""Codec invariants: spec <-> tensors round-trip, padding, stitch encoding.

These mirror the reference's implicit invariants exercised by its inline
smoke block (nn/data/pattern_converter.py:615-648).
"""
import json

import numpy as np
import pytest

from garment_pattern_estimation_tpu.core import (
    NNSewingPattern, PanelClasses, EmptyPanelError, InvalidPatternDefError, rotations,
)
from garment_pattern_estimation_tpu.utils import synthetic


@pytest.fixture(scope='module')
def tee(rng_module):
    return synthetic.make_pattern('tee', rng_module)


@pytest.fixture(scope='module')
def rng_module():
    return np.random.default_rng(3)


def test_pattern_as_tensors_shapes(tee):
    outlines, num_edges, num_panels, rots, transls, stitches, num_stitches, tags = \
        tee.pattern_as_tensors(
            pad_panels_to_len=14, pad_panels_num=23, pad_stitches_num=24,
            with_placement=True, with_stitches=True, with_stitch_tags=True)
    assert outlines.shape == (23, 14, 4)
    assert num_edges.shape == (23,)
    assert num_panels == 4
    assert rots.shape == (23, 4)
    assert transls.shape == (23, 3)
    assert stitches.shape == (2, 24)
    assert num_stitches == 4
    assert tags.shape == (23, 14, 3)
    # padded panels have zero rows
    assert np.all(outlines[num_panels:] == 0)
    # stitched edges have non-zero tags; each stitch contributes two tagged edges
    assert (np.abs(tags).sum(axis=-1) > 0).sum() == 2 * num_stitches


def test_roundtrip_spec_tensors_spec(tee, tmp_path):
    outlines, num_edges, num_panels, rots, transls, stitches, num_stitches = \
        tee.pattern_as_tensors(
            pad_panels_to_len=14, pad_panels_num=23, pad_stitches_num=24,
            with_placement=True, with_stitches=True)

    rebuilt = NNSewingPattern()
    rebuilt.name = 'rebuilt'
    rebuilt.pattern_from_tensors(outlines, rots, transls, stitches, padded=True)

    assert len(rebuilt.pattern['panels']) == num_panels
    assert len(rebuilt.pattern['stitches']) == num_stitches

    # geometric closeness: re-encode and compare non-padded region
    outlines2, num_edges2, *_ = rebuilt.pattern_as_tensors(
        pad_panels_to_len=14, pad_panels_num=23)
    order = [p for p in tee.panel_order() if p is not None]
    for i in range(num_panels):
        n = num_edges[i]
        assert num_edges2[i] == n
        np.testing.assert_allclose(outlines2[i, :n], outlines[i, :n], atol=1e-6)

    # placements survive the universal-translation compensation
    _, _, _, rots2, transls2 = rebuilt.pattern_as_tensors(
        pad_panels_to_len=14, pad_panels_num=23, with_placement=True)
    for i in range(num_panels):
        # quaternions match up to sign
        q1, q2 = rots[i], rots2[i]
        assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-6
        np.testing.assert_allclose(transls2[i], transls[i], atol=1e-6)

    # serialization produces loadable files with the expected naming
    out_dir = rebuilt.serialize(tmp_path, to_subfolder=True, tag='_predicted_')
    files = [p.name for p in __import__('pathlib').Path(out_dir).iterdir()]
    assert any('specification.json' in f and 'predicte' in f for f in files)
    spec_file = [f for f in files if f.endswith('specification.json')][0]
    with open(f'{out_dir}/{spec_file}') as f:
        spec = json.load(f)
    assert len(spec['pattern']['panels']) == num_panels


def test_empty_panel_dropped():
    pattern = NNSewingPattern()
    with pytest.raises(EmptyPanelError):
        pattern.panel_from_numeric('p0', np.zeros((14, 4)), padded=True)


def test_loop_closes_on_origin(tee):
    """Decoded panels snap the final vertex to the origin (loop closure)."""
    outlines, num_edges, num_panels = tee.pattern_as_tensors(pad_panels_to_len=14)
    rebuilt = NNSewingPattern()
    rebuilt.panel_from_numeric('p', outlines[0], padded=True)
    panel = rebuilt.pattern['panels']['p']
    assert len(panel['vertices']) == num_edges[0]  # no extra vertex created
    assert len(panel['edges']) == num_edges[0]


def test_stitch_ids_reference_valid_edges(tee):
    _, num_edges, _, stitches, num_stitches = tee.pattern_as_tensors(
        pad_panels_to_len=14, pad_panels_num=23, with_stitches=True)
    for side in range(2):
        for s in range(num_stitches):
            edge_id = stitches[side][s]
            panel_id, in_edge = edge_id // 14, edge_id % 14
            assert in_edge < num_edges[panel_id]


def test_invalid_stitch_raises(tee):
    outlines, _, _, rots, transls, stitches, _ = tee.pattern_as_tensors(
        pad_panels_to_len=14, pad_panels_num=23, pad_stitches_num=24,
        with_placement=True, with_stitches=True)
    bad = stitches.copy()
    bad[0, 0] = 22 * 14 + 1  # refers to an empty (padded) panel slot
    rebuilt = NNSewingPattern()
    with pytest.raises(InvalidPatternDefError):
        rebuilt.pattern_from_tensors(outlines, rots, transls, bad, padded=True)


def test_panel_classifier_ordering(tmp_path, rng_module):
    classes_file = tmp_path / 'classes.json'
    synthetic.panel_classes_for_templates(classes_file)
    classifier = PanelClasses(classes_file)

    pattern = synthetic.make_pattern('skirt', rng_module, panel_classifier=classifier)
    pattern.template_name = 'skirt'
    order = pattern.panel_order()
    assert len(order) == len(classifier)
    # skirt panels appear exactly at their class indices, others are None
    for panel_name in pattern.pattern['panels']:
        assert order[classifier.class_idx('skirt', panel_name)] == panel_name
    assert sum(p is not None for p in order) == 2


def test_edge_pairs(tee):
    pairs, mapping, mask = tee.all_edge_pairs()
    assert pairs.shape[1] == 16
    assert len(mapping) == len(mask) == pairs.shape[0]
    assert sum(mask) == len(tee.pattern['stitches'])

    rng = np.random.default_rng(0)
    train_pairs, train_mask = tee.stitches_as_3D_pairs(
        stitch_pairs_num=20, non_stitch_pairs_num=20,
        randomize_edges=True, randomize_list_order=True, rng=rng)
    assert train_pairs.shape == (40, 16)
    assert train_mask.sum() == 20


def test_stitch_tags_edge_order_invariant(tee):
    """Tags depend only on edge midpoints in 3D -> invariant to vertex order."""
    tags = tee.stitches_as_tags()
    assert tags.shape == (len(tee.pattern['stitches']), 3)
    assert np.isfinite(tags).all()


def test_quaternion_convention_matches_scipy():
    euler = [10.0, -40.0, 95.0]
    q = rotations.euler_xyz_to_quat(euler)
    back = rotations.quat_to_euler_xyz(q)
    np.testing.assert_allclose(back, euler, atol=1e-9)
