"""Unseen-template + scan-imitation axes of the synthetic generator
(reference: unseen folders in models/att/att.yaml:27-34; scan-imitation
meshes via `dataset.obj_filetag`, docs/Running.md:27-28)."""
import numpy as np
import pytest

from garment_pattern_estimation_tpu.utils import synthetic


def test_unseen_templates_reuse_seen_classes(tmp_path):
    classes = synthetic.panel_classes_for_templates(tmp_path / 'pc.json')
    assert set(synthetic.UNSEEN_TEMPLATES) == {'dress', 'vest'}
    # class COUNT is set by the seen templates alone: unseen panels join
    # existing classes, so a model trained on seen types can represent them
    seen_only = {
        role
        for name, tpl in synthetic.TEMPLATES.items() if not tpl.get('unseen')
        for spec in tpl['panels']
        for role in [spec[4] if len(spec) > 4 else spec[0]]}
    assert set(classes) == seen_only
    assert ['dress', 'dfront'] in classes['front']
    assert ['vest', 'vback'] in classes['back']


def test_unseen_templates_build_valid_patterns(tmp_path):
    from garment_pattern_estimation_tpu.core.panel_classes import PanelClasses

    synthetic.panel_classes_for_templates(tmp_path / 'pc.json')
    pc = PanelClasses(tmp_path / 'pc.json')
    rng = np.random.default_rng(3)
    for template in synthetic.UNSEEN_TEMPLATES:
        pattern = synthetic.make_pattern(template, rng, panel_classifier=pc)
        order = pattern.panel_order(pad_to_len=len(pc))
        filled = [p for p in order if p is not None]
        assert len(filled) == len(synthetic.TEMPLATES[template]['panels'])
        # panels sit at their CLASS slots (front=0, back=1 in file order)
        assert order[0] is not None and order[1] is not None
        outlines, *_ = pattern.pattern_as_tensors(
            pad_panels_to_len=14, pad_panels_num=len(pc),
            pad_stitches_num=8, with_placement=True, with_stitches=True,
            with_stitch_tags=True)
        assert np.isfinite(outlines).all()


def test_seen_templates_cover_unseen_factors(tmp_path):
    """Round-5 zero-shot support: the seen set must contain 2-panel
    front/back garments (tank), 4-edge trapezoid 2-panel garments
    (aline_skirt), and tall garments (maxi_skirt) so dress/vest are
    recombinations, not memorizations; every seen template must build a
    valid padded tensor pattern."""
    from garment_pattern_estimation_tpu.core.panel_classes import PanelClasses

    seen = {n: t for n, t in synthetic.TEMPLATES.items() if not t.get('unseen')}
    assert {'tank', 'pants', 'shorts', 'maxi_skirt', 'aline_skirt'} <= set(seen)
    roles = {spec[4] if len(spec) > 4 else spec[0]
             for t in seen.values() for spec in t['panels']}
    assert roles == {'front', 'back', 'lsleeve', 'rsleeve',
                     'sfront', 'sback', 'lpant', 'rpant', 'hood'}
    # tank puts a 2-panel garment in the front/back roles (vest/dress slots)
    tank_roles = {s[4] if len(s) > 4 else s[0]
                  for s in seen['tank']['panels']}
    assert tank_roles == {'front', 'back'}
    # jumpsuit's bodice shares those roles too (cross-template class sharing)
    jroles = {s[4] if len(s) > 4 else s[0] for s in seen['jumpsuit']['panels']}
    assert {'front', 'back'} <= jroles

    synthetic.panel_classes_for_templates(tmp_path / 'pc.json')
    pc = PanelClasses(tmp_path / 'pc.json')
    assert len(pc) == 9
    rng = np.random.default_rng(11)
    for name in seen:
        pattern = synthetic.make_pattern(name, rng, panel_classifier=pc)
        outlines, *_ = pattern.pattern_as_tensors(
            pad_panels_to_len=14, pad_panels_num=len(pc),
            pad_stitches_num=8, with_placement=True, with_stitches=True,
            with_stitch_tags=True)
        assert np.isfinite(outlines).all(), name
        # every stitch references an existing panel/edge
        for sides in synthetic.TEMPLATES[name]['stitches']:
            for panel, edge in sides:
                panel_def = dict(zip(
                    [s[0] for s in synthetic.TEMPLATES[name]['panels']],
                    [s for s in synthetic.TEMPLATES[name]['panels']]))
                assert panel in panel_def, (name, panel)
                built = pattern.pattern['panels'][panel]
                assert edge < len(built['edges']), (name, panel, edge)


def test_scan_imitation_files(tmp_path):
    from garment_pattern_estimation_tpu.preprocess import mesh

    rng = np.random.default_rng(5)
    synthetic.generate_datapoint(tmp_path / 'dp', 'tee', rng, name='dp',
                                 with_scan=True)
    sim_v, sim_f = mesh.read_triangle_mesh(tmp_path / 'dp' / 'dp_sim.obj')
    scan_path = tmp_path / 'dp' / 'dp_scan_imitation.obj'
    assert scan_path.exists()
    scan_v, scan_f = mesh.read_triangle_mesh(scan_path)
    # same vertex count (labels stay valid), jittered coordinates, holes
    assert scan_v.shape == sim_v.shape
    assert not np.allclose(scan_v, sim_v)
    assert 0 < len(scan_f) < len(sim_f)
    seg = (tmp_path / 'dp' / 'dp_scan_imitation_segmentation.txt').read_text()
    assert len(seg.strip().splitlines()) == len(scan_v)
    # the filetag globs are mutually exclusive: 'sim' must not match the
    # scan files and vice versa (dataset layer globs *<tag>*.obj)
    names = [p.name for p in (tmp_path / 'dp').iterdir()]
    assert sum('sim' in n and n.endswith('.obj') for n in names) == 1
    assert sum('scan' in n and n.endswith('.obj') for n in names) == 1


def test_dataset_loads_scan_filetag(tmp_path):
    from garment_pattern_estimation_tpu.data import DATASET_REGISTRY

    synthetic.generate_dataset(
        tmp_path, folders={'vest_synth': 'vest'}, samples_per_folder=4,
        seed=2, with_failures=False, with_scan=True)
    synthetic.panel_classes_for_templates(tmp_path / 'pc.json')
    data_config = {
        'class': 'Garment3DPatternFullDataset',
        'data_folders': ['vest_synth'], 'mesh_samples': 80,
        'obj_filetag': 'scan', 'point_noise_w': 0,
        'panel_classification': str(tmp_path / 'pc.json'),
    }
    dataset = DATASET_REGISTRY['Garment3DPatternFullDataset'](
        tmp_path, data_config, gt_caching=True, feature_caching=True)
    sample = dataset[0]
    assert sample['features'].shape == (80, 3)
    assert np.isfinite(np.asarray(sample['features'])).all()
