"""Dataset layer on the synthetic garment dataset: scanning, GT assembly,
splits, standardization, balanced batching, stitch-pairs dataset."""
import time

import numpy as np
import pytest

from garment_pattern_estimation_tpu.data import (
    Garment3DPatternFullDataset, GarmentStitchPairsDataset, DatasetWrapper,
    BalancedBatchSampler, DataLoader,
)

FOLDERS = ['tee_synth_300', 'skirt_synth_300', 'jumpsuit_synth_300']


@pytest.fixture(scope='module')
def dataset(synthetic_dataset_root):
    return Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS, 'mesh_samples': 120,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=True, feature_caching=True)


def test_scan_and_failure_filtering(dataset):
    # 6 samples per folder, last one marked as failed sim in properties
    assert len(dataset) == 3 * 5
    # max sizes inferred / taken from the classifier
    # distinct panel roles across ALL templates (front/back are shared by
    # tee/tank/jumpsuit bodices; skirt/pant roles by their length variants)
    assert dataset.config['max_pattern_len'] == 9
    assert dataset.config['max_panel_len'] >= 4
    assert dataset.config['max_num_stitches'] >= 2


def test_sample_structure(dataset):
    sample = dataset[0]
    P, L = dataset.config['max_pattern_len'], dataset.config['max_panel_len']
    assert sample['features'].shape == (120, 3)
    gt = sample['ground_truth']
    assert gt['outlines'].shape == (P, L, 4)
    assert gt['rotations'].shape == (P, 4)
    assert gt['translations'].shape == (P, 3)
    assert gt['stitch_tags'].shape == (P, L, 3)
    assert gt['free_edges_mask'].shape == (P, L)
    assert gt['segmentation'].shape == (120,)
    assert gt['segmentation'].dtype == np.int64
    assert (gt['segmentation'] >= 0).all() and (gt['segmentation'] < P).all()
    # stitched edges are marked non-free
    n_stitched_edges = (~gt['free_edges_mask']).sum()
    assert n_stitched_edges == 2 * gt['num_stitches']


def test_split_and_standardize(dataset, synthetic_dataset_root):
    wrapper = DatasetWrapper(dataset)
    wrapper.load_split({'valid_per_type': 1, 'test_per_type': 1,
                        'type': 'count', 'random_seed': 10})
    wrapper.new_loaders(batch_size=4)
    assert len(wrapper.training) == 9
    assert len(wrapper.validation) == 3
    assert len(wrapper.test) == 3

    # split is reproducible with the same seed
    wrapper2 = DatasetWrapper(dataset)
    wrapper2.load_split({'valid_per_type': 1, 'test_per_type': 1,
                         'type': 'count', 'random_seed': 10})
    assert wrapper.training.indices == wrapper2.training.indices

    wrapper.standardize_data()
    stats = dataset.config['standardize']
    assert len(stats['f_shift']) == 3
    assert len(stats['gt_scale']['outlines']) == 4

    # standardized features have roughly centered distribution on train set
    batch = next(iter(wrapper.loaders.train))
    assert batch['features'].shape[1:] == (120, 3)
    assert abs(batch['features'].mean()) < 1.0
    assert np.isfinite(batch['ground_truth']['outlines']).all()
    # int/bool fields survive standardization untouched
    assert batch['ground_truth']['num_edges'].dtype in (np.int32, np.int64)
    assert batch['ground_truth']['free_edges_mask'].dtype == bool


def test_balanced_batches(dataset):
    ids_by_type = {'a': list(range(8)), 'b': list(range(8, 12)),
                   'c': list(range(12, 16))}
    sampler = BalancedBatchSampler(ids_by_type, batch_size=4, seed=1)
    batches = list(iter(sampler))
    assert len(batches) == 4
    for batch in batches:
        assert len(batch) == 4
        # type 'a' is half the data -> about half of every batch
        n_a = sum(1 for i in batch if i < 8)
        assert n_a >= 1
    all_ids = sorted(i for b in batches for i in b)
    assert all_ids == list(range(16))


def test_prediction_saving(dataset, tmp_path):
    """Standardized GT passed through save_prediction_batch round-trips to a
    valid spec with panels and stitches."""
    wrapper = DatasetWrapper(dataset)
    wrapper.load_split({'valid_per_type': 1, 'test_per_type': 1,
                        'type': 'count', 'random_seed': 10})
    wrapper.new_loaders(batch_size=2)
    wrapper.standardize_data()

    batch = next(iter(wrapper.loaders.test))
    gt = batch['ground_truth']
    # perfect 'predictions' = the GT itself (plus logits for free edges)
    free_logits = np.where(gt['free_edges_mask'], 10.0, -10.0).astype(np.float32)
    preds = {'outlines': gt['outlines'], 'rotations': gt['rotations'],
             'translations': gt['translations'], 'stitch_tags': gt['stitch_tags'],
             'free_edges_mask': free_logits, 'stitches': gt['stitches']}
    imgs = dataset.save_prediction_batch(
        preds, batch['name'], batch['data_folder'], tmp_path)
    assert len(imgs) == 2
    for img in imgs:
        assert img.exists()
        spec_files = list(img.parent.glob('*_predicted__specification.json'))
        assert len(spec_files) == 1

    # decoding from GT preserves panel count
    import json
    with open(spec_files[0]) as f:
        spec = json.load(f)
    assert len(spec['pattern']['panels']) >= 2
    assert len(spec['pattern']['stitches']) >= 2


def test_stitch_pairs_dataset(synthetic_dataset_root):
    ds = GarmentStitchPairsDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS, 'stitched_edge_pairs_num': 10,
         'non_stitched_edge_pairs_num': 10, 'pairs_seed': 3},
        gt_caching=True, feature_caching=True)
    sample = ds[0]
    assert sample['features'].shape == (20, 16)
    assert sample['ground_truth'].shape == (20,)
    assert sample['ground_truth'].dtype == bool
    assert sample['ground_truth'].sum() == 10

    # all-pairs mode
    ds.config.update(random_pairs_mode=False)
    ds._drop_cache()
    sample = ds[0]
    assert sample['features'].shape[-1] == 16
    assert sample['features'].shape[0] == sample['ground_truth'].shape[0]

    wrapper = DatasetWrapper(ds)
    wrapper.load_split({'valid_per_type': 1, 'test_per_type': 1,
                        'type': 'count', 'random_seed': 5})
    ds.config.update(random_pairs_mode=True)
    ds._drop_cache()
    wrapper.standardize_data()
    stats = ds.config['standardize']
    assert len(stats['f_shift']) == 16


def test_loader_prefetch_and_shapes(dataset):
    loader = DataLoader(dataset, batch_size=4, shuffle=True, prefetch=2, seed=0)
    seen = 0
    for batch in loader:
        assert batch['features'].ndim == 3
        assert isinstance(batch['name'], list)
        seen += batch['features'].shape[0]
    assert seen == len(dataset)


def test_loader_survives_bad_batches():
    """An exception during one batch's assembly surfaces from that next()
    call and iteration CONTINUES — the eval loop's catch-and-continue
    semantics (reference skips InvalidPatternDefError batches)."""
    from garment_pattern_estimation_tpu.data.loader import DataLoader

    class Flaky:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise ValueError('bad sample')
            return {'x': np.full(2, i, dtype=np.float32)}

    for prefetch in (0, 1):
        loader = DataLoader(Flaky(), batch_size=2, prefetch=prefetch)
        seen, errors = [], 0
        it = iter(loader)
        while True:
            try:
                batch = next(it)
            except StopIteration:
                break
            except ValueError:
                errors += 1
                continue
            seen.append(int(batch['x'][0, 0]))
        assert errors == 1, f'prefetch={prefetch}'
        assert seen == [0, 4, 6], f'prefetch={prefetch}: {seen}'


def test_loader_early_abandon_stops_worker():
    """Breaking out of iteration early must not leave the prefetch worker
    blocked on a full queue forever."""
    import threading
    from garment_pattern_estimation_tpu.data.loader import DataLoader

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {'x': np.zeros(4, dtype=np.float32)}

    before = threading.active_count()
    for _ in range(5):
        it = iter(DataLoader(Slow(), batch_size=2, prefetch=1))
        next(it)
        it.close()
    # workers must exit (0.5 s put timeout); allow a little slack
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_warm_cache_matches_lazy(synthetic_dataset_root):
    """Parallel cache warming produces byte-identical features/GT to lazy
    (per-sample seeds derive from datapoint names, not visit order)."""
    config = {'data_folders': FOLDERS, 'mesh_samples': 60,
              'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')}
    lazy = Garment3DPatternFullDataset(synthetic_dataset_root, dict(config),
                                       gt_caching=True, feature_caching=True)
    warm = Garment3DPatternFullDataset(synthetic_dataset_root, dict(config),
                                       gt_caching=True, feature_caching=True)

    pre_cached = len(warm.feature_cached)  # __init__ shape probe caches one
    warmed = warm.warm_cache(workers=4)
    assert warmed == len(warm) - pre_cached
    assert set(warm.feature_cached) == set(warm.datapoints_names)
    assert warm.warm_cache(workers=4) == 0  # everything cached -> no-op

    for i in (0, 3, 7, len(lazy) - 1):
        a, b = lazy[i], warm[i]
        np.testing.assert_array_equal(np.asarray(a['features']),
                                      np.asarray(b['features']))
        for key in a['ground_truth']:
            np.testing.assert_array_equal(
                np.asarray(a['ground_truth'][key]),
                np.asarray(b['ground_truth'][key]), err_msg=key)


def test_warm_cache_noop_without_caching(synthetic_dataset_root):
    ds = Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS[:1], 'mesh_samples': 40,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=False, feature_caching=False)
    assert ds.warm_cache(workers=4) == 0
    assert not ds.feature_cached and not ds.gt_cached
