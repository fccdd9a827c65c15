"""Mesh preprocessing: OBJ IO, surface sampling, snap — native vs fallback parity."""
import numpy as np
import pytest

from garment_pattern_estimation_tpu.preprocess import mesh, native
from garment_pattern_estimation_tpu.utils import synthetic


@pytest.fixture(scope='module')
def obj_file(tmp_path_factory):
    rng = np.random.default_rng(11)
    out = tmp_path_factory.mktemp('mesh') / 'sample'
    pattern = synthetic.generate_datapoint(out, 'tee', rng, name='sample')
    return out / 'sample_sim.obj', pattern


def test_obj_roundtrip(obj_file):
    path, _ = obj_file
    verts, faces = mesh.read_triangle_mesh(path)
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert faces.ndim == 2 and faces.shape[1] == 3
    assert faces.min() >= 0 and faces.max() < len(verts)

    # native and numpy parse agree exactly
    verts_np, faces_np = mesh._read_obj_numpy(path)
    if native.get_lib() is not None:
        verts_nat, faces_nat = native.obj_parse_native(path)
        np.testing.assert_allclose(verts_nat, verts_np, atol=1e-9)
        np.testing.assert_array_equal(faces_nat, faces_np)


def test_sampling_on_surface(obj_file):
    path, _ = obj_file
    verts, faces = mesh.read_triangle_mesh(path)
    points = mesh.sample_mesh_points(500, verts, faces, seed=123)
    assert points.shape == (500, 3)
    # sampled points lie within the mesh bounding box
    assert (points >= verts.min(axis=0) - 1e-6).all()
    assert (points <= verts.max(axis=0) + 1e-6).all()
    # every sampled point is close to the surface: nearest vertex within a
    # triangle diameter
    _, sq_dist = mesh.snap_points(points, verts)
    tri = verts[faces]
    max_edge = np.linalg.norm(tri[:, 1] - tri[:, 0], axis=1).max()
    assert np.sqrt(sq_dist).max() <= max_edge


def test_sampling_deterministic(obj_file):
    path, _ = obj_file
    verts, faces = mesh.read_triangle_mesh(path)
    p1 = mesh.sample_mesh_points(100, verts, faces, seed=7)
    p2 = mesh.sample_mesh_points(100, verts, faces, seed=7)
    p3 = mesh.sample_mesh_points(100, verts, faces, seed=8)
    np.testing.assert_array_equal(p1, p2)
    assert not np.allclose(p1, p3)


def test_snap_points_exact():
    rng = np.random.default_rng(5)
    targets = rng.normal(size=(300, 3))
    queries = targets[rng.integers(0, 300, size=50)] + 1e-9
    idx, sq = mesh.snap_points(queries, targets)
    np.testing.assert_allclose(np.sqrt(sq), 0, atol=1e-6)
    np.testing.assert_allclose(targets[idx], queries, atol=1e-6)

    # parity with scipy on random queries
    queries = rng.normal(size=(200, 3)) * 2
    idx, sq = mesh.snap_points(queries, targets)
    from scipy.spatial import cKDTree
    dist_ref, idx_ref = cKDTree(targets).query(queries)
    np.testing.assert_allclose(np.sqrt(sq), dist_ref, atol=1e-9)
    np.testing.assert_array_equal(idx, idx_ref)
