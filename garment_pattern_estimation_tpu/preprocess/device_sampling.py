"""On-device mesh surface sampling: jit-compatible, batched, TPU-resident.

The host pipeline samples point clouds per garment on CPU (preprocess/mesh.py
and the C++ counter-RNG path — replacing the reference's libigl calls at
nn/data/datasets.py:832-861). For the high-throughput stress configuration
the BASELINE north star asks for the per-sample preprocessing itself to run
fused on device: this module samples area-weighted barycentric surface
points, adds the `point_noise_w` gaussian perturbation, and nearest
-vertex-snaps segmentation labels — all as jnp ops under jit, batched over
meshes padded to a fixed (V, F) capacity.

Everything is O(F + N log F) per mesh with static shapes: face selection is
an inverse-CDF search (cumulative areas vs sorted uniforms via
`jnp.searchsorted`), so XLA lowers the whole pipeline onto the accelerator
with no host round-trip between data loading and the encoder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def face_areas(verts, faces):
    """(V, 3) x (F, 3) int -> (F,) triangle areas; degenerate (padded) faces
    — e.g. index-0 repeats used to pad to capacity — get zero area and are
    never sampled."""
    tri = verts[faces]                                      # (F, 3, 3)
    cr = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return 0.5 * jnp.linalg.norm(cr, axis=-1)


def sample_surface(key, verts, faces, num_points, noise_w=0.0):
    """Area-weighted uniform surface samples for ONE mesh (jit-compatible).

    Args:
      key: PRNG key.
      verts: (V, 3) float vertices (padding rows are fine if unreferenced).
      faces: (F, 3) int vertex ids; pad with degenerate faces (zero area).
      num_points: static sample count.
      noise_w: gaussian noise weight (the dataset's `point_noise_w`).

    Returns (points (num_points, 3), face_ids (num_points,)).
    """
    k_face, k_u, k_v, k_noise = jax.random.split(key, 4)
    areas = face_areas(verts, faces)
    cdf = jnp.cumsum(areas)
    total = cdf[-1]
    draws = jax.random.uniform(k_face, (num_points,)) * total
    face_ids = jnp.clip(jnp.searchsorted(cdf, draws, side='right'),
                        0, faces.shape[0] - 1)

    u = jax.random.uniform(k_u, (num_points,))
    v = jax.random.uniform(k_v, (num_points,))
    flip = u + v > 1.0                                       # fold onto the
    u = jnp.where(flip, 1.0 - u, u)                          # simplex
    v = jnp.where(flip, 1.0 - v, v)
    w = 1.0 - u - v

    tri = verts[faces[face_ids]]                             # (N, 3, 3)
    pts = (w[:, None] * tri[:, 0] + u[:, None] * tri[:, 1]
           + v[:, None] * tri[:, 2])
    if noise_w:
        pts = pts + noise_w * jax.random.normal(k_noise, pts.shape)
    return pts, face_ids


def sample_surface_batched(key, verts, faces, num_points, noise_w=0.0):
    """vmapped `sample_surface` over leading mesh axes: verts (B, V, 3),
    faces (B, F, 3) — meshes padded to shared capacity with degenerate
    faces. Returns (B, num_points, 3) points + (B, num_points) face ids."""
    keys = jax.random.split(key, verts.shape[0])
    return jax.vmap(
        lambda k, vv, ff: sample_surface(k, vv, ff, num_points, noise_w)
    )(keys, verts, faces)


def snap_to_vertices(points, verts, valid_verts=None):
    """Nearest-vertex index per point (the segmentation-label transfer of
    nn/data/datasets.py:863-905, on device): points (N, 3), verts (V, 3);
    `valid_verts` masks padded vertex rows out of the argmin."""
    d = jnp.sum((points[:, None, :] - verts[None, :, :]) ** 2, axis=-1)
    if valid_verts is not None:
        d = jnp.where(valid_verts[None, :], d, jnp.inf)
    return jnp.argmin(d, axis=-1)


def pad_mesh(verts, faces, v_cap, f_cap):
    """Host-side helper: pad one mesh to (v_cap, f_cap) capacity with
    zero vertices and degenerate (0,0,0) faces — zero area, never
    sampled. Returns (verts, faces, n_verts) as numpy arrays."""
    import numpy as np
    verts = np.asarray(verts, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    out_v = np.zeros((v_cap, 3), np.float32)
    out_v[:len(verts)] = verts
    out_f = np.zeros((f_cap, 3), np.int32)
    out_f[:len(faces)] = faces
    return out_v, out_f, len(verts)


def make_batch_sampler(data_config):
    """The `dataset.on_device_sampling` pipeline stage: a jittable
    ``fn(key, mesh_features) -> (points, segmentation)`` closing over the
    dataset config.

    `mesh_features` is the collated batch the dataset emits in on-device
    mode: {'verts' (B, Vcap, 3), 'faces' (B, Fcap, 3), 'n_verts' (B,),
    'vert_labels' (B, Vcap) int32 (-1 where no segmentation exists)}.
    The stage fuses, per cloud: area-weighted surface sampling +
    `point_noise_w` gaussian noise (the host path of
    nn/data/datasets.py:822-861), nearest-vertex segmentation snap
    (:863-905), and feature standardization — all under one jit, ahead of
    the encoder. Returns standardized points (B, N, 3) and per-point class
    labels (B, N) int32 (zeros when the batch carries no labels)."""
    num_points = int(data_config['mesh_samples'])
    noise_w = float(data_config.get('point_noise_w', 0) or 0)
    stats = data_config.get('standardize')
    if not stats or 'f_shift' not in stats:
        raise ValueError(
            'make_batch_sampler::feature standardization stats missing — call '
            'dataset.standardize() (or put them in the config) first')
    shift = jnp.asarray(stats['f_shift'], jnp.float32)
    scale = jnp.asarray(stats['f_scale'], jnp.float32)

    def sample_one(key, verts, faces, n_verts, vert_labels):
        pts, _ = sample_surface(key, verts, faces, num_points, noise_w)
        valid = jnp.arange(verts.shape[0]) < n_verts
        snap_idx = snap_to_vertices(pts, verts, valid)
        segm = jnp.maximum(vert_labels[snap_idx], 0).astype(jnp.int32)
        return (pts - shift) / scale, segm

    def sampler(key, mesh_features):
        verts = jnp.asarray(mesh_features['verts'], jnp.float32)
        keys = jax.random.split(key, verts.shape[0])
        return jax.vmap(sample_one)(
            keys, verts,
            jnp.asarray(mesh_features['faces'], jnp.int32),
            jnp.asarray(mesh_features['n_verts'], jnp.int32),
            jnp.asarray(mesh_features['vert_labels'], jnp.int32))

    return sampler


def maybe_batch_sampler(data_config):
    """`make_batch_sampler` when the config enables on-device sampling,
    else None — the one-liner every consumer (trainer, eval, predict)
    gates on."""
    if data_config.get('on_device_sampling'):
        return make_batch_sampler(data_config)
    return None
