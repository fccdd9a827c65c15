"""Host-side mesh preprocessing (OBJ IO, sampling, snap)."""

from .mesh import read_triangle_mesh, sample_mesh_points, snap_points

__all__ = ['read_triangle_mesh', 'sample_mesh_points', 'snap_points']
