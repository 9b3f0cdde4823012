"""Mesh-export unit tests: marching-tetrahedra iso-surface geometry and the
PLY writer (reference: ``nvsf/nerf/utils.py:559-608`` marching-cubes export)."""

import numpy as np

from nvsf_tpu.render.export import marching_tetrahedra, write_ply


def _sphere_grid(n=33, r=0.6):
    xs = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    # scalar field: positive inside the sphere, crosses 0 at radius r
    return r - np.sqrt(X**2 + Y**2 + Z**2)


def test_marching_tetrahedra_sphere():
    grid = _sphere_grid()
    verts, faces = marching_tetrahedra(grid, 0.0, (-1, -1, -1), (1, 1, 1))
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    # every iso-vertex sits on the r=0.6 sphere within a cell diagonal
    assert abs(radii.mean() - 0.6) < 0.02
    assert radii.std() < 0.02
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
    # surface area approximates 4*pi*r^2 (sum of triangle areas)
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    assert abs(area - 4 * np.pi * 0.6**2) / (4 * np.pi * 0.6**2) < 0.1


def test_marching_tetrahedra_empty_and_full():
    grid = np.full((8, 8, 8), -1.0)
    verts, faces = marching_tetrahedra(grid, 0.0, (-1, -1, -1), (1, 1, 1))
    assert len(verts) == 0 and len(faces) == 0
    grid = np.full((8, 8, 8), 1.0)       # fully inside: no crossing
    verts, faces = marching_tetrahedra(grid, 0.0, (-1, -1, -1), (1, 1, 1))
    assert len(faces) == 0


def test_write_ply(tmp_path):
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.array([[0, 1, 2]])
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces)
    txt = open(path).read().splitlines()
    assert txt[0] == "ply"
    assert "element vertex 3" in txt
    assert "element face 1" in txt
    assert txt[-1].startswith("3 0 1 2")
