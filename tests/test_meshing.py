"""Meshing tests: spectral Poisson + surface nets, Delaunay visibility cut.

reference test analogue: mvs meshing is untested in the reference (vendored
PoissonRecon/CGAL); here geometric invariants of analytic shapes are
asserted: surface position, orientation (signed volume), area.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.mvs.meshing import (
    DelaunayMeshingOptions,
    PoissonMeshingOptions,
    delaunay_meshing,
    poisson_mesh,
    surface_nets,
)
from colmap_tpu.utils.ply import (
    read_ply_mesh,
    write_ply,
    write_ply_mesh,
)


def _sphere_points(rng, n, radius=1.0):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * radius, v


def test_surface_nets_sphere_sdf():
    # Analytic SDF of a sphere on a grid: extraction must recover it.
    N = 48
    g = np.mgrid[0:N, 0:N, 0:N].astype(np.float64)
    c = (N - 1) / 2.0
    r = 14.0
    # chi > 0 inside (indicator convention used by poisson_mesh).
    field = r - np.sqrt(((g - c) ** 2).sum(axis=0))
    verts, faces, cells = surface_nets(field)
    assert len(verts) > 500 and len(faces) > 1000
    rad = np.linalg.norm(verts - c, axis=1)
    assert abs(rad.mean() - r) < 0.1
    assert rad.std() < 0.1
    # Orientation: signed volume positive (outward normals).
    a, b, cc = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    vol = np.einsum(
        "ij,ij->i", a - c, np.cross(b - c, cc - c)
    ).sum() / 6.0
    assert abs(vol - 4.0 / 3.0 * np.pi * r**3) / (4 / 3 * np.pi * r**3) < 0.05


def test_poisson_mesh_sphere():
    rng = np.random.default_rng(0)
    pts, nrm = _sphere_points(rng, 8000)
    verts, faces, _ = poisson_mesh(
        pts, nrm, options=PoissonMeshingOptions(depth=6, trim=3)
    )
    assert len(verts) > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 1.0) < 0.01
    assert r.std() < 0.01
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    vol = np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6.0
    assert abs(vol - 4.19) < 0.15


def test_poisson_mesh_trim():
    # A hemisphere of samples must not produce the missing half.
    rng = np.random.default_rng(1)
    pts, nrm = _sphere_points(rng, 8000)
    keep = pts[:, 2] > 0
    verts, faces, _ = poisson_mesh(
        pts[keep], nrm[keep], options=PoissonMeshingOptions(depth=6, trim=2)
    )
    assert len(verts) > 200
    assert (verts[:, 2] > -0.2).mean() > 0.95


def test_delaunay_mesh_sphere():
    rng = np.random.default_rng(2)
    pts, _ = _sphere_points(rng, 1500)
    centers = {
        i: c
        for i, c in enumerate(
            np.array(
                [[4, 0, 0], [-4, 0, 0], [0, 4, 0], [0, -4, 0], [0, 0, 4], [0, 0, -4]],
                dtype=float,
            )
        )
    }
    vis = [
        np.array([i for i, c in centers.items() if np.dot(p, c) > 0])
        for p in pts
    ]
    verts, faces = delaunay_meshing(pts, vis, centers)
    assert len(faces) > 1000
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert abs(area - 4 * np.pi) < 0.5
    vol = np.einsum("ij,ij->i", a.astype(float), np.cross(b, c)).sum() / 6.0
    assert vol > 3.5  # outward-oriented closed surface


def test_ply_mesh_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]], dtype=np.int32)
    colors = np.array([[255, 0, 0]] * 4, dtype=np.uint8)
    p = str(tmp_path / "mesh.ply")
    write_ply_mesh(p, verts, faces, colors)
    m = read_ply_mesh(p)
    np.testing.assert_allclose(m["vertices"], verts)
    np.testing.assert_array_equal(m["faces"], faces)
    np.testing.assert_array_equal(m["colors"], colors)
    # ascii round-trip
    p2 = str(tmp_path / "mesh_ascii.ply")
    write_ply_mesh(p2, verts, faces, binary=False)
    m2 = read_ply_mesh(p2)
    np.testing.assert_allclose(m2["vertices"], verts, atol=1e-6)
    np.testing.assert_array_equal(m2["faces"], faces)


def test_fused_vis_roundtrip(tmp_path):
    from colmap_tpu.mvs.fusion import read_fused_vis, write_fused_vis

    vis = [np.array([1, 5, 9], np.uint32), np.array([], np.uint32),
           np.array([2], np.uint32)]
    p = str(tmp_path / "fused.ply.vis")
    write_fused_vis(p, vis)
    out = read_fused_vis(p)
    assert len(out) == 3
    for a, b in zip(vis, out):
        np.testing.assert_array_equal(a, b)


def test_poisson_mesher_cli(tmp_path):
    from colmap_tpu.cli.main import main
    from colmap_tpu.utils.ply import write_ply

    rng = np.random.default_rng(3)
    pts, nrm = _sphere_points(rng, 4000)
    inp = str(tmp_path / "fused.ply")
    outp = str(tmp_path / "meshed-poisson.ply")
    write_ply(inp, pts, nrm)
    main(["poisson_mesher", "--input_path", inp, "--output_path", outp,
          "--depth", "6"])
    m = read_ply_mesh(outp)
    assert len(m["vertices"]) > 1000
    r = np.linalg.norm(m["vertices"], axis=1)
    assert abs(r.mean() - 1.0) < 0.02


def test_simplify_mesh_quadric():
    from colmap_tpu.mvs.simplification import _load, simplify_mesh

    rng = np.random.default_rng(4)
    pts, nrm = _sphere_points(rng, 6000)
    verts, faces, _ = poisson_mesh(
        pts, nrm, options=PoissonMeshingOptions(depth=6, trim=3)
    )
    sv, sf = simplify_mesh(verts, faces, 0.1)
    assert len(sf) <= len(faces) * 0.12
    r = np.linalg.norm(sv, axis=1)
    assert abs(r.mean() - 1.0) < 0.02
    a, b, c = sv[sf[:, 0]], sv[sf[:, 1]], sv[sf[:, 2]]
    vol = np.einsum("ij,ij->i", a.astype(float), np.cross(b, c)).sum() / 6.0
    assert abs(vol - 4.19) < 0.3


def test_simplify_mesh_fallback_clustering():
    from colmap_tpu.mvs import simplification

    rng = np.random.default_rng(5)
    pts, nrm = _sphere_points(rng, 4000)
    verts, faces, _ = poisson_mesh(
        pts, nrm, options=PoissonMeshingOptions(depth=6, trim=3)
    )
    sv, sf = simplification._cluster_simplify(
        verts.astype(np.float64), faces.astype(np.int64), len(faces) // 10
    )
    assert 0 < len(sf) < len(faces)
    r = np.linalg.norm(sv, axis=1)
    assert abs(r.mean() - 1.0) < 0.05
