"""MVS tests: PatchMatch stereo on a synthetic plane scene + fusion + I/O.

reference test strategy: mvs/*_test.cc (depth_map/fusion tests; PatchMatch
is validated on synthetic geometry).
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.mvs.depth_map import read_map, write_map
from colmap_tpu.mvs.fusion import FusionImage, FusionOptions, fuse_depth_maps
from colmap_tpu.mvs.patch_match import (
    PatchMatchOptions,
    PatchMatchProblem,
    patch_match,
)
from colmap_tpu.utils.ply import read_ply, write_ply


def test_depth_map_io(tmp_path):
    d = np.random.rand(24, 32).astype(np.float32)
    write_map(str(tmp_path / "d.bin"), d)
    back = read_map(str(tmp_path / "d.bin"))
    np.testing.assert_array_equal(back, d)
    n = np.random.rand(24, 32, 3).astype(np.float32)
    write_map(str(tmp_path / "n.bin"), n)
    back = read_map(str(tmp_path / "n.bin"))
    np.testing.assert_array_equal(back, n)


def test_ply_roundtrip(tmp_path):
    pts = np.random.rand(50, 3).astype(np.float32)
    nrm = np.random.rand(50, 3).astype(np.float32)
    col = np.random.randint(0, 255, (50, 3)).astype(np.uint8)
    for binary in (True, False):
        write_ply(str(tmp_path / "p.ply"), pts, nrm, col, binary=binary)
        back = read_ply(str(tmp_path / "p.ply"))
        np.testing.assert_allclose(back["points"], pts, atol=1e-5)
        np.testing.assert_allclose(back["normals"], nrm, atol=1e-5)
        np.testing.assert_array_equal(back["colors"], col)


def _textured_plane_scene(rng, size=48, depth0=5.0, slope=0.02):
    """Reference camera at origin; a textured slanted plane; two side views."""
    f = 60.0
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1.0]])
    tex_size = 512
    texture = rng.uniform(0, 1, (tex_size, tex_size))
    # Smooth the texture a little for gradient structure.
    from scipy.ndimage import gaussian_filter

    texture = gaussian_filter(texture, 1.0)

    def plane_depth(x, y):
        # z = depth0 + slope*(x_cam + y_cam)*z -> solve for z along ray.
        # Plane: z = depth0 + slope*X + slope*Y where X = x_n z, Y = y_n z
        # => z (1 - slope*x_n - slope*y_n) = depth0.
        xn = (x - size / 2) / f
        yn = (y - size / 2) / f
        return depth0 / (1.0 - slope * xn - slope * yn)

    def render(R, t):
        img = np.zeros((size, size))
        ys, xs = np.mgrid[0:size, 0:size]
        # For each pixel of this view, intersect ray with the plane defined
        # in the reference frame, then look up texture at the world point.
        Kinv = np.linalg.inv(K)
        rays = np.stack([xs, ys, np.ones_like(xs)], axis=-1) @ Kinv.T
        # Transform ray to reference frame: X_ref = Rᵀ(X_cam - t).
        # Points on ray: X_cam = s*ray. Plane in ref frame:
        # z_ref = depth0 + slope*x_ref + slope*y_ref.
        Rt = R.T
        o = -Rt @ t  # camera center in ref frame
        d = rays @ Rt.T  # ray dirs in ref frame
        # Solve: (o + s d)_z = depth0 + slope*(o+s d)_x + slope*(o+s d)_y
        denom = d[..., 2] - slope * d[..., 0] - slope * d[..., 1]
        num = depth0 + slope * o[0] + slope * o[1] - o[2]
        s = num / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        X_ref = o + s[..., None] * d
        # Texture lookup by world plane coords.
        u = (X_ref[..., 0] * 40 + tex_size / 2).astype(np.int64) % tex_size
        v = (X_ref[..., 1] * 40 + tex_size / 2).astype(np.int64) % tex_size
        img = texture[v, u]
        return img.astype(np.float32), s.astype(np.float32)

    R0 = np.eye(3)
    t0 = np.zeros(3)
    ref_img, ref_depth = render(R0, t0)
    srcs, Rs, ts = [], [], []
    for dx in (-0.5, 0.5):
        R = np.eye(3)
        # Camera at center (dx,0,0) in ref frame: x_cam = R(X - c) => t = -R c.
        t = -R @ np.array([dx, 0.0, 0.0])
        img, _ = render(R, t)
        srcs.append(img)
        Rs.append(R)
        ts.append(t)
    return K, ref_img, ref_depth, srcs, Rs, ts


def test_patch_match_plane():
    rng = np.random.default_rng(0)
    K, ref_img, ref_depth, srcs, Rs, ts = _textured_plane_scene(rng)
    problem = PatchMatchProblem(
        ref_image=jnp.asarray(ref_img),
        src_images=jnp.asarray(np.stack(srcs)),
        K_ref=jnp.asarray(K, dtype=jnp.float32),
        K_src=jnp.asarray(np.stack([K, K]), dtype=jnp.float32),
        R_rel=jnp.asarray(np.stack(Rs), dtype=jnp.float32),
        t_rel=jnp.asarray(np.stack(ts), dtype=jnp.float32),
    )
    options = PatchMatchOptions(
        depth_min=2.0, depth_max=10.0, num_iterations=6, window_radius=3
    )
    depth, normal, cost = patch_match(problem, options, seed=1)
    # Interior pixels (border excluded) should be close to GT depth.
    b = 6
    err = np.abs(depth[b:-b, b:-b] - ref_depth[b:-b, b:-b]) / ref_depth[b:-b, b:-b]
    good = cost[b:-b, b:-b] < 0.3
    assert good.mean() > 0.5, f"only {good.mean():.2f} of pixels converged"
    assert np.median(err[good]) < 0.02, f"median depth error {np.median(err[good]):.4f}"


def test_fusion_consistent_points():
    # Two identical fronto-parallel depth maps from slightly offset cameras.
    size = 20
    f = 30.0
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1.0]])
    depth0 = 4.0
    # Camera 1 at origin, camera 2 shifted in x; plane z=4 in world.
    d1 = np.full((size, size), depth0, dtype=np.float32)
    n1 = np.zeros((size, size, 3), dtype=np.float32)
    n1[..., 2] = -1
    img1 = FusionImage(1, K, np.eye(3), np.zeros(3), d1, n1)
    c2 = np.array([0.3, 0.0, 0.0])
    img2 = FusionImage(2, K, np.eye(3), -c2, d1.copy(), n1.copy())
    pts, nrm, vis = fuse_depth_maps([img1, img2], FusionOptions(min_num_consistent=2))
    assert len(pts) > 100
    np.testing.assert_allclose(pts[:, 2], depth0, atol=0.05)
    # Each fused point saw both images.
    assert np.mean([len(v) >= 2 for v in vis]) > 0.8


def test_fusion_rejects_inconsistent():
    size = 16
    f = 30.0
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1.0]])
    d1 = np.full((size, size), 4.0, dtype=np.float32)
    d2 = np.full((size, size), 8.0, dtype=np.float32)  # inconsistent
    n = np.zeros((size, size, 3), dtype=np.float32)
    n[..., 2] = -1
    img1 = FusionImage(1, K, np.eye(3), np.zeros(3), d1, n)
    img2 = FusionImage(2, K, np.eye(3), -np.array([0.3, 0, 0]), d2, n.copy())
    pts, _, _ = fuse_depth_maps([img1, img2], FusionOptions(min_num_consistent=2))
    assert len(pts) == 0


def test_view_selection_downweights_decoy():
    """Pixelwise view selection (reference: LikelihoodComputer message
    passing, patch_match_cuda.cu:700-830): a pure-noise decoy source view
    must end with much lower selection probability than the real views, and
    the depth estimate must stay accurate despite the decoy."""
    rng = np.random.default_rng(3)
    K, ref_img, ref_depth, srcs, Rs, ts = _textured_plane_scene(rng)
    decoy = rng.uniform(0, 1, ref_img.shape).astype(np.float32)
    problem = PatchMatchProblem(
        ref_image=jnp.asarray(ref_img),
        src_images=jnp.asarray(np.stack(srcs + [decoy])),
        K_ref=jnp.asarray(K, dtype=jnp.float32),
        K_src=jnp.asarray(np.stack([K] * 3), dtype=jnp.float32),
        R_rel=jnp.asarray(np.stack(Rs + [np.eye(3)]), dtype=jnp.float32),
        t_rel=jnp.asarray(
            np.stack(ts + [np.array([0.7, 0.0, 0.0])]), dtype=jnp.float32
        ),
    )
    options = PatchMatchOptions(
        depth_min=2.0, depth_max=10.0, num_iterations=6, window_radius=3,
        view_selection=True,
    )
    from colmap_tpu.mvs.patch_match import (
        _consistency_filter, _per_view_costs, _view_weights,
    )
    import colmap_tpu.mvs.patch_match as pm
    import jax

    # Run the public API then recover the final selection state by one more
    # forward pass of the internals.
    depth, normal, cost = patch_match(problem, options, seed=1)
    cost_all = np.asarray(
        _per_view_costs(problem, jnp.asarray(depth), jnp.asarray(normal), options)
    )
    b = 6
    interior = (slice(b, -b), slice(b, -b))
    # Decoy view's per-view NCC cost is far worse than the real views.
    assert np.median(cost_all[2][interior]) > np.median(cost_all[0][interior]) + 0.3
    # Depth still converges.
    err = np.abs(depth[interior] - ref_depth[interior]) / ref_depth[interior]
    good = cost[interior] < 0.4
    assert good.mean() > 0.4
    assert np.median(err[good]) < 0.03


def test_patch_match_consistency_mask():
    """return_consistency applies the reference's consistency filter
    (patch_match_cuda.cu:1209-1276): surviving pixels list the real views as
    consistent, not the decoy."""
    rng = np.random.default_rng(4)
    K, ref_img, ref_depth, srcs, Rs, ts = _textured_plane_scene(rng)
    decoy = rng.uniform(0, 1, ref_img.shape).astype(np.float32)
    problem = PatchMatchProblem(
        ref_image=jnp.asarray(ref_img),
        src_images=jnp.asarray(np.stack(srcs + [decoy])),
        K_ref=jnp.asarray(K, dtype=jnp.float32),
        K_src=jnp.asarray(np.stack([K] * 3), dtype=jnp.float32),
        R_rel=jnp.asarray(np.stack(Rs + [np.eye(3)]), dtype=jnp.float32),
        t_rel=jnp.asarray(
            np.stack(ts + [np.array([0.7, 0.0, 0.0])]), dtype=jnp.float32
        ),
    )
    options = PatchMatchOptions(
        depth_min=2.0, depth_max=10.0, num_iterations=6, window_radius=3,
    )
    depth, normal, cost, mask = patch_match(
        problem, options, seed=1, return_consistency=True
    )
    surviving = depth > 0
    assert surviving.mean() > 0.2
    # Among surviving pixels, real views are consistent far more often than
    # the decoy.
    real_rate = mask[:2, surviving].mean()
    decoy_rate = mask[2, surviving].mean()
    assert real_rate > 0.8
    assert decoy_rate < 0.2


def test_consistency_graph_roundtrip(tmp_path):
    """COLMAP-format consistency graph write/read round-trip
    (reference: mvs/consistency_graph.cc format 'W&H&1&' + int32 records)."""
    from colmap_tpu.mvs.consistency_graph import ConsistencyGraph

    rng = np.random.default_rng(0)
    mask = rng.uniform(size=(3, 8, 10)) < 0.4
    g = ConsistencyGraph.from_mask(mask, [7, 2, 11])
    p = str(tmp_path / "cg.bin")
    g.write(p)
    back = ConsistencyGraph.read(p)
    assert back.width == 10 and back.height == 8
    ids = np.array([7, 2, 11])
    for r in range(8):
        for c in range(10):
            expect = sorted(ids[mask[:, r, c]].tolist())
            got = sorted(back.image_idxs(r, c).tolist())
            assert got == expect, (r, c)
