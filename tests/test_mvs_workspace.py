"""Dense pipeline end-to-end on a synthetic textured-plane workspace.

reference test strategy: mvs tests over workspace-driven problems
(patch_match.cfg / workspace layout).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.mvs.workspace import (
    run_fusion_workspace,
    run_patch_match_workspace,
    select_patch_match_problems,
)
from colmap_tpu.mvs.patch_match import PatchMatchOptions
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.types import Camera, Frame, Image, Pose, Rig, TrackElement
from colmap_tpu.utils.types import SensorType


def _plane_workspace(size=48, depth0=5.0):
    """Three fronto-parallel-ish cameras viewing a textured plane z=depth0."""
    rng = np.random.default_rng(0)
    f = 60.0
    from scipy.ndimage import gaussian_filter

    tex = gaussian_filter(rng.uniform(0, 1, (512, 512)), 1.0)

    recon = Reconstruction()
    cam = Camera(camera_id=1, model_id=1, width=size, height=size,
                 params=np.array([f, f, size / 2, size / 2]),
                 has_prior_focal_length=True)
    recon.add_camera(cam)

    centers = [np.array([dx, 0.0, 0.0]) for dx in (0.0, -0.5, 0.5)]
    images = {}
    for i, c in enumerate(centers):
        iid = i + 1
        pose = Pose(np.array([1.0, 0, 0, 0]), -c)  # identity rotation
        rig = Rig(rig_id=iid, ref_sensor_id=(int(SensorType.CAMERA), 1))
        recon.add_rig(rig)
        frame = Frame(frame_id=iid, rig_id=iid, rig_from_world=pose,
                      data_ids=[(int(SensorType.CAMERA), 1, iid)])
        recon.add_frame(frame)
        img = Image(image_id=iid, name=f"v{i}.png", camera_id=1, frame_id=iid)
        # Render: pixel (x, y) -> ray -> plane z=depth0 -> texture.
        ys, xs = np.mgrid[0:size, 0:size]
        xn = (xs - size / 2) / f
        yn = (ys - size / 2) / f
        X = c[0] + xn * depth0
        Y = c[1] + yn * depth0
        u = (X * 40 + 256).astype(np.int64) % 512
        v = (Y * 40 + 256).astype(np.int64) % 512
        images[iid] = tex[v, u].astype(np.float32)
        # Sparse observations for depth ranges / source selection.
        img.set_points2D(rng.uniform(5, size - 5, (30, 2)))
        recon.add_image(img)
        recon.register_frame(iid)

    # Shared sparse 3D points on the plane observed by all images.
    for k in range(25):
        X = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), depth0])
        track = [TrackElement(iid, k) for iid in images]
        recon.add_point3D(X, track)
    return recon, images, depth0


def test_select_problems():
    recon, images, depth0 = _plane_workspace()
    problems = select_patch_match_problems(recon, max_num_src_images=2)
    assert len(problems) == 3
    for p in problems:
        assert len(p.src_image_ids) == 2
        assert p.depth_min < depth0 < p.depth_max


def test_dense_workspace_end_to_end(tmp_path):
    recon, images, depth0 = _plane_workspace()
    ws = str(tmp_path)
    options = PatchMatchOptions(num_iterations=5, window_radius=3)
    run_patch_match_workspace(recon, images, ws, options)
    from colmap_tpu.mvs.depth_map import read_map

    d = read_map(os.path.join(ws, "stereo", "depth_maps", "v0.png.photometric.bin"))
    valid = d > 0
    b = 6
    interior = d[b:-b, b:-b]
    good = interior[interior > 0]
    assert len(good) > 0.4 * interior.size
    assert abs(np.median(good) - depth0) / depth0 < 0.03

    out_ply = str(tmp_path / "fused.ply")
    pts, normals, vis = run_fusion_workspace(recon, ws, out_ply)
    assert len(pts) > 200
    # Fused points lie on the plane z = depth0.
    assert abs(np.median(pts[:, 2]) - depth0) / depth0 < 0.03
    assert os.path.exists(out_ply)


def test_dense_workspace_geom_consistency(tmp_path):
    """Two-pass PatchMatch: the geometric pass must produce *.geometric.bin
    maps at least as accurate as the photometric pass on the plane scene
    (reference: PatchMatchController geometric pass, mvs/patch_match.cc)."""
    recon, images, depth0 = _plane_workspace()
    ws = str(tmp_path)
    options = PatchMatchOptions(num_iterations=4, window_radius=3)
    run_patch_match_workspace(recon, images, ws, options, geom_consistency=True)
    from colmap_tpu.mvs.depth_map import read_map

    dg = read_map(os.path.join(ws, "stereo", "depth_maps", "v0.png.geometric.bin"))
    b = 6
    interior = dg[b:-b, b:-b]
    good = interior[interior > 0]
    assert len(good) > 0.4 * interior.size
    assert abs(np.median(good) - depth0) / depth0 < 0.03
    # Fusion prefers the geometric maps.
    out_ply = str(tmp_path / "fused.ply")
    pts, normals, vis = run_fusion_workspace(recon, ws, out_ply)
    assert len(pts) > 200
    assert os.path.exists(out_ply + ".vis")


def test_lru_caches():
    """LRU + memory-constrained caches (reference: util/cache.h:46,137)."""
    import numpy as np

    from colmap_tpu.utils.cache import LRUCache, MemoryConstrainedLRUCache

    loads = []
    c = LRUCache(2, lambda k: loads.append(k) or k * 10)
    assert c.get(1) == 10 and c.get(2) == 20
    assert c.get(1) == 10 and loads == [1, 2]  # hit
    c.get(3)  # evicts 2 (LRU)
    assert not c.exists(2) and c.exists(1) and c.exists(3)
    assert c.num_elems() == 2
    assert c.evict(1) and not c.exists(1)

    m = MemoryConstrainedLRUCache(
        2048, lambda k: np.zeros(k, np.uint8)
    )
    m.get(1000)
    m.get(900)
    assert m.num_bytes == 1900
    m.get(500)  # 2400 > 2048 -> evict LRU (1000)
    assert not m.exists(1000) and m.num_bytes == 1400
