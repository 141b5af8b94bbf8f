"""Line detection, coordinate-frame estimation, gravity refinement tests.

reference test strategy: image/line_test.cc, estimators/coordinate_frame_test.cc,
estimators/gravity_refinement_test.cc.
"""

import numpy as np
import pytest

from colmap_tpu.image.lines import (
    LineSegment,
    LineSegmentOrientation,
    classify_line_segment_orientations,
    detect_line_segments,
)


def _draw_segment(img, p0, p1, value=255.0):
    n = int(np.ceil(np.linalg.norm(np.asarray(p1) - np.asarray(p0)) * 2)) + 1
    ts = np.linspace(0.0, 1.0, n)
    pts = np.outer(1 - ts, p0) + np.outer(ts, p1)
    for x, y in pts:
        xi, yi = int(round(x)), int(round(y))
        if 0 <= yi < img.shape[0] and 0 <= xi < img.shape[1]:
            img[yi, xi] = value
            if yi + 1 < img.shape[0]:
                img[yi + 1, xi] = value


def test_detect_line_segments():
    img = np.zeros((200, 200), dtype=np.float32)
    truth = [
        ((20, 30), (180, 30)),    # horizontal
        ((50, 60), (50, 190)),    # vertical
        ((30, 100), (150, 170)),  # diagonal
    ]
    for p0, p1 in truth:
        _draw_segment(img, p0, p1)
    segments = detect_line_segments(img, min_length=40.0)
    assert len(segments) >= 3
    # Every true segment covered by a detection lying on its line with the
    # same direction (LSD detects the two stroke edges and splits segments at
    # crossings, so match by line distance rather than exact endpoints).
    for p0, p1 in truth:
        p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
        d_true = (p1 - p0) / np.linalg.norm(p1 - p0)
        normal = np.array([-d_true[1], d_true[0]])
        found = False
        for seg in segments:
            mid = (seg.start + seg.end) / 2
            if (
                abs(seg.direction() @ d_true) > 0.99
                and abs((mid - p0) @ normal) < 3.0
                and -5 <= (mid - p0) @ d_true <= np.linalg.norm(p1 - p0) + 5
            ):
                found = True
                break
        assert found, (p0, p1)


def test_classify_orientations():
    segs = [
        LineSegment(np.array([0.0, 0]), np.array([100.0, 2])),
        LineSegment(np.array([0.0, 0]), np.array([3.0, 100])),
        LineSegment(np.array([0.0, 0]), np.array([70.0, 70])),
    ]
    out = classify_line_segment_orientations(segs, tolerance=0.1)
    assert out[0] == LineSegmentOrientation.HORIZONTAL
    assert out[1] == LineSegmentOrientation.VERTICAL
    assert out[2] == LineSegmentOrientation.UNDEFINED


def test_vanishing_point():
    from colmap_tpu.estimators.coordinate_frame import estimate_vanishing_point

    vp = np.array([300.0, 200.0])
    rng = np.random.default_rng(0)
    segments = []
    for _ in range(30):
        p0 = rng.uniform(0, 100, 2)
        d = vp - p0
        d /= np.linalg.norm(d)
        t0, t1 = sorted(rng.uniform(5, 80, 2))
        segments.append(LineSegment(p0 + t0 * d, p0 + t1 * d))
    # Outliers.
    for _ in range(8):
        p0 = rng.uniform(0, 400, 2)
        d = rng.standard_normal(2)
        d /= np.linalg.norm(d)
        segments.append(LineSegment(p0, p0 + 40 * d))
    result = estimate_vanishing_point(segments, max_error=0.25)
    assert result is not None
    vp_est, inliers = result
    vp_xy = vp_est[:2] / vp_est[2]
    np.testing.assert_allclose(vp_xy, vp, atol=1.0)
    assert inliers[:30].mean() > 0.9


def _manhattan_scene(cam_rotations_deg):
    """Reconstruction + rendered line images of a Manhattan 'building'."""
    import jax.numpy as jnp

    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.scene.reconstruction import Reconstruction
    from colmap_tpu.scene.types import Camera, Frame, Image, Pose, Rig, SensorType

    recon = Reconstruction()
    W, H, f = 640, 480, 500.0
    cam = Camera.create(1, 1, f, W, H)  # PINHOLE
    recon.add_camera(cam)
    # A grid of axis-aligned 3D segments at z in [4, 8].
    segs3d = []
    for y in (-1.0, 0.0, 1.0):
        for z in (5.0, 6.5):
            segs3d.append((np.array([-2.0, y, z]), np.array([2.0, y, z])))  # X
    for x in (-1.5, 0.0, 1.5):
        for z in (5.0, 6.5):
            segs3d.append((np.array([x, -1.5, z]), np.array([x, 1.5, z])))  # Y
    images = {}
    for k, rz in enumerate(cam_rotations_deg):
        rig = Rig(rig_id=k + 1, ref_sensor_id=(int(SensorType.CAMERA), 1))
        recon.add_rig(rig)
        q = np.asarray(
            rot.quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), np.radians(rz))
        )
        pose = Pose(q, np.array([0.0, 0.0, 0.0]))
        frame = Frame(frame_id=k + 1, rig_id=k + 1, rig_from_world=pose,
                      data_ids=[(int(SensorType.CAMERA), 1, k + 1)])
        recon.add_frame(frame)
        img = Image(image_id=k + 1, name=f"im{k}.png", camera_id=1,
                    frame_id=k + 1)
        img.set_points2D(np.zeros((1, 2)))
        recon.add_image(img)
        recon.register_frame(k + 1)
        canvas = np.zeros((H, W), dtype=np.float32)
        R = pose.rotmat()
        for (a, b) in segs3d:
            pa, pb = R @ a + pose.t, R @ b + pose.t
            if pa[2] <= 0.1 or pb[2] <= 0.1:
                continue
            ua = (f * pa[0] / pa[2] + W / 2, f * pa[1] / pa[2] + H / 2)
            ub = (f * pb[0] / pb[2] + W / 2, f * pb[1] / pb[2] + H / 2)
            _draw_segment(canvas, ua, ub)
        images[k + 1] = canvas
    return recon, images


def test_manhattan_world_frame():
    from colmap_tpu.estimators.coordinate_frame import (
        ManhattanWorldFrameOptions,
        estimate_manhattan_world_frame,
    )

    recon, images = _manhattan_scene([0.0, 8.0, -8.0])
    frame = estimate_manhattan_world_frame(
        recon, images, ManhattanWorldFrameOptions(min_line_length=30.0)
    )
    assert abs(abs(np.linalg.det(frame)) - 1.0) < 1e-6
    # Rightward ≈ ±X, downward ≈ ±Y of the world.
    assert abs(frame[:, 0] @ np.array([1.0, 0, 0])) > 0.99
    assert abs(frame[:, 1] @ np.array([0.0, 1, 0])) > 0.99


def test_gravity_from_image_orientation():
    from colmap_tpu.estimators.coordinate_frame import (
        estimate_gravity_from_image_orientation,
    )
    from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset

    recon = synthesize_dataset(
        SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=6,
                                num_points3D=30, seed=1)
    )
    g = estimate_gravity_from_image_orientation(recon, max_axis_distance=2.0)
    # With consensus distance 2.0 every axis is an inlier: plain average.
    expected = np.mean(
        [recon.cam_from_world(i).rotmat()[1] for i in recon.reg_image_ids()],
        axis=0,
    )
    np.testing.assert_allclose(g, expected, atol=1e-12)


def test_align_to_principal_plane():
    from colmap_tpu.estimators.coordinate_frame import align_to_principal_plane
    from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset

    recon = synthesize_dataset(
        SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=5,
                                num_points3D=60, seed=4)
    )
    # Squash points to a slanted plane so the principal plane is well-defined.
    n = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    for p in recon.points3D.values():
        p.xyz = p.xyz - (p.xyz @ n) * n
    align_to_principal_plane(recon)
    pts = np.stack([p.xyz for p in recon.points3D.values()])
    # Plane now ~z=0, centered.
    assert np.abs(pts.mean(axis=0)).max() < 1e-9
    assert np.abs(pts[:, 2]).max() < 1e-9
    # First camera above the plane.
    iid0 = sorted(recon.reg_image_ids())[0]
    assert recon.cam_from_world(iid0).inverse().t[2] >= 0


def test_align_to_enu_plane():
    import jax.numpy as jnp

    from colmap_tpu.estimators.coordinate_frame import align_to_enu_plane
    from colmap_tpu.geometry.gps import ellipsoid_to_ecef
    from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset

    recon = synthesize_dataset(
        SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=4,
                                num_points3D=40, seed=6)
    )
    # Move the model to an ECEF location (Zurich-ish).
    ecef = np.asarray(ellipsoid_to_ecef(47.37, 8.54, 400.0)).reshape(3)
    recon.transform(1.0, np.array([1.0, 0, 0, 0]), ecef)
    align_to_enu_plane(recon)
    pts = np.stack([p.xyz for p in recon.points3D.values()])
    # Centered at the ENU origin and metric-small.
    assert np.abs(pts.mean(axis=0)).max() < 1e-6
    assert np.abs(pts).max() < 100.0


def test_gravity_refinement():
    import jax.numpy as jnp

    from colmap_tpu.estimators.gravity_refinement import (
        GravityRefinerOptions,
        identify_error_prone_gravity,
        refine_gravity,
    )
    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.utils.types import image_pair_to_pair_id

    rng = np.random.default_rng(0)
    n = 10
    g_world = np.array([0.0, 1.0, 0.0])
    Rs = []
    for i in range(n):
        q = rot.quat_from_axis_angle(
            jnp.asarray(rng.standard_normal(3)), rng.uniform(0.1, 0.5)
        )
        from colmap_tpu.scene.types import Pose

        Rs.append(Pose(np.asarray(q), np.zeros(3)).rotmat())
    gravities = {i: Rs[i] @ g_world for i in range(n)}
    # Corrupt frame 3.
    bad = np.array([1.0, 0.2, 0.1])
    gravities[3] = bad / np.linalg.norm(bad)
    rel = {}
    for i in range(n):
        for j in range(i + 1, n):
            rel[image_pair_to_pair_id(i, j)] = Rs[j] @ Rs[i].T
    image_to_frame = {i: i for i in range(n)}
    options = GravityRefinerOptions(min_num_neighbors=5)
    flagged = identify_error_prone_gravity(rel, image_to_frame, gravities, options)
    assert flagged == {3}
    refined = refine_gravity(rel, image_to_frame, gravities, options)
    assert set(refined) == {3}
    true_g3 = Rs[3] @ g_world
    assert np.degrees(np.arccos(np.clip(refined[3] @ true_g3, -1, 1))) < 0.1


def test_orientation_aligner_cli(tmp_path):
    from colmap_tpu.cli.main import main as cli_main
    from colmap_tpu.scene.reconstruction_io import read_model, write_model
    from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset

    recon = synthesize_dataset(
        SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=5,
                                num_points3D=50, seed=9)
    )
    src = str(tmp_path / "src")
    write_model(recon, src, fmt="bin")
    out = str(tmp_path / "aligned")
    cli_main(["model_orientation_aligner", "--input_path", src,
              "--output_path", out, "--method", "PRINCIPAL-PLANE"])
    aligned = read_model(out)
    assert aligned.num_reg_frames() == 5
