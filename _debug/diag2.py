import dataclasses
import numpy as np
import jax.numpy as jnp
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.scene.pose_graph import PoseGraph
from colmap_tpu.scene.database_cache import DatabaseCache
from colmap_tpu.sfm import global_mapper as gm
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.estimators.rotation_averaging import estimate_rotations
from colmap_tpu.utils.types import pair_id_to_image_pair
from colmap_tpu.scene.types import Pose, Frame, Image, INVALID_POINT3D, TrackElement
from colmap_tpu.sensor import models as camera_models
from colmap_tpu.estimators.global_positioning import solve_global_positioning
from colmap_tpu.estimators.solvers.similarity import umeyama

for has_rel in (True, False):
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=8, num_points3D=150,
        num_points2D_without_point3D=5, seed=31,
        two_view_geometry_has_relative_pose=has_rel,
        camera_has_prior_focal_length=True,
    )
    db = Database(":memory:")
    gt = synthesize_dataset(opt, database=db)
    graph = PoseGraph.load(db, min_num_inliers=15)
    rel_poses = graph.rel_poses()
    cache = DatabaseCache.create(db, min_num_matches=15)
    recon = Reconstruction()
    mapper = gm.GlobalMapper(cache)
    options = gm.GlobalMapperOptions()

    # replicate solve() up to positioning
    for cid, cam in cache.cameras.items():
        recon.add_camera(dataclasses.replace(cam, params=cam.params.copy()))
    for rid, rig in cache.rigs.items(): recon.add_rig(rig)
    for fid, frame in cache.frames.items():
        recon.add_frame(Frame(frame_id=frame.frame_id, rig_id=frame.rig_id, data_ids=list(frame.data_ids)))
    for iid, image in cache.images.items():
        img = Image(image_id=image.image_id, name=image.name, camera_id=image.camera_id, frame_id=image.frame_id)
        img.points2D_xy = image.points2D_xy.copy()
        img.points2D_p3d = np.full(image.num_points2D(), INVALID_POINT3D, dtype=np.int64)
        recon.add_image(img)

    image_ids = sorted(recon.images.keys())
    row = {iid: i for i, iid in enumerate(image_ids)}
    edges, rel_quats, weights = [], [], []
    for pair_id, pose21 in rel_poses.items():
        id1, id2 = pair_id_to_image_pair(pair_id)
        edges.append((row[id1], row[id2]))
        rel_quats.append(pose21.quat / np.linalg.norm(pose21.quat))
        weights.append(cache.correspondence_graph.num_correspondences_between(id1, id2))
    quats = estimate_rotations(len(image_ids), np.asarray(edges), np.asarray(rel_quats),
                               np.asarray(weights, dtype=np.float64), options=options.rotation_averaging)
    # rotation error vs gt (up to global gauge)
    from colmap_tpu.geometry import rotation as rot
    gtq = np.array([gt.cam_from_world(iid).quat for iid in image_ids])
    err = np.asarray(rot.quat_multiply(rot.quat_conjugate(jnp.asarray(gtq)), jnp.asarray(quats)))
    ref = err[0]/np.linalg.norm(err[0])
    rotangs = [np.rad2deg(2*np.arccos(min(1.0,abs(float(np.dot(e/np.linalg.norm(e),ref)))))) for e in err]
    print(f"has_rel={has_rel}: rot-avg err deg max={max(rotangs):.5f}")

    tracks = mapper._establish_tracks(recon, options)
    print(f"  tracks: {len(tracks)}, lens: {sorted(set(len(t) for t in tracks))}")

    obs_cam, obs_point, dirs = [], [], []
    for t_idx, track in enumerate(tracks):
        for (iid, p2d_idx) in track:
            image = recon.images[iid]; cam = recon.cameras[image.camera_id]
            uv, ok = camera_models.cam_from_img(cam.model_id, jnp.asarray(cam.params),
                                                jnp.asarray(image.points2D_xy[p2d_idx]))
            if not bool(ok): continue
            d_cam = np.concatenate([np.asarray(uv), [1.0]]); d_cam /= np.linalg.norm(d_cam)
            q = quats[row[iid]]; R = Pose(q, np.zeros(3)).rotmat()
            dirs.append(R.T @ d_cam); obs_cam.append(row[iid]); obs_point.append(t_idx)
    centers, points = solve_global_positioning(len(image_ids), len(tracks),
        np.asarray(obs_cam), np.asarray(obs_point), np.asarray(dirs), options=options.positioning)
    print(f"  centers finite: {np.isfinite(centers).all()}, points finite: {np.isfinite(points).all()}")
    print(f"  centers spread: {np.linalg.norm(centers - centers.mean(0), axis=1).mean():.4f}")
    # align centers to GT
    gtc = np.array([gt.cam_from_world(iid).inverse().t for iid in image_ids])
    try:
        s, R, t = umeyama(jnp.asarray(centers), jnp.asarray(gtc))
        aligned = float(s)*centers@np.asarray(R).T + np.asarray(t)
        print(f"  center err after sim3 align: max={np.linalg.norm(aligned-gtc,axis=1).max():.4f} (gt spread {np.linalg.norm(gtc-gtc.mean(0),axis=1).mean():.3f})")
    except Exception as e:
        print("  align failed:", e)
