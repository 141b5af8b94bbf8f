import dataclasses
import numpy as np
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.scene.pose_graph import PoseGraph
from colmap_tpu.scene.database_cache import DatabaseCache
from colmap_tpu.sfm.global_mapper import GlobalMapper, GlobalMapperOptions
from colmap_tpu.scene.reconstruction import Reconstruction

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
    rel = graph.rel_poses()
    # compare rel poses vs GT rel poses
    from colmap_tpu.utils.types import pair_id_to_image_pair
    errs_q, errs_t = [], []
    for pid, pose in rel.items():
        a, b = pair_id_to_image_pair(pid)
        pa = gt.cam_from_world(a); pb = gt.cam_from_world(b)
        # gt cam2_from_cam1 = pb * pa^-1
        gt_rel = pb.compose(pa.inverse())
        qd = abs(float(np.dot(pose.quat/np.linalg.norm(pose.quat), gt_rel.quat/np.linalg.norm(gt_rel.quat))))
        errs_q.append(np.rad2deg(2*np.arccos(min(1.0,qd))))
        # translation direction
        t1 = pose.t/ (np.linalg.norm(pose.t)+1e-12); t2 = gt_rel.t/(np.linalg.norm(gt_rel.t)+1e-12)
        errs_t.append(np.rad2deg(np.arccos(np.clip(np.dot(t1,t2),-1,1))))
    print(f"has_rel={has_rel}: rel q err deg max={max(errs_q):.4f}, t dir err deg: {np.percentile(errs_t,[0,50,90,100])}")
