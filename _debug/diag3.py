import numpy as np, dataclasses, jax.numpy as jnp
exec(open('/root/repo/_debug/diag2.py').read().split("for has_rel in")[0])
opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=8, num_points3D=150,
    num_points2D_without_point3D=5, seed=31, two_view_geometry_has_relative_pose=True,
    camera_has_prior_focal_length=True)
db = Database(":memory:")
gt = synthesize_dataset(opt, database=db)
graph = PoseGraph.load(db, min_num_inliers=15)
rel_poses = graph.rel_poses()
cache = DatabaseCache.create(db, min_num_matches=15)
recon = Reconstruction()
mapper = gm.GlobalMapper(cache)
options = gm.GlobalMapperOptions()
ok = mapper.solve(recon, rel_poses, options)
print("solve ok:", ok, "frames:", recon.num_reg_frames(), "points:", len(recon.points3D))
from colmap_tpu.estimators.alignment import compare_reconstructions
print(compare_reconstructions(recon, gt))
