import numpy as np
from colmap_tpu.estimators.alignment import compare_reconstructions
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.sfm.global_pipeline import GlobalPipeline, GlobalPipelineOptions

opt = SyntheticDatasetOptions(
    num_rigs=1, num_frames_per_rig=8, num_points3D=150,
    num_points2D_without_point3D=5, seed=31,
    two_view_geometry_has_relative_pose=False,
    camera_has_prior_focal_length=True,
)
db = Database(":memory:")
gt = synthesize_dataset(opt, database=db)
po = GlobalPipelineOptions()
po.mapper.verbose = True
pipeline = GlobalPipeline(po, db)
recon = pipeline.run()
print("recon:", recon)
if recon is not None:
    print("reg frames:", recon.num_reg_frames(), "points:", len(recon.points3D))
    cmp = compare_reconstructions(recon, gt)
    print(cmp)
