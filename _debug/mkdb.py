from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction_io import write_model
import numpy as np
opt = SyntheticDatasetOptions(num_rigs=1, num_cameras_per_rig=1,
    num_frames_per_rig=8, num_points3D=120, camera_has_prior_focal_length=True)
db = Database("/tmp/vfy/db.db")
recon = synthesize_dataset(opt, db, rng=np.random.default_rng(3))
db.close(); write_model(recon, "/tmp/vfy/gt", fmt="bin")
