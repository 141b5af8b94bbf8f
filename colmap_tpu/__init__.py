"""colmap_tpu — a TPU-native Structure-from-Motion / Multi-View Stereo framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of COLMAP
(reference: colmap/colmap, see SURVEY.md). Host Python orchestrates; the
device computes in large batched programs (feature extraction, matching,
RANSAC verification, triangulation, LM+Schur+PCG bundle adjustment,
PatchMatch stereo). Data formats (SQLite database, sparse-model binaries)
are byte-compatible with COLMAP for interop and validation.
"""

__version__ = "0.1.0"
