from colmap_tpu.scene.reconstruction_io import read_model
from colmap_tpu.estimators.alignment import compare_reconstructions
import numpy as np
cmp = compare_reconstructions(read_model("/tmp/vfy/global/0"), read_model("/tmp/vfy/gt"))
print({k: (float(np.max(v)) if hasattr(v,'__len__') else v) for k,v in cmp.items()})
