"""View-graph calibration: estimate focal lengths from fundamental matrices.

reference behavior: src/colmap/estimators/view_graph_calibration.h:39-73 —
a Ceres problem over per-camera focal ratios using the constraint that the
upgraded essential matrix E = K₂ᵀ F K₁ must have two equal (and one zero)
singular values for the true intrinsics; converts UNCALIBRATED pairs to
CALIBRATED. Here: the same residual (σ₁−σ₂)/(σ₁+σ₂) per pair, optimized by
gradient descent with jax autodiff through the SVD, batched over all edges.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ViewGraphCalibrationOptions:
    num_iterations: int = 200
    learning_rate: float = 0.02
    min_focal_ratio: float = 0.2
    max_focal_ratio: float = 5.0


def calibrate_view_graph(
    camera_ids: List[int],
    prior_focals: Dict[int, float],
    principal_points: Dict[int, Tuple[float, float]],
    edges: List[Tuple[int, int, np.ndarray]],  # (camera_id1, camera_id2, F)
    options: ViewGraphCalibrationOptions = ViewGraphCalibrationOptions(),
) -> Dict[int, float]:
    """Optimize per-camera focal lengths over the view graph.

    Returns {camera_id: focal}. Cameras keep their prior when the graph
    gives no constraint.
    """
    if not edges:
        return dict(prior_focals)
    row = {cid: i for i, cid in enumerate(camera_ids)}
    n = len(camera_ids)
    f0 = np.array([prior_focals[c] for c in camera_ids])
    pp = np.array([principal_points[c] for c in camera_ids])

    e1 = np.array([row[a] for (a, b, _) in edges], dtype=np.int32)
    e2 = np.array([row[b] for (a, b, _) in edges], dtype=np.int32)
    Fs = np.stack([F for (_, _, F) in edges])

    f0_j = jnp.asarray(f0)
    pp_j = jnp.asarray(pp)
    Fs_j = jnp.asarray(Fs)
    e1_j = jnp.asarray(e1)
    e2_j = jnp.asarray(e2)

    def K_of(log_scale, idx):
        f = f0_j[idx] * jnp.exp(log_scale[idx])
        cx = pp_j[idx, 0]
        cy = pp_j[idx, 1]
        zeros = jnp.zeros_like(f)
        ones = jnp.ones_like(f)
        return jnp.stack(
            [f, zeros, cx, zeros, f, cy, zeros, zeros, ones], axis=-1
        ).reshape(-1, 3, 3)

    def loss(log_scale):
        K1 = K_of(log_scale, e1_j)
        K2 = K_of(log_scale, e2_j)
        E = jnp.swapaxes(K2, -1, -2) @ Fs_j @ K1
        s = jnp.linalg.svd(E, compute_uv=False)
        res = (s[:, 0] - s[:, 1]) / jnp.maximum(s[:, 0] + s[:, 1], 1e-12)
        return jnp.sum(res**2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    x = jnp.zeros(n)
    lr = options.learning_rate
    m = jnp.zeros(n)
    v = jnp.zeros(n)
    for it in range(options.num_iterations):
        val, g = grad_fn(x)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1 - 0.9 ** (it + 1))
        vh = v / (1 - 0.999 ** (it + 1))
        x = x - lr * mh / (jnp.sqrt(vh) + 1e-8)
        x = jnp.clip(
            x, np.log(options.min_focal_ratio), np.log(options.max_focal_ratio)
        )
    scales = np.exp(np.asarray(x))
    return {cid: float(f0[row[cid]] * scales[row[cid]]) for cid in camera_ids}
