"""Mesh texture mapping: per-face view selection + atlas packing + OBJ.

reference behavior: src/colmap/mvs/texture_mapping.{h,cc} — selects a source
view per face (quality = projected gradient magnitude), smooths labels with
a graph cut, packs per-face patches into texture atlases, writes OBJ/MTL.
The TPU-native rebuild keeps the same three phases but vectorizes them:

  1. view selection: all faces x all views scored at once
     (cosine of viewing angle x projected area, back-face and bounds culled),
     followed by a cheap label smoothing pass over face adjacency (majority
     relabel toward neighbors when quality is close — the graph-cut analogue);
  2. packing: two right-triangle patches per square atlas cell, constant
     patch size, one gutter pixel;
  3. sampling: bilinear gather from the chosen image per atlas texel.

Outputs a standard OBJ + MTL + PNG bundle.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class TextureMappingOptions:
    """reference: mvs/texture_mapping.h:41-58 (subset)."""

    patch_size: int = 16  # texels per triangle patch edge
    max_atlas_size: int = 4096
    smoothing_iterations: int = 2


def _project(K, R, t, X):
    x = X @ R.T + t
    z = x[:, 2]
    uv = x[:, :2] / np.maximum(z[:, None], 1e-9)
    pix = uv @ K[:2, :2].T + K[:2, 2]
    return pix, z


def select_views(verts, faces, views):
    """Score every face against every view.

    views: list of dicts with K, R, t (cam_from_world), width, height.
    Returns (labels (F,) int — index into views or -1, quality (F,)).
    """
    F = len(faces)
    centers = verts[faces].mean(axis=1)
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    normals = np.cross(e1, e2)
    nlen = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(nlen, 1e-12)

    best_q = np.full(F, -np.inf)
    labels = np.full(F, -1, dtype=np.int64)
    quality = np.zeros((F, len(views)), dtype=np.float64)
    for vi, v in enumerate(views):
        C = -v["R"].T @ v["t"]
        view_dir = centers - C[None, :]
        dist = np.linalg.norm(view_dir, axis=1)
        view_dir = view_dir / np.maximum(dist[:, None], 1e-12)
        cosang = -np.einsum("ij,ij->i", normals, view_dir)
        # Project the three face vertices; require all in-bounds, z > 0.
        ok = cosang > 0.05
        pixs = []
        for k in range(3):
            pix, z = _project(v["K"], v["R"], v["t"], verts[faces[:, k]])
            ok &= (z > 1e-6) & (pix[:, 0] >= 0) & (pix[:, 1] >= 0)
            ok &= (pix[:, 0] < v["width"] - 1) & (pix[:, 1] < v["height"] - 1)
            pixs.append(pix)
        # Projected area as resolution proxy.
        a = pixs[1] - pixs[0]
        b = pixs[2] - pixs[0]
        area = 0.5 * np.abs(a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0])
        q = np.where(ok, cosang * np.sqrt(np.maximum(area, 0)), -np.inf)
        quality[:, vi] = q
        take = q > best_q
        best_q = np.where(take, q, best_q)
        labels = np.where(take, vi, labels)
    return labels, quality


def smooth_labels(faces, labels, quality, iterations=2):
    """Majority relabeling over face adjacency (graph-cut analogue)."""
    if len(faces) == 0 or iterations <= 0:
        return labels
    # Face adjacency via shared edges.
    edges = {}
    adj = [[] for _ in range(len(faces))]
    for fi, f in enumerate(faces):
        for e in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(e), max(e))
            if key in edges:
                fj = edges[key]
                adj[fi].append(fj)
                adj[fj].append(fi)
            else:
                edges[key] = fi
    for _ in range(iterations):
        new_labels = labels.copy()
        for fi in range(len(faces)):
            if not adj[fi]:
                continue
            nb = [labels[fj] for fj in adj[fi] if labels[fj] >= 0]
            if not nb:
                continue
            vals, counts = np.unique(nb, return_counts=True)
            maj = vals[counts.argmax()]
            if counts.max() >= 2 and maj != labels[fi] and maj >= 0:
                # Relabel if the majority view is nearly as good.
                if quality[fi, maj] > 0.7 * quality[fi, labels[fi]]:
                    new_labels[fi] = maj
        labels = new_labels
    return labels


def texture_mesh(
    verts,
    faces,
    views,
    images: Dict[int, np.ndarray],
    options: Optional[TextureMappingOptions] = None,
):
    """Build a texture atlas for the mesh.

    views: list of dicts {K, R, t, width, height, image_key}; images maps
    image_key -> (H, W, 3) uint8 array.
    Returns (atlas (A, A, 3) uint8, uvs (F, 3, 2) float in [0,1], labels).
    """
    if options is None:
        options = TextureMappingOptions()
    labels, quality = select_views(verts, faces, views)
    labels = smooth_labels(faces, labels, quality, options.smoothing_iterations)

    F = len(faces)
    s = options.patch_size
    cell = s + 2  # gutter
    cells = (F + 1) // 2
    grid = int(np.ceil(np.sqrt(cells)))
    atlas_size = min(
        options.max_atlas_size, int(2 ** np.ceil(np.log2(max(grid * cell, 64))))
    )
    grid = atlas_size // cell
    if grid * grid * 2 < F:
        # Shrink patches to fit.
        while grid * grid * 2 < F and s > 4:
            s -= 2
            cell = s + 2
            grid = atlas_size // cell
    atlas = np.full((atlas_size, atlas_size, 3), 128, dtype=np.uint8)
    uvs = np.zeros((F, 3, 2), dtype=np.float64)

    # Texel barycentric template for the two triangle halves of a cell.
    ii, jj = np.mgrid[0:s, 0:s]
    lower = ii + jj <= s - 1  # lower-left triangle
    # Barycentric coords for lower triangle with corners (0,0),(s-1,0),(0,s-1):
    denom = max(s - 1, 1)
    l_b = jj / denom  # weight of corner (s-1, 0) → vertex 1
    l_c = ii / denom  # weight of corner (0, s-1) → vertex 2
    l_a = 1.0 - l_b - l_c

    for fi in range(F):
        ci = fi // 2
        half = fi % 2
        gy, gx = divmod(ci, grid)
        if gy >= grid:
            break
        y0, x0 = gy * cell + 1, gx * cell + 1
        # uv corners in atlas pixels (vertex 0, 1, 2).
        if half == 0:
            corners = np.array([[x0, y0], [x0 + s - 1, y0], [x0, y0 + s - 1]])
            mask = lower
            wa, wb, wc = l_a, l_b, l_c
        else:
            corners = np.array(
                [[x0 + s - 1, y0 + s - 1], [x0, y0 + s - 1], [x0 + s - 1, y0]]
            )
            mask = ~lower
            # Mirrored barycentrics for the upper triangle.
            wa = 1.0 - (s - 1 - jj) / denom - (s - 1 - ii) / denom
            wb = (s - 1 - jj) / denom
            wc = (s - 1 - ii) / denom
        uvs[fi] = corners
        li = labels[fi]
        if li < 0:
            continue
        v = views[li]
        img = images.get(v["image_key"])
        if img is None:
            continue
        tri = verts[faces[fi]]
        pix, z = _project(v["K"], v["R"], v["t"], tri)
        # Sample image at barycentric-interpolated pixel positions.
        px = wa * pix[0, 0] + wb * pix[1, 0] + wc * pix[2, 0]
        py = wa * pix[0, 1] + wb * pix[1, 1] + wc * pix[2, 1]
        xi = np.clip(px, 0, img.shape[1] - 2)
        yi = np.clip(py, 0, img.shape[0] - 2)
        x0i = xi.astype(np.int64)
        y0i = yi.astype(np.int64)
        fx = (xi - x0i)[..., None]
        fy = (yi - y0i)[..., None]
        c00 = img[y0i, x0i].astype(np.float64)
        c01 = img[y0i, x0i + 1].astype(np.float64)
        c10 = img[y0i + 1, x0i].astype(np.float64)
        c11 = img[y0i + 1, x0i + 1].astype(np.float64)
        col = (
            c00 * (1 - fx) * (1 - fy)
            + c01 * fx * (1 - fy)
            + c10 * (1 - fx) * fy
            + c11 * fx * fy
        )
        patch = atlas[y0 : y0 + s, x0 : x0 + s]
        patch[mask] = np.clip(col[mask], 0, 255).astype(np.uint8)

    uvs[:, :, 0] = (uvs[:, :, 0] + 0.5) / atlas_size
    uvs[:, :, 1] = 1.0 - (uvs[:, :, 1] + 0.5) / atlas_size  # OBJ v-flip
    return atlas, uvs, labels


def write_obj(path, verts, faces, uvs, atlas):
    """Write OBJ + MTL + PNG texture bundle."""
    base = os.path.splitext(path)[0]
    name = os.path.basename(base)
    from PIL import Image

    Image.fromarray(atlas).save(base + ".png")
    with open(base + ".mtl", "w") as f:
        f.write(f"newmtl textured\nKa 1 1 1\nKd 1 1 1\nmap_Kd {name}.png\n")
    with open(path, "w") as f:
        f.write(f"mtllib {name}.mtl\nusemtl textured\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for fi in range(len(faces)):
            for k in range(3):
                f.write(f"vt {uvs[fi, k, 0]:.6f} {uvs[fi, k, 1]:.6f}\n")
        for fi, face in enumerate(faces):
            t = 3 * fi
            f.write(
                f"f {face[0]+1}/{t+1} {face[1]+1}/{t+2} {face[2]+1}/{t+3}\n"
            )
