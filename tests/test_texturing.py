"""Texture mapping tests.

reference analogue: mvs/texture_mapping.* (untested in the reference); here
a camera viewing colored quads must sample the right image colors into the
atlas, and the OBJ bundle must round-trip on disk.
"""

import pytest

pytestmark = pytest.mark.slow


import os

import numpy as np

from colmap_tpu.mvs.texturing import (
    TextureMappingOptions,
    select_views,
    texture_mesh,
    write_obj,
)


def _simple_scene():
    # Unit quad at z=5 facing the camera at origin (looking +z).
    verts = np.array(
        [[-1, -1, 5], [1, -1, 5], [1, 1, 5], [-1, 1, 5]], dtype=np.float64
    )
    faces = np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
    K = np.array([[100.0, 0, 100], [0, 100.0, 100], [0, 0, 1]])
    view = {
        "K": K, "R": np.eye(3), "t": np.zeros(3),
        "width": 200, "height": 200, "image_key": 0,
    }
    return verts, faces, view


def test_select_views_frontal():
    verts, faces, view = _simple_scene()
    # Winding chosen so the face normal points toward -z (the camera).
    labels, q = select_views(verts, faces, [view])
    assert (labels == 0).all()
    # A view behind the quad sees back faces only.
    behind = dict(view, R=np.diag([1.0, -1.0, -1.0]), t=np.array([0, 0, 10.0]),
                  image_key=1)
    labels2, _ = select_views(verts, faces, [behind])
    assert (labels2 == -1).all()


def test_texture_mesh_samples_image():
    verts, faces, view = _simple_scene()
    img = np.zeros((200, 200, 3), dtype=np.uint8)
    img[:, :100] = [255, 0, 0]  # left half red
    img[:, 100:] = [0, 0, 255]  # right half blue
    atlas, uvs, labels = texture_mesh(
        verts, faces, [view], {0: img}, TextureMappingOptions(patch_size=16)
    )
    assert (labels >= 0).all()
    # The atlas should contain both red and blue texels.
    red = (atlas[:, :, 0] > 200) & (atlas[:, :, 2] < 50)
    blue = (atlas[:, :, 2] > 200) & (atlas[:, :, 0] < 50)
    assert red.sum() > 20 and blue.sum() > 20
    assert uvs.shape == (2, 3, 2)
    assert (uvs >= 0).all() and (uvs <= 1).all()


def test_write_obj(tmp_path):
    verts, faces, view = _simple_scene()
    img = np.full((200, 200, 3), 200, dtype=np.uint8)
    atlas, uvs, _ = texture_mesh(verts, faces, [view], {0: img})
    out = str(tmp_path / "mesh.obj")
    write_obj(out, verts, faces, uvs, atlas)
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "mesh.mtl"))
    assert os.path.exists(str(tmp_path / "mesh.png"))
    txt = open(out).read()
    assert txt.count("\nv ") + txt.startswith("v ") == 4
    assert txt.count("\nf ") == 2
    assert "mtllib mesh.mtl" in txt
