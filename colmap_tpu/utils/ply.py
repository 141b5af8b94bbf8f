"""PLY point-cloud / mesh I/O.

reference behavior: src/colmap/util/ply.{h,cc} — binary little-endian and
ascii PLY with xyz / normal / rgb properties.
"""

from __future__ import annotations

import numpy as np


def write_ply(path, points, normals=None, colors=None, binary=True):
    """Write a point cloud. points (N, 3) float; normals (N, 3) float;
    colors (N, 3) uint8."""
    points = np.asarray(points, dtype=np.float32)
    n = len(points)
    props = ["property float x", "property float y", "property float z"]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    fmt = "binary_little_endian 1.0" if binary else "ascii 1.0"
    header = (
        "ply\n"
        f"format {fmt}\n"
        f"element vertex {n}\n" + "\n".join(props) + "\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
            if normals is not None:
                fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
            if colors is not None:
                fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
            rec = np.empty(n, dtype=fields)
            rec["x"], rec["y"], rec["z"] = points[:, 0], points[:, 1], points[:, 2]
            if normals is not None:
                normals = np.asarray(normals, dtype=np.float32)
                rec["nx"], rec["ny"], rec["nz"] = (
                    normals[:, 0], normals[:, 1], normals[:, 2],
                )
            if colors is not None:
                colors = np.asarray(colors, dtype=np.uint8)
                rec["red"], rec["green"], rec["blue"] = (
                    colors[:, 0], colors[:, 1], colors[:, 2],
                )
            f.write(rec.tobytes())
        else:
            for i in range(n):
                row = list(points[i])
                if normals is not None:
                    row += list(normals[i])
                line = " ".join(f"{v:.6f}" for v in row)
                if colors is not None:
                    line += " " + " ".join(str(int(v)) for v in colors[i])
                f.write((line + "\n").encode())


def write_ply_mesh(path, vertices, faces, colors=None, binary=True):
    """Write a triangle mesh. vertices (V, 3) float; faces (F, 3) int;
    colors (V, 3) uint8 optional.

    reference behavior: util/ply.cc WriteTextPlyMesh/WriteBinaryPlyMesh.
    """
    vertices = np.asarray(vertices, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    nv, nf = len(vertices), len(faces)
    props = ["property float x", "property float y", "property float z"]
    if colors is not None:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    fmt = "binary_little_endian 1.0" if binary else "ascii 1.0"
    header = (
        "ply\n"
        f"format {fmt}\n"
        f"element vertex {nv}\n" + "\n".join(props) + "\n"
        f"element face {nf}\n"
        "property list uchar int vertex_index\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
            if colors is not None:
                fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
            rec = np.empty(nv, dtype=fields)
            rec["x"], rec["y"], rec["z"] = vertices[:, 0], vertices[:, 1], vertices[:, 2]
            if colors is not None:
                colors = np.asarray(colors, dtype=np.uint8)
                rec["red"], rec["green"], rec["blue"] = (
                    colors[:, 0], colors[:, 1], colors[:, 2],
                )
            f.write(rec.tobytes())
            frec = np.empty(nf, dtype=[("n", "u1"), ("a", "<i4"), ("b", "<i4"), ("c", "<i4")])
            frec["n"] = 3
            frec["a"], frec["b"], frec["c"] = faces[:, 0], faces[:, 1], faces[:, 2]
            f.write(frec.tobytes())
        else:
            for i in range(nv):
                row = " ".join(f"{v:.6f}" for v in vertices[i])
                if colors is not None:
                    row += " " + " ".join(str(int(v)) for v in colors[i])
                f.write((row + "\n").encode())
            for i in range(nf):
                f.write((f"3 {faces[i,0]} {faces[i,1]} {faces[i,2]}\n").encode())


def read_ply_mesh(path):
    """Read a triangle mesh PLY -> dict with vertices/faces (+colors)."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode().strip()
            header_lines.append(line)
            if line == "end_header":
                break
        binary = any("binary_little_endian" in l for l in header_lines)
        nv = nf = 0
        props = []
        cur_elem = None
        for l in header_lines:
            if l.startswith("element vertex"):
                nv = int(l.split()[-1])
                cur_elem = "vertex"
            elif l.startswith("element face"):
                nf = int(l.split()[-1])
                cur_elem = "face"
            elif l.startswith("property") and not l.startswith("property list"):
                if cur_elem == "vertex":
                    _, typ, name = l.split()
                    props.append((name, typ))
        typemap = {"float": "<f4", "double": "<f8", "uchar": "u1", "uint8": "u1"}
        out = {}
        if binary:
            dtype = np.dtype([(name, typemap[typ]) for (name, typ) in props])
            rec = np.frombuffer(f.read(nv * dtype.itemsize), dtype=dtype, count=nv)
            out["vertices"] = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32)
            if "red" in dtype.names:
                out["colors"] = np.stack([rec["red"], rec["green"], rec["blue"]], axis=1)
            fdt = np.dtype([("n", "u1"), ("a", "<i4"), ("b", "<i4"), ("c", "<i4")])
            frec = np.frombuffer(f.read(nf * fdt.itemsize), dtype=fdt, count=nf)
            out["faces"] = np.stack([frec["a"], frec["b"], frec["c"]], axis=1)
        else:
            rows = [f.readline().split() for _ in range(nv)]
            arr = np.asarray(rows, dtype=np.float64)
            out["vertices"] = arr[:, :3].astype(np.float32)
            names = [p[0] for p in props]
            if "red" in names:
                i = names.index("red")
                out["colors"] = arr[:, i:i + 3].astype(np.uint8)
            frows = [f.readline().split() for _ in range(nf)]
            out["faces"] = np.asarray(frows, dtype=np.int64)[:, 1:4].astype(np.int32)
    return out


def read_ply(path):
    """Read a PLY point cloud -> dict with points/normals/colors arrays."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode().strip()
            header_lines.append(line)
            if line == "end_header":
                break
        binary = any("binary_little_endian" in l for l in header_lines)
        n = 0
        props = []
        for l in header_lines:
            if l.startswith("element vertex"):
                n = int(l.split()[-1])
            elif l.startswith("property") and not l.startswith("property list"):
                _, typ, name = l.split()
                props.append((name, typ))
        typemap = {"float": "<f4", "double": "<f8", "uchar": "u1", "uint8": "u1"}
        if binary:
            dtype = [(name, typemap[typ]) for (name, typ) in props]
            rec = np.frombuffer(f.read(), dtype=dtype, count=n)
        else:
            data = np.loadtxt(f, max_rows=n).reshape(n, len(props))
            rec = {name: data[:, i] for i, (name, typ) in enumerate(props)}
    names = [p[0] for p in props]
    out = {}
    out["points"] = np.stack([np.asarray(rec["x"]), np.asarray(rec["y"]), np.asarray(rec["z"])], axis=1)
    if "nx" in names:
        out["normals"] = np.stack([np.asarray(rec["nx"]), np.asarray(rec["ny"]), np.asarray(rec["nz"])], axis=1)
    if "red" in names:
        out["colors"] = np.stack([np.asarray(rec["red"]), np.asarray(rec["green"]), np.asarray(rec["blue"])], axis=1).astype(np.uint8)
    return out
