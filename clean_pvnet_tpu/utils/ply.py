"""Minimal PLY mesh IO (ascii + binary_little_endian).

Counterpart of the reference's plyfile/pysixd loaders
(ref lib/utils/pvnet/pvnet_data_utils.py:47-55 get_ply_model,
ref lib/utils/vsd/inout.py load_ply). Only the subset the framework needs:
vertex positions/colors and triangular faces.
"""

from __future__ import annotations

import numpy as np


def load_ply(path: str) -> dict:
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        elements = []  # (name, count, [(prop_dtype, prop_name)], list_props)
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "element":
                elements.append({"name": parts[1], "count": int(parts[2]), "props": []})
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1]["props"].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1]["props"].append(("scalar", parts[1], parts[2]))

        type_map = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
            "uint": "u4", "uint32": "u4",
        }

        out = {}
        for elem in elements:
            if fmt == "ascii":
                rows = [f.readline().decode("ascii").split() for _ in range(elem["count"])]
                if elem["name"] == "vertex":
                    names = [p[2] for p in elem["props"] if p[0] == "scalar"]
                    arr = np.asarray(rows, np.float64)
                    data = {n: arr[:, i] for i, n in enumerate(names)}
                    out["vertex"] = data
                elif elem["name"] == "face":
                    faces = np.asarray([r[1:4] for r in rows], np.int64)
                    out["faces"] = faces
            else:  # binary little endian
                if elem["name"] == "vertex":
                    dt = np.dtype(
                        [(p[2], "<" + type_map[p[1]]) for p in elem["props"] if p[0] == "scalar"]
                    )
                    raw = np.frombuffer(f.read(dt.itemsize * elem["count"]), dt)
                    out["vertex"] = {n: raw[n].astype(np.float64) for n in dt.names}
                elif elem["name"] == "face":
                    p = elem["props"][0]
                    cnt_dt = np.dtype("<" + type_map[p[1]])
                    idx_dt = np.dtype("<" + type_map[p[2]])
                    faces = np.empty((elem["count"], 3), np.int64)
                    for i in range(elem["count"]):
                        (n,) = np.frombuffer(f.read(cnt_dt.itemsize), cnt_dt)
                        idx = np.frombuffer(f.read(idx_dt.itemsize * n), idx_dt)
                        faces[i] = idx[:3]
                    out["faces"] = faces

    v = out.get("vertex", {})
    pts = np.stack([v["x"], v["y"], v["z"]], -1) if v else np.zeros((0, 3))
    colors = None
    if v and "red" in v:
        colors = np.stack([v["red"], v["green"], v["blue"]], -1)
    return {"pts": pts, "colors": colors, "faces": out.get("faces")}


def save_ply(path: str, pts: np.ndarray, faces: np.ndarray | None = None,
             colors: np.ndarray | None = None) -> None:
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        if faces is not None:
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for i, p in enumerate(pts):
            row = f"{p[0]} {p[1]} {p[2]}"
            if colors is not None:
                c = colors[i].astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")
        if faces is not None:
            for face in faces:
                f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
