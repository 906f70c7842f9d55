"""Triangle-mesh scene import: GLB/OBJ → dense SDF grids.

Host-side pipeline for user meshes (the reference's scene assets are
habitat GLB stages, `SceneManager.py:893-929`): a minimal glTF-binary/OBJ
parser extracts triangles, the native BVH baker (``native/mesh_sdf.cpp``,
built on demand with g++) computes a signed distance grid, and the result
feeds the grid scene backend (``scene.SceneData``). A pure-numpy fallback
keeps the path alive without a compiler (slow — preprocessing only).
"""
from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmesh_sdf.so")
_lib = None


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, text=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mesh_to_sdf.restype = ctypes.c_int
    lib.mesh_to_sdf.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mesh_closest_dists.restype = ctypes.c_int
    lib.mesh_closest_dists.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


_COMPONENT_DTYPES = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
                     5123: np.uint16, 5125: np.uint32, 5126: np.float32}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}


def load_glb(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal binary-glTF triangle extractor (positions + indices of every
    mesh primitive, node transforms applied)."""
    with open(path, "rb") as f:
        magic, _version, _length = struct.unpack("<III", f.read(12))
        if magic != 0x46546C67:
            raise ValueError(f"{path} is not a GLB file")
        chunks = {}
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            clen, ctype = struct.unpack("<II", header)
            chunks[ctype] = f.read(clen)
    gltf = json.loads(chunks[0x4E4F534A].decode("utf-8"))
    bin_data = chunks.get(0x004E4942, b"")

    def read_accessor(idx):
        acc = gltf["accessors"][idx]
        view = gltf["bufferViews"][acc["bufferView"]]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        count = acc["count"] * _TYPE_COUNTS[acc["type"]]
        offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        arr = np.frombuffer(bin_data, dtype=dtype, count=count, offset=offset)
        return arr.reshape(acc["count"], -1)

    def node_matrix(node):
        if "matrix" in node:
            return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
        m = np.eye(4)
        if "scale" in node:
            m = m @ np.diag([*node["scale"], 1.0])
        if "rotation" in node:
            x, y, z, w = node["rotation"]
            r = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ])
            rm = np.eye(4)
            rm[:3, :3] = r
            m = rm @ m
        if "translation" in node:
            tm = np.eye(4)
            tm[:3, 3] = node["translation"]
            m = tm @ m
        return m

    verts_all, faces_all = [], []
    offset = 0

    def visit(node_idx, parent):
        nonlocal offset
        node = gltf["nodes"][node_idx]
        m = parent @ node_matrix(node)
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim in mesh["primitives"]:
                if "POSITION" not in prim["attributes"]:
                    continue
                pos = read_accessor(prim["attributes"]["POSITION"]).astype(np.float64)
                pos_h = np.concatenate([pos, np.ones((len(pos), 1))], axis=1)
                pos_w = (m @ pos_h.T).T[:, :3]
                if "indices" in prim:
                    idx = read_accessor(prim["indices"]).reshape(-1).astype(np.int64)
                else:
                    idx = np.arange(len(pos))
                faces_all.append(idx.reshape(-1, 3) + offset)
                verts_all.append(pos_w)
                offset += len(pos)
        for child in node.get("children", []):
            visit(child, m)

    scene_idx = gltf.get("scene", 0)
    for node_idx in gltf["scenes"][scene_idx]["nodes"]:
        visit(node_idx, np.eye(4))

    return (
        np.concatenate(verts_all).astype(np.float32),
        np.concatenate(faces_all).astype(np.int32),
    )


def load_glb_textured(path: str, max_tex: int = 1024):
    """GLB triangles + texture data for textured RGB rendering.

    Returns ``(verts, faces, texinfo)`` where texinfo is ``None`` for
    untextured assets or a dict with per-face ``uv (F, 3, 2)`` (TEXCOORD_0
    per corner, glTF convention: v down), ``tex (F,) int`` image index
    (−1 → flat material color), and ``images`` — a list of (h, w, 3)
    uint8 arrays (PIL-decoded; > ``max_tex`` wide textures are halved
    until they fit). Untextured primitives contribute a 1×1 image of
    their ``baseColorFactor`` so every face samples the same path. The
    reference renders these textures through habitat's GL pipeline
    (`/root/reference/utils/SceneManager.py:1013-1035`); here they feed
    the exact-triangle backend's UV shading. Accessors are assumed
    tightly packed (no byteStride), like :func:`load_glb`."""
    import io

    with open(path, "rb") as f:
        magic, _version, _length = struct.unpack("<III", f.read(12))
        if magic != 0x46546C67:
            raise ValueError(f"{path} is not a GLB file")
        chunks = {}
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            clen, ctype = struct.unpack("<II", header)
            chunks[ctype] = f.read(clen)
    gltf = json.loads(chunks[0x4E4F534A].decode("utf-8"))
    bin_data = chunks.get(0x004E4942, b"")

    def read_accessor(idx):
        acc = gltf["accessors"][idx]
        view = gltf["bufferViews"][acc["bufferView"]]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        count = acc["count"] * _TYPE_COUNTS[acc["type"]]
        offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        arr = np.frombuffer(bin_data, dtype=dtype, count=count,
                            offset=offset).reshape(acc["count"], -1)
        if acc.get("normalized") and dtype in (np.uint8, np.uint16):
            arr = arr.astype(np.float32) / np.iinfo(dtype).max
        return arr

    images = []          # decoded uint8 (h, w, 3)

    def decode_image(img_idx):
        try:
            from PIL import Image
        except ImportError:
            return None
        img = gltf["images"][img_idx]
        if "bufferView" in img:
            view = gltf["bufferViews"][img["bufferView"]]
            off = view.get("byteOffset", 0)
            raw = bin_data[off:off + view["byteLength"]]
        elif "uri" in img and not img["uri"].startswith("data:"):
            with open(os.path.join(os.path.dirname(path), img["uri"]),
                      "rb") as fh:
                raw = fh.read()
        else:
            return None
        try:
            im = Image.open(io.BytesIO(raw)).convert("RGB")
        except Exception:
            return None
        while im.width > max_tex or im.height > max_tex:
            im = im.resize((max(im.width // 2, 1), max(im.height // 2, 1)))
        return np.asarray(im, np.uint8)

    image_slot = {}      # gltf image idx → images[] slot (or None)
    flat_slot = {}       # material idx → 1×1 flat-color slot

    def material_slot(mat_idx):
        """images[] slot for a material, decoding lazily; −1 on failure."""
        if mat_idx is None:
            return -1
        mat = gltf.get("materials", [{}])[mat_idx]
        pbr = mat.get("pbrMetallicRoughness", {})
        tex = pbr.get("baseColorTexture")
        if tex is not None:
            src = gltf["textures"][tex["index"]].get("source")
            if src is not None:
                if src not in image_slot:
                    arr = decode_image(src)
                    if arr is None:
                        image_slot[src] = -1
                    else:
                        images.append(arr)
                        image_slot[src] = len(images) - 1
                if image_slot[src] >= 0:
                    return image_slot[src]
        if mat_idx not in flat_slot:
            base = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
            texel = np.asarray([[np.clip(np.asarray(base[:3]) * 255,
                                         0, 255)]], np.uint8)
            images.append(texel.reshape(1, 1, 3))
            flat_slot[mat_idx] = len(images) - 1
        return flat_slot[mat_idx]

    def node_matrix(node):
        if "matrix" in node:
            return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
        m = np.eye(4)
        if "scale" in node:
            m = m @ np.diag([*node["scale"], 1.0])
        if "rotation" in node:
            x, y, z, w = node["rotation"]
            r = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ])
            rm = np.eye(4)
            rm[:3, :3] = r
            m = rm @ m
        if "translation" in node:
            tm = np.eye(4)
            tm[:3, 3] = node["translation"]
            m = tm @ m
        return m

    verts_all, faces_all, uv_all, tex_all = [], [], [], []
    offset = 0

    def visit(node_idx, parent):
        nonlocal offset
        node = gltf["nodes"][node_idx]
        m = parent @ node_matrix(node)
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim in mesh["primitives"]:
                if "POSITION" not in prim["attributes"]:
                    continue
                pos = read_accessor(
                    prim["attributes"]["POSITION"]).astype(np.float64)
                pos_h = np.concatenate([pos, np.ones((len(pos), 1))], axis=1)
                pos_w = (m @ pos_h.T).T[:, :3]
                if "indices" in prim:
                    idx = read_accessor(
                        prim["indices"]).reshape(-1).astype(np.int64)
                else:
                    idx = np.arange(len(pos))
                fcs = idx.reshape(-1, 3)
                faces_all.append(fcs + offset)
                verts_all.append(pos_w)
                offset += len(pos)
                slot = material_slot(prim.get("material"))
                if "TEXCOORD_0" in prim["attributes"] and slot >= 0:
                    uv_v = read_accessor(
                        prim["attributes"]["TEXCOORD_0"]).astype(np.float32)
                    uv_all.append(uv_v[fcs.reshape(-1)].reshape(-1, 3, 2))
                else:
                    uv_all.append(np.full((len(fcs), 3, 2), 0.5, np.float32))
                tex_all.append(np.full(len(fcs), slot, np.int32))
        for child in node.get("children", []):
            visit(child, m)

    scene_idx = gltf.get("scene", 0)
    for node_idx in gltf["scenes"][scene_idx]["nodes"]:
        visit(node_idx, np.eye(4))

    verts = np.concatenate(verts_all).astype(np.float32)
    faces = np.concatenate(faces_all).astype(np.int32)
    if not images:
        return verts, faces, None
    texinfo = {"uv": np.concatenate(uv_all),
               "tex": np.concatenate(tex_all), "images": images}
    return verts, faces, texinfo


def build_atlas(texinfo, face_order=None):
    """texinfo (from :func:`load_glb_textured`) → per-PACKED-face tables.

    Stacks the images top-to-bottom into one (AH, AW, 3) atlas and returns
    ``(uv (T, 6) f32, rect (T, 4) f32 [tw th y0 x0] texels, atlas)``.
    ``face_order`` is `pack_triangles`'s packed-row → original-face map
    (UV/rect rows must follow the Morton permutation); padding rows (−1)
    get rect tw=0 → shading falls back to zero-texel black, but padding
    never wins a hit anyway."""
    images = texinfo["images"]
    aw = max(im.shape[1] for im in images)
    ah = sum(im.shape[0] for im in images)
    atlas = np.zeros((ah, aw, 3), np.uint8)
    rects = np.zeros((len(images), 4), np.float32)
    y = 0
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        atlas[y:y + h, :w] = im
        rects[i] = (w, h, y, 0)
        y += h
    uv_f = texinfo["uv"].reshape(-1, 6).astype(np.float32)
    rect_f = rects[np.clip(texinfo["tex"], 0, len(images) - 1)]
    rect_f[texinfo["tex"] < 0] = 0
    if face_order is not None:
        T = len(face_order)
        uv_o = np.zeros((T, 6), np.float32)
        rect_o = np.zeros((T, 4), np.float32)
        valid = face_order >= 0
        uv_o[valid] = uv_f[face_order[valid]]
        rect_o[valid] = rect_f[face_order[valid]]
        return uv_o, rect_o, atlas
    return uv_f, rect_f, atlas


def mesh_base_color(path: str):
    """Representative base color of a mesh asset, (3,) uint8 or None: the
    face-weighted mean of GLB pbrMetallicRoughness ``baseColorFactor`` /
    OBJ-MTL diffuse ``Kd``. None when the asset carries no material —
    callers fall back to the instance palette. (The reference renders full
    habitat textures through GL; a per-asset mean color is the grid/
    primitive-bake analogue.)"""
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext in (".glb", ".gltf"):
            return _glb_base_color(path)
        if ext == ".obj":
            return _obj_base_color(path)
    except (OSError, ValueError, KeyError, json.JSONDecodeError):
        return None
    return None


def _glb_base_color(path: str):
    with open(path, "rb") as f:
        head = f.read(12)
        if len(head) == 12 and struct.unpack("<I", head[:4])[0] == 0x46546C67:
            clen, ctype = struct.unpack("<II", f.read(8))
            if ctype != 0x4E4F534A:
                return None
            gltf = json.loads(f.read(clen).decode("utf-8"))
        else:  # plain-JSON .gltf
            f.seek(0)
            gltf = json.loads(f.read().decode("utf-8"))
    mats = gltf.get("materials", [])
    if not mats:
        return None
    total_w = 0.0
    acc = np.zeros(3)
    for mesh in gltf.get("meshes", []):
        for prim in mesh.get("primitives", []):
            mi = prim.get("material")
            if mi is None:
                continue
            ai = prim.get("indices", prim.get("attributes", {}).get("POSITION"))
            w = float(gltf["accessors"][ai]["count"]) if ai is not None else 1.0
            factor = mats[mi].get("pbrMetallicRoughness", {}).get(
                "baseColorFactor", [1.0, 1.0, 1.0, 1.0])
            acc += w * np.asarray(factor[:3])
            total_w += w
    if total_w == 0.0:
        return None
    return np.clip(acc / total_w * 255.0, 0, 255).astype(np.uint8)


def _obj_base_color(path: str):
    mtl_kd = {}
    mtl_files = []
    counts = {}
    cur = None
    with open(path) as f:
        for line in f:
            if line.startswith("mtllib"):
                mtl_files += line.split()[1:]
            elif line.startswith("usemtl"):
                cur = line.split(None, 1)[1].strip()
            elif line.startswith("f ") and cur is not None:
                counts[cur] = counts.get(cur, 0) + 1
    for m in mtl_files:
        mp = os.path.join(os.path.dirname(path), m)
        if not os.path.isfile(mp):
            continue
        name = None
        with open(mp) as f:
            for line in f:
                if line.startswith("newmtl"):
                    name = line.split(None, 1)[1].strip()
                elif line.startswith("Kd ") and name is not None:
                    mtl_kd[name] = np.asarray(
                        [float(x) for x in line.split()[1:4]])
    # only materials actually referenced by faces count (a shared library
    # may define dozens of unused materials)
    pairs = [(counts[n], kd) for n, kd in mtl_kd.items() if counts.get(n)]
    if not pairs:
        return None
    w = np.asarray([p[0] for p in pairs], float)
    kds = np.stack([p[1] for p in pairs])
    return np.clip((w[:, None] * kds).sum(0) / w.sum() * 255.0,
                   0, 255).astype(np.uint8)


def load_mesh(path: str) -> Tuple[np.ndarray, np.ndarray]:
    if path.endswith(".obj"):
        return load_obj(path)
    if path.endswith((".glb", ".gltf")):
        return load_glb(path)
    raise ValueError(f"unsupported mesh format: {path}")


# ---------------------------------------------------------------------------
# SDF baking
# ---------------------------------------------------------------------------


def _numpy_sdf(verts, faces, origin, spacing, dims, signed):
    """Pure-numpy fallback (chunked brute force) — preprocessing only."""
    xs = origin[0] + np.arange(dims[0]) * spacing
    ys = origin[1] + np.arange(dims[1]) * spacing
    zs = origin[2] + np.arange(dims[2]) * spacing
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    tri = verts[faces]  # (F, 3, 3)
    out = np.full(len(pts), np.inf, np.float32)
    for start in range(0, len(pts), 4096):
        p = pts[start:start + 4096, None, :]
        # distance to triangle vertices/edges approximation via closest vertex
        # + plane projection (coarse fallback; native path is exact)
        d = np.linalg.norm(p - tri[None, :, 0], axis=-1)
        d = np.minimum(d, np.linalg.norm(p - tri[None, :, 1], axis=-1))
        d = np.minimum(d, np.linalg.norm(p - tri[None, :, 2], axis=-1))
        out[start:start + 4096] = d.min(axis=1)
    return out.reshape(dims)


def mesh_to_sdf_grid(
    verts: np.ndarray,
    faces: np.ndarray,
    origin: np.ndarray,
    spacing: float,
    dims: Tuple[int, int, int],
    signed: bool = True,
) -> np.ndarray:
    """(X, Y, Z) float32 signed distance grid of the mesh."""
    lib = _load_native()
    if lib is None:
        return _numpy_sdf(verts, faces, origin, spacing, dims, signed)
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    origin = np.ascontiguousarray(origin, np.float32)
    dims_arr = np.ascontiguousarray(dims, np.int32)
    out = np.empty(int(np.prod(dims)), np.float32)
    rc = lib.mesh_to_sdf(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(faces),
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(spacing),
        dims_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(1 if signed else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"mesh_to_sdf failed rc={rc}")
    return out.reshape(dims)


def bake_mesh_scene(
    path: str,
    spacing: float = 0.1,
    margin: float = 0.5,
    max_cells: int = 384,
):
    """Load a mesh file and bake it into a single-scene grid ``SceneData``
    usable by the grid render/collision backend."""
    import jax.numpy as jnp

    from .scene import SceneData

    if path.endswith((".glb", ".gltf")):
        verts, faces, texinfo = load_glb_textured(path)
        return bake_scenes_from_meshes(
            [(verts, faces, None, None, texinfo)], spacing=spacing,
            margin=margin, max_cells=max_cells)
    verts, faces = load_mesh(path)
    return bake_scene_from_arrays(verts, faces, spacing=spacing,
                                  margin=margin, max_cells=max_cells)


def bake_scene_from_arrays(
    verts: np.ndarray,
    faces: np.ndarray,
    spacing: float = 0.1,
    margin: float = 0.5,
    max_cells: int = 384,
):
    """Triangle soup → grid ``SceneData`` with the exact triangles attached
    (cameras ray-trace the true mesh via `render/tri_trace.py`; collision
    queries keep the grid — the reference's GL-render + CGAL-query split)."""
    return bake_scenes_from_meshes([(verts, faces)], spacing=spacing,
                                   margin=margin, max_cells=max_cells)


def instance_palette(n: int) -> np.ndarray:
    """(n, 3) uint8 deterministic instance colors: golden-angle hues at two
    lightness bands — visually distinct and stable across runs. Row 0 (the
    stage) stays the neutral 180-gray of plain imported meshes."""
    import colorsys

    out = np.full((max(n, 1), 3), 180, np.uint8)
    for i in range(1, n):
        h = (i * 0.381966) % 1.0
        light = 0.55 if i % 2 else 0.4
        out[i] = np.asarray(colorsys.hls_to_rgb(h, light, 0.9)) * 255
    return out


def bake_scenes_from_meshes(
    meshes,  # (verts, faces[, face_inst_ids[, inst_colors[, texinfo]]])
    spacing: float = 0.1,
    margin: float = 0.5,
    max_cells: int = 384,
):
    """Multiple triangle soups → one stacked ``SceneData``: all scenes share
    a grid frame (union bounds — SceneData carries ONE origin/spacing), and
    triangle soups are zero-padded to a common count for the kernel.

    A mesh given as ``(verts, faces, face_inst_ids)`` gets a PER-INSTANCE
    semantic grid — every cell is labeled ``nearest instance's id + 1``
    (habitat's per-instance semantic sensor; ids wrap at 255 to stay uint8)
    and an id-keyed albedo (the optional fourth element, id-indexed (K, 3)
    uint8 — asset material colors; :func:`instance_palette` otherwise), so
    the exact-tri and grid backends render instance segmentation and
    distinct objects. Two-tuples keep the flat gray/1 defaults.

    A mesh whose fifth element is a :func:`load_glb_textured` texinfo dict
    attaches per-face UV + atlas tables — the exact-tri backend then
    renders TEXTURED RGB instead of grid albedo."""
    import jax.numpy as jnp

    from .scene import SceneData
    from ..render.tri_trace import pack_triangles

    meshes = [tuple(m) + (None,) * (5 - len(m)) for m in meshes]
    los = np.stack([m[0].min(axis=0) for m in meshes])
    his = np.stack([m[0].max(axis=0) for m in meshes])
    lo = los.min(axis=0) - margin
    hi = his.max(axis=0) + margin
    dims = np.minimum(np.ceil((hi - lo) / spacing).astype(int) + 1, max_cells)
    spacing = float(np.max((hi - lo) / (dims - 1)))
    dims_t = tuple(int(d) for d in dims)
    grids = [mesh_to_sdf_grid(v, f, lo, spacing, dims_t)
             for v, f, *_ in meshes]
    pk = [pack_triangles(v, f, return_order=True) for v, f, *_ in meshes]
    packed = [p for p, _ in pk]
    orders = [o for _, o in pk]
    t_max = max(p.shape[0] for p in packed)
    tris = np.zeros((len(packed), t_max, 9), np.float32)
    for i, p in enumerate(packed):
        tris[i, : p.shape[0]] = p
    S = len(meshes)
    shape = grids[0].shape

    tex_fields = {}
    if any(m[4] is not None for m in meshes):
        uvs = np.zeros((S, t_max, 6), np.float32)
        rects = np.zeros((S, t_max, 4), np.float32)
        atlases = []
        for i, m in enumerate(meshes):
            ti = m[4]
            if ti is None:  # texture-less scene in a textured batch:
                atlases.append(np.full((1, 1, 3), 180, np.uint8))
                rects[i, :, :2] = 1.0  # 1×1 gray texel for every face
                continue
            uv_i, rect_i, atlas_i = build_atlas(ti, orders[i])
            uvs[i, : len(uv_i)] = uv_i
            rects[i, : len(rect_i)] = rect_i
            atlases.append(atlas_i)
        ah = max(a.shape[0] for a in atlases)
        aw = max(a.shape[1] for a in atlases)
        atlas = np.zeros((S, ah, aw, 3), np.uint8)
        for i, a in enumerate(atlases):
            atlas[i, : a.shape[0], : a.shape[1]] = a
        tex_fields = dict(tri_uv=jnp.asarray(uvs),
                          tri_rect=jnp.asarray(rects),
                          atlas=jnp.asarray(atlas))

    semantic = np.ones((S, *shape), np.uint8)
    albedo = np.full((S, *shape, 3), 180, np.uint8)
    for i, (v, f, inst, colors, _tex) in enumerate(meshes):
        if inst is None or len(np.unique(inst)) < 2:
            continue
        # label every cell with the nearest instance (running argmin of
        # per-instance unsigned distance grids — one grid in memory at a
        # time); only cells near a surface are ever sampled by shading
        best = np.full(shape, np.inf, np.float32)
        win = np.zeros(shape, np.int32)
        for iid in np.unique(inst):
            d = mesh_to_sdf_grid(v, f[inst == iid], lo, spacing, dims_t,
                                 signed=False)
            m = d < best
            best = np.where(m, d, best)
            win = np.where(m, int(iid), win)
        semantic[i] = (win % 255 + 1).astype(np.uint8)
        pal = (np.asarray(colors, np.uint8) if colors is not None
               else instance_palette(int(win.max()) + 1))
        albedo[i] = pal[win]

    return SceneData(
        sdf=jnp.asarray(np.stack(grids)),
        albedo=jnp.asarray(albedo),
        semantic=jnp.asarray(semantic),
        origin=jnp.asarray(lo, jnp.float32),
        spacing=jnp.asarray(spacing, jnp.float32),
        bbox=jnp.asarray(np.stack([lo + margin, hi - margin]), jnp.float32),
        triangles=jnp.asarray(tris),
        **tex_fields,
    )
