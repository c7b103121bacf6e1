"""Density-field mesh extraction (marching tetrahedra) + OBJ export.

Counterpart of the reference's extract_fields/extract_geometry
(distill_mutual/utils.py:442-488), which depends on PyMCubes; that package
is unavailable here, so extraction uses marching tetrahedra (each grid cube
splits into 6 tetrahedra; each tet emits 0-2 triangles by linear
interpolation along crossing edges) in pure numpy.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

# 6-tetrahedra decomposition of the unit cube (corner ids, bit order x,y,z)
_TETS = np.array(
    [
        [0, 5, 1, 3],
        [0, 5, 3, 7],
        [0, 5, 7, 4],
        [0, 7, 3, 2],
        [0, 7, 2, 6],
        [0, 7, 6, 4],
    ],
    np.int32,
)
_CORNERS = np.array(
    [[(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)], np.int32
)


def extract_fields(
    bound_min, bound_max, resolution: int, query_fn: Callable, chunk: int = 128**2
) -> np.ndarray:
    """Chunked density sweep -> [R, R, R] float32 (utils.py:442-473)."""
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    u = np.zeros((resolution, resolution, resolution), np.float32)
    for i, x in enumerate(xs):
        grid = np.stack(np.meshgrid(ys, zs, indexing="ij"), axis=-1).reshape(-1, 2)
        pts = np.concatenate(
            [np.full((len(grid), 1), x, np.float32), grid], axis=-1
        )
        vals = []
        for h in range(0, len(pts), chunk):
            vals.append(np.asarray(query_fn(pts[h : h + chunk])))
        u[i] = np.concatenate(vals).reshape(resolution, resolution)
    return u


def _tet_case_triangles(pattern: int):
    """Edge recipes (pairs of tet-corner ids) for one inside-bitmask case.

    Returns a list of triangles; each triangle is 3 (a, b) edge pairs whose
    iso-crossings form the triangle.
    """
    inside = [bool((pattern >> i) & 1) for i in range(4)]
    ins = [i for i in range(4) if inside[i]]
    outs = [i for i in range(4) if not inside[i]]
    if len(ins) in (0, 4):
        return []
    if len(ins) == 1:
        a = ins[0]
        return [[(a, outs[0]), (a, outs[1]), (a, outs[2])]]
    if len(ins) == 3:
        a = outs[0]
        return [[(a, ins[0]), (a, ins[1]), (a, ins[2])]]
    i0, i1 = ins
    o0, o1 = outs
    # quad (i0,o0)-(i0,o1)-(i1,o1)-(i1,o0) -> two triangles
    return [
        [(i0, o0), (i0, o1), (i1, o1)],
        [(i0, o0), (i1, o1), (i1, o0)],
    ]


def marching_tetrahedra(u: np.ndarray, threshold: float):
    """Extract an iso-surface mesh from a scalar grid.

    Returns (vertices [V, 3] in grid coords, triangles [F, 3] int32).
    Case-table marching tetrahedra: every cube splits into 6 tets; each tet
    is dispatched on its 4-bit inside mask.
    """
    R = u.shape[0]
    base = np.stack(
        np.meshgrid(np.arange(R - 1), np.arange(R - 1), np.arange(R - 1),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    corner_pos = base[:, None, :] + _CORNERS[None]  # [C, 8, 3]
    vals = u[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]

    verts_out, tris_out = [], []
    v_count = 0
    for tet in _TETS:
        tv = vals[:, tet]  # [C, 4]
        tp = corner_pos[:, tet].astype(np.float32)  # [C, 4, 3]
        inside = tv > threshold
        pattern = (
            inside[:, 0].astype(np.int32)
            | (inside[:, 1] << 1)
            | (inside[:, 2] << 2)
            | (inside[:, 3] << 3)
        )
        for case in range(1, 15):
            sel = np.nonzero(pattern == case)[0]
            if len(sel) == 0:
                continue
            sv, sp = tv[sel], tp[sel]

            def crossing(a: int, b: int):
                va, vb = sv[:, a], sv[:, b]
                t = (threshold - va) / np.where(vb == va, 1e-9, vb - va)
                return sp[:, a] + t[:, None] * (sp[:, b] - sp[:, a])

            for tri in _tet_case_triangles(case):
                pts = [crossing(a, b) for (a, b) in tri]
                m = len(sel)
                verts_out.append(np.concatenate(pts))
                idx = v_count + np.arange(3 * m).reshape(3, m).T
                tris_out.append(idx)
                v_count += 3 * m

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return (
        np.concatenate(verts_out).astype(np.float32),
        np.concatenate(tris_out).astype(np.int32),
    )


def extract_geometry(bound_min, bound_max, resolution: int, threshold: float,
                     query_fn: Callable) -> Tuple[np.ndarray, np.ndarray]:
    """Density sweep + iso-surface, vertices mapped to world coordinates
    (utils.py:476-488)."""
    u = extract_fields(bound_min, bound_max, resolution, query_fn)
    verts, tris = marching_tetrahedra(u, threshold)
    bmin = np.asarray(bound_min, np.float32)
    bmax = np.asarray(bound_max, np.float32)
    verts = verts / (resolution - 1.0) * (bmax - bmin)[None] + bmin[None]
    return verts, tris


def save_obj(path: str, verts: np.ndarray, tris: np.ndarray):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
