"""Surface mesh extraction from TSDF volumes (marching tetrahedra).

Replaces the mesh path of the reference's python TSDF bridge
(``src/TSDFfusion.py.in`` SaveMesh via tsdf-fusion-python's marching cubes).
Marching *tetrahedra* is used instead of cubes: each cell splits into 6
tetrahedra whose 16 sign cases are derivable in code (no 256-entry lookup
tables), output is watertight, and the whole extraction vectorizes as masked
batched ops with a static triangle budget.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 6 tetrahedra per cube (corner indices into the 8 cube corners, standard
# diagonal split through corners 0-7)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], np.int32)

# cube corner offsets (x, y, z)
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)

# tetrahedron edge list (pairs of local tet-vertex ids)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# For each of the 16 sign cases (bit i set = vertex i inside), the triangles
# as triples of tet-edge ids; -1 padded, max 2 triangles per tet.
_CASES = -np.ones((16, 2, 3), np.int32)


def _build_cases():
    # single vertex inside -> one triangle on the three edges touching it
    touching = {v: [e for e in range(6)
                    if v in _TET_EDGES[e]] for v in range(4)}

    def oriented(v, edges):
        return edges  # orientation handled by normal-consistency later

    for case in range(1, 15):
        inside = [v for v in range(4) if case & (1 << v)]
        if len(inside) == 1:
            v = inside[0]
            _CASES[case, 0] = touching[v]
        elif len(inside) == 3:
            v = [x for x in range(4) if x not in inside][0]
            _CASES[case, 0] = touching[v][::-1]
        elif len(inside) == 2:
            a, b = inside
            # quad on the 4 edges crossing the surface
            cross = [e for e in range(6)
                     if (int(_TET_EDGES[e][0] in inside)
                         + int(_TET_EDGES[e][1] in inside)) == 1]
            # order the quad so consecutive edges share a tet face
            e0 = cross[0]
            rest = cross[1:]
            order = [e0]
            while rest:
                last = _TET_EDGES[order[-1]]
                for e in rest:
                    if len(set(last) & set(_TET_EDGES[e])) == 1:
                        order.append(e)
                        rest.remove(e)
                        break
                else:
                    order.append(rest.pop(0))
            _CASES[case, 0] = [order[0], order[1], order[2]]
            _CASES[case, 1] = [order[0], order[2], order[3]]


_build_cases()


@functools.partial(jax.jit, static_argnames=("max_tris",))
def marching_tetrahedra(tsdf: jnp.ndarray, weight: jnp.ndarray,
                        origin: jnp.ndarray, *, voxel_size: float = 0.004,
                        iso: float = 0.0, weight_thresh: float = 0.5,
                        max_tris: int = 131072):
    """Extract the iso-surface triangle soup of a [D, D, D] TSDF (z-major).

    Returns (verts [max_tris, 3, 3] base-frame coords, valid [max_tris]).
    Cells with any unobserved corner (weight <= thresh) are skipped.
    """
    D = tsdf.shape[0]
    n = D - 1
    # gather the 8 corner fields per cell: [8, n, n, n] via slicing
    f = jnp.stack([tsdf[c[2]:c[2] + n, c[1]:c[1] + n, c[0]:c[0] + n]
                   for c in _CORNERS])
    w = jnp.stack([weight[c[2]:c[2] + n, c[1]:c[1] + n, c[0]:c[0] + n]
                   for c in _CORNERS])
    observed = jnp.all(w > weight_thresh, axis=0)          # [n, n, n]

    # cell base coords
    ii = jnp.arange(n, dtype=tsdf.dtype) * voxel_size
    base = jnp.stack(jnp.meshgrid(ii, ii, ii, indexing="ij"), -1)  # z, y, x
    base = base[..., ::-1] + origin                        # -> (x, y, z)

    corners_pos = jnp.asarray(_CORNERS, tsdf.dtype) * voxel_size   # [8, 3]

    tris_all = []
    valid_all = []
    for tet in _TETS:
        fv = f[tet]                                        # [4, n, n, n]
        inside = (fv < iso)
        case = (inside[0].astype(jnp.int32)
                + 2 * inside[1] + 4 * inside[2] + 8 * inside[3])
        # interpolated crossing point on each of the 6 tet edges
        pts = []
        for e in range(6):
            a, b = _TET_EDGES[e]
            fa, fb = fv[a], fv[b]
            t = (iso - fa) / jnp.where(jnp.abs(fb - fa) > 1e-9, fb - fa, 1e-9)
            t = jnp.clip(t, 0.0, 1.0)
            pa = corners_pos[tet[a]]
            pb = corners_pos[tet[b]]
            p = pa + t[..., None] * (pb - pa)              # [n,n,n,3] offset
            pts.append(p)
        pts = jnp.stack(pts)                               # [6, n, n, n, 3]

        cases_tab = jnp.asarray(_CASES)                    # [16, 2, 3]
        tri_edges = cases_tab[case]                        # [n,n,n, 2, 3]
        for ti in range(2):
            e_ids = tri_edges[..., ti, :]                  # [n,n,n,3]
            tri_ok = observed & (e_ids[..., 0] >= 0)
            eids = jnp.clip(e_ids, 0, 5)
            # gather the three edge points
            v = jnp.stack([
                jnp.take_along_axis(
                    pts, eids[None, ..., k, None].repeat(3, -1), axis=0)[0]
                for k in range(3)], axis=-2)               # [n,n,n,3,3]
            v = v + base[..., None, :]
            tris_all.append(v.reshape(-1, 3, 3))
            valid_all.append(tri_ok.reshape(-1))

    tris = jnp.concatenate(tris_all)
    valid = jnp.concatenate(valid_all)
    k = min(max_tris, tris.shape[0])
    from semantic_slam_tpu.ops.compact import compact_indices
    sel, out_valid = compact_indices(valid, k)
    out_tris = tris[sel]
    return out_tris, out_valid


def write_ply_mesh(path: str, tris: np.ndarray, valid: np.ndarray,
                   color: Optional[np.ndarray] = None):
    """Triangle soup -> binary PLY mesh (vertices deduplicated)."""
    tris = np.asarray(tris)[np.asarray(valid)]
    if len(tris) == 0:
        verts = np.zeros((0, 3), np.float32)
        faces = np.zeros((0, 3), np.int64)
    else:
        flat = tris.reshape(-1, 3)
        # dedupe with quantization
        q = np.round(flat / 1e-6).astype(np.int64)
        _, idx, inv = np.unique(q, axis=0, return_index=True,
                                return_inverse=True)
        verts = flat[idx]
        faces = inv.reshape(-1, 3)
    with open(path, "wb") as fo:
        head = (b"ply\nformat binary_little_endian 1.0\n"
                + b"element vertex %d\n" % len(verts)
                + b"property float x\nproperty float y\nproperty float z\n"
                + b"element face %d\n" % len(faces)
                + b"property list uchar int vertex_indices\n"
                + b"end_header\n")
        fo.write(head)
        fo.write(verts.astype("<f4").tobytes())
        if len(faces):
            rec = np.zeros(len(faces),
                           dtype=[("n", np.uint8), ("v", "<i4", 3)])
            rec["n"] = 3
            rec["v"] = faces
            fo.write(rec.tobytes())
    return len(verts), len(faces)
