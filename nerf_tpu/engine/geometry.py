"""Geometry extraction from a trained radiance field.

The reference (krrish94/nerf-pytorch) has no geometry export; the original
NeRF release shipped an ``extract_mesh`` notebook (sigma grid + marching
cubes at iso=50) that its users depend on. This module rebuilds that
capability TPU-first:

- The density grid is evaluated INSIDE one jitted program: sample
  coordinates are generated on-device from chunk indices (nothing but the
  params crosses the host->device boundary), each chunk is one big batched
  encode+MLP matmul (MXU-shaped), and ``lax.scan`` walks the chunks so the
  whole R^3 sweep is a single dispatch. Only the final (R, R, R) float32
  sigma grid is fetched.
- The isosurfacer is a vectorized marching-tetrahedra pass (host-side
  numpy): each grid cube splits into 6 diagonal-aligned tetrahedra (a
  face-consistent decomposition, so meshes are watertight by
  construction), surface cells are pre-filtered with an 8-corner min/max
  test, and shared-edge vertices weld exactly because every crossing is
  interpolated in canonical (low global index -> high) direction and keyed
  by its global edge id. Marching *tetrahedra* instead of marching *cubes*
  because its 16-case table is small enough to verify exhaustively in the
  test suite (``tests/test_geometry.py``) — no 256-entry lookup table to
  trust.

Outputs are binary little-endian PLY (vertex colors sampled from the
radiance field at a fixed view direction), loadable by MeshLab / Blender /
Open3D / trimesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .renderer import RenderSettings, encode_points

# ---------------------------------------------------------------------------
# Device-side field sampling
# ---------------------------------------------------------------------------


def _field_settings(settings: RenderSettings) -> RenderSettings:
    """Grid queries always take the exact XLA path (no Pallas, no anneal)."""
    return dataclasses.replace(
        settings, use_pallas=False, pe_alpha_xyz=-1.0, remat=False
    )


def _apply_field(model, params, pts, settings: RenderSettings):
    """Evaluate the raw field at ``pts`` (C, 3) -> (C, 4) [r, g, b, sigma_raw].

    View-dependent models get a fixed -z view direction — the density head
    never sees it, and for colors a fixed frontal direction is the standard
    vertex-bake convention.
    """
    s = settings
    viewdirs = None
    if getattr(model, "use_viewdirs", True) and model.dim_dir > 0:
        viewdirs = jnp.broadcast_to(
            jnp.array([0.0, 0.0, -1.0], dtype=pts.dtype), pts.shape
        )
    enc = encode_points(pts[:, None, :], viewdirs, s)
    if s.compute_dtype != "float32":
        enc = enc.astype(jnp.dtype(s.compute_dtype))
    raw = model.apply(params, enc)
    return raw.astype(jnp.float32)[:, 0, :]


def sigma_chunk_body(
    model,
    settings: RenderSettings,
    resolution: int,
    bbox_min: Tuple[float, float, float],
    bbox_max: Tuple[float, float, float],
    chunk: int,
):
    """``one_chunk(params, c) -> (chunk,) sigma`` for linear chunk index ``c``.

    The shared device-side sweep body: synthesizes the chunk's grid
    coordinates from ``c`` (nothing crosses the host boundary), encodes,
    and evaluates the density head. Used by the serial scan here and the
    shard_map sweep in ``parallel/geometry.py``. Out-of-range indices (the
    tail chunk's padding) produce points past the bbox — harmless, the
    caller slices them off.
    """
    s = _field_settings(settings)
    r = int(resolution)
    lo = jnp.asarray(bbox_min, dtype=jnp.float32)
    hi = jnp.asarray(bbox_max, dtype=jnp.float32)
    scale = (hi - lo) / max(r - 1, 1)

    def one_chunk(params, c):
        lin = c * chunk + jnp.arange(chunk)
        k = lin % r
        j = (lin // r) % r
        i = lin // (r * r)
        ijk = jnp.stack([i, j, k], axis=-1).astype(jnp.float32)
        pts = lo + ijk * scale
        raw = _apply_field(model, params, pts, s)
        return jax.nn.relu(raw[:, 3])

    return one_chunk


def make_sigma_grid_fn(
    model,
    settings: RenderSettings,
    resolution: int,
    bbox_min: Tuple[float, float, float],
    bbox_max: Tuple[float, float, float],
    chunk: int = 65536,
):
    """Build ``grid_fn(params) -> (R, R, R) float32 sigma`` (one jitted program).

    Grid axis order is (x, y, z); vertex (i, j, k) sits at
    ``bbox_min + (i, j, k) / (R - 1) * (bbox_max - bbox_min)``.
    Coordinates are synthesized on-device from the linear chunk index, so
    the host uploads nothing per call. Multi-device: see
    ``parallel.geometry.make_parallel_sigma_grid_fn``.
    """
    r = int(resolution)
    n = r ** 3
    chunk = int(min(chunk, n))
    num_chunks = (n + chunk - 1) // chunk
    one_chunk = sigma_chunk_body(
        model, settings, r, bbox_min, bbox_max, chunk
    )

    def grid_fn(params):
        _, sig = jax.lax.scan(
            lambda carry, c: (carry, one_chunk(carry, c)),
            params, jnp.arange(num_chunks),
        )
        return sig.reshape(num_chunks * chunk)[:n].reshape(r, r, r)

    return jax.jit(grid_fn)


def density_aabb(
    model,
    params,
    settings: RenderSettings,
    resolution: int = 64,
    bbox_min: Tuple[float, float, float] = (-1.5, -1.5, -1.5),
    bbox_max: Tuple[float, float, float] = (1.5, 1.5, 1.5),
    tau: float = 1.0,
    chunk: int = 65536,
) -> Tuple[float, float, float, float, float, float]:
    """Axis-aligned bounding box of the field's occupied region.

    Sweeps a ``resolution``^3 sigma grid over ``[bbox_min, bbox_max]`` and
    returns the tight (xmin, ymin, zmin, xmax, ymax, zmax) around vertices
    with post-ReLU sigma > ``tau``, padded by one voxel so surfaces that
    straddle the threshold stay inside. Feed the result to
    ``RenderSettings.aabb`` for empty-space-skipping renders (the sample
    interval of every ray is tightened to its box crossing). Falls back to
    the sweep bounds when nothing exceeds ``tau`` (untrained field).

    Warns (``UserWarning``) when the occupied region touches the sweep cube
    on any face: geometry extending past the sweep bounds would be silently
    clipped, and rays tightened onto that box would truncate real geometry —
    re-run with wider bounds (the CLIs expose ``--aabb-sweep-bounds``).
    """
    grid_fn = make_sigma_grid_fn(
        model, settings, resolution, bbox_min, bbox_max, chunk
    )
    sigma = np.asarray(grid_fn(params))
    occupied = np.argwhere(sigma > tau)
    lo = np.asarray(bbox_min, np.float64)
    hi = np.asarray(bbox_max, np.float64)
    if occupied.size == 0:
        return tuple(lo) + tuple(hi)
    occ_lo = occupied.min(axis=0)
    occ_hi = occupied.max(axis=0)
    if np.any(occ_lo == 0) or np.any(occ_hi == resolution - 1):
        import warnings

        faces = [
            f"{'xyz'[a]}{'-+'[side]}"
            for a in range(3)
            for side, touch in ((0, occ_lo[a] == 0), (1, occ_hi[a] == resolution - 1))
            if touch
        ]
        lo_s = ", ".join(f"{v:g}" for v in lo)
        hi_s = ", ".join(f"{v:g}" for v in hi)
        warnings.warn(
            f"density_aabb: occupied region (sigma > {tau}) touches the "
            f"sweep bounds on face(s) {', '.join(faces)} — geometry may "
            f"extend past [({lo_s}), ({hi_s})] and would be clipped; "
            "widen the sweep bounds (--aabb-sweep-bounds).",
            stacklevel=2,
        )
    scale = (hi - lo) / (resolution - 1)
    box_lo = lo + (occ_lo - 1) * scale
    box_hi = lo + (occ_hi + 1) * scale
    box_lo = np.maximum(box_lo, lo)
    box_hi = np.minimum(box_hi, hi)
    return tuple(float(v) for v in box_lo) + tuple(float(v) for v in box_hi)


def _make_chunked_point_query(per_chunk_fn, chunk: int):
    """Host wrapper shared by the vertex queries: pad host points to a chunk
    multiple (repeating the last point), ``lax.scan`` the jitted body over
    the chunks, slice the padding back off.

    The effective chunk shrinks to the (1024-rounded) point count so a
    25k-vertex color/normal bake never pads up to a grid-sweep-sized
    (e.g. 262144) batch of wasted MLP evaluations.
    """
    jitted = jax.jit(
        lambda params, pts_chunks: jax.lax.scan(per_chunk_fn, params, pts_chunks)[1]
    )

    def query_fn(params, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, dtype=np.float32)
        n = pts.shape[0]
        if n == 0:
            return np.zeros((0, 3), dtype=np.float32)
        eff = min(chunk, (n + 1023) // 1024 * 1024)
        padded = (n + eff - 1) // eff * eff
        if padded != n:
            pts = np.concatenate(
                [pts, np.broadcast_to(pts[-1:], (padded - n, 3))], axis=0
            )
        out = jitted(params, jnp.asarray(pts.reshape(-1, eff, 3)))
        return np.asarray(out).reshape(padded, 3)[:n]

    return query_fn


def make_rgb_query_fn(model, settings: RenderSettings, chunk: int = 65536):
    """Build ``rgb_fn(params, pts (N, 3)) -> (N, 3) float32 in [0, 1]``."""
    s = _field_settings(settings)

    def one(carry, p):
        raw = _apply_field(model, carry, p, s)
        return carry, jax.nn.sigmoid(raw[:, :3])

    return _make_chunked_point_query(one, chunk)


def make_normals_query_fn(model, settings: RenderSettings, chunk: int = 65536):
    """Build ``normals_fn(params, pts (N, 3)) -> (N, 3) float32 unit normals``.

    Surface normal = the negated, normalized density gradient (density
    increases toward the interior), computed by autodiff through the
    encode+MLP program — no finite-difference stencil, one extra backward
    pass per point. Zero-gradient (degenerate) points yield a zero normal.
    """
    s = _field_settings(settings)

    def sigma_at(params, p):
        # Pre-ReLU alpha: identical to sigma wherever a surface exists
        # (sigma > 0) and smooth across it.
        return _apply_field(model, params, p[None, :], s)[0, 3]

    grad_one = jax.grad(sigma_at, argnums=1)

    def one(carry, p):
        g = jax.vmap(grad_one, in_axes=(None, 0))(carry, p)
        n = -g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        return carry, n

    return _make_chunked_point_query(one, chunk)


# ---------------------------------------------------------------------------
# Marching tetrahedra (host-side numpy)
# ---------------------------------------------------------------------------

# Cube corner numbering (dx, dy, dz); 6-tet split around the 0-6 diagonal.
_CUBE_OFFSETS = np.array(
    [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
     (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
    dtype=np.int64,
)
# (0, a, b, 6) with (a, b) walking the equator cycle 1-2-3-7-4-5-1: every
# tet is positively oriented and every cube face is cut by the SAME
# diagonal as its neighbor's matching face (translates of the 0-6
# direction) — the property that makes the global mesh watertight.
_TET_CORNERS = np.array(
    [(0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6),
     (0, 7, 4, 6), (0, 4, 5, 6), (0, 5, 1, 6)],
    dtype=np.int64,
)
# Tet edge numbering used by the case table.
_TET_EDGES = np.array(
    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], dtype=np.int64
)
# case = sum(2^i for tet-vertex i with value > iso) -> triangles as edge-id
# triples, wound so normals point OUT of the high-value region (for a
# positively oriented tet). Derived by hand; verified exhaustively by
# tests/test_geometry.py::test_tet_table_*.
_TRI_TABLE = {
    1: [(0, 1, 2)],
    2: [(0, 4, 3)],
    3: [(1, 2, 4), (1, 4, 3)],
    4: [(1, 3, 5)],
    5: [(0, 3, 5), (0, 5, 2)],
    6: [(0, 4, 5), (0, 5, 1)],
    7: [(2, 4, 5)],
    8: [(2, 5, 4)],
    9: [(0, 1, 5), (0, 5, 4)],
    10: [(0, 2, 5), (0, 5, 3)],
    11: [(1, 5, 3)],
    12: [(1, 3, 4), (1, 4, 2)],
    13: [(0, 3, 4)],
    14: [(0, 2, 1)],
}


def _active_cells(values: np.ndarray, iso: float) -> np.ndarray:
    """Linear-ish (A, 3) integer base indices of cells straddling ``iso``."""
    inside = values > iso
    occ = inside[:-1, :-1, :-1].astype(np.uint8)
    for dx, dy, dz in _CUBE_OFFSETS[1:]:
        occ = occ + inside[
            dx : dx + inside.shape[0] - 1,
            dy : dy + inside.shape[1] - 1,
            dz : dz + inside.shape[2] - 1,
        ]
    return np.argwhere((occ > 0) & (occ < 8))


def marching_tetrahedra(
    values: np.ndarray,
    iso: float,
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the ``values > iso`` isosurface of a 3-D scalar grid.

    Returns ``(vertices (V, 3) float32, faces (F, 3) int64)`` with faces
    wound counter-clockwise seen from outside (the low-value side).
    Vertices on edges shared between tetrahedra/cells are welded exactly
    (same canonical interpolation + global edge key), so closed surfaces
    come out watertight and consistently oriented.
    """
    values = np.asarray(values, dtype=np.float64)
    if values.ndim != 3 or min(values.shape) < 2:
        raise ValueError(f"need a 3-D grid with every dim >= 2, got {values.shape}")
    nx, ny, nz = values.shape
    origin = np.asarray(origin, dtype=np.float64)
    spacing = np.asarray(spacing, dtype=np.float64)

    cells = _active_cells(values, iso)
    tri_keys, tri_t, tri_ga = [], [], []
    if cells.shape[0]:
        flat = values.reshape(-1)
        # (A, 8) global vertex ids of each active cell's corners.
        corner = (
            (cells[:, 0:1] + _CUBE_OFFSETS[:, 0]) * (ny * nz)
            + (cells[:, 1:2] + _CUBE_OFFSETS[:, 1]) * nz
            + (cells[:, 2:3] + _CUBE_OFFSETS[:, 2])
        )
        for tet in _TET_CORNERS:
            tv = corner[:, tet]                       # (A, 4) global ids
            vals = flat[tv]                           # (A, 4)
            case = ((vals > iso).astype(np.int64) << np.arange(4)).sum(axis=1)
            for c, tris in _TRI_TABLE.items():
                sel = np.nonzero(case == c)[0]
                if not sel.size:
                    continue
                for tri in tris:
                    ek = _TET_EDGES[list(tri)]        # (3, 2) local corners
                    ga, gb = tv[sel][:, ek[:, 0]], tv[sel][:, ek[:, 1]]
                    va, vb = vals[sel][:, ek[:, 0]], vals[sel][:, ek[:, 1]]
                    # Canonical direction: low global id -> high, so the
                    # same edge interpolates bit-identically in every tet.
                    swap = ga > gb
                    ga2 = np.where(swap, gb, ga)
                    gb2 = np.where(swap, ga, gb)
                    va2 = np.where(swap, vb, va)
                    vb2 = np.where(swap, va, vb)
                    t = (iso - va2) / (vb2 - va2)
                    # A crossing that lands exactly on a grid corner (a
                    # corner value == iso, so t is exactly 0 or 1) is keyed
                    # by the CORNER id, not the edge id: every edge incident
                    # to that corner emits the same vertex, and they must
                    # all weld to one id or the watertight guarantee breaks
                    # (integer/occupancy grids hit this constantly).
                    n_vert = nx * ny * nz
                    key = np.where(
                        t == 0.0, ga2,
                        np.where(t == 1.0, gb2, n_vert + ga2 * n_vert + gb2),
                    )
                    tri_keys.append(key)
                    tri_t.append(t)
                    tri_ga.append(np.stack([ga2, gb2], axis=-1))
    if not tri_keys:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    keys = np.concatenate(tri_keys, axis=0)           # (F, 3)
    ts = np.concatenate(tri_t, axis=0)                # (F, 3)
    gab = np.concatenate(tri_ga, axis=0)              # (F, 3, 2)

    uniq, first, inv = np.unique(keys.reshape(-1), return_index=True, return_inverse=True)
    faces = inv.reshape(-1, 3)
    ga = gab.reshape(-1, 2)[first]                    # (V, 2) endpoint ids
    tv = ts.reshape(-1)[first]                        # (V,)

    def unflatten(g):
        return np.stack([g // (ny * nz), (g // nz) % ny, g % nz], axis=-1)

    pa = origin + unflatten(ga[:, 0]) * spacing
    pb = origin + unflatten(ga[:, 1]) * spacing
    tcol = tv[:, None]
    # Exact corner positions at t == 0/1 (pa + 1.0*(pb-pa) can round away
    # from pb); plain interpolation elsewhere.
    verts = np.where(
        tcol == 0.0, pa, np.where(tcol == 1.0, pb, pa + tcol * (pb - pa))
    ).astype(np.float32)
    # Corner-welded vertices collapse some triangles to zero area (two of a
    # triangle's edges crossing at the same at-iso corner); drop them.
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[ok]


# ---------------------------------------------------------------------------
# High-level extraction
# ---------------------------------------------------------------------------


def extract_mesh(
    model,
    params,
    settings: RenderSettings,
    bbox_min: Tuple[float, float, float] = (-1.5, -1.5, -1.5),
    bbox_max: Tuple[float, float, float] = (1.5, 1.5, 1.5),
    resolution: int = 256,
    iso: float = 50.0,
    chunk: int = 65536,
    with_colors: bool = True,
    with_normals: bool = True,
    sigma_grid: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Density grid -> marching-tets mesh (+ baked vertex colors/normals).

    ``iso=50`` is the original NeRF release's extract_mesh convention.
    Normals come from the autodiffed density gradient
    (:func:`make_normals_query_fn`), not from face geometry — smooth
    shading even at the grid resolution's facet scale.
    Returns ``(vertices, faces, colors_uint8 | None, normals | None)``.
    """
    if sigma_grid is None:
        grid_fn = make_sigma_grid_fn(
            model, settings, resolution, bbox_min, bbox_max, chunk
        )
        sigma_grid = np.asarray(grid_fn(params))
    r = sigma_grid.shape[0]
    lo = np.asarray(bbox_min, dtype=np.float64)
    hi = np.asarray(bbox_max, dtype=np.float64)
    verts, faces = marching_tetrahedra(
        sigma_grid, iso, origin=lo, spacing=(hi - lo) / max(r - 1, 1)
    )
    colors = normals = None
    if with_colors and verts.shape[0]:
        rgb = make_rgb_query_fn(model, settings, chunk)(params, verts)
        colors = np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)
    if with_normals and verts.shape[0]:
        normals = make_normals_query_fn(model, settings, chunk)(params, verts)
    return verts, faces, colors, normals


def extract_pointcloud(
    model,
    params,
    settings: RenderSettings,
    bbox_min: Tuple[float, float, float] = (-1.5, -1.5, -1.5),
    bbox_max: Tuple[float, float, float] = (1.5, 1.5, 1.5),
    resolution: int = 256,
    threshold: float = 50.0,
    chunk: int = 65536,
    max_points: int = 0,
    seed: int = 0,
    sigma_grid: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grid vertices with ``sigma > threshold`` as a colored point cloud.

    Returns ``(points (N, 3) float32, colors (N, 3) uint8, sigmas (N,))``;
    ``max_points > 0`` subsamples uniformly at random (deterministic seed).
    """
    if sigma_grid is None:
        grid_fn = make_sigma_grid_fn(
            model, settings, resolution, bbox_min, bbox_max, chunk
        )
        sigma_grid = np.asarray(grid_fn(params))
    r = sigma_grid.shape[0]
    lo = np.asarray(bbox_min, dtype=np.float64)
    hi = np.asarray(bbox_max, dtype=np.float64)
    idx = np.argwhere(sigma_grid > threshold)
    sigmas = sigma_grid[sigma_grid > threshold]
    if max_points and idx.shape[0] > max_points:
        keep = np.random.default_rng(seed).choice(
            idx.shape[0], size=max_points, replace=False
        )
        idx, sigmas = idx[keep], sigmas[keep]
    pts = (lo + idx * ((hi - lo) / max(r - 1, 1))).astype(np.float32)
    if pts.shape[0]:
        rgb = make_rgb_query_fn(model, settings, chunk)(params, pts)
        colors = np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)
    else:
        colors = np.zeros((0, 3), dtype=np.uint8)
    return pts, colors, np.asarray(sigmas, dtype=np.float32)


# ---------------------------------------------------------------------------
# PLY I/O
# ---------------------------------------------------------------------------


def save_ply(
    path: str,
    vertices: np.ndarray,
    faces: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
) -> None:
    """Write a binary little-endian PLY (optional faces/normals/uchar colors)."""
    vertices = np.asarray(vertices, dtype=np.float32)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {vertices.shape[0]}",
              "property float x", "property float y", "property float z"]
    vfields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if normals is not None:
        header += ["property float nx", "property float ny",
                   "property float nz"]
        vfields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
        vfields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    if faces is not None:
        header += [f"element face {faces.shape[0]}",
                   "property list uchar int vertex_indices"]
    header.append("end_header")

    vdata = np.empty(vertices.shape[0], dtype=vfields)
    vdata["x"], vdata["y"], vdata["z"] = vertices.T
    if normals is not None:
        normals = np.asarray(normals, dtype=np.float32)
        vdata["nx"], vdata["ny"], vdata["nz"] = normals.T
    if colors is not None:
        colors = np.asarray(colors, dtype=np.uint8)
        vdata["red"], vdata["green"], vdata["blue"] = colors.T
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(vdata.tobytes())
        if faces is not None:
            fdata = np.empty(
                faces.shape[0],
                dtype=[("n", "u1"), ("i0", "<i4"), ("i1", "<i4"), ("i2", "<i4")],
            )
            fdata["n"] = 3
            fdata["i0"], fdata["i1"], fdata["i2"] = np.asarray(faces, np.int32).T
            f.write(fdata.tobytes())


def load_ply(path: str):
    """Read PLYs written by :func:`save_ply` (tests / spot checks).

    Returns ``(vertices, faces | None, colors | None, normals | None)``.
    """
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    lines = data[:end].decode("ascii").splitlines()
    nv = nf = 0
    has_color = has_normals = False
    for ln in lines:
        if ln.startswith("element vertex"):
            nv = int(ln.split()[-1])
        elif ln.startswith("element face"):
            nf = int(ln.split()[-1])
        elif ln == "property uchar red":
            has_color = True
        elif ln == "property float nx":
            has_normals = True
    vfields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if has_normals:
        vfields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if has_color:
        vfields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    vdt = np.dtype(vfields)
    vdata = np.frombuffer(data, dtype=vdt, count=nv, offset=end)
    verts = np.stack([vdata["x"], vdata["y"], vdata["z"]], axis=-1)
    colors = (
        np.stack([vdata["red"], vdata["green"], vdata["blue"]], axis=-1)
        if has_color else None
    )
    normals = (
        np.stack([vdata["nx"], vdata["ny"], vdata["nz"]], axis=-1)
        if has_normals else None
    )
    faces = None
    if nf:
        fdt = np.dtype([("n", "u1"), ("i0", "<i4"), ("i1", "<i4"), ("i2", "<i4")])
        fdata = np.frombuffer(data, dtype=fdt, count=nf, offset=end + nv * vdt.itemsize)
        faces = np.stack([fdata["i0"], fdata["i1"], fdata["i2"]], axis=-1).astype(np.int64)
    return verts, faces, colors, normals
