"""Geometry extraction: marching-tetrahedra isosurfacer, density-grid query,
PLY round-trip.

The tet case table is verified exhaustively and structurally (every crossing
edge used, complements are orientation flips, shared quad diagonals) and the
whole pipeline is checked on an analytic sphere field: the extracted mesh
must be watertight (every directed edge appears exactly once — which also
proves consistent orientation), topologically a sphere (V - E + F = 2), at
the right radius, and outward-wound. The grid query is compared against an
independent numpy reimplementation of positional encoding + the MLP.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_tpu.engine.geometry import (
    _CUBE_OFFSETS,
    _TET_CORNERS,
    _TET_EDGES,
    _TRI_TABLE,
    extract_mesh,
    extract_pointcloud,
    load_ply,
    make_sigma_grid_fn,
    marching_tetrahedra,
    save_ply,
)
from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.models import FlexibleNeRFModel


# ---------------------------------------------------------------------------
# Case-table structural checks
# ---------------------------------------------------------------------------


def test_tet_decomposition_is_positive_and_fills_cube():
    corners = _CUBE_OFFSETS.astype(np.float64)
    total = 0.0
    for tet in _TET_CORNERS:
        p = corners[tet]
        det = np.linalg.det(p[1:] - p[0])
        assert det > 0, f"tet {tet} negatively oriented"
        total += det / 6.0
    assert np.isclose(total, 1.0), "6 tets must tile the unit cube"


def _crossing_edges(case):
    inside = [(case >> i) & 1 for i in range(4)]
    return {
        e
        for e, (a, b) in enumerate(_TET_EDGES)
        if inside[a] != inside[b]
    }


def test_tet_table_uses_exactly_the_crossing_edges():
    for case, tris in _TRI_TABLE.items():
        used = {e for tri in tris for e in tri}
        assert used == _crossing_edges(case), f"case {case}"
        # 1 triangle for 3 crossing edges, 2 for a quad.
        assert len(tris) == {3: 1, 4: 2}[len(used)]


def test_tet_table_complement_cases_flip_orientation():
    def norm(tri):
        i = tri.index(min(tri))
        return tri[i:] + tri[:i]

    for case, tris in _TRI_TABLE.items():
        comp = _TRI_TABLE[15 - case]
        flipped = {norm(tuple(reversed(t))) for t in tris}
        assert {norm(t) for t in comp} == flipped, f"case {case} vs {15 - case}"


def test_tet_table_quads_share_a_diagonal():
    for case, tris in _TRI_TABLE.items():
        if len(tris) != 2:
            continue
        shared = set(tris[0]) & set(tris[1])
        assert len(shared) == 2, f"case {case}: quad split must share an edge"


# ---------------------------------------------------------------------------
# Analytic-field isosurface checks
# ---------------------------------------------------------------------------


def _sphere_mesh(r=0.62, res=25, lim=1.0):
    ax = np.linspace(-lim, lim, res)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    values = r - np.sqrt(x * x + y * y + z * z)  # > 0 inside the sphere
    spacing = (2 * lim / (res - 1),) * 3
    return marching_tetrahedra(values, 0.0, origin=(-lim,) * 3, spacing=spacing)


def test_sphere_mesh_radius_and_size():
    verts, faces = _sphere_mesh()
    assert verts.shape[0] > 500 and faces.shape[0] > 1000
    radii = np.linalg.norm(verts, axis=1)
    # Linear interpolation of an exact signed-distance field puts every
    # vertex exactly on the sphere up to grid-chord error.
    assert np.all(np.abs(radii - 0.62) < 0.05)
    assert faces.min() >= 0 and faces.max() < verts.shape[0]


def test_sphere_mesh_is_watertight_and_consistently_oriented():
    verts, faces = _sphere_mesh()
    directed = {}
    for tri in faces:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            directed[(a, b)] = directed.get((a, b), 0) + 1
    # Closed oriented 2-manifold: every directed edge exactly once and its
    # reverse exactly once (this single check covers both watertightness
    # and globally consistent winding).
    for (a, b), count in directed.items():
        assert count == 1, f"directed edge {(a, b)} used {count} times"
        assert (b, a) in directed, f"boundary edge {(a, b)}"
    v = verts.shape[0]
    e = len(directed) // 2
    f = faces.shape[0]
    assert v - e + f == 2, f"Euler characteristic {v - e + f} != 2 (sphere)"


def test_sphere_mesh_faces_wind_outward():
    verts, faces = _sphere_mesh()
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    normals = np.cross(p1 - p0, p2 - p0)
    centroid = (p0 + p1 + p2) / 3.0
    # For a sphere about the origin, outward normal dot position > 0.
    assert np.all(np.einsum("ij,ij->i", normals, centroid) > 0)


def test_empty_and_full_grids_give_no_surface():
    for fill in (-1.0, 1.0):
        verts, faces = marching_tetrahedra(np.full((4, 4, 4), fill), 0.0)
        assert verts.shape[0] == 0 and faces.shape[0] == 0


def test_translated_sphere_follows_origin_and_spacing():
    res, lim, r = 21, 1.0, 0.5
    ax = np.linspace(-lim, lim, res)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    values = r - np.sqrt(x * x + y * y + z * z)
    verts, _ = marching_tetrahedra(
        values, 0.0, origin=(10 - lim, -lim, -lim),
        spacing=(2 * lim / (res - 1),) * 3,
    )
    radii = np.linalg.norm(verts - np.array([10.0, 0.0, 0.0]), axis=1)
    assert np.all(np.abs(radii - r) < 0.07)


def test_exact_iso_corners_weld_and_stay_watertight():
    """Occupancy-style grids put corner values exactly AT iso: all crossings
    collapse onto grid corners (t = 0/1), which must weld to single vertex
    ids (keyed by corner, not by edge) or the watertight guarantee breaks
    (code-review finding, round 3)."""
    import collections

    values = np.zeros((6, 6, 6))
    values[2:4, 2:4, 2:4] = 1.0  # 2^3 block of "inside"
    verts, faces = marching_tetrahedra(values, 0.0)
    assert verts.shape[0] > 0
    # every vertex welded: unique ids == unique positions
    assert np.unique(np.round(verts, 6), axis=0).shape[0] == verts.shape[0]
    # no zero-area faces survive the corner collapse
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1)
    assert np.all(areas > 1e-12)
    # closed surface, consistently oriented
    directed = collections.Counter()
    for tri in faces:
        directed[(tri[0], tri[1])] += 1
        directed[(tri[1], tri[2])] += 1
        directed[(tri[2], tri[0])] += 1
    for (a, b), count in directed.items():
        assert count == 1 and (b, a) in directed


def test_single_corner_at_iso_has_no_duplicate_vertices():
    values = np.full((2, 2, 2), -1.0)
    values[0, 0, 0] = 0.0  # exactly at iso (outside, since inside is strict >)
    values[1, 0, 0] = 1.0
    values[0, 1, 0] = 1.0
    verts, faces = marching_tetrahedra(values, 0.0)
    assert np.unique(np.round(verts, 6), axis=0).shape[0] == verts.shape[0]
    if faces.shape[0]:
        p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        assert np.all(np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1) > 1e-12)


# ---------------------------------------------------------------------------
# Density-grid query vs an independent numpy spec
# ---------------------------------------------------------------------------


def _numpy_positional_encoding(x, num_fn, include_input, log_sampling):
    out = [x] if include_input else []
    if num_fn > 0:
        if log_sampling:
            freqs = 2.0 ** np.linspace(0.0, num_fn - 1, num_fn)
        else:
            freqs = np.linspace(2.0 ** 0.0, 2.0 ** (num_fn - 1), num_fn)
        for f in freqs:
            out.append(np.sin(x * f))
            out.append(np.cos(x * f))
    return np.concatenate(out, axis=-1)


def _numpy_flexible_apply(params, model, xyz, viewdir):
    """Independent numpy forward pass of FlexibleNeRFModel (use_viewdirs)."""

    def lin(p, h):
        return h @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    relu = lambda v: np.maximum(v, 0.0)
    enc_x = _numpy_positional_encoding(
        xyz, model.num_encoding_fn_xyz, model.include_input_xyz, True
    )
    enc_d = _numpy_positional_encoding(
        viewdir, model.num_encoding_fn_dir, model.include_input_dir, True
    )
    h = lin(params["layer1"], enc_x)
    for i, layer in enumerate(params["layers_xyz"]):
        if model._has_skip(i):
            h = np.concatenate([h, enc_x], axis=-1)
        h = relu(lin(layer, h))
    feat = relu(lin(params["fc_feat"], h))
    alpha = lin(params["fc_alpha"], h)
    h = np.concatenate([feat, enc_d], axis=-1)
    for layer in params["layers_dir"]:
        h = relu(lin(layer, h))
    rgb = lin(params["fc_rgb"], h)
    return rgb, alpha[..., 0]


def _tiny_model_and_settings():
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=32, num_encoding_fn_xyz=4,
        num_encoding_fn_dir=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    settings = RenderSettings(
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
        include_input_xyz=True, include_input_dir=True,
    )
    return model, params, settings


def test_sigma_grid_matches_numpy_spec():
    model, params, settings = _tiny_model_and_settings()
    res = 7
    grid_fn = make_sigma_grid_fn(
        model, settings, res, (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), chunk=64
    )
    got = np.asarray(grid_fn(params))
    assert got.shape == (res, res, res)

    ax = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
    np_params = jax.tree.map(np.asarray, params)
    _, alpha = _numpy_flexible_apply(
        np_params, model, pts, np.broadcast_to(
            np.array([0.0, 0.0, -1.0], np.float32), pts.shape
        )
    )
    want = np.maximum(alpha, 0.0).reshape(res, res, res)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_parallel_sigma_grid_matches_serial():
    """The shard_map sweep must reproduce the serial scan exactly (same
    chunk body + boundaries; only device placement differs)."""
    from nerf_tpu.parallel import make_mesh
    from nerf_tpu.parallel.geometry import make_parallel_sigma_grid_fn

    model, params, settings = _tiny_model_and_settings()
    res = 9  # 729 points over 12 chunks of 64 -> uneven tail across 8 devices
    serial = make_sigma_grid_fn(
        model, settings, res, (-1.0,) * 3, (1.0,) * 3, chunk=64
    )
    parallel = make_parallel_sigma_grid_fn(
        model, settings, res, (-1.0,) * 3, (1.0,) * 3, make_mesh(), chunk=64
    )
    got_serial = np.asarray(serial(params))
    got_parallel = np.asarray(parallel(params))
    np.testing.assert_allclose(got_parallel, got_serial, rtol=1e-6, atol=1e-6)


def test_extract_mesh_and_pointcloud_from_model():
    model, params, settings = _tiny_model_and_settings()
    # Opacify: bias the density head positive so an isosurface exists
    # (random-init fields are near-empty — the bench-guard lesson).
    params = dict(params)
    params["fc_alpha"] = {
        "kernel": params["fc_alpha"]["kernel"],
        "bias": params["fc_alpha"]["bias"] + 2.0,
    }
    verts, faces, colors, normals = extract_mesh(
        model, params, settings, bbox_min=(-1,) * 3, bbox_max=(1,) * 3,
        resolution=12, iso=0.5, chunk=128,
    )
    pts, pc_colors, sigmas = extract_pointcloud(
        model, params, settings, bbox_min=(-1,) * 3, bbox_max=(1,) * 3,
        resolution=12, threshold=0.5, chunk=128, max_points=50,
    )
    assert pts.shape[0] > 0 and pts.shape[0] <= 50
    assert np.all(sigmas > 0.5)
    assert pc_colors.shape == (pts.shape[0], 3) and pc_colors.dtype == np.uint8
    assert np.all(np.abs(pts) <= 1.0)
    if verts.shape[0]:  # iso surface may or may not cross the bbox interior
        assert colors.shape == (verts.shape[0], 3)
        assert normals.shape == (verts.shape[0], 3)
        np.testing.assert_allclose(
            np.linalg.norm(normals, axis=1), 1.0, atol=1e-5
        )
        assert faces.max() < verts.shape[0]


@pytest.mark.parametrize(
    "name",
    ["VeryTinyNeRFModel", "MultiHeadNeRFModel", "ReplicateNeRFModel",
     "PaperNeRFModel", "FlexibleNeRFModel"],
)
def test_sigma_grid_works_for_every_model_family(name):
    """The field-query path must serve all 5 registered families, not just
    the flagship (they differ in dir-encoding counts and input layout)."""
    from nerf_tpu.models import MODEL_REGISTRY

    model = MODEL_REGISTRY[name]()
    # VeryTiny/MultiHead encode directions with the SAME ladder as xyz
    # (reference models.py:4-78); Replicate/Paper/Flexible use 6/4.
    dir_fns = (
        model.num_encoding_functions
        if hasattr(model, "num_encoding_functions") else 4
    )
    settings = RenderSettings(
        num_encoding_fn_xyz=6, num_encoding_fn_dir=dir_fns,
        include_input_xyz=True, include_input_dir=True,
    )
    params = model.init(jax.random.PRNGKey(0))
    grid = np.asarray(
        make_sigma_grid_fn(model, settings, 5, (-1,) * 3, (1,) * 3, chunk=32)(params)
    )
    assert grid.shape == (5, 5, 5)
    assert np.all(np.isfinite(grid)) and np.all(grid >= 0)


# ---------------------------------------------------------------------------
# PLY round-trip
# ---------------------------------------------------------------------------


def test_ply_roundtrip(tmp_path):
    verts, faces = _sphere_mesh(res=9)
    colors = (np.arange(verts.shape[0] * 3).reshape(-1, 3) % 256).astype(np.uint8)
    normals = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    path = os.path.join(tmp_path, "mesh.ply")
    save_ply(path, verts, faces=faces, colors=colors, normals=normals)
    rv, rf, rc, rn = load_ply(path)
    np.testing.assert_array_equal(rv, verts)
    np.testing.assert_array_equal(rf, faces)
    np.testing.assert_array_equal(rc, colors)
    np.testing.assert_array_equal(rn, normals.astype(np.float32))


def test_turntable_preview_renders_the_sphere(tmp_path):
    """tools/render_ply_turntable.py frame: a centered sphere cloud must
    splat to a nonempty, roughly centered disk."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "render_ply_turntable",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "render_ply_turntable.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    verts, _ = _sphere_mesh(res=15)
    normals = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    colors = np.full((verts.shape[0], 3), 180, dtype=np.uint8)
    img = mod.render_frame(
        verts, colors, normals, 64,
        center=np.zeros(3), radius=3.0, az=45.0, el=30.0,
    )
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    nonwhite = img.min(axis=-1) < 240
    assert 0.02 < nonwhite.mean() < 0.9
    ys, xs = np.nonzero(nonwhite)
    assert abs(ys.mean() - 32) < 12 and abs(xs.mean() - 32) < 12


def test_ply_vertices_only(tmp_path):
    verts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "cloud.ply")
    save_ply(path, verts)
    rv, rf, rc, rn = load_ply(path)
    np.testing.assert_array_equal(rv, verts)
    assert rf is None and rc is None and rn is None


def test_normals_match_finite_differences():
    model, params, settings = _tiny_model_and_settings()
    from nerf_tpu.engine.geometry import (
        _apply_field,
        _field_settings,
        make_normals_query_fn,
    )

    pts = np.random.default_rng(3).uniform(-1, 1, size=(9, 3)).astype(np.float32)
    got = make_normals_query_fn(model, settings, chunk=16)(params, pts)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)

    s = _field_settings(settings)
    eps = 1e-3
    grads = np.zeros_like(pts)
    for axis in range(3):
        delta = np.zeros(3, np.float32)
        delta[axis] = eps
        hi = np.asarray(_apply_field(model, params, jnp.asarray(pts + delta), s))[:, 3]
        lo = np.asarray(_apply_field(model, params, jnp.asarray(pts - delta), s))[:, 3]
        grads[:, axis] = (hi - lo) / (2 * eps)
    want = -grads / np.maximum(
        np.linalg.norm(grads, axis=1, keepdims=True), 1e-12
    )
    np.testing.assert_allclose(got, want, atol=5e-3)
