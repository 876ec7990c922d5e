"""Procedural synthetic scene: an analytic radiance field rendered to images.

The reference repo ships no datasets, only pretrained checkpoints; its
integration story assumes downloaded blender/LLFF scenes. For hermetic tests
and demos we instead *define* a scene analytically (a soft emissive sphere
with a position-dependent color) and render ground-truth views with the same
volume renderer the models train against. A NeRF MLP can fit this field to
high PSNR in a few hundred steps, giving a fast, dataset-free convergence
test (the role tiny_nerf_data.npz plays for the reference's tiny_nerf.py:197).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rays import get_ray_bundle
from ..ops.sampling import coarse_z_values
from ..ops.volume import volume_render_radiance_field
from .poses import pose_spherical


def analytic_radiance_field(
    pts: jnp.ndarray, phase: float = 0.0, sphere_radius: float = 0.8
) -> jnp.ndarray:
    """Raw radiance field [r, g, b, sigma] at world points (pre-sigmoid / pre-relu).

    A soft sphere at the origin whose color is a smooth function of position
    — everything is C^1 so the MLP can fit it easily. ``phase`` and
    ``sphere_radius`` parameterize distinct scenes (multi-scene workloads).
    """
    r = jnp.linalg.norm(pts, axis=-1)
    sigma = 40.0 * (sphere_radius - r)  # >0 inside the sphere, relu clamps outside
    rgb = jnp.stack(
        [
            2.0 * jnp.sin(3.0 * pts[..., 0] + phase),
            2.0 * jnp.cos(3.0 * pts[..., 1] + phase),
            2.0 * jnp.sin(3.0 * pts[..., 2] + 1.0 + phase),
        ],
        axis=-1,
    )
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "num_samples", "white_background"),
)
def _render_analytic(
    pose, focal, near, far, phase, sphere_radius,
    height: int, width: int, num_samples: int, white_background: bool,
):
    """Jitted GT render with scene params as traced args — one compile covers
    every pose AND every (phase, sphere_radius) scene variant (Python-float
    scene params would otherwise bake into constants and recompile per scene,
    which is minutes of wall time under a remote-compile TPU runtime)."""
    ro, rd = get_ray_bundle(height, width, focal, pose)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    z = coarse_z_values(
        jnp.full(ro.shape[:1], near), jnp.full(ro.shape[:1], far), num_samples
    )
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    rf = analytic_radiance_field(pts, phase=phase, sphere_radius=sphere_radius)
    out = volume_render_radiance_field(rf, z, rd, white_background=white_background)
    return out.rgb.reshape(height, width, 3)


def render_analytic_image(
    height: int,
    width: int,
    focal: float,
    pose: np.ndarray,
    num_samples: int = 128,
    near: float = 2.0,
    far: float = 6.0,
    white_background: bool = True,
    phase: float = 0.0,
    sphere_radius: float = 0.8,
) -> np.ndarray:
    """Ground-truth render of the analytic field for one pose."""
    rgb = _render_analytic(
        jnp.asarray(pose, jnp.float32),
        jnp.float32(focal), jnp.float32(near), jnp.float32(far),
        jnp.float32(phase), jnp.float32(sphere_radius),
        height=height, width=width, num_samples=num_samples,
        white_background=white_background,
    )
    return np.asarray(rgb)


class SyntheticDataset(NamedTuple):
    images: np.ndarray       # (N, H, W, 3) float32 in [0, 1]
    poses: np.ndarray        # (N, 4, 4) float32
    hwf: tuple               # (H, W, focal)
    near: float
    far: float


def make_synthetic_dataset(
    num_views: int = 10,
    height: int = 32,
    width: int = 32,
    camera_angle_x: float = 0.6911112070083618,
    radius: float = 4.0,
    num_samples: int = 128,
    white_background: bool = True,
    phase: float = 0.0,
    sphere_radius: float = 0.8,
    seed: int = 1234,
) -> SyntheticDataset:
    """Multi-view dataset of the analytic scene (poses on a sphere)."""
    focal = 0.5 * width / np.tan(0.5 * camera_angle_x)
    rng = np.random.default_rng(seed)
    thetas = np.linspace(-180.0, 180.0, num_views, endpoint=False)
    phis = rng.uniform(-45.0, -15.0, num_views)
    poses = np.stack([pose_spherical(t, p, radius) for t, p in zip(thetas, phis)])
    images = np.stack(
        [
            render_analytic_image(
                height, width, focal, p, num_samples,
                white_background=white_background,
                phase=phase, sphere_radius=sphere_radius,
            )
            for p in poses
        ]
    )
    return SyntheticDataset(
        images.astype(np.float32), poses.astype(np.float32), (height, width, focal),
        2.0, 6.0,
    )


def flatten_rays(dataset: SyntheticDataset):
    """Expand every training view into a flat device-ready ray store.

    Returns (ray_origins, ray_directions, rgb_targets), each (N*H*W, 3)
    float32 numpy. This is the TPU-native replacement for the reference's
    per-iteration host-side ray generation (train_nerf.py:210-226).
    """
    h, w, focal = dataset.hwf
    origins, directions, targets = [], [], []
    for img, pose in zip(dataset.images, dataset.poses):
        ro, rd = get_ray_bundle(h, w, focal, jnp.asarray(pose))
        origins.append(np.asarray(ro).reshape(-1, 3))
        directions.append(np.asarray(rd).reshape(-1, 3))
        targets.append(img.reshape(-1, 3))
    return (
        np.concatenate(origins),
        np.concatenate(directions),
        np.concatenate(targets),
    )
