"""Ray generation and reparameterization.

Behavioral parity targets (reference: krrish94/nerf-pytorch):
  - ``meshgrid_xy``    -> nerf/nerf_helpers.py:28
  - ``get_ray_bundle`` -> nerf/nerf_helpers.py:67 (pinhole camera rays from a c2w pose)
  - ``ndc_rays``       -> nerf/nerf_helpers.py:170 (LLFF forward-facing NDC projection)

TPU notes: ray generation is pure broadcast arithmetic — it jits into a single
fused elementwise kernel. ``get_ray_bundle`` is jit/vmap friendly so a batch of
poses can be expanded into rays entirely on-device (the reference does this
per-image on the host).
"""

from __future__ import annotations

import jax.numpy as jnp


def meshgrid_xy(tensor1: jnp.ndarray, tensor2: jnp.ndarray):
    """np.meshgrid(..., indexing="xy") semantics (reference nerf/nerf_helpers.py:28-40)."""
    ii, jj = jnp.meshgrid(tensor1, tensor2, indexing="xy")
    return ii, jj


def get_ray_bundle(
    height: int,
    width: int,
    focal_length,
    tform_cam2world: jnp.ndarray,
):
    """One ray per pixel of an ``height x width`` image for pose ``tform_cam2world``.

    Pixel ``(row j, col i)`` maps to camera-frame direction
    ``((i - W/2)/f, -(j - H/2)/f, -1)`` rotated into the world frame
    (reference nerf/nerf_helpers.py:89-110).

    Returns:
      ray_origins:    (H, W, 3) — broadcast camera center.
      ray_directions: (H, W, 3) — un-normalized world-frame directions.
    """
    dtype = tform_cam2world.dtype
    ii, jj = meshgrid_xy(
        jnp.arange(width, dtype=dtype), jnp.arange(height, dtype=dtype)
    )
    directions = jnp.stack(
        [
            (ii - width * 0.5) / focal_length,
            -(jj - height * 0.5) / focal_length,
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )
    ray_directions = jnp.sum(
        directions[..., None, :] * tform_cam2world[:3, :3], axis=-1
    )
    ray_origins = jnp.broadcast_to(tform_cam2world[:3, -1], ray_directions.shape)
    return ray_origins, ray_directions


def ndc_rays(height, width, focal_length, near, rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Shift ray origins to the near plane and project into NDC space.

    Used for LLFF forward-facing scenes (reference nerf/nerf_helpers.py:170-197).
    """
    # Shift ray origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (width / (2.0 * focal_length)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (height / (2.0 * focal_length)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (
        -1.0
        / (width / (2.0 * focal_length))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (height / (2.0 * focal_length))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
