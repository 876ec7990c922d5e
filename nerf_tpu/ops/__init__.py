"""Core ray / encoding / sampling / rendering ops (pure jnp, jit-safe)."""

from .encoding import (
    encoding_dim,
    frequency_bands,
    get_embedding_function,
    positional_encoding,
)
from .math import cumprod_exclusive, img2mse, mse2psnr
from .rays import get_ray_bundle, meshgrid_xy, ndc_rays, ray_aabb_interval
from .sampling import (
    coarse_z_values,
    perturb_z_values,
    sample_pdf,
    searchsorted_right,
)
from .volume import RenderOutputs, volume_render_radiance_field

__all__ = [
    "encoding_dim",
    "frequency_bands",
    "get_embedding_function",
    "positional_encoding",
    "cumprod_exclusive",
    "img2mse",
    "mse2psnr",
    "get_ray_bundle",
    "meshgrid_xy",
    "ndc_rays",
    "ray_aabb_interval",
    "coarse_z_values",
    "perturb_z_values",
    "sample_pdf",
    "searchsorted_right",
    "RenderOutputs",
    "volume_render_radiance_field",
]
