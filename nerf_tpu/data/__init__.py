"""Dataset loading (blender / LLFF / synthetic) and device-ready ray stores."""

from .blender import composite_white_background, load_blender_data
from .llff import llff_holdout_split, load_llff_data
from .poses import pose_spherical, spherical_render_poses
from .rays_store import (
    build_ray_store,
    is_reference_cache_dir,
    load_ray_cache,
    load_reference_cache_dir,
    save_ray_cache,
    shuffle_ray_store,
)
from .synthetic import (
    SyntheticDataset,
    analytic_radiance_field,
    flatten_rays,
    make_synthetic_dataset,
    render_analytic_image,
)

__all__ = [
    "composite_white_background",
    "load_blender_data",
    "llff_holdout_split",
    "load_llff_data",
    "pose_spherical",
    "spherical_render_poses",
    "build_ray_store",
    "is_reference_cache_dir",
    "load_ray_cache",
    "load_reference_cache_dir",
    "save_ray_cache",
    "shuffle_ray_store",
    "SyntheticDataset",
    "analytic_radiance_field",
    "flatten_rays",
    "make_synthetic_dataset",
    "render_analytic_image",
]
