"""Device-mesh parallelism: ray/data-parallel training + rendering,
multi-host initialization."""

from .distributed import is_primary, maybe_initialize_distributed
from .dp import (
    make_parallel_image_render_fn,
    make_parallel_pose_render_fn,
    make_parallel_render_fn,
    make_parallel_train_loop,
    make_parallel_train_step,
)
from .geometry import make_parallel_sigma_grid_fn
from .multiscene import (
    make_parallel_multiscene_train_loop,
    make_parallel_multiscene_train_step,
    shard_multiscene_stores,
)
from .pose_dp import make_parallel_joint_train_loop, make_parallel_pose_opt_loop
from .mesh import (
    DATA_AXIS,
    data_sharding,
    make_mesh,
    pad_to_devices,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "data_sharding",
    "is_primary",
    "make_mesh",
    "maybe_initialize_distributed",
    "pad_to_devices",
    "replicate_tree",
    "replicated",
    "shard_batch",
    "make_parallel_image_render_fn",
    "make_parallel_pose_render_fn",
    "make_parallel_render_fn",
    "make_parallel_train_loop",
    "make_parallel_train_step",
    "make_parallel_joint_train_loop",
    "make_parallel_multiscene_train_loop",
    "make_parallel_multiscene_train_step",
    "make_parallel_pose_opt_loop",
    "make_parallel_sigma_grid_fn",
    "shard_multiscene_stores",
]
