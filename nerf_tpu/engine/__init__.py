"""Engine: hierarchical renderer, training step, checkpointing."""

from .checkpoint import (
    convert_torch_state_dict,
    export_reference_checkpoint,
    latest_checkpoint,
    load_checkpoint,
    load_reference_checkpoint,
    save_checkpoint,
    to_torch_state_dict,
)
from .pose_opt import (
    PoseOptState,
    init_pose_opt_state,
    make_photometric_loss_fn,
    make_pose_opt_loop,
    make_pose_opt_step,
    perturb_poses,
    pose_errors,
    twists_to_poses,
)
from .renderer import (
    RayRenderResult,
    RenderSettings,
    make_image_render_fn,
    make_pose_render_fn,
    make_render_fn,
    render_rays,
)
from .train import (
    StepMetrics,
    TrainState,
    create_train_state,
    exponential_lr_schedule,
    make_optimizer,
    make_train_step,
    sample_ray_batch,
)

__all__ = [
    "convert_torch_state_dict",
    "export_reference_checkpoint",
    "latest_checkpoint",
    "load_checkpoint",
    "load_reference_checkpoint",
    "save_checkpoint",
    "to_torch_state_dict",
    "PoseOptState",
    "init_pose_opt_state",
    "make_photometric_loss_fn",
    "make_pose_opt_loop",
    "make_pose_opt_step",
    "perturb_poses",
    "pose_errors",
    "twists_to_poses",
    "RayRenderResult",
    "RenderSettings",
    "make_image_render_fn",
    "make_pose_render_fn",
    "make_render_fn",
    "render_rays",
    "StepMetrics",
    "TrainState",
    "create_train_state",
    "exponential_lr_schedule",
    "make_optimizer",
    "make_train_step",
    "sample_ray_batch",
]
