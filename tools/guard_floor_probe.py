"""One-off probe: pin the Pallas-vs-XLA bf16 agreement floor across fields.

Reconciles the bench guard reading (opacified random field) with the
trained-checkpoint kernel agreement (the quantity PARITY's AABB section
calls "the bf16 kernel-numerics floor"). Run on the real TPU chip:

    python -u tools/guard_floor_probe.py

Prints one JSON line per protocol variant.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.data import pose_spherical
from nerf_tpu.engine.checkpoint import load_reference_checkpoint
from nerf_tpu.engine.renderer import RenderSettings, make_render_fn
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops import get_ray_bundle


def pallas_vs_xla_psnr(pc, pf, side=128, seed_pose=(45.0, -30.0)):
    focal = 0.5 * side / np.tan(0.5 * 0.6911112070083618)
    pose = jnp.asarray(pose_spherical(seed_pose[0], seed_pose[1], 4.0))
    ro, rd = get_ray_bundle(side, side, focal, pose)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    rgb = {}
    for use_pallas in (True, False):
        settings = RenderSettings(
            num_coarse=64, num_fine=64, perturb=False, white_background=True,
            near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
            compute_dtype="bfloat16", use_pallas=use_pallas,
        )
        out = make_render_fn(model, model, settings)(pc, pf, ro, rd)
        rgb[use_pallas] = np.asarray(out.fine.rgb, dtype=np.float64)
    mse = float(np.mean((rgb[True] - rgb[False]) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def opacify(p, scale=3.0, bias=2.0):
    p = jax.tree.map(lambda x: x * scale, p)
    p["fc_alpha"]["bias"] = p["fc_alpha"]["bias"] + bias
    return p


def main():
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)

    # 1. The bench guard's exact protocol (opacified random init).
    pc = opacify(model.init(jax.random.PRNGKey(0)))
    pf = opacify(model.init(jax.random.PRNGKey(1)))
    print(json.dumps({"variant": "guard_random_opacified_seed01",
                      "psnr_db": round(pallas_vs_xla_psnr(pc, pf), 2)}),
          flush=True)

    # 2. Same protocol, different seeds (spread of the random-field floor).
    for s in (2, 4):
        pc = opacify(model.init(jax.random.PRNGKey(s)))
        pf = opacify(model.init(jax.random.PRNGKey(s + 1)))
        print(json.dumps({"variant": f"guard_random_opacified_seed{s}{s+1}",
                          "psnr_db": round(pallas_vs_xla_psnr(pc, pf), 2)}),
              flush=True)

    # 3. Trained lego checkpoint — the field PARITY's 40.7 dB was seen on.
    ckpt = load_reference_checkpoint(
        "/root/reference/pretrained/lego-lowres/checkpoint199999.ckpt"
    )
    pc = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    pf = jax.tree.map(jnp.asarray, ckpt["params_fine"])
    for side in (128, 400):
        print(json.dumps({"variant": f"trained_lego_{side}px",
                          "psnr_db": round(
                              pallas_vs_xla_psnr(pc, pf, side=side), 2)}),
              flush=True)
    # 4. Trained checkpoint, second pose (view dependence of the floor).
    print(json.dumps({"variant": "trained_lego_128px_pose2",
                      "psnr_db": round(pallas_vs_xla_psnr(
                          pc, pf, seed_pose=(120.0, -45.0)), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
