"""On-chip measurement: fused PaperNeRF (8x256) kernel vs XLA at 800px.

The adopt-or-retire evidence for ops/pallas/paper_t.py (VERDICT r3 item 5):
full coarse+fine 64+64 render of one 800x800 frame through
engine.renderer's production path, Pallas vs XLA, bf16, plus raw-kernel
numerics agreement. Results go to docs/PARITY.md.

    python -u tools/paper_kernel_bench.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.data import pose_spherical
from nerf_tpu.engine.renderer import RenderSettings, make_image_render_fn
from nerf_tpu.models import PaperNeRFModel
from nerf_tpu.ops import get_ray_bundle

SIDE = 800


def main():
    model = PaperNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    # Opacify so the frame has structure (same rationale as the bench
    # guard). PaperNeRF needs a stronger push than the Flexible recipe:
    # alpha reads the un-ReLU'd fc_feat output of an 8-layer trunk, so
    # x3/+2 still renders empty (acc ~ 5e-7, measured) and the comparison
    # would saturate; x2/+10 gives acc = 1.0 with rgb std 0.04.
    params = jax.tree.map(lambda x: x * 2.0, params)
    params["fc_alpha"]["bias"] = params["fc_alpha"]["bias"] + 10.0

    focal = 0.5 * SIDE / np.tan(0.5 * 0.6911112070083618)
    pose = jnp.asarray(pose_spherical(45.0, -30.0, 4.0))
    ro, rd = get_ray_bundle(SIDE, SIDE, focal, pose)

    rgb = {}
    for use_pallas in (True, False):
        settings = RenderSettings(
            num_coarse=64, num_fine=64, perturb=False, white_background=True,
            near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
            compute_dtype="bfloat16", use_pallas=use_pallas,
            chunksize=SIDE * SIDE if use_pallas else 65536,
        )
        fn = make_image_render_fn(model, model, settings)
        out = fn(params, params, ro, rd)
        rgb[use_pallas] = np.asarray(out["rgb_fine"], dtype=np.float64)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(params, params, ro, rd)
            float(jnp.sum(out["rgb_fine"]))  # device-side fence
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        # FLOP accounting: PaperNeRF fwd ~= 2 * 628k params-equivalent MACs
        # per point: layer0 63*256 + 7x256^2 + skip-extra 63*256 + fc_feat
        # 256^2 + alpha 256 + dir0 (256+27)*128 + 2x128^2 + rgb 128*3.
        flop_per_point = 2 * (
            63 * 256 + 7 * 256 * 256 + 63 * 256 + 256 * 256 + 256
            + (256 + 27) * 128 + 2 * 128 * 128 + 128 * 3
        )
        pts = SIDE * SIDE * (64 + 128)  # coarse 64 + fine 64+64
        tflops = pts * flop_per_point / (ms / 1e3) / 1e12
        print(json.dumps({
            "path": "pallas" if use_pallas else "xla",
            "ms_per_frame": round(ms, 1),
            "rays_per_sec": round(SIDE * SIDE / (ms / 1e3), 0),
            "in_op_tflops": round(tflops, 1),
        }), flush=True)

    mse = float(np.mean((rgb[True] - rgb[False]) ** 2))
    print(json.dumps({
        "pallas_vs_xla_psnr_db": round(-10.0 * np.log10(max(mse, 1e-12)), 1)
    }), flush=True)


if __name__ == "__main__":
    main()
