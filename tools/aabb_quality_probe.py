"""AABB-tightening quality/speed probe across scenes and taus (real TPU).

Reproduces the PARITY "AABB-tightened sampling" protocol on any blender
pretrained checkpoint: render the 64+64 production output as the quality
target, then measure tightened/untightened reduced-sample renders against
it, sweeping tau. Backs the two-scene validation + tau-selection heuristic
recorded in docs/PARITY.md.

    python -u tools/aabb_quality_probe.py lego ship
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
from nerf_tpu.engine import density_aabb
from nerf_tpu.engine.checkpoint import load_reference_checkpoint
from nerf_tpu.engine.renderer import RenderSettings, make_render_fn
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops import get_ray_bundle

SIDE = 400
POSES = [(45.0, -30.0), (160.0, -40.0)]


def render(model, pc, pf, settings, rays):
    fn = make_render_fn(model, model, settings)
    imgs = []
    for ro, rd in rays:
        out = fn(pc, pf, ro, rd)
        imgs.append(np.asarray(out.fine.rgb, dtype=np.float64))
    return imgs


def timed(model, pc, pf, settings, rays, reps=3):
    fn = make_render_fn(model, model, settings)
    ro, rd = rays[0]
    np.asarray(fn(pc, pf, ro, rd).fine.rgb)  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(pc, pf, ro, rd)
        float(jnp.sum(out.fine.rgb))  # device-side fence, no big fetch
        times.append(time.perf_counter() - t0)
    return min(times)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def probe_scene(scene: str, taus=(0.5, 2.0, 8.0)):
    import glob
    path = sorted(glob.glob(
        f"/root/reference/pretrained/{scene}-lowres/checkpoint*.ckpt"
    ))[-1]
    ckpt = load_reference_checkpoint(path)
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    pc = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    pf = jax.tree.map(jnp.asarray, ckpt["params_fine"])

    focal = 0.5 * SIDE / np.tan(0.5 * 0.6911112070083618)
    rays = []
    for th, ph in POSES:
        ro, rd = get_ray_bundle(
            SIDE, SIDE, focal, jnp.asarray(pose_spherical(th, ph, 4.0))
        )
        rays.append((ro.reshape(-1, 3), rd.reshape(-1, 3)))

    base = RenderSettings(
        num_coarse=64, num_fine=64, perturb=False, white_background=True,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        compute_dtype="bfloat16", use_pallas=True, chunksize=SIDE * SIDE,
    )
    target = render(model, pc, pf, base, rays)

    def report(tag, settings):
        imgs = render(model, pc, pf, settings, rays)
        ms = timed(model, pc, pf, settings, rays) * 1e3
        ps = [psnr(a, b) for a, b in zip(imgs, target)]
        print(json.dumps({
            "scene": scene, "variant": tag,
            "psnr_db_vs_64_64": [round(p, 2) for p in ps],
            "ms_per_frame": round(ms, 1),
        }), flush=True)

    half = dataclasses.replace(base, num_coarse=32, num_fine=32)
    report("untightened_32_32", half)
    for tau in taus:
        box = density_aabb(model, pc, base, tau=tau)
        print(json.dumps({
            "scene": scene, "tau": tau,
            "box": [round(float(v), 2) for v in box],
        }), flush=True)
        report(f"tightened_32_32_tau{tau}",
               dataclasses.replace(half, aabb=box))
    box = density_aabb(model, pc, base, tau=2.0)
    report("tightened_64_64_tau2.0", dataclasses.replace(base, aabb=box))


if __name__ == "__main__":
    for scene in sys.argv[1:] or ["ship"]:
        probe_scene(scene)
