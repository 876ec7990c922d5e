#!/usr/bin/env python3
"""Tile-size sweep for the feature-major fused encode+MLP render kernel.

The production kernel (ops/pallas/mlp_t.py) streams rays_per_tile=128 rays
(x samples) per grid step. The MXU-chain microbench (mxu_width_microbench)
shows VMEM-resident 128-wide chains sustaining ~111 TFLOP/s vs the kernel's
measured ~65 TFLOP/s, so grid/tile overhead may still be on the table.
This sweeps the tile size on a production-shaped batch (fine stage: 128
samples/ray) and prints MLP points/s + effective TFLOP/s per tile size.

Result (v5e, 2026-08-17): tile 128 = 75.8 ms = 442.7 M pts/s =
73.9 TFLOP/s (38% peak); tiles 256/512/1024 all fail Mosaic compilation
(the per-tile activation working set at 128 samples/ray overflows VMEM).
The production default is already the largest compilable tile; the
remaining gap to the 111 TF/s matmul-chain bound is the kernel's VPU
encode/composite work, not grid/tile overhead. See docs/PARITY.md.

Run on the TPU chip: python -u tools/mlp_tile_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FLOPS_PER_POINT = 167e3  # ~83k params x 2 (docs/PARITY.md MFU accounting)


def main():
    from nerf_tpu.models import FlexibleNeRFModel
    from nerf_tpu.ops.pallas.mlp_t import fused_mlp_t

    print(f"backend={jax.default_backend()}", flush=True)
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    n, s = 262144, 128  # fine-stage shape class of an 800px render chunk
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (n, s, 3), minval=-2, maxval=2)
    vd = jax.random.normal(key, (n, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    for tile in (128, 256, 512, 1024):
        f = jax.jit(lambda p, pts, vd, t=tile: jnp.sum(
            fused_mlp_t(p, pts, vd, rays_per_tile=t,
                        compute_dtype="bfloat16")))
        try:
            float(f(params, pts, vd))  # compile + warm
        except Exception as e:  # noqa: BLE001 - Mosaic may reject a shape
            print(f"tile {tile:5d}: FAILED {e!r}"[:200], flush=True)
            continue
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(params, pts, vd))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        pps = n * s / dt
        tf = pps * FLOPS_PER_POINT / 1e12
        print(f"tile {tile:5d}: {dt * 1e3:7.1f} ms  {pps / 1e6:7.1f} M pts/s"
              f"  {tf:6.1f} TFLOP/s ({100 * tf / 197:.0f}% peak)", flush=True)


if __name__ == "__main__":
    main()
