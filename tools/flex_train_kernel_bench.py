"""On-chip adopt-or-retire measurement: fused FlexibleNeRF TRAINING kernels.

Companion to tools/flex_train_probe.py (which measured XLA fwd / fwd+bwd
and PROJECTED a custom-VJP at 1.05x/1.71x for the coarse/fine training
shapes): this measures the REAL custom-VJP pair (ops/pallas/flex_train.py)
against XLA autodiff at the production training shapes, plus gradient
numerics agreement on-chip.

    python -u tools/flex_train_kernel_bench.py

Prints one JSON line per shape. Results go to docs/PARITY.md
(width-128 custom-VJP decision row).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.renderer import RenderSettings, _eval_radiance_field
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops.pallas.flex_train import fused_flex_mlp_train

FLOP_PER_POINT_FWD = 2 * 83_840  # params (tools/flex_train_probe.py)


def best_of(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main(compute_dtype="bfloat16"):
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    settings = RenderSettings(
        num_coarse=64, num_fine=128, perturb=True, near=2.0, far=6.0,
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        compute_dtype=compute_dtype, use_pallas=False,
    )

    n = 1024
    key = jax.random.PRNGKey(1)
    viewdirs = jax.random.normal(key, (n, 3))
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)

    for s_samples in (64, 128):
        pts = jax.random.uniform(key, (n, s_samples, 3),
                                 minval=-1.2, maxval=1.2)
        flop_per_call = n * s_samples * FLOP_PER_POINT_FWD
        iters = max(8, int(4e12 / flop_per_call))

        def xla_loss(p, pts_, vd):
            return jnp.sum(
                _eval_radiance_field(model, p, pts_, vd, settings) ** 2
            )

        def fused_loss(p, pts_, vd):
            return jnp.sum(
                fused_flex_mlp_train(
                    p, pts_, vd, num_freq_xyz=10, num_freq_dir=4,
                    compute_dtype=compute_dtype,
                ) ** 2
            )

        def make_loop(grad_fn):
            @jax.jit
            def run(p, pts_, vd):
                def body(i, acc):
                    g = grad_fn(p, pts_ + i * 1e-6, vd)
                    return acc + sum(jnp.sum(x) for x in jax.tree.leaves(g))
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return run

        runs = {
            "xla_fwd_bwd": make_loop(jax.grad(xla_loss)),
            "fused_fwd_bwd": make_loop(jax.grad(fused_loss)),
        }
        rec = {"shape": f"({n}, {s_samples})", "iters": iters,
               "dtype": compute_dtype, "backend": jax.default_backend()}
        for name, run in runs.items():
            t0 = time.perf_counter()
            float(run(params, pts, viewdirs))  # compile + warm
            print(f"# {name} ({n},{s_samples}) compiled+warm in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            dt = best_of(lambda r=run: float(r(params, pts, viewdirs)))
            rec[name + "_us"] = round(dt / iters * 1e6, 1)
            rec[name + "_tflops"] = round(
                3.0 * flop_per_call / (dt / iters) / 1e12, 1
            )
        rec["fused_speedup"] = round(
            rec["xla_fwd_bwd_us"] / rec["fused_fwd_bwd_us"], 2
        )

        # On-chip gradient numerics: fused vs XLA autodiff, same loss.
        g1 = jax.grad(fused_loss)(params, pts, viewdirs)
        g2 = jax.grad(xla_loss)(params, pts, viewdirs)
        worst = 0.0
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = max(np.abs(b).max(), 1e-3)
            worst = max(worst, float(np.abs(a - b).max() / scale))
        rec["grad_worst_rel_diff"] = round(worst, 6)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    main()
