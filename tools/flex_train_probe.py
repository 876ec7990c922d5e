"""On-chip probe: FlexibleNeRF 4x128 fwd / fwd+bwd at TRAINING shapes.

The width-128 custom-VJP adopt-or-retire datum, re-measured with the
round-5 methodology. The round-2 retirement projected <=1.15x from a
fused-forward-only measurement (396 us vs XLA 468 us at training batch
sizes) plus a shape-bound argument for the backward; the width-256
PaperNeRF decision made the same projection (1.23-1.58x) and the BUILT
kernel pair then beat it (1.34-1.75x isolated, 1.73x end-to-end in the
production loop — BENCH_r05 stages). So the 128-wide retirement deserves
the same direct datum before the round closes: measure XLA fwd+bwd at the
flagship's training shape and project the custom-VJP ceiling from the
fused forward actually shipped in ops/pallas/mlp_t.py.

Measures, on the real chip, best-of-N with >=4 TFLOP of work per dispatch
(CLAUDE.md: per-call timing over the relay measures dispatch latency, not
device throughput — iterate inside one jitted fori_loop):

  1. XLA radiance-field forward (production eval path) at (1024, 64) and
     (1024, 128)
  2. XLA forward+backward (jax.grad wrt params of a scalar readout of the
     same forward) at the same shapes
  3. fused Pallas forward kernel (ops/pallas/mlp_t.py) at the same shapes

Projection rule (same as both earlier decisions): a custom-VJP training
kernel's best case is the fused forward + a Pallas backward running the
backward's ~2x-forward FLOPs at the SAME in-op rate as the fused forward.
projected_step = t_pallas_fwd * 3 vs measured XLA fwd+bwd; the whole train
step also carries sampling/compositing/Adam that neither path changes, so
the end-to-end ceiling is lower still.

    python -u tools/flex_train_probe.py

Results go to docs/PARITY.md (width-128 custom-VJP decision row).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_tpu.engine.renderer import RenderSettings, _eval_radiance_field
from nerf_tpu.models import FlexibleNeRFModel

# layer1 63*128 + 3 x 128*128 + fc_feat 128*128 + fc_alpha 128 +
# layers_dir[0] (27+128)*64 + fc_rgb 64*3 = 83,840 params (biases ~0.5%).
FLOP_PER_POINT_FWD = 2 * 83_840


def best_of(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    settings = RenderSettings(
        num_coarse=64, num_fine=128, perturb=True, near=2.0, far=6.0,
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        compute_dtype="bfloat16", use_pallas=False,
    )
    settings_pallas = RenderSettings(
        num_coarse=64, num_fine=128, perturb=True, near=2.0, far=6.0,
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
    )

    n = 1024
    key = jax.random.PRNGKey(1)
    viewdirs = jax.random.normal(key, (n, 3))
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)

    for s_samples in (64, 128):
        pts = jax.random.uniform(key, (n, s_samples, 3), minval=-1.2, maxval=1.2)
        flop_per_call = n * s_samples * FLOP_PER_POINT_FWD
        iters = max(8, int(4e12 / flop_per_call))  # >=4 TFLOP fwd per dispatch

        def xla_fwd(p, pts_, vd):
            return _eval_radiance_field(model, p, pts_, vd, settings)

        def pallas_fwd(p, pts_, vd):
            return _eval_radiance_field(model, p, pts_, vd, settings_pallas)

        def loss(p, pts_, vd):
            return jnp.sum(xla_fwd(p, pts_, vd) ** 2)

        grad_fn = jax.grad(loss)

        def make_loop(inner, reduce):
            @jax.jit
            def run(p, pts_, vd):
                def body(i, acc):
                    # Perturb the points per iteration so the runtime can't
                    # serve repeats from cache / CSE the loop body.
                    out = inner(p, pts_ + i * 1e-6, vd)
                    return acc + reduce(out)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return run

        runs = {
            "xla_fwd": make_loop(xla_fwd, jnp.sum),
            "pallas_fwd": make_loop(pallas_fwd, jnp.sum),
            # Reduce over EVERY grad leaf: reading only one leaf lets XLA
            # dead-code-eliminate the other layers' backward entirely.
            "xla_fwd_bwd": make_loop(
                grad_fn,
                lambda g: sum(jnp.sum(x) for x in jax.tree.leaves(g)),
            ),
        }
        rec = {"shape": f"({n}, {s_samples})", "iters": iters,
               "backend": jax.default_backend()}
        for name, run in runs.items():
            t0 = time.perf_counter()
            float(run(params, pts, viewdirs))  # compile + warm
            print(f"# {name} ({n},{s_samples}) compiled+warm in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            dt = best_of(lambda r=run: float(r(params, pts, viewdirs)))
            us = dt / iters * 1e6
            rec[name + "_us"] = round(us, 1)
            mult = 3.0 if name == "xla_fwd_bwd" else 1.0
            rec[name + "_tflops"] = round(
                mult * flop_per_call / (dt / iters) / 1e12, 1
            )
        rec["projected_custom_vjp_us"] = round(3.0 * rec["pallas_fwd_us"], 1)
        rec["projected_speedup_vs_xla"] = round(
            rec["xla_fwd_bwd_us"] / rec["projected_custom_vjp_us"], 2
        )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    main()
