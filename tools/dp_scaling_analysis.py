#!/usr/bin/env python3
"""Compiler-level DP scaling analysis over a virtual device mesh.

Wall-clock multi-chip scaling cannot be *measured* in this environment (one
real chip; the 8-device CPU mesh timeshares a single host core, so timings
are meaningless). What CAN be verified without a pod is the property that
determines scaling: what XLA actually compiles for each mesh size. This
tool AOT-compiles the production DP training loop
(``parallel.dp.make_parallel_train_loop`` — the same program
``train_nerf.py`` dispatches) for N = 1, 2, 4, 8 devices and reports, per N:

  * per-device FLOPs from ``compiled.cost_analysis()`` — DP is working iff
    this scales ~1/N (the ray work splits; only the replicated optimizer
    update and the gradient reduction stay constant);
  * the collective ops in the compiled HLO (count of all-reduce instrs) and
    the analytic per-step communication volume of the gradient pmean:
    a ring all-reduce moves 2·(N-1)/N · |grads| bytes per device;
  * a projected scaling efficiency on real ICI: compute time from the
    bench-recorded single-chip throughput, comm time from the ICI
    bandwidth (default 45 GB/s/link one-way, v5e; override --ici-gbps),
    efficiency = compute / (compute + unoverlapped comm). XLA typically
    overlaps the reduce with the tail of the backward, so this is a LOWER
    bound.

Run on the host CPU with virtual devices (no TPU claim — safe during relay
outages):

  python tools/dp_scaling_analysis.py [--steps 16] [--batch 1024]

Prints one human table + one machine-readable JSON line. The structural
assertions (per-device FLOP scaling, all-reduce presence) are CI-covered by
tests/test_parallel.py::test_dp_compiled_scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Virtual 8-device CPU mesh; must be configured BEFORE jax import / first
# device probe (CLAUDE.md hazards: a device probe during a relay outage
# blocks indefinitely; XLA_FLAGS is parsed at backend creation).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(mesh_size: int, batch: int, steps: int, store_rows: int = 4096):
    """Compile the DP train loop for an N-device mesh; return the evidence."""
    from nerf_tpu.engine.renderer import RenderSettings
    from nerf_tpu.engine.train import create_train_state, make_optimizer
    from nerf_tpu.models import FlexibleNeRFModel
    from nerf_tpu.parallel.dp import make_parallel_train_loop
    from nerf_tpu.parallel.mesh import make_mesh, shard_batch

    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=True,
        radiance_field_noise_std=0.2, white_background=True,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        compute_dtype="bfloat16",
    )
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    opt = make_optimizer("adam", 5e-3, 250.0, 0.1)
    state = create_train_state(model, model, opt, jax.random.PRNGKey(0))
    mesh = make_mesh(mesh_size)
    loop = make_parallel_train_loop(
        model, model, settings, opt, mesh, batch, steps
    )

    key = jax.random.PRNGKey(1)
    ro = jax.random.uniform(key, (store_rows, 3), minval=-1, maxval=1)
    rd = ro - jnp.array([0.0, 0.0, 1.5])
    tgt = jax.random.uniform(key, (store_rows, 3))
    ro, rd, tgt = shard_batch(mesh, ro, rd, tgt)

    compiled = loop.lower(state, ro, rd, tgt, jax.random.PRNGKey(2)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    hlo = compiled.as_text()

    grad_bytes = sum(
        leaf.size * 4
        for p in (state.params_coarse, state.params_fine)
        for leaf in jax.tree.leaves(p)
    )
    return {
        "devices": mesh_size,
        # cost_analysis reports the per-device program (SPMD): each device
        # runs the same executable on its shard.
        "per_device_gflops": float(cost.get("flops", 0.0)) / 1e9,
        "allreduce_instrs": hlo.count(" all-reduce("),
        "grad_bytes": grad_bytes,
        # ring all-reduce per-device traffic per STEP (the loop runs one
        # gradient pmean per step inside the scan)
        "allreduce_bytes_per_step": 2.0 * (mesh_size - 1) / mesh_size * grad_bytes,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024,
                    help="global ray batch (lego-lowres protocol)")
    ap.add_argument("--steps", type=int, default=16,
                    help="steps per compiled scan loop")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="one-way ICI bandwidth per chip, GB/s (v5e ~45)")
    ap.add_argument("--single-chip-rays-per-sec", type=float, default=395000.0,
                    help="bench-recorded bf16 train throughput (PARITY)")
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    rows = [analyze(n, args.batch, args.steps) for n in args.sizes]
    base = rows[0]["per_device_gflops"]

    # Weak scaling: each added chip brings its own args.batch rays, so
    # per-device compute time stays the single-chip step time and only the
    # gradient reduction is added.
    step_s = args.batch / args.single_chip_rays_per_sec
    print(f"{'N':>3} {'GFLOP/dev':>10} {'vs 1/N':>7} {'all-reduce':>10} "
          f"{'comm KB/step':>12} {'weak-scale eff':>14}")
    for r in rows:
        n = r["devices"]
        comm_s = r["allreduce_bytes_per_step"] / (args.ici_gbps * 1e9)
        eff = step_s / (step_s + comm_s)
        r["weak_scaling_efficiency_pct"] = round(100.0 * eff, 2)
        ratio = r["per_device_gflops"] / (base / n)
        r["per_device_flops_vs_ideal"] = round(ratio, 3)
        print(f"{n:>3} {r['per_device_gflops']:>10.1f} {ratio:>7.3f} "
              f"{r['allreduce_instrs']:>10} "
              f"{r['allreduce_bytes_per_step'] / 1024:>12.1f} "
              f"{r['weak_scaling_efficiency_pct']:>13.2f}%")
    print(json.dumps({"batch": args.batch, "steps": args.steps,
                      "ici_gbps": args.ici_gbps, "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
