#!/usr/bin/env python3
"""MXU-width microbench: does a width-256 layer run efficiently enough to
pay for block-diagonal coarse+fine weight concatenation?

Context (VERDICT round 2, stretch item): the training roofline is set by
128-wide MLP matmuls running at ~33% of bf16 peak (docs/PARITY.md). One
untried lever was evaluating the coarse and fine stages as a single
width-256 weight-concatenated pass. The arithmetic: packing two independent
128-wide networks as one block-diagonal 256-wide network makes every hidden
matmul cost 256x256 MACs per point instead of 128x128 (every point pays for
both blocks, only its own diagonal block carries signal) — 4x the MACs — so
the pack only pays if a 256-wide matmul runs >4x more MACs/s than a
128-wide one, with that headroom persisting through the whole train step
(encode/composite/Adam are width-independent). This measures the actual
width scaling on-chip.

Timing method: the whole matmul chain is iterated inside ONE jitted
lax.fori_loop, so a single host dispatch amortizes ~10 TFLOP of device work
(per-dispatch relay latency is ~10-30 ms — a naive per-call timing loop
measures latency, not throughput; first attempt did exactly that and read
1.3 TFLOP/s for a 64 TFLOP/s op).

Run on the TPU chip: python tools/mxu_width_microbench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_width(width: int, layers: int = 8, reps: int = 3,
                target_tflop: float = 10.0):
    """MAC throughput (TFLOP/s) of `layers` chained (n, w) @ (w, w) bf16
    matmuls + relu (the shape class of the NeRF MLP trunk at production
    point-batch sizes), iterated on device until ~target_tflop of work."""
    n = 131072
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (n, width), jnp.bfloat16)
    ws = [
        jax.random.normal(jax.random.fold_in(key, i), (width, width),
                          jnp.bfloat16) / float(np.sqrt(width))
        for i in range(layers)
    ]
    flops_per_iter = 2.0 * n * width * width * layers
    iters = max(1, int(target_tflop * 1e12 / flops_per_iter))

    @jax.jit
    def run(x, ws):
        def body(_, x):
            for w in ws:
                x = jax.nn.relu(jnp.dot(x, w))
            # Renormalize cheaply so the relu chain neither underflows to a
            # constant nor overflows; one rsqrt-scale per iter is negligible
            # next to `layers` matmuls.
            return x * jax.lax.rsqrt(jnp.mean(jnp.square(
                x.astype(jnp.float32)))+ 1e-6).astype(jnp.bfloat16)

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x.astype(jnp.float32))

    float(run(x0, ws))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0, ws))  # scalar fetch fences the dispatch
        times.append(time.perf_counter() - t0)
    return flops_per_iter * iters / min(times) / 1e12


def main():
    import sys

    widths = tuple(int(a) for a in sys.argv[1:]) or (128, 256, 512)
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}",
          flush=True)
    results = {}
    for width in widths:
        tf = bench_width(width)
        results[width] = tf
        print(f"width {width:4d}: {tf:7.1f} TFLOP/s "
              f"({100 * tf / 197.0:.0f}% of v5e bf16 peak)", flush=True)
    if 128 in results and 256 in results:
        gain = results[256] / results[128]
        print(f"\n256-wide MAC-throughput gain over 128-wide: {gain:.2f}x; "
              f"block-diagonal coarse+fine packing quadruples the MACs per "
              f"useful FLOP, so it needs >4x to pay "
              f"-> {'MAYBE PAYS' if gain > 4 else 'DOES NOT PAY'}",
              flush=True)


if __name__ == "__main__":
    main()
