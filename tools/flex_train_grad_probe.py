"""On-chip diagnostic: leaf-wise fused-vs-XLA gradient ratios for
ops/pallas/flex_train.py across tile layouts (g_r ray tiles x g_s sample
chunks), isolating which accumulator misbehaves on real Mosaic.

    python -u tools/flex_train_grad_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.renderer import RenderSettings, encode_points
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops.pallas.flex_train import fused_flex_mlp_train


def main():
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    st = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)

    # (n, s): g_r = ceil(n/128), g_s = s / s_tile (f32 cap 4).
    for n, s in ((128, 4), (129, 4), (256, 4), (128, 8), (256, 8)):
        key = jax.random.PRNGKey(11)
        pts = jax.random.uniform(key, (n, s, 3), minval=-1.3, maxval=1.3)
        vd = jax.random.normal(jax.random.PRNGKey(12), (n, 3))
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
        cot = jax.random.normal(jax.random.PRNGKey(13), (n, s, 4))

        g_fused = jax.jit(jax.grad(
            lambda p: jnp.sum(fused_flex_mlp_train(p, pts, vd,
                                                   num_freq_xyz=10) * cot)
        ))(params)
        with jax.default_matmul_precision("highest"):
            g_xla = jax.jit(jax.grad(
                lambda p: jnp.sum(model.apply(p, encode_points(pts, vd, st))
                                  * cot)
            ))(params)

        print(f"--- n={n} s={s}", flush=True)
        ff, _ = jax.tree_util.tree_flatten_with_path(g_fused)
        fx, _ = jax.tree_util.tree_flatten_with_path(g_xla)
        for (path, a), (_, b) in zip(ff, fx):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = max(np.abs(b).max(), 1e-3)
            rel = np.abs(a - b).max() / scale
            # Ratio of dot products: ~2.0 = double-counted, ~1.0 = healthy.
            denom = float(np.vdot(b, b)) or 1.0
            ratio = float(np.vdot(a, b)) / denom
            print(f"{jax.tree_util.keystr(path):40s} relmax={rel:9.2e} "
                  f"ratio={ratio:7.4f}", flush=True)


if __name__ == "__main__":
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    main()
