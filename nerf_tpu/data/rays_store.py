"""Device-resident ray stores + the offline ray-cache format.

Behavioral parity target (reference: krrish94/nerf-pytorch):
  - ``cache_dataset.py:16-135`` (cache_nerf_dataset) — precompute ray bundles
    + targets for fast training.

TPU-native redesign: instead of one small ``torch.save`` dict per image per
variation (with the reference's overwrite bug, cache_dataset.py:112-114 — all
``num_variations`` files collapse onto one path), the cache is a SINGLE
``.npz`` of flat, statically-shaped arrays:

    ray_origins (N, 3) | ray_directions (N, 3) | targets (N, 3)  float32
    + meta (height, width, focal, near, far)

covering every training pixel. That layout uploads to HBM in one transfer,
shards cleanly over a device mesh, and lets the jitted train step gather ray
batches on-device (engine.train.sample_ray_batch) with zero per-step host
work — the whole point of caching. Validation images are stored separately
with their poses so full-image validation can regenerate per-view bundles.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.rays import get_ray_bundle


def build_ray_store(
    images: np.ndarray,
    poses: np.ndarray,
    height: int,
    width: int,
    focal: float,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand (N,H,W,3) images + (N,4,4)/(N,3,4+) poses into flat ray arrays.

    Returns (ray_origins, ray_directions, targets), each (N*H*W, 3) float32.
    Uses the threaded C++ builder (nerf_tpu.native) when available; the jnp
    path below is the executable spec it must match.
    """
    if use_native:
        from .. import native  # noqa: PLC0415

        if native.available():
            poses34 = np.stack([np.asarray(p)[:3, :4] for p in poses])
            ro, rd, rgb = native.build_ray_store_native(
                poses34, np.asarray(images), height, width, focal
            )
            return ro, rd, rgb

    origins, directions, targets = [], [], []
    for img, pose in zip(images, poses):
        c2w = jnp.asarray(pose[:3, :4], jnp.float32)
        ro, rd = get_ray_bundle(height, width, focal, c2w)
        origins.append(np.asarray(ro).reshape(-1, 3))
        directions.append(np.asarray(rd).reshape(-1, 3))
        targets.append(np.asarray(img[..., :3], np.float32).reshape(-1, 3))
    return (
        np.concatenate(origins).astype(np.float32),
        np.concatenate(directions).astype(np.float32),
        np.concatenate(targets).astype(np.float32),
    )


def shuffle_ray_store(
    ray_origins: np.ndarray,
    ray_directions: np.ndarray,
    targets: np.ndarray,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One host-side permutation applied consistently to all three arrays.

    Prerequisite for the ``sliced`` ray-sampling mode
    (engine.train.sample_ray_batch): a contiguous window of a shuffled store
    is an unbiased ray batch, whereas a window of the image-ordered store
    built above is a correlated scanline. Done once at startup; the
    permutation is seed-deterministic so resumed runs see the same order.
    """
    perm = np.random.default_rng(seed).permutation(ray_origins.shape[0])
    return ray_origins[perm], ray_directions[perm], targets[perm]


def save_ray_cache(
    path: str,
    ray_origins: np.ndarray,
    ray_directions: np.ndarray,
    targets: np.ndarray,
    meta: Dict,
    val_images: Optional[np.ndarray] = None,
    val_poses: Optional[np.ndarray] = None,
) -> None:
    """Write the single-file ray cache (.npz + json-encoded meta)."""
    arrays = {
        "ray_origins": ray_origins.astype(np.float32),
        "ray_directions": ray_directions.astype(np.float32),
        "targets": targets.astype(np.float32),
        "meta_json": np.frombuffer(
            json.dumps(meta, sort_keys=True).encode(), dtype=np.uint8
        ),
    }
    if val_images is not None:
        arrays["val_images"] = val_images.astype(np.float32)
        arrays["val_poses"] = val_poses.astype(np.float32)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    # np.savez appends .npz to the temp name it opens; normalize.
    os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)


def is_reference_cache_dir(path: str) -> bool:
    """True when ``path`` is a reference-format cache directory: a dir whose
    ``train/`` subdir holds per-image ``*.data`` torch.save files (written by
    reference ``cache_dataset.py:73-115``)."""
    train_dir = os.path.join(path, "train")
    if not os.path.isdir(train_dir):
        return False
    return any(name.endswith(".data") for name in os.listdir(train_dir))


def load_reference_cache_dir(path: str):
    """Ingest a reference-format ray-cache directory into the flat ray store.

    Behavioral parity target: the reference's cachedir training path
    (``train_nerf.py:175-193``) consumes ``train/*.data`` files written by
    ``cache_dataset.py:73-115`` — each a ``torch.save`` dict with keys
    ``height``/``width``/``focal_length``/``ray_bundle`` (2, ..., 3) /
    ``target`` (..., 3 or 4). Files are parsed torch-free via
    ``engine.torch_reader``.

    Note the reference's variation-overwrite bug (``cache_dataset.py:112-114``:
    the per-variation save path is unconditionally clobbered with the
    per-image path), so every image contributes exactly one ``.data`` file;
    ingest reads each file once — a cache produced by any reference
    invocation yields no duplicate rays here. Nested per-variation files
    (the dead ``NNNN/NNNN/.data`` layout) are also swept up if present.

    Returns ``(ray_origins, ray_directions, targets, meta, extras)`` with the
    same contract as :func:`load_ray_cache`; ``extras`` is empty (the
    reference cache stores val/test as ray bundles without poses, so
    full-image validation cannot be reconstructed from it).
    """
    from ..engine.torch_reader import load_torch_file  # noqa: PLC0415

    train_dir = os.path.join(path, "train")
    files = sorted(
        os.path.join(root, name)
        for root, _dirs, names in os.walk(train_dir)
        for name in names
        if name.endswith(".data")
    )
    if not files:
        raise FileNotFoundError(
            f"no .data files under {train_dir} (not a reference cache dir?)"
        )
    origins, directions, targets = [], [], []
    meta = None
    for fname in files:
        d = load_torch_file(fname)
        bundle = np.asarray(d["ray_bundle"], np.float32)
        origins.append(bundle[0].reshape(-1, 3))
        directions.append(bundle[1].reshape(-1, 3))
        targets.append(
            np.asarray(d["target"], np.float32)[..., :3].reshape(-1, 3)
        )
        if meta is None:
            meta = {
                "height": int(d["height"]),
                "width": int(d["width"]),
                "focal": float(d["focal_length"]),
            }
    return (
        np.concatenate(origins),
        np.concatenate(directions),
        np.concatenate(targets),
        meta,
        {},
    )


def load_ray_cache(path: str):
    """Load a ray cache. Returns (ray_origins, ray_directions, targets, meta, extras)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta_json"]).decode())
        extras = {}
        if "val_images" in data:
            extras["val_images"] = data["val_images"]
            extras["val_poses"] = data["val_poses"]
        return (
            data["ray_origins"],
            data["ray_directions"],
            data["targets"],
            meta,
            extras,
        )
