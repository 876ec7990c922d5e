"""Standalone torch-file reader vs torch.load: bit-for-bit over every
shipped pretrained checkpoint, plus the zip-format path via a fresh
torch.save, plus the safety property (arbitrary pickled code is refused)."""

import glob
import os
import pickle

import numpy as np
import pytest

from nerf_tpu.engine.torch_reader import load_torch_file

PRETRAINED = sorted(glob.glob("/root/reference/pretrained/*/checkpoint*.ckpt"))


def _assert_same(a, b, path=""):
    import torch

    if isinstance(b, torch.Tensor):
        np.testing.assert_array_equal(
            np.asarray(a), b.detach().numpy(), err_msg=path
        )
    elif isinstance(b, dict):
        assert sorted(a.keys()) == sorted(b.keys()), path
        for k in b:
            _assert_same(a[k], b[k], f"{path}.{k}")
    elif isinstance(b, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_same(x, y, f"{path}[{i}]")
    else:
        assert a == b, (path, a, b)


@pytest.mark.skipif(not PRETRAINED, reason="pretrained checkpoints absent")
def test_reader_matches_torch_on_all_pretrained():
    import torch

    for path in PRETRAINED:
        ours = load_torch_file(path)
        theirs = torch.load(path, map_location="cpu", weights_only=False)
        _assert_same(ours, theirs, os.path.basename(os.path.dirname(path)))


def test_reader_zip_format_roundtrip(tmp_path):
    """torch >= 1.6 writes zip archives; our own exports go through
    torch.save, so the zip path must read back what torch wrote."""
    import torch

    obj = {
        "iter": 7,
        "state": {
            "w": torch.arange(12, dtype=torch.float32).reshape(3, 4) / 7,
            "b": torch.tensor([1.5, -2.5], dtype=torch.float64),
            "flags": torch.tensor([True, False]),
            "ids": torch.tensor([3, 1, 2], dtype=torch.int64),
        },
        "note": "hello",
        "loss": 0.25,
    }
    path = str(tmp_path / "zipfmt.ckpt")
    torch.save(obj, path)
    ours = load_torch_file(path)
    _assert_same(ours, torch.load(path, map_location="cpu", weights_only=False))
    assert ours["state"]["w"].dtype == np.float32


def test_reader_non_contiguous_tensor(tmp_path):
    """Stride metadata is honored (a transposed view saves non-contiguously
    in legacy-style rebuilds; torch.save stores the underlying storage)."""
    import torch

    t = torch.arange(12, dtype=torch.float32).reshape(3, 4).t()
    path = str(tmp_path / "stride.ckpt")
    torch.save({"t": t}, path)
    ours = load_torch_file(path)
    np.testing.assert_array_equal(ours["t"], t.numpy())


def test_reader_refuses_arbitrary_code(tmp_path):
    """Unlike torch.load(weights_only=False), the restricted unpickler
    rejects non-whitelisted globals instead of executing them."""
    path = str(tmp_path / "evil.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"x": eval}, f)  # pickles builtins.eval by reference
    with pytest.raises((pickle.UnpicklingError, Exception)):
        load_torch_file(path)
