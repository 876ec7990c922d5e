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
    """Unlike torch.load(weights_only=False), the restricted unpicklers
    reject non-whitelisted globals WITHOUT executing them — in both the
    header-pickle position and the object-pickle position."""
    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os as _os

            return (_os.system, (f"touch {marker}",))

    # (a) malicious FIRST pickle (the legacy header position)
    path = str(tmp_path / "evil_header.ckpt")
    with open(path, "wb") as f:
        pickle.dump(Evil(), f)
    with pytest.raises(pickle.UnpicklingError):
        load_torch_file(path)
    assert not marker.exists(), "header unpickler executed a payload"

    # (b) valid framing, malicious object pickle
    path2 = str(tmp_path / "evil_obj.ckpt")
    with open(path2, "wb") as f:
        pickle.dump(0x1950A86A20F9469CFC6C, f)
        pickle.dump(1001, f)
        pickle.dump({"protocol_version": 1001}, f)
        pickle.dump(Evil(), f)
    with pytest.raises(pickle.UnpicklingError):
        load_torch_file(path2)
    assert not marker.exists(), "object unpickler executed a payload"


def test_reader_rejects_truncated_file(tmp_path):
    """A legacy file cut mid-storage raises instead of returning a tensor
    backed by out-of-bounds memory."""
    import torch

    src = PRETRAINED[0] if PRETRAINED else None
    if src is None:
        path_full = str(tmp_path / "full.ckpt")
        torch.save(
            {"w": torch.arange(64, dtype=torch.float32)}, path_full,
            _use_new_zipfile_serialization=False,
        )
        src = path_full
    import struct

    blob = open(src, "rb").read()
    path = str(tmp_path / "trunc.ckpt")
    with open(path, "wb") as f:
        f.write(blob[: len(blob) - max(64, len(blob) // 10)])
    # Depending on where the cut lands: truncated-storage UnpicklingError,
    # EOF inside a pickle, or a short struct read — never silent success.
    with pytest.raises((pickle.UnpicklingError, EOFError, struct.error)):
        load_torch_file(path)
