"""Standalone reader for ``torch.save`` files — no torch import required.

SURVEY.md §7 "hard parts" calls for reading the reference's ``.ckpt``
checkpoints "without torch at runtime". Beyond dependency hygiene this has
a concrete operational payoff here: importing torch is the trigger for the
remote-relay transfer degradation documented in CLAUDE.md, so the hot CLIs
(eval / distill) are better off never importing it at all.

Two on-disk formats exist:

* **Legacy** (what the reference's shipped ``pretrained/*.ckpt`` use,
  torch < 1.6 default — ``torch/serialization.py`` ``_legacy_save``):
  a stream of pickles [magic 0x1950a86a20f9469cfc6c, protocol 1001,
  system-info dict, the object, the ordered storage-key list] followed by
  each storage as ``int64 numel`` + raw little-endian bytes. Tensors appear
  in the object pickle as persistent IDs
  ``('storage', StorageType, root_key, location, numel, view_metadata)``
  rebuilt through ``torch._utils._rebuild_tensor_v2``.

* **Zip** (torch >= 1.6): a zipfile with ``<name>/data.pkl`` (persistent
  IDs ``('storage', StorageType, key, location, numel)``) and one raw file
  ``<name>/data/<key>`` per storage.

The unpickler is restricted: only the torch rebuild helpers and stdlib
containers needed by ``state_dict`` checkpoints are allowed — arbitrary
pickled code is rejected, which makes this loader *safer* than
``torch.load`` on untrusted files, not just torch-free. Tensors come back
as numpy arrays (bfloat16 via ml_dtypes). Parity with ``torch.load`` is
pinned bit-for-bit over every shipped pretrained checkpoint by
``tests/test_torch_reader.py``.
"""

from __future__ import annotations

import codecs
import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, BinaryIO, Dict

import numpy as np

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C

_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


def _storage_dtype(name: str) -> np.dtype:
    if name == "BFloat16Storage":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    try:
        return _DTYPES[name]
    except KeyError:
        raise pickle.UnpicklingError(f"unsupported torch storage type {name!r}")


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` etc. reaching us via find_class."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _storage_dtype(name)


class _Storage:
    """A (possibly not-yet-filled) flat buffer of ``numel`` elements."""

    def __init__(self, dtype: np.dtype, numel: int, key: str):
        self.dtype = dtype
        self.numel = numel
        self.key = key
        self.array: np.ndarray | None = None


class _LazyTensor:
    """Tensor view over a storage; materialized once the bytes are known."""

    def __init__(self, storage: _Storage, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def materialize(self) -> np.ndarray:
        base = self.storage.array
        if base is None:
            raise pickle.UnpicklingError(
                f"storage {self.storage.key} was never filled"
            )
        # Bounds-check offset/size/stride BEFORE as_strided: crafted or
        # truncated metadata must raise, never read out of bounds.
        if self.offset < 0 or any(s < 0 for s in self.size):
            raise pickle.UnpicklingError("negative tensor offset/size")
        if 0 in self.size:
            return np.zeros(self.size, dtype=base.dtype)
        last = self.offset + sum(
            (n - 1) * abs(st) for n, st in zip(self.size, self.stride)
        )
        if last >= base.shape[0] or any(st < 0 for st in self.stride):
            raise pickle.UnpicklingError(
                f"tensor metadata exceeds storage bounds "
                f"(offset {self.offset}, size {self.size}, "
                f"stride {self.stride}, storage numel {base.shape[0]})"
            )
        itemsize = base.dtype.itemsize
        out = np.lib.stride_tricks.as_strided(
            base[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.array(out)  # own the memory; drop the view


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    return _LazyTensor(storage, storage_offset, size, stride)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _LazyTensor(storage, storage_offset, size, stride)


# Data-only numpy scalar reconstruction: reference ray caches
# (cache_dataset.py:104-110) store focal_length as a numpy float, which
# torch.save pickles via numpy.core.multiarray.scalar(dtype, bytes).
# np.core is the deprecated pre-NumPy-2 alias (np._core after); resolve
# whichever this numpy has, lazily, so neither era's shim is touched
# (an eager inner getattr would trip np.core's DeprecationWarning on
# NumPy 2, and chain AttributeError on None if both were absent).
if hasattr(np, "_core"):
    _np_core = np._core
elif hasattr(np, "core"):
    _np_core = np.core
else:  # pragma: no cover - no known numpy lacks both
    raise ImportError("numpy exposes neither _core nor core")

_ALLOWED = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("collections", "OrderedDict"): OrderedDict,
    ("torch.serialization", "_get_layout"): lambda name: None,
    ("numpy.core.multiarray", "scalar"): _np_core.multiarray.scalar,
    ("numpy._core.multiarray", "scalar"): _np_core.multiarray.scalar,
    ("numpy", "dtype"): np.dtype,
    # protocol-2 pickles of numpy scalars carry the raw bytes as a latin-1
    # str rebuilt via _codecs.encode — pure data transcoding, no execution.
    ("_codecs", "encode"): codecs.encode,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, fobj, storages: Dict[str, _Storage]):
        super().__init__(fobj, encoding="utf-8")
        self.storages = storages

    def find_class(self, module, name):
        fn = _ALLOWED.get((module, name))
        if fn is not None:
            return fn
        if module.startswith("torch") and name.endswith("Storage"):
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f"torch_reader: refusing to unpickle {module}.{name} "
            "(only plain state-dict checkpoints are supported)"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if len(pid) > 5 and pid[5]:
            # Legacy view_metadata (a tensor stored on a storage VIEW):
            # silently resolving it against the root storage would load
            # wrong weights — refuse so callers fall back to torch.load.
            raise pickle.UnpicklingError(
                "legacy storage views are not supported by the standalone "
                "reader"
            )
        key = str(key)
        if key not in self.storages:
            self.storages[key] = _Storage(storage_type.dtype, int(numel), key)
        return self.storages[key]


class _HeaderUnpickler(pickle.Unpickler):
    """For the legacy format's framing pickles (magic / protocol / system
    info / storage-key list): plain data only — no globals, no persistent
    IDs — so a crafted header cannot execute anything."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"torch_reader: global {module}.{name} not allowed in a "
            "checkpoint header"
        )

    def persistent_load(self, pid):
        raise pickle.UnpicklingError("persistent id not allowed in a header")


def _load_header(f: BinaryIO) -> Any:
    return _HeaderUnpickler(f, encoding="utf-8").load()


def _materialize(obj: Any) -> Any:
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, (dict, OrderedDict)):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_materialize(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v) for v in obj)
    return obj


def _read_legacy(f: BinaryIO) -> Any:
    storages: Dict[str, _Storage] = {}
    magic = _load_header(f)
    if magic != _LEGACY_MAGIC:
        raise pickle.UnpicklingError("not a legacy torch file (bad magic)")
    _load_header(f)  # protocol version
    _load_header(f)  # system info (little-endian assumed, as np '<' dtypes)
    obj = _Unpickler(f, storages).load()
    storage_keys = _load_header(f)
    for key in storage_keys:
        storage = storages[str(key)]
        (numel,) = struct.unpack("<q", f.read(8))
        if numel != storage.numel:
            raise pickle.UnpicklingError(
                f"storage {key}: header numel {numel} != pickled {storage.numel}"
            )
        raw = f.read(numel * storage.dtype.itemsize)
        if len(raw) != numel * storage.dtype.itemsize:
            raise pickle.UnpicklingError(
                f"storage {key}: file truncated "
                f"({len(raw)} of {numel * storage.dtype.itemsize} bytes)"
            )
        storage.array = np.frombuffer(raw, dtype=storage.dtype)
    return _materialize(obj)


def _read_zip(path: str) -> Any:
    storages: Dict[str, _Storage] = {}
    with zipfile.ZipFile(path) as z:
        pkl_name = next(n for n in z.namelist() if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        obj = _Unpickler(io.BytesIO(z.read(pkl_name)), storages).load()
        for key, storage in storages.items():
            raw = z.read(f"{prefix}data/{key}")
            if len(raw) != storage.numel * storage.dtype.itemsize:
                raise pickle.UnpicklingError(
                    f"storage {key}: archive holds {len(raw)} bytes, "
                    f"pickle claims {storage.numel * storage.dtype.itemsize}"
                )
            storage.array = np.frombuffer(raw, dtype=storage.dtype)
    return _materialize(obj)


def load_torch_file(path: str) -> Any:
    """Read a ``torch.save`` file (legacy or zip format) without torch.

    Returns the stored object with every tensor as a numpy array.
    """
    if zipfile.is_zipfile(path):
        return _read_zip(path)
    with open(path, "rb") as f:
        return _read_legacy(f)
