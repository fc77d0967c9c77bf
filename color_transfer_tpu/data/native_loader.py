"""ctypes bindings for the native C++ image decoder (native/imageio.cc).

ctypes foreign calls release the GIL, so the threaded Loader gets true
decode parallelism from one process — replacing the reference's 32
DataLoader worker processes (reference configs/dcmcs3di.yaml:15). The
cropped decode stops inflating PNG rows past the crop, which matters for the
random-crop training pipeline (reference utils/data.py:69-73).

Falls back to PIL transparently when the shared library hasn't been built
(``make -C native``).
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _LIB_DIR / "libctimageio.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_LIB_DIR)], check=True, capture_output=True
            )
        except Exception:  # noqa: BLE001 — toolchain may be absent
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _lib = False
        return _lib
    lib.ct_image_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ct_decode_rgb8.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.ct_decode_crop_rgb8.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available():
    return bool(_load())


def image_info(path):
    lib = _load()
    if not lib:
        raise RuntimeError("native imageio not available")
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    rc = lib.ct_image_info(str(path).encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"ct_image_info({path}) failed with {rc}")
    return int(h.value), int(w.value)


def _out_ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def read_image(path):
    """Decode a full image to (H, W, 3) uint8 via the native library."""
    lib = _load()
    if not lib:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    h, w = image_info(path)
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.ct_decode_rgb8(str(path).encode(), _out_ptr(out), out.size)
    if rc != 0:
        raise IOError(f"ct_decode_rgb8({path}) failed with {rc}")
    return out


def read_image_crop(path, top, left, crop_h, crop_w):
    """Decode only the rows covering [top, top+crop_h) and slice the crop;
    PNG inflation stops at the last needed row."""
    lib = _load()
    if not lib:
        return read_image(path)[top : top + crop_h, left : left + crop_w]
    out = np.empty((crop_h, crop_w, 3), dtype=np.uint8)
    rc = lib.ct_decode_crop_rgb8(
        str(path).encode(), top, left, crop_h, crop_w, _out_ptr(out), out.size
    )
    if rc != 0:
        raise IOError(f"ct_decode_crop_rgb8({path}) failed with {rc}")
    return out
