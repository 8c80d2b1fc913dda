"""ctypes bindings for the C++ host runtime (runtime/libfdt_runtime.so).

Builds the shared library on first use when a toolchain is present (the
library has no Python build-time dependency — plain Makefile +
libjpeg/libpng/libwebp); falls back cleanly when unavailable, in which
case `utils.image` uses PIL/cv2.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = ["load_runtime", "ImageDecoderPool", "JpegDecoderPool",
           "native_available"]

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "build", "libfdt_runtime.so")

_lib = None
_lib_lock = threading.Lock()


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _RUNTIME_DIR],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_runtime() -> Optional[ctypes.CDLL]:
    """Loads (building if needed) the native runtime, or None.

    A failed build/load is cached so repeated calls don't re-spawn make.
    """
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        # Always attempt a (no-op when current) make so source edits are
        # picked up; fall back to a pre-built .so when the toolchain is
        # absent but the library exists.
        if not _try_build() and not os.path.exists(_LIB_PATH):
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib = False
            return None
        # fdt_image_* may be absent from a stale pre-built .so (no
        # toolchain to rebuild); the pool then stays JPEG-only.
        for probe in ("fdt_image_probe", "fdt_jpeg_probe"):
            fn = getattr(lib, probe, None)
            if fn is None:
                continue
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        for dec in ("fdt_image_decode", "fdt_jpeg_decode"):
            fn = getattr(lib, dec, None)
            if fn is None:
                continue
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int]
        lib.fdt_pool_create.restype = ctypes.c_void_p
        lib.fdt_pool_create.argtypes = [ctypes.c_int]
        lib.fdt_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.fdt_pool_decode_batch.restype = ctypes.c_int
        lib.fdt_pool_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_runtime() is not None


class ImageDecoderPool:
    """Threaded native image decoder (JPEG / PNG / WebP).

    The host-side analog of the reference's OpenCV `imdecode` inside a
    background isolate (`face_detector.dart:1412-1430`): decodes batches
    concurrently so the host keeps the device fed at serving rates.
    Formats the native layer can't handle exactly (e.g. 16-bit PNG) raise
    ValueError so callers fall back to PIL/cv2.
    """

    def __init__(self, threads: int = 0):
        lib = load_runtime()
        if lib is None:
            raise RuntimeError(
                "native runtime unavailable (no toolchain/libjpeg); "
                "use utils.image.decode_image instead")
        self._lib = lib
        self._probe_fn = getattr(lib, "fdt_image_probe", None) \
            or lib.fdt_jpeg_probe
        self._decode_fn = getattr(lib, "fdt_image_decode", None) \
            or lib.fdt_jpeg_decode
        if threads <= 0:
            threads = min(16, os.cpu_count() or 4)
        self._pool = lib.fdt_pool_create(threads)
        self.threads = threads

    def probe(self, data: bytes) -> tuple[int, int]:
        """(width, height) of an encoded image without decoding it."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._probe_fn(data, len(data),
                            ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise ValueError(
                f"not natively decodable image bytes (status {rc})")
        return w.value, h.value

    def decode(self, data: bytes) -> np.ndarray:
        """One encoded image -> RGB uint8 [H, W, 3].

        The header is parsed twice (probe here to size the buffer, then
        again inside fdt_image_decode) — measured at 4.4 µs vs 6.1 ms for
        the full decode (0.07%), so Python-side allocation keeps the
        simpler zero-copy interface."""
        w, h = self.probe(data)
        out = np.empty((h, w, 3), np.uint8)
        rc = self._decode_fn(
            data, len(data), out.ctypes.data_as(ctypes.c_void_p), w, h)
        if rc != 0:
            raise ValueError(f"native image decode failed (status {rc})")
        return out

    def decode_batch(self, datas: Sequence[bytes]) -> list[np.ndarray]:
        """Decodes many images (formats may be mixed) concurrently."""
        if not self._pool:
            # Passing the NULL handle into C would segfault the process.
            raise RuntimeError("ImageDecoderPool is closed")
        n = len(datas)
        if n == 0:
            return []
        sizes = [self.probe(d) for d in datas]
        outs = [np.empty((h, w, 3), np.uint8) for (w, h) in sizes]

        c_datas = (ctypes.c_char_p * n)(*datas)
        c_lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
        c_outs = (ctypes.c_void_p * n)(
            *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs])
        c_ws = (ctypes.c_int * n)(*[s[0] for s in sizes])
        c_hs = (ctypes.c_int * n)(*[s[1] for s in sizes])
        rc = self._lib.fdt_pool_decode_batch(
            self._pool, n, c_datas, c_lens, c_outs, c_ws, c_hs)
        if rc != 0:
            raise ValueError(f"batch image decode failed (status {rc})")
        return outs

    def close(self):
        if self._pool:
            self._lib.fdt_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# Pre-round-3 name, kept for callers written against the JPEG-only pool.
JpegDecoderPool = ImageDecoderPool
