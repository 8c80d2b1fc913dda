"""Selfie segmentation: binary (general/landscape) and multiclass.

TPU-native port of `lib/src/models/selfie_segmentation.dart`: the letterbox
preprocess, the segmenter network (converted from TFLite, including the
MediaPipe ``Convolution2DTransposeBias`` custom op — see
`selfie_segmentation.dart:57-66`), per-pixel multiclass softmax
(`:656-699`), and the person mask (binary: raw sigmoid; multiclass:
1 - background probability, `:705-721`) all compile into ONE XLA program,
batched over images.

Mask objects mirror `SegmentationMask` / `MulticlassSegmentationMask`
(`face_types.dart:282-627`), including the padding-aware `upsample`.
"""

from __future__ import annotations

import enum
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..convert.executor import ConvertedModel
from ..ops.letterbox import letterbox_image, letterbox_params

__all__ = ["SegmentationClass", "SegmentationMask",
           "MulticlassSegmentationMask", "SelfieSegmentation",
           "MIN_SEGMENTATION_INPUT_SIZE", "mask_valid_region",
           "crop_valid_and_resize"]

MIN_SEGMENTATION_INPUT_SIZE = 16  # selfie_segmentation.dart:4


def _dart_round(x: float) -> int:
    """Dart ``.round()`` = half AWAY FROM ZERO for the non-negative values
    here; Python's ``round`` is banker's (round-half-even), which differs
    at exact .5 — e.g. (1500.5).round() == 1501 vs round(1500.5) == 1500,
    a 1-px mask-size/crop mismatch.  Same divergence ops/letterbox.py
    documents for letterbox sizing."""
    import math
    return int(math.floor(x + 0.5))


def mask_valid_region(width: int, height: int,
                      padding: tuple[float, float, float, float]
                      ) -> tuple[int, int, int, int]:
    """(x0, y0, x1, y1) of the non-letterbox-padding region in mask pixels
    (``maskValidRegion``, `overlay_painters.dart:41-53`).  The single
    source of the crop rounding — `SegmentationMask.upsample` and the
    overlay painters (utils/render.py) must agree on it exactly or masks
    shift against the image."""
    pt, pb, pl, pr = padding
    return (_dart_round(pl * width), _dart_round(pt * height),
            _dart_round((1.0 - pr) * width), _dart_round((1.0 - pb) * height))


def corner_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear weights with the REFERENCE's mask sampling:
    ``src = i * (in/out)`` with floor + clamped neighbor
    (`face_types.dart:383-404`) — corner-anchored, NOT cv2's half-pixel
    centers.  cv2 semantics (`resize_matrix`) belong to the letterbox
    path, whose parity target is OpenCV; the mask upsample's parity
    target is the reference's own Dart loop."""
    m = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    src = np.arange(out_size) * scale
    lo = np.clip(np.floor(src), 0, in_size - 1).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    for o in range(out_size):
        m[o, lo[o]] += 1.0 - frac[o]
        m[o, hi[o]] += frac[o]
    return m


def crop_valid_and_resize(data: np.ndarray, width: int, height: int,
                          padding: tuple[float, float, float, float],
                          out_w: int, out_h: int) -> np.ndarray:
    """Crops the letterbox padding off a mask-resolution plane and
    bilinearly resizes it to (out_h, out_w) with the reference's
    corner-anchored sampling (`face_types.dart:383-404`).
    ``data`` is [H, W] or [H, W, C]."""
    x0, y0, x1, y1 = mask_valid_region(width, height, padding)
    src = data[y0:y1, x0:x1] if (x1 > x0 and y1 > y0) else data
    mh = corner_resize_matrix(src.shape[0], out_h)
    mw = corner_resize_matrix(src.shape[1], out_w)
    if src.ndim == 2:
        return mh @ src @ mw.T
    return np.einsum("Hh,hwc,Ww->HWc", mh, src, mw)


class SegmentationClass(enum.IntEnum):
    """Multiclass channel order (`face_types.dart` SegmentationClass)."""

    BACKGROUND = 0
    HAIR = 1
    BODY_SKIN = 2
    FACE_SKIN = 3
    CLOTHES = 4
    OTHER = 5


class SegmentationMask:
    """Person-probability mask in model resolution with letterbox padding.

    ``data`` is [H, W] float32 in [0, 1].  ``padding`` is normalized
    (top, bottom, left, right) of the letterbox, used by :meth:`upsample`
    to crop the valid region before resizing back to the original image.
    """

    def __init__(self, data: np.ndarray, original_width: int,
                 original_height: int,
                 padding: tuple[float, float, float, float],
                 default_max_size: int = 2048):
        self.data = np.asarray(data)
        self.height, self.width = self.data.shape[:2]
        self.original_width = original_width
        self.original_height = original_height
        self.padding = padding
        #: Default `max_size` cap for :meth:`upsample` — set from
        #: `SegmentationConfig.max_output_size` (`face_types.dart:244`).
        self.default_max_size = default_max_size

    def upsample(self, target_width: Optional[int] = None,
                 target_height: Optional[int] = None,
                 max_size: Optional[int] = None) -> "SegmentationMask":
        """Crops letterbox padding and bilinearly resizes to target size
        (default: original image size), capped at ``max_size`` on the longer
        side (default: the mask's ``default_max_size``, i.e. the
        SegmentationConfig.max_output_size it was produced under;
        `face_types.dart:345-420`)."""
        if max_size is None:
            max_size = self.default_max_size
        tw = target_width or self.original_width
        th = target_height or self.original_height
        max_dim = max(tw, th)
        scale = max_size / max_dim if (max_size > 0 and max_dim > max_size) \
            else 1.0
        fw, fh = _dart_round(tw * scale), _dart_round(th * scale)

        out = crop_valid_and_resize(self.data, self.width, self.height,
                                    self.padding, fw, fh)
        return SegmentationMask(out.astype(np.float32), self.original_width,
                                self.original_height, (0.0, 0.0, 0.0, 0.0),
                                default_max_size=self.default_max_size)

    def confidence_at(self, x_norm: float, y_norm: float) -> float:
        x = min(max(int(x_norm * self.width), 0), self.width - 1)
        y = min(max(int(y_norm * self.height), 0), self.height - 1)
        return float(self.data[y, x])

    # -- serialization formats (face_types.dart:416-431, the reference's
    # -- isolate-RPC payloads; here they serve storage/IPC) -------------------

    def to_uint8(self) -> np.ndarray:
        """8-bit grayscale mask (clamp to [0,1], x255, round)."""
        return np.round(np.clip(self.data, 0.0, 1.0) * 255).astype(np.uint8)

    def to_binary(self, threshold: float = 0.5) -> np.ndarray:
        """Binary mask: 255 where data >= threshold else 0."""
        return np.where(self.data >= threshold, 255, 0).astype(np.uint8)

    def to_rgba(self, foreground=(255, 255, 255, 255),
                background=(0, 0, 0, 0), threshold: float = 0.5
                ) -> np.ndarray:
        """[H, W, 4] RGBA visualization (face_types.dart:434)."""
        m = (self.data >= threshold)[..., None]
        return np.where(m, np.asarray(foreground, np.uint8),
                        np.asarray(background, np.uint8))

    def serialize(self, fmt: str = "float32",
                  binary_threshold: float = 0.5) -> dict:
        """Serializable dict; formats float32 | uint8 | binary
        (`face_detector.dart:1735-1771`)."""
        base = {"width": self.width, "height": self.height,
                "original_width": self.original_width,
                "original_height": self.original_height,
                "padding": tuple(self.padding), "data_format": fmt,
                "default_max_size": self.default_max_size}
        if fmt == "float32":
            base["data"] = self.data.astype(np.float32).tobytes()
        elif fmt == "uint8":
            base["data"] = self.to_uint8().tobytes()
        elif fmt == "binary":
            base["data"] = self.to_binary(binary_threshold).tobytes()
            base["binary_threshold"] = binary_threshold
        else:
            raise ValueError(f"Unknown data format: {fmt}")
        if isinstance(self, MulticlassSegmentationMask):
            base["class_data"] = self.class_data.astype(np.float32).tobytes()
        return base

    @staticmethod
    def deserialize(d: dict) -> "SegmentationMask":
        """Inverse of :meth:`serialize` (`face_detector.dart:1773-1827`)."""
        w, h = d["width"], d["height"]
        fmt = d.get("data_format", "float32")
        if fmt == "float32":
            data = np.frombuffer(d["data"], np.float32).reshape(h, w).copy()
        elif fmt == "uint8":
            data = (np.frombuffer(d["data"], np.uint8)
                    .reshape(h, w).astype(np.float32) / 255.0)
        elif fmt == "binary":
            data = (np.frombuffer(d["data"], np.uint8).reshape(h, w) == 255
                    ).astype(np.float32)
        else:
            raise ValueError(f"Unknown data format: {fmt}")
        dms = d.get("default_max_size", 2048)
        if "class_data" in d:
            class_data = np.frombuffer(
                d["class_data"], np.float32).reshape(h, w, 6).copy()
            return MulticlassSegmentationMask(
                data, d["original_width"], d["original_height"],
                tuple(d["padding"]), class_data=class_data,
                default_max_size=dms)
        return SegmentationMask(data, d["original_width"],
                                d["original_height"], tuple(d["padding"]),
                                default_max_size=dms)


class MulticlassSegmentationMask(SegmentationMask):
    """Adds per-class probabilities ([H, W, 6], softmaxed)."""

    def __init__(self, data, original_width, original_height, padding,
                 class_data: np.ndarray, default_max_size: int = 2048):
        super().__init__(data, original_width, original_height, padding,
                         default_max_size=default_max_size)
        self.class_data = np.asarray(class_data)

    def class_mask(self, cls: SegmentationClass) -> np.ndarray:
        return self.class_data[..., int(cls)]

    @property
    def hair_mask(self):
        return self.class_mask(SegmentationClass.HAIR)

    @property
    def body_skin_mask(self):
        return self.class_mask(SegmentationClass.BODY_SKIN)

    @property
    def face_skin_mask(self):
        return self.class_mask(SegmentationClass.FACE_SKIN)

    @property
    def clothes_mask(self):
        return self.class_mask(SegmentationClass.CLOTHES)

    @property
    def other_mask(self):
        return self.class_mask(SegmentationClass.OTHER)

    @property
    def background_mask(self):
        return self.class_mask(SegmentationClass.BACKGROUND)


class SelfieSegmentation:
    """Compiled segmentation pipeline for one image bucket.

    One jitted program per exact (img_h, img_w) — segmentation is not
    size-bucketed (padding the image would put dead rows inside the
    letterbox and shift the mask's valid-region geometry), so a stream of
    many DISTINCT image sizes pays one compile each; resize on host first
    if that matters for your workload.
    """

    def __init__(self, model: ConvertedModel, multiclass: bool = False, *,
                 mask_dtype: str = "float32", max_output_size: int = 2048):
        self.model = model
        self.multiclass = multiclass
        if mask_dtype not in ("float32", "uint8"):
            raise ValueError(f"mask_dtype must be 'float32' or 'uint8', "
                             f"got {mask_dtype!r}")
        #: Device->host mask encoding.  "uint8" quantizes probabilities to
        #: 1/255 resolution ON DEVICE, cutting the D2H payload 4x — the
        #: reference's own uint8 serialize format
        #: (`face_detector.dart:1735-1771`); readback is the measured
        #: pipeline bottleneck on relay-attached TPUs (docs/PERF.md).
        self.mask_dtype = mask_dtype
        self.max_output_size = max_output_size
        _, self.in_h, self.in_w, _ = model.input_shapes[0]
        self._programs: dict[tuple[int, int], object] = {}
        # Guards check-then-insert (same rationale as
        # FaceDetector._programs_lock: a race costs a duplicated
        # 20-240 s first compile).
        self._programs_lock = threading.Lock()
        self._device = None
        self._placed_params = None

    def place_on(self, device) -> None:
        """Pins this pipeline's weights and execution to ``device``.

        The multi-chip analog of the reference's separate segmentation
        isolate (`face_detector.dart:1297-1324`): with segmentation on its
        own chip, the combined detect+segment call genuinely computes in
        parallel and costs ≈ max(detect, segment) — on one chip the device
        programs serialize and only host stages overlap (docs/PERF.md).
        Inputs are transferred to ``device`` at dispatch (the analog of
        the reference shipping bytes into the isolate)."""
        if self.model is None:
            raise RuntimeError("SelfieSegmentation has been disposed")
        self._device = device
        self._placed_params = jax.device_put(self.model.params, device)

    def _program(self, model: ConvertedModel, img_h: int, img_w: int):
        key = (img_h, img_w)
        with self._programs_lock:
            return self._program_locked(model, key, img_h, img_w)

    def _program_locked(self, model: ConvertedModel, key,
                        img_h: int, img_w: int):
        if key not in self._programs:
            lbp = letterbox_params(img_h, img_w, self.in_h, self.in_w)

            def one(params, img):
                # Close over the caller's MODEL SNAPSHOT, not self.model:
                # the jit traces lazily at the first program call, by
                # which time a concurrent dispose() may have nulled
                # self.model (dispatch's documented race guard).
                x = letterbox_image(img, lbp)
                (raw,) = model.fn(params, x[None])
                raw = raw.reshape(self.in_h, self.in_w, -1)
                # ONE output plane set crosses to the host: binary ships
                # the sigmoid plane, multiclass ships the 6 softmax planes
                # (person = 1 - background is computed on host — shipping
                # it too would be a 7th redundant plane).
                out = (jax.nn.softmax(raw, axis=-1) if self.multiclass
                       else raw[..., :1])
                if self.mask_dtype == "uint8":
                    out = jnp.round(
                        jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
                return out

            self._programs[key] = (
                jax.jit(jax.vmap(one, in_axes=(None, 0))), lbp)
        return self._programs[key]

    def call_from_bytes(self, data: bytes) -> SegmentationMask:
        """Decodes an encoded image and segments it
        (`callFromBytes`, selfie_segmentation.dart:586)."""
        from ..utils.image import decode_image
        return self(decode_image(data)[None])[0]

    def dispose(self) -> None:
        """Frees the compiled programs/weights; later calls raise
        (`selfie_segmentation.dart:733`).  `dispose_async` is the same —
        there is no isolate to wind down here."""
        self._programs = {}
        self.model = None
        self._placed_params = None

    def dispose_async(self) -> None:
        self.dispose()

    def dispatch(self, images):
        """Starts segmentation asynchronously; returns an opaque handle.

        Raises RuntimeError after :meth:`dispose`.

        The device program is dispatched but NOT materialized — callers can
        overlap other device work (the combined detect+segment path) and
        call :meth:`materialize` later.
        """
        model = self.model  # snapshot: a concurrent dispose() must yield
        if model is None:   # the documented RuntimeError, not AttributeError
            raise RuntimeError("SelfieSegmentation has been disposed")
        if not isinstance(images, jax.Array):
            images = np.asarray(images)
        # Single [H, W, C] convenience ONLY for channel-shaped last dims;
        # a 3-D array with any other trailing extent is a [B, H, W]
        # grayscale batch (normalize_channels' documented input).  The
        # genuinely ambiguous [B, H, 3] grayscale batch reads as one RGB
        # image — add an explicit channel axis for that shape.
        if images.ndim == 3 and images.shape[-1] in (1, 3, 4):
            images = images[None]
        if self._device is not None:
            # ONE upload, straight to the pinned chip: converting first
            # (jnp.asarray -> default device) and device_put-ing after
            # would transfer every frame twice.
            images = jax.device_put(images, self._device)
        elif not isinstance(images, jax.Array):
            images = jnp.asarray(images)
        # Same channel tolerance as the detector path (RGBA drops alpha,
        # grayscale replicates — `bgrMatToSignedFloat32`).  Runs on the
        # device `images` is committed to.
        from ..utils.image import normalize_channels
        images = normalize_channels(images)
        b, h, w, _ = images.shape
        if h < MIN_SEGMENTATION_INPUT_SIZE or w < MIN_SEGMENTATION_INPUT_SIZE:
            raise ValueError(
                f"image {w}x{h} is smaller than minimum "
                f"{MIN_SEGMENTATION_INPUT_SIZE}x{MIN_SEGMENTATION_INPUT_SIZE}")
        prog, lbp = self._program(model, h, w)
        params = model.params
        if self._device is not None:
            params = self._placed_params
        planes = prog(params, images)
        try:
            # Overlap the D2H copy with whatever runs before materialize
            # (the combined detect+segment path dispatches detection next).
            planes.copy_to_host_async()
        except Exception:
            pass  # backends without async copy just block in materialize
        return (planes, lbp, b, w, h)

    def materialize(self, handle) -> list[SegmentationMask]:
        """Blocks on a :meth:`dispatch` handle and builds the mask objects."""
        planes, lbp, b, w, h = handle
        # ONE batched pull: per-image np.asarray calls would pay a full
        # device->host round trip each over remote-attached TPUs (see
        # FaceDetector._fetch).
        planes = np.asarray(planes)
        if planes.dtype == np.uint8:
            planes = planes.astype(np.float32) * (1.0 / 255.0)
        masks: list[SegmentationMask] = []
        for i in range(b):
            if self.multiclass:
                masks.append(MulticlassSegmentationMask(
                    1.0 - planes[i, ..., 0], w, h, lbp.padding,
                    class_data=planes[i],
                    default_max_size=self.max_output_size))
            else:
                masks.append(SegmentationMask(
                    planes[i, ..., 0], w, h, lbp.padding,
                    default_max_size=self.max_output_size))
        return masks

    def __call__(self, images) -> list[SegmentationMask]:
        """Segments a [B, H, W, 3] RGB batch (uint8/float 0..255; numpy or
        device-resident jax arrays)."""
        return self.materialize(self.dispatch(images))
