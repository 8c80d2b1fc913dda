"""Face embeddings: eye-based alignment + MobileFaceNet + L2 normalize.

Port of `lib/src/models/face_embedding.dart`: the 112x112 eye-aligned crop
(`computeEmbeddingAlignment`, face_embedding.dart:362-384: size =
2.5 * eyeDist, center offset 0.15 * size below the eye midpoint along the
crop's down axis), the 192-dim embedding, L2 normalization (`:386-400`),
and cosine/euclidean comparison (`:283-334`).

The reference ships `mobilefacenet.tflite` via its pub.dev package
(`pubspec.yaml:45`; NOT present in this source checkout).  When a tflite
file is available it is converted like every other network; otherwise a
faithful MobileFaceNet-192 architecture (Chen et al. 2018, inference-time
BN-folded) with seeded random weights keeps the full pipeline runnable and
testable — `load()` makes the substitution explicit.
"""

from __future__ import annotations

import math
import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..convert.executor import ConvertedModel, convert_file
from ..ops import warp
from ..ops.letterbox import normalize_image
from ..pipeline.config import EMBEDDING_DIM, EMBEDDING_INPUT_SIZE

__all__ = ["compute_embedding_alignment", "FaceEmbedding",
           "cosine_similarity", "euclidean_distance",
           "build_mobilefacenet", "UntrainedEmbeddingWarning"]


class UntrainedEmbeddingWarning(UserWarning):
    """Raised-as-warning when embeddings come from random-init weights.

    The reference ships trained `mobilefacenet.tflite` via pub.dev
    (`pubspec.yaml:45`); that asset is not in this checkout and cannot be
    fetched here, so without a user-provided tflite file the embedding
    network runs on seeded random weights: vectors are structurally valid
    but NOT identity-discriminative — `compare_faces` on them is
    meaningless.  Pass ``allow_untrained=True`` (or point
    ``MODEL_FILES['embedding']`` at a real mobilefacenet.tflite) to
    acknowledge and silence this.
    """


def compute_embedding_alignment(left_eye, right_eye):
    """ROI (cx, cy, size, theta) from eye centers (absolute pixels).

    `face_embedding.dart:362-384`.
    """
    dx = right_eye[0] - left_eye[0]
    dy = right_eye[1] - left_eye[1]
    theta = math.atan2(dy, dx)
    eye_dist = math.hypot(dx, dy)
    size = eye_dist * 2.5
    eye_cx = (left_eye[0] + right_eye[0]) * 0.5
    eye_cy = (left_eye[1] + right_eye[1]) * 0.5
    off = size * 0.15
    cx = eye_cx - off * math.sin(theta)
    cy = eye_cy + off * math.cos(theta)
    return cx, cy, size, theta


def alignment_from_eyes(le_x, le_y, re_x, re_y):
    """Traceable `computeEmbeddingAlignment` (face_embedding.dart:362-384)
    over arrays of eye-center coordinates: returns (cx, cy, size, theta).

    Same math as :func:`compute_embedding_alignment` (the host/scalar
    form) expressed in jnp so fused programs can vectorize it; keep the
    two in lockstep.
    """
    dx = re_x - le_x
    dy = re_y - le_y
    theta = jnp.arctan2(dy, dx)
    size = jnp.sqrt(dx * dx + dy * dy) * 2.5
    off = size * 0.15
    cx = (le_x + re_x) * 0.5 - off * jnp.sin(theta)
    cy = (le_y + re_y) * 0.5 + off * jnp.cos(theta)
    return cx, cy, size, theta


def embed_rois(model_fn, params, img, cxs, cys, sizes, thetas):
    """THE embedding math for N ROIs of one image: negated-angle 112 px
    warp (face_detector_core.dart:433-440) + [-1,1] normalize +
    MobileFaceNet + L2 normalize (face_embedding.dart:386-400).

    Shared by :class:`FaceEmbedding` (single-face and slab-batch
    programs) and the fused ``embed_in_full`` pipeline stage
    (pipeline/programs.py) so the alignment/warp/normalize semantics
    cannot drift between the two paths.
    """
    crops = warp.extract_rois(img, cxs, cys, sizes, -thetas,
                              out_size=EMBEDDING_INPUT_SIZE)
    crops = normalize_image(crops)

    def one(crop):
        (emb,) = model_fn(params, crop[None])
        emb = emb.reshape(-1)
        norm = jnp.sqrt(jnp.sum(emb * emb))
        return jnp.where(norm > 0, emb / norm, emb)

    return jax.vmap(one)(crops)


def cosine_similarity(a, b) -> float:
    """`face_embedding.dart:283-302`."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"Embedding dimensions must match: "
                         f"{a.shape} vs {b.shape}")
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / denom) if denom > 0 else 0.0


def euclidean_distance(a, b) -> float:
    """`face_embedding.dart:304-334`."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"Embedding dimensions must match: "
                         f"{a.shape} vs {b.shape}")
    return float(np.linalg.norm(a - b))


# ---------------------------------------------------------------------------
# MobileFaceNet architecture (pure JAX, inference form).
# ---------------------------------------------------------------------------

def _conv(p, name, x, stride=1, groups=1, prelu=True, precision=None):
    w = p[f"{name}_w"]  # HWIO
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32, precision=precision)
    y = y + p[f"{name}_b"]
    if prelu:
        alpha = p[f"{name}_a"]
        y = jnp.where(y >= 0, y, y * alpha)
    return y


def _bottleneck(p, name, x, expand, out_c, stride, precision=None):
    c_in = x.shape[-1]
    h = _conv(p, f"{name}_e", x, precision=precision)            # 1x1 expand
    h = _conv(p, f"{name}_d", h, stride=stride,
              groups=c_in * expand, precision=precision)         # 3x3 dw
    h = _conv(p, f"{name}_p", h, prelu=False, precision=precision)  # 1x1 proj
    if stride == 1 and c_in == out_c:
        h = h + x
    return h


# (expand, channels, repeats, stride) — MobileFaceNet table.
_MFN_BLOCKS = [(2, 64, 5, 2), (4, 128, 1, 2), (2, 128, 6, 1),
               (4, 128, 1, 2), (2, 128, 2, 1)]


def build_mobilefacenet(seed: int = 0, embedding_dim: int = EMBEDDING_DIM,
                        precision: str = "highest") -> ConvertedModel:
    """MobileFaceNet-112 with seeded He-init weights (BN folded away).

    Returns a :class:`ConvertedModel`-shaped object so the pipeline treats
    it exactly like a converted tflite graph.  ``precision`` matches the
    converter's MXU tiers ("highest" default, like converted models —
    without it the convs would run plain bf16 on TPU, drifting imported
    trained-weight embeddings ~0.4% vs CPU and flipping borderline
    compare_faces verdicts between backends).
    """
    rng = np.random.default_rng(seed)
    params: dict[str, jnp.ndarray] = {}

    def add_conv(name, kh, kw, c_in, c_out, groups=1, prelu=True):
        fan_in = kh * kw * (c_in // groups)
        w = rng.normal(0, math.sqrt(2.0 / fan_in),
                       (kh, kw, c_in // groups, c_out)).astype(np.float32)
        params[f"{name}_w"] = jnp.asarray(w)
        params[f"{name}_b"] = jnp.zeros((c_out,), jnp.float32)
        if prelu:
            params[f"{name}_a"] = jnp.full((c_out,), 0.25, jnp.float32)

    add_conv("stem", 3, 3, 3, 64)
    add_conv("stem_dw", 3, 3, 64, 64, groups=64)
    c_in = 64
    for bi, (t, c, n, s) in enumerate(_MFN_BLOCKS):
        for ri in range(n):
            name = f"b{bi}_{ri}"
            stride = s if ri == 0 else 1
            add_conv(f"{name}_e", 1, 1, c_in, c_in * t)
            add_conv(f"{name}_d", 3, 3, c_in * t, c_in * t, groups=c_in * t)
            add_conv(f"{name}_p", 1, 1, c_in * t, c, prelu=False)
            c_in = c
    add_conv("head", 1, 1, c_in, 512)
    add_conv("gdconv", 7, 7, 512, 512, groups=512, prelu=False)
    add_conv("out", 1, 1, 512, embedding_dim, prelu=False)

    prec = jax.lax.Precision(precision.lower()) if precision else None

    def fn(p, x):
        if tuple(x.shape) != (1, EMBEDDING_INPUT_SIZE, EMBEDDING_INPUT_SIZE, 3):
            raise ValueError(
                f"embedding input expects shape "
                f"(1, {EMBEDDING_INPUT_SIZE}, {EMBEDDING_INPUT_SIZE}, 3), "
                f"got {tuple(x.shape)}")
        h = _conv(p, "stem", x, stride=2, precision=prec)
        h = _conv(p, "stem_dw", h, groups=64, precision=prec)
        for bi, (t, ch, n, s) in enumerate(_MFN_BLOCKS):
            for ri in range(n):
                h = _bottleneck(p, f"b{bi}_{ri}", h, t, ch,
                                s if ri == 0 else 1, precision=prec)
        h = _conv(p, "head", h, precision=prec)
        # Global depthwise 7x7 VALID collapses spatial dims.
        w = p["gdconv_w"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=512, preferred_element_type=jnp.float32,
            precision=prec)
        h = h + p["gdconv_b"]
        h = _conv(p, "out", h, prelu=False, precision=prec)
        return (h.reshape(1, -1),)

    return ConvertedModel(
        params, fn,
        input_shapes=[(1, EMBEDDING_INPUT_SIZE, EMBEDDING_INPUT_SIZE, 3)],
        output_shapes=[(1, embedding_dim)],
        name="mobilefacenet-random-init")


class FaceEmbedding:
    """Eye-aligned 192-dim face embeddings with a compiled crop+net program."""

    def __init__(self, model: ConvertedModel, *,
                 allow_untrained: bool = False):
        self.model = model
        self.is_pretrained = "random-init" not in model.name
        self.allow_untrained = allow_untrained
        self._programs: dict[str, object] = {}

    @classmethod
    def load(cls, tflite_path: Optional[str] = None, *,
             allow_untrained: bool = False) -> "FaceEmbedding":
        """Loads from a mobilefacenet.tflite, an imported .npz checkpoint
        (see ``tools/import_weights.py``), or builds the seeded
        random-weight architecture when ``tflite_path`` is None
        (embeddings are then structurally valid but NOT
        identity-discriminative — every embed call warns with
        :class:`UntrainedEmbeddingWarning` unless ``allow_untrained``).

        An EXPLICIT path that does not exist raises FileNotFoundError —
        silently falling back would let a typo'd path produce meaningless
        similarities with no signal (only the implicit None case falls
        back)."""
        if tflite_path:
            if not os.path.exists(tflite_path):
                raise FileNotFoundError(
                    f"embedding model not found: {tflite_path} (pass "
                    "tflite_path=None to use the random-init fallback)")
            if tflite_path.endswith(".npz"):
                # Trained weights imported onto the built architecture
                # (produced by `tools/import_weights.py`); tree/shape
                # validation via the checkpoint loader.
                from ..convert.checkpoint import (load_params_npz,
                                                  swap_params)
                return cls(swap_params(build_mobilefacenet(),
                                       load_params_npz(tflite_path),
                                       name="mobilefacenet-imported"))
            return cls(convert_file(tflite_path))
        return cls(build_mobilefacenet(), allow_untrained=allow_untrained)

    def _check_trained(self) -> None:
        if not self.is_pretrained and not self.allow_untrained:
            warnings.warn(
                "Face embeddings are computed with RANDOM-INIT MobileFaceNet "
                "weights (mobilefacenet.tflite not found): vectors are not "
                "identity-discriminative and compare_faces results are "
                "meaningless.  Provide the trained model file or pass "
                "allow_untrained=True to acknowledge.",
                UntrainedEmbeddingWarning, stacklevel=3)

    def _batch_program(self):
        """The one jitted crop+net+L2 program ([N] ROIs of one image).

        Shape-independent: jax.jit itself re-traces per (image size, slab)
        — keying a wrapper dict by shape as well just duplicated identical
        programs.  Closes over a MODEL SNAPSHOT, not self.model: tracing
        happens lazily at the first call, by which time a concurrent
        dispose() may have nulled the attribute (the segmentation
        dispatch race, same class).
        """
        if self._programs.get("many") is None:
            model = self.model

            def many(params, img, cxs, cys, sizes, thetas):
                return embed_rois(model.fn, params, img,
                                  cxs, cys, sizes, thetas)

            self._programs["many"] = jax.jit(many)
        return self._programs["many"]

    @staticmethod
    def _check_roi(size: float) -> None:
        """Degenerate eye geometry (coincident/near-coincident eyes) makes
        the aligned crop round to 0 px; the reference's
        extractAlignedSquare returns null there and getFaceEmbedding
        throws (`face_detector_core.dart:433-440`).  Silently embedding a
        1-px clamp would hand compare_faces a structurally valid but
        meaningless vector."""
        if not (size > 0) or int(math.floor(size + 0.5)) < 1:
            raise ValueError(
                "Failed to extract aligned face crop for embedding: eye "
                "points are coincident or too close (crop size rounds "
                "to 0)")

    def embed(self, image: np.ndarray, left_eye, right_eye) -> np.ndarray:
        """L2-normalized embedding from an RGB image + eye centers (px)."""
        if self.model is None:
            raise RuntimeError("FaceEmbedding has been disposed")
        self._check_trained()
        if not isinstance(image, jax.Array):
            # Host arrays upload once here; device-resident inputs pass
            # through untouched (np.asarray on a jax array would pull the
            # whole frame D2H just to re-upload it).
            image = jnp.asarray(np.asarray(image))
        cx, cy, size, theta = compute_embedding_alignment(left_eye, right_eye)
        self._check_roi(size)
        prog = self._batch_program()
        args = (jnp.asarray([v], jnp.float32)
                for v in (cx, cy, size, theta))
        return np.asarray(prog(self.model.params, image, *args))[0]

    def embed_batch(self, image: np.ndarray, eye_pairs) -> np.ndarray:
        """Embeds N faces of ONE image in a single device program.

        ``eye_pairs`` is a sequence of (left_eye, right_eye) pixel points;
        returns [N, 192].  The N crops warp and batch through MobileFaceNet
        together (vs. N dispatches from calling :meth:`embed` in a loop).

        N is padded up to a power-of-two face slab (the detector pipeline's
        own shape-bucketing pattern): a 1..16-face stream compiles at most
        5 programs per image size instead of 16, at the cost of computing
        a few dummy crops (centered unit ROIs) whose rows are sliced away
        before returning.
        """
        if self.model is None:
            raise RuntimeError("FaceEmbedding has been disposed")
        self._check_trained()
        if not isinstance(image, jax.Array):
            image = jnp.asarray(np.asarray(image))  # see embed()
        aligns = [compute_embedding_alignment(le, re)
                  for le, re in eye_pairs]
        for a in aligns:
            self._check_roi(a[2])
        n = len(aligns)
        if n == 0:
            return np.zeros((0, EMBEDDING_DIM), np.float32)
        slab = 1 << (n - 1).bit_length()
        prog = self._batch_program()
        pad = slab - n
        # Padding rows use a benign in-frame ROI (unit square at origin);
        # their embeddings are computed and discarded.
        pads = [(0.0, 0.0, 1.0, 0.0)] * pad
        cxs, cys, sizes, thetas = (jnp.asarray(
            [a[i] for a in aligns] + [p[i] for p in pads], jnp.float32)
            for i in range(4))
        out = prog(self.model.params, image,
                   cxs, cys, sizes, thetas)
        return np.asarray(out)[:n]

    def dispose(self) -> None:
        """Frees programs/weights; later embeds raise
        (`face_embedding.dart:343`)."""
        self._programs = {}
        self.model = None

    # Static helpers mirroring the reference API.
    cosine_similarity = staticmethod(cosine_similarity)
    euclidean_distance = staticmethod(euclidean_distance)
