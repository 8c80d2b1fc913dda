"""FaceDetector — the public orchestration API.

Preserves the reference's `FaceDetector` surface
(`lib/src/face_detector.dart:53`): create/initialize, detectFacesFrom*,
embeddings, segmentation masks, combined detect+segment, gates, temporal
tracking, resetTracking, dispose.  The execution model is inverted per
SURVEY §7: instead of isolates + per-stage interpreter dispatches, each
(image-size, mode) pair gets ONE compiled XLA program over a MAX_FACES
slab, batched across images; the host only decodes images, launches
programs, materializes `Face` objects, and runs the (inherently
sequential) temporal tracker.
"""

from __future__ import annotations

import os
import threading
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..convert.executor import ConvertedModel, convert_file
from ..models.embedding import FaceEmbedding
from ..models.segmentation import SegmentationMask, SelfieSegmentation
from .config import (DEFAULT_MAX_MISSED_FRAMES,
                     DEFAULT_MIN_FACE_PRESENCE_CONFIDENCE, MIN_SCORE,
                     MODEL_FILES, FaceDetectionMode, FaceDetectionModel,
                     SegmentationConfig, SegmentationModel)
from .gates import validate_face_gates
from .programs import PipelineModels, build_pipeline_program
from .timings import DetectTimings
from .tracker import TemporalFaceTracker, validate_tracking_config
from .types import Detection, Face, FaceMesh, RectF

__all__ = ["FaceDetector", "resolve_model_dir"]

_DEFAULT_MODEL_DIRS = (
    # Populated by `python tools/fetch_models.py` (SHA-256-pinned
    # MediaPipe assets) — the standalone default.
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "assets", "models"),
)


_cache_enabled = False


def default_compile_cache_dir(backend: str | None = None) -> str:
    """Resolved persistent-compile-cache directory (FDT_COMPILE_CACHE_DIR
    or ~/.cache/fdt_tpu_xla_<backend>).  Single source for the pipeline
    (_enable_compilation_cache) and `fdt-tpu doctor`, so the self-check
    always reports the directory the pipeline actually uses."""
    if backend is None:
        backend = jax.default_backend()
    return os.environ.get(
        "FDT_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     f"fdt_tpu_xla_{backend}"))


def _enable_compilation_cache() -> None:
    """Turns on JAX's persistent compilation cache (opt out with
    FDT_NO_COMPILE_CACHE=1).  The pipeline compiles one program per
    (image-bucket, mode); caching them on disk makes process restarts and
    benchmark runs skip the 20-40 s TPU compiles."""
    global _cache_enabled
    if _cache_enabled or os.environ.get("FDT_NO_COMPILE_CACHE"):
        return
    try:
        cache_dir = default_compile_cache_dir()
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        # Still mark enabled (retrying per-constructor won't fix a
        # read-only HOME), but say WHY every program will now pay its
        # full 20-240 s TPU compile on each process restart.
        import warnings
        warnings.warn(f"persistent XLA compilation cache disabled: {e!r} "
                      "(set FDT_COMPILE_CACHE_DIR to a writable path)",
                      RuntimeWarning)
    _cache_enabled = True


# Shared with the segmentation entry point; kept importable under the old
# private name for existing callers (serving.py, tests).
from ..utils.image import normalize_channels as _normalize_channels


def _image_from_packed_bytes(data, width: int, height: int, channels: int,
                             channel_order: str) -> np.ndarray:
    """Raw packed pixel buffer -> RGB(A) array (Mat-bytes convention)."""
    buf = np.frombuffer(bytes(data), np.uint8)
    expected = width * height * channels
    if buf.size != expected:
        raise ValueError(
            f"packed buffer holds {buf.size} bytes; {width}x{height}x"
            f"{channels} needs {expected}")
    img = buf.reshape(height, width, channels)
    order = channel_order.lower()
    if order not in ("bgr", "rgb", "bgra", "rgba"):
        raise ValueError(f"unknown channel_order {channel_order!r}")
    if len(order) != channels:
        raise ValueError(
            f"channel_order {channel_order!r} does not match "
            f"channels={channels}")
    if order.startswith("bgr"):
        img = (np.concatenate([img[..., 2::-1], img[..., 3:]], axis=-1)
               if channels == 4 else img[..., ::-1])
    return img


def resolve_model_dir(model_dir: Optional[str] = None) -> str:
    """Finds the directory holding the .tflite model assets."""
    candidates = ([model_dir] if model_dir else []) + \
        [os.environ.get("FDT_TPU_MODEL_DIR")] + list(_DEFAULT_MODEL_DIRS) + \
        [os.environ.get("FDT_REFERENCE_MODEL_DIR")]  # dev-env opt-in;
    # both env knobs are read per call so setting them after import works.
    for c in candidates:
        if c and os.path.isdir(c):
            return c
    raise FileNotFoundError(
        "No model directory found; run `python tools/fetch_models.py` "
        "(SHA-256-pinned download), or set FDT_TPU_MODEL_DIR / pass "
        "model_dir")


class FaceDetector:
    """MediaPipe-style face pipeline, compiled for TPU.

    Equivalent of the reference's `FaceDetector.create()+initialize()`
    (`face_detector.dart:84,297`): loads and converts all models eagerly,
    validates gates/tracking config, and is ready to detect.  Thread-safe
    for detection (compiled programs are pure); tracking state is guarded
    by a lock, mirroring the reference's FIFO sequencing of tracked calls
    (`face_tracker.dart:222-245`).
    """

    MODEL_VERSION = 1  # cache-invalidation analog of `modelVersion`

    def __init__(self,
                 model: FaceDetectionModel = FaceDetectionModel.BACK_CAMERA,
                 *,
                 min_score: float = MIN_SCORE,
                 min_face_size: float = 0.0,
                 min_face_presence_confidence: float =
                 DEFAULT_MIN_FACE_PRESENCE_CONFIDENCE,
                 enable_tracking: bool = False,
                 max_missed_frames: int = DEFAULT_MAX_MISSED_FRAMES,
                 max_faces: int = 16,
                 with_segmentation: bool = False,
                 segmentation_model: SegmentationModel =
                 SegmentationModel.GENERAL,
                 segmentation_config: Optional[SegmentationConfig] = None,
                 model_dir: Optional[str] = None,
                 precision: str = "highest",
                 adaptive: bool = True,
                 bucket_images: bool = False,
                 bucket_batches: bool = True,
                 data_parallel: bool = False,
                 num_candidates: Optional[int] = None,
                 use_pallas_nms: Optional[bool] = None,
                 allow_untrained_embeddings: bool = False,
                 quantized_readback: bool = True,
                 detailed_timings: bool = False,
                 embed_in_full: bool = False,
                 seg_device=None):
        validate_face_gates(min_score, min_face_size,
                            min_face_presence_confidence)
        validate_tracking_config(max_missed_frames)
        _enable_compilation_cache()
        self.model_variant = model
        self.min_score = min_score
        self.min_face_size = min_face_size
        self.min_face_presence_confidence = min_face_presence_confidence
        self.max_faces = max_faces
        self.adaptive = adaptive
        #: NMS candidate cap.  None (default) clusters EVERY anchor above
        #: threshold like the reference (`helpers.dart:183-221`) — there is
        #: no silent top-K truncation in dense crowds.  An int trades
        #: worst-case crowd parity for a smaller on-device NMS.
        self.num_candidates = num_candidates
        #: None = auto-select the measured winner for the backend (the XLA
        #: fixpoint form — measured at parity with the Pallas kernel on
        #: TPU, see benchmarks/results.json nms_*); True forces the Pallas
        #: kernel, False the XLA form.
        self.use_pallas_nms = use_pallas_nms
        #: Pad inputs up to a 256-px size ladder so arbitrary image sizes
        #: share a bounded set of compiled programs.  Off by default: the
        #: padded frame letterboxes slightly differently, so results can
        #: differ from exact-size processing at the sub-pixel level, and
        #: the early min_face_size gate is deferred to the host (the padded
        #: width would over-reject).  Recommended for serving mixed sizes.
        self.bucket_images = bucket_images
        #: Pad the BATCH dimension up to a bucket ladder (powers of two to
        #: 16, then multiples of 16) with zero images, trimmed on device
        #: before readback.  Variable micro-batch sizes (an HTTP batcher
        #: drain, a tail batch of a video) otherwise compile one program
        #: PER observed batch size — 20-240 s each on the relay's compile
        #: service.  Zero-pad rows detect nothing and cannot change real
        #: rows' results (per-image independence, asserted bitwise in
        #: __graft_entry__.dryrun_multichip).
        self.bucket_batches = bucket_batches
        #: Pack the mesh/iris landmark readback as int16 at ~0.08 px
        #: resolution (1280 px frames; mean quantization error ~0.02 px
        #: vs the 1 px parity budget).  Landmarks dominate the packed
        #: readback payload and readback dominates the pipeline
        #: (BENCH_r02); False keeps the full-fp32 readback.
        self.quantized_readback = quantized_readback
        self._model_dir = resolve_model_dir(model_dir)

        if precision == "serving":
            # Measured preset: detector at "mixed" (early half of the
            # convs plain bf16, heads bf16x3; 13.1 vs 18.5 ms/batch conv
            # cost), landmark-bearing models at bf16x3 (0.006 px mesh
            # error).  The mixed tier's contract is KEYPOINT-grade
            # (<=0.5 px across the widened 33-face validation set — what
            # seeds the mesh ROI), not box-corner-grade: blended NMS
            # boxes can move a few px when a borderline candidate flips
            # cluster membership.  See docs/PERF.md "Mixed-precision
            # detector" incl. the frac sweep + bf16x3 control.
            precision = {"detector": "mixed", "mesh": "high",
                         "iris": "high", "blendshapes": "high"}
        self._precision = precision

        def load(file_key: str, prec_key: str) -> ConvertedModel:
            if isinstance(precision, dict):
                # Per-model precision (e.g. {"detector": "default",
                # "mesh": "high"}) — a serving knob for trading detector
                # box exactness for speed while keeping landmark parity.
                prec = precision.get(prec_key, "high")
            else:
                prec = precision
            return convert_file(os.path.join(self._model_dir,
                                             MODEL_FILES[file_key]),
                                precision=prec)

        self._embedding: Optional[FaceEmbedding] = None
        self._allow_untrained_embeddings = allow_untrained_embeddings
        #: Fuse MobileFaceNet into the FULL program: every FULL-mode face
        #: comes back with a 192-dim embedding from the SAME device call
        #: (no separate dispatch, no frame re-upload).  TPU-native
        #: extension of `getFaceEmbedding` (face_detector_core.dart:419).
        #: Constructor-only (read-only property): the compiled-program
        #: cache and models.embedding are built from it, so a
        #: post-construction flip would desync cached vs new image sizes.
        self._embed_in_full = embed_in_full
        self.models = PipelineModels(
            detector=load(model.value, "detector"), variant=model.value,
            mesh=load("face_landmark", "mesh"),
            iris=load("iris_landmark", "iris"),
            blendshapes=load("face_blendshapes", "blendshapes"),
            embedding=(self.embedding_model.model if embed_in_full
                       else None))
        #: Whether the mesh graph emits a presence logit.  Fixed-shape
        #: programs substitute zeros when it doesn't (sigmoid -> 0.5);
        #: the reference's rule is "null meshScore always PASSES the
        #: presence gate" (face_detector_core.dart:101-103), so the
        #: materializer must map the substitute back to None instead of
        #: gating on 0.5.  All stock face_landmark variants do emit it.
        self._mesh_emits_score = any(
            int(np.prod(s)) == 1 for s in self.models.mesh.output_shapes)
        if embed_in_full:
            # The fused stage bypasses FaceEmbedding's per-call check, so
            # surface the untrained-weights state once, at construction.
            self.embedding_model._check_trained()

        #: Segmentation preset (`SegmentationConfig`, face_types.dart:236).
        #: When given, its ``model`` wins over ``segmentation_model``.
        self._segmentation_config = segmentation_config
        #: Chip placement for the segmentation programs — the multi-chip
        #: analog of the reference's dedicated segmentation isolate.
        #: None = same chip (host stages overlap, device compute
        #: serializes); "auto" = the second visible device when one
        #: exists; or an explicit `jax.Device`.  With its own chip the
        #: combined call costs ≈ max(detect, segment), the reference's
        #: dual-isolate behavior (face_detector.dart:1297-1324).
        if seg_device == "auto":
            devs = jax.devices()
            seg_device = devs[1] if len(devs) > 1 else None
        self._seg_device = seg_device
        self._segmentation: Optional[SelfieSegmentation] = None
        #: Remembered for lazy loads too: a detector built with
        #: segmentation_model=LANDSCAPE but with_segmentation=False must
        #: still get LANDSCAPE when the first mask call triggers the load.
        self._segmentation_model = (segmentation_config.model
                                    if segmentation_config is not None
                                    else segmentation_model)
        if with_segmentation or segmentation_config is not None:
            self._load_segmentation(self._segmentation_model)

        #: One-entry decoded-image cache so detect + embed on the same
        #: encoded bytes decodes once (`decodeSourceCached`,
        #: face_detector.dart:1390-1430 — saves ~16 ms at 12 MP there).
        self._decode_cache: Optional[tuple[bytes, np.ndarray]] = None
        self._decode_cache_lock = threading.Lock()
        #: One-entry host->device upload cache (see _device_put_cached).
        self._devput_cache = None
        self._devput_lock = threading.Lock()

        self._tracking_enabled = enable_tracking
        self._tracker = TemporalFaceTracker(
            max_missed_frames=max_missed_frames)
        self._tracker_lock = threading.Lock()
        self._tracking_generation = 0

        #: Data-parallel serving over all attached devices: weights
        #: replicated, the image batch sharded over a 1-D mesh
        #: (parallel/sharding.py).  Uses the fused single-program path
        #: (no host sync mid-pipeline); batches are padded to a multiple
        #: of the mesh size.  No-op with a single device.
        self._mesh = None
        self._params = self.models.params
        if data_parallel:
            import jax as _jax
            if len(_jax.devices()) > 1:
                from ..parallel.sharding import make_mesh, shard_params
                self._mesh = make_mesh()
                # Replicate the weights once; without this every call
                # re-broadcasts the whole pytree to the mesh.  The
                # speculative (adaptive) fast path COMPOSES with the mesh:
                # the fused slab program runs sharded, only det_count (one
                # int/image) crosses to the host, the sticky bucket is the
                # batch max across shards, and the rare overflow re-run
                # dispatches the from_detections program sharded too —
                # multi-chip users keep the reference's early-gating win
                # (face_detector_core.dart:234-244, CHANGELOG 6.6.x
                # 18->7 ms) instead of paying the full max_faces-slot
                # per-face cost on every sharded batch (VERDICT r4 #1).
                self._params = shard_params(self.models.params, self._mesh)

        self._programs: dict[tuple, object] = {}
        #: Guards check-then-insert on _programs: two threads racing the
        #: first call for the same bucket would otherwise each build their
        #: own jitted wrapper and pay the 20-240 s XLA compile twice
        #: (jax's compile cache is keyed by wrapper identity).  Builds
        #: inside the lock are cheap (tracing/compiling happens lazily at
        #: the first call, where jax serializes internally on ONE wrapper).
        self._programs_lock = threading.Lock()
        #: Sticky speculation bucket per (H, W, mode): how many face slots
        #: the fused single-call program runs per-face stages for.  Grown
        #: immediately on overflow, shrunk after a streak of low counts.
        self._spec_state: dict[tuple, dict] = {}
        self._spec_lock = threading.Lock()
        #: Per-device weight copies for replica (device-pinned) serving;
        #: populated by _replica_params, freed in dispose.
        self._replica_params_cache: dict = {}
        self._disposed = False
        #: Per-stage wall-clock timing accumulator (WebDetectTimings analog);
        #: always on — the overhead is two perf_counter() calls per stage.
        self.timings = DetectTimings()
        #: `debugTimings` analog (face_detector_web.dart:33-57): split the
        #: post-dispatch stage into compute_wait + readback.  Costs one
        #: extra host-device sync per batch — keep off in production.
        self.detailed_timings = detailed_timings
        self._init_done = True

    #: Attributes baked into compiled programs at first use.  Mutating
    #: them post-construction would silently desync already-cached
    #: programs from new image sizes (the embed_in_full bug class), so
    #: writes are rejected after __init__ — the reference exposes these
    #: as getters over final fields too (`face_detector.dart:138-158`).
    _PROGRAM_BAKED = frozenset({
        "max_faces", "min_score", "min_face_size", "num_candidates",
        "use_pallas_nms", "bucket_images", "bucket_batches"})

    def __setattr__(self, name, value):
        if name in self._PROGRAM_BAKED and getattr(self, "_init_done",
                                                   False):
            raise AttributeError(
                f"{name} is fixed at construction (compiled programs are "
                "built from it); create a new FaceDetector instead")
        super().__setattr__(name, value)

    # -- lazy submodels --------------------------------------------------------

    def _load_segmentation(self, seg_model: SegmentationModel):
        key = {"general": "segmenter_general",
               "landscape": "segmenter_landscape",
               "multiclass": "segmenter_multiclass"}[seg_model.value]
        path = os.path.join(self._model_dir, MODEL_FILES[key])
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"segmentation model not found: {path} (the multiclass "
                "model ships out-of-repo in the reference too, "
                "pubspec.yaml:46)")
        cfg = self._segmentation_config
        if cfg is not None:
            prec = cfg.precision
        else:
            prec = (self._precision.get("segmentation", "high")
                    if isinstance(self._precision, dict)
                    else self._precision)
        cm = convert_file(path, precision=prec)
        multiclass = seg_model == SegmentationModel.MULTICLASS
        if cfg is None or cfg.validate_model:
            # `selfie_segmentation.dart:424-442`: the loaded graph must
            # emit the channel count the chosen model family implies.
            want = 6 if multiclass else 1
            got = cm.output_shapes[0][-1]
            if got != want:
                raise ValueError(
                    f"segmentation model {path} emits {got} channels; "
                    f"{seg_model.value} expects {want}")
        self._segmentation = SelfieSegmentation(
            cm, multiclass=multiclass,
            mask_dtype=cfg.mask_dtype if cfg else "float32",
            max_output_size=cfg.max_output_size if cfg else 2048)
        if self._seg_device is not None:
            self._segmentation.place_on(self._seg_device)

    @property
    def is_tracking_enabled(self) -> bool:
        """Whether temporal tracking IDs are attached to results
        (`isTrackingEnabled`, face_detector.dart:170)."""
        return self._tracking_enabled

    @property
    def max_missed_frames(self) -> int:
        """Frames a track survives without a match before retirement
        (`maxMissedFrames`, face_detector.dart:177)."""
        return self._tracker.max_missed_frames

    @property
    def embed_in_full(self) -> bool:
        """Whether MobileFaceNet rides the fused FULL program (read-only:
        compiled programs and models.embedding are built from the
        constructor value, so flipping it afterwards would desync cached
        image sizes from new ones)."""
        return self._embed_in_full

    def _embedding_weight_path(self) -> Optional[str]:
        """First installed trained-weight source for MobileFaceNet, or
        None (-> RANDOM-INIT weights, recognition cannot discriminate)."""
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        candidates = (
            os.path.join(self._model_dir, MODEL_FILES["embedding"]),
            # `python tools/import_weights.py mobilefacenet` output —
            # trained weights imported from a user-supplied checkpoint
            # reach the detector with zero code.
            os.path.join(self._model_dir, "mobilefacenet.npz"),
            os.path.join(pkg, "assets", "checkpoints", "mobilefacenet.npz"),
        )
        return next((c for c in candidates if os.path.exists(c)), None)

    @property
    def is_embedding_pretrained(self) -> bool:
        """Whether trained MobileFaceNet weights back the embedding path.
        False means the architecture runs with RANDOM-INIT weights —
        structurally complete, but embeddings cannot discriminate
        identities (the reference ships trained weights:
        face_embedding.dart:46, pubspec.yaml:45).  Surfaced in /v1/info,
        /v1/embed and `fdt-tpu doctor`."""
        if self._embedding is not None:
            return self._embedding.is_pretrained
        return self._embedding_weight_path() is not None

    @property
    def embedding_model(self) -> FaceEmbedding:
        if self._embedding is None:
            self._embedding = FaceEmbedding.load(
                self._embedding_weight_path(),
                allow_untrained=self._allow_untrained_embeddings)
        return self._embedding

    # -- detection -------------------------------------------------------------

    def _resolve_pallas_nms(self) -> bool:
        if self.use_pallas_nms is not None:
            return self.use_pallas_nms
        # Auto: measured INSIDE the fused FAST program at batch 16, the
        # XLA fixpoint runs 2x faster than the Pallas kernel (16.2 vs
        # 33.8 ms/batch, identical outputs) — vmap serializes per-image
        # pallas_calls while the fixpoint batches across images.  See
        # docs/PERF.md "NMS decision".
        return False

    def _program(self, img_h: int, img_w: int, mode: FaceDetectionMode,
                 face_slab: Optional[int] = None):
        self._check_disposed()
        if face_slab is not None and face_slab >= self.max_faces:
            face_slab = None
        key = (img_h, img_w, mode, face_slab)
        with self._programs_lock:
            if key not in self._programs:
                # In bucketed mode the device-side width gate would measure
                # against the padded width and over-reject; defer it to the
                # host safety-net gate in _materialize.
                mfs = 0.0 if self.bucket_images else self.min_face_size
                program = build_pipeline_program(
                    self.models, img_h, img_w, mode,
                    max_faces=self.max_faces,
                    min_score=self.min_score, min_face_size=mfs,
                    num_candidates=self.num_candidates,
                    use_pallas_nms=self._resolve_pallas_nms(),
                    face_slab=face_slab,
                    with_embeddings=(self._embed_in_full and
                                     mode == FaceDetectionMode.FULL))
                if self._mesh is not None:
                    from ..parallel.sharding import data_parallel as _dp
                    self._programs[key] = _dp(program, self._mesh)
                else:
                    self._programs[key] = jax.jit(program)
            return self._programs[key]

    #: Absolute-pixel landmark slabs eligible for int16 readback packing.
    _QUANT_KEYS = frozenset({"mesh", "iris"})

    def _readback_scale(self, img_h: int, img_w: int) -> Optional[float]:
        """px -> int16 scale for quantized landmark readback, or None.

        Landmark coordinates are absolute pixels; a margin of 2x the
        longer image side covers every plausible out-of-frame excursion
        of a rotated ROI.  At 1280 px the scale is 12.5 (resolution
        0.08 px, mean quantization error ~0.02 px — two orders inside
        the 1 px parity budget).  Images past 4000 px would drop the
        resolution below 0.25 px, so they fall back to fp32 readback.
        """
        if not self.quantized_readback:
            return None
        scale = 32000.0 / (2.0 * max(img_h, img_w))
        return scale if scale >= 4.0 else None

    @staticmethod
    def _readback_encoding(name: str, dtype, quant_scale) -> str:
        if dtype == jnp.bool_:
            return "u8"
        if jnp.issubdtype(dtype, jnp.integer):
            return "i32"
        if quant_scale and name in FaceDetector._QUANT_KEYS:
            return "i16"
        return "f32"

    def _fetch_async(self, out: dict, quant_scale: Optional[float] = None):
        """Starts materializing a device slab dict: packs every output
        into ONE byte buffer on device (per-array pulls pay a full
        round-trip latency each over remote-attached TPUs) and kicks off
        the device->host copy asynchronously, so the transfer overlaps
        whatever the host (or the next batch's programs) does before
        :meth:`_fetch_finish` blocks on it.

        Packing is byte-exact per dtype (fp32/int32 bitcast to bytes,
        bool as one byte) except the large absolute-pixel landmark slabs
        (mesh/iris), which quantize to int16 at ``quant_scale`` px^-1
        when given — readback is the measured pipeline bottleneck
        (BENCH_r02: 51.4 of ~61 ms/batch) and the landmark payload
        dominates it; see docs/PERF.md "Readback packing"."""
        # 4-byte sections first, then 2-byte, then 1-byte: every section
        # offset stays naturally aligned for the host-side .view calls.
        _rank = {"f32": 0, "i32": 1, "i16": 2, "u8": 3}
        entries = sorted(
            ((self._readback_encoding(k, v.dtype, quant_scale), k, v)
             for k, v in out.items()),
            key=lambda e: (_rank[e[0]], e[1]))
        encs = [e[0] for e in entries]
        names = [e[1] for e in entries]
        leaves = [e[2] for e in entries]
        key = ("pack", quant_scale,
               tuple((k, v.shape, str(v.dtype), e)
                     for k, v, e in zip(names, leaves, encs)))
        with self._programs_lock:
            packer = self._programs.get(key)
            if packer is None:
                def pack(ls):
                    segs = []
                    for x, enc in zip(ls, encs):
                        x = x.reshape(x.shape[0], -1)
                        if enc == "u8":
                            segs.append(x.astype(jnp.uint8))
                            continue
                        if enc == "i16":
                            x = jnp.clip(jnp.round(x * quant_scale),
                                         -32767.0, 32767.0).astype(jnp.int16)
                        elif enc == "i32":
                            x = x.astype(jnp.int32)
                        else:
                            x = x.astype(jnp.float32)
                        segs.append(jax.lax.bitcast_convert_type(
                            x, jnp.uint8).reshape(x.shape[0], -1))
                    return jnp.concatenate(segs, axis=1)

                packer = jax.jit(pack)
                self._programs[key] = packer
        buf = packer(leaves)
        try:
            buf.copy_to_host_async()
        except Exception:
            pass  # backends without async copy just block in finish
        return (buf, names, [(v.shape, e) for v, e in zip(leaves, encs)],
                quant_scale)

    @staticmethod
    def _fetch_finish(handle) -> dict:
        """Blocks on a :meth:`_fetch_async` handle and unpacks it."""
        buf, names, metas, quant_scale = handle
        host = np.asarray(buf)
        result = {}
        off = 0
        for k, (shape, enc) in zip(names, metas):
            n = int(np.prod(shape[1:]))
            if enc == "u8":
                result[k] = (host[:, off:off + n] > 0).reshape(shape)
                off += n
            elif enc == "i16":
                result[k] = (host[:, off:off + 2 * n].view(np.int16)
                             .astype(np.float32) / quant_scale
                             ).reshape(shape)
                off += 2 * n
            elif enc == "i32":
                result[k] = host[:, off:off + 4 * n].view(
                    np.int32).reshape(shape)
                off += 4 * n
            else:
                result[k] = host[:, off:off + 4 * n].view(
                    np.float32).reshape(shape)
                off += 4 * n
        return result

    def _fetch(self, out: dict, quant_scale: Optional[float] = None) -> dict:
        """One-transfer materialization of a device slab dict."""
        return self._fetch_finish(self._fetch_async(out, quant_scale))

    def _face_stage_program(self, img_h: int, img_w: int,
                            mode: FaceDetectionMode):
        key = (img_h, img_w, mode, "stage")
        with self._programs_lock:
            if key not in self._programs:
                program = build_pipeline_program(
                    self.models, img_h, img_w, mode, from_detections=True,
                    with_embeddings=(self._embed_in_full and
                                     mode == FaceDetectionMode.FULL))
                if self._mesh is not None:
                    # The speculative overflow re-run shards like the main
                    # program: images + the four detection-slab args all
                    # partition on the batch axis (the slabs are already
                    # device-resident shards from the sharded dispatch).
                    from ..parallel.sharding import data_parallel as _dp
                    self._programs[key] = _dp(program, self._mesh,
                                              n_batch_args=5)
                else:
                    self._programs[key] = jax.jit(program)
            return self._programs[key]

    # -- speculative single-call dispatch ---------------------------------

    def _speculation_bucket(self, h: int, w: int,
                            mode: FaceDetectionMode) -> int:
        with self._spec_lock:
            st = self._spec_state.get((h, w, mode))
            return st["bucket"] if st else min(1, self.max_faces)

    def _note_face_count(self, h: int, w: int, mode: FaceDetectionMode,
                         n: int) -> None:
        """Sticky bucket adaptation: grow immediately to cover ``n``,
        shrink only after 8 consecutive batches at <= half the bucket
        (so one sparse frame doesn't thrash recompiles)."""
        want = 1
        while want < n:
            want *= 2
        want = min(want, self.max_faces)
        with self._spec_lock:
            st = self._spec_state.setdefault(
                (h, w, mode), {"bucket": min(1, self.max_faces), "low": 0})
            if want > st["bucket"]:
                st["bucket"] = want
                st["low"] = 0
            elif want <= st["bucket"] // 2:
                st["low"] += 1
                if st["low"] >= 8:
                    st["bucket"] = max(st["bucket"] // 2, 1)
                    st["low"] = 0
            else:
                st["low"] = 0

    def _detect_adaptive(self, images, mode: FaceDetectionMode,
                         _predispatched=None, real_b: Optional[int] = None):
        """Speculative single-call dispatch with sticky face buckets.

        ONE fused program computes detection (full max_faces NMS slab) and
        the per-face stages on a small score-ordered slab prefix; only
        when an image has more faces than the speculated bucket does a
        second dispatch run the face stages on a bigger prefix (reusing
        the device-resident detections).  This is the TPU analog of the
        reference's early gating (CHANGELOG 6.6.x: gating a 4-face slab
        to 1 face cut full mode 18 -> 7 ms) without the mid-pipeline host
        round trip the round-1 two-phase path paid (docs/PERF.md).
        """
        handle = (_predispatched if _predispatched is not None else
                  self._dispatch_speculative(images, mode, real_b=real_b))
        return self._finish_speculative(images, handle, mode)

    def _dispatch_speculative(self, images, mode: FaceDetectionMode,
                              params=None, real_b: Optional[int] = None):
        """Dispatches the fused speculative program AND its packed
        device->host copy (both non-blocking), so a pipelined caller
        overlaps this batch's readback with the next batch's compute.
        Returns an opaque (bucket, device slab, fetch handle, params,
        real_b) tuple; ``params`` overrides the default-device weights
        for replica (device-pinned) dispatch.  ``real_b`` is the true
        (pre-pad) batch size when the caller batch-bucket-padded
        ``images``: pad rows are then sliced off ON DEVICE before the
        packed readback, so their bytes never cross the relay (readback
        is the measured bottleneck, BENCH_r02)."""
        if params is None:
            params = self._params
        b, h, w, _ = images.shape
        if self._mesh is not None:
            # Explicit placement (like _dispatch_full) so the sharded
            # program doesn't pay an implicit host->mesh transfer per
            # call.  _prepare_batch already padded the batch to a mesh
            # multiple.
            from ..parallel.sharding import shard_batch
            images = shard_batch(images, self._mesh)
        bucket = self._speculation_bucket(h, w, mode)
        with self.timings.stage(f"dispatch[slab{bucket}]"):
            det = self._program(h, w, mode, face_slab=bucket)(
                params, images)
        # Only det_count crosses to the host on the common path; the full
        # det_* overflow slab stays device-resident in ``det`` (the
        # overflow re-run reads it there).  BENCH_r02 measured the full
        # slab in the packed readback as the single largest payload the
        # host then discarded unread.
        fetch = {k: v for k, v in det.items()
                 if k == "det_count" or not k.startswith("det_")}
        if real_b is not None and real_b < b:
            fetch = {k: v[:real_b] for k, v in fetch.items()}
        return bucket, det, self._fetch_async(
            fetch, self._readback_scale(h, w)), params, real_b

    def _finish_speculative(self, images, handle, mode: FaceDetectionMode):
        """Blocks on a speculative dispatch; re-runs the face stages on a
        wider slab iff an image overflowed the speculated bucket."""
        bucket, det, fetch, params, real_b = handle
        _, h, w, _ = images.shape
        # The wait on device compute and the device->host pull, timed as
        # ONE stage by default.  Splitting them (detailed_timings=True,
        # the reference's `debugTimings` analog) is honest attribution —
        # round 2 labeled the whole thing "readback" and mis-pointed an
        # optimization round at the transfer payload (docs/PERF.md) —
        # but the extra block_until_ready sync costs a full host-device
        # round trip (~20 ms on relay-attached TPUs, measured: pipelined
        # stream 445 -> 263 img/s), so the default path must not pay it.
        if self.detailed_timings:
            with self.timings.stage("compute_wait"):
                try:
                    jax.block_until_ready(fetch[0])
                except Exception:
                    pass  # backends without host-side blocking
            with self.timings.stage("readback"):
                out = self._fetch_finish(fetch)
        else:
            with self.timings.stage("compute_readback"):
                out = self._fetch_finish(fetch)
        if mode == FaceDetectionMode.FAST:
            return out
        if "det_count" in out:
            n = int(out["det_count"].max())
        else:  # non-speculative program (bucket == max_faces): no overflow
            n = int(out["valid"].sum(axis=1).max())
        self._note_face_count(h, w, mode, n)
        if "det_count" not in out or n <= bucket:
            out.pop("det_count", None)
            return out
        # Overflow: face stages on the covering power-of-two prefix, from
        # the device-resident detect slab (no second detector pass).
        nb = 1
        while nb < n:
            nb *= 2
        nb = min(nb, self.max_faces)
        with self.timings.stage(f"face_stages[{nb}]"):
            out2 = self._face_stage_program(h, w, mode)(
                params, images,
                det["det_boxes"][:, :nb], det["det_raw_keypoints"][:, :nb],
                det["det_scores"][:, :nb], det["det_valid"][:, :nb])
        if real_b is not None and real_b < images.shape[0]:
            # Same on-device pad-row trim as the primary readback: the
            # overflow re-run ran on the padded batch (shapes must match
            # the dispatched det slab), but pad rows stay off the wire.
            out2 = {k: v[:real_b] for k, v in out2.items()}
        with self.timings.stage("face_readback"):
            return self._fetch(out2, self._readback_scale(h, w))

    def warmup(self, image_shape: tuple, batch_size: int = 1,
               modes: Optional[Sequence[FaceDetectionMode]] = None,
               devices: Optional[Sequence] = None) -> None:
        """Pre-compiles the programs for an (H, W) bucket so the first real
        request doesn't pay compile latency (a serving-startup nicety; the
        persistent compile cache makes this fast on restarts).

        Default warms ALL THREE modes — a serving process that only ever
        calls STANDARD must not pay a surprise first-hit compile because
        the default warmed something else (VERDICT r1 weak #8).

        ``devices`` additionally warms the replica (device-pinned) path
        per chip: jit executables are specialized per device placement,
        so a ReplicaPool's non-default chips would otherwise pay their
        (cache-assisted) compile on their first live batch.  Warms the
        main dispatch/finish path per chip; the rare overflow re-run
        program warms on the default device only.
        """
        h, w = image_shape[:2]
        if self.bucket_images:
            h, w = self._bucket(h), self._bucket(w)
        dummy = jnp.zeros((batch_size, h, w, 3), jnp.uint8)
        for mode in modes or (FaceDetectionMode.FAST,
                              FaceDetectionMode.STANDARD,
                              FaceDetectionMode.FULL):
            if self.adaptive and mode != FaceDetectionMode.FAST:
                # Compile the speculative fused program at the current
                # bucket, plus the overflow face-stage program (a zero
                # image detects nothing, so a plain detect call would
                # never reach it).  The overflow rerun only fires when
                # n > bucket >= 1, so its smallest reachable slab is 2 —
                # warm THAT shape (a 1-face warm would be a dead trace;
                # jit recompiles per slab width).  Deeper ladder widths
                # (4, 8, ...) still compile on first hit.
                self.detect_faces_batch(dummy, mode)
                prog = self._face_stage_program(h, w, mode)
                # Warm at the PADDED batch the live overflow re-run will
                # see (batch-bucket ladder, rounded to a mesh multiple
                # under data_parallel — _finish_speculative receives
                # _prepare_batch output).
                b = self._batch_pad_target(dummy.shape[0])
                warm_imgs = (jnp.pad(dummy, ((0, b - dummy.shape[0]),
                                             (0, 0), (0, 0), (0, 0)))
                             if b != dummy.shape[0] else dummy)
                nf = min(2, self.max_faces)
                boxes = jnp.tile(jnp.asarray(
                    [[[0.3, 0.3, 0.7, 0.7]]], jnp.float32), (b, nf, 1))
                kp = jnp.tile(jnp.asarray(
                    [[[[0.4, 0.45], [0.6, 0.45], [0.5, 0.55], [0.5, 0.62],
                       [0.33, 0.46], [0.67, 0.46]]]], jnp.float32),
                    (b, nf, 1, 1))
                scores = jnp.full((b, nf), 0.9, jnp.float32)
                valid = jnp.ones((b, nf), jnp.bool_)
                # Use the PRODUCTION readback scale: warming the fp32
                # packer while serving uses the quantized one would leave
                # the first real overflow paying a cold packer compile.
                self._fetch(prog(self._params, warm_imgs, boxes, kp,
                                 scores, valid),
                            self._readback_scale(h, w))
            else:
                self.detect_faces_batch(dummy, mode)
        for d in devices or ():
            self._replica_params(d)
            pinned = np.zeros((batch_size, h, w, 3), np.uint8)
            for mode in modes or (FaceDetectionMode.FAST,
                                  FaceDetectionMode.STANDARD,
                                  FaceDetectionMode.FULL):
                self._stream_finish(
                    self._stream_dispatch(pinned, mode, device=d), mode)

    def detect_faces(self, image: np.ndarray,
                     mode: FaceDetectionMode = FaceDetectionMode.FULL
                     ) -> list[Face]:
        """Detects faces in one RGB image ([H, W, 3], uint8 or 0..255 float).

        Equivalent of `detectFacesFromBytes` minus the decode
        (`face_detector.dart:477`); use `detect_faces_from_bytes` /
        `detect_faces_from_filepath` for encoded inputs.
        """
        gen0 = self._tracking_generation  # snapshot BEFORE the detection
        arr = image if isinstance(image, jax.Array) else np.asarray(image)
        if arr.ndim == 3 and arr.shape[-1] in (1, 3, 4):
            # Upload-once path: a follow-up embed/segment on the same
            # frame reuses the device copy (see _device_put_cached).
            arr = self._device_put_cached(arr)
        faces_batch = self.detect_faces_batch(arr[None], mode)
        return self._attach_tracking(faces_batch[0], gen0)

    def _attach_tracking(self, faces, gen_snapshot: int):
        """Feeds one frame's faces to the tracker and attaches IDs.

        ``gen_snapshot`` must be read before the detection started: a frame
        in flight when reset_tracking() is called belongs to the discarded
        stream, so it must neither carry IDs NOR pollute the fresh tracker
        state (face_tracker.dart:211-214 generation semantics).
        """
        if not self._tracking_enabled:
            return faces
        with self._tracker_lock:
            if gen_snapshot != self._tracking_generation:
                return faces  # stale stream: skip the update entirely
            ids = self._tracker.update(
                [[f.bounding_box.xmin, f.bounding_box.ymin,
                  f.bounding_box.xmax, f.bounding_box.ymax]
                 for f in faces])
            return [f.with_tracking_id(i) for f, i in zip(faces, ids)]

    def detect_faces_batch(self, images: np.ndarray,
                           mode: FaceDetectionMode = FaceDetectionMode.FULL,
                           *, _orig_sizes=None,
                           _predispatched=None,
                           _prepared=None) -> list[list[Face]]:
        """Batched detection: [B, H, W, 3] -> list of per-image Face lists.

        The TPU-native throughput path (no reference analog — the reference
        is strictly one image per call).  Tracking is not applied (it is a
        per-stream, sequential concept).  ``_orig_sizes`` (internal) carries
        per-image (w, h) when the caller pre-padded mixed-size images into
        one bucket; ``_predispatched`` (internal) carries an already
        dispatched detect-slab handle for these exact images so multi-bucket
        callers can overlap detect dispatches before the first readback;
        ``_prepared`` (internal) carries that caller's _prepare_batch
        output so the normalize+pad device ops aren't dispatched twice
        per group (each relay dispatch costs ~2 ms).
        """
        self._check_disposed()
        prep = (_prepared if _prepared is not None
                else self._prepare_batch(images))
        if prep is None:
            return []
        images, b, (w, h) = prep
        bh, bw = images.shape[1], images.shape[2]
        orig_sizes = (_orig_sizes if _orig_sizes is not None
                      else [(w, h)] * b)
        if self.adaptive:
            out = self._detect_adaptive(images, mode,
                                        _predispatched=_predispatched,
                                        real_b=b)
            if next(iter(out.values())).shape[0] > b:
                out = {k: v[:b] for k, v in out.items()}  # batch-bucket pad
        else:
            handle, _ = self._dispatch_full(images, mode)
            if next(iter(handle.values())).shape[0] > b:
                # Trim batch-bucket + data-parallel padding rows ON
                # DEVICE: fetching first would pack and transfer the pad
                # fraction of the slab (readback is the measured
                # bottleneck) only to discard it on the host.
                handle = {k: v[:b] for k, v in handle.items()}
            out = self._fetch(handle, self._readback_scale(bh, bw))
        return self._postprocess_slab(out, b, bh, bw, orig_sizes, mode)

    def _prepare_batch(self, raw):
        """Channel-normalizes and bucket-pads one batch (shared by the
        batch and stream paths — keep the padding rule in ONE place).
        Returns (images, b, (w, h)) with (w, h) the pre-pad per-image
        size, or None for an empty batch.

        The pad goes bottom/right: pixel coordinates of the content are
        unchanged, so mesh/iris (pixel-space) outputs need no fixup;
        normalized boxes/keypoints are rescaled in _postprocess_slab."""
        images = _normalize_channels(raw)
        b, h, w, _ = images.shape
        if b == 0:
            return None
        pad_rows = self._batch_pad_target(b) - b
        if self.bucket_images:
            hb, wb = self._bucket(h), self._bucket(w)
        else:
            hb, wb = h, w
        if (pad_rows, hb, wb) != (0, h, w):
            images = jnp.pad(
                images,
                ((0, pad_rows), (0, hb - h), (0, wb - w), (0, 0)))
        return images, b, (w, h)

    def _dispatch_full(self, images, mode: FaceDetectionMode, params=None):
        """Dispatches the single fused program (non-adaptive path),
        applying data-parallel batch padding + sharding when a mesh is
        configured.  Returns (device handle, pad rows to trim)."""
        if params is None:
            params = self._params
        b = images.shape[0]
        pad_b = 0
        if self._mesh is not None:
            n = int(self._mesh.devices.size)
            pad_b = (-b) % n
            if pad_b:
                images = jnp.concatenate(
                    [images, jnp.zeros((pad_b,) + images.shape[1:],
                                       images.dtype)])
            from ..parallel.sharding import shard_batch
            images = shard_batch(images, self._mesh)
        prog = self._program(images.shape[1], images.shape[2], mode)
        return prog(params, images), pad_b

    def _postprocess_slab(self, out, b, bh, bw, orig_sizes, mode
                          ) -> list[list[Face]]:
        """Rescales normalized outputs from the (possibly padded) frame
        back to each image's own dimensions and builds Face objects."""
        # Fast/standard programs no longer emit the "keypoints" duplicate
        # (identical to raw_keypoints until iris refinement) — alias it
        # back for the materializer.
        out.setdefault("keypoints", out["raw_keypoints"])
        sx = np.asarray([bw / ow for ow, _ in orig_sizes], np.float32)
        sy = np.asarray([bh / oh for _, oh in orig_sizes], np.float32)
        if not (np.all(sx == 1.0) and np.all(sy == 1.0)):
            out["boxes"] = out["boxes"] * np.stack(
                [sx, sy, sx, sy], axis=1)[:, None, :]
            kp_scale = np.stack([sx, sy], axis=1)[:, None, None, :]
            for key in ("keypoints", "raw_keypoints"):
                out[key] = out[key] * kp_scale
        return [self._materialize(out, i, orig_sizes[i], mode)
                for i in range(b)]

    def detect_faces_batch_stream(self, batches,
                                  mode: FaceDetectionMode =
                                  FaceDetectionMode.FULL,
                                  *, depth: int = 1,
                                  devices: Optional[Sequence] = None):
        """Software-pipelined detection over an iterable of image batches.

        Yields one ``list[list[Face]]`` per input batch, in order, while
        keeping up to ``depth`` later batches' detect programs in flight —
        batch N+1's detection is dispatched before batch N's face stages
        block.  The win is the host-side gap time (materialize/numpy work
        between calls): measured 1-11% on a busy relay-attached chip where
        the device rarely idles; grows with host post-processing cost.
        Tracking is not applied (per-stream concept); no reference
        counterpart (the reference is one image per isolate round-trip).

        Batches may be numpy or device arrays of shape [B, H, W, 3]; all
        images within a batch share a shape, different batches may differ
        (each (H, W) compiles once).

        ``devices`` rotates consecutive batches over per-chip weight
        replicas (results stay in order; ``depth`` is raised to cover the
        rotation so every chip holds one batch in flight) — the
        generator-shaped sibling of :class:`~..parallel.replica.ReplicaPool`.
        """
        self._check_disposed()
        if depth < 1:
            raise ValueError("depth must be >= 1")
        if devices:
            if self._mesh is not None:
                raise ValueError(
                    "devices= replica rotation cannot be combined with "
                    "data_parallel=True (which shards each batch across "
                    "the mesh instead — pick one shape)")
            devices = list(devices)
            depth = max(depth, len(devices))
            for d in devices:
                self._replica_params(d)  # materialize before dispatching
        import collections
        pending: collections.deque = collections.deque()
        for i, raw in enumerate(batches):
            dev = devices[i % len(devices)] if devices else None
            pending.append(self._stream_dispatch(raw, mode, device=dev))
            if len(pending) > depth:
                yield self._stream_finish(pending.popleft(), mode)
        while pending:
            yield self._stream_finish(pending.popleft(), mode)

    def _replica_params(self, device):
        """Per-device copy of the weight pytree, cached (≈12 MB/device).

        Replica serving (`parallel/replica.ReplicaPool`) runs the SAME
        compiled programs on several chips concurrently — the reference's
        isolate-pool shape — so each chip needs a resident weight copy.
        """
        with self._programs_lock:
            # Disposed check INSIDE the lock: dispose() sets _disposed
            # before clearing this cache under the same lock, so a racing
            # caller either raises here or its insert is wiped by the
            # clear — never a cached device_put(None) or a weight copy
            # surviving dispose.
            self._check_disposed()
            cache = self._replica_params_cache
            if device not in cache:
                cache[device] = jax.device_put(self._params, device)
            return cache[device]

    def _stream_dispatch(self, raw, mode: FaceDetectionMode, device=None,
                         orig_sizes=None):
        """Prepares a batch and dispatches its first-phase program
        (non-blocking).  Returns an opaque handle for
        :meth:`_stream_finish`; None marks an empty batch.

        ``device`` pins this batch's compute to one chip (weights from
        :meth:`_replica_params`); incompatible with ``data_parallel``
        (which shards each batch over the whole mesh instead).
        ``orig_sizes`` carries per-image (w, h) when the caller
        pre-padded mixed-size images into one shared bucket (the serving
        executors' mixed-size consolidation) — coordinates rescale to
        each image's own size in :meth:`_stream_finish`."""
        self._check_disposed()
        prep = self._prepare_batch(raw)
        if prep is None:
            return None
        images, b, wh = prep
        params = None
        if device is not None:
            if self._mesh is not None:
                raise ValueError(
                    "device-pinned dispatch is incompatible with "
                    "data_parallel=True (one shards batches across "
                    "chips, the other replicates per chip)")
            images = jax.device_put(images, device)
            params = self._replica_params(device)
        pad_b = 0
        if self.adaptive:
            det = self._dispatch_speculative(images, mode, params=params,
                                             real_b=b)
        else:
            with self.timings.stage("dispatch"):
                det, pad_b = self._dispatch_full(images, mode,
                                                 params=params)
        return (images, det, pad_b, b, images.shape[1], images.shape[2],
                list(orig_sizes) if orig_sizes is not None else [wh] * b)

    def _stream_finish(self, item, mode: FaceDetectionMode
                       ) -> list[list[Face]]:
        """Blocks on a :meth:`_stream_dispatch` handle and builds faces."""
        if item is None:  # order-preserving marker for an empty batch
            return []
        images, det, pad_b, b, bh, bw, orig_sizes = item
        if self.adaptive:
            out = self._finish_speculative(images, det, mode)
            if next(iter(out.values())).shape[0] > b:
                out = {k: v[:b] for k, v in out.items()}  # batch-bucket pad
        else:
            if next(iter(det.values())).shape[0] > b:
                # On-device trim of batch-bucket/data-parallel pad rows
                # before the packed readback (see detect_faces_batch).
                det = {k: v[:b] for k, v in det.items()}
            out = self._fetch(det, self._readback_scale(bh, bw))
        return self._postprocess_slab(out, b, bh, bw, orig_sizes, mode)

    def _batch_pad_target(self, b: int) -> int:
        """Post-pad batch size: the bucket-ladder size (when
        bucket_batches), rounded up to a mesh multiple under
        data_parallel — so BOTH dispatch paths (full and speculative)
        receive shardable batches from _prepare_batch."""
        t = self._batch_bucket(b) if self.bucket_batches else b
        if self._mesh is not None:
            n = int(self._mesh.devices.size)
            t += (-t) % n
        return t

    @staticmethod
    def _batch_bucket(b: int) -> int:
        """Batch-size ladder: 1,2,4,8,16,32,48,... (pow2 to 16, then
        multiples of 16) — bounds both compile count and pad waste."""
        if b > 16:
            return -(-b // 16) * 16
        n = 1
        while n < b:
            n *= 2
        return n

    @staticmethod
    def _bucket(v: int, step: int = 256) -> int:
        """Rounds an image dimension up to the bucket ladder so arbitrary
        input sizes map to a bounded set of compiled programs."""
        return max(step, int(-(-v // step) * step))

    def _materialize(self, out, i: int, size_wh, mode) -> list[Face]:
        """Slab -> Face objects, applying the presence gate
        (face_detector_core.dart:331-353) and preserving slab order."""
        faces: list[Face] = []
        valid = out["valid"][i]
        full = mode == FaceDetectionMode.FULL
        has_mesh = mode != FaceDetectionMode.FAST
        for d in range(valid.shape[0]):
            if not valid[d]:
                continue
            mesh_score = (float(out["mesh_scores"][i, d])
                          if has_mesh and self._mesh_emits_score else None)
            # Null meshScore always PASSES (face_detector_core.dart:
            # 101-103): a score-less mesh graph must not gate on the
            # program's 0.5 zero-substitute.
            if (mesh_score is not None
                    and self.min_face_presence_confidence > 0.0
                    and mesh_score < self.min_face_presence_confidence):
                continue
            det = Detection(
                bounding_box=RectF(*map(float, out["boxes"][i, d])),
                score=float(out["scores"][i, d]),
                keypoints_xy=out["keypoints"][i, d],
            )
            # Late safety-net gate (applyFaceGates, face_gates.dart:84):
            # identical arithmetic to the early device gate; load-bearing
            # in bucketed mode where the early width gate is deferred.
            # Pure numpy — a jnp call here would pay one device round trip
            # per face.
            if self.min_face_size > 0.0:
                iw = float(size_wh[0])
                left = float(out["boxes"][i, d][0]) * iw
                right = float(out["boxes"][i, d][2]) * iw
                visible = min(right, iw) - max(left, 0.0)
                frac = visible / iw if (visible > 0 and iw > 0) else 0.0
                if frac < self.min_face_size:
                    continue
            mesh = (FaceMesh(out["mesh"][i, d], score=mesh_score)
                    if has_mesh else None)
            bs = None
            if full and bool(out["blendshapes_valid"][i, d]):
                bs = out["blendshapes"][i, d]
            faces.append(Face(
                detection=det, mesh=mesh,
                irises=out["iris"][i, d] if full else np.zeros((0, 3)),
                original_size=size_wh, blendshape_scores=bs,
                embedding=(np.asarray(out["embeddings"][i, d])
                           if "embeddings" in out else None),
                # The fused program already solved the head pose (f32
                # exact in the packed readback, pinned equal to the host
                # solve) — consume it instead of re-deriving per access.
                head_angles=(out["head_angles"][i, d] if full else None)))
        return faces

    # -- encoded / file inputs -------------------------------------------------

    def _decode_cached(self, data: bytes) -> np.ndarray:
        """One-entry decode cache: detect + embed (or detect + segment) on
        the SAME encoded bytes decodes once (`decodeSourceCached`,
        face_detector.dart:1390-1430)."""
        data = bytes(data)
        with self._decode_cache_lock:
            cached = self._decode_cache
            if cached is not None and cached[0] == data:
                return cached[1]
        from ..utils.image import decode_image
        img = decode_image(data)
        with self._decode_cache_lock:
            self._decode_cache = (data, img)
        return img

    def _device_put_cached(self, arr: np.ndarray):
        """One-entry host->device upload cache: detect + embed (or
        + segment) on the SAME decoded frame uploads it once.

        The TPU analog of the reference's decode-reuse cache
        (face_detector.dart:1390-1430, "saves ~16 ms at 12 MP"): on
        remote-attached devices a 1280x853 upload costs ~90 ms
        (benchmarks/results.json `h2d_single_image`), and the
        detect->embed flow otherwise pays it twice.

        A hit requires the SAME ndarray object (identity — the cache
        entry holds a reference, so the id cannot be recycled) plus a
        strided-sample adler32 sentinel (~64 KB of the frame, ~50 us)
        guarding against in-place mutation of a reused caller buffer
        (camera ring buffers).  The sentinel samples roughly every 50th
        byte: an in-place edit confined to unsampled bytes is not
        caught — reuse with strict semantics should pass a fresh array
        or the encoded-bytes entry points (whose cache keys on the
        immutable bytes).  A full-frame checksum was measured at
        1-3 ms/frame — a real tax on pure-detection camera loops that
        never embed/segment, which is why only a sample is hashed.
        """
        import zlib
        if isinstance(arr, jax.Array):
            return arr  # already device-resident
        arr = np.ascontiguousarray(arr)

        def sentinel(a: np.ndarray) -> int:
            flat = a.reshape(-1).view(np.uint8)
            step = max(1, flat.size // 65536)
            return zlib.adler32(np.ascontiguousarray(flat[::step]))

        with self._devput_lock:
            cached = self._devput_cache
            if (cached is not None and cached[0] is arr
                    and cached[1] == sentinel(arr)):
                return cached[2]
        dev = jnp.asarray(arr)
        with self._devput_lock:
            self._devput_cache = (arr, sentinel(arr), dev)
        return dev

    def detect_faces_from_bytes(self, data: bytes,
                                mode: FaceDetectionMode =
                                FaceDetectionMode.FULL) -> list[Face]:
        return self.detect_faces(self._decode_cached(data), mode)

    def detect_faces_from_filepath(self, path: str,
                                   mode: FaceDetectionMode =
                                   FaceDetectionMode.FULL) -> list[Face]:
        from ..utils.image import load_image
        return self.detect_faces(load_image(path), mode)

    def detect_faces_from_bytes_batch(
            self, datas: Sequence[bytes],
            mode: FaceDetectionMode = FaceDetectionMode.FULL
    ) -> list[list[Face]]:
        """Decodes (native threaded pool for JPEG) + detects a batch.

        Same-size images batch into one device call; mixed sizes fall back
        to per-size sub-batches (one compiled program per size bucket).
        """
        from ..utils.image import decode_images
        imgs = decode_images(list(datas))
        by_size: dict[tuple, list[int]] = {}
        for i, im in enumerate(imgs):
            if self.bucket_images:
                key = (self._bucket(im.shape[0]), self._bucket(im.shape[1]))
            else:
                key = im.shape[:2]
            by_size.setdefault(key, []).append(i)
        results: list[list[Face]] = [None] * len(imgs)  # type: ignore
        groups = []
        for (kh, kw), idxs in by_size.items():
            if self.bucket_images:
                # Mixed sizes sharing a bucket run as ONE device call:
                # pad each image to the bucket and pass its true size for
                # the coordinate rescale.
                batch = np.stack([
                    np.pad(imgs[i],
                           ((0, kh - imgs[i].shape[0]),
                            (0, kw - imgs[i].shape[1]), (0, 0)))
                    for i in idxs])
                sizes = [(imgs[i].shape[1], imgs[i].shape[0]) for i in idxs]
            else:
                batch = np.stack([imgs[i] for i in idxs])
                sizes = None
            # With several size buckets, dispatch every bucket's detect
            # program up front: the adaptive path's first readback blocks,
            # so serial calls would leave the device idle between buckets.
            pre = None
            prep = None
            dev_batch = batch
            if self.adaptive and len(by_size) > 1:
                dev_batch = jnp.asarray(batch)
                # Pre-dispatch on the SAME batch-bucket-padded images that
                # detect_faces_batch will prepare (its _prepare_batch is
                # deterministic, so the padded values match exactly).
                # Dispatching the raw group size instead would (a) compile
                # one speculative program PER observed group size, defeating
                # bucket_batches' compile bound, and (b) on face-count
                # overflow hand _finish_speculative a det slab whose batch
                # differs from the padded images — jax.vmap then raises
                # "inconsistent sizes for array axes to be mapped"
                # (ADVICE r4 high).
                prep = self._prepare_batch(dev_batch)
                pre = self._dispatch_speculative(prep[0], mode,
                                                 real_b=prep[1])
            groups.append((idxs, dev_batch, sizes, pre, prep))
        for idxs, dev_batch, sizes, pre, prep in groups:
            # prep rides along so detect_faces_batch doesn't re-dispatch
            # the normalize+pad ops _prepare_batch already emitted here.
            faces_per = self.detect_faces_batch(
                dev_batch, mode, _orig_sizes=sizes, _predispatched=pre,
                _prepared=prep)
            for i, faces in zip(idxs, faces_per):
                results[i] = faces
        return results

    def detect_faces_from_camera_frame(
            self, frame, mode: FaceDetectionMode = FaceDetectionMode.FULL,
            *, max_dim: Optional[int] = None) -> list[Face]:
        """Decodes a packed camera frame (NV12/NV21/I420/BGRA/RGBA with
        rotation) and detects — `detectFacesFromCameraFrame` analog
        (`face_detector.dart:620-633`).  ``max_dim`` downscales the longer
        side before detection (the reference's ``maxDim`` live-camera
        throughput knob); results are in the downscaled frame's
        coordinates, as in the reference."""
        from ..utils.camera import decode_camera_frame
        return self.detect_faces(decode_camera_frame(frame, max_dim), mode)

    def detect_faces_from_camera_image(
            self, camera_image, mode: FaceDetectionMode =
            FaceDetectionMode.FULL, *, rotation=None, is_bgra: bool = False,
            max_dim: Optional[int] = None) -> list[Face]:
        """One-call wrapper for live camera streams — the
        `detectFacesFromCameraImage` analog (`face_detector.dart:651-666`).

        ``camera_image`` is duck-typed: any object or mapping exposing
        ``width``, ``height`` and ``planes`` (each plane with ``bytes``
        plus optional ``bytes_per_row``/``bytesPerRow``,
        ``bytes_per_pixel``/``bytesPerPixel`` — Flutter's `CameraImage`
        shape).  YUV plane packing, color conversion, rotation and the
        ``max_dim`` downscale all run here.  Returns an empty list (not an
        error) when the plane *layout* can't be decoded, but raises when
        ``camera_image`` doesn't expose the expected shape at all — both
        halves of the reference's contract (`face_detector.dart:641-643`).
        ``is_bgra`` selects BGRA vs RGBA for the single-plane desktop
        path.
        """
        from ..utils.camera import (CameraRotation, _plane_field,
                                    camera_frame_from_planes)
        width = _plane_field(camera_image, "width")
        height = _plane_field(camera_image, "height")
        planes = _plane_field(camera_image, "planes")
        if width is None or height is None or planes is None:
            raise TypeError(
                "camera_image must expose width, height and planes "
                f"(got {type(camera_image).__name__})")
        frame = camera_frame_from_planes(
            width, height, planes,
            rotation=rotation or CameraRotation.NONE, is_bgra=is_bgra)
        if frame is None:
            return []
        return self.detect_faces_from_camera_frame(frame, mode,
                                                   max_dim=max_dim)

    def detect_faces_from_video(self, path: str,
                                mode: FaceDetectionMode =
                                FaceDetectionMode.FULL,
                                *, frame_stride: int = 1,
                                batch_size: int = 8,
                                max_frames: Optional[int] = None,
                                max_dim: Optional[int] = None,
                                devices: Optional[Sequence] = None):
        """Iterates VideoFrameResult over a video file (frames batched on
        device, tracking applied in stream order).  Analog of the
        reference's `detectFacesFromVideo`; ``max_dim`` is the camera
        paths' maxDim knob extended to video frames; ``devices`` spreads
        frame batches over per-chip replicas (results stay in order)."""
        from .video import process_video
        return process_video(self, path, mode, frame_stride=frame_stride,
                             batch_size=batch_size, max_frames=max_frames,
                             max_dim=max_dim, devices=devices)

    # -- embeddings -------------------------------------------------------------

    def get_face_embedding(self, face: Face, image: np.ndarray) -> np.ndarray:
        """192-dim L2-normalized embedding for a detected face
        (`face_detector.dart:685`: alignment needs only the two eye points,
        iris-refined when available)."""
        lm = face.landmarks
        left, right = lm.left_eye, lm.right_eye
        if left is None or right is None:
            raise ValueError("Face must have left and right eye landmarks")
        return self.embedding_model.embed(
            self._device_put_cached(image), left[:2], right[:2])

    def get_face_embedding_from_eyes(self, left_eye, right_eye,
                                     image: np.ndarray) -> np.ndarray:
        """Embedding from just the two eye centers in absolute pixels —
        the reference's minimal-payload path
        (`getFaceEmbeddingFromEyesDirect`, face_detector_core.dart:419)."""
        return self.embedding_model.embed(
            self._device_put_cached(image), left_eye, right_eye)

    def get_face_embeddings(self, faces: Sequence[Face],
                            image: np.ndarray
                            ) -> list[Optional[np.ndarray]]:
        """Embeddings for many faces of one image — the crops warp and
        batch through MobileFaceNet in a single device program.

        Per-face failure contract of the reference's `getFaceEmbeddings`
        (face_detector.dart:786-816): a face whose eye landmarks are
        missing or degenerate (coincident eyes — the aligned crop rounds
        to 0 px) comes back as a ``None`` entry instead of failing the
        whole batch."""
        import math as _math
        from ..models.embedding import compute_embedding_alignment
        pairs, slots = [], []
        for i, f in enumerate(faces):
            lm = f.landmarks
            if lm.left_eye is None or lm.right_eye is None:
                continue
            le, re = lm.left_eye[:2], lm.right_eye[:2]
            size = compute_embedding_alignment(le, re)[2]
            if not (size > 0) or int(_math.floor(size + 0.5)) < 1:
                continue
            pairs.append((le, re))
            slots.append(i)
        result: list[Optional[np.ndarray]] = [None] * len(faces)
        if pairs:
            out = self.embedding_model.embed_batch(
                self._device_put_cached(image), pairs)
            for i, slot in enumerate(slots):
                result[slot] = out[i]
        return result

    def get_face_embedding_from_bytes(self, face: Face,
                                      data: bytes) -> np.ndarray:
        """Embedding from encoded image bytes; shares the one-entry decode
        cache with `detect_faces_from_bytes`, so detect-then-embed on the
        same bytes decodes once (`face_detector.dart:1390-1430`)."""
        return self.get_face_embedding(face, self._decode_cached(data))

    def get_face_embedding_from_filepath(self, face: Face,
                                         path: str) -> np.ndarray:
        """Embedding from an image file (`getFaceEmbeddingFromFilepath`,
        face_detector.dart:717)."""
        with open(path, "rb") as f:
            return self.get_face_embedding_from_bytes(face, f.read())

    @staticmethod
    def compare_faces(emb1, emb2) -> float:
        from ..models.embedding import cosine_similarity
        return cosine_similarity(emb1, emb2)

    @staticmethod
    def face_distance(emb1, emb2) -> float:
        from ..models.embedding import euclidean_distance
        return euclidean_distance(emb1, emb2)

    # -- segmentation ------------------------------------------------------------

    def initialize_segmentation(
            self, config: Optional[SegmentationConfig] = None) -> None:
        """Eagerly loads the segmentation model on an already-created
        detector (`initializeSegmentation`, face_detector.dart:434-462).

        Idempotent like the reference: a no-op once segmentation is
        loaded (whether by the constructor or a previous call).  The
        optional ``config`` (reference default: ``SegmentationConfig.safe``
        there; here ``None`` keeps the constructor's model/precision
        choices) selects model family, precision, and mask format for the
        load.  Without calling this, the first mask request lazy-loads
        with the constructor's settings."""
        self._check_disposed()
        if self._segmentation is not None:
            if config is not None and config != self._segmentation_config:
                # The reference no-ops silently here; warn instead of
                # silently keeping the loaded model/mask format when the
                # caller just asked for a different one.
                import warnings
                warnings.warn(
                    "initialize_segmentation: segmentation is already "
                    "loaded; the new config is ignored (create a new "
                    "FaceDetector to switch model/precision/mask format)",
                    UserWarning, stacklevel=2)
            return
        if config is None:
            self._load_segmentation(self._segmentation_model)
            return
        # Commit the new config/model only once the load succeeds: a
        # missing file or channel-validation failure must not poison
        # later lazy loads of the (working) constructor choice.
        prev = (self._segmentation_config, self._segmentation_model)
        self._segmentation_config = config
        self._segmentation_model = config.model
        try:
            self._load_segmentation(config.model)
        except Exception:
            self._segmentation_config, self._segmentation_model = prev
            raise

    @property
    def is_segmentation_ready(self) -> bool:
        """True once the segmentation model is loaded
        (`isSegmentationReady`, face_detector.dart:217)."""
        return self._segmentation is not None and not self._disposed

    def get_segmentation_mask(self, image: np.ndarray) -> SegmentationMask:
        self._check_disposed()
        if self._segmentation is None:
            self._load_segmentation(self._segmentation_model)
        return self._segmentation(
            self._device_put_cached(image)[None])[0]

    def get_segmentation_mask_from_bytes(self, data: bytes
                                         ) -> SegmentationMask:
        """Segments encoded image bytes; shares the one-entry decode cache
        with `detect_faces_from_bytes`, so detect-then-segment on the same
        bytes decodes once (`getSegmentationMask` bytes form,
        face_detector.dart:876; cache: face_detector.dart:1390-1430)."""
        return self.get_segmentation_mask(self._decode_cached(data))

    def get_segmentation_mask_from_filepath(self, path: str
                                            ) -> SegmentationMask:
        """Segments an image file (`getSegmentationMaskFromFilepath`,
        face_detector.dart:876 area)."""
        with open(path, "rb") as f:
            return self.get_segmentation_mask_from_bytes(f.read())

    def get_segmentation_mask_from_camera_frame(
            self, frame, *, max_dim: Optional[int] = None
    ) -> SegmentationMask:
        """Decodes a packed camera frame and segments it
        (`getSegmentationMaskFromCameraFrame`, face_detector.dart:970,
        incl. its ``maxDim`` downscale knob)."""
        from ..utils.camera import decode_camera_frame
        return self.get_segmentation_mask(decode_camera_frame(frame,
                                                              max_dim))

    def detect_faces_from_packed_bytes(
            self, data, *, width: int, height: int, channels: int = 3,
            channel_order: str = "bgr",
            mode: FaceDetectionMode = FaceDetectionMode.FULL) -> list[Face]:
        """Detects faces in raw packed pixel bytes — the zero-decode path.

        Analog of `detectFacesFromMatBytes` (face_detector.dart:588): the
        reference takes an OpenCV Mat's packed bytes (matType 16 = CV_8UC3,
        BGR).  ``channels`` is 3 (BGR/RGB) or 4 (BGRA/RGBA);
        ``channel_order`` names the layout ("bgr"/"rgb"/"bgra"/"rgba").
        """
        return self.detect_faces(_image_from_packed_bytes(
            data, width, height, channels, channel_order), mode)

    def get_face_embedding_from_packed_bytes(
            self, face: Face, data, *, width: int, height: int,
            channels: int = 3, channel_order: str = "bgr") -> np.ndarray:
        """Embedding from raw packed pixel bytes — the
        `getFaceEmbeddingFromMatBytes` analog (face_detector.dart:735),
        with the same buffer convention as
        :meth:`detect_faces_from_packed_bytes`."""
        return self.get_face_embedding(face, _image_from_packed_bytes(
            data, width, height, channels, channel_order))

    def detect_faces_with_segmentation(
            self, image: np.ndarray,
            mode: FaceDetectionMode = FaceDetectionMode.FULL
    ) -> tuple[list[Face], SegmentationMask]:
        """Combined detect + segment.  The reference runs these in two
        isolates so the cost is max(detect, segment)
        (`face_detector.dart:1297-1324`) — two OS threads genuinely
        compute in parallel on a multicore CPU.  Here the mask program
        dispatches async first and the HOST stages (dispatch, readback,
        materialize) overlap, but one TPU chip executes programs
        serially, so device compute is additive.  Measured numbers live
        in ONE place: benchmarks/results.json `combined_detect_segment`
        (combined_ms_batch vs sum_ms_batch vs max_ms_batch,
        overlap_ratio).  Full max() behavior needs a second chip (the
        data-parallel mesh path)."""
        self._check_disposed()
        if self._segmentation is None:
            self._load_segmentation(self._segmentation_model)
        gen0 = self._tracking_generation
        # Device-resident frames pass through; host arrays upload once and
        # share the one-entry cache with detect/embed (_device_put_cached).
        arr = image if isinstance(image, jax.Array) \
            else self._device_put_cached(np.asarray(image))
        images = _normalize_channels(arr[None])
        # Dispatch segmentation asynchronously FIRST so the host stages
        # of both paths overlap (device compute itself serializes on one
        # chip — see the class docstring's measured numbers).
        seg_handle = self._segmentation.dispatch(images)
        faces = self.detect_faces_batch(images, mode)[0]
        # The reference tracks combined calls too
        # (_runTrackedCombinedDetection, face_detector.dart:911).
        faces = self._attach_tracking(faces, gen0)
        masks = self._segmentation.materialize(seg_handle)
        return faces, masks[0]

    def detect_faces_with_segmentation_from_bytes(
            self, data: bytes,
            mode: FaceDetectionMode = FaceDetectionMode.FULL
    ) -> tuple[list[Face], SegmentationMask]:
        """Combined detect + segment from encoded bytes
        (`detectFacesWithSegmentation`, face_detector.dart:904)."""
        return self.detect_faces_with_segmentation(
            self._decode_cached(data), mode)

    def detect_faces_with_segmentation_from_camera_frame(
            self, frame, mode: FaceDetectionMode = FaceDetectionMode.FULL,
            *, max_dim: Optional[int] = None
    ) -> tuple[list[Face], SegmentationMask]:
        """Combined detect + segment from a packed camera frame
        (`detectFacesWithSegmentationFromCameraFrame`,
        face_detector.dart:998, incl. its ``maxDim`` knob)."""
        from ..utils.camera import decode_camera_frame
        return self.detect_faces_with_segmentation(
            decode_camera_frame(frame, max_dim), mode)

    def detect_faces_with_segmentation_batch(
            self, images,
            mode: FaceDetectionMode = FaceDetectionMode.FULL
    ) -> list[tuple[list[Face], SegmentationMask]]:
        """Combined detect + segment over an image batch: the mask
        program dispatches async first so host stages overlap (device
        compute serializes on one chip — see
        :meth:`detect_faces_with_segmentation`).  No reference analog for
        the batch form."""
        self._check_disposed()
        if self._segmentation is None:
            self._load_segmentation(self._segmentation_model)
        images = _normalize_channels(images)
        seg_handle = self._segmentation.dispatch(images)
        faces = self.detect_faces_batch(images, mode)
        masks = self._segmentation.materialize(seg_handle)
        return list(zip(faces, masks))

    # -- observability -----------------------------------------------------------

    @property
    def accelerator_report(self) -> dict[str, str]:
        """Backend placement per model (analog of the web pipeline's
        per-runner accelerator report, `face_detector_web.dart:248-254`).
        All networks compile into shared XLA programs on the default
        backend, so the report is uniform — but the shape of the API is
        preserved for consumers that log it."""
        dev = jax.devices()[0]
        backend = f"{dev.platform}:{dev.device_kind}"
        report = {"detector": backend, "mesh": backend, "iris": backend,
                  "blendshapes": backend}
        if self._segmentation is not None:
            sd = self._seg_device
            report["segmentation"] = (
                f"{sd.platform}:{sd.device_kind}#{sd.id}" if sd is not None
                else backend)
        if self._embedding is not None:
            report["embedding"] = backend
        report["precision"] = str(self._precision)
        return report

    def memory_report(self) -> dict:
        """Weight footprint in bytes per network, plus cache counters.

        Analog of the reference's documented model-memory numbers
        (~26-40 MB full pipeline in the isolate, +7-10 MB per extra
        mesh-pool instance — README.md:1273, face_detector.dart:231-232).
        Here there is no interpreter pool: each network's weights live
        once as a device pytree shared by every compiled program, so the
        footprint is the sum below regardless of batch or face count.
        Sizes come from array metadata (no device sync)."""
        self._check_disposed()

        def nbytes(tree) -> int:
            return int(sum(getattr(leaf, "nbytes", 0)
                           for leaf in jax.tree_util.tree_leaves(tree)))

        report: dict = {}
        for name in ("detector", "mesh", "iris", "blendshapes",
                     "embedding"):
            m = getattr(self.models, name, None)
            if m is not None:
                report[name] = nbytes(m.params)
        if "embedding" not in report and self._embedding is not None \
                and self._embedding.model is not None:
            # Lazily-loaded standalone embedding (embed_in_full puts the
            # same weights in models.embedding instead).
            report["embedding"] = nbytes(self._embedding.model.params)
        if self._segmentation is not None and \
                self._segmentation.model is not None:
            report["segmentation"] = nbytes(self._segmentation.model.params)
        report["total_weights"] = sum(v for v in report.values())
        report["compiled_programs"] = len(self._programs)
        if self._replica_params_cache:
            # Replica serving duplicates the pipeline weights per pinned
            # chip (ReplicaPool / device-pinned streams).
            report["replica_copies"] = len(self._replica_params_cache)
            report["replica_weights"] = sum(
                nbytes(p) for p in self._replica_params_cache.values())
        return report

    def cost_report(self, image_shape: tuple,
                    mode: FaceDetectionMode = FaceDetectionMode.FULL,
                    batch_size: int = 1) -> dict:
        """XLA cost analysis of the fused program for one image bucket.

        The compiler-model half of the observability story (SURVEY §5:
        "jax.profiler traces + XLA cost analysis"): static FLOP and
        memory-traffic counts for the whole fused pipeline program, as
        XLA itself accounts them after fusion — the numbers behind the
        roofline math in docs/PERF.md.  Uses AOT lowering on shape
        structs (no input arrays are materialized; the persistent
        compile cache makes repeat calls cheap).

        Returns flops / bytes_accessed / transcendentals plus per-image
        derivations and the compiled program's memory footprint.
        """
        self._check_disposed()
        h, w = int(image_shape[0]), int(image_shape[1])
        if self.bucket_images:
            h, w = self._bucket(h), self._bucket(w)
        prog = self._program(h, w, mode)
        dummy = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
        compiled = prog.lower(self._params, dummy).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        report = {
            "image_bucket": (h, w),
            "mode": mode.value,
            "batch_size": batch_size,
            "flops": float(ca.get("flops", 0.0)),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
            "transcendentals": float(ca.get("transcendentals", 0.0)),
        }
        report["flops_per_image"] = report["flops"] / batch_size
        report["bytes_per_image"] = report["bytes_accessed"] / batch_size
        try:
            ma = compiled.memory_analysis()
            report["memory"] = {
                "argument_bytes": int(ma.argument_size_in_bytes),
                "output_bytes": int(ma.output_size_in_bytes),
                "temp_bytes": int(ma.temp_size_in_bytes),
                "generated_code_bytes": int(
                    ma.generated_code_size_in_bytes),
            }
        except Exception:  # backend without memory_analysis support
            report["memory"] = None
        return report

    @staticmethod
    def split_meshes_if_concatenated(mesh_pts) -> list[np.ndarray]:
        """Splits a concatenated [N*468, ...] mesh point array into
        per-face arrays (`splitMeshesIfConcatenated`,
        face_detector.dart:1047-1056).  Delegates to the canonical
        helper in pipeline/types.py."""
        from .types import split_meshes_if_concatenated as _split
        return _split(np.asarray(mesh_pts))

    # -- tracking / lifecycle -----------------------------------------------------

    def reset_tracking(self) -> None:
        """Drops temporal state; in-flight results lose their IDs
        (generation counter, `face_tracker.dart:211-214`)."""
        with self._tracker_lock:
            self._tracker.reset()
            self._tracking_generation += 1

    @property
    def is_ready(self) -> bool:
        return not self._disposed

    @property
    def is_embedding_ready(self) -> bool:
        """All models load together, so this mirrors :attr:`is_ready`
        (`isEmbeddingReady`, face_detector.dart:215)."""
        return self.is_ready

    def dispose(self) -> None:
        """Releases compiled programs AND model weights (the reference's
        dispose frees the interpreters' ~26-40 MB, README.md:1273; holding
        device buffers past dispose also matters under the relay's H2D
        memory-retention quirk)."""
        self._disposed = True
        self._programs.clear()
        self._spec_state.clear()
        with self._programs_lock:
            # After _disposed is visible: a concurrent _replica_params
            # holding the lock either inserted (wiped here) or will see
            # _disposed and raise (see _replica_params).
            self._replica_params_cache.clear()
        self._decode_cache = None
        self._devput_cache = None  # frees the cached device-resident frame
        if self._embedding is not None:
            self._embedding.dispose()
            self._embedding = None
        if self._segmentation is not None:
            self._segmentation.dispose()
            self._segmentation = None
        for m in (self.models.detector, self.models.mesh, self.models.iris,
                  self.models.blendshapes, self.models.embedding):
            if m is not None:
                m.params = {}
        self.models.detector = None
        self.models.mesh = None
        self.models.iris = None
        self.models.blendshapes = None
        self.models.embedding = None
        self._params = None

    def _check_disposed(self):
        if self._disposed:
            raise RuntimeError("FaceDetector used after dispose()")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.dispose()
