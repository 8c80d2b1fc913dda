"""Command-line front-end: `python -m face_detection_tflite_tpu ...`.

The reference ships its user-facing surface as Flutter example apps
(`example/lib/main.dart`: still-image, live-camera, segmentation and
video screens); the TPU framework's deployment analog is a terminal.
One binary covers the same flows:

    fdt-tpu detect photo.jpg --mode full --json
    fdt-tpu detect photo.jpg --annotate out.png
    fdt-tpu segment photo.jpg --out mask.png --format binary
    fdt-tpu embed a.jpg b.jpg            # similarity + distance
    fdt-tpu serve --port 8080            # HTTP front-end (FaceServer)
    fdt-tpu info                         # backend / models / memory
    fdt-tpu doctor [--run]               # deployment self-check

Heavy imports (jax, the detector) happen inside each subcommand so
`--help` stays instant and `info` can report a missing backend cleanly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

__all__ = ["main", "build_parser"]


def _add_common_detect_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="back",
                   choices=["front", "back", "short_range", "full",
                            "full_sparse"],
                   help="BlazeFace variant (default: back)")
    p.add_argument("--model-dir", default=None,
                   help="directory holding the .tflite assets "
                        "(default: package assets / FDT_TPU_MODEL_DIR)")
    p.add_argument("--min-score", type=float, default=None,
                   help="detection score gate (default: model config)")
    p.add_argument("--max-faces", type=int, default=16)
    p.add_argument("--max-dim", type=int, default=1536,
                   help="downscale longer side to this before detection "
                        "(0 disables; bounds per-size compile cost)")
    p.add_argument("--precision", default="highest",
                   choices=["highest", "high", "mixed", "serving",
                            "default"],
                   help="MXU precision tier (default: highest = "
                        "fp32-exact parity)")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="fdt-tpu",
        description="TPU-native MediaPipe-style face pipeline "
                    "(BlazeFace, FaceMesh, iris, blendshapes, "
                    "segmentation, embeddings).")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("detect", help="detect faces in image file(s)")
    d.add_argument("images", nargs="+", help="image file path(s)")
    d.add_argument("--mode", default="full",
                   choices=["fast", "standard", "full"])
    d.add_argument("--json", action="store_true",
                   help="emit one JSON object per image on stdout")
    d.add_argument("--mesh", action="store_true",
                   help="include the 468-pt mesh in --json output")
    d.add_argument("--contours", action="store_true",
                   help="include named contours in --json output")
    d.add_argument("--annotate", metavar="OUT",
                   help="write an annotated copy of the (first) image")
    _add_common_detect_args(d)

    s = sub.add_parser("segment", help="selfie-segmentation mask")
    s.add_argument("image", help="image file path")
    s.add_argument("--seg-model", default="general",
                   choices=["general", "landscape", "multiclass"])
    s.add_argument("--out", default=None, metavar="MASK_PNG",
                   help="write the mask as a grayscale PNG "
                        "(default: <image>.mask.png)")
    s.add_argument("--format", default="uint8",
                   choices=["uint8", "binary"],
                   help="mask pixel format (default: uint8 grayscale)")
    s.add_argument("--threshold", type=float, default=0.5,
                   help="binary threshold (with --format binary)")
    s.add_argument("--model-dir", default=None)
    s.add_argument("--max-dim", type=int, default=1536)

    e = sub.add_parser(
        "embed", help="face embedding for one image, or similarity for two")
    e.add_argument("images", nargs="+",
                   help="one image (print embedding) or two (compare)")
    e.add_argument("--json", action="store_true")
    e.add_argument("--allow-untrained", action="store_true",
                   help="acknowledge random-init MobileFaceNet weights "
                        "(when mobilefacenet.tflite/npz is not installed)")
    e.add_argument("--model-dir", default=None)
    e.add_argument("--max-dim", type=int, default=1536)

    vid = sub.add_parser(
        "video", help="detect (+track/smooth) over a video file")
    vid.add_argument("video", help="input video file")
    vid.add_argument("--out", default=None, metavar="OUT_MP4",
                     help="write an annotated copy "
                          "(default: <video>.annotated.mp4; use --json "
                          "to skip writing)")
    vid.add_argument("--mode", default="full",
                     choices=["fast", "standard", "full"])
    vid.add_argument("--json", action="store_true",
                     help="emit one JSON line per frame instead of an "
                          "annotated video")
    vid.add_argument("--stride", type=int, default=1,
                     help="process every Nth frame")
    vid.add_argument("--max-frames", type=int, default=None)
    vid.add_argument("--batch-size", type=int, default=8)
    vid.add_argument("--replicas", type=int, default=0, metavar="N",
                     help="spread frame batches over the first N chips "
                          "(per-chip weight replicas; results stay in "
                          "frame order; 0 = single default device)")
    vid.add_argument("--smooth", default="one_euro",
                     choices=["one_euro", "ema", "none"],
                     help="temporal landmark smoothing (default: the "
                          "reference example app's One-Euro filter)")
    _add_common_detect_args(vid)

    v = sub.add_parser("serve", help="HTTP serving front-end (FaceServer)")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8080)
    v.add_argument("--with-segmentation", action="store_true")
    v.add_argument("--batch-window-ms", type=float, default=4.0)
    v.add_argument("--max-batch", type=int, default=16)
    v.add_argument("--no-adaptive-batch", action="store_true",
                   help="always drain micro-batches to --max-batch "
                        "instead of adapting the cap to the measured "
                        "throughput-optimal size for this host->device "
                        "attachment (docs/PERF.md round-5 saturation)")
    v.add_argument("--replicas", type=int, default=0, metavar="N",
                   help="replicate detect serving over the first N chips "
                        "(per-chip weight copies, round-robin batches; "
                        "0 = single default device)")
    v.add_argument("--mode-warmup", default=None, metavar="WxH",
                   help="pre-compile fast/standard/full programs for a "
                        "WxH image bucket before the socket opens")
    v.add_argument("--max-queue", type=int, default=128,
                   help="bound on requests waiting for the batcher; "
                        "beyond it detect/embed requests are shed with "
                        "503 + Retry-After (0 = unbounded)")
    v.add_argument("--recycle-after-batches", type=int, default=None,
                   metavar="N",
                   help="drain + rebuild the serving executors every N "
                        "batched executions (listener stays up; compiled "
                        "programs persist)")
    v.add_argument("--max-rss-mb", type=float, default=None,
                   help="recycle the serving executors whenever process "
                        "RSS exceeds this many MB (long-soak remedy for "
                        "relay-side H2D memory retention)")
    _add_common_detect_args(v)

    iw = sub.add_parser(
        "import-weights",
        help="import trained MobileFaceNet weights from a user-supplied "
             "checkpoint (.pt/.pth state_dict or .npz) into the model "
             "discovery directory — the one capability a user must "
             "supply (the reference ships the asset via pub.dev only, "
             "face_embedding.dart:46, pubspec.yaml:45)")
    iw.add_argument("model", choices=["mobilefacenet"],
                    help="which model's weights to import")
    iw.add_argument("src", help="checkpoint path (.pt/.pth/.bin/.npz; a "
                                ".tflite needs no import — drop it in the "
                                "model dir as mobilefacenet.tflite)")
    iw.add_argument("--dst", default=None,
                    help="output .npz (default: <model-dir>/"
                         "mobilefacenet.npz, where the detector "
                         "auto-discovers it)")
    iw.add_argument("--model-dir", default=None,
                    help="discovery directory (default: package assets / "
                         "FDT_TPU_MODEL_DIR)")
    iw.add_argument("--no-verify", action="store_true",
                    help="skip the forward-pass sanity check (loads the "
                         "network and embeds a test image)")

    i = sub.add_parser("info", help="backend, model and memory report")
    i.add_argument("--cost", default=None, metavar="WxH",
                   help="add XLA cost analysis (FLOPs / bytes) of the "
                        "fused fast/standard/full programs for a WxH "
                        "image bucket")
    doc = sub.add_parser(
        "doctor",
        help="deployment self-check: model assets, device backend, "
             "compile cache, native decode (+ --run: tiny end-to-end "
             "detect)")
    doc.add_argument("--model-dir", default=None,
                     help="directory holding the .tflite assets "
                          "(default: package assets / FDT_TPU_MODEL_DIR)")
    doc.add_argument("--run", action="store_true",
                     help="also run one tiny end-to-end detect "
                          "(compiles a small program; slow on a cold "
                          "TPU cache)")
    doc.add_argument("--json", action="store_true",
                     help="machine-readable check list")
    sub.add_parser("version", help="print package version")
    return ap


def _make_detector(args, **extra):
    """Builds a FaceDetector from common CLI flags (after ensure_backend)."""
    from .pipeline.config import FaceDetectionModel
    from .pipeline.detector import FaceDetector

    kw = dict(model=FaceDetectionModel(args.model),
              max_faces=args.max_faces,
              precision=args.precision,  # tiers resolved by the detector
              model_dir=args.model_dir, **extra)
    if args.min_score is not None:
        kw["min_score"] = args.min_score
    return FaceDetector(**kw)


def _load_fitted(path: str, max_dim: int):
    from .utils.image import fit_max_dim, load_image
    img = load_image(path)
    if max_dim and max_dim > 0:
        img = fit_max_dim(img, max_dim)
    return img


def _print_faces_text(path: str, faces, out=None) -> None:
    out = out or sys.stdout  # resolved at call time (test capture works)
    print(f"{path}: {len(faces)} face(s)", file=out)
    for i, f in enumerate(faces):
        x0, y0, x1, y1 = f.bounding_box_pixels
        line = (f"  face {i}: score={f.score:.3f} "
                f"box=({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})px")
        if f.mesh_score is not None:
            line += f" mesh={f.mesh_score:.3f}"
        a = f.head_euler_angles
        if a is not None:
            line += f" pose=({a.x:.1f},{a.y:.1f},{a.z:.1f})deg"
        if f.smiling_probability is not None:
            line += f" smile={f.smiling_probability:.2f}"
        print(line, file=out)


def _cmd_detect(args) -> int:
    from .pipeline.config import FaceDetectionMode
    det = _make_detector(args)
    mode = FaceDetectionMode(args.mode)
    first_img = None
    first_faces = None
    for path in args.images:
        img = _load_fitted(path, args.max_dim)
        faces = det.detect_faces(img, mode)
        if first_img is None:
            first_img, first_faces = img, faces
        if args.json:
            payload = {"image": path,
                       "width": int(img.shape[1]),
                       "height": int(img.shape[0]),
                       "faces": [f.to_dict(include_mesh=args.mesh,
                                           include_contours=args.contours)
                                 for f in faces]}
            print(json.dumps(payload))
        else:
            _print_faces_text(path, faces)
    if args.annotate:
        from PIL import Image

        from .utils.render import annotate
        Image.fromarray(annotate(first_img, first_faces)).save(args.annotate)
        if not args.json:
            print(f"annotated image -> {args.annotate}")
    return 0


def _cmd_segment(args) -> int:
    from .convert.executor import convert_file
    from .models.segmentation import SelfieSegmentation
    from .pipeline.config import MODEL_FILES
    from .pipeline.detector import resolve_model_dir
    key = {"general": "segmenter_general",
           "landscape": "segmenter_landscape",
           "multiclass": "segmenter_multiclass"}[args.seg_model]
    path = os.path.join(resolve_model_dir(args.model_dir), MODEL_FILES[key])
    if not os.path.exists(path):
        print(f"segmentation model not found: {path} (the multiclass model "
              "ships out-of-repo in the reference too; see "
              "tools/fetch_models.py)", file=sys.stderr)
        return 1
    seg = SelfieSegmentation(convert_file(path, precision="high"),
                             multiclass=args.seg_model == "multiclass")
    img = _load_fitted(args.image, args.max_dim)
    mask = seg(img[None])[0].upsample()
    arr = (mask.to_binary(args.threshold) if args.format == "binary"
           else mask.to_uint8())
    out = args.out or (os.path.splitext(args.image)[0] + ".mask.png")
    from PIL import Image
    Image.fromarray(arr, mode="L").save(out)
    cover = float((mask.data >= args.threshold).mean())
    print(f"{args.image}: person coverage {cover:.1%}, "
          f"mask {arr.shape[1]}x{arr.shape[0]} -> {out}")
    return 0


def _cmd_embed(args) -> int:
    if len(args.images) > 2:
        print("embed takes one or two images", file=sys.stderr)
        return 2
    from .pipeline.config import FaceDetectionMode
    from .pipeline.detector import FaceDetector
    det = FaceDetector(model_dir=args.model_dir,
                       allow_untrained_embeddings=args.allow_untrained)

    def first_face_embedding(path):
        img = _load_fitted(path, args.max_dim)
        faces = det.detect_faces(img, FaceDetectionMode.STANDARD)
        if not faces:
            raise SystemExit(f"no face found in {path}")
        return det.get_face_embedding(faces[0], img)

    embs = [first_face_embedding(p) for p in args.images]
    if len(embs) == 1:
        if args.json:
            print(json.dumps({"image": args.images[0],
                              "embedding": [float(v) for v in embs[0]]}))
        else:
            print(f"{args.images[0]}: 192-dim embedding, "
                  f"first 8 = {[round(float(v), 4) for v in embs[0][:8]]}")
        return 0
    sim = FaceDetector.compare_faces(embs[0], embs[1])
    dist = FaceDetector.face_distance(embs[0], embs[1])
    if args.json:
        print(json.dumps({"images": args.images,
                          "cosine_similarity": float(sim),
                          "euclidean_distance": float(dist)}))
    else:
        print(f"cosine similarity: {sim:.4f}")
        print(f"euclidean distance: {dist:.4f}")
    return 0


def _cmd_video(args) -> int:
    from .pipeline.config import FaceDetectionMode
    from .pipeline.smoothing import FaceSmoother
    det = _make_detector(args, enable_tracking=True)
    mode = FaceDetectionMode(args.mode)
    devices = _resolve_replica_devices(args, det)
    if devices is _REPLICAS_ERROR:
        return 1
    smoother = (None if args.smooth == "none"
                else FaceSmoother(alpha=0.5, method=args.smooth))

    writer = None
    cap = None
    out_path = None
    if not args.json:
        import cv2
        cap = cv2.VideoCapture(args.video)
        if not cap.isOpened():
            raise ValueError(f"cannot open video: {args.video}")
        fps = (cap.get(cv2.CAP_PROP_FPS) or 30.0) / max(args.stride, 1)
        out_path = args.out or (os.path.splitext(args.video)[0]
                                + ".annotated.mp4")

    frames = 0
    total_faces = 0
    try:
        frame_idx = -1
        frame = None

        def frame_at(i):
            # Second incremental pass over the container, in step with
            # the result stream (O(1) memory; examples/video_demo.py).
            nonlocal frame_idx, frame
            while frame_idx < i:
                ok, frame = cap.read()
                if not ok:
                    raise ValueError(f"frame {i} unreadable on second pass")
                frame_idx += 1
            return frame

        for res in det.detect_faces_from_video(
                args.video, mode, frame_stride=args.stride,
                batch_size=args.batch_size, max_frames=args.max_frames,
                max_dim=args.max_dim or None, devices=devices):
            faces = (smoother.smooth(res.faces, t_sec=res.timestamp_s)
                     if smoother else res.faces)
            frames += 1
            total_faces += len(faces)
            if args.json:
                print(json.dumps(
                    {"frame": res.frame_index,
                     "timestamp_s": round(res.timestamp_s, 4),
                     "faces": [f.to_dict() for f in faces]}))
                continue
            import cv2
            import numpy as np

            from .utils.image import fit_max_dim
            from .utils.render import annotate
            rgb = frame_at(res.frame_index)[..., ::-1]
            if args.max_dim:
                rgb = fit_max_dim(rgb, args.max_dim)
            if writer is None:
                h, w = rgb.shape[:2]
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
                if not writer.isOpened():
                    raise ValueError(
                        f"cannot open video writer for {out_path}")
            out = annotate(np.ascontiguousarray(rgb), faces)
            writer.write(np.ascontiguousarray(out[..., ::-1]))
    finally:
        if writer is not None:
            writer.release()
        if cap is not None:
            cap.release()
    if not args.json:
        print(f"{args.video}: {frames} frame(s), {total_faces} face "
              f"detection(s) -> {out_path}")
    return 0


#: Sentinel: --replicas was out of range (error already printed, the
#: detector disposed); callers return exit code 1.
_REPLICAS_ERROR = object()


def _resolve_replica_devices(args, det):
    """Maps --replicas N to the first N visible devices (shared by the
    serve and video commands).  Returns None when replicas is 0/unset,
    the device list otherwise, or _REPLICAS_ERROR after printing the
    range error and disposing ``det``."""
    if not args.replicas:
        return None
    import jax
    avail = jax.devices()
    if args.replicas < 0 or args.replicas > len(avail):
        print(f"error: --replicas {args.replicas} out of range "
              f"(0..{len(avail)} device(s) visible)", file=sys.stderr)
        det.dispose()
        return _REPLICAS_ERROR
    return avail[:args.replicas]


#: Set by tests (or another thread) to stop a blocking `serve` command.
_serve_stop = None


def _cmd_serve(args) -> int:
    import threading

    from .pipeline.server import FaceServer
    global _serve_stop
    det = _make_detector(args, with_segmentation=args.with_segmentation)
    devices = _resolve_replica_devices(args, det)
    if devices is _REPLICAS_ERROR:
        return 1
    if args.mode_warmup:
        w, h = (int(v) for v in args.mode_warmup.lower().split("x"))
        print(f"warming fast/standard/full programs for {w}x{h}"
              + (f" on {len(devices)} replica chips" if devices else "")
              + "...", flush=True)
        det.warmup((h, w, 3), batch_size=1, devices=devices)
    server = FaceServer(det, host=args.host, port=args.port,
                        batch_window_ms=args.batch_window_ms,
                        max_batch=args.max_batch, devices=devices,
                        max_queue=args.max_queue,
                        recycle_after_batches=args.recycle_after_batches,
                        max_rss_mb=args.max_rss_mb,
                        adaptive_batch=not args.no_adaptive_batch).start()
    print(f"serving on {server.address}  "
          f"(POST /v1/detect, /v1/segment, /v1/embed; GET /metrics)"
          + (f"  [{len(devices)} detect replicas]" if devices else ""),
          flush=True)
    _serve_stop = threading.Event()
    try:
        _serve_stop.wait()  # run until interrupted (or a test stops us)
    except KeyboardInterrupt:
        print("shutting down")
    finally:
        _serve_stop = None
        server.close()
        det.dispose()
    return 0


def _cmd_info(args) -> int:
    from . import __version__  # type: ignore[attr-defined]
    info: dict = {"version": __version__}
    try:
        from .pipeline.detector import resolve_model_dir
        info["model_dir"] = resolve_model_dir()
    except FileNotFoundError as e:
        info["model_dir"] = None
        info["model_dir_error"] = str(e)
    import jax
    info["backend"] = jax.default_backend()
    info["devices"] = [str(d) for d in jax.devices()]
    if info["model_dir"]:
        from .pipeline.config import FaceDetectionMode
        from .pipeline.detector import FaceDetector
        det = FaceDetector()
        info["accelerator_report"] = det.accelerator_report
        info["memory_report"] = det.memory_report()
        if getattr(args, "cost", None):
            w, h = (int(v) for v in args.cost.lower().split("x"))
            info["cost_analysis"] = {
                m.value: det.cost_report((h, w), m)
                for m in FaceDetectionMode}
        det.dispose()
    print(json.dumps(info, indent=2))
    return 0


def _cmd_import_weights(args) -> int:
    """One-command trained-weight install (VERDICT r4 #8).

    Wraps the converter-side importer
    (`convert/import_weights.py`): BN-fold + layout mapping + per-tensor
    shape validation against the `build_mobilefacenet` template, then a
    forward-pass sanity check through `FaceEmbedding.load`, writing the
    .npz where `FaceDetector._embedding_weight_path` discovers it — so
    `fdt-tpu doctor`'s optional-models line turns green and embeddings
    stop running RANDOM-INIT."""
    import numpy as np

    from .convert.import_weights import import_mobilefacenet

    dst = args.dst
    if dst is None:
        from .pipeline.detector import resolve_model_dir
        try:
            dst = os.path.join(resolve_model_dir(args.model_dir),
                               "mobilefacenet.npz")
        except FileNotFoundError:
            # No model dir yet (weights-first setup): the package
            # checkpoint dir is the detector's third discovery path.
            dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "assets", "checkpoints", "mobilefacenet.npz")
    params = import_mobilefacenet(args.src)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    n_bytes = sum(v.nbytes for v in params.values())
    print(f"import ok: {len(params)} tensors, {n_params:,} params "
          f"({n_bytes / 1e6:.1f} MB fp32) — BatchNorm folded, "
          "shapes validated against the MobileFaceNet template")
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    # Stage next to the destination and only move into the discovery
    # path AFTER the forward-pass check: a verify failure must not
    # leave a broken .npz installed where every future detector (and
    # doctor's optional-models check) would silently pick it up.
    staged = dst + ".staging.npz"  # np.savez appends .npz if absent
    np.savez_compressed(staged, **params)
    if not args.no_verify:
        from .models.embedding import FaceEmbedding
        emb = FaceEmbedding.load(staged)
        img = np.random.default_rng(0).integers(
            0, 255, (200, 200, 3), dtype=np.uint8)
        vec = emb.embed(img, (60.0, 90.0), (140.0, 90.0))
        norm = float(np.linalg.norm(vec))
        if not (np.isfinite(vec).all() and abs(norm - 1.0) < 1e-4):
            os.remove(staged)
            print(f"error: forward-pass check failed (norm={norm}, "
                  f"finite={bool(np.isfinite(vec).all())}); "
                  "nothing was installed",
                  file=sys.stderr)
            return 1
        print(f"forward pass ok: 192-dim embedding, L2 norm {norm:.6f}")
    os.replace(staged, dst)
    print(f"wrote {dst}")
    print("embeddings are now identity-discriminative: the detector "
          "discovers this file automatically (doctor's optional-models "
          "check turns green; no UntrainedEmbeddingWarning)")
    return 0


def _cmd_doctor(args) -> int:
    """Fresh-deployment self-check.

    The reference's analog is its initialize-time validation + the
    integration suite's environment preflight; a server deployment needs
    the same answers from one command: are the model assets installed,
    is the device backend alive, will compiles persist, is the native
    decode pool loaded.  Required failures exit 1 with the fix printed.
    """
    checks: list = []

    def add(name, ok, detail, required=True):
        checks.append({"check": name, "ok": bool(ok), "detail": detail,
                       "required": required})

    # 1. model assets (required; embedding/multiclass ship out-of-repo
    #    upstream, so their absence is expected and optional).
    from .pipeline.config import MODEL_FILES
    from .pipeline.detector import resolve_model_dir
    optional_models = {"embedding", "segmenter_multiclass"}
    model_dir = None
    if args.model_dir and not os.path.isdir(args.model_dir):
        # resolve_model_dir falls through a nonexistent explicit dir to
        # env/package defaults — correct for the pipeline, wrong for a
        # self-check: `doctor --model-dir /typo` must not validate a
        # DIFFERENT directory and report all-green for the wrong install.
        add("model assets", False,
            f"--model-dir {args.model_dir}: not a directory")
    else:
        try:
            model_dir = resolve_model_dir(args.model_dir)
        except FileNotFoundError as e:
            add("model assets", False, str(e))
    if model_dir:
        missing = sorted(f for k, f in MODEL_FILES.items()
                         if k not in optional_models
                         and not os.path.isfile(os.path.join(model_dir, f)))
        add("model assets",
            not missing,
            f"{model_dir}: all core .tflite files present" if not missing
            else f"{model_dir}: missing {', '.join(missing)} — run "
                 "`python tools/fetch_models.py`")
        extras = sorted(
            f for k, f in MODEL_FILES.items() if k in optional_models
            and not os.path.isfile(os.path.join(model_dir, f)))
        npz = os.path.join(model_dir, "mobilefacenet.npz")
        if "mobilefacenet.tflite" in extras and os.path.isfile(npz):
            extras.remove("mobilefacenet.tflite")  # imported weights found
        embed_untrained = ("mobilefacenet.tflite" in extras
                           or "mobilefacenet.npz" in extras)
        add("optional models", not extras,
            "trained embedding/multiclass models present"
            if not extras else
            f"absent (expected; out-of-repo upstream): {', '.join(extras)}"
            " — import via tools/import_weights.py or drop the .tflite in"
            + ("; embeddings will run RANDOM-INIT (cannot discriminate "
               "identities)" if embed_untrained else ""),
            required=False)

    # 2. device backend (main() already ran the hang watchdog).  A silent
    #    error->CPU fallback inside ensure_backend IS the failure this
    #    self-check exists to catch — "ok device backend: cpu" on a broken
    #    TPU deployment would defeat it.
    import jax

    from .utils.backend import backend_fallback_reason
    devs = jax.devices()
    fell_back = backend_fallback_reason()
    if fell_back:
        add("device backend", False,
            f"accelerator init FAILED, silently fell back to cpu: "
            f"{fell_back} (set FDT_FORCE_CPU=1 if CPU is intended)")
    else:
        add("device backend", len(devs) > 0,
            f"{jax.default_backend()}: "
            + ", ".join(str(d) for d in devs[:8])
            + (" …" if len(devs) > 8 else "")
            + (" (FDT_FORCE_CPU)" if os.environ.get("FDT_FORCE_CPU")
               else ""))

    # 3. persistent compile cache (optional: absence only slows restarts).
    if os.environ.get("FDT_NO_COMPILE_CACHE"):
        add("compile cache", True, "disabled via FDT_NO_COMPILE_CACHE=1",
            required=False)
    else:
        # Single-sourced with the pipeline's cache enabling (ADVICE r3:
        # a duplicated default here would drift if the pipeline's moves).
        from .pipeline.detector import default_compile_cache_dir
        cache_dir = default_compile_cache_dir()
        try:
            os.makedirs(cache_dir, exist_ok=True)
            writable = os.access(cache_dir, os.W_OK)
        except OSError:
            writable = False
        n = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
        add("compile cache", writable,
            f"{cache_dir}: {n} cached programs"
            + ("" if n else " (cold — first compiles are 20-240 s on TPU;"
               " tools/warm_tpu.py pre-warms the serving set)")
            if writable else
            f"{cache_dir} not writable — set FDT_COMPILE_CACHE_DIR",
            required=False)

    # 4. native decode pool (optional: PIL fallback covers correctness).
    from .utils.native import native_available
    add("native decode", native_available(),
        "C++ JPEG/PNG/WebP pool loaded" if native_available() else
        "not built (PIL fallback active; `make -C runtime` to build)",
        required=False)

    # 5. opt-in end-to-end smoke.  Gate on the named model-assets check
    #    (positional checks[0] silently re-targets if the list reorders).
    assets_ok = any(c["check"] == "model assets" and c["ok"] for c in checks)
    if args.run and model_dir and assets_ok:
        import time

        import numpy as np

        from .pipeline.config import FaceDetectionMode
        from .pipeline.detector import FaceDetector
        det = None
        try:
            det = FaceDetector(model_dir=model_dir, max_faces=2)
            img = np.zeros((64, 64, 3), np.uint8)
            t0 = time.perf_counter()
            faces = det.detect_faces(img, mode=FaceDetectionMode.FAST)
            ms = (time.perf_counter() - t0) * 1e3
            add("end-to-end detect", True,
                f"64x64 FAST: {len(faces)} faces in {ms:.0f} ms "
                "(includes compile on a cold cache)")
        except Exception as e:  # any failure is the finding itself
            add("end-to-end detect", False, f"{type(e).__name__}: {e}")
        finally:
            if det is not None:
                det.dispose()

    failed = [c for c in checks if c["required"] and not c["ok"]]
    if args.json:
        print(json.dumps({"ok": not failed, "checks": checks}, indent=2))
    else:
        for c in checks:
            mark = "ok  " if c["ok"] else ("FAIL" if c["required"]
                                           else "warn")
            print(f"{mark}  {c['check']}: {c['detail']}")
        print("doctor: " + ("all required checks passed" if not failed
                            else f"{len(failed)} required check(s) FAILED"))
    return 0 if not failed else 1


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "version":
        from . import __version__  # type: ignore[attr-defined]
        print(__version__)
        return 0
    # Every TPU-touching entry point goes through the backend watchdog
    # (the axon relay can hang jax.devices() indefinitely; see
    # utils/backend.ensure_backend).
    from .utils.backend import ensure_backend
    ensure_backend()
    try:
        return {"detect": _cmd_detect, "segment": _cmd_segment,
                "embed": _cmd_embed, "video": _cmd_video,
                "serve": _cmd_serve, "info": _cmd_info,
                "import-weights": _cmd_import_weights,
                "doctor": _cmd_doctor}[args.cmd](args)
    except (ValueError, FileNotFoundError) as e:
        # Undecodable images, missing files/models — the reference maps
        # these to FormatException/ArgumentError (face_detector.dart:
        # 497-499); a CLI maps them to stderr + exit 1, not a traceback.
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
