"""face_detection_tflite_tpu — TPU-native MediaPipe-style face pipeline.

A from-scratch JAX/XLA re-design of the capabilities of the
`face_detection_tflite` Flutter package: BlazeFace detection (5 variants),
468-pt FaceMesh, iris refinement, 52-coeff blendshapes, head pose, selfie
segmentation, MobileFaceNet embeddings, gates, and temporal tracking — with
every pipeline stage fused into batched XLA programs instead of
host-orchestrated per-stage interpreters.

Quick start::

    from face_detection_tflite_tpu import FaceDetector
    det = FaceDetector()
    faces = det.detect_faces_from_filepath("photo.jpg")
    faces[0].bounding_box, faces[0].mesh.points, faces[0].blendshapes
"""

from .convert.checkpoint import (load_params_npz, save_params_npz,
                                 swap_params)
from .convert.executor import ConvertedModel, convert_file, convert_model
from .convert.tflite import parse_tflite
from .models.embedding import (FaceEmbedding, UntrainedEmbeddingWarning,
                               compute_embedding_alignment,
                               cosine_similarity, euclidean_distance)
from .models.segmentation import (MulticlassSegmentationMask,
                                  SegmentationClass, SegmentationMask,
                                  SelfieSegmentation)
from .models.standalone import (FaceBlendshapesModel, FaceDetection,
                                FaceLandmark, IrisLandmark)
from .ops.letterbox import LetterboxParams, letterbox_params
from .pipeline.blendshape_input import BLENDSHAPE_NAMES
from .pipeline.config import (MODEL_FILES, FaceDetectionMode,
                              FaceDetectionModel, SegmentationConfig,
                              SegmentationModel)
from .pipeline.detector import FaceDetector, resolve_model_dir
from .pipeline.geometry import eye_rois_from_mesh, face_detection_to_roi
from .pipeline.programs import PipelineModels, build_pipeline_program
from .pipeline.server import FaceServer
from .parallel.replica import ReplicaPool
from .pipeline.serving import ServingPipeline
from .pipeline.smoothing import FaceSmoother, OneEuroFilter
from .pipeline.timings import DetectTimings, FpsCounter
from .pipeline.tracker import TemporalFaceTracker
from .pipeline.video import FrameThrottle, VideoFrameResult, process_video
from .utils.metrics import MetricsRegistry
from .utils.camera import (CameraFormat, CameraFrame, CameraRotation,
                           camera_frame_from_image, camera_frame_from_planes,
                           decode_camera_frame)
from .pipeline.types import (Blendshape, Detection, Eye, EyePair, Face,
                             FaceBlendshapes, FaceContourType, FaceLandmarks,
                             FaceLandmarkType, FaceMesh, HeadEulerAngles,
                             RectF, AlignedRoi, FACE_CONTOUR_MESH_INDICES,
                             split_meshes_if_concatenated)

__version__ = "0.1.0"

__all__ = [
    "FaceDetector", "FaceDetectionMode", "FaceDetectionModel",
    "SegmentationModel", "SegmentationConfig", "Face", "Detection", "FaceMesh", "Eye", "EyePair",
    "FaceLandmarks", "FaceLandmarkType", "FaceContourType", "Blendshape",
    "FaceBlendshapes", "HeadEulerAngles", "RectF", "AlignedRoi",
    "FACE_CONTOUR_MESH_INDICES", "split_meshes_if_concatenated",
    "SegmentationMask",
    "MulticlassSegmentationMask", "SegmentationClass", "SelfieSegmentation",
    "FaceEmbedding", "UntrainedEmbeddingWarning",
    "cosine_similarity", "euclidean_distance",
    "compute_embedding_alignment", "TemporalFaceTracker", "PipelineModels",
    "build_pipeline_program", "convert_file", "convert_model",
    "parse_tflite", "ConvertedModel", "resolve_model_dir",
    "ServingPipeline", "ReplicaPool", "FaceServer", "MetricsRegistry",
    "DetectTimings", "FpsCounter", "FrameThrottle",
    "VideoFrameResult", "process_video", "CameraFormat",
    "camera_frame_from_image", "camera_frame_from_planes", "CameraFrame",
    "CameraRotation", "decode_camera_frame", "load_params_npz",
    "save_params_npz", "swap_params", "FaceDetection", "FaceLandmark",
    "FaceSmoother",
    "OneEuroFilter",
    "IrisLandmark", "FaceBlendshapesModel",
    # Helper surface mirrored from the reference's native barrel
    # (`face_native_lib.dart:30-90`): geometry ROI helpers, blendshape
    # name table, letterbox math, model-file map.
    "eye_rois_from_mesh", "face_detection_to_roi", "BLENDSHAPE_NAMES",
    "letterbox_params", "LetterboxParams", "MODEL_FILES",
]
