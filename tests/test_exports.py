"""Public barrel integrity: everything in __all__ exists and key surfaces
are reachable from the package root (the COVERAGE.md claim)."""

import face_detection_tflite_tpu as pkg


def test_all_symbols_exist():
    missing = [n for n in pkg.__all__ if not hasattr(pkg, n)]
    assert not missing, missing
    assert len(pkg.__all__) >= 50


def test_version():
    assert isinstance(pkg.__version__, str)


def test_key_surfaces():
    for name in ("FaceDetector", "Face", "FaceDetectionMode",
                 "SelfieSegmentation", "FaceEmbedding", "ServingPipeline",
                 "TemporalFaceTracker", "FaceSmoother", "convert_file",
                 "FaceDetection", "FaceLandmark", "IrisLandmark",
                 "FaceBlendshapesModel"):
        assert name in pkg.__all__, name
