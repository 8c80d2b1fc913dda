"""Render overlays and mask serialization round-trips."""

import os

import numpy as np
import pytest

from face_detection_tflite_tpu.models.segmentation import (
    MulticlassSegmentationMask, SegmentationMask)
from face_detection_tflite_tpu.pipeline.types import Detection, Face, RectF
from face_detection_tflite_tpu.utils import render


def _face():
    kp = np.asarray([[0.3, 0.3], [0.6, 0.3], [0.45, 0.45], [0.45, 0.6],
                     [0.2, 0.35], [0.7, 0.35]])
    det = Detection(RectF(0.2, 0.2, 0.8, 0.8), 0.9, kp)
    mesh = np.random.default_rng(0).uniform(20, 80, (468, 3))
    from face_detection_tflite_tpu.pipeline.types import FaceMesh
    iris = np.random.default_rng(1).uniform(30, 70, (152, 3))
    return Face(det, FaceMesh(mesh, 0.99), iris, (100, 100))


class TestRender:
    def test_draw_detections_modifies_pixels(self):
        img = np.zeros((100, 100, 3), np.uint8)
        out = render.draw_detections(img, [_face()])
        assert out.shape == img.shape
        assert (out != img).any()
        assert (img == 0).all()  # input untouched

    def test_annotate_with_mask(self):
        img = np.zeros((100, 100, 3), np.uint8)
        mask = SegmentationMask(np.ones((50, 50), np.float32), 100, 100,
                                (0, 0, 0, 0))
        out = render.annotate(img, [_face()], mask)
        assert out.shape == img.shape
        assert out.sum() > 0

    def test_draw_contours_and_iris(self):
        img = np.zeros((100, 100, 3), np.uint8)
        out = render.draw_iris(render.draw_contours(img, [_face()]),
                               [_face()])
        assert (out != 0).any()


class TestMaskSerialization:
    def _mask(self):
        rng = np.random.default_rng(0)
        return SegmentationMask(rng.uniform(0, 1, (32, 24)).astype(np.float32),
                                240, 320, (0.1, 0.1, 0.0, 0.0))

    def test_float32_roundtrip(self):
        m = self._mask()
        d = m.serialize("float32")
        m2 = SegmentationMask.deserialize(d)
        assert np.array_equal(m.data, m2.data)
        assert m2.padding == m.padding
        assert (m2.original_width, m2.original_height) == (240, 320)

    def test_uint8_roundtrip_quantizes(self):
        m = self._mask()
        m2 = SegmentationMask.deserialize(m.serialize("uint8"))
        assert np.abs(m.data - m2.data).max() <= 0.5 / 255 + 1e-6

    def test_binary_roundtrip(self):
        m = self._mask()
        m2 = SegmentationMask.deserialize(m.serialize("binary", 0.5))
        assert set(np.unique(m2.data)) <= {0.0, 1.0}
        assert np.array_equal(m2.data == 1.0, m.data >= 0.5)

    def test_multiclass_roundtrip(self):
        rng = np.random.default_rng(1)
        cls = rng.uniform(0, 1, (16, 16, 6)).astype(np.float32)
        m = MulticlassSegmentationMask(1.0 - cls[..., 0], 64, 64,
                                       (0, 0, 0, 0), class_data=cls)
        m2 = SegmentationMask.deserialize(m.serialize())
        assert isinstance(m2, MulticlassSegmentationMask)
        assert np.array_equal(m.class_data, m2.class_data)

    def test_to_uint8_to_binary_to_rgba(self):
        m = self._mask()
        assert m.to_uint8().dtype == np.uint8
        assert set(np.unique(m.to_binary())) <= {0, 255}
        rgba = m.to_rgba()
        assert rgba.shape == (32, 24, 4)

    def test_unknown_format_rejected(self):
        with pytest.raises(ValueError, match="Unknown data format"):
            self._mask().serialize("float16")
