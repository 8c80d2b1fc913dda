"""Ground-truth table checks parsed DIRECTLY from the reference Dart source.

The oracle and the package share transcriptions of the reference's constant
tables (blendshape subset, eyelid reroutes, contours, SSD options); a
transcription typo would reproduce on both sides and pass every parity
test.  These tests break that circularity: the tables are re-extracted at
test time by parsing the Dart literals in /root/reference, so the single
source of truth is the reference itself.
"""

import os
import re

import numpy as np
import pytest

REF = "/root/reference/lib/src/shared"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference source not mounted")


def _ints_in(text):
    return [int(x) for x in re.findall(r"-?\d+", text)]


def _dart(filename):
    with open(os.path.join(REF, filename)) as f:
        return f.read()


class TestBlendshapeTablesMatchDartSource:
    def test_landmark_subset(self):
        src = _dart("blendshape_input.dart")
        m = re.search(
            r"kBlendshapeLandmarkSubset = <int>\[(.*?)\];", src, re.S)
        ref = [v for v in _ints_in(m.group(1))]
        from face_detection_tflite_tpu.pipeline.blendshape_input import (
            BLENDSHAPE_LANDMARK_SUBSET)
        assert list(BLENDSHAPE_LANDMARK_SUBSET) == ref

    def test_eye_refine_offsets(self):
        src = _dart("blendshape_input.dart")
        m = re.search(
            r"kBlendshapeEyeRefineOffsets = <int, int>\{(.*?)\};", src, re.S)
        body = re.sub(r"//[^\n]*", "", m.group(1))
        pairs = re.findall(r"(\d+)\s*:\s*(\d+)", body)
        ref = {int(k): int(v) for k, v in pairs}
        from face_detection_tflite_tpu.pipeline.blendshape_input import (
            EYE_REFINE_OFFSETS)
        assert EYE_REFINE_OFFSETS == ref

    def test_blendshape_names(self):
        src = _dart("blendshape_input.dart")
        body = re.search(r"enum Blendshape \{(.*?)\}", src, re.S).group(1)
        names = re.findall(r"\w+\('([A-Za-z_]+)'\)", body)
        assert len(names) == 52
        from face_detection_tflite_tpu.pipeline.blendshape_input import (
            BLENDSHAPE_NAMES)
        assert BLENDSHAPE_NAMES == names


class TestContourTablesMatchDartSource:
    def test_contours(self):
        src = _dart("face_types.dart")
        m = re.search(r"faceContourMeshIndices = \{(.*?)\n\};", src, re.S)
        body = m.group(1)
        entries = re.findall(
            r"FaceContourType\.(\w+):\s*\[(.*?)\]", body, re.S)
        ref = {name: _ints_in(re.sub(r"//[^\n]*", "", idxs))
               for name, idxs in entries}
        from face_detection_tflite_tpu.pipeline.types import (
            FACE_CONTOUR_MESH_INDICES)
        ours = {t.value: v for t, v in FACE_CONTOUR_MESH_INDICES.items()}
        assert set(ours) == set(ref)
        for name in ref:
            assert ours[name] == ref[name], f"contour {name}"

    def test_eye_connections(self):
        src = _dart("face_types.dart")
        m = re.search(r"eyeLandmarkConnections = \[(.*?)\];", src, re.S)
        vals = _ints_in(m.group(1))
        ref = [(vals[i], vals[i + 1]) for i in range(0, len(vals), 2)]
        from face_detection_tflite_tpu.pipeline.types import (
            EYE_LANDMARK_CONNECTIONS)
        assert EYE_LANDMARK_CONNECTIONS == ref


class TestSsdOptionsMatchDartSource:
    @pytest.mark.parametrize("dart_name,py_name", [
        ("kSsdFront", "SSD_FRONT"), ("kSsdBack", "SSD_BACK"),
        ("kSsdFull", "SSD_FULL")])
    def test_options(self, dart_name, py_name):
        src = _dart("face_model_config.dart")
        m = re.search(dart_name + r" = SSDAnchorOptions\((.*?)\);", src, re.S)
        body = m.group(1)

        def field(name, cast=float):
            fm = re.search(name + r":\s*([\d.\[\], ]+)", body)
            return fm.group(1).strip().rstrip(",")

        import face_detection_tflite_tpu.ops.anchors as A
        opts = getattr(A, py_name)
        assert opts.num_layers == int(field("numLayers"))
        assert opts.min_scale == pytest.approx(float(field("minScale")))
        assert opts.max_scale == pytest.approx(float(field("maxScale")))
        assert opts.input_size_height == int(field("inputSizeHeight"))
        assert opts.input_size_width == int(field("inputSizeWidth"))
        assert opts.anchor_offset_x == pytest.approx(
            float(field("anchorOffsetX")))
        assert opts.anchor_offset_y == pytest.approx(
            float(field("anchorOffsetY")))
        assert list(opts.strides) == _ints_in(field("strides"))
        assert opts.interpolated_scale_aspect_ratio == pytest.approx(
            float(field("interpolatedScaleAspectRatio")))


class TestAnchorsIndependent:
    def test_front_anchor_centers_brute_force(self):
        """Independent re-derivation of the front anchor layout (no shared
        code with ops.anchors): per-stride-group grids with per-cell
        repeats = layers_in_group * (aspects + interp)."""
        from face_detection_tflite_tpu.ops.anchors import (SSD_FRONT,
                                                           generate_anchors)
        got = generate_anchors(SSD_FRONT)
        expected = []
        # group 1: layer 0 alone (stride 8 -> 16x16 grid, 2 anchors/cell)
        for y in range(16):
            for x in range(16):
                for _ in range(2):
                    expected.append(((x + 0.5) / 16, (y + 0.5) / 16))
        # group 2: layers 1-3 share stride 16 -> 8x8 grid, 6 anchors/cell
        for y in range(8):
            for x in range(8):
                for _ in range(6):
                    expected.append(((x + 0.5) / 8, (y + 0.5) / 8))
        expected = np.asarray(expected, np.float32)
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=1e-7)

    def test_full_anchor_centers_brute_force(self):
        from face_detection_tflite_tpu.ops.anchors import (SSD_FULL,
                                                           generate_anchors)
        got = generate_anchors(SSD_FULL)
        expected = np.asarray(
            [((x + 0.5) / 48, (y + 0.5) / 48)
             for y in range(48) for x in range(48)], np.float32)
        np.testing.assert_allclose(got, expected, atol=1e-7)

    def test_back_anchor_centers_brute_force(self):
        from face_detection_tflite_tpu.ops.anchors import (SSD_BACK,
                                                           generate_anchors)
        got = generate_anchors(SSD_BACK)
        expected = []
        for y in range(16):   # stride 16 on 256 -> 16x16, 2/cell
            for x in range(16):
                for _ in range(2):
                    expected.append(((x + 0.5) / 16, (y + 0.5) / 16))
        for y in range(8):    # strides 32,32,32 -> 8x8, 6/cell
            for x in range(8):
                for _ in range(6):
                    expected.append(((x + 0.5) / 8, (y + 0.5) / 8))
        np.testing.assert_allclose(got, np.asarray(expected, np.float32),
                                   atol=1e-7)
