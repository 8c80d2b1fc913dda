"""Overlay polish: face-info cards, multiclass/mask painters, virtual
background, camera-overlay compositor, performance badge.

Reference semantics: `lib/src/ui/overlay_painters.dart` —
faceInfoLabelText (:116), drawFaceInfoLabel (:151), SegmentationMaskPainter
(:889), VirtualBackgroundOverlayPainter (:813), performanceLevel (:29),
maskValidRegion (:41), drawSegmentationClassLabels (:58).
"""

import numpy as np
import pytest

from face_detection_tflite_tpu.models.segmentation import (
    MulticlassSegmentationMask, SegmentationMask)
from face_detection_tflite_tpu.pipeline.types import (Detection, Face,
                                                      FaceMesh, RectF)
from face_detection_tflite_tpu.utils import render


def _face(with_mesh=True, with_blendshapes=False, box=(0.2, 0.2, 0.8, 0.8),
          size=(100, 100)):
    kp = np.asarray([[0.3, 0.3], [0.6, 0.3], [0.45, 0.45], [0.45, 0.6],
                     [0.2, 0.35], [0.7, 0.35]])
    det = Detection(RectF(*box), 0.9, kp)
    mesh = FaceMesh(np.random.default_rng(0).uniform(20, 80, (468, 3)),
                    0.99) if with_mesh else None
    bs = np.full(52, 0.25) if with_blendshapes else None
    return Face(det, mesh, np.zeros((0, 3)), size, blendshape_scores=bs)


class TestFaceInfoLabel:
    def test_text_with_mesh_has_score_mesh_and_pyr(self):
        t = render.face_info_label_text(_face())
        assert t.startswith("score 0.90  mesh 0.99")
        for tag in ("P ", "Y ", "R "):
            assert tag in t
        assert "°" in t

    def test_text_without_mesh_is_roll_only(self):
        t = render.face_info_label_text(_face(with_mesh=False))
        assert "mesh" not in t
        assert "P " not in t and "Y " not in t
        assert "R " in t  # fast-mode fallback roll (face_types.dart:1271)

    def test_classification_opt_in(self):
        f = _face(with_blendshapes=True)
        base = render.face_info_label_text(f)
        assert "smile" not in base
        t = render.face_info_label_text(f, show_classification=True)
        assert "smile 0.25" in t and "eyeL 0.75" in t and "eyeR 0.75" in t

    def test_card_darkens_above_box(self):
        img = np.full((100, 100, 3), 255, np.uint8)
        out = render.draw_face_info(img, [_face(box=(0.2, 0.5, 0.8, 0.9))])
        # Box top at y=50 -> the card sits in rows just above it and is a
        # translucent black fill (alpha 179/255 over white ~= 76).
        band = out[:50, :]
        assert band.min() < 100
        assert (out[60:] == 255).all()   # nothing below the card anchor
        assert (img == 255).all()        # input untouched

    def test_card_falls_inside_when_no_room(self):
        img = np.full((100, 100, 3), 255, np.uint8)
        out = render.draw_face_info(
            img, [_face(box=(0.2, 0.0, 0.8, 0.6))])  # box top at y=0
        assert (out[:1] == 255).all() or out[:20].min() < 100
        # Card must be below the top edge, i.e. somewhere in the image.
        assert out.min() < 100

    def test_landmark_labels_smoke(self):
        img = np.zeros((100, 100, 3), np.uint8)
        out = render.draw_detections(img, [_face()],
                                     show_landmark_labels=True)
        assert out.sum() > render.draw_detections(img, [_face()]).sum()


class TestPerformanceLevel:
    @pytest.mark.parametrize("ms,label", [
        (0, "Excellent"), (199, "Excellent"), (200, "Good"), (499, "Good"),
        (500, "Fair"), (999, "Fair"), (1000, "Slow"), (5000, "Slow")])
    def test_buckets(self, ms, label):
        got, color = render.performance_level(ms)
        assert got == label
        assert len(color) == 3


class TestMaskPainters:
    def _mask(self, padding=(0.0, 0.0, 0.0, 0.0)):
        data = np.zeros((8, 8), np.float32)
        data[2:6, 2:6] = 1.0
        return SegmentationMask(data, 64, 64, padding)

    def _multi(self):
        class_data = np.zeros((8, 8, 6), np.float32)
        class_data[..., 0] = 1.0            # background everywhere
        class_data[:4, :, 1] = 2.0          # hair wins the top half
        class_data[4:, :, 3] = 2.0          # face skin wins the bottom
        data = 1.0 - class_data[..., 0] / 2.0
        return MulticlassSegmentationMask(data, 64, 64, (0, 0, 0, 0),
                                          class_data=class_data)

    def test_mask_valid_region(self):
        m = self._mask(padding=(0.25, 0.25, 0.125, 0.125))
        assert render.mask_valid_region(m) == (1, 2, 7, 6)

    def test_draw_mask_tints_person_area_only(self):
        img = np.zeros((64, 64, 3), np.uint8)
        out = render.draw_mask(img, self._mask(), color=(0, 255, 0, 255))
        assert out[32, 32, 1] > 200      # inside the person block
        assert out[2, 2, 1] == 0         # outside untouched

    def test_draw_mask_binary_vs_soft(self):
        img = np.zeros((64, 64, 3), np.uint8)
        m = self._mask()
        m.data[:] = 0.6
        soft = render.draw_mask(img, m, color=(0, 255, 0, 255))
        hard = render.draw_mask(img, m, color=(0, 255, 0, 255), binary=True)
        assert hard[32, 32, 1] > soft[32, 32, 1]   # 255*1.0 vs 255*0.6

    def test_draw_mask_class_index_isolates_plane(self):
        img = np.zeros((64, 64, 3), np.uint8)
        out = render.draw_mask(img, self._multi(), class_index=1,
                               color=(255, 0, 0, 255))
        assert out[8, 32, 0] > 200       # hair half tinted
        assert out[56, 32, 0] < 60       # face half not (class 1 ~ 0 there)

    def test_multiclass_winning_class_colors(self):
        img = np.zeros((64, 64, 3), np.uint8)
        out = render.draw_multiclass_segmentation(img, self._multi(),
                                                  show_labels=False)
        hair = np.asarray(render.SEGMENTATION_CLASS_COLORS[1][:3])
        face = np.asarray(render.SEGMENTATION_CLASS_COLORS[3][:3])
        # Probability 1 x class alpha 153/136 over black.
        assert np.allclose(out[8, 32], hair * (153 / 255), atol=2)
        assert np.allclose(out[56, 32], face * (136 / 255), atol=2)

    def test_multiclass_labels_drawn_at_centroids(self):
        # The painter's label threshold is >100 mask-resolution pixels
        # (overlay_painters.dart:65) — an 8x8 synthetic can never qualify,
        # so build a 32x32 mask (512 hair + 512 face pixels).
        class_data = np.zeros((32, 32, 6), np.float32)
        class_data[..., 0] = 1.0
        class_data[:16, :, 1] = 2.0
        class_data[16:, :, 3] = 2.0
        multi = MulticlassSegmentationMask(
            1.0 - class_data[..., 0] / 2.0, 64, 64, (0, 0, 0, 0),
            class_data=class_data)
        img = np.zeros((64, 64, 3), np.uint8)
        plain = render.draw_multiclass_segmentation(img, multi,
                                                    show_labels=False)
        labeled = render.draw_multiclass_segmentation(img, multi,
                                                      show_labels=True)
        assert (labeled != plain).any()
        # Labels land near the class centroids (rows 16 and 48).
        assert (labeled[10:22] != plain[10:22]).any()
        assert (labeled[42:54] != plain[42:54]).any()

    def test_multiclass_small_classes_get_no_label(self):
        img = np.zeros((64, 64, 3), np.uint8)
        plain = render.draw_multiclass_segmentation(img, self._multi(),
                                                    show_labels=False)
        labeled = render.draw_multiclass_segmentation(img, self._multi(),
                                                      show_labels=True)
        # 8x8 mask: every class is under the 100-mask-pixel threshold.
        assert (labeled == plain).all()

    def test_virtual_background_replaces_background_only(self):
        img = np.full((64, 64, 3), 200, np.uint8)
        bg = np.zeros((32, 32, 3), np.uint8)
        bg[..., 2] = 255  # blue background image
        out = render.draw_virtual_background(img, self._mask(), bg)
        assert (out[32, 32] == 200).all()            # person kept as-is
        assert out[2, 2, 2] > 200 and out[2, 2, 0] < 60   # bg replaced

    def test_virtual_background_mirror(self):
        img = np.full((64, 64, 3), 200, np.uint8)
        bg = np.zeros((64, 64, 3), np.uint8)
        m = self._mask()
        m.data[:] = 0.0
        m.data[:, :4] = 1.0   # person strip on the left
        out = render.draw_virtual_background(img, m, bg,
                                             mirror_horizontally=True)
        assert out[32, 60, 0] == 200   # person strip mirrored to the right
        assert out[32, 4, 0] < 60


class TestComposeCameraOverlay:
    def test_layers_and_badge(self):
        img = np.full((64, 64, 3), 128, np.uint8)
        data = np.zeros((8, 8), np.float32)
        data[2:6, 2:6] = 1.0
        mask = SegmentationMask(data, 64, 64, (0, 0, 0, 0))
        out = render.compose_camera_overlay(
            img, [_face(size=(64, 64))], mask=mask, show_segmentation=True,
            show_pose_and_scores=True, detect_ms=12.0)
        assert out.shape == img.shape
        assert (out != img).any()
        # Performance badge occupies the top-left corner.
        assert (out[4:12, 4:30] != img[4:12, 4:30]).any()

    def test_virtual_background_layer_takes_precedence(self):
        img = np.full((64, 64, 3), 200, np.uint8)
        data = np.ones((8, 8), np.float32)
        mask = SegmentationMask(data, 64, 64, (0, 0, 0, 0))
        bg = np.zeros((16, 16, 3), np.uint8)
        out = render.compose_camera_overlay(
            img, [], mask=mask, virtual_background=bg,
            show_segmentation=True)
        # prob==1 everywhere -> person everywhere -> original kept.
        assert (out == 200).all()


class TestLipstickGeometry:
    """Mirror of the reference's lipstick mask geometry tests
    (`example/integration_test/lipstick_overlay_test.dart`): the filled
    region covers lip flesh, excludes the mouth opening and surrounding
    skin, and the gates/dilation behave as documented."""

    @pytest.fixture(scope="class")
    def face(self):
        import os
        from PIL import Image
        from face_detection_tflite_tpu import (FaceDetectionMode,
                                               FaceDetectionModel,
                                               FaceDetector)
        from .asset_paths import MODELS_DIR, SAMPLES
        if not os.path.isdir(MODELS_DIR):
            pytest.skip("model assets not fetched")
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           model_dir=MODELS_DIR)
        img = np.asarray(Image.open(
            os.path.join(SAMPLES, "landmark-ex1.jpg")).convert("RGB"))
        (face,) = det.detect_faces(img, FaceDetectionMode.FULL)
        det.dispose()
        return face, img.shape

    @staticmethod
    def _arc_mid(face, ctype):
        # Contour index 5 is the mid-line vertex of each lip arc (mesh 0,
        # 13, 14, 17 respectively).
        return face.mesh.contour(ctype)[5, :2]

    def _mask(self, face, shape, **kw):
        kw.setdefault("dilate_pixels", 0.0)
        return render.lipstick_mask(face, shape, **kw)

    @staticmethod
    def _at(mask, pt):
        x, y = int(round(pt[0])), int(round(pt[1]))
        return bool(mask[y, x])

    def test_covers_lip_flesh(self, face):
        from face_detection_tflite_tpu.pipeline.types import FaceContourType
        face, shape = face
        m = self._mask(face, shape)
        upper = (self._arc_mid(face, FaceContourType.UPPER_LIP_TOP)
                 + self._arc_mid(face, FaceContourType.UPPER_LIP_BOTTOM)) / 2
        lower = (self._arc_mid(face, FaceContourType.LOWER_LIP_TOP)
                 + self._arc_mid(face, FaceContourType.LOWER_LIP_BOTTOM)) / 2
        assert self._at(m, upper), "upper lip flesh must be painted"
        assert self._at(m, lower), "lower lip flesh must be painted"

    def test_excludes_surrounding_skin(self, face):
        face, shape = face
        m = self._mask(face, shape)
        ys, xs = np.nonzero(m)
        cx, cy = xs.mean(), ys.mean()
        w, h = xs.max() - xs.min(), ys.max() - ys.min()
        for px, py in [(xs.min() - 0.3 * w, cy), (xs.max() + 0.3 * w, cy),
                       (cx, ys.min() - 0.8 * h), (cx, ys.max() + 0.8 * h)]:
            assert not self._at(m, (px, py)), "skin must stay clean"

    def test_open_fraction_gate(self, face):
        from face_detection_tflite_tpu.pipeline.types import FaceContourType
        face, shape = face
        opening = (self._arc_mid(face, FaceContourType.UPPER_LIP_BOTTOM)
                   + self._arc_mid(face, FaceContourType.LOWER_LIP_TOP)) / 2
        cut = self._mask(face, shape, min_open_fraction=0.05)
        filled = self._mask(face, shape, min_open_fraction=0.5)
        assert not self._at(cut, opening), "mouth opening must be cut out"
        assert self._at(filled, opening), "closed-mouth case fills solid"

    def test_dilation_grows_without_moving_center(self, face):
        face, shape = face
        tight = self._mask(face, shape)
        grown = self._mask(face, shape, dilate_pixels=3.0)
        ty, tx = np.nonzero(tight)
        gy, gx = np.nonzero(grown)
        assert gx.max() - gx.min() > tx.max() - tx.min()
        assert gy.max() - gy.min() > ty.max() - ty.min()
        short = min(tx.max() - tx.min(), ty.max() - ty.min())
        drift = np.hypot(gx.mean() - tx.mean(), gy.mean() - ty.mean())
        assert drift < short * 0.25, "dilation must not translate the mask"

    def test_draw_lipstick_preserves_luminance(self, face):
        face, shape = face
        rng = np.random.default_rng(0)
        img = rng.integers(40, 220, (*shape[:2], 3), dtype=np.uint8)
        out = render.draw_lipstick(img, [face])
        m = render.lipstick_mask(face, shape, dilate_pixels=1.0)
        # The feathered edge bleeds a few px past the binary mask; pixels
        # clear of that halo are untouched.
        ys, xs = np.nonzero(m)
        halo = np.zeros_like(m)
        halo[max(ys.min() - 8, 0):ys.max() + 9,
             max(xs.min() - 8, 0):xs.max() + 9] = True
        assert (out[~halo] == img[~halo]).all()
        lum = np.array([0.3, 0.59, 0.11])
        before = (img[m] / 255.0) @ lum
        after = (out[m] / 255.0) @ lum
        # BlendMode.color keeps luminosity; lerping by strength/feather
        # alpha mixes two same-luminance colors, so it holds throughout.
        assert np.abs(before - after).mean() < 0.02
        # And the painted region takes the paint's hue direction (red-ish).
        assert (out[m][:, 0].astype(int) - out[m][:, 1].astype(int)).mean() \
            > 10
        # strength=0 is a no-op (LipstickPainter early-out).
        assert (render.draw_lipstick(img, [face], strength=0.0)
                == img).all()


class TestLipRingPrimitives:
    def test_signed_area_and_winding(self):
        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
        assert render.ring_signed_area(sq) == pytest.approx(4.0)
        assert render.ring_signed_area(sq[::-1]) == pytest.approx(-4.0)

    def test_dilate_is_winding_invariant(self):
        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
        for ring in (sq, sq[::-1]):
            d = render.dilate_ring(ring, 1.0)
            assert abs(render.ring_signed_area(d)) > \
                abs(render.ring_signed_area(ring))
        assert render.dilate_ring(sq, 0.0) is not None
        np.testing.assert_allclose(render.dilate_ring(sq, 0.0), sq)

    def test_lip_ring_drops_shared_endpoints(self):
        top = np.array([[0, 0], [1, -1], [2, 0]], float)
        bottom = np.array([[0, 0], [1, 1], [2, 0]], float)
        ring = render.lip_ring(top, bottom)
        assert ring.shape == (4, 2)  # 3 + 3 - 2 shared
        # Unique vertices only.
        assert len(np.unique(ring, axis=0)) == 4

    def test_even_odd_fill_hole(self):
        outer = np.array([[1, 1], [11, 1], [11, 11], [1, 11]], float)
        inner = np.array([[4, 4], [8, 4], [8, 8], [4, 8]], float)
        m = render._fill_even_odd([outer, inner], (14, 14))
        assert m[2, 2] and not m[6, 6] and not m[0, 0]
        # Winding of the hole must not matter (even-odd).
        m2 = render._fill_even_odd([outer, inner[::-1]], (14, 14))
        assert (m == m2).all()


class TestMirroring:
    """All overlay layers mirror, like the reference widget passes
    mirrorHorizontally to EVERY painter (overlay_painters.dart:1156-1190),
    not only the virtual background."""

    def test_mirror_face_roundtrip_and_coords(self):
        w = 100.0
        f = _face()
        m = render.mirror_face(f, w)
        bb, mb = f.bounding_box, m.bounding_box
        assert mb.xmin == pytest.approx(1.0 - bb.xmax)
        assert mb.xmax == pytest.approx(1.0 - bb.xmin)
        assert (mb.ymin, mb.ymax) == (bb.ymin, bb.ymax)
        np.testing.assert_allclose(m.mesh.points[:, 0],
                                   w - f.mesh.points[:, 0])
        np.testing.assert_allclose(m.mesh.points[:, 1:], f.mesh.points[:, 1:])
        back = render.mirror_face(m, w)
        np.testing.assert_allclose(back.mesh.points, f.mesh.points)
        np.testing.assert_allclose(back.detection_data.keypoints_xy,
                                   f.detection_data.keypoints_xy)

    def test_draw_mask_mirrored_equals_flipped(self):
        """Tinting a mirrored preview == flipping the unmirrored tint."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        data = np.zeros((16, 16), np.float32)
        data[4:12, 2:8] = 0.9  # off-center so the flip matters
        mask = SegmentationMask(data, 64, 64, (0.0, 0.0, 0.0, 0.0))
        lhs = render.draw_mask(img[:, ::-1], mask, mirror_horizontally=True)
        rhs = render.draw_mask(img, mask)[:, ::-1]
        np.testing.assert_array_equal(lhs, rhs)

    def test_compose_mirrors_faces_and_tint(self):
        """Composing with mirror_horizontally moves the face overlay to
        the mirrored side of the canvas."""
        img = np.zeros((100, 100, 3), np.uint8)
        f = _face(box=(0.1, 0.3, 0.4, 0.7))  # face on the LEFT
        plain = render.compose_camera_overlay(img, [f])
        mirrored = render.compose_camera_overlay(img, [f],
                                                 mirror_horizontally=True)
        # Overlay ink on the left half without mirroring, right half with.
        assert plain[:, :50].sum() > plain[:, 50:].sum()
        assert mirrored[:, 50:].sum() > mirrored[:, :50].sum()
