"""Weight-import paths for the two out-of-repo model assets (VERDICT r2
next #5): MobileFaceNet checkpoints -> `build_mobilefacenet` params, and a
user-supplied `selfie_multiclass.tflite` through the converter.

Reference: the assets ship only via pub.dev (`pubspec.yaml:45-46`,
`face_embedding.dart:46`); a user who has them must get real
recognition/multiclass with zero code.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from import_weights import (fold_bn, import_mobilefacenet_npz,
                            import_mobilefacenet_state_dict)

from .asset_paths import MODELS_DIR


def _synthetic_state_dict(seed=0, prelu_scalar=False):
    """Torch-style ordered state_dict following the MobileFaceNet paper
    layout, with shapes derived from the template tree."""
    from face_detection_tflite_tpu.models.embedding import build_mobilefacenet
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_weights import _conv_order

    template = build_mobilefacenet().params
    rng = np.random.default_rng(seed)
    sd = {}
    for i, (name, has_prelu) in enumerate(_conv_order()):
        kh, kw, cin_g, cout = template[f"{name}_w"].shape
        mod = f"layer{i}"
        sd[f"{mod}.conv.weight"] = rng.normal(
            0, 0.1, (cout, cin_g, kh, kw)).astype(np.float32)
        sd[f"{mod}.bn.weight"] = rng.uniform(
            0.5, 1.5, (cout,)).astype(np.float32)
        sd[f"{mod}.bn.bias"] = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        sd[f"{mod}.bn.running_mean"] = rng.normal(
            0, 0.1, (cout,)).astype(np.float32)
        sd[f"{mod}.bn.running_var"] = rng.uniform(
            0.5, 2.0, (cout,)).astype(np.float32)
        sd[f"{mod}.bn.num_batches_tracked"] = np.asarray(100)
        if has_prelu:
            shape = (1,) if prelu_scalar else (cout,)
            sd[f"{mod}.prelu.weight"] = rng.uniform(
                0.1, 0.4, shape).astype(np.float32)
    return sd


def _insightface_state_dict(seed=7):
    """State dict with the key layout of the most common public
    MobileFaceNet checkpoint (TreB1eN/InsightFace_Pytorch
    model_mobilefacenet.pth): Conv_block = conv+bn+prelu, Linear_block =
    conv+bn, Depth_Wise = conv/conv_dw/project, Residual = model.N
    Sequential, and a 2-D nn.Linear + BatchNorm1d TAIL (not a 1x1 conv).
    Values are random; what this pins is that the real-world NAMING and
    MODULE NESTING map through the order-based importer."""
    from face_detection_tflite_tpu.models.embedding import (_MFN_BLOCKS,
                                                            build_mobilefacenet)
    template = build_mobilefacenet().params
    rng = np.random.default_rng(seed)
    sd = {}

    def conv_block(mod, tmpl_name, prelu=True, linear_tail=False):
        kh, kw, cin_g, cout = template[f"{tmpl_name}_w"].shape
        if linear_tail:
            sd[f"{mod}.weight"] = rng.normal(
                0, 0.1, (cout, cin_g)).astype(np.float32)  # nn.Linear 2-D
            bn = "bn"  # sibling BatchNorm1d module, not nested
        else:
            sd[f"{mod}.conv.weight"] = rng.normal(
                0, 0.1, (cout, cin_g, kh, kw)).astype(np.float32)
            bn = f"{mod}.bn"
        sd[f"{bn}.weight"] = rng.uniform(0.5, 1.5, (cout,)).astype(
            np.float32)
        sd[f"{bn}.bias"] = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        sd[f"{bn}.running_mean"] = rng.normal(0, 0.1, (cout,)).astype(
            np.float32)
        sd[f"{bn}.running_var"] = rng.uniform(0.5, 2.0, (cout,)).astype(
            np.float32)
        sd[f"{bn}.num_batches_tracked"] = np.asarray(100)
        if prelu:
            sd[f"{mod}.prelu.weight"] = rng.uniform(
                0.1, 0.4, (cout,)).astype(np.float32)

    conv_block("conv1", "stem")
    conv_block("conv2_dw", "stem_dw")
    # InsightFace groups the 15 bottleneck units as Depth_Wise downsamplers
    # (conv_23/34/45) + Residual stacks (conv_3/4/5); unit order matches
    # the paper layout both sides use.
    flat_units = []
    for bi, (_t, _c, n, _s) in enumerate(_MFN_BLOCKS):
        for ri in range(n):
            flat_units.append((bi, ri))
    names = (["conv_23"] + [f"conv_3.model.{i}" for i in range(4)] +
             ["conv_34"] + [f"conv_4.model.{i}" for i in range(6)] +
             ["conv_45"] + [f"conv_5.model.{i}" for i in range(2)])
    assert len(names) == len(flat_units)
    for mod, (bi, ri) in zip(names, flat_units):
        conv_block(f"{mod}.conv", f"b{bi}_{ri}_e")
        conv_block(f"{mod}.conv_dw", f"b{bi}_{ri}_d")
        conv_block(f"{mod}.project", f"b{bi}_{ri}_p", prelu=False)
    conv_block("conv_6_sep", "head")
    conv_block("conv_6_dw", "gdconv", prelu=False)
    conv_block("linear", "out", prelu=False, linear_tail=True)
    return sd


class TestInsightFaceLayout:
    """VERDICT r3 #6a: the importer maps a checkpoint users actually
    have — InsightFace_Pytorch naming, module nesting, and the 2-D
    Linear + BatchNorm1d tail."""

    def test_import_via_torch_file_and_load(self, tmp_path):
        import torch

        from face_detection_tflite_tpu.models.embedding import (
            FaceEmbedding, build_mobilefacenet)
        from import_weights import import_mobilefacenet
        sd = _insightface_state_dict()
        ckpt = tmp_path / "model_mobilefacenet.pth"
        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                                   for k, v in sd.items()}}, ckpt)
        params = import_mobilefacenet(str(ckpt))
        template = build_mobilefacenet().params
        assert set(params) == set(template)
        for k in template:
            assert params[k].shape == template[k].shape, k
        npz = tmp_path / "mobilefacenet.npz"
        np.savez_compressed(npz, **params)
        emb = FaceEmbedding.load(str(npz))
        img = np.random.default_rng(0).integers(
            0, 255, (200, 200, 3), dtype=np.uint8)
        vec = emb.embed(img, (60.0, 90.0), (140.0, 90.0))
        assert vec.shape == (192,)
        assert np.isfinite(vec).all()
        np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-5)

    def test_linear_tail_folds_like_conv(self):
        """The 2-D tail must fold to the same values as the equivalent
        1x1-conv form of the same checkpoint."""
        from import_weights import import_mobilefacenet_state_dict
        sd = _insightface_state_dict()
        as_conv = dict(sd)
        as_conv["linear.conv.weight"] = \
            as_conv.pop("linear.weight")[:, :, None, None]
        # nest the tail BN so it reads as a conv block
        for s in ("weight", "bias", "running_mean", "running_var",
                  "num_batches_tracked"):
            as_conv[f"linear.bn.{s}"] = as_conv.pop(f"bn.{s}")
        a = import_mobilefacenet_state_dict(sd)
        b = import_mobilefacenet_state_dict(as_conv)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


class TestFoldBn:
    def test_fold_matches_direct_computation(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(8, 4, 3, 3))
        g, b = rng.uniform(0.5, 1.5, 8), rng.normal(size=8)
        m, v = rng.normal(size=8), rng.uniform(0.5, 2.0, 8)
        wf, bf = fold_bn(w, g, b, m, v)
        # conv(x, wf) + bf == bn(conv(x, w)) for any x; check on the conv
        # output y: bn(y) = g*(y-m)/sqrt(v+eps)+b, fold: y*scale + bias.
        y = rng.normal(size=(8,))
        eps = 1e-5
        direct = g * (y - m) / np.sqrt(v + eps) + b
        scale = (wf / w)[:, 0, 0, 0]
        folded = y * scale + bf
        np.testing.assert_allclose(folded, direct, rtol=1e-10)


class TestTorchStyleImport:
    def test_roundtrip_and_forward(self):
        import jax.numpy as jnp
        from face_detection_tflite_tpu.models.embedding import (
            build_mobilefacenet)
        sd = _synthetic_state_dict()
        params = import_mobilefacenet_state_dict(sd)
        template = build_mobilefacenet()
        assert set(params) == set(template.params)
        for k in params:
            assert params[k].shape == tuple(template.params[k].shape), k
        # The network runs with the imported tree.
        (out,) = template.fn(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.zeros((1, 112, 112, 3), jnp.float32))
        assert out.shape == (1, 192)
        assert np.isfinite(np.asarray(out)).all()

    def test_fold_values_spot_check(self):
        sd = _synthetic_state_dict()
        params = import_mobilefacenet_state_dict(sd)
        # stem = layer0: manual fold of one output channel.
        w = sd["layer0.conv.weight"]
        g, b = sd["layer0.bn.weight"], sd["layer0.bn.bias"]
        m, v = sd["layer0.bn.running_mean"], sd["layer0.bn.running_var"]
        scale = g / np.sqrt(v + 1e-5)
        expect_w0 = (w[0] * scale[0]).transpose(1, 2, 0)  # IHW->HWI
        np.testing.assert_allclose(params["stem_w"][..., 0], expect_w0,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(params["stem_b"], b - m * scale,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(params["stem_a"],
                                   sd["layer0.prelu.weight"])

    def test_scalar_prelu_broadcasts(self):
        sd = _synthetic_state_dict(prelu_scalar=True)
        params = import_mobilefacenet_state_dict(sd)
        assert params["stem_a"].shape == (64,)
        assert np.all(params["stem_a"] == params["stem_a"][0])

    def test_wrong_conv_count_rejected(self):
        sd = _synthetic_state_dict()
        sd.pop("layer0.conv.weight")
        with pytest.raises(ValueError, match="conv layers"):
            import_mobilefacenet_state_dict(sd)

    def test_wrong_prelu_count_rejected(self):
        sd = _synthetic_state_dict()
        sd.pop("layer0.prelu.weight")
        with pytest.raises(ValueError, match="PReLU"):
            import_mobilefacenet_state_dict(sd)

    def test_bad_shape_rejected(self):
        sd = _synthetic_state_dict()
        sd["layer0.conv.weight"] = sd["layer0.conv.weight"][:, :, :2, :2]
        with pytest.raises(ValueError, match="folds to"):
            import_mobilefacenet_state_dict(sd)


class TestNpzImportAndLoad:
    def test_npz_roundtrip_through_face_embedding(self, tmp_path):
        from face_detection_tflite_tpu.models.embedding import FaceEmbedding
        sd = _synthetic_state_dict()
        params = import_mobilefacenet_state_dict(sd)
        path = str(tmp_path / "mobilefacenet.npz")
        np.savez_compressed(path, **params)
        loaded = import_mobilefacenet_npz(path)
        for k in params:
            np.testing.assert_array_equal(loaded[k], params[k])
        emb = FaceEmbedding.load(path)
        # Imported weights count as trained: no UntrainedEmbeddingWarning.
        assert emb.is_pretrained
        img = np.random.default_rng(2).uniform(
            0, 255, (96, 128, 3)).astype(np.uint8)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any warning fails the test
            v = emb.embed(img, (30, 40), (70, 42))
        assert v.shape == (192,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_npz_bad_tree_rejected(self, tmp_path):
        path = str(tmp_path / "bad.npz")
        np.savez_compressed(path, stem_w=np.zeros((3, 3, 3, 64), np.float32))
        with pytest.raises(ValueError, match="mismatch"):
            import_mobilefacenet_npz(path)


@pytest.mark.skipif(not os.path.isdir(MODELS_DIR),
                    reason="reference assets not present")
class TestMulticlassDropIn:
    """A user-supplied selfie_multiclass.tflite works with zero code: drop
    the file in the model dir, pass the multiclass config
    (`pubspec.yaml:46`, `selfie_segmentation.dart:16-19`)."""

    def test_user_supplied_multiclass_tflite(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        from face_detection_tflite_tpu import (FaceDetectionModel,
                                               FaceDetector,
                                               SegmentationConfig,
                                               SegmentationModel)

        # Tiny stand-in with the real model's contract: 256x256x3 in,
        # 6-channel logits out.
        inp = tf.keras.Input((256, 256, 3), batch_size=1)
        out = tf.keras.layers.Conv2D(6, 3, padding="same")(inp)
        blob = tf.lite.TFLiteConverter.from_keras_model(
            tf.keras.Model(inp, out)).convert()

        mdir = tmp_path / "models"
        mdir.mkdir()
        for f in os.listdir(MODELS_DIR):
            os.symlink(os.path.join(MODELS_DIR, f), mdir / f)
        (mdir / "selfie_multiclass.tflite").write_bytes(blob)

        cfg = SegmentationConfig(model=SegmentationModel.MULTICLASS)
        det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                           model_dir=str(mdir), segmentation_config=cfg)
        img = np.random.default_rng(0).uniform(
            0, 255, (300, 400, 3)).astype(np.uint8)
        mask = det.get_segmentation_mask(img)
        assert mask.class_data.shape[-1] == 6
        assert np.allclose(mask.class_data.sum(-1), 1.0, atol=1e-4)


class TestFetchModelsManifest:
    """tools/fetch_models.py: the SHA-256 manifest is enforced (a silently
    different model would shift every parity test)."""

    def test_install_rejects_hash_mismatch(self, tmp_path):
        import fetch_models
        rel = "models/face_landmark.tflite"
        with pytest.raises(RuntimeError, match="SHA-256 mismatch"):
            fetch_models.install(rel, b"not the real model", str(tmp_path))
        assert not (tmp_path / rel).exists()  # nothing written

    def test_install_and_verify_roundtrip(self, tmp_path):
        import hashlib
        import fetch_models
        rel = "models/face_landmark.tflite"
        data = b"fake bytes"
        fetch_models.MANIFEST[rel + ".test"] = hashlib.sha256(
            data).hexdigest()
        try:
            fetch_models.install(rel + ".test", data, str(tmp_path))
            ok, bad, missing = fetch_models._state(str(tmp_path))
            assert rel + ".test" in ok and rel + ".test" not in missing
        finally:
            fetch_models.MANIFEST.pop(rel + ".test")

    def test_manifest_matches_installed_assets(self):
        """The locally installed package assets verify against the
        manifest (guards accidental edits of the pinned files)."""
        import fetch_models
        dst = fetch_models.DEFAULT_DST
        if not os.path.isdir(dst):
            pytest.skip("assets not fetched")
        ok, bad, missing = fetch_models._state(dst)
        assert not bad, f"hash mismatches: {bad}"
