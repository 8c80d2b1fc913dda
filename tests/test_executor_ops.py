"""Per-op executor tests with synthetic single-op graphs.

The model-level parity tests cover the op compositions the 10 stock
models use; these pin each op's semantics in isolation (including ops the
stock models don't hit, like FULLY_CONNECTED/SOFTMAX needed by
out-of-repo models such as mobilefacenet) against numpy/TF references.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_tflite_tpu.convert.executor import convert_model
from face_detection_tflite_tpu.convert.tflite import ModelIR, OpIR, TensorIR


def _graph(op_name, inputs, outputs, options, tensors):
    """Builds a one-op ModelIR.  tensors: list of (shape, data_or_None)."""
    t = [TensorIR(i, f"t{i}", tuple(shape),
                  data.dtype.type if data is not None else np.float32,
                  data)
         for i, (shape, data) in enumerate(tensors)]
    return ModelIR(tensors=t, ops=[OpIR(op_name, inputs, outputs, options)],
                   inputs=[i for i in inputs
                           if i >= 0 and t[i].data is None][:1] or [0],
                   outputs=outputs, description="")


def _run(ir, *xs):
    cm = convert_model(ir)
    return np.asarray(cm(*[jnp.asarray(x) for x in xs])[0])


RNG = np.random.default_rng(0)


class TestExecutorOps:
    def test_fully_connected(self):
        x = RNG.normal(size=(1, 8)).astype(np.float32)
        w = RNG.normal(size=(4, 8)).astype(np.float32)
        b = RNG.normal(size=(4,)).astype(np.float32)
        ir = _graph("FULLY_CONNECTED", [0, 1, 2], [3],
                    {"activation": "RELU", "keep_num_dims": False},
                    [((1, 8), None), ((4, 8), w), ((4,), b), ((1, 4), None)])
        out = _run(ir, x)
        ref = np.maximum(x @ w.T + b, 0)
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_softmax_with_beta(self):
        x = RNG.normal(size=(1, 10)).astype(np.float32)
        ir = _graph("SOFTMAX", [0], [1], {"beta": 2.0},
                    [((1, 10), None), ((1, 10), None)])
        out = _run(ir, x)
        e = np.exp(2.0 * x - (2.0 * x).max())
        np.testing.assert_allclose(out, e / e.sum(), rtol=1e-5)

    def test_strided_slice_with_masks(self):
        x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        ir = _graph("STRIDED_SLICE", [0, 1, 2, 3], [4],
                    {"begin_mask": 0b001, "end_mask": 0b100,
                     "ellipsis_mask": 0, "new_axis_mask": 0,
                     "shrink_axis_mask": 0b010},
                    [((2, 3, 4), None),
                     ((3,), np.asarray([1, 1, 1], np.int32)),
                     ((3,), np.asarray([2, 2, 3], np.int32)),
                     ((3,), np.asarray([1, 1, 1], np.int32)),
                     ((2, 3), None)])
        out = _run(ir, x)
        # begin_mask bit0: dim0 begin ignored; shrink dim1 at 1;
        # end_mask bit2: dim2 end ignored.
        np.testing.assert_array_equal(out, x[:2, 1, 1:])

    def test_avg_pool_same_counts_valid_only(self):
        """TFLite SAME avg-pool divides by the number of valid (unpadded)
        elements; cross-check against TF."""
        tf = pytest.importorskip("tensorflow")
        x = RNG.normal(size=(1, 5, 5, 2)).astype(np.float32)
        ir = _graph("AVERAGE_POOL_2D", [0], [1],
                    {"padding": 0, "stride_w": 2, "stride_h": 2,
                     "filter_w": 3, "filter_h": 3, "activation": None},
                    [((1, 5, 5, 2), None), ((1, 3, 3, 2), None)])
        out = _run(ir, x)
        ref = tf.nn.avg_pool2d(x, 3, 2, "SAME").numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_max_pool_valid(self):
        tf = pytest.importorskip("tensorflow")
        x = RNG.normal(size=(1, 6, 6, 3)).astype(np.float32)
        ir = _graph("MAX_POOL_2D", [0], [1],
                    {"padding": 1, "stride_w": 2, "stride_h": 2,
                     "filter_w": 2, "filter_h": 2, "activation": None},
                    [((1, 6, 6, 3), None), ((1, 3, 3, 3), None)])
        np.testing.assert_allclose(
            _run(ir, x), tf.nn.max_pool2d(x, 2, 2, "VALID").numpy(),
            rtol=1e-6)

    def test_conv2d_dilated(self):
        tf = pytest.importorskip("tensorflow")
        x = RNG.normal(size=(1, 12, 12, 3)).astype(np.float32)
        w = RNG.normal(size=(5, 3, 3, 3)).astype(np.float32)  # OHWI
        ir = _graph("CONV_2D", [0, 1, -1], [2],
                    {"padding": 0, "stride_w": 1, "stride_h": 1,
                     "activation": None, "dilation_w": 2, "dilation_h": 2},
                    [((1, 12, 12, 3), None), ((5, 3, 3, 3), w),
                     ((1, 12, 12, 5), None)])
        out = _run(ir, x)
        ref = tf.nn.conv2d(x, np.transpose(w, (1, 2, 3, 0)), 1, "SAME",
                           dilations=2).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_depthwise_multiplier_2(self):
        tf = pytest.importorskip("tensorflow")
        x = RNG.normal(size=(1, 8, 8, 3)).astype(np.float32)
        w = RNG.normal(size=(1, 3, 3, 6)).astype(np.float32)  # mult=2
        ir = _graph("DEPTHWISE_CONV_2D", [0, 1, -1], [2],
                    {"padding": 0, "stride_w": 1, "stride_h": 1,
                     "depth_multiplier": 2, "activation": None,
                     "dilation_w": 1, "dilation_h": 1},
                    [((1, 8, 8, 3), None), ((1, 3, 3, 6), w),
                     ((1, 8, 8, 6), None)])
        out = _run(ir, x)
        ref = tf.nn.depthwise_conv2d(
            x, np.transpose(w, (1, 2, 0, 3)).reshape(3, 3, 3, 2),
            [1, 1, 1, 1], "SAME").numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_l2_normalization(self):
        x = RNG.normal(size=(1, 16)).astype(np.float32)
        ir = _graph("L2_NORMALIZATION", [0], [1], {},
                    [((1, 16), None), ((1, 16), None)])
        out = _run(ir, x)
        np.testing.assert_allclose(out, x / np.linalg.norm(x), rtol=1e-5)

    def test_depth_to_space(self):
        tf = pytest.importorskip("tensorflow")
        x = RNG.normal(size=(1, 2, 2, 8)).astype(np.float32)
        ir = _graph("DEPTH_TO_SPACE", [0], [1], {"block_size": 2},
                    [((1, 2, 2, 8), None), ((1, 4, 4, 2), None)])
        np.testing.assert_allclose(
            _run(ir, x), tf.nn.depth_to_space(x, 2).numpy(), rtol=1e-6)

    def test_prelu_broadcast(self):
        x = np.asarray([[-2.0, 3.0]], np.float32)
        alpha = np.asarray([0.1, 0.5], np.float32)
        ir = _graph("PRELU", [0, 1], [2], {},
                    [((1, 2), None), ((2,), alpha), ((1, 2), None)])
        np.testing.assert_allclose(_run(ir, x), [[-0.2, 3.0]], rtol=1e-6)

    def test_unsupported_op_raises(self):
        ir = _graph("EXP", [0], [1], {}, [((2, 2), None), ((2, 2), None)])
        # EXP is implemented; use a name we don't support to check the error
        ir.ops[0].name = "SVDF"
        with pytest.raises(NotImplementedError, match="SVDF"):
            convert_model(ir)(jnp.zeros((2, 2)))

    def test_resize_bilinear_half_pixel_vs_tf(self):
        tf = pytest.importorskip("tensorflow")
        x = RNG.normal(size=(1, 8, 8, 3)).astype(np.float32)
        ir = _graph("RESIZE_BILINEAR", [0, 1], [2],
                    {"align_corners": False, "half_pixel_centers": True},
                    [((1, 8, 8, 3), None),
                     ((2,), np.asarray([16, 16], np.int32)),
                     ((1, 16, 16, 3), None)])
        out = _run(ir, x)
        ref = tf.image.resize(x, (16, 16), method="bilinear").numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestTransposeConvValid:
    def test_valid_padding_output_size(self):
        """VALID transpose conv: out = (in-1)*stride + kernel, from the
        graph's declared output shape."""
        tf = pytest.importorskip("tensorflow")
        cin, cout, k, s, hw = 4, 3, 3, 2, 5
        x = RNG.normal(size=(1, hw, hw, cin)).astype(np.float32)
        w = RNG.normal(size=(cout, k, k, cin)).astype(np.float32)  # OHWI
        out_hw = (hw - 1) * s + k
        ir = _graph("CUSTOM:Convolution2DTransposeBias", [0, 1, -1], [2],
                    {"padding": 1, "stride_w": s, "stride_h": s},
                    [((1, hw, hw, cin), None), ((cout, k, k, cin), w),
                     ((1, out_hw, out_hw, cout), None)])
        out = _run(ir, x)
        ref = tf.nn.conv2d_transpose(
            x, np.transpose(w, (1, 2, 0, 3)),
            output_shape=(1, out_hw, out_hw, cout),
            strides=[1, s, s, 1], padding="VALID").numpy()
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_strided_slice_new_axis_mask_rejected(self):
        x = np.zeros((2, 3), np.float32)
        ir = _graph("STRIDED_SLICE", [0, 1, 2, 3], [4],
                    {"begin_mask": 0, "end_mask": 0, "ellipsis_mask": 0,
                     "new_axis_mask": 1, "shrink_axis_mask": 0},
                    [((2, 3), None),
                     ((2,), np.zeros(2, np.int32)),
                     ((2,), np.asarray([2, 3], np.int32)),
                     ((2,), np.ones(2, np.int32)),
                     ((1, 2, 3), None)])
        with pytest.raises(NotImplementedError, match="new_axis_mask"):
            convert_model(ir)(jnp.asarray(x))


class TestMixedPrecision:
    """The "mixed" precision tier: early-frac convs run bf16, the heads
    bf16x3, indexed over the PRUNED executable op list (fp16 models'
    folded DEQUANTIZE ops shift raw IR indices ~2x — docs/PERF.md)."""

    def test_spec_splits_on_pruned_conv_ordinals(self):
        from face_detection_tflite_tpu.convert.executor import (
            mixed_precision)

        class _Op:
            def __init__(self, name):
                self.name = name
        ops = [_Op(n) for n in
               ("RESHAPE", "CONV_2D", "DEPTHWISE_CONV_2D", "ADD",
                "CONV_2D", "CONV_2D", "LOGISTIC")]
        spec = mixed_precision(ops, frac=0.5)
        got = [spec(i, op.name) for i, op in enumerate(ops)]
        # 4 convs at indices 1,2,4,5 -> cutoff is the 2nd conv (index 2).
        assert got == ["high", "default", "default", "high",
                       "high", "high", "high"]

    def test_mixed_string_resolves_and_runs(self):
        from face_detection_tflite_tpu.convert.executor import convert_file
        import os
        from .asset_paths import MODELS_DIR
        if not os.path.isdir(MODELS_DIR):
            pytest.skip("no assets")
        cm = convert_file(
            os.path.join(MODELS_DIR, "face_detection_back.tflite"),
            precision="mixed")
        (rb, rs) = cm(np.zeros((1, 256, 256, 3), np.float32))
        assert rb.shape == (1, 896, 16)

    def test_serving_preset_uses_mixed_detector(self):
        import os
        from .asset_paths import MODELS_DIR
        if not os.path.isdir(MODELS_DIR):
            pytest.skip("no assets")
        from face_detection_tflite_tpu import (FaceDetectionModel,
                                               FaceDetector)
        d = FaceDetector(model=FaceDetectionModel.BACK_CAMERA,
                         model_dir=MODELS_DIR, precision="serving")
        assert d._precision["detector"] == "mixed"
