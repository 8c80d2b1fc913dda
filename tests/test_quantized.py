"""Quantized (int8) model support: float-emulation parity.

The converter runs quantized graphs as fp32 with exact constant
dequantization and fake-quant grid snapping at every quantized tensor
(executor.py `_fake_quant`).  On a post-training-quantized toy model this
reproduces the stock int8 interpreter bit-exactly (dequantized outputs).
The reference itself never ships int8 models (face_model_config.dart lists
fp16/fp32 only) — this is converter robustness beyond reference parity.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from face_detection_tflite_tpu.convert.executor import convert_model
from face_detection_tflite_tpu.convert.tflite import parse_tflite


@pytest.fixture(scope="module")
def int8_model():
    tf.keras.utils.set_random_seed(0)  # weights independent of test order
    rng = np.random.default_rng(0)
    inp = tf.keras.Input((16, 16, 3))
    x = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same",
                               activation="relu")(inp)
    x = tf.keras.layers.DepthwiseConv2D(3, padding="same",
                                        activation="relu")(x)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    x = tf.keras.layers.Dense(10)(x)
    out = tf.keras.layers.Softmax()(x)
    model = tf.keras.Model(inp, out)

    def rep():
        for _ in range(50):
            yield [rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)]

    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = rep
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.int8
    conv.inference_output_type = tf.int8
    return conv.convert()


class TestInt8Emulation:
    def test_matches_int8_interpreter(self, int8_model):
        interp = tf.lite.Interpreter(
            model_content=int8_model,
            experimental_op_resolver_type=tf.lite.experimental
            .OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES)
        interp.allocate_tensors()
        idet = interp.get_input_details()[0]
        odet = interp.get_output_details()[0]
        iscale, izp = idet["quantization"]
        oscale, ozp = odet["quantization"]

        ir = parse_tflite(int8_model)
        cm = convert_model(ir, name="toy-int8")
        rng = np.random.default_rng(7)
        worst = 0.0
        for _ in range(4):
            xf = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
            xi = np.clip(np.round(xf / iscale) + izp, -128, 127).astype(
                np.int8)
            interp.set_tensor(idet["index"], xi)
            interp.invoke()
            ref = (interp.get_tensor(odet["index"]).astype(np.float32)
                   - ozp) * oscale
            (got_i,) = cm.fn(cm.params, xi)      # int8 input
            (got_f,) = cm.fn(cm.params, xf)      # float input, snapped
            worst = max(worst,
                        float(np.abs(np.asarray(got_i) - ref).max()),
                        float(np.abs(np.asarray(got_f) - ref).max()))
        # one output quantization step of slack; measured exactly 0.0
        assert worst <= oscale, f"emulation drifted {worst} (> {oscale})"

    def test_per_channel_weights_dequantized(self, int8_model):
        ir = parse_tflite(int8_model)
        per_channel = [t for t in ir.tensors
                       if t.quant is not None and t.quant["scale"].size > 1]
        assert per_channel, "toy model should have per-channel conv weights"
        # depthwise weights quantize along the trailing (channel) axis
        dims = {t.quant["dim"] for t in per_channel}
        assert 3 in dims or 0 in dims

    def test_quantized_constant_without_params_rejected(self):
        from face_detection_tflite_tpu.convert.tflite import (ModelIR, OpIR,
                                                              TensorIR)
        ir = ModelIR(
            tensors=[
                TensorIR(0, "in", (1, 4), np.float32, None),
                TensorIR(1, "w", (4, 4), np.int8,
                         np.zeros((4, 4), np.int8)),
                TensorIR(2, "out", (1, 4), np.float32, None),
            ],
            ops=[OpIR("FULLY_CONNECTED", [0, 1, -1], [2],
                      {"activation": None, "keep_num_dims": False})],
            inputs=[0], outputs=[2], description="")
        with pytest.raises(NotImplementedError, match="no.*quantization"):
            convert_model(ir)


class TestShapeChainFolding:
    """Keras `Flatten` exports a SHAPE -> STRIDED_SLICE -> PACK -> RESHAPE
    chain; shapes are static in this executor so the whole chain constant-
    folds (executor.py `_fold_static`)."""

    @staticmethod
    def _build(quantize):
        tf.keras.utils.set_random_seed(2)  # weights independent of test order
        rng = np.random.default_rng(2)
        inp = tf.keras.Input((8, 8, 3))
        x = tf.keras.layers.Conv2D(4, 3, padding="same",
                                   activation="relu")(inp)
        x = tf.keras.layers.Flatten()(x)
        out = tf.keras.layers.Dense(5)(x)
        model = tf.keras.Model(inp, out)
        conv = tf.lite.TFLiteConverter.from_keras_model(model)
        if quantize:
            conv.optimizations = [tf.lite.Optimize.DEFAULT]
            conv.representative_dataset = lambda: (
                [rng.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32)]
                for _ in range(20))
            conv.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
            conv.inference_input_type = tf.int8
            conv.inference_output_type = tf.int8
        return conv.convert()

    @pytest.mark.parametrize("quantize", [False, True])
    def test_flatten_model_matches_interpreter(self, quantize):
        blob = self._build(quantize)
        ir = parse_tflite(blob)
        assert any(op.name == "SHAPE" for op in ir.ops)
        cm = convert_model(ir, name="flatten")
        interp = tf.lite.Interpreter(
            model_content=blob,
            experimental_op_resolver_type=tf.lite.experimental
            .OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES)
        interp.allocate_tensors()
        idet = interp.get_input_details()[0]
        odet = interp.get_output_details()[0]
        rng = np.random.default_rng(3)
        xf = rng.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32)
        if quantize:
            isc, izp = idet["quantization"]
            osc, ozp = odet["quantization"]
            xi = np.clip(np.round(xf / isc) + izp, -128, 127).astype(np.int8)
            interp.set_tensor(idet["index"], xi)
            interp.invoke()
            ref = (interp.get_tensor(odet["index"]).astype(np.float32)
                   - ozp) * osc
            (got,) = cm.fn(cm.params, xi)
            # up to 2 grid steps: integer kernels break rounding ties
            # differently than fp32 emulation
            assert np.abs(np.asarray(got) - ref).max() <= 2 * osc
        else:
            interp.set_tensor(idet["index"], xf)
            interp.invoke()
            ref = interp.get_tensor(odet["index"])
            (got,) = cm.fn(cm.params, xf)
            assert np.abs(np.asarray(got) - ref).max() < 1e-5


def test_16x8_quantization_matches_interpreter():
    """int16-activation / int8-weight models (the 16x8 scheme) also run
    through the fake-quant emulation; the int16 grid is fine enough that
    outputs track the interpreter to ~1e-5."""
    tf.keras.utils.set_random_seed(5)
    rng = np.random.default_rng(5)
    inp = tf.keras.Input((16, 16, 3))
    x = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same",
                               activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    model = tf.keras.Model(inp, tf.keras.layers.Dense(6)(x))
    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = lambda: (
        [rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)]
        for _ in range(20))
    conv.target_spec.supported_ops = [
        tf.lite.OpsSet
        .EXPERIMENTAL_TFLITE_BUILTINS_ACTIVATIONS_INT16_WEIGHTS_INT8]
    blob = conv.convert()
    ir = parse_tflite(blob)
    assert any(np.dtype(t.dtype) == np.int16 for t in ir.tensors
               if t.quant is not None)
    cm = convert_model(ir, name="toy-16x8")
    interp = tf.lite.Interpreter(
        model_content=blob,
        experimental_op_resolver_type=tf.lite.experimental
        .OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES)
    interp.allocate_tensors()
    idet = interp.get_input_details()[0]
    odet = interp.get_output_details()[0]
    xf = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    interp.set_tensor(idet["index"], xf)
    interp.invoke()
    ref = interp.get_tensor(odet["index"])
    (got,) = cm.fn(cm.params, xf)
    assert np.abs(np.asarray(got) - ref).max() < 1e-4
