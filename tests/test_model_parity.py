"""Converted-model parity vs the TFLite reference interpreter.

The reference's test policy is "no mocks — everything touching a model runs
for real" (`doc/testing.md:87-91`); the analog here is running every
converted JAX graph against `tf.lite.Interpreter` (reference kernels, no
XNNPACK) on the same inputs.

All eight interpretable models (the two segmenters need a MediaPipe custom
op the stock interpreter lacks; their transposed-conv is unit-tested against
`tf.nn.conv2d_transpose` instead) match to float32 roundoff at
precision="highest".
"""

import glob
import os

import numpy as np
import pytest

import jax

from face_detection_tflite_tpu.convert.executor import convert_file

from .asset_paths import MODELS_DIR
tf = pytest.importorskip("tensorflow")

INTERPRETABLE = [p for p in sorted(glob.glob(f"{MODELS_DIR}/*.tflite"))
                 if "segmenter" not in p]


def _tflite_reference(path, x):
    itp = tf.lite.Interpreter(
        model_path=path,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType
            .BUILTIN_WITHOUT_DEFAULT_DELEGATES))
    itp.allocate_tensors()
    itp.set_tensor(itp.get_input_details()[0]["index"], x)
    itp.invoke()
    return [itp.get_tensor(od["index"]) for od in itp.get_output_details()]


@pytest.mark.parametrize("path", INTERPRETABLE,
                         ids=[os.path.basename(p) for p in INTERPRETABLE])
def test_model_matches_tflite(path):
    cm = convert_file(path)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=cm.input_shapes[0]).astype(np.float32)
    ours = [np.asarray(o) for o in jax.jit(cm.fn)(cm.params, x)]
    refs = _tflite_reference(path, x)
    for ref in refs:
        mine = [o for o in ours if o.shape == ref.shape]
        assert mine, f"no output with shape {ref.shape}"
        err = min(np.abs(m - ref).max() for m in mine)
        scale = np.abs(ref).max() + 1e-9
        assert err / scale < 5e-5, f"rel err {err/scale:.2e}"


def test_vmap_batches_match_loop():
    """vmapping the converted graph == running examples one at a time."""
    path = os.path.join(MODELS_DIR, "face_detection_short_range.tflite")
    cm = convert_file(path)
    rng = np.random.default_rng(1)
    batch = rng.uniform(-1, 1, size=(3,) + cm.input_shapes[0][1:]).astype(
        np.float32)

    vfn = jax.jit(jax.vmap(lambda p, x: cm.fn(p, x[None]), in_axes=(None, 0)))
    batched = vfn(cm.params, batch)
    for i in range(3):
        single = cm.fn(cm.params, batch[i][None])
        for b, s in zip(batched, single):
            assert np.allclose(np.asarray(b)[i], np.asarray(s),
                               atol=1e-5), "vmap mismatch"


def test_transpose_conv_bias_matches_tf():
    """MediaPipe Convolution2DTransposeBias == conv2d_transpose + bias.

    The segmenters' custom op (`selfie_segmentation.dart:57-66`) is lowered
    to lax.conv_general_dilated with lhs_dilation; pin it to TF's gradient
    semantics (SAME padding, stride 2).
    """
    import jax.numpy as jnp
    from face_detection_tflite_tpu.convert.tflite import (
        ModelIR, OpIR, TensorIR)
    from face_detection_tflite_tpu.convert.executor import convert_model

    rng = np.random.default_rng(2)
    cin, cout, k, s, hw = 8, 4, 2, 2, 16
    x = rng.normal(size=(1, hw, hw, cin)).astype(np.float32)
    w = rng.normal(size=(cout, k, k, cin)).astype(np.float32)  # OHWI
    b = rng.normal(size=(cout,)).astype(np.float32)

    ir = ModelIR(
        tensors=[
            TensorIR(0, "x", (1, hw, hw, cin), np.float32, None),
            TensorIR(1, "w", w.shape, np.float32, w),
            TensorIR(2, "b", b.shape, np.float32, b),
            TensorIR(3, "y", (1, hw * s, hw * s, cout), np.float32, None),
        ],
        ops=[OpIR("CUSTOM:Convolution2DTransposeBias", [0, 1, 2], [3],
                  {"padding": 0, "stride_w": s, "stride_h": s})],
        inputs=[0], outputs=[3], description="")
    cm = convert_model(ir)
    ours = np.asarray(cm(jnp.asarray(x))[0])

    # TF expects filter [kh, kw, out, in]
    tf_w = np.transpose(w, (1, 2, 0, 3))
    ref = tf.nn.conv2d_transpose(
        x, tf_w, output_shape=(1, hw * s, hw * s, cout),
        strides=[1, s, s, 1], padding="SAME").numpy() + b
    assert np.abs(ours - ref).max() < 1e-4


@pytest.mark.parametrize("name", ["selfie_segmenter.tflite",
                                  "selfie_segmenter_landscape.tflite"])
def test_segmenter_runs_and_is_probability(name):
    path = os.path.join(MODELS_DIR, name)
    cm = convert_file(path)
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=cm.input_shapes[0]).astype(np.float32)
    (mask,) = jax.jit(cm.fn)(cm.params, x)
    mask = np.asarray(mask)
    assert mask.shape == cm.output_shapes[0]
    assert (mask >= 0).all() and (mask <= 1).all()
