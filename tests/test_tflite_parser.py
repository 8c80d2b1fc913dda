"""Cross-checks the standalone flatbuffer parser against TensorFlow's
generated TFLite schema code (when TF is available in the environment).

The parser (`convert/flatbuffer.py` + `convert/tflite.py`) has zero
dependencies beyond numpy; these tests pin its wire-format decoding to the
authoritative schema.
"""

import glob
import os

import numpy as np
import pytest

from face_detection_tflite_tpu.convert.tflite import parse_tflite

from .asset_paths import MODELS_DIR

tf = pytest.importorskip("tensorflow")
from tensorflow.lite.python import schema_py_generated as schema  # noqa: E402

MODEL_FILES = sorted(glob.glob(os.path.join(MODELS_DIR, "*.tflite")))

pytestmark = pytest.mark.skipif(
    not MODEL_FILES, reason="reference model assets not present")


@pytest.mark.parametrize("path", MODEL_FILES,
                         ids=[os.path.basename(p) for p in MODEL_FILES])
def test_structure_matches_tf_schema(path):
    buf = open(path, "rb").read()
    ir = parse_tflite(buf)
    m = schema.Model.GetRootAsModel(buf, 0)
    g = m.Subgraphs(0)

    assert len(ir.tensors) == g.TensorsLength()
    assert len(ir.ops) == g.OperatorsLength()
    assert ir.inputs == list(g.InputsAsNumpy())
    assert ir.outputs == list(g.OutputsAsNumpy())

    for i, t in enumerate(ir.tensors):
        gt = g.Tensors(i)
        gshape = (tuple(np.atleast_1d(gt.ShapeAsNumpy()).tolist())
                  if gt.ShapeLength() else ())
        assert t.shape == gshape
        assert t.name == gt.Name().decode()

    for i, op in enumerate(ir.ops):
        go = g.Operators(i)
        assert op.inputs == list(go.InputsAsNumpy())
        assert op.outputs == list(go.OutputsAsNumpy())


def test_conv_options_match():
    """Spot-check decoded Conv2D options against TF schema on one model."""
    path = os.path.join(MODELS_DIR, "face_detection_back.tflite")
    buf = open(path, "rb").read()
    ir = parse_tflite(buf)
    m = schema.Model.GetRootAsModel(buf, 0)
    g = m.Subgraphs(0)
    checked = 0
    for i, op in enumerate(ir.ops):
        go = g.Operators(i)
        if op.name == "CONV_2D":
            o = schema.Conv2DOptions()
            tab = go.BuiltinOptions()
            o.Init(tab.Bytes, tab.Pos)
            assert op.options["padding"] == o.Padding()
            assert op.options["stride_w"] == (o.StrideW() or 1)
            assert op.options["stride_h"] == (o.StrideH() or 1)
            checked += 1
    assert checked > 10


def test_constant_data_matches():
    path = os.path.join(MODELS_DIR, "face_landmark.tflite")
    buf = open(path, "rb").read()
    ir = parse_tflite(buf)
    m = schema.Model.GetRootAsModel(buf, 0)
    g = m.Subgraphs(0)
    checked = 0
    for t in ir.tensors:
        if t.data is None or t.sparsity is not None:
            continue
        gt = g.Tensors(t.index)
        raw = m.Buffers(gt.Buffer()).DataAsNumpy()
        ref = np.frombuffer(raw.tobytes(), dtype=t.dtype).reshape(t.shape)
        assert np.array_equal(t.data, ref)
        checked += 1
    assert checked > 50


def test_checkpoint_roundtrip(tmp_path):
    """save -> load -> swap reproduces identical outputs."""
    import jax
    import jax.numpy as jnp
    from face_detection_tflite_tpu.convert.checkpoint import (
        load_params_npz, save_params_npz, swap_params)
    from face_detection_tflite_tpu.convert.executor import convert_file

    path = os.path.join(MODELS_DIR, "face_blendshapes.tflite")
    cm = convert_file(path)
    ckpt = str(tmp_path / "bs.npz")
    save_params_npz(cm, ckpt)
    restored = swap_params(cm, load_params_npz(ckpt))
    x = np.random.default_rng(0).normal(
        size=(1, 146, 2)).astype(np.float32) * 100
    a = jax.jit(cm.fn)(cm.params, jnp.asarray(x))
    b = jax.jit(restored.fn)(restored.params, jnp.asarray(x))
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))

    with pytest.raises(ValueError, match="param tree mismatch"):
        swap_params(cm, {"bogus": np.zeros(3)})
