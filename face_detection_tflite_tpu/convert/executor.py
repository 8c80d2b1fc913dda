"""ModelIR -> pure JAX function + params pytree.

This is the TPU-native replacement for the reference's per-model LiteRT
interpreters (``lib/src/models/*.dart``): instead of invoking an interpreter
per stage at runtime, each ``.tflite`` graph is converted **once** into a
traceable JAX function whose weights live in a params dict.  The function is
shape-static, jit-compatible, vmap-compatible (the pipeline vmaps it across
faces/images), and differentiable where ops permit.

Conversion-time passes (numpy, no device work):

* fp16 ``DEQUANTIZE`` of constant weights is folded into fp32 params;
* sparse constants (``DENSIFY``) are densified (the sparse full-range
  BlazeFace's value was CPU decode speed — on TPU we always run dense,
  see reference ``lib/src/models/face_detection_model.dart:126-134``);
* shape-like constant inputs (reshape shapes, pad amounts, axes, permutations)
  are baked into the trace as static Python values;
* bilinear-resize interpolation weights are precomputed as dense matrices so
  RESIZE_BILINEAR lowers to two MXU matmuls instead of gathers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .tflite import ModelIR, OpIR, PADDING_SAME, densify, parse_tflite

__all__ = ["ConvertedModel", "convert_model", "convert_file"]


def _act(x, name):
    if name is None:
        return x
    if name == "RELU":
        return jax.nn.relu(x)
    if name == "RELU6":
        return jnp.clip(x, 0.0, 6.0)
    if name == "RELU_N1_TO_1":
        return jnp.clip(x, -1.0, 1.0)
    if name == "TANH":
        return jnp.tanh(x)
    raise NotImplementedError(f"activation {name}")


def _same_pads(in_size: int, stride: int, eff_k: int) -> tuple[int, int]:
    """TF/TFLite SAME padding: total = max((ceil(in/s)-1)*s + k_eff - in, 0)."""
    out = -(-in_size // stride)
    total = max((out - 1) * stride + eff_k - in_size, 0)
    lo = total // 2
    return lo, total - lo


def _conv_padding(opts, h, w, kh, kw) -> list[tuple[int, int]]:
    if opts["padding"] == PADDING_SAME:
        eff_kh = (kh - 1) * opts.get("dilation_h", 1) + 1
        eff_kw = (kw - 1) * opts.get("dilation_w", 1) + 1
        return [
            _same_pads(h, opts["stride_h"], eff_kh),
            _same_pads(w, opts["stride_w"], eff_kw),
        ]
    return [(0, 0), (0, 0)]


def _resize_matrix(in_size: int, out_size: int, align_corners: bool,
                   half_pixel: bool) -> np.ndarray:
    """Dense [out, in] bilinear interpolation matrix with TFLite semantics."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        # Degenerate: TFLite samples source coordinate 0 (align) / scale rule.
        src = np.array([0.0]) if align_corners else np.array(
            [0.5 * in_size / out_size - 0.5 if half_pixel else 0.0])
    elif align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        if half_pixel:
            src = (np.arange(out_size) + 0.5) * scale - 0.5
        else:
            src = np.arange(out_size) * scale
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    for o in range(out_size):
        m[o, lo[o]] += 1.0 - frac[o]
        m[o, hi[o]] += frac[o]
    return m


class ConvertedModel:
    """A converted TFLite graph.

    Attributes:
      params: dict[str, jnp.ndarray] — weights (fp32).
      fn: Callable(params, *inputs) -> tuple(outputs) — pure, traceable.
      input_shapes / output_shapes: static shapes with the graph's batch of 1.
    """

    def __init__(self, params, fn, input_shapes, output_shapes, name=""):
        self.params = params
        self.fn = fn
        self.input_shapes = input_shapes
        self.output_shapes = output_shapes
        self.name = name

    @property
    def num_params(self) -> int:
        return sum(int(np.prod(v.shape)) for v in self.params.values())

    def __call__(self, *inputs):
        return self.fn(self.params, *inputs)


# Ops whose listed inputs at these positions are static (shape-like) values.
_STATIC_INPUTS = {
    "RESHAPE": {1},
    "PAD": {1},
    "PADV2": {1, 2},  # pads + the constant fill value
    "TRANSPOSE": {1},
    "MEAN": {1},
    "SUM": {1},
    "REDUCE_MAX": {1},
    "REDUCE_MIN": {1},
    "STRIDED_SLICE": {1, 2, 3},
    "RESIZE_BILINEAR": {1},
    "RESIZE_NEAREST_NEIGHBOR": {1},
    "SPLIT": {0},
    "ARG_MAX": {1},
    "EXPAND_DIMS": {1},
    "TILE": {1},
    "SLICE": {1, 2},
    "TRANSPOSE_CONV": {0},
    "MIRROR_PAD": {1},
}


_QRANGE = {np.dtype(np.int8): (-128.0, 127.0),
           np.dtype(np.uint8): (0.0, 255.0),
           np.dtype(np.int16): (-32768.0, 32767.0)}


def _dequantize_const(t, data: np.ndarray) -> np.ndarray:
    """Exact dequantization of a quantized constant (per-tensor or
    per-channel along ``quant['dim']``)."""
    q = t.quant
    scale, zp = q["scale"], q["zero_point"]
    if scale.size == 1:
        return ((data.astype(np.float32) - np.float32(zp[0]))
                * np.float32(scale[0]))
    shape = [1] * data.ndim
    shape[q["dim"]] = scale.size
    return ((data.astype(np.float32) - zp.reshape(shape).astype(np.float32))
            * scale.reshape(shape).astype(np.float32))


def _fake_quant(x, scale, zero_point, qmin, qmax):
    """Snaps a float activation onto its integer quantization grid:
    dequantize(quantize(x)).  Keeps the graph in fp32 while reproducing
    the integer kernels' value set."""
    q = jnp.clip(jnp.round(x / scale) + zero_point, qmin, qmax)
    return (q - zero_point) * scale


def convert_model(
    ir: ModelIR, name: str = "", precision: str = "highest"
) -> ConvertedModel:
    """Builds a JAX function and params pytree from a ModelIR.

    ``precision`` sets the MXU precision for convs/matmuls: ``"highest"``
    (fp32-exact, needed for ≤1px landmark parity with the TFLite reference),
    ``"high"`` (bf16x3) or ``"default"`` (bf16, fastest).  See
    ``tests/test_model_parity.py`` for the measured accuracy of each tier.
    A callable ``(op_index, op_name) -> str`` assigns precision per op,
    indexed over the PRUNED executable op list (constant folding removes
    DEQUANTIZE/DENSIFY/static ops first); the string ``"mixed"`` resolves
    to :func:`mixed_precision` over that list.
    """
    _precision_in = precision  # resolved after the op list is pruned

    const: dict[int, np.ndarray] = {}
    for t in ir.tensors:
        if t.data is not None:
            if t.sparsity is not None:
                const[t.index] = densify(t)
            else:
                const[t.index] = t.data

    # Quantized graphs run as float-emulation: constants dequantize to
    # fp32 exactly; activations compute in fp32 and snap to each quantized
    # tensor's grid (fake-quant) so results track the integer kernels to
    # within ~a quantization step.  Quantized-dtype constants WITHOUT
    # scale/zero-point would silently convert to garbage — reject those.
    for t in ir.tensors:
        if t.dtype in (np.int8, np.uint8, np.int16) and t.data is not None \
                and t.quant is None:
            raise NotImplementedError(
                f"tensor {t.name!r} is {np.dtype(t.dtype).name} with no "
                "quantization parameters; cannot convert")
    for t in ir.tensors:
        if t.index in const and t.quant is not None and \
                np.issubdtype(np.dtype(t.dtype), np.integer) and \
                t.dtype != np.int64:
            const[t.index] = _dequantize_const(t, const[t.index])

    # Per-tensor fake-quant grid for quantized activations.
    act_quant: dict[int, tuple[float, float, float, float]] = {}
    for t in ir.tensors:
        rng = _QRANGE.get(np.dtype(t.dtype))
        if t.data is None and t.quant is not None and rng is not None \
                and t.quant["scale"].size == 1:
            act_quant[t.index] = (float(t.quant["scale"][0]),
                                  float(t.quant["zero_point"][0])) + rng

    # ---- pass 1: fold constant DEQUANTIZE / DENSIFY and static shape
    # arithmetic (SHAPE -> STRIDED_SLICE -> PACK chains from Flatten-style
    # exports), record live ops --------------------------------------------

    def _fold_static(op) -> bool:
        """Evaluates shape-arithmetic ops whose operands are all static.
        Shapes are static in this executor, so a SHAPE op's output is a
        constant and everything derived from it folds away."""
        nm = op.name
        if nm == "SHAPE":
            shp = ir.tensors[op.inputs[0]].shape
            if shp and all(d > 0 for d in shp):
                const[op.outputs[0]] = np.asarray(shp, np.int32)
                return True
            return False
        ins = [i for i in op.inputs if i >= 0]
        if not ins or not all(i in const for i in ins):
            return False
        vals = [const[i] for i in ins]
        o = op.options
        if nm == "PACK" and o.get("activation") is None:
            const[op.outputs[0]] = np.stack(vals, axis=o.get("axis", 0))
        elif nm == "CONCATENATION" and o.get("activation") is None:
            # Fused activations must NOT fold away silently (same guard as
            # the MUL/ADD/SUB branch) — an activated op falls through to
            # the runtime lowering instead.
            const[op.outputs[0]] = np.concatenate(vals,
                                                  axis=o.get("axis", 0))
        elif nm == "STRIDED_SLICE" and vals[0].ndim == 1 and \
                not (o["ellipsis_mask"] or o["new_axis_mask"]):
            x = vals[0]
            b = 0 if (o["begin_mask"] & 1) else int(vals[1][0])
            e = x.shape[0] if (o["end_mask"] & 1) else int(vals[2][0])
            out = x[b:e:int(vals[3][0])]
            if o["shrink_axis_mask"] & 1:
                out = out[0]
            const[op.outputs[0]] = np.asarray(out)
        elif nm in ("MUL", "ADD", "SUB") and o.get("activation") is None:
            f = {"MUL": np.multiply, "ADD": np.add,
                 "SUB": np.subtract}[nm]
            const[op.outputs[0]] = f(vals[0], vals[1])
        elif nm == "CAST":
            const[op.outputs[0]] = vals[0].astype(
                ir.tensors[op.outputs[0]].dtype)
        elif nm == "EXPAND_DIMS":
            const[op.outputs[0]] = np.expand_dims(
                vals[0], int(np.atleast_1d(vals[1])[0]))
        else:
            return False
        return True

    ops: list[OpIR] = []
    for op in ir.ops:
        if op.name == "DEQUANTIZE" and op.inputs[0] in const:
            const[op.outputs[0]] = const[op.inputs[0]].astype(np.float32)
            continue
        if op.name == "DENSIFY":
            # densify() already ran when loading the constant.
            const[op.outputs[0]] = const[op.inputs[0]]
            continue
        if _fold_static(op):
            continue
        ops.append(op)

    # Resolve precision now that the executable op list exists ("mixed"
    # and per-op callables are indexed over THIS list, not ir.ops — the
    # fp16 models' folded DEQUANTIZE ops shift indices by ~2x).
    precision = _precision_in
    if precision == "mixed":
        precision = mixed_precision(ops)
    if callable(precision):
        def _prec_of(oi, nm, _f=precision):
            p = _f(oi, nm)
            return jax.lax.Precision(p.lower()) if p else None
    else:
        _const = jax.lax.Precision(precision.lower()) if precision else None

        def _prec_of(oi, nm):
            return _const

    # ---- pass 2: decide which constants are params vs static ---------------
    traced_const_idx: set[int] = set()
    for op in ops:
        statics = _STATIC_INPUTS.get(op.name, set())
        for pos, tix in enumerate(op.inputs):
            if tix >= 0 and tix in const and pos not in statics:
                traced_const_idx.add(tix)

    params: dict[str, jnp.ndarray] = {}
    param_key: dict[int, str] = {}
    for tix in sorted(traced_const_idx):
        arr = const[tix].astype(np.float32) if const[tix].dtype == np.float16 \
            else const[tix]
        key = f"t{tix}"
        params[key] = jnp.asarray(arr)
        param_key[tix] = key

    # Precompute resize matrices (static shapes known from tensor metadata).
    resize_mats: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for i, op in enumerate(ops):
        if op.name in ("RESIZE_BILINEAR",):
            in_t = ir.tensors[op.inputs[0]]
            out_hw = const[op.inputs[1]].astype(np.int64)
            _, h, w, _ = in_t.shape
            oh, ow = int(out_hw[0]), int(out_hw[1])
            mh = _resize_matrix(h, oh, op.options["align_corners"],
                                op.options["half_pixel_centers"])
            mw = _resize_matrix(w, ow, op.options["align_corners"],
                                op.options["half_pixel_centers"])
            params[f"rs{i}_h"] = jnp.asarray(mh)
            params[f"rs{i}_w"] = jnp.asarray(mw)
            resize_mats[i] = (f"rs{i}_h", f"rs{i}_w")

    tensor_shape = {t.index: t.shape for t in ir.tensors}
    tensor_dtype = {t.index: t.dtype for t in ir.tensors}

    expected_inputs = [tuple(ir.tensors[t].shape) for t in ir.inputs]
    # fn must NOT close over `ir`: TensorIR.data entries are views into
    # the source flatbuffer blob, and a ConvertedModel lives for the
    # detector's lifetime — capturing the IR would pin tens of MB of dead
    # weight bytes per model.  Everything fn needs is hoisted into these
    # small locals (and `ir` itself stays unmutated, so converting one
    # parsed IR at several precisions works).
    input_ixs = tuple(ir.inputs)
    output_ixs = tuple(ir.outputs)
    input_names = [ir.tensors[t].name for t in ir.inputs]
    # A declared output can be a constant (or become one via pass-1
    # folding); it never reaches `env` — no live op writes it and the
    # pass-2 param split only promotes constants that live ops CONSUME.
    # Copy such values out before `const` is pruned below.
    const_outputs = {t: np.array(const[t]) for t in output_ixs
                     if t in const}

    def fn(p, *inputs):
        env: dict[int, Any] = {}
        for tix, key in param_key.items():
            env[tix] = p[key]
        for tix, x, want, in_name in zip(input_ixs, inputs,
                                         expected_inputs, input_names):
            if tuple(x.shape) != want:
                raise ValueError(
                    f"input tensor {in_name!r} expects shape "
                    f"{want}, got {tuple(x.shape)}")
            if tix in act_quant:
                # Quantized graph input: accept the model's integer dtype
                # (dequantize) or float (snap to the input grid).
                s_, zp_, lo_, hi_ = act_quant[tix]
                x = jnp.asarray(x)
                if jnp.issubdtype(x.dtype, jnp.integer):
                    x = (x.astype(jnp.float32) - zp_) * s_
                else:
                    x = _fake_quant(x.astype(jnp.float32), s_, zp_, lo_, hi_)
            env[tix] = x

        def get(tix):
            return env[tix]

        def get_static(tix) -> np.ndarray:
            return const[tix]

        for oi, op in enumerate(ops):
            o = op.options
            nm = op.name
            prec = _prec_of(oi, nm)
            if nm == "CONV_2D":
                x = get(op.inputs[0])
                w = get(op.inputs[1])  # OHWI
                pads = _conv_padding(o, x.shape[1], x.shape[2],
                                     w.shape[1], w.shape[2])
                y = jax.lax.conv_general_dilated(
                    x, w,
                    window_strides=(o["stride_h"], o["stride_w"]),
                    padding=pads,
                    rhs_dilation=(o["dilation_h"], o["dilation_w"]),
                    dimension_numbers=("NHWC", "OHWI", "NHWC"),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                if len(op.inputs) > 2 and op.inputs[2] >= 0:
                    y = y + get(op.inputs[2])
                env[op.outputs[0]] = _act(y, o["activation"])
            elif nm == "DEPTHWISE_CONV_2D":
                x = get(op.inputs[0])
                w = get(op.inputs[1])  # [1, kh, kw, C*m]
                c_in = x.shape[3]
                kh, kw = w.shape[1], w.shape[2]
                w_hwio = jnp.transpose(w, (1, 2, 0, 3))  # [kh,kw,1,C*m]
                pads = _conv_padding(o, x.shape[1], x.shape[2], kh, kw)
                y = jax.lax.conv_general_dilated(
                    x, w_hwio,
                    window_strides=(o["stride_h"], o["stride_w"]),
                    padding=pads,
                    rhs_dilation=(o["dilation_h"], o["dilation_w"]),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c_in,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                if len(op.inputs) > 2 and op.inputs[2] >= 0:
                    y = y + get(op.inputs[2])
                env[op.outputs[0]] = _act(y, o["activation"])
            elif nm in ("TRANSPOSE_CONV", "CUSTOM:Convolution2DTransposeBias"):
                # TFLite transpose conv: inputs = [output_shape, filter, x]
                # for the builtin; MediaPipe's custom op = [x? ...]. The
                # custom op's inputs are (input, weights, bias) per
                # mediapipe transpose_conv_bias.cc.
                if nm == "TRANSPOSE_CONV":
                    w = get(op.inputs[1])
                    x = get(op.inputs[2])
                    bias = get(op.inputs[3]) if len(op.inputs) > 3 and \
                        op.inputs[3] >= 0 else None
                else:
                    x = get(op.inputs[0])
                    w = get(op.inputs[1])
                    bias = get(op.inputs[2]) if len(op.inputs) > 2 and \
                        op.inputs[2] >= 0 else None
                # TFLite filter layout [out, kh, kw, in]; gradient-style
                # transposed conv == conv with lhs dilation and flipped kernel.
                sh, sw = o["stride_h"], o["stride_w"]
                kh, kw = w.shape[1], w.shape[2]
                # Output spatial size comes from the graph's declared output
                # tensor: SAME -> in*stride, VALID -> (in-1)*stride + k.
                out_shape = tensor_shape[op.outputs[0]]
                out_h = int(out_shape[1])
                out_w = int(out_shape[2])
                if o["padding"] == PADDING_SAME:
                    fwd_ph = _same_pads(out_h, sh, kh)
                    fwd_pw = _same_pads(out_w, sw, kw)
                else:
                    fwd_ph = (0, 0)
                    fwd_pw = (0, 0)
                pad_h = (kh - 1 - fwd_ph[0],
                         out_h - ((x.shape[1] - 1) * sh + 1) - (kh - 1 - fwd_ph[0]) + (kh - 1))
                pad_w = (kw - 1 - fwd_pw[0],
                         out_w - ((x.shape[2] - 1) * sw + 1) - (kw - 1 - fwd_pw[0]) + (kw - 1))
                # Transposed conv == conv over the lhs-dilated input with a
                # spatially flipped kernel; TFLite's [out,kh,kw,in] filter is
                # already OHWI for that direct conv (channels stay put).
                w_flip = jnp.flip(w, axis=(1, 2))  # [O,kh,kw,I]
                y = jax.lax.conv_general_dilated(
                    x, w_flip,
                    window_strides=(1, 1),
                    padding=[pad_h, pad_w],
                    lhs_dilation=(sh, sw),
                    dimension_numbers=("NHWC", "OHWI", "NHWC"),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                if bias is not None:
                    y = y + bias
                env[op.outputs[0]] = _act(y, o.get("activation"))
            elif nm in ("MAX_POOL_2D", "AVERAGE_POOL_2D"):
                x = get(op.inputs[0])
                window = (1, o["filter_h"], o["filter_w"], 1)
                strides = (1, o["stride_h"], o["stride_w"], 1)
                ph = _same_pads(x.shape[1], o["stride_h"], o["filter_h"]) \
                    if o["padding"] == PADDING_SAME else (0, 0)
                pw = _same_pads(x.shape[2], o["stride_w"], o["filter_w"]) \
                    if o["padding"] == PADDING_SAME else (0, 0)
                pads = [(0, 0), ph, pw, (0, 0)]
                if nm == "MAX_POOL_2D":
                    y = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, window, strides, pads)
                else:
                    s = jax.lax.reduce_window(
                        x, 0.0, jax.lax.add, window, strides, pads)
                    if ph == (0, 0) and pw == (0, 0):
                        y = s / (o["filter_h"] * o["filter_w"])
                    else:
                        ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
                        cnt = jax.lax.reduce_window(
                            ones, 0.0, jax.lax.add, window, strides, pads)
                        y = s / cnt
                env[op.outputs[0]] = _act(y, o["activation"])
            elif nm == "FULLY_CONNECTED":
                x = get(op.inputs[0])
                w = get(op.inputs[1])  # [out, in]
                if not o.get("keep_num_dims"):
                    # TFLite flattens all but the feature dim to the batch.
                    x = x.reshape(-1, w.shape[1])
                y = jnp.dot(x, w.T, preferred_element_type=jnp.float32,
                            precision=prec)
                if len(op.inputs) > 2 and op.inputs[2] >= 0:
                    y = y + get(op.inputs[2])
                env[op.outputs[0]] = _act(y, o["activation"])
            elif nm == "ADD":
                env[op.outputs[0]] = _act(
                    get(op.inputs[0]) + get(op.inputs[1]), o["activation"])
            elif nm == "SUB":
                env[op.outputs[0]] = _act(
                    get(op.inputs[0]) - get(op.inputs[1]), o["activation"])
            elif nm == "MUL":
                env[op.outputs[0]] = _act(
                    get(op.inputs[0]) * get(op.inputs[1]), o["activation"])
            elif nm == "DIV":
                env[op.outputs[0]] = _act(
                    get(op.inputs[0]) / get(op.inputs[1]), o["activation"])
            elif nm == "SQUARED_DIFFERENCE":
                d = get(op.inputs[0]) - get(op.inputs[1])
                env[op.outputs[0]] = d * d
            elif nm == "RELU":
                env[op.outputs[0]] = jax.nn.relu(get(op.inputs[0]))
            elif nm == "RELU6":
                env[op.outputs[0]] = jnp.clip(get(op.inputs[0]), 0.0, 6.0)
            elif nm == "PRELU":
                x = get(op.inputs[0])
                alpha = get(op.inputs[1])
                env[op.outputs[0]] = jnp.where(x >= 0, x, x * alpha)
            elif nm == "LEAKY_RELU":
                x = get(op.inputs[0])
                env[op.outputs[0]] = jnp.where(x >= 0, x, x * o["alpha"])
            elif nm == "LOGISTIC":
                env[op.outputs[0]] = jax.nn.sigmoid(get(op.inputs[0]))
            elif nm == "TANH":
                env[op.outputs[0]] = jnp.tanh(get(op.inputs[0]))
            elif nm == "HARD_SWISH":
                x = get(op.inputs[0])
                env[op.outputs[0]] = x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
            elif nm == "SOFTMAX":
                env[op.outputs[0]] = jax.nn.softmax(
                    get(op.inputs[0]) * o.get("beta", 1.0), axis=-1)
            elif nm == "NEG":
                env[op.outputs[0]] = -get(op.inputs[0])
            elif nm == "SQRT":
                env[op.outputs[0]] = jnp.sqrt(get(op.inputs[0]))
            elif nm == "RSQRT":
                env[op.outputs[0]] = jax.lax.rsqrt(get(op.inputs[0]))
            elif nm == "EXP":
                env[op.outputs[0]] = jnp.exp(get(op.inputs[0]))
            elif nm == "LOG":
                env[op.outputs[0]] = jnp.log(get(op.inputs[0]))
            elif nm == "ABS":
                env[op.outputs[0]] = jnp.abs(get(op.inputs[0]))
            elif nm == "SQUARE":
                x = get(op.inputs[0])
                env[op.outputs[0]] = x * x
            elif nm == "POW":
                env[op.outputs[0]] = get(op.inputs[0]) ** get(op.inputs[1])
            elif nm == "MAXIMUM":
                env[op.outputs[0]] = jnp.maximum(
                    get(op.inputs[0]), get(op.inputs[1]))
            elif nm == "MINIMUM":
                env[op.outputs[0]] = jnp.minimum(
                    get(op.inputs[0]), get(op.inputs[1]))
            elif nm == "RESHAPE":
                x = get(op.inputs[0])
                if len(op.inputs) > 1 and op.inputs[1] >= 0 and \
                        op.inputs[1] in const:
                    shp = [int(v) for v in get_static(op.inputs[1])]
                else:
                    shp = list(o["new_shape"])
                env[op.outputs[0]] = jnp.reshape(x, shp)
            elif nm == "SQUEEZE":
                x = get(op.inputs[0])
                dims = o["squeeze_dims"] or [
                    i for i, d in enumerate(x.shape) if d == 1]
                env[op.outputs[0]] = jnp.squeeze(x, axis=tuple(dims))
            elif nm == "EXPAND_DIMS":
                x = get(op.inputs[0])
                axis = int(get_static(op.inputs[1]).reshape(()))
                env[op.outputs[0]] = jnp.expand_dims(x, axis)
            elif nm == "TRANSPOSE":
                x = get(op.inputs[0])
                perm = [int(v) for v in get_static(op.inputs[1])]
                env[op.outputs[0]] = jnp.transpose(x, perm)
            elif nm == "CONCATENATION":
                xs = [get(i) for i in op.inputs]
                env[op.outputs[0]] = _act(
                    jnp.concatenate(xs, axis=o["axis"]), o["activation"])
            elif nm == "PAD" or nm == "PADV2":
                x = get(op.inputs[0])
                padv = get_static(op.inputs[1]).reshape(-1, 2)
                value = 0.0
                if nm == "PADV2" and len(op.inputs) > 2:
                    value = float(get_static(op.inputs[2]).reshape(()))
                env[op.outputs[0]] = jnp.pad(
                    x, [(int(a), int(b)) for a, b in padv],
                    constant_values=value)
            elif nm in ("MEAN", "SUM", "REDUCE_MAX", "REDUCE_MIN"):
                x = get(op.inputs[0])
                axes = tuple(int(v) for v in
                             np.atleast_1d(get_static(op.inputs[1])))
                red = {"MEAN": jnp.mean, "SUM": jnp.sum,
                       "REDUCE_MAX": jnp.max, "REDUCE_MIN": jnp.min}[nm]
                env[op.outputs[0]] = red(
                    x, axis=axes, keepdims=bool(o["keep_dims"]))
            elif nm == "STRIDED_SLICE":
                if o["ellipsis_mask"] or o["new_axis_mask"]:
                    raise NotImplementedError(
                        "STRIDED_SLICE ellipsis_mask/new_axis_mask not "
                        "supported")
                x = get(op.inputs[0])
                begin = get_static(op.inputs[1]).astype(np.int64)
                end = get_static(op.inputs[2]).astype(np.int64)
                strides = get_static(op.inputs[3]).astype(np.int64)
                idx = []
                shrink = o["shrink_axis_mask"]
                for d in range(len(begin)):
                    b = int(begin[d])
                    e = int(end[d])
                    s = int(strides[d])
                    if o["begin_mask"] & (1 << d):
                        b = None
                    if o["end_mask"] & (1 << d):
                        e = None
                    if shrink & (1 << d):
                        idx.append(b if b is not None else 0)
                    else:
                        idx.append(slice(b, e, s))
                env[op.outputs[0]] = x[tuple(idx)]
            elif nm == "SLICE":
                x = get(op.inputs[0])
                begin = [int(v) for v in get_static(op.inputs[1])]
                size = [int(v) for v in get_static(op.inputs[2])]
                size = [x.shape[d] - begin[d] if s == -1 else s
                        for d, s in enumerate(size)]
                env[op.outputs[0]] = jax.lax.slice(
                    x, begin, [b + s for b, s in zip(begin, size)])
            elif nm == "RESIZE_BILINEAR":
                x = get(op.inputs[0])
                kh, kw = resize_mats[oi]
                mh, mw = p[kh], p[kw]
                # out[b,oh,ow,c] = mh[oh,h] x[b,h,w,c] mw[ow,w]
                y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=prec)
                y = jnp.einsum("pw,bowc->bopc", mw, y, precision=prec)
                env[op.outputs[0]] = y
            elif nm == "RESIZE_NEAREST_NEIGHBOR":
                x = get(op.inputs[0])
                out_hw = get_static(op.inputs[1]).astype(np.int64)
                oh, ow = int(out_hw[0]), int(out_hw[1])

                def nn_idx(in_s, out_s):
                    # TFLite semantics: default floor(i*scale);
                    # half_pixel floor((i+0.5)*scale); align_corners
                    # round(i*(in-1)/(out-1)).
                    i = np.arange(out_s)
                    if o.get("align_corners") and out_s > 1:
                        idx = np.round(i * (in_s - 1) / (out_s - 1))
                    elif o.get("half_pixel_centers"):
                        idx = np.floor((i + 0.5) * in_s / out_s)
                    else:
                        idx = np.floor(i * in_s / out_s)
                    return np.clip(idx, 0, in_s - 1).astype(np.int32)

                y = jnp.take(x, jnp.asarray(nn_idx(x.shape[1], oh)), axis=1)
                y = jnp.take(y, jnp.asarray(nn_idx(x.shape[2], ow)), axis=2)
                env[op.outputs[0]] = y
            elif nm == "DEPTH_TO_SPACE":
                x = get(op.inputs[0])
                b = o["block_size"]
                n, h, w, c = x.shape
                y = x.reshape(n, h, w, b, b, c // (b * b))
                y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
                env[op.outputs[0]] = y.reshape(n, h * b, w * b, c // (b * b))
            elif nm == "TILE":
                x = get(op.inputs[0])
                reps = tuple(int(v) for v in
                             np.atleast_1d(get_static(op.inputs[1])))
                env[op.outputs[0]] = jnp.tile(x, reps)
            elif nm == "GATHER":
                x = get(op.inputs[0])
                idx = get(op.inputs[1])
                if o.get("batch_dims", 0):
                    raise ValueError(
                        "GATHER with batch_dims != 0 is not supported")
                env[op.outputs[0]] = jnp.take(x, idx.astype(jnp.int32),
                                              axis=o.get("axis", 0))
            elif nm == "MIRROR_PAD":
                x = get(op.inputs[0])
                padv = get_static(op.inputs[1]).reshape(-1, 2)
                env[op.outputs[0]] = jnp.pad(
                    x, [(int(a), int(b)) for a, b in padv],
                    mode="reflect" if o.get("mode", 0) == 0 else "symmetric")
            elif nm == "L2_NORMALIZATION":
                x = get(op.inputs[0])
                env[op.outputs[0]] = _act(
                    x * jax.lax.rsqrt(
                        jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12),
                    o.get("activation"))
            elif nm == "DEQUANTIZE":
                # Runtime fp16 -> fp32 cast; quantized activations are
                # already float (fake-quant keeps the float representation).
                env[op.outputs[0]] = get(op.inputs[0]).astype(jnp.float32)
            elif nm == "QUANTIZE":
                # Grid snapping happens in the output hook below.
                env[op.outputs[0]] = get(op.inputs[0]).astype(jnp.float32)
            elif nm == "CAST":
                x = get(op.inputs[0])
                out_dtype = tensor_dtype[op.outputs[0]]
                env[op.outputs[0]] = x.astype(out_dtype)
            elif nm == "FLOOR":
                env[op.outputs[0]] = jnp.floor(get(op.inputs[0]))
            elif nm == "ELU":
                env[op.outputs[0]] = jax.nn.elu(get(op.inputs[0]))
            elif nm == "GELU":
                env[op.outputs[0]] = jax.nn.gelu(
                    get(op.inputs[0]),
                    approximate=bool(o.get("approximate")))
            elif nm == "SPACE_TO_DEPTH":
                x = get(op.inputs[0])
                b = o["block_size"]
                n, h, w, c = x.shape
                y = x.reshape(n, h // b, b, w // b, b, c)
                y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
                env[op.outputs[0]] = y.reshape(n, h // b, w // b, b * b * c)
            elif nm == "ARG_MAX":
                x = get(op.inputs[0])
                axis = int(np.asarray(get_static(op.inputs[1])).reshape(()))
                out_dtype = tensor_dtype[op.outputs[0]]
                if np.dtype(out_dtype) == np.int64 and \
                        not jax.config.jax_enable_x64:
                    out_dtype = np.int32  # x64 disabled: avoid silent-trunc warn
                env[op.outputs[0]] = jnp.argmax(x, axis=axis).astype(out_dtype)
            elif nm == "SPLIT":
                # inputs = (axis, x); equal split into len(outputs) parts.
                axis = int(np.asarray(get_static(op.inputs[0])).reshape(()))
                x = get(op.inputs[1])
                parts = jnp.split(x, len(op.outputs), axis=axis)
                for out_t, part in zip(op.outputs, parts):
                    env[out_t] = part
            elif nm == "UNPACK":
                x = get(op.inputs[0])
                axis = o["axis"]
                parts = jnp.split(x, x.shape[axis], axis=axis)
                for out_t, part in zip(op.outputs, parts):
                    env[out_t] = jnp.squeeze(part, axis=axis)
            elif nm == "PACK":
                env[op.outputs[0]] = jnp.stack(
                    [get(i) for i in op.inputs], axis=o["axis"])
            elif nm == "BATCH_MATMUL":
                a = get(op.inputs[0])
                b = get(op.inputs[1])
                if o.get("adj_x"):
                    a = jnp.swapaxes(a, -1, -2)
                if o.get("adj_y"):
                    b = jnp.swapaxes(b, -1, -2)
                env[op.outputs[0]] = jnp.matmul(
                    a, b, precision=prec,
                    preferred_element_type=jnp.float32)
            else:
                raise NotImplementedError(f"op {nm} not implemented")
            for tox in op.outputs:
                if tox in act_quant and tox in env:
                    env[tox] = _fake_quant(env[tox], *act_quant[tox])

        return tuple(env[t] if t in env else jnp.asarray(const_outputs[t])
                     for t in output_ixs)

    # Host-memory hygiene: the traced constants now live in `params` as
    # device arrays, but fn's closure holds `const` (every weight as
    # numpy) — keeping it would roughly double the model's host footprint
    # for its whole lifetime.  Runtime tracing only needs the small
    # static-input entries; keep those as COPIES (views would pin the
    # whole blob) and drop the rest.
    static_needed: set[int] = set()
    for op in ops:
        statics = _STATIC_INPUTS.get(op.name, set())
        for pos, tix in enumerate(op.inputs):
            if tix >= 0 and tix in const and pos in statics:
                static_needed.add(tix)
    # Copy retained statics so fn's closure holds no views into the
    # source flatbuffer (params are jnp device copies already): once the
    # caller drops its ModelIR, the blob is freed.  The IR itself is NOT
    # mutated — converting the same parsed IR at several precisions is
    # supported (benchmarks/experiments/mixed_frac_sweep.py does this).
    pruned = {tix: np.array(const[tix]) for tix in static_needed}
    const.clear()
    const.update(pruned)

    input_shapes = [tensor_shape[t] for t in ir.inputs]
    output_shapes = [tensor_shape[t] for t in ir.outputs]
    return ConvertedModel(params, fn, input_shapes, output_shapes, name=name)


def mixed_precision(ops, frac: float = 0.5, low: str = "default",
                    high: str = "high"):
    """Per-op precision callable: the earliest ``frac`` of conv ops run
    ``low`` (plain bf16), the rest — including the regression heads —
    ``high`` (bf16x3).  Non-conv matmuls stay ``high``.

    ``ops`` is the PRUNED executable op list (the index space the
    converter calls precision callables with) — `convert_model` resolves
    the ``"mixed"`` string against it.

    Measured on BlazeFace-back (benchmarks/experiments/
    detector_mixed_precision.py, TPU relay): the parity error of all-bf16
    (~2.5 px) lives in the LATE layers; relaxing the early half costs
    0.395 px max box error for a 29% conv speedup
    (18.52 -> 13.09 ms/batch-16).
    """
    conv_ids = [i for i, op in enumerate(ops) if "CONV" in op.name]
    n_low = int(len(conv_ids) * frac)
    if n_low <= 0:  # frac too small to cover even one conv: demote none
        return high
    cutoff = conv_ids[n_low - 1]

    def spec(oi, nm):
        if "CONV" in nm and oi <= cutoff:
            return low
        return high
    return spec


def convert_file(path: str, name: str = "",
                 precision: str = "highest") -> ConvertedModel:
    with open(path, "rb") as f:
        buf = f.read()
    return convert_model(parse_tflite(buf), name=name or path,
                         precision=precision)
