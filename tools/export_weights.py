#!/usr/bin/env python
"""Offline weight export: .tflite -> .npz checkpoints.

The converter (`convert/executor.py`) can run straight from .tflite files;
this tool materializes the converted params as plain .npz checkpoints so
serving environments need neither the flatbuffers nor the original model
files (SURVEY §7.1: "convert the weights once into a checkpoint").

    python tools/export_weights.py [--src DIR] [--dst DIR]

Each model produces `<name>.npz` holding the params dict plus
`__meta_input_shapes__` / `__meta_output_shapes__`.  Load side:
`convert.checkpoint.load_params_npz` + `swap_params`.
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/assets/models")
    ap.add_argument("--dst", default="face_detection_tflite_tpu/assets/checkpoints")
    args = ap.parse_args()

    import jax
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")

    from face_detection_tflite_tpu.convert.executor import convert_file

    os.makedirs(args.dst, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.src, "*.tflite"))):
        name = os.path.splitext(os.path.basename(path))[0]
        cm = convert_file(path)
        out = {k: np.asarray(v) for k, v in cm.params.items()}
        out["__meta_input_shapes__"] = np.asarray(cm.input_shapes, np.int64)
        out["__meta_output_shapes__"] = np.asarray(
            [list(s) for s in cm.output_shapes], dtype=object)
        dst = os.path.join(args.dst, f"{name}.npz")
        np.savez_compressed(dst, **out)
        print(f"{name}: {cm.num_params} params -> {dst} "
              f"({os.path.getsize(dst) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
