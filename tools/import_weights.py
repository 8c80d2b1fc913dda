#!/usr/bin/env python
"""Repo-checkout alias for the weight importer.

The implementation lives in the package
(`face_detection_tflite_tpu/convert/import_weights.py`) so installed
deployments reach it as ``fdt-tpu import-weights mobilefacenet <ckpt>``
— this script keeps the original entry point working from a source
checkout:

    python tools/import_weights.py mobilefacenet --src ckpt.pth \
        --dst face_detection_tflite_tpu/assets/checkpoints/mobilefacenet.npz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from face_detection_tflite_tpu.convert.import_weights import (  # noqa: F401,E402
    BN_EPS, _conv_order, _oihw_to_hwio, _template, fold_bn,
    import_mobilefacenet, import_mobilefacenet_npz,
    import_mobilefacenet_state_dict)


def main():
    from face_detection_tflite_tpu.cli import main as cli_main
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", choices=["mobilefacenet"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", default="face_detection_tflite_tpu/assets/"
                                     "checkpoints/mobilefacenet.npz")
    args = ap.parse_args()
    return cli_main(["import-weights", args.model, args.src,
                     "--dst", args.dst])


if __name__ == "__main__":
    raise SystemExit(main())
