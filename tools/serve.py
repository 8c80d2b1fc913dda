#!/usr/bin/env python
"""Production HTTP serving entry point — alias for `fdt-tpu serve`.

Kept for compatibility with earlier docs; the implementation lives in
`face_detection_tflite_tpu/cli.py` (one `serve` command, one set of
flags).  Accepts the same flags as `fdt-tpu serve`, plus the legacy
`--model short` spelling.

    python tools/serve.py --port 8080 --mode-warmup 1280x853 \
        --precision serving
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = ["serve"] + sys.argv[1:]
    for i, a in enumerate(argv):  # legacy spelling from the old tool
        if a == "short" and i > 0 and argv[i - 1] == "--model":
            argv[i] = "short_range"
    from face_detection_tflite_tpu.cli import main as cli_main
    return cli_main(argv)


if __name__ == "__main__":
    sys.exit(main())
