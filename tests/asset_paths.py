"""Asset-directory resolution for the test suite.

A fresh clone gets its model/sample assets from
``python tools/fetch_models.py`` (SHA-256-pinned copies of the MediaPipe
models + royalty-free samples the reference vendors in-repo); the
development environment uses the read-only reference checkout directly.
Priority: ``FDT_TPU_MODEL_DIR`` env -> reference checkout -> fetched
package assets.  Tests `skipif` on the resolved dir not existing.
"""

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG_ASSETS = os.path.join(_REPO, "face_detection_tflite_tpu", "assets")
_REF_ASSETS = "/root/reference/assets"


def _resolve(kind: str) -> str:
    env = os.environ.get("FDT_TPU_MODEL_DIR")
    candidates = []
    if env:
        candidates.append(env if kind == "models"
                          else os.path.join(os.path.dirname(env), "samples"))
    candidates += [os.path.join(_REF_ASSETS, kind),
                   os.path.join(_PKG_ASSETS, kind)]
    for c in candidates:
        if os.path.isdir(c):
            return c
    return candidates[-1]  # nonexistent -> skipif markers trigger


MODELS_DIR = _resolve("models")
SAMPLES = _resolve("samples")
