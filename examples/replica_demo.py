"""Multi-chip replica serving demo.

Runs a stream of independent batches through a ReplicaPool — each chip
holds its own weight copy and pipelined executor, batches round-robin
with full-queue failover, and futures resolve in submit order
(docs/PERF.md "Multi-chip serving scale-out").

On this environment only one real TPU chip is attached, so the demo
provisions an 8-device virtual CPU mesh (the same harness the tests
use) to show the multi-chip path actually executing; on a real pod
slice, drop the two config lines and pass real devices.

    python examples/replica_demo.py [n_replicas] [n_batches]
"""

import os
import sys

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from face_detection_tflite_tpu import (FaceDetectionMode,  # noqa: E402
                                       FaceDetectionModel, FaceDetector,
                                       ReplicaPool, resolve_model_dir)


def main() -> None:
    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sample = os.path.join(os.path.dirname(resolve_model_dir()), "samples",
                          "landmark-ex1.jpg")
    img = np.asarray(Image.open(sample).convert("RGB"))[::2, ::2]

    det = FaceDetector(model=FaceDetectionModel.BACK_CAMERA)
    devices = jax.devices()[:n_replicas]
    print(f"replicating over {len(devices)} devices: "
          f"{[str(d) for d in devices]}")
    with ReplicaPool(det, devices=devices,
                     mode=FaceDetectionMode.STANDARD) as pool:
        # A unique-ish input per batch (roll) so results are per-batch real.
        futures = [pool.submit(np.stack([np.roll(img, 2 * i, axis=1)]))
                   for i in range(n_batches)]
        for i, fut in enumerate(futures):  # submit order == result order
            faces = fut.result(timeout=600)[0]
            print(f"batch {i:2d}: {len(faces)} face(s), "
                  f"score={faces[0].score:.3f}" if faces else
                  f"batch {i:2d}: no faces")
    placed = sorted(str(d) for d in det._replica_params_cache)
    print(f"weights resident on: {placed}")
    det.dispose()


if __name__ == "__main__":
    main()
