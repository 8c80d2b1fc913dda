#!/usr/bin/env python
"""Fetches (or locally installs) the MediaPipe model assets + sample
images, making a fresh clone self-contained (VERDICT r2 next #7).

The reference vendors these same files in-repo (`assets/models/`,
`assets/samples/` — Apache-2.0 MediaPipe models, royalty-free samples);
this repo ships a manifest + fetcher instead of 11 MB of binaries.

    python tools/fetch_models.py                   # download + verify
    python tools/fetch_models.py --from-dir DIR    # offline: copy+verify
    python tools/fetch_models.py --verify-only     # check what's present

Every file is SHA-256-pinned; a hash mismatch is a hard error (a silently
different model would shift every parity test).  Default destination is
`face_detection_tflite_tpu/assets/` (first entry of the detector's model
dir search path); it is gitignored — run this once per clone.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.parse
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DST = os.path.join(REPO, "face_detection_tflite_tpu", "assets")

# Upstream: the reference repo's vendored copies (byte-identical to the
# MediaPipe releases it extracted them from — see its README.md:98 for the
# blendshape provenance).  SHA-256 computed from reference v6.8.0, and the
# fetch ref is PINNED to that tag (a mutable branch would let an upstream
# rewrite 404/alter every fresh clone; override with FDT_ASSET_GIT_REF if
# the tag scheme differs).
_GIT_REF = os.environ.get("FDT_ASSET_GIT_REF", "v6.8.0")
_RAW = ("https://raw.githubusercontent.com/hugocornellier/"
        f"face_detection_tflite/{_GIT_REF}/assets")

MANIFEST = {
    # models (Apache-2.0, Google MediaPipe)
    "models/face_blendshapes.tflite":
        "4f36dded049db18d76048567439b2a7f58f1daabc00d78bfe8f3ad396a2d2082",
    "models/face_detection_back.tflite":
        "e376cf6b168d5ece8a3cedb94acc4eb168a136aede125ccc3d903ef38f5beda8",
    "models/face_detection_front.tflite":
        "3bc182eb9f33925d9e58b5c8d59308a760f4adea8f282370e428c51212c26633",
    "models/face_detection_full_range.tflite":
        "99bf9494d84f50acc6617d89873f71bf6635a841ea699c17cb3377f9507cfec3",
    "models/face_detection_full_range_sparse.tflite":
        "671dd2f9ed11a78436fc21cc42357a803dfc6f73e9fb86541be942d5716c2dce",
    "models/face_detection_short_range.tflite":
        "3bc182eb9f33925d9e58b5c8d59308a760f4adea8f282370e428c51212c26633",
    "models/face_landmark.tflite":
        "2efcb4f4de43c7614b80a3cc3e8a37354b3b3b40f75cce20f6f38f0f25d65493",
    "models/iris_landmark.tflite":
        "d1744d2a09c25f501d39eba4faff47e53ecca8852c5ce19bce8eeac39357521f",
    "models/selfie_segmenter.tflite":
        "191ac9529ae506ee0beefa6b2c945a172dab9d07d1e802a290a4e4038226658b",
    "models/selfie_segmenter_landscape.tflite":
        "490e9ea734313e0de10fa0cd9e3c6133e36ea4db2b7a49bde9ef019f72796b8e",
    # samples (royalty-free; used by the parity suite + benchmarks)
    "samples/all-sample-images-are-royalty-free.txt":
        "d26e25d89e7b713ea666eb938bc6e7974977a3848bfcec3c20f8971731bbd70d",
    "samples/group-shot-bounding-box-ex1.jpeg":
        "71793e5a129e35541f937904039b722981b9ba40db09bbe24419dc0e0fc086f1",
    "samples/iris-detection-ex1.jpg":
        "91a31661e74701c2e5df36f123564cbf757a7c206978982160af46a69fc8c215",
    "samples/iris-detection-ex2.jpg":
        "bd105c9a11822ef4a6d96ef6dce6e56b1fc314aaad4d413fc997dd135cc35c72",
    "samples/landmark-ex1.jpg":
        "17a32597df503211ed126797bf8f5281f6e122545be925cfd3bf65658dc5f0ec",
    "samples/mesh-ex1.jpeg":
        "c2ba880b592ddc41c57d9534c989be5db274e5c150c0c16d4a2b62cddcca6048",
    "samples/2008-04-21 Day 13.jpg":
        "32e98632c0d795fe67dae7f9e4746352c084872c694292aac632b363dd508d60",
    "samples/2008-04-22 Day 14.jpg":
        "e8b38f56aa9797fde324a700aec9da8ea554f6241b6b827ab3fe1d2b40f12b15",
}


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _state(dst: str):
    """(present_ok, present_bad, missing) relative paths."""
    ok, bad, missing = [], [], []
    for rel, want in MANIFEST.items():
        p = os.path.join(dst, rel)
        if not os.path.exists(p):
            missing.append(rel)
        elif sha256_file(p) == want:
            ok.append(rel)
        else:
            bad.append(rel)
    return ok, bad, missing


def install(rel: str, data: bytes, dst: str) -> None:
    want = MANIFEST[rel]
    got = hashlib.sha256(data).hexdigest()
    if got != want:
        raise RuntimeError(
            f"SHA-256 mismatch for {rel}: expected {want}, got {got} — "
            "refusing to install (a different model would silently shift "
            "every parity test)")
    p = os.path.join(dst, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    # Atomic: a write interrupted mid-file must not leave a
    # hash-mismatched asset behind (which would brick every later run
    # until the user figured out what to delete).
    tmp = p + ".part"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, p)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dst", default=DEFAULT_DST)
    ap.add_argument("--from-dir", default=None,
                    help="offline source tree with models/ + samples/ "
                         "subdirs (e.g. a reference checkout's assets/)")
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()

    ok, bad, missing = _state(args.dst)
    if bad:
        print(f"ERROR: hash mismatch in {args.dst}: {bad}\n"
              f"Delete the listed file(s) and re-run this script to "
              f"re-fetch them (a mismatched model would silently shift "
              f"every parity test).", file=sys.stderr)
        return 1
    if args.verify_only:
        print(f"{len(ok)}/{len(MANIFEST)} present+verified, "
              f"{len(missing)} missing in {args.dst}")
        return 0 if not missing else 1
    if not missing:
        print(f"all {len(ok)} assets already present+verified in {args.dst}")
        return 0

    for rel in missing:
        if args.from_dir:
            src = os.path.join(args.from_dir, rel)
            with open(src, "rb") as f:
                data = f.read()
        else:
            url = f"{_RAW}/{urllib.parse.quote(rel)}"
            print(f"fetching {url}")
            with urllib.request.urlopen(url, timeout=60) as r:
                data = r.read()
        install(rel, data, args.dst)
        print(f"  installed {rel} ({len(data)} bytes, sha256 ok)")
    print(f"done: {len(MANIFEST)} assets verified in {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
