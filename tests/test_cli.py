"""Command-line front-end (`face_detection_tflite_tpu/cli.py`).

The reference's user-facing surface is its example apps
(`example/lib/main.dart` screens); the TPU framework's analog is the
`fdt-tpu` terminal entry point.  These tests run the CLI in-process
(same interpreter, CPU backend from conftest) and assert on its stdout
contract — the JSON forms are what scripts will parse.
"""

import json
import os
import re
import threading
import time
import urllib.request

import pytest

from face_detection_tflite_tpu import cli

from .asset_paths import MODELS_DIR, SAMPLES

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS_DIR), reason="reference assets not present")

PORTRAIT = os.path.join(SAMPLES, "landmark-ex1.jpg")
IRIS1 = os.path.join(SAMPLES, "iris-detection-ex1.jpg")


def _run(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out
    return rc, out


class TestParser:
    def test_subcommands_present(self):
        ap = cli.build_parser()
        sub = ap._subparsers._group_actions[0]
        assert {"detect", "segment", "embed", "serve", "info",
                "version"} <= set(sub.choices)

    def test_no_command_exits(self):
        with pytest.raises(SystemExit):
            cli.build_parser().parse_args([])

    def test_help_is_light(self):
        # --help must not import jax/models (argparse exits before main's
        # heavy imports).
        with pytest.raises(SystemExit) as e:
            cli.build_parser().parse_args(["--help"])
        assert e.value.code == 0


class TestVersion:
    def test_version(self, capsys):
        rc, out = _run(capsys, ["version"])
        from face_detection_tflite_tpu import __version__
        assert rc == 0 and out.strip() == __version__


class TestDetect:
    def test_text_output(self, capsys):
        rc, out = _run(capsys, ["detect", PORTRAIT, "--mode", "standard",
                                "--model-dir", MODELS_DIR,
                                "--max-dim", "512"])
        assert rc == 0
        assert "1 face(s)" in out
        assert "score=" in out and "px" in out

    def test_json_output(self, capsys, tmp_path):
        annot = str(tmp_path / "out.png")
        rc, out = _run(capsys, ["detect", PORTRAIT, "--mode", "full",
                                "--model-dir", MODELS_DIR,
                                "--max-dim", "512", "--json",
                                "--annotate", annot])
        assert rc == 0
        payload = json.loads(out.strip().splitlines()[-1])
        assert payload["image"] == PORTRAIT
        assert len(payload["faces"]) == 1
        face = payload["faces"][0]
        assert {"bounding_box", "score", "landmarks"} <= set(face)
        assert "head_euler_angles" in face  # full mode
        assert "mesh" not in face  # opt-in
        assert os.path.exists(annot)

    def test_json_mesh_opt_in(self, capsys):
        rc, out = _run(capsys, ["detect", PORTRAIT, "--mode", "standard",
                                "--model-dir", MODELS_DIR,
                                "--max-dim", "512", "--json", "--mesh"])
        face = json.loads(out.strip().splitlines()[-1])["faces"][0]
        assert len(face["mesh"]) == 468

    def test_multiple_images_emit_one_json_line_each(self, capsys):
        rc, out = _run(capsys, ["detect", PORTRAIT, IRIS1,
                                "--mode", "fast", "--model-dir", MODELS_DIR,
                                "--max-dim", "512", "--json"])
        lines = [l for l in out.strip().splitlines() if l.startswith("{")]
        assert len(lines) == 2
        assert [json.loads(l)["image"] for l in lines] == [PORTRAIT, IRIS1]


class TestSegment:
    def test_mask_png(self, capsys, tmp_path):
        out_png = str(tmp_path / "mask.png")
        rc, out = _run(capsys, ["segment", PORTRAIT, "--out", out_png,
                                "--model-dir", MODELS_DIR,
                                "--max-dim", "512"])
        assert rc == 0 and os.path.exists(out_png)
        assert "person coverage" in out
        from PIL import Image
        import numpy as np
        arr = np.asarray(Image.open(out_png))
        assert arr.ndim == 2 and arr.max() > 128  # some person pixels

    def test_binary_format(self, capsys, tmp_path):
        out_png = str(tmp_path / "mask.png")
        rc, _ = _run(capsys, ["segment", PORTRAIT, "--out", out_png,
                              "--model-dir", MODELS_DIR, "--max-dim", "512",
                              "--format", "binary", "--threshold", "0.6"])
        from PIL import Image
        import numpy as np
        vals = np.unique(np.asarray(Image.open(out_png)))
        assert set(vals.tolist()) <= {0, 255}


class TestEmbed:
    def test_single_image_json(self, capsys):
        rc, out = _run(capsys, ["embed", PORTRAIT, "--json",
                                "--allow-untrained",
                                "--model-dir", MODELS_DIR,
                                "--max-dim", "512"])
        payload = json.loads(out.strip().splitlines()[-1])
        assert len(payload["embedding"]) == 192

    def test_two_images_similarity(self, capsys):
        rc, out = _run(capsys, ["embed", PORTRAIT, IRIS1, "--json",
                                "--allow-untrained",
                                "--model-dir", MODELS_DIR,
                                "--max-dim", "512"])
        payload = json.loads(out.strip().splitlines()[-1])
        assert -1.0 <= payload["cosine_similarity"] <= 1.0
        assert payload["euclidean_distance"] >= 0.0

    def test_three_images_rejected(self, capsys):
        rc = cli.main(["embed", PORTRAIT, PORTRAIT, PORTRAIT,
                       "--allow-untrained", "--model-dir", MODELS_DIR])
        assert rc == 2


class TestVideo:
    @pytest.fixture(scope="class")
    def video_path(self, tmp_path_factory):
        cv2 = pytest.importorskip("cv2")
        import numpy as np
        from PIL import Image
        img = np.asarray(Image.open(PORTRAIT).convert("RGB"))[..., ::-1]
        img = cv2.resize(img, (320, 213))
        path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (320, 213))
        assert vw.isOpened()
        for i in range(6):
            vw.write(np.roll(img, i * 2, axis=1))
        vw.release()
        return path

    def test_json_lines(self, capsys, video_path):
        rc, out = _run(capsys, ["video", video_path, "--json",
                                "--mode", "fast", "--stride", "2",
                                "--model-dir", MODELS_DIR,
                                "--smooth", "none"])
        assert rc == 0
        lines = [json.loads(l) for l in out.strip().splitlines()]
        assert [l["frame"] for l in lines] == [0, 2, 4]
        assert all(len(l["faces"]) == 1 for l in lines)
        # tracking is on: stable ID across the clip
        ids = {l["faces"][0]["tracking_id"] for l in lines}
        assert len(ids) == 1 and None not in ids

    def test_annotated_output(self, capsys, video_path, tmp_path):
        out_mp4 = str(tmp_path / "annotated.mp4")
        rc, out = _run(capsys, ["video", video_path, "--out", out_mp4,
                                "--mode", "fast", "--max-frames", "2",
                                "--model-dir", MODELS_DIR])
        assert rc == 0 and os.path.getsize(out_mp4) > 0
        assert "2 frame(s)" in out

    def test_bad_video_clean_error(self, capsys, tmp_path):
        bad = tmp_path / "junk.mp4"
        bad.write_bytes(b"\x00" * 64)
        rc = cli.main(["video", str(bad), "--json",
                       "--model-dir", MODELS_DIR])
        assert rc == 1
        assert "error:" in capsys.readouterr().err


class TestErrors:
    def test_garbage_image_clean_error(self, capsys, tmp_path):
        bad = tmp_path / "junk.jpg"
        bad.write_bytes(b"not an image at all")
        rc = cli.main(["detect", str(bad), "--model-dir", MODELS_DIR,
                       "--mode", "fast"])
        err = capsys.readouterr().err
        assert rc == 1 and err.startswith("error:")

    def test_missing_file_clean_error(self, capsys):
        rc = cli.main(["detect", "/nonexistent/x.jpg",
                       "--model-dir", MODELS_DIR, "--mode", "fast"])
        assert rc == 1
        assert "error:" in capsys.readouterr().err


class TestInfo:
    def test_info_json(self, capsys):
        rc, out = _run(capsys, ["info"])
        assert rc == 0
        payload = json.loads(out)
        assert payload["backend"] == "cpu"  # conftest forces CPU
        assert payload["model_dir"]
        assert payload["memory_report"]["total_weights"] > 0

    def test_info_cost_analysis(self, capsys):
        rc, out = _run(capsys, ["info", "--cost", "128x128"])
        cost = json.loads(out)["cost_analysis"]
        assert set(cost) == {"fast", "standard", "full"}
        assert cost["fast"]["flops"] < cost["full"]["flops"]


class TestServe:
    def test_serve_round_trip(self, capsys):
        box = {}

        def run():
            box["rc"] = cli.main(["serve", "--port", "0",
                                  "--model-dir", MODELS_DIR,
                                  "--max-faces", "4"])

        th = threading.Thread(target=run, daemon=True)
        th.start()
        # Wait for the announce line to learn the ephemeral port.
        deadline = time.time() + 300
        addr = None
        seen = ""
        while time.time() < deadline:
            seen += capsys.readouterr().out
            m = re.search(r"http://([0-9.]+:\d+)", seen)
            if m:
                addr = m.group(1)
                break
            if not th.is_alive():
                pytest.fail(f"serve exited early (rc={box.get('rc')})")
            time.sleep(0.1)
        assert addr, "server never announced"
        with urllib.request.urlopen(f"http://{addr}/v1/info",
                                    timeout=60) as r:
            info = json.loads(r.read())
        assert "model_version" in info and info["ready"]
        assert cli._serve_stop is not None
        cli._serve_stop.set()
        th.join(60)
        assert not th.is_alive() and box["rc"] == 0

    def test_serve_replicas_announced(self, capsys):
        box = {}

        def run():
            box["rc"] = cli.main(["serve", "--port", "0", "--replicas",
                                  "2", "--model-dir", MODELS_DIR])

        th = threading.Thread(target=run, daemon=True)
        th.start()
        deadline = time.time() + 300
        addr = None
        seen = ""
        while time.time() < deadline:
            seen += capsys.readouterr().out
            m = re.search(r"http://([0-9.]+:\d+)", seen)
            if m:
                addr = m.group(1)
                break
            if not th.is_alive():
                pytest.fail(f"serve exited early (rc={box.get('rc')})")
            time.sleep(0.1)
        assert addr and "2 detect replicas" in seen
        with urllib.request.urlopen(f"http://{addr}/v1/info",
                                    timeout=60) as r:
            info = json.loads(r.read())
        assert len(info["replica_devices"]) == 2
        cli._serve_stop.set()
        th.join(60)
        assert not th.is_alive() and box["rc"] == 0

    def test_serve_replicas_out_of_range_errors(self, capsys):
        import jax
        for bad in (len(jax.devices()) + 1, -2):
            rc = cli.main(["serve", "--port", "0", "--replicas", str(bad),
                           "--model-dir", MODELS_DIR])
            assert rc == 1
            assert "out of range" in capsys.readouterr().err


class TestDoctor:
    """`fdt-tpu doctor` — the fresh-deployment self-check."""

    def test_green_with_assets(self, capsys):
        rc, out = _run(capsys, ["doctor", "--model-dir", MODELS_DIR])
        assert rc == 0
        assert "all required checks passed" in out
        assert "model assets" in out and "device backend" in out

    def test_json_contract(self, capsys):
        rc, out = _run(capsys, ["doctor", "--model-dir", MODELS_DIR,
                                "--json"])
        assert rc == 0
        doc = json.loads(out)
        assert doc["ok"] is True
        names = {c["check"] for c in doc["checks"]}
        assert {"model assets", "device backend", "compile cache",
                "native decode"} <= names
        for c in doc["checks"]:
            if c["required"]:
                assert c["ok"], c

    def test_missing_assets_fail_with_fix(self, capsys, tmp_path):
        rc, out = _run(capsys, ["doctor", "--model-dir", str(tmp_path)])
        assert rc == 1
        assert "FAIL" in out and "fetch_models" in out

    def test_run_end_to_end(self, capsys):
        rc, out = _run(capsys, ["doctor", "--model-dir", MODELS_DIR,
                                "--run"])
        assert rc == 0
        assert "end-to-end detect" in out and "0 faces" in out

    def test_model_dir_typo_fails_not_falls_through(self, capsys):
        """ADVICE r3: `doctor --model-dir /typo` must FAIL naming the bad
        path, not silently validate the package-default directory."""
        rc, out = _run(capsys, ["doctor", "--model-dir", "/no/such/dir"])
        assert rc == 1
        assert "not a directory" in out and "/no/such/dir" in out

    def test_backend_cpu_fallback_marks_fail(self, capsys, monkeypatch):
        """ADVICE r3 (medium): a silent accelerator-init->CPU fallback in
        ensure_backend must FAIL the backend check — 'ok device backend:
        cpu' on a broken TPU deployment defeats the self-check."""
        from face_detection_tflite_tpu.utils import backend
        monkeypatch.setattr(backend, "_fallback_reason",
                            "RuntimeError('plugin init failed')")
        rc, out = _run(capsys, ["doctor", "--model-dir", MODELS_DIR])
        assert rc == 1
        assert "FAIL" in out and "fell back to cpu" in out

    def test_untrained_embedding_noted(self, capsys):
        """VERDICT r3 next #6: doctor's optional-models line says what the
        absence MEANS (random-init embeddings can't discriminate)."""
        rc, out = _run(capsys, ["doctor", "--model-dir", MODELS_DIR,
                                "--json"])
        doc = json.loads(out)
        opt = next(c for c in doc["checks"] if c["check"] == "optional models")
        from face_detection_tflite_tpu import FaceDetector
        det = FaceDetector(model_dir=MODELS_DIR)
        try:
            if det.is_embedding_pretrained:
                assert opt["ok"] or "mobilefacenet" not in opt["detail"]
            else:
                assert "RANDOM-INIT" in opt["detail"]
        finally:
            det.dispose()


class TestImportWeightsCommand:
    """`fdt-tpu import-weights` (VERDICT r4 #8): the one capability a
    user must supply becomes one command — import, BN-fold validation,
    forward-pass check, and doctor's optional-models line turning green."""

    def _src_npz(self, tmp_path):
        from face_detection_tflite_tpu.convert.import_weights import (
            import_mobilefacenet_state_dict)

        from .test_import_weights import _synthetic_state_dict
        import numpy as np
        params = import_mobilefacenet_state_dict(_synthetic_state_dict())
        src = str(tmp_path / "ckpt.npz")
        np.savez_compressed(src, **params)
        return src

    def test_import_validate_and_doctor_green(self, capsys, tmp_path):
        src = self._src_npz(tmp_path)
        # Discovery dir: symlinked copy of the model assets.
        mdir = tmp_path / "models"
        mdir.mkdir()
        for f in os.listdir(MODELS_DIR):
            os.symlink(os.path.join(MODELS_DIR, f), mdir / f)

        # Doctor before: optional models absent (warn, RANDOM-INIT note).
        rc, out = _run(capsys, ["doctor", "--model-dir", str(mdir),
                                "--json"])
        opt = next(c for c in json.loads(out)["checks"]
                   if c["check"] == "optional models")
        assert not opt["ok"] and "RANDOM-INIT" in opt["detail"]

        rc, out = _run(capsys, ["import-weights", "mobilefacenet", src,
                                "--model-dir", str(mdir)])
        assert rc == 0
        assert "BatchNorm folded" in out and "shapes validated" in out
        assert "forward pass ok" in out and "L2 norm 1.0" in out
        assert os.path.isfile(mdir / "mobilefacenet.npz")

        # Doctor after: the optional-models check turns green.
        rc, out = _run(capsys, ["doctor", "--model-dir", str(mdir),
                                "--json"])
        opt = next(c for c in json.loads(out)["checks"]
                   if c["check"] == "optional models")
        assert "mobilefacenet.tflite" not in opt["detail"]
        # ...and the detector discovers the weights (no RANDOM-INIT).
        from face_detection_tflite_tpu import FaceDetector
        det = FaceDetector(model_dir=str(mdir))
        try:
            assert det.is_embedding_pretrained
        finally:
            det.dispose()

    def test_failed_verify_installs_nothing(self, capsys, tmp_path):
        # Shape-valid but numerically bad checkpoint (NaN weights): the
        # forward-pass check must fail AND leave nothing in the
        # discovery path — a broken .npz there would be silently loaded
        # by every future detector and turn doctor green on garbage.
        import numpy as np
        src = self._src_npz(tmp_path)
        with np.load(src) as z:
            params = dict(z)
        poisoned = next(k for k in params if params[k].ndim >= 2)
        params[poisoned] = np.full_like(params[poisoned], np.nan)
        bad = str(tmp_path / "nan_ckpt.npz")
        np.savez_compressed(bad, **params)
        dst = str(tmp_path / "out" / "w.npz")
        rc = cli.main(["import-weights", "mobilefacenet", bad,
                       "--dst", dst])
        assert rc == 1
        assert not os.path.exists(dst), "failed verify must not install"
        assert not os.path.exists(dst + ".staging.npz"), "staging cleaned"

    def test_explicit_dst_and_bad_checkpoint(self, capsys, tmp_path):
        src = self._src_npz(tmp_path)
        dst = str(tmp_path / "out" / "w.npz")
        rc, out = _run(capsys, ["import-weights", "mobilefacenet", src,
                                "--dst", dst, "--no-verify"])
        assert rc == 0 and os.path.isfile(dst)
        assert "forward pass" not in out
        # A malformed checkpoint fails with the validation error, exit 1.
        import numpy as np
        bad = str(tmp_path / "bad.npz")
        np.savez_compressed(bad, stem_w=np.zeros((3, 3, 3, 64), np.float32))
        rc = cli.main(["import-weights", "mobilefacenet", bad,
                       "--dst", dst])
        assert rc == 1
