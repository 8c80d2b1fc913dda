"""Multi-chip data-parallel tests on the 8-device virtual CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_tflite_tpu.parallel.sharding import (
    data_parallel, make_mesh, shard_batch, shard_params)

MODELS_DIR = "/root/reference/assets/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS_DIR), reason="reference assets not present")


@pytest.fixture(scope="module")
def models():
    from face_detection_tflite_tpu.convert.executor import convert_file
    from face_detection_tflite_tpu.pipeline.programs import PipelineModels
    return PipelineModels(
        detector=convert_file(f"{MODELS_DIR}/face_detection_short_range.tflite"),
        variant="short",
        mesh=convert_file(f"{MODELS_DIR}/face_landmark.tflite"))


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_matches_single_device(models):
    from face_detection_tflite_tpu.pipeline.config import FaceDetectionMode
    from face_detection_tflite_tpu.pipeline.programs import (
        build_pipeline_program)

    h = w = 96
    program = build_pipeline_program(models, h, w, FaceDetectionMode.STANDARD,
                                     max_faces=2, num_candidates=32)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (8, h, w, 3)).astype(np.float32)

    single = jax.jit(program)(models.params, jnp.asarray(images))

    mesh = make_mesh()
    step = data_parallel(program, mesh)
    sharded = step(shard_params(models.params, mesh),
                   shard_batch(jnp.asarray(images), mesh))

    for k in single:
        np.testing.assert_allclose(np.asarray(single[k]),
                                   np.asarray(sharded[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    # Outputs are actually sharded over the mesh.
    assert len(sharded["mesh"].sharding.device_set) == 8


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
