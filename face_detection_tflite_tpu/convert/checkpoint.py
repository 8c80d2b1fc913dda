"""Checkpoint IO: load converted params from .npz (no .tflite needed).

The graph *structure* still comes from the .tflite file at build time (the
executor traces the op list), so a checkpoint pairs with its source model.
`load_params_npz` restores just the params pytree — useful for serving
images where weights were audited/pinned separately — and
`swap_params` validates tree/shape compatibility against a converted
model.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .executor import ConvertedModel

__all__ = ["save_params_npz", "load_params_npz", "swap_params"]

_META_PREFIX = "__meta"


def save_params_npz(model: ConvertedModel, path: str) -> None:
    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in model.params.items()})


def load_params_npz(path: str) -> dict:
    """Loads a params dict saved by :func:`save_params_npz` or
    ``tools/export_weights.py`` (meta keys ignored)."""
    # No allow_pickle: every key save_params_npz/export_weights.py writes
    # is a plain numeric array, and unpickling object arrays from an
    # untrusted checkpoint would execute arbitrary code before any
    # validation runs.
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files
                if not k.startswith(_META_PREFIX)}


def swap_params(model: ConvertedModel, params: dict,
                name: str = None) -> ConvertedModel:
    """Returns the model with ``params`` substituted (and optionally a
    new ``name`` — it is load-bearing for FaceEmbedding's trained-weights
    detection), after validating that every key/shape matches the
    converted graph."""
    missing = set(model.params) - set(params)
    extra = set(params) - set(model.params)
    if missing or extra:
        raise ValueError(
            f"param tree mismatch: missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}")
    for k, v in model.params.items():
        if tuple(params[k].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch for {k}: checkpoint "
                f"{tuple(params[k].shape)} vs graph {tuple(v.shape)}")
        if np.dtype(params[k].dtype) != np.dtype(v.dtype):
            # A float64/int checkpoint would otherwise pass validation
            # and fail (or silently change precision) at first trace.
            raise ValueError(
                f"dtype mismatch for {k}: checkpoint "
                f"{np.dtype(params[k].dtype)} vs graph {np.dtype(v.dtype)}")
    return ConvertedModel(dict(params), model.fn, model.input_shapes,
                          model.output_shapes,
                          name=model.name if name is None else name)
