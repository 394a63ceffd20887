"""Checkpoint / resume: persist scenes, kd-trees and refinement results.

The reference has no persistence at all (its only artifact is the input PLY;
ICP state is 16 floats - SURVEY.md section 5). Serving pipelines want to
reuse per-frame scene structures and archive results, so every scene pytree
and result here round-trips through a single .npz file.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from pose_refine_tpu.icp import RegistrationResult
from pose_refine_tpu.scene.kdtree import KDTree
from pose_refine_tpu.scene.nn import SceneNN
from pose_refine_tpu.scene.projective import SceneProjective
from pose_refine_tpu.utils.fusion import PoseTracker

_KINDS = {
    "SceneProjective": SceneProjective,
    "SceneNN": SceneNN,
    "KDTree": KDTree,
    "RegistrationResult": RegistrationResult,
    "PoseTracker": PoseTracker,
}


def save(path: str, obj) -> None:
    """Save a scene / kd-tree / result to ``path`` (.npz)."""
    kind = type(obj).__name__
    if kind not in _KINDS:
        raise TypeError(f"don't know how to serialize {kind}")
    arrays = {}
    meta = {"kind": kind, "static": {}}
    if kind == "PoseTracker":  # filter state: exact resume of a track
        state = obj.state_dict()
        meta["static"]["n_rejected"] = state.pop("n_rejected")
        arrays = state
    elif dataclasses.is_dataclass(obj):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if f.metadata.get("static") or isinstance(v, (int, float, str, bool)):
                meta["static"][f.name] = v
            else:
                arrays[f.name] = np.asarray(v)
    else:  # NamedTuple (RegistrationResult)
        for name, v in obj._asdict().items():
            if v is not None:  # optional fields (e.g. n_points) may be unset
                arrays[name] = np.asarray(v)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load(path: str):
    """Load an object previously stored with :func:`save`."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        cls = _KINDS[meta["kind"]]
        kwargs = dict(meta["static"])
        for name in z.files:
            if name == "__meta__":
                continue
            arr = z[name]
            if meta["kind"] in ("KDTree", "PoseTracker"):
                kwargs[name] = arr  # host-side numpy objects
            else:
                kwargs[name] = jnp.asarray(arr)
    if meta["kind"] == "PoseTracker":
        return PoseTracker.from_state(kwargs)
    if meta["kind"] in ("KDTree", "SceneNN") and "bbox" in kwargs:
        # artifacts saved before round 3 carry no LEAF bboxes; the kd
        # traversal's far-child pruning needs them (zero boxes would
        # silently prune correct descents) - backfill from the points
        from pose_refine_tpu.scene.kdtree import ensure_leaf_bboxes

        fixed = ensure_leaf_bboxes(
            np.asarray(kwargs["points"]), np.asarray(kwargs["child"]),
            np.asarray(kwargs["bounds"]), np.asarray(kwargs["bbox"]),
        )
        kwargs["bbox"] = fixed if meta["kind"] == "KDTree" else jnp.asarray(fixed)
    return cls(**kwargs)
