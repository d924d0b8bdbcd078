"""Training-state checkpoint / resume.

The reference has no checkpointing at the pipeline level — its only
persisted state is the immutable ONNX model blobs loaded at startup
(reference pipeline/src/speakerDiarizer.cpp:2958/:3043; SURVEY.md section
5.4). A trainable framework needs real resume: this module persists an
ARBITRARY pytree (TrainState = params + optax optimizer state + step
counter) as a flat .npz, restores it against a template with structure and
dtype checks, and keeps a numbered history with a ``latest`` pointer so an
interrupted run continues from its last saved step.

Design notes (TPU-first): checkpoints are written from host copies
(jax.device_get) so saving never blocks device dispatch; restore places
leaves back with the template leaves' shardings, so a DP-replicated
TrainState restores replicated on the same mesh without extra code.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, List, Optional, Tuple

import jax
import numpy as np

_STEP_RE = re.compile(r"^ckpt_(\d+)\.npz$")


def save_pytree(path: str, tree: Any) -> None:
    """Serialize any pytree's leaves to one .npz (atomic rename)."""
    leaves = jax.device_get(jax.tree_util.tree_leaves(tree))
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore_pytree(path: str, template: Any) -> Any:
    """Rebuild a pytree from ``path`` using ``template``'s structure.

    Leaves come back with the template leaves' shardings (device_put), so a
    replicated-on-mesh state restores replicated. Shape/dtype mismatches
    raise with the offending leaf's index and path.
    """
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        if len(data.files) != len(leaves):
            raise ValueError(
                f"checkpoint {path} has {len(data.files)} leaves; "
                f"template has {len(leaves)}"
            )
        restored = []
        paths = jax.tree_util.tree_flatten_with_path(template)[0]
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            want_shape = np.shape(leaf)
            if tuple(arr.shape) != tuple(want_shape):
                keypath = jax.tree_util.keystr(paths[i][0])
                raise ValueError(
                    f"leaf {i} ({keypath}): checkpoint shape {arr.shape} != "
                    f"template shape {want_shape}"
                )
            if hasattr(leaf, "dtype"):
                if arr.dtype.kind == "V":
                    # extension dtypes (bfloat16, fp8) round-trip through
                    # npz as raw void bytes — bit-exact view back
                    arr = arr.view(leaf.dtype)
                else:
                    arr = arr.astype(leaf.dtype)
            if hasattr(leaf, "sharding"):
                restored.append(jax.device_put(arr, leaf.sharding))
            else:
                restored.append(arr)
    return jax.tree_util.tree_unflatten(treedef, restored)


class CheckpointManager:
    """Numbered checkpoint history in one directory.

    Layout::

        <dir>/ckpt_<step>.npz     one file per saved step
        <dir>/latest.json         {"step": N, "file": "ckpt_N.npz"}

    ``keep`` bounds history size (oldest deleted first; ``None`` = keep all).
    """

    def __init__(self, directory: str, keep: Optional[int] = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    # ------------------------------------------------------------------

    def _steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        pointer = os.path.join(self.directory, "latest.json")
        if os.path.exists(pointer):
            with open(pointer) as f:
                step = json.load(f)["step"]
            if os.path.exists(self._path(step)):
                return step
        steps = self._steps()
        return steps[-1] if steps else None

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}.npz")

    # ------------------------------------------------------------------

    def save(self, step: int, tree: Any) -> str:
        path = self._path(step)
        save_pytree(path, tree)
        pointer = os.path.join(self.directory, "latest.json")
        tmp = pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"step": int(step), "file": os.path.basename(path)}, f)
        os.replace(tmp, pointer)
        if self.keep is not None:
            for old in self._steps()[: -self.keep]:
                os.unlink(self._path(old))
        return path

    def restore(
        self, template: Any, step: Optional[int] = None
    ) -> Tuple[Any, int]:
        """Restore ``step`` (default: latest). Returns (tree, step)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints in {self.directory}"
                )
        return restore_pytree(self._path(step), template), step
