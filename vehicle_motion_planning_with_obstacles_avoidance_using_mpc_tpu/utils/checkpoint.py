"""Checkpoint / resume for long sweeps — the reference keeps trajectory
history only in Python lists and a GIF (src/closed_loop.py:339-343,
src/draw.py:451); here sweep state (arbitrary array pytrees: per-step
x/u/Ts/feasibility, obstacle state, RNG keys, progress counters) is saved
to .npz and restored exactly (SURVEY.md section 5 "Checkpoint / resume").
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_pytree(path: str, tree) -> str:
    """Save an array pytree to ``path`` (.npz + .json treedef sidecar).

    Leaves are converted to numpy; the treedef is serialized via
    ``jax.tree_util.tree_structure`` string plus key paths for safety.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    sidecar = _sidecar(path)
    with open(sidecar, "w") as f:
        json.dump({"treedef": _treedef_to_json(tree), "n": len(leaves)}, f)
    return path


def load_pytree(path: str):
    """Restore a pytree saved by :func:`save_pytree`."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    with open(_sidecar(path)) as f:
        meta = json.load(f)
    leaves = [npz[f"leaf_{i}"] for i in range(meta["n"])]
    skeleton = _json_to_skeleton(meta["treedef"], iter(range(meta["n"])))
    treedef = jax.tree_util.tree_structure(skeleton)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _sidecar(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".treedef.json"


def _treedef_to_json(tree):
    """JSON skeleton of the container structure (dicts/lists/tuples/
    namedtuples-as-dicts; leaves -> None)."""
    if isinstance(tree, dict):
        return {"t": "dict", "k": list(tree.keys()),
                "v": [_treedef_to_json(tree[k]) for k in tree.keys()]}
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # namedtuple
        return {"t": "dict", "k": list(tree._fields),
                "v": [_treedef_to_json(getattr(tree, f)) for f in tree._fields]}
    if isinstance(tree, (list, tuple)):
        return {"t": "list" if isinstance(tree, list) else "tuple",
                "v": [_treedef_to_json(x) for x in tree]}
    return None  # leaf


def _json_to_skeleton(node, counter):
    if node is None:
        return next(counter)
    if node["t"] == "dict":
        return {k: _json_to_skeleton(v, counter)
                for k, v in zip(node["k"], node["v"])}
    seq = [_json_to_skeleton(x, counter) for x in node["v"]]
    return seq if node["t"] == "list" else tuple(seq)


class SweepCheckpointer:
    """Periodic checkpointing for chunked scenario sweeps.

    Keeps ``keep`` most recent checkpoints in ``directory`` with a
    monotonically increasing step id; ``latest()`` resumes the last one.
    """

    def __init__(self, directory: str, keep: int = 3):
        self.dir = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"ckpt_{step:08d}.npz")

    def save(self, step: int, tree) -> str:
        p = self._path(step)
        save_pytree(p, tree)
        self._gc()
        return p

    def steps(self):
        out = []
        for fn in os.listdir(self.dir):
            if fn.startswith("ckpt_") and fn.endswith(".npz"):
                out.append(int(fn[5:-4]))
        return sorted(out)

    def latest(self):
        """(step, tree) of the newest checkpoint, or (None, None)."""
        ss = self.steps()
        if not ss:
            return None, None
        return ss[-1], load_pytree(self._path(ss[-1]))

    def _gc(self):
        ss = self.steps()
        for s in ss[: -self.keep]:
            for ext in (".npz", ".treedef.json"):
                p = os.path.join(self.dir, f"ckpt_{s:08d}{ext}")
                if os.path.exists(p):
                    os.remove(p)
