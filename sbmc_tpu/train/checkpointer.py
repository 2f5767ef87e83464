"""Checkpoint save/restore with a JSON meta blob.

Plays the role of ``ttools.Checkpointer`` in the reference (SURVEY.md §5):
model/optimizer state plus a ``meta`` dict (model_params, kpcn_mode,
data_params) so inference can reconstruct the exact model and dataset
configuration with no flags (reference: scripts/train.py:84-94,
scripts/denoise.py:107-123). State is serialized with flax msgpack.
"""

import json
import os
import re

import flax.serialization

__all__ = ["Checkpointer"]

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


class Checkpointer:
    """Saves/loads pytree state under a directory, keeping the latest N.

    Args:
      root: checkpoint directory (created on first save).
      meta: optional JSON-serializable dict persisted alongside checkpoints.
      max_files: number of rolling checkpoints to keep (persistent saves via
        ``tag`` are never deleted).
    """

    META_FILE = "meta.json"

    def __init__(self, root, meta=None, max_files=3):
        self.root = root
        self.max_files = max_files
        if meta is not None:
            os.makedirs(root, exist_ok=True)
            with open(os.path.join(root, self.META_FILE), "w") as f:
                json.dump(meta, f, indent=2, default=str)

    @staticmethod
    def load_meta(root):
        with open(os.path.join(root, Checkpointer.META_FILE)) as f:
            return json.load(f)

    def _checkpoints(self):
        if not os.path.isdir(self.root):
            return []
        found = []
        for f in os.listdir(self.root):
            m = _CKPT_RE.match(f)
            if m:
                found.append((int(m.group(1)), os.path.join(self.root, f)))
        return sorted(found)

    def save(self, state, step, tag=None):
        """Serialize ``state`` (a pytree) at ``step``.

        Args:
          tag: if given, also write an untracked named copy (e.g. "final").
        """
        os.makedirs(self.root, exist_ok=True)
        blob = flax.serialization.to_bytes(state)
        path = os.path.join(self.root, f"ckpt_{step:09d}.msgpack")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        if tag is not None:
            with open(os.path.join(self.root, f"{tag}.msgpack"), "wb") as f:
                f.write(blob)
        # Rotate.
        ckpts = self._checkpoints()
        while len(ckpts) > self.max_files:
            _, old = ckpts.pop(0)
            os.remove(old)
        return path

    @staticmethod
    def _check_compat(target, restored, path=()):
        """flax ``from_bytes`` silently drops extra keys and adopts foreign
        shapes; enforce exact structural + shape agreement instead."""
        import numpy as np
        t_state = flax.serialization.to_state_dict(target)
        r_state = restored

        def rec(t, r, p):
            if isinstance(t, dict) or isinstance(r, dict):
                t_keys = set(t.keys()) if isinstance(t, dict) else set()
                r_keys = set(r.keys()) if isinstance(r, dict) else set()
                if t_keys != r_keys:
                    raise ValueError(
                        "checkpoint does not match the model at %s: "
                        "missing %s, unexpected %s" %
                        ("/".join(p) or "<root>",
                         sorted(t_keys - r_keys), sorted(r_keys - t_keys)))
                for k in t_keys:
                    rec(t[k], r[k], p + (k,))
            else:
                ts, rs = np.shape(t), np.shape(r)
                if ts != rs:
                    raise ValueError(
                        "checkpoint shape mismatch at %s: model %s vs "
                        "checkpoint %s" % ("/".join(p), ts, rs))

        rec(t_state, r_state, path)

    def _load(self, target, path):
        with open(path, "rb") as f:
            blob = f.read()
        restored = flax.serialization.msgpack_restore(blob)
        self._check_compat(target, restored)
        return flax.serialization.from_bytes(target, blob)

    def load_latest(self, target):
        """Restore the newest checkpoint into ``target`` (a template pytree).

        Raises ``ValueError`` if the stored tree does not exactly match the
        target's structure and shapes.

        Returns:
          ``(state, step)`` or ``(target, None)`` if nothing to restore.
        """
        ckpts = self._checkpoints()
        if not ckpts:
            return target, None
        step, path = ckpts[-1]
        return self._load(target, path), step

    def load_tag(self, target, tag):
        path = os.path.join(self.root, f"{tag}.msgpack")
        if not os.path.exists(path):
            return target, None
        return self._load(target, path), tag
