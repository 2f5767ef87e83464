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

    def load_latest(self, target):
        """Restore the newest checkpoint into ``target`` (a template pytree).

        Returns:
          ``(state, step)`` or ``(target, None)`` if nothing to restore.
        """
        ckpts = self._checkpoints()
        if not ckpts:
            return target, None
        step, path = ckpts[-1]
        with open(path, "rb") as f:
            state = flax.serialization.from_bytes(target, f.read())
        return state, step

    def load_tag(self, target, tag):
        path = os.path.join(self.root, f"{tag}.msgpack")
        if not os.path.exists(path):
            return target, None
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(target, f.read()), tag
