"""Checkpoint save/load/management.

The reference's checkpoint story is torch.load + strict=False merging
(SURVEY.md §5: unet_3d_edit_bkfill.py:578-682, run_edit.py:104-114) plus a
keep-N-newest helper (src/utils/util.py:35-48). Here:
- orbax for production checkpoints (async-capable, sharding-aware),
- flat .npz as the torch-free interchange format (weights/convert.py),
- keep_latest pruning matching delete_additional_ckpt semantics.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax


def save_orbax(tree: Any, path: str) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def keep_latest(ckpt_dir: str, n_keep: int = 2,
                pattern: str = r"checkpoint-(\d+)") -> None:
    """Prune old checkpoint-<step> dirs, keep the n newest
    (src/utils/util.py:35-48 semantics)."""
    if not os.path.isdir(ckpt_dir):
        return
    entries = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(pattern, name)
        if m:
            entries.append((int(m.group(1)), name))
    entries.sort()
    for _, name in entries[:-n_keep] if n_keep else entries:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
