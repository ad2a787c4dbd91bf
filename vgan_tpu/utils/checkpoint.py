"""Full-train-state checkpointing (Orbax) for mid-training resume.

The reference persists only a generator ``state_dict`` at the very end of
``fit`` (/root/reference/src/vgan.py:339-350) and can restore only the
generator (vgan.py:142-158) — no optimizer state, no mid-training resume.
Here the COMPLETE train state (params, Adadelta square/acc averages, frozen
RBF bandwidth + its set-flag, encoder-active flag, RNG key) round-trips
through Orbax, so a 2000-epoch run resumes exactly where it stopped — the
"elastic recovery" story for this framework (SURVEY.md section 5): fail
fast, restart from the last checkpoint, bit-identical continuation.

Crash-safety layout: each save goes to a fresh ``ckpt_<n>/`` subdirectory
(state + meta.json written together), and only then is the ``LATEST``
pointer file atomically replaced; older checkpoint dirs are pruned after
the pointer moves. A crash at ANY point leaves ``LATEST`` referring to a
complete, self-consistent (state, meta) pair — state and metadata can
never be mixed across chunks (in-place overwrite had that window).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

_LATEST = "LATEST"


def _latest_dir(path: Path) -> Optional[Path]:
    """Resolve the current checkpoint dir: LATEST pointer, or the legacy
    in-place layout (state/ + meta.json directly under ``path``)."""
    pointer = path / _LATEST
    if pointer.is_file():
        name = pointer.read_text().strip()
        cand = path / name
        if (cand / "state").exists():
            return cand
    if (path / "state").exists():  # legacy (round-2 and earlier) layout
        return path
    return None


def save_train_state(path, state, meta: Optional[dict] = None) -> None:
    """Save a (NamedTuple pytree) train state + JSON metadata atomically."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    existing = [
        int(m.group(1))
        for m in (re.match(r"ckpt_(\d+)$", p.name) for p in path.iterdir())
        if m
    ]
    new_dir = path / f"ckpt_{max(existing, default=-1) + 1}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(new_dir / "state", state)
        ckptr.wait_until_finished()
    if meta is not None:
        (new_dir / "meta.json").write_text(json.dumps(meta))
    # atomic pointer flip: the checkpoint becomes visible only when complete
    fd, tmp = tempfile.mkstemp(dir=path, prefix=".latest-")
    with os.fdopen(fd, "w") as fh:
        fh.write(new_dir.name)
    os.replace(tmp, path / _LATEST)
    for idx in existing:
        shutil.rmtree(path / f"ckpt_{idx}", ignore_errors=True)


def restore_train_state(path, template) -> Any:
    """Restore into the structure of ``template`` (an abstract/real state)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    d = _latest_dir(path)
    if d is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), template
        )
        return ckptr.restore(d / "state", abstract)


def load_meta(path) -> Optional[dict]:
    d = _latest_dir(Path(path).absolute())
    if d is not None and (d / "meta.json").is_file():
        return json.loads((d / "meta.json").read_text())
    return None
