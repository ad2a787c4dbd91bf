"""Full-train-state checkpointing (Orbax) for mid-training resume.

The reference persists only a generator ``state_dict`` at the very end of
``fit`` (/root/reference/src/vgan.py:339-350) and can restore only the
generator (vgan.py:142-158) — no optimizer state, no mid-training resume.
Here the COMPLETE train state (params, Adadelta square/acc averages, frozen
RBF bandwidth + its set-flag, encoder-active flag, RNG key) round-trips
through Orbax, so a 2000-epoch run resumes exactly where it stopped — the
"elastic recovery" story for this framework (SURVEY.md section 5): fail
fast, restart from the last checkpoint, bit-identical continuation.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def save_train_state(path, state, meta: Optional[dict] = None) -> None:
    """Save a (NamedTuple pytree) train state + JSON metadata."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        # force: periodic auto-checkpointing overwrites the previous save
        ckptr.save(path / "state", state, force=True)
        ckptr.wait_until_finished()
    if meta is not None:
        (path / "meta.json").write_text(json.dumps(meta))


def restore_train_state(path, template) -> Any:
    """Restore into the structure of ``template`` (an abstract/real state)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), template
        )
        return ckptr.restore(path / "state", abstract)


def load_meta(path) -> Optional[dict]:
    meta_path = Path(path) / "meta.json"
    if meta_path.is_file():
        return json.loads(meta_path.read_text())
    return None
