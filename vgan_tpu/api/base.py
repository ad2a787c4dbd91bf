"""Shared estimator plumbing: history artifacts, snapshots, persistence.

Workflow-parity with the reference's artifact layout
(/root/reference/src/vgan.py:80-157): ``<dir>/train_history/
generator_loss_<run>.csv``, ``<dir>/params.csv`` (upsert keyed by run
number), ``<dir>/train_history.pdf`` loss curve, ``<dir>/models/`` weights.
Divergences (documented, deliberate):

- weights are stored as Flax msgpack (``generator_<run>.msgpack``) instead of
  torch ``.pt``; ``load_models`` accepts BOTH (a ``.pt`` path routes through
  the torch-checkpoint importer) so reference-trained generators migrate
  drop-in;
- the reference's save path writes the *generator* state to
  ``detector_<run>.pt`` (vgan.py:346-349) and can crash when the parent dir
  exists without ``models/`` (vgan.py:341-344) — both bugs are fixed, not
  replicated;
- full-train-state checkpointing (params + Adadelta state + bandwidth +
  epoch + RNG key) for mid-training resume is provided via
  :mod:`vgan_tpu.utils.checkpoint`, a capability the reference lacks.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from pathlib import Path
from typing import Optional

import numpy as np


class EstimatorBase:
    """Common history/snapshot/persistence behavior for both estimators."""

    def __init__(self, path_to_directory=None):
        self.train_history = defaultdict(list)
        self.path_to_directory = path_to_directory
        self.generator_optimizer = None
        self.seed: Optional[int] = None

    # -- parity surface -----------------------------------------------------

    def get_params(self) -> dict:
        """Hyperparameter dict, same keys as the reference (vgan.py:101-109)."""
        return {
            "batch size": self.batch_size,
            "epochs": self.epochs,
            "lr_g": self._lr_g,
            "momentum": self.momentum,
            "weight decay": self.weight_decay,
            "batch_size": self.batch_size,
            "seed": self.seed,
            "generator optimizer": self.generator_optimizer,
        }

    def model_snapshot(self, path_to_directory=None, run_number=0, show=False):
        """Persist training artifacts (vgan.py:111-140 semantics).

        Writes the per-epoch generator-loss CSV, upserts ``params.csv`` by
        run number, and renders the loss-curve PDF.
        """
        import pandas as pd

        if path_to_directory is None:
            path_to_directory = self.path_to_directory
        path_to_directory = Path(path_to_directory)
        path_to_directory.mkdir(parents=True, exist_ok=True)
        (path_to_directory / "train_history").mkdir(exist_ok=True)

        pd.DataFrame(self.train_history["generator_loss"]).to_csv(
            path_to_directory / "train_history" / f"generator_loss_{run_number}.csv",
            header=False,
            index=False,
        )
        params_path = path_to_directory / "params.csv"
        if not params_path.is_file():
            pd.DataFrame(self.get_params(), [run_number]).to_csv(params_path)
        else:
            params = pd.read_csv(params_path, index_col=0)
            params_new = pd.DataFrame(self.get_params(), [run_number])
            params = params.reindex(params.index.union(params_new.index))
            params.update(params_new)
            params.to_csv(params_path)
        self._plot_loss(path_to_directory, show=show)

    def _plot_loss(self, path_to_directory, show=False):
        """Loss-curve PDF, reference styling (vgan.py:80-99)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.style.use("ggplot")
        generator_y = self.train_history["generator_loss"]
        x = np.linspace(1, len(generator_y), len(generator_y))
        fig, ax = plt.subplots()
        ax.plot(x, generator_y, color="cornflowerblue", label="Generator loss", linewidth=2)
        if self.train_history.get("detector_loss"):
            ax.plot(
                x,
                self.train_history["detector_loss"],
                color="black",
                label="Detector loss",
                linewidth=2,
            )
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        ax.legend(loc="upper right")
        plt.savefig(Path(path_to_directory) / "train_history.pdf", format="pdf", dpi=1200)
        plt.close(fig)
        if show:
            # reference parity (vgan.py:98-99, message quoted verbatim)
            print("The show option has been depricated due to lack of utility")

    def _log_metrics_jsonl(self, wall_seconds: float) -> None:
        """Structured JSONL metrics next to the CSV artifacts (see
        vgan_tpu.utils.metrics); written when an artifact directory is set."""
        if self.path_to_directory is None:
            return
        from vgan_tpu.utils.metrics import MetricsLogger

        path = Path(self.path_to_directory) / "metrics.jsonl"
        with MetricsLogger(path) as ml:
            ml.log(
                "fit",
                estimator=type(self).__name__,
                wall_seconds=wall_seconds,
                epochs=len(self.train_history["generator_loss"]),
                params={k: str(v) for k, v in self.get_params().items()},
            )
            keys = [k for k, v in self.train_history.items() if v]
            for i in range(len(self.train_history["generator_loss"])):
                ml.log("epoch", epoch=i,
                       **{k: self.train_history[k][i] for k in keys})

    # -- weight persistence -------------------------------------------------

    def _save_generator(self, models_dir: Path, run_number: int, params) -> Path:
        from flax import serialization

        models_dir.mkdir(parents=True, exist_ok=True)
        path = models_dir / f"generator_{run_number}.msgpack"
        path.write_bytes(serialization.to_bytes(params))
        return path

    def _save_detector(self, models_dir: Path, run_number: int, params) -> Path:
        from flax import serialization

        models_dir.mkdir(parents=True, exist_ok=True)
        path = models_dir / f"detector_{run_number}.msgpack"
        path.write_bytes(serialization.to_bytes(params))
        return path

    @staticmethod
    def _count_runs(models_dir: Path, files_per_run: int) -> int:
        """Next free run number: one past the highest existing generator
        index. (The reference divides the raw file count by files-per-run,
        vgan.py:341-345 — that overwrites existing runs whenever foreign
        files or the two estimator classes share one directory, so we scan
        the actual indices instead; documented divergence.)"""
        del files_per_run
        if not models_dir.exists():
            return 0
        best = -1
        for name in os.listdir(models_dir):
            m = re.match(r"generator_(\d+)\.(msgpack|pt)$", name)
            if m:
                best = max(best, int(m.group(1)))
        return best + 1

    @staticmethod
    def _load_params_file(path, template):
        """Load generator params from msgpack (native) or .pt (torch import)."""
        path = Path(path)
        if path.suffix == ".pt":
            from vgan_tpu.models.torch_import import load_torch_generator_params

            return load_torch_generator_params(path)
        from flax import serialization

        return serialization.from_bytes(template, path.read_bytes())
