"""Scalar logging: TensorBoard (when available) + all_scalars.json export.

Parity with the reference's tensorboardX logging (lib/solver.py:90-92,
349-408): per-epoch train/val scalars under `<out>/tensorboard`, exported to
`all_scalars.json` at the end. tensorboardX is optional; the JSON export is
the source of truth.
"""

from __future__ import annotations

import json
import pathlib
from collections import defaultdict


class ScalarLogger:
    def __init__(self, output_dir: str | pathlib.Path, use_tensorboard: bool = True):
        self.output_dir = pathlib.Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        # tag -> list of (step, value)
        self.scalars: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self._writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(str(self.output_dir / "tensorboard"))
            except ImportError:
                pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self.scalars[tag].append((step, float(value)))
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def add_scalars(self, prefix: str, values: dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.add_scalar(f"{prefix}/{k}", v, step)

    def export(self) -> None:
        path = self.output_dir / "tensorboard" / "all_scalars.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.scalars, indent=2))

    def close(self) -> None:
        self.export()
        if self._writer is not None:
            self._writer.close()
