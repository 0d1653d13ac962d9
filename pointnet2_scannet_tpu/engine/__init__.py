"""Training/eval engine: loss, metrics, functional train step, solver."""

from pointnet2_scannet_tpu.engine.loss import weighted_cross_entropy
from pointnet2_scannet_tpu.engine.metrics import (
    compute_acc,
    compute_miou,
    compute_scene_metrics,
    filter_points,
    confusion_matrix,
    confusion_to_point_metrics,
)
from pointnet2_scannet_tpu.engine.train_state import TrainState, create_train_state
from pointnet2_scannet_tpu.engine.solver import Solver
from pointnet2_scannet_tpu.engine.export import (
    ServingPredictor,
    export_forward,
    export_run,
    load_exported,
    run_kind,
    save_exported,
)

__all__ = [
    "weighted_cross_entropy",
    "compute_acc",
    "compute_miou",
    "compute_scene_metrics",
    "filter_points",
    "confusion_matrix",
    "confusion_to_point_metrics",
    "TrainState",
    "create_train_state",
    "Solver",
    "ServingPredictor",
    "export_forward",
    "export_run",
    "load_exported",
    "run_kind",
    "save_exported",
]
