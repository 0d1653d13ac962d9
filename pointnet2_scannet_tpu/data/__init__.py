"""Host-side data pipeline: scene store, chunk sampler, whole-scene tiler.

All producers emit fixed-shape numpy arrays — (B, npoints, 3 + C) features,
(B, npoints) int32 labels, (B, npoints) float32 per-point weights — ready for
a single host->device transfer per step.
"""

from pointnet2_scannet_tpu.data.scene_store import (
    SceneStore,
    compute_label_weights,
    assemble_features,
)
from pointnet2_scannet_tpu.data.chunks import ChunkedSceneDataset
from pointnet2_scannet_tpu.data.wholescene import WholeSceneDataset
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_scene
from pointnet2_scannet_tpu.data.pipeline import BatchLoader, prefetch_to_device
from pointnet2_scannet_tpu.data.resident import (
    ResidentBatchLoader,
    flatten_store,
    materialize_batch,
    store_nbytes,
)

__all__ = [
    "ResidentBatchLoader",
    "flatten_store",
    "materialize_batch",
    "store_nbytes",
    "SceneStore",
    "compute_label_weights",
    "assemble_features",
    "ChunkedSceneDataset",
    "WholeSceneDataset",
    "make_synthetic_scene",
    "BatchLoader",
    "prefetch_to_device",
]
