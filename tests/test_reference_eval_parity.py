"""FULL-STACK whole-scene eval parity vs the reference's own eval loop.

Round 3 pinned every eval stage separately: metric functions vs
/root/reference/scripts/eval.py:40-124 run in-process, the model forward
vs the reference torch stack (tests/test_model_parity.py), and the
whole-scene dataset semantics. This test ties the STACK together: the
reference's actual `eval_wholescene` loop (scripts/eval.py:126-172 —
per-scene chunked forward, string-hash dedup, acc/miou families) runs
end-to-end against this framework's WholeSceneEvaluator (packed
cross-scene batches, descriptor-dispatch device ring, fused native
metrics, masked aggregation) on IDENTICAL inputs, and the reports must
match.

Identical inputs: the reference `ScannetDatasetWholeScene` resamples
every column with global np.random draws (lib/dataset.py:335), so its
emitted columns are captured ONCE (via its own collate_wholescene) and
injected into our evaluator as a dataset stub whose column indices are
recovered by exact-f32-coordinate lookup — asserted to reproduce the
reference's column tensors bit-for-bit before any model runs.

Two tiers:
  - EXACT: a coordinate-deterministic stub model implemented identically
    in torch and jnp (fat one-hot margins — argmax can never flip on
    accumulation order) on voxel-pure jittered-grid scenes (>=0.075
    per-axis separation: no two points share a 0.02 surface voxel;
    duplicate rows only from within-column resampling, which carries
    identical pred/target — see _grid_scene's invariants). Every
    per-scene metric and the aggregated report must match the reference
    loop to 5e-9 (the stacks' equivalent metric formulas differ only in
    accumulation order, measured 1e-11..1e-9) — any pipeline bug (batch
    packing, descriptor gathers, padding, dedup, aggregation) shows up at
    >= 1e-4.
  - REAL MODEL: the reference torch Pointnet2SSG and this framework's
    flax model carrying the SAME converted weights (models/convert.py),
    both forwards in f64. In f32 the stacks' ~1e-4 accumulated logit
    drift flips argmax on the near-ties an UNTRAINED model is dense with
    (measured 97.9% agreement); in f64 the drift is ~1e-12, no tie is
    that close, and the preds — and therefore the metric reports — must
    match exactly (same 5e-9 gate as the stub tier).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.engine.evaluator import WholeSceneEvaluator
from pointnet2_scannet_tpu.models.convert import convert_torch_pointnet2

torch = pytest.importorskip("torch")

from tests.test_reference_metrics_parity import _install_shims  # noqa: E402
from tests.torch_ref import load_reference_modules  # noqa: E402

pytestmark = pytest.mark.slow

NP_COL = 2048  # npoints per tiled column (reference default is 8192)
N_SCENE = 6000
BATCH = 8


def _grid_scene(rng: np.random.Generator, n: int = N_SCENE) -> np.ndarray:
    """(n, 11) reference-layout scene on a JITTERED 0.1m grid.

    Construction invariants (each kills one source of legitimate
    cross-stack divergence, leaving any report mismatch a pipeline bug):
      - unique cells + jitter -> unique coords, and no two geometric
        distances are exactly (or near-)tied, so f64 forwards cannot
        diverge on formulation last-bits;
      - >=0.075 per-axis separation -> every 0.02 surface voxel holds one
        distinct coord (voxel representative choice can never matter);
      - row 0 is an exact (0.05, 0.05, 0.05) anchor (cell (0,0,0) reserved
        for it) pinning coordmin, and the jitter range [0.011, 0.036]
        keeps every point > 0.01 from the 1.5m column planes at
        coordmin + k*1.5 (lib/dataset.py:329 masks with a +-0.01 band), so
        each point tiles into exactly ONE column and cross-column
        duplicate preds cannot exist.
    Labels are a deterministic hash of the cell.
    """
    cells = rng.choice(45 * 45 * 7 - 1, size=n - 1, replace=False) + 1
    cx, cy, cz = cells // (45 * 7), (cells // 7) % 45, cells % 7
    cx = np.concatenate([[0], cx])
    cy = np.concatenate([[0], cy])
    cz = np.concatenate([[0], cz])
    jit = rng.uniform(0.011, 0.036, (n, 3)).astype(np.float32)
    jit[0] = 0.0  # the coordmin anchor sits exactly on its cell origin
    arr = np.zeros((n, 11), np.float32)
    arr[:, 0] = cx * 0.1 + 0.05 + jit[:, 0]
    arr[:, 1] = cy * 0.1 + 0.05 + jit[:, 1]
    arr[:, 2] = cz * 0.1 + 0.05 + jit[:, 2]
    arr[:, 3:6] = rng.uniform(0, 255, (n, 3))
    arr[:, 6:9] = rng.normal(size=(n, 3))
    arr[:, 10] = (cx * 13 + cy * 17 + cz * 19) % 20
    return arr


class _InjectedWholeScene:
    """WholeSceneDataset stub feeding the evaluator the EXACT columns the
    reference dataset emitted (data/wholescene.py iter_scenes_indexed
    contract: feats_all + per-column resample indices)."""

    def __init__(self, scenes, input_channels=0):
        # scenes: list of (sid, feats_all (n,3+C) f32, col_idx (S,NP) i32,
        #                  labels (S,NP) i32, weights (S,NP) f32)
        self._scenes = scenes
        self.cfg = SimpleNamespace(input_channels=input_channels, npoints=NP_COL)

    def __len__(self):
        return len(self._scenes)

    def max_points(self):
        return max(s[1].shape[0] for s in self._scenes)

    def estimate_columns(self):
        return [s[2].shape[0] for s in self._scenes]

    def iter_scenes_indexed(self):
        for sid, feats_all, col_idx, labels, weights in self._scenes:
            yield sid, (feats_all, col_idx, labels, weights)


def _make_capture(tmp_path_factory, use_multiview: bool):
    """Capture the reference dataset's emitted columns + injection arrays."""
    scene_dir = tmp_path_factory.mktemp("eval_parity_scenes")
    rng = np.random.default_rng(42)
    scene_arrays = {}
    mv_arrays = {}
    for i in range(3):
        sid = f"scene{i:04d}_00"
        scene_arrays[sid] = _grid_scene(rng)
        np.save(scene_dir / f"{sid}.npy", scene_arrays[sid])
        if use_multiview:
            mv_arrays[sid] = rng.normal(size=(N_SCENE, 128)).astype(np.float32)

    _install_shims(str(scene_dir))
    import importlib.util
    import pathlib

    # lib.dataset may already be imported by another parity test with ITS
    # scene dir baked into the CONF object it holds — mutate that object
    import lib.dataset as ref_dataset

    ref_dataset.CONF.SCANNETV2_FILE = str(scene_dir) + "/{}.npy"
    ref_dataset.CONF.NUM_CLASSES = 20
    if use_multiview:
        import h5py

        mv_path = str(scene_dir / "mv.hdf5")
        with h5py.File(mv_path, "w") as f:
            for sid, feats in mv_arrays.items():
                f.create_dataset(sid, data=feats)
        ref_dataset.CONF.MULTIVIEW = mv_path

    spec = importlib.util.spec_from_file_location(
        "ref_eval_fullstack", pathlib.Path("/root/reference/scripts/eval.py")
    )
    ref_eval = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_eval)

    scene_ids = sorted(scene_arrays)
    np.random.seed(20260819)  # the reference resamples from global np.random
    ds = ref_dataset.ScannetDatasetWholeScene(
        scene_ids, npoints=NP_COL, is_weighting=True,
        use_color=False, use_normal=False, use_multiview=use_multiview,
    )
    batches = [ref_dataset.collate_wholescene([ds[i]]) for i in range(len(scene_ids))]

    injected = []
    for i, sid in enumerate(scene_ids):
        coords_t, feats_t, segs_t, weights_t, _ = batches[i]
        pts = coords_t.numpy()[0]  # (S, NP, 3) f32
        xyz_all = scene_arrays[sid][:, :3]  # f32, rows gathered unchanged
        feats_all = (
            np.concatenate([xyz_all, mv_arrays[sid]], axis=1)
            if use_multiview
            else xyz_all
        ).astype(np.float32)
        lookup = {xyz_all[j].tobytes(): j for j in range(xyz_all.shape[0])}
        col_idx = np.empty(pts.shape[:2], np.int32)
        flat = pts.reshape(-1, 3)
        for k in range(flat.shape[0]):
            col_idx.reshape(-1)[k] = lookup[flat[k].tobytes()]
        # the recovered indices must reproduce the reference's columns —
        # EVERY channel — bit-for-bit, or the identical-inputs premise
        # is void
        assert np.array_equal(feats_all[col_idx][..., :3], pts)
        if use_multiview:
            assert np.array_equal(feats_all[col_idx][..., 3:], feats_t.numpy()[0])
        injected.append(
            (
                sid,
                feats_all,
                col_idx,
                segs_t.numpy()[0].astype(np.int32),
                weights_t.numpy()[0].astype(np.float32),
            )
        )
    return ref_eval, batches, injected, scene_ids


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """xyz-only capture shared by the stub and converted-model tiers."""
    return _make_capture(tmp_path_factory, use_multiview=False)


@pytest.fixture(scope="module")
def capture_mv(tmp_path_factory):
    """131-channel (xyz + 128 multiview) capture — the eval shape of the
    reference's 65.75-mIoU recipe (reference README.md:11)."""
    return _make_capture(tmp_path_factory, use_multiview=True)


def _patch_cuda(monkeypatch):
    # eval_one_batch calls .cuda() on every tensor (scripts/eval.py:129)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


class _TorchStub(torch.nn.Module):
    def forward(self, pc):  # (B, N, 3) -> (B, N, 20)
        cell = torch.round((pc[..., :3] - 0.05) * 10.0).long()
        h = cell[..., 0] * 7919 + cell[..., 1] * 104729 + cell[..., 2] * 331
        return torch.nn.functional.one_hot(h % 20, 20).float() * 8.0


def _stub_apply(variables, pts, train=False):
    cell = jnp.round((pts[..., :3] - 0.05) * 10.0).astype(jnp.int32)
    h = cell[..., 0] * 7919 + cell[..., 1] * 104729 + cell[..., 2] * 331
    return jax.nn.one_hot(h % 20, 20) * 8.0


def _run_reference(ref_eval, model, batches, batch_size=BATCH):
    args = SimpleNamespace(batch_size=batch_size)
    model.eval()
    with torch.no_grad():
        return ref_eval.eval_wholescene(args, model, batches)


def _ref_aggregate(ref_out):
    """scripts/eval.py:194-206 verbatim on eval_wholescene's outputs."""
    (pa_list, pa_pc, va_list, va_pc, cali_list, pm_pc, vm_pc, masks) = ref_out
    avg_pa_pc = np.sum(pa_pc * masks, axis=0) / np.sum(masks, axis=0)
    avg_va_pc = np.sum(va_pc * masks, axis=0) / np.sum(masks, axis=0)
    avg_pm_pc = np.sum(pm_pc * masks, axis=0) / np.sum(masks, axis=0)
    avg_vm_pc = np.sum(vm_pc * masks, axis=0) / np.sum(masks, axis=0)
    return dict(
        point_acc=np.mean(pa_list),
        point_acc_per_class=np.mean(avg_pa_pc),
        voxel_acc=np.mean(va_list),
        voxel_acc_per_class=np.mean(avg_va_pc),
        voxel_cali_acc=np.mean(cali_list),
        point_miou=np.mean(avg_pm_pc),
        voxel_miou=np.mean(avg_vm_pc),
        per_class_point_miou=avg_pm_pc,
        per_class_voxel_miou=avg_vm_pc,
    )


def _run_ours(apply_fn, variables, injected, scene_preds_out=None,
              input_channels=0):
    ev = WholeSceneEvaluator(apply_fn, variables, batch_size=BATCH)
    ds = _InjectedWholeScene(injected, input_channels=input_channels)

    def scene_fn(sid, coords, labels, weights, preds):
        if scene_preds_out is not None:
            scene_preds_out[sid] = preds.copy()
        return ev._metrics_for(sid, coords, labels, weights, preds)

    results = ev.map_scenes(ds, scene_fn)
    return results, ev.aggregate(results)


def _assert_scene_metrics(ref_out, results, *, exact: bool):
    (pa_list, pa_pc, va_list, va_pc, cali_list, pm_pc, vm_pc, masks) = ref_out
    # "exact" = 5e-9: the two stacks compute equivalent metric formulas with
    # different accumulation order (measured residual 1e-11..1e-9, largest on
    # the f32-weighted voxel_cali_acc average); any REAL pipeline defect (a
    # mispacked column, one flipped pred) moves a metric by >= 1/count ~ 1e-4,
    # five orders above the gate
    tol = dict(atol=5e-9, rtol=0.0) if exact else dict(atol=0.05, rtol=0.0)
    stol = dict(atol=5e-9, rtol=0.0) if exact else dict(atol=0.02, rtol=0.0)
    for i, r in enumerate(results):
        np.testing.assert_allclose(r.point_acc, pa_list[i], **stol)
        np.testing.assert_allclose(r.voxel_acc, va_list[i], **stol)
        np.testing.assert_allclose(r.voxel_cali_acc, cali_list[i], **stol)
        np.testing.assert_allclose(r.point_acc_per_class, pa_pc[i], **tol)
        np.testing.assert_allclose(r.voxel_acc_per_class, va_pc[i], **tol)
        np.testing.assert_allclose(r.point_miou, pm_pc[i], **tol)
        np.testing.assert_allclose(r.voxel_miou, vm_pc[i], **tol)
        np.testing.assert_array_equal(r.acc_mask, masks[i])


def _assert_report(ref_agg, report, *, exact: bool):
    stol = dict(atol=5e-9, rtol=0.0) if exact else dict(atol=0.02, rtol=0.0)
    for key in (
        "point_acc", "point_acc_per_class", "voxel_acc",
        "voxel_acc_per_class", "voxel_cali_acc", "point_miou", "voxel_miou",
    ):
        np.testing.assert_allclose(
            getattr(report, key), ref_agg[key], err_msg=key, **stol
        )


def test_fullstack_exact_with_deterministic_model(capture, monkeypatch):
    """Stub-model tier: the full pipelines must agree EXACTLY."""
    ref_eval, batches, injected, _ = capture
    _patch_cuda(monkeypatch)
    ref_out = _run_reference(ref_eval, _TorchStub(), batches)
    results, report = _run_ours(_stub_apply, {}, injected)
    _assert_scene_metrics(ref_out, results, exact=True)
    _assert_report(_ref_aggregate(ref_out), report, exact=True)


def _converted_model_tier(cap, monkeypatch, *, is_msg, input_channels):
    """Real-model tier: reference torch SSG/MSG vs converted flax weights.

    Both forwards run in f64 (inputs stay the captured f32 values,
    bit-identically widened on each side), so the only admissible pred
    difference is an exact f64 logit tie — and the op layer's index
    contracts (tie-breaks included) are already pinned exactly, so preds
    must be EQUAL and the reports match at the exact-tier gate."""
    ref_eval, batches, injected, scene_ids = cap
    _patch_cuda(monkeypatch)

    mods = load_reference_modules()
    torch.manual_seed(0)
    tmodel = mods["semseg"].get_model(
        num_classes=20, is_msg=is_msg, input_channels=input_channels,
        use_xyz=True, bn=True,
    )
    spec = (models.msg_spec if is_msg else models.ssg_spec)(20, input_channels)
    fmodel = models.PointNet2SemSeg(spec=spec)
    variables_np = convert_torch_pointnet2(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}, spec
    )
    tmodel = tmodel.double()

    # record the reference loop's per-scene preds without a second forward,
    # widening its inputs to f64 on the way in
    ref_preds: dict[str, np.ndarray] = {}
    real_forward = ref_eval.forward

    def recording_forward(args, model, coords, feats):
        out = real_forward(args, model, coords.double(), feats.double())
        sid = scene_ids[len(ref_preds)]
        ref_preds[sid] = out.squeeze(0).numpy().astype(np.int64)
        return out

    monkeypatch.setattr(ref_eval, "forward", recording_forward)
    ref_out = _run_reference(ref_eval, tmodel, batches)
    assert len(ref_preds) == len(scene_ids)

    import contextlib

    @contextlib.contextmanager
    def enable_x64():  # repo-standard pattern (tests/test_trajectory_parity.py:52)
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    our_preds: dict[str, np.ndarray] = {}
    with enable_x64():
        variables = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, np.float64)), variables_np
        )
        results, report = _run_ours(
            lambda v, x, train=False: fmodel.apply(
                v, x.astype(jnp.float64), train=False
            ),
            variables,
            injected,
            scene_preds_out=our_preds,
            input_channels=input_channels,
        )

    for sid in scene_ids:
        agree = np.mean(ref_preds[sid] == our_preds[sid])
        assert agree == 1.0, f"{sid}: pred agreement {agree:.6f}"

    _assert_scene_metrics(ref_out, results, exact=True)
    _assert_report(_ref_aggregate(ref_out), report, exact=True)


@pytest.mark.parametrize("is_msg", [False, True], ids=["ssg", "msg"])
def test_fullstack_converted_model(capture, monkeypatch, is_msg):
    _converted_model_tier(capture, monkeypatch, is_msg=is_msg, input_channels=0)


@pytest.mark.parametrize("is_msg", [False, True], ids=["ssg", "msg"])
def test_fullstack_converted_multiview(capture_mv, monkeypatch, is_msg):
    """131-channel (xyz + 128 ENet features) eval column shape. SSG is the
    reference's 65.75-mIoU multiview recipe (reference README.md:11); MSG is
    its best published config at 67.60 mIoU (reference README.md:12,
    pointnet2/pointnet2_semseg.py:25-103)."""
    _converted_model_tier(
        capture_mv, monkeypatch, is_msg=is_msg, input_channels=128
    )
