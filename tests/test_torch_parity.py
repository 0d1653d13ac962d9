"""Cross-framework parity checks against torch itself (CPU torch ships in
the image): BatchNorm semantics and the StepLR-equivalent schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TestBatchNormSemantics:
    """PointwiseMLP's BN must match torch.nn.BatchNorm2d over (B, H, W, C):
    normalization statistics, eps, momentum convention, and eval mode."""

    def run_pair(self, steps=3):
        import flax.linen as nn

        rng = np.random.default_rng(0)
        C = 5
        tbn = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
        fbn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)

        x0 = rng.normal(size=(2, C, 4, 6)).astype(np.float32)
        variables = fbn.init(jax.random.key(0), jnp.asarray(np.moveaxis(x0, 1, -1)))

        outs = []
        for s in range(steps):
            x = rng.normal(loc=s, scale=1 + s, size=(2, C, 4, 6)).astype(np.float32)
            with torch.no_grad():
                t_out = tbn(torch.from_numpy(x)).numpy()
            f_out, mutated = fbn.apply(
                variables, jnp.asarray(np.moveaxis(x, 1, -1)), mutable=["batch_stats"]
            )
            variables = {"params": variables.get("params", {}), **mutated}
            outs.append((t_out, np.moveaxis(np.asarray(f_out), -1, 1)))
        return tbn, variables, outs

    def test_train_outputs_match(self):
        _, _, outs = self.run_pair()
        for t_out, f_out in outs:
            np.testing.assert_allclose(t_out, f_out, rtol=1e-4, atol=1e-5)

    def test_running_mean_matches(self):
        tbn, variables, _ = self.run_pair()
        np.testing.assert_allclose(
            tbn.running_mean.numpy(),
            np.asarray(variables["batch_stats"]["mean"]),
            rtol=1e-4, atol=1e-5,
        )

    def test_running_var_documented_difference(self):
        # torch updates running_var with the UNBIASED batch variance, flax
        # with the biased one — a documented deviation; for the 48-element
        # batches here the ratio is n/(n-1) = 48/47
        tbn, variables, _ = self.run_pair(steps=1)
        t_var = tbn.running_var.numpy()
        f_var = np.asarray(variables["batch_stats"]["var"])
        # remove the init contribution (0.9 * 1.0) before comparing the rest
        n = 2 * 4 * 6
        np.testing.assert_allclose(
            (t_var - 0.9) * (n - 1) / n, f_var - 0.9, rtol=1e-3, atol=1e-5
        )

    def test_eval_mode_uses_running_stats(self):
        import flax.linen as nn

        rng = np.random.default_rng(1)
        tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
        tbn.running_mean += torch.tensor([1.0, 2.0, 3.0])
        tbn.eval()
        fbn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
        variables = {
            "params": {"scale": jnp.ones(3), "bias": jnp.zeros(3)},
            "batch_stats": {"mean": jnp.asarray([1.0, 2.0, 3.0]), "var": jnp.ones(3)},
        }
        x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
        with torch.no_grad():
            t_out = tbn(torch.from_numpy(x)).numpy()
        f_out = fbn.apply(variables, jnp.asarray(np.moveaxis(x, 1, -1)))
        np.testing.assert_allclose(
            t_out, np.moveaxis(np.asarray(f_out), -1, 1), rtol=1e-4, atol=1e-5
        )


class TestStepLRSchedule:
    def test_matches_torch_steplr(self):
        from pointnet2_scannet_tpu.engine.train_state import make_lr_schedule

        lr, ds, df, spe = 1e-3, 100, 0.7, 37  # reference defaults, 37 it/epoch
        sched = make_lr_schedule(lr, ds, df, spe)

        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=lr)
        tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=ds, gamma=df)

        for epoch in range(350):
            torch_lr = opt.param_groups[0]["lr"]
            ours = float(sched(epoch * spe))  # lr at the epoch's first step
            np.testing.assert_allclose(ours, torch_lr, rtol=1e-6), epoch
            tsched.step()
