"""End-to-end training tests on synthetic scenes: losses decrease, the
Kabsch head recovers the ego transform, the temporal step runs, and the
8-fake-device data-parallel step matches single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmflow_tpu.data.synthetic import make_scene
from cmflow_tpu.data.vod import (
    VOD_CAMERA_PROJECTION,
    VOD_T_CAMERA_RADAR,
    decode_sample,
)
from cmflow_tpu.models import build_model
from cmflow_tpu.parallel import mesh as meshlib
from cmflow_tpu.train import steps as steplib
from cmflow_tpu.train.state import create_train_state, make_optimizer


def synth_batch(seed, b=4, n=64, partition="train"):
    """A batch of decoded synthetic training samples."""
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(b):
        raw = make_scene(rng, n1=n + 16, n2=n + 16, moving_fraction=0.25)
        samples.append(
            decode_sample(raw, partition, eval_mode=False, num_points=n,
                          rng=rng)
        )
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    batch.pop("valid1"), batch.pop("valid2")
    return {k: jnp.asarray(v) for k, v in batch.items()}


def init_state(model, model_name, batch, steps_per_epoch=10, b=None):
    tx = make_optimizer(lr=1e-3, steps_per_epoch=steps_per_epoch)
    key = jax.random.PRNGKey(0)
    if model_name == "raflow":
        inputs = (batch["pc1"], batch["pc2"], batch["ft1"], batch["ft2"],
                  batch["interval"], True)
    elif model_name == "cmflow":
        inputs = (batch["pc1"], batch["pc2"], batch["ft1"], batch["ft2"],
                  batch["mask"], True)
    else:
        g0 = jnp.zeros((batch["pc1"].shape[0], 256))
        inputs = (batch["pc1"], batch["pc2"], batch["ft1"], batch["ft2"],
                  batch["mask"], True, g0)
    return create_train_state(model, key, inputs, tx)


class TestCMFlowTraining:
    def test_loss_decreases_and_ego_recovered(self):
        batch = synth_batch(0, b=4, n=64)
        model = build_model("cmflow")
        state = init_state(model, "cmflow", batch)
        step = steplib.make_train_step(
            "cmflow", model, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR)

        first = None
        for i in range(25):
            state, items = step(state, batch)
            if first is None:
                first = float(items["Loss"])
        last = float(items["Loss"])
        assert np.isfinite(last)
        assert last < first, (first, last)

        # ego-motion loss should head toward zero on a consistent scene
        assert float(items["egoLoss"]) < first

    def test_eval_step(self):
        batch = synth_batch(1, b=2, n=64)
        model = build_model("cmflow")
        state = init_state(model, "cmflow", batch)
        ev = steplib.make_eval_step("cmflow", model)
        sf, cls, trans, mask = ev(state, batch)
        assert sf.shape == (2, 64, 3)
        assert np.isfinite(np.asarray(sf)).all()


class TestRaFlowTraining:
    def test_loss_decreases(self):
        batch = synth_batch(2, b=4, n=64)
        model = build_model("raflow")
        state = init_state(model, "raflow", batch)
        step = steplib.make_train_step(
            "raflow", model, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR)
        losses = []
        for _ in range(15):
            state, items = step(state, batch)
            losses.append(float(items["Loss"]))
        assert losses[-1] < losses[0]


class TestCMFlowTTraining:
    def test_clip_scan_step(self):
        # stack two frame "pairs" into a T=2 clip
        b, t, n = 2, 2, 64
        f0 = synth_batch(3, b=b, n=n)
        f1 = synth_batch(4, b=b, n=n)
        clip = jax.tree_util.tree_map(
            lambda a, c: jnp.stack([a, c], axis=1), f0, f1)
        model = build_model("cmflow_t")
        state = init_state(model, "cmflow_t", f0)
        step = steplib.make_train_step_seq(
            model, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR)
        p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
        state, items = step(state, clip)
        assert np.isfinite(float(items["Loss"]))
        # two frames = two optimizer updates
        assert int(state.step) == 2
        assert not np.allclose(
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]), p0)

    def test_clip_scan_step_non_recurrent_model(self):
        """Clip training a NON-recurrent model must not crash at trace
        time (r4 advice: _frame_loss returns gfeat_new=None for
        cmflow/raflow, which used to mismatch the scan carry pytree;
        reachable via train_experiment with dataset=vodClipDataset)."""
        b, t, n = 2, 2, 64
        f0 = synth_batch(3, b=b, n=n)
        f1 = synth_batch(4, b=b, n=n)
        clip = jax.tree_util.tree_map(
            lambda a, c: jnp.stack([a, c], axis=1), f0, f1)
        model = build_model("cmflow")
        state = init_state(model, "cmflow", f0)
        step = steplib.make_train_step_seq(
            model, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR,
            model_name="cmflow")
        state, items = step(state, clip)
        assert np.isfinite(float(items["Loss"]))
        assert int(state.step) == 2
        # raflow takes the same path (self-supervised loss, no carry)
        model_r = build_model("raflow")
        state_r = init_state(model_r, "raflow", f0)
        step_r = steplib.make_train_step_seq(
            model_r, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR,
            model_name="raflow")
        state_r, items_r = step_r(state_r, clip)
        assert np.isfinite(float(items_r["Loss"]))

    def test_eval_carry(self):
        batch = synth_batch(5, b=2, n=64)
        model = build_model("cmflow_t")
        state = init_state(model, "cmflow_t", batch)
        ev = steplib.make_eval_step("cmflow_t", model)
        g0 = jnp.zeros((2, 256))
        sf, cls, trans, mask, g1 = ev(state, batch, g0)
        assert g1.shape == (2, 256)
        sf2, *_, g2 = ev(state, batch, g1)
        assert not np.allclose(np.asarray(sf), np.asarray(sf2))


class TestDataParallel:
    def test_8way_matches_single_device(self):
        """shard_map over the fake 8-device mesh must reproduce the
        single-device update (same global batch)."""
        batch = synth_batch(6, b=8, n=48)
        model_sp = build_model("cmflow")
        state = init_state(model_sp, "cmflow", batch)
        # snapshot before stepping: the train step donates its input state
        p_init = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(state.params)]

        step_single = steplib.make_train_step(
            "cmflow", model_sp, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR)
        s1, items1 = step_single(state, batch)

        mesh = meshlib.make_mesh()
        model_dp = build_model("cmflow", axis_name=meshlib.DATA_AXIS)
        state2 = init_state(model_dp, "cmflow", batch)
        # same initial params (same rng) — sanity
        for a, b_ in zip(p_init,
                         jax.tree_util.tree_leaves(state2.params)):
            np.testing.assert_array_equal(a, np.asarray(b_))

        state2 = meshlib.replicate(mesh, state2)
        sharded = meshlib.shard_batch(mesh, batch)
        step_dp = steplib.make_train_step(
            "cmflow", model_dp, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR,
            mesh=mesh)
        s2, items2 = step_dp(state2, sharded)

        # step-1 losses must agree tightly (global-batch loss semantics)
        np.testing.assert_allclose(
            float(items1["Loss"]), float(items2["Loss"]), rtol=1e-4)
        # params agree modulo Adam's rsqrt(v)+eps amplification of
        # reduction-order fp noise on near-zero second moments
        for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                         jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-3)
        # second step from *re-synced* states: measures one step of
        # divergence only.  (Free-running trajectories compound Adam's
        # rsqrt(v)-amplified fp noise through discrete masks — cls > 0.5,
        # Kabsch inlier flips — and are chaotic by construction.)
        s1_copy = jax.tree_util.tree_map(jnp.copy, s1)
        s2_sync = meshlib.replicate(mesh, s1_copy)
        s1b, items1b = step_single(s1, batch)
        s2b, items2b = step_dp(s2_sync, sharded)
        np.testing.assert_allclose(
            float(items1b["Loss"]), float(items2b["Loss"]), rtol=1e-3)

    def test_8way_seq_matches_single_device(self):
        """The CMFlow_T mini-clip step (scan + per-frame opt + detached
        carry) under shard_map must reproduce the single-device update on
        the same global clip batch (clip_util.py:20-78 semantics under
        data parallelism).

        Numeric parity is asserted at T=1: chaining per-frame optimizer
        updates (T>=2) compounds Adam's rsqrt(v)-amplified fp noise through
        discrete masks and is chaotic by construction (see the per-pair
        test above, which re-syncs states between steps for the same
        reason).  T=2 is exercised for mechanics + finiteness."""
        batch = synth_batch(7, b=8, n=48)
        clip1 = {k: jnp.repeat(v[:, None], 1, axis=1)
                 for k, v in batch.items()}

        model_sp = build_model("cmflow_t")
        state = init_state(model_sp, "cmflow_t", batch)
        step_single = steplib.make_train_step_seq(
            model_sp, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR)
        s1, items1 = step_single(state, clip1)

        mesh = meshlib.make_mesh()
        model_dp = build_model("cmflow_t", axis_name=meshlib.DATA_AXIS)
        state2 = init_state(model_dp, "cmflow_t", batch)
        state2 = meshlib.replicate(mesh, state2)
        step_dp = steplib.make_train_step_seq(
            model_dp, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR, mesh=mesh)
        s2, items2 = step_dp(state2, meshlib.shard_batch(mesh, clip1))

        np.testing.assert_allclose(
            float(items1["Loss"]), float(items2["Loss"]), rtol=1e-4)
        for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                         jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-3)

        # T=2: two chained per-frame opt steps under shard_map execute and
        # stay finite (exact parity is chaotic — see docstring)
        clip2 = {k: jnp.repeat(v[:, None], 2, axis=1)
                 for k, v in batch.items()}
        s2b, items2b = step_dp(s2, meshlib.shard_batch(mesh, clip2))
        assert np.isfinite(float(items2b["Loss"]))

    def test_8way_sharded_eval_forward(self):
        """Batch-sharded (auto-SPMD) eval forward matches the unsharded
        forward bitwise-comparably."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = synth_batch(9, b=8, n=48)
        model = build_model("cmflow")
        state = init_state(model, "cmflow", batch)
        eval_step = steplib.make_eval_step("cmflow", model, fused="off")
        inputs = {k: batch[k] for k in ("pc1", "pc2", "ft1", "ft2")}
        want = [np.asarray(x, np.float32)
                for x in eval_step(state, inputs)]

        mesh = meshlib.make_mesh()
        sharded = {
            k: jax.device_put(v, NamedSharding(mesh, P(meshlib.DATA_AXIS)))
            for k, v in inputs.items()
        }
        got = eval_step(state, sharded)
        for a, c in zip(want, got):
            np.testing.assert_allclose(a, np.asarray(c, np.float32),
                                       atol=1e-5)


class TestRematDataParallel:
    def test_8way_remat_matches_plain(self):
        """remat inside the shard_map train step (nn.remat wrapping the
        cross-replica-BN grouped chains) reproduces remat=False on the
        same mesh.  Not bit-exact here (unlike the single-device
        TestRemat): the checkpoint boundary changes XLA fusion, which
        reassociates the local reductions feeding the cross-replica psum
        (~1e-6 relative noise)."""
        from types import SimpleNamespace

        batch = synth_batch(7, b=8, n=48)
        mesh = meshlib.make_mesh()
        sharded = meshlib.shard_batch(mesh, batch)

        def run(remat):
            model = build_model(
                "cmflow", SimpleNamespace(remat=remat),
                axis_name=meshlib.DATA_AXIS)
            state = init_state(model, "cmflow", batch)
            state = meshlib.replicate(mesh, state)
            step = steplib.make_train_step(
                "cmflow", model, VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR,
                mesh=mesh)
            state, items = step(state, sharded)
            return float(items["Loss"]), state

        l0, s0 = run(False)
        l1, s1 = run(True)
        np.testing.assert_allclose(l0, l1, rtol=1e-5)
        # params agree modulo Adam's rsqrt(v)+eps amplification of the
        # reduction-order noise (same tolerance rationale as
        # test_8way_matches_single_device)
        for a, b_ in zip(jax.tree_util.tree_leaves(s0.params),
                         jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-3)
