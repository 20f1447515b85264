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
