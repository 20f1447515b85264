"""Data-layer tests: synthetic generator physics, reader parity with the
reference schema, clip batching, loader padding."""

import numpy as np
import pytest

from cmflow_tpu.data import (
    BatchLoader,
    VodClipDataset,
    VodDataset,
    pad_to,
)
from cmflow_tpu.data.synthetic import make_scene, write_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    write_synthetic_dataset(
        str(root),
        partitions={"train": 8, "val": 4, "test": 4},
        clips_per_partition=2,
        seed=0,
    )
    return str(root)


class TestSyntheticPhysics:
    def test_static_points_follow_ego(self):
        rng = np.random.default_rng(0)
        scene = make_scene(rng, n1=128, n2=128, moving_fraction=0.25)
        pc1 = np.array(scene["pc1"])[:, :3]
        labels = np.array(scene["gt_labels"])
        mask = np.array(scene["gt_mask"])
        trans = np.linalg.inv(np.array(scene["trans"]))  # loader convention
        rigid = pc1 @ trans[:3, :3].T + trans[:3, 3] - pc1
        static = mask == 1
        np.testing.assert_allclose(labels[static], rigid[static], atol=1e-6)
        # moving points deviate from rigid flow
        assert (np.linalg.norm(labels[~static] - rigid[~static], axis=1)
                > 1e-3).any()

    def test_doppler_consistency(self):
        rng = np.random.default_rng(1)
        scene = make_scene(rng, n1=64, n2=64, noise=0.0)
        pc1 = np.array(scene["pc1"])
        pts, v_r = pc1[:, :3], pc1[:, 4]
        labels = np.array(scene["gt_labels"])
        unit = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        want = np.sum(labels * unit, 1) / 0.1
        np.testing.assert_allclose(v_r, want, atol=1e-6)

    def test_optical_flow_consistency(self):
        rng = np.random.default_rng(2)
        scene = make_scene(rng, n1=64, n2=64)
        # end pixel = radar pixel + opt flow must equal projection of warped pt
        from cmflow_tpu.data.vod import (
            VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR)
        pc1 = np.array(scene["pc1"])[:, :3]
        labels = np.array(scene["gt_labels"])
        u = np.array(scene["opt_info"]["radar_u"])
        v = np.array(scene["opt_info"]["radar_v"])
        opt = np.array(scene["opt_info"]["opt_flow"])
        warped = pc1 + labels
        h = np.concatenate([warped, np.ones((64, 1))], 1)
        uvz = (h @ VOD_T_CAMERA_RADAR.T) @ VOD_CAMERA_PROJECTION.T
        uv = uvz[:, :2] / uvz[:, 2:3]
        np.testing.assert_allclose(np.stack([u, v], 1) + opt, uv, atol=1e-4)


class TestVodReader:
    def test_train_fixed_size(self, synth_root):
        ds = VodDataset(synth_root, "train", num_points=256, eval_mode=False,
                        log=lambda *a: None)
        assert len(ds) == 8
        s = ds[0]
        assert s["pc1"].shape == (256, 3)
        assert s["ft1"].shape == (256, 3)
        assert s["opt_flow"].shape == (256, 2)
        assert s["trans"].shape == (4, 4)

    def test_eval_full_clouds_and_clips_info(self, synth_root):
        ds = VodDataset(synth_root, "test", eval_mode=True,
                        log=lambda *a: None)
        assert len(ds) == 4
        assert len(ds.clips_info) == 2
        assert ds.clips_info[0]["index"][0] == 0
        s = ds[0]
        assert s["pc1"].shape[0] >= 200  # unsampled
        # eval uses gt labels: no optical flow info
        assert (s["opt_flow"] == 0).all()

    def test_features_are_vr_rcs_rcs(self, synth_root):
        ds = VodDataset(synth_root, "test", eval_mode=True,
                        log=lambda *a: None)
        s = ds[0]
        np.testing.assert_array_equal(s["ft1"][:, 1], s["ft1"][:, 2])

    def test_clip_dataset_train_stacks(self, synth_root):
        ds = VodClipDataset(synth_root, "train", num_points=128,
                            eval_mode=False, mini_clip_len=2,
                            log=lambda *a: None)
        # 2 clips x 4 samples // 2 = 4 mini clips
        assert len(ds) == 4
        s = ds[0]
        assert s["pc1"].shape == (2, 128, 3)
        assert s["trans"].shape == (2, 4, 4)

    def test_clip_dataset_eval_frames(self, synth_root):
        ds = VodClipDataset(synth_root, "test", eval_mode=True,
                            log=lambda *a: None)
        assert len(ds) == 4
        assert len(ds.clips_info) == 2

    def test_mixed_name_root_filtered_consistently(self, synth_root,
                                                   tmp_path):
        """A stray non-delft clip dir (and a stray file) in the split root
        must not desync clips_info from samples nor crash listing — the
        reference's latent bug (dataset/vod.py:39-45, vod_clip.py:30-64)."""
        import os
        import shutil

        root = tmp_path / "mixed"
        shutil.copytree(os.path.join(synth_root, "test"),
                        str(root / "test"))
        stray = root / "test" / "other_99"
        stray.mkdir()
        # give the stray clip real-looking samples so a missing filter
        # would pick them up
        src = next(
            (root / "test").glob("delft_*/[0-9]*_[0-9]*.json"))
        shutil.copy(str(src), str(stray / "0_1.json"))
        (root / "test" / "notes.txt").write_text("not a clip")
        (root / "test" / "badname").mkdir()

        for cls in (VodDataset, VodClipDataset):
            ds = cls(str(root), "test", eval_mode=True, log=lambda *a: None)
            assert len(ds) == 4
            assert len(ds.clips_info) == 2
            assert ds.clips_info[-1]["index"][1] == len(ds.samples)
            assert all("delft" in s for s in ds.samples)


class TestLoader:
    def test_batching_and_padding(self, synth_root):
        ds = VodDataset(synth_root, "test", eval_mode=True,
                        log=lambda *a: None)
        loader = BatchLoader(ds, batch_size=2, pad_bucket=256,
                             num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["pc1"].shape[0] == 2
        assert b["pc1"].shape[1] % 128 == 0
        assert b["valid1"].dtype == bool
        # valid mask covers exactly the real points
        n_real = int(b["valid1"][0].sum())
        assert (b["pc1"][0, n_real:] == 0).all()

    def test_train_loader_shapes(self, synth_root):
        ds = VodDataset(synth_root, "train", num_points=256, eval_mode=False,
                        log=lambda *a: None)
        loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                             num_workers=0)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["pc1"].shape == (4, 256, 3)

    def test_pad_to_rejects_overflow(self, synth_root):
        ds = VodDataset(synth_root, "test", eval_mode=True,
                        log=lambda *a: None)
        with pytest.raises(ValueError):
            pad_to(ds[0], 8)


class TestLoaderErrorHandling:
    def test_decode_error_propagates_not_hangs(self):
        from cmflow_tpu.data.loader import BatchLoader

        class Broken:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i == 3:
                    raise ValueError("corrupt sample")
                return {"pc1": np.zeros((4, 3), np.float32)}

        loader = BatchLoader(Broken(), batch_size=2, num_workers=2)
        with pytest.raises(ValueError, match="corrupt sample"):
            for _ in loader:
                pass


class TestPinnedBuckets:
    """Pinned eval shape set (cfg.eval_buckets): ragged frames must only
    ever produce the whitelisted N values — on the remote-compile TPU
    runtime an unexpected shape is a fresh multi-minute compile
    mid-epoch."""

    @staticmethod
    def _ragged_ds(sizes):
        class DS:
            def __len__(self):
                return len(sizes)

            def __getitem__(self, i):
                n = sizes[i]
                return {
                    "pc1": np.random.rand(n, 3).astype(np.float32),
                    "pc2": np.random.rand(n, 3).astype(np.float32),
                    "ft1": np.random.rand(n, 3).astype(np.float32),
                }

        return DS()

    def test_ragged_epoch_stays_in_set(self):
        rng = np.random.RandomState(0)
        sizes = list(rng.randint(40, 512, size=37))
        loader = BatchLoader(self._ragged_ds(sizes), batch_size=4,
                             pad_buckets=[256, 384, 512], num_workers=0)
        seen = set()
        for b in loader:
            seen.add(b["pc1"].shape[1])
            assert b["pc1"].shape[1] == b["pc2"].shape[1]
        assert seen <= {256, 384, 512}, seen
        # each batch picked the SMALLEST fitting bucket
        loader2 = BatchLoader(self._ragged_ds([100, 100]), batch_size=2,
                              pad_buckets=[256, 384, 512], num_workers=0)
        assert next(iter(loader2))["pc1"].shape[1] == 256

    def test_oversize_frame_fails_loudly(self):
        loader = BatchLoader(self._ragged_ds([600]), batch_size=1,
                             pad_buckets=[256, 384, 512], num_workers=0)
        with pytest.raises(ValueError, match="pinned eval bucket"):
            list(loader)

    def test_pinned_buckets_helper(self):
        from cmflow_tpu.train.loop import _pinned_buckets
        from cmflow_tpu.utils.config import Config

        cfg = Config(exp_name="t", model="cmflow", num_points=256)
        assert _pinned_buckets(cfg) == [256, 384, 512]
        assert _pinned_buckets(cfg.replace(num_points=512)) == [512]
        # num_points above every bucket: pinning disabled, open-ended
        # rounding keeps working
        assert _pinned_buckets(cfg.replace(num_points=1024)) is None
        assert _pinned_buckets(cfg.replace(eval_buckets=())) is None
