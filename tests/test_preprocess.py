"""Preprocessing-stack tests on a synthetic raw VoD-layout dataset tree."""

import json
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cmflow_tpu.preprocess import boxes as boxlib
from cmflow_tpu.preprocess import vod_io
from cmflow_tpu.preprocess.flow_samples import (
    build_sample,
    ego_transform,
    process_clip,
    rigid_flow_from_ego,
)

CALIB_LINES = (
    "P0: dummy\nP1: dummy\n"
    "P2: 1495.468642 0.0 961.272442 0.0 0.0 1495.468642 624.89592 0.0 "
    "0.0 0.0 1.0 0.0\n"
    "R0_rect: 1 0 0 0 1 0 0 0 1\n"
    "Tr_imu: dummy\n"
    "Tr_velo_to_cam: {}\n"
)


def write_calib(path, extrinsic):
    vals = " ".join(str(v) for v in extrinsic[:3].flatten())
    with open(path, "w") as f:
        f.write(CALIB_LINES.format(vals))


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    """Two frames: static world, camera/radar extrinsics ~ VoD, ego moves
    0.5 m forward (radar x) between frames; one object translates extra."""
    root = str(tmp_path_factory.mktemp("vod_raw"))
    for sub in ("radar/training/velodyne", "radar/training/calib",
                "radar/training/pose", "lidar/training/velodyne",
                "lidar/training/calib", "lidar/training/image_2",
                "lidar/training/label_2"):
        os.makedirs(os.path.join(root, sub))

    # radar->camera extrinsic: use the real VoD one so FOV filtering is sane
    from cmflow_tpu.data.vod import VOD_T_CAMERA_RADAR

    t_cam_radar = VOD_T_CAMERA_RADAR.astype(np.float64)
    t_cam_lidar = t_cam_radar.copy()  # co-locate lidar with radar for test

    rng = np.random.RandomState(0)
    n = 120
    # points in front (radar x forward), inside camera FOV
    pts = np.stack([
        rng.uniform(5, 30, n), rng.uniform(-5, 5, n), rng.uniform(-0.5, 1.5, n),
    ], 1)
    # a small cluster that will be the "moving object"
    obj_center = np.array([12.0, 1.0, 0.3])
    pts[:15] = obj_center + rng.uniform(-0.8, 0.8, (15, 3)) * [1.5, 0.6, 0.4]

    ego_fwd = 0.5  # radar-frame x translation of the ego between frames
    obj_extra = np.array([1.0, 0.2, 0.0])  # object motion beyond ego

    def radar7(xyz, vr):
        n_ = len(xyz)
        cols = np.zeros((n_, 7), np.float32)
        cols[:, :3] = xyz
        cols[:, 3] = rng.uniform(-10, 5, n_)
        cols[:, 4] = vr
        return cols

    # frame 1: points at pts; frame 2: static points shifted by -ego (the
    # world moves backwards in ego frame), object gets extra motion
    pts2 = pts - [ego_fwd, 0, 0]
    pts2[:15] += obj_extra

    radar7(pts, np.zeros(n)).tofile(
        os.path.join(root, "radar/training/velodyne/00000.bin"))
    radar7(pts2, np.zeros(n)).tofile(
        os.path.join(root, "radar/training/velodyne/00001.bin"))

    for fid in ("00000", "00001"):
        write_calib(os.path.join(root, f"radar/training/calib/{fid}.txt"),
                    t_cam_radar)
        write_calib(os.path.join(root, f"lidar/training/calib/{fid}.txt"),
                    t_cam_lidar)

    # poses: odom_camera = odom_radar @ radar_camera; ego advances +x radar
    t_radar_cam = np.linalg.inv(t_cam_radar)
    odom_radar_1 = np.eye(4)
    odom_radar_2 = np.eye(4)
    odom_radar_2[:3, 3] = [ego_fwd, 0, 0]
    for fid, t_or in (("00000", odom_radar_1), ("00001", odom_radar_2)):
        t_oc = t_or @ t_cam_radar  # odom<-radar @ inv(cam<-radar)^-1 ... see below
        # odom_camera must satisfy: odom_radar = odom_camera @ camera_radar
        t_oc = t_or @ np.linalg.inv(t_cam_radar)
        with open(os.path.join(root, f"radar/training/pose/{fid}.json"),
                  "w") as f:
            f.write(json.dumps({"odomToCamera": t_oc.flatten().tolist()})
                    + "\n")

    # MOT track labels: the object's box in camera coords, same track id
    def write_label(fid, center_radar):
        cam = t_cam_radar @ np.array([*center_radar, 1.0])
        # [label id _ _ _ _ _ _ h w l x y z rot score] (16-col variant)
        line = (f"Car 7 0 0 0 0 0 0 1.5 2.0 4.0 "
                f"{cam[0]} {cam[1]} {cam[2]} 0.0 0.8\n")
        with open(os.path.join(root, f"lidar/training/label_2/{fid}.txt"),
                  "w") as f:
            f.write(line)

    write_label("00000", obj_center)
    write_label("00001", obj_center - [ego_fwd, 0, 0] + obj_extra)

    return root


class TestVodIO:
    def test_frame_loading(self, raw_root):
        loc = vod_io.VodLocations(root_dir=raw_root)
        fr = vod_io.VodFrame(loc, "00000")
        assert fr.radar_data.shape == (120, 7)
        tf = vod_io.FrameTransforms(loc, "00000")
        assert tf.t_camera_radar.shape == (4, 4)
        np.testing.assert_allclose(
            tf.t_radar_camera @ tf.t_camera_radar, np.eye(4), atol=1e-5)

    def test_ego_transform_chain(self, raw_root):
        loc = vod_io.VodLocations(root_dir=raw_root)
        tf1 = vod_io.FrameTransforms(loc, "00000")
        tf2 = vod_io.FrameTransforms(loc, "00001")
        t12 = ego_transform(tf1, tf2)
        # radar2 origin expressed in radar1: ego moved +0.5 x
        np.testing.assert_allclose(t12[:3, 3], [0.5, 0, 0], atol=1e-5)


class TestBoxes:
    def test_points_inside_obb(self):
        box = boxlib.OrientedBox(
            center=np.array([1.0, 0, 0]),
            rotation=Rotation.from_euler("z", 45, degrees=True).as_matrix(),
            extent=np.array([2.0, 1.0, 1.0]))
        pts = np.array([[1.0, 0, 0], [1.5, 0.5, 0], [3.0, 0, 0]])
        inside = box.points_inside(pts)
        assert 0 in inside and 2 not in inside

    def test_track_label_parser(self):
        lines = [
            "Car 3 0 0 0 0 0 0 1.5 1.8 4.0 1.0 2.0 3.0 0.5 0.9\n",  # 16 col
            "Ped 4 0 0 0 0 0 0 0 1.7 0.6 0.6 -1.0 0.0 5.0 0.1 0.7\n",  # 17
        ]
        out = boxlib.parse_track_labels(lines)
        assert out.shape == (2, 9)
        assert out[0, -1] == 3 and out[1, -1] == 4
        np.testing.assert_allclose(out[0, :3], [1.5, 1.8, 4.0])

    def test_inbox_flow_pure_translation(self):
        t1 = np.eye(4)
        t2 = np.eye(4)
        t2[:3, 3] = [1.0, 0, 0]
        pts = np.random.RandomState(0).randn(5, 3)
        flow = boxlib.inbox_flow(pts, t1, t2)
        np.testing.assert_allclose(flow, np.tile([1.0, 0, 0], (5, 1)),
                                   atol=1e-9)


class TestBuildSample:
    def test_gt_composition(self, raw_root):
        loc = vod_io.VodLocations(root_dir=raw_root)
        label_dir = os.path.join(raw_root, "lidar/training/label_2")
        sample = build_sample("00000", "00001", loc, label_dir, "test")
        assert sample is not None
        gt_mask = np.array(sample["gt_mask"])
        gt_labels = np.array(sample["gt_labels"])
        pc1 = np.array(sample["pc1"])[:, :3]
        trans = np.array(sample["trans"])

        # static points: rigid flow = inv(trans) applied
        rigid = rigid_flow_from_ego(pc1, trans)
        static = gt_mask == 1
        assert static.sum() > 50
        np.testing.assert_allclose(gt_labels[static], rigid[static],
                                   atol=1e-5)
        # the moving cluster is detected (non-rigid motion > 0.05 m)
        moving = gt_mask != 1
        assert moving.sum() >= 5
        # moving labels equal actual displacement (-ego + extra object move)
        np.testing.assert_allclose(
            gt_labels[moving],
            np.tile([-0.5 + 1.0, 0.2, 0.0], (moving.sum(), 1)), atol=1e-4)

    def test_train_pseudo_labels(self, raw_root):
        loc = vod_io.VodLocations(root_dir=raw_root)
        label_dir = os.path.join(raw_root, "lidar/training/label_2")
        sample = build_sample("00000", "00001", loc, label_dir, "train")
        pse_mask = np.array(sample["pse_mask"])
        assert ((pse_mask > 0) & (pse_mask < 1)).sum() >= 5  # 1 - conf(0.8)
        assert (pse_mask == 1).sum() > 50  # background

    def test_process_clip_writes_schema(self, raw_root, tmp_path):
        loc = vod_io.VodLocations(root_dir=raw_root)
        label_dir = os.path.join(raw_root, "lidar/training/label_2")
        n = process_clip(loc, ["00000", "00001"], str(tmp_path), "delft_1",
                         "test", label_dir, "test", log=lambda *a: None)
        assert n == 1
        path = os.path.join(str(tmp_path), "test", "delft_1",
                            "00000_00001.json")
        with open(path) as f:
            d = json.load(f)
        for key in ("pc1", "pc2", "trans", "opt_info", "gt_mask",
                    "gt_labels", "pse_mask", "pse_labels"):
            assert key in d
        # readable by the dataset layer
        from cmflow_tpu.data.vod import decode_sample

        s = decode_sample(d, "test", eval_mode=True, num_points=64)
        assert s["pc1"].shape[1] == 3


class TestFrameVisualization:
    """Devkit Visualization2D/3D port (preprocess/vis_frame.py)."""

    @pytest.fixture()
    def raw_with_image(self, raw_root):
        from PIL import Image

        img_path = os.path.join(raw_root, "lidar/training/image_2",
                                "00000.jpg")
        if not os.path.exists(img_path):
            rng = np.random.RandomState(0)
            Image.fromarray(
                rng.randint(0, 255, (1216, 1936, 3), np.uint8)
            ).save(img_path)
        lidar_path = os.path.join(raw_root, "lidar/training/velodyne",
                                  "00000.bin")
        if not os.path.exists(lidar_path):
            rng = np.random.RandomState(1)
            pts = np.zeros((500, 4), np.float32)
            pts[:, 0] = rng.uniform(2, 40, 500)
            pts[:, 1] = rng.uniform(-15, 15, 500)
            pts[:, 2] = rng.uniform(-1, 2, 500)
            pts.tofile(lidar_path)
        return raw_root

    def test_label_parsing_and_corners(self, raw_with_image):
        from cmflow_tpu.preprocess import vis_frame, vod_io

        loc = vod_io.VodLocations(root_dir=raw_with_image)
        fr = vod_io.VodFrame(loc, "00000")
        tf = vod_io.FrameTransforms(loc, "00000")
        labels = vis_frame.parse_frame_labels(fr.raw_labels)
        assert len(labels) == 1 and labels[0]["label_class"] == "Car"
        boxes = vis_frame.label_corners_3d(labels, tf.t_camera_lidar)
        c = boxes[0]["corners_3d"]
        assert c.shape == (8, 3)
        # box dims survive the corner construction
        l = np.linalg.norm(c[0] - c[3])
        w = np.linalg.norm(c[0] - c[1])
        h = np.linalg.norm(c[4] - c[0])
        np.testing.assert_allclose([l, w, h], [4.0, 2.0, 1.5], atol=1e-6)
        # bottom-face center lands at the label's position (lidar frame)
        center = c[:4].mean(0)
        want = (np.linalg.inv(tf.t_camera_lidar)
                @ np.array([*[labels[0][k] for k in "xyz"], 1.0]))[:3]
        np.testing.assert_allclose(center, want, atol=1e-6)

    def test_2d_and_3d_plots_render(self, raw_with_image, tmp_path):
        from cmflow_tpu.preprocess import vis_frame, vod_io

        loc = vod_io.VodLocations(root_dir=raw_with_image)
        fr = vod_io.VodFrame(loc, "00000")
        tf = vod_io.FrameTransforms(loc, "00000")

        p2 = vis_frame.FrameVisualizer2D(fr, tf).draw(
            str(tmp_path / "overlay.png"), show_lidar=True)
        assert os.path.getsize(p2) > 1000

        p3 = vis_frame.FrameVisualizer3D(fr, tf, origin="radar").draw(
            str(tmp_path / "scene3d.png"))
        assert os.path.getsize(p3) > 1000


class TestRaftPort:
    def test_forward_shapes_tiny(self):
        import jax
        import jax.numpy as jnp

        from cmflow_tpu.models.raft import RaftSmall

        model = RaftSmall()
        img = jnp.zeros((1, 64, 96, 3), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0)}, img, img,
                            iters=2)["params"]
        flow = model.apply({"params": params}, img, img, iters=2)
        assert flow.shape == (1, 64, 96, 2)
        # identical images with zero-flow init: flow stays small
        assert np.isfinite(np.asarray(flow)).all()

    def test_matches_vendored_torch_raft(self, tmp_path):
        """Numeric parity with the reference's torch RAFT-small
        (preprocess/utils/RAFT/core/raft.py:86-143, corr.py:12-61): random
        torch weights -> load_torch_raft_small conversion -> same final
        flow.  Fails if corr channel order, strided-conv padding, upflow8
        interpolation, or the GRU input layout drift."""
        import argparse
        import sys

        import jax
        import torch

        from cmflow_tpu.models.raft import RaftSmall, load_torch_raft_small

        # import `core` directly — utils/__init__.py pulls in the whole
        # vod devkit, which needs its own sys.path arrangement
        ref = "/root/reference/preprocess/utils/RAFT"
        if not os.path.isdir(os.path.join(ref, "core")):
            pytest.skip("vendored torch RAFT not available")
        sys.path.insert(0, ref)
        try:
            from core.raft import RAFT as TorchRAFT
        finally:
            sys.path.remove(ref)

        torch.manual_seed(0)
        args = argparse.Namespace(small=True, mixed_precision=False,
                                  alternate_corr=False, dropout=0.0)
        tmodel = TorchRAFT(args).eval()
        pth = str(tmp_path / "raft-rand.pth")
        torch.save(tmodel.state_dict(), pth)

        rng = np.random.RandomState(0)
        # H, W >= 128: smaller images make pyramid level 3 degenerate to
        # 1x1, where torch's bilinear_sampler divides by (W-1)=0 and NaNs
        # (a latent reference bug real 1216x1936 images never hit)
        h, w, iters = 128, 160, 6
        img1 = rng.randint(0, 255, (1, h, w, 3)).astype(np.float32)
        img2 = rng.randint(0, 255, (1, h, w, 3)).astype(np.float32)

        with torch.no_grad():
            tflow = tmodel(
                torch.from_numpy(img1).permute(0, 3, 1, 2),
                torch.from_numpy(img2).permute(0, 3, 1, 2), iters=iters)
        tflow = tflow.permute(0, 2, 3, 1).numpy()

        params = load_torch_raft_small(pth)
        jflow = np.asarray(RaftSmall().apply(
            {"params": params}, img1, img2, iters=iters))

        assert jflow.shape == tflow.shape
        err = np.abs(jflow - tflow).max()
        assert err < 1e-2, f"max |flow diff| {err}"

    def test_bilinear_sample_exact_on_grid(self):
        import jax.numpy as jnp

        from cmflow_tpu.models.raft import bilinear_sample

        rng = np.random.RandomState(0)
        img = rng.randn(2, 8, 9, 3).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(8), np.arange(9), indexing="ij")
        coords = np.stack([xs.flatten(), ys.flatten()], -1)[None].repeat(2, 0)
        out = np.asarray(bilinear_sample(jnp.array(img),
                                         jnp.array(coords, jnp.float32)))
        want = img.reshape(2, -1, 3)
        np.testing.assert_allclose(out, want, atol=1e-6)
