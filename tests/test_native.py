"""Native C++ sample codec + packed binary dataset tests."""

import json
import os
import time

import numpy as np
import pytest

from cmflow_tpu import native
from cmflow_tpu.data.packed import PackedVodDataset, pack_split
from cmflow_tpu.data.synthetic import make_scene, write_synthetic_dataset
from cmflow_tpu.data.vod import VodDataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("packsrc")
    write_synthetic_dataset(
        str(root), partitions={"train": 6, "test": 4},
        clips_per_partition=2, seed=3, n_range=(150, 250))
    return str(root)


class TestNativeCodec:
    def test_parses_matches_python_json(self, synth_root):
        lib = native.get_lib()
        if lib is None:
            pytest.skip("g++ unavailable")
        clip = os.path.join(synth_root, "train", "delft_1")
        path = os.path.join(clip, sorted(os.listdir(clip))[0])
        got = native.parse_sample_file(path)
        assert got is not None
        with open(path) as f:
            want = json.load(f)
        np.testing.assert_allclose(got["pc1"], np.array(want["pc1"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(got["trans"], np.array(want["trans"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(got["gt_mask"],
                                   np.array(want["gt_mask"]), rtol=1e-6)
        np.testing.assert_allclose(
            got["opt_info"]["opt_flow"],
            np.array(want["opt_info"]["opt_flow"]), rtol=1e-5)

    def test_handles_empty_opt_info(self, tmp_path):
        lib = native.get_lib()
        if lib is None:
            pytest.skip("g++ unavailable")
        sample = {
            "pc1": [[1, 2, 3, 4, 5, 6, 7]], "pc2": [[1, 2, 3, 4, 5, 6, 7]],
            "trans": np.eye(4).tolist(),
            "opt_info": {"radar_u": [], "radar_v": [], "opt_flow": []},
            "gt_mask": [1.0], "gt_labels": [[0, 0, 0]],
            "pse_mask": [1.0], "pse_labels": [[0, 0, 0]],
        }
        p = tmp_path / "s.json"
        p.write_text(json.dumps(sample))
        got = native.parse_sample_file(str(p))
        assert got["pc1"].shape == (1, 7)
        assert got["opt_info"]["radar_u"].size == 0

    def test_faster_than_python_json(self, synth_root):
        lib = native.get_lib()
        if lib is None:
            pytest.skip("g++ unavailable")
        clip = os.path.join(synth_root, "train", "delft_1")
        path = os.path.join(clip, sorted(os.listdir(clip))[0])
        buf = open(path, "rb").read()

        t0 = time.perf_counter()
        for _ in range(20):
            native.parse_sample_bytes(buf)
        t_native = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(20):
            json.loads(buf)
        t_py = time.perf_counter() - t0
        # informational: native should not be slower
        assert t_native < t_py * 1.5, (t_native, t_py)


class TestPackedDataset:
    def test_pack_and_read_equivalence(self, synth_root, tmp_path):
        pack = str(tmp_path / "train.pack")
        n = pack_split(synth_root, "train", pack, log=lambda *a: None)
        assert n == 6

        js = VodDataset(synth_root, "train", num_points=128, seed=7,
                        log=lambda *a: None)
        pk = PackedVodDataset(pack, "train", num_points=128, seed=7,
                              log=lambda *a: None)
        assert len(js) == len(pk)
        a, b = js[0], pk[0]
        # identical rng seeds -> identical subsample -> identical tensors
        for k in ("pc1", "pc2", "ft1", "ft2", "trans", "labels", "mask",
                  "radar_u", "radar_v", "opt_flow"):
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)

    def test_packed_eval_with_clips(self, synth_root, tmp_path):
        pack = str(tmp_path / "test.pack")
        pack_split(synth_root, "test", pack, log=lambda *a: None)
        ds = PackedVodDataset(pack, "test", eval_mode=True,
                              log=lambda *a: None)
        assert len(ds.clips_info) == 2
        s = ds[0]
        assert s["pc1"].shape[0] >= 150
        assert (s["opt_flow"] == 0).all()  # eval: no camera modality
