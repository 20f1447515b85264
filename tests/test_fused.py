"""Parity tests for the Pallas fused inference path (interpret mode on the
fake-CPU cluster; the kernel itself is exercised compiled on TPU by
bench.py / the driver)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.core import unfreeze

from cmflow_tpu.models import build_model
from cmflow_tpu.models.inference import cmflow_infer, raflow_infer
from cmflow_tpu.nn.blocks import PointLocalFeature
from cmflow_tpu.ops import pointops
from cmflow_tpu.ops.fused import (
    fused_point_local_feature,
    plf_params_from_variables,
)


def _with_real_stats(model, args):
    """Init + a train pass so BN running stats are non-trivial."""
    v = unfreeze(model.init({"params": jax.random.PRNGKey(0)}, *args, True))
    _, mut = model.apply(v, *args, True, mutable=["batch_stats"])
    v["batch_stats"] = mut["batch_stats"]
    return v


class TestFusedKernel:
    def test_point_local_feature_parity(self, rng):
        b, n, k = 2, 128, 16
        xyz = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        feats = jnp.asarray(rng.randn(b, n, 35).astype(np.float32))
        mod = PointLocalFeature(radius=4.0, nsample=k,
                                mlp=(64, 32, 32), mlp2=(32, 32, 32))
        v = _with_real_stats(mod, (xyz, feats))
        ref = np.asarray(mod.apply(v, xyz, feats, False))
        assert np.abs(ref).max() > 1e-3  # non-degenerate

        chain, feat_w, mlp2 = plf_params_from_variables(
            v["params"], v["batch_stats"])
        idx = pointops.ball_query(4.0, k, xyz, xyz)
        feat_tx = jnp.einsum("bnc,cd->bnd", feats, feat_w)
        h = fused_point_local_feature(feat_tx, idx, xyz, chain,
                                      interpret=True)
        x = h
        for w, s, bb in mlp2:
            x = jnp.maximum((x @ w) * s + bb, 0.0)
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-5)

    def test_single_layer_chain(self, rng):
        """mlp of length 1 (no trailing Dense layers) also works."""
        b, n, k, c1 = 1, 64, 4, 16
        feat_tx = jnp.asarray(rng.randn(b, n, c1).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
        xyz = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        wrel = jnp.asarray(rng.randn(3, c1).astype(np.float32))
        s0 = jnp.asarray(np.abs(rng.randn(c1)).astype(np.float32))
        b0 = jnp.asarray(rng.randn(c1).astype(np.float32))
        got = fused_point_local_feature(
            feat_tx, idx, xyz, (wrel, s0, b0), interpret=True)

        gathered = pointops.group_points(feat_tx, idx)
        rel = pointops.group_points(xyz, idx) - xyz[:, :, None, :]
        pre = gathered + jnp.einsum("bnkc,cd->bnkd", rel, wrel)
        want = jnp.max(jax.nn.relu(pre * s0 + b0), axis=2)
        # the kernel's hi/lo bf16 gather is exact to ~2^-16 relative
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestFusedInference:
    def test_cmflow_infer_parity(self, rng):
        b, n = 2, 128
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        model = build_model("cmflow")
        v = _with_real_stats(model, (pc1, pc2, ft1, ft2, None))
        ref = model.apply(v, pc1, pc2, ft1, ft2, None, False)
        got = cmflow_infer(v, pc1, pc2, ft1, ft2, interpret=True)
        for a, c in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=1e-4)

    def test_cmflow_infer_parity_multitile(self, rng):
        """n=256 exercises the kernels' row-tiled path (tile=128, two
        tiles per cloud) in interpret mode — the other tests stay at
        n=128 where a single tile covers the cloud."""
        b, n = 1, 256
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        model = build_model("cmflow")
        v = _with_real_stats(model, (pc1, pc2, ft1, ft2, None))
        ref = model.apply(v, pc1, pc2, ft1, ft2, None, False)
        got = cmflow_infer(v, pc1, pc2, ft1, ft2, interpret=True)
        for a, c in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=1e-4)

    def test_cmflow_infer_with_padding_mask(self, rng):
        b, n = 2, 128
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        valid1 = jnp.asarray(np.arange(n) < 100)[None].repeat(b, 0)
        valid2 = jnp.asarray(np.arange(n) < 90)[None].repeat(b, 0)
        model = build_model("cmflow")
        v = _with_real_stats(model, (pc1, pc2, ft1, ft2, None))
        ref = model.apply(v, pc1, pc2, ft1, ft2, None, False,
                          valid1, valid2)
        got = cmflow_infer(v, pc1, pc2, ft1, ft2, valid1, valid2,
                           interpret=True)
        for a, c in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(a, np.float32)[:, :100],
                np.asarray(c, np.float32)[:, :100], atol=1e-4)

    def test_cmflow_infer_bf16_close_to_f32(self, rng):
        """bf16 serving mode (single-pass gathers + bf16 dense chains)
        tracks the f32 fused path to bf16 tolerance."""
        b, n = 2, 128
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        model = build_model("cmflow")
        v = _with_real_stats(model, (pc1, pc2, ft1, ft2, None))
        f32 = cmflow_infer(v, pc1, pc2, ft1, ft2, interpret=True)
        bf16 = cmflow_infer(v, pc1, pc2, ft1, ft2, interpret=True,
                            compute_dtype=jnp.bfloat16)
        # flow field within bf16 rounding of the f32 engine
        sf32, cls32 = np.asarray(f32[0]), np.asarray(f32[1])
        sfb, clsb = np.asarray(bf16[0], np.float32), np.asarray(bf16[1],
                                                               np.float32)
        scale = np.abs(sf32).max()
        assert np.abs(sfb - sf32).max() < 0.05 * max(scale, 1.0)
        assert np.abs(clsb - cls32).max() < 0.05
        # transforms agree loosely (Kabsch itself runs f32 in both)
        np.testing.assert_allclose(np.asarray(bf16[2], np.float32),
                                   np.asarray(f32[2]), atol=0.05)

    def test_raflow_infer_parity(self, rng):
        b, n = 2, 128
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        iv = jnp.full((b,), 0.1)
        model = build_model("raflow")
        v = _with_real_stats(model, (pc1, pc2, ft1, ft2, iv))
        ref = model.apply(v, pc1, pc2, ft1, ft2, iv, False)
        got = raflow_infer(v, pc1, pc2, ft1, ft2, iv, interpret=True)
        for a, c in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=1e-4)

    def test_cmflow_t_infer_parity(self, rng):
        from cmflow_tpu.models.inference import cmflow_t_infer

        b, n = 2, 128
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        model = build_model("cmflow_t")
        g0 = jnp.zeros((b, model.cfg.prop_width))
        # CMFlowT.init/apply signature takes gfeat after the train flag
        v = unfreeze(model.init({"params": jax.random.PRNGKey(0)},
                                pc1, pc2, ft1, ft2, None, True, g0))
        _, mut = model.apply(v, pc1, pc2, ft1, ft2, None, True, g0,
                             mutable=["batch_stats"])
        v["batch_stats"] = mut["batch_stats"]
        ref = model.apply(v, pc1, pc2, ft1, ft2, None, False, g0)
        got = cmflow_t_infer(v, pc1, pc2, ft1, ft2, g0, interpret=True)
        for a, c in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=1e-4)


class TestInferMany:
    def test_scan_matches_per_batch(self, rng):
        from cmflow_tpu.models.inference import cmflow_infer_many

        s, b, n = 3, 2, 128
        pc1 = jnp.asarray(rng.randn(s, b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(
            rng.randn(s, b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(s, b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(s, b, n, 3).astype(np.float32))
        model = build_model("cmflow")
        v = _with_real_stats(model, (pc1[0], pc2[0], ft1[0], ft2[0], None))
        many = cmflow_infer_many(v, pc1, pc2, ft1, ft2, interpret=True)
        for i in range(s):
            one = cmflow_infer(v, pc1[i], pc2[i], ft1[i], ft2[i],
                               interpret=True)
            for a, c in zip(one, (m[i] for m in many)):
                np.testing.assert_allclose(np.asarray(a, np.float32),
                                           np.asarray(c, np.float32),
                                           atol=1e-5)

    def test_cmflow_t_seq_reset_semantics(self, rng):
        from cmflow_tpu.models.inference import (cmflow_t_infer,
                                                 cmflow_t_infer_seq)

        t, b, n = 4, 2, 128
        pc1 = jnp.asarray(rng.randn(t, b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(
            rng.randn(t, b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(t, b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(t, b, n, 3).astype(np.float32))
        model = build_model("cmflow_t")
        g0 = jnp.zeros((b, model.cfg.prop_width))
        v = unfreeze(model.init({"params": jax.random.PRNGKey(0)},
                                pc1[0], pc2[0], ft1[0], ft2[0], None, True,
                                g0))
        _, mut = model.apply(v, pc1[0], pc2[0], ft1[0], ft2[0], None, True,
                             g0, mutable=["batch_stats"])
        v["batch_stats"] = mut["batch_stats"]

        # lane 0 resets at frame 2, lane 1 never (after frame 0)
        reset = np.zeros((t, b), np.float32)
        reset[0, :] = 1.0
        reset[2, 0] = 1.0
        outs, gfinal = cmflow_t_infer_seq(
            v, pc1, pc2, ft1, ft2, g0 + 7.0, jnp.asarray(reset),
            interpret=True)

        # replay frame-by-frame with explicit resets
        g = jnp.zeros_like(g0)
        for i in range(t):
            gi = jnp.where(jnp.asarray(reset[i])[:, None] > 0, 0.0, g)
            sf, cls, trans, mask, g = cmflow_t_infer(
                v, pc1[i], pc2[i], ft1[i], ft2[i], gi, interpret=True)
            np.testing.assert_allclose(np.asarray(outs[0][i]),
                                       np.asarray(sf), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gfinal), np.asarray(g),
                                   atol=1e-6)


class TestMxuGroupPoints:
    """Exactness of the MXU one-hot group_points (fwd + custom-VJP bwd)."""

    def test_forward_matches_gather(self, rng):
        from cmflow_tpu.ops.fused import mxu_group_points

        # C covers narrow (3: xyz rel), mid (32: sa feats), lane-full
        # (128); K=5 exercises the internal pad-to-128 of M = S*K
        for c, k in ((3, 8), (32, 5), (128, 8)):
            b, n = 2, 64
            pts = jnp.asarray(rng.randn(b, n, c).astype(np.float32) * 10)
            idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
            want = jax.vmap(lambda p, i: p[i])(pts, idx)
            got = mxu_group_points(pts, idx, True)
            # hi/lo bf16 one-hot gather is exact to ~2^-16 relative
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-4)

    def test_forward_bf16_single_pass(self, rng):
        from cmflow_tpu.ops.fused import mxu_group_points

        b, n, k, c = 2, 64, 8, 32
        pts = jnp.asarray(
            rng.randn(b, n, c).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
        want = jax.vmap(lambda p, i: p[i])(pts, idx)
        got = mxu_group_points(pts, idx, True)
        assert got.dtype == jnp.bfloat16
        # bf16 one-hot gather of bf16 values is an exact permutation
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))

    def test_backward_matches_scatter(self, rng):
        from cmflow_tpu.ops.fused import mxu_group_points

        for c in (3, 32, 128):
            b, n, k = 2, 64, 8
            pts = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
            idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
            cot = jnp.asarray(rng.randn(b, n, k, c).astype(np.float32))

            def ref_loss(p):
                return jnp.sum(jax.vmap(lambda pp, i: pp[i])(p, idx) * cot)

            def mxu_loss(p):
                return jnp.sum(mxu_group_points(p, idx, True) * cot)

            g_ref = jax.grad(ref_loss)(pts)
            g_mxu = jax.grad(mxu_loss)(pts)
            np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                                       rtol=1e-3, atol=1e-3)

    def test_backward_odd_rows_and_wide(self, rng):
        """Flat-row backward: row counts S*K that don't divide the
        preferred block sizes (K=9, 5; prime-ish S) and a wide C=512
        block (the propagation-encoder shape)."""
        from cmflow_tpu.ops.fused import mxu_group_points

        for (b, n, s, k, c) in ((2, 64, 37, 9, 7), (2, 40, 40, 5, 3),
                                (1, 128, 128, 4, 512)):
            pts = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
            idx = jnp.asarray(rng.randint(0, n, (b, s, k)).astype(np.int32))
            cot = jnp.asarray(rng.randn(b, s, k, c).astype(np.float32))

            def ref_loss(p):
                return jnp.sum(jax.vmap(lambda pp, i: pp[i])(p, idx) * cot)

            def mxu_loss(p):
                return jnp.sum(mxu_group_points(p, idx, True) * cot)

            g_ref = jax.grad(ref_loss)(pts)
            g_mxu = jax.grad(mxu_loss)(pts)
            np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                                       rtol=1e-3, atol=1e-3)

    def test_backward_bf16_cotangent(self, rng):
        """bf16 cotangents take the single-pass path and stay close to the
        exact scatter (bf16 rounding only)."""
        from cmflow_tpu.ops.fused import mxu_group_points

        b, n, s, k, c = 2, 64, 64, 8, 32
        pts = jnp.asarray(
            rng.randn(b, n, c).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, n, (b, s, k)).astype(np.int32))
        cot = jnp.asarray(rng.randn(b, s, k, c).astype(np.float32))

        def mxu_loss(p):
            out = mxu_group_points(p, idx, True).astype(jnp.float32)
            return jnp.sum(out * cot)

        def ref_loss(p):
            out = jax.vmap(lambda pp, i: pp[i])(p, idx).astype(jnp.float32)
            return jnp.sum(out * cot)

        g_mxu = jax.grad(mxu_loss)(pts)
        g_ref = jax.grad(ref_loss)(pts)
        assert g_mxu.dtype == jnp.bfloat16
        # both sides accumulate the K-way scatter in bf16 with different
        # summation orders; tolerance = a few bf16 ulps at |g|~8
        np.testing.assert_allclose(
            np.asarray(g_mxu, np.float32), np.asarray(g_ref, np.float32),
            rtol=5e-2, atol=6e-2)


class TestHeadsJoint:
    def test_matches_separate_heads(self, rng):
        """_heads_joint (stacked/block-diagonal fp+mp chain) == two _head
        calls, bit-level in f32 up to dot re-association."""
        from cmflow_tpu.models.inference import _head, _heads_joint

        width, b, n = 512, 3, 64
        mlp = (256, 128, 64)

        def make_head(out_ch, seed):
            r = np.random.RandomState(seed)
            p = {"mlp": {}, "out": {}}
            s = {"mlp": {}}
            c_in = width
            for i, c in enumerate(mlp):
                p["mlp"][f"dense_{i}"] = {"kernel": jnp.asarray(
                    r.randn(c_in, c).astype(np.float32) / np.sqrt(c_in))}
                p["mlp"][f"bn_{i}"] = {
                    "scale": jnp.asarray(r.rand(c).astype(np.float32) + .5),
                    "bias": jnp.asarray(r.randn(c).astype(np.float32) * .1)}
                s["mlp"][f"bn_{i}"] = {
                    "mean": jnp.asarray(r.randn(c).astype(np.float32) * .2),
                    "var": jnp.asarray(r.rand(c).astype(np.float32) + .5)}
                c_in = c
            p["out"]["kernel"] = jnp.asarray(
                r.randn(c_in, out_ch).astype(np.float32))
            return p, s

        p_fp, s_fp = make_head(3, 11)
        p_mp, s_mp = make_head(1, 22)
        x = jnp.asarray(rng.randn(b, n, width).astype(np.float32))

        flow_j, logit_j = _heads_joint(p_fp, s_fp, p_mp, s_mp, (x,))
        flow = _head(p_fp, s_fp, (x,))
        logit = _head(p_mp, s_mp, (x,))
        np.testing.assert_allclose(np.asarray(flow_j), np.asarray(flow),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(logit_j), np.asarray(logit),
                                   rtol=2e-5, atol=2e-5)

        # concat-free fan-in: [B,N,Ca] local + [B,Cb] broadcast parts ==
        # the materialized concat
        ca = width // 2
        g = jnp.asarray(rng.randn(b, width - ca).astype(np.float32))
        x_cat = jnp.concatenate(
            [x[..., :ca], jnp.broadcast_to(g[:, None], (b, n, width - ca))],
            axis=-1)
        flow_p, logit_p = _heads_joint(p_fp, s_fp, p_mp, s_mp,
                                       (x[..., :ca], g))
        flow_c, logit_c = _heads_joint(p_fp, s_fp, p_mp, s_mp, (x_cat,))
        np.testing.assert_allclose(np.asarray(flow_p), np.asarray(flow_c),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(logit_p), np.asarray(logit_c),
                                   rtol=2e-5, atol=2e-5)


class TestShardedServing:
    def test_8way_fused_engine_matches_single(self, rng):
        """The Pallas serving engine under shard_map on the fake 8-device
        mesh (params replicated, batch sharded) == the unsharded engine —
        the multi-chip serving configuration (SURVEY §2.3: DP over ICI)."""
        from jax.sharding import PartitionSpec as P

        from cmflow_tpu.parallel import mesh as meshlib

        b, n = 8, 128
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        model = build_model("cmflow")
        v = _with_real_stats(model, (pc1, pc2, ft1, ft2, None))

        ref = cmflow_infer(v, pc1, pc2, ft1, ft2, interpret=True)

        mesh = meshlib.make_mesh()
        d = P(meshlib.DATA_AXIS)

        def fwd(v_, a, b_, c, e):
            return cmflow_infer(v_, a, b_, c, e, interpret=True)

        # check_vma=False: pallas_call's out_shape carries no varying-
        # mesh-axes annotation, so shard_map's vma checker must be off
        # (the documented escape hatch) — real multi-chip serving needs
        # the same flag
        fn = jax.jit(jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), d, d, d, d),
            out_specs=d,
            check_vma=False,
        ))
        got = fn(v, pc1, pc2, ft1, ft2)
        for a, c in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=1e-5)
