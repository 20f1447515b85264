"""Model-level tests: shapes, parameter parity with the reference
architecture, jit-ability, and padded/unpadded equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmflow_tpu.models import build_model

# Parameter counts hand-derived from the reference layer dims
# (models/cmflow.py:21-48 etc.).  CMFlow_T differs from torch by -512: flax
# GRUCell folds the redundant b_hr/b_hz biases (torch keeps b_ih AND b_hh).
CMFLOW_PARAMS = 4_228_560
RAFLOW_PARAMS = 4_055_568
CMFLOW_T_PARAMS = CMFLOW_PARAMS + 394_752 - 512


def make_inputs(rng, b=2, n=64):
    pc1 = jnp.array(rng.randn(b, n, 3).astype(np.float32) * 5)
    pc2 = jnp.array(rng.randn(b, n, 3).astype(np.float32) * 5)
    ft1 = jnp.array(rng.randn(b, n, 3).astype(np.float32))
    ft2 = jnp.array(rng.randn(b, n, 3).astype(np.float32))
    interval = jnp.full((b,), 0.1, jnp.float32)
    return pc1, pc2, ft1, ft2, interval


def n_params(variables):
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


class TestCMFlow:
    def test_shapes_and_params(self, rng):
        pc1, pc2, ft1, ft2, _ = make_inputs(rng)
        m = build_model("cmflow")
        v = m.init({"params": jax.random.PRNGKey(0)}, pc1, pc2, ft1, ft2,
                   None, False)
        assert n_params(v) == CMFLOW_PARAMS
        sf, cls, trans, mask = m.apply(v, pc1, pc2, ft1, ft2, None, False)
        assert sf.shape == (2, 64, 3)
        assert cls.shape == (2, 64)
        assert trans.shape == (2, 4, 4)
        assert mask.shape == (2, 64) and mask.dtype == jnp.bool_
        # stat_cls are probabilities
        assert (np.asarray(cls) >= 0).all() and (np.asarray(cls) <= 1).all()
        # bottom row of the transform is [0,0,0,1]
        np.testing.assert_allclose(np.asarray(trans)[:, 3], [[0, 0, 0, 1]] * 2,
                                   atol=1e-6)

    def test_static_points_get_rigid_flow(self, rng):
        pc1, pc2, ft1, ft2, _ = make_inputs(rng)
        m = build_model("cmflow")
        v = m.init({"params": jax.random.PRNGKey(0)}, pc1, pc2, ft1, ft2,
                   None, False)
        sf, cls, trans, mask = m.apply(v, pc1, pc2, ft1, ft2, None, False)
        sf, cls, trans, mask = map(np.asarray, (sf, cls, trans, mask))
        # for masked-static points, sf must equal the rigid flow of trans
        h = np.concatenate([np.asarray(pc1), np.ones((2, 64, 1))], -1)
        rigid = np.einsum("bij,bnj->bni", trans, h)[..., :3] - np.asarray(pc1)
        if mask.any():
            np.testing.assert_allclose(sf[mask], rigid[mask], atol=1e-4)

    def test_train_mode_label_scores_and_batchstats(self, rng):
        pc1, pc2, ft1, ft2, _ = make_inputs(rng)
        label_m = jnp.array((rng.rand(2, 64) > 0.5).astype(np.float32))
        m = build_model("cmflow")
        v = m.init({"params": jax.random.PRNGKey(0)}, pc1, pc2, ft1, ft2,
                   label_m, True)
        out, mutated = m.apply(v, pc1, pc2, ft1, ft2, label_m, True,
                               mutable=["batch_stats"])
        sf, cls, trans, mask = out
        # in train mode the binary mask comes from the label, not stat_cls
        np.testing.assert_array_equal(np.asarray(mask),
                                      np.asarray(label_m) > 0.5)
        # batch stats were updated
        old = jax.tree_util.tree_leaves(v["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(old, new)
        )

    def test_padding_equivalence(self, rng):
        """Padded static-shape eval must reproduce the unpadded outputs on
        the real points — the core of the TPU static-shape design."""
        b, n_real, n_pad = 1, 48, 64
        pc1, pc2, ft1, ft2, _ = make_inputs(rng, b, n_real)
        m = build_model("cmflow")
        v = m.init({"params": jax.random.PRNGKey(0)}, pc1, pc2, ft1, ft2,
                   None, False)
        sf_u, cls_u, trans_u, mask_u = m.apply(
            v, pc1, pc2, ft1, ft2, None, False
        )

        def pad(x):
            # garbage padding far away from the scene
            fill = np.full((b, n_pad - n_real, x.shape[-1]), 777.0, np.float32)
            return jnp.concatenate([x, jnp.array(fill)], axis=1)

        valid = jnp.array(
            np.arange(n_pad)[None] < n_real
        )
        sf_p, cls_p, trans_p, mask_p = m.apply(
            v, pad(pc1), pad(pc2), pad(ft1), pad(ft2), None, False,
            valid1=valid, valid2=valid,
        )
        np.testing.assert_allclose(np.asarray(sf_p)[:, :n_real],
                                   np.asarray(sf_u), atol=2e-3)
        np.testing.assert_allclose(np.asarray(cls_p)[:, :n_real],
                                   np.asarray(cls_u), atol=2e-3)
        np.testing.assert_allclose(np.asarray(trans_p), np.asarray(trans_u),
                                   atol=2e-3)
        assert not np.asarray(mask_p)[:, n_real:].any()


class TestRaFlow:
    def test_shapes_and_params(self, rng):
        pc1, pc2, ft1, ft2, interval = make_inputs(rng)
        m = build_model("raflow")
        v = m.init({"params": jax.random.PRNGKey(0)}, pc1, pc2, ft1, ft2,
                   interval, False)
        assert n_params(v) == RAFLOW_PARAMS
        out, sf, trans, mask = m.apply(v, pc1, pc2, ft1, ft2, interval, False)
        assert out.shape == (2, 64, 3)
        assert sf.shape == (2, 64, 3)
        assert trans.shape == (2, 4, 4)
        assert mask.dtype == jnp.bool_

    def test_jit(self, rng):
        pc1, pc2, ft1, ft2, interval = make_inputs(rng)
        m = build_model("raflow")
        v = m.init({"params": jax.random.PRNGKey(0)}, pc1, pc2, ft1, ft2,
                   interval, False)
        f = jax.jit(lambda v, *a: m.apply(v, *a, False))
        out = f(v, pc1, pc2, ft1, ft2, interval)
        out2 = m.apply(v, pc1, pc2, ft1, ft2, interval, False)
        for a, b in zip(out, out2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestCMFlowT:
    def test_shapes_params_and_carry(self, rng):
        pc1, pc2, ft1, ft2, _ = make_inputs(rng)
        m = build_model("cmflow_t")
        g0 = jnp.zeros((2, 256))
        v = m.init({"params": jax.random.PRNGKey(0)}, pc1, pc2, ft1, ft2,
                   None, False, g0)
        assert n_params(v) == CMFLOW_T_PARAMS
        sf, cls, trans, mask, g1 = m.apply(v, pc1, pc2, ft1, ft2, None,
                                           False, g0)
        assert g1.shape == (2, 256)
        # feeding the evolved carry changes the prediction
        sf2, *_ = m.apply(v, pc1, pc2, ft1, ft2, None, False, g1)
        assert not np.allclose(np.asarray(sf), np.asarray(sf2))


class TestComputeDtype:
    def test_bfloat16_forward_close_to_float32(self):
        """compute_dtype=bfloat16 keeps params/BN f32 and matches the f32
        forward within bf16 mantissa error (params are shared)."""
        import types

        import jax
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        b, n = 2, 64
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))

        m32 = build_model("cmflow")
        m16 = build_model(
            "cmflow", types.SimpleNamespace(compute_dtype="bfloat16"))
        v = m32.init({"params": jax.random.PRNGKey(0)},
                     pc1, pc2, ft1, ft2, None, False)
        # identical param tree: bf16 is a compute dtype, not a param dtype
        v16 = m16.init({"params": jax.random.PRNGKey(0)},
                       pc1, pc2, ft1, ft2, None, False)
        for a, c in zip(jax.tree_util.tree_leaves(v["params"]),
                        jax.tree_util.tree_leaves(v16["params"])):
            assert a.dtype == c.dtype == jnp.float32

        o32 = m32.apply(v, pc1, pc2, ft1, ft2, None, False)
        o16 = m16.apply(v, pc1, pc2, ft1, ft2, None, False)
        cls32, cls16 = np.asarray(o32[1]), np.asarray(o16[1])
        assert cls16.dtype == np.float32
        np.testing.assert_allclose(cls32, cls16, atol=2e-2)
        tr32, tr16 = np.asarray(o32[2]), np.asarray(o16[2])
        np.testing.assert_allclose(tr32, tr16, atol=2e-2)

    def test_batchnorm_computes_in_f32_under_bf16(self):
        """Structural guard on the round-4 TPU convergence fix: every
        BatchNorm in the model must COMPUTE in f32 even when
        compute_dtype=bfloat16 (i.e. receive no bf16 ``dtype`` and emit
        f32; nn/blocks.py, docs/PERF.md "bf16 train-path convergence").
        Running BN natively in bf16 on the TPU VPU stalls/diverges
        training for every family; the CPU emitter internally evaluates
        bf16 elementwise math in f32, so CPU gates can NEVER catch a
        reintroduction numerically — this asserts the structure instead.
        """
        import types

        import flax.linen as fnn
        import jax
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        b, n = 2, 64
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))

        m16 = build_model(
            "cmflow", types.SimpleNamespace(compute_dtype="bfloat16"))
        v = m16.init({"params": jax.random.PRNGKey(0)},
                     pc1, pc2, ft1, ft2, None, False)
        # train mode — the constraint is about the TRAIN-path BN math
        _, mut = m16.apply(
            v, pc1, pc2, ft1, ft2, None, True,
            mutable=["batch_stats", "intermediates"],
            capture_intermediates=lambda mdl, _: isinstance(
                mdl, fnn.BatchNorm),
        )
        bn_outs = jax.tree_util.tree_leaves(mut["intermediates"])
        assert bn_outs, "no BatchNorm intermediates captured"
        for out in bn_outs:
            assert out.dtype == jnp.float32, (
                "BatchNorm emitted %s under compute_dtype=bfloat16 — the "
                "TPU bf16-BN convergence bug is back (docs/PERF.md 'bf16 "
                "train-path convergence')" % out.dtype)

    def test_prepool_boundary_f32_in_train_bf16(self):
        """Structural guard on the round-5 bf16-chain fix: in TRAIN mode
        under compute_dtype=bfloat16 the final BN'd layer of every
        PointwiseMLP (the pre-pool boundary) must emit f32 — re-rounding
        it to bf16 stalls TPU training (docs/PERF.md 'bf16 train-path
        convergence', round-5 bisection: full/nopre stall, lastf32
        converges).  In EVAL mode the boundary stays bf16 (the certified
        serving numerics)."""
        import types

        import jax
        import jax.numpy as jnp

        from cmflow_tpu.nn.blocks import PointwiseMLP

        rng = np.random.RandomState(0)
        b, n = 2, 64
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        m16 = build_model(
            "cmflow", types.SimpleNamespace(compute_dtype="bfloat16"))
        v = m16.init({"params": jax.random.PRNGKey(0)},
                     pc1, pc2, ft1, ft2, None, False)
        filt = (lambda mdl, _: isinstance(mdl, PointwiseMLP)
                and mdl.use_bn and mdl.dtype is not None)
        _, mut_t = m16.apply(
            v, pc1, pc2, ft1, ft2, None, True,
            mutable=["batch_stats", "intermediates"],
            capture_intermediates=filt)
        outs_t = jax.tree_util.tree_leaves(mut_t["intermediates"])
        assert outs_t, "no BN'd PointwiseMLP intermediates captured"
        assert all(o.dtype == jnp.float32 for o in outs_t), (
            "train-mode pre-pool boundary re-rounded to bf16 — the "
            "round-5 bf16 stall is back")
        _, mut_e = m16.apply(
            v, pc1, pc2, ft1, ft2, None, False,
            mutable=["intermediates"], capture_intermediates=filt)
        outs_e = jax.tree_util.tree_leaves(mut_e["intermediates"])
        assert outs_e and all(o.dtype == jnp.bfloat16 for o in outs_e), (
            "eval-mode boundary dtype changed — serving parity tables "
            "no longer describe this tree")

    def test_bf16_chain_knob_arms(self):
        """Each CMFLOW_BF16_CHAIN bisection arm produces its documented
        train-mode boundary dtypes (guards the knob against rot — the
        arms are how a future bf16 regression gets re-bisected)."""
        import os
        import types

        import jax
        import jax.numpy as jnp

        from cmflow_tpu.nn.blocks import PointwiseMLP

        rng = np.random.RandomState(0)
        b, n = 2, 48
        pc1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 5)
        pc2 = pc1 + jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)
        ft1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        ft2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        m16 = build_model(
            "cmflow", types.SimpleNamespace(compute_dtype="bfloat16"))
        v = m16.init({"params": jax.random.PRNGKey(0)},
                     pc1, pc2, ft1, ft2, None, False)
        filt = (lambda mdl, _: isinstance(mdl, PointwiseMLP)
                and mdl.use_bn and mdl.dtype is not None)

        def final_layer_dtypes(mode):
            os.environ["CMFLOW_BF16_CHAIN"] = mode
            try:
                _, mut = m16.apply(
                    v, pc1, pc2, ft1, ft2, None, True,
                    mutable=["batch_stats", "intermediates"],
                    capture_intermediates=filt)
            finally:
                del os.environ["CMFLOW_BF16_CHAIN"]
            return {jnp.dtype(o.dtype) for o
                    in jax.tree_util.tree_leaves(mut["intermediates"])}

        # full: every boundary (incl. pre-pool) re-rounds to bf16
        assert final_layer_dtypes("full") == {jnp.dtype(jnp.bfloat16)}
        # f32act / r2: no boundary re-rounds at all
        assert final_layer_dtypes("f32act") == {jnp.dtype(jnp.float32)}
        assert final_layer_dtypes("r2") == {jnp.dtype(jnp.float32)}
        # lastf32 == auto-in-train: final BN'd layer f32
        assert final_layer_dtypes("lastf32") == {jnp.dtype(jnp.float32)}


class TestRemat:
    @pytest.mark.parametrize("mode", [True, "dots"])
    def test_remat_grads_and_stats_match(self, rng, mode):
        """remat=True (recompute grouped chains in backward) and
        remat="dots" (save only neighbor indices / gather outputs /
        pre-BN dots, recompute the BN+activation slices) are bit-exact
        vs the default: same loss, same grads, same BN stat updates.
        (Under jit the checkpoint boundary changes XLA fusion and adds
        ~1e-5 reassociation noise — exactness is pinned untraced.)"""
        from types import SimpleNamespace

        b, n = 2, 64
        pc1 = jnp.array(rng.rand(b, n, 3).astype(np.float32) * 10)
        pc2 = pc1 + 0.1
        ft = jnp.array(rng.randn(b, n, 3).astype(np.float32))

        def run(remat):
            m = build_model("cmflow", SimpleNamespace(remat=remat))
            v = m.init({"params": jax.random.PRNGKey(0)},
                       pc1, pc2, ft, ft, None, True)

            def loss(p):
                (sf, cls, tr, _), mut = m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    pc1, pc2, ft, ft, None, True,
                    mutable=["batch_stats"])
                return jnp.sum(sf ** 2) + jnp.sum(cls) + jnp.sum(tr), mut

            (l, mut), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
            return l, g, mut

        l0, g0, s0 = run(False)
        l1, g1, s1 = run(mode)
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        for a, b_ in zip(jax.tree_util.tree_leaves(s0),
                         jax.tree_util.tree_leaves(s1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
