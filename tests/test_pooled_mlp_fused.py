"""Fused grouped-MLP(+BN)+max-pool path (ops/pallas/pooled_mlp_kernel.py,
SharedMLP fused_pool, SetConv.fused): exactness against the plain XLA
formulation for values, gradients, and every piece of mutated state —
BN running averages and SpectralNorm u/sigma (the reference towers train
with both live; discriminator.py:82-232)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan_tpu.nn.setconv import SetConv
from tpugan_tpu.ops.pallas.pooled_mlp_kernel import (
    _ref_affine,
    _ref_bn_train,
    pooled_mlp_affine,
    pooled_mlp_bn_train,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_pooled_mlp_affine_matches_reference(rng):
    b, m, ns, c = 2, 64, 32, 7
    ws = [jnp.asarray(rng.standard_normal((7, 16)).astype(np.float32) * 0.3),
          jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32) * 0.3)]
    tbl = jnp.asarray(rng.standard_normal((b, m, ns, c)).astype(np.float32))
    a_s = [jnp.asarray(rng.standard_normal(16).astype(np.float32)),
           jnp.asarray(rng.standard_normal(24).astype(np.float32))]
    b_s = [jnp.asarray(rng.standard_normal(16).astype(np.float32)),
           jnp.asarray(rng.standard_normal(24).astype(np.float32))]
    out = pooled_mlp_affine(tbl, ws, a_s, b_s, slope=0.01)
    ref = _ref_affine(tbl, ws, a_s, b_s, 0.01)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.grad(lambda t: jnp.sum(pooled_mlp_affine(t, ws, a_s, b_s, 0.01)))(
        tbl)
    gr = jax.grad(lambda t: jnp.sum(_ref_affine(t, ws, a_s, b_s, 0.01)))(tbl)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=2e-5, atol=2e-5)


def test_pooled_mlp_bn_train_matches_reference(rng):
    b, m, ns, c = 2, 64, 32, 7
    ws = [jnp.asarray(rng.standard_normal((7, 16)).astype(np.float32) * 0.3),
          jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32) * 0.3)]
    tbl = jnp.asarray(rng.standard_normal((b, m, ns, c)).astype(np.float32))
    gam = [jnp.asarray(np.abs(rng.standard_normal(16)).astype(np.float32)
                       + 0.5),
           jnp.asarray(np.abs(rng.standard_normal(24)).astype(np.float32)
                       + 0.5)]
    bet = [jnp.asarray(rng.standard_normal(16).astype(np.float32)),
           jnp.asarray(rng.standard_normal(24).astype(np.float32))]
    pooled, mus, vars_ = pooled_mlp_bn_train(tbl, ws, gam, bet, slope=0.0)
    pr, mr, vr = _ref_bn_train(tbl, ws, gam, bet, 0.0, 1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pr),
                               rtol=1e-4, atol=1e-4)
    for a, bb in zip(mus, mr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)
    for a, bb in zip(vars_, vr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)

    def loss_f(t, w):
        p, _, _ = pooled_mlp_bn_train(t, w, gam, bet, 0.0)
        return jnp.sum(p * p)

    def loss_r(t, w):
        p, _, _ = _ref_bn_train(t, w, gam, bet, 0.0, 1e-5)
        return jnp.sum(p * p)

    gt, gw = jax.grad(loss_f, argnums=(0, 1))(tbl, tuple(ws))
    rt, rw = jax.grad(loss_r, argnums=(0, 1))(tbl, tuple(ws))
    # The dedicated Pallas backward accumulates the BN gradient moments
    # (S1/S2) sequentially across the grid while the XLA reference uses
    # tree reductions; against an f64 oracle BOTH sit at 1e-3..3e-3 max
    # relative error on this loss (sum(p^2) amplifies BN cancellation), so
    # the two f32 paths are compared at that noise floor.
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt),
                               rtol=5e-3, atol=5e-3)
    for a, bb in zip(gw, rw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-3, atol=5e-3)


def test_pooled_mlp_group_all_shape(rng):
    ws = [jnp.asarray(rng.standard_normal((7, 16)).astype(np.float32) * 0.3)]
    a_s = [jnp.ones((16,), jnp.float32)]
    b_s = [jnp.zeros((16,), jnp.float32)]
    tbl = jnp.asarray(rng.standard_normal((2, 1, 512, 7)).astype(np.float32))
    out = pooled_mlp_affine(tbl, ws, a_s, b_s, 0.0)
    ref = _ref_affine(tbl, ws, a_s, b_s, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sn", [True, False])
def test_setconv_fused_equivalence(rng, sn):
    """Fused SetConv == plain SetConv: same variable tree, same outputs,
    same BN running stats and SN u/sigma after a train call, same grads,
    same eval output on the evolved stats."""
    xyz = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32)
                      * 0.3)
    feat = jnp.asarray(rng.standard_normal((2, 256, 16)).astype(np.float32))
    mf = SetConv.ssg([32, 64], npoint=64, radius=0.4, nsample=32,
                     spectral_norm=sn, fused=True)
    mx = SetConv.ssg([32, 64], npoint=64, radius=0.4, nsample=32,
                     spectral_norm=sn, fused=False)
    v = mx.init(jax.random.PRNGKey(0), xyz, feat, train=False)
    vf = mf.init(jax.random.PRNGKey(0), xyz, feat, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(vf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    (nx1, y1), st1 = mx.apply(v, xyz, feat, train=True,
                              mutable=["batch_stats"])
    (nx2, y2), st2 = mf.apply(v, xyz, feat, train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(nx1), np.asarray(nx2))
    s1 = flax.traverse_util.flatten_dict(st1["batch_stats"])
    s2 = flax.traverse_util.flatten_dict(st2["batch_stats"])
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=str(k))

    def loss(mod, p):
        (_, y), _ = mod.apply({**v, "params": p}, xyz, feat, train=True,
                              mutable=["batch_stats"])
        return jnp.sum(y * y)

    g1 = flax.traverse_util.flatten_dict(
        jax.grad(lambda p: loss(mx, p))(v["params"]))
    g2 = flax.traverse_util.flatten_dict(
        jax.grad(lambda p: loss(mf, p))(v["params"]))
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=3e-3, atol=3e-3, err_msg=str(k))

    y1e = mx.apply({**v, "batch_stats": st1["batch_stats"]}, xyz, feat,
                   train=False)[1]
    y2e = mf.apply({**v, "batch_stats": st2["batch_stats"]}, xyz, feat,
                   train=False)[1]
    np.testing.assert_allclose(np.asarray(y1e), np.asarray(y2e),
                               rtol=2e-4, atol=2e-4)


def test_setconv_fused_group_all(rng):
    xyz = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32)
                      * 0.3)
    feat = jnp.asarray(rng.standard_normal((2, 256, 16)).astype(np.float32))
    mg_f = SetConv.ssg([32, 64], spectral_norm=True, fused=True)
    mg_x = SetConv.ssg([32, 64], spectral_norm=True, fused=False)
    v = mg_x.init(jax.random.PRNGKey(1), xyz, feat, train=False)
    (_, ya), _ = mg_x.apply(v, xyz, feat, train=True,
                            mutable=["batch_stats"])
    (_, yb), _ = mg_f.apply(v, xyz, feat, train=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=2e-4, atol=2e-4)


def test_pallas_backward_direct(rng):
    # The dedicated backward passes (_bwd_pallas_affine / _bwd_pallas_bn)
    # against the XLA reference VJP, on a well-conditioned mean loss:
    # leaky slope, 3-layer stack, and a group_all-like shape whose ns is
    # tiled (tn < ns exercises the cross-tile tie-count pass).
    from tpugan_tpu.ops.pallas.pooled_mlp_kernel import (
        _bwd_pallas_affine, _bwd_pallas_bn, _bn_train_impl, _ref_affine,
        _ref_bn_train, pooled_mlp_affine,
    )

    for (b, m, ns, dims, slope) in [
        (2, 8, 16, (7, 16, 24), 0.2),
        (1, 1, 1024, (5, 8), 0.0),        # group_all: tn=512 < ns
    ]:
        tbl = jnp.asarray(rng.standard_normal((b, m, ns, dims[0]))
                          .astype(np.float32))
        ws = [jnp.asarray(rng.standard_normal((dims[i], dims[i + 1]))
                          .astype(np.float32) * 0.4)
              for i in range(len(dims) - 1)]
        l = len(ws)

        # ----- affine (a, b differentiable) -----
        a_s = [jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.2
                           + 1.0) for d in dims[1:]]
        b_s = [jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1)
               for d in dims[1:]]
        pooled = pooled_mlp_affine(tbl, ws, a_s, b_s, slope)
        g = jnp.asarray(rng.standard_normal(pooled.shape)
                        .astype(np.float32))
        got = _bwd_pallas_affine(tbl, tuple(ws), tuple(a_s), tuple(b_s),
                                 slope, pooled, g)
        assert got is not None
        _, vjp = jax.vjp(lambda t, w, a, bb: _ref_affine(t, w, a, bb, slope),
                         tbl, tuple(ws), tuple(a_s), tuple(b_s))
        want = vjp(g)
        for got_grp, want_grp, nm in zip(got, want, "t w a b"):
            got_list = got_grp if isinstance(got_grp, tuple) else [got_grp]
            want_list = (want_grp if isinstance(want_grp, tuple)
                         else [want_grp])
            for x, y in zip(got_list, want_list):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-4,
                    err_msg=f"affine {nm} dims={dims}")

        # ----- batch-norm train -----
        gam = [jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.2
                           + 1.0) for d in dims[1:]]
        bet = [jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1)
               for d in dims[1:]]
        pooled, mus, vars_ = _bn_train_impl(tbl, tuple(ws), tuple(gam),
                                            tuple(bet), slope, 1e-5)
        got = _bwd_pallas_bn(tbl, tuple(ws), tuple(gam), tuple(bet),
                             mus, vars_, slope, 1e-5, pooled, g)
        assert got is not None

        def ref_pooled(t, w, ga, be):
            p, _, _ = _ref_bn_train(t, w, ga, be, slope, 1e-5)
            return p

        _, vjp = jax.vjp(ref_pooled, tbl, tuple(ws), tuple(gam), tuple(bet))
        want = vjp(g)
        for got_grp, want_grp, nm in zip(got, want, ["t", "w", "gam", "bet"]):
            got_list = got_grp if isinstance(got_grp, tuple) else [got_grp]
            want_list = (want_grp if isinstance(want_grp, tuple)
                         else [want_grp])
            for x, y in zip(got_list, want_list):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-3,
                    err_msg=f"bn {nm} dims={dims}")
