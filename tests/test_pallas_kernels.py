"""Oracle tests for the Pallas TPU kernels (run in interpreter mode on the
CPU test mesh; the same code compiles with Mosaic on TPU — see
.claude/skills/verify for the on-hardware drive)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpugan_tpu.ops.pallas.fps_kernel import fps_pallas
from tpugan_tpu.ops.pallas.knn_kernel import knn_pallas


def test_knn_pallas_matches_oracle(rng):
    q = jnp.asarray(rng.standard_normal((2, 200, 3)).astype(np.float32))
    bias = jnp.zeros((2, 200), jnp.float32)
    d2, idx = knn_pallas(q, q, bias, 8)
    d_np = np.sum((np.asarray(q)[:, :, None] - np.asarray(q)[:, None]) ** 2, -1)
    idx_np = np.argsort(d_np, axis=2, kind="stable")[:, :, :8]
    np.testing.assert_array_equal(np.asarray(idx), idx_np)
    np.testing.assert_allclose(
        np.asarray(d2), np.sort(d_np, 2)[:, :, :8], atol=1e-4
    )


def test_knn_pallas_mask_and_padding(rng):
    # Nq not a multiple of the 128-row tile exercises the padding path
    q = jnp.asarray(rng.standard_normal((1, 150, 3)).astype(np.float32))
    valid = np.ones((1, 150), bool)
    valid[:, 100:] = False
    bias = jnp.where(jnp.asarray(valid), 0.0, 1e10)
    _, idx = knn_pallas(q, q, bias, 6)
    assert np.all(np.asarray(idx) < 100)


def test_knn_pallas_feature_space(rng):
    f = jnp.asarray(rng.standard_normal((1, 130, 32)).astype(np.float32))
    _, idx = knn_pallas(f, f, jnp.zeros((1, 130)), 9)
    d_np = np.sum((np.asarray(f)[0][:, None] - np.asarray(f)[0][None]) ** 2, -1)
    np.testing.assert_array_equal(
        np.asarray(idx)[0], np.argsort(d_np, 1, kind="stable")[:, :9]
    )


def test_knn_pallas_gradient(rng):
    q = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 80, 3)).astype(np.float32))
    bias = jnp.zeros((1, 80), jnp.float32)

    def f(q, c):
        d2, _ = knn_pallas(q, c, bias, 4)
        return jnp.sum(d2)

    gq, gc = jax.grad(f, argnums=(0, 1))(q, c)
    # numeric check against the XLA reference implementation
    from tpugan_tpu.ops.neighbors import knn

    def f_ref(q, c):
        d2, _ = knn(q, c, 4)
        return jnp.sum(d2)

    gq_ref, gc_ref = jax.grad(f_ref, argnums=(0, 1))(q, c)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref), atol=1e-3)


def test_knn_pallas_chunked_matches_oracle(rng):
    # Nc >= _CHUNK_MIN_NC and k >= 3 dispatches the chunked fold-peel
    q = jnp.asarray(rng.standard_normal((1, 256, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 4096, 16)).astype(np.float32))
    bias = jnp.zeros((1, 4096), jnp.float32)
    d2, idx = knn_pallas(q, c, bias, 20)
    d_np = np.sum(
        (np.asarray(q)[0][:, None] - np.asarray(c)[0][None]) ** 2, -1
    )
    np.testing.assert_array_equal(
        np.asarray(idx)[0], np.argsort(d_np, 1, kind="stable")[:, :20]
    )
    np.testing.assert_allclose(
        np.asarray(d2)[0], np.sort(d_np, 1)[:, :20], rtol=1e-4, atol=1e-4
    )


def test_knn_pallas_chunked_certificate_fallback(rng):
    # Adversarial layout: the entire top-k of every query lives in ONE
    # lane column (global indices i*128 + 5), so more than kp of the true
    # top-k land in a single chunk, the certificate fails, and the
    # pl.when fallback peel must produce the exact answer.
    from tpugan_tpu.ops.pallas.knn_kernel import _chunk_kp

    k = 12
    assert _chunk_kp(k) < k
    nc = 4096
    c_np = rng.standard_normal((1, nc, 3)).astype(np.float32) * 100.0
    q_np = rng.standard_normal((1, 130, 3)).astype(np.float32) * 0.01
    for j in range(k):
        # plant the true neighbors at lane 5 of successive 128-chunks
        c_np[0, j * 128 + 5] = 0.001 * j
    d2, idx = knn_pallas(
        jnp.asarray(q_np), jnp.asarray(c_np), jnp.zeros((1, nc)), k
    )
    d_np = np.sum((q_np[0][:, None] - c_np[0][None]) ** 2, -1)
    np.testing.assert_array_equal(
        np.asarray(idx)[0], np.argsort(d_np, 1, kind="stable")[:, :k]
    )


def test_knn_pallas_partial_unroll_identical(rng, monkeypatch):
    # TPUGAN_KNN_FOLD_UNROLL=<U> partially unrolls the fold loop (U tiles
    # per fori_loop step + static remainder); results must be bit-identical
    # to the default schedule. S = 4096/128 = 32 tiles, U=5 leaves a
    # 2-tile remainder.
    q = jnp.asarray(rng.standard_normal((1, 256, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 4096, 8)).astype(np.float32))
    bias = jnp.zeros((1, 4096), jnp.float32)
    d2_ref, idx_ref = knn_pallas(q, c, bias, 20)
    monkeypatch.setenv("TPUGAN_KNN_FOLD_UNROLL", "5")
    d2, idx = knn_pallas(q, c, bias, 20)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d2_ref))


def test_fps_pallas_matches_greedy(rng):
    pos = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
    pen = jnp.zeros((2, 300), jnp.float32)
    start = jnp.zeros((2,), jnp.int32)
    fidx = np.asarray(fps_pallas(pos, 32, pen, start))
    p0 = np.asarray(pos)
    for b in range(2):
        sel = [0]
        mind = np.sum((p0[b] - p0[b, 0]) ** 2, -1)
        for _ in range(31):
            nxt = int(np.argmax(mind))
            sel.append(nxt)
            mind = np.minimum(mind, np.sum((p0[b] - p0[b, nxt]) ** 2, -1))
        np.testing.assert_array_equal(fidx[b], sel)


def test_fps_pallas_unrolled_schedule_identical(rng):
    # The TPU path statically unrolls 8 dependent rounds per fori_loop
    # iteration (scalar-core overhead amortization); m=30 is not a multiple
    # of 8 so the overshoot-masking in ``record`` is exercised too.
    pos = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
    pen = jnp.zeros((2, 300), jnp.float32)
    start = jnp.zeros((2,), jnp.int32)
    rolled = np.asarray(fps_pallas(pos, 30, pen, start, unroll_group=1))
    unrolled = np.asarray(fps_pallas(pos, 30, pen, start, unroll_group=8))
    np.testing.assert_array_equal(rolled, unrolled)


def test_fps_pallas_batched_identical(rng):
    # The batched-rows kernel (all B rows advance per round, full sublane
    # use) must select bit-identically to the per-batch grid kernel,
    # including penalty handling, random starts, and the unrolled schedule.
    from tpugan_tpu.ops.pallas.fps_kernel import fps_pallas_batched

    pos = jnp.asarray(rng.standard_normal((3, 300, 3)).astype(np.float32))
    pen = jnp.where(jnp.arange(300)[None] < 250, 0.0, -1e10)
    pen = jnp.broadcast_to(pen, (3, 300)).astype(jnp.float32)
    start = jnp.asarray(rng.integers(0, 250, 3).astype(np.int32))
    for ug in (1, 8):
        a = fps_pallas(pos, 48, pen, start, unroll_group=ug)
        b = fps_pallas_batched(pos, 48, pen, start, unroll_group=ug)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.asarray(b) < 250)


def test_fps_pallas_respects_penalty(rng):
    pos = jnp.asarray(rng.standard_normal((1, 100, 3)).astype(np.float32) )
    pos = pos.at[:, 60:].set(999.0)
    pen = jnp.where(jnp.arange(100)[None] < 60, 0.0, -1e10)
    idx = np.asarray(fps_pallas(pos, 40, pen, jnp.zeros((1,), jnp.int32)))
    assert np.all(idx < 60)
    assert len(np.unique(idx[0])) == 40


def test_ball_query_pallas_matches_reference_semantics(rng):
    from tpugan_tpu.ops.pallas.ball_query_kernel import ball_query_pallas

    q = jnp.asarray(rng.standard_normal((1, 40, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 70, 3)).astype(np.float32))
    r, ns = 0.9, 6
    idx = np.asarray(ball_query_pallas(q, c, r, ns, jnp.zeros((1, 70))))
    d2 = np.sum((np.asarray(q)[0][:, None] - np.asarray(c)[0][None]) ** 2, -1)
    for i in range(40):
        hits = np.nonzero(d2[i] < r * r)[0][:ns]
        if len(hits) == 0:
            np.testing.assert_array_equal(idx[0, i], 0)
        else:
            pad = np.full(ns - len(hits), hits[0])
            np.testing.assert_array_equal(idx[0, i], np.concatenate([hits, pad]))


def test_ball_query_pallas_respects_mask(rng):
    from tpugan_tpu.ops.pallas.ball_query_kernel import ball_query_pallas

    q = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32) * 0.1)
    bias = jnp.where(jnp.arange(32)[None] < 20, 0.0, 2.0)
    idx = np.asarray(ball_query_pallas(q, c, 1.0, 8, bias))
    assert np.all(idx < 20)


def test_edgeconv_fused_matches_reference(rng):
    # Fused post-gather EdgeConv (affines + SharedMLP + aggregation in one
    # kernel) vs the identical-math XLA formulation, values and gradients.
    from tpugan_tpu.ops.pallas.edgeconv_kernel import (
        _reference_impl,
        edgeconv_fused,
    )

    b, n, k, c, h, o = 1, 32, 12, 16, 8, 24
    nbr = jnp.asarray(rng.standard_normal((b, k, n, c)).astype(np.float32))
    ctr = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((c, h)).astype(np.float32) * 0.2)
    we = jnp.asarray(rng.standard_normal((c, h)).astype(np.float32) * 0.2)
    w1 = jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((h, o)).astype(np.float32) * 0.2)

    out = edgeconv_fused(nbr, ctr, wn, we, w1, w2, aggregate="max")
    ref = _reference_impl(nbr, ctr, wn, we, w1, w2, aggregate="max",
                          cdt=jnp.float32)
    assert out.shape == (b, n, o)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda x: jnp.sum(
        edgeconv_fused(x, ctr, wn, we, w1, w2, aggregate="max")))(nbr)
    gr = jax.grad(lambda x: jnp.sum(
        _reference_impl(x, ctr, wn, we, w1, w2, aggregate="max",
                        cdt=jnp.float32)))(nbr)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=2e-5, atol=2e-5)


def test_edgeconv_fused_no_mlp_sum(rng):
    from tpugan_tpu.ops.pallas.edgeconv_kernel import (
        _reference_impl,
        edgeconv_fused,
    )

    b, n, k, c, h = 1, 16, 8, 8, 4
    nbr = jnp.asarray(rng.standard_normal((b, k, n, c)).astype(np.float32))
    ctr = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((c, h)).astype(np.float32) * 0.3)
    we = jnp.asarray(rng.standard_normal((c, h)).astype(np.float32) * 0.3)
    out = edgeconv_fused(nbr, ctr, wn, we, None, None, aggregate="sum")
    ref = _reference_impl(nbr, ctr, wn, we, None, None, aggregate="sum",
                          cdt=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_edgeconv_module_fused_matches_xla_path(rng):
    # EdgeConv(train=False) auto-enables the fused kernel; its output must
    # match the train-path XLA formulation with the same params.
    from tpugan_tpu.nn.edgeconv import EdgeConv

    feat = jnp.asarray(rng.standard_normal((1, 48, 16)).astype(np.float32))
    m = EdgeConv(24, k=10)
    v = m.init(jax.random.PRNGKey(0), feat, train=True)
    out_xla = m.apply(v, feat, train=True)
    out_fused = m.apply(v, feat, train=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-4)

def test_edgeconv_fused_pallas_backward(rng):
    # The dedicated backward kernel (edgeconv_kernel._bwd_pallas) vs the
    # XLA reference VJP: all six gradients, max (tie-splitting rule) and
    # sum aggregation, mlp and no-mlp variants.
    from tpugan_tpu.ops.pallas.edgeconv_kernel import (
        _bwd_pallas,
        _reference_impl,
    )

    for (b, n, k, c, h, o, agg, mlp) in [
        (1, 32, 12, 16, 8, 24, "max", True),
        (1, 32, 9, 8, 4, 4, "sum", False),
    ]:
        nbr = jnp.asarray(rng.standard_normal((b, k, n, c)).astype(np.float32))
        ctr = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
        wn = jnp.asarray(rng.standard_normal((c, h)).astype(np.float32) * .3)
        we = jnp.asarray(rng.standard_normal((c, h)).astype(np.float32) * .3)
        w1 = (jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * .3)
              if mlp else None)
        w2 = (jnp.asarray(rng.standard_normal((h, o)).astype(np.float32) * .3)
              if mlp else None)
        g = jnp.asarray(rng.standard_normal(
            (b, n, o if mlp else h)).astype(np.float32))

        got = _bwd_pallas(nbr, ctr, wn, we, w1, w2, g,
                          aggregate=agg, cdt=jnp.float32)
        assert got is not None
        ref_fn = lambda *a: _reference_impl(*a, aggregate=agg,
                                            cdt=jnp.float32)
        _, vjp = jax.vjp(ref_fn, nbr, ctr, wn, we, w1, w2)
        want = vjp(g)
        for i, (a, b_) in enumerate(zip(got, want)):
            if a is None:
                assert b_ is None or float(jnp.max(jnp.abs(b_))) == 0.0
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=3e-5, atol=3e-5,
                                       err_msg=f"agg={agg} arg{i}")
