"""Point-axis sharded serving on the 8-device virtual CPU mesh: the
sharded rollout step must equal the single-device step exactly (VERDICT r3
§2.4 — wire the N-axis sharded ops into a product path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan_tpu.eval.rollout import make_rollout_step
from tpugan_tpu.models.generator import RolloutMaskState, SRNet
from tpugan_tpu.parallel.mesh import make_mesh
from tpugan_tpu.parallel.sharded_serving import (
    make_sharded_rollout_step,
    rollout_sequence_sharded,
)

# compile-heavy tier — deselect with -m 'not slow' for the quick unit run
pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _model(in_feats=3):
    return SRNet(in_feats=in_feats, node_emb_dim=32, upsample_ratio=4)


def _cloud(rng, n):
    return (rng.standard_normal((1, n, 3)) * 0.3).astype(np.float32)


def test_sharded_rollout_step_matches_unsharded(rng):
    """Two frames through the mask ring: sharded outputs (pos, valid, ring
    state) must match the single-device rollout step — the sharded graph
    build sees the identical candidate set per query row (valid masks
    exactly equal); positions tolerate ulp-level drift from the centroid's
    psum-of-partials reduction order (measured max 3e-8)."""
    mesh = make_mesh()
    n = 512  # divisible by 8 devices
    model = _model()
    pos = _cloud(rng, n)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.asarray(pos), jnp.asarray(pos), False)

    ref_step = make_rollout_step(model, use_vel=False)
    sh_step = make_sharded_rollout_step(model, use_vel=False, mesh=mesh)

    ref_state = RolloutMaskState.create(1, n, 5, track_valid=True)
    sh_state = RolloutMaskState.create(1, n, 5, track_valid=True)
    nv = jnp.int32(n)
    for f in range(2):
        frame = jnp.asarray(_cloud(rng, n) if f else pos)
        vel = jnp.zeros_like(frame)
        ref_out, ref_valid, ref_state = ref_step(
            variables, ref_state, frame, vel, nv)
        sh_out, sh_valid, sh_state = sh_step(
            variables, sh_state, frame, vel, nv)
        np.testing.assert_array_equal(np.asarray(sh_valid),
                                      np.asarray(ref_valid))
        np.testing.assert_allclose(np.asarray(sh_out), np.asarray(ref_out),
                                   rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_state.buffer),
                               np.asarray(ref_state.buffer), rtol=0,
                               atol=1e-6)


def test_sharded_rollout_step_alignment_padding(rng):
    """Sentinel pad rows (n_valid < N) must stay invalid and not perturb
    real rows' outputs relative to the unsharded padded step."""
    mesh = make_mesh()
    n, n_valid = 512, 450
    model = _model()
    pos = _cloud(rng, n)
    pos[:, n_valid:] = 999.0
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(pos),
                           jnp.asarray(pos), False)

    ref_step = make_rollout_step(model, use_vel=False)
    sh_step = make_sharded_rollout_step(model, use_vel=False, mesh=mesh)
    nv = jnp.int32(n_valid)
    vel = jnp.zeros_like(jnp.asarray(pos))
    ref_out, ref_valid, _ = ref_step(
        variables, RolloutMaskState.create(1, n, 5, track_valid=True),
        jnp.asarray(pos), vel, nv)
    sh_out, sh_valid, _ = sh_step(
        variables, RolloutMaskState.create(1, n, 5, track_valid=True),
        jnp.asarray(pos), vel, nv)
    np.testing.assert_array_equal(np.asarray(sh_valid), np.asarray(ref_valid))
    r = model.upsample_ratio
    assert not np.asarray(sh_valid)[0, n_valid * r:].any()
    np.testing.assert_allclose(
        np.asarray(sh_out)[0][np.asarray(sh_valid)[0]],
        np.asarray(ref_out)[0][np.asarray(ref_valid)[0]], rtol=0, atol=1e-5)


def test_rollout_sequence_sharded_end_to_end(rng):
    """Sequence driver: pads to devices*ALIGN, keeps the ring sharded, and
    matches the unsharded device rollout's per-frame valid clouds."""
    from tpugan_tpu.eval.rollout import rollout_sequence_device

    mesh = make_mesh()
    n, t = 450, 3  # deliberately unaligned
    model = _model()
    pos_seq = np.stack([_cloud(rng, n)[0] for _ in range(t)])
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.asarray(pos_seq[:1]),
                           jnp.asarray(pos_seq[:1]), False)
    ref = rollout_sequence_device(model, variables, pos_seq, None,
                                  use_vel=False, history=5, chunk=t)
    got = rollout_sequence_sharded(model, variables, pos_seq, None,
                                   mesh=mesh, use_vel=False, history=5)
    assert len(got) == len(ref) == t
    for g, r_ in zip(got, ref):
        assert g.shape == r_.shape
        np.testing.assert_allclose(g, r_, rtol=0, atol=1e-5)


def test_rollout_sequence_sharded_pipelining_backpressure(rng):
    """The async D2H pipeline (copy_to_host_async + bounded pending queue)
    must be output-identical to the serial dispatch-fetch loop at every
    queue bound: frame ordering, mask-ring carry between frames, and drain
    accounting cannot depend on how many fetches are in flight."""
    mesh = make_mesh()
    n, t = 512, 7  # t > max_pending so the bound actually engages mid-run
    model = _model()
    pos_seq = np.stack([_cloud(rng, n)[0] for _ in range(t)])
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.asarray(pos_seq[:1]),
                           jnp.asarray(pos_seq[:1]), False)

    def run(max_pending):
        return rollout_sequence_sharded(
            model, variables, pos_seq, None, mesh=mesh, use_vel=False,
            history=5, max_pending=max_pending)

    serial = run(0)
    assert len(serial) == t
    for bound in (1, 4):
        pipelined = run(bound)
        assert len(pipelined) == t
        for g, r_ in zip(pipelined, serial):
            np.testing.assert_array_equal(g, r_)
