"""Jit-compiled three-optimizer adversarial train steps.

Equivalents of the reference's ``tempo_gan_step`` / ``tempo_gan_step_no_mask``
(train_step_final.py:69-320) re-expressed as pure functions over a single
GanTrainState pytree:

* the data-dependent ``ml < 0.1`` adversarial gate (train_step_final.py:117)
  and the every-2nd-iteration discriminator update (:166) become
  ``lax.cond`` branches, so exactly like the reference no adversarial
  gradients flow and no BatchNorm/spectral-norm statistics move when a
  branch is off — and the step never leaves the device;
* all randomness (LSGAN label smoothing/flipping, rotations, point-order
  shuffles, dropout) comes from explicit jax.random keys instead of global
  numpy/torch RNG;
* the three per-frame generator forwards run as one ``vmap`` over the frame
  axis (one batched kernel schedule instead of a Python loop).

Batch layout (produced by tpugan_tpu.data): dict with
  lowres_pos  [F, B, n, 3]     highres_pos [F, B, m, 3]
  lowres_vel  [F, B, n, 3]     highres_vel [F, B, m, 3]   (fluid only)
with F = 3 frames and m = n * upsample_ratio.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from tpugan_tpu.config import DT, ActionTrainConfig, FluidTrainConfig
from tpugan_tpu.losses.gan import (
    lsgan_discriminator_loss,
    lsgan_generator_loss,
    lsgan_labels,
)
from tpugan_tpu.losses.geometry import tpugan_sr_loss
from tpugan_tpu.nn.layers import stat_groups
from tpugan_tpu.models import (
    ActionSpatialDis,
    ActionTempoDis,
    FluidSpatialDis,
    FluidTempoDis,
    NoMaskSRNet,
    SRNet,
)
from tpugan_tpu.ops.interpolate import (
    cubic_interpolation,
    cubic_interpolation_dense,
)
from tpugan_tpu.train.state import GanTrainState, NetState, make_optimizer


# ---------------------------------------------------------------------------
# augmentation helpers

def get_rotation_matrix(key: jax.Array) -> jnp.ndarray:
    """Random Euler rotation Rz @ Ry @ Rx (reference
    train_step_final.py:10-30)."""
    a = jax.random.uniform(key, (3,)) * 2 * jnp.pi
    ca, sa = jnp.cos(a), jnp.sin(a)
    rx = jnp.array([[1.0, 0, 0], [0, ca[0], -sa[0]], [0, sa[0], ca[0]]])
    ry = jnp.array([[ca[1], 0, sa[1]], [0, 1.0, 0], [-sa[1], 0, ca[1]]])
    rz = jnp.array([[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1.0]])
    return rz @ ry @ rx


def advect_particle(pos, vel, sign):
    """pos + sign * vel * DT (reference train_step_final.py:33-35)."""
    return pos + sign * vel * DT


def _maybe_rotate_frames(key, do_rot, pos):
    """Rotate every frame of [F, B, N, 3] by a per-frame random rotation when
    do_rot (reference rotate_lst, train_step_final.py:38-48). Returns
    (rotated, rot_mats [F, 3, 3])."""
    f = pos.shape[0]
    rots = jax.vmap(get_rotation_matrix)(jax.random.split(key, f))
    rotated = jnp.einsum("fbnd,fde->fbne", pos, rots)
    return jnp.where(do_rot, rotated, pos), rots


def _apply_rots(pos, rots, do_rot):
    rotated = jnp.einsum("fbnd,fde->fbne", pos, rots)
    return jnp.where(do_rot, rotated, pos)


def rotate_lst(key: jax.Array, pos_frames: jnp.ndarray,
               vel_frames=None):
    """Public per-frame random-rotation augmentation (reference
    ``rotate_lst``, train_step_final.py:38-48) on [F, B, N, 3] stacks.
    Returns the rotated positions (and velocities when given)."""
    rotated, rots = _maybe_rotate_frames(key, jnp.asarray(True), pos_frames)
    if vel_frames is not None:
        return rotated, _apply_rots(vel_frames, rots, jnp.asarray(True))
    return rotated


def interpolate_vel_lst(
    pred_pos_frames: jnp.ndarray,   # [F, B, M, 3]
    gt_pos_frames: jnp.ndarray,     # [F, B, N, 3]
    gt_vel_frames: jnp.ndarray,     # [F, B, N, 3]
    cutoff: float,
    mode: str = "dense",
):
    """Transfer ground-truth advection (vel * DT) onto predicted particles
    per frame by SPH-kernel interpolation (reference ``interpolate_vel_lst``,
    train_step_final.py:51-66). Returns (gt_adv, pred_adv), both
    stop-gradiented like the reference's no_grad block.

    ``mode="dense"`` (default) uses the all-in-radius form
    (ops/interpolate.py ``cubic_interpolation_dense``): the reference
    path's FRNN K=32 cap is an API artifact its own density oracle does
    not share, and the dense Pallas kernel removes the kNN + tiny-row
    gathers that dominated the measured train step (~76 ms of 170 ms;
    BENCH_NOTES.md round 2). NOTE: at the operating cutoff (1.6*R ~ 6.4
    fine spacings) queries routinely have ~100+ in-radius GT neighbors, so
    this is a REAL behavioral deviation from the reference's capped
    interpolation, not a rare-corner one — PARITY.md carries the measured
    A/B evidence. ``mode="capped"`` runs the reference-exact
    32-nearest-within-radius path (``cubic_interpolation``)."""
    f, b = pred_pos_frames.shape[:2]
    gt_adv = gt_vel_frames * DT
    flat = lambda a: a.reshape((f * b,) + a.shape[2:])
    interp = (
        cubic_interpolation_dense if mode == "dense"
        else lambda q, fld, p, c: cubic_interpolation(q, fld, p, c, k=32)
    )
    pred_adv = jax.lax.stop_gradient(
        interp(
            flat(jax.lax.stop_gradient(pred_pos_frames)), flat(gt_adv),
            flat(gt_pos_frames), cutoff,
        )
    ).reshape(pred_pos_frames.shape)
    return gt_adv, pred_adv


# ---------------------------------------------------------------------------
# model builders

def device_sample_lowres(
    highres_pos: jnp.ndarray,   # [F, B, M, 3]
    highres_vel: jnp.ndarray,   # [F, B, M, 3]
    n_low: int,
    jitter: float,
    key: jax.Array,
    start: jnp.ndarray | None = None,  # [B] int32 (tests); None = random
):
    """Device-side equivalent of the loader's FPS downsample + jitter
    (data/sampling.py:sample_patch_with_fps + SiamFluidDataset jitter;
    reference tempo_dataset.py:78-96): greedy farthest-point selection on
    the CENTER frame from a uniform random start, the same indices applied
    to every frame (particle identity is shared), then N(0, jitter) noise
    on the lowres positions. Runs as ~3 ms of fps_pallas + gathers inside
    the jitted step, replacing ~21 ms/item of single-core host FPS."""
    from tpugan_tpu.ops.pallas.fps_kernel import fps_pallas

    k_start, k_jit = jax.random.split(key)
    center = highres_pos[1]                               # [B, M, 3]
    b, m = center.shape[:2]
    if start is None:
        start = jax.random.randint(k_start, (b,), 0, m, dtype=jnp.int32)
    idx = fps_pallas(center, n_low, jnp.zeros((b, m), jnp.float32), start)
    take = lambda a: jnp.take_along_axis(
        a, idx[None, :, :, None], axis=2
    )                                                     # [F, B, n, 3]
    lowres_pos = take(highres_pos)
    lowres_vel = take(highres_vel)
    if jitter:
        lowres_pos = lowres_pos + jitter * jax.random.normal(
            k_jit, lowres_pos.shape
        )
    return lowres_pos, lowres_vel


def build_fluid_models(cfg: FluidTrainConfig):
    sr = SRNet(
        in_feats=cfg.in_node_feats,
        node_emb_dim=cfg.node_embedding,
        upsample_ratio=cfg.upsample_ratio,
        feature_extractor_depth=cfg.feature_extractor_depth,
    )
    return sr, FluidTempoDis(3), FluidSpatialDis()


def build_action_models(cfg: ActionTrainConfig):
    sr = NoMaskSRNet(
        in_feats=cfg.in_node_feats,
        node_emb_dim=cfg.node_embedding,
        upsample_ratio=cfg.upsample_ratio,
        feature_extractor_depth=cfg.feature_extractor_depth,
    )
    return sr, ActionTempoDis(cfg.frames_per_clip), ActionSpatialDis()


def _make_optimizers(cfg):
    tx_sr = make_optimizer(cfg.lr, cfg.lr_decay_steps, cfg.lr_decay_rate)
    tx_d = make_optimizer(
        cfg.dis_lr_factor * cfg.lr, cfg.lr_decay_steps, cfg.lr_decay_rate
    )
    return tx_sr, tx_d, tx_d


def init_fluid_state(cfg: FluidTrainConfig, key: jax.Array):
    """Initialize the three networks (jit-compiled init — eager init over a
    tunneled TPU is pathologically slow) and their optimizers."""
    sr, tempo, spatial = build_fluid_models(cfg)
    n, m = cfg.lowres_size, cfg.lowres_size * cfg.upsample_ratio
    pos = jnp.zeros((cfg.batch_size, n, 3))
    feat = jnp.zeros((cfg.batch_size, n, cfg.in_node_feats))
    hpos = [jnp.zeros((cfg.batch_size, m, 3))] * 3
    k1, k2, k3, kd = jax.random.split(key, 4)

    sr_v = jax.jit(lambda k, f, p: sr.init(k, f, p, False))(k1, feat, pos)
    tempo_v = jax.jit(
        lambda k, h: tempo.init(k, h, cfg.R, None, None, False)
    )({"params": k2, "dropout": kd}, hpos)
    spatial_v = jax.jit(
        lambda k, h: spatial.init(k, h, None, False)
    )({"params": k3, "dropout": kd}, hpos[0])

    tx_sr, tx_t, tx_s = _make_optimizers(cfg)
    state = GanTrainState.create(
        NetState.create(sr_v, tx_sr),
        NetState.create(tempo_v, tx_t),
        NetState.create(spatial_v, tx_s),
    )
    return (sr, tempo, spatial), (tx_sr, tx_t, tx_s), state


def init_action_state(cfg: ActionTrainConfig, key: jax.Array):
    sr, tempo, spatial = build_action_models(cfg)
    n, m = cfg.lowres_size, cfg.lowres_size * cfg.upsample_ratio
    pos = jnp.zeros((cfg.batch_size, n, 3))
    hpos = [jnp.zeros((cfg.batch_size, m, 3))] * cfg.frames_per_clip
    k1, k2, k3, kd = jax.random.split(key, 4)

    sr_v = jax.jit(lambda k, p: sr.init(k, p, p, False))(k1, pos)
    tempo_v = jax.jit(
        lambda k, h: tempo.init(k, h, cfg.R, None, False)
    )({"params": k2, "dropout": kd}, hpos)
    spatial_v = jax.jit(
        lambda k, h: spatial.init(k, h, None, False)
    )({"params": k3, "dropout": kd}, hpos[0])

    tx_sr, tx_t, tx_s = _make_optimizers(cfg)
    state = GanTrainState.create(
        NetState.create(sr_v, tx_sr),
        NetState.create(tempo_v, tx_t),
        NetState.create(spatial_v, tx_s),
    )
    return (sr, tempo, spatial), (tx_sr, tx_t, tx_s), state


# ---------------------------------------------------------------------------
# fluid GAN step

def make_fluid_gan_step(models, txs, cfg: FluidTrainConfig, mesh=None):
    sr_model, tempo_model, spatial_model = models
    tx_sr, tx_tempo, tx_spatial = txs
    furthest_distance = 1.0  # reference passes h == 1 (train_tempo.py:244)
    particle_radius = cfg.cutoff / furthest_distance
    nr = cfg.lowres_size * cfg.upsample_ratio

    def step(state: GanTrainState, batch: Dict[str, jnp.ndarray], key: jax.Array):
        cur_iter = state.n_iter + 1
        keys = jax.random.split(key, 17)
        valid_lbl, invalid_lbl = lsgan_labels(keys[0])

        highres_pos = batch["highres_pos"]    # [3, B, m, 3]
        highres_vel = batch["highres_vel"]
        if cfg.device_sampling and "lowres_pos" not in batch:
            lowres_pos, lowres_vel = device_sample_lowres(
                highres_pos, highres_vel, cfg.lowres_size, cfg.jitter,
                keys[16],
            )
        else:
            lowres_pos = batch["lowres_pos"]  # [3, B, n, 3]
            lowres_vel = batch["lowres_vel"]

        if cfg.use_vel and cfg.in_node_feats == 6:
            feats = jnp.concatenate([lowres_pos, lowres_vel * DT], axis=-1)
        else:
            feats = lowres_pos

        def g_forward(sr_params, frame_feat, frame_pos):
            return sr_model.apply(
                {"params": sr_params}, frame_feat, frame_pos, True
            )

        # ----- generator update -------------------------------------------
        def g_loss_fn(sr_params):
            expanded, mask, padded, valid = jax.vmap(
                g_forward, in_axes=(None, 0, 0)
            )(sr_params, feats, lowres_pos)
            # expanded/padded [3, B, nr, 3]; mask [3, B, n]; valid [3, B, nr]

            position_loss, cd, ml = tpugan_sr_loss(
                cfg.masking_w,
                highres_pos[1], expanded[1], lowres_pos[1], mask[1],
                particle_radius, cur_iter,
            )
            gate = ml < cfg.ml_gate

            def adv_branch(_):
                # spatial critic on the shuffled hard-masked center frame
                perm = jax.random.permutation(keys[1], nr)
                sp_fake, sp_vars = spatial_model.apply(
                    state.spatial.variables(), padded[1][:, perm],
                    valid[1][:, perm], True,
                    mutable=["batch_stats"], rngs={"dropout": keys[2]},
                )
                spatial_target = jax.random.uniform(
                    keys[3], (), minval=0.8, maxval=1.2
                )
                spatial_loss = lsgan_generator_loss(sp_fake, spatial_target)

                # temporal critic over all 3 frames; side frames shuffled
                # (reference train_step_final.py:127,140)
                p0 = jax.random.permutation(keys[4], nr)
                p2 = jax.random.permutation(keys[5], nr)
                pred_seq = jnp.stack(
                    [padded[0][:, p0], padded[1], padded[2][:, p2]]
                )
                pred_valid = jnp.stack(
                    [valid[0][:, p0], valid[1], valid[2][:, p2]]
                )
                if cfg.use_vel:
                    gt_adv, pred_adv = interpolate_vel_lst(
                        pred_seq, highres_pos, highres_vel,
                        1.6 * cfg.R / furthest_distance,
                        mode=getattr(cfg, "interp", "dense"),
                    )
                    feat_lst = [pred_adv[i] for i in range(3)]
                else:
                    gt_adv = jnp.zeros_like(highres_vel)
                    pred_adv = jnp.zeros_like(pred_seq)
                    feat_lst = None
                tp_fake, tp_vars = tempo_model.apply(
                    state.tempo.variables(),
                    [pred_seq[i] for i in range(3)], cfg.R,
                    feat_lst=feat_lst,
                    valid_lst=[pred_valid[i] for i in range(3)],
                    train=True, stack_frames=cfg.fast_d,
                    mutable=["batch_stats"], rngs={"dropout": keys[6]},
                )
                tempo_target = jax.random.uniform(
                    keys[7], (), minval=0.8, maxval=1.2
                )
                tempo_loss = lsgan_generator_loss(tp_fake, tempo_target)
                return (
                    tempo_loss, spatial_loss, pred_seq, pred_valid,
                    pred_adv, gt_adv,
                    tp_vars["batch_stats"], sp_vars["batch_stats"],
                )

            def no_adv(_):
                return (
                    jnp.zeros(()), jnp.zeros(()), padded, valid,
                    jnp.zeros_like(padded), jnp.zeros_like(highres_vel),
                    state.tempo.batch_stats, state.spatial.batch_stats,
                )


            (tempo_loss, spatial_loss, pred_seq, pred_valid, pred_adv,
             gt_adv, tempo_bs, spatial_bs) = jax.lax.cond(
                gate, adv_branch, no_adv, None
            )
            sr_loss = tempo_loss + spatial_loss + cfg.w * position_loss
            aux = dict(
                cd=cd, ml=ml, gate=gate,
                tempo_loss=tempo_loss, spatial_loss=spatial_loss,
                pred_seq=pred_seq, pred_valid=pred_valid,
                pred_adv=pred_adv, gt_adv=gt_adv,
                # The reference's spatial-D update reuses the loop variable
                # ``padded_pred_pos_batch``, which after the side-frame loop
                # holds the LAST frame's unshuffled prediction
                # (train_step_final.py:128-140,207-209) — reproduced here.
                padded_last=padded[2], last_valid=valid[2],
                tempo_bs=tempo_bs, spatial_bs=spatial_bs,
            )
            return sr_loss, aux

        (sr_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.sr.params
        )
        sr_updates, sr_opt = tx_sr.update(
            g_grads, state.sr.opt_state, state.sr.params
        )
        sr_params = optax.apply_updates(state.sr.params, sr_updates)
        new_sr = state.sr.replace(params=sr_params, opt_state=sr_opt)
        tempo_mid = state.tempo.replace(batch_stats=aux["tempo_bs"])
        spatial_mid = state.spatial.replace(batch_stats=aux["spatial_bs"])

        # ----- discriminator updates (every 2nd iter, gated) ---------------
        d_gate = jnp.logical_and(cur_iter % 2 == 0, aux["gate"])
        if cfg.freeze_D:
            d_gate = jnp.zeros((), bool)

        pred_seq = jax.lax.stop_gradient(aux["pred_seq"])
        pred_valid = aux["pred_valid"]
        pred_adv = aux["pred_adv"]
        gt_adv = aux["gt_adv"]
        padded_last = jax.lax.stop_gradient(aux["padded_last"])
        last_valid = aux["last_valid"]

        def d_update(_):
            # --- temporal D: per-frame random rotation with p = 0.3
            do_rot = jax.random.uniform(keys[8], ()) > 0.7
            fake_pos, rots_f = _maybe_rotate_frames(keys[9], do_rot, pred_seq)
            true_pos, rots_t = _maybe_rotate_frames(keys[10], do_rot, highres_pos)
            if cfg.use_vel:
                fake_feat = _apply_rots(pred_adv, rots_f, do_rot)
                true_feat = _apply_rots(gt_adv, rots_t, do_rot)
                fake_feat_lst = [fake_feat[i] for i in range(3)]
                true_feat_lst = [true_feat[i] for i in range(3)]
            else:
                fake_feat_lst = true_feat_lst = None

            def tempo_loss_fn(tparams):
                variables = {"params": tparams, "batch_stats": tempo_mid.batch_stats}
                if cfg.fast_d:
                    # fake+real in ONE stacked apply: every batch norm keeps
                    # per-(source, frame) statistics via stat_groups (the
                    # reference's two sequential D calls,
                    # train_step_final.py:185-190); exactness pinned by
                    # tests/test_fast_d.py.
                    b = highres_pos.shape[1]
                    if pred_seq.shape[2] != highres_pos.shape[2]:
                        raise ValueError(
                            "--fast_d stacks the fake and real clouds along "
                            "the batch axis, which requires the padded "
                            f"prediction bucket ({pred_seq.shape[2]} = "
                            "lowres_size * upsample_ratio) to equal the "
                            f"highres point count ({highres_pos.shape[2]}); "
                            "configs with fps_ratio * upsample_ratio != 1 "
                            "must use the sequential D path")
                    ones = jnp.ones(pred_valid.shape[1:], bool)
                    both_pos = [
                        jnp.concatenate([fake_pos[i], true_pos[i]])
                        for i in range(3)
                    ]
                    both_valid = [
                        jnp.concatenate([pred_valid[i], ones])
                        for i in range(3)
                    ]
                    both_feat = None
                    if cfg.use_vel:
                        both_feat = [
                            jnp.concatenate(
                                [fake_feat_lst[i], true_feat_lst[i]])
                            for i in range(3)
                        ]
                    with stat_groups(2):
                        score, v2 = tempo_model.apply(
                            variables, both_pos, cfg.R,
                            feat_lst=both_feat, valid_lst=both_valid,
                            train=True, stack_frames=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": keys[11]},
                        )
                    fake, true = score[:b], score[b:]
                else:
                    fake, v1 = tempo_model.apply(
                        variables, [fake_pos[i] for i in range(3)], cfg.R,
                        feat_lst=fake_feat_lst,
                        valid_lst=[pred_valid[i] for i in range(3)],
                        train=True,
                        mutable=["batch_stats"], rngs={"dropout": keys[11]},
                    )
                    true, v2 = tempo_model.apply(
                        {"params": tparams, "batch_stats": v1["batch_stats"]},
                        [true_pos[i] for i in range(3)], cfg.R,
                        feat_lst=true_feat_lst, valid_lst=None, train=True,
                        mutable=["batch_stats"], rngs={"dropout": keys[12]},
                    )
                loss = lsgan_discriminator_loss(
                    true, fake, valid_lbl, invalid_lbl
                )
                return loss, v2["batch_stats"]

            (t_loss, t_bs), t_grads = jax.value_and_grad(
                tempo_loss_fn, has_aux=True
            )(tempo_mid.params)
            t_updates, t_opt = tx_tempo.update(
                t_grads, state.tempo.opt_state, tempo_mid.params
            )
            new_tempo = NetState(
                params=optax.apply_updates(tempo_mid.params, t_updates),
                batch_stats=t_bs,
                opt_state=t_opt,
            )

            # --- spatial D: per-batch-element rotations with p = 0.3
            do_rot_s = jax.random.uniform(keys[13], ()) > 0.7
            b = highres_pos.shape[1]
            rots0 = jax.vmap(get_rotation_matrix)(jax.random.split(keys[14], b))
            rots1 = jax.vmap(get_rotation_matrix)(jax.random.split(keys[15], b))
            true_center = jnp.where(
                do_rot_s,
                jnp.einsum("bnd,bde->bne", highres_pos[1], rots0),
                highres_pos[1],
            )
            fake_cloud = jnp.where(
                do_rot_s,
                jnp.einsum("bnd,bde->bne", padded_last, rots1),
                padded_last,
            )

            def spatial_loss_fn(sparams):
                variables = {"params": sparams, "batch_stats": spatial_mid.batch_stats}
                if cfg.fast_d:
                    nb = fake_cloud.shape[0]
                    both = jnp.concatenate([fake_cloud, true_center])
                    bvalid = jnp.concatenate(
                        [last_valid,
                         jnp.ones(true_center.shape[:2], bool)])
                    with stat_groups(2):
                        score, v2 = spatial_model.apply(
                            variables, both, bvalid, True,
                            mutable=["batch_stats"],
                            rngs={"dropout": keys[11]},
                        )
                    fake, true = score[:nb], score[nb:]
                else:
                    fake, v1 = spatial_model.apply(
                        variables, fake_cloud, last_valid, True,
                        mutable=["batch_stats"], rngs={"dropout": keys[11]},
                    )
                    true, v2 = spatial_model.apply(
                        {"params": sparams, "batch_stats": v1["batch_stats"]},
                        true_center, None, True,
                        mutable=["batch_stats"], rngs={"dropout": keys[12]},
                    )
                loss = lsgan_discriminator_loss(
                    true, fake, valid_lbl, invalid_lbl
                )
                return loss, v2["batch_stats"]

            (s_loss, s_bs), s_grads = jax.value_and_grad(
                spatial_loss_fn, has_aux=True
            )(spatial_mid.params)
            s_updates, s_opt = tx_spatial.update(
                s_grads, state.spatial.opt_state, spatial_mid.params
            )
            new_spatial = NetState(
                params=optax.apply_updates(spatial_mid.params, s_updates),
                batch_stats=s_bs,
                opt_state=s_opt,
            )
            return new_tempo, new_spatial, t_loss, s_loss

        def d_skip(_):
            return tempo_mid, spatial_mid, jnp.zeros(()), jnp.zeros(())

        new_tempo, new_spatial, tempo_d_loss, spatial_d_loss = jax.lax.cond(
            d_gate, d_update, d_skip, None
        )

        new_state = GanTrainState(
            n_iter=cur_iter, sr=new_sr, tempo=new_tempo, spatial=new_spatial
        )
        metrics = {
            "tempo_G_loss": aux["tempo_loss"],
            "tempo_D_loss": tempo_d_loss,
            "Chamfer_distance_no_norm": aux["cd"],
            "masking_loss": aux["ml"],
            "spatial_G_loss": aux["spatial_loss"],
            "spatial_D_loss": spatial_d_loss,
        }
        return new_state, metrics

    return _finalize_step(step, mesh)


# ---------------------------------------------------------------------------
# action (no-mask) GAN step

def make_action_gan_step(models, txs, cfg: ActionTrainConfig, mesh=None):
    sr_model, tempo_model, spatial_model = models
    tx_sr, tx_tempo, tx_spatial = txs
    f = cfg.frames_per_clip
    nr = cfg.lowres_size * cfg.upsample_ratio

    def step(state: GanTrainState, batch: Dict[str, jnp.ndarray], key: jax.Array):
        cur_iter = state.n_iter + 1
        keys = jax.random.split(key, 13)
        valid_lbl, invalid_lbl = lsgan_labels(keys[0])

        highres_pos = batch["highres_pos"]    # [F, B, m, 3]
        if getattr(cfg, "device_sampling", False) and "lowres_pos" not in batch:
            # per-frame INDEPENDENT FPS (reference msr_dataset.py:93-96 —
            # unlike the fluid path's shared center-frame indices), run as
            # one fps_pallas over the flattened [F*B] clip stack
            from tpugan_tpu.ops.pallas.fps_kernel import fps_pallas

            fb, m = f * highres_pos.shape[1], highres_pos.shape[2]
            flat = highres_pos.reshape(fb, m, 3)
            start = jax.random.randint(keys[12], (fb,), 0, m, dtype=jnp.int32)
            idx = fps_pallas(flat, cfg.lowres_size,
                             jnp.zeros((fb, m), jnp.float32), start)
            lowres_pos = jnp.take_along_axis(
                flat, idx[:, :, None], axis=1
            ).reshape(f, highres_pos.shape[1], cfg.lowres_size, 3)
        else:
            lowres_pos = batch["lowres_pos"]  # [F, B, n, 3]

        def g_forward(sr_params, frame_pos):
            out, _ = sr_model.apply(
                {"params": sr_params}, frame_pos, frame_pos, True
            )
            return out

        def g_loss_fn(sr_params):
            pred = jax.vmap(g_forward, in_axes=(None, 0))(sr_params, lowres_pos)
            # pred [F, B, nr, 3]

            position_loss, cd, _ = tpugan_sr_loss(
                0, highres_pos[1], pred[1], None, None, 0.0, cur_iter
            )

            perm_keys = jax.random.split(keys[1], f + 1)
            sp_perm = jax.random.permutation(perm_keys[f], nr)
            sp_fake, sp_vars = spatial_model.apply(
                state.spatial.variables(), pred[1][:, sp_perm], None, True,
                mutable=["batch_stats"], rngs={"dropout": keys[2]},
            )
            spatial_target = jax.random.uniform(keys[3], (), minval=0.8, maxval=1.2)
            spatial_loss = lsgan_generator_loss(sp_fake, spatial_target)

            # all frames shuffled for the temporal critic
            # (reference train_step_final.py:270-274)
            pred_seq = jnp.stack([
                pred[i][:, jax.random.permutation(perm_keys[i], nr)]
                for i in range(f)
            ])
            tp_fake, tp_vars = tempo_model.apply(
                state.tempo.variables(), [pred_seq[i] for i in range(f)],
                cfg.R, valid_lst=None, train=True,
                stack_frames=cfg.fast_d,
                mutable=["batch_stats"], rngs={"dropout": keys[4]},
            )
            tempo_target = jax.random.uniform(keys[5], (), minval=0.8, maxval=1.2)
            tempo_loss = lsgan_generator_loss(tp_fake, tempo_target)

            sr_loss = tempo_loss + spatial_loss + cfg.w * position_loss
            aux = dict(
                cd=cd, tempo_loss=tempo_loss, spatial_loss=spatial_loss,
                pred_seq=pred_seq, pred_center=pred[1],
                tempo_bs=tp_vars["batch_stats"], spatial_bs=sp_vars["batch_stats"],
            )
            return sr_loss, aux

        (sr_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.sr.params
        )
        sr_updates, sr_opt = tx_sr.update(
            g_grads, state.sr.opt_state, state.sr.params
        )
        new_sr = state.sr.replace(
            params=optax.apply_updates(state.sr.params, sr_updates),
            opt_state=sr_opt,
        )
        tempo_mid = state.tempo.replace(batch_stats=aux["tempo_bs"])
        spatial_mid = state.spatial.replace(batch_stats=aux["spatial_bs"])

        d_gate = cur_iter % 2 == 0
        if cfg.freeze_D:
            d_gate = jnp.zeros((), bool)

        pred_seq = jax.lax.stop_gradient(aux["pred_seq"])
        pred_center = jax.lax.stop_gradient(aux["pred_center"])

        def d_update(_):
            def tempo_loss_fn(tparams):
                variables = {"params": tparams, "batch_stats": tempo_mid.batch_stats}
                if cfg.fast_d:
                    b = highres_pos.shape[1]
                    both = [
                        jnp.concatenate([pred_seq[i], highres_pos[i]])
                        for i in range(f)
                    ]
                    with stat_groups(2):
                        score, v2 = tempo_model.apply(
                            variables, both, cfg.R, valid_lst=None,
                            train=True, stack_frames=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": keys[6]},
                        )
                    fake, true = score[:b], score[b:]
                else:
                    fake, v1 = tempo_model.apply(
                        variables, [pred_seq[i] for i in range(f)], cfg.R,
                        valid_lst=None, train=True,
                        mutable=["batch_stats"], rngs={"dropout": keys[6]},
                    )
                    true, v2 = tempo_model.apply(
                        {"params": tparams, "batch_stats": v1["batch_stats"]},
                        [highres_pos[i] for i in range(f)], cfg.R,
                        valid_lst=None, train=True,
                        mutable=["batch_stats"], rngs={"dropout": keys[7]},
                    )
                return lsgan_discriminator_loss(
                    true, fake, valid_lbl, invalid_lbl
                ), v2["batch_stats"]

            (t_loss, t_bs), t_grads = jax.value_and_grad(
                tempo_loss_fn, has_aux=True
            )(tempo_mid.params)
            t_updates, t_opt = tx_tempo.update(
                t_grads, state.tempo.opt_state, tempo_mid.params
            )
            new_tempo = NetState(
                params=optax.apply_updates(tempo_mid.params, t_updates),
                batch_stats=t_bs, opt_state=t_opt,
            )

            sp_perm = jax.random.permutation(keys[8], nr)

            def spatial_loss_fn(sparams):
                variables = {"params": sparams, "batch_stats": spatial_mid.batch_stats}
                if cfg.fast_d:
                    nb = pred_center.shape[0]
                    both = jnp.concatenate(
                        [pred_center[:, sp_perm], highres_pos[1]])
                    with stat_groups(2):
                        score, v2 = spatial_model.apply(
                            variables, both, None, True,
                            mutable=["batch_stats"],
                            rngs={"dropout": keys[9]},
                        )
                    fake, true = score[:nb], score[nb:]
                else:
                    fake, v1 = spatial_model.apply(
                        variables, pred_center[:, sp_perm], None, True,
                        mutable=["batch_stats"], rngs={"dropout": keys[9]},
                    )
                    true, v2 = spatial_model.apply(
                        {"params": sparams, "batch_stats": v1["batch_stats"]},
                        highres_pos[1], None, True,
                        mutable=["batch_stats"], rngs={"dropout": keys[10]},
                    )
                return lsgan_discriminator_loss(
                    true, fake, valid_lbl, invalid_lbl
                ), v2["batch_stats"]

            (s_loss, s_bs), s_grads = jax.value_and_grad(
                spatial_loss_fn, has_aux=True
            )(spatial_mid.params)
            s_updates, s_opt = tx_spatial.update(
                s_grads, state.spatial.opt_state, spatial_mid.params
            )
            new_spatial = NetState(
                params=optax.apply_updates(spatial_mid.params, s_updates),
                batch_stats=s_bs, opt_state=s_opt,
            )
            return new_tempo, new_spatial, t_loss, s_loss

        def d_skip(_):
            return tempo_mid, spatial_mid, jnp.zeros(()), jnp.zeros(())

        new_tempo, new_spatial, tempo_d_loss, spatial_d_loss = jax.lax.cond(
            d_gate, d_update, d_skip, None
        )

        new_state = GanTrainState(
            n_iter=cur_iter, sr=new_sr, tempo=new_tempo, spatial=new_spatial
        )
        metrics = {
            "tempo_G_loss": aux["tempo_loss"],
            "tempo_D_loss": tempo_d_loss,
            "Chamfer_distance_no_norm": aux["cd"],
            "spatial_G_loss": aux["spatial_loss"],
            "spatial_D_loss": spatial_d_loss,
        }
        return new_state, metrics

    return _finalize_step(step, mesh)

def _finalize_step(step, mesh):
    """jit the step; with a mesh, add data-parallel shardings (params
    replicated, batch B-axis sharded, gradient allreduce via GSPMD)."""
    if mesh is not None:
        from tpugan_tpu.parallel.mesh import shard_gan_step

        return shard_gan_step(step, mesh)
    return jax.jit(step, donate_argnums=(0,))
