"""Spatial and temporal discriminators + the transfer classifier.

Equivalents of the reference's discriminator.py:325-722, with the exact
npoint/radius/nsample/MLP tables. Channels-last layout; hard-masked
(999-sentinel) generator outputs are handled through ``valid`` masks fed to
the first (mask_dummy) set-abstraction stage instead of the reference's
random dummy-resampling loop.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

import tpugan_tpu.nn.layers as _layers
from tpugan_tpu.nn.flow import FlowModule
from tpugan_tpu.nn.layers import (ambient_batch_norm, leaky_relu_001,
                                  stat_groups)
from tpugan_tpu.nn.setconv import SetConv


def _stacked_fps(sa: SetConv, pos_lst, valid_lst):
    """FPS center indices for a per-frame SetConv stage, computed in ONE
    batched kernel call over the frame-stacked rows.

    The temporal towers run the same SetConv on F same-shape frames; FPS is
    the stage's sequential bottleneck (npoint dependent argmax rounds) and
    its rows are independent, so stacking frames into the batch axis makes
    the batched-rows kernel's sublanes serve F*B rows for one round chain —
    bit-identical selections (fps_kernel.py), ~3x fewer sequential rounds
    per step. Returns a list of [B, npoint] index arrays (or Nones for a
    global-pooling stage / mismatched frame shapes, where callers fall back
    to per-frame FPS inside SetConv)."""
    f = len(pos_lst)
    if sa.npoint is None or f == 1:
        return [None] * f
    if any(p.shape != pos_lst[0].shape for p in pos_lst):
        return [None] * f
    stacked = jnp.concatenate(pos_lst, axis=0)            # [F*B, N, 3]
    valid = None
    if sa.mask_dummy and valid_lst is not None:
        if any(v is None for v in valid_lst):
            return [None] * f
        valid = jnp.concatenate(valid_lst, axis=0)        # [F*B, N]
    idx = sa.fps_centers(stacked, valid)                  # [F*B, npoint]
    return list(jnp.split(idx, f, axis=0))


def _stacked_sa_frames(sa1, sa2, pos_lst, feat_lst, valid_lst, train):
    """Run a temporal tower's per-frame sa1+sa2 passes as ONE stacked apply.

    The reference loops the same SetConv over F same-shape frames
    (discriminator.py:366-401, 518-559) — F sequential dispatches of the
    same weights. Stacking the frames into the batch axis runs one
    F-times-larger program (one FPS round chain, one ball query, one conv
    stack) with identical math: the convs/gathers are row-independent, and
    the batch norms run under ``stat_groups(F * ambient)`` so every frame
    (x every ambient block, e.g. the fake/real halves of a stacked D
    update) keeps ITS OWN batch statistics exactly as the per-frame loop
    computed them (layers.GroupedBatchNorm; bit-equality pinned by
    tests/test_fast_d.py with spectral norm frozen). With spectral norm
    live the stacked apply advances each power iteration once instead of F
    times per tower call — u-trajectory detail, A/B'd in BENCH_NOTES
    round 5 (fast_d).

    Requires uniform frame shapes and an all-or-none valid_lst."""
    f = len(pos_lst)
    if any(p.shape != pos_lst[0].shape for p in pos_lst):
        raise ValueError("stack_frames requires uniform frame shapes")
    spos = jnp.concatenate(pos_lst, axis=0)
    sfeat = (jnp.concatenate(feat_lst, axis=0)
             if feat_lst is not None else spos)
    svalid = None
    if valid_lst is not None:
        if any(v is None for v in valid_lst):
            raise ValueError("stack_frames needs all-or-none valid masks")
        svalid = jnp.concatenate(valid_lst, axis=0)
    outer = _layers._STAT_GROUPS
    with stat_groups(f * outer):
        p1, f1 = sa1(spos, sfeat, valid=svalid, train=train)
        p2, f2 = sa2(p1, f1, train=train)
    return (list(jnp.split(p2, f, axis=0)),
            list(jnp.split(f2, f, axis=0)))


class _FCHead(nn.Module):
    """Spectral-normed Linear/BN/LeakyReLU/Dropout scoring head (reference
    discriminator.py:356-364, 509-516)."""

    widths: Sequence[int]
    dropouts: Sequence[float]
    out_features: int = 1
    spectral_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for i, (w, p) in enumerate(zip(self.widths, self.dropouts)):
            dense = nn.Dense(w)
            x = (
                nn.SpectralNorm(dense)(x, update_stats=train)
                if self.spectral_norm
                else dense(x)
            )
            x = ambient_batch_norm(train, name=f"BatchNorm_{i}")(x)
            x = leaky_relu_001(x)
            if p > 0:
                x = nn.Dropout(p, deterministic=not train)(x)
        dense = nn.Dense(self.out_features)
        return (
            nn.SpectralNorm(dense)(x, update_stats=train)
            if self.spectral_norm
            else dense(x)
        )


class FluidSpatialDis(nn.Module):
    """3-level SSG set-abstraction critic for single fluid frames
    (reference discriminator.py:562-629)."""

    spectral_norm: bool = True

    def setup(self):
        sn = self.spectral_norm
        # fused_train: measured win on this tower only (setconv.py note)
        self.sa = [
            SetConv.ssg([64, 128], npoint=1024, radius=0.15, nsample=32,
                        mask_dummy=True, spectral_norm=True,
                        act=leaky_relu_001, fused_train=True),
            SetConv.ssg([128, 128], npoint=512, radius=0.30, nsample=32,
                        spectral_norm=True, act=leaky_relu_001,
                        fused_train=True),
            SetConv.ssg([128, 256], npoint=128, radius=0.60, nsample=16,
                        spectral_norm=True, act=leaky_relu_001,
                        fused_train=True),
        ]
        self.sa_pooling = SetConv.ssg([256, 256], spectral_norm=sn,
                                      fused_train=True)
        self.fc = _FCHead([256, 64], [0.2, 0.0], spectral_norm=True)

    def __call__(
        self,
        pos: jnp.ndarray,                    # [B, N, 3]
        valid: Optional[jnp.ndarray] = None,  # [B, N]
        train: bool = True,
    ) -> jnp.ndarray:
        feature = None
        for i, sa in enumerate(self.sa):
            pos, feature = sa(
                pos, pos if feature is None else feature,
                valid=valid if i == 0 else None, train=train,
            )
        _, feature = self.sa_pooling(pos, feature, train=train)
        return self.fc(feature[:, 0, :], train=train)     # [B, 1]


class FluidTempoDis(nn.Module):
    """Temporal critic over a frame window: two SSG stages per frame, then
    FlowEmbedding mixing, SA pooling and an FC head (reference
    discriminator.py:473-559)."""

    sequence_length: int
    spectral_norm: bool = True

    def setup(self):
        sn = self.spectral_norm
        self.sa1 = SetConv.ssg([64, 128], npoint=1024, radius=0.10,
                               nsample=32, mask_dummy=True,
                               spectral_norm=sn, act=leaky_relu_001)
        self.sa2 = SetConv.ssg([128, 256], npoint=256, radius=0.20,
                               nsample=32, spectral_norm=sn,
                               act=leaky_relu_001)
        self.flow_module = FlowModule(256, 256, 256, self.sequence_length,
                                      spectral_norm=sn)
        self.sa_pooling = SetConv.ssg([256, 256], spectral_norm=sn,
                                      act=leaky_relu_001)
        self.fc = _FCHead([256, 64], [0.2, 0.0], spectral_norm=sn)

    def __call__(
        self,
        pos_lst: List[jnp.ndarray],
        cutoff: float,
        feat_lst: Optional[List[jnp.ndarray]] = None,
        valid_lst: Optional[List[jnp.ndarray]] = None,
        train: bool = True,
        stack_frames: bool = False,
    ) -> jnp.ndarray:
        if feat_lst is not None:
            assert len(feat_lst) == len(pos_lst)
        if stack_frames:
            poss, feats = _stacked_sa_frames(
                self.sa1, self.sa2, pos_lst, feat_lst, valid_lst, train)
        else:
            c1 = _stacked_fps(self.sa1, pos_lst, valid_lst)
            mid_p, mid_f = [], []
            for i, pos in enumerate(pos_lst):
                feat_in = feat_lst[i] if feat_lst is not None else pos
                valid = valid_lst[i] if valid_lst is not None else None
                p, f = self.sa1(pos, feat_in, valid=valid, train=train,
                                centers=c1[i])
                mid_p.append(p)
                mid_f.append(f)
            c2 = _stacked_fps(self.sa2, mid_p, None)
            feats, poss = [], []
            for i in range(len(pos_lst)):
                p, f = self.sa2(mid_p[i], mid_f[i], train=train,
                                centers=c2[i])
                poss.append(p)
                feats.append(f)
        feature = self.flow_module(feats, poss, 20 * cutoff, train=train)
        _, feature = self.sa_pooling(poss[0], feature, train=train)
        return self.fc(feature[:, 0, :], train=train)


class ActionSpatialDis(nn.Module):
    """Single-frame critic for the action workload (reference
    discriminator.py:405-470)."""

    spectral_norm: bool = True

    def setup(self):
        sn = self.spectral_norm
        self.sa = [
            SetConv.ssg([64, 64, 128], npoint=512, radius=0.3, nsample=32,
                        spectral_norm=sn),
            SetConv.ssg([128, 128], npoint=256, radius=0.6, nsample=32,
                        spectral_norm=sn),
            SetConv.ssg([128, 256], npoint=128, radius=1.0, nsample=32,
                        spectral_norm=sn),
        ]
        self.sa_pooling = SetConv.ssg([256, 512], spectral_norm=sn)
        self.fc = _FCHead([256, 64], [0.3, 0.1], spectral_norm=True)

    def __call__(
        self, pos: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        feature = None
        for i, sa in enumerate(self.sa):
            pos, feature = sa(
                pos, pos if feature is None else feature,
                valid=valid if i == 0 else None, train=train,
            )
        _, feature = self.sa_pooling(pos, feature, train=train)
        return self.fc(feature[:, 0, :], train=train)


class _ActionTempoTower(nn.Module):
    """Shared tower of ActionTempoDis and ActionCls (reference
    discriminator.py:325-402 and 632-722): two SSG stages per frame, flow
    mixing, SA pooling."""

    sequence_length: int
    spectral_norm: bool
    pool_mlp: Sequence[int]

    def setup(self):
        sn = self.spectral_norm
        self.sa1 = SetConv.ssg([64, 64, 128], npoint=512, radius=0.8,
                               nsample=64, spectral_norm=sn)
        self.sa2 = SetConv.ssg([128, 256], npoint=256, radius=1.2,
                               nsample=32, spectral_norm=sn)
        self.flow_module = FlowModule(256, 256, 256, self.sequence_length,
                                      spectral_norm=sn)
        self.sa_pooling = SetConv.ssg(list(self.pool_mlp), spectral_norm=sn)

    def __call__(self, pos_lst, cutoff, valid_lst=None, train=True,
                 stack_frames=False):
        if stack_frames:
            poss, feats = _stacked_sa_frames(
                self.sa1, self.sa2, pos_lst, None, valid_lst, train)
        else:
            c1 = _stacked_fps(self.sa1, pos_lst, valid_lst)
            mid_p, mid_f = [], []
            for i, pos in enumerate(pos_lst):
                valid = valid_lst[i] if valid_lst is not None else None
                p, f = self.sa1(pos, pos, valid=valid, train=train,
                                centers=c1[i])
                mid_p.append(p)
                mid_f.append(f)
            c2 = _stacked_fps(self.sa2, mid_p, None)
            feats, poss = [], []
            for i in range(len(pos_lst)):
                p, f = self.sa2(mid_p[i], mid_f[i], train=train,
                                centers=c2[i])
                poss.append(p)
                feats.append(f)
        feature = self.flow_module(feats, poss, cutoff, train=train)
        _, feature = self.sa_pooling(poss[0], feature, train=train)
        return feature[:, 0, :]


class ActionTempoDis(nn.Module):
    """Temporal critic for the action workload (reference
    discriminator.py:325-402)."""

    sequence_length: int
    spectral_norm: bool = True

    def setup(self):
        self.tower = _ActionTempoTower(
            self.sequence_length, self.spectral_norm, pool_mlp=[256, 512]
        )
        self.fc = _FCHead([256, 64], [0.3, 0.1], spectral_norm=True)

    def __call__(self, pos_lst, cutoff, valid_lst=None, train=True,
                 stack_frames=False):
        feature = self.tower(pos_lst, cutoff, valid_lst=valid_lst,
                             train=train, stack_frames=stack_frames)
        return self.fc(feature, train=train)


class ActionCls(nn.Module):
    """Transfer classifier probing the temporal critic's features
    (reference discriminator.py:632-722): same tower without spectral norm,
    a [256, 512, 512] SA pooling and a 20-way FC head."""

    sequence_length: int
    num_classes: int = 20

    def setup(self):
        self.tower = _ActionTempoTower(
            self.sequence_length, spectral_norm=False, pool_mlp=[512, 512]
        )
        self.fc = _FCHead([256, 64], [0.3, 0.1],
                          out_features=self.num_classes, spectral_norm=False)

    def __call__(self, pos_lst, cutoff, train=True):
        feature = self.tower(pos_lst, cutoff, train=train)
        return self.fc(feature, train=train)


def transfer_feature_extractor(cls_variables, dis_variables):
    """Copy the trained temporal discriminator's sa1/sa2/flow weights into
    an ActionCls variable tree (reference ``copy_params`` /
    ``init_feature_extractor``, discriminator.py:674-685).

    In flax the spectral-norm wrapper stores the raw kernel under the same
    param path (sigma/u live in batch_stats), so — unlike torch's
    ``_orig``-suffix surgery — a straight subtree copy transfers the
    unnormalized weights just like the reference. Returns a new ActionCls
    variable tree; freezing is done by the optimizer mask
    (tpugan_tpu.train.transfer).
    """
    import flax

    cls_v = flax.core.unfreeze(cls_variables)
    dis_v = flax.core.unfreeze(dis_variables)

    def _copy_subtree(dst, src):
        """Recursively copy src values into dst wherever leaf shapes match,
        aligning children by order-insensitive name match."""
        for key, sval in src.items():
            if key in dst:
                if isinstance(sval, dict) and isinstance(dst[key], dict):
                    _copy_subtree(dst[key], sval)
                elif hasattr(sval, "shape") and hasattr(dst[key], "shape"):
                    if sval.shape == dst[key].shape:
                        dst[key] = sval

    for col in ("params", "batch_stats"):
        if col not in cls_v or col not in dis_v:
            continue
        cls_tower = cls_v[col].get("tower", cls_v[col])
        for part in ("sa1", "sa2", "flow_module"):
            if part in cls_tower and part in dis_v[col].get("tower", {}):
                _copy_subtree(cls_tower[part], dis_v[col]["tower"][part])
            elif part in cls_tower and part in dis_v[col]:
                _copy_subtree(cls_tower[part], dis_v[col][part])
    return flax.core.freeze(cls_v) if isinstance(cls_variables, flax.core.FrozenDict) else cls_v
