"""PointNet++ set-abstraction modules (SSG / MSG / global pooling).

Equivalent of the reference's `_PointnetSAModuleBase` / `MSGSetConv` /
`SSGSetConv` (discriminator.py:82-232): FPS-downsample centers, ball-query
and group neighborhoods, shared MLP, max-pool per neighborhood.

Dummy-point handling: the reference resamples FPS centers that landed on
999-sentinel dummies with *random* real points (discriminator.py:116-130);
here FPS simply never selects invalid points (mask-aware argmax), which is
deterministic and fixed-shape — strictly stronger than the reference's
rejection loop. Dummies are likewise excluded as ball-query candidates.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tpugan_tpu.nn.layers import SharedMLP
from tpugan_tpu.ops.neighbors import fps, gather, group_all, query_and_group

# Default for SetConv.fused=None; TPUGAN_FUSED_SETCONV=0 disables the fused
# grouped-MLP path globally (A/B escape hatch — the two paths are equal to
# the XLA formulation's own precision, pinned by test_pooled_mlp_fused.py).
_FUSED_DEFAULT = os.environ.get("TPUGAN_FUSED_SETCONV", "1") != "0"
# TPUGAN_FUSED_SETCONV_TRAIN=1 also auto-enables the kernel in TRAINING
# graphs (it carries a dedicated multi-pass Pallas backward,
# pooled_mlp_kernel._bwd_pallas_bn/_bwd_pallas_affine).
_FUSED_TRAIN = os.environ.get("TPUGAN_FUSED_SETCONV_TRAIN", "0") == "1"


class SetConv(nn.Module):
    """Multi-scale-grouping set abstraction. ``npoint=None`` means global
    grouping (reference ``GroupAll`` / SA_pooling).

    mlps[i] lists the per-scale MLP output widths (the reference's
    ``mlp_spec`` minus its input entry; the +3 for use_xyz is implicit in
    the input width here).
    """

    mlps: Sequence[Sequence[int]]
    npoint: Optional[int] = None
    radii: Sequence[Optional[float]] = (None,)
    nsamples: Sequence[Optional[int]] = (None,)
    mask_dummy: bool = False
    bn: bool = True
    use_xyz: bool = True
    spectral_norm: bool = True
    act: Callable = nn.relu
    # Fused grouped-MLP(+BN)+max-pool Pallas path (pooled_mlp_kernel.py):
    # the [B, M, ns, C'] per-layer intermediates never reach HBM. Exact to
    # the XLA path's own (bf16-matmul-pass) precision class. None = auto:
    # inference calls only — the current backward is a recompute through
    # the XLA formulation, so training would pay the fused forward ON TOP
    # of the recompute (measured: no win). True forces it everywhere.
    fused: Optional[bool] = None
    # Opt this module into the fused path in TRAINING graphs too (uses the
    # dedicated multi-pass Pallas backward). Measured per-tower on the v5e
    # chip (tools/bench_tower_bwd.py): the fluid spatial tower wins
    # (42.4 -> 37.7 ms fwd+bwd), the tempo tower loses (58.3 -> 65.2 ms),
    # so this is a per-module knob rather than a global default. Still
    # honors the TPUGAN_FUSED_SETCONV=0 kill switch.
    fused_train: bool = False

    @classmethod
    def ssg(cls, mlp, npoint=None, radius=None, nsample=None, **kw):
        """Single-scale grouping convenience (reference SSGSetConv)."""
        return cls(mlps=[mlp], radii=[radius], nsamples=[nsample],
                   npoint=npoint, **kw)

    def fps_centers(
        self, xyz: jnp.ndarray, valid: Optional[jnp.ndarray] = None
    ) -> Optional[jnp.ndarray]:
        """The FPS center indices this module would select for ``xyz``
        ([B, npoint] int32, or None for global pooling). Exposed so callers
        that evaluate the module on several same-shape clouds (e.g. the
        temporal towers' per-frame loop) can batch the sequential FPS
        rounds into ONE kernel call over the stacked rows — FPS rows are
        independent, so the selections are identical either way."""
        if self.npoint is None:
            return None
        npoint = min(self.npoint, xyz.shape[1])
        return fps(xyz, npoint, valid=valid if self.mask_dummy else None)

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,                       # [B, N, 3]
        features: Optional[jnp.ndarray] = None,  # [B, N, C]
        valid: Optional[jnp.ndarray] = None,     # [B, N] bool
        train: bool = True,
        centers: Optional[jnp.ndarray] = None,   # [B, npoint] int32
    ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
        if self.npoint is not None:
            # When the cloud is already smaller than npoint (tiny test
            # shapes), FPS beyond N would only produce duplicate centers at
            # heavy sequential cost; clamp like pointnet2's effective
            # behavior.
            if centers is None:
                centers = self.fps_centers(xyz, valid)
            new_xyz = gather(xyz, centers)
        else:
            new_xyz = None

        outs = []
        for i, mlp_spec in enumerate(self.mlps):
            if self.npoint is not None:
                grouped = query_and_group(
                    xyz, new_xyz, features,
                    radius=self.radii[i], nsample=self.nsamples[i],
                    use_xyz=self.use_xyz, c_valid=valid,
                )                                   # [B, M, ns, 3+C]
            else:
                grouped = group_all(xyz, features, use_xyz=self.use_xyz)
            use_fused = (self.fused if self.fused is not None
                         else (_FUSED_DEFAULT
                               and ((not train) or _FUSED_TRAIN
                                    or self.fused_train)))
            y = SharedMLP(
                mlp_spec, act=self.act,
                norm="batch" if self.bn else "none",
                spectral_norm=self.spectral_norm,
                use_bias=not self.bn,
            )(grouped, train=train, fused_pool=use_fused)
            if not use_fused:
                y = jnp.max(y, axis=2)
            outs.append(y)                           # [B, M, C']

        return new_xyz, jnp.concatenate(outs, axis=-1)
