"""flax module library over padded channels-last point batches.

Replaces the reference's torch module zoo (gcn_lib/pointnet/gcn.py,
gcn_lib/nn.py, discriminator.py:63-322) with jit/vmap-friendly flax.linen
modules. Layout convention: features are ``[B, N, C]`` (channels last) and
neighborhoods are ``[B, N, K, C]`` — a Dense on the last axis is the exact
TPU-native analog of the reference's 1x1 Conv2d on ``[B, C, N, K]`` and maps
straight onto the MXU.
"""

from tpugan_tpu.nn.layers import SharedMLP, ConvLayer, MLP
from tpugan_tpu.nn.edgeconv import EdgeConv, IDGCNLayer
from tpugan_tpu.nn.setconv import SetConv
from tpugan_tpu.nn.flow import FlowEmbedding, FlowModule

__all__ = [
    "SharedMLP",
    "ConvLayer",
    "MLP",
    "EdgeConv",
    "IDGCNLayer",
    "SetConv",
    "FlowEmbedding",
    "FlowModule",
]
