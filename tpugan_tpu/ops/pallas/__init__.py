"""Pallas TPU kernels for the hot neighbor ops.

Why these exist: the XLA lowering of ``lax.top_k`` sorts full distance rows
through HBM, and iterative FPS as a ``fori_loop`` of whole-array ops pays
per-iteration kernel overhead. The kernels here keep the working set in
VMEM: kNN computes each [TILE_Q, Nc] distance block on the MXU and extracts
k minima in-register before anything is written back; FPS runs all ``m``
selection rounds over a VMEM-resident [3, N] layout in one kernel launch.
"""

from tpugan_tpu.ops.pallas.knn_kernel import knn_pallas
from tpugan_tpu.ops.pallas.fps_kernel import fps_pallas

__all__ = ["knn_pallas", "fps_pallas"]
