"""Pallas TPU kernels for the hot ops. All kernels run in interpret mode on
CPU for testing (pass interpret=True).

Production kernels (dispatched from ops.linalg / ops.kernels behind measured
size gates):

- ``chol_inv_pallas`` / ``chol_inv_blocked`` — fused Cholesky + triangular
  inverse, the train step's solve-elimination path (linalg.chol_inv).
- ``rbf_gram`` — fused RBF gram build.

EXPERIMENTAL (tested, not dispatched anywhere): ``small_cholesky`` /
``batched_small_cholesky`` (superseded by the fused chol_inv — keeping L⁻¹
out of the kernel re-introduces the downstream triangular-solve custom calls
the fused kernel exists to eliminate) and ``kron_mv_2`` (measured neutral at
the flagship's factor sizes, where the transpose-shuffle intermediate already
stays in cache; kept as the VMEM-resident building block for larger grids).
"""

from .chol_inv import chol_inv_blocked, chol_inv_pallas
from .cholesky import batched_small_cholesky, small_cholesky
from .kron_matvec import kron_mv_2
from .rbf_gram import rbf_gram

__all__ = [
    "rbf_gram",
    "chol_inv_pallas",
    "chol_inv_blocked",
    # experimental (see module docstring)
    "small_cholesky",
    "batched_small_cholesky",
    "kron_mv_2",
]
