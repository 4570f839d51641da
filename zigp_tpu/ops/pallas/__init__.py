"""Pallas TPU kernels for the hot ops: fused RBF gram builds, fused
Cholesky + triangular inverse (the train step's solve-elimination path),
small/batched Cholesky, fused Kronecker matvec. All kernels run in interpret
mode on CPU for testing (pass interpret=True)."""

from .chol_inv import chol_inv_pallas
from .cholesky import batched_small_cholesky, small_cholesky
from .kron_matvec import kron_mv_2
from .rbf_gram import rbf_gram

__all__ = [
    "rbf_gram",
    "chol_inv_pallas",
    "small_cholesky",
    "batched_small_cholesky",
    "kron_mv_2",
]
