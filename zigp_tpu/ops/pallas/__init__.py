"""Pallas TPU kernels for the hot ops. All kernels run in interpret mode on
CPU for testing (pass interpret=True).

Production kernels (dispatched from ops.linalg behind measured size gates):

- ``chol_inv_pallas`` / ``chol_inv_blocked`` — fused Cholesky + triangular
  inverse, the train step's solve-elimination path (linalg.chol_inv).

Opt-in (``use_pallas=True`` on ops.kernels gram builds; no production path
enables it by default — measured disposition in RESULTS.md: XLA fusion
already absorbs the gram build at the shipped shapes):

- ``rbf_gram`` — fused RBF gram build.

EXPERIMENTAL (tested, not dispatched anywhere): ``small_cholesky`` /
``batched_small_cholesky`` (superseded by the fused chol_inv — keeping L⁻¹
out of the kernel re-introduces the downstream triangular-solve custom calls
the fused kernel exists to eliminate) and ``kron_mv_2`` (measured neutral at
the flagship's factor sizes, where the transpose-shuffle intermediate already
stays in cache; kept as the VMEM-resident building block for larger grids).

EXPERIMENTAL, round-3 solve-free alternatives (measured A/B at the flagship
and 105×250 scale steps — kept with their numbers as the record of why the
fused kernel stays the production path):

- ``chol_pallas`` — L-only kernel variant with diagonal-block entries read
  by masked scalar picks instead of full-tile reduces. LOST ~20 % vs the
  fused kernel: per-pick (rv==j)[:,None] broadcasts relayout; at ~350 picks
  per 100×100 factorization the picks cost more than the r²/2 full-tile
  reduces they replace.
- ``tri_inv_newton`` — L⁻¹ in ⌈log₂n⌉ Newton matmul steps. FASTEST at the
  flagship (xla-chol+newton 5,612 vs fused 5,436 steps/s, +3 %) but
  numerically DISQUALIFIED: the truncated-Neumann intermediates overflow
  float32 whenever the strictly-lower part of D⁻¹L is large — the 250-knot
  pptr temporal factor infs at the last squaring *at init*, and the
  overflow boundary moves with learned lengthscales.
- ``tri_inv_dc`` — overflow-safe divide-and-conquer block inverse (every
  intermediate is a final sub-inverse). Robust where newton infs, but LOST
  ~18 % at the flagship and ~30 % at scale: the per-level diagonal-block
  gathers/concats cost more op latency than they save in solve depth.
"""

from .chol_inv import (
    chol_inv_blocked,
    chol_inv_pallas,
    chol_pallas,
    tri_inv_dc,
    tri_inv_newton,
)
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
    "chol_pallas",
    "tri_inv_newton",
    "tri_inv_dc",
]
