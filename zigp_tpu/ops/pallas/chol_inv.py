"""Pallas TPU kernel: fused Cholesky + triangular inverse for small matrices.

The flagship train step factorizes tiny Kronecker factor grams (10×10,
100×100) and then hits them with ~19 triangular solves per factor per step
(forward + reverse-mode). On TPU each XLA Cholesky/TriangularSolve lowers to
a custom call with ~10 µs fixed latency — measured ~76 µs/step of the
202 µs step, the single largest cost. This kernel computes L = chol(K) and
Linv = L⁻¹ together in one VMEM-resident loop; every downstream solve then
becomes an MXU matmul, and the custom VJP (ops.linalg.chol_inv) is
matmul-only, so the entire train step contains zero solve custom calls.

Three measured negative results shaped this design (v5e, flagship step):
a stacked-pair variant (both G=2 matrices in one program on a (2n, n) tile,
halving the sequential program chain) was a wash (137.5 vs 136.9 µs/step) —
the per-iteration top/bottom pivot and row picks double the op count, so the
loop is throughput-bound at this tile size, not chain-bound;
a blocked/MXU variant (8×8 diagonal blocks + panel matmuls) lost ~26 µs/step
because Mosaic matmuls only offer DEFAULT precision (bf16 — loses the
factor's positive-definiteness and NaNs the run) or HIGHEST (6-pass, too
slow at n ≤ 128); and batching the G matrices into one program on (G, n, n)
tiles lost ~55 µs/step to 3-D relayouts. One grid program per matrix with
2-D tiles wins.

Replaces the per-step linear algebra of the reference's ``kron_inf``
(scripts/onoff.py:186-213), which materializes dense ``matrix_inverse``
products instead.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_body(K, n: int, rank: int = 2):
    """Right-looking Cholesky interleaved with forward substitution on I,
    ``rank`` columns per iteration (rank-r Schur updates).

    Iteration t finalizes columns j = r·t .. r·t+r−1 of L and the matching
    rows of L⁻¹: the r×r diagonal block's Cholesky is done in scalar math on
    masked-reduced entries, the r columns absorb each other's updates inline
    (vector ops), and all r outer products hit the trailing block together —
    dividing the count of matrix-wide ops (the big tiles that bound this
    latency-dominated loop: the (n, n) tiles are only ~⌈n/8⌉ vregs, so
    per-op cost is issue latency, not vector throughput) by r.

    Mosaic has no dynamic_slice on VMEM tiles, so column/row picks use masked
    reductions (iota == j); every *scalar* pick goes through a 2-D masked
    reduce — Mosaic miscompiles 1-D masked scalar picks (relayout bug on
    vector<1xN>). The updates deliberately touch only the strictly-trailing
    region; row garbage above the diagonal is zeroed at the end.

    No pivot clamp: a non-PSD input must yield NaN (sqrt of a negative pivot
    propagates), matching lax.linalg.cholesky instead of silently returning
    garbage. n must be divisible by ``rank`` (callers pad with an identity
    tail).
    """
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rv = row_ids[:, 0]
    r = rank

    B = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(K.dtype)

    def body(t, carry):
        A, B = carry
        js = [r * t + c for c in range(r)]
        is_col = [col_ids == j for j in js]
        is_row = [row_ids == j for j in js]

        # r×r diagonal-block entries, each read as a 2-D masked reduce
        s = {
            (c, d): jnp.sum(jnp.where(is_row[c] & is_col[d], A, 0.0))
            for c in range(r)
            for d in range(c + 1)
        }
        # scalar Cholesky of the block: piv[c], l[(d,c)] = L[j_d, j_c]
        piv = [None] * r
        l = {}
        for c in range(r):
            piv[c] = jnp.sqrt(s[(c, c)] - sum(l[(c, e)] * l[(c, e)] for e in range(c)))
            for d in range(c + 1, r):
                l[(d, c)] = (
                    s[(d, c)] - sum(l[(d, e)] * l[(c, e)] for e in range(c))
                ) / piv[c]

        # columns of L: each absorbs the in-block deferred updates inline
        v = [None] * r
        for c in range(r):
            u = jnp.sum(jnp.where(is_col[c], A, 0.0), axis=1)
            for e in range(c):
                u = u - v[e] * l[(c, e)]
            v[c] = jnp.where(rv >= js[c], u / piv[c], 0.0)

        # rows of L⁻¹ by forward substitution on the block
        w = [None] * r
        for c in range(r):
            q = jnp.sum(jnp.where(is_row[c], B, 0.0), axis=0)
            for e in range(c):
                q = q - l[(c, e)] * w[e]
            w[c] = q / piv[c]

        last = js[-1]
        trailing = (row_ids > last) & (col_ids > last)
        upd = sum(vc[:, None] * vc[None, :] for vc in v)
        A = A - jnp.where(trailing, upd, 0.0)
        for c in range(r):
            A = jnp.where(is_col[c], v[c][:, None], A)

        below = row_ids > last
        bupd = sum(vc[:, None] * wc[None, :] for vc, wc in zip(v, w))
        B = B - jnp.where(below, bupd, 0.0)
        for c in range(r):
            B = jnp.where(is_row[c], w[c][None, :], B)
        return A, B

    A, B = jax.lax.fori_loop(0, n // r, body, (K, B))
    tril_mask = row_ids >= col_ids
    return jnp.where(tril_mask, A, 0.0), jnp.where(tril_mask, B, 0.0)


def _kernel(k_ref, l_ref, linv_ref, *, n: int, rank: int):
    L, Linv = _chol_inv_body(k_ref[0], n, rank)
    l_ref[0] = L
    linv_ref[0] = Linv


def _chol_body(K, n: int, rank: int = 4):
    """L-only right-looking Cholesky, ``rank`` columns per iteration.

    EXPERIMENTAL — measured ~20 % SLOWER than the full fused kernel at the
    flagship step despite doing half the work: the masked scalar picks this
    body leans on (r(r+1)/2 + r per iteration, each a (rv==j)[:, None]
    broadcast + (n, 1) reduce) relayout per pick and cost more than the
    full-tile reduces they replace. Kept as the documented negative result;
    see ops/pallas/__init__.py.

    Structure: no inverse carry (the per-iteration row picks and the B
    outer-product update disappear), and the r×r diagonal-block entries are
    picked from the already-extracted column vectors — after column c
    absorbs the in-block updates, entry j_d of it *is* l[(d,c)]·piv[c], so
    the block factor entries are single picks. (The picks go through a
    [:, None] broadcast to 2-D — Mosaic miscompiles 1-D masked scalar
    picks.)
    """
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rv = row_ids[:, 0]
    r = rank

    def pick(vec, j):
        # scalar vec[j] as a 2-D masked reduce on an (n, 1) tile
        return jnp.sum(jnp.where((rv == j)[:, None], vec[:, None], 0.0))

    def body(t, A):
        js = [r * t + c for c in range(r)]
        is_col = [col_ids == j for j in js]

        v = [None] * r
        piv = [None] * r
        l = {}
        for c in range(r):
            u = jnp.sum(jnp.where(is_col[c], A, 0.0), axis=1)
            for e in range(c):
                u = u - v[e] * l[(c, e)]
            piv[c] = jnp.sqrt(pick(u, js[c]))
            for d in range(c + 1, r):
                l[(d, c)] = pick(u, js[d]) / piv[c]
            v[c] = jnp.where(rv >= js[c], u / piv[c], 0.0)

        last = js[-1]
        trailing = (row_ids > last) & (col_ids > last)
        upd = sum(vc[:, None] * vc[None, :] for vc in v)
        A = A - jnp.where(trailing, upd, 0.0)
        for c in range(r):
            A = jnp.where(is_col[c], v[c][:, None], A)
        return A

    A = jax.lax.fori_loop(0, n // r, body, K)
    return jnp.where(row_ids >= col_ids, A, 0.0)


def _chol_only_kernel(k_ref, l_ref, *, n: int, rank: int):
    l_ref[0] = _chol_body(k_ref[0], n, rank)


@functools.partial(jax.jit, static_argnames=("interpret", "rank"))
def chol_pallas(K, *, interpret: bool = False, rank: int = 4):
    """L = chol(K) only, batched (..., n, n) float32 — the L⁻¹-free variant
    of ``chol_inv_pallas`` (pair it with ``tri_inv_newton`` for the inverse)."""
    batch_shape = K.shape[:-2]
    n = K.shape[-1]
    Kb = K.astype(jnp.float32).reshape((-1, n, n))
    G = Kb.shape[0]
    m = -(-n // rank) * rank
    if m != n:
        Kb = jnp.pad(Kb, ((0, 0), (0, m - n), (0, m - n)))
        tail = (jnp.arange(m)[:, None] == jnp.arange(m)[None, :]) & (
            jnp.arange(m)[None, :] >= n
        )
        Kb = Kb + tail.astype(Kb.dtype)[None]
    L = pl.pallas_call(
        functools.partial(_chol_only_kernel, n=m, rank=rank),
        out_shape=jax.ShapeDtypeStruct((G, m, m), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(Kb)
    return L[:, :n, :n].reshape(batch_shape + (n, n))


def tri_inv_newton(L: jnp.ndarray) -> jnp.ndarray:
    """L⁻¹ for lower-triangular L in ⌈log₂n⌉ Newton steps — matmuls only.

    EXPERIMENTAL — fastest measured flagship variant (xla-chol + newton
    5,612 vs fused-kernel 5,436 steps/s) but NOT production-safe: see the
    overflow caveat below and ops/pallas/__init__.py.

    X ← X(2I − LX) with X₀ = diag(L)⁻¹ is *exact* in exact arithmetic after
    ⌈log₂n⌉ iterations: writing L = D(I+N) with N strictly lower (nilpotent,
    Nⁿ = 0), the iterate equals Σ_{j<2^k}(−N)ʲ D⁻¹ — a truncated Neumann
    series that terminates. The catch: the *partial* sums legitimately
    contain huge alternating terms whenever ‖N‖ ≳ 1 — they only cancel at
    full depth — so intermediates overflow float32 in a structure-dependent
    way. Measured: the pptr scale config's 250-knot temporal factor
    (‖N‖₂ ≈ 1.9) infs at the last squaring at init, while the 105-centre
    spatial factor with ‖N‖₂ ≈ 500 survives (its N ʲ decay truncates early).
    Since the boundary moves with learned lengthscales, this is unusable as
    a production path; ``tri_inv_dc`` is the overflow-safe (slower)
    log-depth form. All products run at Precision.HIGHEST: these matmuls
    REPLACE a triangular-solve custom call, where bf16 products measurably
    poison training (see linalg.hdot). Zeros below stay exact: products of
    lower triangulars never touch the upper triangle.
    """
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    d = 1.0 / jnp.diagonal(L, axis1=-2, axis2=-1)  # (..., n)
    # First level is free of matmuls: X₁ = X₀(2I − LX₀) with diagonal
    # X₀ = D⁻¹ is elementwise row/column scaling: 2D⁻¹ − D⁻¹LD⁻¹.
    X = 2.0 * eye * d[..., :, None] - L * d[..., :, None] * d[..., None, :]
    I2 = 2.0 * eye
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    for _ in range(max(0, math.ceil(math.log2(max(n, 2))) - 1)):
        X = mm(X, I2 - mm(L, X))
    return X


def tri_inv_dc(L: jnp.ndarray) -> jnp.ndarray:
    """L⁻¹ for lower-triangular L by divide-and-conquer block inversion —
    log₂n levels of *batched* MXU matmuls, overflow-safe.

    EXPERIMENTAL — robust where ``tri_inv_newton`` overflows, but measured
    ~18 % slower than the fused kernel at the flagship step and ~30 % at the
    105×250 scale step (the per-level diagonal-block gathers and concats
    cost more op-issue latency than the log solve depth saves); kept as the
    documented negative result. See ops/pallas/__init__.py.

    inv([[A, 0], [B, C]]) = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]] applied bottom-up:
    level s holds the n/s diagonal s×s block inverses as a batch
    (..., n/s, s, s); doubling a level computes every off-diagonal block with
    two batched matmuls. Unlike ``tri_inv_newton`` (whose truncated-Neumann
    intermediates overflow float32 whenever ‖D⁻¹L − I‖ ≳ 1 — measured: the
    250-knot temporal RBF factor at the pptr scale config infs at the last
    squaring), every quantity here is a *final* sub-inverse, bounded by
    ‖L⁻¹‖ — there is nothing to overflow. Matmuls run at Precision.HIGHEST
    (they replace a triangular-solve custom call; see linalg.hdot).

    Accuracy matches forward substitution (same error model: products of
    computed sub-inverses); cost is ~n³/4 MACs total (vs n³/2 for
    substitution) in 2⌈log₂n⌉ batched matmuls.
    """
    n = L.shape[-1]
    batch = L.shape[:-2]
    m = 1 << max(0, (n - 1).bit_length())  # next power of two
    if m != n:
        # identity tail: inv(blockdiag(L, I)) = blockdiag(inv L, I)
        pad = [(0, 0)] * (len(batch)) + [(0, m - n), (0, m - n)]
        tail = (jnp.arange(m)[:, None] == jnp.arange(m)[None, :]) & (
            jnp.arange(m)[None, :] >= n
        )
        L = jnp.pad(L, pad) + tail.astype(L.dtype)
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)

    if m == 1:
        return (1.0 / L)[..., :n, :n]

    # base level s=2, elementwise: inv([[a,0],[b,c]]) = [[1/a,0],[-b/(ac),1/c]]
    Lb = L.reshape(batch + (m // 2, 2, m // 2, 2))
    Ld = jnp.moveaxis(jnp.diagonal(Lb, axis1=-4, axis2=-2), -1, -3)  # (..., m/2, 2, 2)
    a = Ld[..., 0:1, 0:1]
    b = Ld[..., 1:2, 0:1]
    c = Ld[..., 1:2, 1:2]
    zero = jnp.zeros_like(a)
    X = jnp.concatenate(
        [
            jnp.concatenate([1.0 / a, zero], axis=-1),
            jnp.concatenate([-b / (a * c), 1.0 / c], axis=-1),
        ],
        axis=-2,
    )  # (..., m/2, 2, 2)

    s = 2
    while s < m:
        nb = m // (2 * s)
        # diagonal (2s × 2s) blocks of L, batched: (..., nb, 2s, 2s)
        L4 = L.reshape(batch + (nb, 2 * s, nb, 2 * s))
        Ldb = jnp.moveaxis(jnp.diagonal(L4, axis1=-4, axis2=-2), -1, -3)
        L21 = Ldb[..., s:, :s]  # (..., nb, s, s)
        X11 = X[..., 0::2, :, :]
        X22 = X[..., 1::2, :, :]
        X21 = -mm(X22, mm(L21, X11))
        zeros = jnp.zeros_like(X21)
        X = jnp.concatenate(
            [
                jnp.concatenate([X11, zeros], axis=-1),
                jnp.concatenate([X21, X22], axis=-1),
            ],
            axis=-2,
        )  # (..., nb, 2s, 2s)
        s *= 2
    return X[..., 0, :n, :n]


@functools.partial(jax.jit, static_argnames=("interpret", "rank"))
def chol_inv_pallas(K, *, interpret: bool = False, rank: int = 4):
    """(L, L⁻¹) of a batch (..., n, n) of small SPD matrices (float32).

    One grid program per matrix; both factorization and inverse stay in VMEM.
    ``rank``: columns finalized per loop iteration (see _chol_inv_body).
    Default 4 — interleaved A/B at the flagship scanned step (v5e): rank-4
    ~6,240 steps/s vs rank-2 ~6,190, a consistent ~1 % from quartering the
    matrix-wide update ops; the in-block scalar chain growth caps further
    gains (rank-2 → rank-4 was +1 %, rank-1 → rank-2 was +9 %).
    """
    batch_shape = K.shape[:-2]
    n = K.shape[-1]
    Kb = K.astype(jnp.float32).reshape((-1, n, n))
    G = Kb.shape[0]
    # Pad with an identity tail (chol/inv of blockdiag(K, I) is
    # blockdiag(chol(K), I)) — the loop consumes columns ``rank`` at a time.
    m = -(-n // rank) * rank
    if m != n:
        Kb = jnp.pad(Kb, ((0, 0), (0, m - n), (0, m - n)))
        tail = (jnp.arange(m)[:, None] == jnp.arange(m)[None, :]) & (
            jnp.arange(m)[None, :] >= n
        )
        Kb = Kb + tail.astype(Kb.dtype)[None]
    L, Linv = pl.pallas_call(
        functools.partial(_kernel, n=m, rank=rank),
        out_shape=(
            jax.ShapeDtypeStruct((G, m, m), jnp.float32),
            jax.ShapeDtypeStruct((G, m, m), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=(
                pl.BlockSpec((1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(Kb)
    return (
        L[:, :n, :n].reshape(batch_shape + (n, n)),
        Linv[:, :n, :n].reshape(batch_shape + (n, n)),
    )


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def chol_inv_blocked(K, *, nb: int | None = None, interpret: bool = False):
    """Blocked (L, L⁻¹) for medium matrices (128 < n ≤ 512, float32).

    Two-level scheme (VERDICT r2 #2): the exact sequential rank-4 Pallas
    kernel factorizes the *diagonal* blocks — where fp exactness is
    load-bearing (pivots/divisions) — while panels, trailing Schur updates,
    and the L⁻¹ block back-substitution are MXU matmuls at Precision.HIGHEST
    (exact f32 via 6-pass; these matmuls REPLACE triangular solves, so bf16
    products here would poison positive-definiteness — the measured round-2
    failure of the uniformly-bf16 8×8 blocked variant). Sequential vector
    work drops from O(n³) to O(n·nb²); the O(n³) bulk rides the MXU.

    Blocks are RAGGED with an adaptive size: ``nb=None`` picks
    ceil(n/ceil(n/128)) rounded up to the 8-sublane granule, and the last
    block is simply smaller — a fixed-128 grid instead pads n up to a
    multiple of 128 and runs the sequential kernel over up to 127 columns of
    identity padding (n=200 costs two full 128-blocks, 64 loop iterations on
    16-sublane tiles; adaptive 104+96 costs 50 iterations on 13-sublane
    tiles). Measured (v5e, interleaved 3×8×100-step blocks,
    results/blocked_ragged_ab.json): a WASH — champion 32×200 config 2399 vs
    2394 steps/s, scale 105×250 2846 vs 2870 — the sequential kernel's wall
    time is not proportional to iterations × tile rows at these sizes (loop
    overhead and the scalar pivot chain dominate). Ragged kept for the
    cleaner semantics (never factorizes padding) at equal measured cost.

    Replaces the XLA fallback at the 105×250 scale config, where the 250-knot
    temporal factor's chol+solve custom calls dominate the step (RESULTS.md).
    Reference hot spot being replaced: /root/reference/onofftf/main.py:356.
    """
    batch_shape = K.shape[:-2]
    n = K.shape[-1]
    if nb is None:
        nblk = -(-n // 128)
        even = -(-n // nblk)  # ceil(n/nblk): evenly split the blocks ...
        nb = -(-even // 8) * 8  # ... rounded up to the 8-sublane granule
    offs = list(range(0, n, nb)) + [n]
    nblk = len(offs) - 1
    sizes = [offs[i + 1] - offs[i] for i in range(nblk)]
    Kb = K.astype(jnp.float32).reshape((-1, n, n))
    G = Kb.shape[0]

    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    mT = lambda a: jnp.swapaxes(a, -1, -2)

    # blocked right-looking Cholesky; nblk ≤ 4 so the Python loops unroll
    A = Kb
    Lb = [[None] * nblk for _ in range(nblk)]
    Ld_inv = [None] * nblk
    for i in range(nblk):
        d = slice(offs[i], offs[i + 1])
        Lii, Linv_ii = chol_inv_pallas(A[:, d, d], interpret=interpret)
        Lb[i][i] = Lii
        Ld_inv[i] = Linv_ii
        if i + 1 < nblk:
            t = slice(offs[i + 1], n)
            # panel: L[t, i] = A[t, i] L_iiᵀ⁻¹  (matmul against the inverse)
            P = mm(A[:, t, d], mT(Linv_ii))
            for j in range(i + 1, nblk):
                Lb[j][i] = P[:, offs[j] - offs[i + 1] : offs[j + 1] - offs[i + 1], :]
            A = A.at[:, t, t].add(-mm(P, mT(P)))

    # L⁻¹ by block forward substitution: (L⁻¹)_ij = −L_ii⁻¹ Σ_k L_ik (L⁻¹)_kj
    Bi = [[None] * nblk for _ in range(nblk)]
    for i in range(nblk):
        Bi[i][i] = Ld_inv[i]
        for j in range(i - 1, -1, -1):
            S = jnp.zeros((G, sizes[i], sizes[j]), dtype=Kb.dtype)
            for k in range(j, i):
                S = S + mm(Lb[i][k], Bi[k][j])
            Bi[i][j] = -mm(Ld_inv[i], S)

    def _assemble(blocks):
        return jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        blocks[i][j]
                        if j <= i
                        else jnp.zeros((G, sizes[i], sizes[j]), dtype=Kb.dtype)
                        for j in range(nblk)
                    ],
                    axis=-1,
                )
                for i in range(nblk)
            ],
            axis=-2,
        )

    L = _assemble(Lb)
    Linv = _assemble(Bi)
    return (
        L.reshape(batch_shape + (n, n)),
        Linv.reshape(batch_shape + (n, n)),
    )

