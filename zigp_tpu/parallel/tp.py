"""Tensor parallelism over the Kronecker inducing dimension.

For huge grids (M = Ms·Mt beyond one chip's HBM — e.g. thousands of stations ×
thousands of knots), the memory-heavy objects are the variational parameters
q_mu/q_sqrt (M) and the O(M·B) contraction work; the per-factor grams and
Choleskys stay small. This module shards the *spatial factor index* of the
whitened Kronecker GP across the mesh ``model`` axis with ``shard_map``:

- replicated: factor grams, Choleskys, V_p = L_p⁻¹ Kmn_p (O(ΣM_p²) objects)
- sharded over ``model``: q_mu, q_sqrt (reshaped (Ms, Mt), rows split), the
  mean/variance contractions (each device contracts its row block, psum over
  ICI), and the whitened-KL partial sums.

Semantically identical to ``KronGP(whiten=True)`` (equivalence-tested on an
8-virtual-device mesh); the reference has no distributed anything
(SURVEY §2: "Parallelism / distributed components: NONE").
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax ≥ 0.6 public API
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import linalg


def tp_whitened_kron_predict_and_kl(
    mesh: Mesh,
    kernels: Sequence,
    Zs: Sequence[jnp.ndarray],
    q_mu: jnp.ndarray,
    q_sqrt: jnp.ndarray,
    Xnew: jnp.ndarray,
    input_masks,
    *,
    jitter: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(mean (B,1), var (B,1), kl) for a 2-factor whitened Kron GP with the
    spatial-factor rows of q_mu/q_sqrt sharded over the mesh 'model' axis.
    """
    assert len(Zs) == 2, "tensor-parallel path implemented for 2 factors"
    Ms, Mt = Zs[0].shape[0], Zs[1].shape[0]
    B = Xnew.shape[0]

    # replicated small algebra
    Kmms = [linalg.add_jitter(k.K(Z), jitter) for k, Z in zip(kernels, Zs)]
    Ls = [linalg.cholesky(K) for K in Kmms]
    Knn = jnp.ones((B,), dtype=Xnew.dtype)
    Vs_list = []
    for p, (k, Z, L) in enumerate(zip(kernels, Zs, Ls)):
        xp = Xnew[:, jnp.array(tuple(input_masks[p]))]
        Knn = Knn * k.Kdiag(xp)
        Vs_list.append(linalg.tri_solve(L, k.K(Z, xp), lower=True))
    Vs, Vt = Vs_list  # (Ms, B), (Mt, B)

    c1 = jnp.sum(jnp.square(Vs), axis=0) * jnp.sum(jnp.square(Vt), axis=0)

    W = q_mu.reshape(Ms, Mt)
    Ssq = jnp.square(q_sqrt).reshape(Ms, Mt)

    def shard_fn(W_s, Ssq_s, Vs_rows):
        # W_s: (Ms/n, Mt) local rows; Vs_rows: (Ms/n, B)
        t_mu = jnp.einsum("ij,ib->bj", W_s, Vs_rows)  # (B, Mt) partial
        mu_part = jnp.einsum("bj,jb->b", t_mu, Vt)
        mu = jax.lax.psum(mu_part, "model")

        t_c2 = jnp.einsum("ij,ib->bj", Ssq_s, jnp.square(Vs_rows))
        c2 = jax.lax.psum(jnp.einsum("bj,jb->b", t_c2, jnp.square(Vt)), "model")

        # whitened KL partial sums: ½(Σm² − M − Σlog s² + Σ s²)
        kl_part = 0.5 * (
            jnp.sum(jnp.square(W_s)) - jnp.sum(jnp.log(Ssq_s)) + jnp.sum(Ssq_s)
        )
        kl = jax.lax.psum(kl_part, "model") - 0.5 * (Ms * Mt)
        return mu, c2, kl

    mu, c2, kl = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("model", None), P("model", None), P("model", None)),
        out_specs=(P(), P(), P()),
    )(W, Ssq, Vs)

    var = jnp.maximum(Knn - c1 + c2, 0.0)
    return mu[:, None], var[:, None], kl


def tp_shardings(mesh: Mesh, Ms: int, Mt: int):
    """NamedShardings for placing (Ms, Mt)-reshaped variational parameters
    row-sharded over the model axis."""
    return NamedSharding(mesh, P("model", None))
