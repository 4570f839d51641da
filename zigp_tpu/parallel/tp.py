"""Tensor parallelism over the Kronecker inducing dimension.

For huge grids (M = Ms·Mt beyond one chip's HBM — e.g. thousands of stations ×
thousands of knots), the memory-heavy objects are the variational parameters
q_mu/q_sqrt (M rows), their Adam moments, and the O(M·B) contraction work;
the per-factor grams and Choleskys stay small (O(Σ M_p²)) and replicate.

Two layers, both semantically identical to single-device training (the
reference has no distributed anything — SURVEY §2: "Parallelism / distributed
components: NONE"):

1. **GSPMD training step** (``make_tp_train_step`` + ``tp_place``): the
   TPU-idiomatic path. The M-row variational leaves (and their optimizer
   moments) are placed row-sharded over the mesh ``model`` axis, the batch
   over ``data``; the full ELBO/grad/Adam update runs under one ``jit`` and
   XLA partitions the contractions and inserts the ICI collectives (psum of
   partial row-block contractions, gradient reduce) itself. Covers every
   model family — any factor count, diag or Kronecker-factored covariance,
   whitened or not, one or many GPs — because the sharding is a property of
   the *parameters*, not of a hand-written kernel.

2. **shard_map predict+KL** (``tp_whitened_kron_predict_and_kl``): a
   hand-scheduled variant of the memory-heavy pieces for the 2-factor
   whitened-diag family, kept as the explicit-collectives reference
   implementation (exact-equivalence tested against the model path).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax ≥ 0.6 public API
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import linalg


# --------------------------------------------------------------------------
# GSPMD tensor-parallel training
# --------------------------------------------------------------------------

_VARIATIONAL_KEYS = ("q_mu", "q_sqrt", "u_fm", "u_gm", "u_fs_sqrt", "u_gs_sqrt")


def _is_tp_shardable(path_name: str, leaf, n_model: int) -> bool:
    """Row-shard an array leaf iff it is one of the M-row variational objects
    (by pytree path name) and its leading axis divides over the model axis.
    ``q_sqrt_factors`` (per-factor M_p×M_p Choleskys) stay replicated — they
    are small by construction."""
    if "q_sqrt_factors" in path_name:
        return False
    if not any(k in path_name for k in _VARIATIONAL_KEYS):
        return False
    shape = getattr(leaf, "shape", None)
    return bool(shape) and len(shape) >= 1 and shape[0] % n_model == 0 and shape[0] >= n_model


def tp_shardings_tree(mesh: Mesh, tree):
    """A pytree of NamedShardings for ``tree``: M-row variational leaves (and
    anything shaped like them inside optimizer state, which reuses the model's
    field names in its paths) row-sharded over ``model``, the rest replicated."""
    n_model = mesh.shape["model"]
    row = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())

    def pick(path, leaf):
        name = jax.tree_util.keystr(path)
        if _is_tp_shardable(name, leaf, n_model):
            ndim = len(leaf.shape)
            return NamedSharding(mesh, P(*(("model",) + (None,) * (ndim - 1))))
        return rep

    return jax.tree_util.tree_map_with_path(pick, tree)


def tp_place(mesh: Mesh, tree):
    """device_put ``tree`` with tensor-parallel placements (see
    tp_shardings_tree)."""
    shardings = tp_shardings_tree(mesh, tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def make_tp_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Optional[Callable] = None,
    *,
    example_model=None,
    example_opt_state=None,
):
    """Jitted (model, opt_state, X, Y) -> (model, opt_state, loss) with the
    variational parameters (and their optimizer moments) row-sharded over the
    mesh ``model`` axis and the batch over ``data``.

    Pass model/opt_state through ``tp_place(mesh, ...)`` first (or give them
    here as example_* and use the returned ``place`` helper). The update is
    re-constrained to the same shardings every step, so parameters stay
    distributed for the whole run — including their Adam moments.
    """

    def _loss(model, X, Y):
        return loss_fn(model, X, Y) if loss_fn is not None else model.loss(X, Y)

    bsh = NamedSharding(mesh, P("data", None))

    # sharding trees are structural: build once from examples at trace time
    # via closure state, lazily on the first call
    cache = {}

    @partial(jax.jit, donate_argnums=(0, 1))
    def _step(model, opt_state, X, Y):
        loss, grads = jax.value_and_grad(_loss)(model, X, Y)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        model = jax.lax.with_sharding_constraint(model, cache["msh"])
        opt_state = jax.lax.with_sharding_constraint(opt_state, cache["osh"])
        return model, opt_state, loss

    def step(model, opt_state, X, Y):
        if "msh" not in cache:
            cache["msh"] = tp_shardings_tree(mesh, model)
            cache["osh"] = tp_shardings_tree(mesh, opt_state)
        X = jax.device_put(X, bsh)
        Y = jax.device_put(Y, bsh)
        return _step(model, opt_state, X, Y)

    step.jitted = _step
    return step


# --------------------------------------------------------------------------
# shard_map predict + KL (explicit-collectives reference path)
# --------------------------------------------------------------------------


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

    # Batch-scaled contraction class — same precision policy as the
    # single-chip conditionals (bdot/bulk_precision): TPU-default bf16
    # products here gave ~4e-3 relative drift vs the single-chip HIGHEST
    # path (ADVICE r4). Captured at trace time like every other pin.
    prec = linalg.bulk_precision()

    def shard_fn(W_s, Ssq_s, Vs_rows):
        # W_s: (Ms/n, Mt) local rows; Vs_rows: (Ms/n, B)
        t_mu = jnp.einsum("ij,ib->bj", W_s, Vs_rows, precision=prec)  # (B, Mt) partial
        mu_part = jnp.einsum("bj,jb->b", t_mu, Vt, precision=prec)
        mu = jax.lax.psum(mu_part, "model")

        t_c2 = jnp.einsum("ij,ib->bj", Ssq_s, jnp.square(Vs_rows), precision=prec)
        c2 = jax.lax.psum(
            jnp.einsum("bj,jb->b", t_c2, jnp.square(Vt), precision=prec), "model"
        )

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


