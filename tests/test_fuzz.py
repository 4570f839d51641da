"""Light property-based fuzzing: random factor counts/sizes/dims through the
Kronecker conditional and KL, checked against dense oracles built from the
same jax kernels (no hand-derived formulas — pure structural equivalence)."""

import numpy as np
import jax.numpy as jnp

from zigp_tpu.ops import conditionals, gauss_kl, linalg
from zigp_tpu.ops.kernels import RBF


def _dense_from_factors(mats):
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def test_fuzz_kron_conditional_and_kl():
    rng = np.random.RandomState(42)
    for trial in range(6):
        P = rng.randint(2, 4)
        sizes = rng.randint(2, 6, size=P)
        dims = rng.randint(1, 3, size=P)
        B = rng.randint(3, 12)
        Zs = [rng.rand(s, d) for s, d in zip(sizes, dims)]
        masks, start = [], 0
        for d in dims:
            masks.append(tuple(range(start, start + d)))
            start += d
        X = rng.rand(B, start)
        M = int(np.prod(sizes))
        q_mu = rng.randn(M, 1) * 0.3
        q_sqrt = np.abs(rng.randn(M, 1)) + 0.3
        ks = [
            RBF.create(list(0.2 + 0.3 * rng.rand(d)), 0.5 + rng.rand()) for d in dims
        ]

        mu, var = conditionals.kron_conditional(
            jnp.asarray(X), ks, [jnp.asarray(Z) for Z in Zs],
            jnp.asarray(q_mu), jnp.asarray(q_sqrt), masks, jitter=1e-6,
        )

        # dense oracle from the SAME jax kernels
        Kmms = [
            np.asarray(linalg.add_jitter(k.K(jnp.asarray(Z)), 1e-6))
            for k, Z in zip(ks, Zs)
        ]
        Kinv = _dense_from_factors([np.linalg.inv(K) for K in Kmms])
        Kmn = np.ones((1, B))
        Knn = np.ones(B)
        for p in range(P):
            xp = X[:, list(masks[p])]
            Kp = np.asarray(ks[p].K(jnp.asarray(Zs[p]), jnp.asarray(xp)))
            Kmn = (Kmn[:, None, :] * Kp[None, :, :]).reshape(-1, B)
            Knn *= float(np.asarray(ks[p].variance.value))
        A = Kinv @ Kmn
        mu_d = Kmn.T @ (Kinv @ q_mu)
        var_d = Knn - np.einsum("mb,mb->b", Kmn, A) + np.einsum(
            "mb,m,mb->b", A, (q_sqrt**2).ravel(), A
        )
        np.testing.assert_allclose(np.asarray(mu), mu_d, rtol=1e-5, atol=1e-8,
                                   err_msg=f"trial {trial} sizes {sizes}")
        np.testing.assert_allclose(np.asarray(var)[:, 0], np.maximum(var_d, 0),
                                   rtol=1e-5, atol=1e-8,
                                   err_msg=f"trial {trial} sizes {sizes}")

        kl = float(
            gauss_kl.gauss_kl_kron(
                jnp.asarray(q_mu), jnp.asarray(q_sqrt), [jnp.asarray(K) for K in Kmms]
            )
        )
        kl_dense = float(
            gauss_kl.gauss_kl(
                jnp.asarray(q_mu), jnp.asarray(q_sqrt),
                jnp.asarray(_dense_from_factors(Kmms)),
            )
        )
        np.testing.assert_allclose(kl, kl_dense, rtol=1e-6,
                                   err_msg=f"trial {trial} sizes {sizes}")
        assert kl >= -1e-8
