import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.ops import basis, jacobian


def test_jacobian_matches_autodiff(rng):
    beta = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32)) * 0.2
    point = jnp.asarray([2.0, 3.0, 1.5])
    j_closed = jacobian.quadratic_jacobian(beta, point)
    j_auto = jax.jacfwd(lambda p: basis.warp_points(p, beta))(point)
    np.testing.assert_allclose(
        np.asarray(j_closed), np.asarray(j_auto), rtol=1e-4, atol=1e-5
    )


def test_identity_has_zero_log_det():
    beta = basis.identity_beta(1)[0]
    ld = jacobian.log_det_jacobian(beta, jnp.asarray([5.0, 5.0, 1.0]))
    assert abs(float(ld)) < 1e-5


def test_corner_regularizer_batched(rng):
    betas = basis.identity_beta(3) + 0.01 * jnp.asarray(
        rng.normal(size=(3, 10, 3)).astype(np.float32)
    )
    reg = jacobian.corner_regularizer(betas, (10, 10, 2))
    assert reg.shape == (3,)
    assert np.all(np.asarray(reg) >= 0)


def test_detach_blocks_gradient(rng):
    betas = basis.identity_beta(2) + 0.01 * jnp.asarray(
        rng.normal(size=(2, 10, 3)).astype(np.float32)
    )

    def loss(b, detach):
        return jnp.sum(jacobian.corner_regularizer(b, (8, 8, 2),
                                                   detach=detach))

    g_live = jax.grad(lambda b: loss(b, False))(betas)
    g_detached = jax.grad(lambda b: loss(b, True))(betas)
    assert float(jnp.abs(g_live).sum()) > 0
    assert float(jnp.abs(g_detached).sum()) == 0.0
