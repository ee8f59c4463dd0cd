"""Multiplicative-update parity vs a straightforward NumPy implementation
of the reference update equations (einsum forms from
/root/reference/Demix/dNMF.py:139-160)."""

import jax.numpy as jnp
import numpy as np

from dnmf_tpu.ops import mu


def _naive_temporal(a_t, c, y, gamma=None):
    """NumPy transliteration of the reference MU equations.

    a_t: [P, K, T], c: [K, T], y: [P, T].
    """
    a_ts = np.einsum("pkt,plt->klt", a_t, a_t)
    c1 = np.einsum("pkt,pt->kt", a_t, y)
    c2 = np.einsum("klt,lt->kt", a_ts, c)
    if gamma is not None:
        reg = np.hstack((c[:, :1], c[:, :-1])) + np.hstack(
            (c[:, 1:], c[:, -1:])
        )
        c1 = c1 + gamma * reg
        c2 = c2 + 2 * gamma * c
    return c * c1 / (c2 + 1e-32)


def _setup(rng, p=40, k=4, t=6):
    a_t = rng.uniform(size=(p, k, t)).astype(np.float64)
    c = rng.uniform(0.1, 1.0, size=(k, t)).astype(np.float64)
    y = rng.uniform(size=(p, t)).astype(np.float64)
    return a_t, c, y


def _grams(a_t, y):
    pairs = [
        mu.mu_grams(jnp.asarray(a_t[:, :, t]), jnp.asarray(y[:, t]))
        for t in range(a_t.shape[2])
    ]
    grams = jnp.stack([g for g, _ in pairs])
    c1 = jnp.stack([c for _, c in pairs])
    return grams, c1


def test_single_step_matches_reference_equations(rng):
    a_t, c, y = _setup(rng)
    grams, c1 = _grams(a_t, y)
    ours = mu.mu_temporal_step(jnp.asarray(c), grams, c1, gamma=None)
    naive = _naive_temporal(a_t, c, y, gamma=None)
    np.testing.assert_allclose(np.asarray(ours), naive, rtol=1e-5)


def test_single_step_with_smoothing(rng):
    a_t, c, y = _setup(rng)
    grams, c1 = _grams(a_t, y)
    ours = mu.mu_temporal_step(jnp.asarray(c), grams, c1, gamma=0.3)
    naive = _naive_temporal(a_t, c, y, gamma=0.3)
    np.testing.assert_allclose(np.asarray(ours), naive, rtol=1e-5)


def test_iterated_updates_match(rng):
    """Precomputed-Gram iteration == reference's recompute-every-iter loop."""
    a_t, c, y = _setup(rng)
    grams, c1 = _grams(a_t, y)
    ours = mu.run_mu_temporal(jnp.asarray(c), grams, c1, iters=20, gamma=0.1)
    naive = c.copy()
    for _ in range(20):
        naive = _naive_temporal(a_t, naive, y, gamma=0.1)
    np.testing.assert_allclose(np.asarray(ours), naive, rtol=1e-4)


def test_nonnegativity_preserved(rng):
    a_t, c, y = _setup(rng)
    grams, c1 = _grams(a_t, y)
    out = mu.run_mu_temporal(jnp.asarray(c), grams, c1, iters=50, gamma=0.0)
    assert np.all(np.asarray(out) >= 0)


def test_nnls_matches_exact_per_frame_solution(rng):
    """FISTA converges to the per-frame exact NNLS solution (the convex
    subproblem's unique-enough optimum) where MU at the same iteration
    count still carries crosstalk."""
    from scipy.optimize import nnls as scipy_nnls

    # Strongly correlated columns: two near-duplicate footprints.
    p, k, t = 60, 4, 5
    a = rng.uniform(size=(p, k))
    a[:, 1] = a[:, 0] + 0.15 * rng.uniform(size=p)  # heavy overlap
    a_t = np.repeat(a[:, :, None], t, axis=2)
    c = rng.uniform(0.1, 1.0, size=(k, t))
    y = rng.uniform(size=(p, t))
    grams, c1 = _grams(a_t, y)

    ours = mu.nnls_temporal(jnp.asarray(c), grams, c1, iters=2000)
    exact = np.stack(
        [scipy_nnls(a, y[:, i])[0] for i in range(t)], axis=1)
    # Near-duplicate columns leave the minimizer nearly degenerate
    # along (e_0 - e_1); iterates converge slower than the objective.
    np.testing.assert_allclose(np.asarray(ours), exact, rtol=5e-3,
                               atol=5e-4)


def test_nnls_smoothed_matches_mu_fixed_point(rng):
    """With temporal smoothing on, FISTA and (long-run) MU minimize the
    same objective — their solutions agree."""
    a_t, c, y = _setup(rng)
    grams, c1 = _grams(a_t, y)
    via_mu = mu.run_mu_temporal(jnp.asarray(c), grams, c1, iters=4000,
                                gamma=0.2)
    via_fista = mu.nnls_temporal(jnp.asarray(c), grams, c1, iters=300,
                                 gamma=0.2)
    np.testing.assert_allclose(np.asarray(via_fista), np.asarray(via_mu),
                               rtol=1e-3, atol=1e-4)


def test_nnls_beats_mu_on_overlapping_neurons(rng):
    """The motivating case: at equal iteration budget, FISTA's objective
    is <= MU's on a correlated Gram (overlapping neurons)."""
    p, k, t = 80, 6, 8
    a = rng.uniform(size=(p, k))
    a[:, 1] = a[:, 0] + 0.1 * rng.uniform(size=p)
    a[:, 3] = a[:, 2] + 0.1 * rng.uniform(size=p)
    a_t = np.repeat(a[:, :, None], t, axis=2)
    c0 = rng.uniform(0.1, 1.0, size=(k, t))
    y = rng.uniform(size=(p, t))
    grams, c1 = _grams(a_t, y)

    def obj(cm):
        cm = np.asarray(cm)
        g = np.asarray(grams)
        q = np.einsum("kt,tkl,lt->", cm, g, cm)
        return 0.5 * q - np.sum(np.asarray(c1).T * cm)

    c_mu = mu.run_mu_temporal(jnp.asarray(c0), grams, c1, iters=50)
    c_f = mu.nnls_temporal(jnp.asarray(c0), grams, c1, iters=50)
    assert obj(c_f) <= obj(c_mu) + 1e-9
    assert np.all(np.asarray(c_f) >= 0)


def test_gram_lipschitz_bounds_spectrum(rng):
    a_t, _, y = _setup(rng, p=50, k=5, t=7)
    grams, _ = _grams(a_t, y)
    lv = float(mu.gram_lipschitz(grams))
    eigmax = max(np.linalg.eigvalsh(np.asarray(g)).max()
                 for g in np.asarray(grams))
    assert lv >= eigmax * 0.999  # safety factor covers truncation
    assert lv <= eigmax * 1.05


def test_spatial_step_matches_reference_equations(rng):
    p, k, t = 30, 4, 6
    a = rng.uniform(size=(p, k))
    c = rng.uniform(0.1, 1.0, size=(k, t))
    y = rng.uniform(size=(p, t))
    d = rng.uniform(size=(p, k))
    ours = mu.mu_spatial_step(
        jnp.asarray(a), jnp.asarray(c), jnp.asarray(y), d=jnp.asarray(d),
        gamma=0.5,
    )
    c_s = np.einsum("kt,pt->kp", c, c)
    a1 = np.einsum("pt,kt->pk", y, c)
    a2 = np.einsum("pk,kq->pq", a, c_s) + 0.5 * d
    naive = a * a1 / (a2 + 1e-32)
    np.testing.assert_allclose(np.asarray(ours), naive, rtol=1e-5)


def test_distance_penalty(rng):
    grid = jnp.asarray(rng.uniform(0, 10, size=(20, 3)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0, 10, size=(3, 3)).astype(np.float32))
    d = mu.distance_penalty(grid, pos)
    g, pp = np.asarray(grid), np.asarray(pos)
    dist = np.linalg.norm(g[:, None] - pp[None], axis=-1)
    np.testing.assert_allclose(
        np.asarray(d), 1 - np.exp(-0.01 * dist), rtol=1e-4, atol=1e-5
    )
