"""Unit tests for the likelihood objectives and their residuals.

The load-bearing check: the hand-derived farplane residual must equal the
true (Wirtinger) gradient of ``minf`` -- verified against jax.grad of the
scalar objective in complex128. JAX's grad of a real function w.r.t.
complex G returns ``2 * dF/dG_bar`` conjugated per its convention; the
residual functions implement ``dF/dG_bar`` (the constant factor is
absorbed by the line search, as in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tikejax.models import likelihoods


def rand_c(key, shape):
    kr, ki = jax.random.split(key)
    return (jax.random.normal(kr, shape) +
            1j * jax.random.normal(ki, shape)).astype(jnp.complex128)


@pytest.fixture
def farplane_data(rng):
    farp = rand_c(rng, (2, 5, 3, 8, 8)) * 2.0
    data = jnp.abs(
        rand_c(jax.random.fold_in(rng, 1), (2, 5, 8, 8)))**2 * 3.0
    return farp, data


@pytest.mark.parametrize("model", ["gaussian", "poisson"])
def test_residual_is_gradient(farplane_data, model):
    farp, data = farplane_data
    minf_fn, resid_fn = likelihoods.get_model(model)

    grad_ad = jax.grad(lambda G: minf_fn(G, data))(farp)
    resid = resid_fn(farp, data)
    # Our residual is the Wirtinger derivative dF/dG_bar (the physics
    # descent direction used with the Hermitian adjoint); JAX's grad of a
    # real F w.r.t. complex G returns 2 * conj(dF/dG_bar). Verified
    # empirically and used consistently in the solver.
    scale = jnp.max(jnp.abs(grad_ad))
    assert jnp.max(jnp.abs(grad_ad - 2.0 * jnp.conj(resid))) < 1e-10 * scale


@pytest.mark.parametrize("model", ["gaussian", "poisson"])
def test_minf_minimized_at_truth(rng, model):
    """minf(G_true) <= minf(G_perturbed) when data = |G_true|^2 summed
    over modes."""
    minf_fn, _ = likelihoods.get_model(model)
    farp = rand_c(rng, (1, 4, 2, 8, 8))
    data = likelihoods.total_intensity(farp)
    f_true = minf_fn(farp, data)
    f_pert = minf_fn(farp * 1.1, data)
    assert f_true < f_pert


def test_total_intensity_multimode(rng):
    farp = rand_c(rng, (1, 3, 4, 6, 6))
    ti = likelihoods.total_intensity(farp)
    assert ti.shape == (1, 3, 6, 6)
    np.testing.assert_allclose(
        np.asarray(ti), np.asarray(jnp.sum(jnp.abs(farp)**2, axis=2)),
        rtol=1e-12)


def test_get_model_validation():
    with pytest.raises(ValueError, match="unknown model"):
        likelihoods.get_model("cauchy")


def test_gaussian_handles_negative_data(farplane_data):
    """Measured counts can dip negative after background subtraction; the
    objective must clamp, not NaN."""
    farp, data = farplane_data
    data = data - 5.0
    for model in likelihoods.MODELS:
        minf_fn, resid_fn = likelihoods.get_model(model)
        assert bool(jnp.isfinite(minf_fn(farp, data)))
        assert bool(jnp.all(jnp.isfinite(jnp.abs(resid_fn(farp, data)))))
