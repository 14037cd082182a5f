"""GP tests: exact GP vs sklearn oracle, Kronecker grid GP vs dense exact
oracle (must match to float tolerance — it IS exact), variational GP learning
a separable pattern."""

import jax.numpy as jnp
import numpy as np
import pytest

from network_interpretation_imagenet_tpu.gp import exact, kron, variational
from network_interpretation_imagenet_tpu.gp.kernels import (
    jaccard_rbf_kernel,
    rbf_kernel,
)


# --- exact GP vs sklearn ----------------------------------------------------


def test_exact_gp_matches_sklearn(rng):
    sklearn_gp = pytest.importorskip("sklearn.gaussian_process")
    x = rng.rand(9, 1).astype(np.float64) * 10
    y = np.sin(x[:, 0]) + 0.1 * rng.randn(9)

    # alpha=1e-2 keeps K well-conditioned so f32 (ours) vs f64 (sklearn)
    # agree tightly; the reference's alpha=1e-5 works too but amplifies
    # float-width differences, which is not what this test measures.
    skl = sklearn_gp.GaussianProcessRegressor(
        kernel=sklearn_gp.kernels.RBF(length_scale=2.0, length_scale_bounds="fixed"),
        alpha=1e-2,
        optimizer=None,
        normalize_y=True,
    )
    skl.fit(x, y)
    xt = np.linspace(0, 10, 23)[:, None]
    mu_ref, std_ref = skl.predict(xt, return_std=True)

    params = exact.GPParams(jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(1e-2))
    fit = exact.fit(params, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    mu, std = exact.predict(fit, jnp.asarray(xt, jnp.float32))
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(std), std_ref, atol=1e-3)


def test_exact_gp_mll_matches_sklearn(rng):
    sklearn_gp = pytest.importorskip("sklearn.gaussian_process")
    x = rng.rand(7, 1) * 5
    y = np.cos(x[:, 0])
    skl = sklearn_gp.GaussianProcessRegressor(
        kernel=sklearn_gp.kernels.RBF(length_scale=1.5, length_scale_bounds="fixed"),
        alpha=1e-2,
        optimizer=None,
        normalize_y=False,
    )
    skl.fit(x, y)
    ref = skl.log_marginal_likelihood()
    params = exact.GPParams(jnp.asarray(1.5), jnp.asarray(1.0), jnp.asarray(1e-2))
    got = float(
        exact.log_marginal_likelihood(
            params, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            normalize_y=False,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_lengthscale_sweep_picks_reasonable_scale(rng):
    # Smooth function → longer lengthscales should win over tiny ones.
    x = np.linspace(0, 10, 15)[:, None].astype(np.float32)
    y = np.sin(0.5 * x[:, 0]).astype(np.float32)
    grid = jnp.asarray([0.01, 0.1, 2.0, 4.0])
    fit = exact.fit_lengthscale_sweep(jnp.asarray(x), jnp.asarray(y), grid)
    assert float(fit.params.lengthscale) >= 2.0


# --- Kronecker grid GP vs dense oracle -------------------------------------


def _dense_oracle(y_grid, ls, os_, noise, mean_const):
    h, w = y_grid.shape
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1)
    x = coords.reshape(-1, 2).astype(np.float64)
    k = np.asarray(rbf_kernel(jnp.asarray(x), jnp.asarray(x), ls, os_), np.float64)
    kn = k + noise * np.eye(h * w)
    y = (y_grid - mean_const).reshape(-1).astype(np.float64)
    kinv_y = np.linalg.solve(kn, y)
    mean = k @ kinv_y + mean_const
    cov = k - k @ np.linalg.solve(kn, k)
    var = np.maximum(np.diag(cov), 1e-12)
    sign, logdet = np.linalg.slogdet(kn)
    nll = 0.5 * (y @ np.linalg.solve(kn, y) + logdet + len(y) * np.log(2 * np.pi))
    return mean.reshape(h, w), var.reshape(h, w), nll


def test_kron_gp_is_exact(rng):
    h, w = 7, 6
    y_grid = rng.randn(h, w).astype(np.float32)
    ls, os_, noise, mc = 2.0, 1.5, 0.3, 0.2
    params = kron.KronGPParams(
        jnp.log(jnp.asarray(ls)), jnp.log(jnp.asarray(os_)),
        jnp.log(jnp.asarray(noise)), jnp.asarray(mc),
    )
    mean, var = kron.posterior(params, jnp.asarray(y_grid))
    nll = float(kron.neg_mll(params, jnp.asarray(y_grid)))
    mean_ref, var_ref, nll_ref = _dense_oracle(y_grid, ls, os_, noise, mc)
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=1e-4)
    np.testing.assert_allclose(nll, nll_ref, rtol=1e-5)


def test_kron_gp_fit_reduces_loss(rng):
    h = w = 16
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    y_grid = np.exp(-((yy - 8.0) ** 2 + (xx - 8.0) ** 2) / 20.0).astype(np.float32)
    params, losses = kron.fit_adam(y_grid, iters=15, lr=0.1)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0]
    mean, var = kron.posterior(params, jnp.asarray(y_grid))
    # Posterior mean should track the bump.
    assert np.argmax(np.asarray(mean)) == np.argmax(y_grid)
    assert np.all(np.asarray(var) >= 0)


def test_kron_predict_offgrid_matches_grid(rng):
    h, w = 8, 8
    y_grid = rng.randn(h, w).astype(np.float32)
    params = kron.init_params(lengthscale=2.0, noise=0.1)
    mean_grid, _ = kron.posterior(params, jnp.asarray(y_grid))
    pts = jnp.asarray([[2.0, 3.0], [5.0, 7.0]])
    mean_off = kron.predict_offgrid(params, jnp.asarray(y_grid), pts)
    np.testing.assert_allclose(
        np.asarray(mean_off),
        [float(mean_grid[2, 3]), float(mean_grid[5, 7])],
        atol=1e-4,
    )


# --- variational Bernoulli GP ----------------------------------------------


def test_variational_gp_learns_halfspace(rng):
    n = 16
    model = variational.init_model(n, grid_size=5, lengthscale=6.0)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    x = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float32)
    y = (x[:, 1] >= n / 2).astype(np.float32)  # right half positive
    model, losses = variational.fit_adam(model, x, y, iters=60, lr=0.1)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0]
    p = np.asarray(variational.predict_proba(model, jnp.asarray(x))).reshape(n, n)
    assert p[:, : n // 4].mean() < 0.35
    assert p[:, 3 * n // 4 :].mean() > 0.65


def test_jaccard_rbf_matches_definition(rng):
    masks = rng.rand(4, 6, 6) > 0.5
    k = np.asarray(
        jaccard_rbf_kernel(jnp.asarray(masks), jnp.asarray(masks), jnp.asarray(1.0))
    )
    # Diagonal: distance 0 → k = 1.
    np.testing.assert_allclose(np.diag(k), 1.0, atol=1e-6)
    # Off-diagonal oracle for pair (0, 1).
    inter = np.logical_and(masks[0], masks[1]).sum()
    union = np.logical_or(masks[0], masks[1]).sum()
    expect = np.exp(-0.5 * (1 - inter / union))
    np.testing.assert_allclose(k[0, 1], expect, rtol=1e-5)


def test_kron_fit_posterior_batch_matches_per_image():
    """Batched (vmapped) fit+posterior must reproduce N independent
    fit_adam/posterior calls."""
    from network_interpretation_imagenet_tpu.gp import kron

    rng = np.random.RandomState(3)
    ys = np.stack([
        np.outer(np.sin(np.arange(24) / 4), np.cos(np.arange(24) / 5)),
        rng.rand(24, 24) * 3.0,
        np.tile(np.linspace(0, 1, 24), (24, 1)),
    ]).astype(np.float32)

    params_b, means_b, vars_b, losses_b = kron.fit_posterior_batch(ys, iters=8)
    assert means_b.shape == ys.shape and vars_b.shape == ys.shape
    for i in range(len(ys)):
        p_i, losses_i = kron.fit_adam(ys[i], iters=8)
        mean_i, var_i = kron.posterior(p_i, ys[i])
        np.testing.assert_allclose(
            float(params_b[i].log_lengthscale), float(p_i.log_lengthscale),
            atol=1e-6)
        np.testing.assert_allclose(np.asarray(losses_b)[i],
                                   np.asarray(losses_i), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(means_b)[i], np.asarray(mean_i),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vars_b)[i], np.asarray(var_i),
                                   rtol=1e-4, atol=1e-4)


def test_kron_fit_posterior_batch_sharded_matches_single_device():
    """mesh= shards the image axis of the batched pixel-GP fit over the
    8-device mesh (eigenbases replicated); results must equal the
    single-device vmapped path, including a non-divisible N (pad+trim)."""
    from network_interpretation_imagenet_tpu.gp import kron
    from network_interpretation_imagenet_tpu.parallel import make_mesh

    rng = np.random.RandomState(7)
    # N=5 is NOT a multiple of the 8-device data axis — exercises padding.
    ys = np.stack([
        np.outer(np.sin(np.arange(20) / (3 + i)), np.cos(np.arange(20) / 5))
        + 0.1 * rng.rand(20, 20)
        for i in range(5)
    ]).astype(np.float32)

    p_ref, m_ref, v_ref, l_ref = kron.fit_posterior_batch(ys, iters=6)
    p_sh, m_sh, v_sh, l_sh = kron.fit_posterior_batch(
        ys, iters=6, mesh=make_mesh()
    )
    assert len(p_sh) == len(p_ref) == 5
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(p_sh, p_ref):
        np.testing.assert_allclose(float(a.log_lengthscale),
                                   float(b.log_lengthscale), atol=1e-6)
        np.testing.assert_allclose(float(a.log_noise), float(b.log_noise),
                                   rtol=1e-4, atol=1e-5)


def test_kron_lengthscale_selection_scale_invariant():
    """The fit_adam lengthscale sweep scores candidates at data-moment
    initial hyperparameters (var(y), 0.1 var(y), mean(y)) — deliberately
    NOT per-candidate optima. That init makes selection scale-equivariant:
    a grossly mis-scaled y must pick the SAME lengthscale, with Adam
    absorbing the scale into outputscale/noise."""
    from network_interpretation_imagenet_tpu.gp import kron

    y = (np.outer(np.sin(np.arange(24) / 5), np.cos(np.arange(24) / 6))
         + 0.05 * np.random.RandomState(0).rand(24, 24)).astype(np.float32)

    p_ref, _ = kron.fit_adam(y, iters=8)
    for scale in (100.0, 0.01):
        p_s, _ = kron.fit_adam(y * scale, iters=8)
        np.testing.assert_allclose(float(p_s.log_lengthscale),
                                   float(p_ref.log_lengthscale), atol=1e-6)
        # Adam absorbed the scale: outputscale ratio tracks scale² to
        # within half a nat (the init carries var(y·c) = c²·var(y); the 8
        # Adam steps fine-tune differently per run).
        log_ratio = float(p_s.log_outputscale - p_ref.log_outputscale)
        assert abs(log_ratio - 2 * np.log(scale)) < 0.5, log_ratio


# --- incremental (carried-inverse) GP vs Cholesky path -----------------------


def _f64_oracle(xs, yn, noise, ls, x_test, n_valid):
    """Float64 exact-GP ground truth over the VALID prefix only."""
    xv = xs[:n_valid].astype(np.float64)
    yv = yn[:n_valid].astype(np.float64)
    k = np.exp(-0.5 * ((xv[:, None] - xv[None, :]) / ls) ** 2)
    k = k + noise * np.eye(n_valid)
    ks = np.exp(
        -0.5 * ((x_test[:, None].astype(np.float64) - xv[None, :]) / ls) ** 2
    )
    mu = ks @ np.linalg.solve(k, yv)
    var = 1.0 - np.sum(ks.T * np.linalg.solve(k, ks.T), axis=0)
    mll = (
        -0.5 * yv @ np.linalg.solve(k, yv)
        - 0.5 * np.linalg.slogdet(k)[1]
        - 0.5 * n_valid * np.log(2 * np.pi)
    )
    return mu, np.sqrt(np.maximum(var, 0.0)), float(mll)


@pytest.mark.parametrize("ls", [0.5, 2.0, 16.0, 128.0])
def test_incremental_gp_matches_cholesky(rng, ls):
    """Sequential bordered appends reproduce the Cholesky fit/predict/MLL at
    every observation count, across the BO lengthscale-grid extremes.

    y is drawn from THAT lengthscale's own GP prior — the regime in which
    the MLL grid selection would pick it (a lengthscale mismatched to the
    data gets a catastrophic data-fit term and is never selected, so its
    posterior accuracy is irrelevant downstream; with mismatched noise-like
    y the ill-conditioned solve amplifies f32 error in BOTH paths). At
    ls=128 the kernel is still near-singular (K ≈ all-ones + 1e-5·I, cond
    ~1e6) and both f32 paths drift from float64 truth — the claim pinned
    here is that the carried-L⁻¹ path stays in the f32 Cholesky's accuracy
    class (within 4× its error + a small floor), not bit-parity."""
    max_obs = 13
    noise = 1e-5
    xs_all = rng.choice(64, size=max_obs, replace=False).astype(np.float32)
    k_prior = np.exp(
        -0.5 * ((xs_all[:, None] - xs_all[None, :]) / ls) ** 2
    ).astype(np.float64) + 1e-6 * np.eye(max_obs)
    yn_all = (
        np.linalg.cholesky(k_prior) @ rng.randn(max_obs)
    ).astype(np.float32)
    x_test = np.arange(0.0, 64.0, dtype=np.float32)

    state = exact.incremental_init(max_obs)
    xs_buf = np.zeros(max_obs, np.float32)
    yn_buf = np.zeros(max_obs, np.float32)
    for n in range(1, max_obs + 1):
        xs_buf[n - 1] = xs_all[n - 1]
        yn_buf[n - 1] = yn_all[n - 1]
        state = exact.incremental_add(
            state, jnp.asarray(xs_buf), jnp.int32(n - 1),
            jnp.asarray(xs_all[n - 1]), jnp.asarray(ls), noise)
        valid = (np.arange(max_obs) < n).astype(np.float32)
        mu, std = exact.incremental_predict(
            state, jnp.asarray(xs_buf), jnp.asarray(valid),
            jnp.asarray(yn_buf), jnp.asarray(x_test), jnp.asarray(ls))
        mll = exact.incremental_mll(state, jnp.asarray(yn_buf), jnp.float32(n))

        mu64, std64, mll64 = _f64_oracle(xs_buf, yn_buf, noise, ls, x_test, n)
        params = exact.GPParams(
            jnp.asarray(ls), jnp.asarray(1.0), jnp.asarray(noise))
        fit = exact.fit(params, jnp.asarray(xs_buf[:n])[:, None],
                        jnp.asarray(yn_buf[:n]), normalize_y=False)
        mu_c, std_c = exact.predict(fit, jnp.asarray(x_test)[:, None])
        mll_c = exact.log_marginal_likelihood(
            params, jnp.asarray(xs_buf[:n])[:, None],
            jnp.asarray(yn_buf[:n]), normalize_y=False)

        def errs(a, ref):
            return float(np.abs(np.asarray(a) - ref).max())

        # Accuracy-class bound: within 4× the Cholesky error plus 5% of the
        # posterior's own scale (the near-singular draws extrapolate to
        # |mu| ~ 10+, where a few-% deviation is noise to the EI argmax).
        mu_scale = max(1.0, float(np.abs(mu64).max()))
        assert errs(mu, mu64) <= 4 * errs(mu_c, mu64) + 0.05 * mu_scale
        assert errs(std, std64) <= 4 * errs(std_c, std64) + 5e-3
        chol_mll_err = abs(float(mll_c) - mll64)
        assert abs(float(mll) - mll64) <= 4 * chol_mll_err + max(
            5e-2, 1e-3 * abs(mll64))


def test_incremental_mll_selects_same_lengthscale_as_f64(rng):
    """On BO-shaped data (smooth probability curve + noise at integer
    starts) the incremental MLL argmax over the fused loop's lengthscale
    grid must agree with the float64 oracle — the selection is what shields
    the loop from ill-conditioned non-selected lengthscales."""
    grid = [0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0]
    max_obs = 13
    noise = 1e-5
    xs_all = rng.choice(40, size=max_obs, replace=False).astype(np.float32)
    y_raw = np.exp(-0.5 * ((xs_all - 17.0) / 6.0) ** 2) * 0.8 + 0.1
    y_raw = (y_raw + 0.01 * rng.randn(max_obs)).astype(np.float32)
    yn = ((y_raw - y_raw.mean()) / max(y_raw.std(), 1e-6)).astype(np.float32)

    inc_mlls, f64_mlls = [], []
    for ls in grid:
        state = exact.incremental_init(max_obs)
        xs_buf = np.zeros(max_obs, np.float32)
        yn_buf = np.zeros(max_obs, np.float32)
        for n in range(max_obs):
            xs_buf[n] = xs_all[n]
            yn_buf[n] = yn[n]
            state = exact.incremental_add(
                state, jnp.asarray(xs_buf), jnp.int32(n),
                jnp.asarray(xs_all[n]), jnp.asarray(ls), noise)
        inc_mlls.append(float(exact.incremental_mll(
            state, jnp.asarray(yn_buf), jnp.float32(max_obs))))
        f64_mlls.append(_f64_oracle(
            xs_buf, yn_buf, noise, ls, xs_all, max_obs)[2])
    assert int(np.argmax(inc_mlls)) == int(np.argmax(f64_mlls))


def test_incremental_gp_duplicate_points():
    """Exact duplicates (the reference's random-resample can collide) keep
    the carried inverse finite and the posterior pinned at the data."""
    max_obs = 6
    noise = 1e-5
    xs_seq = np.asarray([3.0, 10.0, 3.0, 3.0, 10.0, 7.0], np.float32)
    yn_seq = np.asarray([1.0, -1.0, 1.0, 1.0, -1.0, 0.2], np.float32)
    state = exact.incremental_init(max_obs)
    xs_buf = np.zeros(max_obs, np.float32)
    for n in range(max_obs):
        xs_buf[n] = xs_seq[n]
        state = exact.incremental_add(
            state, jnp.asarray(xs_buf), jnp.int32(n),
            jnp.asarray(xs_seq[n]), jnp.asarray(2.0), noise)
    assert np.all(np.isfinite(np.asarray(state.linv)))
    mu, std = exact.incremental_predict(
        state, jnp.asarray(xs_buf), jnp.ones(max_obs, jnp.float32),
        jnp.asarray(yn_seq), jnp.asarray([3.0, 10.0, 7.0], jnp.float32),
        jnp.asarray(2.0))
    np.testing.assert_allclose(np.asarray(mu), [1.0, -1.0, 0.2], atol=0.05)
    assert np.all(np.asarray(std) < 0.05)


def test_incremental_gp_inactive_slots_stay_identity():
    """The bordered append must leave not-yet-active slots EXACTLY identity
    in L⁻¹ (the padding convention MLL/predict masking relies on)."""
    max_obs = 8
    state = exact.incremental_init(max_obs)
    xs_buf = np.zeros(max_obs, np.float32)
    for n, x in enumerate([5.0, 9.0, 2.0]):
        xs_buf[n] = x
        state = exact.incremental_add(
            state, jnp.asarray(xs_buf), jnp.int32(n), jnp.asarray(x),
            jnp.asarray(4.0), 1e-5)
    linv = np.asarray(state.linv)
    np.testing.assert_array_equal(linv[3:, :3], 0.0)
    np.testing.assert_array_equal(linv[:3, 3:], 0.0)
    np.testing.assert_array_equal(linv[3:, 3:], np.eye(5))
    # Lower-triangular invariant on the active block.
    np.testing.assert_array_equal(np.triu(linv[:3, :3], 1), 0.0)


def test_variational_fit_predict_batch_matches_per_image():
    """N vmapped variational fits must match N independent fit_adam +
    predict_proba runs (same init, coords, iteration count)."""
    from network_interpretation_imagenet_tpu.gp import variational as vgp

    n_pix = 12
    yy, xx = np.meshgrid(np.arange(n_pix), np.arange(n_pix), indexing="ij")
    coords = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float32)
    rng = np.random.RandomState(0)
    ys = np.stack([
        (coords[:, 0] > 5).astype(np.float32),
        (coords[:, 1] > 6).astype(np.float32),
        rng.randint(0, 2, coords.shape[0]).astype(np.float32),
    ])
    model = vgp.init_model(n_pix, grid_size=4)

    models, probs, losses = vgp.fit_predict_batch(
        model, coords, ys, iters=8
    )
    assert probs.shape == (3, coords.shape[0])
    assert losses.shape == (3, 8)
    for i in range(3):
        ref_model, ref_losses = vgp.fit_adam(model, coords, ys[i], iters=8)
        ref_probs = vgp.predict_proba(ref_model, coords)
        np.testing.assert_allclose(
            np.asarray(probs[i]), np.asarray(ref_probs), atol=1e-3
        )
        # vmapped-vs-single compiles reassociate f32 reductions (~1e-3 rel)
        np.testing.assert_allclose(
            np.asarray(losses[i]), np.asarray(ref_losses), rtol=5e-3
        )
        # directional sanity on the structured labels (8 iters is early
        # in the fit — parity above is the real check)
        if i < 2:
            hi = np.asarray(probs[i])[ys[i] > 0.5].mean()
            lo = np.asarray(probs[i])[ys[i] < 0.5].mean()
            assert hi > lo + 0.05


def test_variational_fit_predict_batch_sharded_matches_single_device():
    """The mesh-sharded batch fit (image axis over 'data', coords/inducing
    replicated) must match the single-device vmapped path, including the
    pad-to-axis-multiple trim (N=3 on a 4-device axis)."""
    import jax
    from jax.sharding import Mesh

    from network_interpretation_imagenet_tpu.gp import variational as vgp

    n_pix = 10
    yy, xx = np.meshgrid(np.arange(n_pix), np.arange(n_pix), indexing="ij")
    coords = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float32)
    rng = np.random.RandomState(1)
    ys = rng.randint(0, 2, (3, coords.shape[0])).astype(np.float32)
    model = vgp.init_model(n_pix, grid_size=3)

    _, probs_ref, losses_ref = vgp.fit_predict_batch(
        model, coords, ys, iters=6
    )
    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("data",))
    _, probs_sh, losses_sh = vgp.fit_predict_batch(
        model, coords, ys, iters=6, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(probs_sh), np.asarray(probs_ref), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(losses_sh), np.asarray(losses_ref), rtol=5e-3
    )
