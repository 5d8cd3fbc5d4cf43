"""Golden tests for schedules/respacing against the defining equations."""
import numpy as np
import pytest

from dsdiff_tpu.core import schedules


def test_linear_schedule_endpoints():
    b = schedules.make_beta_schedule("linear", 1000, 1e-4, 2e-2)
    assert b.shape == (1000,)
    np.testing.assert_allclose(b[0], 1e-4, rtol=1e-12)
    np.testing.assert_allclose(b[-1], 2e-2, rtol=1e-12)
    # sqrt-space linearity: sqrt(beta) is affine in t
    d = np.diff(np.sqrt(b))
    np.testing.assert_allclose(d, d[0], rtol=1e-8)


def test_cosine_schedule_alpha_bar():
    T = 100
    b = schedules.make_beta_schedule("cosine", T)
    acp = np.cumprod(1 - b)
    s = 8e-3

    def alpha_bar(t):
        return np.cos((t + s) / (1 + s) * np.pi / 2) ** 2

    # alpha_bar ratios reproduced up to the 0.999 beta clamp
    expected = np.array([alpha_bar((i + 1) / T) / alpha_bar(0 / T) for i in range(T)])
    mask = b < 0.999
    np.testing.assert_allclose(acp[mask], expected[mask], rtol=1e-6)


def test_scaled_linear_matches_openai():
    T = 500
    b = schedules.make_beta_schedule("scaled_linear", T)
    scale = 1000 / T
    np.testing.assert_allclose(b[0], scale * 1e-4)
    np.testing.assert_allclose(b[-1], scale * 2e-2)


def test_derived_tables():
    b = schedules.make_beta_schedule("linear", 50)
    s = schedules.DiffusionSchedule.create(b)
    acp = np.cumprod(1 - b)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_recip_alphas_cumprod), np.sqrt(1 / acp), rtol=1e-6
    )
    acp_prev = np.append(1.0, acp[:-1])
    post_var = b * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance), post_var, rtol=1e-6
    )
    # clipped log-variance: element 0 replaced by element 1
    np.testing.assert_allclose(
        np.asarray(s.posterior_log_variance_clipped)[0],
        np.log(post_var[1]),
        rtol=1e-6,
    )
    # coef identity: mean coefs sum behavior at x0 == xt == 1
    np.testing.assert_allclose(
        np.asarray(s.posterior_mean_coef1) + np.asarray(s.posterior_mean_coef2),
        b * np.sqrt(acp_prev) / (1 - acp)
        + (1 - acp_prev) * np.sqrt(1 - b) / (1 - acp),
        rtol=1e-6,
    )


def test_space_timesteps_ddim():
    steps = schedules.space_timesteps(1000, "ddim50")
    assert len(steps) == 50
    assert steps[0] == 0
    assert all(b - a == 20 for a, b in zip(steps, steps[1:]))


def test_space_timesteps_sections():
    steps = schedules.space_timesteps(100, "10")
    assert len(steps) == 10
    assert steps[0] == 0 and steps[-1] == 99
    with pytest.raises(ValueError):
        schedules.space_timesteps(10, "100")


def test_respace_preserves_alpha_cumprod():
    b = schedules.make_beta_schedule("linear", 100)
    use = schedules.space_timesteps(100, "10")
    r = schedules.respace(b, use)
    acp_full = np.cumprod(1 - b)
    np.testing.assert_allclose(
        np.asarray(r.alphas_cumprod), acp_full[use], rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(r.timestep_map), np.array(use))
    assert float(r.rescale_factor) == 1.0


def test_respace_rescale_timesteps():
    b = schedules.make_beta_schedule("linear", 200)
    r = schedules.respace(b, schedules.space_timesteps(200, "20"),
                          rescale_timesteps=True)
    assert float(r.rescale_factor) == pytest.approx(5.0)
