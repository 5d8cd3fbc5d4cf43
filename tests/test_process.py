"""Identity and golden tests for the diffusion process math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.core import losses, process, schedules

SCHED = schedules.DiffusionSchedule.named("linear", 100)
RNG = jax.random.PRNGKey(0)


def _data(shape=(4, 8, 8, 1)):
    k1, k2 = jax.random.split(RNG)
    x0 = jax.random.normal(k1, shape)
    noise = jax.random.normal(k2, shape)
    t = jnp.array([0, 10, 50, 99])
    return x0, noise, t


def test_qsample_roundtrip_eps():
    x0, noise, t = _data()
    xt = process.q_sample(SCHED, x0, t, noise)
    x0_rec = process.predict_x0_from_eps(SCHED, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    eps_rec = process.predict_eps_from_x0(SCHED, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-3)


def test_v_param_identities():
    x0, noise, t = _data()
    xt = process.q_sample(SCHED, x0, t, noise)
    v = process.get_v(SCHED, x0, noise, t)
    x0_rec = process.predict_x0_from_v(SCHED, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    eps_rec = process.predict_eps_from_v(SCHED, xt, t, v)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-4)


def test_posterior_mean_formula():
    x0, noise, t = _data()
    xt = process.q_sample(SCHED, x0, t, noise)
    mean, var, logvar = process.q_posterior_mean_variance(SCHED, x0, xt, t)
    b = np.asarray(SCHED.betas)
    acp = np.asarray(SCHED.alphas_cumprod)
    acp_prev = np.append(1.0, acp[:-1])
    ti = np.asarray(t)
    c1 = (b[ti] * np.sqrt(acp_prev[ti]) / (1 - acp[ti]))[:, None, None, None]
    c2 = (
        (1 - acp_prev[ti]) * np.sqrt(1 - b[ti]) / (1 - acp[ti])
    )[:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(mean), c1 * np.asarray(x0) + c2 * np.asarray(xt),
        rtol=1e-3, atol=1e-3,
    )


def test_p_mean_variance_perfect_eps_model():
    x0, noise, t = _data()
    xt = process.q_sample(SCHED, x0, t, noise)
    out = process.p_mean_variance(
        SCHED, noise, xt, t, parameterization="eps", clip_denoised=False
    )
    np.testing.assert_allclose(np.asarray(out.pred_x0), np.asarray(x0), atol=1e-4)
    true_mean, _, _ = process.q_posterior_mean_variance(SCHED, x0, xt, t)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(true_mean), atol=1e-4)


def test_learned_variance_interpolation():
    x0, noise, t = _data()
    # v=-1 -> posterior floor; v=+1 -> log beta
    lv_lo = process.learned_log_variance(SCHED, -jnp.ones_like(x0), t)
    lv_hi = process.learned_log_variance(SCHED, jnp.ones_like(x0), t)
    np.testing.assert_allclose(
        np.asarray(lv_lo)[:, 0, 0, 0],
        np.asarray(SCHED.posterior_log_variance_clipped)[np.asarray(t)],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(lv_hi)[:, 0, 0, 0],
        np.log(np.asarray(SCHED.betas))[np.asarray(t)],
        rtol=1e-5,
    )


def test_vb_terms_perfect_model_small():
    x0, noise, t = _data()
    xt = process.q_sample(SCHED, x0, t, noise)
    vb, pred_x0 = process.vb_terms_bpd(
        SCHED, noise, x0, xt, t, parameterization="eps", clip_denoised=False
    )
    # a perfect eps model gives KL == 0 for t>0 (means coincide, same var)
    assert np.all(np.asarray(vb)[1:] < 1e-3)


@pytest.mark.parametrize("param", ["eps", "x0", "v"])
@pytest.mark.parametrize("loss_type", ["l2", "l1", "charbonnier"])
def test_training_losses_targets(param, loss_type):
    x0, noise, t = _data()

    captured = {}

    def perfect_model(xt, t_model, **kw):
        # return the exact target for this parameterization
        ti = t_model.astype(jnp.int32)
        captured["t_model"] = t_model
        if param == "eps":
            return noise
        if param == "x0":
            return x0
        return process.get_v(SCHED, x0, noise, ti)

    terms, aux = process.training_losses(
        SCHED, perfect_model, x0, t, noise,
        parameterization=param, loss_type=loss_type,
    )
    val = np.asarray(terms["loss"])
    if loss_type == "charbonnier":
        # charbonnier(0) == eps = 1e-3 per element
        np.testing.assert_allclose(val, 1e-3, rtol=1e-3)
    else:
        np.testing.assert_allclose(val, 0.0, atol=1e-8)


def test_training_losses_learn_sigma_shapes():
    x0, noise, t = _data()

    def model(xt, t_model, **kw):
        return jnp.concatenate([noise, jnp.zeros_like(noise)], axis=-1)

    terms, _ = process.training_losses(
        SCHED, model, x0, t, noise, parameterization="eps",
        loss_type="rescaled_mse", learn_sigma=True,
    )
    assert terms["vb"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(terms["loss"])))


def test_normal_kl_golden():
    # KL(N(0,1)||N(0,1)) = 0 ; KL(N(1,1)||N(0,1)) = 0.5
    z = jnp.zeros(())
    np.testing.assert_allclose(
        float(losses.normal_kl(z, z, z, z)), 0.0, atol=1e-7
    )
    np.testing.assert_allclose(
        float(losses.normal_kl(jnp.ones(()), z, z, z)), 0.5, atol=1e-6
    )


def test_charbonnier_golden():
    np.testing.assert_allclose(
        float(losses.charbonnier(jnp.float32(3.0), jnp.float32(0.0), eps=4.0)),
        5.0,
    )


def test_timestep_rescaling():
    b = schedules.make_beta_schedule("linear", 1000)
    r = schedules.respace(b, schedules.space_timesteps(1000, "ddim50"),
                          rescale_timesteps=False)
    tm = process.model_timestep(r, jnp.array([0, 49]))
    np.testing.assert_allclose(np.asarray(tm), [0.0, 980.0])
