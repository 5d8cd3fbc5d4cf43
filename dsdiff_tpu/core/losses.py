"""Loss primitives: VLB math, Charbonnier, and the disentanglement losses.

Pure jnp functions (no module state) so they fuse into the jitted train step.

- ``normal_kl`` / ``discretized_gaussian_log_likelihood``: the VLB helpers of
  reference Disc_diff/guided_diffusion/losses.py:12-77 and
  training_project/utils/diffusion_utils.py.
- ``charbonnier``: the L1-Charbonnier used as the default regression loss
  (reference Disc_diff/guided_diffusion/gaussian_diffusion.py:18-28).
- ``supervised_contrastive_loss``: SupCon over [B, n_views, D] features with a
  label mask (reference loss_function/contrastive_loss.py:13-135). Returns
  (loss, logits, perfect_logits) like the reference so heatmap logging works.
- ``euclidean_disentangle_loss``: the cdist-based pull/push objective of
  reference training_project/utils/gaussian_diffusion.py:1056-1094 ('eu' mode).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "charbonnier",
    "mean_flat",
    "supervised_contrastive_loss",
    "euclidean_disentangle_loss",
    "disentangle_loss",
    "ds_disentangle_losses",
    "disc_disentangle_loss",
]


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (reference nn.py mean_flat)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)) elementwise, in nats.

    Reference Disc_diff/guided_diffusion/losses.py:12-39.
    """
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """Tanh approximation of the standard normal CDF (losses.py:42-48)."""
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of x in [-1,1] under a discretized Gaussian (8-bit bins).

    Reference Disc_diff/guided_diffusion/losses.py:51-77.
    """
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
    return log_probs


def charbonnier(pred, target, eps: float = 1e-3):
    """Per-element L1-Charbonnier sqrt((x-y)^2 + eps^2).

    Reference Disc_diff/guided_diffusion/gaussian_diffusion.py:18-28
    (there reduced by mean; we leave reduction to the caller so VLB-style
    per-batch weighting composes).
    """
    return jnp.sqrt((pred - target) ** 2 + eps * eps)


def _flatten_views(features: jnp.ndarray) -> jnp.ndarray:
    """[b, n, ...] -> [n*b, D] view-major (torch.cat(torch.unbind(dim=1)))."""
    b, n = features.shape[0], features.shape[1]
    return features.reshape(b, n, -1).transpose(1, 0, 2).reshape(n * b, -1)


def _flatten_view_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """[b, n] -> [n*b] view-major."""
    return labels.transpose(1, 0).reshape(-1)


def supervised_contrastive_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 0.1,
    base_temperature: float = 0.1,
):
    """SupCon ('cl' method, contrast_mode='all') over per-view labels.

    Faithful to reference loss_function/contrastive_loss.py:36-135 as used by
    get_disentangle_loss (gaussian_diffusion.py:1056-1059):
    - ``features`` [b, n_views, ...], ``labels`` [b, n_views] (or [b],
      broadcast over views); both flattened view-major,
    - cosine-similarity logits / temperature, self-contrast excluded from the
      positive mask AND the denominator,
    - loss = -(T/base_T) * mean-over-positives log prob, mean over anchors.
    Returns (loss, logits, perfect_logits) for heatmap logging.
    """
    b, n = features.shape[0], features.shape[1]
    if labels.ndim == 1:
        labels = jnp.broadcast_to(labels[:, None], (b, n))
    flat_labels = _flatten_view_labels(labels)[:, None]  # [N,1]
    mask = (flat_labels == flat_labels.T).astype(jnp.float32)
    perfect_logit = 2.0 * mask - 1.0

    f = _flatten_views(features)
    f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
    logits = (f @ f.T) / temperature

    N = b * n
    logits_mask = 1.0 - jnp.eye(N, dtype=jnp.float32)
    pos_mask = mask * logits_mask
    # row-max subtraction for numerical stability (does not change log-probs)
    shifted = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True)
    )
    exp_logits = jnp.exp(shifted) * logits_mask
    log_prob = shifted - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=1) / (
        jnp.sum(pos_mask, axis=1) + 1e-6
    )
    loss = -(temperature / base_temperature) * jnp.mean(mean_log_prob_pos)
    return loss, logits, perfect_logit


def euclidean_disentangle_loss(features: jnp.ndarray, labels: jnp.ndarray):
    """cdist pull/push ratio ('eu' mode).

    Faithful to reference gaussian_diffusion.py:1060-1075:
    ``features`` [b, n, ...], ``labels`` [b, n]; flatten view-major,
    dist = ||f_i - f_j||_2 / D, loss = sum(dist over same-label off-diagonal
    pairs) / sum(dist over different-label pairs).
    Returns (loss, logits, perfect_logits) with logits = 2*dist - 1.
    """
    b, n = features.shape[0], features.shape[1]
    if labels.ndim == 1:
        labels = jnp.broadcast_to(labels[:, None], (b, n))
    flat_labels = _flatten_view_labels(labels)[:, None]
    f = _flatten_views(features)
    D = f.shape[1]
    d2 = jnp.maximum(
        jnp.sum(f**2, 1)[:, None] + jnp.sum(f**2, 1)[None, :]
        - 2.0 * (f @ f.T),
        0.0,
    )
    dist = jnp.sqrt(d2 + 1e-12) / D
    same = (flat_labels == flat_labels.T).astype(jnp.float32)
    eye = jnp.eye(f.shape[0], dtype=jnp.float32)
    numerator = jnp.sum(dist * same * (1.0 - eye))
    denominator = jnp.sum(dist * (1.0 - same))
    loss = numerator / (denominator + 1e-12)
    return loss, dist * 2.0 - 1.0, 2.0 * same - 1.0


def disentangle_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    mode: str = "eu",
    temperature: float = 0.1,
):
    """'eu' | 'contrast' | 'eu&contrast' dispatch
    (gaussian_diffusion.py:1056-1094; the combined mode adds 0.05x SupCon)."""
    if mode == "contrast":
        return supervised_contrastive_loss(features, labels, temperature,
                                           temperature)
    if mode == "eu":
        return euclidean_disentangle_loss(features, labels)
    if mode == "eu&contrast":
        l_c, logits, perfect = supervised_contrastive_loss(
            features, labels, temperature, temperature
        )
        l_e, _, _ = euclidean_disentangle_loss(features, labels)
        return l_e + 0.05 * l_c, logits, perfect
    raise ValueError(f"unknown disentangle mode '{mode}'")


def ds_disentangle_losses(
    features: dict,
    mode: str = "eu",
    temperature: float = 0.05,
):
    """The DS-Diff C-S and S-A-L disentangle objectives.

    Faithful to reference gaussian_diffusion.py:907-974. ``features`` is the
    DSUNet feature dict with stream-major arrays: content/style [3, B, ...],
    anatomy/lesion [2, B, ...]. Label construction:

    - C-S (content vs style): views = 3 contents + 3 styles; labels
      [b, b, b, -1, -2, -3] — contents of one batch item share a class,
      style slots share a class per stream across the batch.
    - S-A-L: views = 3 styles + 2 anatomy + 2 lesion; labels
      [-1, -2, -3, 2b, 2b, 2b+1, 2b+1].

    Returns (c_s_loss, s_a_l_loss, logit dict for heatmaps).
    """
    # stream-major [n, B, ...] -> [B, n, ...]
    def bm(x):
        return jnp.moveaxis(x, 0, 1)

    content, style = bm(features["content"]), bm(features["style"])
    anatomy, lesion = bm(features["anatomy"]), bm(features["lesion"])
    B = content.shape[0]
    bidx = jnp.arange(B)

    c_s_feature = jnp.concatenate([content, style], axis=1)
    c_lab = jnp.broadcast_to(bidx[:, None], (B, content.shape[1]))
    s_lab = jnp.broadcast_to(
        -1 - jnp.arange(style.shape[1])[None, :], (B, style.shape[1])
    )
    c_s_label = jnp.concatenate([c_lab, s_lab], axis=1)
    c_s_loss, cs_logit, cs_perfect = disentangle_loss(
        c_s_feature, c_s_label, mode, temperature
    )

    s_a_l_feature = jnp.concatenate([style, anatomy, lesion], axis=1)
    a_lab = jnp.broadcast_to(2 * bidx[:, None], (B, anatomy.shape[1]))
    l_lab = jnp.broadcast_to(
        (2 * bidx + 1)[:, None], (B, lesion.shape[1])
    )
    s_a_l_label = jnp.concatenate([s_lab, a_lab, l_lab], axis=1)
    s_a_l_loss, sal_logit, sal_perfect = disentangle_loss(
        s_a_l_feature, s_a_l_label, mode
    )
    heatmaps = {
        "c_s": cs_logit, "c_s_perfect": cs_perfect,
        "s_a_l": sal_logit, "s_a_l_perfect": sal_perfect,
    }
    return c_s_loss, s_a_l_loss, heatmaps


def disc_disentangle_loss(features: dict) -> jnp.ndarray:
    """DisC-Diff com/dist ratio.

    Reference Disc_diff/guided_diffusion/gaussian_diffusion.py:898-916:
    com = mean pairwise MSE between common features (pull together),
    dist = mean pairwise MSE between distinct features (push apart),
    loss = com / dist.
    """
    com = features["common"]  # [n, B, ...]
    dist = features["distinct"]
    n = com.shape[0]

    def pair_mse(x):
        total = 0.0
        count = 0
        for i in range(n):
            for j in range(i + 1, n):
                total = total + jnp.mean((x[i] - x[j]) ** 2)
                count += 1
        return total / max(count, 1)

    return pair_mse(com) / (pair_mse(dist) + 1e-8)
