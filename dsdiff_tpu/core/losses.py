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


def supervised_contrastive_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
):
    """SupCon loss over ``features`` of shape [B, n_views, D] (L2-normalized here).

    Faithful to reference loss_function/contrastive_loss.py:33-135:
    - labels [B] build mask[i,j] = (labels_i == labels_j)
    - ``contrast_mode='all'``: every view is an anchor
    - row-max subtraction for stability, self-contrast excluded
    - returns (loss, anchor_dot_contrast, perfect_logits) for heatmap logging
    """
    B, n_views = features.shape[0], features.shape[1]
    feats = features.reshape(B, n_views, -1)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)

    if labels is not None and mask is not None:
        raise ValueError("cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(B, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast_count = n_views
    contrast_feature = feats.transpose(1, 0, 2).reshape(B * n_views, -1)
    if contrast_mode == "one":
        anchor_feature = feats[:, 0]
        anchor_count = 1
    elif contrast_mode == "all":
        anchor_feature = contrast_feature
        anchor_count = contrast_count
    else:
        raise ValueError(f"unknown contrast_mode {contrast_mode}")

    anchor_dot_contrast = (anchor_feature @ contrast_feature.T) / temperature
    logits_max = jax.lax.stop_gradient(
        jnp.max(anchor_dot_contrast, axis=1, keepdims=True)
    )
    logits = anchor_dot_contrast - logits_max

    mask = jnp.tile(mask, (anchor_count, contrast_count))
    n = B * anchor_count
    logits_mask = 1.0 - jnp.eye(n, dtype=jnp.float32)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-12)
    mask_sum = jnp.clip(jnp.sum(mask, axis=1), min=1e-12)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / mask_sum
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    loss = loss.reshape(anchor_count, B).mean()
    return loss, anchor_dot_contrast, mask


def euclidean_disentangle_loss(features: jnp.ndarray, labels: jnp.ndarray):
    """Pull same-label features together, push different-label apart.

    ``features``: [N, D] flattened group features; ``labels``: [N].
    Reference training_project/utils/gaussian_diffusion.py:1056-1075 ('eu'):
    loss = mean(same-label pairwise dist) / (mean(diff-label pairwise dist)+eps)
    computed on cdist of flattened features, normalized by feature dim.
    """
    f = features.reshape(features.shape[0], -1)
    f = f / jnp.sqrt(jnp.float32(f.shape[-1]))
    d2 = jnp.sum((f[:, None, :] - f[None, :, :]) ** 2, axis=-1)
    dist = jnp.sqrt(d2 + 1e-12)
    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    eye = jnp.eye(labels.shape[0], dtype=jnp.float32)
    same_off = same * (1.0 - eye)
    diff = 1.0 - same
    pull = jnp.sum(dist * same_off) / jnp.clip(jnp.sum(same_off), min=1.0)
    push = jnp.sum(dist * diff) / jnp.clip(jnp.sum(diff), min=1.0)
    return pull / (push + 1e-6)
