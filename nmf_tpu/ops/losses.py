"""Volume-rendering losses.

- distortion_loss: mip-NeRF-360 distortion in the O(N) prefix-sum form.
  The reference ships an O(N^2) warp CUDA kernel with hand-written gradients
  (modules/distortion_loss_warp.py:63-160) but live code zeroes it
  (tensor_nerf.py:585-596); here the efficient form is implemented so the
  ``distortion_lambda`` config knob actually works.
"""
import jax.numpy as jnp


def distortion_loss(midpoint, weight, dt):
    """midpoint, weight, dt: (B, N). Returns scalar sum over rays.

    L = sum_ij w_i w_j |m_i - m_j| + 1/3 sum_i w_i^2 dt_i
    computed with sorted midpoints via prefix sums (O(N) per ray).
    """
    # assume midpoints are ascending along the sample axis (true for our
    # samplers); use the standard identity:
    # sum_{i<j} w_i w_j (m_j - m_i) = sum_j w_j (m_j W_j - S_j)
    # where W_j = sum_{i<=j} w_i, S_j = sum_{i<=j} w_i m_i
    W = jnp.cumsum(weight, axis=-1)
    S = jnp.cumsum(weight * midpoint, axis=-1)
    bidir = 2 * (weight * (midpoint * (W - weight) - (S - weight * midpoint))
                 ).sum(axis=-1)
    self_term = (weight ** 2 * dt).sum(axis=-1) / 3
    return (bidir + self_term).sum()
