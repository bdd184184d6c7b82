"""Pallas implicit-GEMM conv kernel vs the XLA conv path (interpret mode).

The kernel (ops/conv3d_pallas.py) carries the VAE decoder's heavy stride-1
3x3x3 stages on TPU; these tests pin its numerics to the direct XLA form on
CPU, including the halo DMA, the width alignment crop, and the
causal_conv3d auto-routing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.ops import conv3d_pallas
from hunyuanvideo_efficiency_tpu.ops.conv3d import causal_conv3d
from hunyuanvideo_efficiency_tpu.ops.conv3d_pallas import (
    conv3d_stride1_pallas, conv3d_stride1_pallas_v2, pallas_conv_applicable)


@pytest.mark.parametrize("w", [13, 16])
@pytest.mark.parametrize("cout", [128, 256])
def test_kernel_matches_xla_conv(w, cout):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (2, 5, 16, w, 128), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, 3, 128, cout), jnp.float32) * 0.05
    ref = causal_conv3d(x, kern, impl="3d")
    w_out = -(-w // 8) * 8
    wp = -(-(w_out + 2) // 8) * 8
    extra = wp - (w + 2)
    xp = jnp.pad(x, [(0, 0), (2, 0), (1, 1), (1, 1 + extra), (0, 0)],
                 mode="edge")
    out = conv3d_stride1_pallas(xp, kern, w_out,
                                interpret=True)[:, :, :, :w]
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("w", [13, 16])
@pytest.mark.parametrize("cout", [128, 256])
def test_kernel_v2_matches_xla_conv(w, cout):
    """The DMA-built temporal-reuse variant: same contract, same numerics.

    Covers the circular-buffer reuse across T (T=5 > kt so slots wrap) and
    the prefill at each fresh H block (H=16 / h_block=8 gives 2 blocks)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (2, 5, 16, w, 128), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, 3, 128, cout), jnp.float32) * 0.05
    ref = causal_conv3d(x, kern, impl="3d")
    w_out = -(-w // 8) * 8
    wp = -(-(w_out + 2) // 8) * 8
    extra = wp - (w + 2)
    xp = jnp.pad(x, [(0, 0), (2, 0), (1, 1), (1, 1 + extra), (0, 0)],
                 mode="edge")
    out = conv3d_stride1_pallas_v2(xp, kern, w_out,
                                   interpret=True)[:, :, :, :w]
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h", [8, 16])  # h=16 exercises the hb=16 route
def test_causal_conv3d_routes_through_pallas(monkeypatch, h):
    monkeypatch.setattr(conv3d_pallas, "INTERPRET_OVERRIDE", True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (1, 4, h, 11, 128), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, 3, 128, 128), jnp.float32) * 0.05
    bias = jax.random.normal(k3, (128,), jnp.float32)
    ref = causal_conv3d(x, kern, bias, impl="3d")
    out = causal_conv3d(x, kern, bias, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # auto also routes through the kernel when the gate admits the call
    out_auto = causal_conv3d(x, kern, bias, impl="auto")
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gate_rejections():
    k = (3, 3, 3, 128, 128)
    assert not pallas_conv_applicable((1, 4, 8, 11, 64),
                                      (3, 3, 3, 64, 128), (1, 1, 1))
    assert not pallas_conv_applicable((1, 4, 8, 11, 128), k, (1, 2, 2))
    assert not pallas_conv_applicable((1, 4, 9, 11, 128), k, (1, 1, 1))
    assert not pallas_conv_applicable(
        (1, 4, 8, 11, 128), (1, 3, 3, 128, 128), (1, 1, 1))
