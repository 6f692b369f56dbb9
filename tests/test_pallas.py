"""Pallas kernels vs XLA reference implementations (interpret mode on CPU;
the same comparisons run compiled on real TPU in the verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.models import generator
from siggan_tpu.ops.conv import conv_transpose2d
from siggan_tpu.ops.pallas.generator_fwd import generator_forward, pack_generator
from siggan_tpu.ops.pallas.upsample import fold_bn_affine, pack_w9, upsample_block


def test_upsample_block_matches_xla():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 8, 8, 16).astype(np.float32))
    w = jnp.asarray(rs.randn(4, 4, 16, 8).astype(np.float32) * 0.1)
    scale = jnp.asarray(rs.rand(8).astype(np.float32) + 0.5)
    offset = jnp.asarray(rs.randn(8).astype(np.float32))
    ref = jnp.maximum(
        conv_transpose2d(x, w, stride=2, padding=1) * scale + offset, 0.0)
    got = upsample_block(x, pack_w9(w), scale, offset, relu=True,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_upsample_block_no_relu():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rs.randn(4, 4, 8, 4).astype(np.float32) * 0.1)
    ones, zeros = jnp.ones((4,)), jnp.zeros((4,))
    ref = conv_transpose2d(x, w, stride=2, padding=1)
    got = upsample_block(x, pack_w9(w), ones, zeros, relu=False,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert np.asarray(got).min() < 0  # relu really off


def test_fold_bn_affine_matches_batch_norm_eval():
    from siggan_tpu.ops.norm import batch_norm, init_state
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(4, 5, 5, 8).astype(np.float32))
    params = {"scale": jnp.asarray(rs.rand(8) + 0.5, jnp.float32),
              "offset": jnp.asarray(rs.randn(8), jnp.float32)}
    state = {"mean": jnp.asarray(rs.randn(8), jnp.float32),
             "var": jnp.asarray(rs.rand(8) + 0.1, jnp.float32)}
    ref, _ = batch_norm(x, params["scale"], params["offset"], state,
                        train=False)
    s, o = fold_bn_affine(params, state)
    np.testing.assert_allclose(np.asarray(x * s + o), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_generator_forward_matches_xla():
    """The whole-network kernel must equal the XLA eval forward."""
    cfg = TrainConfig(compute_dtype="float32")  # full 64px architecture
    state = create_train_state(cfg)
    z = jax.random.normal(jax.random.key(0), (8, 100))
    ref, _ = generator.apply_fn(state.g_params, state.g_bn, z, cfg.model,
                                train=False)
    packed = pack_generator(state.g_params, state.g_bn, cfg.model)
    got = generator_forward(packed, z, tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_fused_generator_requires_tile_multiple():
    cfg = TrainConfig(compute_dtype="float32")
    state = create_train_state(cfg)
    packed = pack_generator(state.g_params, state.g_bn, cfg.model)
    with pytest.raises(AssertionError):
        generator_forward(packed, jnp.zeros((6, 100)), tile=4, interpret=True)


@pytest.mark.slow
def test_train_tail_matches_packed_xla():
    """Fused Pallas train-tail (interpret mode) == the XLA packed tail:
    image, and BN running-state updates for the tail blocks."""
    import jax.numpy as jnp

    from siggan_tpu.models import generator
    from siggan_tpu.ops.conv import conv2d, conv_transpose2d, linear
    from siggan_tpu.ops.norm import batch_norm, batch_norm_packed
    from siggan_tpu.ops.packed import (pack_conv3_kernel_both_mc,
                                       pack_convt_kernel_both_mc,
                                       pack_convt_kernel_out_mc)
    from siggan_tpu.ops.pallas.train_tail import tail_forward_train

    cfg = ModelConfig(image_size=64, base_features=32)
    params, state = generator.init_fn(jax.random.key(0), cfg)
    _, blocks = generator.channel_schedule(cfg)
    start = min(i for i, (_, co) in enumerate(blocks) if co <= 64)

    # Pixel-space head up to the tail entry (same math as apply_fn).
    z = jax.random.normal(jax.random.key(1), (4, cfg.latent_dim))
    h = linear(z, params["fc"]["w"], params["fc"]["b"])
    h, _ = batch_norm(h, params["fc_bn"]["scale"], params["fc_bn"]["offset"],
                      state["fc_bn"], train=True)
    h = jax.nn.relu(h).reshape(4, 4, 4, -1)
    for i in range(start):
        p = params["blocks"][i]
        h = conv_transpose2d(h, p["w"], stride=2, padding=1)
        h, _ = batch_norm(h, p["bn"]["scale"], p["bn"]["offset"],
                          state["blocks"][i], train=True)
        h = jax.nn.relu(h)

    # XLA reference tail (packed ops).
    ref = h
    ref_states = []
    y = conv2d(ref, pack_convt_kernel_out_mc(params["blocks"][start]["w"]),
               stride=1, padding=1)
    y, st = batch_norm_packed(y, params["blocks"][start]["bn"]["scale"],
                              params["blocks"][start]["bn"]["offset"],
                              state["blocks"][start], train=True)
    ref_states.append(st)
    y = jax.nn.relu(y)
    for i in range(start + 1, len(blocks)):
        p = params["blocks"][i]
        y = conv_transpose2d(y, pack_convt_kernel_both_mc(p["w"]),
                             stride=2, padding=1)
        y, st = batch_norm_packed(y, p["bn"]["scale"], p["bn"]["offset"],
                                  state["blocks"][i], train=True)
        ref_states.append(st)
        y = jax.nn.relu(y)
    wf = pack_conv3_kernel_both_mc(params["final"]["w"])
    img_ref = jnp.tanh(conv2d(y, wf, jnp.broadcast_to(
        params["final"]["b"], (4,)), stride=1, padding=1))

    img, new_states = tail_forward_train(params, state, h, cfg,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_states),
                    jax.tree_util.tree_leaves(ref_states)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
