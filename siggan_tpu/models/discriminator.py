"""DCGAN-style signature discriminator as a pure function over pytrees.

Architecture parity with ``discriminator_vanilla_gan.py:18-239`` (verified
against torch-CPU in ``tests/test_torch_parity.py``):

  x (N, H, W, C) in [-1, 1]
   -> k x DownsampleBlock: Conv(4,2,1, bias) [+spectral_norm]
        + LeakyReLU(0.2) + Dropout2d(0.25)   (NO BatchNorm by default,
                                              matching the reference default)
        64px:  1->64->128->256->512          (4 blocks, 64x64 -> 4x4)
        128px: 1->64->128->256->512->512     (5 blocks)
   -> flatten -> Linear(512*4*4, 1) [+spectral_norm]

The reference appends Sigmoid and feeds BCELoss; we return LOGITS and use
``sigmoid_binary_cross_entropy`` in the train step — identical math, stable
numerics, one fused XLA epilogue. ``apply_fn(..., features=True)`` exposes the
pre-classifier feature map (``forward_features:262``, the feature-matching
hook). Spectral-norm power-iteration vectors live in the explicit ``state``
pytree. ~2.76M params at 64px, matching the reference count.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from siggan_tpu.core.config import ModelConfig
from siggan_tpu.ops import initializers as init
from siggan_tpu.ops.conv import conv2d, linear
from siggan_tpu.ops.regularizers import dropout2d, sn_init, spectral_norm

Params = Dict
State = Dict


def channel_schedule(cfg: ModelConfig) -> List[Tuple[int, int]]:
    if cfg.image_size == 64:
        return [(cfg.image_channels, 64), (64, 128), (128, 256), (256, 512)]
    if cfg.image_size == 128:
        return [(cfg.image_channels, 64), (64, 128), (128, 256), (256, 512), (512, 512)]
    raise ValueError(f"input_size must be 64 or 128, got {cfg.image_size}")


def init_fn(key: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    blocks = channel_schedule(cfg)
    final_features = 512 * 4 * 4
    keys = jax.random.split(key, len(blocks) + 1)
    params: Params = {"blocks": [], "fc": {
        "w": init.linear_w(keys[-1], (final_features, 1)),
        "b": init.zeros((1,)),
    }}
    if cfg.num_classes > 0 and cfg.d_projection:
        # projection-discriminator class embedding over the flattened
        # pre-classifier features (logit += <embed[y], feat>).
        params["class_embed"] = init.linear_w(
            jax.random.fold_in(keys[-1], 0x434C53),
            (cfg.num_classes, final_features))
    if cfg.num_classes > 0:
        if cfg.aux_classifier:
            # AC-GAN auxiliary classifier head (Odena et al. 2017): a
            # second linear readout predicting the writer class.
            params["aux"] = {
                "w": init.linear_w(jax.random.fold_in(keys[-1], 0x415558),
                                   (final_features, cfg.num_classes)),
                "b": init.zeros((cfg.num_classes,)),
            }
    state: State = {"blocks": [], "fc": {}}
    for i, (cin, cout) in enumerate(blocks):
        params["blocks"].append({
            "w": init.conv_w(keys[i], (4, 4, cin, cout)),
            "b": init.zeros((cout,)),
        })
        state["blocks"].append(sn_init(cout) if cfg.use_spectral_norm else {})
    if cfg.use_spectral_norm:
        state["fc"] = sn_init(1)
        if cfg.num_classes > 0 and cfg.d_projection:
            # Miyato projection-cGAN normalizes the class embedding (and
            # any extra head) too: an unconstrained projection term lets D
            # push unbounded logits AROUND the spectrally-normalized fc
            # path, defeating SN (measured: conditional runs at 4-6x the
            # unconditional FID until this was constrained).
            state["class_embed"] = sn_init(final_features)
        if cfg.num_classes > 0 and cfg.aux_classifier:
            state["aux"] = sn_init(cfg.num_classes)
    return params, state


def apply_fn(
    params: Params,
    state: State,
    x: jax.Array,
    cfg: ModelConfig,
    *,
    train: bool,
    rng: jax.Array | None = None,
    compute_dtype=None,
    features: bool = False,
    packed_input: bool = False,
    y: jax.Array | None = None,
    aux: bool = False,
) -> Tuple[jax.Array, State]:
    """x: (N,H,W,C) -> logits (N, 1) (or flattened features if features=True).

    ``aux=True`` (AC-GAN head present) returns ((logits, aux_logits), state)
    with aux_logits (N, num_classes) class predictions in f32.

    ``rng`` is required when ``train=True`` and dropout > 0.

    ``packed_input=True`` takes x in 2x2 space-to-depth form (N, H/2, W/2, 4)
    and folds the unpacking into the first conv (exact; see ops/packed.py).
    Spectral norm still normalizes the canonical (4,4,1,Co) weight first.
    """
    if train and cfg.dropout > 0 and rng is None:
        raise ValueError("training discriminator forward requires a dropout rng")
    blocks = channel_schedule(cfg)
    # Start from a shallow copy so SN states of heads not exercised by this
    # call (projection/aux) pass through unchanged — the returned pytree
    # structure must match ``state`` exactly for the scan/donation path.
    new_state: State = {**state, "blocks": []}
    h = x
    for i in range(len(blocks)):
        p = params["blocks"][i]
        w = p["w"]
        if cfg.use_spectral_norm:
            w, bs = spectral_norm(w, state["blocks"][i], train=train)
        else:
            bs = state["blocks"][i]
        new_state["blocks"].append(bs)
        if packed_input and i == 0:
            if cfg.image_channels != 1:
                raise ValueError("packed_input requires 1-channel images")
            from siggan_tpu.ops.packed import (conv3s1p1_matmul_both,
                                               conv3s1p1_matmul_dgrad,
                                               pack_first_conv_kernel)
            # custom-VJP conv: the input gradient (into the C=4 packed fake,
            # the G step's path back into the generator) runs in merged-tap
            # matmul form — the plain conv dgrad measured 6.5 TF/s and was
            # the slowest op left in the step (see conv3s1p1_matmul_dgrad).
            # d_conv1_matmul additionally runs the FORWARD in that form.
            make_conv = (conv3s1p1_matmul_both if cfg.d_conv1_matmul
                         else conv3s1p1_matmul_dgrad)
            h = make_conv(compute_dtype)(h, pack_first_conv_kernel(w), p["b"])
        elif cfg.d_dgrad_phases:
            from siggan_tpu.ops.conv import conv_s2p1_phase_dgrad
            # Stride-2 dgrad as 4 dense phase convs (see conv.py) — the
            # G-step's backward through D otherwise runs these dgrads on a
            # 2x-dilated cotangent at ~half MXU efficiency.
            h = conv_s2p1_phase_dgrad(compute_dtype)(h, w, p["b"])
        else:
            h = conv2d(h, w, p["b"], stride=2, padding=1, compute_dtype=compute_dtype)
        h = jax.nn.leaky_relu(h, cfg.leaky_slope)
        if train and cfg.dropout > 0:
            rng, sub = jax.random.split(rng)
            h = dropout2d(h, cfg.dropout, sub, train=True)
    if features:
        return jnp.reshape(h, (h.shape[0], -1)), new_state
    w = params["fc"]["w"]
    if cfg.use_spectral_norm:
        w, new_state["fc"] = spectral_norm(w, state["fc"], train=train)
    # The canonical flatten -> Linear(HWC, 1) head, computed as a VALID
    # convolution over the feature map (the kernel is the SAME weight
    # row-major-reshaped to (H, W, C, 1), so flat @ w == conv exactly, and
    # gradients flow to the canonical (HWC, 1) param). Why: the flatten is a
    # (N, 4, 4, 512) -> (N, 8192) re-tiling XLA must materialize BOTH ways
    # around the dot in the train step (xprof r4: copy.736 + bitcasts,
    # ~2 us/step), and the leaky-relu backward select could not fuse across
    # it; the conv form keeps head + backward in the conv layout.
    n, hh, ww, cc = h.shape
    logits = conv2d(h, jnp.reshape(w, (hh, ww, cc, 1)), params["fc"]["b"],
                    stride=1, padding=0,
                    compute_dtype=compute_dtype).reshape(n, 1)
    flat = None
    if cfg.num_classes > 0 and cfg.d_projection:
        if y is None:
            raise ValueError("conditional discriminator requires labels y")
        flat = jnp.reshape(h, (n, -1))
        embed_w = params["class_embed"]
        if cfg.use_spectral_norm:
            embed_w, new_state["class_embed"] = spectral_norm(
                embed_w, state["class_embed"], train=train)
        emb = jnp.take(jnp.asarray(embed_w), y, axis=0)
        proj = jnp.sum(flat.astype(jnp.float32) * emb.astype(jnp.float32),
                       axis=-1, keepdims=True)
        logits = logits.astype(jnp.float32) + proj
    if aux:
        if "aux" not in params:
            raise ValueError("aux=True requires cfg.aux_classifier params")
        if flat is None:
            flat = jnp.reshape(h, (n, -1))
        aux_w = params["aux"]["w"]
        if cfg.use_spectral_norm:
            aux_w, new_state["aux"] = spectral_norm(
                aux_w, state["aux"], train=train)
        aux_logits = linear(flat, aux_w, params["aux"]["b"],
                            compute_dtype=None).astype(jnp.float32)
        return (logits.astype(jnp.float32), aux_logits), new_state
    return logits.astype(jnp.float32), new_state


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
