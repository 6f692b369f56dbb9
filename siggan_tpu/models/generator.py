"""DCGAN-style signature generator as a pure function over pytrees.

Architecture parity with ``generator_vanilla_gan.py:69-163`` (verified
numerically against torch-CPU in ``tests/test_torch_parity.py``):

  z (N, latent)
   -> Linear(latent, 4*4*C0) + bias        (fc, C0=256 @64px / 512 @128px)
   -> BatchNorm1d + ReLU
   -> reshape (N, 4, 4, C0)                (NHWC — TPU-native; torch is NCHW)
   -> k x UpsampleBlock: ConvT(4,2,1, no bias) + BN + ReLU
        64px:  256->128->64->32->32        (4 blocks, 4x4 -> 64x64)
        128px: 512->256->128->64->32->32   (5 blocks, 4x4 -> 128x128)
   -> Conv(3,1,1) + bias + tanh            (final, 32 -> image_channels)

Init: DCGAN N(0, 0.02) everywhere (``generator_vanilla_gan.py:168-187``).
The ablation variant's LeakyReLU block activation
(``ablation_vanilla_gan_signatures.py:159-216`` ConfigurableGenerator) is the
``g_activation`` config knob rather than a second model class.

~1.13M params at 64px, matching the reference count.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from siggan_tpu.core.config import ModelConfig
from siggan_tpu.ops import initializers as init
from siggan_tpu.ops.conv import conv2d, conv_transpose2d, linear
from siggan_tpu.ops.norm import batch_norm, init_state as bn_init

Params = Dict
State = Dict


def channel_schedule(cfg: ModelConfig) -> Tuple[int, List[Tuple[int, int]]]:
    """(init_channels_at_4x4, [(in_ch, out_ch) per upsample block])."""
    if cfg.image_size == 64:
        c0 = cfg.base_features
        blocks = [(c0, c0 // 2), (c0 // 2, c0 // 4), (c0 // 4, c0 // 8), (c0 // 8, c0 // 8)]
    elif cfg.image_size == 128:
        c0 = cfg.base_features * 2
        blocks = [
            (c0, c0 // 2), (c0 // 2, c0 // 4), (c0 // 4, c0 // 8),
            (c0 // 8, c0 // 16), (c0 // 16, c0 // 16),
        ]
    else:
        raise ValueError(f"image_size must be 64 or 128, got {cfg.image_size}")
    return c0, blocks


def _cond_bn(cfg: ModelConfig) -> bool:
    """Per-class BatchNorm affine tables are allocated iff g_conditioning
    routes the label through BN."""
    return cfg.num_classes > 0 and cfg.g_conditioning in ("full", "bn_only")


def _fc_in(cfg: ModelConfig) -> int:
    """fc input width: latent_dim, plus num_classes one-hot columns for
    g_conditioning="concat"."""
    extra = (cfg.num_classes
             if cfg.num_classes > 0 and cfg.g_conditioning == "concat" else 0)
    return cfg.latent_dim + extra


def init_fn(key: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    c0, blocks = channel_schedule(cfg)
    n_fc = c0 * 4 * 4
    keys = jax.random.split(key, 3 + 2 * len(blocks))
    params: Params = {
        "fc": {
            "w": init.linear_w(keys[0], (_fc_in(cfg), n_fc)),
            "b": init.zeros((n_fc,)),
        },
        "fc_bn": ({"scale": init.bn_scale(keys[1], n_fc),
                   "offset": init.bn_offset(n_fc)}
                  if not _cond_bn(cfg) else
                  {"scale": jnp.tile(init.bn_scale(keys[1], n_fc)[None],
                                     (cfg.num_classes, 1)),
                   "offset": jnp.zeros((cfg.num_classes, n_fc),
                                       jnp.float32)}),
        "blocks": [],
        "final": {
            "w": init.conv_w(keys[2], (3, 3, blocks[-1][1], cfg.image_channels)),
            "b": init.zeros((cfg.image_channels,)),
        },
    }
    if cfg.num_classes > 0 and cfg.g_conditioning in ("full", "embed_only"):
        # class embedding ADDED to z (shape-preserving conditioning). Unit
        # scale, comparable to z ~ N(0, I): a 0.02-scale init measured as a
        # near-no-op (class steering at chance after 200 epochs); at 1.0 the
        # classes start linearly separated in latent space.
        ek = jax.random.fold_in(keys[0], 0x434C53)
        params["embed"] = jax.random.normal(
            ek, (cfg.num_classes, cfg.latent_dim), jnp.float32)
    state: State = {"fc_bn": bn_init(n_fc), "blocks": []}
    for i, (cin, cout) in enumerate(blocks):
        kw, kb = keys[3 + 2 * i], keys[4 + 2 * i]
        if not _cond_bn(cfg):
            bn_p = {"scale": init.bn_scale(kb, cout),
                    "offset": init.bn_offset(cout)}
        else:
            # CLASS-CONDITIONAL BatchNorm: per-writer gain/bias (the
            # standard cGAN conditioning; a plain z-shift measured at
            # chance-level class steering).
            bn_p = {"scale": jnp.tile(init.bn_scale(kb, cout)[None],
                                      (cfg.num_classes, 1)),
                    "offset": jnp.zeros((cfg.num_classes, cout), jnp.float32)}
        params["blocks"].append({
            "w": init.conv_w(kw, (4, 4, cin, cout)),  # no bias: BN follows
            "bn": bn_p,
        })
        state["blocks"].append(bn_init(cout))
    return params, state


def _bn_affine(p, y):
    """Conditional BN: select per-sample (scale, offset) rows for labels y;
    unconditional params pass through unchanged."""
    if y is None:
        return p["scale"], p["offset"]
    return (jnp.take(jnp.asarray(p["scale"]), y, axis=0),
            jnp.take(jnp.asarray(p["offset"]), y, axis=0))


def _act(x: jax.Array, cfg: ModelConfig) -> jax.Array:
    if cfg.g_activation == "leaky_relu":
        return jax.nn.leaky_relu(x, cfg.leaky_slope)
    return jax.nn.relu(x)


def apply_fn(
    params: Params,
    state: State,
    z: jax.Array,
    cfg: ModelConfig,
    *,
    train: bool,
    compute_dtype=None,
    packed_output: bool = False,
    y: jax.Array | None = None,
    bn_groups: int = 1,
) -> Tuple[jax.Array, State]:
    """z: (N, latent_dim) -> image (N, H, W, C) in [-1, 1]; returns new BN state.

    ``y`` (N,) int32 class labels — required iff cfg.num_classes > 0
    (conditional v2.0 path): z is shifted by a learned class embedding.

    ``packed_output=True`` (train path, 1-channel models only) runs the whole
    small-channel TAIL — every upsample block with Cout <= 64 plus the final
    conv — in 2x2 space-to-depth form with exactly re-indexed kernels
    (ops/packed.py): C=32 tensors become C=128 (full TPU lanes, full MXU
    contraction), no pixel-space C=1 tensor is ever materialized, and the
    emitted image is ``space_to_depth(image)``. BN statistics and parameters
    stay in canonical per-channel shape. Numerically equal to the canonical
    path (tests/test_packed.py); the backward convs inherit the packed
    layout through autodiff.
    """
    c0, blocks = channel_schedule(cfg)
    new_state: State = {"blocks": []}
    if packed_output and cfg.image_channels != 1:
        raise ValueError("packed_output requires 1-channel images")

    y_bn = None
    if cfg.num_classes > 0:
        if y is None:
            raise ValueError("conditional generator requires labels y")
        if cfg.g_conditioning in ("full", "embed_only"):
            z = z + jnp.take(jnp.asarray(params["embed"]), y, axis=0)
        if cfg.g_conditioning == "concat":
            z = jnp.concatenate(
                [z, jax.nn.one_hot(y, cfg.num_classes, dtype=z.dtype)], axis=1)
        if cfg.g_conditioning in ("full", "bn_only"):
            y_bn = y
    h = linear(z, params["fc"]["w"], params["fc"]["b"], compute_dtype=compute_dtype)
    fc_a, fc_b = _bn_affine(params["fc_bn"], y_bn)
    h, new_state["fc_bn"] = batch_norm(
        h, fc_a, fc_b, state["fc_bn"], train=train, groups=bn_groups
    )
    h = _act(h, cfg)
    h = jnp.reshape(h, (h.shape[0], 4, 4, c0))

    # One-launch Pallas pack of every tail kernel (vs per-layer slice/concat
    # micro-fusions); the packed forms and gradients are identical.
    tail_packed = None
    entry_i = None
    if packed_output and cfg.g_pack_pallas:
        from siggan_tpu.ops.packed import pack_tail_kernels_pallas
        entry_i = next((i for i, (_, co) in enumerate(blocks) if co <= 64),
                       None)
        if entry_i is not None:
            ws = [params["blocks"][i]["w"]
                  for i in range(entry_i, len(blocks))] + [params["final"]["w"]]
            tail_packed = pack_tail_kernels_pallas(
                ws, out_dtype=compute_dtype)

    if cfg.g_convt_cvjp:
        from siggan_tpu.ops.conv import convt_adjoint_dgrad
        convt = convt_adjoint_dgrad(
            stride=2, padding=1, compute_dtype=compute_dtype)
    else:
        convt = lambda h_, w_: conv_transpose2d(  # noqa: E731
            h_, w_, stride=2, padding=1, compute_dtype=compute_dtype)

    packed_now = False
    for i in range(len(blocks)):
        p = params["blocks"][i]
        if packed_output and not packed_now and blocks[i][1] <= 64:
            if tail_packed is not None:
                wp_i = tail_packed[0]
            else:
                from siggan_tpu.ops.packed import pack_convt_kernel_out_mc
                wp_i = pack_convt_kernel_out_mc(p["w"])
            h = conv2d(h, wp_i, stride=1,
                       padding=1, compute_dtype=compute_dtype)
            packed_now = True
        elif packed_now:
            if tail_packed is not None:
                wp_i = tail_packed[i - entry_i]
            else:
                from siggan_tpu.ops.packed import pack_convt_kernel_both_mc
                wp_i = pack_convt_kernel_both_mc(p["w"])
            h = convt(h, wp_i)
        else:
            h = convt(h, p["w"])
        bn_a, bn_b = _bn_affine(p["bn"], y_bn)
        if packed_now:
            from siggan_tpu.ops.norm import batch_norm_packed
            h, bs = batch_norm_packed(
                h, bn_a, bn_b, state["blocks"][i], train=train,
                groups=bn_groups)
        else:
            h, bs = batch_norm(
                h, bn_a, bn_b, state["blocks"][i], train=train,
                groups=bn_groups)
        new_state["blocks"].append(bs)
        h = _act(h, cfg)

    if packed_now:
        from siggan_tpu.ops.packed import (conv3_mc_as_matmul,
                                           conv3_mc_as_matmul_cvjp,
                                           pack_conv3_kernel_both_mc)
        wp = (tail_packed[-1] if tail_packed is not None
              else pack_conv3_kernel_both_mc(params["final"]["w"]))
        bp = jnp.broadcast_to(params["final"]["b"], (4,))
        # Matmul-form final conv: the direct (3,3,128,4) conv and its VJP
        # are the slowest ops in the whole train step (C<=4 lane waste —
        # see conv3_mc_as_matmul docstring for the measured numbers).
        if cfg.g_final_cvjp:
            img = conv3_mc_as_matmul_cvjp(compute_dtype)(h, wp, bp)
        else:
            img = conv3_mc_as_matmul(h, wp, bp, compute_dtype=compute_dtype)
    elif packed_output:
        from siggan_tpu.ops.packed import pack_final_conv_kernel
        wp = pack_final_conv_kernel(params["final"]["w"])
        bp = jnp.broadcast_to(params["final"]["b"], (4,))
        img = conv2d(h, wp, bp, stride=2, padding=1,
                     compute_dtype=compute_dtype)
    else:
        img = conv2d(h, params["final"]["w"], params["final"]["b"],
                     stride=1, padding=1, compute_dtype=compute_dtype)
    # tanh stays in the compute dtype: under bf16 the image tensor would
    # otherwise round-trip through f32 on every G forward (~120 us/step of
    # pure layout/convert work on C=1 tensors at 64px/b64). Callers that
    # need f32 images (PNG export, eval) cast at the boundary.
    return jnp.tanh(img), new_state


def generate_latent(key: jax.Array, n: int, cfg: ModelConfig, scale: float = 1.0) -> jax.Array:
    """z ~ N(0, scale^2 I) — the reference's noise_scale knob (inference.py:179)."""
    return jax.random.normal(key, (n, cfg.latent_dim), jnp.float32) * scale


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
