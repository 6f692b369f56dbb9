"""Numerical parity vs torch-CPU.

The strongest evidence that this TPU-native redesign computes the *same
function* as the reference's torch models: we rebuild the reference
architecture in torch here (from its published DCGAN structure — no reference
code imported), copy weights across layouts (HWIO/NHWC <-> OIHW/NCHW), and
compare forward passes elementwise. Covers SURVEY §7 hard parts #1 (ConvT
semantics) and #2 (BatchNorm semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from siggan_tpu.core.config import ModelConfig
from siggan_tpu.models import discriminator, generator
from siggan_tpu.ops.conv import conv2d, conv_transpose2d
from siggan_tpu.ops.norm import batch_norm, init_state as bn_init

torch.manual_seed(0)


def j2t(x):
    return torch.from_numpy(np.asarray(x).copy())


def test_conv2d_matches_torch():
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    w = np.random.RandomState(1).randn(4, 4, 3, 8).astype(np.float32) * 0.1
    b = np.random.RandomState(2).randn(8).astype(np.float32)
    y = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1)
    m = nn.Conv2d(3, 8, 4, 2, 1)
    with torch.no_grad():
        m.weight.copy_(j2t(w.transpose(3, 2, 0, 1)))
        m.bias.copy_(j2t(b))
        yt = m(j2t(x.transpose(0, 3, 1, 2))).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_matches_torch():
    x = np.random.RandomState(0).randn(2, 4, 4, 6).astype(np.float32)
    w = np.random.RandomState(1).randn(4, 4, 6, 3).astype(np.float32) * 0.1
    y = conv_transpose2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1)
    assert y.shape == (2, 8, 8, 3)
    m = nn.ConvTranspose2d(6, 3, 4, 2, 1, bias=False)
    with torch.no_grad():
        # our HWIO kernel -> torch ConvT (in, out, kh, kw)
        m.weight.copy_(j2t(w.transpose(2, 3, 0, 1)))
        yt = m(j2t(x.transpose(0, 3, 1, 2))).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


def test_batch_norm_matches_torch_train_and_eval():
    x = np.random.RandomState(0).randn(8, 5, 5, 4).astype(np.float32) * 3 + 1
    scale = np.random.RandomState(1).rand(4).astype(np.float32) + 0.5
    offset = np.random.RandomState(2).randn(4).astype(np.float32)
    st = bn_init(4)
    y, st1 = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(offset), st, train=True)

    m = nn.BatchNorm2d(4)
    with torch.no_grad():
        m.weight.copy_(j2t(scale))
        m.bias.copy_(j2t(offset))
    m.train()
    yt = m(j2t(x.transpose(0, 3, 1, 2))).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st1["mean"]), m.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st1["var"]), m.running_var.numpy(), rtol=1e-4, atol=1e-6)

    m.eval()
    y2, _ = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(offset), st1, train=False)
    yt2 = m(j2t(x.transpose(0, 3, 1, 2))).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y2), yt2, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Full-model parity: rebuild the reference DCGAN G/D in torch and copy weights.
# ---------------------------------------------------------------------------

class TorchRefGenerator(nn.Module):
    """Reference generator structure (generator_vanilla_gan.py:69-163)."""

    def __init__(self, latent=16, base=32):
        super().__init__()
        self.c0 = base
        self.fc = nn.Sequential(
            nn.Linear(latent, base * 16), nn.BatchNorm1d(base * 16), nn.ReLU())
        chans = [(base, base // 2), (base // 2, base // 4),
                 (base // 4, base // 8), (base // 8, base // 8)]
        ups = []
        for cin, cout in chans:
            ups += [nn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=False),
                    nn.BatchNorm2d(cout), nn.ReLU()]
        self.up = nn.Sequential(*ups)
        self.final = nn.Sequential(nn.Conv2d(base // 8, 1, 3, 1, 1), nn.Tanh())

    def forward(self, z):
        h = self.fc(z).view(z.shape[0], self.c0, 4, 4)
        return self.final(self.up(h))


class TorchRefDiscriminator(nn.Module):
    """Reference discriminator structure (discriminator_vanilla_gan.py:84-207),
    eval mode (dropout inactive), no spectral norm."""

    def __init__(self):
        super().__init__()
        chans = [(1, 64), (64, 128), (128, 256), (256, 512)]
        blocks = []
        for cin, cout in chans:
            blocks += [nn.Conv2d(cin, cout, 4, 2, 1), nn.LeakyReLU(0.2)]
        self.conv = nn.Sequential(*blocks)
        self.fc = nn.Linear(512 * 16, 1)

    def forward(self, x):
        h = self.conv(x).flatten(1)
        return self.fc(h)


def _perm_fc_for_nhwc(w_jax, c0):
    """Our fc produces features reshaped (4,4,C0); torch views them (C0,4,4).

    Permute our weight columns/bias so both models compute the same function.
    """
    w = np.asarray(w_jax).reshape(-1, 4, 4, c0)       # (in, h, w, c)
    return w.transpose(0, 3, 1, 2).reshape(w.shape[0], -1)  # (in, c*h*w)


def test_generator_full_parity():
    cfg = ModelConfig(latent_dim=16, base_features=32)
    params, state = generator.init_fn(jax.random.key(7), cfg)
    tg = TorchRefGenerator(latent=16, base=32)
    with torch.no_grad():
        tg.fc[0].weight.copy_(j2t(_perm_fc_for_nhwc(params["fc"]["w"], 32).T))
        # BN1d over the permuted feature order
        fcw = np.asarray(params["fc"]["b"]).reshape(4, 4, 32).transpose(2, 0, 1).ravel()
        tg.fc[0].bias.copy_(j2t(fcw))
        sc = np.asarray(params["fc_bn"]["scale"]).reshape(4, 4, 32).transpose(2, 0, 1).ravel()
        of = np.asarray(params["fc_bn"]["offset"]).reshape(4, 4, 32).transpose(2, 0, 1).ravel()
        tg.fc[1].weight.copy_(j2t(sc))
        tg.fc[1].bias.copy_(j2t(of))
        for i, blk in enumerate(params["blocks"]):
            tg.up[3 * i].weight.copy_(j2t(np.asarray(blk["w"]).transpose(2, 3, 0, 1)))
            tg.up[3 * i + 1].weight.copy_(j2t(blk["bn"]["scale"]))
            tg.up[3 * i + 1].bias.copy_(j2t(blk["bn"]["offset"]))
        tg.final[0].weight.copy_(j2t(np.asarray(params["final"]["w"]).transpose(3, 2, 0, 1)))
        tg.final[0].bias.copy_(j2t(params["final"]["b"]))

    z = np.random.RandomState(3).randn(8, 16).astype(np.float32)
    img, _ = generator.apply_fn(params, state, jnp.asarray(z), cfg, train=True)
    tg.train()
    with torch.no_grad():
        imt = tg(j2t(z)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(img), imt, rtol=1e-3, atol=2e-4)


def test_discriminator_full_parity_eval():
    cfg = ModelConfig()  # 64px, dropout active only in train; compare eval
    params, state = discriminator.init_fn(jax.random.key(9), cfg)
    td = TorchRefDiscriminator()
    with torch.no_grad():
        for i, blk in enumerate(params["blocks"]):
            td.conv[2 * i].weight.copy_(j2t(np.asarray(blk["w"]).transpose(3, 2, 0, 1)))
            td.conv[2 * i].bias.copy_(j2t(blk["b"]))
        # flatten order: ours (h,w,c) -> torch (c,h,w)
        w = np.asarray(params["fc"]["w"]).reshape(4, 4, 512).transpose(2, 0, 1).reshape(-1, 1)
        td.fc.weight.copy_(j2t(w.T))
        td.fc.bias.copy_(j2t(params["fc"]["b"]))
    x = np.random.RandomState(5).randn(4, 64, 64, 1).astype(np.float32)
    logits, _ = discriminator.apply_fn(params, state, jnp.asarray(x), cfg, train=False)
    with torch.no_grad():
        lt = td(j2t(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(logits), lt, rtol=1e-3, atol=1e-4)
