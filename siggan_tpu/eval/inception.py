"""InceptionV3 (torchvision variant) in JAX — the FID feature extractor.

Port target: ``torchvision.models.inception_v3(transform_input=False)`` with
``fc -> Identity`` exactly as the reference uses it (``utils/metrics.py:23-46``):
grayscale images are channel-replicated, bilinearly resized to 299 (half-pixel
centers == align_corners=False), fed in [-1, 1] WITHOUT ImageNet
normalization (the reference skips it; FID is self-consistent as long as real
and fake share the pipeline), and pooled to 2048-d features.

Weights: ``convert_torch_state_dict`` maps a torchvision state dict into this
tree — use it when pretrained weights are available. This build environment
has no torchvision/weights and no egress, so the default backbone is a
FIXED-SEED random initialization: random-feature Frechet distances are still
a valid relative metric (they rank model quality consistently), and every
report records which backbone produced the number
(``eval/fid.py`` tags ``backbone: "random-init"`` vs ``"torchvision"``).

Eval-only: BatchNorm (eps 1e-3) always uses its stored running statistics.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from siggan_tpu.ops.conv import conv2d


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _bconv(p: Dict, x: jax.Array, stride=1, padding=0) -> jax.Array:
    """BasicConv2d: conv(no bias) + frozen BN(eps=1e-3) + relu."""
    y = conv2d(x, p["w"], stride=stride, padding=padding)
    inv = lax.rsqrt(p["var"] + 1e-3)
    y = (y - p["mean"]) * (inv * p["scale"]) + p["offset"]
    return jax.nn.relu(y)


def _bconv_rect(p: Dict, x: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """BasicConv2d with asymmetric kernel (1x7 / 7x1 / 1x3 / 3x1)."""
    return _bconv(p, x, stride=1, padding=(pad_h, pad_w))


def _maxpool3s2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             "VALID")


def _avgpool3s1p1(x: jax.Array) -> jax.Array:
    # torchvision's inception blocks call F.avg_pool2d(x, 3, 1, 1) with the
    # DEFAULT count_include_pad=True: the divisor is 9 even at the edges
    # (pad zeros count). pytorch-fid patches this to False, but the
    # reference (utils/metrics.py:27) uses torchvision directly.
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _init_bconv(key, kh, kw, cin, cout) -> Dict:
    # He-scaled: keeps activation variance ~constant through the 17-layer
    # stack so random-backbone features stay in a sane numeric range (a
    # fixed std compounds ~5x per layer and overflows the FID covariances).
    std = (2.0 / (kh * kw * cin)) ** 0.5
    return {
        "w": jax.random.truncated_normal(key, -2, 2, (kh, kw, cin, cout),
                                         jnp.float32) * std,
        "scale": jnp.ones((cout,)), "offset": jnp.zeros((cout,)),
        "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,)),
    }


# ---------------------------------------------------------------------------
# Inception blocks (torchvision structure)
# ---------------------------------------------------------------------------

def _inception_a(p, x):
    b1 = _bconv(p["b1x1"], x)
    b5 = _bconv(p["b5x5_2"], _bconv(p["b5x5_1"], x), padding=2)
    b3 = _bconv(p["b3x3dbl_3"],
                _bconv(p["b3x3dbl_2"], _bconv(p["b3x3dbl_1"], x), padding=1),
                padding=1)
    bp = _bconv(p["bpool"], _avgpool3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _bconv(p["b3x3"], x, stride=2)
    bd = _bconv(p["b3x3dbl_3"],
                _bconv(p["b3x3dbl_2"], _bconv(p["b3x3dbl_1"], x), padding=1),
                stride=2)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _inception_c(p, x):
    b1 = _bconv(p["b1x1"], x)
    b7 = _bconv_rect(p["b7x7_3"],
                     _bconv_rect(p["b7x7_2"], _bconv(p["b7x7_1"], x), 0, 3),
                     3, 0)
    bd = x
    for name, (ph, pw) in [("b7x7dbl_1", (0, 0)), ("b7x7dbl_2", (3, 0)),
                           ("b7x7dbl_3", (0, 3)), ("b7x7dbl_4", (3, 0)),
                           ("b7x7dbl_5", (0, 3))]:
        bd = _bconv_rect(p[name], bd, ph, pw)
    bp = _bconv(p["bpool"], _avgpool3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _bconv(p["b3x3_2"], _bconv(p["b3x3_1"], x), stride=2)
    b7 = _bconv(p["b7x7x3_4"],
                _bconv_rect(p["b7x7x3_3"],
                            _bconv_rect(p["b7x7x3_2"], _bconv(p["b7x7x3_1"], x),
                                        0, 3), 3, 0),
                stride=2)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _inception_e(p, x):
    b1 = _bconv(p["b1x1"], x)
    b3 = _bconv(p["b3x3_1"], x)
    b3 = jnp.concatenate([_bconv_rect(p["b3x3_2a"], b3, 0, 1),
                          _bconv_rect(p["b3x3_2b"], b3, 1, 0)], axis=-1)
    bd = _bconv(p["b3x3dbl_2"], _bconv(p["b3x3dbl_1"], x), padding=1)
    bd = jnp.concatenate([_bconv_rect(p["b3x3dbl_3a"], bd, 0, 1),
                          _bconv_rect(p["b3x3dbl_3b"], bd, 1, 0)], axis=-1)
    bp = _bconv(p["bpool"], _avgpool3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# Whole network
# ---------------------------------------------------------------------------

def _spec() -> List[Tuple[str, str, Dict]]:
    """(name, block_type, {param_name: (kh, kw, cin, cout)})."""
    def A(cin, pool):
        return {"b1x1": (1, 1, cin, 64), "b5x5_1": (1, 1, cin, 48),
                "b5x5_2": (5, 5, 48, 64), "b3x3dbl_1": (1, 1, cin, 64),
                "b3x3dbl_2": (3, 3, 64, 96), "b3x3dbl_3": (3, 3, 96, 96),
                "bpool": (1, 1, cin, pool)}

    def C(c7):
        return {"b1x1": (1, 1, 768, 192), "b7x7_1": (1, 1, 768, c7),
                "b7x7_2": (1, 7, c7, c7), "b7x7_3": (7, 1, c7, 192),
                "b7x7dbl_1": (1, 1, 768, c7), "b7x7dbl_2": (7, 1, c7, c7),
                "b7x7dbl_3": (1, 7, c7, c7), "b7x7dbl_4": (7, 1, c7, c7),
                "b7x7dbl_5": (1, 7, c7, 192), "bpool": (1, 1, 768, 192)}

    return [
        ("Conv2d_1a_3x3", "conv", {"": (3, 3, 3, 32)}),
        ("Conv2d_2a_3x3", "conv", {"": (3, 3, 32, 32)}),
        ("Conv2d_2b_3x3", "conv", {"": (3, 3, 32, 64)}),
        ("Conv2d_3b_1x1", "conv", {"": (1, 1, 64, 80)}),
        ("Conv2d_4a_3x3", "conv", {"": (3, 3, 80, 192)}),
        ("Mixed_5b", "A", A(192, 32)),
        ("Mixed_5c", "A", A(256, 64)),
        ("Mixed_5d", "A", A(288, 64)),
        ("Mixed_6a", "B", {"b3x3": (3, 3, 288, 384),
                           "b3x3dbl_1": (1, 1, 288, 64),
                           "b3x3dbl_2": (3, 3, 64, 96),
                           "b3x3dbl_3": (3, 3, 96, 96)}),
        ("Mixed_6b", "C", C(128)),
        ("Mixed_6c", "C", C(160)),
        ("Mixed_6d", "C", C(160)),
        ("Mixed_6e", "C", C(192)),
        ("Mixed_7a", "D", {"b3x3_1": (1, 1, 768, 192),
                           "b3x3_2": (3, 3, 192, 320),
                           "b7x7x3_1": (1, 1, 768, 192),
                           "b7x7x3_2": (1, 7, 192, 192),
                           "b7x7x3_3": (7, 1, 192, 192),
                           "b7x7x3_4": (3, 3, 192, 192)}),
        ("Mixed_7b", "E", {"b1x1": (1, 1, 1280, 320),
                           "b3x3_1": (1, 1, 1280, 384),
                           "b3x3_2a": (1, 3, 384, 384),
                           "b3x3_2b": (3, 1, 384, 384),
                           "b3x3dbl_1": (1, 1, 1280, 448),
                           "b3x3dbl_2": (3, 3, 448, 384),
                           "b3x3dbl_3a": (1, 3, 384, 384),
                           "b3x3dbl_3b": (3, 1, 384, 384),
                           "bpool": (1, 1, 1280, 192)}),
        ("Mixed_7c", "E", {"b1x1": (1, 1, 2048, 320),
                           "b3x3_1": (1, 1, 2048, 384),
                           "b3x3_2a": (1, 3, 384, 384),
                           "b3x3_2b": (3, 1, 384, 384),
                           "b3x3dbl_1": (1, 1, 2048, 448),
                           "b3x3dbl_2": (3, 3, 448, 384),
                           "b3x3dbl_3a": (1, 3, 384, 384),
                           "b3x3dbl_3b": (3, 1, 384, 384),
                           "bpool": (1, 1, 2048, 192)}),
    ]


FEATURE_DIM = 2048


def init_params(seed: int = 0) -> Dict:
    """Fixed-seed random backbone (see module docstring)."""
    key = jax.random.key(seed)
    params: Dict = {}
    for name, _, shapes in _spec():
        if "" in shapes:
            key, sub = jax.random.split(key)
            params[name] = _init_bconv(sub, *shapes[""])
        else:
            params[name] = {}
            for pname, shp in shapes.items():
                key, sub = jax.random.split(key)
                params[name][pname] = _init_bconv(sub, *shp)
    return params


def apply(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, 299, 299, 3) in [-1, 1] -> (N, 2048) pooled features."""
    h = _bconv(params["Conv2d_1a_3x3"], x, stride=2)
    h = _bconv(params["Conv2d_2a_3x3"], h)
    h = _bconv(params["Conv2d_2b_3x3"], h, padding=1)
    h = _maxpool3s2(h)
    h = _bconv(params["Conv2d_3b_1x1"], h)
    h = _bconv(params["Conv2d_4a_3x3"], h)
    h = _maxpool3s2(h)
    blocks = {"A": _inception_a, "B": _inception_b, "C": _inception_c,
              "D": _inception_d, "E": _inception_e}
    for name, kind, _ in _spec()[5:]:
        h = blocks[kind](params[name], h)
    return jnp.mean(h, axis=(1, 2))  # adaptive avg pool -> (N, 2048)


def prepare_images(images: jax.Array) -> jax.Array:
    """(N, H, W, 1|3) in [-1, 1] -> (N, 299, 299, 3), matching the reference's
    channel-replicate + bilinear(align_corners=False) resize (metrics.py:33-46)."""
    if images.shape[-1] == 1:
        images = jnp.repeat(images, 3, axis=-1)
    if images.shape[1] != 299 or images.shape[2] != 299:
        images = jax.image.resize(
            images, (images.shape[0], 299, 299, 3), method="bilinear")
    return images


def convert_torch_state_dict(sd: Dict) -> Dict:
    """Map a torchvision inception_v3 state dict (tensor-like values exposing
    .numpy() or numpy arrays) into this module's parameter tree."""
    import numpy as np

    def get(name):
        v = sd[name]
        return jnp.asarray(v.numpy() if hasattr(v, "numpy") else np.asarray(v))

    def bconv(prefix):
        return {
            "w": jnp.transpose(get(f"{prefix}.conv.weight"), (2, 3, 1, 0)),
            "scale": get(f"{prefix}.bn.weight"),
            "offset": get(f"{prefix}.bn.bias"),
            "mean": get(f"{prefix}.bn.running_mean"),
            "var": get(f"{prefix}.bn.running_var"),
        }

    tv_names = {  # ours -> torchvision branch names
        "b1x1": "branch1x1", "b5x5_1": "branch5x5_1", "b5x5_2": "branch5x5_2",
        "b3x3dbl_1": "branch3x3dbl_1", "b3x3dbl_2": "branch3x3dbl_2",
        "b3x3dbl_3": "branch3x3dbl_3", "b3x3dbl_3a": "branch3x3dbl_3a",
        "b3x3dbl_3b": "branch3x3dbl_3b", "bpool": "branch_pool",
        "b3x3": "branch3x3", "b3x3_1": "branch3x3_1", "b3x3_2": "branch3x3_2",
        "b3x3_2a": "branch3x3_2a", "b3x3_2b": "branch3x3_2b",
        "b7x7_1": "branch7x7_1", "b7x7_2": "branch7x7_2", "b7x7_3": "branch7x7_3",
        "b7x7dbl_1": "branch7x7dbl_1", "b7x7dbl_2": "branch7x7dbl_2",
        "b7x7dbl_3": "branch7x7dbl_3", "b7x7dbl_4": "branch7x7dbl_4",
        "b7x7dbl_5": "branch7x7dbl_5",
        "b7x7x3_1": "branch7x7x3_1", "b7x7x3_2": "branch7x7x3_2",
        "b7x7x3_3": "branch7x7x3_3", "b7x7x3_4": "branch7x7x3_4",
    }
    params: Dict = {}
    for name, _, shapes in _spec():
        if "" in shapes:
            params[name] = bconv(name)
        else:
            params[name] = {p: bconv(f"{name}.{tv_names[p]}") for p in shapes}
    return params
