"""Siamese signature-verification network as pure functions.

Parity with ``signature_verifier_train.py:23-214`` (defined there and
duplicated verbatim in ``signature_verifier_eval.py:39-179`` — unified here,
once): a CNN encoder (3x [conv + BN + relu + maxpool2] -> FC 512 -> dropout
-> FC -> L2-normalized embedding, default 128-d) used as weight-shared twins,
with a classifier MLP over |emb1 - emb2| producing a similarity score. We
return LOGITS; the sigmoid lives in the loss / score conversion.

Contrastive loss matches the reference's CODE (not its docstring, which has
the labels flipped): label=1 (same) pulls D^2, label=0 (different) pushes
max(0, margin - D)^2, margin 2.0.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from siggan_tpu.ops import initializers as init
from siggan_tpu.ops.conv import conv2d, linear
from siggan_tpu.ops.norm import batch_norm, init_state as bn_init
from siggan_tpu.ops.regularizers import dropout

EMBEDDING_DIM = 128

_CONVS = [  # (k, cin, cout, pad)
    (5, 1, 32, 2),
    (5, 32, 64, 2),
    (3, 64, 128, 1),
]


def _kaiming_uniform(key, shape, fan_in):
    """torch's default Conv2d/Linear init (kaiming_uniform, a=sqrt(5)) —
    bound = 1/sqrt(fan_in)."""
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_fn(key: jax.Array, embedding_dim: int = EMBEDDING_DIM
            ) -> Tuple[Dict, Dict]:
    keys = jax.random.split(key, 16)
    params: Dict = {"conv": [], "bn": []}
    state: Dict = {"bn": []}
    ki = 0
    for k, cin, cout, _ in _CONVS:
        params["conv"].append({
            "w": _kaiming_uniform(keys[ki], (k, k, cin, cout), k * k * cin),
            "b": _kaiming_uniform(keys[ki + 1], (cout,), k * k * cin),
        })
        params["bn"].append({"scale": jnp.ones((cout,)),
                             "offset": jnp.zeros((cout,))})
        state["bn"].append(bn_init(cout))
        ki += 2
    params["fc1"] = {"w": _kaiming_uniform(keys[ki], (128 * 8 * 8, 512), 128 * 64),
                     "b": _kaiming_uniform(keys[ki + 1], (512,), 128 * 64)}
    params["fc2"] = {"w": _kaiming_uniform(keys[ki + 2], (512, embedding_dim), 512),
                     "b": _kaiming_uniform(keys[ki + 3], (embedding_dim,), 512)}
    params["cls1"] = {"w": _kaiming_uniform(keys[ki + 4], (embedding_dim, 64), embedding_dim),
                      "b": _kaiming_uniform(keys[ki + 5], (64,), embedding_dim)}
    params["cls2"] = {"w": _kaiming_uniform(keys[ki + 6], (64, 1), 64),
                      "b": _kaiming_uniform(keys[ki + 7], (1,), 64)}
    return params, state


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID")


def encode(params: Dict, state: Dict, x: jax.Array, *, train: bool,
           rng: jax.Array | None = None,
           return_hidden: bool = False) -> Tuple[jax.Array, Dict]:
    """x: (N, 64, 64, 1) -> L2-normalized (N, embedding_dim).

    ``return_hidden=True`` returns the 512-d relu(fc1) activations instead —
    the domain-trained feature space used as an in-environment FID backbone
    (eval/fid.py ``make_scorer("verifier:...")``; the role torchvision
    InceptionV3 features play in the reference, utils/metrics.py:23-46).
    """
    new_state: Dict = {"bn": []}
    h = x
    for i, (k, cin, cout, pad) in enumerate(_CONVS):
        h = conv2d(h, params["conv"][i]["w"], params["conv"][i]["b"],
                   stride=1, padding=pad)
        h, bs = batch_norm(h, params["bn"][i]["scale"],
                           params["bn"][i]["offset"], state["bn"][i],
                           train=train)
        new_state["bn"].append(bs)
        h = _maxpool2(jax.nn.relu(h))
    h = jnp.reshape(h, (h.shape[0], -1))
    h = jax.nn.relu(linear(h, params["fc1"]["w"], params["fc1"]["b"]))
    if return_hidden:
        return h, new_state
    if train:
        if rng is None:
            raise ValueError("encoder dropout needs an rng in train mode")
        h = dropout(h, 0.5, rng, train=True)
    emb = linear(h, params["fc2"]["w"], params["fc2"]["b"])
    return emb / (jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-12), new_state


def apply_fn(params: Dict, state: Dict, x1: jax.Array, x2: jax.Array, *,
             train: bool, rng: jax.Array | None = None
             ) -> Tuple[jax.Array, jax.Array, jax.Array, Dict]:
    """Pair forward: (emb1, emb2, similarity_logits (N,1), new_state).

    Both twins share weights AND BatchNorm statistics; like the torch modules,
    the second twin's forward updates the running stats after the first.
    """
    if train:
        if rng is None:
            # Same contract as encode()/discriminator.apply_fn: a silent
            # fixed key would freeze the dropout masks across all steps.
            raise ValueError("train=True requires an rng for dropout")
        r1, r2, r3 = jax.random.split(rng, 3)
    else:
        r1 = r2 = r3 = None
    emb1, state = encode(params, state, x1, train=train, rng=r1)
    emb2, state = encode(params, state, x2, train=train, rng=r2)
    h = jnp.abs(emb1 - emb2)
    h = jax.nn.relu(linear(h, params["cls1"]["w"], params["cls1"]["b"]))
    if train:
        h = dropout(h, 0.3, r3, train=True)
    logits = linear(h, params["cls2"]["w"], params["cls2"]["b"])
    return emb1, emb2, logits, state


def contrastive_loss(emb1: jax.Array, emb2: jax.Array, labels: jax.Array,
                     margin: float = 2.0) -> jax.Array:
    d = jnp.sqrt(jnp.sum(jnp.square(emb1 - emb2), axis=1) + 1e-12)
    loss = (labels * jnp.square(d)
            + (1 - labels) * jnp.square(jnp.maximum(margin - d, 0.0)))
    return jnp.mean(loss)


def param_count(params: Dict) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
