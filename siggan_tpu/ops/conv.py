"""Convolution primitives, NHWC/HWIO layout, MXU-friendly.

These are thin, explicit wrappers over ``lax.conv_general_dilated`` so every
model in the framework shares one conv implementation (and one place to swap
in Pallas kernels). All activations are NHWC and all kernels HWIO — the
layouts XLA:TPU tiles best.

Mixed precision: with ``compute_dtype=None`` (f32 inputs) we request f32
accumulation explicitly. With ``compute_dtype=bfloat16`` the op runs and
returns bf16 — the MXU still accumulates partial products in f32 internally
and rounds once on output, and requesting an f32 *output* from bf16 operands
breaks the conv VJP (the transpose rule would see a bf16 operand with an f32
cotangent). BatchNorm re-normalizes in f32 right after each conv, and losses
are always f32, so the single bf16 rounding per conv is benign.

Semantics parity notes (checked numerically against torch-CPU in
``tests/test_torch_parity.py``):
 - ``conv2d(stride=s, padding=p)`` == ``torch.nn.Conv2d(k, s, p)``.
 - ``conv_transpose2d(stride=s, padding=p)`` == ``torch.nn.ConvTranspose2d``:
   expressed as an input-dilated *forward* convolution (lhs_dilation=s,
   per-side pad k-1-p) with a spatially-flipped kernel. On TPU this lowers to
   plain convs that XLA can tile onto the MXU — transposed-conv-as-such does
   not exist in the HLO.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    compute_dtype=None,
) -> jax.Array:
    """Standard 2-D convolution. x: (N,H,W,Ci), w: (kh,kw,Ci,Co)."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    acc = jnp.float32 if compute_dtype is None else jnp.dtype(compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=dn,
        preferred_element_type=acc,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int | Tuple[int, int] = 2,
    padding: int | Tuple[int, int] = 1,
    compute_dtype=None,
) -> jax.Array:
    """Transposed convolution with PyTorch ConvTranspose2d semantics.

    x: (N,H,W,Ci); w: (kh,kw,Ci,Co) stored UNFLIPPED in our convention — the
    spatial flip that makes input-dilated conv equal torch's ConvT is applied
    here, once, inside the op. Output spatial size = H*s for k=4,s=2,p=1.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = w.shape[0], w.shape[1]
    acc = jnp.float32 if compute_dtype is None else jnp.dtype(compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    w_flip = w[::-1, ::-1, :, :]
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=dn,
        preferred_element_type=acc,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_s2p1_phase_dgrad(compute_dtype=None):
    """Build a ``conv2d(x, w, b, stride=2, padding=1)`` (k=4) whose INPUT
    gradient is computed by 2x2 output-phase decomposition instead of the
    autodiff transpose rule.

    The autodiff dx of a stride-2 conv is a convolution over the 2x
    input-dilated cotangent: every MXU contraction spends half its spatial
    taps multiplying structural zeros. xprof on the G-step's b64 backward
    through the discriminator (TPU v5e, 64px) shows that dgrad at
    ~90 GF/s vs 140-180 GF/s for its dense neighbours. Each output phase
    (pr, pc) of dx touches exactly a 2x2 window of dy with a fixed 2x2
    sub-kernel (per axis, p=1 so tap k maps output u = 2i + k - 1):

        dx[2t]   = dy[t-1] w[3] + dy[t]   w[1]
        dx[2t+1] = dy[t]   w[2] + dy[t+1] w[0]

    i.e. four dense (2,2,Co,Cin) convolutions over dy — zero wasted MACs,
    Co-dense MXU contraction — followed by a 2x2 channel-to-space
    interleave. dw/db keep the standard VJP. Same math as the plain conv
    VJP up to fp reassociation (exactness: tests/test_packed.py).
    """
    # Per-axis phase spec: kernel taps (window offsets 0,1) and (lo, hi)
    # padding of dy. Phase 0 reads dy[t-1..t], phase 1 reads dy[t..t+1].
    taps = {0: ([3, 1], (1, 0)), 1: ([2, 0], (0, 1))}

    @jax.custom_vjp
    def conv(x, w, b):
        return conv2d(x, w, b, stride=2, padding=1,
                      compute_dtype=compute_dtype)

    def fwd(x, w, b):
        return conv(x, w, b), (x, w)

    def bwd(res, dy):
        x, w = res
        kh, kw, cin, co = w.shape
        acc = jnp.float32 if compute_dtype is None else jnp.dtype(compute_dtype)
        dyc = dy if compute_dtype is None else dy.astype(compute_dtype)
        wt = jnp.transpose(
            w if compute_dtype is None else w.astype(compute_dtype),
            (0, 1, 3, 2))                          # (kh, kw, Co, Cin)
        phases = []
        for pr in (0, 1):
            rtap, rpad = taps[pr]
            for pc in (0, 1):
                ctap, cpad = taps[pc]
                wp = jnp.stack([jnp.stack([wt[a, b] for b in ctap], 0)
                                for a in rtap], 0)  # (2, 2, Co, Cin)
                dn = lax.conv_dimension_numbers(
                    dyc.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
                phases.append(lax.conv_general_dilated(
                    dyc, wp, (1, 1), (rpad, cpad), dimension_numbers=dn,
                    preferred_element_type=acc))
        ph = jnp.concatenate(phases, -1)            # planar (2pr + pc) * Cin
        n, h2, w2, _ = ph.shape
        dx = (ph.reshape(n, h2, w2, 2, 2, cin)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(n, 2 * h2, 2 * w2, cin).astype(x.dtype))
        dw = jax.vjp(lambda w_: conv2d(x, w_, None, stride=2, padding=1,
                                       compute_dtype=compute_dtype), w
                     )[1](dy)[0]
        db = jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
        return dx, dw, db

    conv.defvjp(fwd, bwd)
    return conv


def convt_adjoint_dgrad(stride: int = 2, padding: int = 1, compute_dtype=None):
    """Build a ``conv_transpose2d(x, w, stride, padding)`` (no bias) whose
    backward is written in adjoint form instead of the autodiff transpose
    rule.

    Motivation (TPU v5e xprof, 64px/b64 train step): autodiff through the
    input-dilated forward leaves XLA a weight-gradient convolution whose
    kernel operand must be spatially reversed, and TPU convolutions have no
    window-reversal — the algebraic simplifier then materializes
    ``reverse(dy)`` over the full activation cotangent (7.0 + 1.8 us/step on
    the two packed generator blocks) plus a separate un-fusable ``add_any``
    pass feeding it. The adjoint identities need no reversal at all:

      ``convT(., w)`` is by definition the transpose of the strided
      correlation ``conv2d(., w_swap, stride, padding)`` with
      ``w_swap = transpose(w, (0,1,3,2))`` — so

        dx = conv2d(dy, w_swap, stride, padding)        (plain strided conv)
        dw = transpose(wgrad of that same strided conv   (reversal-free
             at lhs=dy with cotangent x, channels        strided wgrad)
             swapped back)

    Same math as the plain VJP up to fp reassociation (exactness:
    tests/test_packed.py). Spatial flips cancel: the forward's kernel flip
    (conv.py:92) never enters the backward.

    custom_vjp makes the op reverse-mode-only: jvp (forward-mode) raises
    when the knob is on — same constraint as g_final_cvjp/d_dgrad_phases.
    Keep it off in any future jvp-based path (e.g. forward-over-reverse
    penalties).
    """

    @jax.custom_vjp
    def convt(x, w):
        return conv_transpose2d(x, w, None, stride=stride, padding=padding,
                                compute_dtype=compute_dtype)

    def fwd(x, w):
        return convt(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        w_swap = jnp.transpose(w, (0, 1, 3, 2))     # (kh, kw, Co, Ci)
        dyc = dy if compute_dtype is None else dy.astype(compute_dtype)
        # ONE strided conv serves both gradients: its primal value IS dx,
        # and dw is its rhs-cotangent (no lhs_dilation in that graph => no
        # window reversal anywhere). Structuring the vjp around the dx conv
        # (instead of a second identical conv XLA would have to CSE away)
        # makes the single-conv backward true by construction.
        dx_p, vjp = jax.vjp(
            lambda ws: conv2d(dyc, ws, None, stride=stride, padding=padding,
                              compute_dtype=compute_dtype), w_swap)
        dx = dx_p.astype(x.dtype)
        # Cotangent dtype must match the conv output dtype.
        dw = jnp.transpose(vjp(x.astype(dx_p.dtype))[0], (0, 1, 3, 2))
        return dx, dw

    convt.defvjp(fwd, bwd)
    return convt


def linear(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    compute_dtype=None,
) -> jax.Array:
    """x: (N, Fin), w: (Fin, Fout)."""
    acc = jnp.float32 if compute_dtype is None else jnp.dtype(compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=acc)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
