"""Space-to-depth packed training I/O must be EXACTLY the canonical math
(ops/packed.py): the embedded kernels are pure re-indexings of the canonical
weights, so packed and pixel-space graphs may differ only by float
reassociation inside the convs."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.models import discriminator, generator
from siggan_tpu.ops.conv import conv2d
from siggan_tpu.ops.packed import (depth_to_space, depth_to_space4,
                                   pack_final_conv_kernel,
                                   pack_first_conv_kernel, space_to_depth,
                                   space_to_depth4)


def test_space_to_depth_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 1, dtype=jnp.float32).reshape(2, 8, 8, 1)
    p = space_to_depth(x)
    assert p.shape == (2, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(depth_to_space(p)), np.asarray(x))


def test_packed_final_conv_equals_s2d_of_conv():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 8, 1).astype(np.float32))
    b = jnp.asarray(rs.randn(1).astype(np.float32))
    ref = space_to_depth(conv2d(x, w, b, stride=1, padding=1))
    got = conv2d(x, pack_final_conv_kernel(w), jnp.broadcast_to(b, (4,)),
                 stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_first_conv_equals_conv_of_pixels():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 16, 16, 1).astype(np.float32))
    w = jnp.asarray(rs.randn(4, 4, 1, 8).astype(np.float32))
    b = jnp.asarray(rs.randn(8).astype(np.float32))
    ref = conv2d(x, w, b, stride=2, padding=1)
    got = conv2d(space_to_depth(x), pack_first_conv_kernel(w), b,
                 stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_generator_packed_output_matches():
    cfg = ModelConfig(image_size=64, base_features=32)
    params, state = generator.init_fn(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (4, cfg.latent_dim))
    img, _ = generator.apply_fn(params, state, z, cfg, train=True)
    packed, _ = generator.apply_fn(params, state, z, cfg, train=True,
                                   packed_output=True)
    np.testing.assert_allclose(np.asarray(depth_to_space(packed)),
                               np.asarray(img), rtol=1e-5, atol=1e-5)


def test_discriminator_packed_input_matches():
    cfg = ModelConfig(image_size=64, base_features=32, use_spectral_norm=True)
    params, state = discriminator.init_fn(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (4, 64, 64, 1), minval=-1,
                           maxval=1)
    ref, st_a = discriminator.apply_fn(params, state, x, cfg, train=False)
    got, st_b = discriminator.apply_fn(params, state, space_to_depth(x), cfg,
                                       train=False, packed_input=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # spectral-norm power iteration advanced identically (canonical weights)
    for a, b in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_train_step_packed_equals_pixel_space():
    """Full fused step: packed_io on vs off must produce the same losses,
    params, and BN state (f32, CPU) up to conv reassociation noise."""
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_train_step

    base = TrainConfig(
        model=ModelConfig(image_size=64, base_features=32),
        batch_size=8, compute_dtype=None, augment=False)
    rs = np.random.RandomState(0)
    batch = jnp.asarray((rs.rand(8, 64, 64, 1) * 2 - 1).astype(np.float32))

    outs = {}
    for packed in (False, True):
        cfg = dataclasses.replace(base, packed_io=packed)
        state = create_train_state(cfg)
        step = jax.jit(make_train_step(cfg))
        for _ in range(3):
            state, metrics = step(state, batch)
        outs[packed] = (state, metrics)

    for key in ("d_loss", "g_loss", "d_real_mean", "d_fake_mean"):
        np.testing.assert_allclose(float(outs[False][1][key]),
                                   float(outs[True][1][key]),
                                   rtol=2e-4, atol=2e-4)
    ref_leaves = jax.tree_util.tree_leaves(outs[False][0].g_params)
    got_leaves = jax.tree_util.tree_leaves(outs[True][0].g_params)
    for a, b in zip(ref_leaves, got_leaves):
        # Drift bound, not an exactness proof: f32 reassociation noise
        # (packed convs AND the pack backward accumulate in a different
        # association than the pixel path) passes through Adam's
        # m/(sqrt(v)+eps) three times, which is sign-like (unboundedly
        # steep) for weights whose v is still ~0 — a handful of elements
        # land at ~5e-4 absolute while the bulk agree to 1e-6.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_generator_packed_tail_128px_matches():
    """The deep packed tail (entry / interior / final embeddings) at 128px."""
    cfg = ModelConfig(image_size=128, base_features=32)
    params, state = generator.init_fn(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (2, cfg.latent_dim))
    img, st_a = generator.apply_fn(params, state, z, cfg, train=True)
    packed, st_b = generator.apply_fn(params, state, z, cfg, train=True,
                                      packed_output=True)
    np.testing.assert_allclose(np.asarray(depth_to_space(packed)),
                               np.asarray(img), rtol=1e-5, atol=1e-5)
    # BN running stats must agree between the two layouts too.
    for a, b in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # compile-heavy gradient-equivalence proof (~18 s CPU)
def test_generator_packed_tail_gradients_match():
    """Gradients w.r.t. canonical params must be identical through the
    packed-tail embeddings (they are linear re-indexings)."""
    cfg = ModelConfig(image_size=64, base_features=32)
    params, state = generator.init_fn(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (4, cfg.latent_dim))

    def loss(p, packed):
        img, _ = generator.apply_fn(p, state, z, cfg, train=True,
                                    packed_output=packed)
        img = depth_to_space(img) if packed else img
        return jnp.sum(jnp.sin(img * 3.0))

    g_pix = jax.grad(lambda p: loss(p, False))(params)
    g_pack = jax.grad(lambda p: loss(p, True))(params)
    # rtol covers f32 reassociation: the packed backward accumulates weight
    # grads in a different conv grouping than the pixel-space backward.
    for a, b in zip(jax.tree_util.tree_leaves(g_pix),
                    jax.tree_util.tree_leaves(g_pack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)


def test_conv_s2p1_phase_dgrad_matches_autodiff():
    """The 2x2 phase-decomposed input gradient of a stride-2 k=4 conv must
    equal the plain conv VJP (up to fp reassociation)."""
    from siggan_tpu.ops.conv import conv2d, conv_s2p1_phase_dgrad

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 16, 6).astype(np.float32))
    w = jnp.asarray(rs.randn(4, 4, 6, 10).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(10).astype(np.float32) * 0.1)

    def loss(fn):
        return lambda x_, w_, b_: jnp.sum(jnp.sin(fn(x_, w_, b_) * 2.0))

    ref = jax.grad(loss(lambda *a: conv2d(
        *a, stride=2, padding=1)), argnums=(0, 1, 2))(x, w, b)
    got = jax.grad(loss(conv_s2p1_phase_dgrad()), argnums=(0, 1, 2))(x, w, b)
    for a, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_conv3s1p1_matmul_both_matches_autodiff():
    """Merged-tap matmul FORWARD + matmul dgrad must equal the plain conv
    and its VJP (up to fp reassociation)."""
    from siggan_tpu.ops.conv import conv2d
    from siggan_tpu.ops.packed import conv3s1p1_matmul_both

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 12, 12, 4).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 4, 24).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(24).astype(np.float32) * 0.1)

    y_ref = conv2d(x, w, b, stride=1, padding=1)
    y = conv3s1p1_matmul_both()(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a) * 2.0))

    ref = jax.grad(loss(lambda *a: conv2d(*a, stride=1, padding=1)),
                   argnums=(0, 1, 2))(x, w, b)
    got = jax.grad(loss(conv3s1p1_matmul_both()), argnums=(0, 1, 2))(x, w, b)
    for a, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_conv3_mc_as_matmul_cvjp_matches_autodiff():
    """The hand-written merged-tap backward of the matmul-form final conv
    must equal autodiff on conv3_mc_as_matmul (and the plain conv VJP),
    up to fp reassociation."""
    from siggan_tpu.ops.conv import conv2d
    from siggan_tpu.ops.packed import conv3_mc_as_matmul, conv3_mc_as_matmul_cvjp

    rs = np.random.RandomState(2)
    h = jnp.asarray(rs.randn(2, 10, 10, 16).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 16, 4).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(4).astype(np.float32) * 0.1)

    y_ref = conv2d(h, w, b, stride=1, padding=1)
    y = conv3_mc_as_matmul_cvjp()(h, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a) * 2.0))

    ref = jax.grad(loss(lambda h_, w_, b_: conv3_mc_as_matmul(h_, w_, b_)),
                   argnums=(0, 1, 2))(h, w, b)
    got = jax.grad(loss(conv3_mc_as_matmul_cvjp()), argnums=(0, 1, 2))(h, w, b)
    for a, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_generator_rewrite_flags_default_on():
    """Fast-lane guard: every graph-rewrite knob the gradient-equivalence
    proof below covers is default-ON (a silent default flip once turned
    the g_pack_pallas test into an on-vs-on no-op — round 3b/4)."""
    cfg = ModelConfig()
    for flag in ("g_final_cvjp", "g_pack_pallas", "g_convt_cvjp"):
        assert getattr(cfg, flag), flag


@pytest.mark.slow  # 4 full-G backward compiles, ~40 s on the 1-core host
def test_generator_rewrite_flags_gradients_match():
    """All default-ON generator graph-rewrite knobs (g_final_cvjp,
    g_pack_pallas, g_convt_cvjp) must produce the identical packed-tail
    forward and full-G backward as their canonical (flag-off)
    constructions.  One shared all-flags-off baseline + one variant per
    knob keeps this at 4 forward + 4 backward compiles (the three
    separate-baseline tests it replaces compiled 12 at 2x the channel
    width — 63 s of the old fast lane); the knobs are independent
    code paths, so knob-vs-off equals the old pairwise comparisons."""
    from siggan_tpu.models import generator

    cfg_on = ModelConfig(image_size=64, base_features=16)
    # Guard: every knob is default-ON (a silent default flip would turn
    # this into an on-vs-on no-op — that happened to g_pack_pallas's test
    # between round 3b and round 4).
    for flag in ("g_final_cvjp", "g_pack_pallas", "g_convt_cvjp"):
        assert getattr(cfg_on, flag), flag
    cfg_off = dataclasses.replace(cfg_on, g_final_cvjp=False,
                                  g_pack_pallas=False, g_convt_cvjp=False)
    params, state = generator.init_fn(jax.random.key(3), cfg_off)
    z = jnp.asarray(np.random.RandomState(3).randn(4, cfg_off.latent_dim)
                    .astype(np.float32))

    def fwd(cfg):
        img, _ = generator.apply_fn(params, state, z, cfg, train=True,
                                    packed_output=True)
        return img

    def gloss(cfg):
        def f(p):
            img, _ = generator.apply_fn(p, state, z, cfg, train=True,
                                        packed_output=True)
            return jnp.sum(jnp.tanh(img * 0.5))
        return f

    y_off = fwd(cfg_off)
    g_off = jax.grad(gloss(cfg_off))(params)
    tols = {"g_final_cvjp": (1e-4, 1e-5), "g_pack_pallas": (1e-5, 1e-6),
            "g_convt_cvjp": (1e-4, 1e-5)}
    for flag, (rtol, atol) in tols.items():
        cfg = dataclasses.replace(cfg_off, **{flag: True})
        np.testing.assert_allclose(np.asarray(fwd(cfg)), np.asarray(y_off),
                                   rtol=1e-5, atol=1e-5, err_msg=flag)
        g = jax.grad(gloss(cfg))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_off),
                        jax.tree_util.tree_leaves(g)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=rtol, atol=atol, err_msg=flag)


@pytest.mark.parametrize("cdt", [None, "bfloat16"])
def test_convt_adjoint_dgrad_matches_autodiff(cdt):
    """The adjoint-form ConvTranspose backward (plain strided conv dx +
    reversal-free strided wgrad) must equal the autodiff VJP of the
    input-dilated forward (up to fp reassociation). The bf16 arm exercises
    the bwd's cotangent/out-dtype cast plumbing — the deployed train-step
    configuration — on CPU (looser tolerances: bf16 has ~3 decimal digits)."""
    from siggan_tpu.ops.conv import conv_transpose2d, convt_adjoint_dgrad

    rtol, atol = (1e-4, 1e-5) if cdt is None else (5e-2, 5e-2)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rs.randn(4, 4, 6, 10).astype(np.float32) * 0.1)

    y_ref = conv_transpose2d(x, w, stride=2, padding=1, compute_dtype=cdt)
    y = convt_adjoint_dgrad(compute_dtype=cdt)(x, w)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=rtol, atol=atol)
    assert y.dtype == y_ref.dtype

    def loss(fn):
        return lambda x_, w_: jnp.sum(
            jnp.sin(fn(x_, w_).astype(jnp.float32) * 2.0))

    ref = jax.grad(loss(lambda x_, w_: conv_transpose2d(
        x_, w_, stride=2, padding=1, compute_dtype=cdt)),
        argnums=(0, 1))(x, w)
    got = jax.grad(loss(convt_adjoint_dgrad(compute_dtype=cdt)),
                   argnums=(0, 1))(x, w)
    for a, g in zip(ref, got):
        assert g.dtype == a.dtype
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.slow
def test_d_dgrad_phases_flag_full_backward_matches():
    """Through the discriminator flag: full D backward identical (two extra
    full-D grad compiles — slow lane; the op itself is covered fast)."""
    from siggan_tpu.models import discriminator

    rs = np.random.RandomState(0)
    cfg_a = ModelConfig(image_size=64, base_features=32, dropout=0.0)
    cfg_b = dataclasses.replace(cfg_a, d_dgrad_phases=True)
    params, state = discriminator.init_fn(jax.random.key(0), cfg_a)
    img = jnp.asarray(rs.randn(4, 64, 64, 1).astype(np.float32))

    def dloss(cfg):
        def f(p, x_):
            out, _ = discriminator.apply_fn(p, state, x_, cfg, train=True)
            return jnp.sum(jax.nn.sigmoid(out))
        return f

    ga = jax.grad(dloss(cfg_a), argnums=(0, 1))(params, img)
    gb = jax.grad(dloss(cfg_b), argnums=(0, 1))(params, img)
    for a, g in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_p4_boundary_embeddings_exact():
    """4x4 image-packing embeddings (kept as a measured dead end — the
    boundary rewrite benched SLOWER end-to-end, see BASELINE.md — but the
    re-indexings themselves are exact)."""
    from siggan_tpu.ops.conv import conv_transpose2d
    from siggan_tpu.ops.packed import (depth_to_space4, pack_conv_p2_in,
                                       pack_final_conv_p4,
                                       pack_first_conv_p4,
                                       pack_first_conv_p4_pixel,
                                       space_to_depth4, space_to_depth_mc)

    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(2, 16, 16, 1).astype(np.float32))
    assert np.allclose(depth_to_space4(space_to_depth4(img)), img)

    act = jnp.asarray(rs.randn(2, 16, 16, 6).astype(np.float32))
    w3 = jnp.asarray(rs.randn(3, 3, 6, 1).astype(np.float32))
    ref = space_to_depth4(conv2d(act, w3, stride=1, padding=1))
    got = conv2d(space_to_depth_mc(act), pack_final_conv_p4(w3),
                 stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    w4 = jnp.asarray(rs.randn(4, 4, 1, 5).astype(np.float32))
    ref = space_to_depth_mc(conv2d(img, w4, stride=2, padding=1))
    got = conv2d(space_to_depth4(img), pack_first_conv_p4(w4),
                 stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    ref = conv2d(img, w4, stride=2, padding=1)
    got = conv_transpose2d(space_to_depth4(img), pack_first_conv_p4_pixel(w4),
                           stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    w42 = jnp.asarray(rs.randn(4, 4, 6, 7).astype(np.float32))
    ref = conv2d(act, w42, stride=2, padding=1)
    got = conv2d(space_to_depth_mc(act), pack_conv_p2_in(w42),
                 stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_pack_by_gather_matches_reference_packers():
    """Record-keeping for the measured dead end (ops/packed.py): the
    constant-index gather reproduces every pack function bit-exactly."""
    import numpy as np

    from siggan_tpu.ops import packed as P

    for fn, shape in [(P.pack_convt_kernel_both_mc, (4, 4, 32, 32)),
                      (P.pack_convt_kernel_out_mc, (4, 4, 64, 32)),
                      (P.pack_conv3_kernel_both_mc, (3, 3, 32, 1)),
                      (P.pack_first_conv_kernel, (4, 4, 1, 64)),
                      (P.pack_final_conv_kernel, (3, 3, 32, 1))]:
        w = jnp.asarray(np.random.RandomState(0).randn(*shape)
                        .astype(np.float32))
        np.testing.assert_array_equal(np.asarray(fn(w)),
                                      np.asarray(P.pack_by_gather(fn, w)))
