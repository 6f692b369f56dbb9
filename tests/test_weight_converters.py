"""Converter proof-of-correctness fixtures (VERDICT r2 #9).

The InceptionV3/LPIPS weight converters have never touched real torchvision
weights (no egress in this environment). These tests build SYNTHETIC
torch-format state dicts (torchvision naming, OIHW tensors) and prove the
converter + JAX forward reproduce the outputs of an independent torch
implementation of the same documented architecture — so if real weights ever
arrive, the path is pre-verified. Reference usage:
/root/reference/src/utils/metrics.py:23-46 (inception fc->Identity),
:81-115 (lpips alex).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from siggan_tpu.eval import inception, lpips


def _rs(seed):
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# Synthetic torch-format state dicts
# ---------------------------------------------------------------------------

def _bconv_sd(rs, prefix, kh, kw, cin, cout):
    """BasicConv2d entries exactly as torchvision names them."""
    return {
        f"{prefix}.conv.weight": torch.tensor(
            rs.randn(cout, cin, kh, kw).astype(np.float32) * 0.1),
        f"{prefix}.bn.weight": torch.tensor(
            rs.rand(cout).astype(np.float32) + 0.5),
        f"{prefix}.bn.bias": torch.tensor(
            rs.randn(cout).astype(np.float32) * 0.1),
        f"{prefix}.bn.running_mean": torch.tensor(
            rs.randn(cout).astype(np.float32) * 0.1),
        f"{prefix}.bn.running_var": torch.tensor(
            rs.rand(cout).astype(np.float32) + 0.5),
    }


_TV_BRANCH = {  # our branch keys -> torchvision module names (converter map)
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


def _full_inception_sd(seed=0):
    rs = _rs(seed)
    sd = {}
    for name, _, shapes in inception._spec():
        if "" in shapes:
            sd.update(_bconv_sd(rs, name, *shapes[""]))
        else:
            for p, shp in shapes.items():
                sd.update(_bconv_sd(rs, f"{name}.{_TV_BRANCH[p]}", *shp))
    return sd


def _torch_bconv(sd, prefix, x, stride=1, padding=0):
    """Independent torch BasicConv2d: conv(no bias) + BN(eps=1e-3) + relu."""
    y = F.conv2d(x, sd[f"{prefix}.conv.weight"], stride=stride,
                 padding=padding)
    y = F.batch_norm(y, sd[f"{prefix}.bn.running_mean"],
                     sd[f"{prefix}.bn.running_var"],
                     sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
                     training=False, eps=1e-3)
    return F.relu(y)


def _nchw(x_nhwc):
    return torch.tensor(np.moveaxis(np.asarray(x_nhwc), -1, 1))


def _to_nhwc(t):
    return np.moveaxis(t.numpy(), 1, -1)


# ---------------------------------------------------------------------------
# Inception
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_inception_converter_layout_transpose():
    sd = _bconv_sd(_rs(0), "Conv2d_1a_3x3", 3, 3, 3, 32)
    sd.update(_full_inception_sd())
    params = inception.convert_torch_state_dict(sd)
    w = np.asarray(params["Conv2d_1a_3x3"]["w"])
    assert w.shape == (3, 3, 3, 32)  # OIHW -> HWIO
    np.testing.assert_array_equal(
        w, sd["Conv2d_1a_3x3.conv.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["Mixed_5b"]["b5x5_2"]["var"]),
        sd["Mixed_5b.branch5x5_2.bn.running_var"].numpy())


def test_inception_bconv_matches_torch():
    rs = _rs(1)
    sd = _bconv_sd(rs, "c", 3, 3, 4, 8)
    x = rs.randn(2, 9, 9, 4).astype(np.float32)
    ours = inception._bconv(
        {"w": jnp.asarray(sd["c.conv.weight"].numpy().transpose(2, 3, 1, 0)),
         "scale": jnp.asarray(sd["c.bn.weight"].numpy()),
         "offset": jnp.asarray(sd["c.bn.bias"].numpy()),
         "mean": jnp.asarray(sd["c.bn.running_mean"].numpy()),
         "var": jnp.asarray(sd["c.bn.running_var"].numpy())},
        jnp.asarray(x), stride=2, padding=1)
    theirs = _to_nhwc(_torch_bconv(sd, "c", _nchw(x), stride=2, padding=1))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_inception_a_block_matches_torch():
    """Whole InceptionA through the REAL converter vs an independent torch
    composition of torchvision's documented InceptionA structure."""
    rs = _rs(2)
    cin, pool = 16, 8
    shapes = {"b1x1": (1, 1, cin, 64), "b5x5_1": (1, 1, cin, 48),
              "b5x5_2": (5, 5, 48, 64), "b3x3dbl_1": (1, 1, cin, 64),
              "b3x3dbl_2": (3, 3, 64, 96), "b3x3dbl_3": (3, 3, 96, 96),
              "bpool": (1, 1, cin, pool)}
    sd = {}
    for p, shp in shapes.items():
        sd.update(_bconv_sd(rs, f"Mixed_5b.{_TV_BRANCH[p]}", *shp))

    params = {p: {
        "w": jnp.asarray(sd[f"Mixed_5b.{_TV_BRANCH[p]}.conv.weight"].numpy()
                         .transpose(2, 3, 1, 0)),
        "scale": jnp.asarray(sd[f"Mixed_5b.{_TV_BRANCH[p]}.bn.weight"].numpy()),
        "offset": jnp.asarray(sd[f"Mixed_5b.{_TV_BRANCH[p]}.bn.bias"].numpy()),
        "mean": jnp.asarray(
            sd[f"Mixed_5b.{_TV_BRANCH[p]}.bn.running_mean"].numpy()),
        "var": jnp.asarray(
            sd[f"Mixed_5b.{_TV_BRANCH[p]}.bn.running_var"].numpy()),
    } for p in shapes}

    x = rs.randn(2, 13, 13, cin).astype(np.float32)
    ours = np.asarray(inception._inception_a(params, jnp.asarray(x)))

    xt = _nchw(x)
    pre = "Mixed_5b"
    b1 = _torch_bconv(sd, f"{pre}.branch1x1", xt)
    b5 = _torch_bconv(sd, f"{pre}.branch5x5_2",
                      _torch_bconv(sd, f"{pre}.branch5x5_1", xt), padding=2)
    b3 = _torch_bconv(
        sd, f"{pre}.branch3x3dbl_3",
        _torch_bconv(sd, f"{pre}.branch3x3dbl_2",
                     _torch_bconv(sd, f"{pre}.branch3x3dbl_1", xt),
                     padding=1), padding=1)
    bp = _torch_bconv(sd, f"{pre}.branch_pool",
                      F.avg_pool2d(xt, 3, stride=1, padding=1))
    theirs = _to_nhwc(torch.cat([b1, b5, b3, bp], dim=1))
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


@pytest.mark.slow
def test_inception_full_converted_forward_runs():
    """Full synthetic state dict -> converter -> apply(): every branch of
    every block is exercised and the 2048-d features are finite and
    weight-dependent."""
    sd = _full_inception_sd()
    params = inception.convert_torch_state_dict(sd)
    x = jnp.asarray(_rs(3).rand(2, 299, 299, 3).astype(np.float32) * 2 - 1)
    feats = np.asarray(inception.apply(params, x))
    assert feats.shape == (2, inception.FEATURE_DIM)
    assert np.isfinite(feats).all()
    feats_rand = np.asarray(inception.apply(inception.init_params(0), x))
    assert np.abs(feats - feats_rand).max() > 1e-3


# ---------------------------------------------------------------------------
# LPIPS (AlexNet)
# ---------------------------------------------------------------------------

_ALEX_TORCH = [  # (features index, kh, cin, cout, stride, pad, pool_after)
    (0, 11, 3, 64, 4, 2, True),
    (3, 5, 64, 192, 1, 2, True),
    (6, 3, 192, 384, 1, 1, False),
    (8, 3, 384, 256, 1, 1, False),
    (10, 3, 256, 256, 1, 1, False),
]


def _alex_sds(seed=0):
    rs = _rs(seed)
    alex_sd, lin_sd = {}, {}
    for i, (fid, k, cin, cout, _, _, _) in enumerate(_ALEX_TORCH):
        alex_sd[f"features.{fid}.weight"] = torch.tensor(
            (rs.randn(cout, cin, k, k) / np.sqrt(k * k * cin)
             ).astype(np.float32))
        alex_sd[f"features.{fid}.bias"] = torch.tensor(
            rs.randn(cout).astype(np.float32) * 0.05)
        lin_sd[f"lin{i}.model.1.weight"] = torch.tensor(
            rs.rand(1, cout, 1, 1).astype(np.float32))
    return alex_sd, lin_sd


def _torch_lpips(alex_sd, lin_sd, x1, x2):
    """Independent torch LPIPS-alex per richzhang/PerceptualSimilarity:
    scaling layer, relu1..relu5 taps, unit-norm, squared diff, 1x1 lin,
    spatial mean, sum over layers."""
    shift = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    scale = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]

    def feats(x):
        h = (x - shift) / scale
        out = []
        for fid, k, cin, cout, stride, pad, pool in _ALEX_TORCH:
            h = F.relu(F.conv2d(h, alex_sd[f"features.{fid}.weight"],
                                alex_sd[f"features.{fid}.bias"],
                                stride=stride, padding=pad))
            out.append(h)
            if pool:
                h = F.max_pool2d(h, 3, stride=2)
        return out

    total = 0.0
    for i, (f1, f2) in enumerate(zip(feats(x1), feats(x2))):
        n1 = f1 / torch.sqrt((f1 ** 2).sum(dim=1, keepdim=True) + 1e-10)
        n2 = f2 / torch.sqrt((f2 ** 2).sum(dim=1, keepdim=True) + 1e-10)
        d = (n1 - n2) ** 2
        lin = lin_sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, lin).mean(dim=(1, 2, 3))
    return total


@pytest.mark.slow  # full AlexNet build + torch/JAX dual forward (~16 s CPU)
def test_lpips_converter_matches_independent_torch():
    alex_sd, lin_sd = _alex_sds()
    params = lpips.convert_torch_state_dict(alex_sd, lin_sd)
    assert np.asarray(params["convs"][0]["w"]).shape == (11, 11, 3, 64)
    rs = _rs(4)
    x1 = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    x2 = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    ours = np.asarray(lpips.distance(params, jnp.asarray(x1),
                                     jnp.asarray(x2)))
    theirs = _torch_lpips(alex_sd, lin_sd, _nchw(x1), _nchw(x2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-6)
    assert (ours > 0).all()


def test_lpips_distance_zero_for_identical_inputs():
    alex_sd, lin_sd = _alex_sds()
    params = lpips.convert_torch_state_dict(alex_sd, lin_sd)
    x = jnp.asarray(_rs(5).rand(1, 64, 64, 3).astype(np.float32))
    assert float(np.abs(np.asarray(lpips.distance(params, x, x)))) < 1e-6


# ---------------------------------------------------------------------------
# Pinned real-checkpoint manifests (VERDICT r4 #8): the converters are
# tested against the COMPLETE key/shape manifest of the published files
# the reference loads — not just the hand-built fixtures above — so a
# future weight drop is load-and-go.
# ---------------------------------------------------------------------------

from siggan_tpu.eval import manifests  # noqa: E402


def test_inception_manifest_pinned_counts():
    """Tripwires against manifest drift: torchvision inception_v3 has 96
    BasicConv2d modules (5 stem + 3x7 InceptionA + 4 InceptionB + 4x10
    InceptionC + 2 aux convs + 6 InceptionD + 2x9 InceptionE), 6 entries
    each, plus fc/AuxLogits.fc weight+bias = 580 keys; 27.16M params."""
    m = manifests.INCEPTION_V3_SD
    assert len(m) == 580
    convs = [k for k in m if k.endswith(".conv.weight")]
    assert len(convs) == 96
    # Parameter count (weights + biases, excluding BN buffers/counters)
    # must equal torchvision's documented inception_v3 total — an
    # independent cross-check that every shape in the manifest is real.
    n_params = sum(int(np.prod(s)) for k, s in m.items()
                   if not k.endswith("num_batches_tracked")
                   and "running_" not in k)
    assert n_params == 27_161_264
    # The extractor-required subset: 94 convs (aux stripped), 5 tensors each.
    req = manifests.INCEPTION_V3_REQUIRED
    assert len(req) == 94 * 5
    assert not any(k.startswith(("AuxLogits.", "fc.")) for k in req)


def test_inception_manifest_matches_spec():
    """Every conv the JAX forward declares (inception._spec) exists in the
    manifest with the transposed shape — catches typos on either side."""
    tv = {  # ours -> torchvision branch names (mirror of the converter map)
        "b1x1": "branch1x1", "b5x5_1": "branch5x5_1", "b5x5_2": "branch5x5_2",
        "b3x3dbl_1": "branch3x3dbl_1", "b3x3dbl_2": "branch3x3dbl_2",
        "b3x3dbl_3": "branch3x3dbl_3", "b3x3dbl_3a": "branch3x3dbl_3a",
        "b3x3dbl_3b": "branch3x3dbl_3b", "bpool": "branch_pool",
        "b3x3": "branch3x3", "b3x3_1": "branch3x3_1", "b3x3_2": "branch3x3_2",
        "b3x3_2a": "branch3x3_2a", "b3x3_2b": "branch3x3_2b",
        "b7x7_1": "branch7x7_1", "b7x7_2": "branch7x7_2",
        "b7x7_3": "branch7x7_3",
        "b7x7dbl_1": "branch7x7dbl_1", "b7x7dbl_2": "branch7x7dbl_2",
        "b7x7dbl_3": "branch7x7dbl_3", "b7x7dbl_4": "branch7x7dbl_4",
        "b7x7dbl_5": "branch7x7dbl_5",
        "b7x7x3_1": "branch7x7x3_1", "b7x7x3_2": "branch7x7x3_2",
        "b7x7x3_3": "branch7x7x3_3", "b7x7x3_4": "branch7x7x3_4",
    }
    m = manifests.INCEPTION_V3_SD
    n_checked = 0
    for name, _, shapes in inception._spec():
        for pname, (kh, kw, cin, cout) in shapes.items():
            key = (f"{name}.conv.weight" if pname == ""
                   else f"{name}.{tv[pname]}.conv.weight")
            assert m[key] == (cout, cin, kh, kw), (key, m[key])
            assert m[key.replace("conv.weight", "bn.running_var")] == (cout,)
            n_checked += 1
    assert n_checked == 94


def test_inception_converter_consumes_exact_manifest():
    """The converter, fed a synthetic sd with EXACTLY the published file's
    keys/shapes, must (a) succeed, (b) read every required key and nothing
    outside the manifest, (c) ignore the aux/fc heads and BN counters."""
    sd = manifests.synthetic_state_dict(manifests.INCEPTION_V3_SD, seed=10)
    read = set()

    class Tracking(dict):
        def __getitem__(self, k):
            read.add(k)
            return super().__getitem__(k)

    params = inception.convert_torch_state_dict(Tracking(sd))
    assert read == set(manifests.INCEPTION_V3_REQUIRED)
    # Values land unchanged (weights transposed OIHW->HWIO, BN verbatim).
    w = np.asarray(params["Mixed_7c"]["b3x3dbl_2"]["w"])
    np.testing.assert_array_equal(
        w, sd["Mixed_7c.branch3x3dbl_2.conv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["Mixed_6e"]["b7x7dbl_5"]["mean"]),
        sd["Mixed_6e.branch7x7dbl_5.bn.running_mean"])
    # And the converted tree drives the forward.
    x = jnp.asarray(_rs(6).rand(1, 75, 75, 3).astype(np.float32) * 2 - 1)
    feats = np.asarray(inception.apply(params, inception.prepare_images(x)))
    assert feats.shape == (1, inception.FEATURE_DIM)
    assert np.isfinite(feats).all()


def test_check_state_dict_diffs():
    m = manifests.INCEPTION_V3_SD
    req = manifests.INCEPTION_V3_REQUIRED
    sd = manifests.synthetic_state_dict(m, seed=11)
    manifests.check_state_dict(sd, m, required=req)  # full file: ok
    # fc/aux-stripped export: still ok (reference strips fc, metrics.py:29).
    trimmed = {k: v for k, v in sd.items()
               if not k.startswith(("AuxLogits.", "fc."))}
    manifests.check_state_dict(trimmed, m, required=req)
    # A required key missing -> loud, readable error.
    broken = dict(sd)
    del broken["Mixed_5b.branch1x1.conv.weight"]
    with pytest.raises(ValueError, match="required keys missing"):
        manifests.check_state_dict(broken, m, required=req)
    # A wrong shape (e.g. a different model's fc) -> loud error.
    wrong = dict(sd)
    wrong["Conv2d_1a_3x3.conv.weight"] = np.zeros((32, 1, 3, 3), np.float32)
    with pytest.raises(ValueError, match="wrong shapes"):
        manifests.check_state_dict(wrong, m, required=req)


def test_lpips_manifests_and_converter():
    """AlexNet + LPIPS-lin manifests: pinned counts, converter consumes the
    features.* subset, tolerates the classifier keys in the real file, and
    the lin tap widths are the published relu1..5 channel widths."""
    am, lm = manifests.ALEXNET_SD, manifests.LPIPS_ALEX_LIN_SD
    assert len(am) == 16 and len(lm) == 5
    n_params = sum(int(np.prod(s)) for s in am.values())
    assert n_params == 61_100_840  # torchvision alexnet total
    assert [s[1] for s in lm.values()] == [64, 192, 384, 256, 256]
    alex_sd = manifests.synthetic_state_dict(am, seed=12)
    lin_sd = manifests.synthetic_state_dict(lm, seed=13)
    params = lpips.convert_torch_state_dict(alex_sd, lin_sd)
    for p, (k, cin, cout, _, _, _) in zip(params["convs"], lpips._ALEX):
        assert np.asarray(p["w"]).shape == (k, k, cin, cout)
    for lin, (_, c, _, _) in zip(params["lins"], lm.values()):
        assert np.asarray(lin).shape == (c,)
        assert (np.asarray(lin) >= 0).all()  # synthetic keeps lins valid
    x = jnp.asarray(_rs(7).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d = np.asarray(lpips.distance(params, x, x[::-1]))
    assert d.shape == (2,) and np.isfinite(d).all()


def test_make_scorer_rejects_wrong_checkpoint(tmp_path):
    """fid.make_scorer('torchvision:<path>') fails loudly (manifest diff,
    not a deep KeyError) when the dropped file is the wrong model."""
    import torch as _torch
    from siggan_tpu.eval.fid import make_scorer
    bad = {"features.0.weight": _torch.zeros(64, 3, 11, 11)}  # alexnet-ish
    p = tmp_path / "wrong_model.pt"
    _torch.save(bad, p)
    with pytest.raises(ValueError, match="required keys missing"):
        make_scorer(f"torchvision:{p}")


def test_verify_file_sha256(tmp_path):
    p = tmp_path / "w.pth"
    p.write_bytes(b"not really weights")
    import hashlib
    prefix = hashlib.sha256(p.read_bytes()).hexdigest()[:8]
    assert manifests.verify_file_sha256(p, prefix)
    assert manifests.verify_file_sha256(p, prefix.upper())
    assert not manifests.verify_file_sha256(p, "00000000")
