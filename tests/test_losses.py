"""Loss function behaviour + oracle checks (NLL vs torch, Lovász vs scalar Alg.1)."""

import numpy as np
import jax.numpy as jnp

from lattice_net_tpu import losses


def _log_probs(rng, n, c):
    x = rng.normal(size=(n, c)).astype(np.float32)
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def test_nll_matches_torch(rng):
    import torch

    lp = _log_probs(rng, 50, 5)
    t = rng.integers(0, 5, size=50)
    t[:7] = 2  # make the ignored class present
    got = float(losses.nll_loss(jnp.asarray(lp), jnp.asarray(t), ignore_index=2))
    want = float(
        torch.nn.NLLLoss(ignore_index=2)(torch.from_numpy(lp), torch.from_numpy(t))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nll_class_weights_match_torch(rng):
    import torch

    lp = _log_probs(rng, 64, 4)
    t = rng.integers(0, 4, size=64)
    w = rng.uniform(0.1, 2.0, size=4).astype(np.float32)
    got = float(
        losses.nll_loss(jnp.asarray(lp), jnp.asarray(t), ignore_index=-1, class_weights=jnp.asarray(w))
    )
    want = float(torch.nn.NLLLoss(weight=torch.from_numpy(w))(torch.from_numpy(lp), torch.from_numpy(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _lovasz_oracle(log_probs, targets, ignore_index):
    """Scalar transcription of Lovász-Softmax Alg.1 (Berman et al. 2018)."""
    probs = np.exp(log_probs)
    n, c = probs.shape
    keep = targets != ignore_index
    probs, targets = probs[keep], targets[keep]
    out = []
    for cl in range(c):
        if cl == ignore_index:
            continue
        gt = (targets == cl).astype(np.float64)
        if gt.sum() == 0:
            continue
        err = np.abs(gt - probs[:, cl])
        order = np.argsort(-err, kind="stable")
        gs = gt[order]
        gts = gs.sum()
        inter = gts - np.cumsum(gs)
        union = gts + np.cumsum(1 - gs)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        out.append(np.dot(err[order], jac))
    return float(np.mean(out))


def test_lovasz_matches_oracle(rng):
    lp = _log_probs(rng, 80, 5)
    t = rng.integers(0, 4, size=80)  # class 4 absent -> skipped
    t[:9] = 3
    got = float(losses.lovasz_softmax(jnp.asarray(lp), jnp.asarray(t), ignore_index=3))
    want = _lovasz_oracle(lp, t, ignore_index=3)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_perfect_prediction_low_loss(rng):
    t = rng.integers(0, 4, size=100)
    lp = np.full((100, 4), -20.0, np.float32)
    lp[np.arange(100), t] = 0.0
    total = float(losses.segmentation_loss(jnp.asarray(lp), jnp.asarray(t)))
    assert total < 1e-3


def test_point_mask_equivalent_to_dropping(rng):
    lp = _log_probs(rng, 60, 4)
    t = rng.integers(0, 4, size=60)
    mask = np.ones(60, bool)
    mask[40:] = False
    a = float(
        losses.segmentation_loss(jnp.asarray(lp), jnp.asarray(t), point_mask=jnp.asarray(mask))
    )
    b = float(losses.segmentation_loss(jnp.asarray(lp[:40]), jnp.asarray(t[:40])))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_dice_bounds(rng):
    lp = _log_probs(rng, 60, 4)
    t = rng.integers(0, 4, size=60)
    d = float(losses.generalized_dice_loss(jnp.asarray(lp), jnp.asarray(t)))
    assert 0.0 <= d <= 1.0


def test_lovasz_sortvjp_grads_match_ad(rng, monkeypatch):
    # the sort-based VJP (LNT_LOVASZ=sortvjp) must produce the SAME gradient
    # as plain AD through lax.sort (both treat the permutation as constant);
    # exercises ties (duplicated rows) and ignored/masked points
    import jax

    n, c = 400, 5
    lp = _log_probs(rng, n, c)
    lp[50:60] = lp[40:50]  # exact duplicate errors -> sort ties
    t = rng.integers(0, c, size=n).astype(np.int32)
    mask = np.ones(n, bool)
    mask[370:] = False

    def f(x):
        return losses.lovasz_softmax(
            jnp.asarray(x), jnp.asarray(t), ignore_index=0,
            point_mask=jnp.asarray(mask),
        )

    monkeypatch.setenv("LNT_LOVASZ", "batched")
    l_ad, g_ad = jax.value_and_grad(f)(jnp.asarray(lp))
    monkeypatch.setenv("LNT_LOVASZ", "sortvjp")
    l_sv, g_sv = jax.value_and_grad(f)(jnp.asarray(lp))
    np.testing.assert_allclose(float(l_ad), float(l_sv), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_sv), rtol=1e-6, atol=1e-8)
    assert float(jnp.abs(g_sv).sum()) > 0  # not trivially zero


def test_nll_onehot_bit_exact(rng):
    # the one-hot contraction must equal take_along_axis BIT-exactly
    n, c = 300, 7
    lp = _log_probs(rng, n, c)
    t = rng.integers(0, c, size=n).astype(np.int32)
    got = losses.nll_loss(jnp.asarray(lp), jnp.asarray(t), ignore_index=2)
    picked = np.take_along_axis(lp, np.clip(t, 0, c - 1)[:, None], axis=1)[:, 0]
    w = (t != 2).astype(np.float32)
    want = -(picked * w).sum() / w.sum()
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_lovasz_condskip_matches_batched(rng, monkeypatch):
    # the per-class cond-skip path (LNT_LOVASZ=condskip) must match
    # the batched sort formulation in VALUE and GRADIENT, including classes
    # absent from the sample (their cond branch never sorts), sort ties, and
    # ignored/masked points
    import jax

    n, c = 400, 8
    lp = _log_probs(rng, n, c)
    lp[50:60] = lp[40:50]  # exact duplicate errors -> sort ties
    # only classes {0, 1, 2, 5} present; 0 is also the ignore index
    t = rng.choice([0, 1, 2, 5], size=n).astype(np.int32)
    mask = np.ones(n, bool)
    mask[370:] = False

    def f(x):
        return losses.lovasz_softmax(
            jnp.asarray(x), jnp.asarray(t), ignore_index=0,
            point_mask=jnp.asarray(mask),
        )

    monkeypatch.setenv("LNT_LOVASZ", "batched")
    l_ad, g_ad = jax.value_and_grad(f)(jnp.asarray(lp))
    monkeypatch.setenv("LNT_LOVASZ", "condskip")
    l_cs, g_cs = jax.value_and_grad(f)(jnp.asarray(lp))
    np.testing.assert_allclose(float(l_ad), float(l_cs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_cs), rtol=1e-6, atol=1e-8)
    assert float(jnp.abs(g_cs).sum()) > 0


def test_lovasz_packed_matches_batched(rng, monkeypatch):
    # the packed single-key sort (LNT_LOVASZ=packed, the DEFAULT) folds
    # (error bits, gt, valid) into one int32 operand; the LOSS is tie-order
    # invariant (the err*grad dot telescopes over tie blocks), so it must
    # match the batched 3-operand formulation on any input.  Gradients are
    # compared on a tie-free input only: at ties the packed order ("gt=1
    # first") picks a different — equally valid — subgradient.
    import jax

    n, c = 400, 6
    lp = _log_probs(rng, n, c)
    t = rng.integers(0, c, size=n).astype(np.int32)
    mask = np.ones(n, bool)
    mask[370:] = False

    def f(x):
        return losses.lovasz_softmax(
            jnp.asarray(x), jnp.asarray(t), ignore_index=0,
            point_mask=jnp.asarray(mask),
        )

    monkeypatch.setenv("LNT_LOVASZ", "batched")
    l_ad, g_ad = jax.value_and_grad(f)(jnp.asarray(lp))
    monkeypatch.setenv("LNT_LOVASZ", "packed")
    l_pk, g_pk = jax.value_and_grad(f)(jnp.asarray(lp))
    np.testing.assert_allclose(float(l_ad), float(l_pk), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_pk), rtol=1e-5, atol=1e-8)
    assert float(jnp.abs(g_pk).sum()) > 0

    # ties (duplicated rows, mixed targets): loss must still agree exactly,
    # and the packed gradient must remain a finite nonzero subgradient
    lp2 = lp.copy()
    lp2[50:60] = lp2[40:50]
    monkeypatch.setenv("LNT_LOVASZ", "batched")
    l_ad2 = f(jnp.asarray(lp2))
    monkeypatch.setenv("LNT_LOVASZ", "packed")
    l_pk2, g_pk2 = jax.value_and_grad(f)(jnp.asarray(lp2))
    np.testing.assert_allclose(float(l_ad2), float(l_pk2), rtol=1e-6)
    assert np.isfinite(np.asarray(g_pk2)).all()
    assert float(jnp.abs(g_pk2).sum()) > 0
