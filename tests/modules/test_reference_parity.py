"""Differential tests against recorded reference (torch mmlearn) outputs.

Fixtures in tests/fixtures/ were produced by running the upstream
``ContrastiveLoss`` (PyTorch) on fixed inputs; our JAX loss must reproduce the
numbers. This is the SURVEY.md §7 hard-part-#2 guard: mask-based pair
semantics must not drift from the reference numerics.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.modules.losses import ContrastiveLoss, LossPairSpec

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "reference_contrastive_loss.npz"
)


@pytest.fixture(scope="module")
def ref():
    return np.load(FIXTURE)


def _inputs(ref):
    emb = {"rgb": jnp.asarray(ref["za"]), "text": jnp.asarray(ref["zb"])}
    ids = {"rgb": jnp.asarray(ref["ids"]), "text": jnp.asarray(ref["ids"])}
    return emb, ids, jnp.asarray(float(ref["scale"]))


@pytest.mark.parametrize(
    "case,kwargs",
    [
        ("plain", {}),
        ("l2norm", {"l2_normalize": True}),
        ("alignment", {"modality_alignment": True}),
    ],
)
def test_contrastive_loss_matches_reference(ref, case, kwargs):
    emb, ids, scale = _inputs(ref)
    loss, _ = ContrastiveLoss(**kwargs)(
        emb, ids, scale, [LossPairSpec(("rgb", "text"))]
    )
    np.testing.assert_allclose(
        float(loss), float(ref[f"loss_{case}"]), rtol=1e-5
    )


def test_lr_schedule_matches_reference():
    """Our optax warmup+cosine must trace the reference torch SequentialLR."""
    from mmlearn_tpu.modules.lr_schedulers import linear_warmup_cosine_annealing_lr

    ref = np.load(
        os.path.join(os.path.dirname(FIXTURE), "reference_lr_schedule.npz")
    )
    sched = linear_warmup_cosine_annealing_lr(
        base_lr=float(ref["base_lr"]),
        warmup_steps=int(ref["warmup_steps"]),
        max_steps=int(ref["max_steps"]),
        start_factor=float(ref["start_factor"]),
        eta_min=float(ref["eta_min"]),
    )
    ours = np.asarray([float(sched(s)) for s in range(len(ref["lrs"]))])
    np.testing.assert_allclose(ours, ref["lrs"], atol=2e-2)
    # exact at the anchor points
    np.testing.assert_allclose(ours[0], ref["lrs"][0], rtol=1e-6)
    np.testing.assert_allclose(ours[10], ref["lrs"][10], rtol=1e-6)
    np.testing.assert_allclose(ours[110], ref["lrs"][110], rtol=1e-3)


def test_data2vec_loss_matches_reference():
    from mmlearn_tpu.modules.losses import Data2VecLoss

    ref = np.load(
        os.path.join(os.path.dirname(FIXTURE), "reference_d2v_ema.npz")
    )
    x, y = jnp.asarray(ref["x"]), jnp.asarray(ref["y"])
    cases = {
        "mse": dict(beta=0.0, reduction="mean"),
        "smooth": dict(beta=1.0, reduction="mean"),
        "scaled": dict(beta=0.0, loss_scale=0.5, reduction="mean"),
        "sum": dict(beta=0.5, reduction="sum"),
    }
    for name, kwargs in cases.items():
        ours = Data2VecLoss(**kwargs)(x, y)
        np.testing.assert_allclose(
            float(ours), float(ref[f"d2v_{name}"]), rtol=1e-5
        )
    none_ours = Data2VecLoss(beta=0.0)(x, y)
    np.testing.assert_allclose(
        np.asarray(none_ours), ref["d2v_none"], rtol=1e-5
    )


def test_ema_annealed_rate_matches_reference():
    from mmlearn_tpu.modules import ExponentialMovingAverage

    ref = np.load(
        os.path.join(os.path.dirname(FIXTURE), "reference_d2v_ema.npz")
    )
    ema = ExponentialMovingAverage(
        ema_decay=0.9, ema_end_decay=0.999, ema_anneal_end_step=100
    )
    for n, expected in zip([0, 10, 50, 100], ref["ema_rates"]):
        np.testing.assert_allclose(
            float(ema.get_annealed_rate(n)), expected, rtol=1e-6
        )


def test_ijepa_target_pipeline_matches_reference():
    """LN → apply_masks → repeat_interleave → smooth-L1 reproduces the
    recorded reference pipeline (reference tasks/ijepa.py:231-257,
    masking.py:241-287, transforms.py:55-79)."""
    from mmlearn_tpu.modules.encoders.vision import (
        apply_masks,
        repeat_interleave_batch,
    )
    from mmlearn_tpu.modules.losses.data2vec import smooth_l1

    fx = np.load(
        os.path.join(
            os.path.dirname(__file__), "..", "fixtures",
            "reference_ijepa_targets.npz",
        )
    )
    h = jnp.asarray(fx["h"])
    bool_masks = fx["pred_masks"]  # (num_masks, B, N) boolean, K True/row
    n_enc = int(fx["n_enc"])
    b = h.shape[0]

    # boolean → static keep-index masks (ascending order == reference's
    # boolean-indexing order)
    idx_masks = jnp.asarray(
        np.stack([
            np.stack([np.nonzero(row)[0] for row in m]) for m in bool_masks
        ])
    )  # (num_masks, B, K)

    hn_mean = h.mean(axis=-1, keepdims=True)
    hn_var = h.var(axis=-1, keepdims=True)
    hn = (h - hn_mean) / jnp.sqrt(hn_var + 1e-5)
    target = repeat_interleave_batch(apply_masks(hn, idx_masks), b, n_enc)
    np.testing.assert_allclose(
        np.asarray(target), fx["target"], atol=2e-5
    )
    loss = smooth_l1(jnp.asarray(fx["z"]), target, beta=1.0).mean()
    np.testing.assert_allclose(float(loss), float(fx["loss"]), rtol=1e-5)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(max_lr=1e-3, total_steps=20, pct_start=0.3),
        dict(max_lr=3e-4, total_steps=137, pct_start=0.1,
             div_factor=10.0, final_div_factor=100.0),
        dict(max_lr=1e-3, total_steps=50, pct_start=0.45,
             anneal_strategy="linear"),
    ],
)
def test_onecycle_lr_matches_torch(kwargs):
    """onecycle_lr must equal torch.optim.lr_scheduler.OneCycleLR step for
    step — including the off-by-one phase boundaries (pct*T-1 / T-1) that
    make optax.cosine_onecycle_schedule diverge at every interior step.
    (BIOSCAN-CLIP trains with OneCycleLR: reference bioscan_1m.yaml:74-80.)"""
    torch = pytest.importorskip("torch")
    from mmlearn_tpu.modules.lr_schedulers import onecycle_lr

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=kwargs["max_lr"])
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, cycle_momentum=False, **kwargs
    )
    expected = []
    for _ in range(kwargs["total_steps"]):
        expected.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    ours = onecycle_lr(**kwargs)
    got = np.asarray([float(ours(s)) for s in range(kwargs["total_steps"])])
    np.testing.assert_allclose(got, expected, rtol=2e-5)
