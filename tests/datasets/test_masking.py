"""Tests for mask generators (MLM, blockwise, I-JEPA) — static-shape contracts."""

import numpy as np
import pytest

from mmlearn_tpu.datasets.processors.masking import (
    BlockwiseImagePatchMaskGenerator,
    IJEPAMaskGenerator,
    RandomMaskGenerator,
)


def test_random_mask_generator_ratios():
    gen = RandomMaskGenerator(probability=0.5, mask_token_id=3,
                              vocab_size=100, special_token_ids=(0, 1, 2, 3))
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 100, (16, 64))
    ids[:, 0] = 1  # special (never masked)
    masked, labels, mask = gen(ids, rng=rng)
    assert masked.shape == ids.shape
    assert not mask[:, 0].any()
    frac = mask[:, 1:].mean()
    assert 0.4 < frac < 0.6
    # labels carry original ids at masked positions, -100 elsewhere
    np.testing.assert_array_equal(labels[mask], ids[mask])
    assert (labels[~mask] == -100).all()
    # ~80% of masked positions replaced by the mask token
    frac_mask_tok = (masked[mask] == 3).mean()
    assert 0.7 < frac_mask_tok < 0.9
    # unmasked positions unchanged
    np.testing.assert_array_equal(masked[~mask], ids[~mask])


def test_blockwise_mask_fixed_count():
    gen = BlockwiseImagePatchMaskGenerator(input_size=14, num_masking_patches=75)
    rng = np.random.default_rng(0)
    for _ in range(5):
        mask = gen(rng=rng)
        assert mask.shape == (196,)
        assert mask.sum() == 75  # exactly, every draw (static shapes)


def test_ijepa_mask_generator_shapes_and_disjointness():
    gen = IJEPAMaskGenerator(input_size=224, patch_size=16)
    out = gen(batch_size=4, rng=np.random.default_rng(0))
    enc, pred = out["encoder_masks"], out["predictor_masks"]
    assert enc.shape == (1, 4, gen.k_ctx)
    assert pred.shape == (4, 4, gen.k_tgt)
    assert enc.dtype == np.int32
    n = gen.num_patches
    assert enc.min() >= 0 and enc.max() < n
    assert pred.min() >= 0 and pred.max() < n
    # context excludes target patches (allow_overlap=False)
    for b in range(4):
        targets = set(pred[:, b].reshape(-1).tolist())
        ctx = set(enc[0, b].tolist())
        assert not (ctx & targets)


def test_ijepa_masks_static_across_draws():
    gen = IJEPAMaskGenerator(input_size=96, patch_size=16, npred=2)
    a = gen(3, rng=np.random.default_rng(1))
    b = gen(5, rng=np.random.default_rng(2))
    assert a["encoder_masks"].shape[2] == b["encoder_masks"].shape[2]
    assert a["predictor_masks"].shape[2] == b["predictor_masks"].shape[2]


def test_warmup_cosine_schedule():
    from mmlearn_tpu.modules.lr_schedulers import linear_warmup_cosine_annealing_lr

    sched = linear_warmup_cosine_annealing_lr(
        base_lr=1.0, warmup_steps=10, max_steps=110, start_factor=0.1,
        eta_min=0.05,
    )
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-2
    assert float(sched(5)) < 1.0
    end = float(sched(110))
    assert abs(end - 0.05) < 5e-3  # decays to eta_min
    mid = float(sched(60))
    assert 0.05 < mid < 1.0


def test_ijepa_context_is_contiguous_block_minus_targets():
    """The context mask comes from one contiguous block at enc_mask_scale
    with target-patch overlap removed (reference masking.py:341-358), and
    k_ctx reflects the expected target *union* (targets overlap)."""
    gen = IJEPAMaskGenerator(input_size=224, patch_size=16)
    # expected-union sizing: strictly larger than the old npred-disjoint
    # estimate (0.925*196 - 4*34 = 45) and below the raw context scale
    assert 45 < gen.k_ctx < int(0.925 * 196)

    rng = np.random.default_rng(0)
    masks = gen(3, rng=rng)
    enc = masks["encoder_masks"]
    pred = masks["predictor_masks"]
    grid = gen.grid
    for b in range(3):
        ctx = np.unique(enc[0, b])
        tgt = np.unique(pred[:, b].reshape(-1))
        # no overlap between context and targets (allow_overlap=False)
        assert len(np.intersect1d(ctx, tgt)) == 0
        # context indices lie inside one bounding box not much larger than
        # the sampled block (contiguity modulo removed target patches)
        r, c = ctx // grid, ctx % grid
        area = (r.max() - r.min() + 1) * (c.max() - c.min() + 1)
        assert area <= gen.num_patches  # sanity
        # every context patch is inside the bounding box of the block:
        # box area at enc scale >= |ctx| always holds; tighter: the box is
        # at most the full grid and the ctx fits a single rectangle
        assert len(ctx) <= area
