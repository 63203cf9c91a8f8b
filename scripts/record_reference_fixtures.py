"""Record reference (upstream torch mmlearn) outputs as test fixtures.

Regenerates tests/fixtures/*.npz by running the UPSTREAM implementation
(mounted read-only at /root/reference) on fixed inputs. The upstream package
has heavy import-time deps (hydra-zen, lightning, torchmetrics, torchvision)
that aren't installed here, so the needed modules are file-loaded with
minimal stubs. Run from the repo root:

    python scripts/record_reference_fixtures.py

The committed fixtures are what tests/modules/test_reference_parity.py
asserts against; regeneration requires the reference checkout + torch.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import os
import sys
import types

import numpy as np

REFERENCE = os.environ.get("MMLEARN_REFERENCE_PATH", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def stub(name: str, attrs: dict | None = None, package: bool = False):
    mod = types.ModuleType(name)
    if package:
        mod.__path__ = []
    for key, value in (attrs or {}).items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


def load_file(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _Store:
    def __call__(self, *args, **kwargs):
        if args and callable(args[0]) and not kwargs:
            return args[0]

        def deco(obj):
            return obj

        return deco

    def __getattr__(self, name):
        return self


def install_stubs() -> None:
    stub("hydra_zen", {"store": _Store(), "builds": lambda *a, **k: dict,
                       "MISSING": "???"})
    stub("lightning", {})
    stub("lightning.fabric", {})
    stub("lightning.fabric.utilities",
         {"rank_zero_warn": lambda *a, **k: None})
    stub("torchmetrics", {})
    stub("torchmetrics.utilities", {})
    stub("torchmetrics.utilities.compute",
         {"_safe_matmul": lambda a, b: a @ b.T})


def record_contrastive() -> None:
    import torch

    example = load_file(
        "_ref_example", f"{REFERENCE}/mmlearn/datasets/core/example.py"
    )
    modalities = load_file(
        "mmlearn.datasets.core.modalities",
        f"{REFERENCE}/mmlearn/datasets/core/modalities.py",
    )
    stub("mmlearn", package=True)
    stub("mmlearn.datasets", package=True)
    stub(
        "mmlearn.datasets.core",
        {"find_matching_indices": example.find_matching_indices},
        package=True,
    )
    sys.modules["mmlearn.datasets.core.modalities"] = modalities

    @dataclasses.dataclass
    class LossPairSpec:
        modalities: tuple = ("rgb", "text")
        weight: float = 1.0

    stub("mmlearn.tasks", package=True)
    stub("mmlearn.tasks.contrastive_pretraining", {"LossPairSpec": LossPairSpec})

    ref = load_file(
        "_ref_contrastive", f"{REFERENCE}/mmlearn/modules/losses/contrastive.py"
    )

    rng = np.random.default_rng(42)
    b, d = 16, 8
    za = rng.standard_normal((b, d)).astype(np.float32)
    zb = rng.standard_normal((b, d)).astype(np.float32)
    ids = np.stack(
        [np.zeros(b, np.int64), np.arange(b, dtype=np.int64)], axis=1
    )
    scale = 7.0

    cases = {}
    for name, kwargs in [
        ("plain", {}),
        ("l2norm", {"l2_normalize": True}),
        ("alignment", {"modality_alignment": True}),
    ]:
        loss_fn = ref.ContrastiveLoss(**kwargs)
        out = loss_fn(
            {"rgb_embedding": torch.tensor(za), "text_embedding": torch.tensor(zb)},
            {"rgb": torch.tensor(ids), "text": torch.tensor(ids)},
            torch.tensor(scale),
            [LossPairSpec()],
        )
        cases[name] = float(out)
        print("contrastive", name, cases[name])

    np.savez(
        os.path.join(OUT_DIR, "reference_contrastive_loss.npz"),
        za=za, zb=zb, ids=ids, scale=scale,
        **{f"loss_{k}": v for k, v in cases.items()},
    )


def record_lr_schedule() -> None:
    import torch

    mod = load_file(
        "_ref_sched",
        f"{REFERENCE}/mmlearn/modules/lr_schedulers/linear_warmup_cosine_lr.py",
    )
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = mod.linear_warmup_cosine_annealing_lr(
        opt, warmup_steps=10, max_steps=110, start_factor=1 / 3, eta_min=0.05
    )
    lrs = []
    for _ in range(111):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    np.savez(
        os.path.join(OUT_DIR, "reference_lr_schedule.npz"),
        lrs=np.asarray(lrs, np.float64), warmup_steps=10, max_steps=110,
        start_factor=1 / 3, eta_min=0.05, base_lr=1.0,
    )
    print("lr schedule recorded")


def record_d2v_ema() -> None:
    import torch

    d2v = load_file(
        "_ref_d2v", f"{REFERENCE}/mmlearn/modules/losses/data2vec.py"
    )
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 6, 8)).astype(np.float32)
    y = rng.standard_normal((4, 6, 8)).astype(np.float32)
    vals = {}
    for name, kwargs in [
        ("mse", {"beta": 0.0, "reduction": "mean"}),
        ("smooth", {"beta": 1.0, "reduction": "mean"}),
        ("scaled", {"beta": 0.0, "loss_scale": 0.5, "reduction": "mean"}),
        ("sum", {"beta": 0.5, "reduction": "sum"}),
    ]:
        vals[name] = float(
            d2v.Data2VecLoss(**kwargs)(torch.tensor(x), torch.tensor(y))
        )
    none_out = d2v.Data2VecLoss(beta=0.0)(
        torch.tensor(x), torch.tensor(y)
    ).numpy()

    ema_mod = load_file("_ref_ema", f"{REFERENCE}/mmlearn/modules/ema.py")
    rates = [
        ema_mod.ExponentialMovingAverage.get_annealed_rate(0.9, 0.999, n, 100)
        for n in [0, 10, 50, 100]
    ]
    np.savez(
        os.path.join(OUT_DIR, "reference_d2v_ema.npz"),
        x=x, y=y, d2v_none=none_out,
        ema_rates=np.asarray(rates, np.float64),
        **{f"d2v_{k}": v for k, v in vals.items()},
    )
    print("d2v/ema recorded")




def record_ijepa_targets() -> None:
    """Reference I-JEPA target pipeline: LN -> apply_masks -> repeat ->
    smooth_l1 (reference tasks/ijepa.py:231-257) on fixed inputs."""
    import torch
    import torch.nn.functional as F

    masking = load_file(
        "ref_masking",
        "/root/reference/mmlearn/datasets/processors/masking.py",
    )
    transforms = load_file(
        "ref_transforms",
        "/root/reference/mmlearn/datasets/processors/transforms.py",
    )

    g = torch.Generator().manual_seed(7)
    B, N, D, K = 4, 16, 8, 5
    h = torch.randn(B, N, D, generator=g)
    # two predictor masks + two encoder masks (repeat=2), (B, K) index style
    # boolean masks with exactly K kept patches per row (the reference
    # selects via boolean indexing and reshapes to (B, K, D))
    pred_masks = []
    for _ in range(2):
        m = torch.zeros(B, N, dtype=torch.bool)
        for bi in range(B):
            idx = torch.randperm(N, generator=g)[:K]
            m[bi, idx] = True
        pred_masks.append(m)
    n_enc = 2
    hn = F.layer_norm(h, h.size()[-1:])
    h_masked = masking.apply_masks(hn, pred_masks)
    h_rep = transforms.repeat_interleave_batch(h_masked, B, repeat=n_enc)
    z = torch.randn_like(h_rep, dtype=torch.float32)
    loss = F.smooth_l1_loss(z, h_rep)

    np.savez(
        os.path.join(OUT_DIR, "reference_ijepa_targets.npz"),
        h=h.numpy(),
        pred_masks=np.stack([m.numpy() for m in pred_masks]),  # bool (2, B, N)
        n_enc=np.asarray(n_enc),
        z=z.numpy(),
        target=h_rep.numpy(),
        loss=np.asarray(loss.item(), dtype=np.float64),
    )
    print("ijepa targets recorded")


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    install_stubs()
    record_contrastive()
    record_lr_schedule()
    record_d2v_ema()
    record_ijepa_targets()
