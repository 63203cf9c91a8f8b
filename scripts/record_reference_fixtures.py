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
from typing import Any

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
    import torch

    class _LightningModule(torch.nn.Module):
        """Minimal LightningModule: the reference tasks use only log/
        save_hyperparameters/device from Lightning's surface (VERDICT round 2
        established this is the full set)."""

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

        def save_hyperparameters(self, *a, **k):
            pass

        @property
        def device(self):
            return torch.device("cpu")

    _warn = lambda *a, **k: None  # noqa: E731
    stub("hydra_zen", {"store": _Store(), "builds": lambda *a, **k: dict,
                       "MISSING": "???"})
    L = stub("lightning", {"LightningModule": _LightningModule}, package=True)
    stub("lightning.pytorch", {"LightningModule": _LightningModule},
         package=True)
    sys.modules["lightning"].pytorch = sys.modules["lightning.pytorch"]
    stub("lightning.pytorch.utilities", package=True)
    stub("lightning.pytorch.utilities.types", {"OptimizerLRScheduler": Any})
    stub("lightning.pytorch.utilities.rank_zero", {"rank_zero_warn": _warn})
    stub("lightning.fabric", package=True)
    stub("lightning.fabric.utilities", {"rank_zero_warn": _warn})
    stub("lightning_utilities", package=True)
    stub("lightning_utilities.core", package=True)
    stub("lightning_utilities.core.rank_zero", {"rank_zero_warn": _warn})
    stub("torchmetrics", {})
    stub("torchmetrics.utilities", {})
    stub("torchmetrics.utilities.compute",
         {"_safe_matmul": lambda a, b: a @ b.T})
    return L


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


def load_reference_tasks():
    """Load the reference's real task classes (base + contrastive) with the
    package namespace wired so intra-package imports resolve."""
    example = load_file(
        "mmlearn.datasets.core.example",
        f"{REFERENCE}/mmlearn/datasets/core/example.py",
    )
    modalities = load_file(
        "mmlearn.datasets.core.modalities",
        f"{REFERENCE}/mmlearn/datasets/core/modalities.py",
    )
    stub("mmlearn", package=True)
    stub("mmlearn.datasets", package=True)
    stub(
        "mmlearn.datasets.core",
        {
            "Modalities": modalities.Modalities,
            "find_matching_indices": example.find_matching_indices,
            "Example": example.Example,
        },
        package=True,
    )
    sys.modules["mmlearn.datasets.core.example"] = example
    sys.modules["mmlearn.datasets.core.modalities"] = modalities
    stub("mmlearn.tasks", package=True)
    base = load_file("mmlearn.tasks.base", f"{REFERENCE}/mmlearn/tasks/base.py")
    hooks = load_file(
        "mmlearn.tasks.hooks", f"{REFERENCE}/mmlearn/tasks/hooks.py"
    )
    cp = load_file(
        "mmlearn.tasks.contrastive_pretraining",
        f"{REFERENCE}/mmlearn/tasks/contrastive_pretraining.py",
    )
    stub("mmlearn.modules", package=True)
    stub("mmlearn.modules.losses", package=True)
    loss = load_file(
        "mmlearn.modules.losses.contrastive",
        f"{REFERENCE}/mmlearn/modules/losses/contrastive.py",
    )
    sched = load_file(
        "mmlearn.modules.lr_schedulers.linear_warmup_cosine_lr",
        f"{REFERENCE}/mmlearn/modules/lr_schedulers/linear_warmup_cosine_lr.py",
    )
    return types.SimpleNamespace(
        base=base, hooks=hooks, cp=cp, loss=loss, sched=sched,
        modalities=modalities,
    )


# trajectory hyperparameters shared by recorder and test
TRAJ = dict(
    d_rgb=32, d_txt=24, hid=48, emb=16, batch=16, n_batches=8, steps=50,
    lr=1e-3, betas=(0.9, 0.98), eps=1e-8, weight_decay=0.1,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
)


def make_trajectory_data():
    """Fixed synthetic two-modality batches, identical for both frameworks."""
    rng = np.random.default_rng(1234)
    c = TRAJ
    rgb = rng.standard_normal(
        (c["n_batches"], c["batch"], c["d_rgb"])
    ).astype(np.float32)
    txt = rng.standard_normal(
        (c["n_batches"], c["batch"], c["d_txt"])
    ).astype(np.float32)
    probe_rgb = rng.standard_normal((c["batch"], c["d_rgb"])).astype(np.float32)
    probe_txt = rng.standard_normal((c["batch"], c["d_txt"])).astype(np.float32)
    ids = np.stack(
        [np.zeros(c["batch"], np.int64), np.arange(c["batch"], dtype=np.int64)],
        axis=1,
    )
    return rgb, txt, probe_rgb, probe_txt, ids


def record_contrastive_trajectory() -> None:
    """50-step end-to-end training trajectory of the reference's real
    ContrastivePretraining task (training_step at reference
    contrastive_pretraining.py:471-505, configure_optimizers at base.py:72-157,
    driven with Lightning's loop semantics: step → backward → optimizer →
    scheduler)."""
    import torch
    from functools import partial

    mods = load_reference_tasks()
    c = TRAJ

    class MLPEncoder(torch.nn.Module):
        def __init__(self, key: str, din: int):
            super().__init__()
            self.key = key
            self.fc1 = torch.nn.Linear(din, c["hid"])
            self.fc2 = torch.nn.Linear(c["hid"], c["emb"])

        def forward(self, inputs):
            x = inputs[self.key]
            h = torch.nn.functional.gelu(self.fc1(x))  # exact (erf) gelu
            return (self.fc2(h),)

    torch.manual_seed(7)
    enc_rgb = MLPEncoder("rgb", c["d_rgb"])
    enc_txt = MLPEncoder("text", c["d_txt"])
    init_weights = {
        f"{name}.{k}": v.detach().numpy().copy()
        for name, enc in [("rgb", enc_rgb), ("text", enc_txt)]
        for k, v in enc.state_dict().items()
    }

    task = mods.cp.ContrastivePretraining(
        encoders={"rgb": enc_rgb, "text": enc_txt},
        optimizer=partial(
            torch.optim.AdamW, lr=c["lr"], betas=c["betas"], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler={
            "scheduler": partial(
                mods.sched.linear_warmup_cosine_annealing_lr,
                warmup_steps=c["warmup_steps"], max_steps=c["steps"],
                start_factor=c["start_factor"], eta_min=c["eta_min"],
            ),
            "extras": {"interval": "step"},
        },
        loss=mods.loss.ContrastiveLoss(),
    )

    conf = task.configure_optimizers()
    opt = conf["optimizer"]
    sched = conf["lr_scheduler"]["scheduler"]

    rgb, txt, probe_rgb, probe_txt, ids = make_trajectory_data()
    losses, scales, lrs = [], [], []
    for step in range(c["steps"]):
        i = step % c["n_batches"]
        batch = {
            "rgb": torch.tensor(rgb[i]),
            "text": torch.tensor(txt[i]),
            "example_ids": {
                "rgb": torch.tensor(ids), "text": torch.tensor(ids)
            },
        }
        lrs.append(opt.param_groups[0]["lr"])
        loss = task.training_step(batch, step)
        losses.append(float(loss.detach()))
        scales.append(float(task.log_logit_scale.detach()))
        loss.backward()
        opt.step()
        opt.zero_grad()
        sched.step()

    with torch.no_grad():
        probe = {
            "rgb": torch.tensor(probe_rgb), "text": torch.tensor(probe_txt)
        }
        final = task(probe)

    np.savez(
        os.path.join(OUT_DIR, "reference_contrastive_trajectory.npz"),
        losses=np.asarray(losses, np.float64),
        log_scales=np.asarray(scales, np.float64),
        lrs=np.asarray(lrs, np.float64),
        final_rgb=final["rgb_embedding"].numpy(),
        final_text=final["text_embedding"].numpy(),
        **{f"w_{k}": v for k, v in init_weights.items()},
    )
    print("contrastive trajectory recorded:",
          [round(x, 4) for x in losses[:5]], "...",
          [round(x, 4) for x in losses[-3:]])


# I-JEPA trajectory hyperparameters shared by recorder and test
IJEPA_TRAJ = dict(
    img=64, patch=16, embed_dim=32, depth=2, num_heads=4,
    pred_embed_dim=16, pred_depth=1, batch=8, n_batches=6, steps=30,
    lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.05,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
    ema_decay=0.996, ema_decay_end=1.0, ema_anneal_end_step=100,
)


def make_ijepa_data():
    """Fixed synthetic image batches (NCHW for torch; transpose for JAX)."""
    rng = np.random.default_rng(4321)
    c = IJEPA_TRAJ
    return rng.standard_normal(
        (c["n_batches"], c["batch"], 3, c["img"], c["img"])
    ).astype(np.float32)


def load_reference_vision():
    """Load the reference vision/ema/masking modules (timm stubbed)."""
    # transformers probes timm availability via find_spec at import time,
    # which chokes on a stub module with __spec__=None — import it first
    import transformers  # noqa: F401

    class _TimmViT:  # only referenced by TimmViT, which we don't build
        pass

    stub("timm", package=True)
    stub("timm.models", package=True)
    stub(
        "timm.models.vision_transformer",
        {"VisionTransformer": _TimmViT, "global_pool_nlc":
         lambda x, pool_type="": x},
    )
    sys.modules["timm"].models = sys.modules["timm.models"]
    stub("mmlearn.hf_utils", {"load_huggingface_model": None})
    stub("mmlearn.modules", package=True)
    stub("mmlearn.modules.layers", package=True)
    masking = load_file(
        "mmlearn.datasets.processors.masking",
        f"{REFERENCE}/mmlearn/datasets/processors/masking.py",
    )
    transforms = load_file(
        "mmlearn.datasets.processors.transforms",
        f"{REFERENCE}/mmlearn/datasets/processors/transforms.py",
    )
    stub("mmlearn.datasets.processors", package=True)
    sys.modules["mmlearn.datasets.processors.masking"] = masking
    sys.modules["mmlearn.datasets.processors.transforms"] = transforms
    load_file(
        "mmlearn.modules.layers.attention",
        f"{REFERENCE}/mmlearn/modules/layers/attention.py",
    )
    load_file(
        "mmlearn.modules.layers.mlp", f"{REFERENCE}/mmlearn/modules/layers/mlp.py"
    )
    load_file(
        "mmlearn.modules.layers.embedding",
        f"{REFERENCE}/mmlearn/modules/layers/embedding.py",
    )
    load_file(
        "mmlearn.modules.layers.transformer_block",
        f"{REFERENCE}/mmlearn/modules/layers/transformer_block.py",
    )
    ema = load_file("mmlearn.modules.ema", f"{REFERENCE}/mmlearn/modules/ema.py")
    vision = load_file(
        "mmlearn.modules.encoders.vision",
        f"{REFERENCE}/mmlearn/modules/encoders/vision.py",
    )
    ijepa = load_file(
        "mmlearn.tasks.ijepa", f"{REFERENCE}/mmlearn/tasks/ijepa.py"
    )
    return types.SimpleNamespace(
        masking=masking, vision=vision, ijepa=ijepa, ema=ema
    )


def record_ijepa_trajectory() -> None:
    """30-step end-to-end trajectory of the reference's real IJEPA task
    (reference ijepa.py:217-261 _shared_step + EMA in on_before_zero_grad,
    ijepa.py:108-115), with per-step masks recorded for replay."""
    import torch
    from functools import partial

    mods = load_reference_tasks()
    vis = load_reference_vision()
    c = IJEPA_TRAJ

    torch.manual_seed(11)
    encoder = vis.vision.VisionTransformer(
        img_size=[c["img"], c["img"]], patch_size=c["patch"],
        embed_dim=c["embed_dim"], depth=c["depth"], num_heads=c["num_heads"],
    )
    predictor = vis.vision.VisionTransformerPredictor(
        num_patches=(c["img"] // c["patch"]) ** 2, embed_dim=c["embed_dim"],
        predictor_embed_dim=c["pred_embed_dim"], depth=c["pred_depth"],
        num_heads=c["num_heads"],
    )
    enc_sd = {k: v.detach().numpy().copy() for k, v in encoder.state_dict().items()}
    pred_sd = {
        k: v.detach().numpy().copy() for k, v in predictor.state_dict().items()
    }

    task = vis.ijepa.IJEPA(
        encoder=encoder,
        predictor=predictor,
        optimizer=partial(
            torch.optim.AdamW, lr=c["lr"], betas=c["betas"], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler={
            "scheduler": partial(
                mods.sched.linear_warmup_cosine_annealing_lr,
                warmup_steps=c["warmup_steps"], max_steps=c["steps"],
                start_factor=c["start_factor"], eta_min=c["eta_min"],
            ),
            "extras": {"interval": "step"},
        },
        ema_decay=c["ema_decay"], ema_decay_end=c["ema_decay_end"],
        ema_anneal_end_step=c["ema_anneal_end_step"],
    )
    task.configure_model()

    # record the real generator's masks per step for cross-framework replay
    real_gen = vis.masking.IJEPAMaskGenerator(
        input_size=(c["img"], c["img"]), patch_size=c["patch"]
    )
    recorded_masks = []

    class RecordingGen:
        def __call__(self, batch_size=1):
            out = real_gen(batch_size=batch_size)
            recorded_masks.append(
                {
                    "enc": np.stack(
                        [m[0].numpy() for m in out["encoder_masks"]]
                    ),  # (nenc, N) binary; identical across batch rows
                    "pred": np.stack(
                        [m[0].numpy() for m in out["predictor_masks"]]
                    ),
                }
            )
            return out

    task.mask_generator = RecordingGen()

    conf = task.configure_optimizers()
    opt = conf["optimizer"]
    sched = conf["lr_scheduler"]["scheduler"]

    images = make_ijepa_data()
    losses = []
    for step in range(c["steps"]):
        batch = {"rgb": torch.tensor(images[step % c["n_batches"]])}
        loss = task.training_step(batch, step)
        losses.append(float(loss.detach()))
        loss.backward()
        opt.step()
        task.on_before_zero_grad(opt)
        opt.zero_grad()
        sched.step()

    mask_arrays = {}
    for s, rec in enumerate(recorded_masks):
        mask_arrays[f"enc_masks_{s}"] = rec["enc"]
        mask_arrays[f"pred_masks_{s}"] = rec["pred"]

    np.savez(
        os.path.join(OUT_DIR, "reference_ijepa_trajectory.npz"),
        losses=np.asarray(losses, np.float64),
        n_mask_steps=np.asarray(len(recorded_masks)),
        **{f"enc_{k}": v for k, v in enc_sd.items()},
        **{f"pred_{k}": v for k, v in pred_sd.items()},
        **mask_arrays,
    )
    print("ijepa trajectory recorded:",
          [round(x, 5) for x in losses[:5]], "...",
          [round(x, 5) for x in losses[-3:]])


# multi-task (contrastive ⊃ IJEPA aux) trajectory hyperparameters
MT_TRAJ = dict(
    img=64, patch=16, embed_dim=32, depth=2, num_heads=4,
    pred_embed_dim=16, pred_depth=1, d_txt=24, hid=48, emb=16,
    batch=8, n_batches=6, steps=30, aux_weight=0.3,
    lr=1e-3, betas=(0.9, 0.98), eps=1e-8, weight_decay=0.05,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
    ema_decay=0.996, ema_decay_end=1.0, ema_anneal_end_step=100,
)


def make_multitask_data():
    """Fixed rgb images (NCHW) + text vectors + example ids."""
    rng = np.random.default_rng(5551)
    c = MT_TRAJ
    rgb = rng.standard_normal(
        (c["n_batches"], c["batch"], 3, c["img"], c["img"])
    ).astype(np.float32)
    txt = rng.standard_normal(
        (c["n_batches"], c["batch"], c["d_txt"])
    ).astype(np.float32)
    ids = np.stack(
        [np.zeros(c["batch"], np.int64), np.arange(c["batch"], dtype=np.int64)],
        axis=1,
    )
    return rgb, txt, ids


def record_multitask_trajectory() -> None:
    """30-step trajectory of the reference's multi-task composition:
    ContrastivePretraining with a nested IJEPA auxiliary task on the SHARED
    rgb encoder (reference contrastive_pretraining.py:362-380 aux
    construction, :601-640 weighted aux loss sum, :507-511 aux
    on_before_zero_grad → EMA; the composition the multi_task project uses,
    reference projects/multi_task/configs/experiment/contrastive_ijepa.yaml).
    This exercises SURVEY.md §7 hard-part #5: one param tree, shared-subtree
    gradients from two objectives, EMA shadow of the shared encoder."""
    import torch
    from functools import partial

    mods = load_reference_tasks()
    vis = load_reference_vision()
    c = MT_TRAJ

    torch.manual_seed(23)
    shared_vit = vis.vision.VisionTransformer(
        img_size=[c["img"], c["img"]], patch_size=c["patch"],
        embed_dim=c["embed_dim"], depth=c["depth"], num_heads=c["num_heads"],
    )
    predictor = vis.vision.VisionTransformerPredictor(
        num_patches=(c["img"] // c["patch"]) ** 2, embed_dim=c["embed_dim"],
        predictor_embed_dim=c["pred_embed_dim"], depth=c["pred_depth"],
        num_heads=c["num_heads"],
    )

    class MLPEncoder(torch.nn.Module):
        def __init__(self, key: str, din: int):
            super().__init__()
            self.key = key
            self.fc1 = torch.nn.Linear(din, c["hid"])
            self.fc2 = torch.nn.Linear(c["hid"], c["emb"])

        def forward(self, inputs):
            x = inputs[self.key]
            h = torch.nn.functional.gelu(self.fc1(x))
            return (self.fc2(h),)

    class MeanPool(torch.nn.Module):
        def forward(self, x):
            return x.mean(dim=1)

    text_enc = MLPEncoder("text", c["d_txt"])
    rgb_head = torch.nn.Linear(c["embed_dim"], c["emb"])

    enc_sd = {
        k: v.detach().numpy().copy() for k, v in shared_vit.state_dict().items()
    }
    pred_sd = {
        k: v.detach().numpy().copy() for k, v in predictor.state_dict().items()
    }
    txt_sd = {
        k: v.detach().numpy().copy() for k, v in text_enc.state_dict().items()
    }
    head_sd = {
        k: v.detach().numpy().copy() for k, v in rgb_head.state_dict().items()
    }

    task = mods.cp.ContrastivePretraining(
        encoders={"rgb": shared_vit, "text": text_enc},
        postprocessors={"rgb": MeanPool()},
        heads={"rgb": rgb_head},
        optimizer=partial(
            torch.optim.AdamW, lr=c["lr"], betas=c["betas"], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler={
            "scheduler": partial(
                mods.sched.linear_warmup_cosine_annealing_lr,
                warmup_steps=c["warmup_steps"], max_steps=c["steps"],
                start_factor=c["start_factor"], eta_min=c["eta_min"],
            ),
            "extras": {"interval": "step"},
        },
        loss=mods.loss.ContrastiveLoss(),
        auxiliary_tasks={
            "ijepa_aux": mods.cp.AuxiliaryTaskSpec(
                modality="rgb",
                task=partial(
                    vis.ijepa.IJEPA,
                    predictor=predictor,
                    ema_decay=c["ema_decay"],
                    ema_decay_end=c["ema_decay_end"],
                    ema_anneal_end_step=c["ema_anneal_end_step"],
                ),
                loss_weight=c["aux_weight"],
            )
        },
    )
    task.configure_model()  # delegates to aux tasks (cp.py:396-398)
    aux = task.auxiliary_tasks["ijepa_aux"]

    real_gen = vis.masking.IJEPAMaskGenerator(
        input_size=(c["img"], c["img"]), patch_size=c["patch"]
    )
    recorded_masks = []

    class RecordingGen:
        def __call__(self, batch_size=1):
            out = real_gen(batch_size=batch_size)
            recorded_masks.append(
                {
                    "enc": np.stack(
                        [m[0].numpy() for m in out["encoder_masks"]]
                    ),
                    "pred": np.stack(
                        [m[0].numpy() for m in out["predictor_masks"]]
                    ),
                }
            )
            return out

    aux.mask_generator = RecordingGen()

    conf = task.configure_optimizers()
    opt = conf["optimizer"]
    sched = conf["lr_scheduler"]["scheduler"]

    rgb, txt, ids = make_multitask_data()
    losses, scales = [], []
    for step in range(c["steps"]):
        i = step % c["n_batches"]
        batch = {
            "rgb": torch.tensor(rgb[i]),
            "text": torch.tensor(txt[i]),
            "example_ids": {
                "rgb": torch.tensor(ids), "text": torch.tensor(ids)
            },
        }
        loss = task.training_step(batch, step)
        losses.append(float(loss.detach()))
        scales.append(float(task.log_logit_scale.detach()))
        loss.backward()
        opt.step()
        task.on_before_zero_grad(opt)  # parent delegates aux EMA (cp.py:507)
        opt.zero_grad()
        sched.step()

    mask_arrays = {}
    for s, rec in enumerate(recorded_masks):
        mask_arrays[f"enc_masks_{s}"] = rec["enc"]
        mask_arrays[f"pred_masks_{s}"] = rec["pred"]

    np.savez(
        os.path.join(OUT_DIR, "reference_multitask_trajectory.npz"),
        losses=np.asarray(losses, np.float64),
        log_scales=np.asarray(scales, np.float64),
        **{f"enc_{k}": v for k, v in enc_sd.items()},
        **{f"pred_{k}": v for k, v in pred_sd.items()},
        **{f"txt_{k}": v for k, v in txt_sd.items()},
        **{f"head_{k}": v for k, v in head_sd.items()},
        **mask_arrays,
    )
    print("multitask trajectory recorded:",
          [round(x, 5) for x in losses[:5]], "...",
          [round(x, 5) for x in losses[-3:]])


# Lightning-checkpoint fixtures: dims shared by recorder and importer test
LIGHTNING_CLIP = dict(
    vocab=99, hidden=32, inter=64, depth=2, heads=4, max_pos=16,
    eos=98, img=32, patch=8, head_out=16, head_hidden=20,
)

# real-tower CLIP trajectory (VERDICT r3 item 3): dims shared with the test
CLIP_TRAJ = dict(
    vocab=99, hidden=32, inter=64, depth=2, heads=4, max_pos=16, eos=98,
    img=32, patch=8, head_out=16,
    batch=16, n_batches=6, steps=30,
    lr=1e-3, betas=(0.9, 0.98), eps=1e-8, weight_decay=0.1,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
)


def make_clip_trajectory_data():
    """Fixed synthetic image+token batches, identical for both frameworks.
    Token rows always contain the EOS id (98 — also the max id, so
    EOS-argmax pooling picks the same position in torch and ours)."""
    rng = np.random.default_rng(2468)
    c = CLIP_TRAJ
    imgs = rng.standard_normal(
        (c["n_batches"], c["batch"], 3, c["img"], c["img"])
    ).astype(np.float32)
    ids = rng.integers(
        1, 90, (c["n_batches"], c["batch"], 12)
    ).astype(np.int64)
    # one eos per row at a varying position, padding after it
    eos_pos = rng.integers(4, 12, (c["n_batches"], c["batch"]))
    for b in range(c["n_batches"]):
        for r in range(c["batch"]):
            ids[b, r, eos_pos[b, r]:] = c["eos"]
    probe_imgs = imgs[0, :8]
    probe_ids = ids[0, :8]
    ex_ids = np.stack(
        [np.zeros(c["batch"], np.int64), np.arange(c["batch"], dtype=np.int64)],
        axis=1,
    )
    return imgs, ids, probe_imgs, probe_ids, ex_ids


def record_clip_trajectory() -> None:
    """30-step trajectory of the reference's real ContrastivePretraining
    with REAL towers: a 2-layer HF CLIP ViT + a 2-layer causal EOS-pooled
    CLIP text transformer + Linear heads (reference training_step at
    contrastive_pretraining.py:471-505). This is the transformer-under-
    training analogue of record_contrastive_trajectory's MLP fixture —
    the actual tower code paths (patch embed, pre-norm blocks, causal
    mask, EOS pooling, quick-gelu) under AdamW + warmup-cosine."""
    import torch
    from functools import partial
    from transformers import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModel,
    )

    mods = load_reference_tasks()
    c = CLIP_TRAJ

    torch.manual_seed(33)
    text_model = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=c["vocab"], hidden_size=c["hidden"],
            intermediate_size=c["inter"], num_hidden_layers=c["depth"],
            num_attention_heads=c["heads"],
            max_position_embeddings=c["max_pos"], eos_token_id=c["eos"],
        )
    )
    vision_model = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=c["hidden"], intermediate_size=c["inter"],
            num_hidden_layers=c["depth"], num_attention_heads=c["heads"],
            image_size=c["img"], patch_size=c["patch"],
        )
    )

    class VisionWrapper(torch.nn.Module):  # reference clip.py:194 storage
        def __init__(self) -> None:
            super().__init__()
            self.model = vision_model.vision_model

        def forward(self, inputs):
            return (self.model(pixel_values=inputs["rgb"]).pooler_output,)

    class TextWrapper(torch.nn.Module):  # reference clip.py:85 storage
        def __init__(self) -> None:
            super().__init__()
            self.model = text_model

        def forward(self, inputs):
            return (self.model(input_ids=inputs["text"]).pooler_output,)

    task = mods.cp.ContrastivePretraining(
        encoders={"rgb": VisionWrapper(), "text": TextWrapper()},
        heads={
            "rgb": torch.nn.Linear(c["hidden"], c["head_out"]),
            "text": torch.nn.Linear(c["hidden"], c["head_out"]),
        },
        optimizer=partial(
            torch.optim.AdamW, lr=c["lr"], betas=c["betas"], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler={
            "scheduler": partial(
                mods.sched.linear_warmup_cosine_annealing_lr,
                warmup_steps=c["warmup_steps"], max_steps=c["steps"],
                start_factor=c["start_factor"], eta_min=c["eta_min"],
            ),
            "extras": {"interval": "step"},
        },
        loss=mods.loss.ContrastiveLoss(),
    )
    # the initial weights travel as a Lightning-style ckpt so the test
    # reuses the lightning_import converter (double coverage)
    init_ckpt = {"state_dict": task.state_dict(), "global_step": 0, "epoch": 0}
    torch.save(
        init_ckpt, os.path.join(OUT_DIR, "reference_clip_trajectory_init.ckpt")
    )

    conf = task.configure_optimizers()
    opt = conf["optimizer"]
    sched = conf["lr_scheduler"]["scheduler"]

    imgs, ids, probe_imgs, probe_ids, ex_ids = make_clip_trajectory_data()
    losses, scales, lrs = [], [], []
    for step in range(c["steps"]):
        i = step % c["n_batches"]
        batch = {
            "rgb": torch.tensor(imgs[i]),
            "text": torch.tensor(ids[i]),
            "example_ids": {
                "rgb": torch.tensor(ex_ids), "text": torch.tensor(ex_ids)
            },
        }
        lrs.append(opt.param_groups[0]["lr"])
        loss = task.training_step(batch, step)
        losses.append(float(loss.detach()))
        scales.append(float(task.log_logit_scale.detach()))
        loss.backward()
        opt.step()
        opt.zero_grad()
        sched.step()

    with torch.no_grad():
        final = task({
            "rgb": torch.tensor(probe_imgs), "text": torch.tensor(probe_ids)
        })

    np.savez(
        os.path.join(OUT_DIR, "reference_clip_trajectory.npz"),
        losses=np.asarray(losses, np.float64),
        log_scales=np.asarray(scales, np.float64),
        lrs=np.asarray(lrs, np.float64),
        final_rgb=final["rgb_embedding"].numpy(),
        final_text=final["text_embedding"].numpy(),
    )
    print("clip-tower trajectory recorded:",
          [round(x, 4) for x in losses[:5]], "...",
          [round(x, 4) for x in losses[-3:]])


def record_lightning_ckpts() -> None:
    """Write reference-task Lightning ``.ckpt`` fixtures for the importer
    round-trip test (tests/test_lightning_import.py).

    The checkpoints are produced by the reference's REAL task classes
    (``state_dict`` layout from reference
    tasks/contrastive_pretraining.py:284-334 and tasks/ijepa.py:93-106 +
    on_save_checkpoint :188-203), wrapped in the dict shape Lightning's
    ModelCheckpoint writes. Encoder wrappers mirror exactly what the
    reference HF wrappers register: ``self.model = model.vision_model``
    (reference clip.py:194) and ``self.model = <CLIPTextModel>``
    (clip.py:85)."""
    import torch
    from transformers import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModel,
    )

    mods = load_reference_tasks()
    vis = load_reference_vision()
    c = LIGHTNING_CLIP

    torch.manual_seed(21)
    text_model = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=c["vocab"], hidden_size=c["hidden"],
            intermediate_size=c["inter"], num_hidden_layers=c["depth"],
            num_attention_heads=c["heads"],
            max_position_embeddings=c["max_pos"], eos_token_id=c["eos"],
        )
    ).eval()
    vision_model = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=c["hidden"], intermediate_size=c["inter"],
            num_hidden_layers=c["depth"], num_attention_heads=c["heads"],
            image_size=c["img"], patch_size=c["patch"],
        )
    ).eval()

    class VisionWrapper(torch.nn.Module):
        """Stores model.vision_model like reference HFCLIPVisionEncoder
        (reference clip.py:194)."""

        def __init__(self) -> None:
            super().__init__()
            self.model = vision_model.vision_model

        def forward(self, inputs):
            return (self.model(pixel_values=inputs["rgb"]).pooler_output,)

    class TextWrapper(torch.nn.Module):
        """Stores the full CLIPTextModel like reference HFCLIPTextEncoder
        (reference clip.py:85)."""

        def __init__(self) -> None:
            super().__init__()
            self.model = text_model

        def forward(self, inputs):
            return (self.model(input_ids=inputs["text"]).pooler_output,)

    mlp_mod = sys.modules["mmlearn.modules.layers.mlp"]
    heads = {
        "rgb": torch.nn.Linear(c["hidden"], c["head_out"]),
        "text": mlp_mod.MLP(
            in_dim=c["hidden"], out_dim=c["head_out"],
            hidden_dims=[c["head_hidden"]],
            norm_layer=torch.nn.LayerNorm,
            activation_layer=torch.nn.GELU,
        ),
    }
    task = mods.cp.ContrastivePretraining(
        encoders={"rgb": VisionWrapper(), "text": TextWrapper()},
        heads=heads,
        loss=mods.loss.ContrastiveLoss(),
    )

    rng = np.random.default_rng(31)
    imgs = rng.standard_normal((2, 3, c["img"], c["img"])).astype(np.float32)
    ids = rng.integers(1, 90, (2, 12)).astype(np.int64)
    ids[0, 7:] = c["eos"]
    ids[1, 11] = c["eos"]
    with torch.no_grad():
        probe = {
            "rgb": torch.from_numpy(imgs),
            "text": torch.from_numpy(ids),
        }
        out = task(probe)

    ckpt = {
        "state_dict": task.state_dict(),
        "global_step": 120,
        "epoch": 3,
        "pytorch-lightning_version": "2.4.0",
        "loops": {},
        "optimizer_states": [],
        "lr_schedulers": [],
    }
    task.on_save_checkpoint(ckpt)
    torch.save(ckpt, os.path.join(OUT_DIR, "reference_lightning_contrastive.ckpt"))
    np.savez(
        os.path.join(OUT_DIR, "reference_lightning_contrastive_expect.npz"),
        imgs=imgs, ids=ids,
        rgb_embedding=out["rgb_embedding"].numpy(),
        text_embedding=out["text_embedding"].numpy(),
        log_logit_scale=task.log_logit_scale.detach().numpy(),
    )

    # -- I-JEPA: encoder/predictor state + ema_params metadata ---------------
    cj = IJEPA_TRAJ
    torch.manual_seed(23)
    encoder = vis.vision.VisionTransformer(
        img_size=[cj["img"], cj["img"]], patch_size=cj["patch"],
        embed_dim=cj["embed_dim"], depth=cj["depth"],
        num_heads=cj["num_heads"],
    )
    predictor = vis.vision.VisionTransformerPredictor(
        num_patches=(cj["img"] // cj["patch"]) ** 2,
        embed_dim=cj["embed_dim"],
        predictor_embed_dim=cj["pred_embed_dim"], depth=cj["pred_depth"],
        num_heads=cj["num_heads"],
    )
    jtask = vis.ijepa.IJEPA(
        encoder=encoder, predictor=predictor,
        ema_decay=cj["ema_decay"], ema_decay_end=cj["ema_decay_end"],
        ema_anneal_end_step=cj["ema_anneal_end_step"],
    )
    jtask.configure_model()
    jtask.target_encoder.num_updates = 77
    jtask.target_encoder.decay = 0.9971
    jckpt = {
        "state_dict": jtask.state_dict(),
        "global_step": 77,
        "epoch": 1,
        "pytorch-lightning_version": "2.4.0",
    }
    jtask.on_save_checkpoint(jckpt)
    torch.save(jckpt, os.path.join(OUT_DIR, "reference_lightning_ijepa.ckpt"))
    probe_img = rng.standard_normal(
        (2, 3, cj["img"], cj["img"])
    ).astype(np.float32)
    with torch.no_grad():
        enc_out = encoder({"rgb": torch.from_numpy(probe_img)})[0]
    np.savez(
        os.path.join(OUT_DIR, "reference_lightning_ijepa_expect.npz"),
        imgs=probe_img,
        encoder_out=enc_out.numpy(),
    )
    print(
        "lightning ckpt fixtures recorded:",
        sorted(ckpt["state_dict"])[:3], "...",
        sorted(jckpt["state_dict"])[:2],
        "ema_params:", jckpt.get("ema_params"),
    )


# BIOSCAN trimodal trajectory hyperparameters shared by recorder and test
# (tiny versions of the reference bioscan_1m.yaml towers: timm-ViT-style rgb,
# BERT+MeanPooler text, BarcodeBERT dna — reference
# projects/bioscan_clip/configs/__init__.py:24-64)
BIOSCAN_TRAJ = dict(
    img=32, patch=8, vit_dim=48, vit_depth=2, vit_heads=4, vit_mlp=4.0,
    txt_vocab=99, txt_dim=48, txt_depth=2, txt_heads=4, txt_inter=192,
    txt_len=12, txt_max_pos=64,
    dna_vocab=19, dna_dim=48, dna_depth=2, dna_heads=4, dna_inter=192,
    dna_len=16, dna_max_pos=64,
    emb=32, batch=16, n_batches=6, steps=20,
    lr=1e-3, eps=1e-6, weight_decay=0.01,
    pct_start=0.3, div_factor=25.0, final_div_factor=1e4,
    lora_r=4, lora_alpha=8,
    n_keys=24, n_queries=12,
)


def make_bioscan_trajectory_data():
    """Fixed synthetic trimodal batches, identical for both frameworks.

    Images are NCHW float (transpose for JAX); DNA rows lead with the
    k-mer tokenizer's CLS id (1); text ids avoid 0 (BERT pad)."""
    rng = np.random.default_rng(97531)
    c = BIOSCAN_TRAJ
    imgs = rng.standard_normal(
        (c["n_batches"], c["batch"], 3, c["img"], c["img"])
    ).astype(np.float32)
    txt = rng.integers(
        1, c["txt_vocab"], (c["n_batches"], c["batch"], c["txt_len"])
    ).astype(np.int64)
    dna = rng.integers(
        3, c["dna_vocab"], (c["n_batches"], c["batch"], c["dna_len"])
    ).astype(np.int64)
    dna[..., 0] = 1  # [CLS] (dna_tokenizer vocab: MASK=0, CLS=1, UNK=2)
    ex_ids = np.stack(
        [np.zeros(c["batch"], np.int64), np.arange(c["batch"], dtype=np.int64)],
        axis=1,
    )
    return imgs, txt, dna, ex_ids


def make_bioscan_eval_data():
    """Synthetic eval sets for the taxonomic-classification parity check.

    Three splits mirroring the reference BIOSCAN protocol: ``all_keys`` (the
    kNN gallery), ``val_seen`` (labels drawn from gallery labels), and
    ``val_unseen`` (novel genus/species, seen order/family). Returns
    ``{split: {"rgb": ..., "text": ..., "dna": ..., "labels": [...]}}``."""
    rng = np.random.default_rng(13579)
    c = BIOSCAN_TRAJ

    def _inputs(n):
        img = rng.standard_normal((n, 3, c["img"], c["img"])).astype(np.float32)
        txt = rng.integers(1, c["txt_vocab"], (n, c["txt_len"])).astype(np.int64)
        dna = rng.integers(3, c["dna_vocab"], (n, c["dna_len"])).astype(np.int64)
        dna[:, 0] = 1
        return img, txt, dna

    nk, nq = c["n_keys"], c["n_queries"]
    key_labels = [
        {
            "order": f"order{i % 2}",
            "family": f"family{i % 4}",
            "genus": f"genus{i % 6}",
            "species": f"species{i % 8}",
        }
        for i in range(nk)
    ]
    seen_labels = [dict(key_labels[(2 * j) % nk]) for j in range(nq)]
    unseen_labels = [
        {
            "order": f"order{j % 2}",
            "family": f"family{j % 4}",
            "genus": f"novel_genus{j}",
            "species": f"novel_species{j}",
        }
        for j in range(nq)
    ]
    splits = {}
    for split, n, labels in (
        ("all_keys", nk, key_labels),
        ("val_seen", nq, seen_labels),
        ("val_unseen", nq, unseen_labels),
    ):
        img, txt, dna = _inputs(n)
        splits[split] = {"rgb": img, "text": txt, "dna": dna, "labels": labels}
    return splits


def load_reference_bioscan():
    """Load the reference's real BIOSCAN project modules (BarcodeBERT +
    TaxonomicClassification) with peft live and faiss/conf stubbed."""
    mods = load_reference_tasks()
    M = mods.modalities.Modalities
    if not M.has_modality("dna"):
        # the reference registers this at projects/bioscan_clip/dataset.py:19
        M.register_modality("dna")

    class _IndexFlatIP:
        """faiss.IndexFlatIP stand-in: exact inner-product top-k (numpy)."""

        def __init__(self, d):
            self.d = d
            self.vecs = None

        def add(self, x):
            self.vecs = np.asarray(x)

        def search(self, q, k):
            sims = np.asarray(q) @ self.vecs.T
            idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
            return np.take_along_axis(sims, idx, axis=1), idx

    stub("faiss", {"IndexFlatIP": _IndexFlatIP})
    sys.modules["lightning.pytorch.utilities"].move_data_to_device = (
        lambda batch, device: batch
    )
    conf = stub("mmlearn.conf", {"external_store": _Store()})
    sys.modules["mmlearn"].conf = conf

    def _wrap_peft_model(model, peft_config):
        from peft import get_peft_model

        return get_peft_model(model, peft_config)

    hf = stub("mmlearn.hf_utils", {"_wrap_peft_model": _wrap_peft_model})
    sys.modules["mmlearn"].hf_utils = hf
    mlp = load_file(
        "mmlearn.modules.layers.mlp", f"{REFERENCE}/mmlearn/modules/layers/mlp.py"
    )
    encoders = load_file(
        "projects_ref.bioscan_clip.encoders",
        f"{REFERENCE}/projects/bioscan_clip/encoders.py",
    )
    eval_task = load_file(
        "projects_ref.bioscan_clip.eval_task",
        f"{REFERENCE}/projects/bioscan_clip/eval_task.py",
    )
    return types.SimpleNamespace(
        tasks=mods, mlp=mlp, encoders=encoders, eval_task=eval_task,
        Modalities=M,
    )


def _make_timm_vit_modules(c):
    """Hand-written torch modules with timm ViT naming/architecture.

    timm isn't installed here, so the reference's ``TimmViT`` wrapper
    (reference vision.py:33-176: ``timm.create_model(...,
    num_classes=projection_dim)`` + LoRA via peft) is reproduced with a
    minimal torch ViT whose state-dict names and forward match timm's
    ``vit_base_patch16_224`` family exactly: ``patch_embed.proj`` conv,
    ``cls_token``/``pos_embed`` (cls position included, added after concat),
    pre-norm blocks with a fused ``attn.qkv`` Linear, GELU MLP, final
    ``norm``, classifier ``head``."""
    import torch

    class PatchEmbed(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Conv2d(
                3, c["vit_dim"], kernel_size=c["patch"], stride=c["patch"]
            )

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class Attention(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.num_heads = c["vit_heads"]
            self.qkv = torch.nn.Linear(c["vit_dim"], c["vit_dim"] * 3)
            self.proj = torch.nn.Linear(c["vit_dim"], c["vit_dim"])

        def forward(self, x):
            b, n, d = x.shape
            h = self.num_heads
            qkv = self.qkv(x).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * (d // h) ** -0.5
            x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, d)
            return self.proj(x)

    class Mlp(torch.nn.Module):
        def __init__(self):
            super().__init__()
            hidden = int(c["vit_dim"] * c["vit_mlp"])
            self.fc1 = torch.nn.Linear(c["vit_dim"], hidden)
            self.fc2 = torch.nn.Linear(hidden, c["vit_dim"])

        def forward(self, x):
            return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(c["vit_dim"], eps=1e-6)
            self.attn = Attention()
            self.norm2 = torch.nn.LayerNorm(c["vit_dim"], eps=1e-6)
            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class TimmStyleViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            n_patches = (c["img"] // c["patch"]) ** 2
            self.patch_embed = PatchEmbed()
            self.cls_token = torch.nn.Parameter(
                torch.randn(1, 1, c["vit_dim"]) * 0.02
            )
            self.pos_embed = torch.nn.Parameter(
                torch.randn(1, n_patches + 1, c["vit_dim"]) * 0.02
            )
            self.blocks = torch.nn.ModuleList(
                [Block() for _ in range(c["vit_depth"])]
            )
            self.norm = torch.nn.LayerNorm(c["vit_dim"], eps=1e-6)
            self.head = torch.nn.Linear(c["vit_dim"], c["emb"])

        def forward(self, x):
            x = self.patch_embed(x)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.head(self.norm(x)[:, 0])

    return TimmStyleViT


def record_bioscan_trajectory() -> None:
    """20-step trajectory + taxonomic eval of the reference's real trimodal
    BIOSCAN-CLIP recipe (VERDICT r4 item 3): ContrastivePretraining over
    rgb/text/dna with the reference's REAL ``BarcodeBERT`` class, real peft
    LoRA on all three towers (query/value on text+dna with
    ``modules_to_save=["decoder"]``, fused ``qkv`` + ``modules_to_save=
    ["head"]`` on rgb — reference projects/bioscan_clip/configs/
    __init__.py:24-64), 3 modality loss pairs, torch ``OneCycleLR``, AdamW
    (lr 1e-3, eps 1e-6), then the reference's real
    ``_inference_and_print_result`` scoring (eval_task.py:407-523) on
    synthetic keys/seen/unseen splits."""
    import json

    import torch
    from functools import partial
    from peft import LoraConfig
    from transformers import BertConfig, BertModel

    ref = load_reference_bioscan()
    mods = ref.tasks
    c = BIOSCAN_TRAJ

    torch.manual_seed(99)
    TimmStyleViT = _make_timm_vit_modules(c)

    from mmlearn.hf_utils import _wrap_peft_model

    class TimmViTEncoder(torch.nn.Module):
        """Mirror of reference TimmViT: peft-wrapped model with the head
        inside (``modules_to_save=["head"]``)."""

        def __init__(self) -> None:
            super().__init__()
            self.model = _wrap_peft_model(
                TimmStyleViT(),
                LoraConfig(
                    r=c["lora_r"], lora_alpha=c["lora_alpha"],
                    target_modules=["qkv"], modules_to_save=["head"],
                ),
            )

        def forward(self, inputs):
            return (self.model(inputs["rgb"]),)

    class BertMeanEncoder(torch.nn.Module):
        """Mirror of reference HFTextEncoder(bert-small) + MeanPooler
        (reference text.py:60-141 + bioscan configs MeanPooler)."""

        def __init__(self) -> None:
            super().__init__()
            self.model = _wrap_peft_model(
                BertModel(
                    BertConfig(
                        vocab_size=c["txt_vocab"],
                        hidden_size=c["txt_dim"],
                        num_hidden_layers=c["txt_depth"],
                        num_attention_heads=c["txt_heads"],
                        intermediate_size=c["txt_inter"],
                        max_position_embeddings=c["txt_max_pos"],
                        # determinism: BERT defaults to 0.1 dropout, which
                        # would randomize the recorded trajectory
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                    ),
                    add_pooling_layer=False,
                ),
                LoraConfig(
                    r=c["lora_r"], lora_alpha=c["lora_alpha"],
                    target_modules=["query", "value"],
                ),
            )

        def forward(self, inputs):
            out = self.model(input_ids=inputs["text"])
            return (out.last_hidden_state.mean(dim=1),)

    dna_encoder = ref.encoders.BarcodeBERT(
        vocab_size=c["dna_vocab"],
        projection_dim=c["emb"],
        peft_config=LoraConfig(
            r=c["lora_r"], lora_alpha=c["lora_alpha"],
            target_modules=["query", "value"], modules_to_save=["decoder"],
        ),
        model_config_kwargs=dict(
            hidden_size=c["dna_dim"],
            num_hidden_layers=c["dna_depth"],
            num_attention_heads=c["dna_heads"],
            intermediate_size=c["dna_inter"],
            max_position_embeddings=c["dna_max_pos"],
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        ),
    )
    with torch.no_grad():
        # widen the freshly-replaced MLM decoder: at default Linear init the
        # softmax-pooled DNA embeddings are near-uniform (logits ≈ 0 →
        # softmax ≈ 1/proj_dim), which makes every kNN margin degenerate.
        # The scaled weights travel through the init ckpt, so this changes
        # only the fixture's operating point, not the parity claim. Both
        # peft modules_to_save copies are scaled (forward uses `.default`).
        for n, p in dna_encoder.named_parameters():
            if "cls.predictions.decoder" in n and n.endswith("weight"):
                p.mul_(12.0)

    task = mods.cp.ContrastivePretraining(
        encoders={
            "rgb": TimmViTEncoder(),
            "text": BertMeanEncoder(),
            "dna": dna_encoder,
        },
        heads={"text": ref.mlp.MLP(in_dim=c["txt_dim"], out_dim=c["emb"])},
        optimizer=partial(
            torch.optim.AdamW, lr=c["lr"], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler={
            "scheduler": partial(
                torch.optim.lr_scheduler.OneCycleLR,
                max_lr=c["lr"], total_steps=c["steps"],
                pct_start=c["pct_start"], anneal_strategy="cos",
                cycle_momentum=False, div_factor=c["div_factor"],
                final_div_factor=c["final_div_factor"],
            ),
            "extras": {"interval": "step"},
        },
        loss=mods.loss.ContrastiveLoss(gather_with_grad=True),
    )
    init_ckpt = {"state_dict": task.state_dict(), "global_step": 0, "epoch": 0}
    torch.save(
        init_ckpt,
        os.path.join(OUT_DIR, "reference_bioscan_trajectory_init.ckpt"),
    )

    conf = task.configure_optimizers()
    opt = conf["optimizer"]
    sched = conf["lr_scheduler"]["scheduler"]

    imgs, txt, dna, ex_ids = make_bioscan_trajectory_data()
    losses, scales, lrs = [], [], []
    for step in range(c["steps"]):
        i = step % c["n_batches"]
        batch = {
            "rgb": torch.tensor(imgs[i]),
            "text": torch.tensor(txt[i]),
            "dna": torch.tensor(dna[i]),
            "example_ids": {
                m: torch.tensor(ex_ids) for m in ("rgb", "text", "dna")
            },
        }
        lrs.append(opt.param_groups[0]["lr"])
        loss = task.training_step(batch, step)
        losses.append(float(loss.detach()))
        scales.append(float(task.log_logit_scale.detach()))
        loss.backward()
        opt.step()
        opt.zero_grad()
        sched.step()

    with torch.no_grad():
        probe = {
            "rgb": torch.tensor(imgs[0, :8]),
            "text": torch.tensor(txt[0, :8]),
            "dna": torch.tensor(dna[0, :8]),
        }
        final = task(probe)

    # -- taxonomic eval through the reference's real scoring machinery -------
    eval_data = make_bioscan_eval_data()
    stores: dict[str, dict] = {}
    emb_record: dict[str, np.ndarray] = {}
    M = ref.Modalities
    for split, data in eval_data.items():
        with torch.no_grad():
            out = task({
                "rgb": torch.tensor(data["rgb"]),
                "text": torch.tensor(data["text"]),
                "dna": torch.tensor(data["dna"]),
            })
        rgb_e = out[M.RGB.embedding]
        dna_e = out[M.DNA.embedding]
        txt_e = out[M.TEXT.embedding]
        store = {
            M.RGB.embedding: rgb_e,
            M.DNA.embedding: dna_e,
            M.TEXT.embedding: txt_e,
            "concatenated_embedding": torch.cat([rgb_e, dna_e], dim=1),
            "averaged_embedding": torch.mean(torch.stack([rgb_e, dna_e]), dim=0),
            "labels": data["labels"],
        }
        if split == "all_keys":
            store["all_key_embedding"] = torch.cat([rgb_e, dna_e, txt_e], dim=0)
            store["all_key_labels"] = (
                data["labels"] + data["labels"] + data["labels"]
            )
        stores[split] = store
        for mod, e in (("rgb", rgb_e), ("dna", dna_e), ("text", txt_e)):
            emb_record[f"eval_{split}_{mod}"] = e.numpy()

    # top-1 margin guard: parity comparison needs the kNN argmax to be
    # stable under ~1e-3 embedding differences between frameworks
    from sklearn.preprocessing import normalize as _l2

    key_types = (
        M.DNA.embedding, "averaged_embedding", "concatenated_embedding",
        "all_key_embedding",
    )
    for split in ("val_seen", "val_unseen"):
        for key_type in key_types:
            qt = (
                M.RGB.embedding
                if key_type in (M.DNA.embedding, "all_key_embedding")
                else key_type
            )
            q = _l2(stores[split][qt].numpy())
            t = _l2(stores["all_keys"][key_type].numpy())
            sims = np.sort(q @ t.T, axis=1)
            margin = (sims[:, -1] - sims[:, -2]).min()
            print(f"  margin {split} vs {key_type}: {margin:.2e}")
            # softmax-pooled DNA embeddings cluster on the simplex, so
            # dna-gallery margins are inherently small; the parity test
            # asserts the cross-framework similarity error is far below
            # these margins before comparing accuracies (self-validating)
            if margin < 1e-4:
                raise RuntimeError(
                    f"{split} vs {key_type}: top-1 margin {margin:.2e} too "
                    "small for a stable cross-framework fixture — change "
                    "the eval data seed"
                )

    acc_dict, _, _ = ref.eval_task._inference_and_print_result(
        stores["all_keys"], stores["val_seen"], stores["val_unseen"],
        k_list=[1],
    )

    np.savez(
        os.path.join(OUT_DIR, "reference_bioscan_trajectory.npz"),
        losses=np.asarray(losses, np.float64),
        log_scales=np.asarray(scales, np.float64),
        lrs=np.asarray(lrs, np.float64),
        final_rgb=final[M.RGB.embedding].numpy(),
        final_text=final[M.TEXT.embedding].numpy(),
        final_dna=final[M.DNA.embedding].numpy(),
        acc_json=np.array(json.dumps(acc_dict)),
        **emb_record,
    )
    print("bioscan trimodal trajectory recorded:",
          [round(x, 4) for x in losses[:5]], "...",
          [round(x, 4) for x in losses[-3:]])
    print("  rgb->dna seen micro top-1:",
          acc_dict[M.RGB.embedding][M.DNA.embedding]["seen"]["micro_acc"][1])


RECORDERS = [
    record_contrastive,
    record_lr_schedule,
    record_d2v_ema,
    record_ijepa_targets,
    record_contrastive_trajectory,
    record_ijepa_trajectory,
    record_multitask_trajectory,
    record_lightning_ckpts,
    record_clip_trajectory,
    record_bioscan_trajectory,
]


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    install_stubs()
    # optional argv selection: substring match on recorder names, e.g.
    # `python scripts/record_reference_fixtures.py bioscan` re-records only
    # the BIOSCAN trimodal fixture
    wanted = sys.argv[1:]
    for rec in RECORDERS:
        if not wanted or any(w in rec.__name__ for w in wanted):
            rec()
