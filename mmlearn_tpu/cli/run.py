"""``mmlearn_run`` — the experiment CLI.

Parity: /root/reference/mmlearn/cli/run.py. Usage mirrors the reference:

    mmlearn_run 'searchpath=[pkg://my_project.configs]' \\
        +experiment=my_experiment experiment_name=run1 trainer.max_steps=100

Flow (reference lines 37-150): import-time registration of every config
group, compose(base + experiment + overrides), seed, instantiate
callbacks/loggers/trainer/datasets/samplers/dataloaders/task, dispatch
``trainer.fit`` or ``trainer.test`` based on ``job_type``.

TPU runtime notes replacing the reference's torch knobs:
- multi-host init via ``jax.distributed.initialize()`` when running under a
  multi-process launcher (``MMLEARN_MULTIHOST=1``);
- rank/world for samplers come from ``jax.process_index()/process_count()``.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any, Optional, Sequence

logger = logging.getLogger(__name__)


def _register_everything() -> None:
    """Import every subpackage so @store decorators run (reference: run.py:24-31)."""
    import mmlearn_tpu.datasets  # noqa: F401
    import mmlearn_tpu.datasets.builtin  # noqa: F401
    import mmlearn_tpu.datasets.processors.masking  # noqa: F401
    import mmlearn_tpu.datasets.processors.tokenizers  # noqa: F401
    import mmlearn_tpu.datasets.processors.transforms  # noqa: F401
    import mmlearn_tpu.modules.encoders  # noqa: F401
    import mmlearn_tpu.modules.layers  # noqa: F401
    import mmlearn_tpu.modules.losses  # noqa: F401
    import mmlearn_tpu.modules.lr_schedulers  # noqa: F401
    import mmlearn_tpu.modules.metrics  # noqa: F401
    import mmlearn_tpu.tasks  # noqa: F401
    import mmlearn_tpu.trainer  # noqa: F401

    from mmlearn_tpu.conf import register_default_configs

    register_default_configs()


def build_experiment(overrides: Sequence[str]) -> dict:
    """Compose the final experiment config from CLI-style overrides."""
    _register_everything()
    from mmlearn_tpu.conf import base_config, compose

    return compose(base_config(), overrides=overrides)


def run_experiment(cfg: dict) -> Any:
    """Instantiate everything from a composed config and run the job."""
    import jax

    from mmlearn_tpu.cli._instantiators import (
        instantiate_callbacks,
        instantiate_dataloader,
        instantiate_datasets,
        instantiate_loggers,
        instantiate_sampler,
    )
    from mmlearn_tpu.conf import ConfigError, instantiate

    if os.environ.get("MMLEARN_MULTIHOST") == "1":
        jax.distributed.initialize()

    if cfg.get("task") in (None, "???"):
        raise ConfigError("No task configured (set task=... or use an experiment)")
    from mmlearn_tpu.conf import check_missing

    # abort on any '???' left in the composed config (Hydra parity: the
    # reference raises MissingMandatoryValue; without this a run would
    # train into a directory literally named 'outputs/???')
    check_missing(cfg)

    seed = cfg.get("seed")
    if seed is None:
        seed = 0
    import numpy as np

    np.random.seed(seed)

    output_dir = cfg.get("runtime", {}).get("output_dir", "outputs")
    os.makedirs(output_dir, exist_ok=True)

    callbacks = instantiate_callbacks(cfg["trainer"].get("callbacks"))
    loggers = instantiate_loggers(cfg["trainer"].get("loggers"))
    # config upload on process 0 only (reference: cli/run.py:63-69 rank gate)
    if loggers and jax.process_index() == 0:
        hparams = {k: v for k, v in cfg.items() if k != "runtime"}
        for lg in loggers:
            lg.log_hyperparams(hparams)

    trainer_cfg = dict(cfg["trainer"])
    trainer_cfg.pop("callbacks", None)
    trainer_cfg.pop("loggers", None)
    trainer_cfg.pop("default_root_dir", None)
    trainer = instantiate(
        trainer_cfg,
        callbacks=callbacks,
        loggers=loggers,
        default_root_dir=output_dir,
        seed=seed,
    )

    rank, world = jax.process_index(), jax.process_count()
    loaders: dict[str, Any] = {}
    for split in ("train", "val", "test"):
        dataset = instantiate_datasets(cfg["datasets"].get(split))
        if dataset is None:
            loaders[split] = None
            continue
        dl_cfg = dict(cfg["dataloader"].get(split) or {})
        sampler_cfg = dl_cfg.pop("sampler", None)
        sampler = instantiate_sampler(
            sampler_cfg, dataset, rank=rank, num_replicas=world
        )
        loaders[split] = instantiate_dataloader(dl_cfg, dataset, sampler=sampler)
        logger.info(
            "%s dataset: %d examples, %d batches", split, len(dataset),
            len(loaders[split]),
        )

    task = instantiate(cfg["task"])

    init_from_lightning = cfg.get("init_from_lightning")
    if init_from_lightning:
        # migrate a half-trained reference (torch Lightning) run: convert
        # its .ckpt into our parameter layout and overlay it at init
        # (lightning_import.py; optimizer state starts fresh)
        from mmlearn_tpu.lightning_import import import_lightning_checkpoint

        overlay, meta = import_lightning_checkpoint(str(init_from_lightning))
        task.init_overlay = overlay
        # non-parameter state: I-JEPA's EMA anneal position must continue
        # from the reference's num_updates, not restart at trainer step 0
        task.apply_import_metadata(meta)
        logger.info(
            "initializing from reference Lightning checkpoint %s "
            "(global_step=%d, epoch=%d%s)",
            init_from_lightning, meta["global_step"], meta["epoch"],
            f", ema={meta['ema']}" if "ema" in meta else "",
        )

    job_type = str(cfg.get("job_type", "train"))
    ckpt_path = cfg.get("resume_from_checkpoint")
    if job_type == "train":
        if loaders["train"] is None:
            raise ConfigError("job_type=train requires datasets.train")
        return trainer.fit(
            task, loaders["train"], loaders["val"], ckpt_path=ckpt_path,
            strict_loading=bool(cfg.get("strict_loading", True)),
        )
    if job_type == "export":
        # serving-artifact job: restore (or init) params, export each tower
        loader = next(
            (ld for ld in (loaders["test"], loaders["val"], loaders["train"])
             if ld is not None),
            None,
        )
        if loader is None:
            raise ConfigError("job_type=export requires a dataset split")
        state = trainer.prepare_eval_state(
            task, loader, ckpt_path=ckpt_path,
            strict_loading=bool(cfg.get("strict_loading", True)),
        )
        from mmlearn_tpu.serving import save_encoder

        exp_cfg = cfg.get("export") or {}
        try:
            batch = task.prepare_batch(dict(next(iter(loader))), step=0,
                                       training=False)
        except StopIteration:
            raise ConfigError(
                "job_type=export: the dataset split is empty (check "
                "batch_size/drop_last against the dataset size)"
            ) from None
        base = exp_cfg.get("output_dir") or os.path.join(output_dir, "artifacts")
        # validate the export config on EVERY process (a rank-0-only
        # ConfigError would leave ranks >=1 exiting "successfully" and mask
        # the misconfiguration from the launcher)...
        fmt = str(exp_cfg.get("format", "stablehlo")).lower()
        if fmt not in ("hf", "torch", "stablehlo"):
            raise ConfigError(
                f"Unknown export.format '{fmt}' (expected stablehlo | hf)"
            )
        mods = exp_cfg.get("modalities")
        if mods is None:
            mods = [m for m in getattr(task, "modalities", []) if m in batch]
        if fmt == "stablehlo" and not mods:
            raise ConfigError("job_type=export found no modalities to export")
        # ...but artifacts are identical across processes (same params, same
        # specs): only process 0 writes, mirroring the logger/hparam gate
        if jax.process_index() != 0:
            return {}
        if fmt in ("hf", "torch"):
            # torch-ecosystem weight export (docs/migrating.md "Taking
            # weights back to torch"): one state dict per tower, written as
            # .npz (+ .pt when torch is importable)
            import numpy as np

            from mmlearn_tpu.hf_export import export_task, to_torch_state_dict

            sds = export_task(
                task, state.params, extras=getattr(state, "extras", None),
                skip_unknown=True,
            )
            os.makedirs(base, exist_ok=True)
            paths = {}
            for name, sd in sds.items():
                npz = os.path.join(base, f"{name}.hf.npz")
                np.savez(npz, **sd)
                paths[name] = npz
                try:
                    import torch

                    pt = os.path.join(base, f"{name}.hf.pt")
                    torch.save(to_torch_state_dict(sd), pt)
                    paths[name] = pt
                except ImportError:  # npz alone is a complete artifact
                    pass
                logger.info("Exported %s torch state dict to %s", name, paths[name])
            return paths
        paths = {}
        for mod in mods:
            paths[mod] = save_encoder(
                os.path.join(base, str(mod)), task, state.params, mod, batch,
                normalize=bool(exp_cfg.get("normalize", True)),
                platforms=exp_cfg.get("platforms"),
            )
            logger.info("Exported %s artifact to %s", mod, paths[mod])
        return paths
    if job_type == "eval":
        if loaders["test"] is None:
            raise ConfigError("job_type=eval requires datasets.test")
        # params come from the checkpoint if given, else from init (which
        # applies any pretrained-weight loaders baked into the task config)
        state = trainer.prepare_eval_state(
            task, loaders["test"], ckpt_path=ckpt_path,
            strict_loading=bool(cfg.get("strict_loading", True)),
        )
        return trainer.test(task, loaders["test"], state=state)
    raise ConfigError(f"Unknown job_type '{job_type}'")


def main(argv: Optional[Sequence[str]] = None) -> Any:
    logging.basicConfig(
        level=os.environ.get("MMLEARN_LOG_LEVEL", "INFO"),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from mmlearn_tpu._platform import force_platform_from_env

    force_platform_from_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--help" in argv or "-h" in argv:
        print(__doc__)
        from mmlearn_tpu.conf import store

        _register_everything()
        print("Config groups:")
        for group in store.groups():
            print(f"  {group}: {', '.join(store.names(group))}")
        return None
    print_cfg = False
    if "--cfg" in argv:
        argv.remove("--cfg")
        print_cfg = True
    multirun = False
    for flag in ("-m", "--multirun"):
        if flag in argv:
            argv.remove(flag)
            multirun = True
    if multirun:
        return run_sweep(argv, print_cfg=print_cfg)
    cfg = build_experiment(argv)
    if print_cfg:
        import yaml

        print(yaml.safe_dump(cfg, sort_keys=False, default_flow_style=False))
        return cfg
    return run_experiment(cfg)


def _split_sweep_values(raw: str) -> list[str]:
    """Split a sweep spec on commas, honoring quotes and brackets —
    ``"'a,b'"`` is ONE literal value, not a two-job sweep axis."""
    values, buf, depth, quote = [], [], 0, None
    for ch in raw:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch in "[({":
            depth += 1
            buf.append(ch)
        elif ch in "])}":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            values.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    values.append("".join(buf))
    return values


def run_sweep(argv: Sequence[str], print_cfg: bool = False) -> list:
    """Sweep over comma-separated override values (cartesian product).

    ``mmlearn_run -m trainer.max_steps=5,10 task.encoders.rgb.depth=2,4``.
    Launchers (reference: hydra --multirun via hydra-submitit-launcher,
    conf/__init__.py:101-103):

    - default: jobs run sequentially in-process;
    - ``launcher=local launcher.workers=N``: N concurrent subprocesses;
    - ``launcher=slurm launcher.partition=... launcher.nodes=...``:
      submitit-style sbatch submission, one script per job.
    """
    import itertools

    from mmlearn_tpu.cli.launcher import (
        launch_local,
        launch_slurm,
        parse_launcher_args,
    )

    launcher_opts, argv = parse_launcher_args(argv)

    sweep_axes: list[list[str]] = []
    base_args: list[str] = []
    for arg in argv:
        key, _, raw = arg.partition("=")
        values = _split_sweep_values(raw)
        if (
            "=" in arg
            and len(values) > 1
            and not raw.strip().startswith("[")
            and not key.startswith(("searchpath", "hydra."))
        ):
            sweep_axes.append([f"{key}={v}" for v in values])
        else:
            base_args.append(arg)
    job_argvs: list[list[str]] = []
    job_dirs: list[str] = []
    combos = list(itertools.product(*sweep_axes))
    for i, combo in enumerate(combos):
        job_args = base_args + list(combo)
        # recompose with the suffixed output dir so ${runtime.output_dir}
        # interpolations (loggers, checkpoints) resolve to the job dir
        out = build_experiment(job_args).get("runtime", {}).get(
            "output_dir", "outputs"
        )
        job_argvs.append(job_args + [f"runtime.output_dir={out}/job{i}"])
        job_dirs.append(f"{out}/job{i}")

    kind = launcher_opts.pop("kind", None)
    if kind == "local" and not print_cfg:
        workers = int(launcher_opts.pop("workers", 1))
        return launch_local(job_argvs, job_dirs, workers=workers)
    if kind == "slurm" and not print_cfg:
        sbatch = launcher_opts.pop("sbatch", "sbatch")
        multihost = launcher_opts.pop("multihost", "0") not in ("0", "false")
        return launch_slurm(
            job_argvs, job_dirs, sbatch=sbatch, multihost=multihost,
            **launcher_opts,
        )

    results = []
    for i, (combo, job_args) in enumerate(zip(combos, job_argvs)):
        cfg = build_experiment(job_args)
        logger.info("multirun job %d: %s", i, list(combo))
        if print_cfg:
            import yaml

            print(f"# --- job {i}: {list(combo)}")
            print(yaml.safe_dump(cfg, sort_keys=False))
            results.append(cfg)
        else:
            results.append(run_experiment(cfg))
    return results


if __name__ == "__main__":
    main()
