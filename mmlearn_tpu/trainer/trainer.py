"""The training loop — TPU-native replacement for Lightning's ``Trainer``.

The reference delegates its runtime to PyTorch Lightning
(/root/reference/mmlearn/cli/run.py:141-146); this Trainer is the explicit
JAX equivalent (SURVEY.md §7 "Runtime layer"):

- one jit-compiled ``train_step(state, batch, rng) -> (state, metrics)``,
  value_and_grad + optax update + task ``post_update`` (EMA), with the
  TrainState **donated** (no HBM double-buffering of params);
- SPMD via GSPMD: a ``(data, fsdp, model)`` mesh; the TrainState is
  device_put with name-rule-inferred shardings
  (:func:`mmlearn_tpu.parallel.partitioning.infer_param_specs`), batches are
  sharded over the ``data``×``fsdp`` axes; XLA inserts all collectives;
- gradient accumulation via ``optax.MultiSteps``, optional global-norm
  clipping, bf16 input casting;
- validation/test loops driving the task's ``EvaluationHooks``
  (reference eval flow: contrastive_pretraining.py:642-701);
- Orbax checkpointing via the ModelCheckpoint callback; ``fit(...,
  ckpt_path=...)`` resumes the full state (params, opt, EMA, step).
"""

from __future__ import annotations

import itertools
import logging
import time
from typing import Any, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmlearn_tpu.compile_opts import step_jit
from mmlearn_tpu.parallel import (
    create_mesh,
    infer_param_specs,
    param_shardings,
    set_global_mesh,
    shard_batch,
)
from mmlearn_tpu.tasks.hooks import EvalRuntime
from mmlearn_tpu.tasks.hooks import device_batch as _device_batch
from mmlearn_tpu.trainer.state import TrainState

logger = logging.getLogger(__name__)

#: dense bf16 peak TFLOP/s per chip, keyed by normalized ``device_kind``
#: substrings (public TPU spec sheets); used for the opt-in MFU metric
_TPU_PEAK_TFLOPS = (
    ("v6", 918.0),  # Trillium / v6e
    ("v5p", 459.0),
    ("v5 lite", 197.0),
    ("v5litepod", 197.0),
    ("v5e", 197.0),
    ("v5", 459.0),  # bare "TPU v5" reports as v5p
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 46.0),
)


def _device_peak_tflops() -> Optional[float]:
    """Per-chip peak TFLOP/s for the current backend; ``MMLEARN_PEAK_TFLOPS``
    overrides (required for CPU or unrecognized accelerators)."""
    import os

    env = os.environ.get("MMLEARN_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = jax.devices()[0].device_kind.lower()
    if "tpu" not in kind and not kind.startswith("v"):
        return None
    for key, peak in _TPU_PEAK_TFLOPS:
        if key in kind:
            return peak
    return None


def _compiled_step_flops(jitted: Any, *args: Any) -> float:
    """GLOBAL analytic FLOPs of one step (jaxpr walk, not XLA cost analysis).

    XLA's ``compiled.cost_analysis()`` counts a ``lax.scan`` body once
    regardless of trip count and Pallas custom-calls as zero, so every
    ``scan_blocks=True`` tower under-reported by ~depth× (measured round 5).
    The jaxpr walker in :mod:`mmlearn_tpu.trainer.flops` multiplies scan
    bodies by their length and recurses into Pallas kernels/remat, and
    needs no device compile. Returns the GLOBAL (logical) figure: compare
    against ``peak × n_devices``, or divide by the mesh size for
    per-device."""
    from mmlearn_tpu.trainer.flops import step_flops

    return step_flops(jitted, *args)


def validate_batch_shapes(batch: Mapping[str, Any], context: str = "train") -> int:
    """Assert a collated batch is jit-safe: consistent leading dim, no object
    dtypes, no zero-size arrays.

    This is the SPMD replacement for the reference's collective-hazard
    choreography (SURVEY.md §5.2): under GSPMD every device runs the same
    program, so the remaining failure mode is a malformed host batch — catch
    it eagerly with a readable error instead of an XLA shape error.
    """
    from mmlearn_tpu.datasets.core.modalities import Modalities

    batch_dim: Optional[int] = None
    offender = None
    for key, value in batch.items():
        if isinstance(value, Mapping):
            validate_batch_shapes(value, context=f"{context}.{key}")
            continue
        if not hasattr(value, "shape") or np.ndim(value) == 0:
            continue
        if getattr(value, "dtype", None) == object:
            raise ValueError(
                f"[{context}] batch key '{key}' has object dtype — collate "
                "must produce numeric arrays (strings stay python lists)"
            )
        if int(np.prod(np.shape(value))) == 0:
            raise ValueError(f"[{context}] batch key '{key}' is empty")
        # leading-dim consistency is enforced only across modality keys
        # (aux arrays like I-JEPA masks legitimately lead with num_masks)
        if not Modalities.has_modality(str(key)):
            continue
        lead = int(np.shape(value)[0])
        if batch_dim is None:
            batch_dim, offender = lead, key
        elif lead != batch_dim:
            raise ValueError(
                f"[{context}] inconsistent batch dims: '{offender}' has "
                f"{batch_dim} but '{key}' has {lead}"
            )
    return batch_dim or 0


def _resolve_limit(limit: Any, loader: Any, name: str) -> Optional[int]:
    """Resolve a ``limit_*_batches`` value to an integer batch count.

    Lightning float-fraction parity (reference exposes Lightning's full
    Trainer signature, /root/reference/mmlearn/conf/__init__.py:120-129):
    a float in [0.0, 1.0] means that fraction of the loader's batches
    (1.0 = everything, 0.0 = phase disabled). The fraction is resolved to
    a static integer count here, at loop setup, so jitted step shapes and
    loop bounds stay static. Ints and None pass through unchanged.
    """
    if limit is None or isinstance(limit, int):
        return limit
    fraction = float(limit)
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(
            f"{name}={limit!r}: float limits are fractions and must lie in "
            "[0.0, 1.0]; pass an int for an absolute batch count"
        )
    if fraction == 1.0:
        return None
    try:
        n = len(loader)
    except TypeError:
        raise ValueError(
            f"{name}={limit!r}: float fractions need a sized dataloader; "
            "this loader has no length (streaming/iterable) — pass an int "
            "batch count instead"
        ) from None
    resolved = int(n * fraction)
    if resolved == 0 and fraction > 0.0:
        raise ValueError(
            f"{name}={limit!r} of {n} batches resolves to 0 batches; "
            "increase the fraction or pass an int"
        )
    return resolved


class Trainer:
    """Explicit SPMD training loop (see module docstring)."""

    def __init__(
        self,
        max_epochs: Optional[int] = None,
        max_steps: Optional[int] = None,
        limit_train_batches: Optional[Union[int, float]] = None,
        limit_val_batches: Optional[Union[int, float]] = None,
        limit_test_batches: Optional[Union[int, float]] = None,
        overfit_batches: Union[int, float] = 0.0,
        check_val_every_n_epoch: int = 1,
        val_check_interval: Optional[Union[int, float]] = None,
        log_every_n_steps: int = 50,
        precision: Optional[str] = None,
        accumulate_grad_batches: int = 1,
        gradient_clip_val: Optional[float] = None,
        gradient_clip_algorithm: str = "norm",
        mesh_shape: Optional[Mapping[str, int]] = None,
        callbacks: Optional[Sequence[Any]] = None,
        loggers: Optional[Sequence[Any]] = None,
        default_root_dir: str = "outputs",
        seed: int = 0,
        num_sanity_val_steps: int = 0,
        enable_profiling: bool = False,
        donate_state: bool = True,
        prefetch_batches: int = 2,
        prefetch_timeout_s: float = 300.0,
        device_normalize: Optional[Mapping[str, Mapping[str, Any]]] = None,
        fast_dev_run: Any = False,
        detect_anomaly: bool = False,
        log_mfu: bool = False,
        compilation_cache_dir: Optional[str] = None,
    ) -> None:
        # Lightning-surface parity (reference exposes the full Trainer
        # signature as config, /root/reference/mmlearn/conf/__init__.py:
        # 120-129; intentional omissions are documented in PARITY.md)
        if fast_dev_run:
            # Lightning semantics: run N (default 1) train/val batches,
            # no checkpointing/logging artifacts — a wiring smoke test
            n = 1 if fast_dev_run is True else int(fast_dev_run)
            max_epochs, max_steps = 1, n
            limit_train_batches = n
            limit_val_batches = n
            limit_test_batches = n
            callbacks = [
                c for c in (callbacks or [])
                if not hasattr(c, "restore_latest")  # drop ModelCheckpoint
            ]
        if detect_anomaly:
            # nearest JAX analogue of torch.autograd.set_detect_anomaly:
            # jitted code raises on the first NaN it produces
            jax.config.update("jax_debug_nans", True)
        if compilation_cache_dir:
            # persistent XLA compile cache: re-runs/resumes/sweeps of the
            # same step skip the minutes-long TPU compile (biggest UX cost
            # of iterating on TPU; one cache dir can be shared across jobs)
            jax.config.update(
                "jax_compilation_cache_dir", str(compilation_cache_dir)
            )
        if precision in ("fp16", "16-mixed", "16"):
            # TPUs have no fp16 units; the fp16-mixed config alias maps to
            # bf16-mixed (same dynamic-range intent, no loss scaling needed)
            logger.info(
                "precision=%r maps to 'bf16-mixed' on TPU", precision
            )
            precision = "bf16-mixed"
        if isinstance(overfit_batches, int) and overfit_batches < 0:
            raise ValueError(
                f"overfit_batches={overfit_batches!r} must be >= 0 (0 "
                "disables; an int is a batch count, a float a fraction)"
            )
        if gradient_clip_algorithm not in ("norm", "value"):
            raise ValueError(
                "gradient_clip_algorithm must be 'norm' or 'value', got "
                f"{gradient_clip_algorithm!r}"
            )
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        self.overfit_batches = overfit_batches
        # resolved against the concrete train loader at fit() time
        self._limit_train: Optional[int] = (
            limit_train_batches
            if isinstance(limit_train_batches, int) or limit_train_batches is None
            else None
        )
        self._val_interval: Optional[int] = (
            val_check_interval
            if isinstance(val_check_interval, int) or val_check_interval is None
            else None
        )
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.val_check_interval = val_check_interval
        self.log_every_n_steps = log_every_n_steps
        self.precision = precision
        self.accumulate_grad_batches = accumulate_grad_batches
        self.gradient_clip_val = gradient_clip_val
        self.gradient_clip_algorithm = gradient_clip_algorithm
        self.callbacks = list(callbacks or [])
        self.loggers = list(loggers or [])
        self.default_root_dir = default_root_dir
        self.seed = seed
        self.num_sanity_val_steps = num_sanity_val_steps
        self.enable_profiling = enable_profiling
        self.donate_state = donate_state
        #: DeviceFeeder queue depth for the fit loop (prepared host batches
        #: + their device buffers held ahead of the step; keep small)
        self.prefetch_batches = max(1, int(prefetch_batches))
        #: per-batch wait bound before the fit loop declares the producer
        #: dead — raise it for sources with legitimately slow batches
        #: (cold remote storage, first batch of a heavy stream)
        self.prefetch_timeout_s = float(prefetch_timeout_s)
        self._active_feeder: Optional[Any] = None
        self.device_normalize = dict(device_normalize or {})
        #: log achieved TFLOP/s (+ MFU where the chip's peak is known) from
        #: XLA's cost analysis of the compiled train step — beyond the
        #: reference's observability (SURVEY.md §5.1: Lightning profiler
        #: flag only). Opt-in: the analysis costs one extra lowering of the
        #: step function at the first batch.
        self.log_mfu = log_mfu
        #: per-device FLOPs of one compiled train step (XLA analyzes the
        #: partitioned module); filled lazily, 0.0 marks "analysis failed,
        #: don't retry"
        self._step_flops: Optional[float] = None

        if precision == "bf16-mixed":
            # "mixed" opts into relaxed attention-score precision as well
            # (+24% measured on v5e; mirrors torch autocast semantics) —
            # plain "bf16" keeps f32 scores
            import os

            os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")

        shape = dict(mesh_shape or {})
        self.mesh = create_mesh(
            data=shape.get("data", -1),
            fsdp=shape.get("fsdp", 1),
            model=shape.get("model", 1),
            seq=shape.get("seq", 1),
            slices=shape.get("slices", 1),
        )
        set_global_mesh(self.mesh)
        # multi-device meshes run the fused MHA kernel per-shard via the
        # shard_map wrapper in ops/fused_attention._shard_map_plan (batch
        # over data×fsdp, heads over model); MMLEARN_FUSED_ATTN=0 or
        # MMLEARN_FUSED_ATTN_SHARD=0 fall back to partitionable XLA math.

        self.state: Optional[TrainState] = None
        #: step the run was restored from (None for fresh runs) — used by
        #: ModelCheckpoint to make the resumed-completed-run save idempotent
        self.restored_step: Optional[int] = None
        #: Lightning parity: set True (by a callback, a task, or the
        #: SIGTERM/SIGUSR1 preemption handler installed during fit) to end
        #: training cleanly after the in-flight step
        self.should_stop = False
        #: (epoch, batch_in_epoch) of the next batch to consume — persisted
        #: by ModelCheckpoint for streaming/iterable mid-epoch resume
        self.loop_position: Optional[dict] = None
        self._lr_schedule = None
        self._train_step = None
        self._val_loss_step = None

    # -- setup -----------------------------------------------------------------
    def _batches_per_epoch(self, train_loader: Any) -> Optional[int]:
        """len(loader) clipped by limit_train_batches; None if unsized."""
        try:
            per_epoch = len(train_loader)
        except TypeError:
            return None
        limit = _resolve_limit(
            self.limit_train_batches, train_loader, "limit_train_batches"
        )
        if limit is not None:
            # Lightning semantics: 0 disables training batches entirely
            per_epoch = min(per_epoch, limit)
        return per_epoch

    def _resolve_val_interval(self, train_loader: Any) -> Optional[int]:
        """Lightning parity: a float ``val_check_interval`` in (0.0, 1.0]
        means that fraction of the (limit-clipped) training epoch between
        validations, resolved to a static step interval at fit() time."""
        interval = self.val_check_interval
        if interval is None or isinstance(interval, int):
            return interval
        fraction = float(interval)
        if not 0.0 < fraction <= 1.0:
            raise ValueError(
                f"val_check_interval={interval!r}: float intervals are "
                "fractions of the training epoch and must lie in (0.0, 1.0]; "
                "pass an int for an absolute step interval"
            )
        per_epoch = self._batches_per_epoch(train_loader)
        if per_epoch is None:
            raise ValueError(
                f"val_check_interval={interval!r}: float fractions need a "
                "sized train dataloader; this loader has no length "
                "(streaming/iterable) — pass an int step interval instead"
            )
        return max(1, int(per_epoch * fraction))

    def _resolve_max_steps(self, train_loader: Any) -> int:
        if self.max_steps is not None:
            return self.max_steps
        if self.max_epochs is not None:
            per_epoch = self._batches_per_epoch(train_loader)
            if per_epoch is not None:
                return self.max_epochs * per_epoch
        return 1000

    def _build_tx(self, task: Any, max_steps: int) -> optax.GradientTransformation:
        tx = task.configure_optimizers(max_steps=max_steps)
        self._lr_schedule = getattr(task, "_resolved_schedule", None)
        chain = []
        if self.gradient_clip_val:
            # Lightning gradient_clip_algorithm parity: "norm" (global L2
            # norm, the default) or "value" (elementwise clamp)
            if self.gradient_clip_algorithm == "value":
                chain.append(optax.clip(self.gradient_clip_val))
            else:
                chain.append(optax.clip_by_global_norm(self.gradient_clip_val))
        chain.append(tx)
        tx = optax.chain(*chain) if len(chain) > 1 else tx
        if self.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate_grad_batches)
        return tx

    def _device_normalize(self, batch: dict[str, Any]) -> dict[str, Any]:
        """Normalize uint8 image batches on device, inside the jitted step.

        Datasets opt in by emitting uint8 pixels (``ImageTransform(
        device_normalize=True)``) — the host→device transfer is then 4x
        smaller than float32 and the ``(x/255 - mean)/std`` arithmetic fuses
        into the first conv's operand read. Stats come from the trainer's
        ``device_normalize`` config, e.g.
        ``{"rgb": {"mean": CLIP_MEAN, "std": CLIP_STD}}``.
        """
        compute_dtype = (
            jnp.bfloat16
            if self.precision in ("bf16", "bf16-mixed", "bfloat16")
            else jnp.float32
        )
        out = dict(batch)
        for key, val in batch.items():
            if getattr(val, "dtype", None) != jnp.uint8:
                continue
            if getattr(val, "ndim", 0) < 3:
                continue  # uint8 non-image payloads pass through
            stats = self.device_normalize.get(key)
            if stats is None:
                raise ValueError(
                    f"batch['{key}'] is uint8 but no normalization stats are "
                    f"configured — set trainer.device_normalize.{key}."
                    "{mean,std} (or use a host-side float transform)"
                )
            mean = jnp.asarray(stats["mean"], jnp.float32)
            std = jnp.asarray(stats["std"], jnp.float32)
            x = val.astype(jnp.float32) / 255.0
            out[key] = ((x - mean) / std).astype(compute_dtype)
        return out

    def _cast_inputs(self, batch: dict[str, Any]) -> dict[str, Any]:
        if self.precision not in ("bf16", "bf16-mixed", "bfloat16"):
            return batch

        def _cast(x):
            if hasattr(x, "dtype") and np.issubdtype(np.asarray(x).dtype, np.floating):
                return np.asarray(x, dtype=jnp.bfloat16)
            return x

        return jax.tree.map(_cast, batch)

    def _init_state(self, task: Any, tx: Any, sample_batch: dict[str, Any]) -> None:
        rng = jax.random.key(self.seed)

        def init_fn(rng):
            params = task.init_params(rng, self._device_normalize(sample_batch))
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=tx.init(params),
                extras=task.init_extras(params),
            )

        abstract = jax.eval_shape(init_fn, rng)
        self._state_specs = infer_param_specs(abstract, self.mesh)
        self._state_shardings = param_shardings(self._state_specs, self.mesh)
        with self.mesh:
            self.state = jax.jit(init_fn, out_shardings=self._state_shardings)(rng)
        overlay = getattr(task, "init_overlay", None)
        if overlay is not None:
            # imported weights (e.g. a reference Lightning checkpoint via
            # lightning_import) land on the freshly initialized tree, then
            # extras are re-derived — for I-JEPA that re-copies the EMA
            # teacher from the imported student, exactly the reference's
            # on_load_checkpoint restore semantics (reference
            # tasks/ijepa.py:205-215). Optimizer state stays zero-init.
            from mmlearn_tpu.lightning_import import overlay_params

            merged = overlay_params(jax.device_get(self.state.params), overlay)
            params = jax.device_put(merged, self._state_shardings.params)
            self.state = self.state.replace(
                params=params,
                # `merged` already is the host copy of the overlaid params —
                # a device_get(params) here would round-trip the whole tree
                # through the (possibly tunneled) transport a second time
                extras=jax.device_put(
                    task.init_extras(merged), self._state_shardings.extras
                ),
            )
            logger.info("applied init overlay onto initialized parameters")
        n_params = sum(
            int(np.prod(np.shape(p))) for p in jax.tree.leaves(self.state.params)
        )
        logger.info(
            "Initialized %d parameters over mesh %s", n_params, dict(self.mesh.shape)
        )

    def _make_train_step(self, task: Any, tx: Any):
        accumulate = self.accumulate_grad_batches

        def step_fn(state: TrainState, batch: dict, rng: jax.Array):
            batch = self._device_normalize(batch)

            def loss_wrap(params):
                loss, (metrics, new_extras) = task.loss_fn(
                    params, batch, rng, state.extras, deterministic=False
                )
                return loss, (metrics, new_extras)

            (_, (metrics, new_extras)), grads = jax.value_and_grad(
                loss_wrap, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if accumulate > 1:
                # optax.MultiSteps applies params every k micro-steps; EMA
                # teachers must update once per *optimizer* step (reference
                # on_before_zero_grad cadence, mmlearn/tasks/ijepa.py:108-115)
                # and anneal on optimizer-step counts. mini_step wraps to 0
                # exactly when an update was applied.
                applied = opt_state.mini_step == 0
                opt_step = opt_state.gradient_step - 1
                extras = jax.lax.cond(
                    applied,
                    lambda e: task.post_update(params, e, opt_step),
                    lambda e: e,
                    new_extras,
                )
            else:
                extras = task.post_update(params, new_extras, state.step)
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                extras=extras,
            )
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        donate = (0,) if self.donate_state else ()
        return step_jit(step_fn, donate_argnums=donate)

    def _make_val_step(self, task: Any):
        def val_fn(params, batch, extras, rng):
            batch = self._device_normalize(batch)
            loss, (metrics, _) = task.loss_fn(
                params, batch, rng, extras, deterministic=True
            )
            return metrics

        return step_jit(val_fn)

    # -- public API --------------------------------------------------------------
    def _install_stop_handlers(self):
        """Route SIGTERM/SIGUSR1 to a clean stop request.

        SLURM preemption sends SIGTERM (or SIGUSR1 with ``--signal``); the
        handler sets ``should_stop`` so the fit loop exits after the
        in-flight step and writes the end-of-train checkpoint. Returns the
        previous handlers for restoration; no-ops outside the main thread
        (where ``signal.signal`` raises) and never fails training setup.
        """
        import signal

        def _request_stop(signum, frame):
            logger.warning(
                "Received signal %d — requesting clean stop (checkpoint + "
                "exit after the current step)", signum,
            )
            self.should_stop = True

        prev = {}
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                prev[sig] = signal.signal(sig, _request_stop)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass
        return prev

    @staticmethod
    def _restore_stop_handlers(prev) -> None:
        import signal

        for sig, handler in prev.items():
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):  # pragma: no cover
                pass

    def _apply_overfit(self, train_loader: Any, val_loader: Any) -> Any:
        """Lightning ``overfit_batches`` semantics (the reference exposes it
        via the full Trainer signature, reference conf/__init__.py:120-129):
        train on a fixed leading subset of the training data with shuffling
        disabled, and validate on the SAME batches — Lightning substitutes
        the train dataloader for the val dataloader. An int is an absolute
        batch count, a float a fraction of the training epoch; 0 disables.
        """
        if not self.overfit_batches:
            return val_loader
        n = _resolve_limit(
            self.overfit_batches, train_loader, "overfit_batches"
        )
        if self.limit_train_batches not in (None, n) or (
            val_loader is not None and self.limit_val_batches not in (None, n)
        ):
            logger.warning(
                "overfit_batches=%r overrides limit_train_batches/"
                "limit_val_batches",
                self.overfit_batches,
            )
        self.limit_train_batches = n
        # every epoch must replay the same leading batches, so shuffling
        # samplers are downgraded (mirrors Lightning's warning + override)
        sampler = getattr(train_loader, "sampler", None)
        if sampler is not None:
            from mmlearn_tpu.datasets.core.samplers import (
                RandomSampler,
                SequentialSampler,
            )

            if isinstance(sampler, RandomSampler):
                train_loader.sampler = SequentialSampler(train_loader.dataset)
                logger.warning(
                    "overfit_batches: train-loader shuffling disabled so "
                    "each epoch replays the same batches"
                )
            elif getattr(sampler, "shuffle", False):
                sampler.shuffle = False
                logger.warning(
                    "overfit_batches: sampler shuffle=False so each epoch "
                    "replays the same batches"
                )
        if val_loader is not None:
            val_loader = train_loader
            self.limit_val_batches = n
        return val_loader

    def fit(
        self,
        task: Any,
        train_loader: Any,
        val_loader: Any = None,
        ckpt_path: Optional[str] = None,
        strict_loading: bool = True,
    ) -> TrainState:
        val_loader = self._apply_overfit(train_loader, val_loader)
        max_steps = self._resolve_max_steps(train_loader)
        tx = self._build_tx(task, max_steps)
        # float fractions become static counts once, against this loader
        self._limit_train = _resolve_limit(
            self.limit_train_batches, train_loader, "limit_train_batches"
        )
        self._val_interval = self._resolve_val_interval(train_loader)

        try:
            if len(train_loader) == 0:
                raise ValueError(
                    "train_loader yields no batches (dataset smaller than "
                    "batch_size with drop_last?)"
                )
        except TypeError:
            pass
        task.prepare_seed = self.seed
        # shape-inference probe: keep the iterator and replay the probed batch
        # so iterable/streaming loaders do not lose their first batch
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(0)
        probe_iter = iter(train_loader)
        first_raw = next(probe_iter)
        first_batch = task.prepare_batch(dict(first_raw), step=0)
        sample = self._cast_inputs(_device_batch(first_batch))
        validate_batch_shapes(sample)
        self._init_state(task, tx, sample)

        ckpt_cb = next(
            (c for c in self.callbacks if hasattr(c, "restore_latest")), None
        )
        if ckpt_path is not None:
            if ckpt_cb is None:
                # restore-only callback (not registered: saving behavior is
                # still governed by the user's callback config)
                from mmlearn_tpu.trainer.callbacks import ModelCheckpoint

                ckpt_cb = ModelCheckpoint(dirpath=None)
            if ckpt_path != "last":
                ckpt_cb.dirpath = ckpt_path
                ckpt_cb._manager = None  # cached manager may hold the old dir
            restored = ckpt_cb.restore_latest(self, strict=strict_loading)
            if restored is not None:
                self.state = restored
                # checkpoint idempotence: the end-of-train save may re-fire
                # for this exact step on a resumed-completed run
                self.restored_step = int(self.state.step)
                if hasattr(ckpt_cb, "read_loop_position"):
                    self._restored_position = ckpt_cb.read_loop_position(self)
            elif ckpt_path == "last":
                # preemption-relaunch idiom: resume_from_checkpoint=last on a
                # fresh run starts from scratch, but never silently for an
                # explicit path
                logger.warning(
                    "resume_from_checkpoint='last': no checkpoint found — "
                    "starting from scratch"
                )
            else:
                raise FileNotFoundError(
                    f"No checkpoint found under '{ckpt_path}'"
                )

        self._train_step = self._make_train_step(task, tx)
        if val_loader is not None and task.compute_validation_loss:
            self._val_loss_step = self._make_val_step(task)

        for cb in self.callbacks:
            cb.on_train_start(self)

        # graceful preemption (Lightning parity: trainer.should_stop + its
        # SIGTERM handling). SIGTERM/SIGUSR1 (SLURM's preemption warning)
        # request a clean stop after the in-flight step; the normal
        # end-of-train path then writes a resumable checkpoint via
        # ModelCheckpoint.on_train_end. Callbacks/tasks may also set
        # ``trainer.should_stop = True`` directly.
        self.should_stop = False
        prev_handlers = self._install_stop_handlers()

        rng_root = jax.random.key(self.seed + 1)
        step = int(self.state.step)
        # resume mid-training at the right epoch: the epoch-seeded sampler
        # would otherwise replay epoch-0 data (reference semantics: Lightning
        # restores the loop position — mmlearn delegates via
        # resume_from_checkpoint, reference cli/run.py:141-146)
        epoch = 0
        skip_batches = 0
        if step > 0:
            per_epoch = self._batches_per_epoch(train_loader)
            pos = getattr(self, "_restored_position", None)
            if per_epoch is not None:
                epoch, skip_batches = divmod(step, per_epoch)
            elif pos is not None and pos.get("step") == step:
                # unsized (iterable/streaming) loader: position is not
                # derivable from the step count — use the persisted
                # (epoch, batch_in_epoch) saved beside the checkpoint; the
                # stream is a pure function of (seed, epoch, rank), so
                # set_epoch(epoch) + skipping the consumed batches
                # fast-forwards it exactly
                epoch = int(pos.get("epoch", 0))
                skip_batches = int(pos.get("batch_in_epoch", 0))
            else:
                logger.warning(
                    "Resuming at step %d with an unsized loader and no "
                    "persisted loop position — the stream RESTARTS from "
                    "epoch 0 and already-seen data will repeat. Use "
                    "ModelCheckpoint (which persists loop_position.json) "
                    "to resume streams mid-epoch.",
                    step,
                )
            if epoch > 0 or skip_batches > 0:
                # the shape probe consumed epoch-0 batches; start clean
                probe_iter = None
                logger.info(
                    "Resuming at step %d → epoch %d, skipping %d batches",
                    step, epoch, skip_batches,
                )
        # resuming a completed run must not train extra steps
        done = step >= max_steps
        t_log = time.perf_counter()
        examples_since_log = 0

        if self.num_sanity_val_steps and val_loader is not None:
            # Lightning semantics: -1 = sanity-check the FULL val set
            self._run_evaluation(
                task, val_loader, "validation",
                limit_batches=self.num_sanity_val_steps, log=False,
            )

        try:
            return self._fit_loop(
                task, train_loader, val_loader, done, epoch,
                probe_iter, first_raw, skip_batches, step, max_steps,
                rng_root, t_log, examples_since_log,
            )
        finally:
            self._close_feeder()  # abnormal exits must release the producer
            self._restore_stop_handlers(prev_handlers)

    def _epoch_feeder(
        self, task, epoch_iter, epoch_base, skip_batches, step0, max_steps
    ):
        """One epoch's batches through the framework ``DeviceFeeder``:
        limit/skip accounting, ``task.prepare_batch`` (pure per-step), input
        casting, and the mesh-sharded host→device transfer all run on the
        feeder's producer thread, overlapping the async device step. Yields
        ``(batch_idx, host_batch, device_batch)``. Same entry point
        bench.py's input-fed phases use (VERDICT r4 item 5)."""
        from mmlearn_tpu.datasets.core.loader import DeviceFeeder

        def source():
            s = step0
            skips = skip_batches
            for batch_idx, raw in enumerate(epoch_iter, start=epoch_base):
                if (
                    self._limit_train is not None
                    and batch_idx >= self._limit_train
                ):
                    return
                if skips > 0:
                    # batches consumed before the checkpoint in the resumed
                    # (partial) epoch
                    skips -= 1
                    continue
                yield batch_idx, task.prepare_batch(dict(raw), step=s)
                s += 1
                if s >= max_steps:
                    # stop the producer at the run's last step: without this
                    # bound the prefetch thread reads (and decodes) batches
                    # past max_steps that no step will ever consume
                    return

        def place(item):
            batch_idx, batch = item
            device_batch = shard_batch(
                self._cast_inputs(_device_batch(batch)), self.mesh
            )
            return batch_idx, batch, device_batch

        feeder = DeviceFeeder(
            source(), device_put=place, prefetch=self.prefetch_batches,
            timeout_s=self.prefetch_timeout_s,
        )
        self._active_feeder = feeder
        return feeder

    def _close_feeder(self) -> None:
        feeder, self._active_feeder = self._active_feeder, None
        if feeder is not None:
            feeder.close()

    def _fit_loop(
        self, task, train_loader, val_loader, done, epoch,
        probe_iter, first_raw, skip_batches, step, max_steps, rng_root,
        t_log, examples_since_log,
    ) -> TrainState:
        steps_since_log = 0
        per_epoch_n = self._batches_per_epoch(train_loader)
        while not done:
            if self.max_epochs is not None and epoch >= self.max_epochs:
                break
            epoch_base = 0
            epoch_completed = False
            if epoch == 0 and probe_iter is not None:
                # replay the probed batch, continue the same iterator
                epoch_iter = itertools.chain([first_raw], probe_iter)
                probe_iter = None
            else:
                if hasattr(train_loader, "set_epoch"):
                    # overfit_batches: pin the sampler epoch so epoch-seeded
                    # samplers (e.g. CombinedDatasetRatioSampler re-seeds its
                    # multinomial draws with seed+epoch regardless of
                    # shuffle) replay the exact same leading batches
                    train_loader.set_epoch(0 if self.overfit_batches else epoch)
                epoch_iter = train_loader
                if skip_batches > 0 and hasattr(train_loader, "iter_from_batch"):
                    # fast-forward without loading/decoding skipped examples
                    # (map-style data only; streams keep the fetch-and-drop
                    # fallback below so their positions stay consistent)
                    fast = train_loader.iter_from_batch(skip_batches)
                    if fast is not None:
                        epoch_iter, epoch_base = fast, skip_batches
                        skip_batches = 0
            feeder = self._epoch_feeder(
                task, epoch_iter, epoch_base, skip_batches, step, max_steps
            )
            skip_batches = 0  # consumed by the feeder's source
            for batch_idx, batch, device_batch in feeder:
                rng = jax.random.fold_in(rng_root, step)
                if self.log_mfu and self._step_flops is None:
                    # one extra lowering of the step fn; the XLA compile
                    # itself hits the jit/persistent cache on real runs
                    try:
                        with self.mesh:
                            self._step_flops = _compiled_step_flops(
                                self._train_step, self.state, device_batch,
                                rng,
                            )
                        logger.info(
                            "Train step: %.2f GFLOPs global across %d "
                            "devices (incl. remat recompute)",
                            self._step_flops / 1e9, self.mesh.size,
                        )
                    except Exception as err:
                        self._step_flops = 0.0  # don't retry every step
                        logger.warning(
                            "log_mfu: analytic FLOPs trace failed "
                            "(mmlearn_tpu/trainer/flops.py): %s",
                            err,
                        )
                if self.enable_profiling and step == 5:
                    # capture a 5-step XLA trace (view with tensorboard /
                    # xprof); SURVEY.md §5.1 — the reference exposes only
                    # Lightning's profiler flag
                    jax.profiler.start_trace(
                        f"{self.default_root_dir}/profile"
                    )
                    self._profiling_active = True
                with self.mesh:
                    self.state, metrics = self._train_step(
                        self.state, device_batch, rng
                    )
                if (
                    self.enable_profiling
                    and getattr(self, "_profiling_active", False)
                    and step >= 10
                ):
                    # >= and the active flag: a resume past step 5 must not
                    # stop a trace that never started, and a window cut
                    # short (val/eval in between) still closes
                    jax.tree.leaves(self.state.params)[0].block_until_ready()
                    jax.profiler.stop_trace()
                    self._profiling_active = False
                    logger.info(
                        "Wrote profiler trace to %s/profile",
                        self.default_root_dir,
                    )
                step += 1
                # fit-loop position for streaming resume: the next batch to
                # consume is batch_idx+1 of this epoch (persisted by
                # ModelCheckpoint beside every save)
                self.loop_position = {
                    "epoch": epoch, "batch_in_epoch": batch_idx + 1
                }
                examples_since_log += self._batch_size_of(batch)
                steps_since_log += 1

                if step % self.log_every_n_steps == 0 or step >= max_steps:
                    host_metrics = {
                        k: float(v) for k, v in jax.device_get(metrics).items()
                    }
                    now = time.perf_counter()
                    if now > t_log:
                        host_metrics["examples_per_sec"] = examples_since_log / (
                            now - t_log
                        )
                        if self._step_flops:
                            # _step_flops is already the GLOBAL figure
                            tflops = (
                                self._step_flops
                                * steps_since_log / (now - t_log) / 1e12
                            )
                            host_metrics["tflops_per_sec"] = tflops
                            peak = _device_peak_tflops()
                            if peak:
                                host_metrics["mfu"] = tflops / (
                                    peak * self.mesh.size
                                )
                    t_log = now
                    examples_since_log = 0
                    steps_since_log = 0
                    for cb in self.callbacks:
                        cb.on_train_batch_end(self, host_metrics, step)
                    for lg in self.loggers:
                        lg.log_metrics(
                            {f"train/{k}": v for k, v in host_metrics.items()}, step
                        )
                else:
                    for cb in self.callbacks:
                        cb.on_train_batch_end(self, {}, step)

                if (
                    self._val_interval
                    and val_loader is not None
                    and step % self._val_interval == 0
                ):
                    self._run_evaluation(task, val_loader, "validation", step=step)

                if step >= max_steps:
                    done = True
                    # Lightning validates at the end of EVERY epoch the
                    # schedule completes, including the last: when the step
                    # budget runs out exactly at an epoch boundary (the
                    # normal max_epochs case), the epoch-end validation
                    # below must still fire
                    epoch_completed = (
                        per_epoch_n is not None
                        and batch_idx + 1 >= per_epoch_n
                    )
                    break
                if self.should_stop:
                    logger.warning(
                        "Stop requested at step %d (signal or "
                        "trainer.should_stop) — ending training cleanly; "
                        "the end-of-train checkpoint makes this resumable.",
                        step,
                    )
                    done = True
                    break
            self._close_feeder()

            if (
                (not done or epoch_completed)
                and val_loader is not None
                and self.val_check_interval is None
                and (epoch + 1) % self.check_val_every_n_epoch == 0
            ):
                self._run_evaluation(task, val_loader, "validation", step=step)
            if not done:
                self.loop_position = {"epoch": epoch + 1, "batch_in_epoch": 0}
            for cb in self.callbacks:
                cb.on_train_epoch_end(self, epoch)
            epoch += 1
            if self.max_epochs is None and self.max_steps is None:
                done = True

        if getattr(self, "_profiling_active", False):
            # runs shorter than the 10-step window still get their trace
            jax.profiler.stop_trace()
            self._profiling_active = False
            logger.info(
                "Wrote profiler trace to %s/profile", self.default_root_dir
            )
        for cb in self.callbacks:
            cb.on_train_end(self)
        for lg in self.loggers:
            lg.finalize()
        return self.state

    def prepare_eval_state(
        self, task: Any, loader: Any, ckpt_path: Optional[str] = None,
        strict_loading: bool = True,
    ) -> TrainState:
        """Initialize (and optionally restore) a TrainState for eval-only jobs.

        The optimizer state is constructed so checkpoint trees line up with
        training-time saves (reference: ``trainer.test(..., ckpt_path=...)``,
        cli/run.py:145-146).
        """
        task.prepare_seed = self.seed
        first = next(iter(loader))
        first = task.prepare_batch(dict(first), step=0, training=False)
        sample = self._cast_inputs(_device_batch(first))
        tx = self._build_tx(task, max_steps=1)
        self._init_state(task, tx, sample)
        if ckpt_path is not None:
            ckpt_cb = next(
                (c for c in self.callbacks if hasattr(c, "restore_latest")), None
            )
            if ckpt_cb is None:
                from mmlearn_tpu.trainer.callbacks import ModelCheckpoint

                ckpt_cb = ModelCheckpoint(dirpath=None)
            if ckpt_path != "last":
                ckpt_cb.dirpath = ckpt_path
                ckpt_cb._manager = None
            restored = ckpt_cb.restore_latest(self, strict=strict_loading)
            if restored is None:
                raise FileNotFoundError(
                    f"No checkpoint found under '{ckpt_path}'"
                )
            self.state = restored
        return self.state

    def validate(self, task: Any, loader: Any, state: Optional[TrainState] = None):
        return self._run_evaluation(task, loader, "validation", state=state)

    def test(self, task: Any, loader: Any, state: Optional[TrainState] = None):
        return self._run_evaluation(task, loader, "test", state=state)

    # -- evaluation --------------------------------------------------------------
    def _batch_size_of(self, batch: Mapping[str, Any]) -> int:
        # prefer modality keys: aux arrays (e.g. I-JEPA masks) legitimately
        # lead with num_masks, not batch (same filter as validate_batch_shapes)
        from mmlearn_tpu.datasets.core.modalities import Modalities

        fallback = 0
        for k, v in batch.items():
            if hasattr(v, "shape") and len(getattr(v, "shape", ())) > 0:
                if Modalities.has_modality(str(k)):
                    return int(v.shape[0])
                fallback = fallback or int(v.shape[0])
            elif isinstance(v, list):
                fallback = fallback or len(v)
        return fallback

    def _run_evaluation(
        self,
        task: Any,
        loader: Any,
        phase: str,
        step: Optional[int] = None,
        state: Optional[TrainState] = None,
        limit_batches: Optional[int] = None,
        log: bool = True,
    ) -> dict[str, float]:
        state = state if state is not None else self.state
        if state is None:
            raise RuntimeError("No TrainState; call fit() or pass state=")
        task.prepare_seed = self.seed
        params = state.params
        runtime = EvalRuntime(task, params, mesh=self.mesh)
        runtime.dataloader = loader

        active_hooks = []
        for name, spec in getattr(task, "evaluation_tasks", {}).items():
            run = (
                spec.run_on_validation if phase == "validation" else spec.run_on_test
            )
            if run:
                active_hooks.append((name, spec.task))

        for _, hook in active_hooks:
            hook.on_evaluation_epoch_start(runtime)

        compute_loss = (
            task.compute_validation_loss
            if phase == "validation"
            else task.compute_test_loss
        )
        if compute_loss and self._val_loss_step is None:
            self._val_loss_step = self._make_val_step(task)

        losses = []
        phase_limit = _resolve_limit(
            self.limit_test_batches if phase == "test" else self.limit_val_batches,
            loader,
            "limit_test_batches" if phase == "test" else "limit_val_batches",
        )
        limit = limit_batches if limit_batches is not None else phase_limit
        if limit is not None and limit < 0:
            limit = None  # -1 = no limit (Lightning's num_sanity_val_steps=-1)
        rng = jax.random.key(self.seed + 2)
        for batch_idx, batch in enumerate(loader):
            if limit is not None and batch_idx >= limit:
                # Lightning semantics: limit 0 disables the phase entirely
                break
            batch = task.prepare_batch(dict(batch), step=batch_idx, training=False)
            device_batch = shard_batch(
                self._cast_inputs(_device_batch(batch)), self.mesh
            )
            if compute_loss:
                with self.mesh:
                    m = self._val_loss_step(
                        params, device_batch, state.extras, rng
                    )
                losses.append(float(jax.device_get(m["loss"])))
            full_batch = dict(batch)
            full_batch.update(device_batch)
            for _, hook in active_hooks:
                hook.evaluation_step(runtime, full_batch, batch_idx)

        results: dict[str, float] = {}
        if losses:
            results[f"{phase}/loss"] = float(np.mean(losses))
        for name, hook in active_hooks:
            hook_metrics = hook.on_evaluation_epoch_end(runtime) or {}
            for k, v in hook_metrics.items():
                results[str(k)] = float(v)

        if log and results:
            logger.info("%s results: %s", phase, results)
            for lg in self.loggers:
                lg.log_metrics(results, step or int(state.step))
            for cb in self.callbacks:
                cb.on_validation_end(self, results, step or int(state.step))
        return results
