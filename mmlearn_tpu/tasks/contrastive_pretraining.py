"""N-modality contrastive (CLIP-style) pretraining task.

Capability parity with
/root/reference/mmlearn/tasks/contrastive_pretraining.py:
``modality_module_mapping`` shares encoders/heads/postprocessors across
modalities (reference lines 231-325), a learnable clamped ``log_logit_scale``
(lines 327-337), default all-pairs ``modality_loss_pairs`` (lines 340-344),
auxiliary sub-tasks built around a shared encoder (lines 362-380), and
evaluation task specs (lines 382-392). ``encode()`` is
encoder → postprocessor → head → optional L2-norm (lines 400-431).

JAX design: parameters live in a single tree ``{"encoders": {key: ...},
"heads": ..., "postprocessors": ..., "log_logit_scale", "aux": ...}`` —
module sharing is just key sharing. ``loss_fn`` is pure and jitted by the
Trainer over the global batch (GSPMD inserts the data-axis all-gathers the
reference does manually, SURVEY.md §2.8).
"""

from __future__ import annotations

import itertools
import math
import zlib
from dataclasses import dataclass
from typing import Any, Callable, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.constants import MODALITY_PRESENCE_SUFFIX
from mmlearn_tpu.datasets.core.modalities import Modalities
from mmlearn_tpu.modules.layers.normalization import l2_normalize
from mmlearn_tpu.modules.losses.contrastive import ContrastiveLoss, LossPairSpec
from mmlearn_tpu.tasks.base import TrainingTask


@dataclass(frozen=True)
class ModuleKeySpec:
    """Maps a modality to shared module keys (reference: ModuleKeySpec)."""

    encoder_key: Optional[str] = None
    head_key: Optional[str] = None
    postprocessor_key: Optional[str] = None


@dataclass
class AuxiliaryTaskSpec:
    """An auxiliary task attached to one modality's encoder.

    ``task`` is a partial/callable receiving the shared encoder module
    (reference: contrastive_pretraining.py:362-380).
    """

    modality: str = "rgb"
    task: Any = None
    loss_weight: float = 1.0


@dataclass
class EvaluationSpec:
    """An evaluation task + when to run it (reference: EvaluationSpec)."""

    task: Any = None
    run_on_validation: bool = True
    run_on_test: bool = True


def _stable_hash(s: str) -> int:
    """Process-independent string hash (python's hash() is salted, which
    would break cross-process rng reproducibility and compilation caching)."""
    return zlib.crc32(s.encode()) % (2**31)


def _is_flax_module(obj: Any) -> bool:
    return isinstance(obj, nn.Module)


def _merge_pretrained(init_params: Any, pretrained: Any, key: str) -> Any:
    """Overlay converted pretrained leaves onto the initialized tree."""

    def _merge(init_node: Any, pre_node: Any, path: str) -> Any:
        if isinstance(pre_node, dict):
            if not isinstance(init_node, dict):
                raise ValueError(
                    f"Pretrained weights for '{key}' have unexpected subtree "
                    f"at {path}"
                )
            out = dict(init_node)
            for k, v in pre_node.items():
                if k not in init_node:
                    raise ValueError(
                        f"Pretrained weights for '{key}' contain unknown "
                        f"param '{path}/{k}'"
                    )
                out[k] = _merge(init_node[k], v, f"{path}/{k}")
            return out
        if jnp.shape(init_node) != jnp.shape(pre_node):
            raise ValueError(
                f"Pretrained weight shape mismatch for '{key}' at {path}: "
                f"{jnp.shape(pre_node)} vs {jnp.shape(init_node)}"
            )
        return jnp.asarray(pre_node, dtype=jnp.asarray(init_node).dtype)

    return _merge(init_params, pretrained, key)


@store(group="task", name="ContrastivePretraining", populate_full_signature=False)
class ContrastivePretraining(TrainingTask):
    """CLIP-style contrastive pretraining over N modalities."""

    def __init__(
        self,
        encoders: Mapping[str, nn.Module],
        heads: Optional[Mapping[str, Any]] = None,
        postprocessors: Optional[Mapping[str, Any]] = None,
        modality_module_mapping: Optional[Mapping[str, ModuleKeySpec]] = None,
        optimizer: Optional[Callable] = None,
        lr_scheduler: Optional[Callable] = None,
        init_logit_scale: float = 1 / 0.07,
        max_logit_scale: float = 100.0,
        learnable_logit_scale: bool = True,
        loss: Optional[ContrastiveLoss] = None,
        modality_loss_pairs: Optional[Sequence[LossPairSpec]] = None,
        auxiliary_tasks: Optional[Mapping[str, AuxiliaryTaskSpec]] = None,
        log_auxiliary_tasks_loss: bool = False,
        compute_validation_loss: bool = True,
        compute_test_loss: bool = True,
        evaluation_tasks: Optional[Mapping[str, EvaluationSpec]] = None,
        peft_configs: Optional[Mapping[str, Any]] = None,
        freeze_encoders: Optional[Mapping[str, Any]] = None,
    ) -> None:
        super().__init__(
            optimizer=optimizer,
            lr_scheduler=lr_scheduler,
            loss=loss if loss is not None else ContrastiveLoss(),
            compute_validation_loss=compute_validation_loss,
            compute_test_loss=compute_test_loss,
        )
        # resolve module sharing (reference: contrastive_pretraining.py:231-325):
        # `encoders` may be keyed by modality names OR by shared module keys
        # referenced via modality_module_mapping[..].encoder_key (e.g. one
        # 'shared_enc' serving both rgb and text) — the reference validates
        # a key only when nothing maps to it (reference :255-260)
        mapping: dict[str, ModuleKeySpec] = {}
        if modality_module_mapping:
            for m, spec in modality_module_mapping.items():
                if isinstance(spec, Mapping):
                    spec = ModuleKeySpec(**spec)
                mm = str(m).lower()
                if not Modalities.has_modality(mm):
                    raise ValueError(f"Unknown modality '{mm}'")
                mapping[mm] = spec
        referenced = {
            str(spec.encoder_key).lower()
            for spec in mapping.values()
            if spec.encoder_key
        }
        self.modalities = list(mapping.keys())
        for key in encoders.keys():
            k = str(key).lower()
            if Modalities.has_modality(k):
                if k not in self.modalities:
                    self.modalities.append(k)
            elif k not in referenced:
                raise ValueError(f"Unknown modality '{k}'")
        for m in self.modalities:
            mapping.setdefault(m, ModuleKeySpec())
        self.encoder_keys = {
            m: (mapping[m].encoder_key or m) for m in self.modalities
        }
        self.head_keys = {m: (mapping[m].head_key or m) for m in self.modalities}
        self.postprocessor_keys = {
            m: (mapping[m].postprocessor_key or m) for m in self.modalities
        }

        # keep the caller's own keys (reference keeps the ModuleDict as
        # given): re-keying by encoder_key would let a modality that *shares*
        # another key silently overwrite that key's module
        self.encoders = {str(k).lower(): v for k, v in encoders.items()}
        for m in self.modalities:
            key = self.encoder_keys[m]
            if key in self.encoders:
                continue
            # the torch tied-weights idiom: the SAME module object passed
            # under each modality name, with every such modality mapped to
            # one shared (absent) key. torch ties by object identity
            # (reference contrastive_pretraining.py:287-292 stores the same
            # nn.Module twice); our functional params tie by key, so
            # collapse the aliases into a single subtree under the shared key
            sharers = [x for x in self.modalities if self.encoder_keys[x] == key]
            aliases = [self.encoders.get(x) for x in sharers]
            if aliases and all(a is not None for a in aliases) and len(
                {id(a) for a in aliases}
            ) == 1:
                self.encoders[key] = aliases[0]
                targets = set(self.encoder_keys.values())
                for x in sharers:
                    if x not in targets:
                        del self.encoders[x]
            else:
                raise ValueError(
                    f"Modality '{m}' maps to encoder key '{key}' but no such "
                    f"encoder was given (available: {sorted(self.encoders)})"
                )
        self.heads = {str(k).lower(): v for k, v in (heads or {}).items()}
        self.postprocessors = {
            str(k).lower(): v for k, v in (postprocessors or {}).items()
        }

        self.init_logit_scale = float(init_logit_scale)
        self.max_logit_scale = float(max_logit_scale)
        self.learnable_logit_scale = learnable_logit_scale

        if modality_loss_pairs is None:
            modality_loss_pairs = [
                LossPairSpec(modalities=(a, b))
                for a, b in itertools.combinations(self.modalities, 2)
            ]
        else:
            modality_loss_pairs = [
                p
                if isinstance(p, LossPairSpec)
                else LossPairSpec(
                    tuple(str(m).lower() for m in p["modalities"]),
                    p.get("weight", 1.0),
                )
                for p in modality_loss_pairs
            ]
        for pair in modality_loss_pairs:
            for m in pair.modalities:
                if str(m).lower() not in self.modalities:
                    raise ValueError(
                        f"Loss pair {pair.modalities} references unknown "
                        f"modality '{m}' (have {self.modalities})"
                    )
        self.modality_loss_pairs = list(modality_loss_pairs)

        # auxiliary tasks around shared encoders (reference lines 362-380)
        self.aux_task_specs: dict[str, AuxiliaryTaskSpec] = {}
        self.auxiliary_tasks: dict[str, Any] = {}
        for name, spec in (auxiliary_tasks or {}).items():
            if isinstance(spec, Mapping):
                spec = AuxiliaryTaskSpec(**spec)
            modality = str(spec.modality).lower()
            if modality not in self.modalities:
                raise ValueError(
                    f"Auxiliary task '{name}' is attached to unknown modality "
                    f"'{modality}'"
                )
            self.aux_task_specs[name] = spec
            encoder_module = self.encoders[self.encoder_keys[modality]]
            self.auxiliary_tasks[name] = spec.task(encoder=encoder_module)
        self.log_auxiliary_tasks_loss = log_auxiliary_tasks_loss

        self.evaluation_tasks = {}
        for name, spec in (evaluation_tasks or {}).items():
            if isinstance(spec, Mapping):
                spec = EvaluationSpec(**spec)
            self.evaluation_tasks[name] = spec

        # PEFT / freezing (reference: peft_config + freeze_layers args on
        # every encoder wrapper, text.py:91-141; LoRA as param surgery here)
        from mmlearn_tpu.peft import LoRAConfig

        self.peft_configs: dict[str, LoRAConfig] = {}
        for m, cfg in (peft_configs or {}).items():
            if isinstance(cfg, Mapping):
                cfg = LoRAConfig(**cfg)
            self.peft_configs[self.encoder_keys[str(m).lower()]] = cfg
        self.freeze_encoders: dict[str, Any] = {
            self.encoder_keys[str(m).lower()]: spec
            for m, spec in (freeze_encoders or {}).items()
        }
        if self.peft_configs or self.freeze_encoders:
            self.param_trainable_mask = self._trainable_mask

    def _trainable_mask(self, params: Any) -> Any:
        from mmlearn_tpu.peft import freeze_layers_mask

        mask = jax.tree.map(lambda _: True, params)
        for key in params.get("encoders", {}):
            if key in self.peft_configs:
                # LoRA: base encoder frozen (factors train); paths matching
                # modules_to_save stay trainable (peft parity — e.g. the
                # BIOSCAN configs' modules_to_save=["decoder"])
                cfg = self.peft_configs[key]
                if cfg.modules_to_save:
                    from mmlearn_tpu.peft import modules_to_save_mask

                    mask["encoders"][key] = modules_to_save_mask(
                        params["encoders"][key], cfg.modules_to_save
                    )
                else:
                    mask["encoders"][key] = jax.tree.map(
                        lambda _: False, params["encoders"][key]
                    )
            elif key in self.freeze_encoders:
                mask["encoders"][key] = freeze_layers_mask(
                    params["encoders"][key], self.freeze_encoders[key]
                )
        return mask

    # -- parameter init --------------------------------------------------------
    def _encoder_inputs(
        self, batch: Mapping[str, Any], modality: str
    ) -> tuple[tuple, dict]:
        mod = Modalities.get_modality(modality)
        x = batch[mod.name]
        kwargs: dict[str, Any] = {}
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer):
            am_key = mod.attention_mask
            if am_key in batch:
                kwargs["attention_mask"] = jnp.asarray(batch[am_key])
        return (jnp.asarray(x),), kwargs

    def init_params(self, rng: jax.Array, sample_batch: Mapping[str, Any]) -> Any:
        params: dict[str, Any] = {"encoders": {}, "heads": {}, "postprocessors": {}}
        rngs = jax.random.split(
            rng,
            len(self.encoders) + len(self.heads)
            + len(self.postprocessors) + 8,
        )
        ridx = 0
        for key, module in self.encoders.items():
            modality = next(
                (m for m in self.modalities if self.encoder_keys[m] == key),
                None,
            )
            if modality is None:
                # an encoder whose key no modality maps to (its modality
                # shares a different key): no inputs route to it, skip init
                continue
            args, kwargs = self._encoder_inputs(sample_batch, modality)
            variables = module.init(rngs[ridx], *args, **kwargs)
            enc_params = variables["params"]
            # pretrained HF weights (clip.py-style wrappers register loaders)
            from mmlearn_tpu.hf_utils import get_pretrained_params

            pretrained = get_pretrained_params(module)
            if pretrained is not None:
                enc_params = _merge_pretrained(enc_params, pretrained, key)
            params["encoders"][key] = enc_params
            ridx += 1
        # heads/postprocessors may be flax modules. The head consumes the
        # POSTPROCESSOR's output in encode() (reference encode order,
        # contrastive_pretraining.py:400-431), so when a postprocessor
        # exists its output shape — not the encoder's pooled shape — must
        # initialize the head.
        for m in self.modalities:
            pkey = self.postprocessor_keys[m]
            post = self.postprocessors.get(pkey)
            head_input_shape = None
            if post is not None:
                seq = self._sequence_output_shape(sample_batch, m)
                if _is_flax_module(post):
                    if pkey not in params["postprocessors"]:
                        params["postprocessors"][pkey] = post.init(
                            rngs[ridx], jnp.zeros(seq)
                        )["params"]
                        ridx += 1
                    probe = post.apply(
                        {"params": params["postprocessors"][pkey]},
                        jnp.zeros(seq),
                    )
                else:
                    probe = post(jnp.zeros(seq))
                head_input_shape = jnp.shape(probe)
            key = self.head_keys[m]
            head = self.heads.get(key)
            if head is not None and _is_flax_module(head) and key not in params["heads"]:
                shape = head_input_shape or self._pooled_output_shape(
                    sample_batch, m
                )
                params["heads"][key] = head.init(rngs[ridx], jnp.zeros(shape))[
                    "params"
                ]
                ridx += 1

        log_scale = jnp.asarray(math.log(self.init_logit_scale), jnp.float32)
        params["log_logit_scale"] = log_scale

        if self.peft_configs:
            from mmlearn_tpu.peft import init_lora_params

            params["lora"] = {
                key: init_lora_params(
                    params["encoders"][key], cfg,
                    jax.random.fold_in(rng, 7 + i),
                )
                for i, (key, cfg) in enumerate(self.peft_configs.items())
            }

        if self.auxiliary_tasks:
            params["aux"] = {}
            for name, task in self.auxiliary_tasks.items():
                modality = self.aux_task_specs[name].modality
                enc_key = self.encoder_keys[modality]
                params["aux"][name] = task.init_aux_params(
                    jax.random.fold_in(rng, _stable_hash(name)),
                    sample_batch,
                    params["encoders"][enc_key],
                )
        return params

    def _apply_encoder(
        self,
        params: Any,
        batch: Mapping[str, Any],
        modality: str,
        deterministic: bool,
        rng: Optional[jax.Array] = None,
    ):
        key = self.encoder_keys[modality]
        module = self.encoders[key]
        args, kwargs = self._encoder_inputs(batch, modality)
        rngs = {"dropout": rng} if (rng is not None and not deterministic) else None
        enc_params = params["encoders"][key]
        if key in self.peft_configs and "lora" in params:
            from mmlearn_tpu.peft import apply_lora

            enc_params = apply_lora(
                enc_params, params["lora"][key], self.peft_configs[key]
            )
        return module.apply(
            {"params": enc_params},
            *args,
            deterministic=deterministic,
            rngs=rngs,
            **kwargs,
        )

    def _pooled_output_shape(self, sample_batch, modality):
        out = self._forward_shapes_cache(sample_batch, modality)
        return out["pooled"]

    def _sequence_output_shape(self, sample_batch, modality):
        out = self._forward_shapes_cache(sample_batch, modality)
        return out["seq"]

    def _forward_shapes_cache(self, sample_batch, modality):
        if not hasattr(self, "_shape_cache"):
            self._shape_cache: dict[str, dict] = {}
        if modality not in self._shape_cache:
            module = self.encoders[self.encoder_keys[modality]]
            args, kwargs = self._encoder_inputs(sample_batch, modality)
            out = jax.eval_shape(
                lambda a, kw: module.init_with_output(
                    jax.random.key(0), a, **kw
                )[0],
                args[0],
                kwargs,
            )
            seq = out.last_hidden_state.shape
            pooled = (
                out.pooler_output.shape
                if out.pooler_output is not None
                else (seq[0], seq[-1])
            )
            self._shape_cache[modality] = {"seq": seq, "pooled": pooled}
        return self._shape_cache[modality]

    # -- forward / encode -------------------------------------------------------
    def encode(
        self,
        params: Any,
        batch: Mapping[str, Any],
        modality: str,
        normalize: bool = False,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Encoder → postprocessor → head → optional L2 norm.

        Reference: contrastive_pretraining.py:400-431.
        """
        modality = str(modality).lower()
        out = self._apply_encoder(params, batch, modality, deterministic, rng)
        x = out.last_hidden_state

        pkey = self.postprocessor_keys[modality]
        post = self.postprocessors.get(pkey)
        if post is not None:
            if _is_flax_module(post):
                x = post.apply({"params": params["postprocessors"].get(pkey, {})}, x)
            else:
                x = post(x)
        elif out.pooler_output is not None:
            x = out.pooler_output
        else:
            x = x.mean(axis=1)

        hkey = self.head_keys[modality]
        head = self.heads.get(hkey)
        if head is not None:
            if _is_flax_module(head):
                x = head.apply({"params": params["heads"].get(hkey, {})}, x)
            else:
                x = head(x)

        if normalize:
            x = l2_normalize(x)
        return x

    def forward(
        self,
        params: Any,
        batch: Mapping[str, Any],
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> dict[str, jnp.ndarray]:
        """Embed every modality present in the batch.

        Returns ``{modality.embedding: (B, D)}`` (reference lines 433-458).
        """
        outputs: dict[str, jnp.ndarray] = {}
        for m in self.modalities:
            if Modalities.get_modality(m).name not in batch:
                continue
            sub_rng = (
                jax.random.fold_in(rng, _stable_hash(m)) if rng is not None else None
            )
            outputs[Modalities.get_modality(m).embedding] = self.encode(
                params, batch, m, normalize=True, deterministic=deterministic,
                rng=sub_rng,
            )
        return outputs

    # -- loss ---------------------------------------------------------------------
    def _logit_scale(self, params: Any) -> jnp.ndarray:
        log_scale = jnp.clip(
            params["log_logit_scale"], 0.0, math.log(self.max_logit_scale)
        )
        if not self.learnable_logit_scale:
            log_scale = jax.lax.stop_gradient(log_scale)
        return jnp.exp(log_scale)

    def loss_fn(
        self,
        params: Any,
        batch: Mapping[str, Any],
        rng: jax.Array,
        extras: Optional[Mapping[str, Any]] = None,
        deterministic: bool = False,
    ) -> tuple[jnp.ndarray, tuple[dict, Any]]:
        embeddings_by_mod = {}
        presence = {}
        example_ids = {}
        # rows duplicated by pad_partial_batches are invalid for every
        # modality: fold batch_validity into the presence masks so padded
        # rows drop out of the InfoNCE (as anchors and as negatives)
        validity = batch.get("batch_validity")
        if validity is not None:
            validity = jnp.asarray(validity).astype(bool)
        for m in self.modalities:
            mod = Modalities.get_modality(m)
            if mod.name not in batch:
                continue
            sub_rng = jax.random.fold_in(rng, _stable_hash(m))
            # encode() always L2-normalizes (reference:
            # contrastive_pretraining.py:429); the loss's own l2_normalize
            # flag is an additional no-op-safe option.
            embeddings_by_mod[m] = self.encode(
                params, batch, m, normalize=True,
                deterministic=deterministic, rng=sub_rng,
            )
            pk = f"{mod.name}{MODALITY_PRESENCE_SUFFIX}"
            pres = jnp.asarray(batch[pk]).astype(bool) if pk in batch else None
            if validity is not None:
                pres = validity if pres is None else pres & validity
            if pres is not None:
                presence[m] = pres
            ids = batch.get("example_ids", {})
            if mod.name in ids:
                example_ids[m] = jnp.asarray(ids[mod.name])

        scale = self._logit_scale(params)
        loss, metrics = self.loss_fn_obj(
            embeddings_by_mod,
            example_ids or None,
            scale,
            self.modality_loss_pairs,
            presence=presence or None,
        )
        metrics = dict(metrics)
        metrics["logit_scale"] = scale

        new_extras = dict(extras or {})
        for name, task in self.auxiliary_tasks.items():
            spec = self.aux_task_specs[name]
            enc_key = self.encoder_keys[spec.modality]
            aux_rng = jax.random.fold_in(rng, _stable_hash(name) + 1)
            aux_loss, aux_metrics, aux_extras = task.aux_loss_fn(
                params["encoders"][enc_key],
                params["aux"][name],
                (extras or {}).get(name),
                batch,
                aux_rng,
                deterministic=deterministic,
            )
            loss = loss + spec.loss_weight * aux_loss
            if self.log_auxiliary_tasks_loss:
                metrics[f"aux_{name}_loss"] = aux_loss
            new_extras[name] = aux_extras

        metrics["loss"] = loss
        return loss, (metrics, new_extras)

    # -- aux state --------------------------------------------------------------
    def init_extras(self, params: Any) -> Any:
        extras = {}
        for name, task in self.auxiliary_tasks.items():
            enc_key = self.encoder_keys[self.aux_task_specs[name].modality]
            extras[name] = task.init_aux_extras(
                params["encoders"][enc_key], params["aux"][name]
            )
        return extras

    def post_update(self, params: Any, extras: Any, step: jnp.ndarray) -> Any:
        new_extras = dict(extras or {})
        for name, task in self.auxiliary_tasks.items():
            enc_key = self.encoder_keys[self.aux_task_specs[name].modality]
            new_extras[name] = task.aux_post_update(
                params["encoders"][enc_key],
                params["aux"][name],
                new_extras.get(name),
                step,
            )
        return new_extras

    def apply_import_metadata(self, meta: dict) -> None:
        # aux tasks carry their own non-parameter import state (I-JEPA's
        # EMA anneal position)
        for task in self.auxiliary_tasks.values():
            task.apply_import_metadata(meta)

    def prepare_batch(
        self, batch: dict[str, Any], step: int, training: bool = True
    ) -> dict[str, Any]:
        for task in self.auxiliary_tasks.values():
            # propagate the run seed: the trainer stamps it on the PARENT
            # task only, but aux mask generators (IJEPA) seed per
            # (prepare_seed, step, phase) — without this, every multi-task
            # run drew the seed-0 mask sequence regardless of the run seed
            task.prepare_seed = getattr(self, "prepare_seed", 0)
            batch = task.prepare_batch(batch, step, training=training)
        return batch
