"""I-JEPA pretraining task.

Capability parity with /root/reference/mmlearn/tasks/ijepa.py: a student
``VisionTransformer`` + ``VisionTransformerPredictor`` + EMA teacher
(reference lines 93-102). Per step (reference ``_shared_step``, lines
217-261):

1. masks generated on host per batch (``prepare_batch`` → IJEPAMaskGenerator;
   the reference generates them on CPU inside the step, lines 223-229);
2. teacher forward (no grad) → layer-norm over features → gather target
   patches under predictor masks → repeat per context mask;
3. student forward on the context mask only;
4. predictor predicts target representations; smooth-L1 loss (lines 250-261);
5. EMA teacher update after the optimizer step (reference
   ``on_before_zero_grad``, lines 108-115 → here ``post_update``).

The task also implements the *auxiliary-task protocol* used by
``ContrastivePretraining`` (reference multi_task project): the student
encoder's params are the shared encoder subtree, the predictor + EMA teacher
live in the aux params/extras.
"""

from __future__ import annotations

import zlib
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.datasets.core.modalities import Modalities
from mmlearn_tpu.datasets.processors.masking import IJEPAMaskGenerator
from mmlearn_tpu.modules.ema import ExponentialMovingAverage
from mmlearn_tpu.modules.encoders.vision import (
    VisionTransformer,
    VisionTransformerPredictor,
    apply_masks,
    repeat_interleave_batch,
)
from mmlearn_tpu.modules.losses.data2vec import smooth_l1
from mmlearn_tpu.tasks.base import TrainingTask

ENCODER_MASK_KEY = "ijepa_encoder_masks"
PREDICTOR_MASK_KEY = "ijepa_predictor_masks"


def reinit_trunc_normal(params: Any, rng: jax.Array, std: float = 0.02) -> Any:
    """Re-initialize 2-D+ kernels with truncated normal(std), biases with 0.

    Reference I-JEPA init (vision.py:572-641): trunc-normal weights, zero
    biases, identity-like layernorms (layernorm params are left untouched
    here — flax initializes them to scale=1/bias=0 already).
    """

    def _reinit(path, leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        idx = zlib.crc32(key.encode())
        if key.endswith("kernel") or key.endswith("embedding"):
            sub = jax.random.fold_in(rng, idx)
            return (
                jax.random.truncated_normal(sub, -2.0, 2.0, jnp.shape(leaf))
                * std
            ).astype(leaf.dtype)
        if key.endswith("bias"):
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(_reinit, params)


@store(group="task", name="IJEPA", populate_full_signature=False)
class IJEPA(TrainingTask):
    """I-JEPA: predict masked-region representations of an EMA teacher."""

    def __init__(
        self,
        encoder: Optional[VisionTransformer] = None,
        predictor: Optional[VisionTransformerPredictor] = None,
        optimizer: Optional[Callable] = None,
        lr_scheduler: Optional[Callable] = None,
        ema_decay: float = 0.996,
        ema_decay_end: float = 1.0,
        ema_anneal_end_step: int = 1000,
        loss_beta: float = 1.0,
        modality: str = "rgb",
        mask_generator: Optional[IJEPAMaskGenerator] = None,
        init_style: str = "trunc_normal",  # trunc_normal (reference) | flax
        compute_validation_loss: bool = True,
        compute_test_loss: bool = True,
    ) -> None:
        super().__init__(
            optimizer=optimizer,
            lr_scheduler=lr_scheduler,
            compute_validation_loss=compute_validation_loss,
            compute_test_loss=compute_test_loss,
        )
        if encoder is None:
            raise ValueError("IJEPA requires an encoder")
        self.encoder = encoder
        if predictor is None:
            grid = encoder.img_size // encoder.patch_size
            predictor = VisionTransformerPredictor(
                num_patches=grid * grid,
                embed_dim=encoder.embed_dim,
                predictor_embed_dim=max(64, encoder.embed_dim // 2),
                depth=max(1, encoder.depth // 2),
                num_heads=encoder.num_heads,
                dtype=encoder.dtype,
                param_dtype=encoder.param_dtype,
            )
        self.predictor = predictor
        self.modality = str(modality).lower()
        self.loss_beta = loss_beta
        self.ema = ExponentialMovingAverage(
            ema_decay=ema_decay,
            ema_end_decay=ema_decay_end,
            ema_anneal_end_step=ema_anneal_end_step,
        )
        self.mask_generator = mask_generator or IJEPAMaskGenerator(
            input_size=encoder.img_size, patch_size=encoder.patch_size
        )
        self.init_style = init_style
        #: EMA anneal position offset: a run initialized from a half-trained
        #: reference Lightning checkpoint starts at trainer step 0, but the
        #: teacher's decay anneal must continue from the reference's
        #: ``num_updates`` (reference tasks/ijepa.py:188-215 restores it via
        #: on_load_checkpoint) — set by :meth:`apply_import_metadata`
        self.ema_step_offset: int = 0

    # -- host-side batch hook ---------------------------------------------------
    def prepare_batch(
        self, batch: dict[str, Any], step: int, training: bool = True
    ) -> dict[str, Any]:
        mod = Modalities.get_modality(self.modality)
        if mod.name not in batch or ENCODER_MASK_KEY in batch:
            return batch
        b = np.asarray(batch[mod.name]).shape[0]
        # seeded per (run seed, step, phase): distinct masks across seeds and
        # no train/eval step-index collisions (the trainer sets prepare_seed)
        rng = np.random.default_rng(
            (int(getattr(self, "prepare_seed", 0)), int(step), 0 if training else 1)
        )
        masks = self.mask_generator(b, rng=rng)
        batch = dict(batch)
        batch[ENCODER_MASK_KEY] = masks["encoder_masks"]
        batch[PREDICTOR_MASK_KEY] = masks["predictor_masks"]
        return batch

    # -- core step (shared by standalone and auxiliary modes) --------------------
    def _ijepa_loss(
        self,
        encoder_params: Any,
        predictor_params: Any,
        teacher_params: Any,
        batch: Mapping[str, Any],
        rng: jax.Array,
        deterministic: bool,
    ) -> jnp.ndarray:
        mod = Modalities.get_modality(self.modality)
        images = jnp.asarray(batch[mod.name])
        enc_masks = jnp.asarray(batch[ENCODER_MASK_KEY])
        pred_masks = jnp.asarray(batch[PREDICTOR_MASK_KEY])
        b = images.shape[0]
        n_enc = enc_masks.shape[0]
        n_pred = pred_masks.shape[0]

        # teacher targets (no grad): full forward → feature layer-norm →
        # gather targets → repeat per context mask (reference lines 231-238)
        teacher_out = self.encoder.apply(
            {"params": teacher_params}, images, deterministic=True
        )
        h = teacher_out.last_hidden_state
        # eps matches torch F.layer_norm's default (reference ijepa.py:234)
        h = jax.nn.standardize(h, axis=-1, epsilon=1e-5)
        h = apply_masks(h, pred_masks)  # (n_pred*B, K_tgt, D)
        h = repeat_interleave_batch(h, b, repeat=n_enc)
        h = jax.lax.stop_gradient(h)

        # student on context patches only (reference lines 240-242);
        # encoder and predictor draw INDEPENDENT dropout keys (the same base
        # rng would correlate masks at matching module paths)
        enc_rng, pred_rng = jax.random.split(rng)
        z = self.encoder.apply(
            {"params": encoder_params},
            images,
            patch_masks=enc_masks,
            deterministic=deterministic,
            rngs={"dropout": enc_rng} if not deterministic else None,
        ).last_hidden_state  # (n_enc*B, K_ctx, D)

        z_pred = self.predictor.apply(
            {"params": predictor_params},
            z,
            enc_masks,
            pred_masks,
            deterministic=deterministic,
            rngs={"dropout": pred_rng} if not deterministic else None,
        )  # (n_pred*n_enc*B, K_tgt, D)

        return smooth_l1(z_pred.astype(jnp.float32), h.astype(jnp.float32),
                         self.loss_beta).mean()

    # -- standalone TrainingTask interface ---------------------------------------
    def init_params(self, rng: jax.Array, sample_batch: Mapping[str, Any]) -> Any:
        mod = Modalities.get_modality(self.modality)
        sample_batch = self.prepare_batch(dict(sample_batch), step=0)
        images = jnp.asarray(sample_batch[mod.name])
        r1, r2 = jax.random.split(rng)
        enc_params = self.encoder.init(r1, images)["params"]
        if self.init_style == "trunc_normal":
            enc_params = reinit_trunc_normal(enc_params, jax.random.fold_in(r1, 1))
        enc_masks = jnp.asarray(sample_batch[ENCODER_MASK_KEY])
        pred_masks = jnp.asarray(sample_batch[PREDICTOR_MASK_KEY])
        k_ctx = enc_masks.shape[-1]
        z = jnp.zeros(
            (enc_masks.shape[0] * images.shape[0], k_ctx, self.encoder.embed_dim)
        )
        pred_params = self.predictor.init(r2, z, enc_masks, pred_masks)["params"]
        if self.init_style == "trunc_normal":
            pred_params = reinit_trunc_normal(
                pred_params, jax.random.fold_in(r2, 1)
            )
        return {"encoder": enc_params, "predictor": pred_params}

    def init_extras(self, params: Any) -> Any:
        # the anneal offset lives IN the checkpointed extras (not only on
        # this task object): a migrated run resumed later without
        # re-passing init_from_lightning must keep its EMA anneal position
        return {
            "ema_encoder": self.ema.init(params["encoder"]),
            "ema_step_offset": jnp.asarray(self.ema_step_offset, jnp.int32),
        }

    @property
    def modalities(self) -> list[str]:
        return [self.modality]

    def encode(
        self,
        params: Any,
        batch: Mapping[str, Any],
        modality: Optional[str] = None,
        normalize: bool = False,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Mean-pooled student features for eval/export.

        Beyond reference: the torch IJEPA exposes no feature-extraction
        API (downstream probing reloads checkpoints manually); here the
        same ``encode`` contract as ``ContrastivePretraining`` makes
        I-JEPA models usable with ``EmbeddingExport``, ``job_type=export``,
        and the eval hooks. Pass ``extras['ema_encoder']`` as
        ``params['encoder']`` to serve the EMA teacher instead.
        """
        mod = Modalities.get_modality(str(modality or self.modality).lower())
        images = jnp.asarray(batch[mod.name])
        rngs = {"dropout": rng} if (rng is not None and not deterministic) else None
        out = self.encoder.apply(
            {"params": params["encoder"]}, images,
            deterministic=deterministic, rngs=rngs,
        )
        x = out.last_hidden_state.mean(axis=1)
        if normalize:
            from mmlearn_tpu.modules.layers.normalization import l2_normalize

            x = l2_normalize(x)
        return x

    def loss_fn(
        self,
        params: Any,
        batch: Mapping[str, Any],
        rng: jax.Array,
        extras: Optional[Mapping[str, Any]] = None,
        deterministic: bool = False,
    ) -> tuple[jnp.ndarray, tuple[dict, Any]]:
        teacher = (extras or {}).get("ema_encoder", params["encoder"])
        loss = self._ijepa_loss(
            params["encoder"],
            params["predictor"],
            teacher,
            batch,
            rng,
            deterministic,
        )
        return loss, ({"loss": loss}, dict(extras or {}))

    def post_update(self, params: Any, extras: Any, step: jnp.ndarray) -> Any:
        new = dict(extras or {})
        # prefer the checkpointed offset (restored extras); the task-object
        # attribute only seeds fresh inits
        offset = new.get("ema_step_offset", self.ema_step_offset)
        new["ema_encoder"] = self.ema.step(
            extras["ema_encoder"], params["encoder"], step + offset
        )
        return new

    def apply_import_metadata(self, meta: dict) -> None:
        if "ema" in meta:
            self.ema_step_offset = int(meta["ema"].get("num_updates", 0))

    # -- auxiliary-task protocol (used inside ContrastivePretraining) -------------
    def init_aux_params(
        self, rng: jax.Array, sample_batch: Mapping[str, Any], encoder_params: Any
    ) -> Any:
        sample_batch = self.prepare_batch(dict(sample_batch), step=0)
        enc_masks = jnp.asarray(sample_batch[ENCODER_MASK_KEY])
        pred_masks = jnp.asarray(sample_batch[PREDICTOR_MASK_KEY])
        mod = Modalities.get_modality(self.modality)
        b = jnp.asarray(sample_batch[mod.name]).shape[0]
        z = jnp.zeros((enc_masks.shape[0] * b, enc_masks.shape[-1],
                       self.encoder.embed_dim))
        return {
            "predictor": self.predictor.init(rng, z, enc_masks, pred_masks)["params"]
        }

    def init_aux_extras(self, encoder_params: Any, aux_params: Any) -> Any:
        return {
            "ema_encoder": self.ema.init(encoder_params),
            "ema_step_offset": jnp.asarray(self.ema_step_offset, jnp.int32),
        }

    def aux_loss_fn(
        self,
        encoder_params: Any,
        aux_params: Any,
        aux_extras: Any,
        batch: Mapping[str, Any],
        rng: jax.Array,
        deterministic: bool = False,
    ) -> tuple[jnp.ndarray, dict, Any]:
        teacher = (aux_extras or {}).get("ema_encoder", encoder_params)
        loss = self._ijepa_loss(
            encoder_params, aux_params["predictor"], teacher, batch, rng,
            deterministic,
        )
        return loss, {"loss": loss}, dict(aux_extras or {})

    def aux_post_update(
        self, encoder_params: Any, aux_params: Any, aux_extras: Any,
        step: jnp.ndarray,
    ) -> Any:
        new = dict(aux_extras or {})
        offset = new.get("ema_step_offset", self.ema_step_offset)
        new["ema_encoder"] = self.ema.step(
            aux_extras["ema_encoder"], encoder_params, step + offset
        )
        return new
