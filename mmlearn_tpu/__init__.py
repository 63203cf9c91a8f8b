"""mmlearn-tpu: a TPU-native multimodal representation-learning framework.

Same capabilities as VectorInstitute/mmlearn (N-modality contrastive
pretraining, I-JEPA, zero-shot retrieval/classification evaluation, a modality
registry and heterogeneous data pipeline, a config-group experiment CLI),
rebuilt JAX-first: Flax encoders with Pallas attention kernels, jit-compiled
SPMD train steps over a device mesh, optax optimizers, Orbax checkpointing.
"""

__version__ = "0.1.0"
