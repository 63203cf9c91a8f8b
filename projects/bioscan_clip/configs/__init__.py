"""BIOSCAN-CLIP config package: registers the project components.

Parity: /root/reference/projects/bioscan_clip/configs/__init__.py (LoRA-config
encoder registrations at lines 24-64; here LoRA is configured through the
task's ``peft_configs`` using mmlearn_tpu.peft.LoRAConfig).
"""

from mmlearn_tpu.conf import external_store

import projects.bioscan_clip.dataset  # noqa: F401  (registers the dna modality)
from projects.bioscan_clip.dataset import BIOSCANInsectDataset
from projects.bioscan_clip.dna_tokenizer import DNAProcessor
from projects.bioscan_clip.encoders import BarcodeBERT
from projects.bioscan_clip.eval_task import TaxonomicClassification  # noqa: F401

external_store(group="datasets", name="BIOSCANInsectDataset",
               populate_full_signature=False)(BIOSCANInsectDataset)
external_store(group="datasets/tokenizers", name="DNAProcessor",
               populate_full_signature=False)(DNAProcessor)
external_store(group="modules/encoders", name="BarcodeBERT",
               populate_full_signature=False)(BarcodeBERT)
