"""Built-in dataset wrappers (registered into the ``datasets`` config group)."""

from mmlearn_tpu.datasets.builtin.synthetic import SyntheticImages, SyntheticImageText

__all__ = ["SyntheticImageText", "SyntheticImages"]
