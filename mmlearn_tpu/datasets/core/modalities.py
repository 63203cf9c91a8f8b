"""Modality registry.

Behavioral parity with the reference's modality abstraction
(/root/reference/mmlearn/datasets/core/modalities.py): a process-wide registry
of modalities, each auto-deriving a set of property key strings
(``{name}_target``, ``{name}_attention_mask``, ``{name}_mask``,
``{name}_embedding``, ``{name}_masked_embedding``, ``{name}_ema_embedding``;
reference lines 41-75), runtime-extensible via
:meth:`ModalityRegistry.register_modality` (reference lines 154-183, used by
projects to add e.g. a ``dna`` modality).
"""

from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass, field
from typing import Any, Optional

logger = logging.getLogger(__name__)

_DEFAULT_PROPERTIES = (
    "target",
    "attention_mask",
    "mask",
    "embedding",
    "masked_embedding",
    "ema_embedding",
)

_DEFAULT_MODALITIES = ("rgb", "depth", "thermal", "text", "audio", "video")


@dataclass(frozen=True)
class Modality:
    """A data modality with auto-derived property key strings."""

    name: str
    modality_specific_properties: Optional[dict[str, str]] = field(default=None)

    @property
    def properties(self) -> dict[str, str]:
        props = {p: f"{{}}_{p}" for p in _DEFAULT_PROPERTIES}
        if self.modality_specific_properties:
            props.update(self.modality_specific_properties)
        return {name: fmt.format(self.name) for name, fmt in props.items()}

    def __getattr__(self, prop: str) -> str:
        properties = object.__getattribute__(self, "properties")
        if prop in properties:
            return properties[prop]
        raise AttributeError(f"Modality '{self.name}' has no property '{prop}'")

    def __str__(self) -> str:
        return self.name

    def __hash__(self) -> int:
        return hash(self.name)

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, Modality):
            return self.name == other.name
        if isinstance(other, str):
            return self.name == other
        return NotImplemented


class ModalityRegistry:
    """Process-wide singleton registry of modalities.

    Reference: ``ModalityRegistry`` singleton
    (/root/reference/mmlearn/datasets/core/modalities.py:297-300).
    """

    _instance: Optional["ModalityRegistry"] = None

    def __new__(cls) -> "ModalityRegistry":
        if cls._instance is None:
            instance = super().__new__(cls)
            instance._modalities = {}
            cls._instance = instance
        return cls._instance

    def register_modality(
        self,
        name: str,
        modality_specific_properties: Optional[dict[str, str]] = None,
    ) -> Modality:
        name = name.lower()
        if name in self._modalities:
            warnings.warn(
                f"Modality '{name}' is already registered; overwriting.",
                UserWarning,
                stacklevel=2,
            )
        modality = Modality(name, modality_specific_properties)
        self._modalities[name] = modality
        return modality

    def add_default_modality_properties(self, **properties: str) -> None:
        """Extend every registered modality with extra property templates."""
        for name, modality in list(self._modalities.items()):
            extra = dict(modality.modality_specific_properties or {})
            extra.update(properties)
            self._modalities[name] = Modality(name, extra)

    def get_modality(self, name: str) -> Modality:
        name = str(name).lower()
        if name not in self._modalities:
            raise KeyError(
                f"Modality '{name}' is not registered. "
                f"Available: {sorted(self._modalities)}"
            )
        return self._modalities[name]

    def get_modality_properties(self, name: str) -> dict[str, str]:
        return self.get_modality(name).properties

    def has_modality(self, name: str) -> bool:
        return str(name).lower() in self._modalities

    def list_modalities(self) -> list[Modality]:
        return list(self._modalities.values())

    def __getattr__(self, name: str) -> Modality:
        modalities = object.__getattribute__(self, "_modalities")
        if name.lower() in modalities:
            return modalities[name.lower()]
        raise AttributeError(f"No modality named '{name}' is registered")

    def __contains__(self, name: Any) -> bool:
        return self.has_modality(str(name))


Modalities = ModalityRegistry()
for _name in _DEFAULT_MODALITIES:
    if not Modalities.has_modality(_name):
        Modalities.register_modality(_name)
