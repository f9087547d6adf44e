"""Module / Pipeline abstractions.

API-compatible rebuild of the reference module system
(tracklab/pipeline/module.py:22-103): a Module declares its granularity
*level*, the detection/image columns it consumes (``input_columns``) and
produces (``output_columns``); a Pipeline symbolically validates the column
dataflow before any inference so misconfigured runs fail fast.

Level is derived from the first base class name
(``ImageLevelModule`` -> "image"), exactly like the reference's
metaclass trick (module.py:33-37).
"""
from __future__ import annotations

import logging
import re
from abc import ABCMeta
from typing import Dict, List, Set

log = logging.getLogger(__name__)

__all__ = ["Module", "Pipeline", "Skip", "MetaModule"]


class MetaModule(ABCMeta):
    @property
    def name(cls):
        return cls.__name__

    @property
    def level(cls):
        name = cls.__bases__[0].__name__
        name = re.sub("([a-z0-9])([A-Z])", r"\1_\2", name).lower()
        return name.split("_")[0]


class Module(metaclass=MetaModule):
    input_columns = None
    output_columns = None
    training_enabled = False
    forget_columns: List[str] = []

    @property
    def name(self):
        return self.__class__.__name__

    @property
    def level(self):
        # like the reference (first-base-name snake-cased), but robust to
        # intermediate helper bases: walk the MRO for a *LevelModule class
        for klass in type(self).__mro__:
            if klass.__name__.endswith("LevelModule"):
                name = re.sub("([a-z0-9])([A-Z])", r"\1_\2",
                              klass.__name__).lower()
                return name.split("_")[0]
        name = self.__class__.__bases__[0].__name__
        name = re.sub("([a-z0-9])([A-Z])", r"\1_\2", name).lower()
        return name.split("_")[0]

    def validate_input(self, dataframe):
        assert self.input_columns is not None, \
            "Every module must declare its input_columns"
        for col in self.input_columns:
            if col not in dataframe.columns:
                raise AttributeError(
                    f"The input detections must contain {col}.")

    def validate_output(self, dataframe):
        assert self.output_columns is not None, \
            "Every module must declare its output_columns"
        for col in self.output_columns:
            if col not in dataframe.columns:
                raise AttributeError(
                    f"The output detections must contain {col}.")

    def get_input_columns(self, level: str) -> List[str]:
        if isinstance(self.input_columns, list):
            return self.input_columns if level == "detection" else []
        if isinstance(self.input_columns, dict):
            return self.input_columns.get(level, [])
        return []

    def get_output_columns(self, level: str) -> List[str]:
        if isinstance(self.output_columns, list):
            return self.output_columns if level == "detection" else []
        if isinstance(self.output_columns, dict):
            return self.output_columns.get(level, [])
        return []

    def train(self, *args, **kwargs):  # overridden by trainable modules
        raise NotImplementedError


class Pipeline:
    """Ordered module list with symbolic column-flow validation
    (module.py:64-93)."""

    def __init__(self, models: List[Module]):
        self.models = [m for m in models if m.name != "skip"]
        log.info("Pipeline: %s", " -> ".join(m.name for m in self.models))

    def validate(self, load_columns: Dict[str, Set[str]]):
        columns = {k: set(v) for k, v in load_columns.items()}
        for level in ["image", "detection"]:
            columns.setdefault(level, set())
            for model in self.models:
                if model.input_columns is None or \
                        model.output_columns is None:
                    raise AttributeError(
                        f"{type(model)} must declare input_ and "
                        "output_columns")
                needed = set(model.get_input_columns(level))
                if not needed.issubset(columns[level]):
                    raise AttributeError(
                        f"The {model.name} module is missing inputs: "
                        f"needed {sorted(needed)}, provided "
                        f"{sorted(columns[level])}")
                columns[level].update(model.get_output_columns(level))
        log.info("Pipeline has been validated")

    def __str__(self):
        return " -> ".join(m.name for m in self.models)

    def __getitem__(self, item: int) -> Module:
        return self.models[item]

    def __len__(self):
        return len(self.models)

    def __iter__(self):
        return iter(self.models)

    def is_empty(self):
        return len(self.models) == 0


class Skip(Module):
    def __init__(self, **kwargs):
        pass

    @property
    def name(self):
        return "skip"
