"""Hydra-compatible config composition without the hydra dependency.

The reference drives everything through Hydra YAML
(tracklab/configs/config.yaml + @hydra.main, tracklab/main.py:24); this
module reproduces the subset of semantics the config tree uses:

  * a root config with a ``defaults:`` list composing config *groups*
    (``- dataset: mot17`` loads ``configs/dataset/mot17.yaml`` under the
    ``dataset`` key; ``- _self_`` controls merge order)
  * CLI overrides: ``group=option`` re-selects a group file,
    ``a.b.c=value`` overrides a leaf, ``+a.b=value`` adds a new leaf
  * ``${a.b}`` interpolation resolved against the final merged tree
  * ``_target_``-based object instantiation (:func:`instantiate`)

Keeping the YAML surface Hydra-shaped is an explicit compat goal
(SURVEY §5-config) so reference users can port their configs unchanged.
"""
from __future__ import annotations

import copy
import importlib
import re
from pathlib import Path
from typing import Dict, List, Optional

import yaml

__all__ = ["OmegaDict", "load_yaml", "compose", "instantiate"]


class OmegaDict(dict):
    """dict with attribute access, recursive wrap, and deep merge."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return OmegaDict({k: OmegaDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [OmegaDict.wrap(v) for v in obj]
        return obj

    def merge(self, other: dict):
        for k, v in other.items():
            if (k in self and isinstance(self[k], dict)
                    and isinstance(v, dict)):
                self[k].merge(v)
            else:
                self[k] = OmegaDict.wrap(v)
        return self

    def select(self, dotted: str, default=None):
        node = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_dotted(self, dotted: str, value):
        parts = dotted.split(".")
        node = self
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = OmegaDict()
            node = node[p]
        node[parts[-1]] = OmegaDict.wrap(value)


def load_yaml(path) -> OmegaDict:
    with open(path) as fp:
        data = yaml.safe_load(fp) or {}
    return OmegaDict.wrap(data)


def _parse_value(text: str):
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve_node(node, root, stack=()):
    if isinstance(node, str):
        m = _INTERP.fullmatch(node)
        if m:  # whole-string interpolation keeps the referent's type
            key = m.group(1)
            if key in stack:
                raise ValueError(f"Interpolation cycle at ${{{key}}}")
            tgt = root.select(key)
            return _resolve_node(tgt, root, stack + (key,))

        def sub(match):
            key = match.group(1)
            tgt = root.select(key)
            tgt = _resolve_node(tgt, root, stack + (key,))
            return str(tgt)

        return _INTERP.sub(sub, node)
    if isinstance(node, dict):
        return OmegaDict({k: _resolve_node(v, root, stack)
                          for k, v in node.items()})
    if isinstance(node, list):
        return [_resolve_node(v, root, stack) for v in node]
    return node


def _search_dirs(config_dir: Path):
    from tracklab_tpu.config.plugins import discover_plugin_config_dirs
    return [config_dir] + discover_plugin_config_dirs()


def _load_group(config_dir: Path, group: str, option: str,
                root_dir: Optional[Path] = None) -> OmegaDict:
    root_dir = root_dir or config_dir
    rel = group.replace(".", "/").replace("//", "/")
    group_dir = config_dir / rel
    path = group_dir / f"{option}.yaml"
    if not path.exists():
        # search third-party plugin config packages (config/plugins.py)
        for alt in _search_dirs(root_dir)[1:]:
            alt_path = alt / rel / f"{option}.yaml"
            if alt_path.exists():
                path = alt_path
                group_dir = alt / rel
                break
    if not path.exists():
        raise FileNotFoundError(f"Config group file not found: {path}")
    cfg = load_yaml(path)
    # nested defaults inside group files (e.g. modules composing others);
    # like Hydra, `/group` is root-relative, bare names are group-relative
    defaults = cfg.pop("defaults", None)
    if defaults:
        merged = OmegaDict()
        self_seen = False
        for entry in defaults:
            if entry == "_self_":
                merged.merge(cfg)
                self_seen = True
            elif isinstance(entry, dict):
                (g, opt), = entry.items()
                if str(g).startswith("/"):
                    sub = _load_group(root_dir, str(g)[1:], str(opt),
                                      root_dir)
                    merged.set_dotted(str(g)[1:], sub)
                else:
                    sub = _load_group(group_dir, str(g), str(opt), root_dir)
                    merged.set_dotted(str(g), sub)
        if not self_seen:
            merged.merge(cfg)
        cfg = merged
    return cfg


def compose(config_dir, config_name: str = "config",
            overrides: Optional[List[str]] = None) -> OmegaDict:
    """Compose the root config with its defaults list and CLI overrides."""
    config_dir = Path(config_dir)
    overrides = list(overrides or [])

    root_cfg = load_yaml(config_dir / f"{config_name}.yaml")
    defaults = root_cfg.pop("defaults", [])

    # group overrides (`dataset=mot20`) replace defaults-list selections
    group_overrides: Dict[str, str] = {}
    value_overrides: List[tuple] = []
    experiment_bodies: List[OmegaDict] = []
    for ov in overrides:
        if ov.startswith("+"):
            key, _, val = ov[1:].partition("=")
            candidate = config_dir / key.replace(".", "/") / f"{val}.yaml"
            if not candidate.exists():
                value_overrides.append((key, _parse_value(val)))
            elif key.replace(".", "/").split("/")[0] == "experiment":
                # experiment-style global-package config: its defaults
                # entries act as group overrides (whole-subtree replace),
                # its body merges into the root after _self_
                exp = load_yaml(candidate)
                for entry in exp.pop("defaults", []):
                    if entry == "_self_":
                        continue
                    if isinstance(entry, dict):
                        (g, opt), = entry.items()
                        group_overrides[str(g).lstrip("/")] = str(opt)
                experiment_bodies.append(exp)
            else:
                # +group=option on an ordinary config group ADDS that
                # group's subtree at its own path (hydra semantics), e.g.
                # +modules/tracklet_agg=majority_vote
                group_overrides[key.replace(".", "/")] = str(val)
            continue
        key, _, val = ov.partition("=")
        group_dir = config_dir / key.replace(".", "/")
        candidate = group_dir / f"{val}.yaml"
        if candidate.exists():
            group_overrides[key] = str(val)
        elif group_dir.is_dir():
            options = sorted(p.stem for p in group_dir.glob("*.yaml"))
            raise FileNotFoundError(
                f"Unknown option '{val}' for config group '{key}'. "
                f"Available: {options}")
        else:
            value_overrides.append((key, _parse_value(val)))

    cfg = OmegaDict()
    self_seen = False
    for entry in defaults:
        if entry == "_self_":
            cfg.merge(root_cfg)
            self_seen = True
            continue
        if isinstance(entry, dict):
            (group, option), = entry.items()
            option = group_overrides.pop(group, option)
            if option in (None, "null"):
                continue
            sub = _load_group(config_dir, group, str(option))
            cfg.set_dotted(group.replace("/", "."), sub)
    if not self_seen:
        cfg.merge(root_cfg)
    for group, option in group_overrides.items():
        sub = _load_group(config_dir, group, option)
        cfg.set_dotted(group.replace("/", "."), sub)
    for body in experiment_bodies:
        for k, v in body.items():
            if not isinstance(v, dict):
                cfg.set_dotted(k, v)
                continue
            for k2, v2 in v.items():
                existing = cfg.select(f"{k}.{k2}")
                if isinstance(v2, dict) and "_target_" in v2:
                    # whole-subtree replacement for new module defs
                    cfg.set_dotted(f"{k}.{k2}", OmegaDict.wrap(v2))
                elif isinstance(v2, dict) and isinstance(existing, dict):
                    existing.merge(v2)
                else:
                    cfg.set_dotted(f"{k}.{k2}", v2)
    for key, val in value_overrides:
        cfg.set_dotted(key, val)

    return _resolve_node(cfg, cfg)


def instantiate(node, *args, **extra_kwargs):
    """Build the object described by a ``_target_`` node
    (reference: hydra.utils.instantiate used throughout tracklab/main.py).

    Child dicts that themselves carry ``_target_`` are instantiated
    recursively; ``_partial_: true`` returns a functools.partial.
    """
    import functools

    if node is None:
        return None
    if not isinstance(node, dict) or "_target_" not in node:
        raise ValueError(f"Cannot instantiate non-target node: {node!r}")
    node = copy.deepcopy(node)
    target = node.pop("_target_")
    partial = node.pop("_partial_", False)
    node.pop("_recursive_", None)

    def build(v):
        # hydra-style recursive instantiate: _target_ nodes anywhere in
        # a kwarg's container tree are built (e.g. the visualization
        # presets' ``visualizers: {name: {_target_: ...}}`` maps)
        if isinstance(v, dict) and "_target_" in v:
            return instantiate(v)
        if isinstance(v, dict):
            return {k2: build(v2) for k2, v2 in v.items()}
        if isinstance(v, list):
            return [build(v2) for v2 in v]
        return v

    kwargs = {}
    for k, v in node.items():
        kwargs[k] = build(v)
    kwargs.update(extra_kwargs)

    module_name, _, attr = target.rpartition(".")
    mod = importlib.import_module(module_name)
    fn = getattr(mod, attr)
    if partial:
        return functools.partial(fn, *args, **kwargs)
    return fn(*args, **kwargs)
