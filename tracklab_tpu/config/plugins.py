"""Third-party plugin config discovery.

Counterpart of the reference's Hydra search-path plugin
(hydra_plugins/tracklab_searchpath_plugin/tracklab_searchpath_plugin.py:
11-33): packages expose a ``tracklab_tpu_plugin`` entry point whose value
names a module; that module's ``config_package`` attribute (a directory
path or package name containing YAML groups) is appended to the config
search path, so plugin configs compose exactly like first-party ones.
"""
from __future__ import annotations

import importlib
import logging
from pathlib import Path

log = logging.getLogger(__name__)

__all__ = ["discover_plugin_config_dirs"]


def discover_plugin_config_dirs():
    try:
        from importlib.metadata import entry_points
        eps = entry_points(group="tracklab_tpu_plugin")
    except Exception:
        return []
    dirs = []
    for ep in eps:
        try:
            mod = importlib.import_module(ep.module)
            pkg = getattr(mod, "config_package", None)
            if pkg is None:
                continue
            p = Path(pkg)
            if not p.exists():
                sub = importlib.import_module(pkg)
                p = Path(sub.__file__).parent
            dirs.append(p)
            log.info("Plugin configs: %s -> %s", ep.name, p)
        except Exception as e:
            log.warning("Failed to load plugin %s: %s", ep.name, e)
    return dirs
