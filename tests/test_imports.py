"""Every module imports cleanly (catches missing deps / syntax rot)."""
import importlib
import pkgutil

import pytest

import tracklab_tpu


def _walk(pkg):
    for mod in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        yield mod.name


@pytest.mark.parametrize("name", sorted(_walk(tracklab_tpu)))
def test_module_imports(name):
    importlib.import_module(name)
