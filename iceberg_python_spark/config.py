"""File/env configuration for ``load_catalog`` (reference parity:
pyiceberg/utils/config.py:1-181).

Behavioral contract (matched against the reference, not its code):

- ``.pyiceberg.yaml`` is searched in ``$PYICEBERG_HOME``, then the user's
  home directory, then the current working directory; the FIRST file
  found wins entirely (no cross-file merging).
- The file holds ``catalog: {<name>: {key: value}}`` plus optional
  top-level keys like ``default-catalog``; keys compare lowercased.
- Environment variables ``PYICEBERG_CATALOG__<name>__<key>=v`` overlay
  the file config (env wins per key): the var name is lowercased,
  ``__`` splits at most three path parts, and single underscores inside
  a part become dashes (``DB_PATH`` -> ``db-path``).
- ``default-catalog`` names the catalog used when ``load_catalog`` gets
  no name; it defaults to ``"default"``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

PYICEBERG_ENV_PREFIX = "pyiceberg_"
PYICEBERG_HOME = "PYICEBERG_HOME"
PYICEBERG_YML = ".pyiceberg.yaml"
DEFAULT_CATALOG_KEY = "default-catalog"
DEFAULT_CATALOG_NAME = "default"

RecursiveDict = Dict[str, Any]


def merge_config(lhs: RecursiveDict, rhs: RecursiveDict) -> RecursiveDict:
    """Recursive merge; rhs values win (matching the reference's
    merge semantics: nested dicts merge deep, scalars take rhs-or-lhs
    with rhs precedence)."""
    out = dict(lhs)
    for k, rv in rhs.items():
        lv = out.get(k)
        if isinstance(lv, dict) and isinstance(rv, dict):
            out[k] = merge_config(lv, rv)
        elif k in out:
            out[k] = rv or lv
        else:
            out[k] = rv
    return out


def _lower_keys(d: RecursiveDict) -> RecursiveDict:
    return {k.lower(): _lower_keys(v) if isinstance(v, dict) else v for k, v in d.items()}


class Config:
    """Merged configuration: first-found ``.pyiceberg.yaml`` overlaid by
    ``PYICEBERG_*`` environment variables."""

    def __init__(self) -> None:
        config = self._from_configuration_files() or {}
        config = merge_config(config, self._from_environment_variables())
        self.config: RecursiveDict = config

    @staticmethod
    def _from_configuration_files() -> Optional[RecursiveDict]:
        try:
            import yaml
        except ImportError:  # config files simply unavailable
            return None
        for directory in (os.environ.get(PYICEBERG_HOME), os.path.expanduser("~"), os.getcwd()):
            if not directory:
                continue
            path = os.path.join(directory, PYICEBERG_YML)
            if os.path.isfile(path):
                with open(path, encoding="utf-8") as f:
                    loaded = yaml.safe_load(f.read()) or {}
                if not isinstance(loaded, dict):
                    raise ValueError(f"{path} must hold a mapping at top level")
                return _lower_keys(loaded)
        return None

    @staticmethod
    def _from_environment_variables() -> RecursiveDict:
        config: RecursiveDict = {}
        for env_var, value in os.environ.items():
            low = env_var.lower()
            if not low.startswith(PYICEBERG_ENV_PREFIX):
                continue
            key = low[len(PYICEBERG_ENV_PREFIX):]
            parts = [p.replace("_", "-") for p in key.split("__", maxsplit=2)]
            node = config
            for element in parts[:-1]:
                nxt = node.setdefault(element, {})
                if not isinstance(nxt, dict):
                    raise ValueError(
                        f"incompatible configurations merging dict with a value at {'.'.join(parts)}"
                    )
                node = nxt
            node[parts[-1]] = value
        return config

    def get_default_catalog_name(self) -> str:
        name = self.config.get(DEFAULT_CATALOG_KEY)
        if name is not None:
            if not isinstance(name, str):
                raise ValueError(f"default catalog name should be a str: {name!r}")
            return name
        return DEFAULT_CATALOG_NAME

    def get_catalog_config(self, catalog_name: str) -> Optional[RecursiveDict]:
        catalogs = self.config.get("catalog")
        if catalogs is None:
            return None
        if not isinstance(catalogs, dict):
            raise ValueError("catalog configuration needs to be an object")
        conf = catalogs.get(catalog_name.lower())
        if conf is None:
            return None
        if not isinstance(conf, dict):
            raise ValueError(f"configuration path catalog.{catalog_name.lower()} needs to be an object")
        return conf

    def get_known_catalogs(self) -> List[str]:
        catalogs = self.config.get("catalog", {})
        if not isinstance(catalogs, dict):
            raise ValueError("catalog configuration needs to be an object")
        return list(catalogs.keys())
