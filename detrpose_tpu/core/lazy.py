"""Lazy config system: executable Python configs building a deferred object
graph, materialized by `instantiate`.

Reference semantics: src/core/lazy.py (LazyCall :24-57, LazyConfig.load :196,
apply_overrides :316) and src/core/instantiate.py:37-88 — reimplemented
dependency-free (no omegaconf/hydra): a LazyCall produces a plain dict with a
``_target_`` key; configs are ordinary Python files executed in a module
namespace; CLI overrides use dotted ``a.b.c=value`` assignments with Python
literal values.
"""
from __future__ import annotations

import ast
import importlib
import importlib.util
import os
import pydoc
import uuid
from typing import Any, List, Mapping


class LazyCall:
    """L(Callable)(**kwargs) -> {'_target_': Callable, **kwargs} (deferred)."""

    def __init__(self, target):
        if not callable(target) and not isinstance(target, str):
            raise TypeError(f"LazyCall target must be callable, got {target!r}")
        self._target = target

    def __call__(self, **kwargs):
        d = {"_target_": self._target}
        d.update(kwargs)
        return ConfigDict(d)


class ConfigDict(dict):
    """dict with attribute access, so configs read like the reference's."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def locate(name: str) -> Any:
    """Dotted path -> python object (reference: src/core/utils.py:33-53)."""
    obj = pydoc.locate(name)
    if obj is None:
        parts = name.split(".")
        for i in range(len(parts) - 1, 0, -1):
            try:
                mod = importlib.import_module(".".join(parts[:i]))
            except ImportError:
                continue
            obj = mod
            for p in parts[i:]:
                obj = getattr(obj, p)
            return obj
        raise ImportError(f"cannot locate {name!r}")
    return obj


def instantiate(cfg: Any) -> Any:
    """Recursively build objects from ``_target_`` trees (instantiate.py:37-88)."""
    if isinstance(cfg, Mapping) and "_target_" in cfg:
        kwargs = {k: instantiate(v) for k, v in cfg.items() if k != "_target_"}
        target = cfg["_target_"]
        if isinstance(target, str):
            target = locate(target)
        return target(**kwargs)
    if isinstance(cfg, Mapping):
        return {k: instantiate(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(v) for v in cfg)
    return cfg


class LazyConfig:
    """Load/save/override config files.

    Python configs are executed in a module namespace (reference
    lazy.py:196-248); ``.yaml`` files round-trip the same tree (reference
    save :250-303, yaml load :214-220). ``to_py`` pretty-prints a tree as
    executable Python (reference :373-435).
    """

    @staticmethod
    def load(path: str) -> ConfigDict:
        path = os.path.abspath(path)
        if path.endswith((".yaml", ".yml")):
            import yaml

            with open(path) as f:
                return _wrap(yaml.safe_load(f))
        spec = importlib.util.spec_from_file_location(
            f"_lazyconfig_{uuid.uuid4().hex}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = ConfigDict()
        for k, v in vars(mod).items():
            if k.startswith("_"):
                continue
            if isinstance(v, (dict, list, tuple, int, float, str, bool)) or v is None:
                cfg[k] = _wrap(v)
        return cfg

    @staticmethod
    def save(cfg: Mapping, path: str) -> None:
        """Serialize a config tree to YAML (reference lazy.py:250-303).

        Callable ``_target_`` values are stored as their dotted import path so
        the file round-trips through ``load`` + ``instantiate``; trees with
        unserializable leaves fall back to cloudpickle next to the yaml, like
        the reference (:295-303), using pickle here.
        """
        import yaml

        def to_plain(v):
            if isinstance(v, Mapping):
                out = {}
                for k, x in v.items():
                    if k == "_target_" and callable(x):
                        x = f"{x.__module__}.{x.__qualname__}"
                    out[k] = to_plain(x)
                return out
            if isinstance(v, (list, tuple)):
                return [to_plain(x) for x in v]
            return v

        plain = to_plain(cfg)
        try:
            text = yaml.safe_dump(plain, sort_keys=False)
            with open(path, "w") as f:
                f.write(text)
        except yaml.YAMLError:
            import pickle

            with open(path + ".pkl", "wb") as f:
                pickle.dump(cfg, f)

    @staticmethod
    def to_py(cfg: Mapping, prefix: str = "cfg.") -> str:
        """Pretty-print a config tree as executable python assignments
        (reference lazy.py:373-435)."""
        lines: List[str] = []

        def emit(node, path):
            if isinstance(node, Mapping) and "_target_" not in node:
                for k, v in node.items():
                    emit(v, f"{path}.{k}" if path else k)
            else:
                lines.append(f"{prefix}{path}={node!r}")

        emit(cfg, "")
        return "\n".join(lines)

    @staticmethod
    def apply_overrides(cfg: ConfigDict, overrides: List[str]) -> ConfigDict:
        """Apply ``a.b.c=value`` overrides (values parsed as python literals)."""
        for ov in overrides:
            if "=" not in ov:
                raise ValueError(f"override must be key=value: {ov!r}")
            key, _, raw = ov.partition("=")
            try:
                value = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                value = raw
            node = cfg
            parts = key.strip().split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = value
        return cfg


def _wrap(v):
    if isinstance(v, ConfigDict):
        return v
    if isinstance(v, dict):
        return ConfigDict({k: _wrap(x) for k, x in v.items()})
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v


L = LazyCall
