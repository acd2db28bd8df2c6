"""Config-driven object instantiation and CLI.

Mirrors the public API of the reference (``main.py {fit,test} -c cfg.yml``
with jsonargparse ``class_path``/``init_args`` dependency injection, see
reference ``main.py:7-16`` and ``configs/**/*.yml``) without depending on
jsonargparse: a small resolver turns nested YAML into live Python objects.

Semantics preserved from the reference:
  - ``class_path: pkg.mod.Cls`` + ``init_args: {...}`` instantiates Cls.
  - Nested dicts/lists are resolved recursively, so configs can inject
    callbacks, optimizer factories, selectors, etc.
  - ``dict_kwargs`` passthrough merges extra kwargs into ``init_args``.
  - Dotted CLI overrides (``--data.batch_size=2``) patch the raw config tree
    before instantiation (reference: LightningCLI dot-overrides).
  - Optimizers/schedulers may be declared as *callables*: a class_path plus
    partial init_args; we wrap them with ``functools.partial`` when the key
    is declared deferred (reference ``base_module.py:84-98`` takes callables).
"""

from __future__ import annotations

import copy
import functools
import importlib
from typing import Any, Mapping

import yaml

__all__ = [
    "load_yaml",
    "instantiate",
    "instantiate_tree",
    "apply_overrides",
    "class_path_of",
    "to_partial",
]


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _import_symbol(path: str) -> Any:
    module_name, _, attr = path.rpartition(".")
    if not module_name:
        raise ImportError(f"class_path {path!r} must be fully qualified")
    mod = importlib.import_module(module_name)
    try:
        return getattr(mod, attr)
    except AttributeError as e:
        raise ImportError(f"{attr!r} not found in module {module_name!r}") from e


def class_path_of(obj: Any) -> str:
    cls = obj if isinstance(obj, type) else type(obj)
    return f"{cls.__module__}.{cls.__qualname__}"


def _is_spec(node: Any) -> bool:
    return isinstance(node, Mapping) and "class_path" in node


def instantiate_tree(node: Any) -> Any:
    """Recursively resolve a YAML tree, instantiating every class_path spec."""
    if _is_spec(node):
        return instantiate(node)
    if isinstance(node, Mapping):
        return {k: instantiate_tree(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(instantiate_tree(v) for v in node)
    return node


def instantiate(spec: Mapping, **extra_kwargs: Any) -> Any:
    """Instantiate a single ``class_path``/``init_args`` spec.

    ``dict_kwargs`` (reference: lvdm passthrough) and ``extra_kwargs`` are
    merged into init_args, with extra_kwargs winning.
    """
    cls = _import_symbol(spec["class_path"])
    kwargs = dict(spec.get("init_args") or {})
    kwargs.update(spec.get("dict_kwargs") or {})
    kwargs = {k: instantiate_tree(v) for k, v in kwargs.items()}
    kwargs.update(extra_kwargs)
    return cls(**kwargs)


def to_partial(spec: Mapping) -> functools.partial:
    """Turn a spec into a callable factory (optimizer/scheduler pattern)."""
    cls = _import_symbol(spec["class_path"])
    kwargs = {k: instantiate_tree(v) for k, v in (spec.get("init_args") or {}).items()}
    return functools.partial(cls, **kwargs)


def _coerce(value: str) -> Any:
    """Best-effort YAML coercion of a CLI override string."""
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    """Apply ``--a.b.c=value`` dotted overrides to the raw config tree."""
    cfg = copy.deepcopy(cfg)
    for item in overrides:
        if not item.startswith("--"):
            raise ValueError(f"override {item!r} must start with '--'")
        key, _, value = item[2:].partition("=")
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            # descend through init_args transparently so users can write
            # --model.foo=1 instead of --model.init_args.foo=1
            if _is_spec(nxt) and parts[-1] not in nxt:
                nxt = nxt.setdefault("init_args", {})
            node = nxt
        node[parts[-1]] = _coerce(value)
    return cfg
