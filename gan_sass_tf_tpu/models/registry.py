"""Model registry (reference layer L1/L5 registry mechanism, SURVEY.md §5.6).

The reference repo family selects G/D variants by name via registry
decorators; here the same pattern maps names from ModelConfig to Flax module
constructors.
"""

from __future__ import annotations

from typing import Callable, Dict

_GENERATORS: Dict[str, Callable] = {}
_DISCRIMINATORS: Dict[str, Callable] = {}


def register_generator(name: str):
    def deco(fn):
        _GENERATORS[name] = fn
        return fn

    return deco


def register_discriminator(name: str):
    def deco(fn):
        _DISCRIMINATORS[name] = fn
        return fn

    return deco


def build_generator(cfg):
    """cfg: full Config. Returns an nn.Module emitting per-source T-F masks."""
    key = cfg.model.generator
    if key not in _GENERATORS:
        raise KeyError(f"unknown generator {key!r}; have {sorted(_GENERATORS)}")
    return _GENERATORS[key](cfg)


def build_discriminator(cfg):
    key = cfg.model.discriminator
    if key not in _DISCRIMINATORS:
        raise KeyError(
            f"unknown discriminator {key!r}; have {sorted(_DISCRIMINATORS)}"
        )
    return _DISCRIMINATORS[key](cfg)


def list_generators():
    return tuple(sorted(_GENERATORS))


def list_discriminators():
    return tuple(sorted(_DISCRIMINATORS))
