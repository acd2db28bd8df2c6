"""Trainable-parameter selection and optimizer construction.

The reference selects trainable parameters by dotted module name
(``base_module.py:44-66``: freeze listed modules; train parameters of
modules named in ``full_trainable_modules``; LoRA-insert the rest). Here the
same config strings become an optax mask over the param pytree — the
TPU-native equivalent where module surgery is replaced by masked updates.

Name mapping: the reference's torch names use dots
(``unet.down_blocks.0.attentions.0...attn2.processor``); our Flax tree uses
underscore-merged module names (``down_blocks_0_attentions_0``). Paths are
canonicalized into token lists (digits split out; 'params' wrappers dropped)
and matched as prefixes. The special trailing ``processor`` token matches
only the adapter branch parameters (to_q_ip / to_k_ip / to_v_ip) — the
reference's APAdapter processor owns exactly those weights.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Sequence

import jax
import optax

__all__ = ["path_tokens", "pattern_matches", "trainable_mask", "build_optimizer"]

ADAPTER_PARAM_NAMES = ("to_q_ip", "to_k_ip", "to_v_ip")


def path_tokens(path: Sequence[Any]) -> list[str]:
    """Flatten a pytree key path into canonical tokens.

    'down_blocks_0_attentions_1' -> ['down_blocks','0','attentions','1'];
    'params' wrappers are dropped.
    """
    tokens: list[str] = []
    for key in path:
        name = getattr(key, "key", None)
        if name is None:
            name = getattr(key, "idx", None)
        if name is None:
            name = str(key)
        name = str(name)
        if name == "params":
            continue
        parts = re.split(r"_(?=\d+(?:_|$))|(?<=\d)_", name)
        for p in parts:
            if p:
                tokens.append(p)
    return tokens


def pattern_tokens(pattern: str) -> list[str]:
    return [t for t in pattern.split(".") if t]


def pattern_matches(param_path: list[str], pattern: str) -> bool:
    """Prefix match of pattern tokens against the param path tokens.

    Special tokens:
      - ``processor`` (trailing): matches iff an adapter-branch param
        (to_q_ip/to_k_ip/to_v_ip) appears later in the path — the reference's
        APAdapter processor owns exactly those weights;
      - ``*``: matches any (possibly empty) run of path tokens, so
        ``unet.*.to_q_a`` selects every action-branch query kernel.
    """
    def match(pi: int, qi: int, ptoks) -> bool:
        if qi == len(ptoks):
            return True  # pattern exhausted -> prefix matched
        tok = ptoks[qi]
        if tok == "processor":
            return any(t in ADAPTER_PARAM_NAMES for t in param_path[pi:])
        if tok == "*":
            return any(match(k, qi + 1, ptoks) for k in range(pi, len(param_path) + 1))
        if pi >= len(param_path) or param_path[pi] != tok:
            return False
        return match(pi + 1, qi + 1, ptoks)

    return match(0, 0, pattern_tokens(pattern))


def trainable_mask(params, patterns: Iterable[str]):
    """Boolean pytree: True where the param path matches any pattern."""
    patterns = list(patterns)

    def check(path, _):
        toks = path_tokens(path)
        return any(pattern_matches(toks, p) for p in patterns)

    return jax.tree_util.tree_map_with_path(check, params)


def build_optimizer(
    params,
    trainable_patterns: Iterable[str],
    learning_rate: float | optax.Schedule = 1e-4,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    grad_clip: float | None = None,
    grad_clip_algorithm: str = "norm",
    warmup_steps: int = 0,
    total_steps: int | None = None,
    schedule: str = "constant",
):
    """AdamW masked to the trainable subtree; frozen params get zero updates.

    Mirrors the reference's optimizer-over-selected-parameters +
    ``gradient_clip_val`` trainer setting.
    """
    if not callable(learning_rate):
        base_lr = float(learning_rate)
        if schedule == "constant":
            lr = optax.join_schedules(
                [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
                 optax.constant_schedule(base_lr)],
                [max(warmup_steps, 1)],
            ) if warmup_steps else base_lr
        elif schedule == "cosine":
            assert total_steps, "cosine schedule needs total_steps"
            lr = optax.warmup_cosine_decay_schedule(
                0.0, base_lr, warmup_steps, total_steps
            )
        else:
            raise ValueError(f"unknown schedule {schedule!r}")
    else:
        lr = learning_rate

    chain = []
    if grad_clip:
        # Lightning gradient_clip_algorithm: 'norm' (default) or 'value'
        if grad_clip_algorithm in (None, "norm"):
            chain.append(optax.clip_by_global_norm(grad_clip))
        elif grad_clip_algorithm == "value":
            chain.append(optax.clip(grad_clip))
        else:
            raise ValueError(f"unknown grad_clip_algorithm {grad_clip_algorithm!r}")
    chain.append(optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay))
    tx = optax.chain(*chain)

    mask = trainable_mask(params, trainable_patterns)
    label = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label
    ), mask
