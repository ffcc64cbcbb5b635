"""Optimizer + LR-schedule factory (optax).

Parity with ``/root/reference/train.py:28-36``: Adam (torch defaults: betas
0.9/0.999, eps 1e-8) over the *trainable* subtree, and the four schedulers
with the reference's exact hyperparameters. The reference calls
``scheduler.step()`` once per optimizer step but constructs epoch-horizon
schedules (quirk #2, SURVEY.md §2A) — its cosine/linear therefore complete
after ``num_epochs`` *steps*. We reproduce those step counts faithfully
(the schedules are functions of the optimizer-step count).

Freezing: the reference optimizer covers only ``transformer`` params
(``train.py:28``), so even a "trainable" Swin never moves (quirk #1). The
default here fixes that (trainable image tower joins the optimizer);
``freeze_image_model_updates=True`` reproduces the reference exactly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import Config


def make_lr_schedule(config: Config, num_epochs: int) -> optax.Schedule:
    lr = config.lr
    name = config.lr_scheduler
    if name == "":
        return optax.constant_schedule(lr)
    if name == "cosine":
        # CosineAnnealingLR(T_max=num_epochs, eta_min=0), stepped per
        # optimizer step (train.py:30,69): anneals over num_epochs STEPS
        # (quirk #2). Past T_max torch's closed form oscillates back up —
        # reproduced exactly (clamping would silently freeze long runs).
        def cosine(step):
            return 0.5 * lr * (1 + jnp.cos(jnp.pi * step / num_epochs))
        return cosine
    if name == "linear":
        # LambdaLR(lambda epoch: 1 - epoch/num_epochs) per step
        # (train.py:32). torch would go negative past num_epochs steps;
        # clamped at 0 here.
        def linear(step):
            return lr * jnp.maximum(1.0 - step / num_epochs, 0.0)
        return linear
    if name == "exponential":
        return optax.exponential_decay(lr, transition_steps=1,
                                       decay_rate=0.9)  # train.py:34
    if name == "step":
        return optax.exponential_decay(lr, transition_steps=10,
                                       decay_rate=0.1,
                                       staircase=True)  # train.py:36
    raise ValueError(f"unknown lr_scheduler {name!r}")


def trainable_labels(params: Any, config: Config) -> Any:
    """'train' / 'frozen' label tree for optax.multi_transform.

    language_model: always frozen (models/model.py:14).
    image_model: trainable iff --image_model_train AND the quirk-#1
    reproduction flag is off.
    everything else (transformer, projections): trainable.
    """
    image_trainable = (config.image_model_train
                       and not config.freeze_image_model_updates)

    def label(path, _):
        top = str(getattr(path[0], "key", path[0]))
        if top == "language_model":
            return "frozen"
        if top == "image_model":
            return "train" if image_trainable else "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(config: Config, params: Any,
                   num_epochs: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(config, max(num_epochs or 1, 1))
    if config.optimizer == "adam":
        mu_dtype = (jnp.bfloat16 if config.adam_mu_dtype == "bfloat16"
                    else None)
        tx = optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
                        mu_dtype=mu_dtype)
    elif config.optimizer == "adafactor":
        # T5's original optimizer; factored second moments keep optimizer
        # state ~O(rows+cols) instead of O(params).
        tx = optax.adafactor(learning_rate=schedule,
                             multiply_by_parameter_scale=False)
    else:
        raise ValueError(f"unknown optimizer {config.optimizer!r}")
    labels = trainable_labels(params, config)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)
