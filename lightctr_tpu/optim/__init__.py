from .updaters import (
    sgd,
    momentum,
    adagrad,
    rmsprop,
    adadelta,
    adam,
    ftrl,
    dcasgd,
    clip_by_value,
    add_decayed_l2,
    chain,
    apply_updates,
)

__all__ = [
    "sgd",
    "momentum",
    "adagrad",
    "rmsprop",
    "adadelta",
    "adam",
    "ftrl",
    "dcasgd",
    "clip_by_value",
    "add_decayed_l2",
    "chain",
    "apply_updates",
]
