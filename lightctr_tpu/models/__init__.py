"""Model zoo. Each module exposes: a frozen Config dataclass, init(rng, cfg),
forward(params, batch, cfg, train=..., rng=...) -> logits, and
loss(params, batch, cfg, rng) -> scalar."""

from . import fm, ffm, lr, nfm, widedeep

MODEL_REGISTRY = {
    "lr": lr,
    "fm": fm,
    "ffm": ffm,
    "nfm": nfm,
    "widedeep": widedeep,
}

__all__ = ["fm", "ffm", "lr", "nfm", "widedeep", "MODEL_REGISTRY"]
