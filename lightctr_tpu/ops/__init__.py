from .interactions import (
    fm_interaction,
    ffm_interaction,
    field_sum_embeddings,
    linear_term,
)

__all__ = [
    "fm_interaction",
    "ffm_interaction",
    "field_sum_embeddings",
    "linear_term",
]
