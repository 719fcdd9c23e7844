from .activations import identity, sigmoid, binary_sigmoid, softmax_t, tanh, relu, softplus
from .losses import square_loss, logistic_loss, softmax_cross_entropy
from .mlp import mlp_init, mlp_apply

__all__ = [
    "identity",
    "sigmoid",
    "binary_sigmoid",
    "softmax_t",
    "tanh",
    "relu",
    "softplus",
    "square_loss",
    "logistic_loss",
    "softmax_cross_entropy",
    "mlp_init",
    "mlp_apply",
]
