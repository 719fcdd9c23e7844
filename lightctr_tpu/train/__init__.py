from .loop import TrainState, make_train_step, train_model, evaluate

__all__ = ["TrainState", "make_train_step", "train_model", "evaluate"]
