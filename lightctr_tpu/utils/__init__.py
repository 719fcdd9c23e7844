from .metrics import auc, logloss, accuracy, precision_recall_f1, MetricAccumulator

__all__ = ["auc", "logloss", "accuracy", "precision_recall_f1", "MetricAccumulator"]
